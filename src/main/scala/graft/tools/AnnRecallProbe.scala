package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Recall-vs-rerankFactor curve for the quantized IVF layouts (VERDICT
  * r19 #3): the i8 two-stage rank's `IvfRerankFactor = 4` default was
  * asserted, not measured. For each dim ∈ {64, 256} (the native corpus
  * and a tiled+jittered high-dim variant where the i8 I/O win approaches
  * 8×) this probe builds an f64 and an i8 index over the same corpus and
  * reports, for rerankFactor ∈ {1, 2, 4, 8}:
  *
  *   - recall@k of the i8 serve against the SAME-nprobe f64 serve — the
  *     quantization + shortlist-depth loss in isolation (cell misses
  *     from a finite nprobe affect both sides equally and cancel);
  *   - the i8 serve latency (min of 3), so the shortlist-persist fold
  *     and the shortlist-depth cost are readable from the same line.
  *
  * One context line per dim carries the f64 serve's own recall against
  * brute force (the nprobe ceiling both layouts live under) and the f64
  * serve latency baseline.
  *
  *   runMain graft.tools.AnnRecallProbe <sfDir> [copies=500] [out.json]
  *
  * copies=500 over the sf0.1 corpus (2,000 base vectors) is the 1M-vector
  * setting BASELINE.md quotes; 1M × dim-256 builds want
  * SPARK_DRIVER_MEM=16g (see the sf10 bench note).
  */
object AnnRecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val copies = if (args.length > 1) args(1).toInt else 500
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.SimilarityOps

    val k = 10
    val nprobe = 4
    val nQueries = 64
    val base64 = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val nBase = base64.count()

    /** Tile the 64-dim vector `times`× with a per-tile deterministic
      * jitter (≤2e-2): same cluster structure, higher dim.
      */
    def widen(df: DataFrame, times: Int): DataFrame =
      if (times <= 1) df
      else df.select(col("cid"), flatten(transform(
        sequence(lit(0), lit(times - 1)),
        t => transform(col("cvec"), (x, i) =>
          (x + (pmod(hash(col("cid"), t, i), lit(1000)).cast("float") - 500f) / 25000f)
            .cast("float")))).as("cvec"))

    /** copies× corpus: replica r shifts ids and perturbs components (the
      * AnnScaleProbe construction — every vector distinct, same cluster
      * structure).
      */
    def corpusOf(b: DataFrame): DataFrame =
      b.crossJoin(spark.range(copies).select(col("id").as("r")))
        .select(
          (col("cid") + col("r") * 1000000000L).as("cid"),
          transform(col("cvec"),
            (x, i) => (x + (pmod(hash(col("cid"), col("r"), i), lit(1000)).cast("float")
              - 500f) / 50000f).cast("float")).as("cvec"))

    def secs(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }

    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select("qid", "cid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    for (dim <- Seq(64, 256)) {
      val b = widen(base64, dim / 64)
      val corpus = corpusOf(b)
      val n = nBase * copies
      val nlist = (32 * (n / 100000L).max(1L)).toInt
      val queries = b.limit(nQueries)
        .select(col("cid").as("qid"),
          transform(col("cvec"), x => (x + 1e-3f).cast("float")).as("qvec"))
        .cache()
      queries.count()

      val dirs = Seq("f64", "i8").map { st =>
        val dir = s"/tmp/btr-ann-recall/d$dim-$st"
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
        SimilarityOps.ivfIndexBuild(corpus, dir, nlist = nlist,
          fitSampleRows = 10000, vectorStorage = st)
        st -> dir
      }.toMap

      // same-nprobe f64 serve = the quantization-free reference; brute
      // force = ground truth for the nprobe ceiling (context only)
      def serveF64() = SimilarityOps.ivfTopKServe(queries, dirs("f64"), k, nprobe)
      serveF64().write.mode("overwrite").format("noop").save()
      val f64Sec = (1 to 3).map(_ => secs {
        serveF64().write.mode("overwrite").format("noop").save()
      }).min
      val exactF64 = pairs(serveF64())
      val truth = pairs(SimilarityOps.bruteForceTopK(queries, corpus, k))
      val f64Recall = (exactF64 & truth).size.toDouble / truth.size
      lines += f"""{"dim":$dim,"corpus":$n,"nlist":$nlist,"f64_serve_sec":$f64Sec%.3f,"f64_recall_vs_brute":$f64Recall%.4f}"""
      println(lines.last)

      for (rf <- Seq(1, 2, 4, 8)) {
        def serveI8() =
          SimilarityOps.ivfTopKServe(queries, dirs("i8"), k, nprobe, rerankFactor = rf)
        serveI8().write.mode("overwrite").format("noop").save()
        val sec = (1 to 3).map(_ => secs {
          serveI8().write.mode("overwrite").format("noop").save()
        }).min
        val got = pairs(serveI8())
        val recall = (got & exactF64).size.toDouble / exactF64.size
        lines += f"""{"dim":$dim,"storage":"i8","rerank_factor":$rf,"serve_sec":$sec%.3f,"recall_at_$k%d_vs_f64":$recall%.4f}"""
        println(lines.last)
      }
      queries.unpersist()
    }
    if (args.length > 2) {
      val w = new java.io.PrintWriter(new java.io.File(args(2)))
      try lines.foreach(w.println) finally w.close()
    }
    spark.stop()
  }
}
