package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANN serving scale curve (VERDICT r16 #2 "Done" criterion): grows an
  * embedding corpus 1×→4×→10× (replicated + hash-perturbed, so every
  * vector is distinct), builds an IVF-flat index at each size with
  * `nlist ∝ corpus` (cell SIZE stays constant — the production sizing
  * rule), and times a FIXED query batch through [[graft.functions
  * .SimilarityOps.ivfTopKServe]] — per-batch I/O is nprobe cells, so
  * serve time must stay ≈flat while the brute-force baseline grows
  * ≈linearly with the corpus. Prints one JSON line per size plus the
  * flatness ratio.
  *
  * The optional storage arg selects the stored-vector precision
  * (f64|f32|i8 — see `ivfIndexBuild.vectorStorage`); each line reports
  * the assign table's on-disk bytes, so one run per layout measures the
  * serve-I/O claim (f32 ≈ half, i8's ranking stream ≈ 1 byte/dim)
  * directly against the served-batch latency.
  *
  *   runMain graft.tools.AnnScaleProbe <sfDir> [baseCopies=50] [out.json] [storage=f64]
  */
object AnnScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val baseCopies = if (args.length > 1) args(1).toInt else 50
    val storage = if (args.length > 3) args(3) else "f64"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.SimilarityOps

    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val nBase = base.count()

    /** m× corpus: replica r shifts ids by r*10^9 and perturbs every
      * component by a deterministic hash jitter (≤1e-2), so replicas are
      * distinct vectors with the same cluster structure.
      */
    def corpusAt(copies: Int): DataFrame =
      base.crossJoin(spark.range(copies).select(col("id").as("r")))
        .select(
          (col("cid") + col("r") * 1000000000L).as("cid"),
          transform(col("cvec"),
            (x, i) => (x + (pmod(hash(col("cid"), col("r"), i), lit(1000)).cast("float")
              - 500f) / 50000f).cast("float")).as("cvec"))

    def secs(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }

    val queries = base.limit(8)
      .select(col("cid").as("qid"), col("cvec").as("qvec")).cache()
    queries.count()

    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    var first = -1.0
    var last = -1.0
    for (m <- Seq(1, 4, 10)) {
      val copies = baseCopies * m
      val corpus = corpusAt(copies)
      val n = nBase * copies
      val nlist = 32 * m // constant rows/cell: the production sizing rule
      val dir = s"/tmp/btr-ann-scale/m$m"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      val buildSec = secs {
        SimilarityOps.ivfIndexBuild(corpus, dir, nlist = nlist, fitSampleRows = 10000,
          vectorStorage = storage)
      }
      val assignBytes = org.apache.commons.io.FileUtils.sizeOfDirectory(
        new java.io.File(SimilarityOps.ivfIndexAssignPath(dir)))
      // warm once (centroid read, code paths), then min-of-3 timed batches
      def serveOnce(): Unit =
        SimilarityOps.ivfTopKServe(queries, dir, k = 10, nprobe = 4)
          .write.mode("overwrite").format("noop").save()
      serveOnce()
      val serveSec = (1 to 3).map(_ => secs(serveOnce())).min
      // the O(corpus) baseline for contrast
      def bruteOnce(): Unit =
        SimilarityOps.bruteForceTopK(queries, corpus, 10)
          .write.mode("overwrite").format("noop").save()
      bruteOnce()
      val bruteSec = (1 to 2).map(_ => secs(bruteOnce())).min
      if (m == 1) first = serveSec
      last = serveSec
      lines += f"""{"m":$m,"corpus":$n,"nlist":$nlist,"storage":"$storage","assign_bytes":$assignBytes,"build_sec":$buildSec%.2f,"serve_sec":$serveSec%.3f,"brute_sec":$bruteSec%.3f}"""
      println(lines.last)
    }
    val flatness = last / first
    println(f"""{"serve_flatness_10x_over_1x":$flatness%.2f}""")
    if (args.length > 2) {
      val w = new java.io.PrintWriter(new java.io.File(args(2)))
      try { lines.foreach(w.println); w.println(f"""{"serve_flatness_10x_over_1x":$flatness%.2f}""") }
      finally w.close()
    }
    spark.stop()
  }
}
