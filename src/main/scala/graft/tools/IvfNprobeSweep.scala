package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Recall-equalized serve comparison for the round-22 oversized-cell
  * split (VERDICT r21 #1's "within 1.5–2× of balanced AT EQUAL RECALL"
  * bar): splitting cells raises the cell count, so at a FIXED nprobe the
  * probed corpus share — and with it recall — drops. The fair comparison
  * sweeps nprobe on each layout and reads serve seconds at matched
  * recall, not at matched nprobe.
  *
  * Expects the IvfSkewProbe index directories to exist (run it first):
  * for each variant in {sep, graded} × the given dims it serves the same
  * 64-query batch from the split (`/tmp/btr-ann-skew/<variant>-d<dim>`)
  * and no-split (`…-nosplit`) f64 indexes at each nprobe in the sweep,
  * printing recall@10 vs in-Spark brute force and min-of-3 noop serve
  * seconds per point.
  *
  *   runMain graft.tools.IvfNprobeSweep <sfDir> [copies=500] [out.json]
  */
object IvfNprobeSweep {
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
    val nQueries = 64
    val nBase = spark.read.parquet(s"$sfDir/embeddings.parquet").count()

    // same planted-cluster construction as AnnRecallProbe / IvfSkewProbe
    def corpusOf(n: Long, dim: Int, clusterSize: Int, sigStep: Double): DataFrame = {
      val cl = (col("id") / clusterSize.toLong).cast("long")
      val sigma = pmod(col("id"), lit(clusterSize.toLong)).cast("double") * sigStep
      spark.range(n).select(col("id").as("cid"),
        transform(sequence(lit(1), lit(dim)), i =>
          (((pmod(hash(cl, i), lit(2001)) - lit(1000)).cast("double") / 1000d) +
            sigma * ((pmod(hash(col("id"), i, lit(7)), lit(2001)) - lit(1000))
              .cast("double") / 1000d)).cast("float"))
          .as("cvec"))
    }

    def secs(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select("qid", "cid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    for {
      (variant, clusterSize, sigStep) <- Seq(("sep", 20, 0.035), ("graded", 100, 0.006))
      dim <- Seq(256)
    } {
      val n = nBase * copies
      val corpus = corpusOf(n, dim, clusterSize, sigStep)
      val queries = corpus.where(pmod(col("cid"), lit(clusterSize.toLong)) === 0L)
        .limit(nQueries)
        .select(col("cid").as("qid"), col("cvec").as("qvec"))
        .cache()
      queries.count()
      val truth = pairs(SimilarityOps.bruteForceTopK(queries, corpus, k))

      for {
        layout <- Seq("split", "nosplit")
        nprobe <- Seq(4, 6, 8, 12)
      } {
        val dir = s"/tmp/btr-ann-skew/$variant-d$dim" +
          (if (layout == "nosplit") "-nosplit" else "")
        if (new java.io.File(dir).isDirectory) {
          def serve() = SimilarityOps.ivfTopKServe(queries, dir, k, nprobe)
          serve().write.mode("overwrite").format("noop").save()
          val sec = (1 to 3).map(_ => secs {
            serve().write.mode("overwrite").format("noop").save()
          }).min
          val recall = (pairs(serve()) & truth).size.toDouble / truth.size
          lines += f"""{"variant":"$variant","dim":$dim,"layout":"$layout","nprobe":$nprobe,"serve_sec":$sec%.3f,"recall_vs_brute":$recall%.4f}"""
          println(lines.last)
        }
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
