package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-factor multiplier for bench smokes: replicates the test tables
  * N× with consistent key shifts (each replica's foreign keys point at
  * its own replica of the referenced table), so join cardinalities and
  * value distributions scale ~linearly and the same bench queries run
  * unchanged at 10× data. Usage:
  *
  *   runMain graft.tools.ScaleUp <srcSfDir> <outDir> [copies=10]
  *
  * A scale SMOKE, not a TPC-H generator — it exists to catch planning or
  * skew cliffs a page-cached sf0.1 run can't (per-query times should
  * scale ≈linearly; superlinear growth means a driver-side or shuffle
  * bottleneck). Replicated documents form exact 10-member duplicate
  * classes, which doubles as a stress input for the dedup guards.
  */
object ScaleUp {
  // key shift per replica, far above any real key at these scale factors
  private val K = 1000000000L

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val copies = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")

    /** Union `copies` replicas, shifting the listed key columns by i*K. */
    def replicate(df: DataFrame, keyCols: Seq[String]): DataFrame =
      (0 until copies).map { i =>
        keyCols.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(i * K)))
      }.reduce(_ unionAll _)

    val plans: Seq[(String, DataFrame)] = Seq(
      "region" -> t("region"),
      "nation" -> t("nation"),
      "customer" -> replicate(t("customer"), Seq("c_custkey")),
      "supplier" -> replicate(t("supplier"), Seq("s_suppkey")),
      "part" -> replicate(t("part"), Seq("p_partkey")),
      "orders" -> replicate(t("orders"), Seq("o_orderkey", "o_custkey")),
      "lineitem" -> replicate(t("lineitem"), Seq("l_orderkey", "l_partkey", "l_suppkey")),
      // events keep their time range (hour-partition layouts stay 720
      // dirs with 10× rows each — the realistic growth direction)
      "events" -> replicate(t("events"), Seq("event_id", "user_id")),
      "documents" -> replicate(t("documents"), Seq("doc_id")),
      "embeddings" -> replicate(t("embeddings"), Seq("vec_id"))
    )
    plans.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$out/$name.parquet.dir")
      // the bench reads <table>.parquet as a path; a directory works for
      // spark.read.parquet, so normalize the name
      val fs = new org.apache.hadoop.fs.Path(out)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val from = new org.apache.hadoop.fs.Path(s"$out/$name.parquet.dir")
      val to = new org.apache.hadoop.fs.Path(s"$out/$name.parquet")
      fs.delete(to, true)
      if (!fs.rename(from, to))
        throw new java.io.IOException(s"rename $from -> $to failed")
      println(s"[scaleup] $name x$copies done")
    }
    spark.stop()
  }
}
