package graft.tools
import org.apache.spark.sql.SparkSession

/** Scan-throughput diagnostic: btr-converts a parquet table once, then
  * times repeated full-decode scans (`sum(hash(*))`) and reports the
  * planned split count — the tool that exposed the 10-splits-on-32-cores
  * parallelism floor fixed by BtrScan's effectiveSplitBytes.
  *
  *   runMain graft.tools.ScanProbe <src.parquet> <dst-btr-dir>
  */
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = args(0)
    val dst = args(1)
    if (!new java.io.File(dst, "_btr_meta.json").exists()) {
      spark.read.parquet(src).write.format("btr").mode("overwrite").save(dst)
    }
    val df = spark.read.format("btr").load(dst)
    df.agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1))).collect()
    (1 to 4).foreach { i =>
      val t0 = System.nanoTime()
      df.selectExpr("sum(hash(*))").collect()
      println(f"[probe] rep $i: ${(System.nanoTime()-t0)/1e9}%.3f s  files=${new java.io.File(dst).listFiles().count(_.getName.endsWith(".btr"))}")
    }
    val parts = df.rdd.getNumPartitions
    println(s"[probe] partitions=$parts rows=${df.count()}")
    // per-column decode bandwidth, mirroring the reference's
    // decompression-speed tool — shared implementation with Bench's
    // col_bw field (graft.tools.ColumnBandwidth) so CLI and artifact
    // report one comparable metric
    ColumnBandwidth.measure(spark, dst).foreach { c =>
      println(f"[probe] col=${c.name}%-20s comp=${c.compBytes}%12d " +
        f"decomp=${c.decompBytes}%12d sec=${c.sec}%.4f mbps=${c.mbps}%.1f")
    }
    spark.stop()
  }
}
