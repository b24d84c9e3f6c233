package graft.format

import org.apache.spark.sql.SparkSession

/** Diagnostic: print per-chunk scheme TREES for a column of the
  * ratio-corpus sample/tryall writes, attributing cascade-level
  * sample-vs-tryall byte gaps.
  * Run: Test/runMain graft.format.CascadeProbe <column>
  */
object CascadeProbe {
  def main(args: Array[String]): Unit = {
    val col0 = if (args.nonEmpty) args(0) else "price"
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("cascade-probe")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (mode <- Seq("sample", "tryall")) {
      println(s"=== $mode ===")
      graft.functions.BtrInspect.describe(spark, s"/tmp/btr-ratio-corpus/$mode")
        .filter(org.apache.spark.sql.functions.col("column") === col0)
        .select("scheme_tree", "compressed_bytes")
        .collect()
        .foreach(r => println(s"  comp=${r.getLong(1)}  ${r.getString(0)}"))
    }
    spark.stop()
  }
}
