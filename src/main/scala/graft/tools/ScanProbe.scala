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
    // decompression-speed tool (compressed/decompressed bytes, s, MB/s) —
    // names the bottleneck column instead of one whole-table number
    import org.apache.spark.sql.types._
    val comp = graft.functions.BtrInspect.describe(spark, dst)
      .groupBy("column")
      .agg(org.apache.spark.sql.functions.sum("compressed_bytes").as("b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nRows = df.count()
    df.schema.fields.foreach { f =>
      def once(): Unit = df.selectExpr(s"sum(hash(`${f.name}`))").collect()
      once()
      val t0 = System.nanoTime(); once(); once()
      val sec = (System.nanoTime() - t0) / 2e9
      val decomp: Long = f.dataType match {
        case IntegerType | FloatType | DateType => nRows * 4
        case LongType | DoubleType | TimestampType | TimestampNTZType => nRows * 8
        case BooleanType | ByteType => nRows
        case ShortType => nRows * 2
        case d: DecimalType if d.precision <= 18 => nRows * 8
        case StringType | BinaryType =>
          val r0 = df.selectExpr(s"sum(octet_length(`${f.name}`))").collect()(0)
          (if (r0.isNullAt(0)) 0L else r0.getLong(0)) + nRows * 4
        case _ => -1L
      }
      val mbps = if (sec > 0 && decomp > 0) decomp / 1e6 / sec else 0.0
      println(f"[probe] col=${f.name}%-20s comp=${comp.getOrElse(f.name, -1L)}%12d " +
        f"decomp=$decomp%12d sec=$sec%.4f mbps=$mbps%.1f")
    }
    spark.stop()
  }
}
