package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end DSv2 surface driver: parquet → `df.write.format("btr")` →
  * `spark.read.format("btr")` → full-column equality + plan inspection.
  *
  * Usage: runMain graft.tools.RoundTripCli <sfDir> <outDir> [tables...]
  */
object RoundTripCli {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val outDir = if (args.length > 1) args(1) else "/tmp/btr-roundtrip"
    val tables =
      if (args.length > 2) args.drop(2).toSeq
      else Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "documents")

    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("btr-roundtrip")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    var allOk = true
    tables.foreach { t =>
      val orig = spark.read.parquet(s"$sfDir/$t.parquet")
      val path = s"$outDir/$t"
      val t0 = System.nanoTime()
      orig.write.format("btr").mode("overwrite").save(path)
      val writeSec = (System.nanoTime() - t0) / 1e9
      val back = spark.read.format("btr").load(path)
      val t1 = System.nanoTime()
      val n = back.count()
      val readSec = (System.nanoTime() - t1) / 1e9
      // order-insensitive full-content compare; fields join on \u0001 so a
      // comma inside a string can't alias adjacent-column corruption the
      // way Row.toString's "[a,b,c]" rendering would
      def fmt(r: org.apache.spark.sql.Row): String =
        r.toSeq.map {
          case bytes: Array[Byte] => bytes.map("%02x".format(_)).mkString
          case other => String.valueOf(other)
        }.mkString("\u0001")
      val aRows = orig.collect()
      val a = aRows.map(fmt).sorted.mkString("\n")
      val b = back.collect().map(fmt).sorted.mkString("\n")
      val ok = n == aRows.length && a == b
      allOk &= ok
      val fs = Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".btr")).map(_.length).sum
      println(f"$t%-12s rows=$n%8d write=${writeSec}%6.2fs read=${readSec}%6.2fs btrBytes=$fs%10d match=$ok")
    }

    // plan check: projection + filter over btr
    val li = spark.read.format("btr").load(s"$outDir/lineitem")
    val q = li.filter(col("l_orderkey") > 100).select("l_orderkey", "l_extendedprice")
    println("--- explain (formatted) ---")
    q.explain("formatted")
    println(s"ALL_MATCH=$allOk")
    spark.stop()
    if (!allOk) sys.exit(1)
  }
}
