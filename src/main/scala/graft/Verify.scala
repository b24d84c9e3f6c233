package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS): read as raw nanos longs
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // the library's recommended config: key-grouped (storage-partitioned)
      // planning over partitioned btr tables — every partitioned-table
      // query in the gate then runs through the grouped-split path, so a
      // planning bug there would break oracle green, not just a plan spec
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      // ...and the partition-key ordering that grouping preserves (rows in
      // a key group share one key), so SPJ sort-merge joins skip sorts
      .config("spark.sql.sources.v2.bucketing.sorting.enabled", "true")
      .config("spark.ui.enabled", "false")
      // the full library surface: SQL functions, maintenance verbs, and
      // the day-predicate range derivation (which must run BEFORE V2
      // pushdown — only build-time extension injection places it in the
      // operator-optimization fixpoint)
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Sorted by name: hash-Map order let one query lean on another's temp
    // views undetected (the r12 q_dml_merge_dv defect). A deterministic
    // order means any such dependence either always passes or always fails
    // — and the IsolationSpec guards the "always" part per-query.
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
