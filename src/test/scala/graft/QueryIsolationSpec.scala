package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Isolation guard for the oracle harness: each DML gate query must run
  * in a FRESH session over a FRESH cache directory, so a query that
  * silently leans on temp views (or filesystem state) registered by a
  * sibling query fails here even when the Verify battery's deterministic
  * order would mask the dependence. Exists because round 12's
  * q_dml_merge_dv MERGEd `USING dml_merge_src` — the copy-on-write
  * variant's view — and passed only by hash-Map iteration luck.
  */
class QueryIsolationSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"

  // Temp views are session-scoped, so newSession() gives a clean view
  // namespace; a fresh symlink farm over the same parquet gives Btr.cacheDir
  // a path-keyed cache no earlier query (or earlier test run) populated.
  private def freshSfDir(tag: String): String = {
    val d = new java.io.File(s"/tmp/btr-isolation/$tag")
    org.apache.commons.io.FileUtils.deleteQuietly(d)
    d.mkdirs()
    Option(new java.io.File(sf).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet"))
      .foreach { f =>
        java.nio.file.Files.createSymbolicLink(
          new java.io.File(d, f.getName).toPath, f.toPath.toRealPath())
      }
    d.getAbsolutePath
  }

  lazy val base: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("query-isolation-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // Every query that registers or reads temp views, plus all DML/cache
  // queries whose build step mutates per-path state.
  private val isolated = SparkEntry.queries.keys.filter { n =>
    n.startsWith("q_dml") || n == "q_spj_share" || n == "q_incremental_dedup"
  }.toSeq.sorted

  for (name <- isolated) test(s"$name runs green in a fresh session and cache") {
    val s = base.newSession()
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rows = SparkEntry.queries(name)(s, freshSfDir(name)).collect()
    assert(rows.nonEmpty, s"$name returned no rows in isolation")
  }
}
