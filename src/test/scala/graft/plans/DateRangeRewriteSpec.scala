package graft.plans

import graft.GraftExtensions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[DateRangeRewrite]]: day-level predicates become source timestamp
  * ranges — value-exact (same boolean/null result row by row), and the
  * derived comparisons reach the btr scan as pushed filters that prune
  * `days(ts)` directories.
  */
class DateRangeRewriteSpec extends AnyFunSuite {
  // The rule must run BEFORE V2 pushdown (operator-optimization
  // fixpoint), which only build-time extension injection provides — so
  // this suite builds its OWN session with extensions instead of
  // reusing the JVM's shared one (post-hoc register() appends to the
  // User-Provided batch, which runs after pushdown: still value-exact,
  // but too late to prune). The shared default session is restored for
  // later suites.
  lazy val spark: SparkSession = {
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.catalog.graft", "graft.sources.BtrCatalog")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    prior.foreach(SparkSession.setDefaultSession)
    s
  }

  import spark.implicits._

  // the value-exactness oracle: computing the SAME predicate in a
  // projection (which the rule leaves untouched) and filtering on the
  // flag must select identical rows
  private def sameRows(df: org.apache.spark.sql.DataFrame,
      pred: org.apache.spark.sql.Column, id: String = "id"): Unit = {
    val rewritten = df.filter(pred).select(id).as[Long].collect().sorted.toSeq
    val reference = df.withColumn("__flag", pred).filter(col("__flag"))
      .select(id).as[Long].collect().sorted.toSeq
    assert(rewritten == reference,
      s"rewrite changed the selected rows: ${rewritten.take(5)}.. vs ${reference.take(5)}..")
  }

  private def tsDf = {
    val rows = (0 until 2000).map(i => (i.toLong, java.sql.Timestamp.from(
      java.time.Instant.parse("2026-04-09T22:00:00Z").plusSeconds(i * 150L)))) :+
      ((9999L, null.asInstanceOf[java.sql.Timestamp]))
    rows.toDF("id", "ts")
  }

  test("to_date comparisons select exactly the original rows (nulls included)") {
    val df = tsDf
    val d = lit("2026-04-10").cast("date")
    sameRows(df, to_date(col("ts")) === d)
    sameRows(df, to_date(col("ts")) >= d)
    sameRows(df, to_date(col("ts")) > d)
    sameRows(df, to_date(col("ts")) < d)
    sameRows(df, to_date(col("ts")) <= d)
    sameRows(df, to_date(col("ts")).isin(
      java.sql.Date.valueOf("2026-04-10"), java.sql.Date.valueOf("2026-04-12")))
    sameRows(df, !(to_date(col("ts")) === d) || col("id") < 10)
    // <=> must never rewrite: NOT(null <=> D) is TRUE for null rows —
    // a derived range (null) would silently drop them
    sameRows(df, !(to_date(col("ts")) <=> d))
    sameRows(df, to_date(col("ts")) <=> d)
    // year() over a date column
    val dd = df.filter(col("ts").isNotNull).select(col("id"), to_date(col("ts")).as("d"))
    sameRows(dd, year(col("d")) === 2026)
    sameRows(dd, year(col("d")) >= 2027)
  }

  test("nested NOT / <=> compositions stay value-exact") {
    val df = tsDf
    val d = lit("2026-04-10").cast("date")
    val d2 = lit("2026-04-12").cast("date")
    val onB = lit("2026-04-10 00:00:00").cast("timestamp")
    // double negation over a rewritten leaf
    sameRows(df, !(!(to_date(col("ts")) === d)))
    // NOT over an IN-list rewrite (the Or of ranges must negate exactly,
    // nulls matching neither side)
    sameRows(df, !to_date(col("ts")).isin(
      java.sql.Date.valueOf("2026-04-10"), java.sql.Date.valueOf("2026-04-12")))
    // <=> disjoined with a rewritten date_trunc leaf, the whole thing negated:
    // the <=> side must NOT turn into a range while the trunc side may
    sameRows(df, !((to_date(col("ts")) <=> d) || (date_trunc("day", col("ts")) === onB)))
    sameRows(df, !((to_date(col("ts")) <=> d) && (to_date(col("ts")) < d2)))
    // NOT over a range conjoined with an untranslatable residue
    sameRows(df, !(to_date(col("ts")) >= d) && col("id") % 3 === 0)
    // nested NOT with null-safe equality against NULL (matches exactly the
    // null-ts row; its negation matches everything else)
    sameRows(df, !(to_date(col("ts")) <=> lit(null).cast("date")))
    sameRows(df, !(!(to_date(col("ts")) <=> lit(null).cast("date")) || to_date(col("ts")) === d))
  }

  test("date_trunc comparisons select exactly the original rows") {
    val df = tsDf
    val onB = lit("2026-04-10 00:00:00").cast("timestamp")  // day boundary (UTC)
    val offB = lit("2026-04-10 13:30:00").cast("timestamp") // off-boundary
    for (u <- Seq("day", "hour", "week", "month", "quarter", "year")) {
      sameRows(df, date_trunc(u, col("ts")) === onB)
      sameRows(df, date_trunc(u, col("ts")) >= offB)
      sameRows(df, date_trunc(u, col("ts")) > onB)
      sameRows(df, date_trunc(u, col("ts")) < offB)
      sameRows(df, date_trunc(u, col("ts")) <= onB)
    }
    // off-boundary equality stays untouched (and still answers right)
    sameRows(df, date_trunc("day", col("ts")) === offB)
    // pruning: the derived hour range reaches the scan
    val p = "/tmp/btr-date-rewrite/trunc"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
    spark.sql(s"CREATE TABLE graft.`$p` (id BIGINT, ts TIMESTAMP) " +
      "USING btr PARTITIONED BY (days(ts))")
    (0 until 3000).map(i => (i.toLong, java.sql.Timestamp.from(
      java.time.Instant.parse("2026-04-09T00:00:00Z").plusSeconds(i * 90L))))
      .toDF("id", "ts").writeTo(s"graft.`$p`").append()
    val all = spark.table(s"graft.`$p`")
    val oneDay = all.filter(date_trunc("day", col("ts")) === onB)
    assert(oneDay.rdd.getNumPartitions < all.rdd.getNumPartitions,
      "expected the derived date_trunc range to prune day directories")
  }

  test("the rewrite is session-zone aware") {
    val old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Australia/Sydney")
    try {
      // rows straddle the Sydney midnight, not the UTC one
      sameRows(tsDf, to_date(col("ts")) === lit("2026-04-10").cast("date"))
      sameRows(tsDf, to_date(col("ts")) <= lit("2026-04-10").cast("date"))
    } finally spark.conf.set("spark.sql.session.timeZone", old)
  }

  test("rewritten day filter pushes down and prunes days(ts) directories") {
    val p = "/tmp/btr-date-rewrite/days"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File("/tmp/btr-date-rewrite"))
    spark.sql(s"CREATE TABLE graft.`$p` (id BIGINT, ts TIMESTAMP) " +
      "USING btr PARTITIONED BY (days(ts))")
    (0 until 3000).map(i => (i.toLong, java.sql.Timestamp.from(
      java.time.Instant.parse("2026-04-09T00:00:00Z").plusSeconds(i * 90L))))
      .toDF("id", "ts").writeTo(s"graft.`$p`").append()
    val all = spark.table(s"graft.`$p`")
    val oneDay = all.filter(to_date(col("ts")) === lit("2026-04-10").cast("date"))
    // the day predicate must reach the scan: fewer planned partitions
    assert(oneDay.rdd.getNumPartitions < all.rdd.getNumPartitions,
      "expected the derived range to prune day directories")
    // and the answers are the explicit-range answers
    val explicit = all.filter(
      col("ts") >= lit("2026-04-10 00:00:00").cast("timestamp") &&
        col("ts") < lit("2026-04-11 00:00:00").cast("timestamp"))
      .agg(count(lit(1)), sum("id")).collect()(0)
    val got = oneDay.agg(count(lit(1)), sum("id")).collect()(0)
    assert(got == explicit)
  }
}
