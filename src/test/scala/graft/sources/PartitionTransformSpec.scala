package graft.sources

import graft.format.{BtrTableMeta, PartField, PartitionTransform}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Partition transforms (`days(ts)`, `hours(ts)`, `months/years`,
  * `bucket(n, col)`, `truncate(w, col)`): the source column STAYS in the
  * data files, the directory carries the derived value, and predicates
  * on the source column prune whole directories — the shape a 100 TB
  * time-partitioned event table actually uses (`PARTITIONED BY
  * (days(ts))`), per the public Iceberg partition-transform model.
  */
class PartitionTransformSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("partition-transform-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.catalog.graft", "graft.sources.BtrCatalog")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(name: String) = {
    val d = s"/tmp/btr-part-transform/$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
    d
  }

  // ---- unit: parse / serialize / derive -------------------------------

  test("spec strings parse, serialize canonically, and name directories") {
    assert(PartitionTransform.parse("region") == PartField("identity", 0, "region"))
    assert(PartitionTransform.parse("days(ts)") == PartField("days", 0, "ts"))
    assert(PartitionTransform.parse("day(ts)") == PartField("days", 0, "ts"))
    assert(PartitionTransform.parse("bucket(16, id)") == PartField("bucket", 16, "id"))
    assert(PartitionTransform.parse("truncate(4,code)") == PartField("truncate", 4, "code"))
    assert(PartitionTransform.parse("bucket(16,id)").serialized == "bucket(16,id)")
    assert(PartitionTransform.parse("days(ts)").dirName == "ts_days")
    assert(PartitionTransform.parse("bucket(16,id)").dirName == "id_bucket_16")
    intercept[IllegalArgumentException](PartitionTransform.parse("zorder(ts)"))
    intercept[IllegalArgumentException](PartitionTransform.parse("bucket(ts)"))
    intercept[IllegalArgumentException](PartitionTransform.parse("days(3,ts)"))
  }

  test("dirValue derives time / bucket / truncate values, pre-1970 included") {
    val micros = java.time.Instant.parse("2026-08-15T03:07:11Z").toEpochMilli * 1000L
    def dv(spec: String, dt: DataType, v: Any) =
      PartitionTransform.dirValue(PartitionTransform.parse(spec), dt, v)
    assert(dv("days(ts)", TimestampType, Long.box(micros)) == "2026-08-15")
    assert(dv("hours(ts)", TimestampType, Long.box(micros)) == "2026-08-15-03")
    assert(dv("months(ts)", TimestampType, Long.box(micros)) == "2026-08")
    assert(dv("years(ts)", TimestampType, Long.box(micros)) == "2026")
    val before = java.time.Instant.parse("1969-12-31T22:30:00Z").toEpochMilli * 1000L
    assert(dv("days(ts)", TimestampType, Long.box(before)) == "1969-12-31")
    assert(dv("hours(ts)", TimestampType, Long.box(before)) == "1969-12-31-22")
    assert(dv("days(d)", DateType, Int.box(0)) == "1970-01-01")
    assert(dv("truncate(3,s)", StringType, "abcdef") == "abc")
    assert(dv("truncate(3,s)", StringType, "ab") == "ab")
    assert(dv("truncate(10,v)", LongType, Long.box(-7L)) == "-10")
    // bucket is deterministic and in range
    val b = dv("bucket(8,id)", LongType, Long.box(42L))
    assert(b == dv("bucket(8,id)", LongType, Long.box(42L)) && b.toInt >= 0 && b.toInt < 8)
  }

  test("canSkip prunes source-column predicates through derived dirs") {
    val schema = StructType.fromDDL("id BIGINT, ts TIMESTAMP, s STRING")
    val days = Seq(PartitionTransform.parse("days(ts)"))
    def micros(s: String) = java.time.Instant.parse(s)
    val aug15 = Map("ts_days" -> "2026-08-15")
    def skip(fields: Seq[PartField], values: Map[String, String], f: Filter) =
      PartitionTransform.canSkip(schema, fields, values, f)
    // range on ts vs a day dir
    assert(skip(days, aug15, LessThan("ts", micros("2026-08-15T00:00:00Z"))))
    assert(!skip(days, aug15, LessThan("ts", micros("2026-08-15T00:00:01Z"))))
    assert(skip(days, aug15, GreaterThan("ts", micros("2026-08-15T23:59:59.999999Z"))))
    assert(!skip(days, aug15, GreaterThan("ts", micros("2026-08-15T23:59:59Z"))))
    assert(skip(days, aug15, EqualTo("ts", micros("2026-08-16T00:00:00Z"))))
    assert(!skip(days, aug15, EqualTo("ts", micros("2026-08-15T12:00:00Z"))))
    // And/Or composition
    assert(skip(days, aug15, And(IsNotNull("ts"), EqualTo("ts", micros("2026-08-16T01:00:00Z")))))
    assert(!skip(days, aug15, Or(EqualTo("ts", micros("2026-08-16T01:00:00Z")),
      EqualTo("ts", micros("2026-08-15T01:00:00Z")))))
    // null dir: only IS NULL keeps it
    val nullDir = Map("ts_days" -> BtrTableMeta.NullPartition)
    assert(skip(days, nullDir, EqualTo("ts", micros("2026-08-15T01:00:00Z"))))
    assert(!skip(days, nullDir, IsNull("ts")))
    assert(skip(days, aug15, IsNull("ts")))
    // bucket: equality prunes, ranges never
    val bucket = Seq(PartitionTransform.parse("bucket(8,id)"))
    val bVal = PartitionTransform.bucketOf(8, LongType, Long.box(42L))
    assert(!skip(bucket, Map("id_bucket_8" -> bVal.toString), EqualTo("id", 42L)))
    assert(skip(bucket, Map("id_bucket_8" -> ((bVal + 1) % 8).toString), EqualTo("id", 42L)))
    assert(!skip(bucket, Map("id_bucket_8" -> "0"), GreaterThan("id", 10L)))
    // truncate prefix dirs against string predicates
    val tr = Seq(PartitionTransform.parse("truncate(2,s)"))
    assert(skip(tr, Map("s_trunc_2" -> "ab"), EqualTo("s", "ac")))
    assert(!skip(tr, Map("s_trunc_2" -> "ab"), EqualTo("s", "abz")))
    assert(skip(tr, Map("s_trunc_2" -> "ab"), GreaterThan("s", "ac")))
    assert(!skip(tr, Map("s_trunc_2" -> "ab"), GreaterThan("s", "abq")))
    assert(skip(tr, Map("s_trunc_2" -> "ab"), LessThan("s", "ab")))
    assert(!skip(tr, Map("s_trunc_2" -> "ab"), LessThan("s", "ab0")))
    assert(skip(tr, Map("s_trunc_2" -> "ab"), StringStartsWith("s", "ac")))
    assert(!skip(tr, Map("s_trunc_2" -> "ab"), StringStartsWith("s", "a")))
  }

  // ---- end to end ------------------------------------------------------

  private def dirsOf(p: String): Seq[String] =
    new java.io.File(p).listFiles().filter(_.isDirectory)
      .map(_.getName).filterNot(_.startsWith("_")).sorted.toSeq

  test("CREATE TABLE PARTITIONED BY (days(ts)): dirs, round trip, pruning, DV delete") {
    import spark.implicits._
    val p = tmp("days")
    spark.sql(s"CREATE TABLE graft.`$p` (id BIGINT, ts TIMESTAMP, v DOUBLE) " +
      "USING btr PARTITIONED BY (days(ts)) TBLPROPERTIES ('btr.deletionVectors'='true')")
    // 3 UTC days, scattered over 4 input tasks
    val rows = (0 until 3000).map { i =>
      (i.toLong, java.sql.Timestamp.from(
        java.time.Instant.parse("2026-08-14T00:00:00Z").plusSeconds(i * 60L)), i * 0.5)
    }
    rows.toDF("id", "ts", "v").repartition(4)
      .writeTo(s"graft.`$p`").append()
    assert(dirsOf(p) == Seq("ts_days=2026-08-14", "ts_days=2026-08-15", "ts_days=2026-08-16"))
    // the source column survives in the files (full round trip)
    val back = spark.table(s"graft.`$p`")
    assert(back.count() == 3000)
    assert(back.agg(sum("id")).collect()(0).getLong(0) == rows.map(_._1).sum)
    assert(back.select(min("ts")).collect()(0).getTimestamp(0) == rows.head._2)
    // directory pruning: one day's predicate plans only that day's files
    val oneDay = back.filter(
      col("ts") >= lit("2026-08-15 00:00:00").cast("timestamp") &&
        col("ts") < lit("2026-08-16 00:00:00").cast("timestamp"))
    val planned = oneDay.rdd.getNumPartitions
    val allPlanned = back.rdd.getNumPartitions
    assert(planned < allPlanned,
      s"expected the day filter to plan fewer partitions ($planned vs $allPlanned)")
    val expected = rows.filter(r => {
      val t = r._2.toInstant
      !t.isBefore(java.time.Instant.parse("2026-08-15T00:00:00Z")) &&
        t.isBefore(java.time.Instant.parse("2026-08-16T00:00:00Z"))
    })
    assert(oneDay.count() == expected.length)
    assert(oneDay.agg(sum("id")).collect()(0).getLong(0) == expected.map(_._1).sum)
    // row-level DML is layout-agnostic: a merge-on-read DELETE on the
    // source column works and the masked reads stay exact
    spark.sql(s"DELETE FROM graft.`$p` WHERE ts < TIMESTAMP'2026-08-14 12:00:00'")
    val kept = rows.filterNot(_._2.toInstant.isBefore(
      java.time.Instant.parse("2026-08-14T12:00:00Z")))
    // files were masked, not rewritten (still 3 day dirs)
    assert(dirsOf(p).size == 3)
    val after = spark.table(s"graft.`$p`")
    assert(after.count() == kept.length &&
      after.agg(sum("id")).collect()(0).getLong(0) == kept.map(_._1).sum)
    // SHOW PARTITIONS surfaces the derived dirs
    val parts = spark.sql(s"SHOW PARTITIONS graft.`$p`").collect().map(_.getString(0)).sorted
    assert(parts.toSeq == Seq("ts_days=2026-08-14", "ts_days=2026-08-15", "ts_days=2026-08-16"),
      parts.mkString(","))
  }

  test("path writes declare transforms via btr.partitionSpec; few files per day") {
    import spark.implicits._
    val p = tmp("days-path")
    val rows = (0 until 2000).map { i =>
      (i.toLong, java.sql.Timestamp.from(
        java.time.Instant.parse("2026-01-10T00:00:00Z").plusSeconds(i * 90L)))
    }
    rows.toDF("id", "ts").repartition(4)
      .write.format("btr").mode("append")
      .option("btr.partitionSpec", "days(ts)").save(p)
    val dirs = dirsOf(p)
    assert(dirs.forall(_.startsWith("ts_days=")) && dirs.size >= 2, dirs.mkString(","))
    // the range-ordered write keeps each day to one file (boundary tasks
    // may split a day across two)
    val filesPerDir = dirs.map(d =>
      new java.io.File(s"$p/$d").listFiles().count(_.getName.endsWith(".btr")))
    assert(filesPerDir.forall(_ <= 2), filesPerDir.mkString(","))
    val back = spark.read.format("btr").load(p)
    assert(back.count() == 2000 &&
      back.agg(sum("id")).collect()(0).getLong(0) == rows.map(_._1).sum)
    // further appends pick the spec up from the table meta (no option)
    rows.take(10).map(r => (r._1 + 10000, r._2)).toDF("id", "ts")
      .write.format("btr").mode("append").save(p)
    assert(spark.read.format("btr").load(p).count() == 2010)
    // appends with a DIFFERENT spec refuse loudly
    val err = intercept[Exception] {
      rows.take(10).toDF("id", "ts").write.format("btr").mode("append")
        .option("btr.partitionSpec", "hours(ts)").save(p)
    }
    assert(err.getMessage.contains("partitioning"), err.getMessage)
  }

  test("bucket(8,id): equality prunes to the one bucket dir; answers exact") {
    import spark.implicits._
    val p = tmp("bucket")
    spark.sql(s"CREATE TABLE graft.`$p` (id BIGINT, s STRING) " +
      "USING btr PARTITIONED BY (bucket(8, id))")
    (0 until 4000).map(i => (i.toLong, s"row-$i")).toDF("id", "s")
      .repartition(4).writeTo(s"graft.`$p`").append()
    val dirs = dirsOf(p)
    assert(dirs.size == 8 && dirs.forall(_.startsWith("id_bucket_8=")), dirs.mkString(","))
    val one = spark.table(s"graft.`$p`").filter(col("id") === 1234L)
    assert(one.rdd.getNumPartitions <
      spark.table(s"graft.`$p`").rdd.getNumPartitions)
    assert(one.collect().map(_.getString(1)).toSeq == Seq("row-1234"))
  }

  test("mixed identity + transform spec: nested dirs, both prune") {
    import spark.implicits._
    val p = tmp("mixed")
    spark.sql(s"CREATE TABLE graft.`$p` (id BIGINT, region STRING, d DATE) " +
      "USING btr PARTITIONED BY (region, months(d))")
    val rows = (0 until 1200).map(i =>
      (i.toLong, s"r${i % 2}", java.sql.Date.valueOf(java.time.LocalDate.of(2026, 1 + i % 3, 5))))
    rows.toDF("id", "region", "d").repartition(4).writeTo(s"graft.`$p`").append()
    assert(dirsOf(p) == Seq("region=r0", "region=r1"))
    assert(dirsOf(s"$p/region=r0") ==
      Seq("d_months=2026-01", "d_months=2026-02", "d_months=2026-03"))
    val q = spark.table(s"graft.`$p`")
      .filter(col("region") === "r1" && col("d") >= lit("2026-03-01").cast("date"))
    val expect = rows.filter(r => r._2 == "r1" && !r._3.toLocalDate.isBefore(
      java.time.LocalDate.of(2026, 3, 1)))
    assert(q.count() == expect.length &&
      q.agg(sum("id")).collect()(0).getLong(0) == expect.map(_._1).sum)
    assert(q.rdd.getNumPartitions < spark.table(s"graft.`$p`").rdd.getNumPartitions)
  }

  test("maintenance on a transform table: compact, clustered rewrite, WHERE on derived dirs") {
    import spark.implicits._
    val p = tmp("maint")
    spark.sql(s"CREATE TABLE graft.`$p` (id BIGINT, ts TIMESTAMP) " +
      "USING btr PARTITIONED BY (days(ts))")
    // several small appends → many files per day dir
    (0 until 4).foreach { k =>
      (0 until 400).map { i =>
        (k * 1000L + i, java.sql.Timestamp.from(
          java.time.Instant.parse("2026-03-01T00:00:00Z").plusSeconds(i * 432L)))
      }.toDF("id", "ts").coalesce(1)
        .write.format("btr").mode("append")
        .option("btr.write.distribution", "local").save(p)
    }
    val totalBefore = spark.table(s"graft.`$p`").count()
    def files(day: String) =
      new java.io.File(s"$p/ts_days=$day").listFiles().count(_.getName.endsWith(".btr"))
    assert(files("2026-03-01") >= 4, "precondition: several files per day")
    // byte-merge compaction works per directory
    BtrCompact.compact(spark, p, 64L * 1024 * 1024)
    assert(files("2026-03-01") == 1)
    assert(spark.table(s"graft.`$p`").count() == totalBefore)
    // clustered rewrite leads with the SOURCE column; dirs preserved
    BtrCompact.rewriteClustered(spark, p, Seq("id"))
    assert(dirsOf(p) == Seq("ts_days=2026-03-01", "ts_days=2026-03-02"))
    assert(spark.table(s"graft.`$p`").agg(sum("id")).collect()(0).getLong(0) ==
      (0 until 4).flatMap(k => (0 until 400).map(i => k * 1000L + i)).sum)
    // OPTIMIZE ... WHERE filters transform dirs as ISO strings
    val keep = BtrCompact.partitionPredicateKeep(spark, p, "ts_days = '2026-03-02'")
    val (fs, root) = {
      val pp = new Path(p); val f = pp.getFileSystem(BtrTableMeta.hadoopConf())
      (f, f.makeQualified(pp))
    }
    val kept = BtrTableMeta.listDataFilesWithPartitions(fs, root).filter(keep)
    assert(kept.nonEmpty &&
      kept.forall(_.partitionValues.get("ts_days").contains("2026-03-02")))
    // FULL rewrite with WHERE on the derived dir (regression, ADVICE r13:
    // expr(where) failed analysis — ts_days is not a DataFrame column; the
    // rewrite now scopes the read by the keep-set's files instead)
    def names(day: String) = new java.io.File(s"$p/ts_days=$day").listFiles()
      .map(_.getName).filter(_.endsWith(".btr")).sorted.toSeq
    val day1Before = names("2026-03-01")
    val day2Before = names("2026-03-02")
    val (sel, _) = BtrCompact.rewriteClustered(spark, p, Seq("id"),
      where = Some("ts_days = '2026-03-02'"))
    assert(sel > 0, "the scoped rewrite must select the matching day's files")
    assert(names("2026-03-01") == day1Before, "out-of-scope day untouched")
    assert(names("2026-03-02") != day2Before, "in-scope day rewritten")
    assert(spark.table(s"graft.`$p`").count() == totalBefore)
    assert(spark.table(s"graft.`$p`").agg(sum("id")).collect()(0).getLong(0) ==
      (0 until 4).flatMap(k => (0 until 400).map(i => k * 1000L + i)).sum)
    // APPLY PURGE's WHERE rides the same file-scoped route (no masks here
    // → no-op, but the predicate must not fail analysis)
    assert(BtrCompact.purgeMasked(spark, p, where = Some("ts_days >= '2026-03-01'")) ==
      (0, 0))
  }

  test("UPDATE moves a row's new image into the RIGHT derived dir; streaming epochs too") {
    import spark.implicits._
    val p = tmp("dml-move")
    spark.sql(s"CREATE TABLE graft.`$p` (id BIGINT, ts TIMESTAMP) " +
      "USING btr PARTITIONED BY (days(ts)) TBLPROPERTIES ('btr.deletionVectors'='true')")
    (0 until 100).map(i => (i.toLong, java.sql.Timestamp.from(
      java.time.Instant.parse("2026-05-01T12:00:00Z").plusSeconds(i)))).toDF("id", "ts")
      .writeTo(s"graft.`$p`").append()
    assert(dirsOf(p) == Seq("ts_days=2026-05-01"))
    // shift half the rows one day forward: merge-on-read UPDATE masks the
    // old positions and APPENDS the new images — which must land under
    // the NEW day's directory (derived from the updated ts)
    spark.sql(s"UPDATE graft.`$p` SET ts = ts + INTERVAL 1 DAY WHERE id % 2 = 0")
    assert(dirsOf(p) == Seq("ts_days=2026-05-01", "ts_days=2026-05-02"))
    val may2 = spark.table(s"graft.`$p`")
      .filter(col("ts") >= lit("2026-05-02 00:00:00").cast("timestamp"))
    assert(may2.count() == 50 &&
      may2.select("id").collect().forall(_.getLong(0) % 2 == 0))
    assert(spark.table(s"graft.`$p`").count() == 100)

    // streaming epochs derive transform dirs the same way
    val sp = tmp("stream-days"); val src = tmp("stream-days-src"); val ck = tmp("stream-days-ck")
    spark.sql(s"CREATE TABLE graft.`$sp` (id BIGINT, ts TIMESTAMP) " +
      "USING btr PARTITIONED BY (days(ts))")
    (0 until 200).map(i => (i.toLong, java.sql.Timestamp.from(
      java.time.Instant.parse("2026-06-01T00:00:00Z").plusSeconds(i * 1000L))))
      .toDF("id", "ts").write.parquet(src)
    val q = spark.readStream.schema("id BIGINT, ts TIMESTAMP").parquet(src)
      .writeStream.format("btr").option("checkpointLocation", ck).start(sp)
    try q.processAllAvailable()
    finally q.stop()
    assert(dirsOf(sp) == Seq("ts_days=2026-06-01", "ts_days=2026-06-02", "ts_days=2026-06-03"))
    assert(spark.read.format("btr").load(sp).count() == 200)
  }

  test("GROUP BY the bucket source aggregates without an exchange") {
    import spark.implicits._
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val p = tmp("bucket-agg")
    spark.sql(s"CREATE TABLE graft.`$p` (id BIGINT, v DOUBLE) " +
      "USING btr PARTITIONED BY (bucket(8, id))")
    (0 until 4000).map(i => (i.toLong % 500, i * 1.0)).toDF("id", "v")
      .repartition(4).writeTo(s"graft.`$p`").append()
    val got = spark.table(s"graft.`$p`").groupBy("id").agg(sum("v").as("s"))
    val want = (0 until 4000).map(i => (i.toLong % 500, i * 1.0))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    val res = got.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(res == want)
    val withSpjConf = Seq("spark.sql.sources.v2.bucketing.enabled" -> "true")
    withSpjConf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val q = spark.table(s"graft.`$p`").groupBy("id").agg(sum("v").as("s"))
      q.collect()
      val shuffles = new org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {}
        .collect(q.queryExecution.executedPlan) { case e: ShuffleExchangeExec => e }
      // all rows of one id share a bucket dir, so the aggregate's
      // clustered distribution is satisfied by the key-grouped scan
      assert(shuffles.isEmpty,
        s"expected bucket key-grouped scan to satisfy GROUP BY id:\n${q.queryExecution.executedPlan}")
    } finally withSpjConf.foreach { case (k, _) => spark.conf.unset(k) }
  }

  test("ALTER guards transform sources; widening a bucket source keeps dirs consistent") {
    import spark.implicits._
    val p = tmp("alter-guard")
    spark.sql(s"CREATE TABLE graft.`$p` (id INT, ts TIMESTAMP, v DOUBLE) " +
      "USING btr PARTITIONED BY (days(ts), bucket(8, id))")
    (0 until 100).map(i => (i, java.sql.Timestamp.from(
      java.time.Instant.parse("2026-07-01T00:00:00Z").plusSeconds(i * 10L)), i * 1.0))
      .toDF("id", "ts", "v").writeTo(s"graft.`$p`").append()
    val ren = intercept[Exception](
      spark.sql(s"ALTER TABLE graft.`$p` RENAME COLUMN ts TO t2"))
    assert(ren.getMessage.contains("partition"), ren.getMessage)
    val drop = intercept[Exception](
      spark.sql(s"ALTER TABLE graft.`$p` DROP COLUMN id"))
    assert(drop.getMessage.contains("partition"), drop.getMessage)
    // widening a BUCKET source is safe: mix64 hashes ints through the
    // identical long path, so existing dirs stay consistent
    spark.sql(s"ALTER TABLE graft.`$p` ALTER COLUMN id TYPE BIGINT")
    val before = dirsOf(p).flatMap(d => dirsOf(s"$p/$d")).sorted
    (0 until 100).map(i => (i.toLong, java.sql.Timestamp.from(
      java.time.Instant.parse("2026-07-01T00:00:00Z").plusSeconds(i * 10L)), i * 2.0))
      .toDF("id", "ts", "v").writeTo(s"graft.`$p`").append()
    val after = dirsOf(p).flatMap(d => dirsOf(s"$p/$d")).distinct.sorted
    assert(after == before, s"widened append must reuse the same bucket dirs: $after vs $before")
    assert(spark.table(s"graft.`$p`").count() == 200)
  }

  test("dynamic overwrite replaces only the touched derived days") {
    import spark.implicits._
    val p = tmp("dyn-overwrite")
    spark.sql(s"CREATE TABLE graft.`$p` (id BIGINT, ts TIMESTAMP) " +
      "USING btr PARTITIONED BY (days(ts))")
    def day(d: Int, n: Int, base: Long) = (0 until n).map(i =>
      (base + i, java.sql.Timestamp.from(
        java.time.Instant.parse(f"2026-09-0$d%dT06:00:00Z").plusSeconds(i))))
    (day(1, 50, 0L) ++ day(2, 50, 100L) ++ day(3, 50, 200L))
      .toDF("id", "ts").writeTo(s"graft.`$p`").append()
    assert(spark.table(s"graft.`$p`").count() == 150)
    // reprocess day 2 only: dynamic overwrite drops just ts_days=2026-09-02
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      day(2, 20, 1000L).toDF("id", "ts").createOrReplaceTempView("day2_fix")
      spark.sql(s"INSERT OVERWRITE graft.`$p` SELECT id, ts FROM day2_fix")
    } finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    val t = spark.table(s"graft.`$p`")
    assert(t.count() == 120, s"expected 50+20+50, got ${t.count()}")
    val day2 = t.filter(col("ts") >= lit("2026-09-02 00:00:00").cast("timestamp") &&
      col("ts") < lit("2026-09-03 00:00:00").cast("timestamp"))
    assert(day2.count() == 20 && day2.select(min("id")).collect()(0).getLong(0) == 1000L)
    // untouched days keep their original rows
    assert(t.filter(col("id") < 100).count() == 50 &&
      t.filter(col("id") >= 200 && col("id") < 1000).count() == 50)
  }

  test("change feed over a transform table: appends and DV deletes emit exact rows") {
    import spark.implicits._
    val p = tmp("cdc")
    spark.sql(s"CREATE TABLE graft.`$p` (id BIGINT, ts TIMESTAMP) " +
      "USING btr PARTITIONED BY (days(ts)) " +
      "TBLPROPERTIES ('btr.deletionVectors'='true', 'btr.retainRemoved'='true')")
    (0 until 60).map(i => (i.toLong, java.sql.Timestamp.from(
      java.time.Instant.parse("2026-10-01T00:00:00Z").plusSeconds(i * 2000L))))
      .toDF("id", "ts").writeTo(s"graft.`$p`").append()
    val (fs, root) = {
      val pp = new Path(p); val f = pp.getFileSystem(BtrTableMeta.hadoopConf())
      (f, f.makeQualified(pp))
    }
    val v0 = BtrLog.latestVersion(fs, root).get
    (100 until 110).map(i => (i.toLong, java.sql.Timestamp.from(
      java.time.Instant.parse("2026-10-05T00:00:00Z").plusSeconds(i))))
      .toDF("id", "ts").writeTo(s"graft.`$p`").append()
    spark.sql(s"DELETE FROM graft.`$p` WHERE id < 5")
    val v2 = BtrLog.latestVersion(fs, root).get
    val feed = BtrChanges.between(spark, p, v0, v2)
    val byType = feed.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType.getOrElse("insert", 0L) == 10, byType.toString)
    assert(byType.getOrElse("delete", 0L) == 5, byType.toString)
    assert(feed.filter(col("_change_type") === "delete")
      .select("id").as[Long].collect().sorted.toSeq == (0L until 5L))
  }

  test("APPLY PURGE and DROP PARTITION work on derived dirs") {
    import spark.implicits._
    val p = tmp("purge-drop")
    spark.sql(s"CREATE TABLE graft.`$p` (id BIGINT, ts TIMESTAMP) " +
      "USING btr PARTITIONED BY (days(ts)) TBLPROPERTIES ('btr.deletionVectors'='true')")
    def rows(d: String, n: Int, base: Long) = (0 until n).map(i =>
      (base + i, java.sql.Timestamp.from(
        java.time.Instant.parse(s"$d:00Z").plusSeconds(i))))
    (rows("2026-11-01T01:00", 100, 0L) ++ rows("2026-11-02T01:00", 100, 1000L))
      .toDF("id", "ts").writeTo(s"graft.`$p`").append()
    // mask 40% of day 1's file, then purge: the masked file rewrites
    // inside its derived dir, the untouched day survives as-is
    spark.sql(s"DELETE FROM graft.`$p` WHERE id < 40")
    val (fs, root) = {
      val pp = new Path(p); val f = pp.getFileSystem(BtrTableMeta.hadoopConf())
      (f, f.makeQualified(pp))
    }
    def blobs = fs.listStatus(new Path(root, graft.format.DeletionVector.DvDir))
      .count(!_.getPath.getName.startsWith("."))
    assert(blobs > 0, "precondition: masks exist")
    val (rewritten, _) = BtrCompact.purgeMasked(spark, p, 64L * 1024 * 1024)
    assert(rewritten >= 1)
    assert(blobs == 0, "purge must retire the applied blobs")
    assert(dirsOf(p) == Seq("ts_days=2026-11-01", "ts_days=2026-11-02"))
    assert(spark.table(s"graft.`$p`").count() == 160)
    // DROP PARTITION addresses the derived dir
    spark.sql(s"ALTER TABLE graft.`$p` DROP PARTITION (ts_days = '2026-11-01')")
    assert(spark.table(s"graft.`$p`").count() == 100)
    assert(spark.table(s"graft.`$p`").select(min("id")).collect()(0).getLong(0) == 1000L)
  }

  test("btr_partitions reports per-dir files/rows/bytes and mask debt") {
    import spark.implicits._
    val p = tmp("inspect")
    spark.sql(s"CREATE TABLE graft.`$p` (id BIGINT, ts TIMESTAMP) " +
      "USING btr PARTITIONED BY (days(ts)) TBLPROPERTIES ('btr.deletionVectors'='true')")
    (0 until 200).map(i => (i.toLong, java.sql.Timestamp.from(
      java.time.Instant.parse("2026-12-01T00:00:00Z").plusSeconds(i * 600L))))
      .toDF("id", "ts").writeTo(s"graft.`$p`").append()
    spark.sql(s"DELETE FROM graft.`$p` WHERE id < 30") // masks day 1 only
    val rows = graft.functions.BtrInspect.partitions(spark, p).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(4))).toMap
    assert(rows.keySet == Set("ts_days=2026-12-01", "ts_days=2026-12-02"))
    assert(rows.values.map(_._2).sum == 200, "rows include masked positions (physical view)")
    assert(rows("ts_days=2026-12-01")._3 == 30 && rows("ts_days=2026-12-02")._3 == 0,
      rows.toString)
    assert(rows.values.forall(v => v._1 >= 1))
  }

  test("day-aligned retention DELETE classifies from the listing alone (zero footer I/O)") {
    import spark.implicits._
    val p = tmp("retention")
    spark.sql(s"CREATE TABLE graft.`$p` (id BIGINT, ts TIMESTAMP) " +
      "USING btr PARTITIONED BY (days(ts))")
    (0 until 300).map(i => (i.toLong, java.sql.Timestamp.from(
      java.time.Instant.parse("2027-01-01T00:00:00Z").plusSeconds(i * 1000L))))
      .toDF("id", "ts").writeTo(s"graft.`$p`").append()
    // break every data file's TAIL in a copy: any footer read now throws,
    // so a verdict on the copy is PROOF it came from directory names
    val p2 = tmp("retention-broken")
    org.apache.commons.io.FileUtils.copyDirectory(new java.io.File(p), new java.io.File(p2))
    def breakTails(d: java.io.File): Unit = d.listFiles().foreach { f =>
      if (f.isDirectory) breakTails(f)
      else if (f.getName.endsWith(".btr")) {
        val ch = java.nio.channels.FileChannel.open(f.toPath,
          java.nio.file.StandardOpenOption.WRITE)
        try ch.truncate(4L) finally ch.close()
      } else if (f.getName == graft.format.BtrFooterIndex.IndexFile) f.delete()
    }
    breakTails(new java.io.File(p2))
    val (fs2, root2) = {
      val pp = new Path(p2); val f = pp.getFileSystem(BtrTableMeta.hadoopConf())
      (f, f.makeQualified(pp))
    }
    val schema = BtrTableMeta.readSchema(fs2, root2)
    val partCols = BtrTableMeta.readPartitionCols(fs2, root2)
    // day-aligned retention predicate: every file decides from its dir
    val boundary = java.time.Instant.parse("2027-01-03T00:00:00Z")
    val aligned = Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.LessThan("ts", boundary))
    assert(BtrDelete.canDelete(p2, schema, partCols, aligned),
      "aligned predicate must split at file boundaries with no footer read")
    val verdicts = BtrDelete.classifyAt(p2, schema, partCols, aligned)
    assert(verdicts.nonEmpty && verdicts.forall(_._2 != BtrDelete.Undecided))
    verdicts.foreach { case (e, v) =>
      val day = e.partitionValues("ts_days")
      val expect = if (day < "2027-01-03") BtrDelete.MatchAll else BtrDelete.MatchNone
      assert(v == expect, s"$day -> $v")
    }
    // an UNALIGNED predicate genuinely needs footers — on the broken
    // copy that read must fail loudly, proving the aligned case above
    // never took the footer route
    val unaligned = Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.LessThan("ts",
        java.time.Instant.parse("2027-01-03T11:30:00Z")))
    intercept[Exception](BtrDelete.classifyAt(p2, schema, partCols, unaligned))
  }

  test("validation refuses bad sources before any meta lands") {
    val p = tmp("bad")
    val e1 = intercept[Exception](spark.sql(
      s"CREATE TABLE graft.`$p` (id BIGINT, s STRING) USING btr PARTITIONED BY (days(s))"))
    assert(e1.getMessage.contains("timestamp or date"), e1.getMessage)
    assert(!new java.io.File(p, "_btr_meta.json").exists())
    val e2 = intercept[Exception](spark.sql(
      s"CREATE TABLE graft.`$p` (id BIGINT) USING btr PARTITIONED BY (days(nope))"))
    // Spark's own analyzer may reject the unknown column before our check
    assert(e2.getMessage.contains("unknown column") ||
      e2.getMessage.contains("Couldn't find column"), e2.getMessage)
    // the option form validates through our parser
    val e3 = intercept[Exception](PartitionTransform.validate(
      PartitionTransform.parse("days(nope)"), StructType.fromDDL("id BIGINT")))
    assert(e3.getMessage.contains("unknown column"), e3.getMessage)
  }
}
