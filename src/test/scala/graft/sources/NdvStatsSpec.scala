package graft.sources

import graft.format._
import org.apache.spark.sql.{SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Footer NDV sketches end to end: the writer embeds per-column
  * HyperLogLog registers (format v6), planning merges them into the DSv2
  * column statistics Catalyst's CBO consumes (distinctCount/min/max/
  * nullCount on the optimized plan's scan relation), compaction unions
  * them without re-encoding, and `btr.ndv.enabled=false` opts out
  * cleanly (absent, never wrong).
  */
class NdvStatsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("ndv-stats-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(name: String) = {
    val d = s"/tmp/ndv-stats-spec/$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
    d
  }

  private def sampleDf(n: Int) = {
    import spark.implicits._
    spark.range(n.toLong).select(
      (col("id") % 1000).cast("int").as("k_int"),
      concat(lit("user-"), (col("id") % 97).cast("string")).as("k_str"),
      (col("id") % 411).cast("double").as("k_dbl"),
      when(col("id") % 5 === 0, null).otherwise(col("id") % 13).cast("long").as("k_null"),
      array((col("id") % 3).cast("float")).as("k_arr"))
  }

  private def ndvMap(path: String): Map[String, (Long, Option[Long])] =
    graft.functions.BtrInspect.ndvEstimates(spark, path).collect().map { r =>
      r.getString(0) -> (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3)))
    }.toMap

  test("writer embeds sketches; ndvEstimates lands within 5% per column") {
    val dir = tmp("basic")
    sampleDf(20000).write.format("btr").mode("overwrite").save(dir)
    val m = ndvMap(dir)
    def check(colName: String, expected: Long): Unit = {
      val est = m(colName)._2.getOrElse(fail(s"$colName: no sketch"))
      assert(math.abs(est - expected).toDouble / expected <= 0.05,
        s"$colName est=$est expected=$expected")
    }
    check("k_int", 1000)
    check("k_str", 97)
    check("k_dbl", 411)
    check("k_null", 13)
    // array columns carry no sketch
    assert(m("k_arr")._2.isEmpty)
    // nulls counted from chunk metas, exactly
    assert(m("k_null")._1 == 4000L)
  }

  test("optimized plan carries CBO column stats from footers") {
    val dir = tmp("plan-stats")
    sampleDf(20000).write.format("btr").mode("overwrite").save(dir)
    val df = spark.read.format("btr").load(dir).select("k_int", "k_null")
    val rel = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r
    }
    assert(rel.nonEmpty, "expected a DataSourceV2ScanRelation in the optimized plan")
    val stats = rel.head.computeStats()
    assert(stats.rowCount.contains(BigInt(20000)))
    val byName = stats.attributeStats.map { case (a, s) => a.name -> s }
    val kInt = byName("k_int")
    assert(kInt.distinctCount.exists(d =>
      (d - BigInt(1000)).abs.toDouble / 1000.0 <= 0.05), s"k_int: ${kInt.distinctCount}")
    assert(kInt.min.contains(0) && kInt.max.contains(999), s"k_int min/max: ${kInt.min}/${kInt.max}")
    assert(kInt.nullCount.contains(BigInt(0)))
    val kNull = byName("k_null")
    assert(kNull.nullCount.contains(BigInt(4000)))
    assert(kNull.min.contains(0L) && kNull.max.contains(12L),
      s"k_null min/max: ${kNull.min}/${kNull.max}")
  }

  test("partition columns report exact NDV and min/max from the listing") {
    val dir = tmp("part")
    spark.range(5000)
      .select((col("id") % 7).cast("int").as("p"), col("id").as("v"))
      .write.format("btr").mode("overwrite").partitionBy("p").save(dir)
    val df = spark.read.format("btr").load(dir)
    val rel = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r
    }.head
    val byName = rel.computeStats().attributeStats.map { case (a, s) => a.name -> s }
    val p = byName("p")
    assert(p.distinctCount.contains(BigInt(7)))
    assert(p.min.contains(0) && p.max.contains(6))
    assert(p.nullCount.contains(BigInt(0)))
    val m = ndvMap(dir)
    assert(m("p")._2.contains(7L))
  }

  test("footer-level compaction unions sketches without re-encoding") {
    val dir = tmp("compact")
    import spark.implicits._
    // two appends -> multiple small files with overlapping value ranges
    spark.range(8000).select((col("id") % 500).as("k"))
      .repartition(4).write.format("btr").mode("overwrite").save(dir)
    spark.range(8000).select(((col("id") % 500) + 250).as("k"))
      .repartition(4).write.format("btr").mode("append").save(dir)
    BtrCompact.compact(spark, dir, targetBytes = 1L << 30)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(BtrTableMeta.hadoopConf())
    val files = BtrTableMeta.listDataFilesWithPartitions(fs, new org.apache.hadoop.fs.Path(dir))
    assert(files.length < 8, s"compaction should shrink the file count, got ${files.length}")
    val est = ndvMap(dir)("k")._2.getOrElse(fail("no sketch after compaction"))
    // union of [0,500) and [250,750) = 750 distinct
    assert(math.abs(est - 750).toDouble / 750 <= 0.05, s"est=$est")
  }

  test("btr.ndv.enabled=false writes no sketches; stats stay absent, never wrong") {
    val dir = tmp("disabled")
    sampleDf(5000).write.format("btr").mode("overwrite").option("btr.ndv.enabled", "false").save(dir)
    val m = ndvMap(dir)
    assert(m("k_int")._2.isEmpty)
    val df = spark.read.format("btr").load(dir).select("k_int")
    val rel = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r
    }.head
    val byName = rel.computeStats().attributeStats.map { case (a, s) => a.name -> s }
    val kInt = byName("k_int")
    assert(kInt.distinctCount.isEmpty)
    // min/max/nullCount come from chunk metas and survive without sketches
    assert(kInt.min.contains(0) && kInt.max.contains(999))
  }

  test("schema evolution: added column estimates over post-widening files only") {
    val dir = tmp("evolve")
    spark.range(4000).select((col("id") % 100).cast("int").as("a"))
      .write.format("btr").mode("overwrite").save(dir)
    spark.range(4000).select((col("id") % 100).cast("int").as("a"),
        (col("id") % 37).cast("long").as("b"))
      .write.format("btr").mode("append").save(dir)
    val m = ndvMap(dir)
    val estA = m("a")._2.getOrElse(fail("a: no sketch"))
    assert(math.abs(estA - 100).toDouble / 100 <= 0.05, s"a est=$estA")
    val estB = m("b")._2.getOrElse(fail("b: no sketch"))
    assert(math.abs(estB - 37).toDouble / 37 <= 0.06, s"b est=$estB")
    // pre-widening rows read b as null and are counted as such
    assert(m("b")._1 == 4000L)
  }

  test("CBO consumes the stats: filter selectivity estimated from footer min/max") {
    val dir = tmp("cbo")
    sampleDf(20000).write.format("btr").mode("overwrite").save(dir)
    val prev = spark.conf.getOption("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      // k_int is uniform over [0,1000); a < 100 filter should estimate
      // ~10% of the rows via FilterEstimation's range math over the
      // reported min/max — not the no-stats default selectivity
      val df = spark.read.format("btr").load(dir).filter(col("k_int") < 100)
      val est = df.queryExecution.optimizedPlan.stats.rowCount
      assert(est.isDefined, "CBO should produce a row-count estimate")
      assert(est.get > BigInt(1000) && est.get < BigInt(4000),
        s"expected ~2000 estimated rows, got ${est.get}")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.cbo.enabled", v)
        case None => spark.conf.unset("spark.sql.cbo.enabled")
      }
    }
  }

  test("TIMESTAMP_NTZ columns report no stats: Spark's FilterEstimation lacks the type") {
    // Spark 4.1's FilterEstimation.evaluateBinary is entered whenever the
    // column HAS a stats entry and its type match has no TimestampNTZType
    // case — any entry (even NDV-only) would MatchError every cbo-enabled
    // binary filter on the column. NTZ columns therefore report nothing.
    val dir = tmp("ntz")
    spark.range(1000)
      .selectExpr("timestampadd(HOUR, CAST(id % 48 AS INT), TIMESTAMP_NTZ'2026-01-01 00:00:00') AS ts",
        "id AS v")
      .write.format("btr").mode("overwrite").save(dir)
    val prev = spark.conf.getOption("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val df = spark.read.format("btr").load(dir)
        .filter(col("ts") > lit("2026-01-01 10:00:00").cast("timestamp_ntz"))
      // the crash happened at OPTIMIZATION time — stats estimation runs here
      assert(df.queryExecution.optimizedPlan.stats.sizeInBytes > 0)
      assert(df.count() > 0)
      val rel = df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r
      }.head
      val byName = rel.computeStats().attributeStats.map { case (a, s) => a.name -> s }
      assert(!byName.contains("ts"), "NTZ column must carry no stats entry")
      assert(byName.contains("v"), "sibling columns keep their stats")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.cbo.enabled", v)
        case None => spark.conf.unset("spark.sql.cbo.enabled")
      }
    }
  }

  test("mixed enabled/disabled appends degrade to unknown, not to a wrong estimate") {
    val dir = tmp("mixed")
    spark.range(2000).select((col("id") % 50).as("k")).write.format("btr").mode("overwrite").save(dir)
    spark.range(2000).select((col("id") % 50).as("k"))
      .write.format("btr").option("btr.ndv.enabled", "false").mode("append").save(dir)
    assert(ndvMap(dir)("k")._2.isEmpty)
  }
}
