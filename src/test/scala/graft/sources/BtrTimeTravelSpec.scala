package graft.sources

import graft.format.BtrTableMeta
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Time travel over the `_btr_log/` snapshot sidecar: every mutating
  * commit records the visible file set; `VERSION AS OF` / `TIMESTAMP AS
  * OF` (SQL) and `btr.versionAsOf` / `btr.timestampAsOf` (path API) plan
  * exactly that set. History ends where physical file lifetimes end —
  * a snapshot referencing files an overwrite/OPTIMIZE removed fails
  * LOUDLY, never serves survivors as a plausible historical view.
  */
class BtrTimeTravelSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("time-travel-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.catalog.graft", "graft.sources.BtrCatalog")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(name: String) = {
    val d = s"/tmp/btr-tt-spec/$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
    d
  }

  private def fsRoot(dir: String) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(BtrTableMeta.hadoopConf())
    (fs, fs.makeQualified(p))
  }

  private def readAsOf(dir: String, v: Long) =
    spark.read.format("btr").option("btr.versionAsOf", v.toString).load(dir)

  test("appends record versions; each version reads its own row set") {
    val dir = tmp("appends")
    import spark.implicits._
    Seq(1, 2, 3).toDF("x").write.format("btr").mode("overwrite").save(dir)
    Seq(4, 5).toDF("x").write.format("btr").mode("append").save(dir)
    Seq(6).toDF("x").write.format("btr").mode("append").save(dir)

    assert(readAsOf(dir, 1).as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
    assert(readAsOf(dir, 2).as[Int].collect().sorted.toSeq == Seq(1, 2, 3, 4, 5))
    assert(readAsOf(dir, 3).as[Int].collect().sorted.toSeq == Seq(1, 2, 3, 4, 5, 6))
    // current read is unaffected by the log
    assert(spark.read.format("btr").load(dir).count() == 6)
    // unknown version names the retained range
    val e = intercept[Exception] { readAsOf(dir, 99).collect() }
    assert(e.getMessage.contains("no snapshot v99"), e.getMessage)
  }

  test("timestamp travel resolves the newest snapshot at or before t") {
    val dir = tmp("ts")
    import spark.implicits._
    Seq("a").toDF("s").write.format("btr").mode("overwrite").save(dir)
    Thread.sleep(5)
    Seq("b").toDF("s").write.format("btr").mode("append").save(dir)
    val (fs, root) = fsRoot(dir)
    val hist = BtrLog.history(fs, root)
    assert(hist.map(_.version) == Seq(2L, 1L))
    val t1micros = hist.last.tsMillis * 1000L
    val got = spark.read.format("btr")
      .option("btr.timestampAsOf", t1micros.toString).load(dir)
      .as[String].collect().toSeq
    assert(got == Seq("a"))
    // a pre-history timestamp fails with the oldest retained version
    val e = intercept[Exception] {
      spark.read.format("btr").option("btr.timestampAsOf", "1000").load(dir).collect()
    }
    assert(e.getMessage.contains("no snapshot at or before"), e.getMessage)
  }

  test("history before an overwrite fails loudly (files physically removed)") {
    val dir = tmp("overwrite")
    import spark.implicits._
    Seq(1, 2).toDF("x").write.format("btr").mode("overwrite").save(dir)
    Seq(9).toDF("x").write.format("btr").mode("overwrite").save(dir)
    assert(readAsOf(dir, 2).as[Int].collect().toSeq == Seq(9))
    val e = intercept[Exception] { readAsOf(dir, 1).collect() }
    assert(e.getMessage.contains("no longer exist"), e.getMessage)
  }

  test("DELETE records a version; pre-delete snapshots of pruned files fail loudly") {
    val dir = tmp("delete")
    import spark.implicits._
    // two files via two appends so DELETE can drop one at file granularity
    Seq(1, 2).toDF("x").write.format("btr").mode("overwrite").save(dir)
    Seq(100, 200).toDF("x").write.format("btr").mode("append").save(dir)
    spark.sql(s"DELETE FROM graft.`$dir` WHERE x >= 100")
    val (fs, root) = fsRoot(dir)
    val hist = BtrLog.history(fs, root)
    assert(hist.head.action == "delete")
    // newest snapshot reads the survivors
    assert(readAsOf(dir, hist.head.version).as[Int].collect().sorted.toSeq == Seq(1, 2))
    // the pre-delete snapshot references the deleted file
    val e = intercept[Exception] { readAsOf(dir, 2).collect() }
    assert(e.getMessage.contains("no longer exist"), e.getMessage)
  }

  test("SQL VERSION AS OF / TIMESTAMP AS OF through the catalog") {
    val dir = tmp("sql")
    spark.sql(s"CREATE TABLE graft.`$dir` (k INT, v STRING) USING btr")
    spark.sql(s"INSERT INTO graft.`$dir` VALUES (1, 'one')")
    spark.sql(s"INSERT INTO graft.`$dir` VALUES (2, 'two')")
    assert(spark.sql(s"SELECT k FROM graft.`$dir` VERSION AS OF 1")
      .collect().map(_.getInt(0)).toSeq == Seq(1))
    assert(spark.sql(s"SELECT count(*) FROM graft.`$dir` VERSION AS OF 2")
      .head().getLong(0) == 2L)
    val (fs, root) = fsRoot(dir)
    val t2 = BtrLog.history(fs, root).head.tsMillis
    val lit = java.time.Instant.ofEpochMilli(t2).toString.replace("T", " ").replace("Z", "")
    assert(spark.sql(s"SELECT count(*) FROM graft.`$dir` TIMESTAMP AS OF '$lit'")
      .head().getLong(0) == 2L)
  }

  test("compaction records an optimize version; post-optimize snapshot reads the merged file") {
    val dir = tmp("optimize")
    import spark.implicits._
    Seq(1, 2).toDF("x").write.format("btr").mode("overwrite").save(dir)
    Seq(3, 4).toDF("x").write.format("btr").mode("append").save(dir)
    BtrCompact.compact(spark, dir, targetBytes = 1L << 30)
    val (fs, root) = fsRoot(dir)
    val hist = BtrLog.history(fs, root)
    assert(hist.head.action == "optimize")
    assert(hist.head.files.length == 1)
    assert(readAsOf(dir, hist.head.version).as[Int].collect().sorted.toSeq == Seq(1, 2, 3, 4))
    // pre-optimize snapshots reference spliced-away sources
    val e = intercept[Exception] { readAsOf(dir, 2).collect() }
    assert(e.getMessage.contains("no longer exist"), e.getMessage)
  }

  test("partitioned tables travel with partition dirs in the snapshot") {
    val dir = tmp("part")
    import spark.implicits._
    Seq((1, "a"), (2, "b")).toDF("x", "p")
      .write.format("btr").partitionBy("p").mode("overwrite").save(dir)
    Seq((3, "a")).toDF("x", "p")
      .write.format("btr").partitionBy("p").mode("append").save(dir)
    assert(readAsOf(dir, 1).agg(sum("x")).head().getLong(0) == 3L)
    assert(readAsOf(dir, 2).agg(sum("x")).head().getLong(0) == 6L)
    // partition pruning composes with the pinned file set
    assert(readAsOf(dir, 2).filter(col("p") === "a").agg(sum("x")).head().getLong(0) == 4L)
  }

  test("metadata-only aggregates answer from the PINNED snapshot's footers") {
    val dir = tmp("agg")
    import spark.implicits._
    Seq(1, 2).toDF("x").write.format("btr").mode("overwrite").save(dir)
    Seq(3).toDF("x").write.format("btr").mode("append").save(dir)
    // COUNT/MIN/MAX over v1 must see only the first commit (the CURRENT
    // footers say 3 rows, max 3) — and still push to the metadata scan
    val v1 = readAsOf(dir, 1).agg(count(lit(1)), max(col("x")))
    assert(v1.head().getLong(0) == 2L && v1.head().getInt(1) == 2)
    val scans = v1.queryExecution.sparkPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
    }
    assert(scans.exists(_.isInstanceOf[BtrAggScan]), scans.map(_.getClass).mkString(","))
    val cur = spark.read.format("btr").load(dir).agg(count(lit(1)))
    assert(cur.head().getLong(0) == 3L)
  }

  test("streaming a pinned snapshot is refused") {
    val dir = tmp("stream")
    import spark.implicits._
    Seq(1).toDF("x").write.format("btr").mode("overwrite").save(dir)
    val e = intercept[Exception] {
      spark.readStream.format("btr").option("btr.versionAsOf", "1").load(dir)
        .writeStream.format("memory").queryName("tt_refuse").start()
        .processAllAvailable()
    }
    assert(e.getMessage != null)
  }

  test("RESTORE VERSION AS OF rewinds appends metadata-only; refuses pruned history") {
    val dir = tmp("restore")
    spark.conf.set("spark.sql.catalog.graft", classOf[BtrCatalog].getName)
    import spark.implicits._
    Seq(1, 2).toDF("x").write.format("btr").mode("overwrite").save(dir)
    Seq(100).toDF("x").write.format("btr").mode("append").save(dir)
    Seq(200).toDF("x").write.format("btr").mode("append").save(dir)
    assert(spark.read.format("btr").load(dir).count() == 4)

    // this spec's session predates the parser extension — parse the verb
    // explicitly (GraftExtensionsSpec covers injection) and run it
    val parser = new BtrSparkSqlParser(spark.sessionState.sqlParser)
    def restoreSql(sql: String) =
      parser.parsePlan(sql).asInstanceOf[BtrRestoreCommand].run(spark).head
    val res = restoreSql(s"RESTORE TABLE graft.`$dir` TO VERSION AS OF 1")
    // two appended files dropped; v1's own files (one per non-empty
    // write partition) kept
    assert(res.getLong(1) == 1L && res.getLong(2) == 2L && res.getLong(3) >= 1L, res.toString)
    assert(spark.read.format("btr").load(dir)
      .as[Int].collect().sorted.toSeq == Seq(1, 2))
    // the restore is itself a version (action "restore"), newest in history
    val (fs, root) = fsRoot(dir)
    assert(BtrLog.history(fs, root).head.action == "restore")
    // idempotent: restoring to the same state drops nothing
    val again = restoreSql(s"RESTORE graft.`$dir` VERSION AS OF 1")
    assert(again.getLong(2) == 0L)
    // rewinding PAST an overwrite that removed files refuses loudly
    Seq(9).toDF("x").write.format("btr").mode("overwrite").save(dir)
    val e = intercept[Exception] {
      restoreSql(s"RESTORE graft.`$dir` VERSION AS OF 1")
    }
    assert(e.getMessage.contains("no longer exist"), e.getMessage)
  }

  test("log entries parse back exotic file names") {
    val entry = BtrLog.parse(
      """{"version":7,"ts":1755000000123,"action":"append","files":["a b.btr","p=x%2Fy/c\"d.btr"]}""")
    assert(entry == BtrLog.Entry(7L, 1755000000123L, "append",
      Seq("a b.btr", "p=x%2Fy/c\"d.btr")))
  }

  test("btr_history TVF lists the retained versions") {
    val dir = tmp("tvf")
    graft.GraftExtensions.register(spark)
    import spark.implicits._
    Seq(1).toDF("x").write.format("btr").mode("overwrite").save(dir)
    Seq(2).toDF("x").write.format("btr").mode("append").save(dir)
    val rows = spark.sql(
      s"SELECT version, action, n_files, readable FROM btr_history('$dir')").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(3))).toSeq ==
      Seq((2L, "append", 2L, true), (1L, "overwrite", 1L, true)))
    // an overwrite truncates readable history; btr_history shows it
    Seq(9).toDF("x").write.format("btr").mode("overwrite").save(dir)
    val after = spark.sql(s"SELECT version, readable FROM btr_history('$dir')").collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).toSeq
    assert(after == Seq((3L, true), (2L, false), (1L, false)), after.toString)
  }
}
