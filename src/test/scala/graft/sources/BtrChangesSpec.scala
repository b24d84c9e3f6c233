package graft.sources

import graft.format.BtrTableMeta
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental change reads over the snapshot log (BtrChanges): the
  * file-level fast path plans exactly the files added in `(from, to]`,
  * attributes rows to their first-visible commit, refuses removed
  * history LOUDLY, and the row-level diff fallback emits inserts AND
  * deletes as a multiset difference of two readable snapshots.
  */
class BtrChangesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("changes-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.catalog.graft", "graft.sources.BtrCatalog")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(name: String) = {
    val d = s"/tmp/btr-changes-spec/$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
    d
  }

  private def fsRoot(dir: String) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(BtrTableMeta.hadoopConf())
    (fs, fs.makeQualified(p))
  }

  test("betweenTimestamps() maps wall-clock bounds to snapshot versions") {
    val dir = tmp("by-time")
    import spark.implicits._
    val (fs, root) = fsRoot(dir)
    Seq(1).toDF("x").write.format("btr").mode("overwrite").save(dir)   // v1
    val t1 = BtrLog.readEntry(fs, root, 1L).tsMillis
    Thread.sleep(10)
    Seq(2).toDF("x").write.format("btr").mode("append").save(dir)      // v2
    Thread.sleep(10)
    Seq(3).toDF("x").write.format("btr").mode("append").save(dir)      // v3
    val t3 = BtrLog.readEntry(fs, root, 3L).tsMillis

    // (t1, t3] covers exactly v2 and v3
    val got = BtrChanges.betweenTimestamps(spark, dir, t1, t3)
      .select(col("x"), col("_commit_version"))
      .as[(Int, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((2, 2L), (3, 3L)), got.toString)
    // bounds BEFORE the first commit bootstrap from the pre-table state
    val all = BtrChanges.betweenTimestamps(spark, dir, t1 - 1000, t3)
      .select(col("x")).as[Int].collect().sorted.toSeq
    assert(all == Seq(1, 2, 3))
    // an empty window is an EMPTY feed (a scheduled pipeline's no-new-
    // data case), not an error
    assert(BtrChanges.betweenTimestamps(spark, dir, t3, t3).isEmpty)
  }

  test("between() returns exactly the appended rows, attributed per commit") {
    val dir = tmp("appends")
    import spark.implicits._
    Seq(1, 2, 3).toDF("x").write.format("btr").mode("overwrite").save(dir) // v1
    Seq(4, 5).toDF("x").write.format("btr").mode("append").save(dir)       // v2
    Seq(6).toDF("x").write.format("btr").mode("append").save(dir)          // v3

    val all = BtrChanges.between(spark, dir, 1L, 3L)
      .select(col("x"), col("_commit_version"), col("_change_type"))
      .as[(Int, Long, String)].collect().sortBy(_._1).toSeq
    assert(all == Seq((4, 2L, "insert"), (5, 2L, "insert"), (6, 3L, "insert")))

    val last = BtrChanges.between(spark, dir, 2L, 3L)
      .select(col("x")).as[Int].collect().toSeq
    assert(last == Seq(6))
  }

  test("empty range yields an empty feed with the feed schema") {
    val dir = tmp("empty")
    import spark.implicits._
    Seq(1).toDF("x").write.format("btr").mode("overwrite").save(dir) // v1
    val feed = BtrChanges.between(spark, dir, 1L, 1L)
    assert(feed.columns.toSeq == Seq("x", "_change_type", "_commit_version"))
    assert(feed.count() == 0)
  }

  test("the feed scan plans only the added files; pushdown applies on top") {
    val dir = tmp("pruned")
    import spark.implicits._
    // v1 is large, the increment small: the feed must not read v1's file
    (1 to 10000).toDF("x").write.format("btr").mode("overwrite").save(dir)
    Seq(20001, 20002).toDF("x").write.format("btr").mode("append").save(dir)

    val feed = spark.read.format("btr")
      .option("btr.changesFromVersion", "1").load(dir)
    val planned = feed.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    // one data file per commit here; the scan's statistics see only the
    // small increment
    val scanned = feed.queryExecution.optimizedPlan.stats.sizeInBytes
    val fullScan = spark.read.format("btr").load(dir)
      .queryExecution.optimizedPlan.stats.sizeInBytes
    assert(scanned * 3 < fullScan,
      s"feed should plan only the increment: feed=$scanned full=$fullScan\n$planned")
    assert(feed.as[Int].collect().sorted.toSeq == Seq(20001, 20002))
    // filters compose with the restricted file set
    assert(feed.filter(col("x") === 20002).as[Int].collect().toSeq == Seq(20002))
  }

  test("a rel removed and RE-CREATED within one range emits a delete+insert pair") {
    // deterministic epoch-name reuse: the same root-relative path holds
    // DIFFERENT content at `from` and `to`. A plain set difference of the
    // endpoint file sets lands the rel in neither removed nor added and
    // the feed would emit ZERO events for changed rows.
    val dir = tmp("readd")
    import spark.implicits._
    val (fs, root) = fsRoot(dir)
    Seq(1).toDF("x").repartition(1).write.format("btr")
      .option("btr.retainRemoved", "true").mode("overwrite").save(dir)   // v1: one file
    val rel = fs.listStatus(root).map(_.getPath.getName)
      .filter(n => n.endsWith(".btr") && !n.startsWith("_")).head

    // v2: remove that file (retention keeps its bytes)
    graft.format.BtrRetention.removeDataFile(fs, root, rel, retain = true)
    BtrLog.recordDelta(fs, root, "delete", added = Nil, removed = Seq(rel))

    // v3: re-create the SAME rel with different content (2 rows → a
    // different size, the incarnation disambiguator)
    val donor = tmp("readd-donor")
    Seq(2, 3).toDF("x").repartition(1).write.format("btr").mode("overwrite").save(donor)
    val (dfs, droot) = fsRoot(donor)
    val donorFile = dfs.listStatus(droot).map(_.getPath)
      .filter(p => p.getName.endsWith(".btr") && !p.getName.startsWith("_")).head
    org.apache.hadoop.fs.FileUtil.copy(dfs, donorFile, fs, new Path(root, rel),
      false, BtrTableMeta.hadoopConf())
    BtrLog.recordDelta(fs, root, "append", added = Seq(rel), removed = Nil)

    val r = BtrChanges.resolveRange(fs, root, 1L, 3L)
    assert(r.removedRels == Seq(rel), r.toString)
    assert(r.removedAt(rel) == 2L && r.added.versionOf(rel) == 3L, r.toString)
    assert(r.added.addedRel == Seq(rel), r.toString)
    assert(r.removedSizes(rel) != r.added.sizes(rel),
      "incarnations must carry their own recorded sizes")

    // end-to-end: the feed serves delete(old rows) + insert(new rows)
    val got = BtrChanges.between(spark, dir, 1L, 3L)
      .select(col("x"), col("_change_type"), col("_commit_version"))
      .as[(Int, String, Long)].collect().sortBy(r => (r._3, r._1)).toSeq
    assert(got == Seq((1, "delete", 2L), (2, "insert", 3L), (3, "insert", 3L)),
      got.toString)
    // and the file-level fast path refuses this range loudly
    val e = intercept[IllegalStateException] {
      BtrChanges.resolveAdded(fs, root, 1L, 3L)
    }
    assert(e.getMessage.contains("removed"), e.getMessage)
  }

  test("removed history refuses loudly and names the removing commit") {
    val dir = tmp("removed")
    import spark.implicits._
    (1 to 100).toDF("x").write.format("btr").mode("overwrite").save(dir) // v1
    Seq(101).toDF("x").write.format("btr").mode("append").save(dir)      // v2
    // an overwrite removes every file visible at v1 — new-files-only
    // would serve the whole table as "changes", so it must refuse
    (1 to 50).toDF("x").write.format("btr").mode("overwrite").save(dir)  // v3
    val (fs, root) = fsRoot(dir)

    val e = intercept[IllegalStateException] {
      BtrChanges.between(spark, dir, 1L, BtrLog.latestVersion(fs, root).get)
    }
    assert(e.getMessage.contains("removed"), e.getMessage)
    assert(e.getMessage.contains("Re-bootstrap"), e.getMessage)
    assert(e.getMessage.contains("overwrite"), e.getMessage)
  }

  test("diffTables() audits an incremental result against a rebuild") {
    val left = tmp("diff-left")
    val right = tmp("diff-right")
    import spark.implicits._
    // "incremental" output dropped 1,2 and gained 7,8 and a duplicate 5
    (1 to 6).toDF("x").write.format("btr").mode("overwrite").save(left)
    (Seq(3, 4, 5, 6, 7, 8) :+ 5).toDF("x")
      .write.format("btr").mode("overwrite").save(right)

    val d = BtrChanges.diffTables(spark, left, right)
      .as[(Int, String)].collect().toSeq.sorted
    assert(d == Seq((1, "delete"), (2, "delete"), (5, "insert"), (7, "insert"), (8, "insert")))
    // equal tables diff to empty
    assert(BtrChanges.diffTables(spark, left, left).count() == 0)
  }

  test("btr_changes TVF serves the feed from SQL") {
    val dir = tmp("tvf")
    import spark.implicits._
    graft.GraftExtensions.register(spark)
    Seq("a", "b").toDF("s").write.format("btr").mode("overwrite").save(dir) // v1
    Seq("c").toDF("s").write.format("btr").mode("append").save(dir)         // v2

    val rows = spark.sql(s"SELECT s, _commit_version FROM btr_changes('$dir', 1, 2)")
      .as[(String, Long)].collect().toSeq
    assert(rows == Seq(("c", 2L)))
    // 2-arg form reads to the latest version
    Seq("d").toDF("s").write.format("btr").mode("append").save(dir)         // v3
    val upTo = spark.sql(s"SELECT s FROM btr_changes('$dir', 1)")
      .as[String].collect().sorted.toSeq
    assert(upTo == Seq("c", "d"))
  }

  test("the feed works on partitioned tables (partition dirs in the file set)") {
    val dir = tmp("partitioned")
    import spark.implicits._
    Seq((1, "a"), (2, "b")).toDF("x", "p")
      .write.format("btr").partitionBy("p").mode("overwrite").save(dir) // v1
    Seq((3, "a"), (4, "c")).toDF("x", "p")
      .write.format("btr").partitionBy("p").mode("append").save(dir)    // v2

    val feed = BtrChanges.between(spark, dir, 1L, 2L)
    assert(feed.select("x", "p").as[(Int, String)].collect().sortBy(_._1).toSeq ==
      Seq((3, "a"), (4, "c")))
    // partition pruning composes with the feed restriction
    assert(feed.filter(col("p") === "c").select("x").as[Int].collect().toSeq == Seq(4))
  }

  test("from = 0 bootstraps: the whole table, attributed per commit") {
    val dir = tmp("bootstrap")
    import spark.implicits._
    Seq(1, 2).toDF("x").write.format("btr").mode("overwrite").save(dir) // v1
    Seq(3).toDF("x").write.format("btr").mode("append").save(dir)       // v2

    val all = BtrChanges.between(spark, dir, 0L, 2L)
      .select(col("x"), col("_commit_version"))
      .as[(Int, Long)].collect().sortBy(_._1).toSeq
    assert(all == Seq((1, 1L), (2, 1L), (3, 2L)))
  }

  test("the feed reads files added before a RENAME under the current schema") {
    val dir = tmp("feed-rename")
    import spark.implicits._
    graft.GraftExtensions.register(spark)
    Seq((1, "a")).toDF("id", "tag").write.format("btr").mode("overwrite").save(dir) // v1
    Seq((2, "b")).toDF("id", "tag").write.format("btr").mode("append").save(dir)    // v2
    spark.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN tag TO label")

    val feed = BtrChanges.between(spark, dir, 1L, 2L)
    assert(feed.columns.take(2).toSeq == Seq("id", "label"))
    assert(feed.select("id", "label").as[(Int, String)].collect().toSeq == Seq((2, "b")))
  }

  test("streaming source with btr.startingVersion emits only post-snapshot data") {
    val dir = tmp("stream-sv")
    import spark.implicits._
    Seq(1, 2, 3).toDF("x").write.format("btr").mode("overwrite").save(dir) // v1
    Seq(4, 5).toDF("x").write.format("btr").mode("append").save(dir)       // v2

    val stream = spark.readStream.format("btr")
      .option("btr.startingVersion", "1").load(dir)
    val q = stream.writeStream.format("memory").queryName("sv_out").start()
    try {
      q.processAllAvailable()
      // v1's rows are seeded as seen: only v2 emits
      assert(spark.table("sv_out").as[Int].collect().sorted.toSeq == Seq(4, 5))
      Seq(6).toDF("x").write.format("btr").mode("append").save(dir)        // v3
      q.processAllAvailable()
      assert(spark.table("sv_out").as[Int].collect().sorted.toSeq == Seq(4, 5, 6))
    } finally q.stop()

    // 'latest' on a fresh checkpoint: nothing historical emits
    val q2 = spark.readStream.format("btr")
      .option("btr.startingVersion", "latest").load(dir)
      .writeStream.format("memory").queryName("sv_latest").start()
    try {
      q2.processAllAvailable()
      assert(spark.table("sv_latest").count() == 0)
      Seq(7).toDF("x").write.format("btr").mode("append").save(dir)
      q2.processAllAvailable()
      assert(spark.table("sv_latest").as[Int].collect().toSeq == Seq(7))
    } finally q2.stop()
  }

  test("change-feed options exclude time travel and validate bounds") {
    val dir = tmp("valid")
    import spark.implicits._
    Seq(1).toDF("x").write.format("btr").mode("overwrite").save(dir)
    Seq(2).toDF("x").write.format("btr").mode("append").save(dir)

    val both = intercept[Exception] {
      spark.read.format("btr")
        .option("btr.changesFromVersion", "1")
        .option("btr.versionAsOf", "2").load(dir).collect()
    }
    assert(both.getMessage.contains("cannot also pin"), both.getMessage)

    val orphanTo = intercept[Exception] {
      spark.read.format("btr")
        .option("btr.changesToVersion", "2").load(dir).collect()
    }
    assert(orphanTo.getMessage.contains("requires"), orphanTo.getMessage)

    val backwards = intercept[Exception] {
      BtrChanges.between(spark, dir, 2L, 1L)
    }
    assert(backwards.getMessage.contains("to >= from"), backwards.getMessage)
  }
}
