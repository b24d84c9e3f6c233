package graft.sources

import graft.format.{BtrRetention, BtrTableMeta}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Opt-in retention of removed files (`btr.retainRemoved`): removal
  * commits MOVE visible data files into the hidden `_btr_removed/` store
  * instead of deleting, which extends time travel across
  * DELETE/overwrite/OPTIMIZE and lets the change feed emit row-level
  * deletes. `VACUUM ... RETAIN` expires the store; default-off tables
  * behave exactly as before.
  */
class BtrRetentionSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("retention-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.catalog.graft", "graft.sources.BtrCatalog")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(name: String) = {
    val d = s"/tmp/btr-retention-spec/$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
    d
  }

  private def fsRoot(dir: String) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(BtrTableMeta.hadoopConf())
    (fs, fs.makeQualified(p))
  }

  private def writeRetained(dir: String, mode: String, data: Seq[Int]): Unit = {
    import spark.implicits._
    data.toDF("x").write.format("btr")
      .option("btr.retainRemoved", "true").mode(mode).save(dir)
  }

  test("time travel works ACROSS an overwrite when the table retains removed files") {
    val dir = tmp("tt-overwrite")
    import spark.implicits._
    writeRetained(dir, "overwrite", Seq(1, 2, 3))      // v1
    writeRetained(dir, "append", Seq(4))               // v2
    writeRetained(dir, "overwrite", Seq(9, 10))        // v3 — removes v1+v2 files

    // current read: post-overwrite only
    assert(spark.read.format("btr").load(dir).as[Int].collect().sorted.toSeq == Seq(9, 10))
    // pre-overwrite snapshots resolve through the store
    def asOf(v: Long) = spark.read.format("btr")
      .option("btr.versionAsOf", v.toString).load(dir).as[Int].collect().sorted.toSeq
    assert(asOf(1) == Seq(1, 2, 3))
    assert(asOf(2) == Seq(1, 2, 3, 4))
    assert(asOf(3) == Seq(9, 10))
  }

  test("the change feed emits row-level deletes across a DELETE") {
    val dir = tmp("feed-delete")
    import spark.implicits._
    Seq((1, "a"), (2, "a"), (3, "b")).toDF("x", "p")
      .write.format("btr").option("btr.retainRemoved", "true")
      .partitionBy("p").mode("overwrite").save(dir)                      // v1
    Seq((4, "c")).toDF("x", "p").write.format("btr")
      .partitionBy("p").mode("append").save(dir)                         // v2
    spark.sql(s"DELETE FROM graft.`$dir` WHERE p = 'a'")                 // v3

    val (fs, root) = fsRoot(dir)
    val latest = BtrLog.latestVersion(fs, root).get
    val feed = BtrChanges.between(spark, dir, 1L, latest)
      .select(col("x"), col("_change_type"), col("_commit_version"))
      .as[(Int, String, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    // inserts: v2's row; deletes: the two p=a rows removed at v3
    assert(feed == Seq((1, "delete", 3L), (2, "delete", 3L), (4, "insert", 2L)), feed.toString)
    // current read unaffected
    assert(spark.read.format("btr").load(dir).select("x").as[Int].collect().sorted.toSeq ==
      Seq(3, 4))
  }

  test("metadata aggregates answer correctly for a retained historical snapshot") {
    val dir = tmp("agg")
    writeRetained(dir, "overwrite", (1 to 100))        // v1
    writeRetained(dir, "overwrite", Seq(7))            // v2 — removes v1

    val back = spark.read.format("btr").option("btr.versionAsOf", "1").load(dir)
    val r = back.agg(count(lit(1)), sum("x")).head()
    assert((r.getLong(0), r.getLong(1)) == (100L, 5050L))
  }

  test("VACUUM RETAIN 0 HOURS expires the store; history then fails loudly") {
    val dir = tmp("vacuum")
    writeRetained(dir, "overwrite", Seq(1, 2))         // v1
    writeRetained(dir, "overwrite", Seq(3))            // v2 — v1 files to store
    assert(spark.read.format("btr").option("btr.versionAsOf", "1").load(dir).count() == 2)

    Thread.sleep(10) // the store entry's move-millis must be strictly past
    // a shared test JVM's session may predate this suite, so the
    // extensions config can be ignored by getOrCreate — drive the
    // maintenance parser directly (same code path sql() takes)
    val parser = new BtrSparkSqlParser(spark.sessionState.sqlParser)
    parser.parsePlan(s"VACUUM graft.`$dir` RETAIN 0 HOURS")
      .asInstanceOf[BtrVacuumCommand].run(spark)
    val e = intercept[Exception] {
      spark.read.format("btr").option("btr.versionAsOf", "1").load(dir).count()
    }
    assert(e.getMessage.contains("no longer exist"), e.getMessage)
    // current reads untouched
    assert(spark.read.format("btr").load(dir).count() == 1)
  }

  test("OPTIMIZE on a retained table keeps pre-compaction snapshots readable") {
    val dir = tmp("optimize")
    import spark.implicits._
    writeRetained(dir, "overwrite", Seq(1, 2))         // v1
    writeRetained(dir, "append", Seq(3))               // v2
    BtrCompact.compact(spark, dir, 128L * 1024 * 1024) // v3: folds the files

    assert(spark.read.format("btr").load(dir).as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
    assert(spark.read.format("btr").option("btr.versionAsOf", "1").load(dir)
      .as[Int].collect().sorted.toSeq == Seq(1, 2))
  }

  test("RESTORE rewinds ACROSS an overwrite on a retained table") {
    val dir = tmp("restore")
    import spark.implicits._
    writeRetained(dir, "overwrite", Seq(1, 2, 3))      // v1
    writeRetained(dir, "overwrite", Seq(9))            // v2 — v1 files to store

    val (fs, root) = fsRoot(dir)
    BtrLog.restore(fs, root, 1L)
    assert(spark.read.format("btr").load(dir).as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
    // the post-restore snapshot records the rewound state
    val latest = BtrLog.latestVersion(fs, root).get
    assert(BtrLog.readEntry(fs, root, latest).action == "restore")
    // and v2 itself is STILL readable — its file moved to the store
    assert(spark.read.format("btr").option("btr.versionAsOf", "2").load(dir)
      .as[Int].collect().toSeq == Seq(9))
  }

  test("fuzz: EVERY version of a retained table reads exactly, whatever the history") {
    val rnd = new scala.util.Random(20260814L)
    import spark.implicits._
    for (round <- 0 until 3) {
      val dir = tmp(s"fuzz$round")
      var next = 1000 * round
      val snapshots = scala.collection.mutable.ArrayBuffer.empty[Set[Int]]
      var live = Set.empty[Int]
      def write(mode: String, n: Int): Unit = {
        val vals = (0 until n).map { _ => next += 1; next }
        vals.toDF("x").write.format("btr")
          .option("btr.retainRemoved", "true").mode(mode).save(dir)
        live = (if (mode == "overwrite") Set.empty[Int] else live) ++ vals
        snapshots += live
      }
      write("overwrite", 1 + rnd.nextInt(5))
      for (_ <- 0 until 8) {
        if (rnd.nextInt(3) == 0) write("overwrite", 1 + rnd.nextInt(5))
        else write("append", 1 + rnd.nextInt(5))
      }
      // with retention, the loud-error escape hatch of the unretained
      // fuzz never applies: every version must read EXACTLY
      snapshots.zipWithIndex.foreach { case (want, i) =>
        val got = spark.read.format("btr")
          .option("btr.versionAsOf", (i + 1).toString).load(dir)
          .as[Int].collect().toSet
        assert(got == want, s"round $round v${i + 1}: got ${got.size}, want ${want.size}")
      }
    }
  }

  test("an OLDER change range stays replayable after a later removal (retained)") {
    // the retention promise: consuming (1, 2] must not break because a
    // commit AFTER the range (v3 here) removed files added within it —
    // the store serves them and attribution keys by the store path
    val dir = tmp("replay-old-range")
    import spark.implicits._
    Seq((1, "keep"), (2, "keep")).toDF("x", "tag")
      .write.format("btr").option("btr.retainRemoved", "true")
      .mode("overwrite").save(dir)                                       // v1
    Seq((10, "gone"), (11, "keep2")).toDF("x", "tag")
      .write.format("btr").mode("append").save(dir)                      // v2
    spark.sql(s"DELETE FROM graft.`$dir` WHERE tag = 'gone'")            // v3

    val feed = BtrChanges.between(spark, dir, 1L, 2L)
      .select(col("x"), col("_change_type"), col("_commit_version"))
      .as[(Int, String, Long)].collect().sortBy(_._1).toSeq
    // v2 appended one file holding rows 10 and 11; v3's row-level DELETE
    // rewrote that file, but the range (1, 2] must still see BOTH rows as
    // v2 inserts, served from the retention store
    assert(feed == Seq((10, "insert", 2L), (11, "insert", 2L)), feed.toString)
  }

  test("default-off tables delete physically, exactly as before") {
    val dir = tmp("off")
    import spark.implicits._
    Seq(1, 2).toDF("x").write.format("btr").mode("overwrite").save(dir)  // v1
    Seq(3).toDF("x").write.format("btr").mode("overwrite").save(dir)     // v2
    val (fs, root) = fsRoot(dir)
    assert(!fs.exists(new Path(root, BtrRetention.RemovedDir)))
    intercept[Exception] {
      spark.read.format("btr").option("btr.versionAsOf", "1").load(dir).count()
    }
  }

  test("partitioned removed files keep their partition values through the store") {
    val dir = tmp("part")
    import spark.implicits._
    Seq((1, "a"), (2, "b")).toDF("x", "p")
      .write.format("btr").option("btr.retainRemoved", "true")
      .partitionBy("p").mode("overwrite").save(dir)                      // v1
    spark.sql(s"DELETE FROM graft.`$dir` WHERE p = 'a'")                 // v2

    val old = spark.read.format("btr").option("btr.versionAsOf", "1").load(dir)
    assert(old.filter(col("p") === "a").select("x").as[Int].collect().toSeq == Seq(1))
    assert(old.count() == 2)
  }
}
