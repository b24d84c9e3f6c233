package graft.streaming

import graft.format.BtrTableMeta
import graft.sources.{BtrChanges, BtrLog}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming change feed (`btr.readChanges`): version offsets, CDC
  * columns, and — on a retained table — row-level DELETE batches, so a
  * streaming consumer survives a DELETE/OPTIMIZE without re-bootstrap.
  * The emitted rows must equal BtrChanges.between for the same range.
  */
class CdcStreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.catalog.graft", "graft.sources.BtrCatalog")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(name: String) = {
    val d = s"/tmp/btr-cdc-stream-spec/$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
    d
  }

  private def fsRoot(dir: String) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(BtrTableMeta.hadoopConf())
    (fs, fs.makeQualified(p))
  }

  test("CDC stream across a DELETE on a retained table equals BtrChanges.between") {
    val dir = tmp("across-delete")
    import spark.implicits._
    Seq((1, "keep"), (2, "drop"), (3, "keep")).toDF("x", "tag")
      .repartition(1).write.format("btr")
      .option("btr.retainRemoved", "true").mode("overwrite").save(dir)   // v1
    Seq((4, "keep")).toDF("x", "tag")
      .write.format("btr").mode("append").save(dir)                     // v2

    // stream from v1 (consume (1, latest]); first pass: only v2's insert
    val q = spark.readStream.format("btr")
      .option("btr.readChanges", "true")
      .option("btr.startingVersion", "1")
      .load(dir)
      .writeStream.format("memory").queryName("cdc_out").start()
    def emitted() = spark.table("cdc_out")
      .select(col("x"), col("tag"), col("_change_type"), col("_commit_version"))
      .as[(Int, String, String, Long)].collect().sortBy(r => (r._4, r._3, r._1)).toSeq
    try {
      q.processAllAvailable()
      assert(emitted() == Seq((4, "keep", "insert", 2L)), emitted().toString)

      // a row-level DELETE rewrites v1's file (v3): the stream must emit
      // the removed file's rows as deletes and the replacement's as
      // inserts — surviving the removal without re-bootstrap
      spark.sql(s"DELETE FROM graft.`$dir` WHERE tag = 'drop'")
      q.processAllAvailable()

      val (fs, root) = fsRoot(dir)
      val latest = BtrLog.latestVersion(fs, root).get
      val batch = BtrChanges.between(spark, dir, 1L, latest)
        .select(col("x"), col("tag"), col("_change_type"), col("_commit_version"))
        .as[(Int, String, String, Long)].collect().sortBy(r => (r._4, r._3, r._1)).toSeq
      assert(emitted() == batch,
        s"stream ${emitted()} must equal batch feed $batch")
      // and the delete rows really are there
      assert(emitted().count(_._3 == "delete") == 3, emitted().toString)
    } finally q.stop()
  }

  test("CDC stream serves deletion-vector commits as row-level delete events") {
    val dir = tmp("dv-events")
    import spark.implicits._
    (0 until 100).map(i => (i, s"s$i")).toDF("x", "tag")
      .repartition(1).write.format("btr")
      .option("btr.deletionVectors", "true")
      .option("btr.retainRemoved", "true").mode("overwrite").save(dir) // v1
    val q = spark.readStream.format("btr")
      .option("btr.readChanges", "true")
      .option("btr.startingVersion", "1")
      .load(dir)
      .writeStream.format("memory").queryName("cdc_dv_out").start()
    def emitted() = spark.table("cdc_dv_out")
      .select(col("x"), col("_change_type"), col("_commit_version"))
      .as[(Int, String, Long)].collect().sortBy(r => (r._3, r._2, r._1)).toSeq
    try {
      // DV DELETE: no file rewritten, stream must emit the masked rows
      spark.sql(s"DELETE FROM graft.`$dir` WHERE x % 10 = 7")          // v2
      q.processAllAvailable()
      assert(emitted() == (7 until 100 by 10).map(x => (x, "delete", 2L)))

      // second DV DELETE emits only the NEWLY masked rows: x%5==2 also
      // matches x%10==7, but those rows are already gone — only x%10==2
      // survive to be deleted now
      spark.sql(s"DELETE FROM graft.`$dir` WHERE x % 5 = 2")           // v3
      q.processAllAvailable()
      val second = emitted().filter(_._3 == 3L)
      assert(second == (2 until 100 by 10).map(x => (x, "delete", 3L)), second.toString)

      // RESTORE across both deletes drops the blobs: re-insert events
      val (fs, root) = fsRoot(dir)
      BtrLog.restore(fs, root, 1L)                                     // v4
      q.processAllAvailable()
      val reinserts = emitted().filter(_._3 == 4L)
      val expected = ((7 until 100 by 10) ++ (2 until 100 by 10)).sorted.map(x =>
        (x, "insert", 4L))
      assert(reinserts == expected, reinserts.toString)

      // and the whole stream equals the batch feed over the same range
      val latest = BtrLog.latestVersion(fs, root).get
      val batch = BtrChanges.between(spark, dir, 1L, latest)
        .select(col("x"), col("_change_type"), col("_commit_version"))
        .as[(Int, String, Long)].collect().sortBy(r => (r._3, r._2, r._1)).toSeq
      assert(emitted() == batch)
    } finally q.stop()
  }

  test("CDC stream serves a merge-on-read UPDATE as delete+insert events") {
    val dir = tmp("dv-update")
    import spark.implicits._
    (0 until 60).map(i => (i, 0)).toDF("x", "hits")
      .repartition(1).write.format("btr")
      .option("btr.deletionVectors", "true").mode("overwrite").save(dir) // v1
    val q = spark.readStream.format("btr")
      .option("btr.readChanges", "true")
      .option("btr.startingVersion", "1")
      .load(dir)
      .writeStream.format("memory").queryName("cdc_upd_out").start()
    try {
      spark.sql(s"UPDATE graft.`$dir` SET hits = 1 WHERE x % 20 = 5")   // v2 (MoR)
      q.processAllAvailable()
      val ev = spark.table("cdc_upd_out")
        .select(col("x"), col("hits"), col("_change_type"), col("_commit_version"))
        .as[(Int, Int, String, Long)].collect().sortBy(e => (e._3, e._1)).toSeq
      val touched = Seq(5, 25, 45)
      assert(ev == touched.map(x => (x, 0, "delete", 2L)) ++
        touched.map(x => (x, 1, "insert", 2L)), ev.toString)
    } finally q.stop()
  }

  test("CDC stream on an UNRETAINED table fails loudly at a removal-crossing batch") {
    val dir = tmp("unretained")
    import spark.implicits._
    Seq(1, 2).toDF("x").repartition(1).write.format("btr").mode("overwrite").save(dir) // v1
    Seq(3).toDF("x").write.format("btr").mode("append").save(dir)                      // v2

    val q = spark.readStream.format("btr")
      .option("btr.readChanges", "true")
      .option("btr.startingVersion", "1")
      .load(dir)
      .writeStream.format("memory").queryName("cdc_unret").start()
    try {
      q.processAllAvailable()
      spark.sql(s"DELETE FROM graft.`$dir` WHERE x <= 2") // physically removes v1's file
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
        q.awaitTermination(30000)
      }
      val msg = e.getCause match { case null => e.getMessage; case c => c.getMessage }
      assert(msg.contains("retainRemoved") || e.getMessage.contains("retainRemoved"),
        e.getMessage)
    } finally q.stop()
  }

  test("CDC stream recovers from its checkpoint — no duplicates, no gaps") {
    val dir = tmp("recovery")
    val ckpt = tmp("recovery-ckpt")
    import spark.implicits._
    Seq(1).toDF("x").write.format("btr").mode("overwrite").save(dir)   // v1
    Seq(2).toDF("x").write.format("btr").mode("append").save(dir)      // v2

    // memory sink can't recover a checkpoint — collect via foreachBatch
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
    def startQ() = spark.readStream.format("btr")
      .option("btr.readChanges", "true")
      .option("btr.startingVersion", "0")
      .load(dir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.select(col("x"), col("_commit_version"))
          .as[(Int, Long)].collect().foreach(seen.add)
        ()
      }
      .option("checkpointLocation", ckpt).start()

    val q1 = startQ()
    try { q1.processAllAvailable() } finally q1.stop()
    assert(scala.jdk.CollectionConverters.CollectionHasAsScala(seen).asScala.toSeq
      .sortBy(_._1) == Seq((1, 1L), (2, 2L)), seen.toString)

    // new commits while the stream is down
    Seq(3).toDF("x").write.format("btr").mode("append").save(dir)      // v3
    Seq(4).toDF("x").write.format("btr").mode("append").save(dir)      // v4

    // restart on the SAME checkpoint: only v3/v4 arrive — no duplicates
    // of the committed range, no gaps
    val q2 = startQ()
    try {
      q2.processAllAvailable()
      val got = scala.jdk.CollectionConverters.CollectionHasAsScala(seen).asScala.toSeq
        .sortBy(_._1)
      assert(got == Seq((1, 1L), (2, 2L), (3, 3L), (4, 4L)), got.toString)
    } finally q2.stop()
  }

  test("maxFilesPerTrigger drains a version backlog in bounded batches") {
    val dir = tmp("admission")
    import spark.implicits._
    Seq(0).toDF("x").write.format("btr").mode("overwrite").save(dir)   // v1
    (1 to 6).foreach(i =>
      Seq(i).toDF("x").write.format("btr").mode("append").save(dir))   // v2..v7, 1 file each

    val q = spark.readStream.format("btr")
      .option("btr.readChanges", "true")
      .option("btr.startingVersion", "0")
      .option("btr.maxFilesPerTrigger", "2")
      .load(dir)
      .writeStream.format("memory").queryName("cdc_adm").start()
    try {
      q.processAllAvailable()
      // all rows arrive...
      assert(spark.table("cdc_adm").count() == 7)
      // ...across MULTIPLE micro-batches (7 files / cap 2 ≥ 4 batches)
      assert(q.recentProgress.count(_.numInputRows > 0) >= 3,
        q.recentProgress.map(_.numInputRows).mkString(","))
    } finally q.stop()
  }

  test("admission control counts REMOVALS too (delete-heavy batches stay bounded)") {
    val dir = tmp("adm-removals")
    import spark.implicits._
    // retained table: v1 one file, v2 one file, v3 a DELETE removing both
    // (adds 0), v4 one more file
    Seq(1).toDF("x").repartition(1).write.format("btr")
      .option("btr.retainRemoved", "true").mode("overwrite").save(dir)  // v1
    Seq(2).toDF("x").repartition(1).write.format("btr").mode("append").save(dir) // v2
    spark.sql(s"DELETE FROM graft.`$dir` WHERE x <= 2")                 // v3: removes 2 files
    Seq(3).toDF("x").repartition(1).write.format("btr").mode("append").save(dir) // v4

    val schema = spark.read.format("btr").load(dir).schema
    val stream = new graft.sources.BtrCdcMicroBatchStream(
      dir, schema, schema, Seq.empty, None, Some(2), None)
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val VOff = graft.sources.BtrCdcMicroBatchStream.VersionOffset
    // from v1 with cap 2: v2 costs 1 add; v3 costs 2 removals — every
    // removed file is a retention-store read on the delete side — so
    // admitting it would plan 3 files. The batch must stop at v2.
    val end = stream.latestOffset(VOff(1L), ReadLimit.maxFiles(2))
    assert(end == VOff(2L), s"delete-heavy v3 must start its own batch, got $end")
    // the removal commit itself still makes progress (at-least-one rule)
    val end2 = stream.latestOffset(VOff(2L), ReadLimit.maxFiles(2))
    assert(end2 == VOff(3L), end2.toString)
  }

  test("a wide DV commit: admission isolates it, the batch plans one partition per touched file") {
    val dir = tmp("adm-wide-dv")
    import spark.implicits._
    (0 until 8).foreach { i =>
      (i * 100 until i * 100 + 10).map(v => (v.toLong, s"r$v")).toDF("v", "s")
        .coalesce(1).write.format("btr")
        .option("btr.deletionVectors", "true")
        .mode(if (i == 0) "overwrite" else "append").save(dir)
    } // v1..v8, one file each
    spark.sql(s"DELETE FROM graft.`$dir` WHERE v % 100 = 0") // v9: one blob per file, 8 files
    Seq((9999L, "tail")).toDF("v", "s").coalesce(1)
      .write.format("btr").mode("append").save(dir) // v10

    val schema = spark.read.format("btr").load(dir).schema
    val stream = new graft.sources.BtrCdcMicroBatchStream(
      dir, schema, schema, Seq.empty, None, Some(2), None)
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val VOff = graft.sources.BtrCdcMicroBatchStream.VersionOffset
    // the DV commit's cost is its blob count (≈ touched files): 8 > cap 2,
    // so it is admitted ALONE (the at-least-one progress floor) — the
    // batch's size is bounded by the COMMIT's width, never the table's
    val end = stream.latestOffset(VOff(8L), ReadLimit.maxFiles(2))
    assert(end == VOff(9L), s"the wide DV commit must start and end its own batch, got $end")
    // within the commit, the plan is one partition per touched file:
    // the reads execute in parallel, the driver does O(commit) metadata
    val parts = stream.planInputPartitions(VOff(8L), VOff(9L))
    assert(parts.length == 8, s"expected 8 per-file partitions, got ${parts.length}")
    // the batch after it resumes normal sizing
    assert(stream.latestOffset(VOff(9L), ReadLimit.maxFiles(2)) == VOff(10L))
  }

  test("plain (non-CDC) stream honors btr.startingTimestamp") {
    val dir = tmp("plain-ts")
    import spark.implicits._
    Seq(1).toDF("x").write.format("btr").mode("overwrite").save(dir)   // v1
    val (fs, root) = fsRoot(dir)
    val t1 = BtrLog.readEntry(fs, root, 1L).tsMillis
    Thread.sleep(10)
    Seq(2).toDF("x").write.format("btr").mode("append").save(dir)      // v2

    // no btr.readChanges: the identity stream must still seed its
    // seen-set from the version at-or-before the instant — only files
    // committed AFTER it arrive (previously it silently started latest)
    val q = spark.readStream.format("btr")
      .option("btr.startingTimestamp", (t1 * 1000L).toString) // micros
      .load(dir)
      .writeStream.format("memory").queryName("plain_ts").start()
    try {
      q.processAllAvailable()
      val got = spark.table("plain_ts").select(col("x")).as[Int].collect().toSeq
      assert(got == Seq(2), got.toString)
    } finally q.stop()
  }

  test("CDC stream serves PARTITIONED tables (partition values as constants)") {
    val dir = tmp("partitioned")
    import spark.implicits._
    Seq((1, "a"), (2, "b")).toDF("x", "p").write.format("btr")
      .option("btr.retainRemoved", "true")
      .partitionBy("p").mode("overwrite").save(dir)                    // v1
    Seq((3, "a")).toDF("x", "p").write.format("btr")
      .partitionBy("p").mode("append").save(dir)                       // v2
    spark.sql(s"DELETE FROM graft.`$dir` WHERE p = 'b'")               // v3

    // one uncapped batch covers (0, 3]: the feed serves the NET change
    // set of the range (a file added AND removed inside it nets out) —
    // the state a from-scratch consumer needs, with partition values
    // riding as constants
    val q = spark.readStream.format("btr")
      .option("btr.readChanges", "true")
      .option("btr.startingVersion", "0")
      .load(dir)
      .writeStream.format("memory").queryName("cdc_part").start()
    try {
      q.processAllAvailable()
      val got = spark.table("cdc_part")
        .select(col("x"), col("p"), col("_change_type"), col("_commit_version"))
        .as[(Int, String, String, Long)].collect()
        .sortBy(r => (r._4, r._3, r._1)).toSeq
      assert(got == Seq((1, "a", "insert", 1L), (3, "a", "insert", 2L)), got.toString)
    } finally q.stop()

    // capped to one file per batch, the SAME range replays as per-commit
    // EVENTS: the p=b insert at v1 and its delete at v3 both appear
    val q2 = spark.readStream.format("btr")
      .option("btr.readChanges", "true")
      .option("btr.startingVersion", "0")
      .option("btr.maxFilesPerTrigger", "1")
      .load(dir)
      .writeStream.format("memory").queryName("cdc_part_ev").start()
    try {
      q2.processAllAvailable()
      val got = spark.table("cdc_part_ev")
        .select(col("x"), col("p"), col("_change_type"), col("_commit_version"))
        .as[(Int, String, String, Long)].collect()
        .sortBy(r => (r._4, r._3, r._1)).toSeq
      assert(got == Seq(
        (1, "a", "insert", 1L), (2, "b", "insert", 1L),
        (3, "a", "insert", 2L), (2, "b", "delete", 3L)), got.toString)
    } finally q2.stop()
  }

  test("CDC stream starts by TIMESTAMP (btr.startingTimestamp)") {
    val dir = tmp("by-timestamp")
    import spark.implicits._
    Seq(1).toDF("x").write.format("btr").mode("overwrite").save(dir)   // v1
    val (fs, root) = fsRoot(dir)
    val t1 = BtrLog.readEntry(fs, root, 1L).tsMillis
    Thread.sleep(10)
    Seq(2).toDF("x").write.format("btr").mode("append").save(dir)      // v2

    // start at v1's instant: only commits AFTER it arrive (v2)
    val q = spark.readStream.format("btr")
      .option("btr.readChanges", "true")
      .option("btr.startingTimestamp", (t1 * 1000L).toString) // micros
      .load(dir)
      .writeStream.format("memory").queryName("cdc_ts").start()
    try {
      q.processAllAvailable()
      val got = spark.table("cdc_ts")
        .select(col("x"), col("_commit_version"))
        .as[(Int, Long)].collect().toSeq
      assert(got == Seq((2, 2L)), got.toString)
    } finally q.stop()
  }

  test("a BATCH read with btr.readChanges refuses loudly (even under agg pushdown)") {
    val dir = tmp("batch-refuse")
    import spark.implicits._
    Seq(1, 2).toDF("x").write.format("btr").mode("overwrite").save(dir)
    // a pushed COUNT would otherwise silently answer from the CURRENT
    // table instead of erroring — both shapes must hit the refusal
    val e1 = intercept[Exception] {
      spark.read.format("btr").option("btr.readChanges", "true").load(dir).count()
    }
    assert(e1.getMessage.contains("STREAMING") ||
      Option(e1.getCause).exists(_.getMessage.contains("STREAMING")), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.read.format("btr").option("btr.readChanges", "true").load(dir)
        .select(col("x")).collect()
    }
    assert(e2.getMessage.contains("STREAMING") ||
      Option(e2.getCause).exists(_.getMessage.contains("STREAMING")), e2.getMessage)
  }

  test("CDC stream bootstraps the whole table from startingVersion 0") {
    val dir = tmp("bootstrap")
    import spark.implicits._
    Seq(10, 11).toDF("x").repartition(1).write.format("btr").mode("overwrite").save(dir) // v1
    Seq(12).toDF("x").write.format("btr").mode("append").save(dir)                       // v2

    val q = spark.readStream.format("btr")
      .option("btr.readChanges", "true")
      .option("btr.startingVersion", "0")
      .load(dir)
      .writeStream.format("memory").queryName("cdc_boot").start()
    try {
      q.processAllAvailable()
      val got = spark.table("cdc_boot")
        .select(col("x"), col("_change_type"), col("_commit_version"))
        .as[(Int, String, Long)].collect().sortBy(_._1).toSeq
      assert(got == Seq((10, "insert", 1L), (11, "insert", 1L), (12, "insert", 2L)),
        got.toString)
    } finally q.stop()
  }
}
