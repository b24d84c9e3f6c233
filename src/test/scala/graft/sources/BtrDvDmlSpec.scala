package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Merge-on-read UPDATE/MERGE: old row images mask out through
  * deletion-vector blobs, new images land in appended files, untouched
  * files stay byte-identical, the pending-marker protocol keeps every
  * crash window consistent, and the change feed represents an UPDATE as
  * exact delete+insert events.
  */
class BtrDvDmlSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("btr-dv-dml-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  spark.conf.set("spark.sql.catalog.graft", classOf[BtrCatalog].getName)

  private def tmp(name: String) = {
    val d = s"/tmp/btr-dv-dml/$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
    d
  }

  private def md5(f: java.io.File): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(java.nio.file.Files.readAllBytes(f.toPath)).map("%02x".format(_)).mkString
  }

  private def dataFiles(p: String): Array[java.io.File] = {
    def walk(d: java.io.File): Array[java.io.File] =
      Option(d.listFiles()).getOrElse(Array.empty).flatMap { f =>
        if (f.isDirectory && !f.getName.startsWith("_")) walk(f)
        else if (f.isFile && f.getName.endsWith(".btr") && !f.getName.startsWith("_")) Array(f)
        else Array.empty[java.io.File]
      }
    walk(new java.io.File(p)).sortBy(_.getPath)
  }

  private def fsRoot(p: String) = {
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(graft.format.BtrTableMeta.hadoopConf())
    (fs, fs.makeQualified(new org.apache.hadoop.fs.Path(p)))
  }

  test("UPDATE: untouched files byte-identical, new images appended, masks applied") {
    val p = tmp("update")
    (0 until 500).map(i => (i.toLong, s"r$i", 0L)).toDF("v", "s", "hits")
      .coalesce(1).write.format("btr").mode("overwrite")
      .option("btr.deletionVectors", "true").save(p)
    (500 until 1000).map(i => (i.toLong, s"r$i", 0L)).toDF("v", "s", "hits")
      .coalesce(1).write.format("btr").mode("append").save(p)
    val before = dataFiles(p).map(f => f.getName -> md5(f)).toMap
    spark.sql(s"UPDATE graft.`$p` SET hits = hits + 1, s = concat(s, '!') WHERE v % 100 = 7")
    val after = dataFiles(p).map(f => f.getName -> md5(f)).toMap
    before.foreach { case (n, h) =>
      assert(after.get(n).contains(h), s"original file $n must stay byte-identical")
    }
    assert(after.size > before.size, "new images must land in appended files")
    val rows = spark.read.format("btr").load(p).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    val expected = (0 until 1000).map { i =>
      if (i % 100 == 7) (i.toLong, s"r$i!", 1L) else (i.toLong, s"r$i", 0L)
    }
    assert(rows.toSeq == expected)
    assert(new java.io.File(p).listFiles().forall(
      !_.getName.startsWith("_btr_dvpending_")), "marker must retire")
  }

  test("MERGE: update + insert + delete, all merge-on-read") {
    val p = tmp("merge")
    (0 until 100).map(i => (i.toLong, i.toLong * 10)).toDF("k", "val")
      .coalesce(1).write.format("btr").mode("overwrite")
      .option("btr.deletionVectors", "true").save(p)
    val before = dataFiles(p).map(f => f.getName -> md5(f)).toMap
    Seq((5L, 555L), (200L, 2000L), (7L, -1L)).toDF("k", "val")
      .createOrReplaceTempView("dml_src")
    spark.sql(
      s"""MERGE INTO graft.`$p` t USING dml_src s ON t.k = s.k
         |WHEN MATCHED AND s.val < 0 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET val = s.val
         |WHEN NOT MATCHED THEN INSERT (k, val) VALUES (s.k, s.val)""".stripMargin)
    val after = dataFiles(p).map(f => f.getName -> md5(f)).toMap
    before.foreach { case (n, h) => assert(after.get(n).contains(h)) }
    val rows = spark.read.format("btr").load(p).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val expected = ((0 until 100).filterNot(_ == 7).map(i =>
      (i.toLong, if (i == 5) 555L else i * 10L)) :+ (200L, 2000L)).sortBy(_._1)
    assert(rows == expected, rows.take(12).toString)
  }

  test("partitioned UPDATE moves rows across partition directories") {
    val p = tmp("part-move")
    (0 until 120).map(i => (s"k${i % 3}", i.toLong)).toDF("k", "v")
      .repartition($"k").write.format("btr").partitionBy("k")
      .option("btr.deletionVectors", "true").mode("overwrite").save(p)
    spark.sql(s"UPDATE graft.`$p` SET k = 'k2' WHERE v < 10")
    val back = spark.read.format("btr").load(p)
    assert(back.count() == 120)
    assert(back.filter($"k" === "k2" && $"v" < 10).count() == 10)
    assert(back.filter($"k" =!= "k2" && $"v" < 10).count() == 0)
  }

  test("time travel and RESTORE rewind an UPDATE (inserts drop, masks drop)") {
    val p = tmp("travel")
    (0 until 300).map(i => (i.toLong, 0L)).toDF("v", "hits")
      .coalesce(1).write.format("btr").mode("overwrite")
      .option("btr.deletionVectors", "true").save(p)
    val (fs, root) = fsRoot(p)
    val v0 = BtrLog.latestVersion(fs, root).get
    spark.sql(s"UPDATE graft.`$p` SET hits = 9 WHERE v >= 250")
    assert(spark.read.format("btr").load(p).filter($"hits" === 9).count() == 50)
    assert(spark.read.format("btr").option("btr.versionAsOf", v0.toString)
      .load(p).filter($"hits" === 9).count() == 0)
    BtrLog.restore(fs, root, v0)
    val back = spark.read.format("btr").load(p)
    assert(back.count() == 300 && back.filter($"hits" === 9).count() == 0)
  }

  test("change feed represents an UPDATE as exact delete+insert events") {
    val p = tmp("feed")
    (0 until 200).map(i => (i.toLong, 0L)).toDF("v", "hits")
      .coalesce(1).write.format("btr").mode("overwrite")
      .option("btr.deletionVectors", "true").save(p)
    val (fs, root) = fsRoot(p)
    val v0 = BtrLog.latestVersion(fs, root).get
    spark.sql(s"UPDATE graft.`$p` SET hits = 1 WHERE v % 50 = 3")
    val ev = BtrChanges.between(spark, p, v0, BtrLog.latestVersion(fs, root).get)
      .select($"v", $"hits", $"_change_type")
      .as[(Long, Long, String)].collect().sortBy(e => (e._3, e._1)).toSeq
    val touched = (0L until 200L).filter(_ % 50 == 3)
    assert(ev == touched.map(v => (v, 0L, "delete")) ++ touched.map(v => (v, 1L, "insert")),
      ev.toString)
  }

  test("a rowdelta entry landing on a CHECKPOINT version keeps its insert files") {
    val p = tmp("ckpt")
    (0 until 50).map(i => (i.toLong, 0L)).toDF("v", "hits")
      .coalesce(1).write.format("btr").mode("overwrite")
      .option("btr.deletionVectors", "true").save(p) // v1
    (0 until 14).foreach { i => // v2..v15
      Seq((1000L + i, 0L)).toDF("v", "hits")
        .coalesce(1).write.format("btr").mode("append").save(p)
    }
    val (fs, root) = fsRoot(p)
    assert(BtrLog.latestVersion(fs, root).get == 15L)
    // v16 = checkpoint cadence: the rowdelta entry is a FULL listing
    // built while this commit's own pending marker still hides its
    // insert file — the checkpoint must carry it anyway
    spark.sql(s"UPDATE graft.`$p` SET hits = 7 WHERE v = 3")
    assert(BtrLog.latestVersion(fs, root).get == 16L)
    assert(!BtrLog.readEntry(fs, root, 16L).isDelta, "v16 must be a checkpoint")
    def hitsAt(ver: Long): Long =
      spark.read.format("btr").option("btr.versionAsOf", ver.toString).load(p)
        .filter($"v" === 3L).select("hits").as[Long].head()
    assert(hitsAt(16L) == 7L, "the checkpoint must include the insert file")
    assert(spark.read.format("btr").option("btr.versionAsOf", "16").load(p).count() == 64)
    // a later delta anchors on the checkpoint and stays complete
    Seq((2000L, 0L)).toDF("v", "hits")
      .coalesce(1).write.format("btr").mode("append").save(p) // v17
    assert(hitsAt(17L) == 7L)
    assert(spark.read.format("btr").option("btr.versionAsOf", "17").load(p).count() == 65)
  }

  test("a scan racing a finishing UPDATE sees exactly one image per row") {
    val p = tmp("resolve-listing-gap")
    (0 until 400).map(i => (i.toLong, s"r$i")).toDF("v", "s")
      .coalesce(1).write.format("btr").mode("overwrite")
      .option("btr.deletionVectors", "true").save(p)
    // the UPDATE lands deterministically BETWEEN the reader's mask
    // resolve and its data listing — the worst interleaving: without
    // marker capture + the rowdelta recheck, the listing would show the
    // update's insert files while this plan's mask set lacks its blobs,
    // emitting old AND new row images (a state that never existed)
    BtrScan.betweenDvResolveAndListing =
      () => spark.sql(s"UPDATE graft.`$p` SET s = 'upd' WHERE v < 100")
    try {
      val rows = spark.read.format("btr").load(p)
        .select("v", "s").collect().map(r => (r.getLong(0), r.getString(1)))
      assert(rows.length == 400, s"expected 400 rows, got ${rows.length} (duplicates?)")
      assert(rows.groupBy(_._1).forall(_._2.length == 1), "one image per key")
      // the retry re-resolves the log AFTER the commit: post-update view
      assert(rows.count(_._2 == "upd") == 100)
    } finally BtrScan.betweenDvResolveAndListing = () => ()
  }

  test("UPDATE losing a post-claim race against OPTIMIZE rolls back completely") {
    val p = tmp("race")
    (0 until 100).map(i => (i.toLong, 0L)).toDF("v", "hits")
      .coalesce(1).write.format("btr").mode("overwrite")
      .option("btr.deletionVectors", "true").save(p)
    val (fs, root) = fsRoot(p)
    val rowIdSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(BtrScan.FileMetaCol,
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField(BtrScan.PosMetaCol,
        org.apache.spark.sql.types.LongType)))
    val rowSchema = spark.read.format("btr").load(p).schema
    val target = graft.format.BtrTableMeta
      .listDataFilesWithPartitions(fs, root).head.path.toString
    // the rewrite lands inside the UPDATE's pre-check → claim window:
    // its masks would be orphaned and its delete lost — must roll back
    val bw = new BtrDvDeltaWrite(p, rowIdSchema,
      beforeClaim = () => BtrCompact.rewriteClustered(spark, p, Seq("v")),
      rowSchema = Some(rowSchema)).toBatch
    val w = bw.createBatchWriterFactory(null).createWriter(0, 1L)
    w.delete(null, org.apache.spark.sql.catalyst.InternalRow(
      org.apache.spark.unsafe.types.UTF8String.fromString(target), 3L))
    w.insert(org.apache.spark.sql.catalyst.InternalRow(3L, 42L))
    val msg = w.commit()
    val e = intercept[IllegalStateException] { bw.commit(Array(msg)) }
    assert(e.getMessage.contains("post-claim"), e.getMessage)
    // complete rollback: no marker, no masks, no stray inserts, latest
    // log entry is the compensating abort
    assert(new java.io.File(p).listFiles().forall(
      !_.getName.startsWith("_btr_dvpending_")))
    val back = spark.read.format("btr").load(p)
    assert(back.count() == 100 && back.filter($"hits" === 42).count() == 0)
    val latest = BtrLog.latestVersion(fs, root).get
    assert(BtrLog.readEntry(fs, root, latest).action == "rowdelta-abort")
    assert(spark.read.format("btr").option("btr.versionAsOf", latest.toString)
      .load(p).count() == 100)
  }

  test("crash before the log entry: readers see the pre-update state; convergence rolls forward") {
    val p = tmp("crash")
    (0 until 100).map(i => (i.toLong, 0L)).toDF("v", "hits")
      .coalesce(1).write.format("btr").mode("overwrite")
      .option("btr.deletionVectors", "true").save(p)
    val (fs, root) = fsRoot(p)

    // drive the delta write directly with a crash injected between the
    // renames and the log claim — the torn window the marker guards
    val rowIdSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(BtrScan.FileMetaCol,
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField(BtrScan.PosMetaCol,
        org.apache.spark.sql.types.LongType)))
    val rowSchema = spark.read.format("btr").load(p).schema
    val target = graft.format.BtrTableMeta
      .listDataFilesWithPartitions(fs, root).head.path.toString
    val bw = new BtrDvDeltaWrite(p, rowIdSchema,
      beforeClaim = () => throw new RuntimeException("boom"),
      rowSchema = Some(rowSchema)).toBatch
    val w = bw.createBatchWriterFactory(null).createWriter(0, 1L)
    // "update" row 0: delete old image, insert the new one
    w.delete(null, org.apache.spark.sql.catalyst.InternalRow(
      org.apache.spark.unsafe.types.UTF8String.fromString(target), 0L))
    w.insert(org.apache.spark.sql.catalyst.InternalRow(0L, 42L))
    val msg = w.commit()
    intercept[RuntimeException] { bw.commit(Array(msg)) }

    // torn state: marker present, insert file renamed, no log entry —
    // readers must see the consistent PRE-update table
    assert(new java.io.File(p).listFiles().exists(_.getName.startsWith("_btr_dvpending_")))
    val pre = spark.read.format("btr").load(p)
    assert(pre.count() == 100 && pre.filter($"hits" === 42).count() == 0)

    // convergence rolls FORWARD: all insert files present → record +
    // retire the marker (minAge 0: the in-flight lease is for LIVE
    // commits; this one provably crashed)
    BtrDvOps.convergePending(fs, root, minAgeMs = 0L)
    assert(new java.io.File(p).listFiles().forall(
      !_.getName.startsWith("_btr_dvpending_")))
    val post = spark.read.format("btr").load(p)
    assert(post.count() == 100)
    assert(post.filter($"v" === 0L).select("hits").as[Long].head() == 42L)
  }
}
