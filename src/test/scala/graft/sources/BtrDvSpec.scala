package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Merge-on-read deletion vectors: DELETE on a `btr.deletionVectors`
  * table writes `_btr_dv/` position blobs instead of rewriting files;
  * scans mask the ordinals out, time travel rewinds the masks, and data
  * files stay byte-identical.
  */
class BtrDvSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("btr-dv-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  spark.conf.set("spark.sql.catalog.graft", classOf[BtrCatalog].getName)

  private def tmp(name: String) = s"/tmp/btr-dv/$name"

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

  private def dvBlobs(p: String): Array[java.io.File] =
    Option(new java.io.File(p, "_btr_dv").listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".dv")).sortBy(_.getPath)

  test("_pos metadata column carries within-file ordinals") {
    val p = tmp("pos-col")
    (0 until 300).map(i => (i, s"s$i")).toDF("v", "s")
      .coalesce(1).write.format("btr").mode("overwrite").save(p)
    val rows = spark.read.format("btr").load(p)
      .select(col("v"), col("_pos")).collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(rows.length == 300)
    // single file, single writer task: ordinals are 0..299 in v order
    assert(rows.sortBy(_._1).map(_._2).toSeq == (0L until 300L))
  }

  test("DELETE writes blobs, leaves data files byte-identical, masks reads") {
    val p = tmp("basic")
    (0 until 1000).map(i => (i.toLong, s"r$i")).toDF("v", "s")
      .coalesce(1).write.format("btr").mode("overwrite")
      .option("btr.deletionVectors", "true").save(p)
    (1000 until 2000).map(i => (i.toLong, s"r$i")).toDF("v", "s")
      .coalesce(1).write.format("btr").mode("append").save(p)
    val before = dataFiles(p).map(f => f.getName -> md5(f)).toMap
    assert(before.size == 2)

    // misaligned predicate: would be a 2-file rewrite under copy-on-write
    spark.sql(s"DELETE FROM graft.`$p` WHERE v % 10 = 3")

    val after = dataFiles(p).map(f => f.getName -> md5(f)).toMap
    assert(after == before, "deletion-vector DELETE must not touch data files")
    assert(dvBlobs(p).nonEmpty, "expected _btr_dv blobs")

    val back = spark.read.format("btr").load(p)
    assert(back.count() == 1800)
    assert(back.filter($"v" % 10 === 3).count() == 0)
    assert(back.agg(sum($"v")).head.getLong(0) ==
      (0L until 2000L).filterNot(_ % 10 == 3).sum)
  }

  test("successive DELETEs union their masks") {
    val p = tmp("union")
    (0 until 500).map(i => (i.toLong, i % 7)).toDF("v", "m")
      .coalesce(1).write.format("btr").mode("overwrite")
      .option("btr.deletionVectors", "true").save(p)
    spark.sql(s"DELETE FROM graft.`$p` WHERE m = 2")
    spark.sql(s"DELETE FROM graft.`$p` WHERE m = 5")
    val vs = spark.read.format("btr").load(p).select("v").as[Long].collect().sorted
    assert(vs.toSeq == (0L until 500L).filter(v => v % 7 != 2 && v % 7 != 5))
    assert(dataFiles(p).length == 1)
  }

  test("time travel rewinds the masks; RESTORE drops the blobs") {
    val p = tmp("travel")
    (0 until 400).map(i => (i.toLong, s"x$i")).toDF("v", "s")
      .coalesce(1).write.format("btr").mode("overwrite")
      .option("btr.deletionVectors", "true").save(p)
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(graft.format.BtrTableMeta.hadoopConf())
    val root = fs.makeQualified(new org.apache.hadoop.fs.Path(p))
    val v0 = BtrLog.latestVersion(fs, root).get
    spark.sql(s"DELETE FROM graft.`$p` WHERE v >= 300")
    val v1 = BtrLog.latestVersion(fs, root).get
    assert(v1 == v0 + 1)

    assert(spark.read.format("btr").option("btr.versionAsOf", v0.toString)
      .load(p).count() == 400)
    assert(spark.read.format("btr").option("btr.versionAsOf", v1.toString)
      .load(p).count() == 300)
    assert(spark.read.format("btr").load(p).count() == 300)

    // RESTORE to the pre-delete version: blobs drop, rows resurrect
    BtrLog.restore(fs, root, v0)
    assert(spark.read.format("btr").load(p).count() == 400)
    assert(dvBlobs(p).isEmpty, "restore past the DELETE must drop its blobs")
  }

  test("RESTORE leaves a fresh uncommitted blob alone (in-flight lease)") {
    val p = tmp("restore-lease")
    (0 until 200).map(i => (i.toLong, s"x$i")).toDF("v", "s")
      .coalesce(1).write.format("btr").mode("overwrite")
      .option("btr.deletionVectors", "true").save(p)
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(graft.format.BtrTableMeta.hadoopConf())
    val root = fs.makeQualified(new org.apache.hadoop.fs.Path(p))
    val v0 = BtrLog.latestVersion(fs, root).get
    spark.sql(s"DELETE FROM graft.`$p` WHERE v >= 150")
    assert(dvBlobs(p).nonEmpty)
    // the task-committed half of an IN-FLIGHT blob-only DELETE whose
    // driver has not recorded it yet: restore's live set must not drop
    // it (the commit would otherwise publish a snapshot referencing a
    // physically missing blob) — it is leased, not orphaned
    val inflight = new java.io.File(new java.io.File(p, "_btr_dv"),
      "part-0.btr.deadbeef-0-0.dv")
    java.nio.file.Files.write(inflight.toPath,
      graft.format.DeletionVector.serialize(1L, Array(0L)))
    BtrLog.restore(fs, root, v0)
    assert(spark.read.format("btr").load(p).count() == 200)
    assert(inflight.exists(), "restore must not sweep a leased uncommitted blob")
    val left = dvBlobs(p).map(_.getName).toSet
    assert(left == Set(inflight.getName),
      "committed blobs past the restore point must still drop")
    inflight.delete()
  }

  test("partitioned table: DELETE masks rows without touching files or dirs") {
    val p = tmp("parts")
    (0 until 600).map(i => (s"k${i % 3}", i.toLong)).toDF("k", "v")
      .repartition($"k").write.format("btr").partitionBy("k")
      .option("btr.deletionVectors", "true").mode("overwrite").save(p)
    val before = dataFiles(p).map(f => f.getPath -> md5(f)).toMap
    spark.sql(s"DELETE FROM graft.`$p` WHERE v % 2 = 0 AND k = 'k1'")
    val after = dataFiles(p).map(f => f.getPath -> md5(f)).toMap
    assert(after == before)
    val back = spark.read.format("btr").load(p)
    assert(back.count() == 600 - 100)
    assert(back.filter($"k" === "k1").count() == 100)
    // partition pruning still applies on the masked table
    assert(back.filter($"k" === "k0").count() == 200)
  }

  test("multi-row-group files mask per group and skip fully-deleted groups") {
    val p = tmp("groups")
    // > 65536 rows in one file → several row groups
    (0 until 150000).map(i => (i.toLong, i % 100)).toDF("v", "m")
      .coalesce(1).write.format("btr").mode("overwrite")
      .option("btr.deletionVectors", "true").save(p)
    // wipe the first row group entirely plus a band in the second
    spark.sql(s"DELETE FROM graft.`$p` WHERE v < 65536 OR (v >= 70000 AND v < 70100)")
    val back = spark.read.format("btr").load(p)
    assert(back.count() == 150000 - 65536 - 100)
    assert(back.agg(min($"v")).head.getLong(0) == 65536L)
    assert(back.filter($"v" >= 70000 && $"v" < 70100).count() == 0)
    assert(dataFiles(p).length == 1)
  }

  test("UPDATE after a DELETE is merge-on-read too: masks stack, no file rewritten") {
    val p = tmp("mor-upd")
    (0 until 800).map(i => (i.toLong, 0L)).toDF("v", "hits")
      .coalesce(1).write.format("btr").mode("overwrite")
      .option("btr.deletionVectors", "true").save(p)
    val original = dataFiles(p).map(_.getName).toSet
    spark.sql(s"DELETE FROM graft.`$p` WHERE v % 4 = 1")
    val blobsAfterDelete = dvBlobs(p).length
    assert(blobsAfterDelete > 0)
    // UPDATE takes the delta path: old images mask out, new images land
    // in a fresh appended file — the original file is never rewritten
    spark.sql(s"UPDATE graft.`$p` SET hits = 1 WHERE v % 4 = 2")
    assert(original.subsetOf(dataFiles(p).map(_.getName).toSet),
      "original files must survive byte-identical under merge-on-read UPDATE")
    assert(dataFiles(p).length > original.size, "updated rows land in new files")
    assert(dvBlobs(p).length > blobsAfterDelete, "the UPDATE adds masks")
    val back = spark.read.format("btr").load(p).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val expect = (0L until 800L).filter(_ % 4 != 1).map(v => (v, if (v % 4 == 2) 1L else 0L))
    assert(back.toSeq == expect)
  }

  test("file-aligned metadata DELETE takes the doomed file's blobs with it") {
    val p = tmp("aligned")
    (0 until 500).map(i => (i.toLong, i % 5)).toDF("v", "m")
      .coalesce(1).write.format("btr").mode("overwrite")
      .option("btr.deletionVectors", "true").save(p)
    (500 until 1000).map(i => (i.toLong, i % 5)).toDF("v", "m")
      .coalesce(1).write.format("btr").mode("append").save(p)
    spark.sql(s"DELETE FROM graft.`$p` WHERE v % 5 = 0") // DV path, blobs on both files
    assert(dvBlobs(p).length >= 2)
    // stats-aligned predicate → metadata path deletes the first file whole
    spark.sql(s"DELETE FROM graft.`$p` WHERE v < 500")
    assert(dataFiles(p).length == 1)
    val namesLeft = dvBlobs(p).map(_.getName)
    assert(namesLeft.forall(n => !graft.format.DeletionVector
      .targetOf(s"_btr_dv/$n").exists(_.isEmpty)), "sanity")
    // only the surviving file's blob remains
    val back = spark.read.format("btr").load(p).select("v").as[Long].collect().sorted
    assert(back.toSeq == (500L until 1000L).filterNot(_ % 5 == 0))
    // current snapshot must not reference removed blobs (a fresh scan
    // resolves them without error — loud failure would throw here)
    assert(spark.read.format("btr").load(p).count() == back.length)
  }

  test("OPTIMIZE compact leaves masked files alone; CLUSTER rewrite applies + drops masks") {
    val p = tmp("optimize")
    (0 until 300).map(i => (i.toLong, s"a$i")).toDF("v", "s")
      .coalesce(1).write.format("btr").mode("overwrite")
      .option("btr.deletionVectors", "true").save(p)
    (300 until 600).map(i => (i.toLong, s"a$i")).toDF("v", "s")
      .coalesce(1).write.format("btr").mode("append").save(p)
    (600 until 900).map(i => (i.toLong, s"a$i")).toDF("v", "s")
      .coalesce(1).write.format("btr").mode("append").save(p)
    spark.sql(s"DELETE FROM graft.`$p` WHERE v % 3 = 0 AND v < 300") // masks file 1 only
    assert(dataFiles(p).length == 3 && dvBlobs(p).length == 1)

    // byte-merge compaction must not splice the masked file
    val (b, a) = BtrCompact.compact(spark, p, targetBytes = Long.MaxValue)
    assert(dvBlobs(p).length == 1, "compact must not touch masked files' blobs")
    val afterCompact = spark.read.format("btr").load(p).select("v").as[Long].collect().sorted
    assert(afterCompact.toSeq == (0L until 900L).filterNot(v => v % 3 == 0 && v < 300))

    // full rewrite applies the masks physically and drops the blobs
    BtrCompact.rewriteClustered(spark, p, Seq("v"))
    assert(dvBlobs(p).isEmpty, "rewrite must retire applied blobs")
    val afterRewrite = spark.read.format("btr").load(p).select("v").as[Long].collect().sorted
    assert(afterRewrite.toSeq == afterCompact.toSeq)
  }

  test("partitioned CLUSTER rewrite applies masks per directory and drops blobs") {
    val p = tmp("part-rewrite")
    (0 until 600).map(i => (s"k${i % 3}", i.toLong)).toDF("k", "v")
      .repartition($"k").write.format("btr").partitionBy("k")
      .option("btr.deletionVectors", "true").mode("overwrite").save(p)
    spark.sql(s"DELETE FROM graft.`$p` WHERE v % 4 = 1")
    assert(dvBlobs(p).nonEmpty)
    val (b, a) = BtrCompact.rewriteClustered(spark, p, Seq("v"))
    assert(b > 0 && a > 0)
    assert(dvBlobs(p).isEmpty, "rewrite must retire applied blobs")
    // directory layout preserved, masked rows physically gone
    val back = spark.read.format("btr").load(p)
    assert(back.select("k").distinct().count() == 3)
    assert(back.count() == (0L until 600L).count(_ % 4 != 1))
    assert(back.filter($"v" % 4 === 1).count() == 0)
    // partition pruning still exact after the rewrite
    assert(back.filter($"k" === "k1").count() ==
      (0L until 600L).count(v => v % 3 == 1 && v % 4 != 1))
  }

  test("APPLY PURGE rewrites only files over the mask threshold, retiring their blobs") {
    // the shared test session predates parser injection — drive the
    // parser class directly, same path sql() takes after injection
    val parser = new BtrSparkSqlParser(spark.sessionState.sqlParser)
    def purge(stmt: String): org.apache.spark.sql.Row =
      parser.parsePlan(stmt).asInstanceOf[BtrOptimizeCommand].run(spark).head
    val p = tmp("purge")
    // this test ALTERs table meta (the threshold property survives an
    // overwrite) — start from a clean slate
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
    // two single-file appends with disjoint key ranges so the DELETEs
    // below mask a controlled fraction of each file
    (0 until 1000).map(i => (i.toLong, s"r$i")).toDF("v", "s")
      .coalesce(1).write.format("btr").mode("overwrite")
      .option("btr.deletionVectors", "true").save(p)
    (1000 until 2000).map(i => (i.toLong, s"r$i")).toDF("v", "s")
      .coalesce(1).write.format("btr").mode("append").save(p)
    spark.sql(s"DELETE FROM graft.`$p` WHERE v < 500") // 50% of file 1
    spark.sql(s"DELETE FROM graft.`$p` WHERE v >= 1000 AND v < 1020") // 2% of file 2
    val before = dataFiles(p).map(f => f.getName -> md5(f)).toMap
    assert(before.size == 2 && dvBlobs(p).length == 2)

    val res = purge(s"OPTIMIZE graft.`$p` APPLY PURGE")
    assert(res.getLong(1) == 1 && res.getLong(2) == 1,
      s"expected (1 rewritten, 1 staged), got $res")

    val after = dataFiles(p).map(f => f.getName -> md5(f)).toMap
    val untouched = before.filter { case (n, h) => after.get(n).contains(h) }
    assert(untouched.size == 1, "the lightly-masked file must stay byte-identical")
    assert(after.size == 2, "survivors of the purged file land in one new file")
    // only the light file's blob remains, and it still masks its rows
    val leftBlobs = dvBlobs(p).map(_.getName)
    assert(leftBlobs.length == 1, leftBlobs.mkString(", "))
    assert(graft.format.DeletionVector.targetOf(s"_btr_dv/${leftBlobs.head}")
      .contains(untouched.keySet.head))
    val back = spark.read.format("btr").load(p).select("v").as[Long].collect().sorted
    assert(back.toSeq == (500L until 1000L) ++ (1020L until 2000L))

    // a second purge finds nothing over the line: zero-touch
    assert(purge(s"OPTIMIZE graft.`$p` APPLY PURGE").getLong(1) == 0)

    // lowering the per-table threshold pulls the light file over the line
    spark.sql(s"ALTER TABLE graft.`$p` SET TBLPROPERTIES ('btr.dvPurgeThreshold' = '0.01')")
    assert(spark.sql(s"SHOW TBLPROPERTIES graft.`$p`").collect()
      .exists(r => r.getString(0) == "btr.dvPurgeThreshold" && r.getString(1) == "0.01"))
    assert(purge(s"OPTIMIZE graft.`$p` APPLY PURGE").getLong(1) == 1)
    assert(dvBlobs(p).isEmpty, "all mask debt reclaimed")
    assert(spark.read.format("btr").load(p).count() == 1480)
  }

  test("partition-scoped APPLY PURGE WHERE touches only matching partitions") {
    val parser = new BtrSparkSqlParser(spark.sessionState.sqlParser)
    val p = tmp("purge-where")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
    (0 until 600).map(i => (s"k${i % 3}", i.toLong)).toDF("k", "v")
      .repartition($"k").write.format("btr").partitionBy("k")
      .option("btr.deletionVectors", "true").mode("overwrite").save(p)
    // both k0 and k1 end up heavily masked; only k0 is in scope
    spark.sql(s"DELETE FROM graft.`$p` WHERE v % 2 = 0 AND k IN ('k0', 'k1')")
    val before = dataFiles(p).map(f => f.getPath -> md5(f)).toMap
    val res = parser.parsePlan(s"OPTIMIZE graft.`$p` APPLY PURGE WHERE k = 'k0'")
      .asInstanceOf[BtrOptimizeCommand].run(spark).head
    assert(res.getLong(1) == 1, res.toString)
    val after = dataFiles(p).map(f => f.getPath -> md5(f)).toMap
    // k1's and k2's files untouched
    assert(before.filter(_._1.contains("k=k1")).forall { case (n, h) =>
      after.get(n).contains(h) })
    assert(before.filter(_._1.contains("k=k2")).forall { case (n, h) =>
      after.get(n).contains(h) })
    // k1's masks still apply, k0's debt is reclaimed
    val leftTargets = dvBlobs(p).map(f =>
      graft.format.DeletionVector.targetOf(s"_btr_dv/${f.getName}").get).toSeq
    assert(leftTargets.nonEmpty && leftTargets.forall(_.startsWith("k=k1/")),
      leftTargets.mkString(", "))
    val back = spark.read.format("btr").load(p)
    assert(back.count() == 400)
    assert(back.filter($"k" === "k0").count() == 100)
    assert(back.filter($"k" === "k1").count() == 100)
    // combining PURGE with a clustered rewrite refuses loudly
    val e = intercept[IllegalArgumentException] {
      parser.parsePlan(s"OPTIMIZE graft.`$p` CLUSTER BY (v) APPLY PURGE")
    }
    assert(e.getMessage.contains("APPLY PURGE"), e.getMessage)
  }

  test("truncate overwrite clears every blob") {
    val p = tmp("truncate")
    (0 until 200).map(i => (i.toLong, s"x$i")).toDF("v", "s")
      .coalesce(1).write.format("btr").mode("overwrite")
      .option("btr.deletionVectors", "true").save(p)
    spark.sql(s"DELETE FROM graft.`$p` WHERE v % 2 = 1")
    assert(dvBlobs(p).nonEmpty)
    (0 until 50).map(i => (i.toLong, s"y$i")).toDF("v", "s")
      .coalesce(1).write.format("btr").mode("overwrite").save(p)
    assert(dvBlobs(p).isEmpty, "truncate must clear the dv dir")
    assert(spark.read.format("btr").load(p).count() == 50)
  }

  test("VACUUM sweeps orphan (never-committed) blobs, keeps referenced ones") {
    val p = tmp("vacuum")
    (0 until 200).map(i => (i.toLong, s"r$i")).toDF("v", "s")
      .coalesce(1).write.format("btr").mode("overwrite")
      .option("btr.deletionVectors", "true").save(p)
    spark.sql(s"DELETE FROM graft.`$p` WHERE v % 2 = 0")
    val committed = dvBlobs(p).map(_.getName).toSet
    assert(committed.nonEmpty)
    // plant a crashed commit's leftovers: an unreferenced blob + a task tmp
    val dvDir = new java.io.File(p, "_btr_dv")
    val orphan = new java.io.File(dvDir, "part-0.btr.deadbeef-0-0.dv")
    java.nio.file.Files.write(orphan.toPath,
      graft.format.DeletionVector.serialize(1L, Array(0L)))
    val tmpBlob = new java.io.File(dvDir, ".tmp-deadbeef-0-0-0")
    java.nio.file.Files.write(tmpBlob.toPath, Array[Byte](1, 2, 3))
    orphan.setLastModified(System.currentTimeMillis() - 100000)
    tmpBlob.setLastModified(System.currentTimeMillis() - 100000)

    // a FRESH unreferenced blob — the task-committed half of an
    // in-flight blob-only DELETE. Even RETAIN 0 must not sweep it: the
    // orphan cutoff is floored by the in-flight lease independently of
    // the user-supplied retention.
    val inflight = new java.io.File(dvDir, "part-0.btr.cafebabe-0-0.dv")
    java.nio.file.Files.write(inflight.toPath,
      graft.format.DeletionVector.serialize(1L, Array(1L)))

    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(graft.format.BtrTableMeta.hadoopConf())
    BtrVacuum.run(fs, new org.apache.hadoop.fs.Path(p), retentionMs = 0)
    assert(inflight.exists(),
      "in-flight lease must protect fresh blobs from RETAIN 0")
    BtrVacuum.run(fs, new org.apache.hadoop.fs.Path(p), retentionMs = 10000,
      dvLeaseMs = 50000)
    val left = dvBlobs(p).map(_.getName).toSet
    assert(left == committed + inflight.getName, s"expected $committed, got $left")
    assert(!tmpBlob.exists())
    inflight.delete()
    // masks still apply after the vacuum
    assert(spark.read.format("btr").load(p).count() == 100)
  }

  test("btr_dv TVF inventories committed blobs; OPTIMIZE clears the debt") {
    val p = tmp("tvf")
    graft.GraftExtensions.register(spark)
    (0 until 300).map(i => (i.toLong, s"r$i")).toDF("v", "s")
      .coalesce(1).write.format("btr").mode("overwrite")
      .option("btr.deletionVectors", "true").save(p)
    assert(spark.sql(s"SELECT * FROM btr_dv('$p')").count() == 0)
    spark.sql(s"DELETE FROM graft.`$p` WHERE v % 3 = 1")
    val rows = spark.sql(
      s"SELECT target, deleted_rows FROM btr_dv('$p')").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(1)).sum == (0 until 300).count(_ % 3 == 1))
    BtrCompact.rewriteClustered(spark, p, Seq("v"))
    assert(spark.sql(s"SELECT * FROM btr_dv('$p')").count() == 0,
      "OPTIMIZE must clear the mask debt")
  }

  test("masks compose with schema evolution (pre-widening files + added columns)") {
    val p = tmp("evolution")
    // generation 1: narrow schema
    (0 until 300).map(i => (i, s"r$i")).toDF("v", "s")
      .coalesce(1).write.format("btr").mode("overwrite")
      .option("btr.deletionVectors", "true").save(p)
    // generation 2 widens v to long and adds a column
    (300L until 600L).map(i => (i, s"r$i", i * 2)).toDF("v", "s", "extra")
      .coalesce(1).write.format("btr").mode("append").save(p)
    // masks land on BOTH generations
    spark.sql(s"DELETE FROM graft.`$p` WHERE v % 3 = 0")
    val back = spark.read.format("btr").load(p)
    assert(back.count() == (0L until 600L).count(_ % 3 != 0))
    // pre-widening rows read the added column as null, masked rows gone
    assert(back.filter(col("extra").isNull).count() == (0 until 300).count(_ % 3 != 0))
    assert(back.filter(col("v") === 3L || col("v") === 300L).count() == 0)
    assert(back.agg(sum($"extra")).head.getLong(0) ==
      (300L until 600L).filterNot(_ % 3 == 0).map(_ * 2).sum)
  }

  test("masks compose with column mapping (RENAME COLUMN after a DV delete)") {
    val p = tmp("colmap")
    (0 until 200).map(i => (i.toLong, s"r$i")).toDF("v", "s")
      .coalesce(1).write.format("btr").mode("overwrite")
      .option("btr.deletionVectors", "true").save(p)
    spark.sql(s"DELETE FROM graft.`$p` WHERE v % 4 = 2")
    spark.sql(s"ALTER TABLE graft.`$p` RENAME COLUMN v TO val")
    val back = spark.read.format("btr").load(p)
    assert(back.columns.toSeq == Seq("val", "s"))
    assert(back.select("val").as[Long].collect().sorted.toSeq ==
      (0L until 200L).filterNot(_ % 4 == 2))
    // and a DELETE through the NEW name still takes the DV path
    val files = dataFiles(p).map(_.getName).toSet
    spark.sql(s"DELETE FROM graft.`$p` WHERE val % 4 = 3")
    assert(dataFiles(p).map(_.getName).toSet == files)
    assert(back.count() == (0L until 200L).count(v => v % 4 != 2 && v % 4 != 3))
  }

  test("TBLPROPERTIES surface: SHOW, SET enables DV, UNSET refuses while masks exist") {
    val p = tmp("props")
    (0 until 100).map(i => (i.toLong, s"r$i")).toDF("v", "s")
      .coalesce(1).write.format("btr").mode("overwrite").save(p)
    // not a DV table yet: DELETE takes copy-on-write
    assert(spark.sql(s"SHOW TBLPROPERTIES graft.`$p`")
      .filter($"key" === "btr.deletionVectors").count() == 0)
    spark.sql(s"ALTER TABLE graft.`$p` SET TBLPROPERTIES ('btr.deletionVectors' = 'true')")
    assert(spark.sql(s"SHOW TBLPROPERTIES graft.`$p`")
      .filter($"key" === "btr.deletionVectors").head.getString(1) == "true")
    val files = dataFiles(p).map(_.getName).toSet
    spark.sql(s"DELETE FROM graft.`$p` WHERE v % 5 = 1")
    assert(dataFiles(p).map(_.getName).toSet == files, "post-SET delete must be MoR")
    assert(dvBlobs(p).nonEmpty)
    // disabling with outstanding masks would resurrect rows — refused
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$p` UNSET TBLPROPERTIES ('btr.deletionVectors')")
    }
    assert(e.getMessage.contains("OPTIMIZE"), e.getMessage)
    // after OPTIMIZE folds the masks in, disabling works
    BtrCompact.rewriteClustered(spark, p, Seq("v"))
    spark.sql(s"ALTER TABLE graft.`$p` UNSET TBLPROPERTIES ('btr.deletionVectors')")
    assert(spark.sql(s"SHOW TBLPROPERTIES graft.`$p`")
      .filter($"key" === "btr.deletionVectors").count() == 0)
    assert(spark.read.format("btr").load(p).count() == 80)
  }

  test("DELETE matching nothing commits nothing") {
    val p = tmp("noop")
    (0 until 100).map(i => (i.toLong, s"r$i")).toDF("v", "s")
      .coalesce(1).write.format("btr").mode("overwrite")
      .option("btr.deletionVectors", "true").save(p)
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(graft.format.BtrTableMeta.hadoopConf())
    val root = fs.makeQualified(new org.apache.hadoop.fs.Path(p))
    val v0 = BtrLog.latestVersion(fs, root).get
    // modulo predicate: stats can't prove it empty (no metadata-delete
    // downgrade), the delta plan runs, zero rows match → no version
    spark.sql(s"DELETE FROM graft.`$p` WHERE v % 103 = 101")
    assert(BtrLog.latestVersion(fs, root).get == v0, "no-op DELETE must not commit")
    assert(dvBlobs(p).isEmpty)
    assert(spark.read.format("btr").load(p).count() == 100)
  }
}
