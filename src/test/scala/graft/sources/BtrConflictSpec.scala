package graft.sources

import graft.format.{BtrConfig, BtrTableMeta}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.WriterCommitMessage
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Concurrent-writer conflict detection: a replacing commit whose source
  * files a concurrent commit removed must ABORT LOUDLY before its swap
  * journal publishes (staged files sweep away; the survivor's state
  * stands), and an append whose task-committed files a concurrent DELETE
  * consumed must fail its driver commit rather than leave a
  * half-applied append no serial order could produce. The interleavings
  * are driven deterministically through BtrBatchWrite: stage both
  * writes, then commit them in conflict order.
  */
class BtrConflictSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("conflict-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.catalog.graft", "graft.sources.BtrCatalog")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(name: String) = {
    val d = s"/tmp/btr-conflict-spec/$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
    d
  }

  private def fsRoot(dir: String) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(BtrTableMeta.hadoopConf())
    (fs, fs.makeQualified(p))
  }

  private val intSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("x", org.apache.spark.sql.types.IntegerType)))

  /** Stage a write (task-side complete, driver commit NOT yet run). */
  private def stage(dir: String, mode: BtrOverwriteMode, rows: Seq[Int])
      : (BtrBatchWrite, Array[WriterCommitMessage]) = {
    val bw = new BtrBatchWrite(dir, intSchema, mode, 65536, 3, BtrConfig.Default, Nil)
    val w = bw.createBatchWriterFactory(null).createWriter(0, scala.util.Random.nextLong())
    rows.foreach(i => w.write(InternalRow(i)))
    (bw, Array(w.commit()))
  }

  private def relFiles(dir: String): Seq[String] = {
    val (fs, root) = fsRoot(dir)
    val rootLen = root.toUri.getPath.length + 1
    BtrTableMeta.listDataFilesWithPartitions(fs, root)
      .map(_.path.toUri.getPath.substring(rootLen)).toSeq.sorted
  }

  private def readInts(dir: String): Seq[Int] = {
    import spark.implicits._
    spark.read.format("btr").load(dir).as[Int].collect().sorted.toSeq
  }

  test("two interleaved row-level rewrites: the second aborts loudly, survivor consistent") {
    val dir = tmp("merge-race")
    import spark.implicits._
    Seq(1, 2, 3).toDF("x").repartition(1).write.format("btr").mode("overwrite").save(dir)
    val sources = relFiles(dir)
    assert(sources.length == 1)

    // both rewrites read the SAME source file (two MERGEs whose scans
    // both selected it), staged before either commits
    val (bw1, m1) = stage(dir, BtrOverwriteMode.ReplaceFiles(() => sources), Seq(10, 20, 30))
    val (bw2, m2) = stage(dir, BtrOverwriteMode.ReplaceFiles(() => sources), Seq(77))

    bw1.commit(m1) // first rewrite wins: replaces the source
    val e = intercept[IllegalStateException] { bw2.commit(m2) }
    assert(e.getMessage.contains("concurrent commit conflict"), e.getMessage)
    bw2.abort(m2)

    // survivor state: exactly the first rewrite's rows, and every listed
    // file parses (consistency check)
    assert(readInts(dir) == Seq(10, 20, 30))
    val consistency = graft.functions.BtrInspect.fileConsistency(spark, dir)
    assert(consistency.filter(not(col("ok"))).count() == 0)
  }

  test("DELETE consuming an in-flight append's files fails the append commit") {
    val dir = tmp("delete-vs-append")
    import spark.implicits._
    Seq(1).toDF("x").repartition(1).write.format("btr").mode("overwrite").save(dir)

    // append task-commits its file (visible), driver commit pending
    val (bw, m) = stage(dir, BtrOverwriteMode.Append, Seq(50))
    assert(relFiles(dir).length == 2, "staged append file must be visible")

    // the concurrent DELETE's predicate matches every file — it consumes
    // the base file AND the append's task-committed file
    spark.sql(s"DELETE FROM graft.`$dir` WHERE x >= 0")
    assert(relFiles(dir).isEmpty)

    val e = intercept[IllegalStateException] { bw.commit(m) }
    assert(e.getMessage.contains("concurrent commit conflict"), e.getMessage)
    bw.abort(m)

    // clean "DELETE won" state: empty table, zero leftover files
    assert(readInts(dir).isEmpty && relFiles(dir).isEmpty)
  }

  test("OPTIMIZE ignores an in-flight append's task files; the append then commits") {
    val dir = tmp("optimize-vs-append")
    import spark.implicits._
    // two committed files give the compactor a bin
    Seq(1).toDF("x").repartition(1).write.format("btr").mode("overwrite").save(dir) // v1
    Seq(2).toDF("x").repartition(1).write.format("btr").mode("append").save(dir)    // v2

    // append task-commits its file (listing-visible), driver commit pending
    val (bw, m) = stage(dir, BtrOverwriteMode.Append, Seq(50))
    assert(relFiles(dir).length == 3, "staged append file must be visible")

    // the compactor must bin ONLY the snapshot-committed files: folding
    // the in-flight task file into a merged bin would re-home its rows,
    // fail the append's conflict check, and the advised retry would
    // DUPLICATE rows already durable in the merged file
    val (_, after) = BtrCompact.compact(spark, dir, 128L * 1024 * 1024)
    assert(after >= 1)
    assert(relFiles(dir).length == 2, // merged file + untouched staged file
      relFiles(dir).toString)

    // append-then-OPTIMIZE serializes cleanly: the append commits fine
    bw.commit(m)
    assert(readInts(dir) == Seq(1, 2, 50))
    val consistency = graft.functions.BtrInspect.fileConsistency(spark, dir)
    assert(consistency.filter(not(col("ok"))).count() == 0)
  }

  test("clustered rewrite on a MASKED table still ignores in-flight append task files") {
    // regression (found by BtrRaceFuzzSpec seed 977001): the rewrite's
    // pinned-snapshot guard checked log-coverage against the data-file
    // listing WITHOUT excluding deletion-vector blob rels — any live
    // mask disabled the guard, the rewrite swallowed the staged file's
    // rows, and the append aborted with a retry advice that would have
    // duplicated them
    val dir = tmp("rewrite-masked-vs-append")
    import spark.implicits._
    Seq(1, 2, 3, 4).toDF("x").repartition(1).write.format("btr")
      .option("btr.deletionVectors", "true").mode("overwrite").save(dir)
    spark.sql(s"DELETE FROM graft.`$dir` WHERE x = 2") // leaves a live DV blob
    assert(readInts(dir) == Seq(1, 3, 4))

    val (bw, m) = stage(dir, BtrOverwriteMode.Append, Seq(50))
    BtrCompact.rewriteClustered(spark, dir, Seq("x"))
    // the staged file must be untouched: the append commits cleanly and
    // its rows appear exactly once
    bw.commit(m)
    assert(readInts(dir) == Seq(1, 3, 4, 50))
  }

  test("clustered rewrite ignores an in-flight append's task files too") {
    val dir = tmp("rewrite-vs-append")
    import spark.implicits._
    Seq(3, 1).toDF("x").repartition(1).write.format("btr").mode("overwrite").save(dir) // v1
    Seq(2).toDF("x").repartition(1).write.format("btr").mode("append").save(dir)       // v2

    val (bw, m) = stage(dir, BtrOverwriteMode.Append, Seq(50))
    BtrCompact.rewriteClustered(spark, dir, Seq("x"))
    // the rewrite replaced only the committed snapshot's rows/files
    bw.commit(m)
    assert(readInts(dir) == Seq(1, 2, 3, 50))
  }

  test("OPTIMIZE racing a DELETE aborts instead of resurrecting deleted rows") {
    val dir = tmp("optimize-race")
    import spark.implicits._
    // two small files give the compactor a bin holding both
    Seq(1, 2).toDF("x").repartition(1).write.format("btr").mode("overwrite").save(dir)
    Seq(3, 4).toDF("x").repartition(1).write.format("btr").mode("append").save(dir)
    assert(relFiles(dir).length == 2 && readInts(dir) == Seq(1, 2, 3, 4))

    // the DELETE lands deterministically INSIDE the window between the
    // compactor's merge tasks and its swap journal — publishing the
    // merged file then would resurrect the deleted rows
    val e = intercept[IllegalStateException] {
      BtrCompact.compact(spark, dir, 128L * 1024 * 1024,
        beforeSwap = () => spark.sql(s"DELETE FROM graft.`$dir` WHERE x <= 2"))
    }
    assert(e.getMessage.contains("concurrent commit conflict"), e.getMessage)

    // DELETE's outcome stands; no tmp leftovers; every file parses
    assert(readInts(dir) == Seq(3, 4), "post-race table must equal the DELETE's state")
    val (fs, root) = fsRoot(dir)
    val leftovers = fs.listStatus(root).map(_.getPath.getName)
      .filter(_.startsWith("_tmp_compact_"))
    assert(leftovers.isEmpty, leftovers.mkString(", "))
    val consistency = graft.functions.BtrInspect.fileConsistency(spark, dir)
    assert(consistency.filter(not(col("ok"))).count() == 0)
  }

  // ---- deletion-vector commit races --------------------------------

  private val rowIdSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField(BtrScan.FileMetaCol,
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField(BtrScan.PosMetaCol,
      org.apache.spark.sql.types.LongType)))

  /** Stage a DV delete of `positions` in the table's single data file
    * (task blobs written, driver commit NOT yet run).
    */
  private def stageDv(dir: String, positions: Seq[Long], beforeClaim: () => Unit = () => ())
      : (org.apache.spark.sql.connector.write.DeltaBatchWrite, Array[WriterCommitMessage]) = {
    val (fs, root) = fsRoot(dir)
    val target = BtrTableMeta.listDataFilesWithPartitions(fs, root).head.path.toString
    val bw = new BtrDvDeltaWrite(dir, rowIdSchema, beforeClaim).toBatch
    val w = bw.createBatchWriterFactory(null).createWriter(0, scala.util.Random.nextLong())
    positions.foreach(p => w.delete(null,
      InternalRow(org.apache.spark.unsafe.types.UTF8String.fromString(target), p)))
    (bw, Array(w.commit()))
  }

  private def dvBlobNames(dir: String): Seq[String] =
    Option(new java.io.File(dir, "_btr_dv").listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".dv")).map(_.getName).toSeq

  test("a staged DV delete conflicts when a rewrite replaced its target (pre-commit)") {
    val dir = tmp("dv-pre")
    import spark.implicits._
    Seq(1, 2, 3, 4).toDF("x").repartition(1).write.format("btr")
      .option("btr.deletionVectors", "true").mode("overwrite").save(dir)
    val (bw, msgs) = stageDv(dir, Seq(0L))
    // the rewrite wins the race: target replaced before the DV commit
    BtrCompact.rewriteClustered(spark, dir, Seq("x"))
    val e = intercept[IllegalStateException] { bw.commit(msgs) }
    assert(e.getMessage.contains("concurrent commit conflict"), e.getMessage)
    assert(dvBlobNames(dir).isEmpty, "conflicted commit must clean its blobs")
    assert(readInts(dir) == Seq(1, 2, 3, 4), "no delete happened")
    val (fs, root) = fsRoot(dir)
    assert(BtrLog.readEntry(fs, root, BtrLog.latestVersion(fs, root).get)
      .action == "optimize")
  }

  test("a DV commit losing the post-claim race rolls back with a compensating entry") {
    val dir = tmp("dv-post")
    import spark.implicits._
    Seq(1, 2, 3, 4).toDF("x").repartition(1).write.format("btr")
      .option("btr.deletionVectors", "true").mode("overwrite").save(dir)
    // the rewrite lands deterministically BETWEEN the DV commit's
    // pre-check and its log claim — the worst interleaving: the claim
    // succeeds but the masks are orphaned. The commit must detect it
    // post-claim, write the compensating entry, and fail loudly.
    val (bw, msgs) = stageDv(dir, Seq(0L),
      beforeClaim = () => BtrCompact.rewriteClustered(spark, dir, Seq("x")))
    val e = intercept[IllegalStateException] { bw.commit(msgs) }
    assert(e.getMessage.contains("post-claim"), e.getMessage)
    assert(dvBlobNames(dir).isEmpty, "rolled-back commit must remove its blobs")
    assert(readInts(dir) == Seq(1, 2, 3, 4), "the delete must be rolled back")
    val (fs, root) = fsRoot(dir)
    val latest = BtrLog.latestVersion(fs, root).get
    assert(BtrLog.readEntry(fs, root, latest).action == "delete-abort")
    // current and historical scans stay resolvable (no orphaned dv rels)
    assert(spark.read.format("btr").option("btr.versionAsOf", latest.toString)
      .load(dir).count() == 4)
  }

  test("a DV commit whose blobs were swept mid-commit rolls back, never publishing them") {
    val dir = tmp("dv-lost-blob")
    import spark.implicits._
    Seq(1, 2, 3, 4).toDF("x").repartition(1).write.format("btr")
      .option("btr.deletionVectors", "true").mode("overwrite").save(dir)
    val (fs, root) = fsRoot(dir)
    // a concurrent RESTORE (or an expired-lease orphan sweep) physically
    // removes the task-committed blob between the pre-check and the log
    // claim; committing anyway would publish a snapshot referencing a
    // missing blob and every subsequent scan would fail
    val (bw, msgs) = stageDv(dir, Seq(0L),
      beforeClaim = () => dvBlobNames(dir).foreach(n =>
        fs.delete(new org.apache.hadoop.fs.Path(root, s"_btr_dv/$n"), false)))
    val e = intercept[IllegalStateException] { bw.commit(msgs) }
    assert(e.getMessage.contains("blob"), e.getMessage)
    assert(readInts(dir) == Seq(1, 2, 3, 4), "the delete must be rolled back")
    val latest = BtrLog.latestVersion(fs, root).get
    assert(BtrLog.readEntry(fs, root, latest).action == "delete-abort")
    // the latest snapshot scans cleanly: no reference to the lost blob
    assert(spark.read.format("btr").load(dir).count() == 4)
  }

  test("OPTIMIZE racing a DV DELETE aborts instead of losing the delete") {
    val dir = tmp("dv-compact-race")
    import spark.implicits._
    Seq(1, 2).toDF("x").repartition(1).write.format("btr")
      .option("btr.deletionVectors", "true").mode("overwrite").save(dir)
    Seq(3, 4).toDF("x").repartition(1).write.format("btr").mode("append").save(dir)
    // the DV DELETE lands between the compactor's merge tasks and its
    // swap — splicing the masked file would resurrect x=1
    val e = intercept[IllegalStateException] {
      BtrCompact.compact(spark, dir, 128L * 1024 * 1024,
        beforeSwap = () => spark.sql(s"DELETE FROM graft.`$dir` WHERE x % 2 = 1"))
    }
    assert(e.getMessage.contains("merge-on-read DELETE"), e.getMessage)
    assert(readInts(dir) == Seq(2, 4), "the DELETE's outcome stands")
    // a retry AFTER the delete skips the masked files and succeeds
    BtrCompact.compact(spark, dir, 128L * 1024 * 1024)
    assert(readInts(dir) == Seq(2, 4))
  }
}
