package graft.sources

import graft.format.{BtrRetention, BtrTableMeta}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unified VACUUM: one entry point converges EVERY kind of table
  * garbage — pending swap journals (crashes), orphaned hidden temps,
  * expired retention-store entries, prunable snapshot-log entries — and
  * DRY RUN lists all of it without mutating anything.
  */
class BtrVacuumSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("vacuum-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.catalog.graft", "graft.sources.BtrCatalog")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(name: String) = {
    val d = s"/tmp/btr-vacuum-spec/$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
    d
  }

  private def fsRoot(dir: String) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(BtrTableMeta.hadoopConf())
    (fs, fs.makeQualified(p))
  }

  test("crash + retention + compaction garbage converges to zero orphans via ONE VACUUM") {
    val dir = tmp("converge")
    import spark.implicits._
    // retained table: v1 file A [1,2,3], v2 file B [4], v3 file C [5]
    Seq(1, 2, 3).toDF("x").repartition(1).write.format("btr")
      .option("btr.retainRemoved", "true").mode("overwrite").save(dir)
    Seq(4).toDF("x").write.format("btr").mode("append").save(dir)
    Seq(5).toDF("x").write.format("btr").mode("append").save(dir)
    val (fs, root) = fsRoot(dir)
    val rootLen = root.toUri.getPath.length + 1
    def rels = BtrTableMeta.listDataFilesWithPartitions(fs, root)
      .map(_.path.toUri.getPath.substring(rootLen)).sorted

    // (a) retention-store entry: DELETE consumes file A into the store
    spark.sql(s"DELETE FROM graft.`$dir` WHERE x <= 3")
    assert(BtrRetention.resolveRemoved(fs, root, rels.headOption.getOrElse("")) != null)

    // (b) crashed DELETE: a pending delete-intent journal dooming the
    // [5] file (exactly what a crash between journal and removal leaves)
    val doomed = rels.max // deterministic pick among the two remaining
    BtrTableMeta.writeSwapJournal(fs, root, "nm-del-crash",
      Seq(BtrTableMeta.SwapGroup("", Nil, Seq(doomed))))

    // (c) orphaned temp from a crashed writer, old enough to sweep
    val orphan = new Path(root, "_tmp_crashed_writer.btr")
    val out = fs.create(orphan, true); out.write(Array[Byte](1, 2, 3)); out.close()
    fs.setTimes(orphan, System.currentTimeMillis() - 100000, -1)

    Thread.sleep(5) // store move-times must be strictly before the horizon
    val parser = new BtrSparkSqlParser(spark.sessionState.sqlParser)

    // DRY RUN lists every category and mutates NOTHING
    val plan = parser.parsePlan(s"VACUUM graft.`$dir` RETAIN 0 HOURS DRY RUN")
      .asInstanceOf[BtrVacuumCommand]
    assert(plan.dryRun)
    val items = plan.run(spark).map(r => (r.getString(0), r.getString(1)))
    assert(items.exists(_._1 == "converge-journal"), items.toString)
    assert(items.exists(_._1 == "remove-temp"), items.toString)
    assert(items.exists(_._1 == "expire-retained"), items.toString)
    assert(fs.exists(orphan), "dry run must not delete temps")
    assert(BtrTableMeta.readSwapJournals(fs, root).nonEmpty, "dry run must not converge")
    assert(fs.exists(new Path(root, BtrRetention.RemovedDir)) &&
      fs.listStatus(new Path(root, BtrRetention.RemovedDir)).nonEmpty,
      "dry run must not expire the store")

    // ONE real VACUUM converges everything
    Thread.sleep(5)
    parser.parsePlan(s"VACUUM graft.`$dir` RETAIN 0 HOURS")
      .asInstanceOf[BtrVacuumCommand].run(spark)

    assert(!fs.exists(orphan), "temp swept")
    assert(BtrTableMeta.readSwapJournals(fs, root).isEmpty, "journal converged")
    val store = new Path(root, BtrRetention.RemovedDir)
    assert(!fs.exists(store) || fs.listStatus(store).isEmpty,
      "store expired (incl. the journal-converged file)")
    // the table is exactly what the crash semantics promise: the doomed
    // file's rows gone, the survivor intact
    assert(spark.read.format("btr").load(dir).as[Int].collect().toSeq == Seq(4))
    val consistency = graft.functions.BtrInspect.fileConsistency(spark, dir)
    assert(consistency.filter(not(col("ok"))).count() == 0)
  }

  test("VACUUM prunes snapshot-log entries past KeepEntries in one pass") {
    val dir = tmp("log-prune")
    import spark.implicits._
    Seq(0).toDF("x").write.format("btr").mode("overwrite").save(dir)
    (2 to BtrLog.KeepEntries + BtrLog.CheckpointInterval + 3).foreach(i =>
      Seq(i).toDF("x").write.format("btr").mode("append").save(dir))
    val (fs, root) = fsRoot(dir)
    // make some entries prunable regardless of the per-record prune's
    // timing: count, then VACUUM must leave none prunable
    val parser = new BtrSparkSqlParser(spark.sessionState.sqlParser)
    parser.parsePlan(s"VACUUM graft.`$dir` RETAIN 0 HOURS")
      .asInstanceOf[BtrVacuumCommand].run(spark)
    assert(BtrLog.listPrunable(fs, root).isEmpty)
    // and the newest version still resolves
    val latest = BtrLog.latestVersion(fs, root).get
    assert(BtrLog.resolveSnapshot(fs, root, latest).files.length == latest)
  }
}
