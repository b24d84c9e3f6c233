package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Change feeds over deletion-vector commits: a blob add emits row-level
  * delete events, a removed masked file emits only its SURVIVORS, a
  * RESTORE that drops blobs emits re-insert events — and the whole range
  * stays multiset-consistent with the endpoint snapshots.
  */
class BtrDvChangesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("btr-dv-changes-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  spark.conf.set("spark.sql.catalog.graft", classOf[BtrCatalog].getName)

  private def tmp(name: String) = s"/tmp/btr-dv-changes/$name"

  private def fsRoot(p: String) = {
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(graft.format.BtrTableMeta.hadoopConf())
    (fs, fs.makeQualified(new org.apache.hadoop.fs.Path(p)))
  }

  /** (value, change_type, commit_version) triples of a feed over (v,s). */
  private def events(df: DataFrame): Seq[(Long, String, Long)] =
    df.select(col("v"), col("_change_type"), col("_commit_version"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(e => (e._3, e._2, e._1)).toSeq

  test("a DV commit emits row-level delete events; feed is multiset-consistent") {
    val p = tmp("basic")
    (0 until 400).map(i => (i.toLong, s"s$i")).toDF("v", "s")
      .coalesce(1).write.format("btr").mode("overwrite")
      .option("btr.deletionVectors", "true").save(p)
    val (fs, root) = fsRoot(p)
    val v0 = BtrLog.latestVersion(fs, root).get
    (400 until 500).map(i => (i.toLong, s"s$i")).toDF("v", "s")
      .coalesce(1).write.format("btr").mode("append").save(p) // v0+1
    spark.sql(s"DELETE FROM graft.`$p` WHERE v % 5 = 1")      // v0+2 (DV)
    val ev = events(BtrChanges.between(spark, p, v0, v0 + 2))
    val inserts = ev.filter(_._2 == "insert")
    val deletes = ev.filter(_._2 == "delete")
    assert(inserts.map(_._1).sorted == (400L until 500L))
    assert(inserts.forall(_._3 == v0 + 1))
    assert(deletes.map(_._1).sorted == (0L until 500L).filter(_ % 5 == 1))
    assert(deletes.forall(_._3 == v0 + 2))
  }

  test("strict insert-only change read refuses a range with DV commits") {
    val p = tmp("strict")
    (0 until 100).map(i => (i.toLong, s"s$i")).toDF("v", "s")
      .coalesce(1).write.format("btr").mode("overwrite")
      .option("btr.deletionVectors", "true").save(p)
    val (fs, root) = fsRoot(p)
    val v0 = BtrLog.latestVersion(fs, root).get
    spark.sql(s"DELETE FROM graft.`$p` WHERE v % 3 = 0")
    val e = intercept[IllegalStateException] {
      spark.read.format("btr")
        .option("btr.changesFromVersion", v0.toString).load(p).count()
    }
    assert(e.getMessage.contains("deletion-vector"))
  }

  test("a masked file removed later emits survivors only (no double-counted deletes)") {
    val p = tmp("masked-removed")
    (0 until 300).map(i => (i.toLong, s"s$i")).toDF("v", "s")
      .coalesce(1).write.format("btr").mode("overwrite")
      .option("btr.deletionVectors", "true")
      .option("btr.retainRemoved", "true").save(p)
    val (fs, root) = fsRoot(p)
    val v0 = BtrLog.latestVersion(fs, root).get
    spark.sql(s"DELETE FROM graft.`$p` WHERE v % 3 = 0") // v0+1: DV masks
    spark.sql(s"DELETE FROM graft.`$p` WHERE v >= 0")    // v0+2: whole file, metadata path
    assert(spark.read.format("btr").load(p).count() == 0)
    val ev = events(BtrChanges.between(spark, p, v0, v0 + 2))
    assert(ev.forall(_._2 == "delete"))
    val atDv = ev.filter(_._3 == v0 + 1).map(_._1).sorted
    val atDrop = ev.filter(_._3 == v0 + 2).map(_._1).sorted
    assert(atDv == (0L until 300L).filter(_ % 3 == 0))
    assert(atDrop == (0L until 300L).filterNot(_ % 3 == 0),
      "removed masked file must emit SURVIVORS only")
    // multiset consistency: every row deleted exactly once
    assert(ev.map(_._1).sorted == (0L until 300L))
    // a COUNT over the feed must not push to footer stats: the delete
    // side serves survivors, footers would count every row
    assert(BtrChanges.between(spark, p, v0, v0 + 2).count() == 300)
  }

  test("RESTORE across a DV delete emits re-insert events that cancel the deletes") {
    val p = tmp("restore")
    (0 until 200).map(i => (i.toLong, s"s$i")).toDF("v", "s")
      .coalesce(1).write.format("btr").mode("overwrite")
      .option("btr.deletionVectors", "true")
      .option("btr.retainRemoved", "true").save(p)
    val (fs, root) = fsRoot(p)
    val v0 = BtrLog.latestVersion(fs, root).get
    spark.sql(s"DELETE FROM graft.`$p` WHERE v < 50") // v0+1 DV
    BtrLog.restore(fs, root, v0)                      // v0+2 drops the blobs
    assert(spark.read.format("btr").load(p).count() == 200)
    val ev = events(BtrChanges.between(spark, p, v0, v0 + 2))
    val deletes = ev.filter(_._2 == "delete")
    val inserts = ev.filter(_._2 == "insert")
    assert(deletes.map(_._1).sorted == (0L until 50L) && deletes.forall(_._3 == v0 + 1))
    assert(inserts.map(_._1).sorted == (0L until 50L) && inserts.forall(_._3 == v0 + 2))
  }

  test("timestamp-bounded feed serves DV events too") {
    val p = tmp("ts")
    (0 until 100).map(i => (i.toLong, s"s$i")).toDF("v", "s")
      .coalesce(1).write.format("btr").mode("overwrite")
      .option("btr.deletionVectors", "true").save(p)
    val t0 = System.currentTimeMillis()
    Thread.sleep(5)
    spark.sql(s"DELETE FROM graft.`$p` WHERE v >= 90")
    Thread.sleep(5)
    val ev = events(BtrChanges.betweenTimestamps(spark, p, t0, System.currentTimeMillis()))
    assert(ev.map(_._1).sorted == (90L until 100L))
    assert(ev.forall(_._2 == "delete"))
  }
}
