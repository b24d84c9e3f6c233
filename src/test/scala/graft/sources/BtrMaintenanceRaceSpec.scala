package graft.sources

import graft.format.BtrTableMeta
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Concurrent maintenance workers: partition-DISJOINT `OPTIMIZE`
  * shards run in parallel (the 100 TB pattern — one worker per hot
  * partition set), while OVERLAPPING writers serialize through the
  * publish-then-recheck journal protocol
  * ([[graft.format.BtrTableMeta.publishSwapJournalChecked]]): whoever
  * observes another in-flight journal over shared sources yields before
  * renaming anything. Entry-time convergence and temp sweeps honor the
  * maintenance lease so a live worker's journal/temps are never rolled
  * back or swept from under it.
  */
class BtrMaintenanceRaceSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("maintenance-race-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.catalog.graft", "graft.sources.BtrCatalog")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def tmp(name: String) = {
    val d = s"/tmp/btr-maint-race/$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
    d
  }

  private def fsRoot(dir: String) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(BtrTableMeta.hadoopConf())
    (fs, fs.makeQualified(p))
  }

  private def readRows(dir: String): Seq[Int] =
    spark.read.format("btr").load(dir).select("x").as[Int].collect().sorted.toSeq

  private def dataFiles(dir: String): Seq[String] = {
    val (fs, root) = fsRoot(dir)
    val rootLen = root.toUri.getPath.length + 1
    BtrTableMeta.listDataFilesWithPartitions(fs, root)
      .map(_.path.toUri.getPath.substring(rootLen)).toSeq.sorted
  }

  test("partition-disjoint OPTIMIZE workers run concurrently, both commit") {
    val dir = tmp("disjoint")
    // two files per partition so each worker has a bin
    Seq(1, 3).toDF("x").withColumn("k", org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.col("x"), org.apache.spark.sql.functions.lit(2)))
      .repartition(1).write.format("btr").partitionBy("k").mode("overwrite").save(dir)
    Seq(2, 4).toDF("x").withColumn("k", org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.col("x"), org.apache.spark.sql.functions.lit(2)))
      .repartition(1).write.format("btr").partitionBy("k").mode("append").save(dir)
    Seq(5, 6).toDF("x").withColumn("k", org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.col("x"), org.apache.spark.sql.functions.lit(2)))
      .repartition(1).write.format("btr").partitionBy("k").mode("append").save(dir)
    assert(readRows(dir) == Seq(1, 2, 3, 4, 5, 6))
    val filesBefore = dataFiles(dir)
    assert(filesBefore.count(_.startsWith("k=0")) >= 2 &&
      filesBefore.count(_.startsWith("k=1")) >= 2, filesBefore.toString)

    // worker B (partition k=1) lands INSIDE worker A's (k=0) publish
    // window — the worst interleaving: A's journal is pending and
    // incomplete while B enters, bins, publishes and completes. B's
    // entry convergence must leave A's young journal alone, and B's
    // overlap re-check must find no shared sources
    var bResult: Option[(Int, Int)] = None
    val aResult = BtrCompact.compact(spark, dir, 128L * 1024 * 1024,
      keep = e => e.partitionValues.get("k").contains("0"),
      afterJournal = () => {
        bResult = Some(BtrCompact.compact(spark, dir, 128L * 1024 * 1024,
          keep = e => e.partitionValues.get("k").contains("1")))
      })
    assert(bResult.exists(r => r._2 < r._1), s"worker B must have merged, got $bResult")
    assert(aResult._2 < aResult._1, s"worker A must have merged, got $aResult")
    assert(readRows(dir) == Seq(1, 2, 3, 4, 5, 6), "no rows lost or duplicated")
    val after = dataFiles(dir)
    assert(after.count(_.startsWith("k=0")) == 1 && after.count(_.startsWith("k=1")) == 1,
      after.toString)
    val consistency = graft.functions.BtrInspect.fileConsistency(spark, dir)
    assert(consistency.filter(org.apache.spark.sql.functions.not(
      org.apache.spark.sql.functions.col("ok"))).count() == 0)
  }

  test("overlapping compactors: the observer yields post-publish, no duplicate rows") {
    val dir = tmp("overlap")
    Seq(1, 2).toDF("x").repartition(1).write.format("btr").mode("overwrite").save(dir)
    Seq(3, 4).toDF("x").repartition(1).write.format("btr").mode("append").save(dir)
    // B lands between A's journal publish and A's renames: B bins the
    // SAME files (A's journal is pending+incomplete, so its sources are
    // still listed), passes its own pre-publish visibility check, then
    // its post-publish re-check sees A's journal and yields
    var bErr: Option[String] = None
    BtrCompact.compact(spark, dir, 128L * 1024 * 1024,
      afterJournal = () => {
        val e = intercept[IllegalStateException] {
          BtrCompact.compact(spark, dir, 128L * 1024 * 1024)
        }
        bErr = Some(e.getMessage)
      })
    assert(bErr.exists(m => m.contains("conflict") && m.contains("yielded")), bErr.toString)
    assert(readRows(dir) == Seq(1, 2, 3, 4), "A's merge applied exactly once")
    assert(dataFiles(dir).length == 1, dataFiles(dir).toString)
    // nothing left behind by the yielded worker
    assert(dataFiles(dir).forall(!_.contains("_tmp_compact_")))
    val (fs, root) = fsRoot(dir)
    assert(BtrTableMeta.readSwapJournals(fs, root).isEmpty, "no stale journals")
  }

  test("entry sweep honors the lease: live temps and staging survive, aged ones sweep") {
    val dir = tmp("lease-sweep")
    Seq(1, 2).toDF("x").repartition(1).write.format("btr").mode("overwrite").save(dir)
    Seq(3).toDF("x").repartition(1).write.format("btr").mode("append").save(dir)
    val (fs, root) = fsRoot(dir)
    // a FRESH compactor temp (simulating a live concurrent worker)
    val liveTmp = new Path(root, "_tmp_compact_live-0.btr")
    val out = fs.create(liveTmp, true); out.write(1); out.close()
    val liveStaging = new Path(root, "_rewrite_staging_live")
    fs.mkdirs(liveStaging)
    BtrCompact.compact(spark, dir, 128L * 1024 * 1024)
    assert(fs.exists(liveTmp), "a fresh temp may belong to a live worker — must survive")
    BtrCompact.rewriteClustered(spark, dir, Seq("x"))
    assert(fs.exists(liveStaging), "a fresh staging dir may belong to a live worker")
    // age both past the lease: the next maintenance pass sweeps them
    val old = System.currentTimeMillis() - BtrTableMeta.MaintenanceLeaseMs - 60000
    fs.setTimes(liveTmp, old, old)
    fs.setTimes(liveStaging, old, old)
    Seq(9).toDF("x").repartition(1).write.format("btr").mode("append").save(dir)
    BtrCompact.compact(spark, dir, 128L * 1024 * 1024)
    assert(!fs.exists(liveTmp), "an aged temp is a crashed worker's leftovers")
    BtrCompact.rewriteClustered(spark, dir, Seq("x"))
    assert(!fs.exists(liveStaging), "an aged staging dir sweeps")
    assert(readRows(dir) == Seq(1, 2, 3, 9))
  }

  test("a young incomplete journal is left pending; an aged one rolls back") {
    val dir = tmp("journal-lease")
    Seq(1, 2).toDF("x").repartition(1).write.format("btr").mode("overwrite").save(dir)
    val (fs, root) = fsRoot(dir)
    val src = dataFiles(dir).head
    // an incomplete journal (final never renamed in) as a crashed — or
    // still-running — swap would leave it
    val journal = BtrTableMeta.writeSwapJournal(fs, root, "zz-crashed",
      Seq(BtrTableMeta.SwapGroup("", Seq("part-never-arrived.btr"), Seq(src))))
    BtrTableMeta.completeSwapJournals(fs, root)
    assert(fs.exists(journal),
      "a YOUNG incomplete journal may belong to a live mid-rename worker — left pending")
    assert(readRows(dir) == Seq(1, 2), "readers hold the consistent pre-swap view")
    val old = System.currentTimeMillis() - BtrTableMeta.MaintenanceLeaseMs - 60000
    fs.setTimes(journal, old, old)
    BtrTableMeta.completeSwapJournals(fs, root)
    assert(!fs.exists(journal), "an aged incomplete journal rolls back and retires")
    assert(readRows(dir) == Seq(1, 2), "rollback keeps the sources authoritative")
  }

  test("a DV UPDATE landing in the OPTIMIZE publish window rolls back; no row resurrection") {
    // regression (found by BtrRaceFuzzSpec seed 20260815 round 15): a
    // merge-on-read UPDATE publishes NO swap journal, so the compactor's
    // publish-then-recheck could not see it, and the UPDATE's target
    // checks did not look at pending journals — both proceeded: the
    // splice re-homed the masked ordinals, resurrecting the old images
    // NEXT TO the update's new images. Now the DV commit's verifyTargets
    // treats a pending journal claiming a target as a conflict.
    val dir = tmp("dv-in-publish-window")
    Seq(1, 2).toDF("x").repartition(1).write.format("btr")
      .option("btr.deletionVectors", "true").mode("overwrite").save(dir)
    Seq(3, 4).toDF("x").repartition(1).write.format("btr").mode("append").save(dir)
    var updErr: Option[String] = None
    BtrCompact.compact(spark, dir, 128L * 1024 * 1024,
      afterJournal = () => {
        val e = intercept[Exception] {
          spark.sql(s"UPDATE graft.`$dir` SET x = x + 100 WHERE x <= 2")
        }
        updErr = Some(e.getMessage)
      })
    assert(updErr.exists(_.contains("conflict")), updErr.toString)
    assert(readRows(dir) == Seq(1, 2, 3, 4),
      "the UPDATE rolled back whole: no masks lost, no orphan images")
    // a retry AFTER the compaction serializes cleanly
    spark.sql(s"UPDATE graft.`$dir` SET x = x + 100 WHERE x <= 2")
    assert(readRows(dir) == Seq(3, 4, 101, 102))
  }

  test("a convergence pass inside the publish re-check window cannot act on the claim") {
    // regression (ADVICE r13): publishSwapJournalChecked used to publish a
    // REAL swap journal before its overlap re-check. A journal whose
    // finals are all visible — vacuously so for a DELETE's empty-finals
    // intent group — is "all complete" to completeSwapJournals, which
    // converges it FORWARD at any age: a concurrent pass inside the
    // publish→retract window deleted the doomed sources even though the
    // publisher went on to throw "nothing was published". The claim now
    // parks under a non-actionable intent prefix until the check passes.
    val dir = tmp("intent-window")
    Seq(1, 2).toDF("x").repartition(1).write.format("btr").mode("overwrite").save(dir)
    val (fs, root) = fsRoot(dir)
    val src = dataFiles(dir).head
    var sawWindow = false
    BtrTableMeta.publishSwapJournalChecked(fs, root, "nm-itest",
      Seq(BtrTableMeta.SwapGroup("", Nil, Seq(src))),
      afterIntent = () => {
        // the adversary: a full convergence pass while the claim is parked
        BtrTableMeta.completeSwapJournals(fs, root)
        assert(fs.exists(new Path(root, src)),
          "a parked claim must never be converged forward — sources intact")
        assert(readRows(dir) == Seq(1, 2))
        sawWindow = true
      })
    assert(sawWindow)
    // the promoted journal converges like any committed delete intent
    fs.delete(new Path(root, src), false)
    BtrTableMeta.completeSwapJournals(fs, root)
    assert(!fs.exists(new Path(root, s"_btr_swap_nm-itest.json")))
  }

  test("a stale intent is ignored by the conflict check and swept; a live one blocks") {
    val dir = tmp("intent-lease")
    Seq(1, 2).toDF("x").repartition(1).write.format("btr").mode("overwrite").save(dir)
    val (fs, root) = fsRoot(dir)
    val src = dataFiles(dir).head
    // adversary A parks a claim on `src` and stalls (simulated crash):
    // grab the intent file from inside A's window, then fail A's check
    var intentPath: Option[Path] = None
    intercept[IllegalStateException] {
      BtrTableMeta.publishSwapJournalChecked(fs, root, "nm-crasher",
        Seq(BtrTableMeta.SwapGroup("", Nil, Seq(src))),
        afterIntent = () => {
          intentPath = Some(new Path(root, "_btr_swapintent_nm-crasher.json"))
          assert(fs.exists(intentPath.get))
          // writer B claims the same source while A is live → B must yield
          val e = intercept[IllegalStateException] {
            BtrTableMeta.publishSwapJournalChecked(fs, root, "nm-b",
              Seq(BtrTableMeta.SwapGroup("", Nil, Seq(src))))
          }
          assert(e.getMessage.contains("conflict"))
          // make A's own re-check fail too (B's retract left nothing, so
          // plant a conflicting journal to abort A deterministically)
          BtrTableMeta.writeSwapJournal(fs, root, "nm-planted",
            Seq(BtrTableMeta.SwapGroup("", Seq("planted-final.btr"), Seq(src))))
        })
    }
    // A retracted its intent on the conflict path
    assert(!fs.exists(intentPath.get), "a failed check retracts the intent")
    fs.delete(new Path(root, "_btr_swap_nm-planted.json"), false)
    // a crashed publisher leaves its intent orphaned mid-publish
    intercept[RuntimeException] {
      BtrTableMeta.publishSwapJournalChecked(fs, root, "nm-stale",
        Seq(BtrTableMeta.SwapGroup("", Nil, Seq(src))),
        afterIntent = () => throw new RuntimeException("simulated crash mid-publish"))
    }
    val orphan = new Path(root, "_btr_swapintent_nm-stale.json")
    assert(fs.exists(orphan))
    // while young it still blocks a conflicting publisher (could be live)
    val e2 = intercept[IllegalStateException] {
      BtrTableMeta.publishSwapJournalChecked(fs, root, "nm-c",
        Seq(BtrTableMeta.SwapGroup("", Nil, Seq(src))))
    }
    assert(e2.getMessage.contains("conflict"))
    // past the lease: ignored by the check and swept by convergence
    val old = System.currentTimeMillis() - BtrTableMeta.MaintenanceLeaseMs - 60000
    fs.setTimes(orphan, old, old)
    val ok = BtrTableMeta.publishSwapJournalChecked(fs, root, "nm-d",
      Seq(BtrTableMeta.SwapGroup("", Nil, Seq(src))))
    assert(fs.exists(ok), "a stale orphan intent must not block forever")
    fs.delete(ok, false) // retire the probe journal without acting on it
    BtrTableMeta.completeSwapJournals(fs, root)
    assert(!fs.exists(orphan), "convergence sweeps stale intents")
    assert(readRows(dir) == Seq(1, 2))
  }

  test("a sweep past the lease mid-OPTIMIZE: the worker withdraws instead of losing rows") {
    // clock-skew / long-stall hardening: a convergence pass may judge a
    // LIVE worker crashed once its journal ages past MaintenanceLeaseMs
    // and roll the journal back mid-swap. The worker must detect the
    // rollback at its rename→delete barrier and withdraw its outputs —
    // continuing would delete the sources whose replacement finals the
    // rollback just removed (row loss).
    val dir = tmp("lease-skew-compact")
    Seq(1, 2).toDF("x").repartition(1).write.format("btr").mode("overwrite").save(dir)
    Seq(3, 4).toDF("x").repartition(1).write.format("btr").mode("append").save(dir)
    val (fs, root) = fsRoot(dir)
    val filesBefore = dataFiles(dir)
    val e = intercept[IllegalStateException] {
      BtrCompact.compact(spark, dir, 1L << 20, afterJournal = () => {
        val old = System.currentTimeMillis() - BtrTableMeta.MaintenanceLeaseMs - 60000
        BtrTableMeta.readSwapJournals(fs, root).foreach { case (p, _) =>
          fs.setTimes(p, old, old)
        }
        BtrTableMeta.completeSwapJournals(fs, root) // the adversary sweeper
      })
    }
    assert(e.getMessage.contains("conflict"), e.getMessage)
    assert(readRows(dir) == Seq(1, 2, 3, 4), "no rows lost to the skewed sweep")
    assert(dataFiles(dir).sorted == filesBefore.sorted,
      "the merged file withdrew; the sources remain authoritative")
    // the retry converges normally
    val (b, a) = BtrCompact.compact(spark, dir, 1L << 20)
    assert(a < b)
    assert(readRows(dir) == Seq(1, 2, 3, 4))
  }

  test("a sweep past the lease mid-rewrite: outputs withdrawn, sources stand") {
    val dir = tmp("lease-skew-rewrite")
    Seq(2, 1).toDF("x").repartition(1).write.format("btr").mode("overwrite").save(dir)
    Seq(4, 3).toDF("x").repartition(1).write.format("btr").mode("append").save(dir)
    val (fs, root) = fsRoot(dir)
    val filesBefore = dataFiles(dir)
    val e = intercept[IllegalStateException] {
      BtrCompact.rewriteClustered(spark, dir, Seq("x"), afterJournal = () => {
        val old = System.currentTimeMillis() - BtrTableMeta.MaintenanceLeaseMs - 60000
        BtrTableMeta.readSwapJournals(fs, root).foreach { case (p, _) =>
          fs.setTimes(p, old, old)
        }
        BtrTableMeta.completeSwapJournals(fs, root)
      })
    }
    assert(e.getMessage.contains("conflict"), e.getMessage)
    assert(readRows(dir) == Seq(1, 2, 3, 4))
    assert(dataFiles(dir).sorted == filesBefore.sorted, dataFiles(dir).toString)
    // no staging leftovers
    assert(!fs.listStatus(root).exists(_.getPath.getName.startsWith("_rewrite_staging")),
      "withdrawn rewrite cleans its staging dir")
  }

  test("a RESTORE resurrecting deletion vectors inside an OPTIMIZE window yields") {
    // regression (found by BtrRaceFuzzSpec seed 27182818 round 8): the
    // publish-then-recheck compares sources vs sources, but a RESTORE's
    // resurrected DV blobs are journal FINALS — so a compactor mid-swap
    // and a restore re-masking the compactor's sources both passed their
    // checks, and the splice merged the UNMASKED incarnation, resurrecting
    // the deleted rows. Now the restore checks its blob TARGETS against
    // pending journal sources (and the merge side checks pending blob
    // finals): the observer yields.
    val dir = tmp("restore-vs-optimize")
    (0 until 6).toDF("x").repartition(1).write.format("btr")
      .option("btr.deletionVectors", "true")
      .option("btr.retainRemoved", "true").mode("overwrite").save(dir)
    Seq(6, 7).toDF("x").repartition(1).write.format("btr").mode("append").save(dir)
    val (fs, root) = fsRoot(dir)
    spark.sql(s"DELETE FROM graft.`$dir` WHERE x % 2 = 1") // DV masks (v: deleted)
    val vMasked = BtrLog.latestVersion(fs, root).get
    BtrLog.restore(fs, root, vMasked - 1) // masks rewound; rows back
    assert(readRows(dir) == Seq(0, 1, 2, 3, 4, 5, 6, 7))
    var restoreErr: Option[String] = None
    BtrCompact.compact(spark, dir, 1L << 20, afterJournal = () => {
      val e = intercept[IllegalStateException] {
        BtrLog.restore(fs, root, vMasked) // would resurrect blobs over the bins
      }
      restoreErr = Some(e.getMessage)
    })
    assert(restoreErr.exists(_.contains("conflict")), restoreErr.toString)
    assert(readRows(dir) == Seq(0, 1, 2, 3, 4, 5, 6, 7),
      "the OPTIMIZE's merge stands; the restore rolled back whole")
    // the retry serializes cleanly after the compaction
    BtrLog.restore(fs, root, vMasked)
    assert(readRows(dir) == Seq(0, 2, 4, 6))
  }

  test("DELETE racing an in-flight OPTIMIZE journal yields instead of dropping merged rows") {
    val dir = tmp("delete-vs-optimize")
    Seq(1, 2).toDF("x").repartition(1).write.format("btr").mode("overwrite").save(dir)
    Seq(3, 4).toDF("x").repartition(1).write.format("btr").mode("append").save(dir)
    // the DELETE lands between the OPTIMIZE's journal publish and its
    // renames; its file-aligned drop claims the same sources — observer
    // (the DELETE) yields loudly
    var delErr: Option[String] = None
    BtrCompact.compact(spark, dir, 128L * 1024 * 1024,
      afterJournal = () => {
        val e = intercept[Exception] {
          spark.sql(s"DELETE FROM graft.`$dir` WHERE x >= 0")
        }
        delErr = Some(e.getMessage)
      })
    assert(delErr.exists(_.contains("conflict")), delErr.toString)
    assert(readRows(dir) == Seq(1, 2, 3, 4), "the OPTIMIZE's merge stands, nothing lost")
  }
}
