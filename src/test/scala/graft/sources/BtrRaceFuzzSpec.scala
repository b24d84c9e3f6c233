package graft.sources

import graft.format.{BtrConfig, BtrTableMeta}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.WriterCommitMessage
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Seeded RANDOMIZED interleavings of two concurrent writers, checked
  * against an oracle of serializable outcomes — the complement of
  * [[BtrConflictSpec]]'s hand-picked schedules.
  *
  * Each round stages one operation A (append / full-table rewrite /
  * deletion-vector delete / OPTIMIZE-with-hook), runs a complete
  * operation B inside A's commit window (append / DV DELETE / range
  * DELETE / UPDATE / compact / clustered rewrite), then commits A.
  * Either side may abort with a concurrent-commit conflict; whatever
  * happens, the resulting table content must equal applying the
  * SUCCESSFUL operations' row-level effects in SOME serial order to the
  * pre-round content. Anything else — lost deletes, resurrected rows,
  * half-applied appends, orphaned update images — fails the round with
  * the seed and full trace for replay.
  *
  * Invariants checked alongside the outcome oracle: every listed file
  * parses, no `_tmp_compact_` leftovers, no stale pending markers.
  */
class BtrRaceFuzzSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("btr-race-fuzz")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.catalog.graft", "graft.sources.BtrCatalog")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val localDir = {
    val d = "/tmp/btr-race-fuzz/t"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File("/tmp/btr-race-fuzz"))
    d
  }
  // the table under fuzz — set per fuzz() run (helpers below read it)
  private var dir: String = localDir

  private def fsRoot = {
    val p = new Path(dir)
    val fs = p.getFileSystem(BtrTableMeta.hadoopConf())
    (fs, fs.makeQualified(p))
  }

  private val intSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("x", org.apache.spark.sql.types.IntegerType)))

  private val rowIdSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField(BtrScan.FileMetaCol,
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField(BtrScan.PosMetaCol,
      org.apache.spark.sql.types.LongType)))

  private def relFiles: Seq[String] = {
    val (fs, root) = fsRoot
    val rootLen = root.toUri.getPath.length + 1
    BtrTableMeta.listDataFilesWithPartitions(fs, root)
      .map(_.path.toUri.getPath.substring(rootLen)).toSeq.sorted
  }

  private def readInts: Seq[Int] =
    spark.read.format("btr").load(dir).select("x").as[Int].collect().sorted.toSeq

  /** Log-resolved deletion-vector rels targeting `sources` — what a real
    * rewrite's scan captures as its applied-mask set.
    */
  private def dvOver(sources: Set[String]): Seq[String] = {
    val (fs, root) = fsRoot
    BtrLog.latestVersion(fs, root).toSeq.flatMap { v =>
      BtrLog.resolveSnapshot(fs, root, v).files
        .filter(graft.format.DeletionVector.isDvRel)
        .filter(r => graft.format.DeletionVector.targetOf(r).exists(sources.contains))
    }
  }

  /** Multiset difference a -- b (first occurrence of each b element). */
  private def msDiff(a: Seq[Int], b: Seq[Int]): Seq[Int] = {
    val cnt = scala.collection.mutable.Map.empty[Int, Int].withDefaultValue(0)
    b.foreach(cnt(_) += 1)
    a.filter { x => if (cnt(x) > 0) { cnt(x) -= 1; false } else true }
  }

  private def isConflict(e: Throwable): Boolean = {
    var t: Throwable = e
    while (t != null) {
      if (t.getMessage != null && t.getMessage.contains("conflict")) return true
      t = t.getCause
    }
    false
  }

  // partition spec of the table under fuzz (Nil = unpartitioned); the
  // bucket arm runs every op against a transform layout
  private var partSpec: Seq[String] = Nil

  private def stage(mode: BtrOverwriteMode, rows: Seq[Int], seed: Long)
      : (BtrBatchWrite, Array[WriterCommitMessage]) = {
    val bw = new BtrBatchWrite(dir, intSchema, mode, 65536, 3, BtrConfig.Default, partSpec)
    val w = bw.createBatchWriterFactory(null).createWriter(0, seed)
    rows.foreach(i => w.write(InternalRow(i)))
    (bw, Array(w.commit()))
  }

  test("randomized two-writer interleavings only ever produce serializable outcomes") {
    // SPARK_GRAFT_FUZZ_SEEDS=1,2,3 appends hunt seeds without a source
    // edit — used for extended bug hunts between rounds; the committed
    // seed set stays deterministic for CI
    val extra = sys.env.get("SPARK_GRAFT_FUZZ_SEEDS").toSeq
      .flatMap(_.split(',')).flatMap(s => scala.util.Try(s.trim.toLong).toOption)
    val aborts =
      (Seq(20260815L, 977001L, 31415926L, 27182818L, 16180339L) ++ extra)
        .map(fuzz(_, localDir)).sum
    // the schedules must actually exercise the conflict machinery — a
    // degenerate run where nothing ever races proves nothing
    assert(aborts >= 2, s"only $aborts conflicts across the seeds — schedule too tame")
  }

  test("the same fuzz holds on a copy+delete-rename object store (conditional-put protocol)") {
    // register the mock scheme engine-wide: rename is non-atomic
    // copy+delete, the version claim is an atomic conditional CREATE —
    // the full append/DML/OPTIMIZE/RESTORE surface must still serialize
    spark.sparkContext.hadoopConfiguration.set(
      "fs.mockobj.impl", classOf[graft.format.MockObjectStoreFs].getName)
    // guard the arm itself: the mock FS must select the conditional-put
    // primitive, or this test silently degrades to rename commits
    val mockFs = new Path("mockobj:/tmp/btr-race-fuzz-obj/t")
      .getFileSystem(BtrTableMeta.hadoopConf())
    assert(graft.format.BtrCommitProtocol.forFs(mockFs) eq
      graft.format.ConditionalPutCommit)
    val aborts = fuzz(20260815L, "mockobj:/tmp/btr-race-fuzz-obj/t")
    assert(aborts >= 1, s"only $aborts conflicts — object-store schedule too tame")
  }

  test("the same fuzz holds on a bucket-transform-partitioned table") {
    // every op — staged appends/replaces, DV and range DELETEs, UPDATE,
    // compact, clustered rewrite, APPLY PURGE, RESTORE — races on a
    // bucket(4,x) layout: derived dirs, per-dir compaction bins, row
    // images that MOVE buckets on update
    val aborts = Seq(977001L, 31415926L, 8675309L).map(s =>
      fuzz(s, "/tmp/btr-race-fuzz-bucket/t", Seq("bucket(4,x)"))).sum
    assert(aborts >= 1, s"only $aborts conflicts — bucket schedule too tame")
    // and the compound: a transform layout on the copy+delete-rename
    // object store under the conditional-put protocol — derived dirs,
    // races and object-store commit primitives all at once
    spark.sparkContext.hadoopConfiguration.set(
      "fs.mockobj.impl", classOf[graft.format.MockObjectStoreFs].getName)
    val objAborts = fuzz(20260815L, "mockobj:/tmp/btr-race-fuzz-obj-bucket/t",
      Seq("bucket(4,x)"))
    assert(objAborts >= 1, s"only $objAborts conflicts — object-store bucket schedule too tame")
  }

  private def fuzz(seed: Long, tableDir: String, spec: Seq[String] = Nil): Int = {
    dir = tableDir
    partSpec = spec
    val rnd = new scala.util.Random(seed)
    var abortCount = 0

    locally { val (fs0, root0) = fsRoot; fs0.delete(root0, true) }
    val w0 = (0 until 48).toDF("x").repartition(2).write.format("btr")
      .option("btr.deletionVectors", "true")
      .option("btr.retainRemoved", "true") // restores must replay history
    (if (spec.isEmpty) w0 else w0.option("btr.partitionSpec", spec.mkString(",")))
      .mode("overwrite").save(dir)
    var model: Seq[Int] = (0 until 48).toSeq
    var nextVal = 48
    val trace = scala.collection.mutable.ArrayBuffer.empty[String]
    // recorded round-end versions a RESTORE arm may target
    val versionModels = scala.collection.mutable.Map.empty[Long, Seq[Int]]
    locally {
      val (fs, root) = fsRoot
      BtrLog.latestVersion(fs, root).foreach(v => versionModels(v) = model)
    }

    def freshVals(n: Int): Seq[Int] = { val v = (nextVal until nextVal + n).toSeq; nextVal += n; v }

    def ctx(round: Int, extra: String) =
      s"seed=$seed round=$round $extra\ntrace:\n${trace.mkString("\n")}"

    for (round <- 0 until 40) {
      val m0 = model

      // ---- inner operation B (runs to completion inside A's window) --
      var bCommitted = true
      val (bName, effB, runB0): (String, Seq[Int] => Seq[Int], () => Unit) =
        rnd.nextInt(9) match {
          case 0 =>
            val vs = freshVals(4 + rnd.nextInt(8))
            (s"append(${vs.head}..${vs.last})", m => m ++ vs,
              () => vs.toDF("x").repartition(1).write.format("btr").mode("append").save(dir))
          case 1 =>
            val m = 3 + rnd.nextInt(5); val r = rnd.nextInt(m)
            (s"dv-delete x%$m==$r", _.filterNot(_ % m == r),
              () => { spark.sql(s"DELETE FROM graft.`$dir` WHERE x % $m = $r"); () })
          case 2 =>
            val lo = rnd.nextInt(math.max(nextVal, 1)); val hi = lo + rnd.nextInt(30)
            (s"range-delete [$lo,$hi)", _.filterNot(x => x >= lo && x < hi),
              () => { spark.sql(s"DELETE FROM graft.`$dir` WHERE x >= $lo AND x < $hi"); () })
          case 3 =>
            val m = 3 + rnd.nextInt(5); val r = rnd.nextInt(m)
            (s"update x%$m==$r", _.map(x => if (x % m == r) x + 100000 else x),
              () => { spark.sql(s"UPDATE graft.`$dir` SET x = x + 100000 WHERE x % $m = $r"); () })
          case 4 if m0.nonEmpty =>
            ("compact", identity,
              () => { BtrCompact.compact(spark, dir, 1L << 20); () })
          case 5 if m0.nonEmpty =>
            ("rewrite", identity,
              () => { BtrCompact.rewriteClustered(spark, dir, Seq("x")); () })
          case 6 =>
            ("purge", identity,
              () => { BtrCompact.purgeMasked(spark, dir, 1L << 20); () })
          case 7 if versionModels.nonEmpty =>
            val vs = versionModels.keys.toSeq.sorted
            val target = vs(rnd.nextInt(vs.length))
            (s"restore->$target", _ => versionModels(target),
              () => { val (fs, root) = fsRoot; BtrLog.restore(fs, root, target); () })
          case _ =>
            ("none", identity, () => ())
        }
      def runB(): Unit =
        try runB0()
        catch { case e: Exception if isConflict(e) => bCommitted = false }

      // ---- outer operation A (staged; B lands inside its window) ----
      var aCommitted = true
      var bRan = false
      def fireB(): Unit = { bRan = true; runB() }

      val (aName, effA): (String, Seq[Int] => Seq[Int]) = rnd.nextInt(8) match {
        case 0 =>
          val vs = freshVals(4 + rnd.nextInt(8))
          val (bw, msgs) = stage(BtrOverwriteMode.Append, vs, rnd.nextLong())
          fireB()
          try bw.commit(msgs)
          catch { case e: IllegalStateException if isConflict(e) =>
            aCommitted = false; bw.abort(msgs) }
          (s"staged-append(${vs.head}..${vs.last})", m => m ++ vs)
        case 1 =>
          val sources = relFiles
          val applied = dvOver(sources.toSet).toSet
          val vs = freshVals(3 + rnd.nextInt(6))
          val (bw, msgs) = stage(
            BtrOverwriteMode.ReplaceFiles(() => sources, () => applied), vs, rnd.nextLong())
          fireB()
          try bw.commit(msgs)
          catch { case e: IllegalStateException if isConflict(e) =>
            aCommitted = false; bw.abort(msgs) }
          (s"staged-replace(${vs.head}..${vs.last})", m => msDiff(m, m0) ++ vs)
        case 2 if m0.nonEmpty =>
          // a DV delete of k random current rows, staged with captured
          // (file, pos) row ids exactly as Spark's delta plan feeds them
          val rows = spark.sql(
            s"SELECT x, `${BtrScan.FileMetaCol}`, `${BtrScan.PosMetaCol}` FROM graft.`$dir`")
            .collect()
          val picked = rnd.shuffle(rows.toSeq).take(1 + rnd.nextInt(math.min(6, rows.length)))
          val vals = picked.map(_.getInt(0))
          val bw = new BtrDvDeltaWrite(dir, rowIdSchema).toBatch
          val w = bw.createBatchWriterFactory(null).createWriter(0, rnd.nextLong())
          picked.foreach(r => w.delete(null, InternalRow(
            org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(1)), r.getLong(2))))
          val msgs: Array[WriterCommitMessage] = Array(w.commit())
          fireB()
          try bw.commit(msgs)
          catch { case e: IllegalStateException if isConflict(e) => aCommitted = false }
          (s"staged-dv-delete(${vals.sorted.mkString(",")})", m => msDiff(m, vals))
        case 3 =>
          try BtrCompact.compact(spark, dir, 1L << 20, beforeSwap = () => fireB())
          catch { case e: IllegalStateException if isConflict(e) => aCommitted = false }
          ("compact+hook", identity)
        case 4 =>
          // B lands between the compactor's journal publish and its
          // renames — the window publish-then-recheck guards: B must
          // either succeed on disjoint files or yield, never corrupt
          try BtrCompact.compact(spark, dir, 1L << 20, afterJournal = () => fireB())
          catch { case e: IllegalStateException if isConflict(e) => aCommitted = false }
          ("compact+afterJournal", identity)
        case 5 =>
          // B lands while the compactor's claim is PARKED under the
          // intent prefix (pre-promotion): B's own convergence passes
          // must not act on the claim, and overlapping B commits make
          // the compactor's re-check yield
          try BtrCompact.compact(spark, dir, 1L << 20, afterIntent = () => fireB())
          catch { case e: IllegalStateException if isConflict(e) => aCommitted = false }
          ("compact+afterIntent", identity)
        case 6 =>
          // APPLY PURGE's journal window: B (which may draw RESTORE —
          // the VERDICT r13 #5b interleaving, masked tables under the
          // transform/object-store arms) lands between the purge's
          // journal publish and its staged renames
          try BtrCompact.purgeMasked(spark, dir, 1L << 20, afterJournal = () => fireB())
          catch { case e: IllegalStateException if isConflict(e) => aCommitted = false }
          ("purge+afterJournal", identity)
        case _ =>
          // sweeper vs LIVE worker past the lease (clock skew / long
          // stall): the journal ages mid-swap, an adversary convergence
          // rolls it back, then B lands — the worker must withdraw at
          // its rename→delete barrier, never delete sources whose
          // replacement the rollback removed
          try BtrCompact.compact(spark, dir, 1L << 20, afterJournal = () => {
            val (fs, root) = fsRoot
            val old = System.currentTimeMillis() - BtrTableMeta.MaintenanceLeaseMs - 60000
            BtrTableMeta.readSwapJournals(fs, root).foreach { case (p, _) =>
              fs.setTimes(p, old, old)
            }
            BtrTableMeta.completeSwapJournals(fs, root)
            fireB()
          })
          catch { case e: IllegalStateException if isConflict(e) => aCommitted = false }
          ("compact+leaseskew", identity)
      }
      if (!bRan) runB() // compact found no bin or failed pre-hook: B runs after

      // ---- oracle: some serial order of the committed ops ------------
      val acceptable: Set[Seq[Int]] = ((aCommitted, bCommitted) match {
        case (true, true) => Set(effB(effA(m0)), effA(effB(m0)))
        case (true, false) => Set(effA(m0))
        case (false, true) => Set(effB(m0))
        case (false, false) => Set(m0)
      }).map(_.sorted)

      val actual = readInts
      if (!aCommitted) abortCount += 1
      if (!bCommitted) abortCount += 1
      trace += s"r$round A=$aName(${if (aCommitted) "ok" else "abort"}) " +
        s"B=$bName(${if (bCommitted) "ok" else "abort"}) -> ${actual.length} rows"
      assert(acceptable.contains(actual), ctx(round,
        s"A=$aName committed=$aCommitted B=$bName committed=$bCommitted\n" +
          s"m0=${m0.sorted.mkString(",")}\nactual=${actual.mkString(",")}\n" +
          s"accepted=${acceptable.map(_.mkString(",")).mkString("\n  ")}"))
      model = actual
      locally {
        val (fs, root) = fsRoot
        BtrLog.latestVersion(fs, root).foreach(v => versionModels(v) = model)
      }

      // ---- physical invariants --------------------------------------
      val (fs, root) = fsRoot
      val tmps = relFiles.filter(_.contains("_tmp_compact_"))
      assert(tmps.isEmpty, ctx(round, s"compactor tmp leftovers: $tmps"))
      val markers = BtrTableMeta.readDvPending(fs, root)
      assert(markers.isEmpty, ctx(round,
        s"stale pending markers: ${markers.map(_._1.getName)}"))
      if (round % 5 == 4) {
        val bad = graft.functions.BtrInspect.fileConsistency(spark, dir)
          .filter(not(col("ok"))).count()
        assert(bad == 0, ctx(round, "file consistency violated"))
      }
    }
    abortCount
  }
}
