package graft.sources

import graft.format.{BtrConfig, BtrTableMeta, DeletionVector}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Delta-based (merge-on-read) row-level DML — the deletion-vector path,
  * taken when the table meta records `deletionVectors = true`.
  *
  * Where the group-based operation (BtrRowLevel) rewrites every file
  * holding a matching row, this one ships only the CHANGES: Spark's
  * rewrite rules see [[SupportsDelta]], plan a scan of ONLY the touched
  * rows (full pushdown applies — no survivors need reading), and feed
  * [[BtrDvDeltaWriter]]:
  *
  *  - DELETE rows become per-target position blobs under `_btr_dv/`;
  *  - UPDATE rows split into delete + re-insert
  *    (`representUpdateAsDeleteAndInsert`); inserts (from UPDATE's new
  *    images and MERGE's not-matched rows) stage as hidden `_rl_` files
  *    through the ordinary append writers (partitioned layout included).
  *
  * A point UPDATE on a 100 TB table costs the matching rows' I/O plus
  * kilobytes of sidecar — untouched rows in touched files are never
  * read or rewritten.
  *
  * Commit protocol for commits WITH inserts (pure deletes keep the
  * simpler blob-only protocol — the snapshot log alone publishes them):
  * a `_btr_dvpending_` marker listing the insert rels + blob rels is
  * written BEFORE the staged files rename visible. While the marker is
  * pending, listings exclude its insert files and scans ignore its
  * blobs — every reader sees the consistent PRE-update state. The log
  * entry records the commit, then the marker retires, flipping readers
  * to the post-update state. Crash convergence ([[BtrDvOps
  * .convergePending]], invoked from every mutation entry point): all
  * insert files present → roll FORWARD (record the entry if the log
  * doesn't already cover it, retire the marker); otherwise roll BACK
  * (remove the partial files and blobs). Either way no reader ever saw
  * a half-applied update.
  */
class BtrDvRowLevelOperation(path: String, tableSchema: StructType, partCols: Seq[String],
    cmd: RowLevelOperation.Command) extends RowLevelOperation with SupportsDelta {

  override def command(): RowLevelOperation.Command = cmd

  override def representUpdateAsDeleteAndInsert(): Boolean = true

  override def rowId(): Array[NamedReference] = Array(
    org.apache.spark.sql.connector.expressions.Expressions.column(BtrScan.FileMetaCol),
    org.apache.spark.sql.connector.expressions.Expressions.column(BtrScan.PosMetaCol))

  override def requiredMetadataAttributes(): Array[NamedReference] = Array.empty

  /** The table's NORMAL scan builder: a delta operation reads only the
    * rows it touches, so every pushdown (filters, blooms, chunk
    * skipping, late materialization) applies — unlike the group
    * rewrite's read-in-full scan.
    */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new BtrScanBuilder(path, tableSchema, options, partCols)

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new BtrDvDeltaWrite(path,
        info.rowIdSchema().orElseThrow(() =>
          new IllegalStateException("btr: delta write without a rowId schema")),
        rowSchema =
          if (cmd == RowLevelOperation.Command.DELETE) None else Some(info.schema()),
        partCols = partCols)
    }

  override def description(): String = s"btr deletion-vector $cmd on $path"
}

final case class BtrDvCommitMessage(
    blobRels: Seq[String],
    // target rel -> the file length the blob recorded (conflict check:
    // a same-rel file of a different length is a replacement)
    targets: Map[String, Long],
    // staged (hidden) insert files from UPDATE/MERGE, with stats
    dataMsgs: Seq[BtrCommitMessage] = Nil) extends WriterCommitMessage

class BtrDvDeltaWrite(path: String, rowIdSchema: StructType,
    // test-only race injection: runs between the pre-commit conflict
    // check and the log claim — deterministic stand-in for a commit
    // landing inside that window (same pattern as BtrCompact.beforeSwap)
    beforeClaim: () => Unit = () => (),
    // UPDATE/MERGE: the full row schema for the insert side; None = a
    // pure DELETE (no insert writers)
    rowSchema: Option[StructType] = None,
    partCols: Seq[String] = Nil) extends DeltaWrite
    with RequiresDistributionAndOrdering {
  private val writeId = BtrWriteIds.newWriteId()

  // ---- delta distribution + ordering --------------------------------
  // Pure DELETE: cluster rows by their target file (non-strict — AQE
  // rebalance coalesces/splits) so each touched file's positions land in
  // ONE task → exactly one position blob per file. Without it, a delete
  // spread over T tasks touching F files writes up to T×F blobs — at
  // fleet scale that is millions of KB-sized sidecars for one DELETE.
  // UPDATE/MERGE rows mix deletes with INSERTs whose `_file` is null;
  // clustering by `_file` would funnel every new row image into one
  // task, so those writes request only the task-local sort (nulls
  // first: inserts lead, then deletes grouped per file, positions
  // pre-sorted for tight varint ranges).
  private val isPureDelete = rowSchema.isEmpty
  import org.apache.spark.sql.connector.expressions.{Expressions => VE}

  override def requiredDistribution(): org.apache.spark.sql.connector.distributions.Distribution =
    if (isPureDelete)
      org.apache.spark.sql.connector.distributions.Distributions.clustered(
        Array[org.apache.spark.sql.connector.expressions.Expression](
          VE.column(BtrScan.FileMetaCol)))
    else
      org.apache.spark.sql.connector.distributions.Distributions.unspecified()

  override def distributionStrictlyRequired(): Boolean = false

  override def requiredOrdering(): Array[org.apache.spark.sql.connector.expressions.SortOrder] =
    Array(
      VE.sort(VE.column(BtrScan.FileMetaCol),
        org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING),
      VE.sort(VE.column(BtrScan.PosMetaCol),
        org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING))

  override def toBatch: DeltaBatchWrite = new DeltaBatchWrite {
    // the insert side reuses the ordinary (hidden-staged) row-level
    // writers — partitioned layout, column-mapping slots and commit
    // stats all behave exactly like a CoW rewrite's output
    private val innerFactory: Option[DataWriterFactory] = rowSchema.map { rs =>
      val dir = new Path(path)
      val fs = dir.getFileSystem(BtrTableMeta.hadoopConf())
      val (blockSize, cascade) = BtrTableMeta.readGeometry(fs, dir)
      new BtrBatchWrite(path, rs, BtrOverwriteMode.ReplaceFiles(() => Nil),
        blockSize, cascade, BtrConfig.Default, partCols)
        .createBatchWriterFactory(null)
    }

    override def createBatchWriterFactory(info: PhysicalWriteInfo): DeltaWriterFactory =
      BtrDvWriterFactory(path, rowIdSchema, writeId, innerFactory)

    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val dir = new Path(path)
      val fs = dir.getFileSystem(BtrTableMeta.hadoopConf())
      val root = fs.makeQualified(dir)
      graft.format.BtrFs.requireCommitCapable(fs, root)
      val msgs = messages.collect { case m: BtrDvCommitMessage => m }
      val blobs = msgs.flatMap(_.blobRels).toSeq.distinct.sorted
      val dataMsgs = msgs.flatMap(_.dataMsgs).filter(_.fileName.nonEmpty)
      if (blobs.isEmpty && dataMsgs.isEmpty) return // nothing touched: no commit
      val targets: Map[String, Long] = msgs.flatMap(_.targets).toMap
      val rootLen = root.toUri.getPath.length + 1

      def cleanupBlobs(): Unit = blobs.foreach(r => fs.delete(new Path(root, r), false))

      def verifyTargets(phase: String): Unit = {
        if (targets.nonEmpty) {
          val visible = BtrTableMeta.listDataFilesWithPartitions(fs, root)
            .map(e => e.path.toUri.getPath.substring(rootLen) -> e.len).toMap
          val drifted = targets.filter { case (rel, len) => !visible.get(rel).contains(len) }
          if (drifted.nonEmpty)
            throw new IllegalStateException(
              s"btr: concurrent commit conflict at $path — this row-level operation " +
                s"computed deletion vectors against ${drifted.size} file(s) a " +
                s"concurrent commit has since removed or rewritten ($phase; e.g. " +
                s"${drifted.keys.toSeq.sorted.take(3).mkString(", ")}); retry.")
        }
        // a PENDING maintenance swap journal claiming a target is an
        // in-flight OPTIMIZE/rewrite/DELETE about to re-home or drop its
        // rows — our masks reference ordinals that die with the source,
        // so committing would silently lose this DELETE/UPDATE. The
        // maintenance side re-checks masks AFTER publishing its journal,
        // so of the two racers at least one observes the other: it sees
        // our (task-committed) blobs and yields, or we see its journal
        // here and roll back.
        if (targets.nonEmpty) {
          // claims = journal sources (an OPTIMIZE/rewrite/DELETE about to
          // re-home or drop the target) PLUS blob FINALS of a pending
          // RESTORE (masks about to return over the target — our masks
          // were computed against visibility that excluded them)
          val claimed = (BtrTableMeta.readSwapJournals(fs, root)
            .flatMap(_._2)
            .flatMap(g => g.sources.map(s => if (g.dir.isEmpty) s else s"${g.dir}/$s")) ++
            BtrTableMeta.pendingBlobFinals(fs, root, "")
              .flatMap(graft.format.DeletionVector.targetOf))
            .filter(targets.contains)
          if (claimed.nonEmpty)
            throw new IllegalStateException(
              s"btr: concurrent commit conflict at $path — an in-flight maintenance " +
                s"swap journal claims ${claimed.size} file(s) this row-level operation " +
                s"computed deletion vectors against ($phase; e.g. " +
                s"${claimed.sorted.take(3).mkString(", ")}); retry.")
        }
        // OUR blobs must also still exist: a concurrent RESTORE builds its
        // live set from a physical listing, so it can drop task-committed
        // blobs this commit has not yet recorded — committing anyway would
        // publish a snapshot referencing physically missing blobs. Checking
        // post-claim serializes the race: either restore sees our log entry
        // (and rewinds the delete properly) or we roll back and retry.
        val lostBlobs = blobs.filterNot(r => fs.exists(new Path(root, r)))
        if (lostBlobs.nonEmpty)
          throw new IllegalStateException(
            s"btr: concurrent commit conflict at $path — ${lostBlobs.size} " +
              s"deletion-vector blob(s) of this commit were removed by a " +
              s"concurrent operation ($phase; e.g. " +
              s"${lostBlobs.sorted.take(3).mkString(", ")}); retry.")
      }

      if (dataMsgs.isEmpty) {
        // pure DELETE: blob-only commit, published by the log alone
        try verifyTargets("pre-commit")
        catch { case e: IllegalStateException => cleanupBlobs(); throw e }
        beforeClaim()
        BtrLog.recordDelta(fs, root, "delete", added = blobs, removed = Nil)
        try verifyTargets("post-claim")
        catch {
          case e: IllegalStateException =>
            BtrLog.recordDelta(fs, root, "delete-abort", added = Nil, removed = blobs)
            val retain = BtrTableMeta.readRetainRemoved(fs, root)
            blobs.foreach(r => graft.format.BtrRetention.removeDataFile(fs, root, r, retain))
            throw e
        }
        fs.delete(new Path(root, BtrTableMeta.StatsFile), false)
        return
      }

      // UPDATE/MERGE with inserts: marker-protected two-phase publish
      val stagedRels = dataMsgs.map(_.fileName)
      def visibleOf(rel: String): String = {
        val cut = rel.lastIndexOf('/')
        val dirPart = if (cut < 0) "" else rel.substring(0, cut + 1)
        dirPart + rel.substring(cut + 1).replaceFirst("^_rl_[0-9a-f]{8}_", "")
      }
      val insertRels = stagedRels.map(visibleOf)
      def cleanupStaged(): Unit =
        stagedRels.foreach(r => fs.delete(new Path(root, r), false))
      try verifyTargets("pre-commit")
      catch { case e: IllegalStateException => cleanupBlobs(); cleanupStaged(); throw e }

      BtrTableMeta.writeDvPending(fs, root, writeId, insertRels, blobs)
      stagedRels.foreach { rel =>
        val dst = new Path(root, visibleOf(rel))
        fs.mkdirs(dst.getParent)
        if (!fs.rename(new Path(root, rel), dst))
          throw new java.io.IOException(s"btr: rename $rel -> ${visibleOf(rel)} failed")
      }
      beforeClaim()
      BtrLog.recordDelta(fs, root, "rowdelta", added = insertRels ++ blobs, removed = Nil)
      try verifyTargets("post-claim")
      catch {
        case e: IllegalStateException =>
          BtrLog.recordDelta(fs, root, "rowdelta-abort", added = Nil,
            removed = insertRels ++ blobs)
          val retain = BtrTableMeta.readRetainRemoved(fs, root)
          (insertRels ++ blobs).foreach(r =>
            graft.format.BtrRetention.removeDataFile(fs, root, r, retain))
          fs.delete(new Path(root, s"${BtrTableMeta.DvPendingPrefix}$writeId.json"), false)
          BtrDelete.deleteEmptyPartitionDirs(fs, root)
          throw e
      }
      // the marker's retirement is the atomic flip to the post-update view
      fs.delete(new Path(root, s"${BtrTableMeta.DvPendingPrefix}$writeId.json"), false)
      fs.delete(new Path(root, BtrTableMeta.StatsFile), false)
      BtrFooters.refreshIndex(fs, root)
    }

    override def abort(messages: Array[WriterCommitMessage]): Unit = {
      val dir = new Path(path)
      val fs = dir.getFileSystem(BtrTableMeta.hadoopConf())
      val root = fs.makeQualified(dir)
      messages.collect { case m: BtrDvCommitMessage => m }.foreach { m =>
        m.blobRels.foreach(r => fs.delete(new Path(root, r), false))
        m.dataMsgs.foreach(d =>
          if (d.fileName.nonEmpty) fs.delete(new Path(root, d.fileName), false))
      }
    }
  }

  override def description(): String = s"btr dv-dml $writeId"
}

final case class BtrDvWriterFactory(path: String, rowIdSchema: StructType, writeId: String,
    innerFactory: Option[DataWriterFactory] = None)
    extends DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new BtrDvDeltaWriter(path, rowIdSchema, s"$writeId-$partitionId-$taskId",
      innerFactory.map(_.createWriter(partitionId, taskId)))
}

/** Task-side collector: positions per target file for the delete side,
  * a hidden-staged ordinary writer for the insert side. Scan order is
  * (file, ascending pos) within a task, but a shuffle between scan and
  * write may reorder — positions are sorted and deduped at task commit.
  */
class BtrDvDeltaWriter(path: String, rowIdSchema: StructType, suffix: String,
    inner: Option[DataWriter[InternalRow]] = None)
    extends DeltaWriter[InternalRow] {

  private val fileIdx = rowIdSchema.fieldIndex(BtrScan.FileMetaCol)
  private val posIdx = rowIdSchema.fieldIndex(BtrScan.PosMetaCol)
  private val byFile = scala.collection.mutable.HashMap.empty[String, java.util.ArrayList[Long]]
  private val written = scala.collection.mutable.ArrayBuffer.empty[String]
  private var innerUsed = false

  private lazy val (fs, root) = {
    val dir = new Path(path)
    val f = dir.getFileSystem(BtrTableMeta.hadoopConf())
    (f, f.makeQualified(dir))
  }

  override def delete(metadata: InternalRow, id: InternalRow): Unit = {
    val f = id.getUTF8String(fileIdx).toString
    byFile.getOrElseUpdate(f, new java.util.ArrayList[Long]).add(id.getLong(posIdx))
  }

  override def update(metadata: InternalRow, id: InternalRow, row: InternalRow): Unit =
    throw new UnsupportedOperationException(
      "btr: updates arrive split as delete + insert (representUpdateAsDeleteAndInsert)")

  override def insert(row: InternalRow): Unit = inner match {
    case Some(w) => innerUsed = true; w.write(row)
    case None => throw new UnsupportedOperationException(
      "btr: this deletion-vector write carries DELETE only")
  }

  override def commit(): WriterCommitMessage = {
    val rootLen = root.toUri.getPath.length + 1
    val targets = scala.collection.mutable.HashMap.empty[String, Long]
    byFile.foreach { case (absFile, list) =>
      val abs = new Path(absFile)
      val rel = abs.toUri.getPath.substring(rootLen)
      val targetLen = fs.getFileStatus(abs).getLen
      val positions = new Array[Long](list.size())
      var i = 0
      while (i < positions.length) { positions(i) = list.get(i); i += 1 }
      java.util.Arrays.sort(positions)
      val distinct = new Array[Long](positions.length)
      var n = 0
      i = 0
      while (i < positions.length) {
        if (n == 0 || positions(i) != distinct(n - 1)) { distinct(n) = positions(i); n += 1 }
        i += 1
      }
      val bytes = DeletionVector.serialize(targetLen, java.util.Arrays.copyOf(distinct, n))
      val relBlob = DeletionVector.blobRel(rel, suffix)
      val tmp = new Path(root, s"${DeletionVector.DvDir}/.tmp-$suffix-${written.length}")
      fs.mkdirs(new Path(root, DeletionVector.DvDir))
      val out = fs.create(tmp, true)
      try out.write(bytes) finally out.close()
      val fin = new Path(root, relBlob)
      if (!fs.rename(tmp, fin))
        throw new java.io.IOException(s"btr dv: rename $tmp -> $fin failed")
      written += relBlob
      targets(rel) = targetLen
    }
    val dataMsgs: Seq[BtrCommitMessage] =
      if (!innerUsed) { inner.foreach(_.abort()); Nil }
      else inner.get.commit() match {
        case m: BtrCommitMessage => Seq(m)
        case m: BtrMultiCommitMessage => m.messages.toSeq
        case _ => Nil
      }
    BtrDvCommitMessage(written.toSeq, targets.toMap, dataMsgs)
  }

  override def abort(): Unit = {
    written.foreach(r => fs.delete(new Path(root, r), false))
    if (innerUsed) inner.foreach(_.abort())
  }

  override def close(): Unit = inner.foreach(_.close())
}

object BtrDvOps {
  /** A marker younger than this is presumed IN-FLIGHT (its commit is
    * still running) and is left alone — converging a live commit would
    * early-publish it under the feet of its own post-claim conflict
    * checks. A healthy commit retires its marker within seconds; only a
    * crash leaves one to age past the lease. Same idea as Delta's
    * transaction timeouts.
    */
  val InFlightLeaseMs: Long = 10L * 60 * 1000

  /** Converge crashed merge-on-read UPDATE/MERGE commits (pending
    * `_btr_dvpending_` markers older than [[InFlightLeaseMs]]), invoked
    * from every mutation entry point alongside swap-journal
    * convergence: all insert files present → roll FORWARD (record the
    * log entry if the log doesn't already cover the files, retire the
    * marker); any missing → roll BACK (remove the partial files and
    * blobs). Readers never applied a pending commit, so neither
    * direction can lose acknowledged state; a concurrent mutation
    * running against a still-leased marker simply sees (and may
    * replace) the pre-update state, and the in-flight commit's own
    * post-claim checks then roll it back loudly.
    */
  def convergePending(fs: FileSystem, rawRoot: Path,
      minAgeMs: Long = InFlightLeaseMs): Unit = {
    val root = fs.makeQualified(rawRoot)
    val cutoff = System.currentTimeMillis() - minAgeMs
    val pending = BtrTableMeta.readDvPending(fs, root).filter { case (marker, _) =>
      try fs.getFileStatus(marker).getModificationTime <= cutoff
      catch { case _: java.io.IOException => false } // retired concurrently
    }
    if (pending.isEmpty) return
    val retain = BtrTableMeta.readRetainRemoved(fs, root)
    pending.foreach { case (marker, groups) =>
      val finals = groups.flatMap(_.finals)
      val blobs = groups.flatMap(_.sources)
      val allPresent = finals.forall(f => fs.exists(new Path(root, f)))
      if (allPresent && finals.nonEmpty) {
        val recorded = BtrLog.latestVersion(fs, root).exists { v =>
          val snap = BtrLog.resolveSnapshot(fs, root, v).fileSet
          finals.forall(snap.contains)
        }
        if (!recorded)
          BtrLog.recordDelta(fs, root, "rowdelta", added = finals ++ blobs, removed = Nil)
      } else {
        (finals ++ blobs).foreach(rel =>
          graft.format.BtrRetention.removeDataFile(fs, root, rel, retain))
        BtrDelete.deleteEmptyPartitionDirs(fs, root)
      }
      fs.delete(marker, false)
    }
  }
}
