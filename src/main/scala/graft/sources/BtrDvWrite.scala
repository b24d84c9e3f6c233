package graft.sources

import graft.format.{BtrTableMeta, DeletionVector}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Delta-based (merge-on-read) row-level DELETE — the deletion-vector
  * path, taken when the table meta records `deletionVectors = true`.
  *
  * Where the group-based operation (BtrRowLevel) rewrites every file
  * holding a matching row, this one writes the matching rows' POSITIONS:
  * Spark's RewriteDeleteFromTable sees [[SupportsDelta]], plans a scan
  * of ONLY the matching rows (full pushdown + chunk skipping apply — no
  * survivors need reading), projects the row ID (`_file`, `_pos`), and
  * feeds it to [[BtrDvDeltaWriter]], which buffers positions per target
  * file and writes one small `_btr_dv/` blob per (target, task). The
  * commit records the blobs in the snapshot log; scans mask from there.
  * A point delete on a 100 TB table costs one filtered scan plus
  * kilobytes of sidecar — no data file is rewritten.
  *
  * Commit protocol and conflict rules in [[graft.format.DeletionVector]];
  * UPDATE and MERGE keep the group-based copy-on-write path (their
  * inserts would need the full writer surface here — Delta Lake shipped
  * DVs for DELETE first for the same reason).
  */
class BtrDvDeleteOperation(path: String, tableSchema: StructType, partCols: Seq[String])
    extends RowLevelOperation with SupportsDelta {

  override def command(): RowLevelOperation.Command = RowLevelOperation.Command.DELETE

  override def rowId(): Array[NamedReference] = Array(
    org.apache.spark.sql.connector.expressions.Expressions.column(BtrScan.FileMetaCol),
    org.apache.spark.sql.connector.expressions.Expressions.column(BtrScan.PosMetaCol))

  override def requiredMetadataAttributes(): Array[NamedReference] = Array.empty

  /** The table's NORMAL scan builder: a delta delete reads only matching
    * rows, so every pushdown (filters, blooms, chunk skipping, late
    * materialization) applies — unlike the group rewrite's read-in-full
    * scan.
    */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new BtrScanBuilder(path, tableSchema, options, partCols)

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new BtrDvDeltaWrite(path,
        info.rowIdSchema().orElseThrow(() =>
          new IllegalStateException("btr: delta write without a rowId schema")))
    }

  override def description(): String = s"btr deletion-vector DELETE on $path"
}

final case class BtrDvCommitMessage(
    blobRels: Seq[String],
    // target rel -> the file length the blob recorded (conflict check:
    // a same-rel file of a different length is a replacement)
    targets: Map[String, Long]) extends WriterCommitMessage

class BtrDvDeltaWrite(path: String, rowIdSchema: StructType,
    // test-only race injection: runs between the pre-commit conflict
    // check and the log claim — deterministic stand-in for a commit
    // landing inside that window (same pattern as BtrCompact.beforeSwap)
    beforeClaim: () => Unit = () => ()) extends DeltaWrite {
  private val writeId = BtrWriteIds.newWriteId()

  override def toBatch: DeltaBatchWrite = new DeltaBatchWrite {
    override def createBatchWriterFactory(info: PhysicalWriteInfo): DeltaWriterFactory =
      BtrDvWriterFactory(path, rowIdSchema, writeId)

    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val dir = new Path(path)
      val fs = dir.getFileSystem(BtrTableMeta.hadoopConf())
      val root = fs.makeQualified(dir)
      graft.format.BtrFs.requireAtomicRename(fs, root)
      val msgs = messages.collect { case m: BtrDvCommitMessage => m }
      val blobs = msgs.flatMap(_.blobRels).toSeq.distinct.sorted
      if (blobs.isEmpty) return // nothing matched: no commit, no version
      val targets: Map[String, Long] = msgs.flatMap(_.targets).toMap
      val rootLen = root.toUri.getPath.length + 1

      def cleanup(): Unit = blobs.foreach(r => fs.delete(new Path(root, r), false))

      def verifyTargets(phase: String): Unit = {
        val visible = BtrTableMeta.listDataFilesWithPartitions(fs, root)
          .map(e => e.path.toUri.getPath.substring(rootLen) -> e.len).toMap
        val drifted = targets.filter { case (rel, len) => !visible.get(rel).contains(len) }
        if (drifted.nonEmpty)
          throw new IllegalStateException(
            s"btr: concurrent commit conflict at $path — DELETE computed deletion " +
              s"vectors against ${drifted.size} file(s) a concurrent commit has since " +
              s"removed or rewritten ($phase; e.g. " +
              s"${drifted.keys.toSeq.sorted.take(3).mkString(", ")}); retry the DELETE.")
      }

      // conflict check BEFORE publishing to the log: the scanned files
      // must still be the visible incarnations (same rel AND same length)
      try verifyTargets("pre-commit")
      catch { case e: IllegalStateException => cleanup(); throw e }

      beforeClaim()
      BtrLog.recordDelta(fs, root, "delete", added = blobs, removed = Nil)

      // post-claim re-verify: an OPTIMIZE/rewrite that binned a target
      // between the check above and the log claim would orphan these
      // masks and LOSE the delete — roll the commit back loudly (the
      // compensating entry removes the blobs from the log's file set)
      // rather than silently resurrecting rows. The physical removal
      // routes through retention: on a retained table the change feed
      // then serves the add/drop pair (which cancels out) instead of
      // failing on a vanished blob.
      try verifyTargets("post-claim")
      catch {
        case e: IllegalStateException =>
          BtrLog.recordDelta(fs, root, "delete-abort", added = Nil, removed = blobs)
          val retain = BtrTableMeta.readRetainRemoved(fs, root)
          blobs.foreach(r => graft.format.BtrRetention.removeDataFile(fs, root, r, retain))
          throw e
      }
      // write-time ingest stats now overstate the table — drop the
      // advisory sidecar, like the metadata DELETE does
      fs.delete(new Path(root, BtrTableMeta.StatsFile), false)
    }

    override def abort(messages: Array[WriterCommitMessage]): Unit = {
      val dir = new Path(path)
      val fs = dir.getFileSystem(BtrTableMeta.hadoopConf())
      val root = fs.makeQualified(dir)
      messages.collect { case m: BtrDvCommitMessage => m }
        .flatMap(_.blobRels).foreach(r => fs.delete(new Path(root, r), false))
    }
  }

  override def description(): String = s"btr dv-delete $writeId"
}

final case class BtrDvWriterFactory(path: String, rowIdSchema: StructType, writeId: String)
    extends DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new BtrDvDeltaWriter(path, rowIdSchema, s"$writeId-$partitionId-$taskId")
}

/** Task-side position collector. Scan order is (file, ascending pos)
  * within a task, but a shuffle between scan and write may reorder —
  * positions are sorted and deduped at task commit.
  */
class BtrDvDeltaWriter(path: String, rowIdSchema: StructType, suffix: String)
    extends DeltaWriter[InternalRow] {

  private val fileIdx = rowIdSchema.fieldIndex(BtrScan.FileMetaCol)
  private val posIdx = rowIdSchema.fieldIndex(BtrScan.PosMetaCol)
  private val byFile = scala.collection.mutable.HashMap.empty[String, java.util.ArrayList[Long]]
  private val written = scala.collection.mutable.ArrayBuffer.empty[String]

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
      "btr: deletion-vector writes carry DELETE only (UPDATE/MERGE take copy-on-write)")

  override def insert(row: InternalRow): Unit =
    throw new UnsupportedOperationException(
      "btr: deletion-vector writes carry DELETE only (UPDATE/MERGE take copy-on-write)")

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
    BtrDvCommitMessage(written.toSeq, targets.toMap)
  }

  override def abort(): Unit =
    written.foreach(r => fs.delete(new Path(root, r), false))

  override def close(): Unit = ()
}
