package graft.sources

import graft.format.BtrTableMeta
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Group-based row-level operations (`DELETE FROM` beyond file-aligned
  * predicates, `UPDATE`, `MERGE INTO`) — copy-on-write at file
  * granularity, the same architecture Iceberg uses with Spark's
  * row-level-operation API. The reference engine has no DML at all
  * (tables are immutable compressed blocks); this is engine-extension
  * surface a pipeline user expects from a SQL-addressable table.
  *
  * How a command executes (Spark 4's RewriteDeleteFromTable /
  * RewriteUpdateTable / RewriteMergeIntoTable → ReplaceData):
  *
  *  1. the operation's SCAN classifies files against the pushed command
  *     condition with the metadata-delete classifier: files provably
  *     containing NO matching row (sound under partial pushdown — a
  *     conjunct subset proving MatchNone proves the full condition
  *     MatchNone) are left untouched; every other file is read IN FULL
  *     (no chunk skipping, no runtime filters — a skipped chunk's
  *     surviving rows would vanish from the rewrite);
  *  2. Spark computes the replacement rows (survivors for DELETE,
  *     updated-or-original for UPDATE, merged for MERGE);
  *  3. the paired WRITE stages hidden files, then atomically swaps them
  *     for exactly the scanned files under a swap journal
  *     ([[BtrOverwriteMode.ReplaceFiles]]).
  *
  * Fully file-aligned DELETEs never get here: Spark's
  * OptimizeMetadataOnlyDeleteFromTable downgrades them to the zero-I/O
  * metadata delete through [[BtrTable.canDeleteWhere]].
  *
  * Scale shape: classification is O(files) driver metadata (footer reads
  * through the index sidecar); the rewrite reads and writes ONLY the
  * affected files, task-parallel, no shuffle (scan tasks pipeline into
  * write tasks). A predicate with no pushable conjunct (or a MERGE whose
  * ON references the source) classifies nothing and rewrites the whole
  * table — the honest worst case of copy-on-write.
  */
class BtrRowLevelOperationBuilder(path: String, tableSchema: StructType,
    partCols: Seq[String], info: RowLevelOperationInfo)
    extends RowLevelOperationBuilder {
  override def build(): RowLevelOperation = {
    // DML on a deletion-vector table takes the delta-based
    // (merge-on-read) path: DELETE writes position blobs, UPDATE/MERGE
    // write blobs for the old row images plus ordinary staged files for
    // the new ones — no untouched row is ever read or rewritten. `_pos`
    // must be available as a metadata column (a data column claiming
    // the name forces copy-on-write — honest fallback, still correct).
    val dir = new Path(path)
    val fs = dir.getFileSystem(BtrTableMeta.hadoopConf())
    if (BtrTableMeta.readDeletionVectors(fs, dir) &&
      BtrScan.posColActive(tableSchema) && BtrScan.fileColActive(tableSchema))
      return new BtrDvRowLevelOperation(path, tableSchema, partCols, info.command())
    new BtrRowLevelOperation(path, tableSchema, partCols, info.command())
  }
}

class BtrRowLevelOperation(path: String, tableSchema: StructType, partCols: Seq[String],
    cmd: RowLevelOperation.Command) extends RowLevelOperation {

  /** Root-relative paths of the files the rewrite scan selected; the
    * paired write replaces exactly this set at commit. Written by the
    * scan build (driver, planning), read by the write commit (driver) —
    * the scan always plans before the write job runs.
    */
  @volatile private[sources] var replacedFiles: Seq[String] = Nil

  /** Deletion-vector rels the rewrite scan applied while computing row
    * images (empty on non-DV tables) — the commit conflicts when the
    * committed set changed since.
    */
  @volatile private[sources] var appliedDvRels: Set[String] = Set.empty

  override def command(): RowLevelOperation.Command = cmd

  /** `_file` rides along so Spark's runtime group filtering can compute
    * the exact set of files holding matching rows (a subquery over the
    * table projecting `_file` under the command condition — chunk
    * skipping and blooms prune it like any scan) and dynamically narrow
    * the rewrite to just those files. This is what keeps MERGE INTO from
    * rewriting a whole table whose ON condition isn't statically
    * pushable.
    */
  override def requiredMetadataAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    // suppressed when a data column claims _file (the metadata column is
    // inactive then — see BtrScan.fileColActive); static classification
    // still narrows the rewrite, only the dynamic narrowing is lost
    if (!BtrScan.fileColActive(tableSchema)) Array.empty
    else Array(org.apache.spark.sql.connector.expressions.Expressions.column(BtrScan.FileMetaCol))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new BtrRowLevelScanBuilder(this, path, tableSchema, partCols, options)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = new WriteBuilder {
    override def build(): Write = new Write {
      override def toBatch: BatchWrite = {
        val dir = new Path(path)
        val fs = dir.getFileSystem(BtrTableMeta.hadoopConf())
        // replacement files keep the table's recorded geometry, like
        // compaction rewrites — a DELETE must not change row-group size
        val (blockSize, cascade) = BtrTableMeta.readGeometry(fs, dir)
        // info.schema() is the ROW schema, but the physical rows arrive
        // with a leading `__row_operation` marker column: with no required
        // metadata attributes, ReplaceDataExec plans the plain writing
        // task, which writeAll()s the rewrite query's RAW output
        // (Project [op, row...]) without applying the row projection.
        // Wrap every writer to project the marker off (detected by row
        // arity, so the code stays correct if a future Spark applies the
        // projection itself); writing it through would shear the whole
        // file's column mapping by one.
        // metadata columns are read-side identities, never data: strip
        // them (and any operation marker) from the write schema — but a
        // DATA column legitimately named _file stays
        val rowSchema = StructType(info.schema().fields.filterNot(f =>
          (BtrScan.fileColActive(tableSchema) && f.name == BtrScan.FileMetaCol) ||
            f.name == org.apache.spark.sql.catalyst.util.RowDeltaUtils.OPERATION_COLUMN))
        val inner = new BtrBatchWrite(path, rowSchema,
          BtrOverwriteMode.ReplaceFiles(() => replacedFiles, () => appliedDvRels),
          blockSize, cascade, graft.format.BtrConfig.Default, partCols)
        new BatchWrite {
          override def createBatchWriterFactory(pInfo: PhysicalWriteInfo): DataWriterFactory =
            BtrDropLeadingColWriterFactory(inner.createBatchWriterFactory(pInfo), rowSchema)
          override def commit(messages: Array[WriterCommitMessage]): Unit = inner.commit(messages)
          override def abort(messages: Array[WriterCommitMessage]): Unit = inner.abort(messages)
        }
      }
    }
  }

  override def description(): String = s"btr row-level $cmd on $path"
}

/** Scan side of the rewrite: pushed filters select FILES only (via the
  * metadata-delete classifier); every selected file is read whole. All
  * filters are returned to Spark as residuals — the command condition is
  * always re-evaluated row-by-row above the scan.
  */
class BtrRowLevelScanBuilder(op: BtrRowLevelOperation, path: String,
    tableSchema: StructType, partCols: Seq[String], options: CaseInsensitiveStringMap)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var requiredSchema: StructType = graft.format.BtrColumnMapping.logical(tableSchema)
  private var cond: Array[Filter] = Array.empty

  override def pruneColumns(required: StructType): Unit = { requiredSchema = required }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    cond = filters
    filters // ALL residual: the scan only uses them to pick files
  }

  override def pushedFilters(): Array[Filter] = cond

  override def build(): Scan = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(BtrTableMeta.hadoopConf())
    val rootLen = fs.makeQualified(dir).toUri.getPath.length + 1
    def rel(p: Path): String = p.toUri.getPath.substring(rootLen)
    // MatchNone is sound even when `cond` is a subset of the real
    // condition's conjuncts; MatchAll/Undecided both mean "rewrite"
    // (MatchAll on a conjunct SUBSET does not prove the full condition
    // matches, so no delete-without-read shortcut here — the fully-
    // aligned case took the metadata path upstream). An empty `cond`
    // (e.g. MERGE ON source rows) classifies every file MatchAll without
    // footer I/O — full-table copy-on-write, the honest worst case.
    val selected = BtrDelete.classify(fs, dir, tableSchema, partCols, cond)
      .collect { case (e, v) if v != BtrDelete.MatchNone => e }
    val selectedRel = selected.map(e => rel(e.path)).toSeq
    op.replacedFiles = selectedRel
    // hand the classified entries straight to the scan: a second full
    // listing per DML statement is a planning-scale metadata pass wasted
    // on a 100k-file table. The narrow callback keeps op.replacedFiles in
    // lockstep when the runtime group filter shrinks the rewrite set —
    // the commit must replace exactly the files the scan read.
    new BtrScan(path, tableSchema, requiredSchema, Array.empty,
      BtrOptions.splitBytes(options), None, partCols,
      BtrOptions.expansionFactor(options), None,
      rewriteGroups = true, preListed = Some(selected),
      onRewriteNarrowed = Some(entries => op.replacedFiles = entries.map(e => rel(e.path)).toSeq),
      onDvApplied = Some(rels => op.appliedDvRels = rels))
  }
}

/** Drops the leading `__row_operation` marker column before handing each
  * row to the real writer. `rowSchema` is the write schema WITHOUT the
  * marker; a row with exactly one extra field is projected, a row already
  * matching the schema passes through (future-proof against Spark
  * applying its own row projection). The projection is built per writer,
  * executor-side — ProjectingInternalRow is stateful.
  */
final case class BtrDropLeadingColWriterFactory(inner: DataWriterFactory,
    rowSchema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[org.apache.spark.sql.catalyst.InternalRow] = {
    val w = inner.createWriter(partitionId, taskId)
    val proj = org.apache.spark.sql.catalyst.ProjectingInternalRow(rowSchema,
      (1 to rowSchema.length).toIndexedSeq)
    new org.apache.spark.sql.connector.write.DataWriter[org.apache.spark.sql.catalyst.InternalRow] {
      override def write(row: org.apache.spark.sql.catalyst.InternalRow): Unit =
        if (row.numFields == rowSchema.length + 1) {
          proj.project(row)
          w.write(proj)
        } else w.write(row)
      override def commit(): WriterCommitMessage = w.commit()
      override def abort(): Unit = w.abort()
      override def close(): Unit = w.close()
    }
  }
}

private[sources] object BtrRowLevelOps {
  /** Remove hidden `_rl_*` staging files a crashed rewrite left behind
    * (its journal never published, so nothing else ever deletes them).
    * `exceptId` protects the in-flight write's own staging.
    */
  def sweepStaged(fs: FileSystem, root: Path, exceptId: String): Unit = {
    def sweep(d: Path): Unit = {
      val it = fs.listStatusIterator(d)
      while (it.hasNext) {
        val st = it.next()
        val name = st.getPath.getName
        if (st.isDirectory && !name.startsWith("_") && !name.startsWith(".")) sweep(st.getPath)
        else if (st.isFile && name.startsWith("_rl_") && !name.startsWith(s"_rl_${exceptId}_"))
          fs.delete(st.getPath, false)
      }
    }
    if (fs.exists(root)) sweep(root)
  }
}
