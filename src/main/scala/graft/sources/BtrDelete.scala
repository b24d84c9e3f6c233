package graft.sources

import graft.format.{BtrFile, BtrTableMeta}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** Metadata-level row deletion: `DELETE FROM` and overwrite-by-filter
  * resolve entirely on the driver from directory values + row-group footer
  * stats — a file is dropped only when every row PROVABLY matches the
  * predicate, kept only when none can. Files the stats can't decide fall
  * to the row-level copy-on-write path ([[BtrRowLevelOperation]]) through
  * SQL; this direct entry point refuses them. Physical deletes run under
  * a delete-intent journal (a finals-less swap journal), so a crash
  * mid-delete converges instead of leaving a half-applied DELETE —
  * matching the snapshot-atomicity a metadata-layer table format gives
  * the same operation.
  *
  * Scale shape: predicates on partition columns classify from the listing
  * alone (no footer I/O); data-column predicates read footers once through
  * the table's footer-index sidecar (one sequential metadata read when the
  * index covers the table). Nothing decodes data bytes, nothing shuffles;
  * a 100k-file table deletes with O(files) driver work and O(matching
  * files) filesystem deletes.
  */
object BtrDelete {

  /** Per-file verdict for a conjunction of filters. */
  sealed trait Verdict
  case object MatchAll extends Verdict // provably every row matches
  case object MatchNone extends Verdict // provably no row matches
  case object Undecided extends Verdict // stats can't split at file boundary

  private def combineAnd(l: Verdict, r: Verdict): Verdict = (l, r) match {
    case (MatchNone, _) | (_, MatchNone) => MatchNone
    case (MatchAll, MatchAll) => MatchAll
    case _ => Undecided
  }

  private def combineOr(l: Verdict, r: Verdict): Verdict = (l, r) match {
    case (MatchAll, _) | (_, MatchAll) => MatchAll
    case (MatchNone, MatchNone) => MatchNone
    case _ => Undecided
  }

  /** Classify one filter against one file. `footer` is only forced for
    * filters the partition values don't decide.
    */
  private def classifyOne(
      tableSchema: StructType,
      dataSchema: StructType,
      txFields: Seq[graft.format.PartField],
      partValues: Map[String, String],
      footer: () => BtrFile.Footer,
      f: Filter): Verdict =
    PartitionPrune.holds(tableSchema, partValues, f)
      // transform dirs give TWO-SIDED verdicts on source-column
      // predicates (a dir holds exactly the rows whose derived value is
      // the dir value) — a retention DELETE on a days(ts) table then
      // classifies every file from the listing, zero footer I/O
      .orElse(if (txFields.isEmpty) None
        else graft.format.PartitionTransform.holds(tableSchema, txFields, partValues, f))
    match {
      case Some(true) => MatchAll
      case Some(false) => MatchNone
      case None =>
        f match {
          case And(l, r) => combineAnd(
            classifyOne(tableSchema, dataSchema, txFields, partValues, footer, l),
            classifyOne(tableSchema, dataSchema, txFields, partValues, footer, r))
          case Or(l, r) => combineOr(
            classifyOne(tableSchema, dataSchema, txFields, partValues, footer, l),
            classifyOne(tableSchema, dataSchema, txFields, partValues, footer, r))
          case _ =>
            val rgs = footer().rowGroups
            if (rgs.forall(rg => ChunkSkip.canSkip(dataSchema, rg, f))) MatchNone
            else if (rgs.forall(rg => ChunkSkip.allMatch(dataSchema, rg, f))) MatchAll
            else Undecided
        }
    }

  /** Verdict for the CONJUNCTION of `filters` over each listed file.
    * Footers are read (via the index sidecar) only for the files whose
    * partition values leave EVERY deciding route open: any single conjunct
    * the partition values prove MatchNone settles the file without footer
    * I/O, regardless of where a data-dependent conjunct sits in the array.
    * `exclude` drops files from consideration entirely (an overwrite
    * commit's own fresh files never classify, let alone footer-read).
    */
  def classify(
      fs: org.apache.hadoop.fs.FileSystem,
      dir: Path,
      tableSchema: StructType,
      partCols: Seq[String],
      filters: Array[Filter],
      exclude: BtrTableMeta.DataFileEntry => Boolean = _ => false
  ): Array[(BtrTableMeta.DataFileEntry, Verdict)] = {
    val dataSchema =
      if (partCols.isEmpty) tableSchema
      else StructType(tableSchema.fields.filterNot(f => partCols.contains(f.name)))
    val txFields = graft.format.PartitionTransform.transformFields(partCols)
    val entries = BtrTableMeta.listDataFilesWithPartitions(fs, dir).filterNot(exclude)
    if (entries.isEmpty) return Array.empty
    // pass 1: per-conjunct partition-only classification (footer thunk
    // that refuses), kept separate so one undecidable conjunct can't mask
    // another conjunct's MatchNone
    val sentinel: () => BtrFile.Footer = () => throw BtrDelete.NeedFooter
    val perFilter: Array[Array[Option[Verdict]]] = entries.map { e =>
      filters.map { f =>
        try Some(classifyOne(tableSchema, dataSchema, txFields, e.partitionValues, sentinel, f))
        catch { case NeedFooter => None }
      }
    }
    def settledWithoutFooter(pf: Array[Option[Verdict]]): Boolean =
      pf.exists(_.contains(MatchNone)) || pf.forall(_.isDefined)
    // pass 2: batch footer reads for the rest (index-served when covered)
    val footers: Map[Path, BtrFile.Footer] = {
      val pending = entries.zipWithIndex.collect {
        case (e, i) if !settledWithoutFooter(perFilter(i)) => e
      }
      if (pending.isEmpty) Map.empty
      else BtrFooters.readAllIndexed(fs, dir, pending)
        .map { case (e, fo) => e.path -> fo }.toMap
    }
    entries.zipWithIndex.map { case (e, i) =>
      val pf = perFilter(i)
      val v =
        if (pf.exists(_.contains(MatchNone))) MatchNone
        else if (pf.forall(_.isDefined)) pf.flatten.foldLeft(MatchAll: Verdict)(combineAnd)
        else {
          val fo = footers(e.path)
          filters.indices.foldLeft(MatchAll: Verdict) { (acc, j) =>
            if (acc == MatchNone) MatchNone
            else combineAnd(acc, pf(j).getOrElse(
              classifyOne(tableSchema, dataSchema, txFields, e.partitionValues, () => fo, filters(j))))
          }
        }
      (e, v)
    }
  }

  private case object NeedFooter extends RuntimeException with scala.util.control.NoStackTrace

  /** Classification for `filters` at `path` (convenience entry point). */
  def classifyAt(path: String, tableSchema: StructType, partCols: Seq[String],
      filters: Array[Filter]): Array[(BtrTableMeta.DataFileEntry, Verdict)] = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(BtrTableMeta.hadoopConf())
    classify(fs, dir, tableSchema, partCols, filters)
  }

  /** True iff the conjunction splits cleanly at file boundaries (Spark's
    * `canDeleteWhere` contract).
    */
  def canDelete(path: String, tableSchema: StructType, partCols: Seq[String],
      filters: Array[Filter]): Boolean =
    classifyAt(path, tableSchema, partCols, filters).forall(_._2 != Undecided)

  /** Delete every row matching ALL `filters`; throws when the predicate
    * doesn't align with file boundaries (callers are expected to probe
    * `canDelete` first — Spark's DeleteFromTableExec does).
    * `preclassified` reuses the probe's verdicts so the
    * canDeleteWhere→deleteWhere pair costs ONE listing + footer pass, not
    * two (the probe's listing is journal-filtered, i.e. exactly the
    * visible set the convergence below realizes physically).
    */
  def deleteWhere(path: String, tableSchema: StructType, partCols: Seq[String],
      filters: Array[Filter],
      preclassified: Option[Array[(BtrTableMeta.DataFileEntry, Verdict)]] = None): Unit = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(BtrTableMeta.hadoopConf())
    graft.format.BtrFs.requireCommitCapable(fs, dir)
    // converge any crashed compaction swap first: classifying a journal-
    // filtered listing and then deleting finals would resurrect sources
    BtrTableMeta.completeSwapJournals(fs, dir)
    BtrDvOps.convergePending(fs, dir)
    val verdicts = preclassified.getOrElse(classify(fs, dir, tableSchema, partCols, filters))
    val undecided = verdicts.collect { case (e, Undecided) => e.path.getName }
    if (undecided.nonEmpty)
      throw new IllegalArgumentException(
        s"btr: DELETE predicate does not align with file boundaries at $path " +
          s"(${undecided.length} file(s) would be partially deleted, e.g. " +
          s"${undecided.take(3).mkString(", ")}). Through SQL this case " +
          "rewrites the affected files row-level (BtrRowLevelOperation); " +
          "this direct entry point only takes the metadata path.")
    val toDelete = verdicts.collect { case (e, MatchAll) => e }
    // preclassified verdicts reuse the canDelete probe's listing — a
    // concurrent commit may have replaced a doomed file since (its
    // replacement could hold rows the predicate does NOT match). Verify
    // the doomed set against a fresh listing and fail loudly on drift.
    if (toDelete.nonEmpty && preclassified.isDefined) {
      val visibleNow = BtrTableMeta.listDataFilesWithPartitions(fs, dir)
        .map(_.path.toUri.getPath).toSet
      val gone = toDelete.filterNot(e => visibleNow.contains(e.path.toUri.getPath))
      if (gone.nonEmpty)
        throw new IllegalStateException(
          s"btr: concurrent commit conflict at $path — DELETE classified " +
            s"${gone.length} file(s) a concurrent commit has since removed or " +
            s"rewritten (e.g. ${gone.take(3).map(_.path.getName).mkString(", ")}); " +
            "retry the DELETE.")
    }
    if (toDelete.nonEmpty) {
      // delete-INTENT journal (a swap with no finals): published before
      // the first physical delete, it hides every doomed file at once —
      // a crash mid-loop converges on the next table operation instead
      // of leaving a half-applied DELETE. "nm-" = no done-marker (the
      // files aren't merged anywhere; streams must not map them).
      val qualified = fs.makeQualified(dir)
      val rootLen = qualified.toUri.getPath.length + 1
      val doomedRels = toDelete.map(e => e.path.toUri.getPath.substring(rootLen)).toSeq
      // a deleted file's deletion-vector blobs go with it (their masks
      // reference ordinals of the dying incarnation)
      val doomedAll = doomedRels ++
        graft.format.DeletionVector.blobRelsForTargets(fs, qualified, doomedRels.toSet)
      // publish-then-recheck: if an in-flight OPTIMIZE/rewrite journal
      // claims one of the doomed files, the observer yields — merging or
      // rewriting a file this DELETE is dropping must serialize
      BtrTableMeta.publishSwapJournalChecked(fs, dir, s"nm-del-${BtrWriteIds.newWriteId()}",
        Seq(BtrTableMeta.SwapGroup("", Nil, doomedAll)))
      locally {
        val retain = BtrTableMeta.readRetainRemoved(fs, dir)
        doomedAll.foreach(rel =>
          graft.format.BtrRetention.removeDataFile(fs, qualified, rel, retain))
      }
      BtrTableMeta.completeSwapJournals(fs, dir)
      // the ingest-stats sidecar aggregates write-time totals; after a
      // delete they overstate the table — drop it (advisory; sizing
      // falls back to btr.expansionFactor)
      fs.delete(new Path(dir, BtrTableMeta.StatsFile), false)
    }
    deleteEmptyPartitionDirs(fs, dir)
    BtrFooters.refreshIndex(fs, dir)
    locally {
      val qualified = fs.makeQualified(dir)
      val rootLen = qualified.toUri.getPath.length + 1
      val doomedRels = toDelete.map(e => e.path.toUri.getPath.substring(rootLen)).toSeq
      // blobs already physically removed above; the log's removed set
      // must drop them too or snapshots would reference orphaned masks
      val doomedDv = BtrLog.latestVersion(fs, qualified).toSeq.flatMap(v =>
        BtrLog.resolveSnapshot(fs, qualified, v).files
          .filter(graft.format.DeletionVector.isDvRel)
          .filter(r => graft.format.DeletionVector.targetOf(r).exists(doomedRels.contains)))
      BtrLog.recordDelta(fs, dir, "delete", added = Nil, removed = doomedRels ++ doomedDv)
    }
  }

  /** Remove partition directories emptied by a delete (leaf-first); the
    * table root and its metadata files stay. Shared with the overwrite
    * commit paths so DELETE and overwrite-expressed deletes leave the
    * same directory layout.
    */
  private[sources] def deleteEmptyPartitionDirs(
      fs: org.apache.hadoop.fs.FileSystem, root: Path): Unit = {
    val qualified = fs.makeQualified(root)
    def sweep(d: Path): Boolean = { // true when d ends up empty & deleted
      val children = fs.listStatus(d)
      var live = 0
      children.foreach { st =>
        val name = st.getPath.getName
        if (st.isDirectory && name.contains('=') && !name.startsWith("_") && !name.startsWith(".")) {
          if (!sweep(st.getPath)) live += 1
        } else live += 1
      }
      if (live == 0 && d != qualified) { fs.delete(d, false); true } else false
    }
    if (fs.exists(qualified)) sweep(qualified)
  }
}
