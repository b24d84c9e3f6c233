package graft.sources

import graft.format.BtrTableMeta
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental change reads between snapshot-log versions — the
  * primitive an incremental training-data pipeline builds on: "give me
  * exactly the rows that arrived since the version I last processed",
  * without re-scanning (or re-deduplicating, re-scoring, re-embedding)
  * the whole corpus.
  *
  * Two tiers, honest about their granularity:
  *
  *  - FILE-level fast path ([[between]], or the raw read options
  *    `btr.changesFromVersion`/`btr.changesToVersion`): valid when no
  *    file visible at `from` was removed in the range — pure appends,
  *    streaming epochs, and compactions that only folded files added
  *    WITHIN the range. The read plans exactly the files added in
  *    `(from, to]` (computed from two snapshot entries, zero data I/O to
  *    decide), so cost scales with the NEW data, never the table. All
  *    rows are `_change_type = 'insert'`; `_commit_version` attributes
  *    each row to the commit whose snapshot first contains its file (a
  *    mid-range compaction makes that the compaction's version — the
  *    row SET is still exact because compaction only re-homes rows).
  *  - ROW-level audit ([[diffTables]]): a multiset diff of two TABLES
  *    (`exceptAll` both ways), emitting inserts AND deletes — the check
  *    an incremental pipeline runs to prove its accumulated state equals
  *    a from-scratch rebuild. Two all-column shuffles; an audit shape,
  *    not a steady-state feed.
  *
  * When history was REMOVED in the range (DELETE, row-level rewrite,
  * overwrite, or a compaction folding pre-`from` files), the feed's
  * behavior depends on the table's retention policy
  * ([[graft.format.BtrRetention]]):
  *
  *  - with `btr.retainRemoved` ON, removal commits MOVED their files
  *    into the hidden store, so [[between]] serves the range ROW-LEVEL:
  *    removed files' rows emit as `_change_type = 'delete'` (attributed
  *    to the removing commit) alongside the added files' inserts — a
  *    multiset-consistent view (a compaction re-homing rows emits
  *    delete+insert pairs of equal rows);
  *  - without retention the removed files are physically gone, and
  *    [[between]] fails loudly naming the offending commits — serving
  *    "new files only" would double-count re-homed rows and silently
  *    miss deletes; the consumer re-bootstraps from a full read at `to`.
  *
  * The snapshot log (`BtrLog`) retains the newest 64 entries and
  * `VACUUM ... RETAIN` bounds the removed-file store; consuming changes
  * on that cadence keeps every increment resolvable.
  */
object BtrChanges {

  /** The resolved file-level change set of `(from, to]`.
    *
    * @param addedRel   table-root-relative paths of files added in the
    *                   range and still visible at `to`, sorted
    * @param versionOf  rel path → version whose snapshot first contains
    *                   it (commit attribution)
    * @param sizes      rel path → recorded length at `to` (where the log
    *                   recorded one) — disambiguates rel-path reuse
    */
  final case class Added(toVersion: Long, addedRel: Seq[String], versionOf: Map[String, Long],
      sizes: Map[String, Long] = Map.empty)

  /** One deletion-vector change event: at `version`, `blobRels` were
    * committed over (or, for a RESTORE rewind, dropped from) `targetRel`.
    * `priorRels` are the target's blobs that applied just BEFORE (add
    * events) / still apply AFTER (drop events) — their rows are
    * subtracted so overlapping or partial histories never double-emit.
    * `sizes` records the lengths of the target and every named blob at
    * that point, for retention-store incarnation selection.
    */
  final case class DvEvent(version: Long, targetRel: String, blobRels: Seq[String],
      priorRels: Seq[String], sizes: Map[String, Long])

  /** Full range resolution including REMOVALS: like [[resolveAdded]] but
    * never throws on removed history — returns the removed rels with the
    * version each disappeared at, for the retention-backed delete side.
    * `removedSizes` holds each removed file's length just before its
    * removal (the incarnation the retention store must serve).
    * Deletion-vector rels never appear in `addedRel`/`removedRels`: blob
    * adds surface as [[DvEvent]]s in `dvAdded` (row-level delete events),
    * blob drops with a surviving target (RESTORE rewinds) as `dvDropped`
    * (row-level insert events), and blobs of a removed data file ride
    * `maskRelsOfRemoved` so the delete side serves the file's SURVIVORS
    * (its masked rows were already reported when their blob committed).
    */
  final case class Range(added: Added, removedRels: Seq[String],
      removedAt: Map[String, Long], removedAction: Map[String, String],
      removedSizes: Map[String, Long] = Map.empty,
      dvAdded: Seq[DvEvent] = Nil, dvDropped: Seq[DvEvent] = Nil,
      maskRelsOfRemoved: Map[String, Seq[String]] = Map.empty)

  def resolveRange(fs: FileSystem, root: Path, fromVersion: Long, toVersion: Long): Range = {
    import graft.format.DeletionVector.{isDvRel, targetOf}
    require(fromVersion >= 0 && toVersion >= math.max(fromVersion, 1L),
      s"btr: change range is (from, to] with to >= from — got from=$fromVersion to=$toVersion")
    val (base, steps) = BtrLog.walkRange(fs, root, fromVersion, toVersion)
    val fromSet = base.fileSet.filterNot(isDvRel)
    val toSnap = steps.lastOption.map(_._2).getOrElse(base)
    val toSet = toSnap.fileSet.filterNot(isDvRel)
    val removedAt = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    val removedAction = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val removedSizes = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    val versionOf = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    val dvAdded = scala.collection.mutable.ArrayBuffer.empty[DvEvent]
    val dvDropped = scala.collection.mutable.ArrayBuffer.empty[DvEvent]
    val maskRels = scala.collection.mutable.LinkedHashMap.empty[String, Seq[String]]
    val unrepresentable = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    var prev = base
    def blobsOf(snapFiles: Seq[String], target: String): Seq[String] =
      snapFiles.filter(isDvRel).filter(r => targetOf(r).contains(target))
    steps.foreach { case (e, snap) =>
      val cur = snap.fileSet
      // a base-visible rel disappearing records a delete event — INCLUDING
      // one that re-appears later in the range (deterministic epoch-name
      // reuse): a plain set difference of the endpoints would land such a
      // rel in neither side and the feed would emit ZERO events for a rel
      // whose row content changed. Recording the removal (old incarnation,
      // size from the pre-removal snapshot) and pairing it with the
      // re-add's insert below keeps the feed multiset-consistent; the
      // retention store disambiguates incarnations by recorded length.
      (prev.fileSet & fromSet).foreach { f =>
        if (!cur.contains(f)) {
          if (!removedAt.contains(f)) {
            removedAt(f) = e.version
            removedAction(f) = e.action
            prev.sizes.get(f).foreach(removedSizes(f) = _)
            // masks applying to f when it died: the delete side must serve
            // the SURVIVORS — masked rows were reported at their blob's commit
            val masks = blobsOf(prev.files, f)
            if (masks.nonEmpty) {
              maskRels(f) = masks
              masks.foreach(m => prev.sizes.get(m).foreach(removedSizes(m) = _))
            }
          } else {
            // a SECOND removal of the same rel (it was removed, restored,
            // and removed again inside one range): the set-based sides can
            // serve one delete incarnation per rel — this history is
            // unrepresentable in a single range and must fail loudly
            // (each single-version sub-range IS representable)
            unrepresentable += (f -> e.version)
          }
        }
      }
      // deletion-vector events
      val curDv = cur.filter(isDvRel)
      val prevDv = prev.fileSet.filter(isDvRel)
      (curDv -- prevDv).groupBy(r => targetOf(r).getOrElse("")).foreach { case (t, blobs) =>
        if (t.nonEmpty) {
          val prior = blobsOf(prev.files, t)
          val sized = (blobs.toSeq ++ prior ++ Seq(t)).flatMap(r =>
            snap.sizes.get(r).orElse(prev.sizes.get(r)).map(r -> _)).toMap
          dvAdded += DvEvent(e.version, t, blobs.toSeq.sorted, prior, sized)
        }
      }
      (prevDv -- curDv).groupBy(r => targetOf(r).getOrElse("")).foreach { case (t, blobs) =>
        // blob dropped while its target PERSISTS = a RESTORE (or rolled-
        // back delete) un-deleting rows: emit them as inserts. A target
        // removed in the same commit is covered by its masked delete side.
        if (t.nonEmpty && cur.contains(t)) {
          val kept = blobsOf(snap.files, t)
          val sized = (blobs.toSeq ++ kept ++ Seq(t)).flatMap(r =>
            prev.sizes.get(r).orElse(snap.sizes.get(r)).map(r -> _)).toMap
          dvDropped += DvEvent(e.version, t, blobs.toSeq.sorted, kept, sized)
        }
      }
      cur.foreach { f =>
        if (!isDvRel(f) && !prev.fileSet.contains(f) && toSet.contains(f)
          && !versionOf.contains(f)
          && (!fromSet.contains(f) || removedAt.contains(f)))
          versionOf(f) = e.version
      }
      prev = snap
    }
    if (unrepresentable.nonEmpty) {
      val ex = unrepresentable.take(3).map { case (f, v) => s"$f (again at v$v)" }
      throw new IllegalStateException(
        s"btr: cannot serve changes ($fromVersion, $toVersion] of $root in ONE range — " +
          s"${unrepresentable.size} file(s) were removed, restored, and removed AGAIN " +
          s"inside it (e.g. ${ex.mkString(", ")}); the per-rel sides can serve one " +
          "delete incarnation each. Split the range at the intermediate versions " +
          "(every (v, v+1] sub-range is representable) and union the results.")
    }
    // a deletion-vector event whose target is TRANSIENT (added and removed
    // inside the range, so its content never enters the feed) must not
    // emit: the rows it masks were never inserted
    def transient(t: String): Boolean = !fromSet.contains(t) && !toSet.contains(t)
    // removed = base files that are gone at `to` PLUS base files removed
    // and re-created mid-range (their re-add is in `addedRel`)
    val removed = (fromSet -- toSet) ++ removedAt.keys
    val addedRel = (toSet -- fromSet) ++ removedAt.keysIterator.filter(toSet.contains)
    Range(Added(toSnap.version, addedRel.toSeq.sorted, versionOf.toMap,
        toSnap.sizes.view.filterKeys(addedRel.contains).toMap),
      removed.toSeq.sorted, removedAt.toMap, removedAction.toMap, removedSizes.toMap,
      dvAdded.toSeq.filterNot(ev => transient(ev.targetRel)),
      dvDropped.toSeq.filterNot(ev => transient(ev.targetRel)), maskRels.toMap)
  }

  /** True when `rel`'s CURRENT live incarnation provably came back via a
    * RESTORE after its removal at `removedV` — restore renames the bytes
    * back out of the store, so live IS the historical incarnation
    * (callers still size-check). Any other re-creation is new content
    * that must not masquerade as history. Walks the log forward from the
    * removal; the LAST absent→present transition names the incarnation's
    * origin.
    */
  private[sources] def reAddedByRestore(fs: FileSystem, root: Path, rel: String,
      removedV: Long): Boolean = {
    val latest = BtrLog.latestVersion(fs, root).getOrElse(return false)
    if (latest <= removedV) return false
    val (base, steps) =
      try BtrLog.walkRange(fs, root, removedV, latest)
      catch { case _: IllegalStateException => return false }
    var present = base.fileSet.contains(rel)
    var origin: Option[String] = None
    steps.foreach { case (e, snap) =>
      val now = snap.fileSet.contains(rel)
      if (now && !present) origin = Some(e.action)
      present = now
    }
    present && origin.contains("restore")
  }

  /** Resolve the added-file set of `(from, to]` from the snapshot log.
    * Zero data I/O: resolves the base snapshot and replays the range's
    * (small JSON) entries. Fails loudly when a file visible at `from` is
    * gone by `to` (the fast path would be wrong) or when an entry in the
    * range was pruned (attribution would be a guess).
    */
  def resolveAdded(fs: FileSystem, root: Path, fromVersion: Long, toVersion: Long): Added = {
    require(fromVersion >= 0,
      s"btr: changes need a base version >= 0 (0 = bootstrap: everything up to `to`), " +
        s"got $fromVersion")
    require(toVersion >= math.max(fromVersion, 1L),
      s"btr: change range is (from, to] with to >= from — got from=$fromVersion to=$toVersion")
    val r = resolveRange(fs, root, fromVersion, toVersion)
    if (r.dvAdded.nonEmpty || r.dvDropped.nonEmpty)
      throw new IllegalStateException(
        s"btr: cannot serve file-level changes ($fromVersion, $toVersion] of $root — " +
          s"the range contains deletion-vector commits (e.g. " +
          s"v${(r.dvAdded ++ r.dvDropped).map(_.version).min}): rows were deleted " +
          "in place, so new-files-only would be wrong. Use BtrChanges.between " +
          "(row-level delete events) or the CDC stream.")
    if (r.removedRels.nonEmpty) {
      // name the commits that removed base files, so the error points at
      // the exact history the fast path cannot represent
      val culprits = r.removedRels.map(f =>
        s"v${r.removedAt(f)} (${r.removedAction(f)})").distinct
      throw new IllegalStateException(
        s"btr: cannot serve file-level changes ($fromVersion, $toVersion] of $root — " +
          s"${r.removedRels.size} file(s) visible at v$fromVersion were removed by " +
          s"${culprits.take(4).mkString(", ")}; rows were rewritten or deleted, so " +
          "new-files-only would be wrong, and the removed files are physically gone. " +
          s"Re-bootstrap: process a full read at v$toVersion, then resume " +
          "incrementally from there (BtrChanges.diffTables audits an incremental " +
          "result against a rebuild).")
    }
    r.added
  }

  /** DataFrame of the rows added in `(fromVersion, toVersion]`, with
    * `_change_type` (always `'insert'` on this path) and
    * `_commit_version` appended after the table columns. The underlying
    * scan plans ONLY the added files (filter pushdown, chunk skipping
    * and column pruning all still apply on top), so a downstream
    * `.filter(...).select(...)` of the feed stays as cheap as the same
    * query over a table holding just the new data.
    */
  def between(spark: SparkSession, dir: String, fromVersion: Long, toVersion: Long): DataFrame = {
    val p = new Path(dir)
    val fs = p.getFileSystem(BtrTableMeta.hadoopConf())
    val root = fs.makeQualified(p)
    val r = resolveRange(fs, root, fromVersion, toVersion)

    def read(side: String) = spark.read.format("btr")
      .option("btr.changesFromVersion", fromVersion.toString)
      .option("btr.changesToVersion", toVersion.toString)
      .option("btr.changesSide", side)
      .load(dir)

    // attribution rides the `_file` metadata column: map keys are the
    // exact qualified-path strings the scan synthesizes (both sides
    // derive from the same listing / store APIs)
    def attributed(df: DataFrame, byFile: Map[String, Long], changeType: String): DataFrame =
      if (byFile.isEmpty)
        df.select(col("*"))
          .withColumn("_change_type", lit(changeType))
          .withColumn("_commit_version", lit(null).cast("long"))
      else
        df.select(col("*"), col(BtrScan.FileMetaCol))
          .withColumn("_commit_version",
            element_at(typedLit(byFile), col(BtrScan.FileMetaCol)))
          .withColumn("_change_type", lit(changeType))
          .drop(BtrScan.FileMetaCol)

    val rootLen = root.toUri.getPath.length + 1
    lazy val liveByRel: Map[String, BtrTableMeta.DataFileEntry] =
      BtrTableMeta.listDataFilesWithPartitions(fs, root)
        .map(e => e.path.toUri.getPath.substring(rootLen) -> e).toMap
    // a file added in the range but removed by a commit AFTER `to` (later
    // DELETE/overwrite/OPTIMIZE) is absent from the live listing; on a
    // retained table the store still serves it, and the scan resolves it
    // to the store entry's path — key the attribution map the same way.
    // Size check mirrors BtrRetention.resolveFileSet: a live file whose
    // length contradicts the snapshot's is a re-used name, not our file
    def insertAttribution: Map[String, Long] = r.added.versionOf.map { case (rel, v) =>
      val expected = r.added.sizes.get(rel)
      liveByRel.get(rel).filter(e => expected.forall(_ == e.len)).map(_.path.toString)
        .orElse(graft.format.BtrRetention.resolveRemoved(fs, root, rel,
            expectedLen = expected)
          .map(_.path.toString))
        .getOrElse(throw new IllegalStateException(
          s"btr: change set of ($fromVersion, $toVersion] references $rel which is no " +
            s"longer listed under $root and not retained — history was physically " +
            "truncated")) -> v
    }

    // deletion-vector change events: one read per DV commit (delete
    // events of a blob add; insert events of a RESTORE's blob drop),
    // each emitting exactly the rows that commit masked/unmasked —
    // read from the STILL-LIVE target file, no rewrite ever happened
    def readDv(side: String, v: Long) = spark.read.format("btr")
      .option("btr.changesFromVersion", fromVersion.toString)
      .option("btr.changesToVersion", toVersion.toString)
      .option("btr.changesSide", side)
      .option("btr.changesDvVersion", v.toString)
      .load(dir)
    val dvReads: Seq[DataFrame] =
      r.dvAdded.map(_.version).distinct.sorted.map(v =>
        readDv("dv-delete", v)
          .withColumn("_commit_version", lit(v))
          .withColumn("_change_type", lit("delete"))) ++
      r.dvDropped.map(_.version).distinct.sorted.map(v =>
        readDv("dv-insert", v)
          .withColumn("_commit_version", lit(v))
          .withColumn("_change_type", lit("insert")))

    if (r.removedRels.isEmpty && dvReads.isEmpty) {
      // pure-append range: the insert-only fast path (strict side —
      // a concurrent removal between resolve and read fails loudly)
      return attributed(read("insert"),
        if (r.added.addedRel.isEmpty) Map.empty else insertAttribution, "insert")
    }
    if (r.removedRels.isEmpty) {
      // appends + in-place deletes only
      val inserts = attributed(read("insert-lenient"),
        if (r.added.addedRel.isEmpty) Map.empty else insertAttribution, "insert")
      return dvReads.foldLeft(inserts)(_ unionByName _)
    }

    // removals in range: the retention store supplies the removed files
    // row-level — every removed file must still be resolvable. One
    // exception to store-only: a removed rel whose CURRENT incarnation
    // came back via RESTORE (in-range or after it) moved its bytes BACK
    // into the table, so live (size-checked) IS the removed incarnation;
    // any other re-add is new content and must not masquerade as history.
    val removedEntries = r.removedRels.map { rel =>
      val stored = graft.format.BtrRetention.resolveRemoved(fs, root, rel,
        expectedLen = r.removedSizes.get(rel))
      rel -> stored.orElse {
        liveByRel.get(rel).filter(e => r.removedSizes.get(rel).forall(_ == e.len))
          .filter(_ => reAddedByRestore(fs, root, rel,
            r.removedAt.getOrElse(rel, toVersion)))
      }
    }
    val gone = removedEntries.collect { case (rel, None) => rel }
    if (gone.nonEmpty) {
      val culprits = gone.take(3).map(rel =>
        s"v${r.removedAt.getOrElse(rel, toVersion)} " +
          s"(${r.removedAction.getOrElse(rel, "?")})").distinct
      throw new IllegalStateException(
        s"btr: cannot serve changes ($fromVersion, $toVersion] of $root — " +
          s"${gone.length} file(s) removed by ${culprits.mkString(", ")} are " +
          s"physically gone (e.g. ${gone.take(3).mkString(", ")}). Enable " +
          "btr.retainRemoved to keep removed files for the change feed, or " +
          s"Re-bootstrap: process a full read at v$toVersion and resume " +
          "incrementally from there (BtrChanges.diffTables audits an " +
          "incremental result against a rebuild).")
    }
    val deleteAttribution: Map[String, Long] = removedEntries.collect {
      case (rel, Some(e)) => e.path.toString -> r.removedAt.getOrElse(rel, toVersion)
    }.toMap
    val inserts = attributed(read("insert-lenient"),
      if (r.added.addedRel.isEmpty) Map.empty else insertAttribution, "insert")
    val deletes = attributed(read("delete"), deleteAttribution, "delete")
    dvReads.foldLeft(inserts.unionByName(deletes))(_ unionByName _)
  }

  /** [[between]] with TIMESTAMP bounds (epoch millis): each bound maps
    * to the newest snapshot at-or-before it, so `(fromTs, toTs]` serves
    * exactly the commits that became visible in that wall-clock window
    * — the "changes since last night's run" call a scheduled pipeline
    * makes without tracking versions itself.
    */
  def betweenTimestamps(spark: SparkSession, dir: String,
      fromTsMillis: Long, toTsMillis: Long): DataFrame = {
    val p = new Path(dir)
    val fs = p.getFileSystem(BtrTableMeta.hadoopConf())
    val root = fs.makeQualified(p)
    val from = BtrLog.versionAtOrBefore(fs, root, fromTsMillis)
    val to = BtrLog.versionAtOrBefore(fs, root, toTsMillis)
    require(to >= math.max(from, 1L),
      s"btr: no commits in ($fromTsMillis, $toTsMillis] at $root " +
        s"(resolved versions: from=v$from, to=v$to)")
    between(spark, dir, from, to)
  }

  /** Row-level multiset diff of two TABLES: `_change_type = 'insert'`
    * rows are in `right` but not `left`, `'delete'` the reverse; a row
    * appearing k more times gains k change rows (exceptAll semantics).
    * The audit an incremental pipeline runs to prove its accumulated
    * output equals a from-scratch rebuild — empty result == equal
    * multisets. Two all-column shuffles; schemas must union by name.
    */
  def diffTables(spark: SparkSession, leftDir: String, rightDir: String): DataFrame = {
    val a = spark.read.format("btr").load(leftDir)
    val b = spark.read.format("btr").load(rightDir)
    b.exceptAll(a).withColumn("_change_type", lit("insert"))
      .unionByName(a.exceptAll(b).withColumn("_change_type", lit("delete")))
  }
}
