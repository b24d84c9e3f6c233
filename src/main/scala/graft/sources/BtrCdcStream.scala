package graft.sources

import graft.format.BtrTableMeta
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** CDC column names + schema shaping for `btr.readChanges` stream reads. */
object BtrCdc {
  val ChangeTypeCol = "_change_type"
  val CommitVersionCol = "_commit_version"

  def isCdcCol(name: String): Boolean =
    name == ChangeTypeCol || name == CommitVersionCol

  def withCdcColumns(schema: StructType): StructType =
    StructType(schema.fields ++ Seq(
      StructField(ChangeTypeCol, StringType, nullable = false),
      StructField(CommitVersionCol, LongType, nullable = true)))
}

/** Streaming change feed: a micro-batch source whose OFFSETS are
  * snapshot-log versions and whose rows carry `_change_type` /
  * `_commit_version` — the streaming half of [[BtrChanges.between]].
  * Each micro-batch serves the change set of a version range `(s, e]`:
  *
  *  - pure-append commits plan exactly the added files (cost scales
  *    with the new data, never the table) as `insert` rows;
  *  - removal commits (DELETE / row-level rewrite / overwrite /
  *    OPTIMIZE) on a table with `btr.retainRemoved` emit the removed
  *    files' rows as `delete` rows from the retention store, alongside
  *    the replacement files' inserts — a streaming consumer SURVIVES
  *    an OPTIMIZE or DELETE without re-bootstrapping;
  *  - on an unretained table a removal-crossing batch fails loudly
  *    (same contract as the batch feed: serving inserts-only would
  *    double-count re-homed rows and silently miss deletes).
  *
  * Exactly-once: offsets are versions in Spark's checkpoint; replaying
  * a committed range is deterministic because the snapshot log resolves
  * the same file sets (pruned log entries or expired store files fail
  * loudly, never partially). `btr.startingVersion` picks the base
  * version on a fresh checkpoint (`latest` / absent = only commits
  * after stream start; an explicit `n` = start after version n —
  * `0` bootstraps the whole table as inserts).
  *
  * Filters are NOT consumed here — every pushed predicate remains a
  * residual above the scan, so correctness never depends on skipping.
  */
class BtrCdcMicroBatchStream(
    path: String,
    tableSchema: StructType,
    requiredSchema: StructType,
    partCols: Seq[String],
    startingVersion: Option[String],
    maxFilesPerTrigger: Option[Int] = None,
    // start by TIME (micros since epoch): resolves to the newest
    // snapshot at-or-before the instant on a fresh checkpoint
    startingTimestampMicros: Option[Long] = None
) extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {
  import BtrCdcMicroBatchStream.VersionOffset
  import org.apache.spark.sql.connector.read.streaming.{ReadLimit, ReadMaxFiles}

  private def fsRoot = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(BtrTableMeta.hadoopConf())
    (fs, fs.makeQualified(dir))
  }

  /** File-column layout: table schema minus partition + CDC columns. */
  private val dataSchema: StructType =
    StructType(tableSchema.fields.filterNot(f =>
      partCols.contains(f.name) || BtrCdc.isCdcCol(f.name)))

  override def initialOffset(): Offset = {
    require(startingVersion.isEmpty || startingTimestampMicros.isEmpty,
      "btr: specify either btr.startingVersion or btr.startingTimestamp, not both")
    val (fs, root) = fsRoot
    val v = (startingVersion, startingTimestampMicros) match {
      case (Some("latest"), _) => BtrLog.latestVersion(fs, root).getOrElse(0L)
      case (Some(n), _) => n.toLong
      case (None, Some(micros)) => BtrLog.versionAtOrBefore(fs, root, micros / 1000L)
      case (None, None) => BtrLog.latestVersion(fs, root).getOrElse(0L)
    }
    VersionOffset(v)
  }

  // SupportsAdmissionControl drives batch sizing; the legacy no-arg
  // variant must not be called once the control interface is implemented
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead of this method")

  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(n => ReadLimit.maxFiles(n)).getOrElse(ReadLimit.allAvailable())

  /** Admission control: cap a micro-batch's version range so its planned
    * file count stays within `maxFilesPerTrigger` — a consumer behind a
    * large backlog drains it in bounded batches instead of one giant
    * catch-up. A version's cost counts its ADD set AND its REMOVE set:
    * every removed file becomes a retention-store read for the delete
    * side of the batch, so a removal-heavy commit (large DELETE or
    * OPTIMIZE on a retained table) is just as expensive to plan as an
    * equally-sized append. Delta log entries carry both sets, so sizing
    * a batch is O(versions examined) small JSON reads. At least one
    * version is always admitted (progress guarantee); a full-checkpoint
    * entry ends its batch (its change sets aren't knowable without
    * resolution).
    *
    * THE BATCH FLOOR IS ONE COMMIT — a single commit is never split, so
    * one wide DML (a deletion-vector DELETE/UPDATE masking rows across
    * thousands of files: cost = its blob count ≈ touched files) bounds
    * its batch at the COMMIT's width, not the cap. That is the same
    * floor Delta's maxFilesPerTrigger has, and it is safe because the
    * plan within the commit is one InputPartition per touched file
    * (driver cost O(commit) metadata, reads execute in parallel) — only
    * the sink sees the whole commit at once, which exactly-once
    * version-granular offsets require.
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[VersionOffset].version
    val (fs, root) = fsRoot
    val latest = BtrLog.latestVersion(fs, root).getOrElse(0L)
    if (latest <= s) return VersionOffset(s)
    limit match {
      case mf: ReadMaxFiles =>
        val cap = mf.maxFiles()
        var v = s
        var files = 0
        var done = false
        while (!done && v < latest) {
          val e = BtrLog.readEntry(fs, root, v + 1)
          val cost = if (e.isDelta) e.add.length + e.remove.length else Int.MaxValue
          if (v == s || (cost != Int.MaxValue && files + cost <= cap)) {
            v += 1
            files = if (cost == Int.MaxValue) cap else files + cost
          } else done = true
          if (cost == Int.MaxValue) done = true // checkpoint = batch boundary
        }
        VersionOffset(v)
      case _ => VersionOffset(latest)
    }
  }

  override def deserializeOffset(json: String): Offset = VersionOffset(json.trim.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[VersionOffset].version
    val e = end.asInstanceOf[VersionOffset].version
    if (e <= s) return Array.empty
    val (fs, root) = fsRoot
    val r = BtrChanges.resolveRange(fs, root, s, e)

    val rootLen = root.toUri.getPath.length + 1
    lazy val live: Map[String, BtrTableMeta.DataFileEntry] =
      BtrTableMeta.listDataFilesWithPartitions(fs, root)
        .map(en => en.path.toUri.getPath.substring(rootLen) -> en).toMap

    // inserts: live listing first (size-checked against the snapshot's
    // recorded length — a re-used name is NOT our file), store fallback
    // for files a commit after `e` already removed
    val inserts = r.added.addedRel.map { rel =>
      val expected = r.added.sizes.get(rel)
      val entry = live.get(rel).filter(en => expected.forall(_ == en.len))
        .orElse(graft.format.BtrRetention.resolveRemoved(fs, root, rel, expected))
        .getOrElse(throw new IllegalStateException(
          s"btr changes stream: file $rel of range ($s, $e] is no longer present " +
            s"under $root and not retained — history was physically truncated; " +
            "restart from a fresh checkpoint"))
      (entry, "insert", r.added.versionOf.getOrElse(rel, e))
    }
    val deletes = r.removedRels.map { rel =>
      val entry = graft.format.BtrRetention
        .resolveRemoved(fs, root, rel, r.removedSizes.get(rel))
        // a later RESTORE moved the incarnation back out of the store:
        // live (size-checked) IS the historical bytes
        .orElse(live.get(rel)
          .filter(en => r.removedSizes.get(rel).forall(_ == en.len))
          .filter(_ => BtrChanges.reAddedByRestore(fs, root, rel,
            r.removedAt.getOrElse(rel, e))))
        .getOrElse(throw new IllegalStateException(
          s"btr changes stream: range ($s, $e] crosses a removal of $rel but the " +
            s"file is physically gone — enable btr.retainRemoved on the table to " +
            "stream across DELETE/OPTIMIZE, or restart from a fresh checkpoint " +
            s"with a full read at v$e"))
      (rel, entry, r.removedAt.getOrElse(rel, e))
    }

    val fileActive = BtrScan.fileColActive(tableSchema)
    val colKinds = requiredSchema.fields.map { f =>
      if (BtrCdc.isCdcCol(f.name) || partCols.contains(f.name) ||
        (fileActive && f.name == BtrScan.FileMetaCol)) -1
      else dataSchema.fieldIndex(f.name)
    }
    val dataIdx = colKinds.filter(_ >= 0)

    // deletion-vector events: a blob add emits its masked rows as
    // deletes, a blob drop with a surviving target (RESTORE rewind) as
    // inserts — always minus the prior blobs' rows. And a removed MASKED
    // file's delete side serves survivors only, via its removal-time
    // mask blobs (resolved from the store alongside the file).
    def resolveBlob(rel: String, sizes: Map[String, Long]): String = {
      val livep = new Path(root, rel)
      if (fs.exists(livep)) livep.toString
      else graft.format.BtrRetention.resolveRemoved(fs, root, rel, sizes.get(rel))
        .map(_.path.toString).getOrElse(throw new IllegalStateException(
          s"btr changes stream: deletion vector $rel of range ($s, $e] is " +
            s"physically gone — enable btr.retainRemoved, or restart from a " +
            "fresh checkpoint"))
    }
    def targetEntry(rel: String, sizes: Map[String, Long]): BtrTableMeta.DataFileEntry =
      live.get(rel).filter(en => sizes.get(rel).forall(_ == en.len))
        .orElse(graft.format.BtrRetention.resolveRemoved(fs, root, rel, sizes.get(rel)))
        .getOrElse(throw new IllegalStateException(
          s"btr changes stream: deletion-vector target $rel of range ($s, $e] is no " +
            s"longer present under $root and not retained — history was physically " +
            "truncated; restart from a fresh checkpoint"))
    final case class Item(entry: BtrTableMeta.DataFileEntry, changeType: String,
      version: Long, dvBlobs: Array[String] = Array.empty,
      dvPrior: Array[String] = Array.empty, emitDeleted: Boolean = false)
    val dvItems: Seq[Item] =
      r.dvAdded.map(ev => Item(targetEntry(ev.targetRel, ev.sizes), "delete", ev.version,
        ev.blobRels.map(resolveBlob(_, ev.sizes)).toArray,
        ev.priorRels.map(resolveBlob(_, ev.sizes)).toArray, emitDeleted = true)) ++
      r.dvDropped.map(ev => Item(targetEntry(ev.targetRel, ev.sizes), "insert", ev.version,
        ev.blobRels.map(resolveBlob(_, ev.sizes)).toArray,
        ev.priorRels.map(resolveBlob(_, ev.sizes)).toArray, emitDeleted = true))
    val all: Seq[Item] =
      inserts.map { case (en, ct, v) => Item(en, ct, v) } ++
      deletes.map { case (rel, en, v) =>
        Item(en, "delete", v,
          r.maskRelsOfRemoved.getOrElse(rel, Nil)
            .map(resolveBlob(_, r.removedSizes)).toArray)
      } ++ dvItems
    val dir = new Path(path)
    val footers: Map[String, graft.format.BtrFile.Footer] =
      BtrFooters.readAllIndexed(fs, dir,
        all.map(_.entry).groupBy(_.path.toString).values.map(_.head).toArray)
        .map { case (en, fo) => en.path.toString -> fo }.toMap
    all.toArray.map { item =>
      val entry = item.entry
      val footer = footers(entry.path.toString)
      val changeType = item.changeType
      val version = item.version
      val reqPartValues: Array[String] = requiredSchema.fields.map { f =>
        if (f.name == BtrCdc.ChangeTypeCol) changeType
        else if (f.name == BtrCdc.CommitVersionCol) version.toString
        else if (fileActive && f.name == BtrScan.FileMetaCol) entry.path.toString
        else if (partCols.contains(f.name))
          entry.partitionValues.getOrElse(f.name, BtrTableMeta.NullPartition)
        else null
      }
      var ordinal = 0L
      val groups = footer.rowGroups.map { rg =>
        val base = ordinal
        ordinal += rg.numRows
        BtrChunkRange(rg.numRows,
          dataIdx.map(ci => if (ci < rg.columns.length) rg.columns(ci).offset else -1L),
          dataIdx.map(ci => if (ci < rg.columns.length) rg.columns(ci).length else 0),
          base)
      }
      val reqTags: Array[Int] = colKinds.map(ci => if (ci < 0) 0 else footer.tagOf(ci))
      BtrInputPartition(entry.path.toString, groups, reqPartValues, reqTags,
        dvBlobs = item.dvBlobs, fileLen = entry.len,
        dvEmitDeleted = item.emitDeleted, dvPriorBlobs = item.dvPrior): InputPartition
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new BtrReaderFactory(requiredSchema, fullStructs = BtrScan.fullStructsOf(tableSchema))

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

object BtrCdcMicroBatchStream {
  /** Offset = snapshot-log version consumed through (inclusive). */
  final case class VersionOffset(version: Long) extends Offset {
    override def json(): String = version.toString
  }
}
