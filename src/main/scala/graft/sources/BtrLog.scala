package graft.sources

import graft.format.BtrTableMeta
import org.apache.hadoop.fs.{FileSystem, Path}

/** Snapshot log for time travel: every mutating commit (append,
  * overwrite, DELETE, row-level rewrite, OPTIMIZE, streaming-epoch
  * cadence, partition ops) records the table's VISIBLE file set as one
  * self-contained JSON entry under `_btr_log/` — `VERSION AS OF n` /
  * `TIMESTAMP AS OF t` reads then plan exactly that file set through the
  * scan's `onlyFiles` restriction.
  *
  * Design points, deliberately different from a Delta/Iceberg commit log:
  * the LISTING stays authoritative for current-state reads (the log is
  * never consulted on a normal scan, so a lost or absent log degrades
  * time travel, never correctness), every entry is a full snapshot (one
  * file read resolves any version — no delta replay), and entries are
  * pruned to the newest [[KeepEntries]] at record time so log storage is
  * bounded by construction. History ends where physical file lifetimes
  * end: OPTIMIZE/DELETE/VACUUM physically remove superseded files, and a
  * versioned read whose snapshot references a removed file fails LOUDLY
  * with the missing names — stale-but-plausible results are never
  * served. Versioned reads use the CURRENT table schema (files older
  * than a widening read added columns as null, like any scan).
  *
  * Concurrency: version numbers are claimed by no-clobber rename of a
  * temp entry; a racing committer simply retries at the next number.
  * Recording is best-effort-last in each commit path — the data commit
  * is already durable when the entry is written, so a crash between the
  * two costs one snapshot point, not table state.
  */
object BtrLog {
  val LogDir = "_btr_log"
  /** Newest entries kept; older ones are pruned at record time. */
  val KeepEntries = 64
  private val NameRe = "v(\\d{20})\\.json".r

  final case class Entry(version: Long, tsMillis: Long, action: String, files: Seq[String])

  private def nameOf(v: Long): String = f"v$v%020d.json"

  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private def unesc(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '"' => sb += '"'; i += 2
          case '\\' => sb += '\\'; i += 2
          case 'n' => sb += '\n'; i += 2
          case 'r' => sb += '\r'; i += 2
          case 't' => sb += '\t'; i += 2
          case 'u' if i + 5 < s.length =>
            sb += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar; i += 6
          case other => sb += other; i += 2
        }
      } else { sb += c; i += 1 }
    }
    sb.toString
  }

  /** Current visible file set as table-root-relative paths — the SAME
    * relativization the scan's `onlyFiles` filter applies, so a recorded
    * snapshot round-trips byte-exact into a planned file set.
    */
  private def currentFiles(fs: FileSystem, root: Path): Seq[String] = {
    val qualified = fs.makeQualified(root)
    val rootLen = qualified.toUri.getPath.length + 1
    BtrTableMeta.listDataFilesWithPartitions(fs, qualified)
      .map(e => e.path.toUri.getPath.substring(rootLen)).toSeq.sorted
  }

  /** Record the table's current visible state as the next version.
    * Call AFTER the mutation is fully committed. Never throws into the
    * caller's commit path for log-directory races — the claim loop
    * retries; genuine IO failures do propagate (the caller's data commit
    * is already durable, so Spark surfaces the error without undoing
    * data).
    */
  def record(fs: FileSystem, root: Path, action: String): Long = {
    val files = currentFiles(fs, root)
    val dir = new Path(root, LogDir)
    fs.mkdirs(dir)
    val ts = System.currentTimeMillis()
    val body = new StringBuilder()
      .append("{\"version\":0,\"ts\":").append(ts)
      .append(",\"action\":\"").append(esc(action)).append("\",\"files\":[")
    // version is patched per claim attempt below; keep the files block
    // built once (the expensive part for a many-file table)
    val filesJson = files.map(f => "\"" + esc(f) + "\"").mkString(",")
    body.append(filesJson).append("]}")
    var v = latestVersion(fs, root).getOrElse(0L) + 1
    var attempts = 0
    var claimed = -1L
    while (claimed < 0) {
      attempts += 1
      require(attempts <= 1000, s"btr log: could not claim a version at $root")
      val json = body.toString.replaceFirst("\\{\"version\":0,", s"{\"version\":$v,")
      val tmp = new Path(dir, s"_tmp_${java.util.UUID.randomUUID().toString.take(8)}")
      val out = fs.create(tmp, true)
      try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      val dst = new Path(dir, nameOf(v))
      if (!fs.exists(dst) && fs.rename(tmp, dst)) claimed = v
      else { fs.delete(tmp, false); v += 1 }
    }
    prune(fs, dir)
    claimed
  }

  private def prune(fs: FileSystem, dir: Path): Unit = {
    val vs = versions(fs, dir)
    if (vs.length > KeepEntries)
      vs.sorted.dropRight(KeepEntries).foreach(v => fs.delete(new Path(dir, nameOf(v)), false))
  }

  private def versions(fs: FileSystem, dir: Path): Seq[Long] = {
    if (!fs.exists(dir)) return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    val it = fs.listStatusIterator(dir)
    while (it.hasNext) {
      it.next().getPath.getName match {
        case NameRe(d) => out += d.toLong
        case _ => ()
      }
    }
    out.toSeq
  }

  def latestVersion(fs: FileSystem, root: Path): Option[Long] = {
    val vs = versions(fs, new Path(root, LogDir))
    if (vs.isEmpty) None else Some(vs.max)
  }

  def readEntry(fs: FileSystem, root: Path, version: Long): Entry = {
    val p = new Path(new Path(root, LogDir), nameOf(version))
    val st =
      try fs.getFileStatus(p)
      catch {
        case _: java.io.FileNotFoundException =>
          throw new IllegalArgumentException(
            s"btr: no snapshot v$version at $root — history holds " +
              s"${versions(fs, new Path(root, LogDir)).sorted.mkString("[", ",", "]")} " +
              s"(the newest $KeepEntries commits; older entries are pruned)")
      }
    val b = new Array[Byte](st.getLen.toInt)
    val in = fs.open(p)
    try in.readFully(0, b)
    finally in.close()
    parse(new String(b, java.nio.charset.StandardCharsets.UTF_8))
  }

  private[sources] def parse(json: String): Entry = {
    def longField(key: String): Long = {
      val k = "\"" + key + "\":"
      val i = json.indexOf(k)
      require(i >= 0, s"btr log: missing $key")
      var j = i + k.length
      val sb = new StringBuilder
      while (j < json.length && (json.charAt(j).isDigit || json.charAt(j) == '-')) {
        sb += json.charAt(j); j += 1
      }
      sb.toString.toLong
    }
    def strField(key: String): String = {
      val k = "\"" + key + "\":\""
      val i = json.indexOf(k)
      require(i >= 0, s"btr log: missing $key")
      var j = i + k.length
      val sb = new StringBuilder
      while (j < json.length && json.charAt(j) != '"') {
        if (json.charAt(j) == '\\' && j + 1 < json.length) { sb += json.charAt(j); j += 1 }
        sb += json.charAt(j); j += 1
      }
      unesc(sb.toString)
    }
    val fKey = "\"files\":["
    val fi = json.indexOf(fKey)
    require(fi >= 0, "btr log: missing files")
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = fi + fKey.length
    var inStr = false
    val sb = new StringBuilder
    var done = false
    while (!done && i < json.length) {
      val c = json.charAt(i)
      if (inStr) {
        if (c == '\\' && i + 1 < json.length) { sb += c; sb += json.charAt(i + 1); i += 2 }
        else if (c == '"') { out += unesc(sb.toString); sb.clear(); inStr = false; i += 1 }
        else { sb += c; i += 1 }
      } else c match {
        case '"' => inStr = true; i += 1
        case ']' => done = true
        case _ => i += 1
      }
    }
    Entry(longField("version"), longField("ts"), strField("action"), out.toSeq)
  }

  /** Resolve a read's pinned snapshot: exact version, or the newest
    * entry at-or-before the timestamp (microseconds, Spark's
    * TIMESTAMP AS OF unit).
    */
  def resolve(fs: FileSystem, root: Path,
      versionAsOf: Option[Long], timestampAsOfMicros: Option[Long]): Entry = {
    require(versionAsOf.isEmpty || timestampAsOfMicros.isEmpty,
      "btr: specify either a version or a timestamp to travel to, not both")
    versionAsOf match {
      case Some(v) => readEntry(fs, root, v)
      case None =>
        val tsMillis = timestampAsOfMicros.get / 1000L
        val vs = versions(fs, new Path(root, LogDir)).sorted
        require(vs.nonEmpty, s"btr: no snapshot log at $root — time travel needs " +
          "commits made by a log-aware writer")
        val hit = vs.reverse.view.map(readEntry(fs, root, _)).find(_.tsMillis <= tsMillis)
        hit.getOrElse(throw new IllegalArgumentException(
          s"btr: no snapshot at or before timestamp ${tsMillis}ms at $root " +
            s"(oldest retained: v${vs.min})"))
    }
  }

  /** Full retained history, newest first (for the `btr_history` TVF). */
  def history(fs: FileSystem, root: Path): Seq[Entry] =
    versions(fs, new Path(root, LogDir)).sorted.reverse.map(readEntry(fs, root, _))

  /** RESTORE the table to snapshot `version`: drop every visible data
    * file the snapshot doesn't reference — a metadata-only undo of
    * appends / streaming epochs (the "bad load this morning" case), no
    * data I/O. Refuses loudly when the snapshot references files a later
    * OPTIMIZE/DELETE/overwrite physically removed: only commits that
    * ADDED files can be rewound. Crash-safe through the same
    * delete-intent journal as DELETE (the doomed set hides atomically;
    * a crash mid-loop converges on the next table operation). Returns
    * (filesDropped, filesKept).
    */
  def restore(fs: FileSystem, rawRoot: Path, version: Long): (Int, Int) = {
    val root = fs.makeQualified(rawRoot)
    BtrTableMeta.completeSwapJournals(fs, root)
    val entry = readEntry(fs, root, version)
    val want = entry.files.toSet
    val rootLen = root.toUri.getPath.length + 1
    val live = BtrTableMeta.listDataFilesWithPartitions(fs, root)
      .map(e => e.path.toUri.getPath.substring(rootLen))
    val liveSet = live.toSet
    val missing = (want -- liveSet).toSeq.sorted
    // retained tables can rewind PAST removals: missing snapshot files
    // move back out of the _btr_removed store (the reverse rename of
    // their removal — still zero data I/O)
    val resurrectable = missing.flatMap(rel =>
      graft.format.BtrRetention.resolveRemoved(fs, root, rel).map(rel -> _))
    val gone = missing.toSet -- resurrectable.map(_._1).toSet
    require(gone.isEmpty,
      s"btr: cannot restore $root to v$version — ${gone.size} referenced " +
        s"file(s) no longer exist (e.g. ${gone.toSeq.sorted.take(3).mkString(", ")}); " +
        "only commits whose removed files were retained (btr.retainRemoved) " +
        "or that merely ADDED files (appends, epochs) can be rewound")
    val toDrop = live.filterNot(want.contains).sorted
    if (toDrop.nonEmpty || resurrectable.nonEmpty) {
      // ONE journal group flips the whole restore atomically for
      // readers: resurrected files stay hidden until all present, the
      // dropped set hides the moment they are (convergence completes
      // either direction; a rolled-back resurrection returns to the
      // store via the retention-routed rollback)
      BtrTableMeta.writeSwapJournal(fs, root, s"nm-restore-${BtrWriteIds.newWriteId()}",
        Seq(BtrTableMeta.SwapGroup("", resurrectable.map(_._1), toDrop.toSeq)))
      resurrectable.foreach { case (rel, e) =>
        val dst = new Path(root, rel)
        fs.mkdirs(dst.getParent)
        if (!fs.rename(e.path, dst) && !fs.exists(dst))
          throw new java.io.IOException(s"btr restore: cannot move $rel back from the " +
            "removed store")
      }
      val retain = BtrTableMeta.readRetainRemoved(fs, root)
      toDrop.foreach(f => graft.format.BtrRetention.removeDataFile(fs, root, f, retain))
      BtrTableMeta.completeSwapJournals(fs, root)
      // write-time ingest stats describe the pre-restore table — drop
      // the advisory sidecar like DELETE does
      fs.delete(new Path(root, BtrTableMeta.StatsFile), false)
    }
    BtrDelete.deleteEmptyPartitionDirs(fs, root)
    BtrFooters.refreshIndex(fs, root)
    record(fs, root, "restore")
    (toDrop.length, want.size)
  }
}
