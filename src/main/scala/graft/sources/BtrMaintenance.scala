package graft.sources

import graft.format.BtrTableMeta
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{LongType, StringType}

/** SQL maintenance statements for btr tables (registered by
  * [[graft.GraftExtensions]] via `injectParser` — the public
  * SparkSessionExtensions mechanism Delta/Iceberg use for their own
  * `OPTIMIZE`/`VACUUM` verbs):
  *
  *   OPTIMIZE graft.`/data/t`                      -- small-file compaction
  *   OPTIMIZE graft.`/data/t` FULL                 -- one file per partition dir (zero-sort SPJ layout)
  *   OPTIMIZE graft.`/data/t` CLUSTER BY (a, b)    -- range-clustered rewrite
  *   OPTIMIZE graft.`/data/t` ZORDER BY (a, b)     -- Morton-interleaved rewrite
  *   OPTIMIZE graft.`/data/t` APPLY PURGE          -- rewrite ONLY files whose
  *     deletion-vector masks exceed btr.dvPurgeThreshold (reclaim mask debt)
  *   VACUUM graft.`/data/t` [RETAIN 48 HOURS] [DRY RUN]
  *     -- ONE garbage entry point: converge pending swap journals, sweep
  *        orphaned hidden temps, expire retention-store files past the
  *        horizon, prune the snapshot log (DRY RUN lists, touches nothing)
  *
  * Table references resolve exactly like [[BtrCatalog]]: absolute paths
  * (backquoted) directly, relative names under the catalog's configured
  * `warehouse`. Everything else falls through to Spark's parser
  * untouched — no statement the stock parser accepts changes meaning.
  */
object BtrMaintenance {

  /** Resolve a multipart table identifier to the table directory, using
    * the session's BtrCatalog configuration (same rules as
    * BtrCatalog.pathOf, minus the metastore that doesn't exist).
    */
  def resolvePath(spark: SparkSession, parts: Seq[String]): String = {
    def abs(s: String) = s.startsWith("/") || s.contains("://")
    val (cat, rest) =
      if (parts.length > 1 && spark.conf
        .getOption(s"spark.sql.catalog.${parts.head}")
        .contains(classOf[BtrCatalog].getName)) (Some(parts.head), parts.tail)
      else (None, parts)
    val joined = rest.mkString("/")
    if (abs(joined)) joined
    else cat.flatMap(c => spark.conf.getOption(s"spark.sql.catalog.$c.warehouse")) match {
      case Some(w) => s"$w/$joined"
      case None => throw new IllegalArgumentException(
        s"btr OPTIMIZE/VACUUM: relative table name '$joined' requires a btr catalog " +
          "prefix with a configured warehouse (spark.sql.catalog.<name>.warehouse), " +
          "or an absolute backquoted path")
    }
  }
}

case class BtrOptimizeCommand(tableParts: Seq[String], mode: String, cols: Seq[String],
    where: Option[String] = None)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("files_before", LongType, nullable = false)(),
    AttributeReference("files_after", LongType, nullable = false)())

  /** `OPTIMIZE ... [CLUSTER/ZORDER BY (...)] WHERE <partition predicate>`:
    * the predicate evaluates once per file against its TYPED
    * partition-directory values (full Spark expression power — ranges,
    * IN, functions; see [[BtrCompact.partitionPredicateKeep]]) and only
    * matching partitions compact or rewrite. Partition-scoped maintenance
    * is what makes OPTIMIZE operable at 100 TB: cluster yesterday's hot
    * partitions on a schedule instead of rewriting a year of history.
    */
  override def run(spark: SparkSession): Seq[Row] = {
    val path = BtrMaintenance.resolvePath(spark, tableParts)
    val keep = where.map(BtrCompact.partitionPredicateKeep(spark, path, _)).getOrElse(
      (_: BtrTableMeta.DataFileEntry) => true)
    val (before, after) = mode match {
      case "COMPACT" => BtrCompact.compact(spark, path, keep = keep)
      case "FULL" => BtrCompact.compact(spark, path, Long.MaxValue, keep = keep)
      case "CLUSTER" =>
        require(cols.nonEmpty, "OPTIMIZE ... CLUSTER BY needs at least one column")
        BtrCompact.rewriteClustered(spark, path, cols, where = where)
      case "ZORDER" =>
        require(cols.nonEmpty, "OPTIMIZE ... ZORDER BY needs at least one column")
        BtrCompact.rewriteZOrdered(spark, path, cols, where = where)
      case "PURGE" => BtrCompact.purgeMasked(spark, path, where = where)
    }
    Seq(Row(path, before.toLong, after.toLong))
  }
}

/** `RESTORE [TABLE] t [TO] VERSION AS OF n` (or `TIMESTAMP AS OF 'ts'`,
  * resolved to the newest snapshot at-or-before the instant) — rewind to
  * a recorded snapshot by dropping the files later commits added (see
  * [[BtrLog.restore]]). `version < 0` carries a timestamp in millis.
  */
case class BtrRestoreCommand(tableParts: Seq[String], version: Long,
    tsMillis: Option[Long] = None)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("restored_version", LongType, nullable = false)(),
    AttributeReference("files_dropped", LongType, nullable = false)(),
    AttributeReference("files_kept", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val path = BtrMaintenance.resolvePath(spark, tableParts)
    val root = new Path(path)
    val fs = root.getFileSystem(BtrTableMeta.hadoopConf())
    val v = tsMillis match {
      case Some(ts) => BtrLog.versionAtOrBefore(fs, fs.makeQualified(root), ts)
      case None => version
    }
    require(v >= 1, s"btr RESTORE: no snapshot at or before the requested instant at $path")
    val (dropped, kept) = BtrLog.restore(fs, root, v)
    Seq(Row(path, v, dropped.toLong, kept.toLong))
  }
}

/** The ONE table-garbage entry point: everything a crash, a retention
  * policy, or normal operation can leave behind converges here.
  *
  *  1. swap-journal convergence — a crashed compaction/DELETE/rewrite's
  *     pending journal completes (sources remove, journal retires);
  *  2. orphaned hidden temps (`_tmp_*`, `_rl_*`) older than the horizon;
  *  3. retention-store expiry — removed-file entries past the horizon
  *     (history referencing them then genuinely ends, loudly);
  *  4. snapshot-log pruning beyond [[BtrLog.KeepEntries]] (kept back to
  *     the checkpoint the oldest retained version resolves through).
  *
  * [[plan]] is the DRY RUN: the items one [[run]] would touch, nothing
  * mutated (pending journals are listed, not converged).
  */
object BtrVacuum {
  final case class Item(action: String, item: String)

  def plan(fs: org.apache.hadoop.fs.FileSystem, rawRoot: Path, retentionMs: Long,
      dvLeaseMs: Long = BtrDvOps.InFlightLeaseMs): Seq[Item] = {
    val root = fs.makeQualified(rawRoot)
    val cutoff = System.currentTimeMillis() - retentionMs
    BtrTableMeta.readSwapJournals(fs, root)
      .map(j => Item("converge-journal", j._1.toString)) ++
      BtrTableMeta.listTemps(fs, root, retentionMs)
        .map(p => Item("remove-temp", p.toString)) ++
      listOrphanDvBlobs(fs, root, math.min(cutoff, System.currentTimeMillis() - dvLeaseMs))
        .map(p => Item("remove-orphan-dv", p.toString)) ++
      graft.format.BtrRetention.listExpired(fs, root, cutoff)
        .map(p => Item("expire-retained", p.toString)) ++
      BtrLog.listPrunable(fs, root).map(p => Item("prune-log", p.toString))
  }

  /** Deletion-vector blobs no retained log entry references (a crashed
    * DELETE's never-recorded blobs, or its task `.tmp-` leftovers),
    * aged past the horizon — removing them rolls the crashed commit
    * back; scans never applied them (blob discovery is log-resolved).
    * The cutoff callers pass is floored by the in-flight lease
    * independently of the user retention: with `RETAIN 0 HOURS` a
    * task-committed blob of a LIVE blob-only DELETE (driver about to
    * record it) must not be swept out from under the commit, or the
    * latest snapshot would reference physically missing blobs.
    */
  private def listOrphanDvBlobs(fs: org.apache.hadoop.fs.FileSystem, root: Path,
      cutoff: Long): Seq[Path] = {
    import graft.format.DeletionVector
    val dvDir = new Path(root, DeletionVector.DvDir)
    if (!fs.exists(dvDir)) return Nil
    lazy val referenced = BtrLog.referencedDvRels(fs, root)
    fs.listStatus(dvDir).toSeq.filter { st =>
      val name = st.getPath.getName
      st.isFile && st.getModificationTime < cutoff &&
        (name.startsWith(".tmp-") ||
          (name.endsWith(".dv") && !referenced(s"${DeletionVector.DvDir}/$name")))
    }.map(_.getPath)
  }

  /** Execute; returns (journals converged, temps removed, store entries
    * expired, log entries pruned).
    */
  def run(fs: org.apache.hadoop.fs.FileSystem, rawRoot: Path, retentionMs: Long,
      dvLeaseMs: Long = BtrDvOps.InFlightLeaseMs)
      : (Long, Long, Long, Long) = {
    val root = fs.makeQualified(rawRoot)
    // converge FIRST: journal completion can route doomed files into the
    // retention store, and the expiry pass right after applies the same
    // horizon to them
    val journals = BtrTableMeta.readSwapJournals(fs, root).length.toLong
    BtrTableMeta.completeSwapJournals(fs, root)
    BtrDvOps.convergePending(fs, root)
    val temps = BtrTableMeta.vacuumTemps(fs, root, retentionMs) +
      listOrphanDvBlobs(fs, root,
        System.currentTimeMillis() - math.max(retentionMs, dvLeaseMs))
        .count(p => fs.delete(p, false))
    // horizon includes the current millisecond (expire's bound is
    // strict): RETAIN 0 must expire entries the convergence pass above
    // moved into the store within this same ms
    val expired = graft.format.BtrRetention.expire(fs, root,
      System.currentTimeMillis() + 1 - retentionMs).toLong
    val pruned = BtrLog.pruneNow(fs, root).toLong
    (journals, temps, expired, pruned)
  }
}

case class BtrVacuumCommand(tableParts: Seq[String], retentionMs: Long,
    dryRun: Boolean = false)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    if (dryRun) Seq(
      AttributeReference("action", StringType, nullable = false)(),
      AttributeReference("item", StringType, nullable = false)())
    else Seq(
      AttributeReference("path", StringType, nullable = false)(),
      AttributeReference("files_removed", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val path = BtrMaintenance.resolvePath(spark, tableParts)
    val root = new Path(path)
    val fs = root.getFileSystem(BtrTableMeta.hadoopConf())
    if (dryRun) BtrVacuum.plan(fs, root, retentionMs).map(i => Row(i.action, i.item))
    else {
      val (journals, temps, expired, pruned) = BtrVacuum.run(fs, root, retentionMs)
      Seq(Row(path, journals + temps + expired + pruned))
    }
  }
}

/** Delegating parser: intercepts the two btr maintenance verbs, hands
  * every other statement to Spark's own parser verbatim.
  */
class BtrSparkSqlParser(delegate: ParserInterface) extends ParserInterface {
  private val OptimizeRe =
    """(?is)^\s*OPTIMIZE\s+(.+?)(?:\s+(FULL))?(?:\s+(ZORDER|CLUSTER)\s+BY\s*\(([^)]*)\))?(?:\s+APPLY\s+\(?\s*(PURGE)\s*\)?)?(?:\s+WHERE\s+(.+?))?\s*;?\s*$""".r
  private val VacuumRe =
    """(?is)^\s*VACUUM\s+(.+?)(?:\s+RETAIN\s+(\d+)\s+HOURS)?(?:\s+(DRY\s+RUN))?\s*;?\s*$""".r
  private val RestoreRe =
    """(?is)^\s*RESTORE\s+(?:TABLE\s+)?(.+?)\s+(?:TO\s+)?VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*$""".r
  private val RestoreTsRe =
    """(?is)^\s*RESTORE\s+(?:TABLE\s+)?(.+?)\s+(?:TO\s+)?TIMESTAMP\s+AS\s+OF\s+'([^']+)'\s*;?\s*$""".r
  // IVF index lifecycle verbs (EXPLAIN-safe: LeafRunnableCommands, the
  // action runs at run(), never at resolution — see BtrIvfCommands)
  private val IvfBuildRe =
    """(?is)^\s*IVF\s+BUILD\s+INDEX\s+'([^']+)'\s+FROM\s+(.+?)\s*\(\s*([^,()\s]+)\s*,\s*([^,()\s]+)\s*\)(?:\s+NLIST\s+(\d+))?(?:\s+STORAGE\s+'(f64|f32|i8)')?\s*;?\s*$""".r
  private val IvfRefreshRe =
    """(?is)^\s*IVF\s+REFRESH\s+INDEX\s+'([^']+)'\s+FROM\s+(.+?)\s*\(\s*([^,()\s]+)\s*,\s*([^,()\s]+)\s*\)\s+APP\s+'([^']+)'\s+VERSIONS\s+(\d+)(?:\s+TO\s+(\d+))?\s*;?\s*$""".r
  private val IvfRebuildRe =
    """(?is)^\s*IVF\s+REBUILD\s+INDEX\s+'([^']+)'\s+FROM\s+(.+?)\s*\(\s*([^,()\s]+)\s*,\s*([^,()\s]+)\s*\)(?:\s+IF\s+DRIFT\s+BELOW\s+(\d+))?\s*;?\s*$""".r
  private val IvfVacuumRe =
    """(?is)^\s*IVF\s+VACUUM\s+INDEX\s+'([^']+)'(?:\s+KEEP\s+(\d+))?\s*;?\s*$""".r
  // EXPLAIN of a custom verb: Spark's parser owns EXPLAIN, so a custom
  // statement inside it never reaches this delegate — intercept the
  // prefix and wrap the verb in ExplainCommand ourselves (the command
  // plans but does NOT run; that non-execution is the verbs' point)
  // optional mode keywords accepted and mapped to the matching
  // ExplainMode (EXTENDED/CODEGEN/COST/FORMATTED, like Spark's grammar)
  private val ExplainVerbRe =
    """(?is)^\s*EXPLAIN(?:\s+(EXTENDED|CODEGEN|COST|FORMATTED))?\s+((?:IVF|OPTIMIZE|VACUUM|RESTORE)\s+.+)$""".r

  private def stripQuotes(s: String): String = {
    val t = s.trim
    if (t.length >= 2 && t.startsWith("`") && t.endsWith("`")) t.substring(1, t.length - 1)
    else t
  }

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case ExplainVerbRe(mode, inner) =>
      val m = Option(mode).map(_.toUpperCase(java.util.Locale.ROOT)) match {
        case Some("EXTENDED") => org.apache.spark.sql.execution.ExtendedMode
        case Some("CODEGEN") => org.apache.spark.sql.execution.CodegenMode
        case Some("COST") => org.apache.spark.sql.execution.CostMode
        case Some("FORMATTED") => org.apache.spark.sql.execution.FormattedMode
        case _ => org.apache.spark.sql.execution.SimpleMode
      }
      org.apache.spark.sql.execution.command.ExplainCommand(parsePlan(inner), m)
    case OptimizeRe(ref, full, mode, cols, purge, where) =>
      require(purge == null || (full == null && mode == null),
        "btr OPTIMIZE: APPLY PURGE cannot combine with FULL/CLUSTER/ZORDER — " +
          "a clustered rewrite already folds every mask in")
      val m =
        if (purge != null) "PURGE"
        else if (mode != null) mode.toUpperCase(java.util.Locale.ROOT)
        else if (full != null) "FULL"
        else "COMPACT"
      BtrOptimizeCommand(
        delegate.parseMultipartIdentifier(ref.trim), m,
        Option(cols).toSeq.flatMap(_.split(',').map(stripQuotes)).filter(_.nonEmpty),
        where = Option(where).map(_.trim).filter(_.nonEmpty))
    case VacuumRe(ref, hours, dry) =>
      BtrVacuumCommand(
        delegate.parseMultipartIdentifier(ref.trim),
        Option(hours).map(_.toLong).getOrElse(24L) * 3600L * 1000L,
        dryRun = dry != null)
    case RestoreRe(ref, v) =>
      BtrRestoreCommand(delegate.parseMultipartIdentifier(ref.trim), v.toLong)
    case RestoreTsRe(ref, ts) =>
      // ISO instant or local date-time (UTC): the same forms time travel
      // accepts through btr.timestampAsOf
      val millis =
        try java.time.Instant.parse(ts.trim).toEpochMilli
        catch {
          case _: java.time.format.DateTimeParseException =>
            // bare local date-time reads as UTC — session-TZ independent,
            // like the partition-directory timestamp encoding
            java.time.LocalDateTime.parse(ts.trim.replace(' ', 'T'))
              .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
        }
      BtrRestoreCommand(delegate.parseMultipartIdentifier(ref.trim), -1L,
        tsMillis = Some(millis))
    case IvfBuildRe(idx, ref, idCol, vecCol, nlist, storage) =>
      BtrIvfBuildCommand(idx, delegate.parseMultipartIdentifier(ref.trim),
        stripQuotes(idCol), stripQuotes(vecCol),
        Option(nlist).map(_.toInt).getOrElse(16),
        Option(storage).map(_.toLowerCase(java.util.Locale.ROOT)).getOrElse("f64"))
    case IvfRefreshRe(idx, ref, idCol, vecCol, app, from, to) =>
      BtrIvfRefreshCommand(idx, delegate.parseMultipartIdentifier(ref.trim),
        stripQuotes(idCol), stripQuotes(vecCol), app, from.toLong,
        Option(to).map(_.toLong))
    case IvfRebuildRe(idx, ref, idCol, vecCol, pct) =>
      BtrIvfRebuildCommand(idx, delegate.parseMultipartIdentifier(ref.trim),
        stripQuotes(idCol), stripQuotes(vecCol), Option(pct).map(_.toInt))
    case IvfVacuumRe(idx, keep) =>
      BtrIvfVacuumCommand(idx, Option(keep).map(_.toInt).getOrElse(2))
    case _ => delegate.parsePlan(sqlText)
  }

  override def parseExpression(sqlText: String) = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String) = delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String) = delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String) = delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String) = delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String) = delegate.parseRoutineParam(sqlText)
  override def parseDataType(sqlText: String) = delegate.parseDataType(sqlText)
  override def parseTableSchema(sqlText: String) = delegate.parseTableSchema(sqlText)
}
