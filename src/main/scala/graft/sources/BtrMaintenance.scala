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
  *   VACUUM graft.`/data/t` [RETAIN 48 HOURS]      -- sweep orphaned hidden temps
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

case class BtrOptimizeCommand(tableParts: Seq[String], mode: String, cols: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("files_before", LongType, nullable = false)(),
    AttributeReference("files_after", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val path = BtrMaintenance.resolvePath(spark, tableParts)
    val (before, after) = mode match {
      case "COMPACT" => BtrCompact.compact(spark, path)
      case "FULL" => BtrCompact.optimizePartitioned(spark, path)
      case "CLUSTER" =>
        require(cols.nonEmpty, "OPTIMIZE ... CLUSTER BY needs at least one column")
        BtrCompact.rewriteClustered(spark, path, cols)
      case "ZORDER" =>
        require(cols.nonEmpty, "OPTIMIZE ... ZORDER BY needs at least one column")
        BtrCompact.rewriteZOrdered(spark, path, cols)
    }
    Seq(Row(path, before.toLong, after.toLong))
  }
}

/** `RESTORE [TABLE] t [TO] VERSION AS OF n` — rewind to a recorded
  * snapshot by dropping the files later commits added (see
  * [[BtrLog.restore]]).
  */
case class BtrRestoreCommand(tableParts: Seq[String], version: Long)
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
    val (dropped, kept) = BtrLog.restore(fs, root, version)
    Seq(Row(path, version, dropped.toLong, kept.toLong))
  }
}

case class BtrVacuumCommand(tableParts: Seq[String], retentionMs: Long)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("files_removed", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val path = BtrMaintenance.resolvePath(spark, tableParts)
    val root = new Path(path)
    val fs = root.getFileSystem(BtrTableMeta.hadoopConf())
    val removed = BtrTableMeta.vacuumTemps(fs, root, retentionMs)
    // retention store: expire removed-file entries past the horizon —
    // history referencing them then genuinely ends (loud errors, never
    // silently-partial snapshots)
    val expired = graft.format.BtrRetention.expire(fs, fs.makeQualified(root),
      System.currentTimeMillis() - retentionMs)
    Seq(Row(path, removed + expired))
  }
}

/** Delegating parser: intercepts the two btr maintenance verbs, hands
  * every other statement to Spark's own parser verbatim.
  */
class BtrSparkSqlParser(delegate: ParserInterface) extends ParserInterface {
  private val OptimizeRe =
    """(?is)^\s*OPTIMIZE\s+(.+?)(?:\s+(FULL))?(?:\s+(ZORDER|CLUSTER)\s+BY\s*\(([^)]*)\))?\s*;?\s*$""".r
  private val VacuumRe =
    """(?is)^\s*VACUUM\s+(.+?)(?:\s+RETAIN\s+(\d+)\s+HOURS)?\s*;?\s*$""".r
  private val RestoreRe =
    """(?is)^\s*RESTORE\s+(?:TABLE\s+)?(.+?)\s+(?:TO\s+)?VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*$""".r

  private def stripQuotes(s: String): String = {
    val t = s.trim
    if (t.length >= 2 && t.startsWith("`") && t.endsWith("`")) t.substring(1, t.length - 1)
    else t
  }

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case OptimizeRe(ref, full, mode, cols) =>
      val m =
        if (mode != null) mode.toUpperCase(java.util.Locale.ROOT)
        else if (full != null) "FULL"
        else "COMPACT"
      BtrOptimizeCommand(
        delegate.parseMultipartIdentifier(ref.trim), m,
        Option(cols).toSeq.flatMap(_.split(',').map(stripQuotes)).filter(_.nonEmpty))
    case VacuumRe(ref, hours) =>
      BtrVacuumCommand(
        delegate.parseMultipartIdentifier(ref.trim),
        Option(hours).map(_.toLong).getOrElse(24L) * 3600L * 1000L)
    case RestoreRe(ref, v) =>
      BtrRestoreCommand(delegate.parseMultipartIdentifier(ref.trim), v.toLong)
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
