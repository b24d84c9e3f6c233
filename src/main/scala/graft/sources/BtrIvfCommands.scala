package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{BooleanType, DoubleType, LongType}

/** IVF index lifecycle as SQL VERBS (the EXPLAIN-safe surface): unlike
  * the `ivf_index_*` TVFs — whose action runs at statement RESOLUTION,
  * so EXPLAIN/DESCRIBE/views re-execute it — these are
  * `LeafRunnableCommand`s executing at `run()`: `EXPLAIN IVF BUILD ...`
  * shows the plan and builds NOTHING. Registered through the same
  * delegating parser as OPTIMIZE/VACUUM:
  *
  *   IVF BUILD INDEX '/idx' FROM graft.`/t` (vec_id, embedding)
  *       [NLIST 16] [STORAGE 'f64'|'f32'|'i8']
  *   IVF REFRESH INDEX '/idx' FROM graft.`/t` (vec_id, embedding)
  *       APP 'consumer' VERSIONS 3 [TO 7]       -- feed (3, 7], txn (APP, 7]
  *   IVF REBUILD INDEX '/idx' FROM graft.`/t` (vec_id, embedding)
  *       [IF DRIFT BELOW 80]                    -- percent of build-time quality
  *   IVF VACUUM INDEX '/idx' [KEEP 2]
  *
  * Table references resolve like OPTIMIZE/VACUUM (absolute backquoted
  * path or catalog-relative); the index directory is a plain quoted
  * string (it is a directory, not a catalog table). Action bodies are
  * shared with the TVFs through [[graft.functions.IvfMaintenance]].
  */
case class BtrIvfBuildCommand(idxDir: String, tableParts: Seq[String],
    idCol: String, vecCol: String, nlist: Int, storage: String = "f64")
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("build_version", LongType, nullable = false)(),
    AttributeReference("corpus_version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val table = BtrMaintenance.resolvePath(spark, tableParts)
    val (bv, cv) = graft.functions.IvfMaintenance.build(
      spark, table, idCol, vecCol, idxDir, nlist, storage)
    Seq(Row(bv, cv))
  }
}

case class BtrIvfRefreshCommand(idxDir: String, tableParts: Seq[String],
    idCol: String, vecCol: String, appId: String, from: Long, to: Option[Long])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("rows_assigned", LongType, nullable = false)(),
    AttributeReference("rows_deleted", LongType, nullable = false)(),
    AttributeReference("drift", DoubleType, nullable = false)(),
    AttributeReference("replayed", BooleanType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val table = BtrMaintenance.resolvePath(spark, tableParts)
    val (a, d, drift, replayed) = graft.functions.IvfMaintenance.refresh(
      spark, table, idCol, vecCol, idxDir, appId, from, to)
    Seq(Row(a, d, drift, replayed))
  }
}

case class BtrIvfRebuildCommand(idxDir: String, tableParts: Seq[String],
    idCol: String, vecCol: String, minDriftPct: Option[Int])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("rebuilt", BooleanType, nullable = false)(),
    AttributeReference("drift", DoubleType, nullable = false)(),
    AttributeReference("build_version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val table = BtrMaintenance.resolvePath(spark, tableParts)
    val (rebuilt, drift, bv) = minDriftPct match {
      case Some(p) => graft.functions.IvfMaintenance.rebuildIfDrifted(
        spark, table, idCol, vecCol, idxDir, p)
      case None => // unconditional rebuild — inherits the build's layout
        val (b, c) = graft.functions.IvfMaintenance.rebuild(
          spark, table, idCol, vecCol, idxDir)
        val _ = c
        (true, 1.0, b)
    }
    Seq(Row(rebuilt, drift, bv))
  }
}

case class BtrIvfVacuumCommand(idxDir: String, keepLast: Int) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("dropped_dirs", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(graft.functions.IvfMaintenance.vacuum(idxDir, keepLast).toLong))
}
