package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Shared action layer for the IVF index lifecycle's two SQL surfaces:
  * the TVFs in [[graft.GraftExtensions]] (convenient, but resolution IS
  * execution — an EXPLAIN re-runs the action) and the parser VERBS in
  * [[graft.sources.BtrIvfCommands]] (LeafRunnableCommands executing at
  * `run()`, so EXPLAIN/DESCRIBE/view re-resolution never re-execute —
  * the recommended home for automation). One implementation, two
  * front-ends: the semantics cannot drift.
  */
object IvfMaintenance {

  def corpusDf(spark: SparkSession, tableDir: String, idCol: String, vecCol: String,
      versionAsOf: Option[Long]): DataFrame = {
    val r0 = spark.read.format("btr")
    val r = versionAsOf.fold(r0)(v => r0.option("btr.versionAsOf", v.toString))
    r.load(tableDir).select(col(idCol).as("cid"), col(vecCol).as("cvec"))
  }

  def latestVersionOf(tableDir: String): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(tableDir)
    val fs = p.getFileSystem(graft.format.BtrTableMeta.hadoopConf())
    graft.sources.BtrLog.latestVersion(fs, fs.makeQualified(p))
  }

  /** Build over the table's CURRENT snapshot; records the corpus version
    * for refresh convergence. Returns (buildVersion, corpusVersion|-1).
    */
  def build(spark: SparkSession, table: String, idCol: String, vecCol: String,
      idxDir: String, nlist: Int, storage: String = "f64"): (Long, Long) = {
    val v = latestVersionOf(table)
    SimilarityOps.ivfIndexBuild(corpusDf(spark, table, idCol, vecCol, v), idxDir,
      nlist = nlist, corpusVersion = v, vectorStorage = storage)
    val st = SimilarityOps.ivfIndexState(idxDir)
    (st.buildVersion, st.corpusVersion.getOrElse(-1L))
  }

  /** Apply the table's change feed (from, to] under (appId, to) txn
    * identity. Returns (rowsAssigned, rowsDeleted, drift, replayed).
    */
  def refresh(spark: SparkSession, table: String, idCol: String, vecCol: String,
      idxDir: String, appId: String, from: Long, toOpt: Option[Long])
      : (Long, Long, Double, Boolean) = {
    val to: Long = toOpt.getOrElse(latestVersionOf(table).getOrElse(
      throw new IllegalArgumentException(s"ivf refresh: no snapshot log at $table")))
    val feed = graft.sources.BtrChanges.between(spark, table, from, to)
      .select(col(idCol).as("cid"), col(vecCol).as("cvec"),
        col("_change_type"), col("_commit_version"))
    val st = SimilarityOps.ivfIndexRefresh(feed, idxDir,
      txnAppId = Some(appId), txnVersion = Some(to))
    (st.rowsAssigned, st.rowsDeleted, st.drift, st.replayed)
  }

  /** Unconditional rebuild that PRESERVES the current build's layout
    * (storeVectors, f64/f32/i8 storage, nlist) — the REBUILD verb must
    * not silently downgrade a quantized index to the BUILD defaults.
    * Returns (buildVersion, corpusVersion|-1).
    */
  def rebuild(spark: SparkSession, table: String, idCol: String, vecCol: String,
      idxDir: String): (Long, Long) = {
    val (store, storage, nlist) = SimilarityOps.ivfIndexLayoutOf(spark, idxDir)
    val v = latestVersionOf(table)
    SimilarityOps.ivfIndexBuild(corpusDf(spark, table, idCol, vecCol, v), idxDir,
      nlist = nlist, corpusVersion = v, storeVectors = store, vectorStorage = storage)
    val st = SimilarityOps.ivfIndexState(idxDir)
    (st.buildVersion, st.corpusVersion.getOrElse(-1L))
  }

  /** Probe drift and rebuild below minDriftPct/100; the rebuild inherits
    * the current build's layout and cell count. Returns
    * (rebuilt, drift, buildVersion).
    */
  def rebuildIfDrifted(spark: SparkSession, table: String, idCol: String, vecCol: String,
      idxDir: String, minDriftPct: Int): (Boolean, Double, Long) = {
    val v = latestVersionOf(table)
    val (rebuilt, drift) = SimilarityOps.ivfIndexRebuildIfDrifted(
      corpusDf(spark, table, idCol, vecCol, v), idxDir,
      minDrift = minDriftPct / 100.0, corpusVersion = v)
    (rebuilt, drift, SimilarityOps.ivfIndexState(idxDir).buildVersion)
  }

  def vacuum(idxDir: String, keepLast: Int): Int =
    SimilarityOps.ivfIndexVacuum(idxDir, keepLast)
}
