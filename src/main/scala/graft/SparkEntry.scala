package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query registry: core format/relational surface (CoreQueries, SURVEY.md
  * §2.7) + training-data pipeline operators (PipelineQueries). Every entry
  * with a DuckDB-expressible semantic also appears in [[oracleSql]] with
  * matching column aliases.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * revenue-per-nation over four btr-round-tripped tables.
    */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.queries("q_agg_join")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ PipelineQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    CoreQueries.oracleSql ++ PipelineQueries.oracleSql
}
