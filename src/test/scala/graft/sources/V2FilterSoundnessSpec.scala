package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.expressions.{Expressions, GeneralScalarExpression, Expression => V2Expr}
import org.apache.spark.sql.connector.expressions.filter.{And => V2And, Not => V2Not, Or => V2Or, Predicate}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._
import org.scalatest.funsuite.AnyFunSuite

/** V2→V1 predicate translation soundness FOR PRUNING (the round-15
  * wrong-results find): Spark's own `PredicateUtils.toV1` partially
  * translates disjunctions — `toV1(Or(x % 10 = 0, x = 5))` returns
  * `EqualTo(x,5)` — which is fine for callers that re-apply the
  * predicate but, used as a chunk-skip/partition-prune filter, silently
  * drops every row matching only the untranslatable side. A plain
  * `WHERE x % 10 = 0 OR x = 5` scan returned 9 of 31 rows, and a
  * row-level DELETE with that predicate (whose runtime group filter
  * runs the same scan) deleted only the rows co-located with x = 5.
  * [[BtrV2Filters]] now translates compounds itself with exactness
  * tracking: AND may keep a translatable subset (superset — sound),
  * OR requires both sides, NOT requires an exact child.
  */
class V2FilterSoundnessSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("v2-filter-soundness-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val x: V2Expr = Expressions.column("x")
  private def lit(v: Long): V2Expr = Expressions.literal(v)
  private val modPred = // (x % 10) = 0 — no V1 Filter equivalent
    new Predicate("=", Array[V2Expr](new GeneralScalarExpression("%", Array(x, lit(10L))), lit(0L)))
  private val eq5 = new Predicate("=", Array[V2Expr](x, lit(5L)))
  private val eq7 = new Predicate("=", Array[V2Expr](x, lit(7L)))

  test("translation: OR requires both sides; AND keeps a superset; NOT needs exact") {
    // the unsound shape Spark's PredicateUtils.toV1 mis-translates
    assert(BtrV2Filters.toV1(new V2Or(modPred, eq5)).isEmpty,
      "a disjunction with an untranslatable side must NOT produce a skip filter")
    assert(BtrV2Filters.toV1(new V2Or(eq5, modPred)).isEmpty)
    // both sides translatable: exact Or survives
    assert(BtrV2Filters.toV1(new V2Or(eq5, eq7))
      .contains(Or(EqualTo("x", 5L), EqualTo("x", 7L))))
    // AND: dropping the untranslatable conjunct is a sound superset
    assert(BtrV2Filters.toV1(new V2And(modPred, eq5)).contains(EqualTo("x", 5L)))
    assert(BtrV2Filters.toV1(new V2And(eq5, modPred)).contains(EqualTo("x", 5L)))
    // NOT of an exact child is exact; NOT of a partial AND must refuse
    // (negating a superset gives a subset — the unsound direction)
    assert(BtrV2Filters.toV1(new V2Not(eq5)).contains(Not(EqualTo("x", 5L))))
    assert(BtrV2Filters.toV1(new V2Not(new V2And(modPred, eq5))).isEmpty)
    assert(BtrV2Filters.toV1(new V2Not(new V2Or(modPred, eq5))).isEmpty)
    // OR over a partial AND is still a superset → kept, inexact inside
    assert(BtrV2Filters.toV1(new V2Or(new V2And(modPred, eq5), eq7))
      .contains(Or(EqualTo("x", 5L), EqualTo("x", 7L))))
    // but NOT over that inexact OR must refuse
    assert(BtrV2Filters.toV1(
      new V2Not(new V2Or(new V2And(modPred, eq5), eq7))).isEmpty)
  }

  test("scan with Or(untranslatable, equality) returns every matching row") {
    val d = "/tmp/btr-v2filter-spec/scan"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
    (0L until 300L).toDF("x").write.format("btr").mode("overwrite").save(d)
    val t = spark.read.format("btr").load(d)
    val got = t.filter(expr("x % 10 = 0 OR x = 5")).select("x")
      .as[Long].collect().sorted.toSeq
    val want = (0L until 300L).filter(i => i % 10 == 0 || i == 5)
    assert(got == want, s"OR filter dropped rows: got ${got.length}, want ${want.length}")
    // the unsound half-translation must no longer appear as a pushed skip
    val plan = t.filter(expr("x % 10 = 0 OR x = 5")).queryExecution.executedPlan.toString
    assert(!plan.contains("chunk-skip filters: [EqualTo(x,5)]"), plan)
    // sanity: a fully-translatable Or still prunes (pushed, same rows)
    val both = t.filter(expr("x = 5 OR x = 250")).select("x").as[Long].collect().sorted.toSeq
    assert(both == Seq(5L, 250L))
  }

  test("UPDATE with Or(untranslatable, equality) updates every matching row") {
    val d = "/tmp/btr-v2filter-spec/update"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
    (0L until 300L).map(i => (i, 0L)).toDF("x", "y")
      .write.format("btr").mode("overwrite").save(d)
    spark.conf.set("spark.sql.catalog.graft", classOf[BtrCatalog].getName)
    spark.sql(s"UPDATE graft.`$d` SET y = 1 WHERE x % 10 = 0 OR x = 5")
    val updated = spark.read.format("btr").load(d).filter(col("y") === 1)
      .select("x").as[Long].collect().sorted.toSeq
    val want = (0L until 300L).filter(i => i % 10 == 0 || i == 5)
    assert(updated == want,
      s"UPDATE narrowed by the equality disjunct: ${updated.length} rows, want ${want.length}")
  }

  test("row-level DELETE with Or(untranslatable, equality) deletes every matching row") {
    val d = "/tmp/btr-v2filter-spec/delete"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
    (0L until 300L).toDF("x").write.format("btr").mode("overwrite").save(d)
    spark.conf.set("spark.sql.catalog.graft", classOf[BtrCatalog].getName)
    spark.sql(s"DELETE FROM graft.`$d` WHERE x % 10 = 0 OR x = 5")
    val left = spark.read.format("btr").load(d).select("x").as[Long].collect().sorted.toSeq
    val want = (0L until 300L).filterNot(i => i % 10 == 0 || i == 5)
    assert(left == want,
      s"DELETE narrowed by the equality disjunct: ${left.length} rows left, want ${want.length}")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File("/tmp/btr-v2filter-spec"))
  }
}
