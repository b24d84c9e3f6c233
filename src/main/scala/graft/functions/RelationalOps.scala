package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operators Spark lacks natively, built as scalable plan
  * shapes over the DataFrame API (no UDFs, no driver loops).
  */
object RelationalOps {

  /** As-of join: for every left row, the single right row with the
    * greatest `rightTime` at or before the left row's `leftTime` within
    * the same `key` group (left-outer semantics: unmatched left rows keep
    * nulls) — DuckDB's `ASOF LEFT JOIN`, kdb's `aj`.
    *
    * Spark has no native ASOF JOIN, and the naive range self-join
    * (`l.t >= r.t` + max-per-left) explodes quadratically inside skewed
    * keys. The scalable shape is the union trick: tag both sides, shuffle
    * ONCE on the key, order each key group by (time, right-before-left),
    * and carry the most recent right row forward with
    * `last(_, ignoreNulls)` over an unbounded-preceding frame — linear
    * work per key group, one shuffle total, window and sort both
    * key-partitioned (no global funnel).
    *
    * Right rows with equal timestamps tie-break by their sort order in
    * `rightTieCols` (pass an id column to pin determinism). Right columns
    * surface prefixed `asof_`; right rows with a null time are dropped
    * (they can never satisfy `leftTime >= rightTime`, matching SQL ASOF).
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightTieCols: Seq[String] = Nil
  ): DataFrame = {
    val rightPayload = right.columns.filter(_ != key).toSeq
    val rStruct = struct(rightPayload.map(right(_)): _*)
    // __ord: rights sort before lefts at the same instant (>= semantics).
    // Tie columns keep their NATIVE types inside a struct (struct ordering
    // is field-wise) — casting to string would order numerics
    // lexicographically ("9" > "10") and diverge from SQL ASOF.
    val tie =
      if (rightTieCols.isEmpty) lit(0)
      else struct(rightTieCols.map(right(_)): _*)
    val rTagged = right
      // null keys never match in SQL ASOF (equality join semantics) —
      // without this filter the null-key window group would carry right
      // rows forward onto null-key left rows
      .filter(right(rightTime).isNotNull && right(key).isNotNull)
      .select(right(key).as("__k"), right(rightTime).as("__t"), lit(0).as("__ord"),
        tie.as("__tie"), rStruct.as("__r"), lit(null).cast("int").as("__lid"))
    val leftCols = left.columns.toSeq
    val lStruct = struct(leftCols.map(left(_)): _*)
    // left rows never tie with rights (__ord differs), so any
    // type-compatible placeholder works
    val lTagged = left
      .select(left(key).as("__k"), left(leftTime).as("__t"), lit(1).as("__ord"),
        lit(null).cast(rTagged.schema("__tie").dataType).as("__tie"),
        lit(null).cast(rTagged.schema("__r").dataType).as("__r"),
        lit(1).as("__lid"), lStruct.as("__l"))
    val unioned = rTagged.withColumn("__l", lit(null).cast(lTagged.schema("__l").dataType))
      .unionByName(lTagged)
    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__ord"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("__rlast", last(col("__r"), ignoreNulls = true).over(w))
    carried.filter(col("__lid").isNotNull)
      .select(
        leftCols.map(c => col(s"__l.$c").as(c)) ++
          rightPayload.map(c => col(s"__rlast.$c").as(s"asof_$c")): _*)
  }

  /** Gap-based sessionization: within each `key` group ordered by
    * `timeCol` (any numeric/orderable type), a new session starts when
    * the gap from the previous event exceeds `maxGap` (same units as the
    * time column). Adds `session_seq` (1-based per-key session index).
    * One shuffle on the key; both window passes reuse the same
    * partitioning.
    */
  def sessionize(events: DataFrame, key: String, timeCol: String, maxGap: Long): DataFrame = {
    val w = Window.partitionBy(key).orderBy(timeCol)
    val prev = lag(col(timeCol), 1).over(w)
    val isNew = when(prev.isNull || col(timeCol) - prev > maxGap, 1).otherwise(0)
    events.withColumn("session_seq",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("long"))
  }
}
