package graft.functions

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** Scale-safe run-length statistics (the RLE-gate statistic the reference
  * tracks per column, stats/NumberStats.hpp:100-125): instead of a global
  * `Window.orderBy` — which funnels the whole table through ONE task —
  * range-repartition on the order key, count value transitions inside each
  * sorted partition, and fix up the partition boundaries from the
  * per-partition (first, last) summaries. Driver-side data is one row per
  * partition (bounded by cluster parallelism, never by table size).
  */
object RunStats {

  final case class PartRuns(pid: Int, first: String, last: String, cnt: Long, trans: Long)

  /** One-row DataFrame `avg_run` = rows / (1 + transitions) over the table
    * ordered by orderCols, rounded to 4 places. A transition is counted
    * when two consecutive non-null values differ (null never counts —
    * matching `lag`-based SQL where NULL comparisons drop out).
    */
  def avgRunLength(df: DataFrame, valueCol: Column, orderCols: Seq[Column]): DataFrame = {
    val spark = df.sparkSession
    val nParts = spark.sessionState.conf.numShufflePartitions
    val sorted = df
      .select((valueCol.cast("string").as("__v") +: orderCols): _*)
      .repartitionByRange(nParts, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)

    val summaries = sorted.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val pid = TaskContext.getPartitionId()
        var first: String = null
        var firstSet = false
        var prev: String = null
        var prevSet = false
        var cnt = 0L
        var trans = 0L
        while (it.hasNext) {
          val r = it.next()
          val v = if (r.isNullAt(0)) null else r.getString(0)
          if (!firstSet) { first = v; firstSet = true }
          if (prevSet && prev != null && v != null && prev != v) trans += 1
          prev = v
          prevSet = true
          cnt += 1
        }
        Iterator.single(PartRuns(pid, first, prev, cnt, trans))
      }
    }(Encoders.product[PartRuns])

    // bounded: one summary per partition; combine on the driver
    val parts = summaries.collect().sortBy(_.pid)
    var cnt = 0L
    var trans = 0L
    var i = 0
    while (i < parts.length) {
      cnt += parts(i).cnt
      trans += parts(i).trans
      if (i > 0) {
        val a = parts(i - 1).last
        val b = parts(i).first
        if (a != null && b != null && a != b) trans += 1
      }
      i += 1
    }
    val avg = if (cnt == 0) 0.0 else cnt.toDouble / (1 + trans)
    resultDf(spark, BigDecimal(avg).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  private def resultDf(spark: SparkSession, avg: Double): DataFrame = {
    import spark.implicits._
    Seq(avg).toDF("avg_run")
  }
}
