package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the events table: watermarked
  * windowed aggregation and custom stateful processing — the streaming
  * capabilities a training-data ingestion pipeline needs (the reference
  * format is batch-only; streams compose on top of the same engine).
  */
object EventsStreaming {

  /** The events parquet schema as read with nanos-as-long. */
  val eventsSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("props", org.apache.spark.sql.types.StringType)
    ))

  /** File-based event stream from a directory of parquet files. */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(eventsSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .withColumn("ts_t", timestamp_micros((col("ts") / 1000).cast("long")))
  }

  /** Watermarked tumbling-window aggregation per event type. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts_t", "1 hour")
      .groupBy(window(col("ts_t"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_v"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:00").as("hour_s"),
        col("event_type"), col("n"), col("sum_v"))

  /** Streaming deduplication by event id, state-bounded by a watermark:
    * duplicates arriving within the watermark horizon are dropped exactly;
    * state for ids older than the horizon is evicted (at 100 TB/day the
    * dedup state must be bounded by TIME, not by the full id universe —
    * `dropDuplicatesWithinWatermark` is the Spark-native contract for
    * exactly that).
    */
  def dedupEvents(events: DataFrame, horizon: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts_t", horizon)
      .dropDuplicatesWithinWatermark("event_id")

  /** Per-user running totals via mapGroupsWithState (custom state). */
  final case class UserEvent(user_id: Long, value: Double)
  final case class UserTotal(user_id: Long, n_events: Long, total_value: Double)

  def userTotals(spark: SparkSession, events: DataFrame): Dataset[UserTotal] = {
    import spark.implicits._
    events.select(col("user_id"), col("value")).as[UserEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserTotal, UserTotal](GroupStateTimeout.NoTimeout) {
        case (uid, rows, state: GroupState[UserTotal]) =>
          val prev = state.getOption.getOrElse(UserTotal(uid, 0L, 0.0))
          var n = prev.n_events
          var tot = prev.total_value
          rows.foreach { e => n += 1; tot += e.value }
          val next = UserTotal(uid, n, tot)
          state.update(next)
          next
      }
  }
}
