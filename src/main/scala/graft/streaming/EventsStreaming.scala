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

  /** Streaming sessionization, declaratively: Spark's native
    * `session_window` merges events within `gap` of each other per user,
    * watermark-bounded state, Catalyst-owned merge/eviction — the
    * streaming analog of RelationalOps.sessionize. Append mode emits each
    * session once, when the watermark passes its close.
    */
  def userSessions(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts_t", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts_t"), gap))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_v"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_v"))

  /** Closed sessions via flatMapGroupsWithState with an event-time
    * timeout — the custom-state form of [[userSessions]] for session
    * payloads `session_window` can't express. Robust to out-of-order
    * arrival by construction: each user's events BUFFER in state until
    * the watermark passes `last event + gap` (the point after which no
    * kept event can extend any buffered session — later events are
    * `>= watermark > last + gap`, so they open new sessions), then the
    * buffer sessionizes in time order and every closed session emits
    * exactly once. Rows older than the watermark are dropped explicitly
    * (flatMapGroupsWithState does not drop late data itself). State is
    * bounded by the watermark horizon per user, never by stream length.
    */
  // ts_t stays in the Dataset so the analyzer sees the watermark column
  // through the stateful operator; ts_us carries the exact microseconds
  final case class SessionEvent(
      user_id: Long, ts_t: java.sql.Timestamp, ts_us: Long, value: Double)
  final case class SessionBuffer(ts_us: Array[Long], values: Array[Double])
  final case class ClosedSession(
      user_id: Long, start_us: Long, end_us: Long, n_events: Long, sum_v: Double)

  def closedSessions(
      spark: SparkSession,
      events: DataFrame,
      gapUs: Long = 30L * 60 * 1000000
  ): Dataset[ClosedSession] = {
    import spark.implicits._

    events
      .withWatermark("ts_t", "1 hour")
      .select(col("user_id"), col("ts_t"), unix_micros(col("ts_t")).as("ts_us"), col("value"))
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionBuffer, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (uid, rows, state: GroupState[SessionBuffer]) =>
          // uniform handler for data batches AND timeouts: merge fresh
          // events into the buffer, split it into gap-delimited sessions,
          // emit every session the watermark has SEALED (no kept event —
          // all >= watermark — can extend it), keep the open tail
          val wmMs = state.getCurrentWatermarkMs()
          val fresh =
            if (state.hasTimedOut) Array.empty[SessionEvent]
            else rows.filter(_.ts_us / 1000 >= wmMs).toArray
          val prev = state.getOption.getOrElse(SessionBuffer(Array.empty, Array.empty))
          val order = (0 until (prev.ts_us.length + fresh.length)).sortBy { i =>
            if (i < prev.ts_us.length) prev.ts_us(i) else fresh(i - prev.ts_us.length).ts_us
          }
          def tsAt(i: Int): Long =
            if (i < prev.ts_us.length) prev.ts_us(i) else fresh(i - prev.ts_us.length).ts_us
          def vAt(i: Int): Double =
            if (i < prev.ts_us.length) prev.values(i) else fresh(i - prev.ts_us.length).value
          val closed = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
          val openIdx = scala.collection.mutable.ArrayBuffer.empty[Int]
          var firstOpenSealMs = -1L // earliest future seal among open sessions
          var sess = List.empty[Int] // current session's indices, reversed
          def flush(): Unit = if (sess.nonEmpty) {
            val idx = sess.reverse
            val last = tsAt(idx.last)
            if ((last + gapUs) / 1000 < wmMs)
              closed += ClosedSession(uid, tsAt(idx.head), last, idx.length.toLong,
                idx.map(vAt).sum)
            else {
              if (firstOpenSealMs < 0) firstOpenSealMs = (last + gapUs) / 1000
              openIdx ++= idx
            }
            sess = Nil
          }
          order.foreach { i =>
            if (sess.nonEmpty && tsAt(i) - tsAt(sess.head) > gapUs) flush()
            sess = i :: sess
          }
          flush()
          if (openIdx.isEmpty) { if (state.exists) state.remove() }
          else {
            state.update(SessionBuffer(openIdx.map(tsAt).toArray, openIdx.map(vAt).toArray))
            // fire at the EARLIEST open session's seal point (each firing
            // emits every session sealed by then and re-arms to the next);
            // arming to the newest would strand older sealed sessions
            // behind a timer that may never fire. Must stay strictly
            // above the current watermark.
            state.setTimeoutTimestamp(math.max(firstOpenSealMs, wmMs + 1))
          }
          closed.iterator
      }
  }

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
