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

  /** The events parquet schema (ts is a tz-less microsecond timestamp —
    * pyarrow writes without isAdjustedToUTC, which Spark reads as NTZ).
    */
  val eventsSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampNTZType),
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("props", org.apache.spark.sql.types.StringType)
    ))

  /** File-based event stream from a directory of parquet files. */
  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(eventsSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      // watermarks/windows want TIMESTAMP (LTZ); NTZ→LTZ is exact under
      // the UTC session timezone every entry point pins
      .withColumn("ts_t", col("ts").cast("timestamp"))

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
    * arrival by construction, with state that is O(open sessions) per
    * user — NOT per event: each open session is kept only as a summary
    * (start, last, n, sum). Adding an event can only merge or extend
    * sessions, never split one, so summaries compose exactly: fresh
    * events become singleton summaries, everything sorts by start, and
    * adjacent summaries merge when the next STARTS before the current
    * session's end + gap (end-exclusive — the same boundary rule as
    * `session_window`: an event exactly `gap` after the last opens a new
    * session). A session emits exactly once when the watermark seals it
    * (no kept event — all >= watermark — can extend it). Rows older than
    * the watermark are dropped explicitly (flatMapGroupsWithState does
    * not drop late data itself). A never-idle user keeps exactly ONE
    * summary alive, so state is bounded by horizon/gap sessions per
    * user, never by stream length.
    */
  // ts_t stays in the Dataset so the analyzer sees the watermark column
  // through the stateful operator; ts_us carries the exact microseconds
  final case class SessionEvent(
      user_id: Long, ts_t: java.sql.Timestamp, ts_us: Long, value: Double)
  final case class SessionBuffer(
      starts: Array[Long], lasts: Array[Long], ns: Array[Long], sums: Array[Double])
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
          // uniform handler for data batches AND timeouts
          val wmMs = state.getCurrentWatermarkMs()
          val fresh =
            if (state.hasTimedOut) Array.empty[SessionEvent]
            else rows.filter(_.ts_us / 1000 >= wmMs).toArray
          val prev = state.getOption.getOrElse(
            SessionBuffer(Array.empty, Array.empty, Array.empty, Array.empty))
          val all = (prev.starts.indices.map(i =>
            (prev.starts(i), prev.lasts(i), prev.ns(i), prev.sums(i))) ++
            fresh.map(e => (e.ts_us, e.ts_us, 1L, e.value))).sortBy(_._1)
          val merged = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Double)]
          all.foreach { s =>
            if (merged.nonEmpty && s._1 < merged.last._2 + gapUs) {
              val m = merged.last // chained merges absorb bridging events
              merged(merged.length - 1) =
                (m._1, math.max(m._2, s._2), m._3 + s._3, m._4 + s._4)
            } else merged += s
          }
          // sealed: the watermark passed this session's end + gap, so no
          // kept event can start inside it or extend it
          val (closed, open) = merged.partition(m => (m._2 + gapUs) / 1000 < wmMs)
          if (open.isEmpty) { if (state.exists) state.remove() }
          else {
            state.update(SessionBuffer(open.map(_._1).toArray, open.map(_._2).toArray,
              open.map(_._3).toArray, open.map(_._4).toArray))
            // fire at the EARLIEST open session's seal point (sessions are
            // disjoint and start-sorted, so the first seals first); each
            // firing emits every session sealed by then and re-arms.
            // Must stay strictly above the current watermark.
            state.setTimeoutTimestamp(math.max((open.head._2 + gapUs) / 1000, wmMs + 1))
          }
          closed.iterator.map(m => ClosedSession(uid, m._1, m._2, m._3, m._4))
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
