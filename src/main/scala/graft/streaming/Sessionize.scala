package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.text.TextFunctions

/** One open session per user, carried as custom stream state. */
case class OpenSession(startUs: Long, endUs: Long, n: Long, sumK: Long)

/** A closed session — the operator's output row shape. */
case class Session(user_id: Long, session_start_us: Long, session_end_us: Long,
    n_events: Long, sum_k: Long)

/** Sessionization over the events stream: events of one user belong to
  * the same session while consecutive gaps stay within `gapUs`.
  *
  * Two equivalent definitions (StreamingSpec asserts equality):
  *
  *  - [[batch]]: classic gaps-and-islands over window functions — one
  *    sort per user (single exchange on user_id), a lag to flag breaks,
  *    a running sum to number sessions, then a hash aggregate. Fully
  *    SQL-expressible, so the DuckDB oracle gates it (q_sessionize).
  *  - [[stream]]: the Structured Streaming path with CUSTOM STATE —
  *    `flatMapGroupsWithState` keeps one [[OpenSession]] per user,
  *    closes it when a new event breaks the gap (emitting immediately)
  *    or when the event-time watermark passes `end + gap` (event-time
  *    timeout), so state stays O(users) regardless of stream length.
  *
  * Scale: both paths shuffle once on user_id; state per key is a single
  * fixed-size record, so a 1000-executor cluster holds any user count.
  * All outputs are exact integer math (µs timestamps, BIGINT sums) for
  * cross-engine equality.
  */
object Sessionize {

  /** 12 hours — chosen against the synthetic events cadence (median
    * per-user inter-event gap ~7.3 h), so sessions are multi-event AND
    * users have several sessions. */
  val DefaultGapUs: Long = 43200000000L

  /** events table -> (user_id, event_id, ts_us, k): the projected
    * input both paths share. `ts` may arrive as a nanos long OR a
    * timestamp — [[graft.sources.EventTime.normalizeNs]] establishes
    * the long-ns convention here, emitted at µs like the as-of join
    * (the DuckDB oracle reads the same parquet via epoch_us). */
  def project(events: DataFrame): DataFrame =
    graft.sources.EventTime.normalizeNs(events).select(
      col("user_id").cast("long").as("user_id"),
      col("event_id").cast("long").as("event_id"),
      TextFunctions.intDiv(col("ts"), lit(1000L)).as("ts_us"),
      get_json_object(col("props"), "$.k").cast("long").as("k"))

  /** Gaps-and-islands sessionization of a [[project]]-shaped frame. */
  def batch(ev: DataFrame, gapUs: Long = DefaultGapUs): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev
      .withColumn("brk",
        when(col("ts_us") - lag(col("ts_us"), 1).over(w) > gapUs, 1L).otherwise(0L))
      .withColumn("sess", sum(col("brk")).over(run))
      .groupBy(col("user_id"), col("sess"))
      .agg(
        min(col("ts_us")).as("session_start_us"),
        max(col("ts_us")).as("session_end_us"),
        count(lit(1)).as("n_events"),
        sum(col("k")).as("sum_k"))
      .select("user_id", "session_start_us", "session_end_us", "n_events", "sum_k")
  }

  /** Declarative twin of [[batch]]/[[stream]] via Spark's built-in
    * `session_window` — no custom state code at all, and the SAME
    * definition is a valid watermarked streaming aggregation. Boundary
    * alignment: Spark merges an event into a session when its start is
    * <= the session's end (INCLUSIVE — verified by the boundary case
    * in StreamingSpec), so a gap of exactly gapUs merges diff <= gapUs
    * and breaks at gapUs + 1: identical to [[batch]]'s strictly-greater
    * break rule with no adjustment. Same one-exchange-on-user_id
    * shape. */
  def sessionWindow(ev: DataFrame, gapUs: Long = DefaultGapUs): DataFrame =
    ev.withColumn("tsm", timestamp_micros(col("ts_us")))
      .groupBy(col("user_id"),
        session_window(col("tsm"), s"$gapUs microseconds"))
      .agg(
        min(col("ts_us")).as("session_start_us"),
        max(col("ts_us")).as("session_end_us"),
        count(lit(1)).as("n_events"),
        sum(col("k")).as("sum_k"))
      .select("user_id", "session_start_us", "session_end_us", "n_events", "sum_k")

  /** Streaming sessionization of a [[project]]-shaped (streaming)
    * frame via flatMapGroupsWithState. Within a micro-batch, a group's
    * events are sorted by (ts_us, event_id) — the same total order the
    * batch path uses; across batches the watermark (caller-set delay)
    * bounds lateness, and an event-time timeout at `end + gap` closes
    * sessions no new event ever breaks. */
  def stream(ev: DataFrame, gapUs: Long = DefaultGapUs): Dataset[Session] = {
    val spark = ev.sparkSession
    import spark.implicits._
    // the watermarked event_time column must flow INTO the stateful
    // operator (Spark's unsupported-operation checker requires it), so
    // it rides along in the tuple even though the logic keys off ts_us
    val typed = ev
      .withColumn("event_time", timestamp_micros(col("ts_us")))
      .withWatermark("event_time", "0 seconds")
      .select("user_id", "event_id", "ts_us", "k", "event_time")
      .as[(Long, Long, Long, Long, java.sql.Timestamp)]
    typed
      .groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, Long, Long, Long, java.sql.Timestamp)],
            state: GroupState[OpenSession]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[Session]
          if (state.hasTimedOut) {
            state.getOption.foreach(o =>
              out += Session(user, o.startUs, o.endUs, o.n, o.sumK))
            state.remove()
          } else {
            var open = state.getOption
            rows.toSeq.sortBy(r => (r._3, r._2)).foreach { case (_, _, ts, k, _) =>
              open match {
                case Some(o) if ts - o.endUs <= gapUs =>
                  open = Some(OpenSession(o.startUs, math.max(ts, o.endUs), o.n + 1, o.sumK + k))
                case Some(o) =>
                  out += Session(user, o.startUs, o.endUs, o.n, o.sumK)
                  open = Some(OpenSession(ts, ts, 1, k))
                case None =>
                  open = Some(OpenSession(ts, ts, 1, k))
              }
            }
            open.foreach { o =>
              state.update(o)
              // timeout fires once the watermark passes the session's
              // close boundary (ms granularity, rounded up)
              state.setTimeoutTimestamp(o.endUs / 1000 + gapUs / 1000 + 1)
            }
          }
          out.iterator
      }
  }
}
