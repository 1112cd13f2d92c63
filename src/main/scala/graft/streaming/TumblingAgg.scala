package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.EventTime
import graft.text.TextFunctions

/** Watermarked tumbling-window aggregation over the events table — the
  * canonical built-in Structured Streaming operator (readStream ->
  * watermark -> `window()` groupBy -> agg), written ONCE and run on
  * either a static or a streaming frame: the definition below contains
  * nothing batch- or stream-specific, so `agg(spark.read...)` is the
  * oracle-gated batch twin (q_events_tumbling) and
  * `agg(spark.readStream...)` is the production stream (StreamingSpec
  * asserts the two produce identical rows on replayed input).
  *
  * Semantics: hourly event counts + exact integer props-k sums per
  * event type. The 1-hour watermark bounds late data on the stream
  * side (state per key is one window aggregate, dropped once the
  * watermark passes window end — O(active windows x types) state
  * forever) and is a no-op on the batch side.
  *
  * Scale: one shuffle on (window, event_type) with partial aggregation
  * — map-side combine reduces each partition to one row per (hour,
  * type) before the exchange, so the shuffle carries aggregate rows,
  * not events. `window()` start/end are pure epoch arithmetic
  * (timezone-independent), emitted as BIGINT µs for cross-engine
  * equality.
  */
object TumblingAgg {

  val WindowUs: Long = 3600000000L // 1 hour

  /** events -> (window_start_us, event_type, n, sum_k); input is the
    * raw events table with `ts` in ANY supported physical shape —
    * [[graft.sources.EventTime.normalizeNs]] establishes the long-ns
    * convention at the operator's own boundary. */
  def agg(events: DataFrame): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast("long")
    EventTime.normalizeNs(events)
      .select(timestamp_micros(TextFunctions.intDiv(col("ts"), lit(1000L))).as("tsm"),
        col("event_type"), k.as("k"))
      .withWatermark("tsm", "1 hour")
      .groupBy(window(col("tsm"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"), col("n"), col("sum_k"))
  }

  val SlideUs: Long = 1800000000L // 30 min

  /** Hopping (sliding) twin of [[agg]]: 1-hour windows every 30
    * minutes, so each event lands in exactly win/slide = 2 windows —
    * the standard smoothed-rate readout. Same watermark rules apply
    * under readStream; state is bounded by (windows in the watermark
    * horizon) x event types. The oracle reproduces the window set by
    * pure epoch arithmetic (the sh in 0..1 shifts of the slide-floored
    * start). */
  def hopping(events: DataFrame): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast("long")
    EventTime.normalizeNs(events)
      .select(timestamp_micros(TextFunctions.intDiv(col("ts"), lit(1000L))).as("tsm"),
        col("event_type"), k.as("k"))
      .withWatermark("tsm", "1 hour")
      .groupBy(window(col("tsm"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"), col("n"), col("sum_k"))
  }
}
