package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** Watermarked stream-stream interval join — the remaining built-in
  * Structured Streaming operator family next to windowed aggregation
  * ([[TumblingAgg]]) and arbitrary state ([[Sessionize]],
  * [[StreamDedup]]): view→purchase attribution, matching every
  * `purchase` event to the same user's `view` events in the preceding
  * hour.
  *
  * Written ONCE and run on either static or streaming frames: the body
  * is nothing but projections, watermarks and a join, so
  * `attribution(spark.read..., spark.read...)` is the oracle-gated
  * batch twin (q_join_stream) and the same call on `readStream` frames
  * is the production stream (StreamingSpec asserts identical output on
  * replayed input).
  *
  * Stream semantics: BOTH sides carry a watermark and the join
  * condition bounds `buy_ts` to `[view_ts, view_ts + horizon]`, so
  * Spark derives state-eviction bounds for both sides — each side
  * buffers at most `horizon + watermark delay` of events per user,
  * forever, regardless of stream length. Without the time bound the
  * state would grow unboundedly; the interval IS the scale design.
  *
  * Batch/scale shape: one shuffle of each side on `user_id`, then a
  * sort-merge join whose per-key work is bounded by events-per-user in
  * the horizon. Timestamps are µs-truncated (ns // 1000) BEFORE the
  * comparison on both engines, so boundary rows agree bit-for-bit.
  */
object StreamJoin {

  val HorizonUs: Long = 3600000000L // 1 hour

  /** Raw events frame -> one side of the join: (id, user, event-time)
    * for rows of `eventType`. `ts` may arrive in any supported
    * physical shape — [[graft.sources.EventTime.normalizeNs]]
    * establishes the long-ns convention here. */
  private def side(ev: DataFrame, eventType: String, prefix: String): DataFrame =
    graft.sources.EventTime.normalizeNs(ev)
      .filter(col("event_type") === eventType)
      .select(col("event_id").as(s"${prefix}_id"),
        col("user_id").as(s"${prefix}_user"),
        timestamp_micros(TextFunctions.intDiv(col("ts"), lit(1000L))).as(s"${prefix}_ts"))

  /** (view_id, purchase_id, user_id, lag_us) for every view→purchase
    * pair of the same user with 0 <= lag <= `horizonUs`. `views` and
    * `purchases` are raw events frames (may be the same one in batch;
    * a stream passes two readStream frames). */
  def attribution(views: DataFrame, purchases: DataFrame,
      horizonUs: Long = HorizonUs): DataFrame = {
    val v = side(views, "view", "view").withWatermark("view_ts", "1 hour")
    val p = side(purchases, "purchase", "buy").withWatermark("buy_ts", "2 hours")
    v.join(p,
        v("view_user") === p("buy_user") &&
          p("buy_ts") >= v("view_ts") &&
          p("buy_ts") <= v("view_ts") + expr(s"INTERVAL $horizonUs MICROSECOND"))
      .select(col("view_id"), col("buy_id").as("purchase_id"),
        col("view_user").as("user_id"),
        (unix_micros(col("buy_ts")) - unix_micros(col("view_ts"))).as("lag_us"))
  }
}
