package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational pre-flight diagnostics — the cheap one-scan audits a
  * pipeline runs BEFORE committing to an expensive shuffle shape.
  *
  * All outputs are exact integer math (ppm shares via integer
  * division), so the DuckDB oracle reproduces them bit-for-bit.
  */
object Diagnostics {

  /** Join/aggregation-key skew profile: the top-k heaviest keys with
    * their exact row share and skew-vs-average multiple, plus the
    * global (n_rows, n_keys) context on every row.
    *
    * This is the number that decides the physical plan downstream:
    * `skew_x_avg_ppm` >> 1e6 on the top key means a plain hash
    * shuffle on this key will straggle and the join needs salting
    * ([[graft.operators.SaltedJoin]]) or AQE skew splitting; a flat
    * profile means the plain shuffle is fine. Running the profile is
    * one aggregate — strictly cheaper than discovering the same fact
    * from a 10×-straggling stage at 100 TB.
    *
    * Shape at 100 TB: per-key counts are ONE hash aggregate with
    * map-side partial combine (the only corpus-sized exchange, and
    * it's (key, long) rows, not payloads); the top-k is
    * TakeOrderedAndProject over that counts frame (per-partition
    * heaps, never a full sort); the global totals are a single-row
    * aggregate of the same counts frame; ranking and the final
    * context attach run on k and 1 rows respectively (broadcast
    * NLJ). The deterministic total order (n desc, key asc) makes the
    * k-th boundary engine- and partitioning-independent. */
  def skewProfile(df: DataFrame, keyCol: String, k: Int = 10): DataFrame = {
    val counts = df.groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.agg(
      sum(col("n")).as("n_rows"), count(lit(1)).as("n_keys"))
    val top = counts
      .orderBy(col("n").desc, col("key"))
      .limit(k)
      // k rows by construction — the single-partition window is fine
      .withColumn("rank",
        row_number().over(Window.orderBy(col("n").desc, col("key")))
          .cast("long"))
    top.crossJoin(broadcast(totals))
      .select(
        col("rank"), col("key"), col("n"),
        col("n_rows"), col("n_keys"),
        graft.text.TextFunctions.intDiv(
          col("n") * lit(1000000L), col("n_rows")).as("share_ppm"),
        graft.text.TextFunctions.intDiv(
          col("n") * col("n_keys") * lit(1000000L), col("n_rows"))
          .as("skew_x_avg_ppm"))
  }

  /** Watermark-lateness audit — the batch pre-flight that SIZES a
    * streaming watermark before deployment: replay the events in
    * arrival order and, for each candidate watermark W, count the
    * events whose event time is more than W behind the maximum event
    * time already seen at their arrival (exactly the rows
    * `withWatermark(W)` would drop). Output one row per candidate:
    * (watermark_us, n_events, n_late, late_ppm).
    *
    * The running "max seen so far" is the same two-level
    * decomposition as packSequences' prefix sum — a global
    * `max() OVER (ORDER BY arrival)` window would funnel 100 TB
    * through one task. Arrival values are range-bucketed into
    * contiguous slices (order-preserving), the exclusive running max
    * is windowed per bucket in parallel, and the exclusive prefix
    * over the nBuckets-row bucket-max frame is broadcast back; the
    * effective max-before is the greatest of the two. The (arrival,
    * order) order is total, so flags are engine-independent and the
    * oracle's single global window reproduces them bit-for-bit. */
  def watermarkAudit(df: DataFrame, watermarksNs: Seq[Long],
      tsCol: String = "ts", arrivalCol: String = "arrival",
      orderCol: String = "event_id", nBuckets: Int = 8): DataFrame = {
    require(watermarksNs.nonEmpty && nBuckets > 0)
    val d = df.select(col(tsCol).as("t"), col(arrivalCol).as("arr"),
      col(orderCol).as("oid"))
    val span = d.agg(min(col("arr")).as("lo"), max(col("arr")).as("hi"))
    val bucketed = d.crossJoin(broadcast(span))
      .withColumn("bucket", graft.text.TextFunctions.intDiv(
        (col("arr") - col("lo")) * nBuckets, col("hi") - col("lo") + 1))
    val wIn = Window.partitionBy(col("bucket")).orderBy(col("arr"), col("oid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wB = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefix = bucketed.groupBy(col("bucket"))
      .agg(max(col("t")).as("bmax"))
      // single-partition window over nBuckets ROWS, not the corpus
      .withColumn("pmax", max(col("bmax")).over(wB))
      .select(col("bucket"), col("pmax"))
    val base = bucketed
      .withColumn("wmax", max(col("t")).over(wIn))
      .join(broadcast(prefix), "bucket")
      // greatest skips nulls (first row of first bucket stays null)
      .withColumn("mx", greatest(col("wmax"), col("pmax")))
    val aggs = count(lit(1)).as("n_events") +:
      watermarksNs.zipWithIndex.map { case (w, i) =>
        sum(when(col("mx").isNotNull && col("t") < col("mx") - w, 1L)
          .otherwise(0L)).as(s"late_$i")
      }
    val one = base.agg(aggs.head, aggs.tail: _*)
    watermarksNs.zipWithIndex.map { case (w, i) =>
      one.select(lit(w / 1000L).as("watermark_us"), col("n_events"),
        col(s"late_$i").as("n_late"),
        graft.text.TextFunctions.intDiv(
          col(s"late_$i") * lit(1000000L), col("n_events")).as("late_ppm"))
    }.reduce(_ unionAll _)
  }

  /** Corpus snapshot diff: classify every id across two snapshots of
    * the same table as added / removed / changed / unchanged by
    * content hash — the audit run between two crawl dumps (or two
    * pipeline runs) before deciding what to reprocess. Incremental
    * processing at 100 TB starts here: reprocess `added`+`changed`,
    * tombstone `removed`, skip `unchanged` (usually ~99% of bytes).
    *
    * Emits per-class counts (classes with no members are absent), so
    * the result is a bounded ≤4-row frame regardless of corpus size;
    * the per-id classification frame is an intermediate a caller can
    * reuse via [[diffClassify]].
    *
    * Shape at 100 TB: one full outer equi-join on the id (the only
    * corpus exchange; both sides pre-hashed to (id, digest) rows —
    * narrow, payload-free), then a 4-group aggregate with map-side
    * combine. No sort, no window, no broadcast of anything
    * corpus-sized. */
  def corpusDiff(oldSnap: DataFrame, newSnap: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    diffClassify(oldSnap, newSnap, idCol, textCol)
      .groupBy(col("class"))
      .agg(count(lit(1)).as("n"))

  /** The per-id classification behind [[corpusDiff]]: one row per id
    * present in either snapshot, with its diff class. */
  def diffClassify(oldSnap: DataFrame, newSnap: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    def digest(df: DataFrame) = df.select(
      col(idCol).as("id"), md5(coalesce(col(textCol), lit(""))).as("h"))
    val a = digest(oldSnap).withColumnRenamed("h", "h_old")
    val b = digest(newSnap).withColumnRenamed("h", "h_new")
    a.join(b, Seq("id"), "full_outer")
      .select(col("id"),
        when(col("h_old").isNull, lit("added"))
          .when(col("h_new").isNull, lit("removed"))
          .when(col("h_old") === col("h_new"), lit("unchanged"))
          .otherwise(lit("changed")).as("class"))
  }

  /** Exact-percentile WINSORIZATION audit — the robust-preprocessing
    * step for a metric/reward column before it feeds training or
    * aggregation: per group the exact loPct/hiPct percentile bounds
    * (smallest value whose cumulative count reaches ⌈n·p/100⌉ — the
    * classic discrete definition), how many rows each side would
    * clip, and the clipped (winsorized) sum. Values ride a
    * floor(·100) fixed-point (floor on the SAME parquet double is
    * engine-exact, unlike rounding), so the whole audit hash-gates.
    *
    * Shape at 100 TB: the percentile is computed from a VALUE
    * HISTOGRAM — groupBy (group, vq) then a cumulative window over
    * the per-group distinct-value frame — so the window is bounded by
    * the value DOMAIN (cents of a bounded metric), never the corpus;
    * a global per-group sort of raw rows (the textbook formulation,
    * and the oracle's) would serialize the corpus through one
    * partition per group. Bounds re-enter BROADCAST (groups-sized);
    * two corpus passes (histogram + clip stats). */
  def winsorize(events: DataFrame, loPct: Int = 5, hiPct: Int = 95,
      groupCol: String = "event_type", valCol: String = "value")
      : DataFrame = {
    require(0 < loPct && loPct < hiPct && hiPct <= 100, s"$loPct/$hiPct")
    import graft.text.TextFunctions.intDiv
    val vq = events.filter(col(valCol).isNotNull)
      .select(col(groupCol).as("grp"),
        floor(col(valCol) * 100).cast("long").as("vq"))
    val hist = vq.groupBy(col("grp"), col("vq")).agg(count(lit(1)).as("c"))
    val byGrp = Window.partitionBy(col("grp"))
    val cum = hist
      .withColumn("cum", sum(col("c")).over(
        byGrp.orderBy(col("vq"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum(col("c")).over(byGrp))
    // both bounds from ONE aggregate over the cumulative frame
    // (conditional mins ignore nulls) — two pick() branches would
    // re-window the histogram lineage twice for the same answer
    def pick(pct: Int) =
      min(when(col("cum") >= intDiv(col("n") * pct + 99L, lit(100L)),
        col("vq")))
    val bounds = cum.groupBy(col("grp"))
      .agg(pick(loPct).as("lo_q"), pick(hiPct).as("hi_q"))
    vq.join(broadcast(bounds), "grp")
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), min(col("lo_q")).as("lo_q"),
        min(col("hi_q")).as("hi_q"),
        sum(when(col("vq") < col("lo_q"), 1L).otherwise(0L)).as("n_clip_lo"),
        sum(when(col("vq") > col("hi_q"), 1L).otherwise(0L)).as("n_clip_hi"),
        sum(greatest(least(col("vq"), col("hi_q")), col("lo_q")))
          .as("winsor_sum"))
      .withColumnRenamed("grp", "event_type")
  }
}
