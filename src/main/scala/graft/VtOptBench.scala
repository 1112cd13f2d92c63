package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.layout.{Layout, VersionedTable}

/** Measures the curve-optimize economics of the versioned table — the
  * two claims q_sink_optimize / q_sink_optimize_incr gate for
  * correctness but whose VALUE is quantitative:
  *
  *  1. MAINTENANCE: a full [[VersionedTable.optimizeCurve]] costs a
  *     table rewrite; [[VersionedTable.optimizeIncremental]] after a
  *     key-clustered CDC batch costs only the debris plus the curve
  *     cells it dirtied. The synthetic table models the production
  *     correlation that makes CDC clustered (dim x monotone in the
  *     key, like o_day in ingest order; dim y pseudo-random), so a
  *     contiguous key batch dirties one x-block — 1/8 of the cells at
  *     bucketBits = 6 — and incremental should track that fraction,
  *     not the table.
  *
  *  2. QUERY: a ~1%-selectivity box via
  *     [[VersionedTable.readCurveRanges]] (manifest-level segment
  *     pruning + pushed key ranges) vs the same exact predicates over
  *     a plain read of the stat-less pre-optimize table. Also records
  *     the (kept, total) manifest split — the fraction of the table a
  *     100 TB reader would never even LIST.
  *
  * Two sizes 4x apart; one JSON line (repo bench convention) ->
  * vtable_opt_result.json.
  */
object VtOptBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    // scans are sub-second and JVM-warmup-sensitive: min-of-3, the
    // repo's drift-protocol convention
    def timed3[A](f: => A): (A, Double) = {
      val runs = (1 to 3).map(_ => timed(f))
      (runs.head._1, runs.map(_._2).min)
    }

    val dims = Seq(Layout.QuantDim("x", 0.0, 1024.0, 8),
      Layout.QuantDim("y", 0.0, 1024.0, 8))
    val sizes = Seq(2000000L, 8000000L)
    val results = sizes.map { n =>
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_vtopt_bench_$n").toString
      val path = s"$tmp/t"
      // x monotone in k (ingest-order correlation), y pseudo-random
      def rows(lo: Long, hi: Long) =
        spark.range(lo, hi).select(col("id").as("k"),
          (col("id") * 1024.0 / n.toDouble).as("x"),
          pmod(col("id") * 40503L + 17L, lit(1024L)).cast("double").as("y"),
          md5(col("id").cast("string")).as("payload"))
      VersionedTable.create(rows(0, n), path, "k")
      // the stat-less baseline queries: plain read + exact predicates.
      // The xy box is flattered by the baseline (x is monotone in k, so
      // the create-order layout already has tight x footer stats); the
      // y STRIPE is the honest contrast — natural order gives y no
      // locality at all, only the curve layout does.
      def exact(df: org.apache.spark.sql.DataFrame) =
        df.filter(col("x").between(100.0, 200.0) &&
          col("y").between(300.0, 400.0))
      def stripe(df: org.apache.spark.sql.DataFrame) =
        df.filter(col("y").between(300.0, 400.0))
      val (baseRows, tScanBase) = timed3(
        exact(VersionedTable.read(spark, path)).agg(count(lit(1))).collect()(0).getLong(0))
      val (stripeRows, tStripeBase) = timed3(
        stripe(VersionedTable.read(spark, path)).agg(count(lit(1))).collect()(0).getLong(0))
      val (_, tOptFull) = timed(
        VersionedTable.optimizeCurve(spark, path, "k", dims, bucketBits = 6))
      // key-clustered CDC batch: 1/1000 of the table, contiguous keys
      // -> one x-block of cells dirties (1/8 of the coarse grid)
      VersionedTable.upsert(
        rows(0, n / 1000).withColumn("payload", lit("upd")), path, "k")
      val (_, tIncr) = timed(
        VersionedTable.optimizeIncremental(spark, path, "k"))
      // pruned query over the repaired layout
      val desc = Layout.openQuantized(path)
      val ranges = desc.boxRanges(Seq(100.0, 300.0), Seq(200.0, 400.0))
      val (kept, total) = VersionedTable.pruneCurveSegments(spark, path, ranges)
      val (prunedRows, tScanPruned) = timed3(
        exact(VersionedTable.readCurveRanges(spark, path,
          Seq(100.0, 300.0), Seq(200.0, 400.0)))
          .agg(count(lit(1))).collect()(0).getLong(0))
      require(prunedRows == baseRows, s"pruning lost rows: $prunedRows != $baseRows")
      val stripeRanges = desc.boxRanges(Seq(0.0, 300.0), Seq(1024.0, 400.0),
        maxRanges = 32)
      val (stripeKept, _) = VersionedTable.pruneCurveSegments(spark, path, stripeRanges)
      val (stripePruned, tStripePruned) = timed3(
        stripe(VersionedTable.readCurveRanges(spark, path,
          Seq(0.0, 300.0), Seq(1024.0, 400.0), maxRanges = 32))
          .agg(count(lit(1))).collect()(0).getLong(0))
      require(stripePruned == stripeRows,
        s"stripe pruning lost rows: $stripePruned != $stripeRows")
      (tOptFull, tIncr, tScanBase, tScanPruned, kept.size, total,
        tStripeBase, tStripePruned, stripeKept.size)
    }
    def arr(f: ((Double, Double, Double, Double, Int, Int, Double, Double, Int)) => String) =
      results.map(f).mkString("[", ",", "]")
    println(s"""{"metric":"vtable_optimize","sizes":[${sizes.mkString(",")}],""" +
      s""""bucket_bits":6,"batch_frac":0.001,"dirty_cell_frac":0.125,""" +
      s""""optimize_full_sec":${arr(r => f"${r._1}%.2f")},""" +
      s""""optimize_incr_sec":${arr(r => f"${r._2}%.2f")},""" +
      s""""box_scan_statless_sec":${arr(r => f"${r._3}%.2f")},""" +
      s""""box_scan_pruned_sec":${arr(r => f"${r._4}%.2f")},""" +
      s""""segments_kept":${arr(_._5.toString)},""" +
      s""""segments_total":${arr(_._6.toString)},""" +
      s""""stripe_scan_statless_sec":${arr(r => f"${r._7}%.2f")},""" +
      s""""stripe_scan_pruned_sec":${arr(r => f"${r._8}%.2f")},""" +
      s""""stripe_segments_kept":${arr(_._9.toString)}}""")
    spark.stop()
  }
}
