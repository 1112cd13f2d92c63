package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main (round-12 verdict ask #6): EDGE-COUNT-CONTROLLED
  * scaling of the graph trio. The corpus-derived ScaleCheck rows grow
  * edges quadratically with document copies (the duplication-heavy
  * stress case); this check instead synthesizes edge lists at 1x, 4x
  * and 10x a base edge count with a PLANTED MEGA-HUB (10% of all
  * edges touch node 0) and measures what the scaladocs claim:
  *
  *  - the degree orientation keeps the triangle wedge build
  *    subquadratic — the hub, having the maximal degree, is always
  *    the wedge DESTINATION and generates zero wedges itself, so
  *    wall-clock grows ~linearly in m where a naive src-join would
  *    pay outdeg(hub)² = (m/10)²;
  *  - the per-iteration PageRank cost is flat in the iteration count
  *    (bounded lineage via the checkpoint cadence) and ~linear in m
  *    (one rank-frame join per iteration, map-side-combining sums).
  *
  * Prints one JSON line with per-scale wall-clocks, the oriented
  * max out-degree vs the sqrt(2m) bound, wedge counts, and the
  * fitted log-log exponents. Deterministic synthesis (xxhash64 on
  * the edge index), no oracle — this is a measurement harness, not a
  * gated query.
  */
object GraphScaleCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val baseM = sys.env.getOrElse("SPARK_GRAFT_GRAPH_EDGES", "100000").toLong
    val scales = Seq(1L, 4L, 10L)

    def edgesAt(m: Long) = {
      val n = m / 8 // average degree 16
      spark.range(m).select(
        when(col("id") % 10 === 0, lit(0L))
          .otherwise(pmod(xxhash64(col("id"), lit(1)), lit(n))).as("doc_a"),
        pmod(xxhash64(col("id"), lit(2)), lit(n)).as("doc_b"))
    }

    val rows = scales.map { s =>
      val m = baseM * s
      val n = m / 8
      val edges = edgesAt(m)
      val nodes = spark.range(n).select(col("id").as("doc_id"))

      // structural facts (untimed): canonical distinct edges, the
      // degree orientation's out-degrees, the wedge count the build
      // materializes, and the planted hub's neutralization
      val canon = edges
        .select(least(col("doc_a"), col("doc_b")).as("u"),
          greatest(col("doc_a"), col("doc_b")).as("v"))
        .filter(col("u") =!= col("v")).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val mCanon = canon.count()
      val deg = canon.select(col("u").as("id"))
        .unionAll(canon.select(col("v").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).as("dg"))
      val uLess = col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v"))
      val outdeg = canon
        .join(deg.select(col("id").as("u"), col("dg").as("du")), "u")
        .join(deg.select(col("id").as("v"), col("dg").as("dv")), "v")
        .select(when(uLess, col("u")).otherwise(col("v")).as("s"))
        .groupBy(col("s")).agg(count(lit(1)).as("od"))
      val st = outdeg.agg(max(col("od")).as("mx"),
        (sum(col("od") * (col("od") - 1)) / 2).cast("long").as("wedges"))
        .collect()(0)
      val (maxOd, wedges) = (st.getLong(0), st.getLong(1))
      val hubDeg = deg.filter(col("id") === 0L).collect()
        .headOption.map(_.getLong(1)).getOrElse(0L)
      val hubOd = outdeg.filter(col("s") === 0L).collect()
        .headOption.map(_.getLong(1)).getOrElse(0L)
      canon.unpersist()

      def timed(f: => Unit) = BenchUtil.minOfN(spark, runs = 3)(f)
      val tTri = timed(BenchUtil.noop(graft.graph.Triangles.perNode(edges)))
      // wide iteration spread (2 vs 8) so the per-iteration marginal
      // cost dominates the fixed setup cost in the subtraction
      val tRank2 = timed(BenchUtil.noop(
        graft.graph.GraphRank.pageRank(nodes, edges, iters = 2)))
      val tRank8 = timed(BenchUtil.noop(
        graft.graph.GraphRank.pageRank(nodes, edges, iters = 8)))
      val perIter = (tRank8 - tRank2) / 6.0
      // label propagation at the same iteration spread: its round is
      // the same join + map-side-combining aggregate shape as rank's,
      // so its per-iteration marginal cost should track edges the
      // same way (round-13 verdict ask #6)
      val tLp2 = timed(BenchUtil.noop(
        graft.graph.LabelProp.communities(nodes, edges, iters = 2)))
      val tLp8 = timed(BenchUtil.noop(
        graft.graph.LabelProp.communities(nodes, edges, iters = 8)))
      val perIterLp = (tLp8 - tLp2) / 6.0
      spark.catalog.clearCache()

      // component-labels REFRESH at this scale (round-16 verdict #1's
      // scale claim): stored labels over the m-edge graph, then ONE
      // FIXED-SIZE appended delta (5,000 edges onto 1,000 new nodes) —
      // the refresh solves only the batch-sized super-graph and
      // broadcast-remaps the stored labels, so its cost should be
      // near-flat in the STORED graph size (exponent << 1), unlike a
      // from-scratch re-solve which is ~linear in m. One timed run (a
      // refresh mutates its artifact; same convention as
      // DedupIndexBench's appends).
      val labDir = System.getProperty("java.io.tmpdir") + s"/graft_gsc_labels_x$s"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(labDir))
      // the sidecar-refresh deltas assume canonical unique pairs (the
      // similarity-graph artifact contract); canonicalize the synthetic
      // list before storing it as the artifact's edge dir
      canon.select(col("u").as("doc_a"), col("v").as("doc_b"))
        .write.mode("overwrite").parquet(s"$labDir/edges")
      graft.dedup.Dedup.writeComponentLabels(spark, labDir)
      // triangle-stats sidecar over the SAME stored graph (round-16
      // continuation): its refresh is a batch-edges × degree wedge
      // probe against a broadcast-restricted adjacency — near-flat in
      // the stored size like the labels refresh, vs the ~linear
      // from-scratch wedge build measured as triangles_sec above
      graft.dedup.Dedup.writeTriangleStats(spark, labDir)
      spark.range(5000L).select(
          pmod(xxhash64(col("id"), lit(7)), lit(n)).as("doc_a"),
          (pmod(col("id"), lit(1000L)) + lit(n)).as("doc_b"))
        .distinct()
        .write.mode("append").parquet(s"$labDir/edges")
      val tRefresh = BenchUtil.timed(
        graft.dedup.Dedup.refreshComponentLabels(spark, labDir))
      spark.catalog.clearCache()
      val tTriRefresh = BenchUtil.timed(
        graft.dedup.Dedup.refreshTriangleStats(spark, labDir))
      spark.catalog.clearCache()
      (s, m, mCanon, maxOd, wedges, hubDeg, hubOd, tTri, tRank2, tRank8,
        perIter, tLp2, tLp8, perIterLp, tRefresh, tTriRefresh)
    }

    def expo(a: Double, b: Double, sa: Long, sb: Long): Double =
      math.log(b / a) / math.log(sb.toDouble / sa.toDouble)
    val (lo, hi) = (rows.head, rows.last)
    val triExp = expo(lo._8, hi._8, lo._1, hi._1)
    val iterExp = expo(lo._11, hi._11, lo._1, hi._1)
    val lpIterExp = expo(lo._14, hi._14, lo._1, hi._1)
    val refreshExp = expo(lo._15, hi._15, lo._1, hi._1)
    val triRefreshExp = expo(lo._16, hi._16, lo._1, hi._1)

    val qs = rows.map {
      case (s, m, mc, mx, w, hd, ho, tt, t2, t8, pi, l2, l8, lpi, tr, ttr) =>
        f""""x$s":{"edges":$m,"canonical":$mc,"max_outdeg":$mx,""" +
          f""""sqrt_2m_bound":${math.sqrt(2.0 * mc)}%.0f,"wedges":$w,""" +
          f""""hub_degree":$hd,"hub_outdeg":$ho,"triangles_sec":$tt%.3f,""" +
          f""""rank2_sec":$t2%.3f,"rank8_sec":$t8%.3f,""" +
          f""""rank_per_iter_sec":$pi%.3f,""" +
          f""""lp2_sec":$l2%.3f,"lp8_sec":$l8%.3f,""" +
          f""""lp_per_iter_sec":$lpi%.3f,""" +
          f""""labels_refresh_sec":$tr%.3f,""" +
          f""""tri_refresh_sec":$ttr%.3f}"""
    }.mkString("{", ",", "}")
    val json = s"""{"metric":"graph_scale_check","base_edges":$baseM,""" +
      f""""triangles_exponent":$triExp%.2f,""" +
      f""""rank_per_iter_exponent":$iterExp%.2f,""" +
      f""""lp_per_iter_exponent":$lpIterExp%.2f,""" +
      f""""labels_refresh_exponent":$refreshExp%.2f,""" +
      f""""tri_refresh_exponent":$triRefreshExp%.2f,"scales":$qs}"""
    println(json)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("graph_scale_result.json"), json + "\n")
    spark.stop()
  }
}
