package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.text.TextFunctions

/** Diagnostic main: is the signature-index probe's per-batch cost flat
  * as the INDEX grows (round-8 verdict "What's wrong #2" done-check)?
  * Builds two indexes — 1x (40% of the corpus) and 2x (80%) — and
  * probes the SAME batch (the 10% test split) against each, min of 3
  * with warmup. A probe whose cost is proportional to the batch should
  * read near-flat across the doubling; the round-8 shape (band explode
  * + skew-cap window over the whole old side per batch) scaled with
  * the index instead. Prints one JSON line.
  */
object DedupIndexBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val cuts = Seq("a" -> 400000L, "b" -> 800000L, "mid" -> 900000L, "test" -> 1000000L)
    val lbl = TextFunctions.splitLabel(col("doc_id"), cuts)
    val batch = docs.filter(lbl === "test")
    val tmp = System.getProperty("java.io.tmpdir")

    import BenchUtil.{noop, timed}
    def minOf3(f: => Unit): Double = BenchUtil.minOfN(spark)(f)

    val p1 = tmp + "/graft_sig_bench_1x"
    val p2 = tmp + "/graft_sig_bench_2x"
    val tBuild1 = timed(Dedup.writeSignatureIndex(docs.filter(lbl === "a"), p1))
    val tBuild2 = timed(Dedup.writeSignatureIndex(
      docs.filter(lbl === "a" || lbl === "b"), p2))
    val tProbe1 = minOf3(noop(Dedup.minhashPairsAgainstIndex(batch, p1)))
    val tProbe2 = minOf3(noop(Dedup.minhashPairsAgainstIndex(batch, p2)))
    val n1 = spark.read.parquet(s"$p1/sigs").count()
    val n2 = spark.read.parquet(s"$p2/sigs").count()
    val nb = batch.count()

    // similarity-graph APPEND growth (round 15): same question for the
    // graph lifecycle — is appending ONE batch flat as the stored graph
    // doubles? Id-cutoff splits (the append contract is monotone ids);
    // one timed run each (an append mutates its artifact).
    val maxId = docs.agg(max(col("doc_id"))).collect()(0).getLong(0)
    val (c40, c80, c90) = (maxId * 2 / 5, maxId * 4 / 5, maxId * 9 / 10)
    val gBatch = docs.filter(col("doc_id") >= c90)
    val g1 = tmp + "/graft_graph_bench_1x"
    val g2 = tmp + "/graft_graph_bench_2x"
    val tGBuild1 = timed(Dedup.writeSimilarityGraph(
      docs.filter(col("doc_id") < c40), g1))
    val tGBuild2 = timed(Dedup.writeSimilarityGraph(
      docs.filter(col("doc_id") < c80), g2))
    // component-labels sidecar (round 16): is REFRESHING the labels
    // after one appended batch flat as the stored graph doubles? The
    // refresh's work is a batch-sized super-graph solve + a broadcast
    // remap over the stored labels — the remap scan grows with the
    // graph but stays narrow/shuffle-free, so the row should read
    // near-flat like the append itself.
    val tLBuild1 = timed(Dedup.writeComponentLabels(spark, g1))
    val tLBuild2 = timed(Dedup.writeComponentLabels(spark, g2))
    // triangle-stats sidecar (round 16, second consumer): same flatness
    // question for the density stats — the refresh's wedge work is
    // batch-edges × bucket-capped degree against a broadcast-restricted
    // adjacency, and the stored stats frame is never shuffled.
    val tTBuild1 = timed(Dedup.writeTriangleStats(spark, g1))
    val tTBuild2 = timed(Dedup.writeTriangleStats(spark, g2))
    val tApp1 = timed(Dedup.appendSimilarityGraph(gBatch, g1))
    val tApp2 = timed(Dedup.appendSimilarityGraph(gBatch, g2))
    val tLRef1 = timed(Dedup.refreshComponentLabels(spark, g1))
    val tLRef2 = timed(Dedup.refreshComponentLabels(spark, g2))
    val tTRef1 = timed(Dedup.refreshTriangleStats(spark, g1))
    val tTRef2 = timed(Dedup.refreshTriangleStats(spark, g2))
    // rank-scores sidecar (round 16, third consumer): rank is a GLOBAL
    // fixpoint, so the incremental lever is the ITERATION SCHEDULE —
    // the refresh warm-starts from the stored vector, saving
    // ~6.2·ln(coldDistance/perturbation) rounds. Measured at the
    // production batch shape (1% of the corpus onto the other 99%):
    // warm_rounds vs the cold_rounds a from-scratch re-converge of the
    // SAME union pays. (The first cut of this row appended the 10%
    // gBatch at tol=10^-6·scale and read warm == cold == the 64-round
    // cap — a tolerance the hub schedule can't reach and a batch big
    // enough to perturb every hub; both sizing lessons live in
    // Dedup.RankSidecarTol's scaladoc.)
    val c99 = maxId * 99 / 100
    val gr = tmp + "/graft_graph_bench_rank"
    Dedup.writeSimilarityGraph(docs.filter(col("doc_id") < c99), gr)
    val tRBuild = timed(Dedup.writeRankScores(spark, gr))
    val rBuildRounds = graft.graph.GraphRank.lastConvergedRounds
    // LP-community sidecar (fourth consumer) on the same 99% artifact:
    // same warm-start question, measured as rounds (delta-LPA)
    val tLpBuild = timed(Dedup.writeLpCommunities(spark, gr))
    val lpBuildRounds = graft.graph.LabelProp.lastConvergedRounds
    Dedup.appendSimilarityGraph(docs.filter(col("doc_id") >= c99), gr)
    val tRRef = timed(Dedup.refreshRankScores(spark, gr))
    val rWarmRounds = graft.graph.GraphRank.lastConvergedRounds
    val tLpRef = timed(Dedup.refreshLpCommunities(spark, gr))
    val lpWarmRounds = graft.graph.LabelProp.lastConvergedRounds
    // what a refresh WITHOUT the stored vector would pay on the same
    // (already-appended) union: a cold tolerance-stopped converge
    val unionEdgesR = spark.read.parquet(s"$gr/edges")
    val unionNodesR = unionEdgesR.select(col("doc_a").as("doc_id"))
      .union(unionEdgesR.select(col("doc_b").as("doc_id"))).distinct()
    val tRCold = timed(noop(graft.graph.GraphRank.pageRankConverged(
      unionNodesR, unionEdgesR, Dedup.RankSidecarTol,
      Dedup.RankSidecarMaxIters)))
    val rColdRounds = graft.graph.GraphRank.lastConvergedRounds
    val tLpCold = timed(noop(graft.graph.LabelProp.communitiesConverged(
      unionNodesR, unionEdgesR)))
    val lpColdRounds = graft.graph.LabelProp.lastConvergedRounds
    val e1 = spark.read.parquet(s"$g1/edges").count()
    val e2 = spark.read.parquet(s"$g2/edges").count()
    val l1 = spark.read.parquet(s"$g1/labels/assign").count()
    val l2 = spark.read.parquet(s"$g2/labels/assign").count()
    val t1 = spark.read.parquet(s"$g1/tri/assign").count()
    val t2 = spark.read.parquet(s"$g2/tri/assign").count()

    // crossing-bucket RETRACTION (round 16): the append's only O(graph)
    // path, until now documented but never measured. An adversarial
    // batch of EXACT-DUPLICATE clones under cap=2 forces every stored
    // 2-member band bucket it touches across the cap (2 old + 1 clone
    // = 3 > 2), so the append must retract stored pair edges through
    // the anti-join DirSwap rewrite. Built at 1x and 2x corpus with the
    // SAME clone batch (drawn from the 1x portion, present in both):
    // the delta vs the plain appends above is the retraction surcharge,
    // and 1x -> 2x shows how the rewrite grows with the stored graph.
    val px = Dedup.MinHashParams(maxBucketSize = 2)
    val x1 = tmp + "/graft_graph_bench_x1"
    val x2 = tmp + "/graft_graph_bench_x2"
    Dedup.writeSimilarityGraph(docs.filter(col("doc_id") < c40), x1, px)
    Dedup.writeSimilarityGraph(docs.filter(col("doc_id") < c80), x2, px)
    val cloneBatch = docs
      .filter(col("doc_id") < c40 && col("doc_id") % 10 === 0)
      .select((col("doc_id") + maxId + lit(1L)).as("doc_id"), col("text"))
      .persist()
    // crossing-bucket count per artifact, from pre-append stats + the
    // batch's band counts (the append's own `crossing` predicate)
    def nCrossing(path: String): Long = {
      val bb = cloneBatch.select(col("doc_id"),
          Dedup.minhashSignature(col("text"), px).as("sig"))
        .select(posexplode(Dedup.bandHashes(col("sig"), px))
          .as(Seq("band_idx", "band_hash")))
        .groupBy(col("band_idx"), col("band_hash"))
        .agg(count(lit(1)).as("nn"))
      spark.read.parquet(s"$path/index/band_stats")
        .groupBy(col("band_idx"), col("band_hash"))
        .agg(sum(col("n")).as("on"))
        .join(bb, Seq("band_idx", "band_hash"))
        .filter(col("on") >= 2 && col("on") <= px.maxBucketSize &&
          (col("on") + col("nn")) > px.maxBucketSize)
        .count()
    }
    val (nx1, nx2) = (nCrossing(x1), nCrossing(x2))
    val ex1pre = spark.read.parquet(s"$x1/edges").count()
    val ex2pre = spark.read.parquet(s"$x2/edges").count()
    val tX1 = timed(Dedup.appendSimilarityGraph(cloneBatch, x1, px))
    val tX2 = timed(Dedup.appendSimilarityGraph(cloneBatch, x2, px))
    cloneBatch.unpersist()

    // END-TO-END MAINTENANCE COST (round-16 verdict #6): what ONE
    // micro-batch of the full ingest loop costs with ALL FOUR sidecars
    // maintained (append + labels + tri + rank + LP refresh — the
    // number a production ingest budget actually needs), vs batch size
    // (1% and 10% of the corpus) at two stored-graph sizes (40% and
    // 80%). Each artifact gets both batches sequentially (monotone id
    // windows), so the 10% row runs against a graph one small batch
    // larger — the per-batch cost comparison the loop actually faces.
    val onePct = maxId / 100
    def maintainAll(path: String, b: org.apache.spark.sql.DataFrame): Double =
      timed {
        Dedup.appendSimilarityGraph(b, path)
        Dedup.refreshComponentLabels(spark, path)
        Dedup.refreshTriangleStats(spark, path)
        Dedup.refreshRankScores(spark, path)
        Dedup.refreshLpCommunities(spark, path)
      }
    def maintainCell(cut: Long, tag: String): (String, Long) = {
      val path = tmp + s"/graft_graph_bench_maint_$tag"
      Dedup.writeSimilarityGraph(docs.filter(col("doc_id") < cut), path)
      Dedup.writeComponentLabels(spark, path)
      Dedup.writeTriangleStats(spark, path)
      Dedup.writeRankScores(spark, path)
      Dedup.writeLpCommunities(spark, path)
      val edges0 = spark.read.parquet(s"$path/edges").count()
      val tSmall = maintainAll(path,
        docs.filter(col("doc_id") >= cut && col("doc_id") < cut + onePct))
      val tBig = maintainAll(path,
        docs.filter(col("doc_id") >= cut + onePct &&
          col("doc_id") < cut + onePct + maxId / 10))
      // the TAKEDOWN row: delete ~1% of the stored docs from the fully
      // maintained artifact (edges + index rewrite + all four sidecars
      // re-lined). The index/edge rewrites are O(stored artifact) by
      // design — this row measures that honestly across the doubling,
      // and the per-batch guidance is to BATCH takedowns like ingest.
      val tDel = timed(Dedup.deleteFromSimilarityGraph(spark, path,
        docs.filter(col("doc_id") < cut && col("doc_id") % 100 === 7)
          .select(col("doc_id"))))
      (s""""maintain_all_$tag":{"edges":$edges0,""" +
        s""""batch_1pct_sec":$tSmall,"batch_10pct_sec":$tBig,""" +
        s""""delete_1pct_sec":$tDel}""", edges0)
    }
    val (maintRow1, _) = maintainCell(c40, "40pct")
    val (maintRow2, _) = maintainCell(c80, "80pct")

    println(s"""{"metric":"sig_index_growth","sf":"$sfDir","batch_rows":$nb,""" +
      s""""index_1x":{"rows":$n1,"build_sec":$tBuild1,"probe_sec":$tProbe1},""" +
      s""""index_2x":{"rows":$n2,"build_sec":$tBuild2,"probe_sec":$tProbe2},""" +
      s""""graph_append_1x":{"edges":$e1,"build_sec":$tGBuild1,"append_sec":$tApp1},""" +
      s""""graph_append_2x":{"edges":$e2,"build_sec":$tGBuild2,"append_sec":$tApp2},""" +
      s""""labels_refresh_1x":{"labels":$l1,"build_sec":$tLBuild1,"refresh_sec":$tLRef1},""" +
      s""""labels_refresh_2x":{"labels":$l2,"build_sec":$tLBuild2,"refresh_sec":$tLRef2},""" +
      s""""tri_refresh_1x":{"nodes":$t1,"build_sec":$tTBuild1,"refresh_sec":$tTRef1},""" +
      s""""tri_refresh_2x":{"nodes":$t2,"build_sec":$tTBuild2,"refresh_sec":$tTRef2},""" +
      s""""rank_warm_1pct":{"build_sec":$tRBuild,"build_rounds":$rBuildRounds,""" +
      s""""refresh_sec":$tRRef,"warm_rounds":$rWarmRounds,""" +
      s""""cold_union_sec":$tRCold,"cold_rounds":$rColdRounds},""" +
      s""""lp_warm_1pct":{"build_sec":$tLpBuild,"build_rounds":$lpBuildRounds,""" +
      s""""refresh_sec":$tLpRef,"warm_rounds":$lpWarmRounds,""" +
      s""""cold_union_sec":$tLpCold,"cold_rounds":$lpColdRounds},""" +
      s""""crossing_append_1x":{"edges":$ex1pre,"crossing_buckets":$nx1,"append_sec":$tX1},""" +
      s""""crossing_append_2x":{"edges":$ex2pre,"crossing_buckets":$nx2,"append_sec":$tX2},""" +
      s"""$maintRow1,$maintRow2}""")
    spark.stop()
  }
}
