package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.text.TextFunctions

/** Iterative graph computation on DataFrames: fixed-iteration
  * PageRank — the link-analysis scorer web-corpus curation pipelines
  * run over the hyperlink (or similarity) graph to weight documents
  * before sampling. Joins the other graph primitive already in the
  * engine ([[graft.dedup.Dedup.connectedComponents]]' union-find) with
  * the weighted-propagation family.
  *
  * All arithmetic is exact integer math (fixed-point ranks scaled by
  * `scale`, damping as a rational dNum/dDen, every division an
  * IntegralDivide), so the DuckDB oracle reproduces each iteration
  * bit-for-bit — integer division before the sum makes the per-edge
  * contribution order-independent, which a float PageRank never is.
  *
  * Shape at 100 TB: one iteration = one equi-join of the rank frame
  * with the degree-annotated edge list on src (both sides hash-
  * partitioned on the join key; the edge list is persisted ONCE and
  * reused by every iteration, so iterations repartition only the
  * narrow (doc_id, r) rank frame) + one map-side-combining sum by
  * dst + one left join back to the node frame for dangling nodes.
  * K iterations = K such rounds — the inherent shape of power
  * iteration; at cluster scale the rank frame would be checkpointed
  * every few iterations to cut lineage, and the edge list bucketed by
  * src so the per-iteration join co-locates without a shuffle on the
  * edge side. Ranks are conserved-mass bounded: r ≤ base +
  * dNum/dDen · (total in-mass), so with scale=1e12 a LongType rank
  * holds corpora to ~10^6 nodes per connected star; beyond that pass
  * a smaller scale (the math is scale-invariant up to rounding).
  */
object GraphRank {

  /** Fixed-iteration damped PageRank: (doc_id, rank_e12) for every
    * node, where rank_e12 is the fixed-point rank scaled by `scale`.
    * `pairs` is an undirected unique-pair edge list (doc_a, doc_b);
    * isolated nodes converge to the base rank (1-d)·scale. */
  def pageRank(nodes: DataFrame, pairs: DataFrame, iters: Int = 3,
      scale: Long = 1000000000000L, dNum: Long = 85, dDen: Long = 100): DataFrame = {
    val ab = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val edges = ab.union(ab.select(col("dst"), col("src")))
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // persisted once; every iteration's join reuses it
    val edgesDeg = edges.join(deg, "src")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val ids = nodes.select(col("doc_id"))
    val base = scale * (dDen - dNum) / dDen
    var r = ids.select(col("doc_id"), lit(scale).as("r"))
    for (_ <- 0 until iters) {
      val contrib = edgesDeg
        .join(r.withColumnRenamed("doc_id", "src"), "src")
        .select(col("dst"),
          TextFunctions.intDiv(col("r"), col("outdeg")).as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("c"))
      r = ids
        .join(contrib.withColumnRenamed("dst", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"),
          (lit(base) + TextFunctions.intDiv(
            lit(dNum) * coalesce(col("c"), lit(0L)), lit(dDen))).as("r"))
    }
    r.select(col("doc_id"), col("r").as("rank_e12"))
  }
}
