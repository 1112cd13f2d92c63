package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Exact triangle counting over an undirected graph — the clustering/
  * community-density primitive of web-corpus curation: a document
  * whose similarity-graph neighborhood closes into triangles sits in
  * a dense near-dup community (template farms, mirror rings), where a
  * high-degree node with NO triangles is a hub stitching unrelated
  * docs (a boilerplate shingle). The triangle count per node is the
  * numerator of the local clustering coefficient.
  *
  * Algorithm: DEGREE ORIENTATION (the standard distributed-triangle
  * construction — Cohen's MapReduce curve / Suri & Vassilvitskii
  * WWW'11): direct every undirected edge from its (degree, id)-
  * smaller endpoint to the larger. Every triangle then has exactly
  * one source node with two out-edges (the wedge), so enumerating
  * out-wedges and semi-joining them against the oriented edge set
  * finds each triangle exactly once — and the out-degree of ANY node
  * under this orientation is O(√m), so the wedge fan-out per node is
  * bounded by m (not by the hub's full degree²): a star node of
  * degree 10⁶ generates ZERO wedges because all its edges point IN.
  * That skew-immunity is why this beats the naive id-ordered 3-way
  * self-join (the oracle's form — identical result set, quadratic on
  * hubs) at scale.
  *
  * Shape at 100 TB: one map-side-combining degree aggregate, two
  * broadcast-free equi-joins to annotate endpoints, one self-join of
  * the oriented edges on src (the wedge build — fan-out Σ outdeg² ≤
  * O(m^1.5) by the orientation bound), one equi-join of wedges
  * against edges on the (dst₁, dst₂) pair, and one exploded count.
  * All joins hash-partition on their keys; nothing is corpus-sized
  * but the edge frames themselves. Output is exact integer counts,
  * so the DuckDB oracle (plain 3-way join over id-ordered pairs)
  * gates it bit-for-bit.
  *
  * Cache lifecycle: the canonical-edge / degree / oriented frames are
  * persisted for the duration of the query and released by the
  * CALLER (`spark.catalog.clearCache()` — Verify, Bench and every
  * spec do this per query), the same caller-releases convention as
  * the similarity family. A long-lived session that never clears the
  * cache accumulates these frames; clear between logical jobs.
  */
object Triangles {

  /** Per-node triangle counts (doc_id, n_tri) for every node that
    * closes at least one triangle. `pairs` is an undirected
    * unique-pair edge list (doc_a < doc_b, distinct). */
  def perNode(pairs: DataFrame): DataFrame = {
    val e = canonicalEdges(pairs)
    perNodeFromEdges(e, degrees(e))
  }

  /** Per-node degrees of a canonical edge frame: (id, dg). */
  private def degrees(e: DataFrame): DataFrame =
    e.select(col("u").as("id")).unionAll(e.select(col("v").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("dg"))

  /** Canonical undirected edges: orientation-normalized (least,
    * greatest) then distinct, so mirrored input pairs (a,b)+(b,a)
    * collapse to one edge and self-loops drop — the robustness the
    * spec claims for reversed/duplicated inputs. */
  private def canonicalEdges(pairs: DataFrame): DataFrame =
    pairs.select(least(col("doc_a"), col("doc_b")).as("u"),
        greatest(col("doc_a"), col("doc_b")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

  private def perNodeFromEdges(e: DataFrame, deg: DataFrame): DataFrame = {
    // orient u→v when (deg, id)(u) < (deg, id)(v); carry the dst's
    // (deg, id) rank so wedge endpoints can be consistently ordered
    val uLess = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val ori = e
      .join(deg.select(col("id").as("u"), col("dg").as("du")), "u")
      .join(deg.select(col("id").as("v"), col("dg").as("dv")), "v")
      .select(
        when(uLess, col("u")).otherwise(col("v")).as("s"),
        when(uLess, col("v")).otherwise(col("u")).as("d"),
        when(uLess, col("dv")).otherwise(col("du")).as("dd"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // out-wedges (s; d1 <* d2 in orientation order), closed into
    // triangles when the oriented edge d1→d2 exists (it can only be
    // oriented that way round: d1 <* d2)
    val wedges = ori.select(col("s"), col("d").as("y"), col("dd").as("dy"))
      .join(ori.select(col("s"), col("d").as("z"), col("dd").as("dz")), "s")
      .filter(col("dy") < col("dz") ||
        (col("dy") === col("dz") && col("y") < col("z")))
      .select(col("s").as("x"), col("y"), col("z"))
    val tri = wedges.join(
      ori.select(col("s").as("y"), col("d").as("z")), Seq("y", "z"), "left_semi")
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).cast("long").as("n_tri"))
  }

  /** LOCAL CLUSTERING COEFFICIENT per node, in exact integer ppm:
    * cc_ppm = 2·n_tri·10⁶ // (deg·(deg−1)) — the fraction of a
    * node's neighbor pairs that are themselves connected. The
    * community-vs-hub separator in one number: a template-farm
    * member scores near 10⁶, a boilerplate hub near 0. Emits every
    * node of the pair graph (n_tri coalesced to 0); degree-1 nodes
    * have no neighbor pair and report 0. Same shape as [[perNode]]
    * plus one degree aggregate and a left join. */
  def clustering(pairs: DataFrame): DataFrame = {
    // ONE persisted canonical edge frame feeds both the degree
    // aggregate and the triangle count — the naive form re-derived
    // the candidate pairs (a second corpus blocking pass at scale)
    val e = canonicalEdges(pairs)
    // ONE degree aggregate serves both the orientation and the output
    // column (the first cut computed it twice — a full extra shuffle)
    val deg = degrees(e).persist(StorageLevel.MEMORY_AND_DISK)
    deg.select(col("id").as("doc_id"), col("dg").cast("long").as("degree"))
      .join(perNodeFromEdges(e, deg), Seq("doc_id"), "left")
      .select(col("doc_id"), col("degree"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
      .withColumn("cc_ppm", when(col("degree") < 2L, 0L)
        .otherwise(graft.text.TextFunctions.intDiv(
          col("n_tri") * 2000000L, col("degree") * (col("degree") - 1L))))
  }
}
