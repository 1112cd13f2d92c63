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
  def perNode(pairs: DataFrame, canonical: Boolean = false): DataFrame = {
    val e = canonicalEdges(pairs, canonical)
    perNodeFromEdges(e, degrees(e))
  }

  /** Per-node degrees of a canonical edge frame: (id, dg). */
  private def degrees(e: DataFrame): DataFrame =
    e.select(col("u").as("id")).unionAll(e.select(col("v").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("dg"))

  /** Canonical undirected edges: orientation-normalized (least,
    * greatest) then distinct, so mirrored input pairs (a,b)+(b,a)
    * collapse to one edge and self-loops drop — the robustness the
    * spec claims for reversed/duplicated inputs. `canonical = true`
    * declares the input ALREADY canonical (doc_a < doc_b, distinct —
    * the stored similarity-graph artifact's invariant) and skips the
    * normalize+distinct pass, a full shuffle of the edge list at any
    * scale; identical result by construction. */
  private def canonicalEdges(pairs: DataFrame,
      canonical: Boolean = false): DataFrame =
    (if (canonical) pairs.select(col("doc_a").as("u"), col("doc_b").as("v"))
     else pairs.select(least(col("doc_a"), col("doc_b")).as("u"),
         greatest(col("doc_a"), col("doc_b")).as("v"))
       .filter(col("u") =!= col("v"))
       .distinct())
      .persist(StorageLevel.MEMORY_AND_DISK)

  private def perNodeFromEdges(e: DataFrame, deg: DataFrame): DataFrame =
    perNodeFromEdgesImpl(e, deg)._1

  /** The per-node count plus the oriented frame it persisted (see
    * [[statsImpl]] for why artifact verbs must release it). */
  private def perNodeFromEdgesImpl(e: DataFrame,
      deg: DataFrame): (DataFrame, DataFrame) = {
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
    (tri.select(explode(array(col("x"), col("y"), col("z"))).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).cast("long").as("n_tri")), ori)
  }

  /** LOCAL CLUSTERING COEFFICIENT per node, in exact integer ppm:
    * cc_ppm = 2·n_tri·10⁶ // (deg·(deg−1)) — the fraction of a
    * node's neighbor pairs that are themselves connected. The
    * community-vs-hub separator in one number: a template-farm
    * member scores near 10⁶, a boilerplate hub near 0. Emits every
    * node of the pair graph (n_tri coalesced to 0); degree-1 nodes
    * have no neighbor pair and report 0. Same shape as [[perNode]]
    * plus one degree aggregate and a left join. */
  def clustering(pairs: DataFrame, canonical: Boolean = false): DataFrame =
    withCc(stats(pairs, canonical))

  /** The cc_ppm column derived from (degree, n_tri) — shared by the
    * live [[clustering]] and the serve path over a [[stats]] sidecar
    * (the ratio is derivable, so the artifact stores only the two
    * maintained integers). */
  def withCc(stats: DataFrame): DataFrame =
    stats.withColumn("cc_ppm", when(col("degree") < 2L, 0L)
      .otherwise(graft.text.TextFunctions.intDiv(
        col("n_tri") * 2000000L, col("degree") * (col("degree") - 1L))))

  /** Per-node DENSITY STATS (doc_id, degree, n_tri) for every node of
    * the pair graph — the maintained core of [[clustering]] (cc_ppm is
    * a derived ratio, see [[withCc]]) and the payload of the
    * incremental triangle sidecar ([[appendStats]]). */
  def stats(pairs: DataFrame, canonical: Boolean = false): DataFrame =
    statsImpl(pairs, canonical)._1

  /** [[stats]] plus the frames it persisted, so an ARTIFACT verb that
    * may run repeatedly against the same path in one session
    * ([[graft.dedup.Dedup.writeTriangleStats]] / the rebuild path of
    * [[graft.dedup.Dedup.refreshTriangleStats]]) can release them
    * after its terminal write instead of leaning on the caller's
    * clearCache. That release is CORRECTNESS, not hygiene: the cached
    * canonical-edge frame's logical plan is a distinct over the
    * artifact's edge scan, and Spark's cache manager matches a LATER
    * read of the SAME path to it (InMemoryFileIndex equality is by
    * root path) — so a refresh after a retraction rewrite would
    * silently serve the PRE-append edge set from cache
    * (TriangleStatsAppendSpec's crossing test caught exactly this). */
  private[graft] def statsImpl(pairs: DataFrame,
      canonical: Boolean = false)
      : (DataFrame, Seq[DataFrame]) = {
    // ONE persisted canonical edge frame feeds both the degree
    // aggregate and the triangle count — the naive form re-derived
    // the candidate pairs (a second corpus blocking pass at scale)
    val e = canonicalEdges(pairs, canonical)
    // ONE degree aggregate serves both the orientation and the output
    // column (the first cut computed it twice — a full extra shuffle)
    val deg = degrees(e).persist(StorageLevel.MEMORY_AND_DISK)
    val (tri, ori) = perNodeFromEdgesImpl(e, deg)
    val out = deg.select(col("id").as("doc_id"), col("dg").cast("long").as("degree"))
      .join(tri, Seq("doc_id"), "left")
      .select(col("doc_id"), col("degree"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
    (out, Seq(e, deg, ori))
  }

  /** Incrementally grow [[stats]] by the batch of NEW edges inside
    * `allPairs` — the triangle-family level-up of
    * [[graft.dedup.Dedup.appendComponents]] (round-15 verdict #1's
    * "every consumer" gap): where the components sidecar maintains
    * WHAT is transitively linked, this maintains each node's local
    * DENSITY (degree, triangle count) across ingest batches, so the
    * clustering-coefficient consumer no longer pays a full-graph
    * wedge enumeration per appended batch.
    *
    * CONTRACT: `allPairs` is the CURRENT canonical unique-pair edge
    * list (doc_a < doc_b, no duplicates — what the similarity-graph
    * artifact stores), `newPred` marks the rows appended since
    * `stored` = [[stats]] over the remaining (old) rows. One list +
    * a predicate makes old/new disjointness structural. Additions
    * only — deletions can REMOVE triangles and are handled one level
    * up ([[graft.dedup.Dedup.refreshTriangleStats]] detects the
    * cap-crossing retraction and rebuilds, the labels-sidecar
    * convention). Under that contract the result equals
    * `stats(allPairs)` exactly (TriangleStatsAppendSpec, including
    * the randomized sweep).
    *
    * Every NEW triangle contains >= 1 new edge; enumerating common
    * neighbors of each new edge's endpoints in the union graph finds
    * a triangle with k new edges k times, so each triangle is
    * counted ONCE at its lexicographically-smallest new edge: from
    * edge (u,v) a closing node w survives only if every OTHER new
    * edge of {u,v,w} is lex-greater than (u,v). Degrees increment by
    * the batch's endpoint counts.
    *
    * Shape at 100 TB: the stored stats frame is NEVER shuffled — the
    * union adjacency is restricted to batch endpoints by broadcast
    * probes (map-side filter over one edge-list scan), the wedge
    * join is batch-edges × bucket-capped degree, and the merge back
    * is a broadcast left join plus a broadcast-anti'd batch-sized
    * union — the [[graft.dedup.Dedup.appendComponents]] shape.
    * Per-batch cost tracks the batch × the cap-bounded degree, not
    * the stored graph. */
  def appendStats(stored: DataFrame, allPairs: DataFrame,
      newPred: org.apache.spark.sql.Column): DataFrame =
    appendStatsImpl(stored, allPairs, newPred)._1

  /** [[appendStats]] plus the batch-sized frames it persisted, so an
    * artifact verb with a terminal action of its own can release them
    * without waiting for the caller's clearCache. */
  private[graft] def appendStatsImpl(stored: DataFrame, allPairs: DataFrame,
      newPred: org.apache.spark.sql.Column)
      : (DataFrame, Seq[DataFrame]) = {
    val e = allPairs.select(col("doc_a").as("u"), col("doc_b").as("v"),
      newPred.as("nw"))
    val ncan = e.filter(col("nw")).select(col("u"), col("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val aff = ncan.select(col("u").as("id"))
      .union(ncan.select(col("v").as("id"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // union edges touching a batch endpoint: one scan, two broadcast
    // marker probes (no shuffle of the stored edge list)
    val touching = e
      .join(broadcast(aff.select(col("id").as("u"), lit(true).as("mu"))),
        Seq("u"), "left")
      .join(broadcast(aff.select(col("id").as("v"), lit(true).as("mv"))),
        Seq("v"), "left")
      .filter(col("mu").isNotNull || col("mv").isNotNull)
      .select(col("u"), col("v"), col("nw"))
    // adjacency keyed by the batch endpoint (both edge directions,
    // then a broadcast semi keeps only src in the batch's node set)
    val sym = touching.select(col("u").as("src"), col("v").as("dst"), col("nw"))
      .unionAll(touching.select(col("v").as("src"), col("u").as("dst"), col("nw")))
      .join(broadcast(aff.select(col("id").as("src"))), Seq("src"), "left_semi")
      .persist(StorageLevel.MEMORY_AND_DISK)
    // wedge close: w adjacent to BOTH endpoints of the new edge
    val j = ncan
      .join(sym.select(col("src").as("u"), col("dst").as("w"),
        col("nw").as("n1")), Seq("u"))
      .join(sym.select(col("src").as("v"), col("dst").as("w"),
        col("nw").as("n2")), Seq("v", "w"))
      .filter(col("w") =!= col("u") && col("w") =!= col("v"))
    def edgeLt(a1: org.apache.spark.sql.Column, b1: org.apache.spark.sql.Column,
        a2: org.apache.spark.sql.Column, b2: org.apache.spark.sql.Column) =
      a1 < a2 || (a1 === a2 && b1 < b2)
    // count the triangle only at its lex-smallest NEW edge
    val tri = j.filter(
      (!col("n1") || edgeLt(col("u"), col("v"),
        least(col("u"), col("w")), greatest(col("u"), col("w")))) &&
      (!col("n2") || edgeLt(col("u"), col("v"),
        least(col("v"), col("w")), greatest(col("v"), col("w")))))
    val triDelta = tri
      .select(explode(array(col("u"), col("v"), col("w"))).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("d_tri"))
    val degDelta = ncan
      .select(explode(array(col("u"), col("v"))).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("d_deg"))
    val delta = degDelta.join(triDelta, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), coalesce(col("d_deg"), lit(0L)).as("d_deg"),
        coalesce(col("d_tri"), lit(0L)).as("d_tri"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val updated = stored.join(broadcast(delta), Seq("doc_id"), "left")
      .select(col("doc_id"),
        (col("degree") + coalesce(col("d_deg"), lit(0L))).as("degree"),
        (col("n_tri") + coalesce(col("d_tri"), lit(0L))).as("n_tri"))
    // delta keys already present in stored: map-side semi, batch-sized
    val hit = stored.select(col("doc_id"))
      .join(broadcast(delta.select(col("doc_id"))), Seq("doc_id"), "left_semi")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val fresh = delta.join(broadcast(hit), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("d_deg").as("degree"), col("d_tri").as("n_tri"))
    (updated.unionByName(fresh), Seq(ncan, aff, sym, delta, hit))
  }
}
