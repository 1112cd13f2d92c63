package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnShims
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.storage.StorageLevel

import graft.dedup.Dedup
import graft.functions.{Curves, DotProductLong, HyperplaneBandKeys}

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two operators:
  *
  *  - [[bruteForceTopK]]: the exact baseline — score every (probe,
  *    corpus) pair, keep the top k per probe. Probes are broadcast (a
  *    probe set is small by definition), the corpus is scanned once,
  *    and the only shuffle carries (probe_id, neighbor_id, score)
  *    triples — tiny rows — partitioned by probe for the top-k window.
  *    Cost is O(|corpus| * |probes|) dot products: the honest price of
  *    exactness, embarrassingly parallel over corpus splits.
  *
  *  - [[annTopK]]: the scale path — banded curve-bucket LSH. Each of
  *    `bands` 4-dim slices of the embedding is quantized to u8 and
  *    Hilbert-encoded (the round-1 codec as the bucketing primitive,
  *    SURVEY §2.3/§7.7); bucket = key >> bucketShift. Candidates are
  *    corpus vectors sharing (band, bucket) — with +-1 multi-probe on
  *    the probe side — re-ranked by the exact quantized dot product.
  *    Everything is equi-joins; no all-pairs stage anywhere.
  *    `bucketShift` is the scale knob: shrink it (finer buckets) as the
  *    corpus grows to hold per-bucket candidate counts constant, the
  *    same way IVF grows nlist with N.
  *
  * Scoring is the dot product over fixed-point quantized values
  * (floor(x * 2^20), exact BIGINT math) so Spark and the DuckDB oracle
  * agree bit-for-bit — float sums would differ by summation order.
  * Measured on the synthetic sf0.01 embeddings (64-dim, near-random —
  * the hard case for any LSH): recall@10 = 0.39 with ~22% of the
  * corpus scored per probe (see SimilaritySpec; brute force = recall
  * 1.0 at 100%).
  */
object Similarity {

  /** Fixed-point scale: 2^20 keeps 64 * (0.53 * 2^20)^2 well inside
    * BIGINT while preserving ~6 decimal digits of each coordinate. */
  val Scale: Long = 1L << 20

  /** Default number of 4-dim band keys (covers dims 0..15). */
  val DefaultBands: Int = 4

  /** Default bucket granularity: 32-bit band key >> 20 -> 4096-bucket
    * space per band (tuned for the sf0.01..sf0.1 corpus; shrink as the
    * corpus grows). */
  val DefaultBucketShift: Int = 20

  /** floor(x * 2^20) per element, exact BIGINT fixed-point. float ->
    * double is exact, double*2^20 is one correctly-rounded IEEE op, so
    * any engine computes the identical integer. */
  def quantize(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * lit(Scale.toDouble)).cast("long"))

  /** Exact integer dot product of two quantized vectors, via the
    * native codegen'd [[graft.functions.DotProductLong]] (the
    * interpreted zip_with+aggregate formulation — kept as
    * [[dotQBuiltin]], the executable SPEC — dominated the exact
    * verify/re-rank stages at ~0.2 us per element). */
  def dotQ(a: Column, b: Column): Column =
    ColumnShims.column(DotProductLong(
      ColumnShims.expression(a), ColumnShims.expression(b)))

  /** Builtin-composed executable SPEC of [[dotQ]] (equality asserted
    * in SimilaritySpec). */
  def dotQBuiltin(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Per-subspace squared L2 distances via the native one-pass
    * [[graft.functions.SubspaceSqDists]] — the PQ encode/ADC
    * primitive. */
  def subspaceSqDists(a: Column, b: Column, m: Int): Column =
    ColumnShims.column(graft.functions.SubspaceSqDists(
      ColumnShims.expression(a), ColumnShims.expression(b), m))

  /** ADC lookup sum of a PQ code against a FLATTENED j-major probe
    * table via the native [[graft.functions.AdcDistance]] — the
    * per-(probe, vector) inner loop of every PQ scan (evaluated
    * probes x corpus times, the expression the sf1 bench point
    * exposed). */
  def adcDistance(codes: Column, tab: Column): Column =
    ColumnShims.column(graft.functions.AdcDistance(
      ColumnShims.expression(codes), ColumnShims.expression(tab)))

  /** Builtin-composed executable SPEC of [[adcDistance]] over the
    * same flattened table (equality asserted in SimilaritySpec). */
  def adcDistanceBuiltin(codes: Column, tab: Column, m: Int): Column =
    (0 until m).map(s =>
      element_at(tab, element_at(codes, s + 1) * m + s + 1)).reduce(_ + _)

  /** Builtin-composed executable SPEC of [[subspaceSqDists]]: width =
    * floor(n/m), trailing elements ignored (equality asserted in
    * SimilaritySpec). */
  def subspaceSqDistsBuiltin(a: Column, b: Column, m: Int): Column = {
    val w = graft.text.TextFunctions.intDiv(size(a).cast("long"), lit(m.toLong)).cast("int")
    transform(sequence(lit(0), lit(m - 1)), s =>
      aggregate(
        zip_with(slice(a, s.cast("int") * w + 1, w), slice(b, s.cast("int") * w + 1, w),
          (x, y) => (x - y) * (x - y)),
        lit(0L), (acc, v) => acc + v))
  }

  /** Float cosine similarity (double math) — for ranking/thresholding
    * where cross-engine bit-equality is not required. */
  def cosine(a: Column, b: Column): Column = {
    def dot(u: Column, v: Column): Column =
      aggregate(zip_with(u, v, (x, y) => x.cast("double") * y.cast("double")),
        lit(0d), (acc, x) => acc + x)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** u8 quantization of one embedding slice for curve bucketing:
    * min(floor((x + 1) * 128), 255) maps [-1, 1] onto [0, 255] — the
    * clamp keeps x = 1.0 (attained by normalized embeddings) from
    * wrapping to bucket 0 next to x = -1.0 (round-3 ADVICE). Stored as
    * BYTE with an explicit two's-complement wrap for values >= 128
    * (ANSI mode rejects a narrowing cast) — the curve codec reads raw
    * bits, so the wrapped byte carries the intended u8 bit pattern
    * (reference semantics: raw-bit reinterpretation). */
  private def u8Slice(vec: Column, startDim: Int, dims: Int): Column =
    transform(slice(vec, startDim + 1, dims), x => {
      val v = least(floor((x.cast("double") + lit(1.0d)) * lit(128.0d)).cast("int"), lit(255))
      when(v >= 128, v - 256).otherwise(v).cast("byte")
    })

  /** Array of `bands` Hilbert band keys (one per 4-dim slice). */
  def bandKeys(vec: Column, bands: Int = DefaultBands): Column =
    array((0 until bands).map(j =>
      Curves.hilbertEncodeArray(u8Slice(vec, j * 4, 4), 4)): _*)

  /** Per-band u8 coordinate arrays of an embedding column `v` — the
    * spatial-probe representation (ints 0..255, pre-wrap). */
  private def bandCoordArr(bands: Int): Column =
    array((0 until bands).map { j =>
      array((0 until 4).map { d =>
        val x = element_at(col("v"), j * 4 + d + 1)
        least(floor((x.cast("double") + lit(1.0d)) * lit(128.0d)).cast("int"), lit(255))
      }: _*)
    }: _*)

  /** (probe_id, band_idx, bucket) rows for SPATIAL multi-probe: each
    * probe's own subcube plus its 2*d axis-adjacent subcubes per band.
    * Because bucketShift is a multiple of the band dimensionality (4),
    * dropping bucketShift bits of a Hilbert key identifies an
    * axis-aligned subcube of side 2^(bucketShift/4) in u8 space, so
    * stepping each coordinate by exactly that side length (clamped to
    * the grid) and re-encoding yields the face-adjacent subcubes'
    * bucket ids.
    *
    * The 9 variants are DATA (an exploded literal (dim, delta) array),
    * not 9 copies of the encode expression: the one-expression-per-
    * variant formulation built a ~36-encode tree whose per-run
    * Catalyst analysis cost ~2.5 s REGARDLESS of data size (measured
    * sf0.001 == sf0.1; docs/PLANS.md round-8 entry). This shape keeps
    * ONE encode expression and moves the fan-out into rows — probe
    * rows only, duplicates from edge clamping dropped by distinct. */
  private[graft] def spatialProbeBuckets(emb: DataFrame, probePred: Column,
      bands: Int, bucketShift: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    spatialBucketsFromCoords(
      emb.select(col(idCol).as("vec_id"), col(vecCol).as("v")).filter(probePred)
        .select(col("vec_id").as("probe_id"),
          posexplode(bandCoordArr(bands)).as(Seq("band_idx", "cc"))),
      bucketShift)

  /** The perturb-and-encode core of spatial multi-probe, over prepared
    * (probe_id, band_idx, cc) coordinate rows — shared by
    * [[spatialProbeBuckets]] (coords from the embedding column) and
    * [[annIndexTopK]] (coords from the stored index, no re-encode of
    * anything corpus-sized). */
  private def spatialBucketsFromCoords(coords: DataFrame, bucketShift: Int): DataFrame = {
    require(bucketShift % 4 == 0 && bucketShift > 0,
      s"spatial probing needs subcube-aligned buckets: bucketShift % 4 == 0, got $bucketShift")
    val step = 1 << (bucketShift / 4)
    val variants = typedLit((-1, 0) +:
      (for (d <- 0 until 4; dl <- Seq(-step, step)) yield (d, dl)))
    val perturbed = transform(col("cc"), (c, i) =>
      when(i === col("pt._1"),
        least(greatest(c + col("pt._2"), lit(0)), lit(255))).otherwise(c))
    val bytes = transform(col("pc"), c =>
      when(c >= 128, c - 256).otherwise(c).cast("byte"))
    coords
      .select(col("probe_id"), col("band_idx"), col("cc"), explode(variants).as("pt"))
      .select(col("probe_id"), col("band_idx"), perturbed.as("pc"))
      .select(col("probe_id"), col("band_idx"),
        shiftright(Curves.hilbertEncodeArray(bytes, 4), bucketShift).as("bucket"))
      .distinct()
  }

  /** Exact top-k neighbors by quantized dot product for every probe
    * row (`probePred` selects probes by vec_id). Output:
    * (probe_id, neighbor_id, dot_q, rnk), rnk in 1..k, ties broken by
    * neighbor_id.
    *
    * CONTRACT (applies to [[annTopK]] and [[ivfTopK]] too): the probe
    * set is broadcast, so `probePred` must select a BOUNDED set —
    * thousands of probes, not a corpus-sized predicate. An unbounded
    * probe set belongs in a different shape (a full self-join, e.g.
    * [[cosinePairs]] for the near-dup case). */
  def bruteForceTopK(emb: DataFrame, probePred: Column, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = emb.select(col(idCol).as("vec_id"), quantize(col(vecCol)).as("qv"))
    val probes = q.filter(probePred)
      .select(col("vec_id").as("probe_id"), col("qv").as("pv"))
    val w = Window.partitionBy("probe_id").orderBy(col("dot_q").desc, col("neighbor_id"))
    q.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"),
        dotQ(col("pv"), col("qv")).as("dot_q"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }

  /** Hard-negative mining for contrastive training: per anchor, the
    * top-k most SIMILAR vectors carrying a DIFFERENT label — the
    * negatives a triplet/InfoNCE objective learns most from (the
    * "hardest" end of Schroff et al. 2015's negative spectrum; random
    * negatives are trivially separable and waste gradient). Emits the
    * labels on both sides so the pair generator downstream can stratify.
    *
    * Exactly [[bruteForceTopK]]'s scale shape — the bounded anchor set
    * broadcasts, the corpus scans ONCE with a codegen'd integer dot
    * per (row, anchor), per-anchor top-k runs as WindowGroupLimit —
    * plus one label inequality riding the same projection (no extra
    * join for the label: it travels with the quantized vector). Same
    * probe-boundedness contract as [[bruteForceTopK]]; for
    * every-vector mining, shard the anchor predicate and union. */
  def hardNegatives(emb: DataFrame, anchorPred: Column, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    val q = emb.select(col(idCol).as("vec_id"), quantize(col(vecCol)).as("qv"),
      col(labelCol).cast("long").as("lbl"))
    val anchors = q.filter(anchorPred)
      .select(col("vec_id").as("anchor_id"), col("qv").as("pv"),
        col("lbl").as("anchor_label"))
    val w = Window.partitionBy("anchor_id")
      .orderBy(col("dot_q").desc, col("negative_id"))
    q.crossJoin(broadcast(anchors))
      .filter(col("lbl") =!= col("anchor_label"))
      .select(col("anchor_id"), col("anchor_label"),
        col("vec_id").as("negative_id"), col("lbl").as("negative_label"),
        dotQ(col("pv"), col("qv")).as("dot_q"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }

  /** Exact cosine RANGE search: every neighbor whose cosine with the
    * probe is >= sqrt(thresholdNum/thresholdDen) — the radius-query
    * twin of [[bruteForceTopK]] (top-k fixes the count, range fixes
    * the quality bar; retrieval-augmented pipelines want the latter
    * when "no good neighbor" must come back EMPTY, not padded).
    * Accept test is [[cosinePairs]]'s exact integer rational: dot >= 0
    * and den * dot^2 >= num * |a|^2 * |b|^2 over the fixed-point
    * quantized vectors — no float compare anywhere, so the result is
    * engine-exact and oracle-gated. Same scale shape as brute force:
    * the bounded probe set broadcasts, the corpus scans once with a
    * codegen'd dot per (row, probe), no corpus shuffle. */
  def rangeSearch(emb: DataFrame, probePred: Column,
      thresholdNum: Long, thresholdDen: Long,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val dec = DecimalType(38, 0)
    val q = emb.select(col(idCol).as("vec_id"), quantize(col(vecCol)).as("qv"))
      .withColumn("n2", dotQ(col("qv"), col("qv")))
    val probes = q.filter(probePred)
      .select(col("vec_id").as("probe_id"), col("qv").as("pv"), col("n2").as("pn2"))
    q.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"),
        dotQ(col("pv"), col("qv")).as("dot_q"), col("n2"), col("pn2"))
      .filter(col("dot_q") >= 0 &&
        col("dot_q").cast(dec) * col("dot_q").cast(dec) * lit(thresholdDen) >=
          col("n2").cast(dec) * col("pn2").cast(dec) * lit(thresholdNum))
      .select(col("probe_id"), col("neighbor_id"), col("dot_q"))
  }

  /** MMR-diversified top-k (Carbonell & Goldstein 1998's maximal
    * marginal relevance) — the retrieval-diversification step a
    * curation pipeline runs when plain top-k returns near-duplicates:
    * greedily select k of the `fetch` most relevant neighbors, each
    * step maximizing `2*MMR = rel(d) - max_{s selected} sim(d, s)`
    * (lambda = 1/2 exactly, so doubled scores stay integers; rel and
    * sim are the fixed-point dot products — deterministic, total
    * tie-order by relevance rank).
    *
    * Shape at 100 TB: stage 1 is [[bruteForceTopK]]'s shortlist shape
    * (corpus x broadcast probes, WindowGroupLimit partial top-fetch) —
    * the only corpus-sized work; stage 2 collapses each probe's
    * shortlist to ONE row of positional arrays and runs the whole
    * greedy selection as a single builtin higher-order-function
    * expression (aggregate over k steps, argmax over positions,
    * zip_with dot products) — no UDF, no driver loop, no per-step
    * action; per-probe cost is k * fetch * k * dims integer ops on
    * fetch*(dims+2) longs of state. Swap stage 1 for any ANN variant
    * ([[pqTopK]], [[ivfSeededTopK]]) at scale — stage 2 only sees the
    * shortlist.
    *
    * Output: (probe_id, neighbor_id, rel_q, mmr_rank) — mmr_rank is
    * the selection order, 1..k. */
  def mmrTopK(emb: DataFrame, probePred: Column, k: Int, fetch: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k >= 1 && fetch >= k, s"need fetch >= k >= 1, got k=$k fetch=$fetch")
    val shortlist = bruteForceTopK(emb, probePred, fetch, idCol, vecCol)
      .join(emb.select(col(idCol).as("neighbor_id"), quantize(col(vecCol)).as("qv")),
        "neighbor_id")
    val g = shortlist
      .groupBy(col("probe_id"))
      .agg(array_sort(collect_list(
        struct(col("rnk"), col("neighbor_id"), col("dot_q"), col("qv")))).as("arr"))

    def entry(p: Column) = element_at(col("arr"), p + 1)
    def qvAt(p: Column) = entry(p).getField("qv")
    def relAt(p: Column) = entry(p).getField("dot_q")
    def dotHof(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

    // greedy selection as ONE expression: positions (0-based, in
    // relevance order) of the k picks. Steps are capped at the
    // shortlist size: a probe with fewer than k candidates (tiny
    // corpus, sparse probePred) selects them all — without the cap the
    // extra steps append the -1 sentinel and element_at(arr, 0) throws
    // at runtime (round-7 ADVICE). size >= 1 here: an empty shortlist
    // produces no group row at all.
    val sel = aggregate(
      sequence(lit(1), least(lit(k), size(col("arr")))),
      array().cast("array<int>"),
      (s, _) => {
        val best = aggregate(
          sequence(lit(0), size(col("arr")) - 1),
          struct(lit(Long.MinValue).as("sc"), lit(-1).as("p")),
          (b, j) => {
            val maxSim = when(size(s) === 0, lit(0L)).otherwise(
              aggregate(s, lit(Long.MinValue),
                (m, p) => greatest(m, dotHof(qvAt(j), qvAt(p)))))
            val score = relAt(j) - maxSim
            // strict '>' keeps the earliest (most relevant) position
            // on ties — a total, engine-independent order
            when(!array_contains(s, j) && score > b.getField("sc"),
              struct(score.as("sc"), j.cast("int").as("p"))).otherwise(b)
          })
        concat(s, array(best.getField("p")))
      })

    g.select(col("probe_id"), col("arr"), posexplode(sel).as(Seq("step", "pos")))
      .select(col("probe_id"),
        element_at(col("arr"), col("pos") + 1).getField("neighbor_id").as("neighbor_id"),
        element_at(col("arr"), col("pos") + 1).getField("dot_q").as("rel_q"),
        (col("step") + 1).cast("long").as("mmr_rank"))
  }

  /** Parameters for [[cosinePairs]]. threshold tau is carried as the
    * exact rational tau^2 = thresholdNum/thresholdDen so the accept
    * test is pure integer math (defaults: 49/400 -> tau = 0.35, tuned
    * to the synthetic near-random corpus; real near-dup pipelines run
    * tau >= 0.85, where the default bands give >85% recall).
    *
    * Scale knobs, same logic as MinHash LSH: `bandBits` sets bucket
    * cardinality per band (2^bandBits — raise it as the corpus grows so
    * per-bucket counts stay bounded); `planes/bandBits` bands set
    * recall; maxBucketSize star-caps pathological buckets
    * ([[graft.dedup.Dedup.cappedBucketPairs]]). */
  final case class CosineParams(
      planes: Int = 48,
      bandBits: Int = 8,
      thresholdNum: Long = 49,
      thresholdDen: Long = 400,
      maxBucketSize: Int = 64) {
    require(planes % bandBits == 0, "planes must be divisible by bandBits")
    val bands: Int = planes / bandBits
  }

  /** Native one-pass band keys ([[graft.functions.HyperplaneBandKeys]])
    * over a quantized vector. */
  def hyperplaneBandKeys(qv: Column, planes: Int, bandBits: Int): Column =
    ColumnShims.column(HyperplaneBandKeys(ColumnShims.expression(qv), planes, bandBits))

  /** Builtin-composed executable SPEC of [[hyperplaneBandKeys]]
    * (equality asserted in SimilaritySpec): plane i's +-1 sign on
    * dimension d is the parity of (1103515245*(i*dims+d+1)) mod 2^31-1. */
  def hyperplaneBandKeysBuiltin(qv: Column, planes: Int, bandBits: Int): Column =
    array((0 until planes / bandBits).map { j =>
      (0 until bandBits).map { r =>
        val i = j * bandBits + r
        val proj = aggregate(
          transform(qv, (v, d) =>
            when((lit(1103515245L) * (lit(i) * size(qv) + d + 1)) % lit(2147483647L) % 2 === 0,
              v).otherwise(-v)),
          lit(0L), (acc, x) => acc + x)
        when(proj >= 0, lit(1 << r)).otherwise(lit(0))
      }.reduce(_ + _)
    }: _*)

  /** Embedding-cosine near-duplicate pairs: all (vec_a < vec_b) whose
    * cosine similarity is >= tau, found via sign-LSH blocking + exact
    * fixed-point verify.
    *
    * Shape (the only one that survives 100 TB): narrow per-row
    * signature projection -> explode bands -> capped equi-join bucket
    * pairs ([[graft.dedup.Dedup.cappedBucketPairs]] — identical skew
    * story to text MinHash dedup) -> exact verify on candidates only.
    * No all-pairs stage; every join is an equi-join.
    *
    * The accept test is exact integer math end-to-end: with q = the
    * 2^20 fixed-point vectors, accept iff dot(qa,qb) >= 0 AND
    * thresholdDen * dot^2 >= thresholdNum * |qa|^2 * |qb|^2 — i.e.
    * cos_q >= tau with tau^2 = num/den, no float rounding anywhere, so
    * the DuckDB oracle (graft.oracle.SimSql.cosinePairs) reproduces the
    * result bit-for-bit. dot <= dims * 2^40 keeps dot^2 * den well
    * inside Decimal(38,0) (Spark) / HUGEINT (DuckDB) for dims <= 4096.
    *
    * Cache lifecycle: same convention as [[annTopK]] — callers release
    * the persisted signature frame after their terminal action. */
  def cosinePairs(emb: DataFrame, p: CosineParams = CosineParams(),
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val dec = DecimalType(38, 0)
    // eagerCache (round-18, see Dedup.eagerCache): the band explode
    // and both verify joins raced the unfilled cache
    val base = Dedup.eagerCache(emb
      .select(col(idCol).as("doc_id"), quantize(col(vecCol)).as("qv"))
      .select(col("doc_id"), col("qv"),
        hyperplaneBandKeys(col("qv"), p.planes, p.bandBits).as("keys"),
        dotQ(col("qv"), col("qv")).as("n2")))
    val bands = base.select(col("doc_id"),
      posexplode(col("keys")).as(Seq("band_idx", "band_hash")))
    val cand = Dedup.cappedBucketPairs(bands, p.maxBucketSize)
    val qa = base.select(col("doc_id").as("vec_a"), col("qv").as("qv_a"), col("n2").as("n2_a"))
    val qb = base.select(col("doc_id").as("vec_b"), col("qv").as("qv_b"), col("n2").as("n2_b"))
    cand.select(col("doc_a").as("vec_a"), col("doc_b").as("vec_b"))
      .join(qa, "vec_a").join(qb, "vec_b")
      .select(col("vec_a"), col("vec_b"),
        dotQ(col("qv_a"), col("qv_b")).as("dot_q"), col("n2_a"), col("n2_b"))
      .filter(col("dot_q") >= 0 &&
        col("dot_q").cast(dec) * col("dot_q").cast(dec) * lit(p.thresholdDen) >=
          col("n2_a").cast(dec) * col("n2_b").cast(dec) * lit(p.thresholdNum))
      .select(col("vec_a"), col("vec_b"), col("dot_q"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the embedding space coarsely, then
    * find near-duplicate PAIRS only within each cluster and keep one
    * representative per connected dup group. Unlike [[cosinePairs]]'
    * sign-LSH blocking (random projections), the blocking here is
    * data-adaptive — the same seeded centroid assignment as
    * [[ivfSeededTopK]] (argmax integer dot over nlist md5-seeded
    * centroids, ties to the smallest list), which keeps the whole
    * operator a pure function of the data and therefore oracle
    * hash-gated (graft.oracle.SimSql.semanticDedup).
    *
    * Stages: assign -> within-cluster candidate pairs (star-capped at
    * maxClusterSize via [[graft.dedup.Dedup.cappedBucketPairs]], the
    * shared skew story) -> exact rational-cosine verify (tau^2 =
    * thresholdNum/thresholdDen, integer math end-to-end) -> min-label
    * connected components ([[graft.dedup.Dedup.connectedComponents]])
    * -> every vector labeled with its semantic canonical.
    *
    * Output: (vec_id, list_id, canonical_id, keep) for EVERY corpus
    * vector; keep = 1 iff vec_id is its group's canonical (the row a
    * pipeline retains). Docs in no dup group are their own canonical.
    *
    * Shape at 100 TB: assignment is corpus x broadcast(nlist) with a
    * partial max-struct agg; candidates are an equi-join on list_id
    * with deterministic star-caps (no all-pairs stage — grow nlist
    * with the corpus so cluster sizes stay bounded, exactly SemDeDup's
    * own k ∝ N prescription); verify cost ∝ candidates; the closure
    * runs on the verified PAIR graph (orders of magnitude smaller than
    * the corpus), lineage-truncated per round.
    *
    * Cache lifecycle: same caller-releases convention as [[annTopK]]. */
  def semanticDedup(emb: DataFrame, nlist: Int = 16,
      thresholdNum: Long = 49, thresholdDen: Long = 400,
      maxClusterSize: Int = 256,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val dec = DecimalType(38, 0)
    // scale-adaptive widen before the quantize (round-17 optimization,
    // see Dedup.widen): a single-row-group embedding file otherwise
    // funnels the quantize + every racing fan-out branch through one
    // task
    val q = Dedup.eagerCache(
      Dedup.widen(emb.select(col(idCol).as("vec_id"), col(vecCol)))
        .select(col("vec_id"), quantize(col(vecCol)).as("qv")))
    val hv = conv(substring(md5(col("vec_id").cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long")
    val cents = q.select(col("vec_id"), col("qv"), hv.as("hv"))
      .orderBy(col("hv"), col("vec_id")).limit(nlist)
      .withColumn("list_id",
        row_number().over(Window.orderBy(col("hv"), col("vec_id"))).cast("long"))
      .select(col("list_id"), col("qv").as("cq"))
    val asg = q.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("list_id"), dotQ(col("qv"), col("cq")).as("cdot"))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("cdot"), (-col("list_id")).as("nl"))).as("mx"))
      .select(col("vec_id"), (-col("mx").getField("nl")).as("list_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val cand = Dedup.cappedBucketPairs(
      asg.select(col("vec_id").as("doc_id"), lit(0).as("band_idx"),
        col("list_id").as("band_hash")),
      maxClusterSize)
    val n2 = q.select(col("vec_id"), col("qv"), dotQ(col("qv"), col("qv")).as("n2"))
    val qa = n2.select(col("vec_id").as("vec_a"), col("qv").as("qv_a"), col("n2").as("n2_a"))
    val qb = n2.select(col("vec_id").as("vec_b"), col("qv").as("qv_b"), col("n2").as("n2_b"))
    val pairs = cand.select(col("doc_a").as("vec_a"), col("doc_b").as("vec_b"))
      .join(qa, "vec_a").join(qb, "vec_b")
      .select(col("vec_a"), col("vec_b"),
        dotQ(col("qv_a"), col("qv_b")).as("dot_q"), col("n2_a"), col("n2_b"))
      .filter(col("dot_q") >= 0 &&
        col("dot_q").cast(dec) * col("dot_q").cast(dec) * lit(thresholdDen) >=
          col("n2_a").cast(dec) * col("n2_b").cast(dec) * lit(thresholdNum))
      .select(col("vec_a"), col("vec_b"))
    val comp = Dedup.connectedComponents(pairs, "vec_a", "vec_b")
    asg.join(comp.withColumnRenamed("id", "vec_id"), Seq("vec_id"), "left")
      .select(col("vec_id"), col("list_id"),
        coalesce(col("lbl"), col("vec_id")).as("canonical_id"))
      .withColumn("keep", when(col("vec_id") === col("canonical_id"), 1L).otherwise(0L))
  }

  /** IVF (inverted-file) approximate top-k: a KMeans coarse quantizer
    * (spark.ml, seeded => deterministic) partitions the corpus into
    * `nlist` inverted lists; each probe scores only the vectors in its
    * `nprobe` nearest lists, re-ranked by the exact fixed-point dot
    * product. Same output shape as [[bruteForceTopK]].
    *
    * The classic scale path next to the LSH variant ([[annTopK]]):
    * candidates per probe ~ corpus * nprobe / nlist, tuned by growing
    * nlist with the corpus (train the quantizer on a sample at scale —
    * here the corpus itself; training is the one driver-side step, the
    * standard IVF build cost). Assignment and probing are narrow
    * projections + equi-joins on list_id; centroids (~nlist * dims * 8
    * bytes) broadcast to rank probe lists.
    *
    * KMeans centroids are not reproducible in SQL, so the raw
    * neighbor list has no DuckDB oracle; q_sim_ivf is gated through
    * the quantizer-invariant [[ivfAudit]] contract instead, and
    * SimilaritySpec pins recall on clustered data and determinism.
    * Measured on the near-random sf0.01 embeddings (the hard case):
    * recall@10 = 0.60 scoring ~nprobe/nlist = 25% of the corpus —
    * vs 0.39 at ~22% for the curve-LSH [[annTopK]] on the same data.
    *
    * Cache lifecycle: same caller-releases convention as [[annTopK]]. */
  def ivfTopK(emb: DataFrame, probePred: Column, k: Int,
      nlist: Int = 16, nprobe: Int = 4, seed: Long = 42L,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    ivfTopKWithCand(emb, probePred, k, nlist, nprobe, seed, idCol, vecCol)
      .drop("n_cand")

  /** [[ivfTopK]] carrying each probe's per-probe CANDIDATE COUNT
    * (`n_cand`) alongside the emitted neighbors — what [[ivfAudit]]
    * needs to gate "exactly min(k, candidates) rows per probe"
    * without replaying the quantizer. */
  private def ivfTopKWithCand(emb: DataFrame, probePred: Column, k: Int,
      nlist: Int = 16, nprobe: Int = 4, seed: Long = 42L,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val base = emb.select(
        col(idCol).as("vec_id"),
        quantize(col(vecCol)).as("qv"),
        org.apache.spark.ml.functions.array_to_vector(col(vecCol)).as("features"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val model = new org.apache.spark.ml.clustering.KMeans()
      .setK(nlist).setSeed(seed).setMaxIter(10)
      .setFeaturesCol("features").setPredictionCol("list_id")
      .fit(base.select("features"))
    val assigned = model.transform(base).select(col("vec_id"), col("qv"), col("list_id"))
    // centroids quantized with the shared fixed-point convention, so
    // probe-to-list ranking is exact integer math like everything else
    val cents = model.clusterCenters.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toArray.map(x => math.floor(x * Scale.toDouble).toLong)) }
      .toDF("list_id", "cq")
    val probeQ = base.filter(probePred).select(col("vec_id").as("probe_id"), col("qv").as("pv"))
    val wl = Window.partitionBy("probe_id").orderBy(col("cdot").desc, col("list_id"))
    val probeLists = probeQ.crossJoin(broadcast(cents))
      .select(col("probe_id"), col("pv"), col("list_id"), dotQ(col("pv"), col("cq")).as("cdot"))
      .withColumn("lrnk", row_number().over(wl)).filter(col("lrnk") <= nprobe)
      .select("probe_id", "pv", "list_id")
    val w = Window.partitionBy("probe_id").orderBy(col("dot_q").desc, col("neighbor_id"))
    val wc = Window.partitionBy("probe_id")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    broadcast(probeLists)
      .join(assigned, "list_id")
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"), dotQ(col("pv"), col("qv")).as("dot_q"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("n_cand", count(lit(1)).over(wc))
      .filter(col("rnk") <= k)
  }

  /** QUANTIZER-INVARIANT audit of [[ivfTopK]] — the driver-checkable
    * contract of an ANN whose quantizer is not SQL-reproducible.
    *
    * The KMeans centroids decide WHICH neighbors come back (covered
    * by the hash-gated deterministic twin [[ivfSeededTopK]] and the
    * recall audit), but every OTHER property of a correct IVF result
    * is invariant to them and independently recomputable: the probe
    * set is exactly `probePred`, each probe returns exactly k rows,
    * every reported dot_q equals the exact fixed-point dot product
    * re-derived from the base table, ranks are the dense 1..k
    * ordering by (dot desc, neighbor asc), the row count per probe is
    * exactly min(k, candidates in the probed lists), and the probe
    * never returns itself. This wrapper re-verifies all of that
    * against the corpus and emits per-probe BOOLEAN contract columns,
    * so the DuckDB oracle is the constant contract row per probe — a
    * real gate (a missing probe, an unexplained short list, a
    * corrupted distance, a broken ranking, or a self-match each flips
    * a flag) replacing the old rows-only no-oracle row for q_sim_ivf.
    *
    * The count contract is `n_neighbors == least(k, n_cand)` with
    * n_cand carried out of the scoring pass itself
    * ([[ivfTopKWithCand]]) — NOT a constant k: KMeans lists can be
    * arbitrarily small (fuzz seed 1001: a boundary-vector probe's
    * nprobe lists held 6 non-self candidates at dims=64, the exact
    * conservative false failure the round-13 ADVICE predicted), and a
    * constant-k oracle row cannot distinguish a legitimately thin
    * neighborhood from a dropped row. Remaining precondition: a probe
    * whose probed lists are EMPTY of other vectors vanishes from the
    * output entirely and fails the per-probe row gate — that needs a
    * corpus of fewer than ~nprobe vectors, below any meaningful use.
    *
    * Shape at 100 TB: the IVF output is probes * k rows; the two
    * re-verification joins hash on vec_id against the corpus (the
    * same probe-side shape as the index probes) and the final
    * aggregate is probes-sized. */
  def ivfAudit(emb: DataFrame, probePred: Column, k: Int,
      nlist: Int = 16, nprobe: Int = 4, seed: Long = 42L,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val out = ivfTopKWithCand(emb, probePred, k, nlist, nprobe, seed, idCol, vecCol)
    val pv = emb.select(col(idCol).as("probe_id"), quantize(col(vecCol)).as("apv"))
    val nv = emb.select(col(idCol).as("neighbor_id"), quantize(col(vecCol)).as("anv"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("dot_q").desc, col("neighbor_id"))
    out
      .join(pv, "probe_id").join(nv, "neighbor_id")
      .withColumn("rrnk", row_number().over(w).cast("long"))
      .groupBy(col("probe_id"))
      .agg(count(lit(1)).as("nn"),
        max(col("n_cand")).as("nc"),
        sum(when(dotQ(col("apv"), col("anv")) === col("dot_q"), 1L)
          .otherwise(0L)).as("nd"),
        sum(when(col("rrnk") === col("rnk"), 1L).otherwise(0L)).as("nr"),
        sum(when(col("neighbor_id") === col("probe_id"), 1L)
          .otherwise(0L)).as("n_self"))
      .select(col("probe_id"),
        when(col("nn") === least(lit(k.toLong), col("nc")), 1L)
          .otherwise(0L).as("count_ok"),
        when(col("nd") === col("nn"), 1L).otherwise(0L).as("dots_ok"),
        when(col("nr") === col("nn"), 1L).otherwise(0L).as("ranks_ok"),
        col("n_self"))
  }

  /** Deterministic IVF: the same inverted-file shape as [[ivfTopK]]
    * but with a coarse quantizer that is a pure function of the data —
    * the centroids are the `nlist` corpus vectors with the smallest
    * (md5(vec_id), vec_id), i.e. a uniform deterministic sample of the
    * corpus used as zero-iteration spherical-kmeans seeds. Every stage
    * is exact integer math, so unlike the KMeans variant this one has a
    * full DuckDB oracle (graft.oracle.SimSql.ivfSeededTopK) and is
    * hash-gated end-to-end.
    *
    * Scale shape: the centroid pick is a TakeOrderedAndProject (nlist
    * rows through a per-partition heap, no full sort); assignment
    * scores corpus x broadcast(nlist) narrowly and reduces with a
    * PARTIAL max-struct aggregate — map-side combine leaves one row
    * per vector per mapper, where a corpus-wide window would shuffle
    * nlist rows per vector; probing and scoring are equi-joins on
    * list_id. Candidates per probe ~ corpus * nprobe / nlist, tuned by
    * growing nlist with the corpus like any IVF.
    *
    * Cache lifecycle: same caller-releases convention as [[annTopK]]. */
  def ivfSeededTopK(emb: DataFrame, probePred: Column, k: Int,
      nlist: Int = 16, nprobe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = graft.dedup.Dedup.eagerCache(
      emb.select(col(idCol).as("vec_id"), quantize(col(vecCol)).as("qv")))
    val hv = conv(substring(md5(col("vec_id").cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long")
    // nlist rows: the single-partition window is over the limit result
    val cents = q.select(col("vec_id"), col("qv"), hv.as("hv"))
      .orderBy(col("hv"), col("vec_id")).limit(nlist)
      .withColumn("list_id",
        row_number().over(Window.orderBy(col("hv"), col("vec_id"))).cast("long"))
      .select(col("list_id"), col("qv").as("cq"))
    // argmax over lists as a partial aggregate: max of (cdot, -list_id)
    // picks the highest dot, ties to the smallest list_id
    val assigned = q.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("list_id"), dotQ(col("qv"), col("cq")).as("cdot"))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("cdot"), (-col("list_id")).as("nl"))).as("m"))
      .select(col("vec_id"), (-col("m").getField("nl")).as("list_id"))
      .join(q, "vec_id")
    val probeQ = q.filter(probePred).select(col("vec_id").as("probe_id"), col("qv").as("pv"))
    val wl = Window.partitionBy("probe_id").orderBy(col("cdot").desc, col("list_id"))
    val probeLists = probeQ.crossJoin(broadcast(cents))
      .select(col("probe_id"), col("pv"), col("list_id"), dotQ(col("pv"), col("cq")).as("cdot"))
      .withColumn("lrnk", row_number().over(wl)).filter(col("lrnk") <= nprobe)
      .select("probe_id", "pv", "list_id")
    val w = Window.partitionBy("probe_id").orderBy(col("dot_q").desc, col("neighbor_id"))
    broadcast(probeLists)
      .join(assigned, "list_id")
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"),
        dotQ(col("pv"), col("qv")).as("dot_q"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }

  /** Seeded product-quantization (PQ) top-k — the memory-compressed
    * ANN path: each vector is encoded as `m` small codes (one per
    * 4-dim subspace, here m=16 over 64 dims → 16 ints ~ 16 bytes
    * packed, vs 256 bytes of floats), probes score candidates by
    * asymmetric distance computation (ADC: m table lookups instead of
    * dims multiplies), and the top `reRank` candidates get an exact
    * re-rank. The classic Jegou et al. 2011 shape.
    *
    * Like [[ivfSeededTopK]], the codebooks are a PURE FUNCTION of the
    * data — the `ncent` corpus vectors with the smallest
    * (md5(vec_id), vec_id) provide, per subspace, their subvectors as
    * centroids — so every stage is exact integer math and the DuckDB
    * oracle reproduces the result bit-for-bit (graft.oracle.SimSql.
    * pqSeededTopK). Encoding argmin ties break to the smallest
    * centroid id via the `dist * 32 + (j-1)` packed min (dist <=
    * 4 * 2^42 keeps the pack well inside a long).
    *
    * Shape at 100 TB: encoding is corpus x broadcast(ncent seeds) with
    * a partial hash-agg argmin (one row per vector out of the
    * mappers); ADC scans the CODES frame (m ints/vector — the point
    * of PQ: the scan reads ~16 bytes/vector, not the embedding) x
    * broadcast probe tables; candidate cut is WindowGroupLimit; exact
    * re-rank touches `reRank` vectors per probe. */
  def pqTopK(emb: DataFrame, probePred: Column, k: Int,
      m: Int = 16, ncent: Int = 16, reRank: Int = 40,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = graft.dedup.Dedup.eagerCache(
      emb.select(col(idCol).as("vec_id"), quantize(col(vecCol)).as("qv")))
    val (seeds, codes) = pqArtifacts(q, m, ncent)
    val probes = q.filter(probePred).select(col("vec_id").as("probe_id"), col("qv").as("pv"))
    pqProbe(q, seeds, codes, probes, k, m, reRank)
  }

  /** Seed codebook + PQ codes from a quantized (vec_id, qv) frame —
    * the index derivation shared by [[pqTopK]] (per run) and
    * [[pqIndexBuild]] (write once). Caller persists `q`; both outputs
    * are derived from it (codebook = the ncent hash-seeded vectors'
    * subvectors; codes = per-subspace packed argmin over corpus x
    * broadcast(seeds), one row per vector out of the mappers). */
  private def pqArtifacts(q: DataFrame, m: Int, ncent: Int): (DataFrame, DataFrame) = {
    require(ncent <= 32L, s"ncent=$ncent exceeds the tie-break pack width")
    val hv = conv(substring(md5(col("vec_id").cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long")
    val seeds = q.select(col("vec_id"), col("qv"), hv.as("hv"))
      .orderBy(col("hv"), col("vec_id")).limit(ncent)
      .withColumn("j", row_number().over(Window.orderBy(col("hv"), col("vec_id"))).cast("long"))
      .select(col("j"), col("qv").as("cq"))
    (seeds, pqEncode(q, seeds, m))
  }

  /** PQ-encode a quantized (vec_id, qv) frame against a FIXED (j, cq)
    * codebook: per-subspace squared L2 distances ||x_s - c_s||^2 via
    * the native one-pass expression ([[subspaceSqDistsBuiltin]] is the
    * executable SPEC, equality asserted in SimilaritySpec), packed
    * `dist*32 + (j-1)` argmin tie-break. Shared by [[pqArtifacts]]
    * (codebook derived from the same corpus) and [[pqIndexAppend]]
    * (codebook read from the stored index). */
  private def pqEncode(q: DataFrame, seeds: DataFrame, m: Int): DataFrame = {
    val pad = 32L
    val codeAggs = (0 until m).map(s =>
      min(element_at(col("ds"), s + 1) * pad + (col("j") - 1)).as(s"c$s"))
    q.crossJoin(broadcast(seeds))
      .select(col("vec_id"), col("j"), subspaceSqDists(col("qv"), col("cq"), m).as("ds"))
      .groupBy(col("vec_id"))
      .agg(codeAggs.head, codeAggs.tail: _*)
      .select(col("vec_id"),
        array((0 until m).map(s => (col(s"c$s") % pad).cast("int")): _*).as("codes"))
  }

  /** ADC scan + exact re-rank over prepared index frames — the probe
    * stage shared by [[pqTopK]] and [[pqIndexTopK]]. Every join that
    * touches a corpus-sized frame (`codes`, `q`) is a broadcast of the
    * bounded side (ADC tables, the reRank-capped candidate list, the
    * probe set), so the corpus side never shuffles; the candidate cut
    * is WindowGroupLimit (PlanShapeSpec pins the shape). */
  private def pqProbe(q: DataFrame, seeds: DataFrame, codes: DataFrame,
      probes: DataFrame, k: Int, m: Int, reRank: Int): DataFrame = {
    // per-probe ADC tables FLATTENED j-major: tab[(j-1)*m + s] =
    // ||p_s - c_{j,s}||^2 — the native AdcDistance layout (one flat
    // primitive array per probe instead of a nested array<array>)
    val ptab = probes.crossJoin(broadcast(seeds))
      .select(col("probe_id"), col("j"), subspaceSqDists(col("pv"), col("cq"), m).as("ds"))
      .groupBy(col("probe_id"))
      .agg(flatten(transform(array_sort(collect_list(struct(col("j"), col("ds")))),
        r => r.getField("ds"))).as("tab"))
    val wA = Window.partitionBy("probe_id").orderBy(col("adist"), col("neighbor_id"))
    val cand = codes.crossJoin(broadcast(ptab))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"),
        adcDistance(col("codes"), col("tab")).as("adist"))
      .withColumn("arn", row_number().over(wA)).filter(col("arn") <= reRank)
      .select("probe_id", "neighbor_id")
    val w = Window.partitionBy("probe_id").orderBy(col("dot_q").desc, col("neighbor_id"))
    broadcast(cand)
      .join(q.withColumnRenamed("vec_id", "neighbor_id").withColumnRenamed("qv", "nv"),
        "neighbor_id")
      .join(broadcast(probes), "probe_id")
      .select(col("probe_id"), col("neighbor_id"), dotQ(col("pv"), col("nv")).as("dot_q"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }

  /** Build the persisted PQ index ONCE — the write-once serving shape
    * (the [[graft.layout.Layout.writeBucketed]] pattern applied to
    * similarity): three parquet artifacts under `path` — `vectors`
    * (quantized corpus), `seeds` (codebook), `codes` (m small ints per
    * vector). At 100 TB the build pays the one corpus-sized encode;
    * every later probe run starts from the artifacts with ZERO
    * re-encode ([[pqIndexTopK]]). Parquet (not a bucketed catalog
    * table) because no probe-side join is keyed on vec_id ranges —
    * the probe path broadcasts the bounded side everywhere, so
    * co-location buys nothing; columnar scan of the 16-byte codes
    * column is the win. */
  def pqIndexBuild(emb: DataFrame, path: String, m: Int = 16, ncent: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val q = emb.select(col(idCol).as("vec_id"), quantize(col(vecCol)).as("qv"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val (seeds, codes) = pqArtifacts(q, m, ncent)
      q.write.mode("overwrite").parquet(s"$path/vectors")
      seeds.write.mode("overwrite").parquet(s"$path/seeds")
      codes.write.mode("overwrite").parquet(s"$path/codes")
    } finally { q.unpersist(); () }
  }

  /** Append a batch of new vectors to a [[pqIndexBuild]] index by
    * encoding them against the STORED codebook — the production PQ
    * growth semantics (FAISS's add-after-train): the codebook is
    * frozen at build time, appended vectors get codes in that
    * codebook, and the index is periodically rebuilt when the corpus
    * has drifted far enough from the training snapshot. Unlike the
    * signature/ANN indexes this is NOT equivalent to a from-scratch
    * build of the union (a rebuild would pick codebook seeds from the
    * union — that is exactly the quantization-drift trade being made);
    * it IS exactly reproducible, so `q_sim_pq_append` hash-gates the
    * whole lifecycle against an oracle whose codebook CTE is pinned to
    * the build-time corpus. */
  def pqIndexAppend(emb: DataFrame, path: String, m: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val spark = emb.sparkSession
    val seeds = spark.read.parquet(s"$path/seeds")
    val q = emb.select(col(idCol).as("vec_id"), quantize(col(vecCol)).as("qv"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      q.write.mode("append").parquet(s"$path/vectors")
      pqEncode(q, seeds, m).write.mode("append").parquet(s"$path/codes")
    } finally { q.unpersist(); () }
  }

  /** Probe a [[pqIndexBuild]] index: same math, output, and oracle as
    * [[pqTopK]], but the corpus is never re-encoded — the scan side is
    * the persisted codes/vectors tables and every corpus-touching join
    * broadcasts its bounded side (shape pinned in PlanShapeSpec). The
    * production serving split: build amortized once, probes pay only
    * ADC-scan + re-rank. */
  def pqIndexTopK(spark: SparkSession, path: String, probePred: Column, k: Int,
      m: Int = 16, reRank: Int = 40): DataFrame = {
    val q = spark.read.parquet(s"$path/vectors")
    val seeds = spark.read.parquet(s"$path/seeds")
    val codes = spark.read.parquet(s"$path/codes")
    val probes = q.filter(probePred)
      .select(col("vec_id").as("probe_id"), col("qv").as("pv"))
    pqProbe(q, seeds, codes, probes, k, m, reRank)
  }

  /** Seeded IVF-PQ top-k — the full Jegou et al. 2011 IVFADC
    * composite, combining [[ivfSeededTopK]]'s inverted file with
    * [[pqTopK]]'s code compression, on RESIDUALS: every vector is
    * assigned to its best coarse centroid (argmax integer dot, nlist
    * seeded centroids), its residual r = x - c is PQ-encoded against a
    * residual codebook (the ncent seed vectors' own residuals), and a
    * probe scores only the codes stored in its nprobe best lists via a
    * per-(probe, list) ADC table built from the probe's residual in
    * that list. Candidates cut at reRank by approximate distance, then
    * exact integer-dot re-rank.
    *
    * Everything stays exact integer math (residuals are integer
    * differences of quantized vectors; |r_i| <= 2^21 keeps each
    * subspace distance <= 4 * 2^42, same packed-argmin bound as
    * [[pqTopK]]), so the full composite is oracle hash-gated
    * (graft.oracle.SimSql.ivfPqTopK).
    *
    * Shape at 100 TB — the production ANN layout: the scan side reads
    * ~nprobe/nlist of the CODES frame (16 ints/vector) instead of the
    * whole embedding table — IVF prunes the scan, PQ compresses what
    * remains; assignment and encode are corpus x broadcast(seeds) with
    * partial-agg argmax/argmin (one row per vector out of the
    * mappers); ADC tables are (probes x nprobe) rows, broadcast;
    * shortlist is WindowGroupLimit; exact re-rank touches reRank
    * vectors per probe.
    *
    * Cache lifecycle: same caller-releases convention as [[annTopK]]. */
  def ivfPqTopK(emb: DataFrame, probePred: Column, k: Int,
      nlist: Int = 16, nprobe: Int = 4, m: Int = 16, ncent: Int = 16,
      reRank: Int = 40,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = graft.dedup.Dedup.eagerCache(
      emb.select(col(idCol).as("vec_id"), quantize(col(vecCol)).as("qv")))
    val (cents, seeds, codes) = ivfPqArtifacts(q, nlist, m, ncent)
    val probes = q.filter(probePred)
      .select(col("vec_id").as("probe_id"), col("qv").as("pv"))
    ivfPqProbe(q, cents, seeds, codes, probes, k, nprobe, m, reRank)
  }

  /** Coarse centroids + residual codebook + residual PQ codes from a
    * quantized (vec_id, qv) frame — the index derivation shared by
    * [[ivfPqTopK]] (per run) and [[ivfPqIndexBuild]] (write once).
    * All three are pure functions of the corpus. Caller persists `q`. */
  private def ivfPqArtifacts(q: DataFrame, nlist: Int, m: Int, ncent: Int)
      : (DataFrame, DataFrame, DataFrame) = {
    require(ncent <= 32L, s"ncent=$ncent exceeds the tie-break pack width")
    val hv = conv(substring(md5(col("vec_id").cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long")
    val cents = q.select(col("vec_id"), col("qv"), hv.as("hv"))
      .orderBy(col("hv"), col("vec_id")).limit(nlist)
      .withColumn("list_id",
        row_number().over(Window.orderBy(col("hv"), col("vec_id"))).cast("long"))
      .select(col("list_id"), col("qv").as("cq"))
    val resid = graft.dedup.Dedup.eagerCache(ivfAssignResiduals(q, cents)
      .withColumn("hv", hv))
    // residual codebook: the ncent seed vectors' OWN residuals
    val seeds = resid.orderBy(col("hv"), col("vec_id")).limit(ncent)
      .withColumn("j", row_number().over(Window.orderBy(col("hv"), col("vec_id"))).cast("long"))
      .select(col("j"), col("rv").as("cr"))
    (cents, seeds, residCodes(resid, seeds, m))
  }

  /** Coarse-assign a quantized (vec_id, qv) frame to its best centroid
    * (argmax integer dot, ties to the lower list) and compute integer
    * residuals r = x - c(list) — against a FIXED (list_id, cq)
    * centroid frame. Shared by [[ivfPqArtifacts]] (centroids derived
    * from the same corpus) and [[ivfPqIndexAppend]] (centroids read
    * from the stored index). */
  private def ivfAssignResiduals(q: DataFrame, cents: DataFrame): DataFrame = {
    val asg = q.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("list_id"), dotQ(col("qv"), col("cq")).as("cdot"))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("cdot"), (-col("list_id")).as("nl"))).as("mx"))
      .select(col("vec_id"), (-col("mx").getField("nl")).as("list_id"))
    // residual r = x - c(list): a narrow zip_with after broadcast joins
    q.join(asg, "vec_id").join(broadcast(cents), "list_id")
      .select(col("vec_id"), col("list_id"),
        zip_with(col("qv"), col("cq"), (a, b) => a - b).as("rv"))
  }

  /** Residual-PQ codes of a (vec_id, list_id, rv) frame against a
    * FIXED (j, cr) residual codebook — the packed-argmin encode shared
    * by build and append. */
  private def residCodes(resid: DataFrame, seeds: DataFrame, m: Int): DataFrame = {
    val pad = 32L
    val codeAggs = (0 until m).map(s =>
      min(element_at(col("ds"), s + 1) * pad + (col("j") - 1)).as(s"c$s"))
    resid.crossJoin(broadcast(seeds))
      .select(col("vec_id"), col("list_id"), col("j"),
        subspaceSqDists(col("rv"), col("cr"), m).as("ds"))
      .groupBy(col("vec_id"), col("list_id"))
      .agg(codeAggs.head, codeAggs.tail: _*)
      .select(col("vec_id"), col("list_id"),
        array((0 until m).map(s => (col(s"c$s") % pad).cast("int")): _*).as("codes"))
  }

  /** Probed-list ADC scan + exact re-rank over prepared IVF-PQ frames —
    * the probe stage shared by [[ivfPqTopK]] and [[ivfPqIndexTopK]].
    * The scan side reads ~nprobe/nlist of the codes frame; every
    * corpus-touching join broadcasts its bounded side. */
  private def ivfPqProbe(q: DataFrame, cents: DataFrame, seeds: DataFrame,
      codes: DataFrame, probes: DataFrame, k: Int, nprobe: Int, m: Int,
      reRank: Int): DataFrame = {
    val wl = Window.partitionBy("probe_id").orderBy(col("cdot").desc, col("list_id"))
    val probeLists = probes.crossJoin(broadcast(cents))
      .select(col("probe_id"), col("pv"), col("list_id"), col("cq"),
        dotQ(col("pv"), col("cq")).as("cdot"))
      .withColumn("lrnk", row_number().over(wl)).filter(col("lrnk") <= nprobe)
      .select(col("probe_id"), col("list_id"),
        zip_with(col("pv"), col("cq"), (a, b) => a - b).as("prv"))
    // ADC tables per (probe, list) over the probe's residual IN that
    // list, FLATTENED j-major for the native AdcDistance lookup
    val ptab = probeLists.crossJoin(broadcast(seeds))
      .select(col("probe_id"), col("list_id"), col("j"),
        subspaceSqDists(col("prv"), col("cr"), m).as("ds"))
      .groupBy(col("probe_id"), col("list_id"))
      .agg(flatten(transform(array_sort(collect_list(struct(col("j"), col("ds")))),
        r => r.getField("ds"))).as("tab"))
    val wA = Window.partitionBy("probe_id").orderBy(col("adist"), col("neighbor_id"))
    val cand = codes.join(broadcast(ptab), "list_id") // IVF: only probed lists scanned
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"),
        adcDistance(col("codes"), col("tab")).as("adist"))
      .withColumn("arn", row_number().over(wA)).filter(col("arn") <= reRank)
      .select("probe_id", "neighbor_id")
    val w = Window.partitionBy("probe_id").orderBy(col("dot_q").desc, col("neighbor_id"))
    cand
      .join(q.withColumnRenamed("vec_id", "neighbor_id").withColumnRenamed("qv", "nv"),
        "neighbor_id")
      .join(probes, "probe_id")
      .select(col("probe_id"), col("neighbor_id"), dotQ(col("pv"), col("nv")).as("dot_q"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }

  /** Build the persisted IVF-PQ index ONCE — the production ANN
    * serving shape ([[pqIndexBuild]]'s write-once split applied to the
    * full IVFADC composite, round-8 verdict ask #6). Artifacts under
    * `path`: `vectors` (quantized corpus), `cents` (coarse centroids),
    * `seeds` (residual codebook), `codes` (list assignment + m small
    * ints per vector). The build pays the one corpus-sized assign +
    * residual-encode; probes start from the artifacts with zero
    * re-encode and scan only their probed lists' codes. */
  def ivfPqIndexBuild(emb: DataFrame, path: String,
      nlist: Int = 16, m: Int = 16, ncent: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val q = emb.select(col(idCol).as("vec_id"), quantize(col(vecCol)).as("qv"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val (cents, seeds, codes) = ivfPqArtifacts(q, nlist, m, ncent)
      q.write.mode("overwrite").parquet(s"$path/vectors")
      cents.write.mode("overwrite").parquet(s"$path/cents")
      seeds.write.mode("overwrite").parquet(s"$path/seeds")
      codes.write.mode("overwrite").parquet(s"$path/codes")
    } finally { q.unpersist(); () }
  }

  /** Per-list occupancy of a stored [[ivfPqIndexBuild]] index — the
    * coarse quantizer's skew diagnostic (round-9 verdict stretch #8).
    * The seeded centroids carry NO balance guarantee, and probe cost
    * is proportional to the PROBED lists' code counts — so a hot list
    * is a latency tail that per-query timings hide. One narrow
    * aggregate over the stored `codes` (never the vectors): per list
    * its count and corpus fraction, plus the index-wide imbalance
    * factor max/mean (milli units, exact integer math so the gate is
    * hash-exact) replicated on every row for a one-scan report.
    * Operational rule (BASELINE.md): rebuild with more lists or a
    * refined quantizer when imbalance drifts past the probe-latency
    * budget; append-only growth cannot rebalance (frozen centroids). */
  def ivfListStats(spark: SparkSession, path: String): DataFrame = {
    val per = spark.read.parquet(s"$path/codes")
      .groupBy(col("list_id")).agg(count(lit(1)).as("n"))
    val tot = per.agg(sum(col("n")).as("total"), max(col("n")).as("max_n"),
      count(lit(1)).as("n_lists"))
    per.crossJoin(broadcast(tot))
      .select(col("list_id"), col("n"),
        graft.text.TextFunctions.intDiv(col("n") * lit(1000000L), col("total"))
          .as("frac_ppm"),
        graft.text.TextFunctions.intDiv(
          col("max_n") * col("n_lists") * lit(1000L), col("total"))
          .as("imbalance_milli"))
  }

  /** Embedding-table integrity audit — the pre-flight check before any
    * index build or ANN serving over a 100 TB embedding store: per
    * label, the vector count, the number of DISTINCT dimensionalities
    * (anything but 1 means a corrupted or mixed-model export), the
    * zero-vector count (dead encoder outputs that poison cosine math),
    * and min/max/sum of the exact fixed-point squared L2 norm — a
    * drifting norm distribution is the standard signal of an encoder
    * version change.
    *
    * All exact integer math on the shared [[quantize]] convention, so
    * the oracle reproduces every cell bit-for-bit: per-row norm² =
    * dotQ(qv, qv) fits a BIGINT for dims ≤ 4096 (≤ 2^40 per element);
    * the cross-row sum is Decimal(38,0)/HUGEINT.
    *
    * Shape at 100 TB: one narrow projection + ONE map-side-combining
    * hash aggregate keyed on the labels-sized group — no joins, no
    * windows, nothing corpus-sized ever leaves the mappers. */
  def embAudit(emb: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", labelCol: String = "label"): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    emb.select(col(labelCol).cast("long").as("label"),
        size(col(vecCol)).cast("long").as("dim"),
        dotQ(quantize(col(vecCol)), quantize(col(vecCol))).as("norm2"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        countDistinct(col("dim")).as("n_dims"),
        sum(when(col("norm2") === 0L, 1L).otherwise(0L)).as("n_zero"),
        min(col("norm2")).as("min_norm2"),
        max(col("norm2")).as("max_norm2"),
        // >64-bit totals cross the gate as canonical digit strings:
        // a DECIMAL(38,0) output column diverges in the driver's
        // hash pipeline (docs/COMPAT.md §7)
        sum(col("norm2").cast(dec)).cast("string").as("sum_norm2"))
  }

  /** Append a batch of new vectors to a [[ivfPqIndexBuild]] index with
    * BOTH quantizers frozen — the coarse centroids assign the new
    * vectors to their lists and the stored residual codebook encodes
    * them, the same add-after-train semantics as [[pqIndexAppend]]
    * (and the same trade: rebuilds absorb quantizer drift; exactly
    * reproducible, so `q_sim_ivfpq_append` hash-gates the lifecycle
    * against an oracle whose centroid AND codebook CTEs are pinned to
    * the build-time corpus). */
  def ivfPqIndexAppend(emb: DataFrame, path: String, m: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val spark = emb.sparkSession
    val cents = spark.read.parquet(s"$path/cents")
    val seeds = spark.read.parquet(s"$path/seeds")
    val q = emb.select(col(idCol).as("vec_id"), quantize(col(vecCol)).as("qv"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      q.write.mode("append").parquet(s"$path/vectors")
      residCodes(ivfAssignResiduals(q, cents), seeds, m)
        .write.mode("append").parquet(s"$path/codes")
    } finally { q.unpersist(); () }
  }

  /** Probe a [[ivfPqIndexBuild]] index: same math, output, and oracle
    * as [[ivfPqTopK]], but assignment, residuals, and codes are read
    * from the artifacts — the corpus is never re-encoded, and the ADC
    * scan still touches only the probed lists' code rows. */
  def ivfPqIndexTopK(spark: SparkSession, path: String, probePred: Column, k: Int,
      nprobe: Int = 4, m: Int = 16, reRank: Int = 40): DataFrame = {
    val q = spark.read.parquet(s"$path/vectors")
    val cents = spark.read.parquet(s"$path/cents")
    val seeds = spark.read.parquet(s"$path/seeds")
    val codes = spark.read.parquet(s"$path/codes")
    val probes = q.filter(probePred)
      .select(col("vec_id").as("probe_id"), col("qv").as("pv"))
    ivfPqProbe(q, cents, seeds, codes, probes, k, nprobe, m, reRank)
  }

  /** Approximate top-k via banded curve buckets + exact re-rank; same
    * output shape as [[bruteForceTopK]] (rnk over the candidate set
    * only).
    *
    * Cache lifecycle: the (qv, band keys) frame is persisted so the
    * bucket explode and both re-rank joins share one computation; the
    * returned frame is lazy, so callers release it after their terminal
    * action (`spark.catalog.clearCache()`, as Bench/Verify do) — same
    * convention as [[graft.dedup.Dedup.minhashPairs]] (round-3 ADVICE). */
  def annTopK(emb: DataFrame, probePred: Column, k: Int,
      bands: Int = DefaultBands, bucketShift: Int = DefaultBucketShift,
      idCol: String = "vec_id", vecCol: String = "embedding",
      spatialProbe: Boolean = false): DataFrame = {
    val base = graft.dedup.Dedup.eagerCache(emb.select(
      col(idCol).as("vec_id"),
      quantize(col(vecCol)).as("qv"),
      bandKeys(col(vecCol), bands).as("keys")))
    val buckets = base.select(col("vec_id"),
      posexplode(transform(col("keys"), key => shiftright(key, bucketShift)))
        .as(Seq("band_idx", "bucket")))
    // multi-probe on the probe side keeps the join an equi-join:
    // +-1 ALONG THE CURVE by default; with spatialProbe, the 2*d
    // axis-adjacent subcubes IN SPACE (see [[spatialBandBuckets]]) —
    // curve neighbors are only a subset of spatial neighbors, which is
    // exactly the recall gap multi-probe closes
    val probeBuckets =
      if (!spatialProbe)
        buckets.filter(probePred)
          .select(col("vec_id").as("probe_id"), col("band_idx"),
            explode(array(col("bucket") - 1, col("bucket"), col("bucket") + 1)).as("bucket"))
      else
        spatialProbeBuckets(emb, probePred, bands, bucketShift, idCol, vecCol)
    val cand = broadcast(probeBuckets)
      .join(buckets, Seq("band_idx", "bucket"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"))
      .distinct()
    val qv = base.select(col("vec_id"), col("qv"))
    annRerank(cand, qv, k)
  }

  /** Exact re-rank of an ANN candidate list against a quantized
    * (vec_id, qv) frame — shared tail of [[annTopK]] and
    * [[annIndexTopK]]. */
  private def annRerank(cand: DataFrame, qv: DataFrame, k: Int): DataFrame =
    annRerank(cand, qv, qv, k)

  /** Re-rank with distinct probe-side and neighbor-side vector frames
    * — the ingest-loop case, where probes are a batch NOT (yet) in the
    * stored index. */
  private def annRerank(cand: DataFrame, probeQv: DataFrame,
      neighborQv: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("probe_id").orderBy(col("dot_q").desc, col("neighbor_id"))
    cand
      .join(probeQv.withColumnRenamed("vec_id", "probe_id")
        .withColumnRenamed("qv", "pv"), "probe_id")
      .join(neighborQv.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")
      .select(col("probe_id"), col("neighbor_id"), dotQ(col("pv"), col("qv")).as("dot_q"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }

  /** Build the persisted curve-LSH bucket index ONCE, at FULL key
    * granularity — the write-once serving split for [[annTopK]]
    * (round-8 verdict Missing #2; the [[pqIndexBuild]] pattern applied
    * to the curve buckets). Artifacts under `path`:
    *
    *  - `vectors/` (vec_id, qv) — quantized corpus for exact re-rank.
    *  - `keys/`    (vec_id, band_idx, key, cc) — each vector's FULL
    *    32-bit Hilbert band key plus its band's u8 coordinates.
    *
    * Storing the un-shifted key is the point: bucket granularity is
    * `key >> bucketShift`, a narrow projection of the stored column,
    * so ONE index serves every recall target whose bucketShift the
    * caller picks at QUERY time — coarser probing never re-encodes the
    * corpus (BASELINE.md's multi-probe serving claim, now backed by an
    * artifact). The coordinate column feeds spatial multi-probe's
    * perturb-and-encode on PROBE rows only. */
  def annIndexBuild(emb: DataFrame, path: String, bands: Int = DefaultBands,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit =
    annIndexWrite(emb, path, bands, idCol, vecCol, "overwrite")

  /** Append a batch of new vectors to an existing [[annIndexBuild]]
    * index — the similarity twin of
    * [[graft.dedup.Dedup.appendSignatureIndex]]. Exactness is free
    * here: keys, coordinates, and quantized vectors are all pure
    * PER-ROW functions (no corpus-level statistics), so build+append
    * is trivially identical to a from-scratch build of the union
    * (SimilaritySpec asserts anyway). */
  def annIndexAppend(emb: DataFrame, path: String, bands: Int = DefaultBands,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit =
    annIndexWrite(emb, path, bands, idCol, vecCol, "append")

  /** Per-label embedding SCATTER audit — the class-separability
    * pre-flight run before trusting labels for hard-negative mining
    * or stratified eval: for each label, the exact fixed-point
    * within-class scatter numerator n·Σ‖x‖² − ‖Σx‖² (= n² times the
    * variance around the class centroid — the variance identity
    * cleared of divisions, same move as q_events_anomaly's sigma
    * test, so the result is oracle-gated bit-for-bit where a float
    * variance never is) alongside ‖Σx‖² (the centroid-direction
    * energy). A label whose scatter_num/n² dwarfs the others' is
    * mislabeled or multi-modal — the number that decides whether
    * label-stratified operators can trust this column.
    *
    * Shape at 100 TB: one narrow posexplode to (label, dim, q) and
    * TWO map-side-combining hash aggregates ((label, dim) sums, then
    * label rollups) joined to the labels-sized per-vector rollup —
    * no window, no corpus join; Decimal(38,0) throughout because a
    * squared per-dim sum overflows BIGINT at corpus scale. */
  def embScatter(emb: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", labelCol: String = "label"): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val perVec = emb.select(col(labelCol).cast("long").as("label"),
        quantize(col(vecCol)).as("qv"))
      .select(col("label"), col("qv"), dotQ(col("qv"), col("qv")).as("norm2"))
    val dimSums = perVec
      .select(col("label"), posexplode(col("qv")).as(Seq("dim_idx", "q")))
      .groupBy(col("label"), col("dim_idx"))
      .agg(sum(col("q")).cast(dec).as("sq"))
    val centroid = dimSums.groupBy(col("label"))
      .agg(sum(col("sq") * col("sq")).as("c2"))
    perVec.groupBy(col("label"))
      .agg(count(lit(1)).cast(dec).as("n"), sum(col("norm2").cast(dec)).as("s2"))
      .join(centroid, "label")
      .select(col("label"), col("n").cast("long").as("n_vecs"),
        // digit strings, not DECIMAL(38,0) — docs/COMPAT.md §7
        col("c2").cast(dec).cast("string").as("centroid_num"),
        (col("n") * col("s2") - col("c2")).cast(dec).cast("string")
          .as("scatter_num"))
  }

  /** BETWEEN-class centroid GEOMETRY — the complement of
    * [[embScatter]]'s within-class number: for every label pair, the
    * exact integer dot product of the class SUM vectors (= n_a·n_b
    * times the centroid dot — divisions cleared, same move as the
    * scatter numerator) next to each class's own sum-vector energy
    * ‖Σx‖². A pair whose dot approaches the geometric mean of its
    * energies has nearly collinear centroids — entangled classes that
    * label-stratified operators (hard-negative mining, per-label
    * recall audits) should not treat as separable. All >64-bit totals
    * cross the gate as canonical digit strings (COMPAT §7).
    *
    * Shape at 100 TB: the corpus appears ONLY in the (label, dim)
    * sum aggregate (map-side-combining, labels·d rows out); the
    * pairwise join and energy rollup run on that labels·d-row frame
    * regardless of corpus size. */
  def embCentroids(emb: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", labelCol: String = "label"): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val s = emb.select(col(labelCol).cast("long").as("label"),
        posexplode(quantize(col(vecCol))).as(Seq("dim_idx", "q")))
      .groupBy(col("label"), col("dim_idx"))
      .agg(sum(col("q")).cast(dec).as("sq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n2 = s.groupBy(col("label"))
      .agg(sum(col("sq") * col("sq")).cast(dec).as("c2"))
    s.select(col("label").as("label_a"), col("dim_idx"), col("sq").as("sa"))
      .join(s.select(col("label").as("label_b"), col("dim_idx"),
        col("sq").as("sb")), "dim_idx")
      .filter(col("label_a") < col("label_b"))
      .groupBy(col("label_a"), col("label_b"))
      .agg(sum(col("sa") * col("sb")).cast(dec).as("dot"))
      .join(broadcast(n2.select(col("label").as("label_a"),
        col("c2").as("na2"))), "label_a")
      .join(broadcast(n2.select(col("label").as("label_b"),
        col("c2").as("nb2"))), "label_b")
      .select(col("label_a"), col("label_b"),
        col("dot").cast("string").as("dot_num"),
        col("na2").cast("string").as("na2"),
        col("nb2").cast("string").as("nb2"))
  }

  /** INT8 scalar-quantization (SQ8) audit — the decision run before
    * shrinking an embedding store 4× (float32 → uint8 codes): affine
    * per-dimension quantization to the 0..255 grid over the exact
    * corpus min/max, reporting per dimension the grid bounds, how
    * many of the 256 codes the corpus actually occupies, and the
    * worst/total reconstruction error. A dimension whose max_abs_err
    * dwarfs the others (outlier-stretched range) or whose n_codes is
    * tiny (degenerate spread) tells you to clip or drop it before
    * quantizing. All arithmetic rides the shared [[quantize]]
    * fixed-point convention — code = (q − min)·255 // span,
    * reconstruction = min + code·span // 255 — so the DuckDB oracle
    * gates every error bit-for-bit, which a float SQ audit never is.
    *
    * Shape at 100 TB: two corpus passes by construction (exact
    * min/max must precede the error pass — the inherent shape of
    * exact SQ training); each pass is a narrow posexplode feeding a
    * map-side-combining d-group aggregate, and the range frame joins
    * back BROADCAST (d rows). sum_abs_err is a BIGINT: per-element
    * error is bounded by span/255 < 2^21, so overflow needs ~2^42
    * corpus rows — past that, emit digit strings per COMPAT §7. */
  def sqQuantAudit(emb: DataFrame, vecCol: String = "embedding"): DataFrame = {
    import graft.text.TextFunctions.intDiv
    val qd = emb.select(posexplode(quantize(col(vecCol))).as(Seq("dim_idx", "q")))
    val rng = qd.groupBy(col("dim_idx"))
      .agg(min(col("q")).as("qmin"), max(col("q")).as("qmax"))
    qd.join(broadcast(rng), "dim_idx")
      .withColumn("span", col("qmax") - col("qmin"))
      .withColumn("code", when(col("span") === 0L, 0L)
        .otherwise(intDiv((col("q") - col("qmin")) * 255L, col("span"))))
      .withColumn("rec", col("qmin") + when(col("span") === 0L, 0L)
        .otherwise(intDiv(col("code") * col("span"), lit(255L))))
      .withColumn("err", abs(col("q") - col("rec")))
      .groupBy(col("dim_idx"))
      .agg(min(col("qmin")).as("qmin"), min(col("qmax")).as("qmax"),
        countDistinct(col("code")).cast("long").as("n_codes"),
        max(col("err")).as("max_abs_err"),
        sum(col("err")).cast("long").as("sum_abs_err"))
      .select(col("dim_idx").cast("long").as("dim_idx"), col("qmin"),
        col("qmax"), col("n_codes"), col("max_abs_err"), col("sum_abs_err"))
  }

  /** Embedding-COLLAPSE audit: the dominant principal direction of
    * the corpus's (uncentered) second-moment Gram matrix G = Σ q·qᵀ,
    * by `iters` fixed power iterations in exact integer math — an
    * anisotropic ("collapsed") embedding space ranks every cosine
    * query by nearly the same direction, so this is the audit run
    * before trusting cosine retrieval or SemDeDup on a new embedding
    * column. All arithmetic is the shared [[quantize]] fixed-point
    * convention with Decimal(38,0) intermediates: the Gram build is
    * one d²-cell map-side-combining aggregate, each iteration one
    * matvec (d²-row join + d-row aggregate) and a max-abs
    * normalization to ±1e6 via IntegralDivide (truncation-toward-zero
    * division, which DuckDB's integer `//` matches even for negative
    * components), so the DuckDB oracle reproduces every iteration
    * bit-for-bit — a power iteration that hash-gates, which a float
    * eigensolver never is. G is PSD, so iterating from the all-ones
    * vector converges monotonically (no sign oscillation).
    *
    * Shape at 100 TB: the corpus appears ONLY in the Gram build —
    * d² partial sums combined map-side, one d-sized row per
    * partition; the iterations run on the d²-cell frame (KBs for
    * d=64..1024) regardless of corpus size. */
  def embDominantDirection(emb: DataFrame, iters: Int = 3,
      vecCol: String = "embedding"): DataFrame = {
    // ONE partition for the mirrored Gram (round-18): the frame is
    // d²-bounded (KBs at any corpus size — dimension, not corpus,
    // scale), but it inherited 2 x shuffle-width partitions from the
    // mirror union, so every power-iteration stage launched ~64 tiny
    // tasks per round (profiled: 4 x 8 s executor-run stages moving
    // 87 KB). Exact Decimal sums are order-independent, so placement
    // cannot change any result. eagerCache: the 3 iteration branches
    // raced the unfilled cache.
    val g = graft.dedup.Dedup.eagerCache(
      gramPartial(emb, vecCol).repartition(1))
    powerIterate(g, iters)
  }

  /** The shared fixed-point power-iteration core over a merged
    * d²-cell Gram frame (i, j, gij Decimal(38,0)). */
  private def powerIterate(g: DataFrame, iters: Int): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    var v = g.select(col("j").as("i")).distinct()
      .select(col("i"), lit(1000000L).cast(dec).as("vi"))
    // the whole-frame max as a WINDOW over the d-row iterate, not a
    // separate agg + crossJoin branch: a branch re-evaluates the
    // unpersisted iteration chain once per use, doubling work per
    // iteration (measured 5.4 s for 3 iterations; windowed, sub-s) —
    // d rows in one window partition is trivially safe for d ≤ ~10^5
    val whole = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    for (_ <- 1 to iters) {
      // normalize the magnitude back to ±1e6 so iterates stay inside
      // Decimal(38,0) at any corpus size; greatest(…,1) guards the
      // all-zero degenerate corpus
      // the iterate is d rows — broadcast it so the persisted Gram
      // frame joins map-side and never re-exchanges
      v = g.join(broadcast(v.select(col("i").as("j"), col("vi"))), "j")
        .groupBy(col("i")).agg(sum(col("gij") * col("vi")).as("wi"))
        .withColumn("mx",
          greatest(max(abs(col("wi"))).over(whole), lit(1L).cast(dec)))
        .select(col("i"),
          graft.text.TextFunctions.intDiv(
            col("wi") * lit(1000000L), col("mx")).cast(dec).as("vi"))
    }
    v.select(col("i").cast("long").as("dim_idx"),
      col("vi").cast("long").as("v_e6"))
  }

  /** Persisted Gram-PARTIAL artifact for [[embDominantDirection]] —
    * the embedding audit joins the sketch family's strongest append
    * regime: G = Σ q·qᵀ is a plain sum over rows, so the stored
    * artifact is per-batch d²-cell PARTIAL frames, appends only ADD
    * files (no read-modify-write), and the read-time merge (sum per
    * (i,j) cell) is associative/commutative — build + any append
    * sequence serves IDENTICALLY to a from-scratch full-corpus build,
    * gated by the PLAIN [[embDominantDirection]] oracle. At 100 TB
    * the nightly audit becomes: append the day's partials (cost ∝
    * the batch), re-iterate on the KB-sized merged frame. */
  def gramBuild(emb: DataFrame, path: String,
      vecCol: String = "embedding"): Unit =
    gramPartial(emb, vecCol).write.mode("overwrite").parquet(path)

  /** Pure file-add growth of a [[gramBuild]] artifact. */
  def gramAppend(emb: DataFrame, path: String,
      vecCol: String = "embedding"): Unit =
    gramPartial(emb, vecCol).write.mode("append").parquet(path)

  // idCol was dropped from this family when the build became a
  // per-row generator: the Gram sum never touches an id
  private def gramPartial(emb: DataFrame, vecCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    // per-row outer product as a MAP-SIDE double generator over the
    // UPPER triangle (the slice starts at element i, so j = i + pos):
    // no shuffle touches the N·d exploded frame — the former
    // self-join on vec_id exchanged it twice — and symmetry halves
    // the generated rows; the mirror below runs on the d²/2-cell
    // AGGREGATED frame, so it is free at any corpus size.
    // Scale-adaptive widen first (round-17, see Dedup.widen): the d²/2
    // generator is pure CPU, and a single-row-group input otherwise
    // runs it on one core (measured 1.3 s of q_emb_direction's 3.7 s,
    // twice — two racing consumers of the unfilled Gram cache)
    val qv0 = graft.dedup.Dedup.widen(emb.select(col(vecCol)))
      .select(quantize(col(vecCol)).as("qv"))
      .select(col("qv"), posexplode(col("qv")).as(Seq("i", "qi")))
      .select(col("i"), col("qi"),
        posexplode(slice(col("qv"), col("i") + 1, size(col("qv")) - col("i")))
          .as(Seq("pos", "qj")))
      .select(col("i"), (col("i") + col("pos")).as("j"),
        (col("qi") * col("qj")).cast(dec).as("p"))
      .groupBy(col("i"), col("j")).agg(sum(col("p")).as("gij"))
    // eagerCache, not a bare persist (round-18): the mirror union's
    // two branches raced the unfilled cache and re-ran the corpus-
    // sized d²/2 generator each (profiled: two ~13 s executor-run
    // stages at sf0.1); one fill, both branches read the AGGREGATED
    // d²/2-cell frame (KBs at any corpus size). Released by the
    // caller's clearCache.
    val qv = graft.dedup.Dedup.eagerCache(qv0)
    qv.unionAll(qv.where(col("j") > col("i"))
      .select(col("j").as("i"), col("i").as("j"), col("gij")))
  }

  /** Serve the dominant direction from a persisted Gram artifact:
    * merge the stored partials (one KB-sized sum aggregate — the
    * corpus is never touched), then the same power iteration as
    * [[embDominantDirection]], bit-for-bit. */
  def directionFromGram(spark: org.apache.spark.sql.SparkSession,
      path: String, iters: Int = 3): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    // recursiveFileLookup: flat build/append files plus per-batch
    // subdirectories committed atomically by the streaming ingest
    // eagerCache + ONE partition (round-18, see embDominantDirection):
    // the power iteration references the d²-bounded merged Gram every
    // round — fill once, as a single partition, before the loop plans
    val g = graft.dedup.Dedup.eagerCache(
      spark.read.option("recursiveFileLookup", "true").parquet(path)
        .groupBy(col("i"), col("j"))
        .agg(sum(col("gij")).cast(dec).as("gij"))
        .repartition(1))
    powerIterate(g, iters)
  }

  /** DELETE vectors from a persisted index by filtering the given
    * per-row tables (vec_id is the row key in each) and swapping every
    * rewritten directory in — all `_compacting` writes materialize
    * before any swap, per the [[graft.dedup.Dedup.compactSignatureIndex]]
    * discipline. Trained tables (seeds, cents) are deliberately NOT in
    * the list: codebooks are frozen parameters (the add-after-train
    * regime), see the per-index delete verbs. */
  private def deleteVecRows(spark: org.apache.spark.sql.SparkSession,
      path: String, subdirs: Seq[String], deletedIds: DataFrame,
      idCol: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val del = deletedIds.select(col(idCol).as("vec_id")).distinct()
    subdirs.foreach { sub =>
      val src = spark.read.parquet(s"$path/$sub")
      val cols = src.columns.map(col)
      src.join(broadcast(del), Seq("vec_id"), "left_anti")
        .select(cols: _*)
        .write.mode("overwrite").parquet(s"$path/${sub}_compacting")
    }
    subdirs.foreach { sub =>
      graft.core.DirSwap.swap(fs,
        new org.apache.hadoop.fs.Path(s"$path/$sub"),
        new org.apache.hadoop.fs.Path(s"$path/${sub}_compacting"))
    }
  }

  /** DELETE vectors from an [[annIndexBuild]] index — the takedown
    * verb of the per-row-pure ANN family (round-16 verdict #1): keys,
    * coordinates and quantized vectors are each pure functions of
    * their own row, so deletion is a pure file filter of `vectors/`
    * and `keys/`, and the result IS a from-scratch build over the
    * survivors (SimilaritySpec asserts probe equality — the strongest
    * delete regime, same as the postings index). Absent ids are a
    * no-op; cost ∝ the index, never the corpus. */
  def annIndexDelete(spark: org.apache.spark.sql.SparkSession,
      path: String, deletedIds: DataFrame, idCol: String = "vec_id"): Unit =
    deleteVecRows(spark, path, Seq("vectors", "keys"), deletedIds, idCol)

  /** DELETE vectors from a [[pqIndexBuild]] index — FAISS
    * `remove_ids` semantics: the stored rows (vectors, codes) of the
    * deleted ids are filtered away while the CODEBOOK stays frozen
    * (it is a trained parameter, exactly like [[pqIndexAppend]]'s
    * add-after-train regime — a from-scratch rebuild over survivors
    * would retrain seeds, which is the periodic-rebuild decision, not
    * the takedown's). Serve contract (spec'd): a deleted vector never
    * appears as probe or neighbor again, and every surviving probe's
    * result equals the pre-delete result with deleted neighbors
    * filtered and ranks re-densified. */
  def pqIndexDelete(spark: org.apache.spark.sql.SparkSession,
      path: String, deletedIds: DataFrame, idCol: String = "vec_id"): Unit =
    deleteVecRows(spark, path, Seq("vectors", "codes"), deletedIds, idCol)

  /** DELETE vectors from an [[ivfPqIndexBuild]] index — the
    * [[pqIndexDelete]] semantics with both quantizers frozen (coarse
    * centroids AND residual codebook): rows leave `vectors/` and
    * `codes/`, the trained tables stay. */
  def ivfPqIndexDelete(spark: org.apache.spark.sql.SparkSession,
      path: String, deletedIds: DataFrame, idCol: String = "vec_id"): Unit =
    deleteVecRows(spark, path, Seq("vectors", "codes"), deletedIds, idCol)

  /** DELETE vectors from a [[gramBuild]] artifact — the sum-merge
    * family's subtraction verb ([[graft.text.CorpusOps.deleteLmIndex]]
    * convention): append the departed vectors' Gram partials NEGATED
    * (a pure file add; Decimal cell sums are exact, so build +
    * appends + deletes serves bit-identically to a from-scratch build
    * over the survivors — spec'd). `emb` must be the deleted vectors
    * themselves (the takedown pipeline holds the payload it is
    * removing), under the same must-have-been-ingested contract as
    * every subtraction delete. */
  def gramDelete(emb: DataFrame, path: String,
      vecCol: String = "embedding"): Unit = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    gramPartial(emb, vecCol)
      .select(col("i"), col("j"), (-col("gij")).cast(dec).as("gij"))
      .write.mode("append").parquet(path)
  }

  /** COMPACT a [[gramBuild]] artifact grown by appends, deletes and
    * streamed batches: materialize [[directionFromGram]]'s read-time
    * merge ONCE — one exact Decimal row per (i, j) cell, ZERO cells
    * kept (unlike the count compactors a Gram cell is legitimately
    * zero or negative: entries are sums of signed quantized products,
    * and a from-scratch build emits every d² cell) — and swap the
    * directory in crash-safely. Stream idempotence survives: the
    * streamed batches' `batch_<id>` data directories are recreated
    * EMPTY in the compacted root, so [[graft.streaming.AtomicIngest]]'s
    * re-delivery check (`exists(batch_<id>)`) still skips re-delivered
    * batches while the recursive read finds no rows in them. After
    * compaction the artifact content equals a from-scratch
    * [[gramBuild]] over the surviving vectors cell-for-cell (spec'd)
    * and read cost is d² rows in one file set regardless of the
    * append/delete history — at 100 TB the nightly audit's merge cost
    * stays flat instead of tracking ingest cadence. Run BETWEEN
    * batches, like every [[graft.core.DirSwap]] compactor (an
    * in-flight staging commit racing the swap loses its staging dir
    * and crash-retries — the documented pause contract). */
  def compactGram(spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val batchDirs = fs.listStatus(root).toSeq
      .filter { st =>
        val n = st.getPath.getName
        st.isDirectory && !n.startsWith("_") && !n.startsWith(".")
      }
      .map(_.getPath.getName)
    val tmp = path + "_compacting"
    val tmpPath = new org.apache.hadoop.fs.Path(tmp)
    fs.delete(tmpPath, true)
    spark.read.option("recursiveFileLookup", "true").parquet(path)
      .groupBy(col("i"), col("j"))
      .agg(sum(col("gij")).cast(dec).as("gij"))
      .write.mode("overwrite").parquet(tmp)
    batchDirs.foreach(n => fs.mkdirs(new org.apache.hadoop.fs.Path(tmpPath, n)))
    graft.core.DirSwap.swap(fs, root, tmpPath)
  }

  /** Compact a grown ANN bucket index: re-cluster the keys table by
    * (band_idx, key) and rewrite the vectors table, so probes prune
    * by row-group min/max again instead of touching every appended
    * file. Purely physical — keys/coords/quantized vectors are
    * per-row-pure, so the merge has NO logical component (unlike
    * [[graft.dedup.Dedup.compactSignatureIndex]]'s partial
    * collapse); SimilaritySpec asserts probe equality. Cost ∝ the
    * index, never the corpus; per-subdirectory rename swap. */
  def compactAnnIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def finish(sub: String): Unit =
      graft.core.DirSwap.swap(fs,
        new org.apache.hadoop.fs.Path(s"$path/$sub"),
        new org.apache.hadoop.fs.Path(s"$path/${sub}_compacting"))
    spark.read.parquet(s"$path/keys")
      .repartitionByRange(col("band_idx"), col("key"))
      .sortWithinPartitions(col("band_idx"), col("key"), col("vec_id"))
      .write.mode("overwrite").parquet(s"$path/keys_compacting")
    spark.read.parquet(s"$path/vectors")
      .write.mode("overwrite").parquet(s"$path/vectors_compacting")
    finish("keys"); finish("vectors")
  }

  private def annIndexWrite(emb: DataFrame, path: String, bands: Int,
      idCol: String, vecCol: String, mode: String): Unit = {
    val base = emb.select(col(idCol).as("vec_id"), col(vecCol).as("v"))
      .select(col("vec_id"), quantize(col("v")).as("qv"),
        bandKeys(col("v"), bands).as("keys"), bandCoordArr(bands).as("coords"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      base.select(col("vec_id"), col("qv")).write.mode(mode).parquet(s"$path/vectors")
      base.select(col("vec_id"),
          posexplode(arrays_zip(col("keys"), col("coords"))).as(Seq("band_idx", "kc")))
        .select(col("vec_id"), col("band_idx"),
          col("kc").getField("keys").as("key"), col("kc").getField("coords").as("cc"))
        .write.mode(mode).parquet(s"$path/keys")
    } finally { base.unpersist(); () }
  }

  /** Probe a [[annIndexBuild]] index: same math, output, and oracle as
    * [[annTopK]] at the same bucketShift, but the corpus is never
    * re-encoded — corpus buckets are `stored key >> bucketShift` (a
    * narrow projection of the keys artifact), spatial multi-probe
    * widening runs against the FIXED index by perturbing only the
    * PROBE rows' stored coordinates, and the re-rank reads the stored
    * quantized vectors. Build amortized once per corpus snapshot;
    * probes pay candidate join + re-rank only. */
  /** Probe an [[annIndexBuild]] index with a BATCH of query vectors
    * that are NOT (yet) in the index — the streaming-ingest probe
    * ([[graft.streaming.StreamSim.ingestTopK]]): batch rows encode
    * per-row (band keys + quantization, cost ∝ the batch, the same
    * pure functions the index stores), candidates come from the
    * STORED bucket tables via a broadcast equi-join (±1 bucket
    * multi-probe, [[annIndexTopK]]'s default widening), and the exact
    * re-rank reads neighbor vectors from the stored artifact and
    * probe vectors from the batch. The corpus is never re-encoded;
    * index-side work is a narrow columnar scan. Output (probe_id,
    * neighbor_id, dot_q, rnk) — identical semantics to appending the
    * batch AFTER probing, so probe-then-append per micro-batch equals
    * the sequential batch lifecycle (StreamingSpec asserts). */
  def annIndexTopKBatch(batch: DataFrame, path: String, k: Int,
      bands: Int = DefaultBands, bucketShift: Int = DefaultBucketShift,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = batch.sparkSession
    val buckets = spark.read.parquet(s"$path/keys")
      .select(col("vec_id"), col("band_idx"),
        shiftright(col("key"), bucketShift).as("bucket"))
    val pb = batch
      .select(col(idCol).as("probe_id"),
        posexplode(bandKeys(col(vecCol), bands)).as(Seq("band_idx", "key")))
      .select(col("probe_id"), col("band_idx"),
        explode(array(shiftright(col("key"), bucketShift) - 1,
          shiftright(col("key"), bucketShift),
          shiftright(col("key"), bucketShift) + 1)).as("bucket"))
    val cand = broadcast(pb)
      .join(buckets, Seq("band_idx", "bucket"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"))
      .distinct()
    annRerank(cand,
      batch.select(col(idCol).as("vec_id"), quantize(col(vecCol)).as("qv")),
      spark.read.parquet(s"$path/vectors"), k)
  }

  def annIndexTopK(spark: SparkSession, path: String, probePred: Column, k: Int,
      bucketShift: Int = DefaultBucketShift, spatialProbe: Boolean = false): DataFrame = {
    val keys = spark.read.parquet(s"$path/keys")
    val buckets = keys.select(col("vec_id"), col("band_idx"),
      shiftright(col("key"), bucketShift).as("bucket"))
    val probeBuckets =
      if (!spatialProbe)
        buckets.filter(probePred)
          .select(col("vec_id").as("probe_id"), col("band_idx"),
            explode(array(col("bucket") - 1, col("bucket"), col("bucket") + 1)).as("bucket"))
      else
        spatialBucketsFromCoords(
          keys.filter(probePred)
            .select(col("vec_id").as("probe_id"), col("band_idx"), col("cc")),
          bucketShift)
    val cand = broadcast(probeBuckets)
      .join(buckets, Seq("band_idx", "bucket"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"))
      .distinct()
    annRerank(cand, spark.read.parquet(s"$path/vectors"), k)
  }
}
