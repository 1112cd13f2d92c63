package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.dedup.Dedup

/** Corpus-level operators for training-data pipelines — the shuffling
  * counterparts to the narrow per-row signals in [[TextFunctions]]:
  * vocabulary building, deterministic stratified sampling, and
  * train/eval contamination detection.
  *
  * Everything is exact integer/string math on the shared md5
  * conventions (see graft.oracle.DocSql), so the DuckDB oracle
  * reproduces each result bit-for-bit; and every shuffle is a hash
  * aggregation or equi-join on a high-cardinality key with map-side
  * partial aggregation, so each operator is one well-shaped exchange
  * at any corpus size.
  */
object CorpusOps {

  /** Vocabulary building: the top-k tokens by corpus term frequency,
    * with document frequency alongside — the standard first pass of
    * tokenizer/vocab construction over a training corpus.
    *
    * Shape at 100 TB: explode to (doc_id, token) is a narrow flatMap;
    * the aggregate is partial — each mapper emits one row per distinct
    * (token, doc_id) then per token — and the top-k is
    * TakeOrderedAndProject (per-partition heaps, never a full sort).
    * The ordering (tf desc, df desc, token asc) is total, so the k-th
    * boundary is deterministic across engines and partitionings. */
  def vocabulary(docs: DataFrame, topK: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
      .orderBy(col("tf").desc, col("df").desc, col("token"))
      .limit(topK)

  /** Sampling bucket in [0, 1e6): [[TextFunctions.hashBucket]] over the
    * salted key. The salt decorrelates sampling from every other
    * hash-of-key decision (e.g. the train/val/test split), so a 50%
    * sample is unbiased within each split. */
  def sampleBucket(key: Column, salt: String): Column =
    TextFunctions.hashBucket(concat(key.cast("string"), lit(salt)), 1000000)

  /** Deterministic stratified sampling: keep a per-stratum fraction
    * (ppm) of rows, selected purely by a hash of the key — stable
    * across runs, engines, partitionings, and cluster layouts, which is
    * what makes a 100 TB downsample reproducible and resumable (no RNG
    * state, no `sample()` nondeterminism; re-running a failed stage
    * keeps the identical row set). Strata not named in `rates` fall to
    * `defaultPpm`. Output: (doc_id, stratum, sample_bucket).
    *
    * Shape: a narrow filter — no shuffle at all; the predicate pushes
    * into the scan's row-level filtering. */
  def stratifiedSample(docs: DataFrame, rates: Seq[(String, Long)], defaultPpm: Long,
      strataCol: String = "lang", idCol: String = "doc_id",
      salt: String = "#sample"): DataFrame = {
    require((defaultPpm +: rates.map(_._2)).forall(p => p >= 0 && p <= 1000000L),
      s"sampling rates are ppm in [0, 1e6]: $rates default=$defaultPpm")
    val rate = rates.foldRight(lit(defaultPpm): Column) { case ((v, ppm), rest) =>
      when(col(strataCol) === v, lit(ppm)).otherwise(rest)
    }
    docs
      .withColumn("sample_bucket", sampleBucket(col(idCol), salt))
      .filter(col("sample_bucket") < rate)
      .select(col(idCol).as("doc_id"), col(strataCol).as("stratum"), col("sample_bucket"))
  }

  /** Parameters for [[contamination]]. `maxDf` drops shingles that
    * appear in more than maxDf documents before the postings join —
    * they are non-discriminative (boilerplate, stopword runs) and, at
    * web scale, exactly the hot keys that would otherwise make one
    * reducer quadratic; the cap bounds any shingle's join fan-out at
    * maxDf^2 pairs. `minOverlap` is the reporting threshold on shared
    * distinct shingles.
    *
    * `cachePostings` trades memory for scans: true (default) persists
    * the exploded postings so the corpus is scanned and hashed ONCE
    * across the three consumers (df filter + both join sides) — right
    * at bench/single-machine scale, where the postings fit the cache
    * pool. At 100 TB the postings are corpus-shingle sized and caching
    * them (even MEMORY_AND_DISK) doubles the job's storage footprint;
    * set false to recompute instead — three scans of a narrow
    * (id, split, hash) projection, each a pipelined flatMap off the
    * column-pruned parquet scan, which is the cheaper side of the
    * trade once postings exceed cluster memory (docs/PLANS.md).
    * The result is identical either way. */
  final case class ContaminationParams(
      shingleK: Int = 3,
      maxDf: Int = 64,
      minOverlap: Long = 2L,
      cuts: Seq[(String, Long)] =
        Seq("train" -> 800000L, "val" -> 900000L, "test" -> 1000000L),
      corpusSplit: String = "train",
      benchSplit: String = "test",
      cachePostings: Boolean = true)

  /** Train/eval contamination check: for every (train doc, benchmark
    * doc) pair sharing at least `minOverlap` distinct k-shingles,
    * report the overlap and the containment ratio (overlap / benchmark
    * shingle count, ppm) — the decontamination pass every serious
    * training-data pipeline runs before finalizing a corpus.
    *
    * The split labels come from [[TextFunctions.splitLabel]] on the
    * doc id (the same pure-function-of-key split as q_split), so
    * "train" and "test" here are reproducible, not positional.
    *
    * Shape at 100 TB: shingle hashes are the 60-bit md5-prefix longs of
    * [[Dedup.shingleHashes]] (distinct per doc, no shingle strings);
    * the inverted-index join is an equi-join on the shingle hash with
    * per-hash fan-out bounded by `maxDf`; the pair aggregation is a
    * partial hash agg on (train_id, bench_id). The benchmark side is
    * tiny by definition, but nothing here relies on broadcasting it. */
  def contamination(docs: DataFrame, p: ContaminationParams = ContaminationParams(),
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val labeled = docs.select(
      col(idCol).as("doc_id"),
      TextFunctions.splitLabel(col(idCol), p.cuts).as("split"),
      Dedup.shingleHashes(col(textCol), p.shingleK).as("sh"))
    // persisted (when cachePostings) so the shingle-hash explode is
    // computed ONCE: without this the plan re-scans and re-hashes the
    // corpus on all three consumer branches (rare-hash agg + both
    // postings sides) — see ContaminationParams for the scale trade.
    // Cache lifecycle: caller releases after its terminal action (the
    // spark.catalog.clearCache() convention of Dedup.minhashPairs).
    val posts0 = labeled
      .select(col("doc_id"), col("split"),
        size(col("sh")).cast("long").as("n_sh"), explode(col("sh")).as("h"))
    val posts = if (p.cachePostings) posts0.persist(StorageLevel.MEMORY_AND_DISK) else posts0
    val rareHashes = posts.groupBy(col("h"))
      .agg(count(lit(1)).as("hash_df"))
      .filter(col("hash_df") <= p.maxDf)
      .select(col("h"))
    val kept = posts.join(rareHashes, "h")
    val bench = kept.filter(col("split") === p.benchSplit)
      .select(col("h"), col("doc_id").as("bench_id"), col("n_sh").as("bench_n"))
    val corpus = kept.filter(col("split") === p.corpusSplit)
      .select(col("h"), col("doc_id").as("train_id"))
    corpus.join(bench, "h")
      .groupBy(col("train_id"), col("bench_id"))
      .agg(count(lit(1)).as("overlap"), max(col("bench_n")).as("bench_n"))
      .filter(col("overlap") >= p.minOverlap)
      .select(col("train_id"), col("bench_id"), col("overlap"),
        TextFunctions.intDiv(col("overlap") * lit(1000000L), col("bench_n"))
          .as("containment_ppm"))
  }
}
