package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.text.{CorpusOps, TextFunctions}

/** The canonical training-data pipeline, end to end, composed from the
  * library's operators — what a user actually runs before training:
  *
  *  1. near-dup removal: MinHash pair graph -> cluster resolution ->
  *     keep only canonical docs ([[Dedup.clusters]]);
  *  2. quality filter: repetition below a threshold
  *     ([[TextFunctions.repetitionPpm]], Gopher-style);
  *  3. reproducible split: keep the "train" partition
  *     ([[TextFunctions.splitLabel]] — pure function of the key);
  *  4. deterministic stratified sampling: per-language keep rates by
  *     salted key hash ([[CorpusOps.sampleBucket]]);
  *  5. sequence packing: concat-and-chunk token offsets over the
  *     surviving corpus ([[CorpusOps.packSequences]]).
  *
  * Output: (doc_id, lang, n_tokens, start_offset, bin_idx) — the
  * training-ready manifest. Every stage is a pure function of the
  * data, so the whole pipeline is reproducible at any scale and the
  * DuckDB oracle recomputes it end to end
  * (graft.oracle.DocSql.pipeline); the composition inherits each
  * stage's audited plan shape (equi-join closure, narrow filters,
  * two-level prefix sum).
  */
object TrainingPipeline {

  final case class PipelineParams(
      minhash: Dedup.MinHashParams = Dedup.MinHashParams(),
      maxRepetitionPpm: Long = 300000L,
      cuts: Seq[(String, Long)] =
        Seq("train" -> 800000L, "val" -> 900000L, "test" -> 1000000L),
      keepSplit: String = "train",
      sampleRates: Seq[(String, Long)] = Seq("en" -> 800000L),
      defaultSamplePpm: Long = 500000L,
      sampleSalt: String = "#sample",
      ctxTokens: Long = 1024L,
      nBuckets: Int = 8)

  /** The ids the dedup closure removes — non-canonical iff the
    * component label differs from the id. The EXPENSIVE shared stage
    * of [[run]] and [[stageCounts]]; [[writeNonCanon]] persists it as
    * a write-once artifact so both consumers (and any number of
    * downstream jobs — the production shape: one closure per corpus
    * snapshot) pay it once. */
  def nonCanonIds(docs: DataFrame, p: PipelineParams = PipelineParams(),
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    Dedup
      .connectedComponents(Dedup.minhashPairs(docs, p.minhash, idCol, textCol))
      .filter(col("lbl") =!= col("id"))
      .select(col("id"))

  /** Persist [[nonCanonIds]] as the pipeline's shared closure artifact
    * (same write-once contract as the curve-indexed layouts and the
    * PQ index). */
  def writeNonCanon(docs: DataFrame, path: String,
      p: PipelineParams = PipelineParams(),
      idCol: String = "doc_id", textCol: String = "text"): Unit =
    nonCanonIds(docs, p, idCol, textCol).write.mode("overwrite").parquet(path)

  def run(docs: DataFrame, p: PipelineParams = PipelineParams(),
      idCol: String = "doc_id", langCol: String = "lang",
      textCol: String = "text", nonCanon0: Option[DataFrame] = None): DataFrame = {
    // 1. canonical docs only: anti-join the closure's removals out
    // directly (no need for clusters()'s cluster_size window here);
    // a precomputed artifact (nonCanon0) skips the closure entirely
    val nonCanon = nonCanon0.getOrElse(nonCanonIds(docs, p, idCol, textCol))
    val canon = docs.join(nonCanon, docs(idCol) === nonCanon("id"), "left_anti")
    // 2..4: narrow filters — quality, split, sample (zero shuffles)
    val rate = p.sampleRates.foldRight(lit(p.defaultSamplePpm)) { case ((v, ppm), rest) =>
      when(col(langCol) === v, lit(ppm)).otherwise(rest)
    }
    val kept = canon
      .filter(TextFunctions.repetitionPpm(col(textCol), 3) < p.maxRepetitionPpm)
      .filter(TextFunctions.splitLabel(col(idCol), p.cuts) === p.keepSplit)
      .filter(CorpusOps.sampleBucket(col(idCol), p.sampleSalt) < rate)
    // 5. pack the survivors into training sequences
    CorpusOps.packSequences(kept, p.ctxTokens, p.nBuckets, idCol, textCol)
      .join(docs.select(col(idCol).as("doc_id"), col(langCol).as("lang")), "doc_id")
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        col("start_offset"), col("bin_idx"))
  }

  /** Per-stage survivor counts for [[run]] — the pipeline's audit
    * trail: one row per stage with the number of documents surviving
    * up to and including that stage (`0_input` .. `4_sample`). Gated
    * as its own oracle query (q_pipeline_stages) so a future
    * stage-interaction bug localizes to the first diverging count
    * instead of failing only the final manifest.
    *
    * Scale shape: the closure anti-join feeds ONE narrow projection of
    * three boolean stage flags per canonical doc, then a single
    * partial-aggregated count/sum row; the stage rows come from
    * `stack` over that one-row frame joined with the one-row input
    * count — no extra pass per stage. */
  def stageCounts(docs: DataFrame, p: PipelineParams = PipelineParams(),
      idCol: String = "doc_id", langCol: String = "lang",
      textCol: String = "text", nonCanon0: Option[DataFrame] = None): DataFrame = {
    val nonCanon = nonCanon0.getOrElse(nonCanonIds(docs, p, idCol, textCol))
    val canon = docs.join(nonCanon, docs(idCol) === nonCanon("id"), "left_anti")
    val rate = p.sampleRates.foldRight(lit(p.defaultSamplePpm)) { case ((v, ppm), rest) =>
      when(col(langCol) === v, lit(ppm)).otherwise(rest)
    }
    val flags = canon.select(
      (TextFunctions.repetitionPpm(col(textCol), 3) < p.maxRepetitionPpm).as("q"),
      (TextFunctions.splitLabel(col(idCol), p.cuts) === p.keepSplit).as("s"),
      (CorpusOps.sampleBucket(col(idCol), p.sampleSalt) < rate).as("m"))
    val cum = flags.agg(
      count(lit(1)).as("canonical"),
      coalesce(sum(when(col("q"), 1L).otherwise(0L)), lit(0L)).as("quality"),
      coalesce(sum(when(col("q") && col("s"), 1L).otherwise(0L)), lit(0L)).as("split"),
      coalesce(sum(when(col("q") && col("s") && col("m"), 1L).otherwise(0L)), lit(0L))
        .as("sample"))
    val input = docs.agg(count(lit(1)).as("input"))
    input.crossJoin(cum).selectExpr(
      "stack(5, '0_input', input, '1_canonical', canonical, " +
        "'2_quality', quality, '3_split', split, '4_sample', sample) " +
        "AS (stage, n_docs)")
  }
}
