package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank fusion for hybrid retrieval — combining lexical (BM25),
  * phrase, and any other per-query rankings of the same corpus into
  * one list. Reciprocal-rank fusion (Cormack, Clarke & Buettcher,
  * SIGIR 2009): score(d) = Σ_rankers 1/(K + rank_r(d)), here in
  * exact integer ppm (1e6 // (K + rank)), so the fused ordering is
  * oracle-gated bit-for-bit — no tunable score normalization, which
  * is precisely why RRF is the production default for hybrid search.
  *
  * Shape at 100 TB: fusion NEVER touches the corpus — each input is
  * a ranker's top-R frame (R rows, already bounded by
  * TakeOrderedAndProject inside the ranker), so the union/aggregate/
  * top-k here run on rankers×R rows regardless of corpus size. The
  * expensive part is the rankers themselves, which keep their own
  * scale shapes ([[CorpusOps.bm25Rank]], [[Postings.phraseSearch]]).
  */
object Fusion {

  /** Fuse per-ranker (doc_id, rnk) frames: top-k docs by RRF score,
    * with the number of rankers that surfaced each doc. Docs missing
    * from a ranker's list simply contribute nothing for it (standard
    * RRF semantics). */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, kRrf: Long = 60L): DataFrame = {
    require(rankings.nonEmpty && k > 0, s"rankings=${rankings.length} k=$k")
    rankings.map(_.select(col("doc_id"), col("rnk")))
      .reduce(_ unionAll _)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_rankers"),
        sum(TextFunctions.intDiv(lit(1000000L), lit(kRrf) + col("rnk")))
          .as("rrf_score"))
      .orderBy(col("rrf_score").desc, col("doc_id")).limit(k)
      .select(col("doc_id"), col("n_rankers"), col("rrf_score"))
  }

  /** Hybrid lexical+phrase search: BM25 over `terms` fused with exact
    * phrase ranking over `phrase`, both bounded to their top-`r`
    * before ranking (so the single-partition row_number windows run
    * over ≤ r rows, never a corpus-sized frame). */
  def hybridSearch(docs: DataFrame, terms: Seq[String],
      phrase: Seq[String], k: Int, r: Int = 20): DataFrame = {
    val bm = CorpusOps.bm25Rank(docs, terms, r)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
    val ph = Postings.phraseSearch(Postings.positional(docs), phrase)
      .orderBy(col("n_hits").desc, col("first_pos"), col("doc_id")).limit(r)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("n_hits").desc, col("first_pos"), col("doc_id")))
        .cast("long"))
    rrfFuse(Seq(bm, ph), k)
  }
}
