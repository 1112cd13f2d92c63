package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.text.CorpusOps

/** Streaming decontamination gate — the ingest-time shape of
  * [[graft.text.CorpusOps.bloomDecontaminate]]: the benchmark split's
  * Bloom bitset is built ONCE and persisted as a KB-scale (word, bits)
  * parquet artifact; documents arriving as a stream are scored against
  * it per micro-batch and flagged rows appended to `resultPath`.
  *
  * This is the easy case of the three ingest loops: unlike the
  * signature index ([[StreamDedup.ingestDedup]]) and the ANN index
  * ([[StreamSim.ingestTopK]]), the filter artifact is READ-ONLY — the
  * benchmark suite is fixed, nothing appends — and the probe is a
  * pure per-row function of (document, bitset). So stream == batch
  * needs no probe-then-append ordering argument at all; StreamingSpec
  * asserts the micro-batched loop equals one batch [[CorpusOps
  * .bloomProbe]] call over the same rows.
  */
object StreamFilter {

  /** Build and persist the filter artifact from the corpus snapshot's
    * benchmark split (run once before the stream starts). */
  def writeBloomFilter(docs: DataFrame, bitsPath: String, words: Int = 8192,
      p: CorpusOps.ContaminationParams = CorpusOps.ContaminationParams()): Unit =
    CorpusOps.bloomFilterBits(docs, words, p)
      .write.mode("overwrite").parquet(bitsPath)

  /** Per micro-batch of (doc_id, text) rows: probe the stored bitset,
    * append flagged (train_id, n_sh, n_hits) rows to `resultPath`.
    * The same Hadoop-FS `_batches/<id>` idempotence marker as the
    * other ingest loops (kept under `resultPath` — the filter itself
    * is never written) makes restart/retry emit each batch once,
    * wherever the paths live (HDFS/S3/local). */
  /** Streaming admission through a FROZEN quality gate — the other
    * read-only-artifact filter: [[CorpusOps.qualityGateBuild]] persists
    * the groups-sized per-group cut frame once, each micro-batch is
    * scored by the same pure function and admitted via
    * [[CorpusOps.qualityGateApply]] (a broadcast join, shuffle-free on
    * the batch side), admitted rows appended to `resultPath`. Same
    * read-only contract as [[ingestBloom]]: stream == batch because
    * admission is a pure per-row function of (document, artifact). */
  def ingestQualityGate(docs: DataFrame, cutsPath: String, resultPath: String,
      checkpoint: String, groupCol: String = "lang")
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val marker = new org.apache.hadoop.fs.Path(s"$resultPath/_batches/$batchId")
        val fs = marker.getFileSystem(
          batch.sparkSession.sessionState.newHadoopConf())
        if (!fs.exists(marker)) {
          val cuts = batch.sparkSession.read.parquet(cutsPath)
          CorpusOps.qualityGateApply(batch, cuts, groupCol)
            .write.mode("append").parquet(resultPath)
          fs.create(marker, true).close()
          ()
        }
      }
      .start()

  /** Streaming LM quality scoring — the third read-only-artifact
    * filter: the frozen bigram-count LM
    * ([[CorpusOps.writeLmIndex]], sum-merge exact appends) scores
    * each arriving micro-batch via [[CorpusOps.lmScoreWith]] and the
    * scored rows append to `resultPath`. Stream == batch for the
    * same reason as the bloom/quality gates: scoring is a pure
    * function of (document, artifact) — each doc's score never
    * depends on other docs in its batch (asserted in StreamingSpec). */
  def ingestLmScore(docs: DataFrame, lmPath: String, resultPath: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val marker = new org.apache.hadoop.fs.Path(s"$resultPath/_batches/$batchId")
        val fs = marker.getFileSystem(
          batch.sparkSession.sessionState.newHadoopConf())
        if (!fs.exists(marker)) {
          val counts = batch.sparkSession.read.parquet(lmPath)
          CorpusOps.lmScoreWith(batch, counts)
            .write.mode("append").parquet(resultPath)
          fs.create(marker, true).close()
          ()
        }
      }
      .start()

  def ingestBloom(docs: DataFrame, bitsPath: String, resultPath: String,
      checkpoint: String, words: Int = 8192,
      p: CorpusOps.ContaminationParams = CorpusOps.ContaminationParams())
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val marker = new org.apache.hadoop.fs.Path(s"$resultPath/_batches/$batchId")
        val fs = marker.getFileSystem(
          batch.sparkSession.sessionState.newHadoopConf())
        if (!fs.exists(marker)) {
          val bits = batch.sparkSession.read.parquet(bitsPath)
          CorpusOps.bloomProbe(batch, bits, words, p)
            .write.mode("append").parquet(resultPath)
          fs.create(marker, true).close()
          ()
        }
      }
      .start()
}
