package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.text.Postings

/** Streaming full-text indexing — the ingest-time shape of
  * [[graft.text.Postings]]: documents arriving as a stream grow the
  * persisted positional postings index per micro-batch, and phrase
  * probes serve from the artifact at any point.
  *
  * This is the strongest ingest regime of the five artifact families
  * (with the sketches): postings are PER-ROW-PURE (each (token,
  * doc_id, pos) row is a function of its own document alone), so
  * appends are pure file adds with no probe-then-append ordering
  * argument, and ANY interleaving of micro-batches produces an index
  * bit-identical in content to one from-scratch build over the same
  * rows — StreamTextSpec asserts exactly that, plus serve-equivalence
  * through [[Postings.compactIndex]] after the stream stops.
  */
object StreamText {

  /** Per micro-batch of (doc_id, text) rows: append the batch's
    * postings to the index at `indexPath`. The `_batches/<id>`
    * idempotence marker (same contract as the other ingest loops)
    * makes restart/retry append each batch exactly once. */
  def ingestPostings(docs: DataFrame, indexPath: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val marker = new org.apache.hadoop.fs.Path(s"$indexPath/_batches/$batchId")
        val fs = marker.getFileSystem(
          batch.sparkSession.sessionState.newHadoopConf())
        if (!fs.exists(marker)) {
          Postings.appendIndex(batch, indexPath)
          fs.create(marker, true).close()
          ()
        }
      }
      .start()

  /** Streaming ingest for the persisted BPE word-count artifact
    * ([[graft.text.CorpusOps.bpeCountsBuild]]): each micro-batch of
    * (doc_id, text) rows appends its own (word, freq) PARTIAL frame.
    * Sum-merge is associative but duplicate-SENSITIVE, so the
    * `_batches/<id>` marker carries the exactness (a re-delivered
    * batch would double-count its words — the
    * [[StreamSim.ingestGram]] trade). Stream == sequential
    * bpeCountsBuild/Append calls: StreamingSpec asserts the merges
    * trained from the streamed artifact match the from-scratch batch
    * trainer. The artifact must exist before the stream starts. */
  def ingestBpeCounts(docs: DataFrame, countsPath: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val marker =
          new org.apache.hadoop.fs.Path(s"$countsPath/_batches/$batchId")
        val fs = marker.getFileSystem(
          batch.sparkSession.sessionState.newHadoopConf())
        if (!fs.exists(marker)) {
          graft.text.CorpusOps.bpeCountsAppend(batch, countsPath)
          fs.create(marker, true).close()
          ()
        }
      }
      .start()
}
