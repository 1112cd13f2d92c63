package graft

/** Diagnostic main (round-14 verdict ask #1): BPE TRAINING at a
  * shipped tokenizer's scale. The gated q_text_bpe* queries train 12
  * merges over a 400-word table — they pin the SEMANTICS; this check
  * measures that [[graft.text.CorpusOps.trainMerges]] (the round-15
  * incremental pair-count-heap trainer) holds at the scale a real
  * tokenizer ships: >= 10k merges over a >= 100k-distinct-word table,
  * with flat-ish per-merge marginal cost — where the pre-round-15
  * per-round full rescan was O(merges · words · len) and would take
  * minutes-to-hours.
  *
  * Synthesizes a deterministic 100k-distinct-word table (seeded PRNG,
  * lengths 3..12 over 26 letters, skewed frequencies), trains at
  * increasing merge counts, and prints/writes ONE JSON line with
  * wall-clocks, the per-merge marginal cost between the largest two
  * points, and the log-log exponent of time vs merges (~1 = linear in
  * merges, i.e. flat per merge; the rescan's would be ~1 too but with
  * a constant ~words·len larger). Driver-side only — no SparkSession,
  * because the distributed half of BPE training is the word-frequency
  * aggregate, and THIS is the half that was only evidenced at toy
  * scale. Measurement harness, not a gated query. */
object BpeTrainScaleCheck {
  def main(args: Array[String]): Unit = {
    val nWords = sys.env.getOrElse("SPARK_GRAFT_BPE_WORDS", "100000").toInt
    val mergePoints = Seq(1000, 5000, 10000)

    val rnd = new scala.util.Random(42)
    val seen = scala.collection.mutable.HashSet.empty[String]
    val words = scala.collection.mutable.ArrayBuffer
      .empty[(String, Long, Array[String])]
    while (words.length < nWords) {
      val len = 3 + rnd.nextInt(10)
      val w = Array.fill(len)(('a' + rnd.nextInt(26)).toChar).mkString
      if (seen.add(w))
        words += ((w, 1L + rnd.nextInt(1000).toLong, w.map(_.toString).toArray))
    }
    val table = words.toArray

    def timed(merges: Int): (Double, Int) = {
      // fresh copy: trainMerges rewrites segmentations in place
      val in = table.map { case (w, f, s) => (w, f, s.clone()) }
      val t0 = System.nanoTime()
      val (rows, _) = graft.text.CorpusOps.trainMerges(in, merges)
      ((System.nanoTime() - t0) / 1e9, rows.length)
    }
    // JIT warmup on the smallest point, then min-of-2 per point
    timed(mergePoints.head)
    val results = mergePoints.map { m =>
      val (t1, n1) = timed(m)
      val (t2, n2) = timed(m)
      (m, math.min(t1, t2), math.max(n1, n2))
    }
    val (mLo, tLo, _) = results.head
    val (mHi, tHi, nHi) = results.last
    val expo = math.log(tHi / tLo) / math.log(mHi.toDouble / mLo.toDouble)
    val (mMid, tMid, _) = results(results.length - 2)
    val marginalMs = (tHi - tMid) / (mHi - mMid) * 1000.0
    val points = results.map { case (m, t, n) =>
      f""""m$m":{"merges_done":$n,"sec":$t%.3f,"ms_per_merge":${t / m * 1000}%.4f}"""
    }.mkString("{", ",", "}")
    val json = s"""{"metric":"bpe_train_scale_check","words":$nWords,""" +
      f""""merges_hi":$nHi,"time_vs_merges_exponent":$expo%.2f,""" +
      f""""marginal_ms_per_merge":$marginalMs%.4f,"points":$points}"""
    println(json)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bpe_train_scale_result.json"), json + "\n")
  }
}
