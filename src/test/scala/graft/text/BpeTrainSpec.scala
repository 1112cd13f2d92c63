package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Gates for the round-15 incremental BPE trainer
  * ([[CorpusOps.trainMerges]]): randomized equivalence against a
  * naive per-round full-rescan reference (the pre-round-15
  * implementation, re-derived here independently), the
  * empty-round quirk, and training at a SHIPPED tokenizer's scale —
  * >= 10k merges over a >= 100k-distinct-word table — which the
  * rescan could not finish in test time (O(merges · words · len))
  * and the incremental trainer must do in seconds. */
class BpeTrainSpec extends AnyFunSuite {

  /** The pre-round-15 trainer verbatim in spirit: per round, recount
    * every weighted adjacent pair over every word (overlapping
    * occurrences counted), argmax on (count desc, a asc, b asc),
    * greedy left-to-right non-overlapping merge in every word, and a
    * pair-less round empties the word frame. */
  private def naive(words0: Array[(String, Long, Array[String])],
      merges: Int): (Seq[(Long, String, String, Long)],
        Seq[(String, Long, Array[String])]) = {
    var words = words0.map(identity)
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var k = 1
    while (k <= merges && words.nonEmpty) {
      val cnt = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((_, f, seg) <- words; i <- 0 until seg.length - 1)
        cnt.updateWith((seg(i), seg(i + 1)))(v => Some(v.getOrElse(0L) + f))
      if (cnt.isEmpty) words = Array.empty
      else {
        val ((a, b), c) = cnt.minBy { case ((a, b), c) => (-c, a, b) }
        rows += ((k.toLong, a, b, c))
        words = words.map { case (w, f, seg) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < seg.length) {
            if (i < seg.length - 1 && seg(i) == a && seg(i + 1) == b) {
              out += (a + b); i += 2
            } else { out += seg(i); i += 1 }
          }
          (w, f, out.toArray)
        }
      }
      k += 1
    }
    (rows.toSeq, words.toSeq)
  }

  private def segKey(ws: Seq[(String, Long, Array[String])]) =
    ws.map { case (w, f, s) => (w, f, s.mkString(" ")) }.sortBy(_._1)

  test("randomized equivalence with the full-rescan reference (200 cases)") {
    for (seed <- 0 until 200) {
      val rnd = new scala.util.Random(seed)
      // small alphabet + short words force heavy ties, same-symbol
      // runs ("aaa"), and rounds that exhaust all pairs
      val nWords = 1 + rnd.nextInt(40)
      val words = (0 until nWords).map { i =>
        val len = 1 + rnd.nextInt(8)
        val w = Array.fill(len)(('a' + rnd.nextInt(3)).toChar).mkString
        (s"w${i}_$w", 1L + rnd.nextInt(5), w.map(_.toString).toArray)
      }.toArray
      val merges = 1 + rnd.nextInt(30)
      val (gotRows, gotWords) = CorpusOps.trainMerges(words.map(identity), merges)
      val (expRows, expWords) = naive(words.map { case (w, f, s) =>
        (w, f, s.clone()) }, merges)
      assert(gotRows.toSeq === expRows, s"merge table diverged at seed=$seed")
      assert(segKey(gotWords.toSeq) === segKey(expWords),
        s"segmentation diverged at seed=$seed")
    }
  }

  test("pathological same-symbol runs: binary alphabet, long words, deep merges (60 cases)") {
    // alphabet 2 maximizes overlapping pairs ("aaaa..."), self-merges
    // (a,a) -> aa whose output immediately re-pairs, and heap-entry
    // churn from counts that swing every round — the stress case for
    // the lazy-deletion invariant
    for (seed <- 1000 until 1060) {
      val rnd = new scala.util.Random(seed)
      val nWords = 5 + rnd.nextInt(60)
      val words = (0 until nWords).map { i =>
        val len = 1 + rnd.nextInt(24)
        val w = Array.fill(len)(('a' + rnd.nextInt(2)).toChar).mkString
        (s"w${i}_$w", 1L + rnd.nextInt(9), w.map(_.toString).toArray)
      }.toArray
      val merges = 20 + rnd.nextInt(60)
      val (gotRows, gotWords) = CorpusOps.trainMerges(words.map(identity), merges)
      val (expRows, expWords) = naive(words.map { case (w, f, s) =>
        (w, f, s.clone()) }, merges)
      assert(gotRows.toSeq === expRows, s"merge table diverged at seed=$seed")
      assert(segKey(gotWords.toSeq) === segKey(expWords),
        s"segmentation diverged at seed=$seed")
    }
  }

  test("a pair-less round empties the word frame (the crossJoin quirk)") {
    // "ab" fully merges in round 1; round 2 has no pairs left
    val words = Array(("ab", 3L, Array("a", "b")))
    val (rows, out) = CorpusOps.trainMerges(words, merges = 2)
    assert(rows.toSeq === Seq((1L, "a", "b", 3L)))
    assert(out.isEmpty)
  }

  test("single-symbol words yield no merges and an emptied frame") {
    val words = Array(("a", 5L, Array("a")), ("b", 2L, Array("b")))
    val (rows, out) = CorpusOps.trainMerges(words, merges = 3)
    assert(rows.isEmpty && out.isEmpty)
  }

  test("overlap counting: 'aaa' contributes two (a,a) occurrences") {
    val words = Array(("aaa", 2L, Array("a", "a", "a")),
      ("bc", 3L, Array("b", "c")))
    // (a,a) weight 2*2=4 beats (b,c) weight 3; greedy leftmost merge
    val (rows, out) = CorpusOps.trainMerges(words, merges = 1)
    assert(rows.toSeq === Seq((1L, "a", "a", 4L)))
    assert(segKey(out.toSeq).map(_._3) === Seq("aa a", "b c"))
  }

  test("shipped scale: 10k merges over a 100k-distinct-word table in seconds") {
    // deterministic word table: 100k distinct pseudo-words, lengths
    // 3..12 over 26 letters, Zipf-ish frequencies
    val rnd = new scala.util.Random(42)
    val seen = scala.collection.mutable.HashSet.empty[String]
    val words = scala.collection.mutable.ArrayBuffer
      .empty[(String, Long, Array[String])]
    while (words.length < 100000) {
      val len = 3 + rnd.nextInt(10)
      val w = Array.fill(len)(('a' + rnd.nextInt(26)).toChar).mkString
      if (seen.add(w))
        words += ((w, 1L + rnd.nextInt(1000).toLong, w.map(_.toString).toArray))
    }
    val t0 = System.nanoTime()
    val (rows, _) = CorpusOps.trainMerges(words.toArray, merges = 10000)
    val sec = (System.nanoTime() - t0) / 1e9
    info(f"trained ${rows.length} merges over ${words.length} words in $sec%.2f s")
    assert(rows.length === 10000, "pairs ran dry before 10k merges")
    // ranks are 1..merges in order, counts positive and non-increasing
    // only in aggregate sanity (BPE counts are not monotone), ids dense
    assert(rows.map(_._1).toSeq === (1L to 10000L))
    assert(rows.forall(_._4 > 0L))
    // generous wall bound: the rescan trainer is O(merges·words·len)
    // (~10^10 steps, minutes-to-hours); the incremental one is seconds
    assert(sec < 60.0, f"10k-merge training took $sec%.1f s — not shipped-scale")
  }
}
