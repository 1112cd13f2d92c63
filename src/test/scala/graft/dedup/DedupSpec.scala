package graft.dedup

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.text.TextFunctions

class DedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-dedup-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("text stats: token counts, distinct, quality ppm") {
    val df = docs((1L, "a b b c"), (2L, "x"))
      .select(
        col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("n"),
        TextFunctions.distinctTokenCount(col("text")).as("d"),
        TextFunctions.tokenChars(col("text")).as("c"),
        TextFunctions.qualityPpm(col("text")).as("q"))
    val m = df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(m(1L) == ((4L, 3L, 4L, 750000L)))
    assert(m(2L) == ((1L, 1L, 1L, 1000000L)))
  }

  test("shingles: k consecutive tokens; short docs collapse to one shingle") {
    val df = docs((1L, "a b c d"), (2L, "a b"))
      .select(col("doc_id"), TextFunctions.shingles(col("text"), 3).as("sh"))
    val m = df.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(m(1L) == Seq("a b c", "b c d"))
    assert(m(2L) == Seq("a b"))
  }

  test("quality signals: repetition / upper / digit ppm (exact integer math)") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("a a a a")),   // shingles: [a a a, a a a] -> 1 dup of 2
      (2L, Some("AbC")),       // 2 upper of 3 chars
      (3L, Some("a1")),        // 1 digit of 2 chars
      (4L, Option.empty[String]))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        TextFunctions.repetitionPpm(col("text"), 3).as("rep"),
        TextFunctions.upperPpm(col("text")).as("up"),
        TextFunctions.digitPpm(col("text")).as("dig"))
    val m = df.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(m(1L)._1 == 500000L)
    assert(m(2L)._2 == 666666L)
    assert(m(3L)._3 == 500000L)
    assert(m(4L) == ((0L, 0L, 0L)))
  }

  test("hash-based repetitionPpm == string-exact builtin SPEC (randomized)") {
    val rnd = new scala.util.Random(48)
    val vocab = Vector("a", "bb", "word", "a", "7") // repeats make dup shingles likely
    val texts = (1L to 60L).map { i =>
      val n = rnd.nextInt(15)
      i -> Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    for (k <- Seq(2, 3)) {
      val bad = docs(texts: _*).select(
        col("doc_id"),
        TextFunctions.repetitionPpm(col("text"), k).as("native"),
        TextFunctions.repetitionPpmBuiltin(col("text"), k).as("spec"))
        .filter(col("native") =!= col("spec")).count()
      assert(bad == 0, s"k=$k")
    }
  }

  test("hash split: deterministic, key-only, fractions near the cuts") {
    import spark.implicits._
    val ids = (1L to 2000L).toDF("doc_id")
    def labels(df: org.apache.spark.sql.DataFrame) = df.select(
        col("doc_id"),
        TextFunctions.splitLabel(col("doc_id"),
          Seq("train" -> 800000L, "val" -> 900000L, "test" -> 1000000L)).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val a = labels(ids)
    val b = labels(ids.orderBy(col("doc_id").desc).repartition(7)) // order/partitioning-independent
    assert(a == b)
    val frac = a.values.groupBy(identity).view.mapValues(_.size / 2000.0).toMap
    assert(math.abs(frac("train") - 0.8) < 0.05)
    assert(math.abs(frac("val") - 0.1) < 0.03)
    assert(math.abs(frac("test") - 0.1) < 0.03)
  }

  test("exact dedup groups identical content and keeps the min id") {
    val out = Dedup.exact(docs((1L, "same text"), (2L, "same text"), (3L, "other")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 2)
    val dup = out.find(_._3 == 2L).get
    assert(dup._2 == 1L)
  }

  test("minhash LSH finds the planted near-dup, not the unrelated doc") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val nearDup = base.replace("tok7", "tokX") // one token edit
    val other = (1 to 40).map(i => s"zzz$i").mkString(" ")
    val pairs = Dedup.minhashPairs(docs((1L, base), (2L, nearDup), (3L, other)))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("jaccard pairs: exact intersection/union on distinct shingles") {
    val a = "a b c d e f g h"     // shingles: 6
    val b = "a b c d e f g h z"   // shares all 6; adds 1 -> j = 6/7
    val out = Dedup.jaccardPairs(docs((1L, a), (2L, b)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 2L, 6L, 7L)))
  }

  test("jaccard pairs: band skew cap stars pathological buckets") {
    // 70 identical docs collide in every band: bucket size 70 > cap 64
    // in JaccardParams -> the star rule links every doc to the bucket
    // min instead of dropping the cluster (round-3 ADVICE: dropping
    // lost exactly the large boilerplate clusters dedup exists for);
    // with a raised cap the full pair set comes back. Deterministic,
    // oracle-replicable rule.
    val many = (1L to 70L).map(i => i -> "u v w x y z q r s t")
    val capped = Dedup.jaccardPairs(docs(many: _*))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._2)
    assert(capped.toSeq == (2L to 70L).map(i => (1L, i)))
    val uncapped = Dedup.jaccardPairs(docs(many: _*),
      Dedup.JaccardParams.copy(maxBucketSize = 100))
    assert(uncapped.count() == 70L * 69 / 2)
  }

  test("minhash pairs: over-cap clusters stay connected via the star rule") {
    val many = (1L to 70L).map(i => i -> "u v w x y z q r s t")
    val pairs = Dedup.minhashPairs(docs(many: _*))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._2)
    // identical docs agree on all 12 signature components
    assert(pairs.toSeq == (2L to 70L).map(i => (1L, i, 12L)))
  }

  test("null text: shingles/fingerprint treat NULL as empty string") {
    import spark.implicits._
    val df = Seq((1L, Option.empty[String]), (2L, Some("")))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        TextFunctions.shingles(col("text"), 3).as("sh"),
        TextFunctions.tokenCount(col("text")).as("n"))
    val m = df.collect().map(r => r.getLong(0) -> ((r.getSeq[String](1), r.getLong(2)))).toMap
    // NULL and '' must agree (both engines see one empty token)
    assert(m(1L) == ((Seq(""), 1L)))
    assert(m(2L) == ((Seq(""), 1L)))
  }

  test("native ShingleMinHash matches the builtin-composed signature byte for byte") {
    val texts = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "one two"),                 // shorter than k -> whole-doc shingle
      (3L, "x"),
      (4L, "repeated repeated repeated repeated"),
      (5L, ""))
    val p = Dedup.MinHashParams()
    val df = docs(texts: _*).select(
      col("doc_id"),
      Dedup.minhashSignature(col("text"), p).as("native"),
      Dedup.minhashSignatureBuiltin(col("text"), p).as("builtin"))
    df.collect().foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"doc ${r.getLong(0)}")
    }
  }

  test("native ShingleMinHash == builtin on randomized corpora (seeded)") {
    val rnd = new scala.util.Random(44)
    val vocab = Vector("a", "bb", "word", "Zq9", "!", "longertoken", "7", "x-y")
    val texts = (1L to 60L).map { i =>
      val n = rnd.nextInt(12) // 0..11 tokens (0 -> empty text)
      i -> Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    for (k <- Seq(2, 3, 5); nh <- Seq(4, 12)) {
      val p = Dedup.MinHashParams(numHashes = nh, bands = nh / 2, shingleK = k)
      val bad = docs(texts: _*).select(
        col("doc_id"),
        Dedup.minhashSignature(col("text"), p).as("native"),
        Dedup.minhashSignatureBuiltin(col("text"), p).as("builtin"))
        .collect().filter(r => r.getSeq[Long](1) != r.getSeq[Long](2))
      assert(bad.isEmpty, s"k=$k nh=$nh mismatch docs ${bad.map(_.getLong(0)).toSeq}")
    }
  }

  test("native ShingleHashes matches the builtin-composed hash set") {
    val rnd = new scala.util.Random(45)
    val vocab = Vector("a", "bb", "word", "Zq9", "!", "longertoken", "7", "x-y")
    val texts = (1L to 60L).map { i =>
      val n = rnd.nextInt(12)
      i -> Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    } :+ (61L -> "a a a a a a") // duplicates collapse to one hash
    for (k <- Seq(2, 3, 5)) {
      val bad = docs(texts: _*).select(
        col("doc_id"),
        Dedup.shingleHashes(col("text"), k).as("native"),
        Dedup.shingleHashesBuiltin(col("text"), k).as("builtin"))
        .collect().filter(r => r.getSeq[Long](1) != r.getSeq[Long](2))
      assert(bad.isEmpty, s"k=$k mismatch docs ${bad.map(_.getLong(0)).toSeq}")
    }
  }

  test("native IntersectCountSorted == size(array_intersect) on sorted hash sets") {
    import org.apache.spark.sql.graft.ColumnShims
    val rnd = new scala.util.Random(47)
    val vocab = Vector("a", "bb", "word", "Zq9", "!", "longertoken", "7", "x-y")
    val texts = (1L to 40L).map { i =>
      val n = rnd.nextInt(15)
      i -> Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val shs = docs(texts: _*)
      .select(col("doc_id"), Dedup.shingleHashes(col("text"), 3).as("sh"))
    val bad = shs.as("a").crossJoin(shs.as("b"))
      .select(
        ColumnShims.column(graft.functions.IntersectCountSorted(
          ColumnShims.expression(col("a.sh")),
          ColumnShims.expression(col("b.sh")))).as("native"),
        size(array_intersect(col("a.sh"), col("b.sh"))).cast("long").as("spec"))
      .filter(col("native") =!= col("spec")).count()
    assert(bad == 0)
  }

  test("shingle natives skip NULL tokens like concat_ws (SQL-reachable arrays)") {
    import org.apache.spark.sql.graft.ColumnShims
    import graft.functions.{ShingleHashes, ShingleMinMd5}
    import spark.implicits._
    // tokens [a, NULL, b], k=2: concat_ws-joined shingles are "a" and
    // "b" (the NULL and its separator vanish) — the natives must agree
    val df = Seq(Tuple1(Seq(Option("a"), Option.empty[String], Option("b")))).toDF("toks")
      .select(
        ColumnShims.column(ShingleHashes(ColumnShims.expression(col("toks")), 2)).as("sh"),
        ColumnShims.column(ShingleMinMd5(ColumnShims.expression(col("toks")), 2)).as("fp"),
        array_sort(array_distinct(array(
          conv(substring(md5(lit("a").cast("binary")), 1, 15), 16, 10).cast("long"),
          conv(substring(md5(lit("b").cast("binary")), 1, 15), 16, 10).cast("long")))).as("sh_exp"),
        least(md5(lit("a").cast("binary")), md5(lit("b").cast("binary"))).as("fp_exp"))
    val r = df.head()
    assert(r.getSeq[Long](0) == r.getSeq[Long](2))
    assert(r.getString(1) == r.getString(3))
  }

  test("native ShingleMinMd5 fingerprint matches the builtin-composed one") {
    val rnd = new scala.util.Random(46)
    val vocab = Vector("a", "bb", "word", "Zq9", "!", "longertoken", "7", "x-y")
    val texts = (1L to 60L).map { i =>
      val n = rnd.nextInt(12)
      i -> Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    } ++ Seq(61L -> "", 62L -> "one two")
    for (k <- Seq(2, 3, 5)) {
      val bad = docs(texts: _*).select(
        col("doc_id"),
        TextFunctions.shingleFingerprint(col("text"), k).as("native"),
        TextFunctions.shingleFingerprintBuiltin(col("text"), k).as("builtin"))
        .collect().filter(r => r.getString(1) != r.getString(2))
      assert(bad.isEmpty, s"k=$k mismatch docs ${bad.map(_.getLong(0)).toSeq}")
    }
  }

  test("simhash: NULL and empty text agree on the cross-engine value") {
    import spark.implicits._
    // one empty token; its base hash is the first 8 md5('') hex digits
    // 0xd41d8cd9 — a golden value BOTH engines derive (the oracle now
    // coalesces NULL text the same way, round-3 verdict #3)
    val out = Seq((1L, Option.empty[String]), (2L, Some("")))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Dedup.simhash(col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 0xd41d8cd9L)
    assert(out(2L) == 0xd41d8cd9L)
  }

  test("chunk dedup: planted boilerplate window found across distinct docs") {
    // W=4: doc1 = [b0] [u1], doc2 = [b0] [u2], doc3 = unique (tail < W)
    val boiler = "copyright acme corp 2026"
    val d = docs(
      1L -> s"$boiler one two three four",
      2L -> s"$boiler five six seven eight",
      3L -> "nothing shared here")
    val out = Dedup.chunkDupes(d, chunkTokens = 4)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // exactly one duplicated chunk content: the boilerplate window,
    // 2 copies in 2 docs, canonical = (doc 1, chunk 0)
    assert(out.toSeq == Seq((2L, 2L, 1L, 0L)))
  }

  test("chunk dedup: within-doc repetition counts as copies of one doc") {
    val d = docs(1L -> "x y x y", 2L -> "z")
    val out = Dedup.chunkDupes(d, chunkTokens = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq((2L, 1L, 1L, 0L))) // "x y" twice inside doc 1
  }

  /** Plain-Scala reference of [[Dedup.cdcDupes]]'s chunking: cut after
    * a token whose md5 ends in `zeroNibbles` zero hex digits. */
  private def cdcChunksRef(text: String, zeroNibbles: Int): Seq[String] = {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val zeros = "0" * zeroNibbles
    val out = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    var cur = scala.collection.mutable.ArrayBuffer.empty[String]
    for (t <- text.split(" ", -1).toSeq) {
      cur += t
      if (md5hex(t).takeRight(zeroNibbles) == zeros) {
        out += cur.toSeq; cur = scala.collection.mutable.ArrayBuffer.empty
      }
    }
    if (cur.nonEmpty) out += cur.toSeq
    out.map(_.mkString(" ")).toSeq
  }

  test("cdc dedup: operator chunking == plain-Scala reference on a mixed corpus") {
    import spark.implicits._
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "copyright acme corp all rights reserved the quick brown fox",
      "one two three four five six seven eight nine ten eleven twelve",
      "short", "")
    val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    // expected duplicate groups from the reference chunking
    val refChunks = texts.zipWithIndex.flatMap { case (t, i) =>
      cdcChunksRef(t, 1).zipWithIndex.map { case (c, ci) =>
        (c, i.toLong, ci.toLong) }
    }
    val expected = refChunks.groupBy(_._1).filter(_._2.size > 1)
      .map { case (_, occ) =>
        val keep = occ.minBy(o => o._2 * (1L << 20) + o._3)
        (occ.size.toLong, occ.map(_._2).distinct.size.toLong, keep._2, keep._3)
      }.toSet
    val got = Dedup.cdcDupes(d)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got === expected)
  }

  test("cdc dedup is shift-resistant where fixed windows are not") {
    // a 40-token passage planted at offset 0 in doc 1 and offset 3 in
    // doc 2: content-defined boundaries re-align inside the passage,
    // fixed 16-token windows never line up (shift 3 is not a multiple
    // of the stride)
    val passage = (1 to 40).map(i => s"tok$i").mkString(" ")
    val d = docs(
      1L -> passage,
      2L -> s"extra header words $passage")
    val cdc = Dedup.cdcDupes(d)
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    // at least one shared chunk across the two docs
    assert(cdc.exists(_._1 == 2L), s"cdc found no cross-doc chunk: ${cdc.toSeq}")
    val fixed = Dedup.chunkDupes(d, chunkTokens = 16)
      .collect().map(r => r.getLong(2))
    assert(!fixed.contains(2L),
      "fixed windows unexpectedly aligned — test premise broken")
  }

  /** Plain-Scala reference of [[Dedup.cdcDupesBytes]]'s chunking: cut
    * at byte i (1-based) when md5 of the window-byte run ending at i
    * has `zeroNibbles` trailing zero hex digits; tail past the last
    * cut is the final chunk. */
  private def cdcBytesRef(text: String, zeroNibbles: Int,
      window: Int): Seq[String] = {
    def md5hex(b: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(b).map("%02x".format(_)).mkString
    val zeros = "0" * zeroNibbles
    val bytes = text.getBytes("UTF-8")
    val hexUp = bytes.map("%02X".format(_)).mkString
    val cuts = (window to bytes.length).filter { i =>
      md5hex(hexUp.substring((i - window) * 2, i * 2).getBytes("UTF-8"))
        .takeRight(zeroNibbles) == zeros
    }
    val bounds = (0 +: cuts) :+ bytes.length
    bounds.sliding(2).collect { case Seq(s, e) if e > s =>
      new String(bytes.slice(s, e), "UTF-8") }.toSeq
  }

  test("native CdcCuts == composed substring/md5 cut test (randomized)") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rnd = new scala.util.Random(15)
    for (_ <- 0 until 300) {
      val n = rnd.nextInt(120)
      val text = Array.fill(n)((32 + rnd.nextInt(95)).toChar).mkString +
        (if (rnd.nextBoolean()) "é東" else "")
      val bytes = text.getBytes("UTF-8")
      val hexUp = bytes.map("%02X".format(_)).mkString
      val z = 1 + rnd.nextInt(2)
      val w = 1 + rnd.nextInt(12)
      val expected = (w to bytes.length).filter { i =>
        md5hex(hexUp.substring((i - w) * 2, i * 2)).takeRight(z) == "0" * z
      }.map(_.toLong)
      val got = graft.functions.CdcCuts.cuts(bytes, z, w).toLongArray().toSeq
      assert(got === expected, s"cuts diverged on '$text' z=$z w=$w")
    }
  }

  test("byte cdc: operator chunking == plain-Scala reference; tokenizer-insensitive shift resistance") {
    import spark.implicits._
    // low zeroNibbles so small fixtures actually cut; a shared passage
    // planted at different BYTE offsets with no token boundary at the
    // join (the case token-level cdc cannot see)
    val passage = (1 to 60).map(i => s"chunkpart$i").mkString(" ")
    val texts = Seq(s"$passage tail", s"prefix-glued-on$passage tail", "tiny", "")
    val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val refChunks = texts.zipWithIndex.flatMap { case (t, i) =>
      cdcBytesRef(t, 1, 8).zipWithIndex.map { case (c, ci) =>
        (c, i.toLong, ci.toLong) }
    }
    val expected = refChunks.groupBy(_._1).filter(_._2.size > 1)
      .map { case (_, occ) =>
        val keep = occ.minBy(o => o._2 * (1L << 20) + o._3)
        (occ.size.toLong, occ.map(_._2).distinct.size.toLong, keep._2, keep._3)
      }.toSet
    val got = Dedup.cdcDupesBytes(d, zeroNibbles = 1, window = 8)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got === expected)
    // the reference itself must have found a cross-doc chunk, or the
    // shift-resistance claim is untested
    assert(expected.exists(_._2 == 2L),
      s"no cross-doc byte chunk in the fixture: $expected")
  }

  test("incremental dedup: new-vs-old pairs only; hot old buckets capped to a representative") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val newDocs = docs(
      100L -> base.replace("tok7", "tokX"),             // near-dup of old 1
      101L -> (1 to 40).map(i => s"qqq$i").mkString(" ")) // novel
    val oldDocs = docs(1L -> base, 2L -> base) // 1 and 2 are old dups of each other
    val pairs = Dedup.minhashPairsAgainst(newDocs, oldDocs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the new near-dup links to BOTH old copies; old-vs-old never emitted
    assert(pairs == Set((100L, 1L), (100L, 2L)))

    // representative cap: 70 identical old docs exceed the bucket cap,
    // so a matching new doc links only to the min-id representative
    val manyOld = docs((1L to 70L).map(i => i -> "u v w x y z q r s t"): _*)
    val oneNew = docs(999L -> "u v w x y z q r s t")
    val capped = Dedup.minhashPairsAgainst(oneNew, manyOld)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((999L, 1L)))
  }

  test("incremental dedup through the persisted signature index == direct form") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val newDocs = docs(
      100L -> base.replace("tok7", "tokX"),
      101L -> (1 to 40).map(i => s"qqq$i").mkString(" "))
    val oldDocs = docs(1L -> base, 2L -> base)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val direct = rows(Dedup.minhashPairsAgainst(newDocs, oldDocs))
    val path = java.nio.file.Files
      .createTempDirectory("graft_sig_idx_spec").toString + "/idx"
    Dedup.writeSignatureIndex(oldDocs, path)
    val viaIndex = rows(Dedup.minhashPairsAgainstIndex(newDocs, path))
    assert(direct == viaIndex && direct.nonEmpty)
    spark.catalog.clearCache()
  }

  test("signature index append: build+append == from-scratch union, incl. cap crossing") {
    // 40 identical docs in batch A, 40 more in batch B: each batch's
    // bucket partial is under the 64-doc cap, but the MERGED bucket
    // (80) is over it — exactly the case where baking the cap into the
    // written rows would be wrong. The probe must take the star rule
    // through the merged min (old_id 1), same as a from-scratch build.
    val batchA = docs((1L to 40L).map(i => i -> "u v w x y z q r s t"): _*)
    val batchB = docs((41L to 80L).map(i => i -> "u v w x y z q r s t"): _*)
    val probe = docs(999L -> "u v w x y z q r s t")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val tmp = java.nio.file.Files.createTempDirectory("graft_sig_app_spec").toString
    Dedup.writeSignatureIndex(batchA, tmp + "/appended")
    Dedup.appendSignatureIndex(batchB, tmp + "/appended")
    Dedup.writeSignatureIndex(batchA.union(batchB), tmp + "/scratch")
    val appended = rows(Dedup.minhashPairsAgainstIndex(probe, tmp + "/appended"))
    val scratch = rows(Dedup.minhashPairsAgainstIndex(probe, tmp + "/scratch"))
    assert(appended == scratch && appended.nonEmpty)
    assert(appended.map(t => (t._1, t._2)) == Seq((999L, 1L))) // star through merged min
    // under-cap merge as well: two small distinct batches, probe links
    // to near-dups from BOTH writes
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val oldA = docs(1L -> base)
    val oldB = docs(2L -> base)
    val nd = docs(100L -> base.replace("tok7", "tokX"))
    Dedup.writeSignatureIndex(oldA, tmp + "/u")
    Dedup.appendSignatureIndex(oldB, tmp + "/u")
    assert(rows(Dedup.minhashPairsAgainstIndex(nd, tmp + "/u"))
      .map(t => (t._1, t._2)) == Seq((100L, 1L), (100L, 2L)))
    spark.catalog.clearCache()
  }

  test("signature index compaction: probe-identical, stats collapse, dead rows dropped") {
    // the cap-crossing shape again: two 40-doc identical batches put
    // the merged bucket (80) over the 64 cap while each append stored
    // its rows — compaction must drop those dead rows AND keep the
    // probe answer (star through merged min) bit-identical
    val batchA = docs((1L to 40L).map(i => i -> "u v w x y z q r s t"): _*)
    val batchB = docs((41L to 80L).map(i => i -> "u v w x y z q r s t"): _*)
    // plus an under-cap pair of near-dup batches that must survive intact
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val oldA = docs(901L -> base)
    val oldB = docs(902L -> base)
    val tmp = java.nio.file.Files.createTempDirectory("graft_sig_compact").toString
    Dedup.writeSignatureIndex(batchA, tmp + "/idx")
    Dedup.appendSignatureIndex(batchB, tmp + "/idx")
    Dedup.appendSignatureIndex(oldA, tmp + "/idx")
    Dedup.appendSignatureIndex(oldB, tmp + "/idx")
    val probe = docs(999L -> "u v w x y z q r s t",
      998L -> base.replace("tok7", "tokX"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val before = rows(Dedup.minhashPairsAgainstIndex(probe, tmp + "/idx"))
    assert(before.map(t => (t._1, t._2)).contains((999L, 1L)))
    assert(before.map(t => (t._1, t._2)).contains((998L, 901L)))
    val statsBefore = spark.read.parquet(tmp + "/idx/band_stats").count()
    val rowsBefore = spark.read.parquet(tmp + "/idx/band_rows").count()
    Dedup.compactSignatureIndex(spark, tmp + "/idx")
    assert(rows(Dedup.minhashPairsAgainstIndex(probe, tmp + "/idx")) == before)
    // one row per bucket now, and the over-cap bucket's rows are gone
    val statsAfter = spark.read.parquet(tmp + "/idx/band_stats")
    assert(statsAfter.count() < statsBefore)
    assert(statsAfter.groupBy("band_idx", "band_hash").count()
      .filter(col("count") > 1).count() == 0)
    assert(spark.read.parquet(tmp + "/idx/band_rows").count() < rowsBefore)
    // compaction is idempotent
    Dedup.compactSignatureIndex(spark, tmp + "/idx")
    assert(rows(Dedup.minhashPairsAgainstIndex(probe, tmp + "/idx")) == before)
    spark.catalog.clearCache()
  }

  test("signature index: probing a batch already appended yields no self-pairs") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val batch = docs(1L -> base, 2L -> base.replace("tok7", "tokX"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_sig_self_spec").toString
    Dedup.writeSignatureIndex(batch, tmp + "/idx")
    // ingest crash-retry shape: the batch was appended, then probed
    // again — each doc must NOT report itself as a duplicate, but
    // genuine in-batch near-dups still surface (both directions)
    val out = Dedup.minhashPairsAgainstIndex(batch, tmp + "/idx")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 2L), (2L, 1L)))
    spark.catalog.clearCache()
  }

  test("connected components: a chain A~B, B~C with no A~C edge is ONE cluster") {
    import spark.implicits._
    // exactly the transitivity shape pair-listing cannot express:
    // (1,2) and (2,3) but no (1,3); plus a disjoint pair (7,8)
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("doc_a", "doc_b")
    val labels = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L))
  }

  test("connected components: label propagation crosses multi-hop paths") {
    import spark.implicits._
    // a 9-node path (diameter 8) exercises the convergence loop beyond
    // the clique/star shapes LSH usually emits — in BOTH regimes
    val path = (1L to 8L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val want = (1L to 9L).map(_ -> 1L).toMap
    val local = Dedup.connectedComponents(path)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local == want)
    val distributed = Dedup.connectedComponents(path, localSolveEdges = -1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(distributed == want)
  }

  test("connected components: local union-find == distributed supersteps on a random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    // random sparse graph over scrambled ids: chains, small cliques,
    // isolated pairs — the threshold-graph shapes semantic dedup emits
    val ids = rnd.shuffle((1L to 120L).toVector)
    val es = (0 until 90).map { _ =>
      val a = ids(rnd.nextInt(ids.size)); val b = ids(rnd.nextInt(ids.size))
      (math.min(a, b), math.max(a, b) + 1) // +1 avoids self loops after min/max
    }
    val pairs = es.toDF("doc_a", "doc_b")
    def run(thresh: Long) = Dedup.connectedComponents(pairs, localSolveEdges = thresh)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(run(Long.MaxValue) == run(-1L))
  }

  test("clusters: canonical assignment equals brute-force closure of minhash pairs") {
    // identical trio, a near-dup pair, singletons — clusters() must
    // equal an independent union-find over the collected pair list
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val corpus = docs(
      (1L, base), (2L, base.replace("tok7", "tokX")), (3L, base),
      (4L, "alpha beta gamma delta epsilon zeta eta theta"),
      (5L, "alpha beta gamma delta epsilon zeta eta iota"),
      (6L, (1 to 40).map(i => s"zzz$i").mkString(" ")))
    val pairEdges = Dedup.minhashPairs(corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // brute-force union-find on the driver (test-only oracle)
    val parent = scala.collection.mutable.Map((1L to 6L).map(i => i -> i): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    pairEdges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = (1L to 6L).map(i => i -> find(i)).toMap
    val sizes = expected.groupBy(_._2).map { case (c, m) => c -> m.size.toLong }
    val got = Dedup.clusters(corpus)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected.map { case (d, c) => d -> ((c, sizes(c))) })
    // sanity: the planted structure actually exercised the operator
    assert(expected(3L) == 1L && expected(2L) == 1L)
  }

  test("clustersBest: keeper is argmax quality (tie -> min id), one row per cluster") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val lowQ = base.replace("tok40", "tok7") // duplicated token -> 39/40 distinct
    val corpus = docs(
      (1L, lowQ), (2L, base), (3L, lowQ),
      (4L, "alpha beta gamma delta epsilon zeta eta theta"),
      (5L, "alpha beta gamma delta epsilon zeta eta iota"),
      (6L, (1 to 40).map(i => s"zzz${i % 20}").mkString(" ")))
    val got = Dedup.clustersBest(corpus)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.size == 3) // one row per cluster, not per doc
    // {1,2,3}: canonical 1, but the keeper is 2 — the only all-distinct copy
    assert(got(1L) == ((2L, 1000000L, 3L)))
    // {4,5}: equal quality -> tie broken by min doc_id
    assert(got(4L) == ((4L, 1000000L, 2L)))
    // singleton keeps itself, carrying its own (low) quality
    assert(got(6L) == ((6L, 500000L, 1L)))
  }

  test("boilerplate removal: >maxDf chunks stripped, docs reassembled in order, no rows lost") {
    // chunk size 2, maxDf 2: "HDR X" opens 3 docs (boilerplate);
    // "t1 u1".."t3 u3" are unique bodies; doc 4 is ALL boilerplate;
    // doc 5 shares a chunk with doc 1 only (df 2 <= maxDf -> kept)
    val df = docs(
      (1L, "HDR X t1 u1 s1 s2"),
      (2L, "HDR X t2 u2"),
      (3L, "HDR X t3 u3"),
      (4L, "HDR X"),
      (5L, "s1 s2 t5 u5"))
    val out = Dedup.removeBoilerplate(df, chunkTokens = 2, maxDf = 2)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out.size == 5) // every doc present
    assert(out(1L) == (("t1 u1 s1 s2", 1L)))
    assert(out(2L) == (("t2 u2", 1L)))
    assert(out(3L) == (("t3 u3", 1L)))
    assert(out(4L) == (("", 1L))) // fully boilerplate -> empty, not lost
    assert(out(5L) == (("s1 s2 t5 u5", 0L))) // df-2 chunk kept
  }

  test("substring dedup: offset-shifted passage caught where chunk dedup misses it") {
    // An 11-token passage (= w + k - 1 at the defaults: 4 + 8 - 1)
    // planted at token offset 0 of doc 1 and offset 3 of doc 2 — the
    // misalignment puts different token windows in every fixed
    // 20-token chunk, so chunkDupes sees nothing, while winnowing
    // anchors are selected by VALUE inside the shared run and match
    // regardless of where the run sits.
    val passage = "the quick brown fox jumps over the lazy sleeping old dog"
    val d = docs(
      1L -> s"$passage and then something entirely different follows here",
      2L -> s"pad tokens here $passage with another unrelated tail entirely",
      3L -> "no shared content in this document at all whatsoever today")
    val substr = Dedup.substrPairs(d)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(substr.toSeq == Seq((1L, 2L)), s"substrPairs found ${substr.toSeq}")
    assert(Dedup.chunkDupes(d, 20).count() == 0, "chunkDupes must miss the shifted passage")
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist())
  }

  test("substring dedup: below-threshold overlap is not reported") {
    // longest shared run is w + k - 2 = 10 tokens — one short of the
    // winnowing guarantee, and too rare to anchor by chance at w=4
    val ten = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val d = docs(
      1L -> s"$ten uniquetail1 moretail1 endtail1",
      2L -> s"front2 other2 $ten")
    // no guarantee of zero (an anchor CAN fall in a shorter run), so
    // pin the exact behavior: any reported pair must share >= 1 anchor
    // whose 8-shingle is inside the 10-token run; with these paddings
    // the selection lands no shared anchor (deterministic data)
    assert(Dedup.substrPairs(d).count() == 0)
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist())
  }

  test("native WinnowAnchors == builtin-composed SPEC (edge cases + randomized)") {
    import spark.implicits._
    import org.apache.spark.sql.graft.ColumnShims
    import graft.functions.WinnowAnchors
    val rnd = new scala.util.Random(20260812L)
    val vocab = Vector("a", "b", "c", "dd", "eee", "tok", "x1", "y2")
    val edge = Seq("", "one", "one two three", ("w " * 40).trim)
    val random = (1 to 60).map(_ =>
      (1 to (1 + rnd.nextInt(50))).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    val df = (edge ++ random).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    for ((k, w) <- Seq((8, 4), (3, 2), (2, 5), (1, 1))) {
      val toks = TextFunctions.tokens(col("text"))
      val got = df.select(col("doc_id"),
          ColumnShims.column(WinnowAnchors(ColumnShims.expression(toks), k, w)).as("native"),
          TextFunctions.winnowAnchorsBuiltin(col("text"), k, w).as("spec"))
        .collect()
      got.foreach { r =>
        assert(r.getSeq[Int](1) == r.getSeq[Int](2),
          s"doc ${r.getLong(0)} k=$k w=$w: native=${r.getSeq[Int](1)} spec=${r.getSeq[Int](2)}")
      }
    }
  }

  test("simhash: deterministic, equal for equal text, 32-bit range") {
    val out = docs((1L, "alpha beta gamma"), (2L, "alpha beta gamma"), (3L, "delta eps"))
      .select(col("doc_id"), Dedup.simhash(col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == out(2L))
    assert(out(1L) != out(3L))
    assert(out.values.forall(v => v >= 0 && v <= 0xffffffffL))
  }
}
