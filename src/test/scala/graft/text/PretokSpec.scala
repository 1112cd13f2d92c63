package graft.text

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Pins the GPT-2-style pre-tokenization semantics
  * ([[TextFunctions.PretokPattern]]): fixture splits (ASCII +
  * unicode), full-coverage concat identity, agreement with the SHIPPED
  * GPT-2 pattern (lookahead included, run driver-side with Java regex)
  * everywhere outside the two documented divergences, and the
  * divergences themselves — exactly where docs/COMPAT.md §pretok says
  * they are and nowhere else. */
class PretokSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-pretok-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def split(text: String): Seq[String] = {
    import spark.implicits._
    Seq(text).toDF("text")
      .select(TextFunctions.pretokenize(col("text")).as("p"))
      .collect()(0).getSeq[String](0)
  }

  /** The shipped GPT-2 pattern verbatim (lookahead included) — Java
    * regex supports it, so the reference runs driver-side. */
  private val Gpt2 = ("'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+" +
    "| ?[^\\s\\p{L}\\p{N}]+|\\s+(?!\\S)|\\s+").r

  private def gpt2Split(text: String): Seq[String] =
    Gpt2.findAllIn(text).toSeq

  test("fixture splits: contractions, space attachment, category runs, unicode") {
    assert(split("I'll say don't, it's 42km!") ===
      Seq("I", "'ll", " say", " don", "'t", ",", " it", "'s", " 42", "km", "!"))
    assert(split("hello world") === Seq("hello", " world"))
    assert(split("abc123def") === Seq("abc", "123", "def"))
    // unicode letters are \p{L}, CJK included; accents stay in the run
    assert(split("café über 東京 2024") ===
      Seq("café", " über", " 東京", " 2024"))
    // symbols group, letters break them
    assert(split("a+=b;") === Seq("a", "+=", "b", ";"))
    assert(split("") === Seq.empty)
  }

  test("every character lands in exactly one piece (concat identity)") {
    val fixtures = Seq("I'll say don't!", "  double  spaces  ", "tabs\tand\nnewlines",
      "mixed 東京2024 ++ text", "trailing   ", " nbsp and vt", "x")
    for (t <- fixtures)
      assert(split(t).mkString === t, s"coverage broke on: ${t.replace("\n", "\\n")}")
  }

  test("agrees with the shipped GPT-2 pattern outside the documented divergences") {
    // single spaces between tokens — the overwhelmingly common case —
    // split identically to the shipped pattern
    val agree = Seq("I'll say don't, it's 42km!", "hello world", "a+=b; c==d",
      "café über 東京 2024", "one two three4 five!", "trailing space ")
    for (t <- agree)
      assert(split(t) === gpt2Split(t), s"diverged from GPT-2 on: $t")
  }

  test("documented divergence: multi-whitespace runs before a non-space") {
    // shipped: "a  b" -> [a][ ][ b] (lookahead leaves the last space);
    // ours (RE2-expressible): [a][  ][b] — the whole run is one piece
    assert(gpt2Split("a  b") === Seq("a", " ", " b"))
    assert(split("a  b") === Seq("a", "  ", "b"))
    // at end of string both consume the full run identically
    assert(split("a  ") === gpt2Split("a  "))
  }

  test("documented divergence: vertical tab is a symbol run, not whitespace") {
    // Java \s includes \x0B, RE2's does not — the pinned explicit class
    // [ \t\n\f\r] makes BOTH engines treat \x0B as a symbol character
    assert(split("ab") === Seq("a", "", "b"))
  }

  test("documented divergence: unicode whitespace is a symbol run (shipped \\s is Unicode-aware)") {
    // GPT-2 ships under Python regex where NBSP/ideographic space are
    // \s; the pinned ASCII class makes them symbol runs here -- in
    // both engines identically, joined with adjacent symbol chars
    assert(split("a b") === Seq("a", " ", "b"))
    assert(split("x  　 y") === Seq("x", "  　", " y"))
  }

  test("pretokenizeBpe: piece ids match a hand-computed byte encode") {
    import spark.implicits._
    val docs = Seq((1L, "ab ab!")).toDF("doc_id", "text")
    // one merge: hex(a)=61, hex(b)=62 -> symbol 6162 gets id 256
    val out = CorpusOps.pretokenizeBpe(docs, Seq(("61", "62")))
      .orderBy(col("pos")).collect()
      .map(r => (r.getLong(1), r.getString(2), r.getLong(3), r.getString(4)))
    assert(out === Array(
      (0L, "ab", 1L, "256"),
      (1L, " ab", 2L, "32_256"),
      (2L, "!", 1L, "33")))
  }
}
