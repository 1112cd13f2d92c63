package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Randomized equivalence sweep for the native [[BpeEncode]] against
  * an INDEPENDENT reference that implements the replace-based
  * semantics literally (the space-prefixed symbol string, the
  * two-space gap widening, java String.replace's non-overlapping
  * left-to-right scan — the exact formulation of
  * CorpusOps.applyMergeGreedy and the DuckDB oracle). Words and merge
  * operands are drawn from a 3-letter alphabet so colliding merge
  * outputs, operands that only exist as LATER ranks' outputs
  * (phantoms), same-symbol runs and back-to-back occurrences all
  * arise naturally and often — the cases where the interned-integer
  * fast path could diverge from string identity. Evaluated directly
  * through Expression.eval (no Spark jobs), so thousands of cases run
  * in milliseconds; seeds are fixed, the sweep is deterministic. */
class BpeEncodeSweepSpec extends AnyFunSuite {

  /** The replace-based reference encode. */
  private def refEncode(word: String, merges: Seq[(String, String)],
      byteLevel: Boolean): Seq[Long] = {
    val syms0: Seq[String] =
      if (byteLevel) word.getBytes("UTF-8").toSeq.map(b => f"${b & 0xff}%02X")
      else word.codePoints.toArray.toSeq
        .map(cp => new String(Character.toChars(cp)))
    var s = if (syms0.isEmpty) "" else syms0.mkString(" ", " ", "")
    for ((a, b) <- merges if s.nonEmpty) {
      val doubled = s.replace(" ", "  ") + "  "
      val pat = " " + a + "  " + b + " "
      val rep = " " + a + b + " "
      s = doubled.replace(pat, rep).replace("  ", " ")
        .reverse.dropWhile(_ == ' ').reverse
    }
    if (s.isEmpty) Seq.empty
    else {
      val baseVocab = if (byteLevel) 256L else 26L
      val symIds = merges.zipWithIndex
        .map { case ((a, b), i) => (a + b, baseVocab + i) }
        .groupBy(_._1).map { case (k, xs) => (k, xs.map(_._2).min) }
      s.drop(1).split(" ", -1).toSeq.map { sym =>
        symIds.getOrElse(sym,
          if (byteLevel) java.lang.Long.parseLong(sym, 16)
          else (sym.codePointAt(0) - 97).toLong)
      }
    }
  }

  private def nativeEncode(word: String, merges: Seq[(String, String)],
      byteLevel: Boolean): Seq[Long] = {
    val e = BpeEncode(BoundReference(0, StringType, nullable = true),
      merges, byteLevel)
    val row = new GenericInternalRow(Array[Any](UTF8String.fromString(word)))
    e.eval(row).asInstanceOf[ArrayData].toLongArray().toSeq
  }

  private def sweep(seed: Int, byteLevel: Boolean, cases: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val alpha = "abc"
    val uni = Seq("a", "b", "é", "日", "ß")
    def word(): String =
      if (byteLevel && rnd.nextInt(3) == 0)
        (1 to (1 + rnd.nextInt(8))).map(_ => uni(rnd.nextInt(uni.size))).mkString
      else (1 to (1 + rnd.nextInt(10)))
        .map(_ => alpha(rnd.nextInt(alpha.size))).mkString
    def charSym(): String = (1 to (1 + rnd.nextInt(3)))
      .map(_ => alpha(rnd.nextInt(alpha.size))).mkString
    def byteSym(): String = (1 to (1 + rnd.nextInt(3)))
      .map(_ => f"${rnd.nextInt(256)}%02X").mkString
    // bias byte-level operands toward bytes that occur in the words
    def byteSymBiased(): String =
      if (rnd.nextInt(2) == 0)
        uni(rnd.nextInt(uni.size))
          .getBytes("UTF-8").map(b => f"${b & 0xff}%02X").mkString
      else byteSym()
    for (c <- 0 until cases) {
      val nMerges = rnd.nextInt(8)
      val merges = (0 until nMerges).map { _ =>
        if (byteLevel) (byteSymBiased(), byteSymBiased())
        else (charSym(), charSym())
      }
      val w = word()
      val exp = refEncode(w, merges, byteLevel)
      val got = nativeEncode(w, merges, byteLevel)
      assert(got === exp,
        s"case $c: word='$w' merges=$merges byteLevel=$byteLevel")
    }
  }

  test("native bpe_encode == replace-based reference: 2,000 random char-level cases") {
    sweep(seed = 14, byteLevel = false, cases = 2000)
  }

  test("native bpe_encode == replace-based reference: 2,000 random byte-level cases incl. unicode") {
    sweep(seed = 15, byteLevel = true, cases = 2000)
  }
}
