package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Full BPE ENCODE of one word against a learned merge table, as ONE
  * native expression: segment the word into base symbols (UTF-16 code
  * units at char level, UTF-8 bytes at byte level), apply every merge
  * greedily left-to-right in rank order, and return the token ids —
  * base chars as `code - 97` / bytes as their value, the symbol
  * created by merge rank k (1-based) as `baseVocab - 1 + k` (25 + k
  * char-level, 255 + k byte-level), first rank winning when two merge
  * paths produce the same symbol string.
  *
  * This replaces the composed encode of
  * [[graft.text.CorpusOps.tokenizeWithMerges]]: one chained
  * `applyMergeGreedy` projection per merge plus a chained-`when`
  * symbol→id map made the PLAN ITSELF O(merges) deep — fine at the
  * gated merges=12, a plan-size killer at the 30k-50k merges a
  * shipped tokenizer carries (tens of thousands of nested
  * projections before a row is touched). Here the merge table is a
  * constructor constant compiled ONCE into an interned integer form
  * (symbol strings → dense ints, so every merge pass is primitive
  * int compares, and the id map is an array lookup), the plan is a
  * single projection at ANY merge count, and per-word work is
  * O(merges · len) int scans with an early-exit read-only probe per
  * rank. The same native-beats-composition trade as [[AdcDistance]] /
  * [[SubspaceSqDists]]; equality with the builtin composition and a
  * 2,000-merge chain are asserted in CorpusOpsSpec.
  *
  * SEMANTICS ARE PINNED to the oracle-gated composed form (see
  * [[graft.text.CorpusOps.applyMergeGreedy]]): each rank is applied
  * exactly once, in rank order, as a single non-overlapping
  * left-to-right pass — NOT the repeat-lowest-applicable-rank loop of
  * runtime BPE encoders, which can apply an early rank to a pair that
  * only becomes adjacent after a later rank runs. Matching is by
  * symbol STRING identity: a merge operand that is neither base-shaped
  * (1 char / 2 uppercase hex) nor the output of any rank can never
  * match (it is interned as a phantom id no produced symbol carries);
  * if a later rank produces that same string, both unify — exactly the
  * string-equality behavior of the replace-based form. An empty word
  * encodes to an empty array (callers filter empties; the composed
  * form's `split("")` quirk row is unreachable through the gated
  * entry points). */
case class BpeEncode(child: Expression, merges: Seq[(String, String)],
    byteLevel: Boolean) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode expects a string word, got ${t.simpleString(10)}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val table: BpeEncodeTable =
    BpeEncodeTable.build(merges, byteLevel)

  override protected def nullSafeEval(w: Any): Any =
    table.encode(w.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table,
      classOf[BpeEncodeTable].getName)
    nullSafeCodeGen(ctx, ev, w => s"${ev.value} = $ref.encode($w);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

/** The compiled form of a BPE merge table: symbol strings interned to
  * ints (base chars/bytes keep their natural code — merged symbols
  * are >= 2 chars / >= 4 hex so the ranges are disjoint — and every
  * distinct merged string gets one id at `MergedBase + k`), the per-
  * rank (a, b, ab) triples as int arrays, and the merged-id → token-id
  * map as one array. Built once per expression instance (driver side
  * for codegen via addReferenceObj, lazily on executors for the
  * interpreted path), shared read-only across rows and threads. */
final class BpeEncodeTable(
    private val pairA: Array[Int], private val pairB: Array[Int],
    private val pairAB: Array[Int], private val mergedIds: Array[Long],
    private val byteLevel: Boolean) extends Serializable {

  import BpeEncodeTable.MergedBase

  def encode(word: UTF8String): ArrayData = {
    // initial segmentation, interned: byte values / UTF-16 code units
    var arr: Array[Int] = null
    var len = 0
    if (byteLevel) {
      val bytes = word.getBytes
      len = bytes.length
      arr = new Array[Int](len)
      var i = 0
      while (i < len) { arr(i) = bytes(i) & 0xff; i += 1 }
    } else {
      // code points, not UTF-16 units: the composed form's regex `(.)`
      // splitter matches per code point, so a surrogate pair is ONE
      // base symbol there and must be one here (outside the gated
      // ^[a-z]+$ domain, but mirrored anyway)
      val chars = word.toString
      arr = new Array[Int](chars.length)
      var i = 0
      while (i < chars.length) {
        val cp = chars.codePointAt(i)
        arr(len) = cp; len += 1
        i += Character.charCount(cp)
      }
    }
    var r = 0
    val nR = pairA.length
    while (r < nR && len >= 2) {
      val a = pairA(r); val b = pairB(r)
      // read-only probe for the first occurrence: the common case is
      // "this rank does not occur in this word" and costs len compares
      var i = 0
      val lim = len - 1
      while (i < lim && !(arr(i) == a && arr(i + 1) == b)) i += 1
      if (i < lim) {
        // greedy left-to-right non-overlapping compaction from i on
        val ab = pairAB(r)
        var o = i
        while (i < len) {
          if (i < lim && arr(i) == a && arr(i + 1) == b) {
            arr(o) = ab; i += 2
          } else {
            arr(o) = arr(i); i += 1
          }
          o += 1
        }
        len = o
      }
      r += 1
    }
    val out = new Array[Long](len)
    var i = 0
    while (i < len) {
      val s = arr(i)
      out(i) =
        if (s >= MergedBase) mergedIds(s - MergedBase)
        else if (byteLevel) s.toLong
        else (s - 97).toLong
      i += 1
    }
    new GenericArrayData(out)
  }
}

object BpeEncodeTable {
  /** Interned ids below this are base symbols (code points up to
    * 0x10FFFF / byte values up to 0xFF); merged symbols count up from
    * here. */
  private[functions] val MergedBase: Int = 1 << 21

  private val HexByte = "^[0-9A-F]{2}$".r

  /** Token id of a merged symbol that is referenced as an operand but
    * never produced by any rank: it can never appear in an encoded
    * word, so the sentinel is unreachable by construction. */
  private val NeverProduced = Long.MinValue

  /** True iff `s` is well-formed UTF-16 (no unpaired surrogate half).
    * Char-level operands must be: a lone high-surrogate operand
    * followed by a lone low-surrogate operand would concatenate into
    * ONE code point, which the base-shape test would then misread as a
    * base symbol (cp - 97) instead of the rank's token id. */
  private def wellFormedUtf16(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isHighSurrogate(c)) {
        if (i + 1 >= s.length || !Character.isLowSurrogate(s.charAt(i + 1))) return false
        i += 2
      } else if (Character.isLowSurrogate(c)) return false
      else i += 1
    }
    true
  }

  def build(merges: Seq[(String, String)], byteLevel: Boolean): BpeEncodeTable = {
    val baseVocab = if (byteLevel) 256 else 26
    val intern = new java.util.HashMap[String, Integer]()
    val mergedIds = scala.collection.mutable.ArrayBuffer.empty[Long]
    // base-shaped operands resolve to their natural code; anything
    // else is a merged (or phantom) string interned by identity
    def symId(s: String): Int = {
      val base =
        if (byteLevel) { if (HexByte.findFirstIn(s).isDefined) Integer.parseInt(s, 16) else -1 }
        else if (s.codePointCount(0, s.length) == 1) s.codePointAt(0)
        else -1
      if (base >= 0) base
      else {
        val seen = intern.get(s)
        if (seen != null) seen.intValue()
        else {
          val id = MergedBase + mergedIds.length
          intern.put(s, id)
          mergedIds += NeverProduced
          id
        }
      }
    }
    val n = merges.length
    val pa = new Array[Int](n); val pb = new Array[Int](n); val pab = new Array[Int](n)
    var r = 0
    while (r < n) {
      val (a, b) = merges(r)
      require(a.nonEmpty && b.nonEmpty && !a.contains(' ') && !b.contains(' '),
        s"bpe_encode: merge rank ${r + 1} has malformed operands ('$a', '$b')")
      require(byteLevel || (wellFormedUtf16(a) && wellFormedUtf16(b)),
        s"bpe_encode: merge rank ${r + 1} has an unpaired-surrogate operand " +
          s"('$a', '$b') — char-level operands must be well-formed UTF-16")
      pa(r) = symId(a)
      pb(r) = symId(b)
      val ab = symId(a + b)
      pab(r) = ab
      // first rank to produce a string owns its token id
      if (ab >= MergedBase && mergedIds(ab - MergedBase) == NeverProduced)
        mergedIds(ab - MergedBase) = (baseVocab + r).toLong
      r += 1
    }
    new BpeEncodeTable(pa, pb, pab, mergedIds.toArray, byteLevel)
  }
}
