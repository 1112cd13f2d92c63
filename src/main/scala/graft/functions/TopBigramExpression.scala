package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count of the most frequent adjacent token BIGRAM, in one native
  * pass over the token array — the Gopher-style in-row repetition
  * signal (q_text_repetition).
  *
  * Semantically equal to the builtin-composed
  * `aggregate(array_sort(bigrams(text)), …)` run-counter
  * ([[graft.text.TextFunctions.topBigramCountBuiltin]], the
  * executable SPEC — equality asserted in CorpusOpsSpec), but ~10×
  * faster: Catalyst's higher-order functions are CodegenFallback and
  * evaluate their lambda per element on boxed rows, which made this
  * the single slowest query of the round-11 bench (2.97 s for a
  * 5,000-row narrow projection). Here the bigram never materializes
  * as a string at all: start indices are sorted by (token_i,
  * token_i+1) pairs — bigram-string equality is pair equality because
  * the join character is the split character — and one run-count pass
  * reads off the max. 0 below 2 tokens.
  */
case class TopBigramCount(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "top_bigram_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"top_bigram_count expects array<string>, got ${other.simpleString(10)}")
  }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    TopBigramRuntime.topCount(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TopBigramRuntime.topCount($c);")

  override protected def withNewChildInternal(newChild: Expression): TopBigramCount =
    copy(child = newChild)
}

/** Adjacent token bigrams ("a b" strings) of a token array in one
  * native pass — the array the LM scorer and repetition signal
  * explode. Semantically equal to the builtin-composed
  * `transform(sequence(...), i -> concat(t[i], ' ', t[i+1]))`
  * ([[graft.text.TextFunctions.bigramsBuiltin]], the executable SPEC)
  * but skips the per-element interpreted lambda + boxed element_at
  * that made the bigram explode ~13 µs/element (3.5 s for a 265k-row
  * explode at sf0.1 — the round-11 bench's LM-trio bottleneck).
  * Empty below 2 tokens; a null token nulls its bigrams (concat
  * semantics). */
case class TokenBigrams(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "token_bigrams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_bigrams expects array<string>, got ${other.simpleString(10)}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override protected def nullSafeEval(input: Any): Any =
    TopBigramRuntime.bigrams(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TopBigramRuntime.bigrams($c);")

  override protected def withNewChildInternal(newChild: Expression): TokenBigrams =
    copy(child = newChild)
}

/** Adjacent token trigrams ("a b c" strings) of a token array in one
  * native pass — the [[TokenBigrams]] pattern one order up, feeding
  * the backoff LM scorer. Empty below 3 tokens; a null token nulls
  * its trigrams (concat semantics). The builtin-composed SPEC is
  * [[graft.text.TextFunctions.trigramsBuiltin]]. */
case class TokenTrigrams(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "token_trigrams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_trigrams expects array<string>, got ${other.simpleString(10)}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override protected def nullSafeEval(input: Any): Any =
    TopBigramRuntime.trigrams(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TopBigramRuntime.trigrams($c);")

  override protected def withNewChildInternal(newChild: Expression): TokenTrigrams =
    copy(child = newChild)
}

object TopBigramRuntime {

  private val Space = UTF8String.fromString(" ")

  /** Adjacent trigram strings; empty array below 3 tokens. */
  def trigrams(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    if (n < 3) return new org.apache.spark.sql.catalyst.util.GenericArrayData(
      new Array[Any](0))
    val out = new Array[Any](n - 2)
    var i = 0
    while (i < n - 2) {
      val a = toks.getUTF8String(i)
      val b = toks.getUTF8String(i + 1)
      val c = toks.getUTF8String(i + 2)
      out(i) = if (a == null || b == null || c == null) null
        else UTF8String.concat(a, Space, b, Space, c)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Adjacent bigram strings; empty array below 2 tokens. */
  def bigrams(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    if (n < 2) return new org.apache.spark.sql.catalyst.util.GenericArrayData(
      new Array[Any](0))
    val out = new Array[Any](n - 1)
    var prev = toks.getUTF8String(0)
    var i = 0
    while (i < n - 1) {
      val next = toks.getUTF8String(i + 1)
      out(i) = if (prev == null || next == null) null
        else UTF8String.concat(prev, Space, next)
      prev = next
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Null-safe token order: null sorts first. Only used to GROUP for
    * the run pass — a null-containing bigram never matches anything
    * there, so the order among nulls is irrelevant. */
  private def cmpNullSafe(a: UTF8String, b: UTF8String): Int =
    if (a eq null) { if (b eq null) 0 else -1 }
    else if (b eq null) 1
    else a.compareTo(b)

  /** Max adjacent-bigram multiplicity of a token array. A bigram with
    * a null member follows the builtin spec's `null === prev` SQL
    * semantics ([[graft.text.TextFunctions.topBigramCountBuiltin]]):
    * it starts a fresh run of 1 and never extends one — so an
    * all-null input still returns 1, not 0 (and never NPEs, which
    * matters for the SQL-registered surface where any
    * array<string> literal can arrive). */
  def topCount(toks: ArrayData): Long = {
    val n = toks.numElements()
    if (n < 2) return 0L
    val ts = new Array[UTF8String](n)
    var i = 0
    while (i < n) { ts(i) = toks.getUTF8String(i); i += 1 }
    // sort bigram start indices by (first, second) token; any total
    // order groups equal bigrams adjacently, which is all we need
    val idx = new Array[Integer](n - 1)
    i = 0
    while (i < n - 1) { idx(i) = Integer.valueOf(i); i += 1 }
    java.util.Arrays.sort(idx, new java.util.Comparator[Integer] {
      override def compare(a: Integer, b: Integer): Int = {
        val c = cmpNullSafe(ts(a.intValue), ts(b.intValue))
        if (c != 0) c
        else cmpNullSafe(ts(a.intValue + 1), ts(b.intValue + 1))
      }
    })
    var best = 1L
    var run = 1L
    i = 1
    while (i < n - 1) {
      val p = idx(i - 1).intValue
      val q = idx(i).intValue
      if (ts(p) != null && ts(p + 1) != null && ts(q) != null &&
        ts(q + 1) != null && ts(p).compareTo(ts(q)) == 0 &&
        ts(p + 1).compareTo(ts(q + 1)) == 0) {
        run += 1L
        if (run > best) best = run
      } else run = 1L
      i += 1
    }
    best
  }
}
