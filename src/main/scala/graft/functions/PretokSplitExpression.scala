package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** GPT-2-style byte-level PRE-TOKENIZATION (Radford et al. 2019) as
  * ONE native expression: the pinned RE2-safe base split
  * ([[graft.text.TextFunctions.PretokPattern]]) followed by the
  * deterministic ATTACH transform that reproduces the shipped
  * pattern's `\s+(?!\S)` alternative — "a multi-whitespace run before
  * a non-space yields run-minus-last; the run's last character, when a
  * literal space, attaches to the following token" — without the
  * lookahead RE2 cannot express. The transform is a pure function of
  * the base-piece array, so the DuckDB oracle replays it exactly as a
  * lag/lead list transform over the same regexp_extract_all
  * ([[graft.oracle.DocSql.tokenizePretok]]); equality with the shipped
  * lookahead pattern (run driver-side under Java regex, which DOES
  * support it) is spec'd in PretokSpec, including a randomized sweep.
  *
  * The attach rules, derived case-by-case from the shipped pattern's
  * ordered alternation (each verified in PretokSpec):
  *  - whitespace run of n >= 2 chars before a non-space: emit the
  *    first n-1 chars as one piece (that is what `\s+(?!\S)` matches
  *    after backtracking);
  *  - if the run's last char is a literal space, it prefixes the next
  *    piece (the ` ?` in the shipped letter/digit/symbol
  *    alternatives) — UNLESS the next piece is a contraction, which
  *    cannot match after a space: the shipped engine then takes
  *    " '" as a symbol run and the contraction's letters fall into the
  *    following letter run (merging with an adjacent bare letter-run
  *    piece when one follows);
  *  - any other last char (tab, newline, ...) matches the shipped
  *    `\s+` fallback alone: emit it as its own single-char piece.
  *
  * Why native: the transform needs one-piece lookahead with a
  * conditional SKIP of consumed pieces — as Catalyst HOFs that is an
  * interpreted CodegenFallback lambda chain per element (~10 us/elem,
  * the recurring trap docs/PLANS.md documents); here the regex runs
  * once per document and the attach loop is a single allocation-light
  * pass. The one remaining documented divergence from the shipped
  * pattern (docs/COMPAT.md §12): Unicode whitespace splits as a symbol
  * run, because RE2's `\s` is ASCII-only; the pinned explicit class
  * spells out Python's core `[ \t\n\v\f\r]` (identical in Java and
  * RE2) but not the Unicode tail. */
case class PretokSplit(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pretok_split"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pretok_split expects string, got ${other.simpleString(10)}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    PretokRuntime.split(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PretokRuntime.split($c);")

  override protected def withNewChildInternal(newChild: Expression): PretokSplit =
    copy(child = newChild)
}

object PretokRuntime {
  /** The RE2-safe base pattern — the single source of truth:
    * [[graft.text.TextFunctions.PretokPattern]] aliases this constant
    * and the DuckDB oracle interpolates it verbatim, so the two
    * engines can never drift. */
  val BasePattern: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+" +
      "| ?[^ \\t\\n\\x0B\\f\\r\\p{L}\\p{N}]+|[ \\t\\n\\x0B\\f\\r]+"

  private val base = java.util.regex.Pattern.compile(BasePattern)
  private val letterRun = java.util.regex.Pattern.compile("^\\p{L}+$")
  private val Contractions =
    Set("'s", "'t", "'re", "'ve", "'m", "'ll", "'d")

  private def isWsRun(p: String): Boolean = {
    var i = 0
    while (i < p.length) {
      val c = p.charAt(i)
      if (c != ' ' && c != '\t' && c != '\n' && c != '\u000B' &&
          c != '\f' && c != '\r')
        return false
      i += 1
    }
    p.nonEmpty
  }

  /** Base regex pieces of `text` (they tile the string: every
    * character lands in exactly one piece). */
  def basePieces(text: String): Array[String] = {
    val m = base.matcher(text)
    val out = scala.collection.mutable.ArrayBuilder.make[String]
    while (m.find()) out += m.group()
    out.result()
  }

  /** The attach transform over base pieces — the pure function both
    * engines run (see the class doc for the rule derivation). */
  def attach(pieces: Array[String]): Array[String] = {
    val n = pieces.length
    val out = new scala.collection.mutable.ArrayBuffer[String](n)
    var i = 0
    while (i < n) {
      val p = pieces(i)
      if (i + 1 < n && p.length >= 2 && isWsRun(p)) {
        out += p.substring(0, p.length - 1)
        val last = p.charAt(p.length - 1)
        if (last != ' ') {
          out += String.valueOf(last)
          i += 1
        } else {
          val q = pieces(i + 1)
          if (Contractions.contains(q)) {
            out += " '"
            val rest = q.substring(1)
            if (i + 2 < n && letterRun.matcher(pieces(i + 2)).matches()) {
              out += rest + pieces(i + 2)
              i += 3
            } else {
              out += rest
              i += 2
            }
          } else {
            out += " " + q
            i += 2
          }
        }
      } else {
        out += p
        i += 1
      }
    }
    out.toArray
  }

  def splitString(text: String): Array[String] = attach(basePieces(text))

  def split(s: UTF8String): GenericArrayData = {
    val pieces = splitString(s.toString)
    val arr = new Array[Any](pieces.length)
    var i = 0
    while (i < pieces.length) {
      arr(i) = UTF8String.fromString(pieces(i))
      i += 1
    }
    new GenericArrayData(arr)
  }
}
