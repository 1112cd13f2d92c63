package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** 32-bit SimHash over a token array in ONE native pass.
  *
  * Semantics are bit-identical to the builtin-composed version (and to
  * the DuckDB oracle, graft.oracle.DocSql.simhash): per token, h = the
  * first 8 md5 hex digits as an unsigned 32-bit value; each bit votes
  * +1/-1; the fingerprint sets bits with a positive vote. Replacing
  * the 32-wide zip_with-per-token builtin pipeline (32 interpreted
  * lambda evaluations per token) with this expression cut
  * q_dedup_simhash from 9.5 s to well under a second at sf0.1.
  */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash32"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash32 expects array<string>, got ${other.simpleString(10)}")
  }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    SimHashRuntime.simhash32(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHashRuntime.simhash32($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

object SimHashRuntime {
  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** One pass over the tokens: hash, accumulate 32 bit votes, emit the
    * positive-vote bits. NULL array elements vote like empty strings
    * never occur in practice (split() output) but are skipped safely. */
  def simhash32(tokens: ArrayData): Long = {
    val digest = md5.get()
    val votes = new Array[Int](32)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        digest.reset()
        val d = digest.digest(tokens.getUTF8String(i).getBytes)
        // first 8 hex digits = first 4 digest bytes, big-endian u32
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        var b = 0
        while (b < 32) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 32) {
      if (votes(b) > 0) fp |= 1L << b
      b += 1
    }
    fp
  }
}
