package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Content-defined-chunking CUT POSITIONS of a byte stream, as ONE
  * native one-pass expression: position i (1-based) is a cut iff the
  * md5 of the UPPERCASE-HEX rendering of the `window` bytes ending at
  * i has `zeroNibbles` trailing zero hex digits — bit-identical to
  * the composed form `substring(md5(substr(hex(bytes), (i-w)*2+1,
  * w*2)), 33-z, z) = '0'*z` over an exploded position range
  * (equivalence spec'd in DedupSpec), and to the DuckDB oracle, which
  * keeps that composed spelling.
  *
  * Why native ([[graft.dedup.Dedup.cdcDupesBytes]]): the composed
  * form explodes one row PER BYTE of the corpus, joins each back to
  * its document's hex string, and evaluates substring+md5 per row —
  * at sf0.1 that was 5.1 s, the slowest row of the whole bench, with
  * ~all of it spent materializing and shuffling the per-byte frame.
  * Here the per-document pass hexes the bytes once, slides the md5
  * window with a thread-local reused digest, and emits ONLY the cut
  * positions (corpus/16^zeroNibbles rows) — no per-byte rows exist
  * anywhere in the plan. Same trade as [[BpeEncode]]/[[SimHash32]]. */
case class CdcCuts(child: Expression, zeroNibbles: Int, window: Int)
    extends UnaryExpression {

  require(zeroNibbles >= 1 && zeroNibbles <= 8, s"zeroNibbles=$zeroNibbles")
  require(window >= 1 && window <= 64, s"window=$window")

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cdc_cuts"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"cdc_cuts expects a binary byte stream, got ${t.simpleString(10)}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(v: Any): Any =
    cut(v.asInstanceOf[Array[Byte]])

  def cut(bytes: Array[Byte]): ArrayData =
    CdcCuts.cuts(bytes, zeroNibbles, window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cdcCuts", this, classOf[CdcCuts].getName)
    nullSafeCodeGen(ctx, ev, b => s"${ev.value} = $ref.cut($b);")
  }

  override protected def withNewChildInternal(newChild: Expression): CdcCuts =
    copy(child = newChild)
}

object CdcCuts {
  private val Hex = "0123456789ABCDEF".getBytes("US-ASCII")

  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  private[graft] def cuts(bytes: Array[Byte], zeroNibbles: Int,
      window: Int): ArrayData = {
    val n = bytes.length
    if (n < window) return new GenericArrayData(Array.empty[Long])
    val hex = new Array[Byte](2 * n)
    var i = 0
    while (i < n) {
      val b = bytes(i) & 0xff
      hex(2 * i) = Hex(b >> 4)
      hex(2 * i + 1) = Hex(b & 0xf)
      i += 1
    }
    val md = md5.get()
    val digest = new Array[Byte](16)
    val out = scala.collection.mutable.ArrayBuilder.make[Long]
    i = window
    while (i <= n) {
      md.reset()
      md.update(hex, (i - window) * 2, window * 2)
      md.digest(digest, 0, 16)
      var ok = true
      var k = 0
      while (ok && k < zeroNibbles) {
        val pos = 31 - k
        val nib =
          if ((pos & 1) == 0) (digest(pos >> 1) >> 4) & 0xf
          else digest(pos >> 1) & 0xf
        ok = nib == 0
        k += 1
      }
      if (ok) out += i.toLong
      i += 1
    }
    new GenericArrayData(out.result())
  }
}
