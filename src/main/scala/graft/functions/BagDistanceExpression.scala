package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** BAG (multiset-of-bytes) distance — the classic O(len) LOWER BOUND
  * on Levenshtein from the similarity-join literature (Bayardo et
  * al. / Navarro): every unit-cost edit changes the byte multiset of
  * one side by at most one element, so
  * `max(|A∖B|, |B∖A|) ≤ lev(a, b)` (multiset differences). Used as
  * the pre-DP prune in [[graft.text.Linkage.linkEditDistance]]: a
  * candidate pair whose bag distance already exceeds the per-pair
  * band cannot pass the normalized-distance filter, so skipping its
  * O(band·len) DP is exact — no oracle change (LinkageSpec asserts
  * the bound against the real DP on adversarial strings).
  *
  * Operates on CODE POINTS — the unit both engines' `levenshtein`
  * edits — via a 128-counter ASCII fast path with a map fallback for
  * supplementary text, so the bound is tight (no byte-width slack)
  * and exact for any input.
  */
case class BagDistanceLB(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bag_distance_lb"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bag_distance_lb expects (string, string), " +
          s"got (${l.simpleString(10)}, ${r.simpleString(10)})")
    }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    BagDistanceRuntime.lowerBound(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.BagDistanceRuntime.lowerBound($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BagDistanceLB =
    copy(left = newLeft, right = newRight)
}

object BagDistanceRuntime {
  /** max(Σ max(0, ca−cb), Σ max(0, cb−ca)) over CODE POINT counts —
    * one unit-cost edit changes at most one count on each side, so
    * this lower-bounds the code-point Levenshtein distance. Iterates
    * the UTF8String's bytes in place (no toString/char[] copy — this
    * runs once per candidate pair in the verify hot path): ASCII
    * bytes hit the 128-counter fast path, a multi-byte sequence is
    * keyed by its packed bytes — an injective stand-in for the code
    * point, which is all counting needs. */
  def lowerBound(a: UTF8String, b: UTF8String): Long = {
    val ascii = new Array[Int](128)
    var wide: java.util.HashMap[Integer, Integer] = null
    def add(u: UTF8String, sign: Int): Unit = {
      val n = u.numBytes
      var i = 0
      while (i < n) {
        val b0 = u.getByte(i)
        if ((b0 & 0x80) == 0) { ascii(b0 & 0x7f) += sign; i += 1 }
        else {
          val len = math.min(
            math.max(UTF8String.numBytesForFirstByte(b0), 1), n - i)
          var key = 0
          var k = 0
          while (k < len) { key = (key << 8) | (u.getByte(i + k) & 0xff); k += 1 }
          if (wide == null) wide = new java.util.HashMap[Integer, Integer]()
          wide.merge(key, sign,
            (x: Integer, y: Integer) => Integer.valueOf(x.intValue + y.intValue))
          i += len
        }
      }
    }
    add(a, 1)
    add(b, -1)
    var onlyA = 0L
    var onlyB = 0L
    var i = 0
    while (i < 128) {
      val d = ascii(i)
      if (d > 0) onlyA += d else onlyB -= d
      i += 1
    }
    if (wide != null) {
      val it = wide.values().iterator()
      while (it.hasNext) {
        val d = it.next().intValue
        if (d > 0) onlyA += d else onlyB -= d
      }
    }
    math.max(onlyA, onlyB)
  }
}
