package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-subspace squared L2 distances of two quantized vectors: splits
  * both arrays into `m` equal-width subvectors (width = floor(n/m);
  * trailing elements beyond m*width are ignored, matching the
  * builtin-composed SPEC and the SQL oracle's `len // m` convention)
  * and emits the m integer squared distances — the PQ encode/ADC
  * primitive ([[graft.similarity.Similarity.pqTopK]]).
  *
  * The builtin formulation evaluates 2 interpreted lambdas per element
  * per subspace; this is one tight codegen'd pass (the same
  * native-beats-lambda trade as [[DotProductLong]], asserted equal in
  * SimilaritySpec).
  */
case class SubspaceSqDists(left: Expression, right: Expression, m: Int)
    extends BinaryExpression {
  require(m > 0, s"subspace_sq_dists: m must be positive, got $m")

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "subspace_sq_dists"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"subspace_sq_dists expects (array<bigint>, array<bigint>), got " +
          s"(${l.simpleString(10)}, ${r.simpleString(10)})")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SubspaceSqDistsRuntime.dists(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SubspaceSqDistsRuntime.dists($a, $b, $m);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SubspaceSqDists =
    copy(left = newLeft, right = newRight)
}

object SubspaceSqDistsRuntime {
  def dists(a: ArrayData, b: ArrayData, m: Int): ArrayData = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"subspace_sq_dists: vector length mismatch ($n vs ${b.numElements()})")
    val w = n / m
    val out = new Array[Long](m)
    var s = 0
    var i = 0
    while (s < m) {
      var acc = 0L
      var e = 0
      while (e < w) {
        val d = a.getLong(i) - b.getLong(i)
        acc += d * d
        i += 1; e += 1
      }
      out(s) = acc
      s += 1
    }
    new GenericArrayData(out)
  }
}
