package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Random-hyperplane (sign) LSH band keys for cosine similarity, in ONE
  * native pass over a quantized vector.
  *
  * Classic SimHash-for-vectors (Charikar 2002): `planes` deterministic
  * Rademacher (+-1) hyperplanes; bit i = (r_i . v >= 0); consecutive
  * `bandBits` bits form one band key. Two vectors agree on a bit with
  * probability 1 - theta/pi, so near-parallel vectors collide in some
  * band with high probability while random pairs spread over
  * 2^bandBits buckets per band.
  *
  * The +-1 sign of plane i, dimension d is the parity of
  * `(1103515245 * (i*dims + d + 1)) mod (2^31-1)` — the same affine
  * family convention as [[graft.dedup.Dedup.hashCoef]], exactly
  * reproducible in DuckDB SQL (graft.oracle.SimSql.cosinePairs).
  *
  * Input must be the FIXED-POINT quantized vector (array<long>,
  * [[graft.similarity.Similarity.quantize]]): the projection is then an
  * exact +-sum of integers (|v| <= 2^20, dims <= 2^10 keeps it far
  * inside long range), so both engines compute identical signs.
  * The builtin-composed executable SPEC is
  * [[graft.similarity.Similarity.hyperplaneBandKeysBuiltin]]
  * (equality asserted in SimilaritySpec).
  */
case class HyperplaneBandKeys(child: Expression, planes: Int, bandBits: Int)
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hyperplane_band_keys"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) =>
      if (planes < 1 || bandBits < 1 || bandBits > 30 || planes % bandBits != 0)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName: need planes >= 1 divisible by bandBits in [1,30], got ($planes, $bandBits)")
      else TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint> (a quantized vector), got ${other.simpleString(10)}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    HyperplaneRuntime.bandKeys(input.asInstanceOf[ArrayData], planes, bandBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HyperplaneRuntime.bandKeys($c, $planes, $bandBits);")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBandKeys =
    copy(child = newChild)
}

object HyperplaneRuntime {
  /** planes/bandBits band keys; bit i of its band = sign of the +-1
    * projection of plane i. All integer math (see class doc). */
  def bandKeys(qv: ArrayData, planes: Int, bandBits: Int): ArrayData = {
    val dims = qv.numElements()
    val keys = new Array[Int](planes / bandBits)
    var i = 0
    while (i < planes) {
      var acc = 0L
      var d = 0
      while (d < dims) {
        val a = (1103515245L * (i.toLong * dims + d + 1)) % 2147483647L
        if ((a & 1L) == 0L) acc += qv.getLong(d) else acc -= qv.getLong(d)
        d += 1
      }
      if (acc >= 0) keys(i / bandBits) |= 1 << (i % bandBits)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(keys)
  }
}
