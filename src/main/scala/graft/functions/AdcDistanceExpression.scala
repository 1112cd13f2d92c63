package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Asymmetric-distance (ADC) lookup sum of a PQ code against a
  * FLATTENED per-probe distance table: with `m = codes.length`
  * subspaces and the table laid out j-major
  * (`tab[(j-1)*m + s] = ||p_s - c_{j,s}||^2`, the
  * [[graft.similarity.Similarity]] probe-table convention), returns
  * `SUM_s tab[codes[s]*m + s]` — the per-(probe, vector) inner loop
  * of every PQ scan.
  *
  * This is THE hot expression of the PQ family: the ADC scan
  * evaluates it once per (probe, code) pair, i.e. probes x corpus
  * times. The builtin formulation (m nested element_at calls over a
  * nested array<array<bigint>>) pays per-element GenericArrayData
  * dereferencing twice per subspace; this is one tight codegen'd
  * pass over primitive arrays (the [[SubspaceSqDists]] /
  * [[DotProductLong]] native-beats-composition trade, equality with
  * the builtin composition asserted in SimilaritySpec). Measured at
  * the sf1 bench point: the composed form made q_sim_pq the suite's
  * only superlinear-looking outlier (81x for 10x data = 100x pairs x
  * a heavy per-pair constant); the native pass restores the ~pair-
  * count scaling of the codegen'd brute-force dot.
  *
  * Out-of-range codes (code*m+s beyond the table) throw — a
  * mismatched m/ncent between encode and probe is corruption, not
  * data. */
case class AdcDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "adc_distance"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"adc_distance expects (array<int> codes, array<bigint> tab), got " +
          s"(${l.simpleString(10)}, ${r.simpleString(10)})")
    }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    AdcDistanceRuntime.dist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.AdcDistanceRuntime.dist($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcDistance =
    copy(left = newLeft, right = newRight)
}

object AdcDistanceRuntime {
  def dist(codes: ArrayData, tab: ArrayData): Long = {
    val m = codes.numElements()
    val n = tab.numElements()
    var acc = 0L
    var s = 0
    while (s < m) {
      // Long index: Int arithmetic could wrap a corrupt/large code back
      // into range and silently return a wrong distance instead of the
      // out-of-range throw this contract promises.
      val idx = codes.getInt(s).toLong * m + s
      if (idx < 0L || idx >= n.toLong)
        throw new IllegalArgumentException(
          s"adc_distance: code ${codes.getInt(s)} at subspace $s indexes " +
            s"past the $n-entry table (m=$m)")
      acc += tab.getLong(idx.toInt)
      s += 1
    }
    acc
  }
}
