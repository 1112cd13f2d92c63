package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Intersection size of two SORTED DISTINCT long arrays by linear
  * merge — zero allocation, one pass.
  *
  * The Jaccard verify only needs |A ∩ B| of the sorted-distinct
  * shingle-hash arrays ([[ShingleHashes]] emits them sorted);
  * `size(array_intersect(...))` builds a hash set and an output array
  * per row just to count it. The builtin formulation stays as the
  * executable SPEC (equality asserted in DedupSpec).
  *
  * Inputs MUST be sorted ascending with distinct elements — the
  * contract [[ShingleHashes]] guarantees; on unsorted input the count
  * is undefined (garbage in, garbage out, like any merge join).
  */
case class IntersectCountSorted(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "intersect_count_sorted"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"intersect_count_sorted expects (array<bigint>, array<bigint>), " +
          s"got (${l.simpleString(10)}, ${r.simpleString(10)})")
    }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    IntersectCountRuntime.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.IntersectCountRuntime.count($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectCountSorted =
    copy(left = newLeft, right = newRight)
}

object IntersectCountRuntime {
  def count(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    val m = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < n && j < m) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}
