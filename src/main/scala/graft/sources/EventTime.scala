package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnShims
import org.apache.spark.sql.types._

/** Micros-since-epoch of a TIMESTAMP / TIMESTAMP_NTZ as a native
  * codegen'd expression. Both Catalyst timestamp types physically
  * carry exactly this long (µs since 1970-01-01 00:00:00, UTC instant
  * for TIMESTAMP, "as written" for TIMESTAMP_NTZ), so the evaluation
  * is an identity reinterpretation — no timezone arithmetic, no
  * session-timezone dependence, exact for every representable value.
  * This matches DuckDB's `epoch_us(ts)` on the same parquet column
  * (naive timestamps are epoch-diffed as written there too), which is
  * what keeps the event-time operators oracle-gated bit-for-bit.
  */
case class TimestampMicros(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ts_micros"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case TimestampType | TimestampNTZType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ts_micros expects timestamp or timestamp_ntz, got ${other.simpleString(10)}")
  }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = input.asInstanceOf[Long]

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => c)

  override protected def withNewChildInternal(newChild: Expression): TimestampMicros =
    copy(child = newChild)
}

/** The type-robust event-time read boundary (round-10 verdict #1).
  *
  * The engine's internal convention for event time is ONE physical
  * shape: a BIGINT of nanos since epoch, named `ts`. What the parquet
  * on disk carries has already changed once mid-build — TIMESTAMP(NANOS)
  * (which Spark 4 can only read as a long, via
  * `spark.sql.legacy.parquet.nanosAsLong`) was regenerated as
  * timestamp[us] (which Spark 4 reads as TIMESTAMP_NTZ) — and nothing
  * prevents it changing again. Every consumer therefore normalizes
  * HERE, once, by inspecting the column's Catalyst type, instead of
  * assuming a physical representation at each of its ~20 use sites:
  *
  *  - LongType           → already nanos, pass through unchanged;
  *  - TIMESTAMP / _NTZ   → internal µs reinterpreted ([[TimestampMicros]])
  *                         × 1000, exact below 2^63 ns (year 2262).
  *
  * Works identically on batch and streaming frames (pure projection).
  */
object EventTime {

  /** `ts`-typed column → nanos-since-epoch long. */
  def tsNs(c: Column, dt: DataType): Column = dt match {
    case LongType => c
    case TimestampType | TimestampNTZType =>
      ColumnShims.column(TimestampMicros(ColumnShims.expression(c))) * lit(1000L)
    case other => throw new IllegalArgumentException(
      s"event-time column must be long (nanos) or timestamp, got $other")
  }

  /** Normalize `df`'s event-time column (default `ts`) to the long-ns
    * convention in place. No-op (same frame) when already long. */
  def normalizeNs(df: DataFrame, column: String = "ts"): DataFrame = {
    val dt = df.schema(column).dataType
    if (dt == LongType) df else df.withColumn(column, tsNs(col(column), dt))
  }
}
