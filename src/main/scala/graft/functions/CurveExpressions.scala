package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

import graft.core.SFC

/** Catalyst expressions for space-filling-curve keys.
  *
  * Spark-native re-expression of the reference's four scalar functions
  * (registration: /root/reference/src/lindel_extension.cpp:950-1001).
  * Type resolution happens at analysis time (`dataType` /
  * `checkInputDataTypes`), mirroring the reference's bind functions
  * (:495-660 encode, :152-274 decode); execution is whole-stage-codegen
  * friendly via [[CurveRuntime]] static calls.
  *
  * Output type ladder (encode) — reference table
  * src/lindel_extension.cpp:521-657, §1.2 of SURVEY.md for the Spark
  * substitutions (no unsigned types in Spark):
  *   total bits <=8 -> ShortType, <=16 -> IntegerType, <=32 -> LongType,
  *   <=64 -> DecimalType(20,0), <=128 -> BinaryType (16-byte big-endian,
  *   which sorts identically to u128).
  */
object CurveExpr {
  def tagOf(dt: DataType): Int = dt match {
    case ByteType    => CurveRuntime.TByte
    case ShortType   => CurveRuntime.TShort
    case IntegerType => CurveRuntime.TInt
    case LongType    => CurveRuntime.TLong
    case FloatType   => CurveRuntime.TFloat
    case DoubleType  => CurveRuntime.TDouble
    case _           => -1
  }

  def bitsOf(tag: Int): Int = tag match {
    case CurveRuntime.TByte => 8
    case CurveRuntime.TShort => 16
    case CurveRuntime.TInt | CurveRuntime.TFloat => 32
    case CurveRuntime.TLong | CurveRuntime.TDouble => 64
    case other => throw new IllegalStateException(
      s"curve encode: unresolved element type (tag=$other); expected " +
        "array<byte|short|int|long|float|double>")
  }

  def outputType(totalBits: Int): DataType =
    if (totalBits <= 8) ShortType
    else if (totalBits <= 16) IntegerType
    else if (totalBits <= 32) LongType
    else if (totalBits <= 64) DecimalType(20, 0)
    else BinaryType
}

/** hilbert_encode / morton_encode: N-dim point (array column) -> curve key.
  *
  * `n` (the point arity) must be statically known — from `array(...)`
  * child arity or an explicit literal — because the output type depends
  * on it, exactly like the reference's fixed-size ARRAY(T, N) bind
  * (src/lindel_extension.cpp:516).
  */
case class CurveEncode(child: Expression, n: Int, hilbert: Boolean)
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def prettyName: String = if (hilbert) "hilbert_encode" else "morton_encode"

  private lazy val elemTag: Int = child.dataType match {
    case ArrayType(et, _) => CurveExpr.tagOf(et)
    case _                => -1
  }
  private lazy val elemBits: Int = CurveExpr.bitsOf(elemTag)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(et, _) if CurveExpr.tagOf(et) >= 0 =>
      val bits = CurveExpr.bitsOf(CurveExpr.tagOf(et))
      if (n < 1 || n * bits > 128)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName: n=$n of ${bits}-bit elements exceeds the 128-bit key (max n=${128 / bits})")
      else TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<byte|short|int|long|float|double>, got ${other.simpleString(10)}")
  }

  override def dataType: DataType = CurveExpr.outputType(elemBits * n)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    dataType match {
      case ShortType   => CurveRuntime.encodeLong(arr, elemTag, elemBits, n, hilbert).toShort
      case IntegerType => CurveRuntime.encodeLong(arr, elemTag, elemBits, n, hilbert).toInt
      case LongType    => CurveRuntime.encodeLong(arr, elemTag, elemBits, n, hilbert)
      case _: DecimalType => CurveRuntime.encodeDecimal(arr, elemTag, elemBits, n, hilbert)
      case BinaryType  => CurveRuntime.encodeBinary(arr, elemTag, elemBits, n, hilbert)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val rt = "graft.functions.CurveRuntime"
      val callArgs = s"$c, $elemTag, $elemBits, $n, $hilbert"
      dataType match {
        case ShortType   => s"${ev.value} = (short) $rt.encodeLong($callArgs);"
        case IntegerType => s"${ev.value} = (int) $rt.encodeLong($callArgs);"
        case LongType    => s"${ev.value} = $rt.encodeLong($callArgs);"
        case _: DecimalType => s"${ev.value} = $rt.encodeDecimal($callArgs);"
        case BinaryType  => s"${ev.value} = $rt.encodeBinary($callArgs);"
      }
    })

  override protected def withNewChildInternal(newChild: Expression): CurveEncode =
    copy(child = newChild)
}

/** hilbert_sort_key / morton_sort_key: N-dim point -> order-equivalent
  * SIGNED long (u64 key XOR Long.MinValue), for keys up to 64 bits.
  *
  * Purely a SORT column: `orderBy(curve_sort_key)` sorts on one
  * fixed-width long — eligible for Spark's radix sort — instead of the
  * Decimal(20,0) comparisons the u64 key representation costs. Not a
  * key (decode rejects it); layout writes are the intended use
  * ([[graft.layout.Layout]]). Keys wider than 64 bits already sort
  * optimally as 16-byte binary — use the encode for those.
  */
case class CurveSortKey(child: Expression, n: Int, hilbert: Boolean)
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def prettyName: String = if (hilbert) "hilbert_sort_key" else "morton_sort_key"

  private lazy val elemTag: Int = child.dataType match {
    case ArrayType(et, _) => CurveExpr.tagOf(et)
    case _                => -1
  }
  private lazy val elemBits: Int = CurveExpr.bitsOf(elemTag)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(et, _) if CurveExpr.tagOf(et) >= 0 =>
      val bits = CurveExpr.bitsOf(CurveExpr.tagOf(et))
      if (n < 1 || n * bits > 64)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName: n=$n of ${bits}-bit elements exceeds the 64-bit sort key " +
            "(wider keys already sort optimally as the encode's 16-byte binary)")
      else TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<byte|short|int|long|float|double>, got ${other.simpleString(10)}")
  }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    CurveRuntime.encodeSortKey(input.asInstanceOf[ArrayData], elemTag, elemBits, n, hilbert)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CurveRuntime.encodeSortKey($c, $elemTag, $elemBits, $n, $hilbert);")

  override protected def withNewChildInternal(newChild: Expression): CurveSortKey =
    copy(child = newChild)
}

/** hilbert_decode / morton_decode: curve key -> N-dim point.
  *
  * Mirrors the reference's decode bind (src/lindel_extension.cpp:152-274):
  * n / float / unsigned are analysis-time constants; the element type is
  * resolved from (key width, n, float?, unsigned?) via the
  * DECODE_TYPE_MAPPINGS rule (largest element width that fits).
  *
  * `inputBits` declares the key's logical width. It defaults from the
  * key's Spark type (Byte->8, Short->16, Int->32, Long/Decimal(20,0)->64,
  * Binary(16)->128); pass it explicitly when a narrower key travels in a
  * wider column (e.g. a u8 key in the ShortType that encode emits).
  */
case class CurveDecode(
    child: Expression,
    n: Int,
    asFloat: Boolean,
    unsigned: Boolean,
    hilbert: Boolean,
    inputBitsOverride: Option[Int] = None)
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def prettyName: String = if (hilbert) "hilbert_decode" else "morton_decode"

  private lazy val inputBits: Int = inputBitsOverride.getOrElse(child.dataType match {
    case ByteType                            => 8
    case ShortType                           => 16
    case IntegerType                         => 32
    case LongType                            => 64
    case d: DecimalType if d.precision >= 20 => 64
    case BinaryType                          => 128
    case _                                   => -1
  })

  /** element width from the reference DECODE_TYPE_MAPPINGS rule */
  private lazy val elemBits: Int =
    if (inputBits <= 0) 0 else SFC.decodeElemBits(inputBits, n)

  private lazy val elemType: DataType =
    if (asFloat) { if (elemBits == 32) FloatType else DoubleType }
    else if (!unsigned) elemBits match {
      case 8 => ByteType; case 16 => ShortType; case 32 => IntegerType; case 64 => LongType
    }
    else elemBits match { // unsigned: widen (Spark has no unsigned types)
      case 8 => ShortType; case 16 => IntegerType; case 32 => LongType; case 64 => DecimalType(20, 0)
    }

  private lazy val outTag: Int = elemType match {
    case _: DecimalType => 6
    case dt             => CurveExpr.tagOf(dt)
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    if (inputBits <= 0)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects an integral, decimal(>=20,0) or 16-byte binary key, got ${child.dataType.simpleString(10)}")
    else if (n < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName: n must be >= 1, got $n")
    else if (elemBits == 0)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: cannot decode $n elements from a ${inputBits}-bit key")
    else if (asFloat && elemBits != 32 && elemBits != 64)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: float decode needs 32- or 64-bit elements, but ($inputBits bits, n=$n) gives $elemBits-bit elements")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(elemType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val (hi, lo) = input match {
      case b: java.lang.Byte     => (0L, b.longValue() & 0xffL)
      case s: java.lang.Short    => (0L, s.longValue() & 0xffffL)
      case i: java.lang.Integer  => (0L, i.longValue() & 0xffffffffL)
      case l: java.lang.Long     => (0L, l.longValue())
      case d: Decimal            => val hl = CurveRuntime.decimalToKey(d, inputBits); (hl(0), hl(1))
      case b: Array[Byte]        => val hl = CurveRuntime.bytesToU128(b); (hl(0), hl(1))
    }
    CurveRuntime.decodeArray(hi, lo, elemBits, n, outTag, hilbert)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val rt = "graft.functions.CurveRuntime"
      val hi = ctx.freshName("hi")
      val lo = ctx.freshName("lo")
      val prep = child.dataType match {
        case ByteType    => s"long $hi = 0L; long $lo = ((long) $c) & 0xffL;"
        case ShortType   => s"long $hi = 0L; long $lo = ((long) $c) & 0xffffL;"
        case IntegerType => s"long $hi = 0L; long $lo = ((long) $c) & 0xffffffffL;"
        case LongType    => s"long $hi = 0L; long $lo = $c;"
        case _: DecimalType =>
          s"long[] hl$hi = $rt.decimalToKey($c, $inputBits); long $hi = hl$hi[0]; long $lo = hl$hi[1];"
        case BinaryType =>
          s"long[] hl$hi = $rt.bytesToU128($c); long $hi = hl$hi[0]; long $lo = hl$hi[1];"
      }
      s"""
         |$prep
         |${ev.value} = $rt.decodeArray($hi, $lo, $elemBits, $n, $outTag, $hilbert);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CurveDecode =
    copy(child = newChild)
}

/** u128_str / curve key canonicalization: any curve-key representation ->
  * its unsigned decimal string. Used to compare keys across engines (the
  * DuckDB oracle returns UHUGEINT; Spark returns Decimal/Binary). */
case class CurveKeyString(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "curve_key_str"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ShortType | IntegerType | LongType | BinaryType =>
      TypeCheckResult.TypeCheckSuccess
    // only scale-0 decimals are valid key carriers (u64 keys travel as
    // Decimal(20,0)); fractional decimals would throw at execution time
    case d: DecimalType if d.scale == 0 =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"curve_key_str: unsupported type ${other.simpleString(10)} (decimal keys must have scale 0)")
  }

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    org.apache.spark.unsafe.types.UTF8String.fromString(CurveRuntime.keyToStringAny(input))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.CurveRuntime.keyToString($c));")

  override protected def withNewChildInternal(newChild: Expression): CurveKeyString =
    copy(child = newChild)
}
