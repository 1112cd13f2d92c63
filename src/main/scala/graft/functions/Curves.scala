package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{CreateArray, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graft.ColumnShims

/** SQL + Column API surface for the curve functions.
  *
  * SQL names and argument shapes match the reference
  * (/root/reference/src/lindel_extension.cpp:950-1001):
  *   hilbert_encode(array(...))            morton_encode(array(...))
  *   hilbert_decode(key, n, float, unsigned [, input_bits])
  *   morton_decode(key, n, float, unsigned [, input_bits])
  * plus curve_key_str(key) for cross-engine canonical comparison.
  *
  * The encode arity must be statically known (the output type depends on
  * it): pass `array(a, b, ...)` directly, or use the 2-arg form
  * `hilbert_encode(arr_col, n)` with a literal n for pre-built array
  * columns (e.g. an embedding column).
  */
object Curves {

  // ---------------------------------------------------------------- util

  private def constInt(e: Expression, what: String): Int = {
    def exact(v: Long): Int =
      try Math.toIntExact(v)
      catch { case _: ArithmeticException =>
        throw new IllegalArgumentException(s"$what out of int range: $v") }
    e match {
      case Literal(v: Byte, _)    => v.toInt
      case Literal(v: Short, _)   => v.toInt
      case Literal(v: Int, _)     => v
      case Literal(v: Long, _)    => exact(v)
      case _ if e.foldable =>
        e.eval(null) match {
          case v: Byte => v.toInt; case v: Short => v.toInt
          case v: Int  => v;       case v: Long  => exact(v)
          case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
        }
      case _ => throw new IllegalArgumentException(s"$what must be a constant (foldable) integer")
    }
  }

  private def constBool(e: Expression, what: String): Boolean = e match {
    case Literal(v: Boolean, _) => v
    case _ if e.foldable =>
      e.eval(null) match {
        case v: Boolean => v
        case other => throw new IllegalArgumentException(s"$what must be a boolean literal, got $other")
      }
    case _ => throw new IllegalArgumentException(s"$what must be a constant (foldable) boolean")
  }

  private def encodeBuilder(hilbert: Boolean)(args: Seq[Expression]): Expression = {
    val name = if (hilbert) "hilbert_encode" else "morton_encode"
    args match {
      case Seq(ca: CreateArray)  => CurveEncode(ca, ca.children.size, hilbert)
      case Seq(arr, n)           => CurveEncode(arr, constInt(n, s"$name arity"), hilbert)
      case Seq(_) =>
        throw new IllegalArgumentException(
          s"$name: pass array(a, b, ...) so the arity is static, or use $name(arr_col, n) with a literal n")
      case _ =>
        throw new IllegalArgumentException(s"$name expects 1 or 2 arguments, got ${args.size}")
    }
  }

  private def decodeBuilder(hilbert: Boolean)(args: Seq[Expression]): Expression = {
    val name = if (hilbert) "hilbert_decode" else "morton_decode"
    args match {
      case Seq(key, n, f, u) =>
        CurveDecode(key, constInt(n, s"$name n"), constBool(f, s"$name float"),
          constBool(u, s"$name unsigned"), hilbert)
      case Seq(key, n, f, u, bits) =>
        CurveDecode(key, constInt(n, s"$name n"), constBool(f, s"$name float"),
          constBool(u, s"$name unsigned"), hilbert,
          Some(constInt(bits, s"$name input_bits")))
      case _ =>
        throw new IllegalArgumentException(
          s"$name expects (key, n, float, unsigned [, input_bits]), got ${args.size} arguments")
    }
  }

  /** (name, builder, usage) for every SQL function this library adds. */
  val functions: Seq[(String, Seq[Expression] => Expression, String)] = Seq(
    ("hilbert_encode", encodeBuilder(hilbert = true) _,
      "hilbert_encode(array(a, b, ...)) - Hilbert curve index of the N-dim point"),
    ("morton_encode", encodeBuilder(hilbert = false) _,
      "morton_encode(array(a, b, ...)) - Z-order (Morton) index of the N-dim point"),
    ("hilbert_decode", decodeBuilder(hilbert = true) _,
      "hilbert_decode(key, n, float, unsigned[, input_bits]) - inverse of hilbert_encode"),
    ("morton_decode", decodeBuilder(hilbert = false) _,
      "morton_decode(key, n, float, unsigned[, input_bits]) - inverse of morton_encode"),
    ("curve_key_str", (args: Seq[Expression]) => CurveKeyString(args.head),
      "curve_key_str(key) - canonical unsigned-decimal string of a curve key"))

  /** ExpressionInfo with the usage doc, so `DESCRIBE FUNCTION name` works
    * like the reference's registered function docs
    * (/root/reference/src/lindel_extension.cpp:959-978, :1003-1023). */
  private[functions] def info(name: String, usage: String): ExpressionInfo = {
    val cls =
      if (name.endsWith("_encode")) classOf[CurveEncode]
      else if (name.endsWith("_decode")) classOf[CurveDecode]
      else classOf[CurveKeyString]
    new ExpressionInfo(cls.getName, null, name, usage, "")
  }

  /** Register on an existing session (tests, notebooks). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, builder, usage) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), info(name, usage), builder)
    }

  // ------------------------------------------------------- Column API

  private def col(e: Expression): Column = ColumnShims.column(e)
  private def expr(c: Column): Expression = ColumnShims.expression(c)

  /** Hilbert key of an N-dim point given as separate columns. */
  def hilbertEncode(cols: Column*): Column =
    col(CurveEncode(CreateArray(cols.map(expr)), cols.size, hilbert = true))

  /** Morton (Z-order) key of an N-dim point given as separate columns. */
  def mortonEncode(cols: Column*): Column =
    col(CurveEncode(CreateArray(cols.map(expr)), cols.size, hilbert = false))

  /** Hilbert key of a pre-built array column with statically-known arity. */
  def hilbertEncodeArray(arr: Column, n: Int): Column =
    col(CurveEncode(expr(arr), n, hilbert = true))

  def mortonEncodeArray(arr: Column, n: Int): Column =
    col(CurveEncode(expr(arr), n, hilbert = false))

  def hilbertDecode(key: Column, n: Int, asFloat: Boolean = false,
      unsigned: Boolean = false, inputBits: Int = 0): Column =
    col(CurveDecode(expr(key), n, asFloat, unsigned, hilbert = true,
      if (inputBits > 0) Some(inputBits) else None))

  def mortonDecode(key: Column, n: Int, asFloat: Boolean = false,
      unsigned: Boolean = false, inputBits: Int = 0): Column =
    col(CurveDecode(expr(key), n, asFloat, unsigned, hilbert = false,
      if (inputBits > 0) Some(inputBits) else None))

  def curveKeyStr(key: Column): Column = col(CurveKeyString(expr(key)))

  /** Per-character ordinals of an ASCII string as a byte array — the
    * reference's string-encode convenience (docs/README.md:202-218:
    * `[ord(x) for x in split('abcd', '')]::tinyint[4]`). Characters
    * above 127 fail the ANSI byte cast, matching the tinyint-cast
    * error a user would get in the reference. */
  private def stringOrds(str: Column): Column =
    org.apache.spark.sql.functions.transform(
      org.apache.spark.sql.functions.split(str, ""),
      c => org.apache.spark.sql.functions.ascii(c).cast("byte"))

  /** Hilbert key of an n-character ASCII string (n must be static). */
  def hilbertEncodeString(str: Column, n: Int): Column =
    col(CurveEncode(expr(stringOrds(str)), n, hilbert = true))

  /** Morton key of an n-character ASCII string. */
  def mortonEncodeString(str: Column, n: Int): Column =
    col(CurveEncode(expr(stringOrds(str)), n, hilbert = false))
}

/** Session extension:
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  * or `SparkSession.builder().withExtensions(new GraftExtensions)`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    Curves.functions.foreach { case (name, builder, usage) =>
      e.injectFunction((FunctionIdentifier(name), Curves.info(name, usage), builder))
    }
}
