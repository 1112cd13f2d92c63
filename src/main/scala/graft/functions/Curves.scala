package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst
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

  /** Foldable array<string> of "sym_a sym_b" entries → rank-ordered
    * merge pairs (the [[BpeEncode]] constructor form). */
  private def constMergeList(e: Expression,
      what: String): Seq[(String, String)] = {
    val arr = e match {
      case _ if e.foldable && e.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] &&
          e.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
            .elementType == org.apache.spark.sql.types.StringType =>
        e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      case _ => throw new IllegalArgumentException(
        s"$what must be a constant (foldable) array<string> of 'sym_a sym_b' entries")
    }
    if (arr == null) throw new IllegalArgumentException(
      s"$what must be a constant (foldable) array<string> of 'sym_a sym_b' entries, got NULL")
    (0 until arr.numElements()).map { i =>
      val s = arr.getUTF8String(i).toString
      val sp = s.indexOf(' ')
      if (sp <= 0 || sp != s.lastIndexOf(' ') || sp == s.length - 1)
        throw new IllegalArgumentException(
          s"$what entry $i must be 'sym_a sym_b' (one space, two non-empty symbols): '$s'")
      (s.substring(0, sp), s.substring(sp + 1))
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

  private def sortKeyBuilder(hilbert: Boolean)(args: Seq[Expression]): Expression = {
    val name = if (hilbert) "hilbert_sort_key" else "morton_sort_key"
    args match {
      case Seq(ca: CreateArray) => CurveSortKey(ca, ca.children.size, hilbert)
      case Seq(arr, n)          => CurveSortKey(arr, constInt(n, s"$name arity"), hilbert)
      case _ =>
        throw new IllegalArgumentException(
          s"$name: pass array(a, b, ...) so the arity is static, or use $name(arr_col, n) with a literal n")
    }
  }

  private def twoArg(name: String, mk: (Expression, Expression) => Expression)(
      args: Seq[Expression]): Expression = args match {
    case Seq(a, b) => mk(a, b)
    case _ => throw new IllegalArgumentException(s"$name expects 2 arguments, got ${args.size}")
  }

  /** One registered SQL function: builder + the ExpressionInfo fields
    * (`DESCRIBE FUNCTION EXTENDED` renders usage + examples, like the
    * reference's function docs —
    * /root/reference/src/lindel_extension.cpp:959-978, :1003-1023).
    * `examples` outputs are verified in CurveExpressionSpec (each
    * example line is executed and compared against its shown result). */
  final case class FunctionDoc(
      name: String,
      builder: Seq[Expression] => Expression,
      usage: String,
      cls: Class[_],
      group: String,
      examples: String)

  /** Every SQL function this library adds: the reference's four curve
    * functions (plus the cross-engine key canonicalizer) and the
    * beyond-reference text/similarity expressions, so the whole engine
    * surface is reachable from the SQL string path. */
  val functions: Seq[FunctionDoc] = Seq(
    FunctionDoc("hilbert_encode", encodeBuilder(hilbert = true) _,
      "hilbert_encode(array(a, b, ...)) - Hilbert curve index of the N-dim point",
      classOf[CurveEncode], "math_funcs",
      """
    Examples:
      > SELECT _FUNC_(array(1Y, 2Y, 3Y, 4Y));
       3940
      > SELECT _FUNC_(array(CAST(1 AS INT), CAST(2 AS INT)));
       7
  """),
    FunctionDoc("morton_encode", encodeBuilder(hilbert = false) _,
      "morton_encode(array(a, b, ...)) - Z-order (Morton) index of the N-dim point",
      classOf[CurveEncode], "math_funcs",
      """
    Examples:
      > SELECT _FUNC_(array(1Y, 2Y, 3Y, 4Y));
       362
      > SELECT _FUNC_(array(CAST(1 AS INT), CAST(2 AS INT)));
       6
  """),
    FunctionDoc("hilbert_decode", decodeBuilder(hilbert = true) _,
      "hilbert_decode(key, n, float, unsigned[, input_bits]) - inverse of hilbert_encode",
      classOf[CurveDecode], "math_funcs",
      """
    Examples:
      > SELECT _FUNC_(CAST(7 AS DECIMAL(20,0)), 2, false, false);
       [1,2]
  """),
    FunctionDoc("morton_decode", decodeBuilder(hilbert = false) _,
      "morton_decode(key, n, float, unsigned[, input_bits]) - inverse of morton_encode",
      classOf[CurveDecode], "math_funcs",
      """
    Examples:
      > SELECT _FUNC_(CAST(6 AS DECIMAL(20,0)), 2, false, false);
       [1,2]
  """),
    FunctionDoc("curve_key_str", (args: Seq[Expression]) => CurveKeyString(args.head),
      "curve_key_str(key) - canonical unsigned-decimal string of a curve key",
      classOf[CurveKeyString], "conversion_funcs",
      """
    Examples:
      > SELECT _FUNC_(hilbert_encode(array(CAST(1 AS INT), CAST(2 AS INT))));
       7
  """),
    FunctionDoc("hilbert_sort_key", sortKeyBuilder(hilbert = true) _,
      "hilbert_sort_key(array(a, b, ...)) - order-equivalent signed-long Hilbert sort key (<=64-bit)",
      classOf[CurveSortKey], "math_funcs",
      """
    Examples:
      > SELECT _FUNC_(array(CAST(1 AS INT), CAST(2 AS INT)));
       -9223372036854775801
  """),
    FunctionDoc("morton_sort_key", sortKeyBuilder(hilbert = false) _,
      "morton_sort_key(array(a, b, ...)) - order-equivalent signed-long Z-order sort key (<=64-bit)",
      classOf[CurveSortKey], "math_funcs",
      """
    Examples:
      > SELECT _FUNC_(array(CAST(1 AS INT), CAST(2 AS INT)));
       -9223372036854775802
  """),
    FunctionDoc("simhash32", (args: Seq[Expression]) => SimHash32(args.head),
      "simhash32(tokens) - 32-bit SimHash fingerprint of a token array",
      classOf[SimHash32], "hash_funcs",
      """
    Examples:
      > SELECT _FUNC_(array('the', 'quick', 'fox'));
       265647208
  """),
    FunctionDoc("shingle_minhash", (args: Seq[Expression]) => args match {
      case Seq(toks, k, n) =>
        ShingleMinHash(toks, constInt(k, "shingle_minhash k"), constInt(n, "shingle_minhash num_hashes"))
      case other => throw new IllegalArgumentException(
        s"shingle_minhash expects (tokens, k, num_hashes), got ${other.size} arguments")
    }, "shingle_minhash(tokens, k, num_hashes) - MinHash signature over k-token shingles",
      classOf[ShingleMinHash], "hash_funcs",
      """
    Examples:
      > SELECT _FUNC_(array('a', 'b', 'c', 'd'), 3, 2);
       [124805517,249623379]
  """),
    FunctionDoc("shingle_hashes", (args: Seq[Expression]) => args match {
      case Seq(toks, k) => ShingleHashes(toks, constInt(k, "shingle_hashes k"))
      case other => throw new IllegalArgumentException(
        s"shingle_hashes expects (tokens, k), got ${other.size} arguments")
    }, "shingle_hashes(tokens, k) - sorted distinct 60-bit md5-prefix hashes of the k-shingles",
      classOf[ShingleHashes], "hash_funcs",
      """
    Examples:
      > SELECT _FUNC_(array('a', 'b', 'c', 'd'), 3);
       [31251835280889960,1055666374991771615]
  """),
    FunctionDoc("shingle_min_md5", (args: Seq[Expression]) => args match {
      case Seq(toks, k) => ShingleMinMd5(toks, constInt(k, "shingle_min_md5 k"))
      case other => throw new IllegalArgumentException(
        s"shingle_min_md5 expects (tokens, k), got ${other.size} arguments")
    }, "shingle_min_md5(tokens, k) - minimum md5 (hex) over the k-shingles (document fingerprint)",
      classOf[ShingleMinMd5], "hash_funcs",
      """
    Examples:
      > SELECT _FUNC_(array('a', 'b', 'c', 'd'), 3);
       06f0760ec7f18687a7fbc0ddbf1b1722
  """),
    FunctionDoc("winnow_anchors", (args: Seq[Expression]) => args match {
      case Seq(toks, k, w) => WinnowAnchors(toks,
        constInt(k, "winnow_anchors k"), constInt(w, "winnow_anchors w"))
      case other => throw new IllegalArgumentException(
        s"winnow_anchors expects (tokens, k, w), got ${other.size} arguments")
    }, "winnow_anchors(tokens, k, w) - winnowing anchor offsets over the k-shingle hash sequence" +
      " (any verbatim run of w+k-1 tokens shared by two docs shares an anchor)",
      classOf[WinnowAnchors], "hash_funcs",
      """
    Examples:
      > SELECT _FUNC_(array('a', 'b', 'c', 'd', 'e'), 2, 2);
       [0,2,3]
  """),
    FunctionDoc("hyperplane_band_keys", (args: Seq[Expression]) => args match {
      case Seq(qv, planes, bits) => HyperplaneBandKeys(qv,
        constInt(planes, "hyperplane_band_keys planes"), constInt(bits, "hyperplane_band_keys band_bits"))
      case other => throw new IllegalArgumentException(
        s"hyperplane_band_keys expects (qv, planes, band_bits), got ${other.size} arguments")
    }, "hyperplane_band_keys(qv, planes, band_bits) - sign-LSH band keys of a quantized vector",
      classOf[HyperplaneBandKeys], "hash_funcs",
      """
    Examples:
      > SELECT _FUNC_(array(1048576L, -2097152L), 8, 4);
       [5,5]
  """),
    FunctionDoc("subspace_sq_dists", (args: Seq[Expression]) => args match {
      case Seq(a, b, m) => SubspaceSqDists(a, b, constInt(m, "subspace_sq_dists m"))
      case other => throw new IllegalArgumentException(
        s"subspace_sq_dists expects (a, b, m), got ${other.size} arguments")
    }, "subspace_sq_dists(a, b, m) - per-subspace squared L2 distances of two quantized vectors",
      classOf[SubspaceSqDists], "math_funcs",
      """
    Examples:
      > SELECT _FUNC_(array(1L, 2L, 3L, 4L), array(2L, 4L, 6L, 8L), 2);
       [5,25]
  """),
    FunctionDoc("adc_distance", (args: Seq[Expression]) => args match {
      case Seq(c, t) => AdcDistance(c, t)
      case other => throw new IllegalArgumentException(
        s"adc_distance expects (codes, tab), got ${other.size} arguments")
    }, "adc_distance(codes, tab) - ADC lookup sum of a PQ code against a flattened j-major probe table",
      classOf[AdcDistance], "math_funcs",
      """
    Examples:
      > SELECT _FUNC_(array(1, 0), array(10L, 20L, 30L, 40L));
       50
  """),
    FunctionDoc("bpe_encode", (args: Seq[Expression]) => args match {
      case Seq(w, m, bl) => BpeEncode(w,
        constMergeList(m, "bpe_encode merges"),
        constBool(bl, "bpe_encode byte_level"))
      case other => throw new IllegalArgumentException(
        s"bpe_encode expects (word, merges, byte_level), got ${other.size} arguments")
    }, "bpe_encode(word, merges, byte_level) - BPE token ids of a word under a rank-ordered" +
      " merge table (each entry 'sym_a sym_b'); byte_level segments UTF-8 bytes (hex symbols)" +
      " instead of chars",
      classOf[BpeEncode], "string_funcs",
      """
    Examples:
      > SELECT _FUNC_('banana', array('a n', 'an a'), false);
       [1,26,27]
  """),
    FunctionDoc("dot_q", twoArg("dot_q", DotProductLong(_, _)) _,
      "dot_q(a, b) - exact integer dot product of two quantized vectors",
      classOf[DotProductLong], "math_funcs",
      """
    Examples:
      > SELECT _FUNC_(array(1L, 2L, 3L), array(4L, 5L, 6L));
       32
  """),
    FunctionDoc("intersect_count_sorted",
      twoArg("intersect_count_sorted", IntersectCountSorted(_, _)) _,
      "intersect_count_sorted(a, b) - intersection size of two sorted distinct bigint arrays",
      classOf[IntersectCountSorted], "collection_funcs",
      """
    Examples:
      > SELECT _FUNC_(array(1L, 3L, 5L), array(3L, 4L, 5L));
       2
  """),
    FunctionDoc("redact_pii", (args: Seq[Expression]) => args match {
      // built as resolved catalyst nodes (not via the Column API —
      // a registry builder must return a resolvable tree, and Column
      // nodes stay unresolved outside a DataFrame plan)
      case Seq(t) =>
        graft.text.TextFunctions.PiiPatterns.foldLeft[Expression](
          catalyst.expressions.Coalesce(Seq(t, Literal("")))) {
          case (e, (re, tag)) =>
            catalyst.expressions.RegExpReplace(e, Literal(re), Literal(tag))
        }
      case other => throw new IllegalArgumentException(
        s"redact_pii expects (text), got ${other.size} arguments")
    }, "redact_pii(text) - text with emails/phones/IPv4s replaced by <EMAIL>/<PHONE>/<IP> tags",
      classOf[org.apache.spark.sql.catalyst.expressions.RegExpReplace], "string_funcs",
      """
    Examples:
      > SELECT _FUNC_('mail bob@x.co or 555-123-0042');
       mail <EMAIL> or <PHONE>
  """),
    FunctionDoc("pii_count", (args: Seq[Expression]) => args match {
      case Seq(t) =>
        val base = catalyst.expressions.Coalesce(Seq(t, Literal("")))
        graft.text.TextFunctions.PiiPatterns
          .map { case (re, _) =>
            catalyst.expressions.Cast(
              catalyst.expressions.RegExpCount(base, Literal(re)),
              org.apache.spark.sql.types.LongType): Expression
          }
          .reduce[Expression]((a, b) => catalyst.expressions.Add(a, b))
      case other => throw new IllegalArgumentException(
        s"pii_count expects (text), got ${other.size} arguments")
    }, "pii_count(text) - number of email/phone/IPv4 matches (counted before redaction)",
      classOf[org.apache.spark.sql.catalyst.expressions.RegExpCount], "string_funcs",
      """
    Examples:
      > SELECT _FUNC_('mail bob@x.co or 555-123-0042 from 10.1.2.3');
       3
  """),
    FunctionDoc("token_bigrams", (args: Seq[Expression]) => args match {
      case Seq(t) => TokenBigrams(t)
      case other => throw new IllegalArgumentException(
        s"token_bigrams expects (tokens), got ${other.size} arguments")
    }, "token_bigrams(tokens) - adjacent token bigrams as 'a b' strings; " +
      "empty below 2 tokens",
      classOf[TokenBigrams], "array_funcs",
      """
    Examples:
      > SELECT _FUNC_(split('a b c', ' '));
       [a b,b c]
      > SELECT _FUNC_(split('one', ' '));
       []
  """),
    FunctionDoc("token_trigrams", (args: Seq[Expression]) => args match {
      case Seq(t) => TokenTrigrams(t)
      case other => throw new IllegalArgumentException(
        s"token_trigrams expects (tokens), got ${other.size} arguments")
    }, "token_trigrams(tokens) - adjacent token trigrams as 'a b c' strings; " +
      "empty below 3 tokens",
      classOf[TokenTrigrams], "array_funcs",
      """
    Examples:
      > SELECT _FUNC_(split('a b c d', ' '));
       [a b c,b c d]
      > SELECT _FUNC_(split('one two', ' '));
       []
  """),
    FunctionDoc("top_bigram_count", (args: Seq[Expression]) => args match {
      case Seq(t) => TopBigramCount(t)
      case other => throw new IllegalArgumentException(
        s"top_bigram_count expects (tokens), got ${other.size} arguments")
    }, "top_bigram_count(tokens) - multiplicity of the most frequent " +
      "adjacent token bigram (the in-row repetition signal); 0 below 2 tokens",
      classOf[TopBigramCount], "array_funcs",
      """
    Examples:
      > SELECT _FUNC_(split('a b a b a', ' '));
       2
      > SELECT _FUNC_(split('one', ' '));
       0
  """),
    FunctionDoc("cdc_cuts", (args: Seq[Expression]) => args match {
      case Seq(b, z, w) => CdcCuts(b, constInt(z, "cdc_cuts zeroNibbles"),
        constInt(w, "cdc_cuts window"))
      case other => throw new IllegalArgumentException(
        s"cdc_cuts expects (bytes, zeroNibbles, window), got ${other.size} arguments")
    }, "cdc_cuts(bytes, zeroNibbles, window) - content-defined-chunking cut " +
      "positions (1-based): i is a cut iff md5 of the uppercase hex of the " +
      "window bytes ending at i has zeroNibbles trailing zero hex digits " +
      "(expected chunk length 16^zeroNibbles bytes)",
      classOf[CdcCuts], "array_funcs",
      """
    Examples:
      > SELECT _FUNC_(encode('abcdef', 'utf-8'), 1, 2);
       [5]
      > SELECT _FUNC_(encode('hello world', 'utf-8'), 1, 3);
       [5]
  """),
    FunctionDoc("pretok_split", (args: Seq[Expression]) => args match {
      case Seq(t) => PretokSplit(t)
      case other => throw new IllegalArgumentException(
        s"pretok_split expects (text), got ${other.size} arguments")
    }, "pretok_split(text) - GPT-2-style pre-tokenization pieces " +
      "(contraction suffixes, space-attached letter/digit/symbol runs, " +
      "whitespace runs with the shipped multi-whitespace attach semantics); " +
      "pieces concatenate back to the input",
      classOf[PretokSplit], "array_funcs",
      """
    Examples:
      > SELECT _FUNC_('I''ll say don''t!');
       [I,'ll, say, don,'t,!]
      > SELECT _FUNC_('a  b');
       [a, , b]
  """),
    FunctionDoc("nfc_normalize", (args: Seq[Expression]) => args match {
      case Seq(t) => NfcNormalize(t)
      case other => throw new IllegalArgumentException(
        s"nfc_normalize expects (text), got ${other.size} arguments")
    }, "nfc_normalize(text) - Unicode NFC normalization (canonical compose); " +
      "run before tokenization/fingerprinting so composed and decomposed " +
      "forms of the same text hash identically",
      classOf[NfcNormalize], "string_funcs",
      """
    Examples:
      > SELECT _FUNC_('café');
       café
      > SELECT length(_FUNC_('café'));
       4
  """))

  /** ExpressionInfo with usage + examples, so `DESCRIBE FUNCTION
    * EXTENDED name` documents the function like the reference does. */
  private[functions] def info(f: FunctionDoc): ExpressionInfo =
    new ExpressionInfo(f.cls.getName, null, f.name, f.usage,
      "", f.examples, "", f.group, "", "", "built-in")

  /** Register on an existing session (tests, notebooks). */
  def register(spark: SparkSession): Unit =
    functions.foreach { f =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(f.name), info(f), f.builder)
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

  /** Order-equivalent long sort key (radix-sortable) of an N-dim point;
    * n*bits must be <= 64. See [[CurveSortKey]]. */
  def hilbertSortKey(cols: Column*): Column =
    col(CurveSortKey(CreateArray(cols.map(expr)), cols.size, hilbert = true))

  def mortonSortKey(cols: Column*): Column =
    col(CurveSortKey(CreateArray(cols.map(expr)), cols.size, hilbert = false))

  /** Sort-key variants for pre-built array columns (e.g. a quantized
    * embedding slice) with statically-known arity. */
  def hilbertSortKeyArray(arr: Column, n: Int): Column =
    col(CurveSortKey(expr(arr), n, hilbert = true))

  def mortonSortKeyArray(arr: Column, n: Int): Column =
    col(CurveSortKey(expr(arr), n, hilbert = false))

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
    Curves.functions.foreach { f =>
      e.injectFunction((FunctionIdentifier(f.name), Curves.info(f), f.builder))
    }
}
