package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** MinHash signature of a token array in ONE native pass: for every
  * k-token shingle, md5 the exact bytes `tok_i ' ' tok_{i+1} ...`
  * (identical to concat_ws(" ", slice(...)) — verified byte-for-byte
  * in DedupSpec), reduce the first 4 digest bytes mod p to the base
  * hash, and fold it into the `numHashes` running affine minima
  * (a_j*h + b_j mod p, coefficients from graft.dedup.Dedup.hashCoef).
  *
  * Semantically equal to the builtin-composed
  * shingleBaseHashes + signatureFromBase pipeline, but skips
  * materializing the shingle strings and the base-hash array and
  * replaces numHashes interpreted lambda passes with a tight loop.
  * Documents shorter than k tokens collapse to one whole-document
  * shingle (the shared convention).
  */
case class ShingleMinHash(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_minhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k >= 1 && numHashes >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(s"shingle_minhash: k and numHashes must be >= 1")
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_minhash expects array<string>, got ${other.simpleString(10)}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    ShingleMinHashRuntime.signature(input.asInstanceOf[ArrayData], k, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleMinHashRuntime.signature($c, $k, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): ShingleMinHash =
    copy(child = newChild)
}

/** Sorted DISTINCT 60-bit md5-prefix hashes of a token array's
  * k-shingles, in ONE native pass — the exact-verify representation for
  * Jaccard dedup. 60 bits = the first 15 hex digits of the md5, so the
  * DuckDB oracle reproduces every value with
  * `CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)` (always positive,
  * well inside BIGINT).
  *
  * Replaces intersecting arrays of shingle STRINGS (round-3 verdict:
  * megabytes of string hashing per candidate pair made the Jaccard
  * verify 55% of the whole bench) with long-array set math; distinct
  * counts are identical up to a 60-bit md5-prefix collision, and the
  * oracle shares the convention so cross-engine equality is exact.
  */
case class ShingleHashes(child: Expression, k: Int) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k >= 1 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure("shingle_hashes: k must be >= 1")
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects array<string>, got ${other.simpleString(10)}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    ShingleMinHashRuntime.hashSet(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleMinHashRuntime.hashSet($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** Winnowing anchor offsets (array<int>, ascending) of a token array's
  * k-shingle hash sequence — the offset-robust selection behind exact
  * substring dedup ([[graft.dedup.Dedup.substrPairs]]): an offset is
  * selected iff its 60-bit hash ([[ShingleHashes]] convention) is the
  * strict minimum of some full window of `w` consecutive shingle
  * positions, so two documents sharing any verbatim run of
  * >= w + k - 1 tokens share an anchor regardless of where the run
  * sits in either document. Executable builtin SPEC:
  * [[graft.text.TextFunctions.winnowAnchorsBuiltin]] (equality
  * asserted in DedupSpec). */
case class WinnowAnchors(child: Expression, k: Int, w: Int) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnow_anchors"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k >= 1 && w >= 1 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(s"k and w must be >= 1, got k=$k w=$w")
    case other =>
      TypeCheckResult.TypeCheckFailure(s"expected array<string>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    ShingleMinHashRuntime.winnowAnchors(input.asInstanceOf[ArrayData], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleMinHashRuntime.winnowAnchors($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowAnchors =
    copy(child = newChild)
}

/** Minimum full-md5 (lowercase hex) over a token array's k-shingles in
  * ONE native pass — the winnowing-style document fingerprint
  * ([[graft.text.TextFunctions.shingleFingerprint]] is the
  * builtin-composed SPEC; equality asserted in DedupSpec). The hex
  * encoding is monotonic in the digest bytes, so the minimum is found
  * by unsigned byte comparison without materializing any hex string
  * until the single winning digest. */
case class ShingleMinMd5(child: Expression, k: Int) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_min_md5"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k >= 1 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure("shingle_min_md5: k must be >= 1")
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_min_md5 expects array<string>, got ${other.simpleString(10)}")
  }

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    ShingleMinHashRuntime.minMd5(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleMinHashRuntime.minMd5($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): ShingleMinMd5 =
    copy(child = newChild)
}

object ShingleMinHashRuntime {
  import graft.dedup.Dedup.{hashCoef, HashP}

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  private val Space = Array[Byte](' ')

  /** md5 of one k-token shingle's bytes, exactly as
    * concat_ws(" ", slice(toks, start+1, width)) produces them: NULL
    * elements are skipped ALONG WITH their separator (review finding —
    * the positional-separator loop diverged from the builtin SPEC on
    * NULL tokens, reachable via the SQL-registered functions). */
  private def digestShingle(digest: MessageDigest, tokens: ArrayData,
      start: Int, width: Int): Array[Byte] = {
    digest.reset()
    var wrote = false
    var j = 0
    while (j < width) {
      val t = tokens.getUTF8String(start + j)
      if (t != null) {
        if (wrote) digest.update(Space)
        digest.update(t.getBytes)
        wrote = true
      }
      j += 1
    }
    digest.digest()
  }

  /** a/b coefficient arrays per family size (tiny, cached). */
  private val coefCache = new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  private def coefs(numHashes: Int): (Array[Long], Array[Long]) =
    coefCache.computeIfAbsent(numHashes, n => {
      val cs = (0 until n).map(hashCoef)
      (cs.map(_._1).toArray, cs.map(_._2).toArray)
    })

  def signature(tokens: ArrayData, k: Int, numHashes: Int): GenericArrayData = {
    val (as, bs) = coefs(numHashes)
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val digest = md5.get()
    val n = tokens.numElements()
    val nShingles = if (n >= k) n - k + 1 else 1
    val width = if (n >= k) k else n
    var i = 0
    while (i < nShingles) {
      val d = digestShingle(digest, tokens, i, width)
      val h = (((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)) % HashP
      var f = 0
      while (f < numHashes) {
        val v = (h * as(f) + bs(f)) % HashP
        if (v < mins(f)) mins(f) = v
        f += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Sorted distinct 60-bit md5-prefix hashes of the k-shingles (see
    * [[ShingleHashes]]). The shingle byte stream is identical to
    * [[signature]]'s; the hash is the big-endian u64 of digest bytes
    * 0..7 shifted right 4 — exactly the first 15 md5 hex digits. */
  def hashSet(tokens: ArrayData, k: Int): GenericArrayData = {
    val digest = md5.get()
    val n = tokens.numElements()
    val nShingles = if (n >= k) n - k + 1 else 1
    val width = if (n >= k) k else n
    val hs = new Array[Long](nShingles)
    var i = 0
    while (i < nShingles) {
      val d = digestShingle(digest, tokens, i, width)
      hs(i) = (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
      i += 1
    }
    java.util.Arrays.sort(hs)
    var out = 0
    i = 0
    while (i < nShingles) {
      if (i == 0 || hs(i) != hs(i - 1)) { hs(out) = hs(i); out += 1 }
      i += 1
    }
    new GenericArrayData(if (out == nShingles) hs else java.util.Arrays.copyOf(hs, out))
  }

  /** Winnowing anchor offsets over the positional 60-bit shingle
    * hashes (see [[WinnowAnchors]]): 0-based shingle offset i is an
    * anchor iff some FULL window of `w` consecutive shingle positions
    * inside the document has h(i) as its strict minimum — equivalently
    * iff the run of strictly-greater neighbors left of i plus the run
    * right of i spans at least w-1 positions. Any two documents
    * sharing a verbatim token run of >= w + k - 1 tokens therefore
    * share at least one anchor (the winnowing guarantee, Schleimer et
    * al. 2003 §4 re-derived; selection is by VALUE, so it needs no
    * cross-engine tie-break). O(m*w) single pass, w is tiny. */
  def winnowAnchors(tokens: ArrayData, k: Int, w: Int): GenericArrayData = {
    val digest = md5.get()
    val n = tokens.numElements()
    val m = if (n >= k) n - k + 1 else 1
    val width = if (n >= k) k else n
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      val d = digestShingle(digest, tokens, i, width)
      hs(i) = (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
      i += 1
    }
    val out = Array.newBuilder[Any]
    i = 0
    while (i < m) {
      var la = 0
      while (la < w - 1 && i - la - 1 >= 0 && hs(i - la - 1) > hs(i)) la += 1
      var ra = 0
      while (ra < w - 1 && i + ra + 1 <= m - 1 && hs(i + ra + 1) > hs(i)) ra += 1
      if (la + ra >= w - 1) out += Integer.valueOf(i)
      i += 1
    }
    new GenericArrayData(out.result())
  }

  /** Minimum md5 digest over the k-shingles (see [[ShingleMinMd5]]),
    * returned as the lowercase-hex UTF8String Spark's md5() emits. */
  def minMd5(tokens: ArrayData, k: Int): org.apache.spark.unsafe.types.UTF8String = {
    val digest = md5.get()
    val n = tokens.numElements()
    val nShingles = if (n >= k) n - k + 1 else 1
    val width = if (n >= k) k else n
    var best: Array[Byte] = null
    var i = 0
    while (i < nShingles) {
      val d = digestShingle(digest, tokens, i, width)
      if (best == null || java.util.Arrays.compareUnsigned(d, best) < 0) best = d
      i += 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromString(
      java.util.HexFormat.of().formatHex(best))
  }
}
