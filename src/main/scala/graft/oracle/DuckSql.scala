package graft.oracle

/** Generators for pure-SQL DuckDB oracle queries that recompute our
  * curve keys independently (the driver's DuckDB cannot load the lindel
  * extension — zero egress — so the oracle must express the math in
  * plain SQL: Skilling transform unrolled as chained CTEs + a bit
  * interleave).
  *
  * Validated against the reference goldens (test/sql/lindel.test 5x5
  * grids) at bits=8 and bits=32 before being committed here.
  *
  * Keys up to 128 bits are generated: coordinates travel as UBIGINT
  * (u64); keys wider than 64 bits switch the interleave arithmetic to
  * UHUGEINT (u128). Float/double inputs are handled for non-negative
  * integral values via [[floatBitsExpr]]/[[doubleBitsExpr]], which
  * recompute the IEEE-754 bit pattern (= the reference's raw-bit
  * reinterpretation of a float column) in exact integer SQL.
  */
object DuckSql {
  private val U = "::UBIGINT"

  /** Unsigned constant literal safe for any k in [0, 128). */
  private def uconst(v: BigInt, t: String = "UBIGINT"): String = s"$v::$t"

  /** The smallest DuckDB unsigned type holding a totalBits-wide key. */
  private def keyType(totalBits: Int): String =
    if (totalBits <= 64) "UBIGINT" else "UHUGEINT"

  /** IEEE-754 bits of CAST(k AS FLOAT) as UBIGINT, for a non-negative
    * integral SQL expression k < 2^24 (exact in FLOAT). The exponent is
    * the bit length of k (exact: length of the binary string), mantissa
    * = k shifted to 24 significant bits minus the implicit leading 1.
    * Validated against IEEE bit patterns for k up to 2^24-1.
    *
    * The expression self-guards: k outside [0, 2^24) makes the oracle
    * query error loudly instead of silently diverging from Spark's real
    * IEEE rounding (round-3 ADVICE — l_partkey exceeds 2^24 at sf>=100). */
  def floatBitsExpr(k: String): String = {
    val e = s"(length(format('{:b}', CAST($k AS BIGINT))) - 1)"
    s"(CASE WHEN $k < 0 OR $k >= 16777216 THEN " +
      s"CAST(error('floatBitsExpr: exact only for 0 <= k < 2^24, got ' || $k) AS UBIGINT) " +
      s"WHEN $k = 0 THEN 0$U ELSE " +
      s"(CAST(127 + $e AS UBIGINT) << 23) + (CAST($k AS UBIGINT) << (23 - $e)) - (1$U << 23) END)"
  }

  /** IEEE-754 bits of CAST(k AS DOUBLE) as UBIGINT, for non-negative
    * integral k < 2^53. Self-guards like [[floatBitsExpr]]. */
  def doubleBitsExpr(k: String): String = {
    val e = s"(length(format('{:b}', CAST($k AS BIGINT))) - 1)"
    s"(CASE WHEN $k < 0 OR $k >= 9007199254740992 THEN " +
      s"CAST(error('doubleBitsExpr: exact only for 0 <= k < 2^53, got ' || $k) AS UBIGINT) " +
      s"WHEN $k = 0 THEN 0$U ELSE " +
      s"(CAST(1023 + $e AS UBIGINT) << 52) + (CAST($k AS UBIGINT) << (52 - $e)) - (1$U << 52) END)"
  }

  /** Morton (Z-order) n-dim encode, closed form. `exprs` are the
    * coordinate SQL expressions (must be non-negative and < 2^bits). */
  def mortonKeyExpr(bits: Int, exprs: Seq[String]): String = {
    val n = exprs.length
    require(bits * n <= 128, s"oracle morton limited to 128-bit keys, got ${bits * n}")
    // exactly-64-bit keys also interleave in UHUGEINT: DuckDB 1.0's
    // statistics propagation bounds `x << 63` in int64 and overflows
    // whenever the coordinate's top bit is statistically reachable;
    // HUGEINT shifts don't hit that path. Cast back afterwards.
    val kt = if (bits * n <= 63) "UBIGINT" else "UHUGEINT"
    val terms = for {
      b <- 0 until bits
      i <- 0 until n
      pos = b * n + (n - 1 - i)
    } yield s"((CAST((CAST(${exprs(i)} AS UBIGINT) >> $b) & 1$U AS $kt)) << $pos)"
    // balanced OR tree: a flat left-assoc chain of 128 terms exceeds
    // DuckDB's expression-depth limit (max 128); pairing keeps depth
    // at log2(terms)
    def orTree(ts: Seq[String]): String =
      if (ts.size == 1) ts.head
      else orTree(ts.grouped(2).map {
        case Seq(a, b) => s"($a | $b)"
        case Seq(a)    => a
      }.toSeq)
    val tree = orTree(terms)
    if (bits * n == 64) s"CAST($tree AS UBIGINT)" else tree
  }

  /** Hilbert n-dim encode as an embeddable CTE chain (Skilling
    * transform unrolled, then the Morton interleave). Returns
    * (cteListSql, finalCteName); the final CTE selects `keyCols` plus
    * `curve_key` (UBIGINT). `src` is the FROM source of the base CTE
    * (a table name or an earlier CTE). `prefix` namespaces the CTE
    * names so several chains can live in one query (the similarity
    * oracle builds 4 band keys). Coordinates must be non-negative and
    * < 2^bits. */
  def hilbertCtes(
      bits: Int,
      exprs: Seq[String],
      src: String,
      keyCols: Seq[String],
      prefix: String = "",
      where: Option[String] = None): (String, String) = {
    val n = exprs.length
    require(bits <= 64 && bits * n <= 128,
      s"oracle hilbert limited to u64 coords / 128-bit keys, got $bits x $n")
    val ks = keyCols.mkString(", ")
    val xs = (0 until n).map(i => s"x$i")
    val ctes = scala.collection.mutable.ArrayBuffer[String]()
    val baseCols = exprs.zipWithIndex.map { case (e, i) => s"CAST($e AS UBIGINT) AS x$i" }
    val whereSql = where.map(w => s" WHERE $w").getOrElse("")
    ctes += s"${prefix}base AS (SELECT $ks, ${baseCols.mkString(", ")} FROM $src$whereSql)"
    var prev = s"${prefix}base"
    // forward transform: k = bits-1 .. 1, i = 0 .. n-1 sequential
    for (k <- bits - 1 to 1 by -1; i <- 0 until n) {
      val q = uconst(BigInt(1) << k)
      val p = uconst((BigInt(1) << k) - 1)
      val name = s"${prefix}s_${k}_$i"
      val cols = if (i == 0) {
        xs.map {
          case "x0" => s"CASE WHEN (x0 & $q) != 0 THEN xor(x0, $p) ELSE x0 END AS x0"
          case x    => x
        }
      } else {
        val xi = s"x$i"
        xs.map {
          case "x0" =>
            s"CASE WHEN ($xi & $q) != 0 THEN xor(x0, $p) ELSE xor(x0, xor(x0, $xi) & $p) END AS x0"
          case `xi` =>
            s"CASE WHEN ($xi & $q) != 0 THEN $xi ELSE xor($xi, xor(x0, $xi) & $p) END AS $xi"
          case x => x
        }
      }
      ctes += s"$name AS (SELECT $ks, ${cols.mkString(", ")} FROM $prev)"
      prev = name
    }
    // Gray encode: x[i] ^= x[i-1], sequential (uses updated x[i-1])
    for (i <- 1 until n) {
      val name = s"${prefix}g_$i"
      val cols = xs.map { case x if x == s"x$i" => s"xor(x$i, x${i - 1}) AS x$i"; case x => x }
      ctes += s"$name AS (SELECT $ks, ${cols.mkString(", ")} FROM $prev)"
      prev = name
    }
    // t from the last coordinate, applied to all
    val tTerms = (bits - 1 to 1 by -1).map { k =>
      s"(CASE WHEN (x${n - 1} & ${uconst(BigInt(1) << k)}) != 0 " +
        s"THEN ${uconst((BigInt(1) << k) - 1)} ELSE 0$U END)"
    }
    val tExpr = tTerms.reduceLeft((a, b) => s"xor($a, $b)")
    val tCols = xs.map(x => s"xor($x, $tExpr) AS $x")
    ctes += s"${prefix}gt AS (SELECT $ks, ${tCols.mkString(", ")} FROM $prev)"
    // interleave
    val keyExpr = mortonKeyExpr(bits, xs)
    ctes += s"${prefix}fin AS (SELECT $ks, $keyExpr AS curve_key FROM ${prefix}gt)"
    (ctes.mkString(",\n"), s"${prefix}fin")
  }

  /** Hilbert n-dim encode as a full query:
    * SELECT keyCols..., CAST(key AS VARCHAR) AS outName FROM ... */
  def hilbertQuery(
      bits: Int,
      exprs: Seq[String],
      table: String,
      keyCols: Seq[String],
      outName: String,
      finalOrderBy: Option[String] = None,
      where: Option[String] = None,
      limit: Option[Int] = None): String = {
    val (ctes, fin) = hilbertCtes(bits, exprs, table, keyCols, "", where)
    val ks = keyCols.mkString(", ")
    val order = finalOrderBy.map(o => s" ORDER BY $o").getOrElse("")
    val lim = limit.map(l => s" LIMIT $l").getOrElse("")
    s"WITH $ctes\nSELECT $ks, CAST(curve_key AS VARCHAR) AS $outName FROM $fin$order$lim"
  }

  /** Morton full query (same shape as hilbertQuery). */
  def mortonQuery(
      bits: Int,
      exprs: Seq[String],
      table: String,
      keyCols: Seq[String],
      outName: String,
      finalOrderBy: Option[String] = None,
      where: Option[String] = None): String = {
    val ks = keyCols.mkString(", ")
    val order = finalOrderBy.map(o => s" ORDER BY $o").getOrElse("")
    val whereSql = where.map(w => s" WHERE $w").getOrElse("")
    s"SELECT $ks, CAST(${mortonKeyExpr(bits, exprs)} AS VARCHAR) AS $outName FROM $table$whereSql$order"
  }
}
