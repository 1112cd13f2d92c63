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
  * Only keys up to 64 bits are generated (DuckDB UBIGINT); oracle
  * queries avoid u128 outputs.
  */
object DuckSql {
  private val U = "::UBIGINT"

  /** Morton (Z-order) n-dim encode, closed form. `exprs` are the
    * coordinate SQL expressions (must be non-negative and < 2^bits). */
  def mortonKeyExpr(bits: Int, exprs: Seq[String]): String = {
    val n = exprs.length
    require(bits * n <= 64, s"oracle morton limited to 64-bit keys, got ${bits * n}")
    val terms = for {
      b <- 0 until bits
      i <- 0 until n
      pos = b * n + (n - 1 - i)
    } yield s"(((CAST(${exprs(i)} AS UBIGINT) >> $b) & 1$U) << $pos)"
    terms.mkString("(", " | ", ")")
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
    require(bits * n <= 64, s"oracle hilbert limited to 64-bit keys, got ${bits * n}")
    val ks = keyCols.mkString(", ")
    val xs = (0 until n).map(i => s"x$i")
    val ctes = scala.collection.mutable.ArrayBuffer[String]()
    val baseCols = exprs.zipWithIndex.map { case (e, i) => s"CAST($e AS UBIGINT) AS x$i" }
    val whereSql = where.map(w => s" WHERE $w").getOrElse("")
    ctes += s"${prefix}base AS (SELECT $ks, ${baseCols.mkString(", ")} FROM $src$whereSql)"
    var prev = s"${prefix}base"
    // forward transform: k = bits-1 .. 1, i = 0 .. n-1 sequential
    for (k <- bits - 1 to 1 by -1; i <- 0 until n) {
      val q = s"${1L << k}$U"
      val p = s"${(1L << k) - 1L}$U"
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
      s"(CASE WHEN (x${n - 1} & ${1L << k}$U) != 0 THEN ${(1L << k) - 1L}$U ELSE 0$U END)"
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
