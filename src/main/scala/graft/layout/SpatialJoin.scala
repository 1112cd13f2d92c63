package graft.layout

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Curves

/** Curve-cell SPATIAL JOIN — the reference's locality machinery
  * powering a JOIN rather than a scan: match every probe row of `a`
  * to the rows of `b` within a (±dx, ±dy) box, by blocking both
  * sides on the Morton key of their grid CELL and probing the 3×3
  * cell neighborhood (the classic partition-based spatial-merge /
  * grid-file join, here with the curve key as the cell id so cell
  * storage and shuffle keys inherit curve locality).
  *
  * Candidate completeness is geometric, not probabilistic: with the
  * box radius ≤ the cell width (enforced), a qualifying partner's
  * cell is always one of the probe's 9 neighbors — so the exact
  * verify sees every true pair and the result EQUALS the plain
  * inequality join (which is exactly what the DuckDB oracle runs).
  *
  * Shape at 100 TB: each side computes its cell key in one codegen'd
  * projection ([[Curves.mortonSortKey]] — a long, radix-sortable, the
  * same key a curve-ordered layout already stores); the probe side
  * explodes ×9 (its neighbor cells), the build side not at all, and
  * candidates come from ONE equi-join on the cell key with exact
  * box predicates verifying — never a theta join. Per-cell fan-out
  * is bounded by grid occupancy; a hot cell is the same skew class
  * as any hot join key (salt or AQE-split it). */
object SpatialJoin {

  /** (a_key, b_key, dx, dy) for every pair within the box; rows with
    * a_key == b_key (the same physical row probing itself in a
    * self-join) are excluded. Inputs are (keyCol, xCol, yCol) frames
    * with non-negative int coordinates. */
  def boxJoin(a: DataFrame, b: DataFrame, dx: Int, dy: Int, cellBits: Int,
      keyCol: String = "key", xCol: String = "x", yCol: String = "y"): DataFrame = {
    require(dx >= 0 && dy >= 0 && cellBits >= 1, s"dx=$dx dy=$dy cellBits=$cellBits")
    require(dx <= (1 << cellBits) && dy <= (1 << cellBits),
      s"box radius must be <= the cell width ${1 << cellBits} for 3x3 completeness")
    def cellOf(cx: Column, cy: Column): Column =
      Curves.mortonSortKey(cx.cast("int"), cy.cast("int"))
    val bs = b.select(col(keyCol).as("b_key"),
      col(xCol).cast("long").as("bx"), col(yCol).cast("long").as("by"),
      cellOf(shiftright(col(xCol), cellBits), shiftright(col(yCol), cellBits))
        .as("cell"))
    val neighborCells = {
      val cx = shiftright(col(xCol), cellBits)
      val cy = shiftright(col(yCol), cellBits)
      val cells = for (i <- -1 to 1; j <- -1 to 1) yield
        when(cx + i >= 0 && cy + j >= 0, cellOf(cx + i, cy + j))
      array(cells: _*)
    }
    val as = a.select(col(keyCol).as("a_key"),
        col(xCol).cast("long").as("ax"), col(yCol).cast("long").as("ay"),
        explode(array_distinct(neighborCells)).as("cell"))
      .filter(col("cell").isNotNull)
    as.join(bs, "cell")
      .filter(abs(col("ax") - col("bx")) <= dx &&
        abs(col("ay") - col("by")) <= dy && col("a_key") =!= col("b_key"))
      .select(col("a_key"), col("b_key"),
        (col("bx") - col("ax")).as("dx"), (col("by") - col("ay")).as("dy"))
  }

  /** [[boxJoin]] over REAL-VALUED coordinates: match every probe row
    * of `a` to the rows of `b` within a (±rx, ±ry) box on double
    * columns, by composing the order-preserving grid quantizer
    * ([[Quantize.grid]]) with the same Morton-cell 3×3 blocking.
    *
    * Completeness is again geometric: the grid step picks the LARGEST
    * bit width whose cell covers the radius — `r · scale ≤ 1`, i.e.
    * one cell is at least a radius wide — so two values within r
    * quantize to cells at most 1 apart (the quantizer is monotone and
    * 1-Lipschitz after scaling; clamping only shrinks distances), and
    * a qualifying partner is always in the 3×3 neighborhood. The
    * exact box predicates verify on the RAW doubles, so quantization
    * never decides membership — the result equals the plain
    * inequality join (the oracle). NaN coordinates quantize to the
    * top cell but fail every exact predicate, exactly like the layout
    * path's NaN rule (COMPAT §9).
    *
    * Largest-bits is also the scale choice: finer cells = fewer rows
    * per cell = bounded candidate fan-out; the cap only binds when
    * the radius is tiny relative to the domain (bits 30), where cells
    * are much finer than the radius needs — still complete, since
    * completeness only requires cell width ≥ radius. Domain bounds
    * are layout parameters as in [[Quantize]]: out-of-domain values
    * clamp to edge cells (edge-cell fan-out grows with the clamped
    * mass; exact predicates still verify). */
  def boxJoinDouble(a: DataFrame, b: DataFrame, rx: Double, ry: Double,
      xLo: Double, xHi: Double, yLo: Double, yHi: Double,
      keyCol: String = "key", xCol: String = "x", yCol: String = "y"): DataFrame = {
    require(rx > 0 && ry > 0, s"radii must be positive, got rx=$rx ry=$ry")
    // margin: the Lipschitz argument is exact over the reals, but the
    // quantizer's two correctly-rounded IEEE ops can perturb each
    // scaled endpoint by ~2^-21 absolute (u ≤ 2^30, 2 ops × ulp) — a
    // pair at distance exactly r could otherwise land 1+ε cells apart
    // and slip the 3×3 probe. 1e-5 covers the worst case 10× over.
    def bitsFor(r: Double, lo: Double, hi: Double): Int =
      (1 to 30).reverse.find(bts => r * Quantize.scale(lo, hi, bts) <= 1.0d - 1e-5)
        .getOrElse(throw new IllegalArgumentException(
          s"radius $r exceeds the domain [$lo, $hi] — no grid is 3x3-complete"))
    val xBits = bitsFor(rx, xLo, xHi)
    val yBits = bitsFor(ry, yLo, yHi)
    def cellX(c: Column) = Quantize.grid(c, xLo, xHi, xBits)
    def cellY(c: Column) = Quantize.grid(c, yLo, yHi, yBits)
    def cellOf(cx: Column, cy: Column): Column =
      Curves.mortonSortKey(cx.cast("int"), cy.cast("int"))
    val bs = b.select(col(keyCol).as("b_key"),
      col(xCol).cast("double").as("bx"), col(yCol).cast("double").as("by"),
      cellOf(cellX(col(xCol)), cellY(col(yCol))).as("cell"))
    val neighborCells = {
      val cx = cellX(col(xCol))
      val cy = cellY(col(yCol))
      val cells = for (i <- -1 to 1; j <- -1 to 1) yield
        when(cx + i >= 0 && cx + i <= Quantize.maxCell(xBits) &&
          cy + j >= 0 && cy + j <= Quantize.maxCell(yBits),
          cellOf(cx + i, cy + j))
      array(cells: _*)
    }
    val as = a.select(col(keyCol).as("a_key"),
        col(xCol).cast("double").as("ax"), col(yCol).cast("double").as("ay"),
        explode(array_distinct(neighborCells)).as("cell"))
      .filter(col("cell").isNotNull)
    as.join(bs, "cell")
      .filter(abs(col("ax") - col("bx")) <= rx &&
        abs(col("ay") - col("by")) <= ry && col("a_key") =!= col("b_key"))
      .select(col("a_key"), col("b_key"),
        (col("bx") - col("ax")).as("dx"), (col("by") - col("ay")).as("dy"))
  }
}
