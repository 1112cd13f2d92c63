package graft.layout

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Order-preserving grid quantization — the bridge between REAL table
  * columns (double prices, decimal amounts, timestamps) and the
  * integer grids the curve-indexed layouts run on
  * ([[Layout.writeHilbertIndexedCells]] + [[graft.core.CurveRanges]]).
  *
  * The reference's own float semantic is raw IEEE-754 bit
  * reinterpretation (/root/reference/src/lindel_extension.cpp:708) —
  * correct for key IDENTITY but locality-hostile for LAYOUT: negative
  * doubles sort after positives in the raw-bit u64 space, and the
  * exponent dominates the top bits, so a curve over raw float bits
  * clusters by magnitude class, not value. What a layout needs is a
  * MONOTONE map onto a bits-wide integer grid; everything downstream
  * (Hilbert/Morton sort key, box -> key-range decomposition, footer
  * pruning) then works unchanged on any column type.
  *
  * [[grid]] is that map: cell = floor(clamp((v - lo) * scale)), scale =
  * (2^bits - 1) / (hi - lo). Every step is a single correctly-rounded
  * IEEE double op with one constant operand — each is monotone, so the
  * composition is monotone, and the identical operations run on the
  * driver ([[cell]]) and in the executor expression ([[grid]]), so the
  * two agree BIT-FOR-BIT (QuantizeSpec asserts equality and the
  * containment property the decomposition rests on: v in [a, b] =>
  * cell(v) in [cell(a), cell(b)]; query predicates re-check exact
  * values, so clamped out-of-domain rows and cell-boundary collisions
  * only ever widen the scanned superset, never lose a row).
  *
  * Domain bounds (`lo`, `hi`) are LAYOUT parameters, not data
  * statistics: pick the plausible domain once at table-design time
  * (like any partitioning scheme); out-of-domain values clamp to the
  * edge cells and stay queryable (they are scanned whenever their edge
  * cell is). Timestamps quantize the same way after one monotone cast
  * — epoch micros to double is exact below 2^53 (~year 2255).
  */
object Quantize {

  /** Largest cell index of a `bits`-wide grid (cells are
    * 0..2^bits - 1). bits <= 30 keeps cells safely inside a positive
    * INT for the curve sort key's element width. */
  def maxCell(bits: Int): Long = {
    require(bits >= 1 && bits <= 30, s"bits must be in [1, 30], got $bits")
    (1L << bits) - 1L
  }

  /** The one scale constant shared by [[grid]] and [[cell]]. */
  def scale(lo: Double, hi: Double, bits: Int): Double = {
    require(java.lang.Double.isFinite(lo) && java.lang.Double.isFinite(hi) && lo < hi,
      s"need finite lo < hi, got [$lo, $hi]")
    maxCell(bits) / (hi - lo)
  }

  /** Grid cell of column `c` (cast to double) on the `bits`-wide grid
    * over [lo, hi] — executor side. Long-typed, in [0, 2^bits-1].
    * NaN maps to the TOP cell explicitly in BOTH mirrors (round-8
    * ADVICE: Spark's least/greatest sort NaN above any double while
    * java.lang.Math propagates it, so the implicit behaviors diverged
    * — executor wrote the top cell, driver computed 0). Like clamped
    * out-of-domain values, NaN rows are scanned whenever their edge
    * cell is and the exact predicates re-decide membership. */
  def grid(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val s = scale(lo, hi, bits)
    val v = c.cast("double")
    when(isnan(v), lit(maxCell(bits))) // long, keeping the cell bigint
      .otherwise(
        floor(least(greatest((v - lit(lo)) * lit(s), lit(0.0d)),
          lit(maxCell(bits).toDouble))))
  }

  /** Driver-side mirror of [[grid]] — same IEEE ops in the same order,
    * so query-box corners land in exactly the cells the written rows
    * did. Used to build [[graft.core.CurveRanges]] boxes. */
  def cell(v: Double, lo: Double, hi: Double, bits: Int): Long = {
    val s = scale(lo, hi, bits)
    if (v.isNaN) maxCell(bits)
    else math.floor(math.min(math.max((v - lo) * s, 0.0d), maxCell(bits).toDouble)).toLong
  }
}
