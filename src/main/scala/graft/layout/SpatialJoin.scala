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
}
