package graft.oracle

import graft.layout.Quantize

/** DuckDB oracle for [[graft.sketch.Quantiles]] — mirrors every IEEE
  * double operation of the Spark side in the same order with the same
  * constants (printed via Double.toString, which round-trips), so the
  * quantize cell, the rank selection, and the reconstructed estimate
  * agree bit-for-bit. Same convention as EventSql.eventsHist's bucket
  * math. */
object SketchSql {

  /** Shortest-roundtrip double literal (DuckDB parses E-notation). */
  private def d(v: Double): String = java.lang.Double.toString(v)

  /** Oracle for [[graft.sketch.Quantiles.gridQuantiles]] over
    * `table.valueCol` stratified by `strataCol`. */
  def gridQuantiles(table: String, valueCol: String, strataCol: String,
      lo: Double, hi: Double, bits: Int, qPpm: Seq[Long]): String = {
    val s = Quantize.scale(lo, hi, bits)
    val maxCell = Quantize.maxCell(bits)
    val step = (hi - lo) / maxCell
    val qs = qPpm.map(q => s"(CAST($q AS BIGINT))").mkString(", ")
    s"""WITH base AS (
       |  SELECT $strataCol AS stratum, CAST($valueCol AS DOUBLE) AS v FROM $table
       |  WHERE $valueCol IS NOT NULL),
       |sk AS (
       |  SELECT stratum,
       |    CAST(floor(least(greatest(
       |      (v - CAST(${d(lo)} AS DOUBLE)) * CAST(${d(s)} AS DOUBLE), 0.0),
       |      CAST(${d(maxCell.toDouble)} AS DOUBLE))) AS BIGINT) AS cell,
       |    count(*) AS cnt
       |  FROM base GROUP BY 1, 2),
       |cum AS (
       |  SELECT stratum, cell,
       |    CAST(sum(cnt) OVER (PARTITION BY stratum ORDER BY cell) AS BIGINT) AS cum
       |  FROM sk),
       |ranks AS (
       |  SELECT n.stratum, q.q_ppm, n.n,
       |    greatest(CAST(1 AS BIGINT), (q.q_ppm * n.n + 999999) // 1000000) AS r
       |  FROM (SELECT stratum, count(*) AS n FROM base GROUP BY 1) n
       |  CROSS JOIN (SELECT * FROM (VALUES $qs) t(q_ppm)) q),
       |est AS (
       |  SELECT r.stratum, r.q_ppm, r.n, min(c.cell) AS est_cell
       |  FROM ranks r JOIN cum c ON r.stratum = c.stratum AND c.cum >= r.r
       |  GROUP BY 1, 2, 3),
       |ordered AS (
       |  SELECT stratum, v,
       |    CAST(row_number() OVER (PARTITION BY stratum ORDER BY v) AS BIGINT) AS rn
       |  FROM base),
       |exact AS (
       |  SELECT r.stratum, r.q_ppm, o.v AS exact_value
       |  FROM ranks r JOIN ordered o ON r.stratum = o.stratum AND o.rn = r.r)
       |SELECT e.stratum, e.q_ppm, e.n, x.exact_value, e.est_cell,
       |  CAST(${d(lo)} AS DOUBLE) + (e.est_cell + 1) * CAST(${d(step)} AS DOUBLE)
       |    AS est_value
       |FROM est e JOIN exact x ON e.stratum = x.stratum AND e.q_ppm = x.q_ppm""".stripMargin
  }
}
