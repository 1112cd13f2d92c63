package graft.oracle

/** DuckDB oracle SQL for the similarity-search operators
  * (graft.similarity.Similarity). Shares the exact fixed-point
  * conventions: qv = floor(x * 2^20) per element (BIGINT), score =
  * integer dot product, u8 bucket coord = min(floor((x + 1) * 128), 255).
  */
object SimSql {

  private val Scale = "1048576.0" // 2^20, Similarity.Scale

  /** Quantized-embedding CTE: (vec_id, qv BIGINT[]). */
  private val qCte =
    s"q AS (SELECT vec_id, list_transform(embedding, x -> " +
      s"CAST(floor(CAST(x AS DOUBLE) * $Scale) AS BIGINT)) AS qv FROM embeddings)"

  /** Integer dot product of list columns a.qv x b.qv. */
  private def dotSql(a: String, b: String): String =
    s"CAST(list_sum([$a[i] * $b[i] for i in generate_series(1, len($a))]) AS BIGINT)"

  /** Exact brute-force top-k per probe (probe = vec_id % `probeMod` = 0),
    * ranked by quantized dot product desc, neighbor_id asc. */
  def bruteForceTopK(probeMod: Int, k: Int): String =
    s"""WITH $qCte,
       |p AS (SELECT vec_id AS probe_id, qv AS pv FROM q WHERE vec_id % $probeMod = 0),
       |s AS (SELECT probe_id, q.vec_id AS neighbor_id, ${dotSql("pv", "qv")} AS dot_q
       |  FROM p, q WHERE q.vec_id != p.probe_id),
       |r AS (SELECT probe_id, neighbor_id, dot_q,
       |    CAST(row_number() OVER (PARTITION BY probe_id ORDER BY dot_q DESC, neighbor_id) AS BIGINT) AS rnk
       |  FROM s)
       |SELECT probe_id, neighbor_id, dot_q, rnk FROM r WHERE rnk <= $k""".stripMargin

  /** Banded curve-bucket ANN: `bands` 4-dim u8 Hilbert keys, bucket =
    * key >> bucketShift, +-1 multi-probe, exact re-rank over the
    * candidate set. Mirrors Similarity.annTopK stage for stage. */
  def annTopK(probeMod: Int, k: Int, bands: Int, bucketShift: Int): String = {
    val chains = (0 until bands).map { j =>
      val exprs = (0 until 4).map { d =>
        s"least(floor((CAST(embedding[${j * 4 + d + 1}] AS DOUBLE) + 1.0) * 128.0), 255.0)"
      }
      DuckSql.hilbertCtes(8, exprs, "embeddings", Seq("vec_id"), s"b${j}_")
    }
    val chainSql = chains.map(_._1).mkString(",\n")
    val bucketRows = chains.zipWithIndex.map { case ((_, fin), j) =>
      s"  SELECT vec_id, $j AS band_idx, CAST(curve_key AS BIGINT) >> $bucketShift AS bucket FROM $fin"
    }.mkString("\n  UNION ALL\n")
    s"""WITH $chainSql,
       |$qCte,
       |buckets AS (
       |$bucketRows),
       |pb AS (SELECT vec_id AS probe_id, band_idx, bucket + d.d AS bucket
       |  FROM buckets, (SELECT unnest([-1, 0, 1]) AS d) d
       |  WHERE vec_id % $probeMod = 0),
       |cand AS (SELECT DISTINCT probe_id, b.vec_id AS neighbor_id
       |  FROM pb JOIN buckets b ON b.band_idx = pb.band_idx AND b.bucket = pb.bucket
       |  WHERE b.vec_id != pb.probe_id),
       |s AS (SELECT probe_id, neighbor_id, ${dotSql("pq.qv", "nq.qv")} AS dot_q
       |  FROM cand
       |  JOIN q pq ON pq.vec_id = cand.probe_id
       |  JOIN q nq ON nq.vec_id = cand.neighbor_id),
       |r AS (SELECT probe_id, neighbor_id, dot_q,
       |    CAST(row_number() OVER (PARTITION BY probe_id ORDER BY dot_q DESC, neighbor_id) AS BIGINT) AS rnk
       |  FROM s)
       |SELECT probe_id, neighbor_id, dot_q, rnk FROM r WHERE rnk <= $k""".stripMargin
  }
}
