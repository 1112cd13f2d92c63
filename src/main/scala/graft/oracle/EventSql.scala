package graft.oracle

/** DuckDB oracle SQL for the events-table operators (JSON props
  * extraction, window functions, set operations) and the multimodal
  * binary/struct query over documents.
  *
  * Float-valued outputs are either raw stored values (lag) or a single
  * IEEE subtraction — deterministic across engines; sums/averages of
  * doubles are deliberately avoided (summation order differs).
  */
object EventSql {

  private val kExpr = "CAST(json_extract_string(props, '$.k') AS BIGINT)"

  /** JSON field extraction + integer aggregation per event type. */
  val eventsProps: String =
    s"""SELECT event_type,
       |  count(*) AS n,
       |  CAST(sum($kExpr) AS BIGINT) AS sum_k,
       |  min($kExpr) AS min_k,
       |  max($kExpr) AS max_k
       |FROM events GROUP BY event_type""".stripMargin

  /** Mirror of graft.streaming.TumblingAgg.agg on a static frame:
    * hourly tumbling windows are pure epoch arithmetic on the µs
    * timestamp, so the floor expression below equals Spark's
    * `window(tsm, "1 hour").start`. sum(BIGINT) widens to HUGEINT in
    * DuckDB — cast back (docs/COMPAT.md convention). */
  def eventsTumbling(windowUs: Long): String =
    s"""WITH e AS (SELECT epoch_us(ts) AS ts_us, event_type, $kExpr AS k FROM events)
       |SELECT ts_us - ts_us % $windowUs AS window_start_us, event_type,
       |  count(*) AS n,
       |  CAST(sum(k) AS BIGINT) AS sum_k
       |FROM e GROUP BY 1, 2""".stripMargin

  /** Mirror of TumblingAgg.hopping: each event lands in the windows
    * whose slide-floored starts (shift sh in 0..win/slide-1) still
    * cover it; with win = 2*slide both shifts always qualify, but the
    * coverage filter is kept so the SQL states the general rule. */
  def eventsHopping(windowUs: Long, slideUs: Long): String = {
    val shifts = (0 until (windowUs / slideUs).toInt).mkString("[", ", ", "]")
    s"""WITH e AS (SELECT epoch_us(ts) AS ts_us, event_type, $kExpr AS k FROM events),
       |x AS (SELECT ts_us, event_type, k, unnest($shifts) AS sh FROM e),
       |w AS (SELECT ts_us, event_type, k,
       |  (ts_us - ts_us % $slideUs) - sh * $slideUs AS window_start_us FROM x)
       |SELECT window_start_us, event_type, count(*) AS n,
       |  CAST(sum(k) AS BIGINT) AS sum_k
       |FROM w WHERE window_start_us + $windowUs > ts_us
       |GROUP BY 1, 2""".stripMargin
  }

  /** Per-type equi-width histogram of `value`: bucket = one IEEE
    * double division + exact floor (identical across engines), top
    * bucket clamps the tail; count is exact, min/max are selections
    * of stored doubles, never float sums. */
  def eventsHist(width: Double, maxBucket: Long): String =
    s"""SELECT event_type,
       |  CAST(least(floor(value / $width), $maxBucket) AS BIGINT) AS bucket,
       |  count(*) AS n, min(value) AS lo, max(value) AS hi
       |FROM events GROUP BY 1, 2""".stripMargin

  /** Mirror of graft.streaming.StreamJoin.attribution on static
    * frames: view→purchase pairs of the same user with
    * 0 <= lag <= horizon. Timestamps are µs-truncated (epoch_us on
    * TIMESTAMP_NS == Spark's ns // 1000) BEFORE the comparison, so
    * boundary rows agree bit-for-bit; lag stays BIGINT (no window
    * sum, no HUGEINT widening). */
  def streamAttribution(horizonUs: Long): String =
    s"""WITH v AS (SELECT event_id AS view_id, user_id, epoch_us(ts) AS vus
       |  FROM events WHERE event_type = 'view'),
       |p AS (SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS pus
       |  FROM events WHERE event_type = 'purchase')
       |SELECT v.view_id, p.purchase_id, v.user_id, p.pus - v.vus AS lag_us
       |FROM v JOIN p USING (user_id)
       |WHERE p.pus >= v.vus AND p.pus - v.vus <= $horizonUs""".stripMargin

  /** Mirror of the q_join_salted result: the salt is internal to the
    * Spark operator (graft.operators.SaltedJoin), so the oracle is
    * simply the UNSALTED join — that equality is the operator's
    * correctness contract. */
  val joinSalted: String =
    """WITH dim AS (SELECT event_type, count(*) AS type_n FROM events GROUP BY 1)
      |SELECT e.event_id, e.event_type, dim.type_n
      |FROM events e JOIN dim USING (event_type)""".stripMargin

  /** Per-user event sequence: lag + delta + row_number over the time
    * order (value is a stored double; delta is one IEEE subtraction). */
  val eventsWindow: String =
    """SELECT user_id, event_id, value,
      |  lag(value) OVER w AS prev_value,
      |  value - lag(value) OVER w AS delta,
      |  CAST(row_number() OVER w AS BIGINT) AS rn
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin

  /** Event-time rolling aggregate: RANGE frame (1 h in µs) per user.
    * Peers enter the frame together in both engines, so ties in ts_us
    * cannot cause divergence; count/sum are exact integers. */
  def eventsRolling(windowUs: Long): String =
    s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, $kExpr AS k FROM events)
       |SELECT user_id, event_id, ts_us,
       |  count(*) OVER w AS roll_n,
       |  CAST(sum(k) OVER w AS BIGINT) AS roll_sum_k
       |FROM e
       |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
       |  RANGE BETWEEN $windowUs PRECEDING AND CURRENT ROW)""".stripMargin

  /** Pivot oracle as conditional aggregation — the engine-neutral
    * spelling of the same rotate; 0 (not NULL) for absent combos,
    * matching the Spark side's coalesce. */
  def eventsPivot(types: Seq[String]): String = {
    val cols = types.map(t =>
      s"CAST(count(CASE WHEN event_type = '${t.replace("'", "''")}' THEN 1 END) AS BIGINT) AS \"$t\"")
      .mkString(",\n  ")
    s"""SELECT user_id % 10 AS user_mod,
       |  $cols
       |FROM events GROUP BY 1""".stripMargin
  }

  /** Set ops: users with a high-k error or purchase, minus users with a
    * high-k click. UNION ALL + EXCEPT (distinct) mirrors Spark's
    * union/except semantics exactly. */
  def setOp(kMin: Int): String =
    s"""(SELECT user_id FROM events WHERE event_type = 'error' AND $kExpr > $kMin
       | UNION ALL
       | SELECT user_id FROM events WHERE event_type = 'purchase' AND $kExpr > $kMin)
       |EXCEPT
       |SELECT user_id FROM events WHERE event_type = 'click' AND $kExpr > $kMin""".stripMargin

  /** As-of join oracle: DuckDB's NATIVE ASOF JOIN — an independent
    * implementation of the semantics our Spark side expresses as a
    * single-sort window (last click ts at-or-before each purchase,
    * per user). */
  val asofJoin: String =
    """SELECT p.user_id, p.event_id, epoch_us(p.ts) AS ts_us, epoch_us(c.ts) AS last_click_us
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin

  /** CUBE aggregation (grouping-sets family) with integer aggregates. */
  val cubeAgg: String =
    s"""SELECT event_type, user_id % 10 AS user_mod,
       |  count(*) AS n, CAST(sum($kExpr) AS BIGINT) AS sum_k
       |FROM events GROUP BY CUBE(event_type, user_id % 10)""".stripMargin

  /** Hierarchical (prefix-only) twin of [[cubeAgg]]. */
  val rollupAgg: String =
    s"""SELECT event_type, user_id % 10 AS user_mod,
       |  count(*) AS n, CAST(sum($kExpr) AS BIGINT) AS sum_k
       |FROM events GROUP BY ROLLUP(event_type, user_id % 10)""".stripMargin

  /** Mirror of q_events_resample: per-user DAILY time grid with
    * zero-fill — every day between the user's first and last event
    * appears, empty days as (0, 0). */
  val eventsResample: String =
    s"""WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day_idx,
       |  $kExpr AS k FROM events),
       |b AS (SELECT user_id, min(day_idx) AS d0, max(day_idx) AS d1
       |  FROM e GROUP BY user_id),
       |g AS (SELECT user_id, unnest(generate_series(d0, d1)) AS day_idx FROM b),
       |c AS (SELECT user_id, day_idx, count(*) AS n, sum(k) AS sk
       |  FROM e GROUP BY user_id, day_idx)
       |SELECT g.user_id, g.day_idx,
       |  coalesce(c.n, 0) AS n_events, CAST(coalesce(c.sk, 0) AS BIGINT) AS sum_k
       |FROM g LEFT JOIN c ON g.user_id = c.user_id AND g.day_idx = c.day_idx""".stripMargin

  /** Mirror of q_events_interarrival: per-user inter-event gaps
    * bucketed to minutes (capped at 120) — the arrival-process
    * profile. */
  val eventsInterarrival: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id FROM events),
      |d AS (SELECT ts_us - lag(ts_us) OVER (PARTITION BY user_id
      |    ORDER BY ts_us, event_id) AS delta FROM e)
      |SELECT least(delta // 60000000, 120) AS minute_bucket, count(*) AS n
      |FROM d WHERE delta IS NOT NULL
      |GROUP BY least(delta // 60000000, 120)""".stripMargin

  /** Mirror of q_events_dau: daily actives + trailing-7-day actives,
    * both EXACT distinct counts (the trailing window via a range join
    * against the day frame — a rolling distinct is not a mergeable
    * window aggregate, so the join states the semantics). */
  /** Mirror of q_events_anomaly: per-type daily counts, the 3-sigma
    * test in the cleared-denominator exact-integer form
    * (n*x - S)^2 > 9*(n*Q - S^2) — HUGEINT squares, BIGINT out. */
  val eventsAnomaly: String =
    """WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day_idx,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |st AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
      |    CAST(sum(cnt) AS HUGEINT) AS s,
      |    sum(CAST(cnt AS HUGEINT) * CAST(cnt AS HUGEINT)) AS q
      |  FROM daily GROUP BY 1)
      |SELECT d.event_type, d.day_idx, d.cnt,
      |  (st.n * d.cnt - st.s) * (st.n * d.cnt - st.s) > 9 * (st.n * st.q - st.s * st.s)
      |    AS is_anomaly
      |FROM daily d JOIN st USING (event_type)""".stripMargin

  val eventsDau: String =
    """WITH e AS (SELECT DISTINCT epoch_us(ts) // 86400000000 AS day_idx, user_id
      |  FROM events),
      |d AS (SELECT DISTINCT day_idx FROM e),
      |dau AS (SELECT day_idx, count(*) AS dau FROM e GROUP BY day_idx),
      |w AS (SELECT d.day_idx, CAST(count(DISTINCT e.user_id) AS BIGINT) AS wau7
      |  FROM d JOIN e ON e.day_idx BETWEEN d.day_idx - 6 AND d.day_idx
      |  GROUP BY d.day_idx)
      |SELECT dau.day_idx, dau.dau, w.wau7 FROM dau JOIN w USING (day_idx)""".stripMargin

  /** Mirror of q_events_funnel: strictly-ordered stage times — first
    * view, first click AFTER that view, first purchase AFTER that
    * click; users keep NULLs for the stages they never reach. */
  val eventsFunnel: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_type FROM events),
      |v AS (SELECT user_id, min(ts_us) AS view_us FROM e
      |  WHERE event_type = 'view' GROUP BY user_id),
      |c AS (SELECT e.user_id, min(ts_us) AS click_us FROM e JOIN v USING (user_id)
      |  WHERE event_type = 'click' AND ts_us > view_us GROUP BY e.user_id),
      |p AS (SELECT e.user_id, min(ts_us) AS purchase_us FROM e JOIN c USING (user_id)
      |  WHERE event_type = 'purchase' AND ts_us > click_us GROUP BY e.user_id)
      |SELECT v.user_id, view_us, click_us, purchase_us
      |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)""".stripMargin

  /** Mirror of q_retention: classic cohort-retention triangle — users
    * bucketed by first-event day, activity counted per day offset. */
  val retention: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day_idx FROM events),
      |f AS (SELECT user_id, min(day_idx) AS cohort_day FROM e GROUP BY user_id)
      |SELECT cohort_day, e.day_idx - cohort_day AS day_offset,
      |  CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
      |FROM e JOIN f USING (user_id)
      |GROUP BY cohort_day, day_offset""".stripMargin

  /** Explicit GROUPING SETS (the general form cube/rollup specialize)
    * with per-column GROUPING() flags — emitted as separate 0/1
    * columns, not a packed grouping_id, so the gate is immune to
    * engine bit-order choices. */
  val groupingSetsAgg: String =
    s"""WITH e AS (SELECT event_type, user_id % 10 AS user_mod,
       |  $kExpr AS k FROM events)
       |SELECT event_type, user_mod,
       |  CAST(GROUPING(event_type) AS BIGINT) AS g_type,
       |  CAST(GROUPING(user_mod) AS BIGINT) AS g_mod,
       |  count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k
       |FROM e
       |GROUP BY GROUPING SETS ((event_type, user_mod), (event_type), (user_mod))""".stripMargin

  /** Mirror of q_events_unpivot: the wide->long reshape expressed as
    * the UNION ALL it is defined to equal — independent of any
    * engine's UNPIVOT/stack implementation. */
  val eventsUnpivot: String =
    """WITH w AS (SELECT user_id,
      |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
      |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases,
      |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errors
      |  FROM events GROUP BY user_id)
      |SELECT user_id, 'clicks' AS metric, clicks AS n FROM w
      |UNION ALL SELECT user_id, 'purchases' AS metric, purchases AS n FROM w
      |UNION ALL SELECT user_id, 'errors' AS metric, errors AS n FROM w""".stripMargin

  /** Mirror of q_events_scd2: SCD-2 validity intervals from an event
    * log — valid_to = next change's valid_from (NULL = current row).
    * Deterministic because per-user timestamps are unique at us
    * granularity (documented data precondition). */
  val eventsScd2: String =
    """WITH e AS (SELECT user_id, event_id, event_type,
      |  epoch_us(ts) AS valid_from_us FROM events),
      |v AS (SELECT *, lead(valid_from_us) OVER (PARTITION BY user_id
      |    ORDER BY valid_from_us, event_id) AS valid_to_us FROM e)
      |SELECT user_id, event_id, event_type, valid_from_us, valid_to_us,
      |  CAST(CASE WHEN valid_to_us IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
      |FROM v""".stripMargin

  /** Mirror of q_events_latest: CDC-style latest-record compaction —
    * one surviving row per user, the max by the (ts, event_id) total
    * order; value is a SELECTION of a stored double (never float
    * arithmetic), so the gate stays exact. */
  val eventsLatest: String =
    s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
       |  event_type, value,
       |  row_number() OVER (PARTITION BY user_id
       |    ORDER BY ts DESC, event_id DESC) AS rn FROM events)
       |SELECT user_id, event_id, ts_us, event_type, value
       |FROM e WHERE rn = 1""".stripMargin

  /** Mirror of q_sink_upsert: replay the two batches declaratively —
    * base = the full log, changes = every 7th user's click/purchase
    * rows bumped one hour and +1000.0 — and keep the newest row per
    * event_id (ts desc), exactly the merge the partition-scoped
    * upsert applies to the touched partitions. ts arithmetic in
    * integer NANOseconds (epoch_ns) to mirror the Spark side's long
    * nanos, divided to µs only at the output boundary. */
  val sinkUpsert: String =
    s"""WITH base AS (SELECT event_id, user_id, event_type,
       |  epoch_ns(ts) AS tsn, value FROM events),
       |chg AS (SELECT event_id, user_id, event_type,
       |  tsn + 3600000000000 AS tsn, value + 1000.0 AS value
       |  FROM base
       |  WHERE event_type IN ('click', 'purchase') AND user_id % 7 = 0),
       |u AS (SELECT * FROM base UNION ALL SELECT * FROM chg),
       |r AS (SELECT *, row_number() OVER (PARTITION BY event_id
       |  ORDER BY tsn DESC) AS rn FROM u)
       |SELECT event_id, user_id, event_type, tsn // 1000 AS ts_us, value
       |FROM r WHERE rn = 1""".stripMargin

  /** Mirror of q_sink_delete: the plain log minus the tombstoned
    * users' rows — the oracle never sees the partition-scoped delete
    * path, so a stale file in an emptied partition or a lost survivor
    * breaks the hash. */
  val sinkDelete: String =
    s"""SELECT event_id, user_id, event_type,
       |  epoch_ns(ts) // 1000 AS ts_us, value
       |FROM events WHERE user_id % 9 <> 4""".stripMargin

  /** Gaps-and-islands sessionization — mirrors
    * graft.streaming.Sessionize.batch (12 h default gap, µs
    * timestamps, exact integer sums). */
  def sessionize(gapUs: Long): String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, $kExpr AS k FROM events),
       |b AS (
       |  SELECT *, CASE WHEN ts_us - lag(ts_us) OVER w > $gapUs THEN 1 ELSE 0 END AS brk
       |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
       |s AS (
       |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
       |  FROM b)
       |SELECT user_id, min(ts_us) AS session_start_us, max(ts_us) AS session_end_us,
       |  count(*) AS n_events, CAST(sum(k) AS BIGINT) AS sum_k
       |FROM s GROUP BY user_id, sess""".stripMargin

  /** Semi + anti join: customers with and without orders. */
  val semiAnti: String =
    """SELECT c_custkey, 'has_orders' AS flag FROM customer
      |WHERE c_custkey IN (SELECT o_custkey FROM orders)
      |UNION ALL
      |SELECT c_custkey, 'no_orders' AS flag FROM customer
      |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)""".stripMargin

  /** Multimodal plumbing over documents: byte length / checksum / head
    * bytes of the payload + struct-metadata round-trip + frame sample.
    * Byte-typed ops go through `encode()` (VARCHAR -> UTF-8 BLOB, the
    * exact bytes Spark's BinaryType cast produces) so unicode text is
    * engine-neutral — a bare `CAST(text AS BLOB)` rejects non-ASCII
    * (round-16 fuzz with unicode vocab); the head-bytes slice is a
    * hex round-trip because DuckDB has no byte substring on BLOBs.
    * frame_sample stays per-CHARACTER in both engines by design. */
  /** Mirror of Multimodal.StubDecoder: metadata from the byte length,
    * features from the shared md5-chain convention. */
  def multimodalDecode(dims: Int): String =
    s"""SELECT doc_id,
       |  CAST(octet_length(encode(coalesce(text, ''))) % 1024 AS BIGINT) AS width,
       |  CAST((octet_length(encode(coalesce(text, ''))) * 7) % 768 AS BIGINT) AS height,
       |  array_to_string(list_transform(generate_series(0, ${dims - 1}),
       |    i -> CAST(('0x' || substr(md5(md5(coalesce(text, '')) || CAST(i AS VARCHAR)), 1, 8)) AS BIGINT)),
       |    '_') AS features_str
       |FROM documents""".stripMargin

  /** Oracle for the REAL PPM decode: the Spark side builds a 2x2 P6
    * image whose 12 pixel bytes are the first 12 md5 bytes of the
    * text; this recomputes the decoder's exact outputs (channel means,
    * ITU-601 integer luma) directly from the md5 hex digits. */
  val multimodalPpm: String = {
    def px(i: Int) = s"CAST(('0x' || substr(hx, ${2 * i + 1}, 2)) AS BIGINT)"
    def luma(k: Int) =
      s"(299 * ${px(3 * k)} + 587 * ${px(3 * k + 1)} + 114 * ${px(3 * k + 2)}) // 1000"
    s"""WITH h AS (SELECT doc_id, md5(coalesce(text, '')) AS hx FROM documents)
       |SELECT doc_id,
       |  CAST(2 AS BIGINT) AS width, CAST(2 AS BIGINT) AS height,
       |  (${px(0)} + ${px(3)} + ${px(6)} + ${px(9)}) // 4 AS mean_r,
       |  (${px(1)} + ${px(4)} + ${px(7)} + ${px(10)}) // 4 AS mean_g,
       |  (${px(2)} + ${px(5)} + ${px(8)} + ${px(11)}) // 4 AS mean_b,
       |  array_to_string([${(0 until 4).map(luma).mkString(", ")}], '_') AS luma_str
       |FROM h""".stripMargin
  }

  /** Oracle for the REAL BMP decode through javax.imageio: file bytes
    * b0..b11 are the md5 prefix laid out as BGR pixels in BOTTOM-UP
    * rows (BMP geometry), so image-row-major pixel k maps to
    * (R,G,B) = p0:(b8,b7,b6), p1:(b11,b10,b9), p2:(b2,b1,b0),
    * p3:(b5,b4,b3); means are order-independent, lumas follow the
    * pixel order. Same ITU-R 601 integer weights as the PPM oracle. */
  val multimodalBmp: String = {
    def px(i: Int) = s"CAST(('0x' || substr(hx, ${2 * i + 1}, 2)) AS BIGINT)"
    def luma(r: Int, g: Int, b: Int) =
      s"(299 * ${px(r)} + 587 * ${px(g)} + 114 * ${px(b)}) // 1000"
    s"""WITH h AS (SELECT doc_id, md5(coalesce(text, '')) AS hx FROM documents)
       |SELECT doc_id,
       |  CAST(2 AS BIGINT) AS width, CAST(2 AS BIGINT) AS height,
       |  (${px(2)} + ${px(5)} + ${px(8)} + ${px(11)}) // 4 AS mean_r,
       |  (${px(1)} + ${px(4)} + ${px(7)} + ${px(10)}) // 4 AS mean_g,
       |  (${px(0)} + ${px(3)} + ${px(6)} + ${px(9)}) // 4 AS mean_b,
       |  array_to_string([${luma(8, 7, 6)}, ${luma(11, 10, 9)},
       |    ${luma(2, 1, 0)}, ${luma(5, 4, 3)}], '_') AS luma_str
       |FROM h""".stripMargin
  }

  /** Oracle for the REAL WAV decode: 4 PCM-16 LE samples from the
    * first 8 md5 bytes; per-window mean |amplitude| with explicit
    * sign extension. */
  /** Mirror of q_multimodal_video: the payload headers are built from
    * md5 bytes, so every metadata field the parser must recover is a
    * closed-form function of the digest — BE interpretation for the
    * MP4 fields, LE byte arithmetic for the AVI fields. n_tracks is 1
    * (one video trak/strl) and the codec fourccs are the template
    * constants; duration: MP4 = mvhd duration at timescale 1000 (ms
    * 1:1), AVI = 40000 µs/frame * totalFrames / 1000. */
  val multimodalVideo: String = {
    def be(at: Int, n: Int) = s"CAST(('0x' || substr(hx, $at, $n)) AS BIGINT)"
    def leByte(i: Int) = s"CAST(('0x' || substr(hx, ${2 * i + 1}, 2)) AS BIGINT)"
    val leFrames =
      s"${leByte(0)} + 256 * ${leByte(1)} + 65536 * ${leByte(2)} + 16777216 * ${leByte(3)}"
    s"""WITH h AS (SELECT doc_id, md5(coalesce(text, '')) AS hx FROM documents)
       |SELECT doc_id,
       |  CASE WHEN doc_id % 2 = 0 THEN 'mp4' ELSE 'avi' END AS container,
       |  CASE WHEN doc_id % 2 = 0 THEN ${be(1, 8)}
       |       ELSE 40000 * ($leFrames) // 1000 END AS duration_ms,
       |  CAST(1 AS BIGINT) AS n_tracks,
       |  CASE WHEN doc_id % 2 = 0 THEN 'avc1' ELSE 'MJPG' END AS video_codec,
       |  CASE WHEN doc_id % 2 = 0 THEN ${be(9, 4)} ELSE ${be(9, 2)} END AS width,
       |  CASE WHEN doc_id % 2 = 0 THEN ${be(13, 4)} ELSE ${be(11, 2)} END AS height
       |FROM h""".stripMargin
  }

  /** Oracle for the AVI DIB frame decode: each 2x2 frame's 12 pixel
    * bytes are a window of the md5 digest (frame 0 at byte 0, frame 1
    * at byte 4) in the SAME bottom-up BGR padded-row geometry as the
    * BMP — so per frame the pixel mapping is [[multimodalBmp]]'s with
    * the window offset added; one row per (doc, frame). */
  val multimodalFrames: String = {
    def px(i: Int) = s"CAST(('0x' || substr(hx, ${2 * i + 1}, 2)) AS BIGINT)"
    def luma(r: Int, g: Int, b: Int) =
      s"(299 * ${px(r)} + 587 * ${px(g)} + 114 * ${px(b)}) // 1000"
    def frame(o: Int, idx: Int) =
      s"""SELECT doc_id, CAST($idx AS BIGINT) AS frame_idx,
         |  CAST(2 AS BIGINT) AS width, CAST(2 AS BIGINT) AS height,
         |  (${px(o + 2)} + ${px(o + 5)} + ${px(o + 8)} + ${px(o + 11)}) // 4 AS mean_r,
         |  (${px(o + 1)} + ${px(o + 4)} + ${px(o + 7)} + ${px(o + 10)}) // 4 AS mean_g,
         |  (${px(o)} + ${px(o + 3)} + ${px(o + 6)} + ${px(o + 9)}) // 4 AS mean_b,
         |  array_to_string([${luma(o + 8, o + 7, o + 6)}, ${luma(o + 11, o + 10, o + 9)},
         |    ${luma(o + 2, o + 1, o)}, ${luma(o + 5, o + 4, o + 3)}], '_') AS luma_str
         |FROM h""".stripMargin
    s"""WITH h AS (SELECT doc_id, md5(coalesce(text, '')) AS hx FROM documents)
       |${frame(0, 0)}
       |UNION ALL
       |${frame(4, 1)}""".stripMargin
  }

  /** Oracle for the MJPEG-in-AVI frame decode: the hand-packed JPEG
    * template encodes one CONSTANT gray 8×8 block whose DC value byte
    * comes from md5 nibble k (frame k at hex char k+1), so each
    * frame's decode is a closed-form 16-entry lookup — the table is
    * `Decoders.MjpegTemplate.ExpectedGray`, spec-verified against the
    * real `javax.imageio` decoder. Constant pixels make every channel
    * mean the constant and every one of the 64 lumas
    * (299c+587c+114c)//1000 = c. */
  val multimodalMjpeg: String = {
    val lut = graft.multimodal.Decoders.MjpegTemplate.ExpectedGray
      .mkString("[", ", ", "]")
    def frame(k: Int, idx: Int) =
      s"""SELECT doc_id, CAST($idx AS BIGINT) AS frame_idx,
         |  CAST(8 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height,
         |  c AS mean_r, c AS mean_g, c AS mean_b,
         |  ltrim(repeat('_' || CAST(c AS VARCHAR), 64), '_') AS luma_str
         |FROM (SELECT doc_id, CAST(($lut)[
         |    strpos('0123456789abcdef', substr(hx, $k, 1))] AS BIGINT) AS c
         |  FROM h)""".stripMargin
    s"""WITH h AS (SELECT doc_id, md5(coalesce(text, '')) AS hx FROM documents)
       |${frame(1, 0)}
       |UNION ALL
       |${frame(2, 1)}""".stripMargin
  }

  val multimodalWav: String = {
    def px(i: Int) = s"CAST(('0x' || substr(hx, ${2 * i + 1}, 2)) AS BIGINT)"
    def sample(k: Int) = s"s$k AS (SELECT doc_id, ${px(2 * k)} + 256 * ${px(2 * k + 1)} AS x FROM h)"
    def absv(k: Int) =
      s"abs(CASE WHEN s$k.x >= 32768 THEN s$k.x - 65536 ELSE s$k.x END)"
    s"""WITH h AS (SELECT doc_id, md5(coalesce(text, '')) AS hx FROM documents),
       |${(0 until 4).map(sample).mkString(",\n")}
       |SELECT h.doc_id,
       |  CAST(8000 AS BIGINT) AS sample_rate, CAST(1 AS BIGINT) AS channels,
       |  CAST(4 AS BIGINT) AS n_samples,
       |  array_to_string([(${absv(0)} + ${absv(1)}) // 2, (${absv(2)} + ${absv(3)}) // 2],
       |    '_') AS energy_str
       |FROM h
       |JOIN s0 USING (doc_id) JOIN s1 USING (doc_id)
       |JOIN s2 USING (doc_id) JOIN s3 USING (doc_id)""".stripMargin
  }

  /** Oracle for the audio sign-of-delta near-dedup: recompute the 16
    * samples from the two (source, lang) md5 digests + the doc_id%4
    * perturbation sample (samples 0..3 are the planted zeros), the
    * four exact window mean-|amplitude| energies, the 3 delta-sign
    * bits and the <4096 silence counts, then group — closed-form like
    * [[multimodalWav]], no WAV parser in SQL. */
  val multimodalAudio: String = {
    // sample index 4..14 → md5-derived value expression (LE byte pair)
    def px(h: String, off: Int) =
      s"CAST(('0x' || substr($h, ${2 * off + 1}, 2)) AS BIGINT)"
    def sval(k: Int): String = {
      val (h, off) = if (k < 12) ("h0", (k - 4) * 2) else ("h1", (k - 12) * 2)
      s"${px(h, off)} + 256 * ${px(h, off + 1)}"
    }
    def absv(k: Int): String =
      if (k < 4) "0"
      else if (k == 15) "(doc_id % 4)"
      else s"abs(CASE WHEN x$k >= 32768 THEN x$k - 65536 ELSE x$k END)"
    val xs = (4 until 15).map(k => s"${sval(k)} AS x$k").mkString(",\n  ")
    def e(w: Int) =
      s"(${(4 * w until 4 * w + 4).map(absv).mkString(" + ")}) // 4 AS e$w"
    s"""WITH h AS (SELECT doc_id,
       |    md5(source || '#' || lang || '#0') AS h0,
       |    md5(source || '#' || lang || '#1') AS h1
       |  FROM documents),
       |s AS (SELECT doc_id,
       |  $xs
       |  FROM h),
       |en AS (SELECT doc_id, ${(0 until 4).map(e).mkString(", ")} FROM s),
       |d AS (SELECT doc_id,
       |  CAST((CASE WHEN e0 < e1 THEN 1 ELSE 0 END)
       |     + (CASE WHEN e1 < e2 THEN 2 ELSE 0 END)
       |     + (CASE WHEN e2 < e3 THEN 4 ELSE 0 END) AS BIGINT) AS afp,
       |  CAST((CASE WHEN e0 < 4096 THEN 1 ELSE 0 END)
       |     + (CASE WHEN e1 < 4096 THEN 1 ELSE 0 END)
       |     + (CASE WHEN e2 < 4096 THEN 1 ELSE 0 END)
       |     + (CASE WHEN e3 < 4096 THEN 1 ELSE 0 END) AS BIGINT) AS n_silent
       |  FROM en)
       |SELECT afp, CAST(count(*) AS BIGINT) AS n_clips, min(doc_id) AS min_doc,
       |  CAST(sum(n_silent) AS BIGINT) AS silent_windows
       |FROM d GROUP BY 1 HAVING count(*) >= 2""".stripMargin
  }

  /** Mirror of q_events_anomaly_mad: the ROBUST twin of
    * eventsAnomaly — lower discrete median and median absolute
    * deviation via row_number over the (value, day_idx) total order,
    * flag |cnt - med| > 3·mad. All exact integers; the lower-median
    * convention matches CorpusOps.domainStats. */
  val eventsAnomalyMad: String =
    """WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day_idx,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |m AS (SELECT event_type, cnt AS med FROM (
      |  SELECT event_type, cnt,
      |    row_number() OVER (PARTITION BY event_type ORDER BY cnt, day_idx) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS n FROM daily)
      |  WHERE rn = (n + 1) // 2),
      |dev AS (SELECT d.event_type, d.day_idx, d.cnt, m.med,
      |    abs(d.cnt - m.med) AS dv FROM daily d JOIN m USING (event_type)),
      |md AS (SELECT event_type, dv AS mad FROM (
      |  SELECT event_type, dv,
      |    row_number() OVER (PARTITION BY event_type ORDER BY dv, day_idx) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS n FROM dev)
      |  WHERE rn = (n + 1) // 2)
      |SELECT dev.event_type, dev.day_idx, dev.cnt, dev.med, md.mad,
      |  dev.dv > 3 * md.mad AS is_anomaly
      |FROM dev JOIN md USING (event_type)""".stripMargin

  /** Mirror of q_events_abtest: the pooled two-proportion z² test
    * cleared of divisions, HUGEINT intermediates. */
  val eventsAbtest: String =
    """WITH pu AS (SELECT user_id,
      |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted,
      |    CAST(user_id % 2 AS INTEGER) AS variant
      |  FROM events GROUP BY user_id),
      |arms AS (SELECT variant, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(converted) AS BIGINT) AS x FROM pu GROUP BY 1),
      |a AS (SELECT n AS n1, x AS x1 FROM arms WHERE variant = 0),
      |b AS (SELECT n AS n2, x AS x2 FROM arms WHERE variant = 1)
      |SELECT n1, x1, n2, x2,
      |  (CAST(x1 AS HUGEINT) * n2 - CAST(x2 AS HUGEINT) * n1)
      |    * (CAST(x1 AS HUGEINT) * n2 - CAST(x2 AS HUGEINT) * n1)
      |    * (n1 + n2) * 10000 >
      |  38416 * CAST(n1 AS HUGEINT) * n2 * (x1 + x2)
      |    * (CAST(n1 AS HUGEINT) + n2 - x1 - x2) AS significant
      |FROM a, b""".stripMargin

  /** Mirror of q_events_gaps: per-type active days vs calendar span. */
  val eventsGaps: String =
    """WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day_idx
      |  FROM events GROUP BY 1, 2)
      |SELECT event_type,
      |  CAST(min(day_idx) AS BIGINT) AS first_day,
      |  CAST(max(day_idx) AS BIGINT) AS last_day,
      |  CAST(max(day_idx) - min(day_idx) + 1 AS BIGINT) AS span_days,
      |  CAST(count(*) AS BIGINT) AS active_days,
      |  CAST(max(day_idx) - min(day_idx) + 1 - count(*) AS BIGINT) AS missing_days
      |FROM daily GROUP BY 1""".stripMargin

  /** Mirror of q_events_transitions: per-user consecutive event-type
    * pairs via lead over the (ts, event_id) total order, (from, to)
    * counts and exact per-from-state probabilities in ppm. */
  val eventsTransitions: String =
    """WITH t AS (SELECT event_type AS from_type,
      |    lead(event_type) OVER (PARTITION BY user_id
      |      ORDER BY epoch_us(ts), event_id) AS to_type
      |  FROM events),
      |c AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
      |  FROM t WHERE to_type IS NOT NULL GROUP BY 1, 2),
      |tot AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY 1)
      |SELECT c.from_type, c.to_type, c.n,
      |  CAST(c.n * 1000000 // tot.tot AS BIGINT) AS p_ppm
      |FROM c JOIN tot USING (from_type)""".stripMargin

  /** Mirror of q_events_late: md5-jittered arrival order, one global
    * exclusive running-max window (the Spark side decomposes the same
    * total order two-level), per-watermark drop counts. All µs here,
    * ns on the engine side — flags identical since ns = µs·1000. */
  def watermarkAudit(watermarksUs: Seq[Long], jitterMod: Int): String = {
    val lates = watermarksUs.zipWithIndex.map { case (w, i) =>
      s"CAST(sum(CASE WHEN mx IS NOT NULL AND t < mx - $w THEN 1 ELSE 0 END) AS BIGINT) AS l$i"
    }.mkString(",\n  ")
    val rows = watermarksUs.zipWithIndex.map { case (w, i) =>
      s"SELECT CAST($w AS BIGINT) AS watermark_us, n_events, l$i AS n_late, " +
        s"CAST(l$i * 1000000 // n_events AS BIGINT) AS late_ppm FROM a"
    }.mkString("\nUNION ALL ")
    s"""WITH e AS (SELECT event_id, epoch_us(ts) AS t,
       |    epoch_us(ts) + (CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)
       |      || '#arrival'), 1, 8)) AS BIGINT) % $jitterMod) * 1000000 AS arr
       |  FROM events),
       |r AS (SELECT t, max(t) OVER (ORDER BY arr, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mx FROM e),
       |a AS (SELECT CAST(count(*) AS BIGINT) AS n_events,
       |  $lates FROM r)
       |$rows""".stripMargin
  }

  /** Mirror of Diagnostics.skewProfile on events.user_id: the key is
    * canonicalized to VARCHAR on both sides, so the (n desc, key asc)
    * tie-break and the top-k boundary are the same total order in
    * both engines. */
  def skewProfile(k: Int): String =
    s"""WITH c AS (SELECT CAST(user_id AS VARCHAR) AS key, count(*) AS n
       |  FROM events GROUP BY 1),
       |t AS (SELECT CAST(sum(n) AS BIGINT) AS n_rows,
       |  CAST(count(*) AS BIGINT) AS n_keys FROM c),
       |top AS (SELECT key, n,
       |  CAST(row_number() OVER (ORDER BY n DESC, key) AS BIGINT) AS rank
       |  FROM c ORDER BY n DESC, key LIMIT $k)
       |SELECT rank, key, CAST(n AS BIGINT) AS n, n_rows, n_keys,
       |  CAST(n * 1000000 // n_rows AS BIGINT) AS share_ppm,
       |  CAST(n * n_keys * 1000000 // n_rows AS BIGINT) AS skew_x_avg_ppm
       |FROM top, t""".stripMargin

  /** Mirror of Diagnostics.winsorize: exact discrete percentiles from
    * the value histogram's cumulative counts (smallest vq whose cum ≥
    * ⌈n·p/100⌉), floor(·100) fixed-point, clip stats + winsorized
    * sum. */
  def eventsWinsor(loPct: Int, hiPct: Int): String =
    s"""WITH vq AS (SELECT event_type AS grp,
       |    CAST(floor(value * 100) AS BIGINT) AS vq
       |  FROM events WHERE value IS NOT NULL),
       |hist AS (SELECT grp, vq, CAST(count(*) AS BIGINT) AS c
       |  FROM vq GROUP BY 1, 2),
       |cum AS (SELECT grp, vq, c,
       |    sum(c) OVER (PARTITION BY grp ORDER BY vq
       |      ROWS UNBOUNDED PRECEDING) AS cum,
       |    sum(c) OVER (PARTITION BY grp) AS n FROM hist),
       |lo AS (SELECT grp, min(vq) AS lo_q FROM cum
       |  WHERE cum >= (n * $loPct + 99) // 100 GROUP BY 1),
       |hi AS (SELECT grp, min(vq) AS hi_q FROM cum
       |  WHERE cum >= (n * $hiPct + 99) // 100 GROUP BY 1)
       |SELECT vq.grp AS event_type, CAST(count(*) AS BIGINT) AS n,
       |  CAST(min(lo_q) AS BIGINT) AS lo_q,
       |  CAST(min(hi_q) AS BIGINT) AS hi_q,
       |  CAST(sum(CASE WHEN vq < lo_q THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_clip_lo,
       |  CAST(sum(CASE WHEN vq > hi_q THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_clip_hi,
       |  CAST(sum(greatest(least(vq, hi_q), lo_q)) AS BIGINT) AS winsor_sum
       |FROM vq JOIN lo USING (grp) JOIN hi USING (grp)
       |GROUP BY 1""".stripMargin

  /** Oracle for the dHash image near-dedup: recompute the 4×4 pixel
    * bytes from the three (source, lang) md5 digests + the doc_id%4
    * perturbation byte, the 16 exact lumas, then the 24 gradient-sign
    * bits in the engine's bit order (12 horizontal row-major, then 12
    * vertical), and group. */
  val multimodalPhash: String = {
    // global pixel-byte i (0..47) → SQL expression
    def byt(i: Int): String =
      if (i == 47) "(doc_id % 4)"
      else {
        val (h, off) = if (i < 16) ("h0", i) else if (i < 32) ("h1", i - 16)
          else ("h2", i - 32)
        s"CAST(('0x' || substr($h, ${2 * off + 1}, 2)) AS BIGINT)"
      }
    def luma(k: Int) =
      s"(299 * ${byt(3 * k)} + 587 * ${byt(3 * k + 1)} + 114 * ${byt(3 * k + 2)}) // 1000 AS l$k"
    val pairs =
      (for (r <- 0 until 4; c <- 0 until 3) yield (r * 4 + c, r * 4 + c + 1)) ++
      (for (r <- 0 until 3; c <- 0 until 4) yield (r * 4 + c, (r + 1) * 4 + c))
    val dhash = pairs.zipWithIndex.map { case ((a, b), j) =>
      s"(CASE WHEN l$a < l$b THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH h AS (SELECT doc_id,
       |    md5(source || '#' || lang || '#0') AS h0,
       |    md5(source || '#' || lang || '#1') AS h1,
       |    md5(source || '#' || lang || '#2') AS h2
       |  FROM documents),
       |l AS (SELECT doc_id, ${(0 until 16).map(luma).mkString(",\n  ")}
       |  FROM h),
       |d AS (SELECT doc_id, CAST($dhash AS BIGINT) AS dhash FROM l)
       |SELECT dhash, CAST(count(*) AS BIGINT) AS n_images,
       |  min(doc_id) AS min_doc
       |FROM d GROUP BY 1 HAVING count(*) >= 2""".stripMargin
  }

  def multimodal(headBytes: Int, stride: Int): String =
    s"""SELECT doc_id,
       |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       |  md5(text) AS payload_md5,
       |  to_base64(unhex(substring(hex(encode(text)), 1, ${headBytes * 2}))) AS head_b64,
       |  lang AS meta_lang,
       |  coalesce(array_to_string(
       |    list_transform(generate_series($stride, length(coalesce(text, '')), $stride),
       |      i -> substring(text, i, 1)), ''), '') AS frame_sample
       |FROM documents""".stripMargin
}
