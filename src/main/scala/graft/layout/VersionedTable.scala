package graft.layout

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Copy-on-write VERSIONED warehouse table — snapshot isolation, time
  * travel, and physical vacuum for the sink family, built from the two
  * primitives every cloud warehouse table format rests on (Delta/
  * Iceberg-style, re-expressed minimally): IMMUTABLE data segments and
  * an atomic MANIFEST commit.
  *
  * Layout under `path`:
  *   - `seg_v<NNNNN>/` — one immutable parquet segment directory per
  *     commit (never modified after its manifest lands);
  *   - `_manifests/v<NNNNN>` — one line per live segment
  *     (`name \t minKey \t maxKey \t rows`); the manifest RENAME is
  *     the commit point, so a reader sees either the old version or
  *     the new one, never a half-state, on any FS with atomic rename
  *     (the [[graft.core.DirSwap]] assumption).
  *
  * Verbs: [[create]] / [[append]] (new segment, old ones untouched),
  * [[upsert]] / [[delete]] (copy-on-write: only segments whose key
  * RANGE intersects the change keys are read and rewritten — the
  * untouched bulk of the table carries over by reference, zero read,
  * zero write), [[read]] with `asOf` (time travel: any retained
  * version reconstructs exactly), [[history]], and [[vacuum]]
  * (retention: drop old manifests, physically remove segments no
  * retained version references — including the debris of a commit
  * that crashed between segment write and manifest rename).
  *
  * In contrast to [[Layout.upsertPartitioned]] (hive layout, in-place
  * dynamic overwrite, no history), an erasure or late-data merge here
  * costs the same partition-scoped work but RETAINS the pre-image
  * until vacuum — the audit/rollback property a takedown pipeline
  * needs ("what did v7 serve?"), and the isolation property a 100 TB
  * reader needs (a day-long job pinned to version N is immune to
  * concurrent commits; its segments are immutable until its version
  * ages out of retention).
  *
  * Contracts: integer key column (`keyCol`), unique per row — the
  * usual warehouse PK; single writer (manifests rename-collide on a
  * concurrent commit, failing the loser — same convention as every
  * ingest loop in the repo); vacuum runs between commits. Key-range
  * segment pruning is CONSERVATIVE (a segment is rewritten iff its
  * [min,max] intersects the change batch's [min,max]) — clustered
  * writes keep ranges tight and rewrites local; q_sink_timetravel /
  * q_sink_vacuum gate the lifecycle, VersionedTableSpec pins the
  * pruning (untouched segments carry over file-identical).
  *
  * Scale shape: a manifest is segments-count lines (KBs) read/written
  * on the driver; segment stats come from a column-pruned scan of the
  * single key column at write time; read(asOf) is a plain parquet
  * scan over the version's segment list, pushdown/pruning intact.
  */
object VersionedTable {

  /** One live segment as recorded in a manifest. `curve` carries the
    * stored min/max of the segment's curve sort-key column when the
    * segment came out of [[optimizeCurve]] (signed order-equivalent
    * domain, i.e. raw u64 ^ Long.MinValue — the same convention as the
    * stored column itself); None for segments written by the plain
    * verbs, which [[readCurveRanges]] then conservatively never
    * prunes. Serialized as two optional trailing manifest fields, so
    * pre-optimize manifests parse unchanged. */
  final case class Segment(name: String, minKey: Long, maxKey: Long,
      rows: Long, curve: Option[(Long, Long)] = None)

  private def hfs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  private def manifestPath(path: String, v: Int): Path =
    new Path(s"$path/_manifests/" + f"v$v%05d")

  /** All committed versions, ascending (empty = no table yet). */
  def versions(spark: SparkSession, path: String): Seq[Int] = {
    val dir = new Path(s"$path/_manifests")
    val fs = hfs(spark, path)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(_.matches("v\\d{5}")).map(_.drop(1).toInt).sorted
  }

  def currentVersion(spark: SparkSession, path: String): Int = {
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"no committed version at $path")
    vs.last
  }

  private def readManifest(spark: SparkSession, path: String,
      v: Int): Seq[Segment] = {
    val fs = hfs(spark, path)
    val mp = manifestPath(path, v)
    require(fs.exists(mp),
      s"version $v of $path does not exist (never committed, or vacuumed " +
        "out of retention)")
    val in = fs.open(mp)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    text.split('\n').toSeq.filter(_.nonEmpty).map { line =>
      line.split('\t') match {
        case Array(n, mn, mx, r) =>
          Segment(n, mn.toLong, mx.toLong, r.toLong)
        case Array(n, mn, mx, r, cn, cx) =>
          Segment(n, mn.toLong, mx.toLong, r.toLong,
            Some((cn.toLong, cx.toLong)))
        case f => throw new IllegalStateException(
          s"malformed manifest line (${f.length} fields) in v$v of $path")
      }
    }
  }

  /** Atomic commit: write the manifest to a hidden temp name, then
    * rename. Rename-onto-existing fails on HDFS/local — a concurrent
    * writer racing to the same version loses cleanly. */
  private def commitManifest(spark: SparkSession, path: String, v: Int,
      segs: Seq[Segment]): Unit = {
    val fs = hfs(spark, path)
    fs.mkdirs(new Path(s"$path/_manifests"))
    val tmp = new Path(s"$path/_manifests/." + f"tmp_v$v%05d")
    val out = fs.create(tmp, true)
    try out.write(segs.map { s =>
      val base = s"${s.name}\t${s.minKey}\t${s.maxKey}\t${s.rows}"
      s.curve.fold(base) { case (cn, cx) => s"$base\t$cn\t$cx" }
    }.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    require(fs.rename(tmp, manifestPath(path, v)),
      s"commit collision: version $v of $path already exists")
  }

  /** Write one immutable segment and return its manifest entry. Stats
    * come from a column-pruned read-back of the key column alone —
    * one narrow scan of freshly written files, not a second pass over
    * the input plan. */
  private def writeSegment(df: DataFrame, path: String, name: String,
      keyCol: String): Option[Segment] = {
    val spark = df.sparkSession
    // overwrite: a crashed previous attempt at this version may have
    // left a partial dir; the manifest never referenced it, so the
    // retry owns the name
    df.write.mode("overwrite").parquet(s"$path/$name")
    val st = spark.read.parquet(s"$path/$name")
      .agg(min(col(keyCol)).cast("long"), max(col(keyCol)).cast("long"),
        count(lit(1)))
      .collect()(0)
    if (st.isNullAt(0)) { // empty result set: no segment to register
      hfs(spark, path).delete(new Path(s"$path/$name"), true)
      None
    } else Some(Segment(name, st.getLong(0), st.getLong(1), st.getLong(2)))
  }

  private def segName(v: Int): String = f"seg_v$v%05d"

  /** Create version 1 from `df`. Fails if the table already exists. */
  def create(df: DataFrame, path: String, keyCol: String): Unit = {
    val spark = df.sparkSession
    require(versions(spark, path).isEmpty, s"table already exists at $path")
    val seg = writeSegment(df, path, segName(1), keyCol)
    commitManifest(spark, path, 1, seg.toSeq)
  }

  /** Append-only commit: one new segment, every prior segment carries
    * over by reference. The caller asserts key-disjointness from live
    * rows (append does not merge); overlapping keys need [[upsert]]. */
  def append(df: DataFrame, path: String, keyCol: String): Unit = {
    val spark = df.sparkSession
    val v = currentVersion(spark, path)
    val prev = readManifest(spark, path, v)
    val seg = writeSegment(df, path, segName(v + 1), keyCol)
    commitManifest(spark, path, v + 1, prev ++ seg.toSeq)
  }

  /** Copy-on-write upsert: rows of `changes` replace live rows with
    * the same key; keys absent from the table insert. Only segments
    * whose key range intersects the change batch's [min,max] are read
    * and rewritten (into ONE new segment together with the changes);
    * everything else carries over untouched. `orderCols` dedupes
    * WITHIN the change batch (newest first) when it carries several
    * rows per key. */
  def upsert(changes: DataFrame, path: String, keyCol: String,
      orderCols: Seq[org.apache.spark.sql.Column] = Seq.empty): Unit = {
    val spark = changes.sparkSession
    val v = currentVersion(spark, path)
    val prev = readManifest(spark, path, v)
    val deduped =
      if (orderCols.isEmpty) changes
      else changes.withColumn("_rn", row_number().over(
          Window.partitionBy(col(keyCol)).orderBy(orderCols: _*)))
        .filter(col("_rn") === 1).drop("_rn")
    val bounds = deduped.agg(min(col(keyCol)).cast("long"),
      max(col(keyCol)).cast("long")).collect()(0)
    if (bounds.isNullAt(0)) return // empty change batch: no-op commit
    val (cMin, cMax) = (bounds.getLong(0), bounds.getLong(1))
    val (touched, kept) =
      prev.partition(s => s.minKey <= cMax && s.maxKey >= cMin)
    val merged =
      if (touched.isEmpty) deduped
      else spark.read.parquet(touched.map(s => s"$path/${s.name}"): _*)
        .join(deduped.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
        // allowMissing: optimized segments carry a curve-key column the
        // change batch doesn't; merged rows null it out (the rewritten
        // segment is stat-less anyway until the next optimize)
        .unionByName(deduped, allowMissingColumns = true)
    val seg = writeSegment(merged, path, segName(v + 1), keyCol)
    commitManifest(spark, path, v + 1, kept ++ seg.toSeq)
  }

  /** Copy-on-write delete: drop live rows whose key appears in
    * `tombstones` (a one-column frame of keys, or any frame carrying
    * `keyCol`). Only range-intersecting segments are rewritten; a
    * segment whose survivors are empty simply leaves the manifest. */
  def delete(tombstones: DataFrame, path: String, keyCol: String): Unit = {
    val spark = tombstones.sparkSession
    val v = currentVersion(spark, path)
    val prev = readManifest(spark, path, v)
    val keys = tombstones.select(col(keyCol)).distinct()
    val bounds = keys.agg(min(col(keyCol)).cast("long"),
      max(col(keyCol)).cast("long")).collect()(0)
    if (bounds.isNullAt(0)) return
    val (cMin, cMax) = (bounds.getLong(0), bounds.getLong(1))
    val (touched, kept) =
      prev.partition(s => s.minKey <= cMax && s.maxKey >= cMin)
    if (touched.isEmpty) { commitManifest(spark, path, v + 1, kept); return }
    val survivors = spark.read
      .parquet(touched.map(s => s"$path/${s.name}"): _*)
      .join(keys, Seq(keyCol), "left_anti")
    val seg = writeSegment(survivors, path, segName(v + 1), keyCol)
    commitManifest(spark, path, v + 1, kept ++ seg.toSeq)
  }

  /** One CDC batch as ONE atomic commit: rows with op = "add" upsert
    * (replace live rows by key, insert absent keys), rows with
    * op = "delete" drop their key — adds and deletes land in the SAME
    * version, the all-or-nothing shape a mixed micro-batch needs. A
    * key under BOTH ops in one batch is rejected (the apply order
    * inside one atomic commit would be ambiguous — same rule as the
    * similarity graph's CDC loop; a count artifact can net it to
    * zero, a keyed table cannot). Copy-on-write pruning as in
    * [[upsert]]/[[delete]], over the union of change keys. */
  def applyCdc(batch: DataFrame, path: String, keyCol: String,
      opCol: String = "op"): Unit = {
    val spark = batch.sparkSession
    val v = currentVersion(spark, path)
    val prev = readManifest(spark, path, v)
    val ambiguous = batch.select(col(keyCol), col(opCol)).distinct()
      .groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).count()
    require(ambiguous == 0,
      s"$ambiguous key(s) carry both add and delete in one CDC batch")
    val adds = batch.filter(col(opCol) === "add").drop(opCol)
    val allKeys = batch.select(col(keyCol)).distinct()
    val bounds = allKeys.agg(min(col(keyCol)).cast("long"),
      max(col(keyCol)).cast("long")).collect()(0)
    if (bounds.isNullAt(0)) return
    val (cMin, cMax) = (bounds.getLong(0), bounds.getLong(1))
    val (touched, kept) =
      prev.partition(s => s.minKey <= cMax && s.maxKey >= cMin)
    val merged =
      if (touched.isEmpty) adds
      else spark.read.parquet(touched.map(s => s"$path/${s.name}"): _*)
        .join(allKeys, Seq(keyCol), "left_anti")
        .unionByName(adds, allowMissingColumns = true) // see upsert

    val seg = writeSegment(merged, path, segName(v + 1), keyCol)
    commitManifest(spark, path, v + 1, kept ++ seg.toSeq)
  }

  /** Read a version: the latest by default, or any retained `asOf`
    * version — TIME TRAVEL, exact by construction (segments are
    * immutable and the manifest pins the set). */
  def read(spark: SparkSession, path: String, asOf: Int = -1): DataFrame = {
    val v = if (asOf > 0) asOf else currentVersion(spark, path)
    val segs = readManifest(spark, path, v)
    require(segs.nonEmpty, s"version $v of $path holds no rows")
    spark.read.parquet(segs.map(s => s"$path/${s.name}"): _*)
  }

  /** (version, n_segments, rows) per retained version — the audit
    * surface of the commit log. Driver-sized: versions x manifest. */
  def history(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    versions(spark, path)
      .map(v => (v.toLong, readManifest(spark, path, v).size.toLong,
        readManifest(spark, path, v).map(_.rows).sum))
      .toDF("version", "n_segments", "rows")
  }

  /** COMPACT the current version: rewrite every live segment into ONE
    * new segment and commit it as a new version — zero logical change
    * (spec'd), what it buys is the segment count: an append-only or
    * clustered-CDC cadence accumulates one segment per commit, and
    * every read pays file-listing + footer overhead ∝ segments until
    * compacted. Old versions still time-travel (their manifests pin
    * the old segments) until retention vacuums them. */
  def compactSegments(spark: SparkSession, path: String,
      keyCol: String): Unit = {
    val v = currentVersion(spark, path)
    val prev = readManifest(spark, path, v)
    require(prev.nonEmpty, s"version $v of $path holds no rows")
    val all = spark.read.parquet(prev.map(s => s"$path/${s.name}"): _*)
    val seg = writeSegment(all, path, segName(v + 1), keyCol)
    commitManifest(spark, path, v + 1, seg.toSeq)
  }

  /** OPTIMIZE the current version into a CURVE-CLUSTERED layout — the
    * reference's raison-d'être (Hilbert/Morton locality, SURVEY §2.1)
    * applied to the versioned table, the shape of `OPTIMIZE ... ZORDER
    * BY` in production table formats. One new version whose segments
    * are coarse curve cells:
    *
    *   - each dimension quantizes onto its [[Quantize]] grid (the
    *     [[Layout.QuantDim]] domains are LAYOUT parameters, stored in
    *     the table's `_graft_layout.json` sidecar so query sites
    *     rebuild boxes from the STORED grid — the literal-drift class
    *     the quantized layouts killed in round 8);
    *   - rows carry the signed order-equivalent curve key as column
    *     `keyName` and sort on it within each segment (tight row-group
    *     footer stats on the one radix-sortable long);
    *   - segment membership is the key's top `bucketBits` bits — the
    *     level-`bucketBits/n` curve CELL, which is a CONTIGUOUS,
    *     DISJOINT key range by the curve's subcell-prefix property
    *     (index >> (n·(B-k)) IS the level-k cell index; asserted
    *     empirically in VersionedTableSpec for both curves). All dims
    *     must share one grid width B so the occupied index width n·B
    *     is uniform. Deterministic and data-independent (unlike
    *     repartitionByRange sampling), so segment boundaries are
    *     stable across re-optimizes and the manifest diff stays
    *     meaningful;
    *   - the manifest records each segment's stored-key min/max, so
    *     [[readCurveRanges]] prunes SEGMENTS from the manifest alone —
    *     at 100 TB that skips file listing and footer reads for the
    *     bulk of the table, the level above row-group skipping.
    *
    * Write path: one pass — hash-exchange on the bucket, sort within
    * partitions by (bucket, key), dynamic-partition parquet write,
    * then driver-side renames of the bucket dirs into immutable
    * `seg_v<V>_b<B>` segments and a column-pruned stats read-back per
    * segment. Crash before the manifest rename leaves only debris
    * that [[vacuum]]'s orphan sweep (and the `.opt_tmp` scrub)
    * removes. Later CDC commits rewrite touched segments WITHOUT
    * curve stats (conservative: never pruned, and their rows lose the
    * sort) — the layout degrades batch by batch until the next
    * optimize, exactly the production cadence.
    *
    * Skew note: bucket occupancy follows the data's cell distribution;
    * a uniform-ish domain fills 2^bucketBits segments evenly, a skewed
    * one concentrates (clamped out-of-domain values land in edge
    * cells). Correctness never depends on balance — only segment
    * sizes do; pick domains like any partitioning key. */
  def optimizeCurve(spark: SparkSession, path: String, keyCol: String,
      dims: Seq[Layout.QuantDim], bucketBits: Int = 4,
      keyName: String = "ckey", hilbert: Boolean = true,
      rowGroupBytes: Long = 1L << 20): Unit = {
    require(dims.nonEmpty && dims.size <= 4, s"1..4 dims, got ${dims.size}")
    val gridBits = dims.head.bits
    require(dims.forall(_.bits == gridBits),
      "all dims must share one grid width: the bucket is a key PREFIX, " +
        "which is a curve cell only on a uniform grid")
    val totalBits = dims.size * gridBits
    require(bucketBits >= 1 && bucketBits <= totalBits && totalBits <= 62,
      s"need 1 <= bucketBits($bucketBits) <= n*B($totalBits) <= 62")
    val elemBits = if (dims.size <= 2) 32 else 16
    require(gridBits < elemBits,
      s"$gridBits-bit grid does not fit $elemBits-bit signed elements")
    val v = currentVersion(spark, path)
    val prev = readManifest(spark, path, v)
    require(prev.nonEmpty, s"version $v of $path holds no rows")
    val all = spark.read.parquet(prev.map(s => s"$path/${s.name}"): _*)
    val desc = Layout.QuantizedLayoutDesc(
      if (hilbert) "hilbert" else "morton", keyName, elemBits, dims)
    val segs = writeCurveSegments(spark, path, keyCol, all, desc,
      bucketBits, v + 1, rowGroupBytes)
    require(segs.nonEmpty, s"optimize produced no segments at $path")
    Layout.writeQuantizedDescriptor(path, desc)
    writeOptimizeMeta(spark, path, bucketBits)
    commitManifest(spark, path, v + 1, segs)
  }

  /** INCREMENTAL optimize — the production maintenance cadence: after
    * CDC commits have degraded the layout (each rewrite of a touched
    * segment produces a STAT-LESS segment the box reader can never
    * prune), re-cluster ONLY that debris. Debris rows are keyed and
    * bucketed with the STORED layout (sidecar grid + bucket width — no
    * caller parameters to drift); curve segments of buckets the debris
    * lands in are read and merged with it; every other curve segment
    * carries over BY REFERENCE, untouched. Cost is therefore ∝ the
    * data CDC rewrote since the last optimize plus the cells it dirtied
    * — not the table — which is what makes a nightly re-cluster of a
    * 100 TB table affordable. Correctness does not depend on the
    * split: a debris key can never also live in a surviving curve
    * segment (the CDC verbs rewrite every key-range-intersecting
    * segment wholesale), spec'd as incremental == full re-optimize.
    * Returns false (no commit) when there is no debris. */
  def optimizeIncremental(spark: SparkSession, path: String,
      keyCol: String, rowGroupBytes: Long = 1L << 20): Boolean = {
    val desc = Layout.openQuantized(path) // requires a prior optimizeCurve
    val bucketBits = readOptimizeMeta(spark, path)
    val totalBits = desc.dims.size * desc.dims.head.bits
    val v = currentVersion(spark, path)
    val segs = readManifest(spark, path, v)
    val (curveSegs, debris) = segs.partition(_.curve.isDefined)
    if (debris.isEmpty) return false
    val shift = totalBits - bucketBits
    def bucketOf(s: Segment): Long = (s.curve.get._1 ^ Long.MinValue) >>> shift
    val debrisDf = spark.read
      .parquet(debris.map(s => s"$path/${s.name}"): _*)
    // which coarse cells does the debris dirty? bounded driver list:
    // at most 2^bucketBits rows
    val cells = desc.dims.map(d =>
      Quantize.grid(col(d.name), d.lo, d.hi, d.bits)
        .cast(if (desc.elemBits == 32) "int" else "smallint"))
    val dKey = if (desc.curve == "hilbert")
      graft.functions.Curves.hilbertSortKey(cells: _*)
    else graft.functions.Curves.mortonSortKey(cells: _*)
    val dirty = debrisDf
      .select(shiftrightunsigned(dKey.bitwiseXOR(lit(Long.MinValue)), shift)
        .as("_cbucket"))
      .distinct().collect().map(_.getLong(0)).toSet
    val (dirtyCurve, carried) = curveSegs.partition(s => dirty(bucketOf(s)))
    val toCluster = spark.read.parquet(
      (debris ++ dirtyCurve).map(s => s"$path/${s.name}"): _*)
    val newSegs = writeCurveSegments(spark, path, keyCol, toCluster, desc,
      bucketBits, v + 1, rowGroupBytes)
    commitManifest(spark, path, v + 1, carried ++ newSegs)
    true
  }

  /** The shared clustered-write pass of [[optimizeCurve]] /
    * [[optimizeIncremental]]: key + bucket the input, one
    * hash-exchange + in-partition sort + dynamic-partition parquet
    * write into a hidden staging dir, then driver-side renames into
    * immutable `seg_v<V>_b<B>` segments with a column-pruned stats
    * read-back each. The staging dir is scrubbed here on success and
    * by [[vacuum]] after a crash. */
  private def writeCurveSegments(spark: SparkSession, path: String,
      keyCol: String, input: DataFrame, desc: Layout.QuantizedLayoutDesc,
      bucketBits: Int, newVersion: Int, rowGroupBytes: Long): Seq[Segment] = {
    val keyName = desc.keyName
    val totalBits = desc.dims.size * desc.dims.head.bits
    val elemType = if (desc.elemBits == 32) "int" else "smallint"
    val fs = hfs(spark, path)
    val all = // re-optimize: rebuild the key column, don't duplicate it
      if (input.columns.contains(keyName)) input.drop(keyName) else input
    val cells = desc.dims.map(d =>
      Quantize.grid(col(d.name), d.lo, d.hi, d.bits).cast(elemType))
    val key = if (desc.curve == "hilbert")
      graft.functions.Curves.hilbertSortKey(cells: _*)
    else graft.functions.Curves.mortonSortKey(cells: _*)
    // cells < 2^B on an elemBits-wide encode give the SAME index as a
    // B-bit encode (corner property, asserted in spec) -> raw keys
    // occupy [0, 2^(n*B)) and the top bucketBits of that width are the
    // coarse cell
    val keyed = all.withColumn(keyName, key)
      .withColumn("_cbucket", shiftrightunsigned(
        col(keyName).bitwiseXOR(lit(Long.MinValue)), totalBits - bucketBits))
    val tmp = s"$path/.opt_tmp_" + f"v$newVersion%05d"
    fs.delete(new Path(tmp), true)
    keyed
      .repartition(col("_cbucket"))
      .sortWithinPartitions(col("_cbucket"), col(keyName))
      .write.mode("overwrite")
      .option("parquet.block.size", rowGroupBytes.toString)
      .partitionBy("_cbucket")
      .parquet(tmp)
    val bucketDirs = fs.listStatus(new Path(tmp)).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("_cbucket="))
      .sortBy(_.getPath.getName.stripPrefix("_cbucket=").toLong)
    val segs = bucketDirs.map { st =>
      val b = st.getPath.getName.stripPrefix("_cbucket=").toLong
      val name = segName(newVersion) + f"_b$b%04d"
      fs.delete(new Path(s"$path/$name"), true) // crashed prior attempt
      require(fs.rename(st.getPath, new Path(s"$path/$name")),
        s"rename failed for $name")
      val stt = spark.read.parquet(s"$path/$name")
        .agg(min(col(keyCol)).cast("long"), max(col(keyCol)).cast("long"),
          count(lit(1)), min(col(keyName)), max(col(keyName)))
        .collect()(0)
      Segment(name, stt.getLong(0), stt.getLong(1), stt.getLong(2),
        Some((stt.getLong(3), stt.getLong(4))))
    }
    fs.delete(new Path(tmp), true)
    segs
  }

  /** The optimize layout's one non-grid parameter — the bucket width —
    * persisted beside the grid sidecar so [[optimizeIncremental]]
    * re-buckets with exactly the width the segments were built with
    * (a drifted width would silently split cells across segments). */
  private def writeOptimizeMeta(spark: SparkSession, path: String,
      bucketBits: Int): Unit = {
    val fs = hfs(spark, path)
    val out = fs.create(new Path(s"$path/_graft_optimize.json"), true)
    try out.write(s"""{"bucket_bits":$bucketBits}""".getBytes("UTF-8"))
    finally out.close()
  }

  private def readOptimizeMeta(spark: SparkSession, path: String): Int = {
    val fs = hfs(spark, path)
    val p = new Path(s"$path/_graft_optimize.json")
    require(fs.exists(p), s"no optimize meta at $path — run optimizeCurve first")
    val in = fs.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(text).get("bucket_bits").asInt()
  }

  /** The (kept, total) segment split a curve box query makes against
    * a version's manifest: a segment survives iff its stored-key
    * [min,max] intersects ANY of the box's decomposed key ranges;
    * stat-less segments (plain-verb output) always survive —
    * conservative, never loses a row. Driver-side, manifest-only. */
  def pruneCurveSegments(spark: SparkSession, path: String,
      ranges: Seq[(Long, Long)], asOf: Int = -1): (Seq[Segment], Int) = {
    val v = if (asOf > 0) asOf else currentVersion(spark, path)
    val segs = readManifest(spark, path, v)
    val signed = ranges.map { case (a, b) =>
      (a ^ Long.MinValue, b ^ Long.MinValue) } // u64 -> stored (signed) domain
    val kept = segs.filter(_.curve.forall { case (cn, cx) =>
      signed.exists { case (lo, hi) => lo <= cx && hi >= cn } })
    (kept, segs.size)
  }

  /** Curve box query over an [[optimizeCurve]]d table: the box
    * decomposes ONCE (through the stored sidecar's grid) into key
    * ranges that prune at BOTH levels — segments from the manifest
    * ([[pruneCurveSegments]]; no file listing, no footer reads for
    * pruned segments), then row groups inside survivors via the
    * pushed key-range disjunction. Same contract as every curve
    * layout: ranges PRUNE, the caller ANDs the exact per-dimension
    * predicates to decide membership. */
  def readCurveRanges(spark: SparkSession, path: String,
      boxLo: Seq[Double], boxHi: Seq[Double], maxRanges: Int = 16,
      asOf: Int = -1): DataFrame = {
    val desc = Layout.openQuantized(path)
    val ranges = desc.boxRanges(boxLo, boxHi, maxRanges)
    val (kept, _) = pruneCurveSegments(spark, path, ranges, asOf)
    if (kept.isEmpty) read(spark, path, asOf).filter(lit(false))
    else spark.read.parquet(kept.map(s => s"$path/${s.name}"): _*)
      .filter(Layout.curveRangePredicate(col(desc.keyName), ranges))
  }

  /** Primary-key range read with MANIFEST-level segment pruning on
    * the key stats every verb already records — the warehouse "needle
    * in a 100 TB table" path: only segments whose [minKey, maxKey]
    * intersects [lo, hi] are even listed; the pushed BETWEEN then
    * prunes row groups inside them. Clustered ingest keeps key ranges
    * tight; [[compactSegments]]/[[optimizeCurve]] restore tightness
    * after interleaved writes. */
  def readKeyRange(spark: SparkSession, path: String, keyCol: String,
      lo: Long, hi: Long, asOf: Int = -1): DataFrame = {
    val v = if (asOf > 0) asOf else currentVersion(spark, path)
    val segs = readManifest(spark, path, v)
      .filter(s => s.minKey <= hi && s.maxKey >= lo)
    if (segs.isEmpty) read(spark, path, v).filter(lit(false))
    else spark.read.parquet(segs.map(s => s"$path/${s.name}"): _*)
      .filter(col(keyCol).between(lo, hi))
  }

  /** CHANGE DATA FEED between two retained versions: (key, op) with
    * op in insert / update / delete, computed from ONLY the segments
    * that DIFFER between the two manifests — segments carried over by
    * reference are immutable, so their rows cannot have changed and
    * are never read. Cost is therefore ∝ the data the commits between
    * v1 and v2 actually rewrote, not the table size — the property
    * that makes incremental downstream consumers viable at 100 TB
    * (a compact/optimize commit rewrites everything and correctly
    * costs a full diff; its content is unchanged, so it yields ZERO
    * rows — spec-pinned).
    *
    * `update` means the row's content differs on the COMMON non-key
    * columns of the two versions (column hash via md5(to_json(...)) of
    * the name-sorted struct): a rewrite that only re-sorted or
    * re-bucketed rows (compaction, optimize — which may ADD its key
    * column) diffs to zero; a schema-evolution commit diffs on what
    * both versions share. */
  def changesBetween(spark: SparkSession, path: String, v1: Int, v2: Int,
      keyCol: String): DataFrame = {
    require(v1 < v2, s"need v1 < v2, got $v1 >= $v2")
    val m1 = readManifest(spark, path, v1)
    val m2 = readManifest(spark, path, v2)
    val shared = m1.map(_.name).toSet intersect m2.map(_.name).toSet
    def side(segs: Seq[Segment]): Option[DataFrame] = {
      val own = segs.filterNot(s => shared(s.name))
      if (own.isEmpty) None
      else Some(spark.read.parquet(own.map(s => s"$path/${s.name}"): _*))
    }
    val empty = read(spark, path, v2).select(col(keyCol))
      .filter(lit(false)).withColumn("op", lit(""))
    (side(m1), side(m2)) match {
      case (None, None) => empty
      case (Some(d1), None) =>
        d1.select(col(keyCol), lit("delete").as("op"))
      case (None, Some(d2)) =>
        d2.select(col(keyCol), lit("insert").as("op"))
      case (Some(d1), Some(d2)) =>
        val common = commonContent(d1, d2, keyCol)
        contentHashed(d1, keyCol, common, "_h1")
          .join(contentHashed(d2, keyCol, common, "_h2"), Seq(keyCol), "full_outer")
          .withColumn("op",
            when(col("_h1").isNull, "insert")
              .when(col("_h2").isNull, "delete")
              .when(col("_h1") =!= col("_h2"), "update"))
          .filter(col("op").isNotNull)
          .select(col(keyCol), col("op"))
    }
  }

  /** [[changesBetween]] with PAYLOADS instead of ops — the shape an
    * incremental downstream consumer of a subtractable artifact needs:
    * `(removed, added)` full-row frames where an updated key appears
    * in BOTH (old content in removed, new in added), a deleted key
    * only in removed, an inserted key only in added. Feeding `removed`
    * to a count artifact's delete verb and `added` to its append verb
    * advances the artifact from the v1 corpus state to v2 EXACTLY
    * (sum-merge subtraction; gated end-to-end by q_text_lm_sync).
    * Same segment-diff economics: only segments the two manifests do
    * not share are read, so sync cost tracks the rewritten data. */
  def changedRows(spark: SparkSession, path: String, v1: Int, v2: Int,
      keyCol: String): (DataFrame, DataFrame) = {
    require(v1 < v2, s"need v1 < v2, got $v1 >= $v2")
    val m1 = readManifest(spark, path, v1)
    val m2 = readManifest(spark, path, v2)
    val shared = m1.map(_.name).toSet intersect m2.map(_.name).toSet
    def side(segs: Seq[Segment]): Option[DataFrame] = {
      val own = segs.filterNot(s => shared(s.name))
      if (own.isEmpty) None
      else Some(spark.read.parquet(own.map(s => s"$path/${s.name}"): _*))
    }
    val empty = read(spark, path, v2).filter(lit(false))
    (side(m1), side(m2)) match {
      case (None, None) => (empty, empty)
      case (Some(d1), None) => (d1, empty)
      case (None, Some(d2)) => (empty, d2)
      case (Some(d1), Some(d2)) =>
        val common = commonContent(d1, d2, keyCol)
        val unchanged = contentHashed(d1, keyCol, common, "_h1")
          .join(contentHashed(d2, keyCol, common, "_h2"), Seq(keyCol))
          .filter(col("_h1") === col("_h2")).select(col(keyCol))
        (d1.join(unchanged, Seq(keyCol), "left_anti"),
          d2.join(unchanged, Seq(keyCol), "left_anti"))
    }
  }

  private def commonContent(d1: DataFrame, d2: DataFrame,
      keyCol: String): Seq[String] =
    (d1.columns.toSet intersect d2.columns.toSet - keyCol).toSeq.sorted

  private def contentHashed(df: DataFrame, keyCol: String,
      common: Seq[String], h: String): DataFrame =
    df.select(col(keyCol),
      (if (common.isEmpty) lit("") // key-only table: content is empty
       else md5(to_json(struct(common.map(col): _*)))).as(h))

  /** `seg_*` directories NO retained manifest references — crash
    * debris or vacuum leftovers; 0 after a clean [[vacuum]]. The GC
    * audit surface (q_sink_vacuum gates it at exactly 0). */
  def orphanSegments(spark: SparkSession, path: String): Seq[String] = {
    val live = versions(spark, path)
      .flatMap(readManifest(spark, path, _)).map(_.name).toSet
    val fs = hfs(spark, path)
    fs.listStatus(new Path(path)).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("seg_"))
      .map(_.getPath.getName).filterNot(live.contains).sorted
  }

  /** Retention: keep the newest `keepLast` versions; physically delete
    * (a) manifests older than that and (b) every `seg_*` directory no
    * retained manifest references — which also scrubs the debris of a
    * commit that crashed after its segment write but before its
    * manifest rename. Time travel to a vacuumed version then fails
    * loudly in [[read]]. Single-writer contract: run between commits.
    * Returns (segmentsRemoved, manifestsRemoved). */
  def vacuum(spark: SparkSession, path: String,
      keepLast: Int): (Int, Int) = {
    require(keepLast >= 1, s"must retain at least one version: $keepLast")
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"no committed version at $path")
    val retained = vs.takeRight(keepLast)
    val live = retained.flatMap(readManifest(spark, path, _))
      .map(_.name).toSet
    val fs = hfs(spark, path)
    val segDirs = fs.listStatus(new Path(path)).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("seg_"))
      .map(_.getPath)
    val orphans = segDirs.filterNot(p => live.contains(p.getName))
    orphans.foreach(p => fs.delete(p, true))
    val oldManifests = vs.dropRight(keepLast)
    oldManifests.foreach(v => fs.delete(manifestPath(path, v), false))
    // scrub of an optimize that crashed mid-write: its staging dir is
    // never referenced by any manifest
    fs.listStatus(new Path(path)).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(".opt_tmp_"))
      .foreach(st => fs.delete(st.getPath, true))
    (orphans.size, oldManifests.size)
  }
}
