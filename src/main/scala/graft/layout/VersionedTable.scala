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

  /** One live segment as recorded in a manifest. */
  final case class Segment(name: String, minKey: Long, maxKey: Long,
      rows: Long)

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
      val Array(n, mn, mx, r) = line.split('\t')
      Segment(n, mn.toLong, mx.toLong, r.toLong)
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
    try out.write(segs.map(s => s"${s.name}\t${s.minKey}\t${s.maxKey}\t${s.rows}")
      .mkString("\n").getBytes("UTF-8"))
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
        .unionByName(deduped)
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
        .unionByName(adds)
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
    (orphans.size, oldManifests.size)
  }
}
