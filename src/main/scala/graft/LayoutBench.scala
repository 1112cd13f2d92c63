package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Curves
import graft.layout.Layout

/** Layout-optimization measurement (fills BASELINE.md's proxy table):
  * writes sf lineitem Hilbert-ordered vs natural-ordered, runs the same
  * selective 2-D filter on both, and reports wall times plus the
  * footer-stats row-group skip ratio. Also measures raw encode
  * throughput. One JSON line on stdout + layout_result.json.
  */
object LayoutBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val nRows = li.count()

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // raw encode throughput (codegen'd projection, no shuffle)
    noop(li.select(Curves.hilbertEncode(col("l_partkey").cast("int"), col("l_linenumber")))) // warm
    val tH2 = timed(noop(li.select(
      Curves.hilbertEncode(col("l_partkey").cast("int"), col("l_linenumber")).as("k"))))
    val tM2 = timed(noop(li.select(
      Curves.mortonEncode(col("l_partkey").cast("int"), col("l_linenumber")).as("k"))))
    val tH4 = timed(noop(li.select(Curves.hilbertEncode(
      (col("l_partkey") % 32768).cast("short"), col("l_suppkey").cast("short"),
      col("l_linenumber").cast("short"), col("l_quantity").cast("short")).as("k"))))

    // layout write: hilbert- vs morton- vs natural-ordered, same 1 MiB
    // row groups (the reference positions BOTH curves as layout sort keys)
    val base = System.getProperty("java.io.tmpdir") + "/graft_layout_bench"
    val hilbertPath = s"$base/hilbert"
    val mortonPath = s"$base/morton"
    val naturalPath = s"$base/natural"
    // untimed sink warmup: the first parquet write JITs the committer /
    // column-writer / codec paths — without this the first timed write
    // (hilbert) absorbed ~1s of one-time cost
    Layout.writeHilbertOrdered(li.limit(50000), Seq("l_partkey", "l_suppkey"), s"$base/warm")
    val tWriteH = timed(Layout.writeHilbertOrdered(li, Seq("l_partkey", "l_suppkey"), hilbertPath))
    val tWriteM = timed(Layout.writeMortonOrdered(li, Seq("l_partkey", "l_suppkey"), mortonPath))
    val tWriteN = timed(Layout.writeNaturalOrder(li, naturalPath))

    // selective 2-D filter on both layouts
    val (loP, hiP, loS, hiS) = (400L, 599L, 20L, 69L)
    def filtered(path: String): DataFrame =
      spark.read.parquet(path)
        .filter(col("l_partkey").between(loP, hiP) && col("l_suppkey").between(loS, hiS))
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    noop(filtered(hilbertPath)) // warm footer caches on all three
    noop(filtered(mortonPath))
    noop(filtered(naturalPath))
    val tScanH = timed(noop(filtered(hilbertPath)))
    val tScanM = timed(noop(filtered(mortonPath)))
    val tScanN = timed(noop(filtered(naturalPath)))

    // footer-stats skip ratio (the mechanism the scan uses)
    val (rgH, skipH) = Layout.countSkippable(hilbertPath, "l_partkey", loP, hiP, "l_suppkey", loS, hiS)
    val (rgM, skipM) = Layout.countSkippable(mortonPath, "l_partkey", loP, hiP, "l_suppkey", loS, hiS)
    val (rgN, skipN) = Layout.countSkippable(naturalPath, "l_partkey", loP, hiP, "l_suppkey", loS, hiS)

    // key-indexed variant (q_layout_range's path): same box as
    // CurveRanges ranges on the ONE stored hkey column — skip measured
    // against the sort column's own footer stats
    val idxPath = s"$base/indexed"
    val tWriteI = timed(Layout.writeHilbertIndexed(li, Seq("l_partkey", "l_suppkey"), idxPath))
    val ranges = graft.core.CurveRanges.ranges(hilbert = true,
      Array(loP, loS), Array(hiP, hiS), bits = 32, maxRanges = 16)
    def filteredIdx(): DataFrame =
      spark.read.parquet(idxPath)
        .filter(Layout.curveRangePredicate(col("hkey"), ranges) &&
          col("l_partkey").between(loP, hiP) && col("l_suppkey").between(loS, hiS))
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    noop(filteredIdx())
    val tScanI = timed(noop(filteredIdx()))
    val rgsI = Layout.rowGroupRanges(idxPath, "hkey")
    val skipI = rgsI.count { case (mn, mx, _) =>
      !ranges.exists { case (a, b) =>
        (a ^ Long.MinValue) <= mx && (b ^ Long.MinValue) >= mn
      }
    }

    // 4-D: the dimensionality where key-range pruning should beat
    // per-dimension footer stats — a curve-ordered row group is a
    // compact 4-D cell whose per-dim bounding box intersects far more
    // boxes than its actual curve interval (corner effects grow with
    // n). Same box as q_layout_range_4d; both prune counts measured
    // from the SAME footers.
    val idx4Path = s"$base/indexed4"
    Layout.writeHilbertIndexed(li,
      Seq("l_partkey", "l_suppkey", "l_quantity", "l_linenumber"),
      idx4Path, "hkey4", elemType = "smallint")
    val box4 = Seq(("l_partkey", 2000L, 5999L), ("l_suppkey", 100L, 399L),
      ("l_quantity", 10L, 29L), ("l_linenumber", 1L, 4L))
    val ranges4 = graft.core.CurveRanges.ranges(hilbert = true,
      Array(box4.map(_._2): _*), Array(box4.map(_._3): _*), bits = 16, maxRanges = 32)
    // per-dimension stats: group skippable iff ANY dim's [min,max]
    // misses the box (what a plain multi-column filter can use)
    val dimRanges = box4.map { case (c, _, _) => Layout.rowGroupRanges(idx4Path, c) }
    val nGroups4 = dimRanges.head.size
    val skipPerDim = (0 until nGroups4).count { g =>
      box4.zipWithIndex.exists { case ((_, lo, hi), d) =>
        val (mn, mx, _) = dimRanges(d)(g); mx < lo || mn > hi
      }
    }
    val keyRanges4 = Layout.rowGroupRanges(idx4Path, "hkey4")
    def keySkips4(g: Int): Boolean = {
      val (mn, mx, _) = keyRanges4(g)
      !ranges4.exists { case (a, b) =>
        (a ^ Long.MinValue) <= mx && (b ^ Long.MinValue) >= mn
      }
    }
    val skipKey4 = (0 until nGroups4).count(keySkips4)
    // the scan pushes BOTH filter families, so the reader's actual
    // skip is their union
    val skipBoth4 = (0 until nGroups4).count { g =>
      keySkips4(g) || box4.zipWithIndex.exists { case ((_, lo, hi), d) =>
        val (mn, mx, _) = dimRanges(d)(g); mx < lo || mn > hi
      }
    }

    // QUANTIZED real-column layout (q_layout_range_f's path): DOUBLE
    // columns through the order-preserving grid quantizer, indexed and
    // pruned exactly like the int layouts — the skip ratio shows the
    // quantizer preserves curve locality for non-integer columns.
    import graft.layout.Quantize
    val idxfPath = s"$base/indexedf"
    val (pfLo, pfHi, qfLo, qfHi, fBits) = (900.0, 105000.0, 1.0, 50.0, 16)
    val tWriteF = timed(Layout.writeHilbertIndexedCells(li,
      Seq(Quantize.grid(col("l_extendedprice"), pfLo, pfHi, fBits).cast("int"),
        Quantize.grid(col("l_quantity"), qfLo, qfHi, fBits).cast("int")),
      idxfPath, "hkeyf"))
    val rangesF = graft.core.CurveRanges.ranges(hilbert = true,
      Array(Quantize.cell(20000.0, pfLo, pfHi, fBits), Quantize.cell(10.0, qfLo, qfHi, fBits)),
      Array(Quantize.cell(30000.0, pfLo, pfHi, fBits), Quantize.cell(29.0, qfLo, qfHi, fBits)),
      bits = 32, maxRanges = 16)
    def filteredF(): DataFrame =
      spark.read.parquet(idxfPath)
        .filter(Layout.curveRangePredicate(col("hkeyf"), rangesF) &&
          col("l_extendedprice").between(20000.0, 30000.0) &&
          col("l_quantity").between(10.0, 29.0))
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    noop(filteredF())
    val tScanF = timed(noop(filteredF()))
    val rgsF = Layout.rowGroupRanges(idxfPath, "hkeyf")
    val skipF = rgsF.count { case (mn, mx, _) =>
      !rangesF.exists { case (a, b) =>
        (a ^ Long.MinValue) <= mx && (b ^ Long.MinValue) >= mn
      }
    }

    // INGEST -> COMPACT lifecycle (round-7 verdict ask #7): a
    // curve-bucket-partitioned table as a stream leaves it (partition
    // dirs give bucket-level locality, files inside arrive in stream
    // order) vs the same data after Layout.compactIndexed. Measured on
    // the SAME footers a reader uses: per-dimension stats skip before,
    // key-range skip after — the number the maintenance step buys.
    val ingestPath = s"$base/stream_ingest"
    val compactPath = s"$base/compacted"
    // emulate stream arrival order (hash-scrambled) fanned into curve
    // buckets, one file per bucket, exactly what the streaming sink's
    // micro-batches accumulate
    val shift = 22
    li.orderBy(md5(col("l_orderkey").cast("string")))
      .withColumn("curve_bucket", Layout.curveBucket(shift,
        col("l_partkey").cast("int"), col("l_suppkey").cast("int")))
      .repartition(col("curve_bucket"))
      .sortWithinPartitions(col("curve_bucket"))
      .write.mode("overwrite")
      .option("parquet.block.size", (1L << 20).toString)
      .partitionBy("curve_bucket").parquet(ingestPath)
    val nBuckets = new java.io.File(ingestPath).listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("curve_bucket="))
    def dimSkip(path: String): (Int, Int) = {
      val a = Layout.rowGroupRanges(path, "l_partkey")
      val b = Layout.rowGroupRanges(path, "l_suppkey")
      (a.size, a.zip(b).count { case ((mnA, mxA, _), (mnB, mxB, _)) =>
        mxA < loP || mnA > hiP || mxB < loS || mnB > hiS
      })
    }
    val (rgIng, skipIng) = dimSkip(ingestPath)
    def filteredAny(path: String): DataFrame =
      spark.read.parquet(path)
        .filter(col("l_partkey").between(loP, hiP) && col("l_suppkey").between(loS, hiS))
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    noop(filteredAny(ingestPath))
    val tScanIng = timed(noop(filteredAny(ingestPath)))
    val tCompact = timed(Layout.compactIndexed(
      spark.read.parquet(ingestPath), Seq("l_partkey", "l_suppkey"), compactPath))
    val (rgComp, skipCompDim) = dimSkip(compactPath)
    val rgsComp = Layout.rowGroupRanges(compactPath, "hkey")
    val skipCompKey = rgsComp.count { case (mn, mx, _) =>
      !ranges.exists { case (a, b) =>
        (a ^ Long.MinValue) <= mx && (b ^ Long.MinValue) >= mn
      }
    }
    def filteredComp(): DataFrame =
      spark.read.parquet(compactPath)
        .filter(Layout.curveRangePredicate(col("hkey"), ranges) &&
          col("l_partkey").between(loP, hiP) && col("l_suppkey").between(loS, hiS))
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    noop(filteredComp())
    val tScanComp = timed(noop(filteredComp()))

    val json =
      s"""{"metric":"layout","rows":$nRows,"cpus":$cpus,"sf":"$sfDir",""" +
        s""""encode_rows_per_sec":{"hilbert_2d32":${(nRows / tH2).toLong},""" +
        s""""morton_2d32":${(nRows / tM2).toLong},"hilbert_4d16":${(nRows / tH4).toLong}},""" +
        s""""write_sec":{"hilbert_ordered":$tWriteH,"morton_ordered":$tWriteM,"natural":$tWriteN,"hilbert_indexed":$tWriteI},""" +
        s""""filtered_scan_sec":{"hilbert_ordered":$tScanH,"morton_ordered":$tScanM,"natural":$tScanN,"hilbert_indexed_ranges":$tScanI},""" +
        s""""row_groups":{"hilbert":{"total":$rgH,"skippable":$skipH},""" +
        s""""morton":{"total":$rgM,"skippable":$skipM},""" +
        s""""natural":{"total":$rgN,"skippable":$skipN},""" +
        s""""indexed_hkey_ranges":{"total":${rgsI.size},"skippable":$skipI,"n_ranges":${ranges.size}},""" +
        s""""indexed_4d":{"total":$nGroups4,"skippable_per_dim_stats":$skipPerDim,""" +
        s""""skippable_key_ranges":$skipKey4,"skippable_combined":$skipBoth4,""" +
        s""""n_ranges":${ranges4.size}},""" +
        s""""quantized_f":{"total":${rgsF.size},"skippable":$skipF,""" +
        s""""n_ranges":${rangesF.size},"write_sec":$tWriteF,"scan_sec":$tScanF},""" +
        s""""compaction":{"n_buckets":$nBuckets,"compact_sec":$tCompact,""" +
        s""""ingested":{"total":$rgIng,"skippable_per_dim_stats":$skipIng,"scan_sec":$tScanIng},""" +
        s""""compacted":{"total":$rgComp,"skippable_per_dim_stats":$skipCompDim,""" +
        s""""skippable_key_ranges":$skipCompKey,"scan_sec":$tScanComp}}}}"""
    Files.writeString(Paths.get("layout_result.json"), json + "\n")
    println(json)
    spark.stop()
  }
}
