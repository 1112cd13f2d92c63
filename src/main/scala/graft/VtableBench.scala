package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.layout.VersionedTable

/** Measures the versioned table's copy-on-write economics — the claim
  * that makes it usable at warehouse scale: an upsert confined to one
  * segment's key range costs the touched segment + the batch, NOT the
  * table, so maintenance cost stays flat as the table grows (the
  * same flat-refresh property measured for the similarity-graph
  * sidecars in GraphScaleCheck). The contrast row is the honest worst
  * case: a scatter batch whose keys span every segment rewrites them
  * all — cost ∝ table size, the shape key-clustered ingest avoids.
  *
  * Table shape: 8 contiguous key-range segments (create + 7 appends),
  * two sizes, 4x apart. Batches are 1/1000 of the table. Also times
  * read(latest) and a time-travel read (same plain parquet scan by
  * construction). One JSON line, the repo bench convention.
  */
object VtableBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val sizes = Seq(2000000L, 8000000L)
    val results = sizes.map { n =>
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_vtable_bench_$n").toString
      val path = s"$tmp/t"
      def slice(lo: Long, hi: Long) =
        spark.range(lo, hi).select(col("id").as("k"),
          md5(col("id").cast("string")).as("payload"))
      val seg = n / 8
      val tBuild = timed {
        VersionedTable.create(slice(0, seg), path, "k")
        (1 until 8).foreach(i =>
          VersionedTable.append(slice(i * seg, (i + 1) * seg), path, "k"))
      }
      // clustered batch: 1/1000 of the table, all inside segment 0's
      // key range -> exactly one segment rewrites
      val bClustered = slice(0, seg).filter(col("k") % 125 === 0)
        .withColumn("payload", lit("upd"))
      val tClustered = timed(VersionedTable.upsert(bClustered, path, "k"))
      // scatter batch: same row count, keys across the whole range ->
      // every segment rewrites (the range-pruning worst case)
      val bScatter = slice(0, n).filter(col("k") % 1000 === 0)
        .withColumn("payload", lit("upd"))
      val tScatter = timed(VersionedTable.upsert(bScatter, path, "k"))
      val tRead = timed(VersionedTable.read(spark, path)
        .agg(count(lit(1))).collect())
      val tTravel = timed(VersionedTable.read(spark, path, asOf = 8)
        .agg(count(lit(1))).collect())
      (tBuild, tClustered, tScatter, tRead, tTravel)
    }
    def col4(i: Int) = results.map { r =>
      val v = i match {
        case 0 => r._1; case 1 => r._2; case 2 => r._3
        case 3 => r._4; case _ => r._5
      }
      f"$v%.2f"
    }.mkString("[", ",", "]")
    println(s"""{"metric":"vtable_cow","sizes":[${sizes.mkString(",")}],""" +
      s""""segments":8,"batch_frac":0.001,""" +
      s""""build_sec":${col4(0)},"clustered_upsert_sec":${col4(1)},""" +
      s""""scatter_upsert_sec":${col4(2)},"read_latest_sec":${col4(3)},""" +
      s""""timetravel_sec":${col4(4)}}""")
    spark.stop()
  }
}
