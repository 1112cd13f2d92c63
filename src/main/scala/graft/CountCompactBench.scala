package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.text.CorpusOps

/** Diagnostic main: what does count-artifact FRAGMENTATION cost, and
  * does [[CorpusOps.compactLmIndex]] buy it back? Builds the LM bigram
  * artifact over the whole corpus in 33 slices, then takes 8 of the
  * ingested slices back down (the negated-partial delete law — every
  * verb adds a file set, so the serve-time merge reads 41 partial
  * generations), then
  * measures the serve path (score the whole corpus against the
  * artifact) fragmented vs compacted, min of 3 with warmup, plus the
  * one-off compaction cost and the physical file counts. The claim
  * under test (round 17): read cost should track CONTENT after
  * compaction, not append/delete history. Prints one JSON line. */
object CountCompactBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs.count()
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_count_compact").toString
    val path = tmp + "/lm"

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def minOf3(f: => Unit): Double = { f; Seq.fill(3)(timed(f)).min }
    def serve(): Unit = {
      CorpusOps.lmScoreIndexed(spark, docs, path)
        .agg(sum(col("surprisal_ppm"))).collect()
      spark.catalog.clearCache()
    }
    def nFiles(): Long = {
      val root = new org.apache.hadoop.fs.Path(path)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(root, true)
      var n = 0L
      while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
      n
    }

    // fragmented lifecycle: 1 build + 32 appends + 8 takedowns — the
    // takedowns target slices that WERE ingested (k = 25..32 came in
    // as appends), per the delete verb's must-have-been-ingested
    // contract; deleting never-counted docs would drive shared
    // bigrams negative and make the measured artifact unreal
    CorpusOps.writeLmIndex(docs.filter(col("doc_id") % 33 === 0), path)
    (1 until 33).foreach(k =>
      CorpusOps.appendLmIndex(docs.filter(col("doc_id") % 33 === k), path))
    (25 until 33).foreach(k =>
      CorpusOps.deleteLmIndex(docs.filter(col("doc_id") % 33 === k), path))
    val filesBefore = nFiles()
    val tFrag = minOf3(serve())
    val tCompact = timed(CorpusOps.compactLmIndex(spark, path))
    val filesAfter = nFiles()
    val tCompacted = minOf3(serve())

    println(s"""{"metric":"count_compact","sf":"$sfDir",""" +
      s""""lifecycle":"build+32_appends+8_deletes_of_ingested",""" +
      s""""files_before":$filesBefore,"files_after":$filesAfter,""" +
      s""""serve_fragmented_sec":$tFrag,"compact_sec":$tCompact,""" +
      s""""serve_compacted_sec":$tCompacted}""")
    spark.stop()
  }
}
