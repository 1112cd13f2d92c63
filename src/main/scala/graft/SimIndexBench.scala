package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.similarity.Similarity

/** Diagnostic main (like [[LayoutBench]]): measures the persisted PQ
  * index's build/probe split — the write-once serving shape's payoff
  * as a number. Build = pqIndexBuild (the one corpus-sized encode +
  * artifact writes); probe = pqIndexTopK end-to-end (min of 3, warm),
  * reading the artifacts with zero re-encode; reference = pqTopK
  * deriving everything per run. Prints one JSON line.
  */
object SimIndexBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val probePred = col("vec_id") % 50 === 0
    val path = System.getProperty("java.io.tmpdir") + "/graft_pq_index_bench"

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def minOf3(f: => Unit): Double = { f; (1 to 3).map(_ => timed(f)).min }

    val tBuild = timed(Similarity.pqIndexBuild(emb, path))
    val tProbe = minOf3 {
      noop(Similarity.pqIndexTopK(spark, path, probePred, 10))
      spark.catalog.clearCache()
    }
    val tDerive = minOf3 {
      noop(Similarity.pqTopK(emb, probePred, 10))
      spark.catalog.clearCache()
    }
    val n = emb.count()
    println(s"""{"metric":"pq_index","rows":$n,"sf":"$sfDir",""" +
      s""""build_sec":$tBuild,"probe_sec":$tProbe,"derive_per_run_sec":$tDerive}""")
    spark.stop()
  }
}
