package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.similarity.Similarity

/** Diagnostic main (like [[LayoutBench]]): measures the persisted
  * similarity indexes' build/probe split — the write-once serving
  * shape's payoff as numbers. Per index family: build = the one
  * corpus-sized encode + artifact writes; probe = the indexed top-k
  * end-to-end (min of 3, warm), reading the artifacts with zero
  * re-encode; reference = the derive-per-run form. clearCache runs
  * BETWEEN timed runs, outside the measured region (round-8 ADVICE:
  * it was inside, inflating both absolute numbers). Prints one JSON
  * line.
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
    val tmp = System.getProperty("java.io.tmpdir")

    import BenchUtil.{noop, timed}
    def minOf3(f: => Unit): Double = BenchUtil.minOfN(spark)(f)

    val pqPath = tmp + "/graft_pq_index_bench"
    val tBuildPq = timed(Similarity.pqIndexBuild(emb, pqPath))
    val tProbePq = minOf3(noop(Similarity.pqIndexTopK(spark, pqPath, probePred, 10)))
    val tDerivePq = minOf3(noop(Similarity.pqTopK(emb, probePred, 10)))

    val annPath = tmp + "/graft_ann_index_bench"
    val tBuildAnn = timed(Similarity.annIndexBuild(emb, annPath))
    val tProbeAnn = minOf3(noop(Similarity.annIndexTopK(spark, annPath, probePred, 10,
      bucketShift = 16, spatialProbe = true)))
    val tDeriveAnn = minOf3(noop(Similarity.annTopK(emb, probePred, 10,
      bucketShift = 16, spatialProbe = true)))

    val n = emb.count()
    println(s"""{"metric":"sim_index","rows":$n,"sf":"$sfDir",""" +
      s""""pq":{"build_sec":$tBuildPq,"probe_sec":$tProbePq,""" +
      s""""derive_per_run_sec":$tDerivePq},""" +
      s""""ann":{"build_sec":$tBuildAnn,"probe_sec":$tProbeAnn,""" +
      s""""derive_per_run_sec":$tDeriveAnn}}""")
    spark.stop()
  }
}
