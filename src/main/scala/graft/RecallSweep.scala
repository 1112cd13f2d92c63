package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.similarity.Similarity

/** Diagnostic main (like [[LayoutBench]]): sweeps the ANN operating
  * knobs against the exact brute-force top-k and prints a markdown
  * table of (recall@k, fraction of corpus scored per probe) — the
  * numbers a user needs to pick an operating point (BASELINE.md
  * records the sf0.01 sweep). Not a query path: runs driver-side
  * counts per grid point by design.
  */
object RecallSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val probePred = col("vec_id") % 50 === 0
    val k = 10
    val truth = Similarity.bruteForceTopK(emb, probePred, k)
      .select("probe_id", "neighbor_id").cache()
    val nProbes = truth.select("probe_id").distinct().count()
    val corpusN = emb.count()

    def recall(res: DataFrame): Double =
      res.select("probe_id", "neighbor_id")
        .join(truth, Seq("probe_id", "neighbor_id")).count().toDouble / (nProbes * k)

    println(s"sf=$sfDir corpus=$corpusN probes=$nProbes k=$k")
    println("| operator | knobs | recall@10 | corpus scored/probe |")
    println("|---|---|---|---|")
    for (bands <- Seq(2, 4, 8); shift <- Seq(24, 20, 16)) {
      val res = Similarity.annTopK(emb, probePred, k, bands, shift)
      // measured candidate fraction: rebuild the candidate set exactly
      // as annTopK blocks it (bands explode + +-1 multi-probe)
      val buckets = emb
        .select(col("vec_id"), Similarity.bandKeys(col("embedding"), bands).as("keys"))
        .select(col("vec_id"),
          posexplode(transform(col("keys"), key => shiftright(key, shift)))
            .as(Seq("band_idx", "bucket")))
      val probeBuckets = buckets.filter(probePred)
        .select(col("vec_id").as("probe_id"), col("band_idx"),
          explode(array(col("bucket") - 1, col("bucket"), col("bucket") + 1)).as("bucket"))
      val frac = probeBuckets.join(buckets, Seq("band_idx", "bucket"))
        .filter(col("vec_id") =!= col("probe_id"))
        .select("probe_id", "vec_id").distinct().count().toDouble / (nProbes * (corpusN - 1))
      println(f"| annTopK (curve-LSH) | bands=$bands shift=$shift | ${recall(res)}%.2f | ${frac * 100}%.0f%% |")
      spark.catalog.clearCache(); truth.cache().count()
    }
    // spatial multi-probe: own subcube + the 2*4 axis-adjacent
    // subcubes per band (round-7 verdict ask #8) — same measured-
    // fraction method, with the probe set rebuilt the spatial way
    for (bands <- Seq(2, 4, 8); shift <- Seq(24, 20, 16)) {
      val res = Similarity.annTopK(emb, probePred, k, bands, shift, spatialProbe = true)
      val buckets = emb
        .select(col("vec_id"), Similarity.bandKeys(col("embedding"), bands).as("keys"))
        .select(col("vec_id"),
          posexplode(transform(col("keys"), key => shiftright(key, shift)))
            .as(Seq("band_idx", "bucket")))
      val probeBuckets = Similarity.spatialProbeBuckets(emb, probePred, bands, shift)
      val frac = probeBuckets.join(buckets, Seq("band_idx", "bucket"))
        .filter(col("vec_id") =!= col("probe_id"))
        .select("probe_id", "vec_id").distinct().count().toDouble / (nProbes * (corpusN - 1))
      println(f"| annTopK (spatial multi-probe) | bands=$bands shift=$shift | ${recall(res)}%.2f | ${frac * 100}%.0f%% |")
      spark.catalog.clearCache(); truth.cache().count()
    }
    for (nlist <- Seq(16, 64); nprobe <- Seq(1, 4, 16) if nprobe <= nlist) {
      val res = Similarity.ivfSeededTopK(emb, probePred, k, nlist, nprobe)
      val r = recall(res)
      println(f"| ivfSeededTopK | nlist=$nlist nprobe=$nprobe | $r%.2f | ~${100.0 * nprobe / nlist}%.0f%% (est) |")
      spark.catalog.clearCache(); truth.cache().count()
    }
    for (nlist <- Seq(16, 64); nprobe <- Seq(1, 4, 16) if nprobe <= nlist) {
      val res = Similarity.ivfTopK(emb, probePred, k, nlist, nprobe)
      val r = recall(res)
      println(f"| ivfTopK (KMeans) | nlist=$nlist nprobe=$nprobe | $r%.2f | ~${100.0 * nprobe / nlist}%.0f%% (est) |")
      spark.catalog.clearCache(); truth.cache().count()
    }
    for (reRank <- Seq(20, 40, 100)) {
      val res = Similarity.pqTopK(emb, probePred, k, reRank = reRank)
      val r = recall(res)
      // ADC scans every CODE (16 ints/vector) but re-ranks only reRank
      println(f"| pqTopK (seeded PQ) | m=16 reRank=$reRank | $r%.2f | ${100.0 * reRank / corpusN}%.0f%% exact (+codes scan) |")
      spark.catalog.clearCache(); truth.cache().count()
    }
    for (ncent <- Seq(16, 32); nprobe <- Seq(2, 4, 8); reRank <- Seq(40, 100)) {
      val res = Similarity.ivfPqTopK(emb, probePred, k,
        nprobe = nprobe, ncent = ncent, reRank = reRank)
      val r = recall(res)
      // IVF prunes the codes scan to ~nprobe/nlist of the corpus; only
      // reRank candidates get exact scoring
      println(f"| ivfPqTopK (IVFADC) | nlist=16 nprobe=$nprobe ncent=$ncent reRank=$reRank | $r%.2f | ${100.0 * reRank / corpusN}%.0f%% exact (codes scan ~${100.0 * nprobe / 16}%.0f%%) |")
      spark.catalog.clearCache(); truth.cache().count()
    }
    spark.stop()
  }
}
