package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming over the events table: the library's
  * expressions and transforms are stateless scalars, so the same
  * pipeline definition runs batch or streaming unchanged — this spec
  * proves it by running a watermarked windowed aggregation as a file
  * stream into a memory sink and comparing against the identical batch
  * computation.
  */
class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-streaming-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** Hourly event counts + integer props sum per event type, with a
    * 1-hour watermark (a no-op on the batch side, late-data bound on
    * the stream side). */
  private def hourlyAgg(ev: DataFrame): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast("long")
    ev.select(
        timestamp_micros((col("ts") / lit(1000L)).cast("long")).as("tsm"),
        col("event_type"), k.as("k"))
      .withWatermark("tsm", "1 hour")
      .groupBy(window(col("tsm"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"), col("sum_k"))
  }

  test("file-stream windowed aggregation matches the batch result") {
    // stage the events file in its own directory (file streams read dirs)
    val inDir = Files.createTempDirectory("graft_stream_in")
    Files.copy(
      Paths.get("/root/testdata/sf0.001/events.parquet"),
      inDir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)

    val batch = spark.read.parquet(inDir.toString)
    val schema = batch.schema

    val q = hourlyAgg(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(inDir.toString))
      .writeStream.format("memory").queryName("ev_hourly")
      .outputMode("complete").start()
    try q.processAllAvailable()
    finally q.stop()

    def key(r: org.apache.spark.sql.Row) =
      (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2), r.getLong(3))
    val streamed = spark.table("ev_hourly").collect().map(key).sorted.toSeq
    val batched = hourlyAgg(batch).collect().map(key).sorted.toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batched)
  }

  test("curve expressions run unchanged inside a streaming projection") {
    import graft.functions.Curves
    val inDir = Files.createTempDirectory("graft_stream_curve")
    Files.copy(
      Paths.get("/root/testdata/sf0.001/events.parquet"),
      inDir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val schema = spark.read.parquet(inDir.toString).schema

    val proj = spark.readStream.schema(schema).parquet(inDir.toString)
      .select(col("event_id"),
        Curves.curveKeyStr(Curves.hilbertEncode(
          col("user_id").cast("int"), col("event_id").cast("int"))).as("hkey"))
    val q = proj.writeStream.format("memory").queryName("ev_curve")
      .outputMode("append").start()
    try q.processAllAvailable()
    finally q.stop()

    val rows = spark.table("ev_curve").collect()
    assert(rows.length == spark.read.parquet(inDir.toString).count())
    assert(rows.forall(_.getString(1).nonEmpty))
  }

  test("streaming exact dedup: dropDuplicatesWithinWatermark == batch dedup") {
    import spark.implicits._
    // replayed documents (same content hash) arriving at different times
    val inDir = Files.createTempDirectory("graft_stream_dedup")
    val docs = Seq(
      (1L, 1000L, "alpha beta"), (2L, 2000L, "gamma"), (3L, 3000L, "alpha beta"),
      (4L, 4000L, "delta"), (5L, 5000L, "gamma"), (6L, 6000L, "epsilon"))
      .toDF("doc_id", "ts_us", "text")
      .select(col("doc_id"), col("ts_us"), col("text"),
        graft.text.TextFunctions.contentHash(col("text")).as("content_hash"))
    docs.coalesce(1).write.mode("overwrite").parquet(inDir.toString)
    val schema = docs.schema

    val q = spark.readStream.schema(schema).parquet(inDir.toString)
      .withColumn("event_time", timestamp_micros(col("ts_us")))
      .withWatermark("event_time", "1 hour")
      .dropDuplicatesWithinWatermark("content_hash")
      .select("doc_id", "content_hash")
      .writeStream.format("memory").queryName("doc_dedup")
      .outputMode("append").start()
    try q.processAllAvailable()
    finally q.stop()

    val streamed = spark.table("doc_dedup").collect()
      .map(r => r.getString(1)).sorted.toSeq
    val batched = docs.dropDuplicates("content_hash").collect()
      .map(_.getString(3)).sorted.toSeq
    assert(streamed == batched)       // one survivor per distinct content
    assert(streamed.size == 4)
  }

  test("flatMapGroupsWithState sessionization matches the batch gaps-and-islands") {
    import spark.implicits._
    val gapUs = Sessionize.DefaultGapUs
    val inDir = Files.createTempDirectory("graft_stream_sess")
    val real = Sessionize.project(
      spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
    // stage the projected events as the stream input
    real.coalesce(1).write.mode("overwrite").parquet(inDir.toString + "/batch1")
    val schema = real.schema

    val q = Sessionize.stream(
        spark.readStream.schema(schema).parquet(inDir.toString + "/*"), gapUs)
      .toDF()
      .writeStream.format("memory").queryName("ev_sessions")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // a far-future sentinel event per user breaks every open session,
      // forcing it to emit; the sentinel sessions themselves stay open
      // and unemitted (honest append-mode semantics)
      val maxUs = real.agg(max("ts_us")).head().getLong(0)
      real.select(col("user_id")).distinct()
        .select(col("user_id"), col("user_id").as("event_id"),
          lit(maxUs + 10L * gapUs).as("ts_us"), lit(0L).as("k"))
        .coalesce(1).write.mode("overwrite").parquet(inDir.toString + "/batch2")
      q.processAllAvailable()
    } finally q.stop()

    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    val streamed = spark.table("ev_sessions").collect().map(key).sorted.toSeq
    val batched = Sessionize.batch(real, gapUs).collect().map(key).sorted.toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batched)
    // multi-event sessions and multiple sessions per user both occur
    assert(batched.exists(_._4 > 1))
    assert(batched.groupBy(_._1).exists(_._2.size > 1))
  }
}
