package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Text-source round-trip contracts (q_source_jsonl / q_source_csv):
  * write-then-read is the IDENTITY on hostile content — embedded
  * delimiters, quotes, newlines, unicode, and the NULL-vs-empty
  * distinction — under the exact options the gated queries use. */
class SourceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-source-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def hostile() = {
    import spark.implicits._
    Seq(
      (1L, "plain text"),
      (2L, "comma, inside"),
      (3L, "a \"quoted\" word"),
      (4L, "line\nbreak and\r\nCRLF"),
      (5L, "unicode: naïve café 日本語 🙂"),
      (6L, ""),            // empty — must NOT come back as NULL
      (7L, null),          // NULL — must NOT come back as ''
      (8L, "trailing space "),
      (9L, "\"\"")         // literal two double-quotes
    ).toDF("doc_id", "text")
  }

  private def roundTrip(fmt: String): Seq[(Long, Option[String])] = {
    val tmp = java.nio.file.Files.createTempDirectory(s"graft_src_$fmt").toString
    val df = hostile()
    val read = fmt match {
      case "csv" =>
        df.write.mode("overwrite")
          .option("escape", "\"").option("nullValue", "\\N")
          .option("ignoreLeadingWhiteSpace", "false")
          .option("ignoreTrailingWhiteSpace", "false").csv(tmp)
        spark.read.schema("doc_id LONG, text STRING")
          .option("escape", "\"").option("nullValue", "\\N")
          .option("ignoreLeadingWhiteSpace", "false")
          .option("ignoreTrailingWhiteSpace", "false")
          .option("multiLine", "true").csv(tmp)
      case "json" =>
        df.write.mode("overwrite").json(tmp)
        spark.read.schema("doc_id LONG, text STRING").json(tmp)
      case "orc" =>
        df.write.mode("overwrite").orc(tmp)
        spark.read.orc(tmp)
    }
    read.collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).sortBy(_._1).toSeq
  }

  test("csv round-trip is the identity on delimiters, quotes, newlines, unicode, NULL vs ''") {
    val want = hostile().collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).sortBy(_._1).toSeq
    assert(roundTrip("csv") == want)
  }

  test("jsonl round-trip is the identity on the same hostile content") {
    val want = hostile().collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).sortBy(_._1).toSeq
    assert(roundTrip("json") == want)
  }

  test("orc round-trip is the identity on the same hostile content") {
    val want = hostile().collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).sortBy(_._1).toSeq
    assert(roundTrip("orc") == want)
  }

  // Executable documentation of the ACCEPTED \N sentinel collision
  // (round-9 ADVICE): a field whose literal content is the two
  // characters \N comes back as NULL under the Hive convention,
  // because Spark's parser applies the sentinel AFTER unquoting —
  // no writer-side quoting protects it (unlike Postgres COPY). The
  // same content survives JSONL exactly. If this test ever FAILS,
  // Spark's sentinel semantics changed and the q_source_csv comment
  // + SURVEY note must be revisited.
  test("csv \\N sentinel collision: literal backslash-N content reads back as NULL (accepted limit)") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_src_sentinel").toString
    val df = Seq((1L, "\\N"), (2L, "ok")).toDF("doc_id", "text")
    df.write.mode("overwrite")
      .option("escape", "\"").option("nullValue", "\\N")
      .option("quoteAll", "true") // even forced quoting does not protect it
      .csv(tmp)
    val got = spark.read.schema("doc_id LONG, text STRING")
      .option("escape", "\"").option("nullValue", "\\N").csv(tmp)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).sortBy(_._1).toSeq
    assert(got == Seq((1L, None), (2L, Some("ok"))))

    val jtmp = java.nio.file.Files.createTempDirectory("graft_src_sentinel_j").toString
    df.write.mode("overwrite").json(jtmp)
    val jgot = spark.read.schema("doc_id LONG, text STRING").json(jtmp)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).sortBy(_._1).toSeq
    assert(jgot == Seq((1L, Some("\\N")), (2L, Some("ok"))))
  }
}
