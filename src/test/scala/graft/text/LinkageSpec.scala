package graft.text

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral contracts of the record-linkage operator that the
  * oracle's value-hash can't state as invariants: one best match per
  * left id, self-linkage is a perfect-score identity, and the emitted
  * Jaccard matches an independent builtin-function recount.
  */
class LinkageSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-linkage-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val dir = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$dir/documents.parquet")

  test("linkBestMatch emits at most one row per left id, above threshold") {
    val left = docs.filter(length(col("source")) === 4)
    val right = docs.filter(length(col("source")) === 5)
    val links = Linkage.linkBestMatch(left, right)
    val rows = links.collect()
    assert(rows.nonEmpty, "expected some cross-registry links at sf0.001")
    assert(links.select("left_id").distinct().count() == rows.length)
    rows.foreach { r =>
      assert(r.getAs[Long]("jaccard_ppm") >= 200000L)
      assert(r.getAs[Long]("inter") <= r.getAs[Long]("uni"))
    }
  }

  test("self-linkage links every blocked id to itself at jaccard 1e6") {
    val reg = docs.limit(30)
    val links = Linkage.linkBestMatch(reg, reg).collect()
    assert(links.nonEmpty)
    links.foreach { r =>
      assert(r.getAs[Long]("left_id") == r.getAs[Long]("right_id"),
        s"best self-match must be the identical row: $r")
      assert(r.getAs[Long]("jaccard_ppm") == 1000000L)
      assert(r.getAs[Long]("inter") == r.getAs[Long]("uni"))
    }
  }

  test("emitted score matches an independent array_intersect recount") {
    val left = docs.filter(length(col("source")) === 4)
    val right = docs.filter(length(col("source")) === 5)
    val links = Linkage.linkBestMatch(left, right).collect()
    assert(links.nonEmpty)
    def hashSet(id: Long) = docs.filter(col("doc_id") === id)
      .select(graft.dedup.Dedup.shingleHashesBuiltin(col("text"), 3))
      .collect().head.getSeq[Long](0).toSet
    links.take(3).foreach { r =>
      val a = hashSet(r.getAs[Long]("left_id"))
      val b = hashSet(r.getAs[Long]("right_id"))
      val inter = (a & b).size.toLong
      val uni = (a | b).size.toLong
      assert(r.getAs[Long]("inter") == inter)
      assert(r.getAs[Long]("uni") == uni)
      assert(r.getAs[Long]("jaccard_ppm") == inter * 1000000L / uni)
    }
  }

  test("df cap bounds candidate generation: a common shingle never blocks") {
    import spark.implicits._
    // 8 left rows sharing one ubiquitous shingle; df cap 5 excludes it,
    // so no candidates and no links — deterministic, not probabilistic
    val l = (0 until 8).map(i => (i.toLong, "alpha beta gamma"))
      .toDF("doc_id", "text")
    val rgt = (100 until 108).map(i => (i.toLong, "alpha beta gamma"))
      .toDF("doc_id", "text")
    assert(Linkage.linkBestMatch(l, rgt, maxDf = 5).count() == 0)
    // raising the cap re-admits the shingle: perfect matches appear
    assert(Linkage.linkBestMatch(l, rgt, maxDf = 8).count() == 8)
  }
}
