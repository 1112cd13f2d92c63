package graft.layout

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class LayoutSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-layout-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("hilbert-ordered parquet: row groups skippable for 2-D box, result set intact") {
    import spark.implicits._
    // 256x256 grid in a deterministic scrambled order (hash of the id)
    // — the "natural" layout has no spatial locality at all
    val grid = (0 until 256).flatMap(x => (0 until 256).map(y => (x * 256 + y, x, y)))
      .toDF("id", "x", "y")
      .orderBy(md5(col("id").cast("string")))
    val base = System.getProperty("java.io.tmpdir") + "/graft_layout_spec"
    Layout.writeHilbertOrdered(grid, Seq("x", "y"), s"$base/hilbert", rowGroupBytes = 16 * 1024)
    Layout.writeNaturalOrder(grid, s"$base/natural", rowGroupBytes = 16 * 1024)

    val (totH, skipH) = Layout.countSkippable(s"$base/hilbert", "x", 32, 47, "y", 32, 47)
    val (totN, skipN) = Layout.countSkippable(s"$base/natural", "x", 32, 47, "y", 32, 47)
    assert(totH > 4, s"expected several row groups, got $totH")
    // hilbert clusters the 8x8 box into few groups; scrambled order has
    // full-range stats everywhere
    assert(skipH.toDouble / totH > 0.5, s"hilbert skippable $skipH/$totH")
    assert(skipN == 0, s"scrambled layout should have no skippable groups, got $skipN/$totN")

    // pruning must not change the result set
    val got = spark.read.parquet(s"$base/hilbert")
      .filter(col("x").between(32, 47) && col("y").between(32, 47))
      .select("id").as[Int].collect().sorted
    val want = (32 to 47).flatMap(x => (32 to 47).map(y => x * 256 + y)).sorted
    assert(got.toSeq == want)
  }

  test("morton-ordered parquet: row groups skippable for 2-D box, result set intact") {
    import spark.implicits._
    val grid = (0 until 256).flatMap(x => (0 until 256).map(y => (x * 256 + y, x, y)))
      .toDF("id", "x", "y")
      .orderBy(md5(col("id").cast("string")))
    val base = System.getProperty("java.io.tmpdir") + "/graft_layout_spec_m"
    Layout.writeMortonOrdered(grid, Seq("x", "y"), s"$base/morton", rowGroupBytes = 16 * 1024)

    val (totM, skipM) = Layout.countSkippable(s"$base/morton", "x", 32, 47, "y", 32, 47)
    assert(totM > 4, s"expected several row groups, got $totM")
    // Z-order clusters the box nearly as well as hilbert (one extra
    // seam per quadrant crossing)
    assert(skipM.toDouble / totM > 0.5, s"morton skippable $skipM/$totM")

    val got = spark.read.parquet(s"$base/morton")
      .filter(col("x").between(32, 47) && col("y").between(32, 47))
      .select("id").as[Int].collect().sorted
    val want = (32 to 47).flatMap(x => (32 to 47).map(y => x * 256 + y)).sorted
    assert(got.toSeq == want)
  }

  test("rowGroupRanges reads footer stats") {
    import spark.implicits._
    val df = (0 until 1000).map(i => (i, i * 2)).toDF("a", "b")
    val path = System.getProperty("java.io.tmpdir") + "/graft_layout_spec_stats"
    Layout.writeNaturalOrder(df.coalesce(1), path)
    val ranges = Layout.rowGroupRanges(path, "a")
    assert(ranges.map(_._3).sum == 1000L)
    assert(ranges.map(_._1).min == 0L && ranges.map(_._2).max == 999L)
  }
}
