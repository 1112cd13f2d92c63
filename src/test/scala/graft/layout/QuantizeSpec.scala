package graft.layout

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** The quantizer's two load-bearing contracts:
  *  1. monotonicity / box containment — v in [a, b] implies cell(v) in
  *     [cell(a), cell(b)] — which is what lets CurveRanges decompose a
  *     VALUE box by quantizing its corners;
  *  2. bit-identical agreement between the executor expression
  *     ([[Quantize.grid]]) and the driver mirror ([[Quantize.cell]]),
  *     so the ranges built from query corners match the stored cells.
  */
class QuantizeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-quantize-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("monotone + box containment over random domains, bits, and boxes") {
    val rnd = new Random(13)
    for (_ <- 1 to 300) {
      val lo = rnd.nextDouble() * 2000 - 1000
      val hi = lo + rnd.nextDouble() * 10000 + 1e-6
      val bits = 1 + rnd.nextInt(30)
      // random value box inside (and slightly outside) the domain
      val a = lo + (rnd.nextDouble() * 1.2 - 0.1) * (hi - lo)
      val b = a + rnd.nextDouble() * (hi - a).max(1e-9)
      val ca = Quantize.cell(a, lo, hi, bits)
      val cb = Quantize.cell(b, lo, hi, bits)
      assert(ca <= cb)
      assert(ca >= 0 && cb <= Quantize.maxCell(bits))
      for (_ <- 1 to 20) {
        val v = a + rnd.nextDouble() * (b - a)
        val cv = Quantize.cell(v, lo, hi, bits)
        assert(ca <= cv && cv <= cb,
          s"containment broken: cell($v)=$cv outside [cell($a)=$ca, cell($b)=$cb] " +
            s"domain [$lo,$hi] bits=$bits")
      }
    }
    // domain edges and clamping
    assert(Quantize.cell(-1e300, 0.0, 1.0, 8) == 0)
    assert(Quantize.cell(1e300, 0.0, 1.0, 8) == 255)
    assert(Quantize.cell(0.0, 0.0, 1.0, 8) == 0)
    assert(Quantize.cell(1.0, 0.0, 1.0, 8) == 255)
  }

  test("executor expression and driver mirror agree bit-for-bit") {
    import spark.implicits._
    val rnd = new Random(29)
    val (lo, hi, bits) = (900.0, 105000.0, 16)
    val vals = Seq(lo, hi, (lo + hi) / 2, lo - 50.0, hi + 50.0) ++
      Seq.fill(2000)(lo + rnd.nextDouble() * (hi - lo) * 1.1 - 0.05 * (hi - lo))
    val got = vals.toDF("v")
      .select(col("v"), Quantize.grid(col("v"), lo, hi, bits).as("c"))
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    vals.foreach { v =>
      assert(got(v) == Quantize.cell(v, lo, hi, bits), s"v=$v")
    }
  }

  test("quantized hilbert-indexed layout answers a double box exactly (end-to-end)") {
    import spark.implicits._
    val rnd = new Random(41)
    val rows = (0 until 4000).map(i => (i.toLong, rnd.nextDouble() * 1000, rnd.nextDouble() * 50))
    val df = rows.toDF("id", "price", "qty")
    val base = System.getProperty("java.io.tmpdir") + "/graft_quantize_spec"
    val bits = 12
    Layout.writeHilbertIndexedCells(df,
      Seq(Quantize.grid(col("price"), 0.0, 1000.0, bits).cast("int"),
        Quantize.grid(col("qty"), 0.0, 50.0, bits).cast("int")),
      s"$base/idx", "hk", rowGroupBytes = 16 * 1024)
    val rs = graft.core.CurveRanges.ranges(hilbert = true,
      Array(Quantize.cell(200.0, 0.0, 1000.0, bits), Quantize.cell(10.0, 0.0, 50.0, bits)),
      Array(Quantize.cell(400.0, 0.0, 1000.0, bits), Quantize.cell(20.0, 0.0, 50.0, bits)),
      bits = 32, maxRanges = 16)
    val got = spark.read.parquet(s"$base/idx")
      .filter(Layout.curveRangePredicate(col("hk"), rs) &&
        col("price").between(200.0, 400.0) && col("qty").between(10.0, 20.0))
      .select("id").as[Long].collect().toSet
    val want = rows.collect {
      case (id, p, q) if p >= 200.0 && p <= 400.0 && q >= 10.0 && q <= 20.0 => id
    }.toSet
    assert(got == want && want.nonEmpty)
  }
}
