package graft.core

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Proves the structural property [[CurveRanges]] rests on (aligned
  * cells occupy aligned contiguous index blocks — for BOTH curves),
  * then the decomposition's contracts: exact coverage with a generous
  * budget, strict over-approximation under coarsening, determinism.
  * Exhaustive at small bits; no Spark session needed. */
class CurveRangesSpec extends AnyFunSuite {

  private def image(hilbert: Boolean, lo: Array[Long], hi: Array[Long],
      bits: Int): Set[Long] = {
    val n = lo.length
    def rec(d: Int, pt: Array[Long], acc: scala.collection.mutable.Set[Long]): Unit =
      if (d == n) {
        val k = if (hilbert) SFC.hilbertEncode(pt, bits) else SFC.mortonEncode(pt, bits)
        acc += k.lo
      } else {
        var v = lo(d)
        while (v <= hi(d)) { pt(d) = v; rec(d + 1, pt, acc); v += 1 }
      }
    val acc = scala.collection.mutable.Set.empty[Long]
    rec(0, new Array[Long](lo.length), acc)
    acc.toSet
  }

  private def rangeSet(rs: Seq[(Long, Long)]): Set[Long] =
    rs.flatMap { case (a, b) => a to b }.toSet

  test("aligned cells map to aligned contiguous index blocks — both curves, exhaustive") {
    for (hilbert <- Seq(true, false); (bits, n) <- Seq((3, 2), (4, 2), (2, 3))) {
      for (level <- 0 to bits) {
        val side = 1L << (bits - level)
        val cellsPerDim = 1L << level
        val blockBits = n * (bits - level)
        def cells(d: Int, origin: Array[Long]): Unit =
          if (d == n) {
            val img = image(hilbert, origin, origin.map(_ + side - 1), bits)
            val mn = img.min
            assert(img.size == (1L << blockBits),
              s"hilbert=$hilbert bits=$bits n=$n level=$level origin=${origin.toSeq}")
            assert(img.max == mn + (1L << blockBits) - 1, "contiguous")
            assert(mn % (1L << blockBits) == 0, "aligned")
          } else {
            var c = 0L
            while (c < cellsPerDim) {
              cells(d + 1, origin :+ (c * side))
              c += 1
            }
          }
        cells(0, Array.empty[Long])
      }
    }
  }

  test("generous budget: ranges cover EXACTLY the box's index image — both curves") {
    val rnd = new Random(7)
    for (hilbert <- Seq(true, false); bits <- Seq(4, 5); _ <- 1 to 40) {
      val max = (1L << bits) - 1
      val lo = Array.fill(2)(rnd.nextLong(max + 1))
      val hi = lo.map(v => v + rnd.nextLong(max - v + 1))
      val rs = CurveRanges.ranges(hilbert, lo, hi, bits,
        maxRanges = Int.MaxValue, maxExpand = Int.MaxValue)
      assert(rangeSet(rs) == image(hilbert, lo, hi, bits),
        s"hilbert=$hilbert bits=$bits lo=${lo.toSeq} hi=${hi.toSeq}")
      // merged: ranges are sorted, disjoint, non-adjacent
      rs.sliding(2).foreach {
        case Seq((_, b1), (a2, _)) => assert(a2 > b1 + 1)
        case _                     =>
      }
    }
  }

  test("coarsening and budget exhaustion only ever WIDEN coverage; count respects maxRanges") {
    val rnd = new Random(11)
    for (hilbert <- Seq(true, false); _ <- 1 to 25) {
      val bits = 6
      val max = (1L << bits) - 1
      val lo = Array.fill(2)(rnd.nextLong(max + 1))
      val hi = lo.map(v => v + rnd.nextLong(max - v + 1))
      val exact = image(hilbert, lo, hi, bits)
      for ((mr, me) <- Seq((4, Int.MaxValue), (8, 6), (1, 0))) {
        val rs = CurveRanges.ranges(hilbert, lo, hi, bits, maxRanges = mr, maxExpand = me)
        assert(rs.size <= mr)
        assert(exact.subsetOf(rangeSet(rs)),
          s"hilbert=$hilbert maxRanges=$mr maxExpand=$me lo=${lo.toSeq} hi=${hi.toSeq}")
      }
    }
  }

  test("deterministic: same box, same ranges") {
    val lo = Array(100L, 10L)
    val hi = Array(349L, 39L)
    val a = CurveRanges.ranges(hilbert = true, lo, hi, 32, maxRanges = 64)
    val b = CurveRanges.ranges(hilbert = true, lo, hi, 32, maxRanges = 64)
    assert(a == b && a.nonEmpty && a.size <= 64)
    // and the ranges live in the sane corner of the 2^64 key space:
    // every key's decode lands inside the (widened) bounding interval
    assert(java.lang.Long.compareUnsigned(a.head._1, a.last._2) <= 0)
  }

  test("1-D curves are the identity, so a 1-D box is its own single range — incl. bits=64") {
    // identity exhaustively at small bits, spot values at full width
    for (bits <- Seq(3, 8); v <- 0L until (1L << bits)) {
      assert(SFC.hilbertEncode(Array(v), bits).lo == v)
      assert(SFC.mortonEncode(Array(v), bits).lo == v)
    }
    for (v <- Seq(0L, 1L, 1L << 40, Long.MaxValue, Long.MinValue, -1L)) {
      assert(SFC.hilbertEncode(Array(v), 64).lo == v)
      assert(SFC.mortonEncode(Array(v), 64).lo == v)
    }
    assert(CurveRanges.ranges(hilbert = true, Array(5L), Array(9L), 8) == Seq((5L, 9L)))
    // bits=64 (legal per n*bits <= 64 with n=1): previously rejected by
    // an overflowed max; u64 semantics, -1L = 2^64-1
    assert(CurveRanges.ranges(hilbert = false, Array(0L), Array(-1L), 64) == Seq((0L, -1L)))
    assert(CurveRanges.ranges(hilbert = true,
      Array(Long.MaxValue), Array(Long.MinValue), 64) == Seq((Long.MaxValue, Long.MinValue)))
    intercept[IllegalArgumentException] {
      CurveRanges.ranges(hilbert = true, Array(9L), Array(5L), 8)
    }
    intercept[IllegalArgumentException] {
      CurveRanges.ranges(hilbert = true, Array(0L), Array(256L), 8)
    }
  }

  test("full-grid box at n*bits == 64 returns the whole key line without overflow") {
    val rs = CurveRanges.ranges(hilbert = true,
      Array(0L, 0L), Array((1L << 32) - 1, (1L << 32) - 1), 32, maxRanges = 8)
    assert(rs == Seq((0L, -1L))) // [0, 2^64-1] in u64-as-signed-bits
  }
}
