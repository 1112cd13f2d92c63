package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Golden values transcribed from the reference's own tests & docs:
  *   /root/reference/test/sql/lindel.test (scalar + 5x5 grids)
  *   /root/reference/docs/README.md:115-288 (float/double/string/signed)
  * Every value here is reference output, bit-for-bit.
  */
class SFCGoldenSpec extends AnyFunSuite {
  import SFC._

  private def enc(curve: String, bits: Int, xs: Long*): BigInt =
    encodeBigInt(curve, xs.map(mask(_, bits)).toArray, bits)

  test("hilbert_encode([1,2,3] u8) == 22 (lindel.test:15-18)") {
    assert(enc("hilbert", 8, 1, 2, 3) == BigInt(22))
  }

  test("morton_encode([1,2,3] u8) == 29 (lindel.test:20-23)") {
    assert(enc("morton", 8, 1, 2, 3) == BigInt(29))
  }

  test("hilbert_decode(22, 3) == [1,2,3] (lindel.test:25-28)") {
    assert(decodeLongs("hilbert", BigInt(22), 8, 3).toSeq == Seq(1L, 2L, 3L))
  }

  test("hilbert_encode([1,2] u8) == 7 (docs/README.md:241-247)") {
    assert(enc("hilbert", 8, 1, 2) == BigInt(7))
    assert(decodeLongs("hilbert", BigInt(7), 8, 2).toSeq == Seq(1L, 2L))
  }

  // 5x5 grid goldens, lindel.test:30-68 (tinyint[2]) and :73-111 (int[2]).
  // Rows: (a, b, hilbert, morton); decode round-trips asserted too.
  private val grid = Seq(
    (0, 0, 0, 0), (0, 1, 3, 1), (0, 2, 4, 4), (0, 3, 5, 5), (0, 4, 58, 16),
    (1, 0, 1, 2), (1, 1, 2, 3), (1, 2, 7, 6), (1, 3, 6, 7), (1, 4, 57, 18),
    (2, 0, 14, 8), (2, 1, 13, 9), (2, 2, 8, 12), (2, 3, 9, 13), (2, 4, 54, 24),
    (3, 0, 15, 10), (3, 1, 12, 11), (3, 2, 11, 14), (3, 3, 10, 15), (3, 4, 53, 26),
    (4, 0, 16, 32), (4, 1, 17, 33), (4, 2, 30, 36), (4, 3, 31, 37), (4, 4, 32, 48))

  test("5x5 grid, tinyint[2] (lindel.test:30-68)") {
    for ((a, b, h, m) <- grid) {
      assert(enc("hilbert", 8, a, b) == BigInt(h), s"hilbert($a,$b)")
      assert(enc("morton", 8, a, b) == BigInt(m), s"morton($a,$b)")
      assert(decodeLongs("hilbert", BigInt(h), 8, 2).toSeq == Seq(a.toLong, b.toLong))
      assert(decodeLongs("morton", BigInt(m), 8, 2).toSeq == Seq(a.toLong, b.toLong))
    }
  }

  test("5x5 grid, int[2] (lindel.test:73-111) — same values at 32-bit width") {
    for ((a, b, h, m) <- grid) {
      assert(enc("hilbert", 32, a, b) == BigInt(h), s"hilbert32($a,$b)")
      assert(enc("morton", 32, a, b) == BigInt(m), s"morton32($a,$b)")
      assert(decodeLongs("hilbert", BigInt(h), 32, 2).toSeq == Seq(a.toLong, b.toLong))
      assert(decodeLongs("morton", BigInt(m), 32, 2).toSeq == Seq(a.toLong, b.toLong))
    }
  }

  test("hilbert_encode([37.8, .2] f32) == 2303654869236839926 (docs/README.md:173-179)") {
    val xs = Array(37.8f, 0.2f).map(f => java.lang.Float.floatToRawIntBits(f).toLong & 0xffffffffL)
    assert(encodeBigInt("hilbert", xs, 32) == BigInt("2303654869236839926"))
  }

  test("hilbert_encode([37.8, .2] f64) == u128 golden (docs/README.md:184-190)") {
    val xs = Array(37.8d, 0.2d).map(java.lang.Double.doubleToRawLongBits)
    assert(encodeBigInt("hilbert", xs, 64) == BigInt("42534209309512799991913666633619307890"))
  }

  test("hilbert_encode([1.0, 5.0, 6.0] f32) == u128 golden (docs/README.md:193-199)") {
    val xs = Array(1.0f, 5.0f, 6.0f).map(f => java.lang.Float.floatToRawIntBits(f).toLong & 0xffffffffL)
    assert(encodeBigInt("hilbert", xs, 32) == BigInt("8002395622101954260073409974"))
    // round-trip (docs/README.md:281-287)
    val out = decodeLongs("hilbert", BigInt("8002395622101954260073409974"), 32, 3)
    assert(out.map(v => java.lang.Float.intBitsToFloat(v.toInt)).toSeq == Seq(1.0f, 5.0f, 6.0f))
  }

  test("hilbert_encode('abcd' as u8[4]) == 178258816 (docs/README.md:206-212)") {
    val xs = "abcd".map(_.toLong).toArray
    assert(encodeBigInt("hilbert", xs, 8) == BigInt("178258816"))
  }

  test("signed round-trip [1,-2] i64 (docs/README.md:264-271)") {
    val xs = Array(1L, -2L) // two's-complement bit pattern, bits=64: identity
    val key = encodeBigInt("hilbert", xs, 64)
    val out = decodeLongs("hilbert", key, 64, 2)
    assert(out.toSeq == Seq(1L, -2L))
  }

  test("output width ladder matches reference bind tables") {
    assert(outputBits(8, 1) == 8); assert(outputBits(8, 2) == 16)
    assert(outputBits(8, 3) == 32); assert(outputBits(8, 4) == 32)
    assert(outputBits(8, 5) == 64); assert(outputBits(8, 16) == 128)
    assert(outputBits(16, 2) == 32); assert(outputBits(16, 5) == 128)
    assert(outputBits(32, 2) == 64); assert(outputBits(32, 3) == 128)
    assert(outputBits(64, 1) == 64); assert(outputBits(64, 2) == 128)
  }

  test("decode element width matches reference DECODE_TYPE_MAPPINGS") {
    assert(decodeElemBits(16, 2) == 8)
    assert(decodeElemBits(32, 2) == 16); assert(decodeElemBits(32, 3) == 8)
    assert(decodeElemBits(64, 2) == 32); assert(decodeElemBits(64, 4) == 16)
    assert(decodeElemBits(64, 8) == 8)
    assert(decodeElemBits(128, 2) == 64); assert(decodeElemBits(128, 4) == 32)
    assert(decodeElemBits(128, 16) == 8)
  }

  test("U128 byte round-trip and decimal string") {
    val v = U128(0x0123456789abcdefL, 0xfedcba9876543210L)
    assert(U128.fromBytesBE(v.toBytesBE) == v)
    assert(U128.fromBigInt(v.toBigInt) == v)
    assert(U128(0, 255).toDecimalString == "255")
    assert(U128(-1L, -1L).toBigInt == (BigInt(1) << 128) - 1)
  }
}
