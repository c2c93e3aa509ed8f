package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.codec.{DeltaOfDelta, Gorilla}
import graft.gen.SplitMix64

/** Codec laws: encode . decode == id for arbitrary doubles (incl. NaN,
  * +/-0, infinities, denormals) and arbitrary timestamp walks —
  * seeded-fuzz property loops (200 cases each). */
class CodecSpec extends AnyFunSuite {

  private def bitsEqual(a: Array[Double], b: Array[Double]): Boolean =
    a.length == b.length && a.indices.forall(i =>
      java.lang.Double.doubleToRawLongBits(a(i)) ==
        java.lang.Double.doubleToRawLongBits(b(i)))

  val specials = Seq(Double.NaN, 0.0, -0.0, Double.PositiveInfinity,
    Double.NegativeInfinity, Double.MinPositiveValue, -Double.MinPositiveValue,
    Double.MaxValue, Double.MinValue, 1.0, -1.0)

  test("gorilla roundtrip: special values") {
    val arr = specials.toArray
    assert(bitsEqual(Gorilla.decode(Gorilla.encode(arr)), arr))
  }

  test("gorilla roundtrip: empty / single / constant") {
    for (arr <- Seq(Array.empty[Double], Array(3.14), Array.fill(100)(42.0)))
      assert(bitsEqual(Gorilla.decode(Gorilla.encode(arr)), arr))
  }

  test("gorilla roundtrip: property (seeded fuzz)") {
    val rng = new SplitMix64(99L)
    for (_ <- 0 until 200) {
      val n = rng.nextInt(300)
      val arr = Array.fill(n) {
        rng.nextInt(4) match {
          case 0 => (rng.nextDouble() * 2 - 1) * 1e12
          case 1 => rng.nextDouble() * 2 - 1
          case 2 => specials(rng.nextInt(specials.length))
          case _ => java.lang.Double.longBitsToDouble(rng.nextLong())
        }
      }
      assert(bitsEqual(Gorilla.decode(Gorilla.encode(arr)), arr))
    }
  }

  test("gorilla compresses a smooth series") {
    val arr = Array.tabulate(1000)(i => 100.0 + (i % 7))
    val enc = Gorilla.encode(arr)
    assert(enc.length < arr.length * 8 / 2, s"ratio ${enc.length} vs ${arr.length * 8}")
  }

  test("dod roundtrip: regular + gappy + adversarial walks") {
    val regular = Array.tabulate(500)(i => 1704067200L + 60L * i)
    val gappy = regular.zipWithIndex.collect { case (t, i) if i % 7 != 0 => t }
    val adversarial = Array(0L, Long.MaxValue / 2, 3L, -5L, 1L << 40, 42L)
    for (ts <- Seq(regular, gappy, adversarial, Array.empty[Long], Array(7L)))
      assert(DeltaOfDelta.decode(DeltaOfDelta.encode(ts)).sameElements(ts))
  }

  test("dod roundtrip: property (seeded fuzz)") {
    val rng = new SplitMix64(7L)
    for (_ <- 0 until 200) {
      val n = rng.nextInt(300)
      val arr = Array.fill(n)(rng.nextLong() >> rng.nextInt(16))
      assert(DeltaOfDelta.decode(DeltaOfDelta.encode(arr)).sameElements(arr))
    }
  }

  test("dod compresses a regular minute grid to ~1 bit/point") {
    val ts = Array.tabulate(10000)(i => 1704067200L + 60L * i)
    val enc = DeltaOfDelta.encode(ts)
    assert(enc.length < 10000 / 4, s"${enc.length} bytes for 10k points")
  }
}
