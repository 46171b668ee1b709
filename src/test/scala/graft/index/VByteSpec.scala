package graft.index

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck round-trips for the compression layer (SURVEY.md §5:
  * "forAll docIdSeq: decode(encode) == id"). Generators are driven
  * with fixed seeds (no scalatestplus bridge in the offline cache). */
class VByteSpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int = 200): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("vbyte round-trip: arbitrary non-negative longs") {
    samples(Gen.listOf(Gen.chooseNum(0L, Long.MaxValue))).foreach { xs =>
      val a = xs.toArray
      assert(VByte.decode(VByte.encode(a)).sameElements(a), a.mkString(","))
    }
  }

  test("vbyte round-trip: ints") {
    samples(Gen.listOf(Gen.chooseNum(0, Int.MaxValue))).foreach { xs =>
      val a = xs.toArray
      assert(VByte.decodeInts(VByte.encodeInts(a)).sameElements(a))
    }
  }

  test("delta round-trip: strictly ascending docId sequences") {
    val ascending = Gen.listOf(Gen.chooseNum(1L, 1000000L)).map { xs =>
      xs.scanLeft(0L)(_ + _).tail.toArray // strictly ascending
    }
    samples(ascending).foreach { ids =>
      assert(VByte.undeltas(VByte.deltas(ids)).sameElements(ids))
      assert(VByte.decode(VByte.encode(VByte.deltas(ids))).sameElements(VByte.deltas(ids)))
    }
  }

  test("encoding boundary values") {
    val vals = Array(0L, 127L, 128L, 16383L, 16384L, Long.MaxValue)
    assert(VByte.decode(VByte.encode(vals)).sameElements(vals))
    assert(VByte.sizeOf(0) == 1 && VByte.sizeOf(127) == 1 && VByte.sizeOf(128) == 2)
  }

  test("rejects negative values and truncated streams") {
    intercept[IllegalArgumentException](VByte.encode(Array(-1L)))
    intercept[IllegalArgumentException](VByte.decode(Array(0x01.toByte))) // no terminator
  }
}
