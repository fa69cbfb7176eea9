package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.PropHelper.forAllSeeded
import graft.index.Codec

/** Codec properties (FIXTURES.md §8): decode ∘ encode = id. */
class CodecSpec extends AnyFunSuite {

  test("property: VByte roundtrip on non-negative longs") {
    val gen = Gen.listOf(Gen.chooseNum(0L, Long.MaxValue))
    forAllSeeded(gen) { xs =>
      val a = xs.toArray
      assert(Codec.decodeVByte(Codec.encodeVByte(a), a.length).toSeq == a.toSeq)
    }
  }

  test("property: delta-gap docId roundtrip on sorted distinct longs") {
    val gen = Gen.listOf(Gen.chooseNum(0L, Long.MaxValue / 2))
      .map(_.distinct.sorted)
    forAllSeeded(gen) { xs =>
      if (xs.nonEmpty) {
        val a = xs.toArray
        val enc = Codec.encodeDocIds(a, a(0))
        assert(Codec.decodeDocIds(enc, a.length, a(0)).toSeq == a.toSeq)
      }
    }
  }

  test("delta-gap roundtrip within a negative (high) docId bucket") {
    // docIds sharing top bits (bucket 31): signed-negative, ascending
    val base = 31L << 59
    val ids = Array(base + 5, base + 17, base + 18, base + 900001L)
    assert(ids.forall(_ < 0)) // top bit set
    val enc = Codec.encodeDocIds(ids, ids(0))
    assert(Codec.decodeDocIds(enc, ids.length, ids(0)).toSeq == ids.toSeq)
  }

  test("property: int roundtrip") {
    forAllSeeded(Gen.listOf(Gen.chooseNum(0, Int.MaxValue))) { xs =>
      val a = xs.toArray
      assert(Codec.decodeInts(Codec.encodeInts(a), a.length).toSeq == a.toSeq)
    }
  }

  test("compression is compact: small gaps take 1 byte") {
    val ids = Array.tabulate(128)(i => 1000L + i)
    val enc = Codec.encodeDocIds(ids, ids(0))
    assert(enc.length == 128) // every gap ∈ {0,1} → 1 byte each
  }

  test("encode rejects descending input") {
    intercept[IllegalArgumentException] {
      Codec.encodeDocIds(Array(5L, 3L), 5L)
    }
  }
}
