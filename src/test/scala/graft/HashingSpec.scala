package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Hashing
import graft.EzFunctions

class HashingSpec extends AnyFunSuite {

  test("fnv1a is deterministic and spreads") {
    assert(Hashing.fnv1a("abc") == Hashing.fnv1a("abc"))
    assert(Hashing.fnv1a("abc") != Hashing.fnv1a("abd"))
    assert(Hashing.fnv1a("") == Hashing.FnvOffset)
  }

  test("seeded family decorrelates across seeds") {
    val h1 = Hashing.seeded("x", 1)
    val h2 = Hashing.seeded("x", 2)
    assert(h1 != h2)
    assert(Hashing.seeded("x", 1) == h1)
  }

  test("shingles: empty, short, normal") {
    assert(Hashing.shingles(Seq.empty, 3).isEmpty)
    assert(Hashing.shingles(Seq("a", "b"), 3) == Seq("a b"))
    assert(Hashing.shingles(Seq("a", "b", "c", "d"), 3) ==
      Seq("a b c", "b c d"))
  }

  test("minHash: empty set gives the Long.MaxValue signature") {
    assert(Hashing.minHash(Set.empty, 4).toSeq == Seq.fill(4)(Long.MaxValue))
  }

  test("minHash similarity reflects overlap") {
    val a = Hashing.minHash(Hashing.shingles((1 to 50).map("w" + _), 3).toSet, 64)
    val b = Hashing.minHash(Hashing.shingles((1 to 50).map("w" + _), 3).toSet, 64)
    val c = Hashing.minHash(Hashing.shingles((100 to 150).map("w" + _), 3).toSet, 64)
    assert(a.toSeq == b.toSeq) // identical docs, identical signature
    val agree = a.zip(c).count { case (x, y) => x == y }
    assert(agree < 16) // disjoint docs agree on few components
  }

  test("simHash: identical tokens → hamming 0; disjoint → large hamming") {
    val a = Hashing.simHash((1 to 40).map("t" + _))
    val b = Hashing.simHash((1 to 40).map("t" + _))
    val c = Hashing.simHash((200 to 240).map("t" + _))
    assert(Hashing.hamming(a, b) == 0)
    assert(Hashing.hamming(a, c) > 10)
  }

  test("rollingHash deterministic") {
    assert(Hashing.rollingHash("abc") == ('a' * 31 + 'b') * 31 + 'c')
  }

  test("decodeEz: day segments with hourly runs") {
    // day A(0): hours B=5, C=3 → 8; day C(2): A=1, B=2 → 3
    assert(EzFunctions.decodeEz("AB5C3,CA1B2", 5).toSeq == Seq(8, 0, 3, 0, 0))
    // '_' is day 30
    assert(EzFunctions.decodeEz("_X7", 31).toSeq.last == 7)
    // out-of-range day ignored, empty/null safe
    assert(EzFunctions.decodeEz("_X7", 5).toSeq == Seq(0, 0, 0, 0, 0))
    assert(EzFunctions.decodeEz("", 3).toSeq == Seq(0, 0, 0))
    assert(EzFunctions.decodeEz(null, 3).toSeq == Seq(0, 0, 0))
    // trailing segment without comma is processed (documented divergence)
    assert(EzFunctions.decodeEz("AB5", 2).toSeq == Seq(5, 0))
  }
}
