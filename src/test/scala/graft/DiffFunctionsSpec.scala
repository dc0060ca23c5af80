package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.DiffFunctions
import graft.model.Delta

/** F16 spec — expected deltas mirror the reference's difflib behavior on
  * the TestDiffPatch fixtures (java/test/other/TestDiffPatch.java:16-76). */
class DiffFunctionsSpec extends AnyFunSuite {

  private val A = "The quick brown fox jumps over the lazy dog"
  private val B = "This sentence stays the same"
  private val C = "But this will be removed."
  private val D = "This will be the same."
  private val X = "And this has been added."
  private val Y = "That quick brown fox jumped over a lazy dog."
  private val Z = "And this has been newly added."

  test("sentence-level diff produces the reference's two CHANGE deltas") {
    val deltas = DiffFunctions.diff(Seq(A, B, C, D), Seq(X, Y, B, Z, D))
    assert(deltas.length == 2)
    assert(deltas(0) == Delta("CHANGE", 0, 0, Seq(A), Seq(X, Y)))
    assert(deltas(1) == Delta("CHANGE", 2, 3, Seq(C), Seq(Z)))
  }

  test("whole-insert from empty original is a single INSERT") {
    val rev = Seq("a", "b", "c")
    val deltas = DiffFunctions.diff(Seq.empty, rev)
    assert(deltas == Seq(Delta("INSERT", 0, 0, Seq.empty, rev)))
  }

  test("whole-delete to empty revision is a single DELETE") {
    val orig = Seq("a", "b")
    assert(DiffFunctions.diff(orig, Seq.empty) ==
      Seq(Delta("DELETE", 0, 0, orig, Seq.empty)))
  }

  test("identical inputs produce no deltas") {
    assert(DiffFunctions.diff(Seq("x", "y"), Seq("x", "y")).isEmpty)
    assert(DiffFunctions.diff(Seq.empty, Seq.empty).isEmpty)
  }

  test("pure insertion in the middle") {
    val deltas = DiffFunctions.diff(Seq("a", "d"), Seq("a", "b", "c", "d"))
    assert(deltas == Seq(Delta("INSERT", 1, 1, Seq.empty, Seq("b", "c"))))
  }

  test("null inputs treated as empty") {
    assert(DiffFunctions.diff(null, Seq("a")) ==
      Seq(Delta("INSERT", 0, 0, Seq.empty, Seq("a"))))
  }

  test("addedWords is a multiset difference") {
    assert(DiffFunctions.addedWords(Seq("a", "b", "b"), Seq("b", "b", "b", "c")) ==
      Seq("b", "c"))
    assert(DiffFunctions.addedWords(null, Seq("x")) == Seq("x"))
    assert(DiffFunctions.addedWords(Seq("x"), null) == Seq.empty)
  }
}
