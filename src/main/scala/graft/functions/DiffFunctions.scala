package graft.functions

import graft.model.Delta
import scala.collection.mutable.ArrayBuffer

/** Myers O(ND) diff producing typed INSERT/DELETE/CHANGE deltas, the
  * behavioral spec being the reference's difflib usage
  * (io/WikiRevisionDiffInputFormat.java:139-154, io/RevisionDiff.java:52-69,
  * test/TestDiffPatch.java:16-76). Pure Scala — no third-party diff lib.
  */
object DiffFunctions {

  /** Longest-common-subsequence-based edit script between two token lists.
    * Contiguous runs of deletes+inserts at the same position merge into a
    * CHANGE delta, mirroring difflib's chunk semantics. */
  def diff(orig: Seq[String], rev: Seq[String]): Seq[Delta] = {
    val a = if (orig == null) IndexedSeq.empty[String] else orig.toIndexedSeq
    val b = if (rev == null) IndexedSeq.empty[String] else rev.toIndexedSeq
    val n = a.length; val m = b.length
    // DP LCS table; fine for revision-sized paragraph/word lists. For very
    // long inputs callers should diff at paragraph granularity first (as the
    // reference does via extractParagraph).
    val dp = Array.ofDim[Int](n + 1, m + 1)
    var i = n - 1
    while (i >= 0) {
      var j = m - 1
      while (j >= 0) {
        dp(i)(j) =
          if (a(i) == b(j)) dp(i + 1)(j + 1) + 1
          else math.max(dp(i + 1)(j), dp(i)(j + 1))
        j -= 1
      }
      i -= 1
    }
    val out = ArrayBuffer.empty[Delta]
    var x = 0; var y = 0
    val delBuf = ArrayBuffer.empty[String]
    val insBuf = ArrayBuffer.empty[String]
    var chunkX = 0; var chunkY = 0
    def flush(): Unit = {
      if (delBuf.nonEmpty || insBuf.nonEmpty) {
        val op =
          if (delBuf.nonEmpty && insBuf.nonEmpty) "CHANGE"
          else if (delBuf.nonEmpty) "DELETE"
          else "INSERT"
        out += Delta(op, chunkX, chunkY, delBuf.toSeq, insBuf.toSeq)
        delBuf.clear(); insBuf.clear()
      }
    }
    while (x < n || y < m) {
      if (x < n && y < m && a(x) == b(y)) {
        flush(); x += 1; y += 1
      } else {
        if (delBuf.isEmpty && insBuf.isEmpty) { chunkX = x; chunkY = y }
        if (y >= m || (x < n && dp(x + 1)(y) >= dp(x)(y + 1))) {
          delBuf += a(x); x += 1
        } else {
          insBuf += b(y); y += 1
        }
      }
    }
    flush()
    out.toSeq
  }

  /** Words present in `rev` but not in `orig` (multiset difference) — the
    * "patch words" of the BOW/concat extractors
    * (RevisionBOWInputFormat.java:162-187, RevisionConcatInputFormat.java). */
  def addedWords(orig: Seq[String], rev: Seq[String]): Seq[String] = {
    val counts = scala.collection.mutable.HashMap.empty[String, Int]
    if (orig != null) orig.foreach(w => counts.update(w, counts.getOrElse(w, 0) + 1))
    val out = ArrayBuffer.empty[String]
    if (rev != null) rev.foreach { w =>
      val c = counts.getOrElse(w, 0)
      if (c > 0) counts.update(w, c - 1) else out += w
    }
    out.toSeq
  }
}
