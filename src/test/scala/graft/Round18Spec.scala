package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-18 pins:
  *  - the perceptual near-dup eval contract (r17 judge item 5): both
  *    tiers catch their planted positive (recall 1.0) and reject every
  *    planted negative (fp 0) at their shipping thresholds, measured
  *    in full organic company;
  *  - Scratch.sweepStale's pid-reuse rule (r17 ADVICE): a live process
  *    that predates its root is never swept, however old the root is.
  */
class Round18Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("mm_neardup_eval: both mediums catch the planted positive and " +
      "reject every planted negative at the shipping thresholds") {
    val r = SparkEntry.queries("mm_neardup_eval")(
        spark, "/root/testdata/sf0.001")
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r.keySet == Set("audio", "image"), "expected one row per medium")
    for ((m, row) <- r) {
      assert(row.getLong(3) == 1, s"$m: tp != 1 (planted positive missed)")
      assert(row.getLong(4) == 0, s"$m: fp != 0 (planted negative accepted)")
      assert(row.getLong(5) == 0, s"$m: fn != 0")
      assert(row.getDouble(7) == 1.0, s"$m: precision != 1.0")
      assert(row.getDouble(8) == 1.0, s"$m: recall != 1.0")
    }
  }

  test("sweepStale never deletes a live run root older than a day " +
      "(pid-reuse detection replaced the age backstop)") {
    // this JVM's own Scratch root, backdated past the old 24h cutoff:
    // the owning pid (us) is alive and STARTED BEFORE the backdated
    // mtime, so the sweep must leave it alone — under the pre-r18 age
    // backstop this exact shape was deleted mid-run
    val root = Scratch.root
    val f = root.toFile
    val old = System.currentTimeMillis() - 3 * 86400000L
    assert(f.setLastModified(old), "could not backdate the root mtime")
    try {
      Scratch.sweepStale()
      assert(f.exists(),
        "sweepStale deleted the LIVE process's scratch root (the r17 " +
          "ADVICE failure: age backstop firing on a long-lived run)")
    } finally { f.setLastModified(System.currentTimeMillis()) }
  }
}
