package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** Round-16 pins: scratch hygiene and kernel robustness.
  *
  * 1. Scratch rooting — every temp dir the engine creates must live
  *    under the per-process `graft-run-<pid>` root so ONE shutdown
  *    hook reclaims it (r15: stale dirs accumulated across runs and
  *    inflated bench wall-clock ~30%; the record was measuring the
  *    filesystem). Enforced two ways: the behavioral check that
  *    Scratch.dir lands under the root, and a SOURCE audit that no
  *    main/operator/test code creates temp directories outside
  *    Scratch itself.
  * 2. sweepStale — reclaims dead-run roots and pre-r16-style loose
  *    dirs, never the persistent caches (graft-sf*, graft-fixtures,
  *    graft-events-us-*) or the live process's own root.
  * 3. aHash64Data on malformed UTF-8 — the inline decoder must not
  *    read past the buffer or mis-route continuation lead bytes
  *    (r15 advice): truncated tails and stray continuations decode
  *    as single bytes instead of throwing.
  */
class Round16Spec extends AnyFunSuite {

  test("Scratch.dir roots every temp dir under the per-process root") {
    val d = Scratch.dir("spec")
    assert(d.startsWith(Scratch.root), s"$d not under ${Scratch.root}")
    assert(Scratch.root.getFileName.toString ==
      s"graft-run-${ProcessHandle.current().pid()}")
  }

  test("no source file creates temp dirs outside Scratch (the r16 " +
      "hygiene invariant stays true by construction)") {
    import scala.jdk.CollectionConverters._
    val needle = "createTemp" + "Directory" // split so this file passes
    val offenders = java.nio.file.Files.walk(java.nio.file.Paths.get("src"))
      .iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .filterNot(_.toString.endsWith("Scratch.scala"))
      .filter(p => java.nio.file.Files.readString(p).contains(needle))
      .map(_.toString).toSeq
    assert(offenders.isEmpty,
      s"temp dirs created outside Scratch.dir: $offenders")
  }

  test("sweepStale reclaims dead-run roots and stale loose dirs, " +
      "spares caches and the live root") {
    val tmp = java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"))
    // a "dead run" root: no live pid is ever Long.MaxValue-ish
    val dead = tmp.resolve("graft-run-9223372036854775806")
    java.nio.file.Files.createDirectories(dead)
    // a pre-r16-style loose dir, mtime older than this JVM
    val loose = tmp.resolve("graft_spec_stale")
    java.nio.file.Files.createDirectories(loose)
    loose.toFile.setLastModified(System.currentTimeMillis() - 86400000L)
    // a persistent cache sibling (same age) that must survive
    val cache = tmp.resolve("graft-sfspec")
    java.nio.file.Files.createDirectories(cache)
    cache.toFile.setLastModified(System.currentTimeMillis() - 86400000L)
    val live = Scratch.root // materialize before sweeping
    try {
      Scratch.sweepStale()
      assert(!java.nio.file.Files.exists(dead), "dead-run root not swept")
      assert(!java.nio.file.Files.exists(loose), "stale loose dir not swept")
      assert(java.nio.file.Files.exists(cache), "persistent cache swept!")
      assert(java.nio.file.Files.exists(live), "live process root swept!")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(cache.toFile)
      org.apache.commons.io.FileUtils.deleteQuietly(dead.toFile)
      org.apache.commons.io.FileUtils.deleteQuietly(loose.toFile)
    }
  }

  test("aHash64Data survives malformed UTF-8 (truncated tails, stray " +
      "continuation leads) without reading past the buffer") {
    // valid input: guard must not change behavior
    val ok = plans.HashKernels.aHash64Data(
      UTF8String.fromString("hello wörld 世界"))
    assert(ok.getLong(0) == 14L) // numChars
    // truncated 2-/3-/4-byte sequences at the buffer end, and a
    // stray continuation byte mid-stream: must decode, not throw
    val cases = Seq(
      Array(0xc3.toByte),                            // truncated 2-byte
      Array(0xe4.toByte, 0xb8.toByte),               // truncated 3-byte
      Array(0xf0.toByte, 0x9f.toByte, 0x98.toByte),  // truncated 4-byte
      Array(0x61.toByte, 0x80.toByte, 0x62.toByte),  // stray continuation
      Array(0xff.toByte, 0x61.toByte))               // invalid lead
    cases.foreach { bs =>
      val r = plans.HashKernels.aHash64Data(UTF8String.fromBytes(bs))
      assert(r != null) // reached: no ArrayIndexOutOfBoundsException
    }
  }
}
