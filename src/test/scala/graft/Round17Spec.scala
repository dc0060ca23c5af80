package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-17 pins:
  *  - the scratch-hygiene audit widened to temp FILES in main sources
  *    (the s19 split-index row leaked one top-level /tmp xml per run —
  *    the r16 audit only watched directory creation);
  *  - sweepStale's non-numeric-suffix rule (skip, never delete — the
  *    r16 ADVICE: an unparseable pid was classified as "dead").
  */
class Round17Spec extends AnyFunSuite {

  test("no main source file creates temp FILES outside Scratch either " +
      "(the r16 audit only covered directories)") {
    import scala.jdk.CollectionConverters._
    val needle = "createTemp" + "File" // split so this file passes
    val offenders = java.nio.file.Files.walk(
        java.nio.file.Paths.get("src/main"))
      .iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .filter(p => java.nio.file.Files.readString(p).contains(needle))
      .map(_.toString).toSeq
    assert(offenders.isEmpty,
      s"temp files created outside Scratch.dir: $offenders")
  }

  test("sweepStale SKIPS graft-run roots with a non-numeric suffix " +
      "(not ours to judge) and reclaims dead numeric ones") {
    val tmp = java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"))
    val weird = tmp.resolve("graft-run-not-a-pid")
    java.nio.file.Files.createDirectories(weird)
    val dead = tmp.resolve("graft-run-9223372036854775805")
    java.nio.file.Files.createDirectories(dead)
    try {
      Scratch.sweepStale()
      assert(java.nio.file.Files.exists(weird),
        "non-numeric-suffix root deleted — sweep overreached")
      assert(!java.nio.file.Files.exists(dead), "dead-run root not swept")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(weird.toFile)
      org.apache.commons.io.FileUtils.deleteQuietly(dead.toFile)
    }
  }
}
