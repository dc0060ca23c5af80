package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.jobs._
import graft.sources.WikiFixtures

class JobsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("Json2Anchor writes link rows from revisions JSON") {
    val in = WikiFixtures.materialize("job_revs.json",
      """{"page_id":1,"page_title":"T","page_namespace":0,"rev_id":5,"parent_id":4,"timestamp":100,"user":"u","user_id":3,"comment":"c","text":"see [[A|b]] and [[C]]"}
        |""".stripMargin)
    val out = graft.Scratch.dir("j2a").toString + "/out"
    Json2Anchor.run(spark, in, out)
    val rows = spark.read.option("sep", "\t").csv(out)
    assert(rows.count() == 2)
  }

  test("MaxTimestamp returns the global maximum") {
    assert(MaxTimestamp.run(spark, WikiFixtures.jsonPath).contains(1577836900000L))
  }

  test("BuildDictionary writes a ranked dictionary") {
    val in = graft.Scratch.dir("dictin").toString + "/docs"
    Seq((1L, "x y x"), (2L, "x z")).toDF("doc_id", "text").write.parquet(in)
    val out = graft.Scratch.dir("dictout").toString + "/dict"
    BuildDictionary.run(spark, in, out)
    val dict = spark.read.parquet(out).as[(String, Int, Long, Long)].collect()
      .map(t => t._1 -> t._2).toMap
    assert(dict == Map("x" -> 1, "y" -> 2, "z" -> 3))
  }

  test("MatchWikistats CLI resolves redirects and joins ids end-to-end") {
    val dir = graft.Scratch.dir("mws")
    Files.writeString(dir.resolve("pv.txt"),
      "en.z Foo_bar 10 AA10\nen.z Old_name 4 BA4\nen.z Baz 2 BA2\n")
    Files.writeString(dir.resolve("redirects.tsv"), "Old_name\tBaz\n")
    Files.writeString(dir.resolve("idmap.tsv"), "Foo_bar\t100\nBaz\t200\n")
    val out = dir.resolve("out").toString
    MatchWikistats.main(Array(dir.resolve("pv.txt").toString,
      dir.resolve("redirects.tsv").toString, dir.resolve("idmap.tsv").toString,
      "5", out))
    val rows = spark.read.parquet(out)
      .select("page_id", "title", "total")
      .as[(Long, String, Long)].collect().toSet
    assert(rows == Set((100L, "Foo_bar", 10L), (200L, "Baz", 6L)))
  }

  test("ExtractTemporalAnchorText samples and extracts over the XML source") {
    val out = graft.Scratch.dir("anchors").toString + "/out"
    ExtractTemporalAnchorText.run(spark, WikiFixtures.graphXmlPath, out)
    val rows = spark.read.option("sep", "\t").csv(out)
    // single-revision pages: every revision kept; 2+3 resolvable+raw links
    assert(rows.count() == 5)
  }
}
