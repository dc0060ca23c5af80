package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.WikiXml

class WikiSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val fixturePath: String = graft.sources.WikiFixtures.standardXmlPath

  test("full read: one row per revision, typed fields, unescaping") {
    val df = WikiXml.read(spark, fixturePath)
    assert(df.count() == 5)
    val alpha = df.filter($"page_id" === 10).orderBy("rev_id")
      .select("page_title", "rev_id", "parent_id", "user", "user_id",
        "comment", "minor", "redirect", "text")
      .collect()
    assert(alpha.length == 3)
    assert(alpha(0).getString(0) == "Alpha & Beta") // entity unescaped
    assert(alpha(0).getLong(2) == -1L)              // no parent
    assert(alpha(1).getString(3) == "192.168.0.1")  // ip contributor
    assert(alpha(1).getLong(4) == -1L)
    assert(alpha(2).getBoolean(6))                  // minor
    assert(!alpha(2).getBoolean(7))                 // not redirect
    assert(alpha(0).getString(8).contains("<tag>")) // text unescaped
    val ts = df.filter($"rev_id" === 101)
      .select(date_format($"timestamp", "yyyy-MM-dd HH:mm:ss")).as[String].head()
    assert(ts == "2020-01-01 00:00:00")
  }

  test("onlyArticles and skipRedirects options prune pages at the scan") {
    val art = WikiXml.read(spark, fixturePath, Map("onlyArticles" -> "true"))
    assert(art.select("page_id").distinct().as[Long].collect().sorted.toSeq == Seq(10L, 20L))
    val clean = WikiXml.read(spark, fixturePath,
      Map("onlyArticles" -> "true", "skipRedirects" -> "true"))
    assert(clean.select("page_id").distinct().as[Long].collect().toSeq == Seq(10L))
  }

  test("time-range option is a half-open interval over revisions") {
    val df = WikiXml.read(spark, fixturePath,
      Map("beginTime" -> "2020-01-01T00:00:00Z", "endTime" -> "2021-01-01T00:00:00Z"))
    assert(df.select("rev_id").as[Long].collect().sorted.toSeq == Seq(101L, 102L))
  }

  test("catalyst filters on namespace/timestamp still yield exact results") {
    val df = WikiXml.read(spark, fixturePath)
      .filter($"page_namespace" === 0 &&
        $"timestamp" >= lit("2020-01-01").cast("timestamp"))
    assert(df.select("rev_id").as[Long].collect().sorted.toSeq ==
      Seq(101L, 102L, 103L))
  }

  test("header-only projection never needs text") {
    val heads = WikiXml.readHeaders(spark, fixturePath)
    assert(heads.columns.toSeq ==
      Seq("page_id", "page_title", "page_namespace", "rev_id", "parent_id",
        "timestamp", "minor", "redirect"))
    assert(heads.count() == 5)
  }

  test("page-boundary splitting: many small splits == one big split") {
    val f = Files.createTempFile("bigwiki", ".xml")
    Files.writeString(f, graft.sources.WikiFixtures.bigXml(60))
    val whole = WikiXml.read(spark, f.toString)
    val split = WikiXml.read(spark, f.toString, Map("maxSplitBytes" -> "4000"))
    assert(split.rdd.getNumPartitions > 5)
    assert(whole.count() == 180)
    assert(split.count() == 180)
    assert(split.agg(sum("rev_id")).as[Long].head() ==
      whole.agg(sum("rev_id")).as[Long].head())
  }

  test("raw mode is split-invariant: same verbatim revisions at any split size") {
    val f = Files.createTempFile("bigwiki-raw", ".xml")
    Files.writeString(f, graft.sources.WikiFixtures.bigXml(60))
    def fingerprints(opts: Map[String, String]) =
      WikiXml.readRaw(spark, f.toString, opts)
        .select(col("rev_id"), md5(col("revision_xml")).as("m"))
        .as[(Long, String)].collect().toSet
    val whole = fingerprints(Map.empty)
    val split = fingerprints(Map("maxSplitBytes" -> "4000"))
    assert(whole.size == 180)
    assert(split == whole)
  }

  test("split index aligns partitions on page boundaries") {
    val f = Files.createTempFile("idxwiki", ".xml")
    Files.writeString(f, graft.sources.WikiFixtures.bigXml(60))
    val idx = graft.sources.IndexSplits.build(spark, f.toString)
    assert(idx.count() == 60) // one offset per page
    val idxPath = graft.Scratch.dir("idx").toString + "/index"
    graft.sources.GraftSinks.writeSplitIndex(idx, idxPath)
    val indexed = WikiXml.read(spark, f.toString,
      Map("maxSplitBytes" -> "4000", "splitIndex" -> idxPath))
    val plain = WikiXml.read(spark, f.toString)
    assert(indexed.rdd.getNumPartitions > 5)
    assert(indexed.count() == 180)
    assert(indexed.agg(sum("rev_id")).as[Long].head() ==
      plain.agg(sum("rev_id")).as[Long].head())
  }

  test("split index planning set is O(ranges), not O(pages)") {
    val f = Files.createTempFile("idxwiki2", ".xml")
    Files.writeString(f, graft.sources.WikiFixtures.bigXml(120))
    val idx = graft.sources.IndexSplits.build(spark, f.toString)
    assert(idx.count() == 120)
    val idxPath = graft.Scratch.dir("idx2").toString + "/index"
    graft.sources.GraftSinks.writeSplitIndex(idx, idxPath)
    val maxSplit = 4000L
    val indexed = WikiXml.read(spark, f.toString,
      Map("maxSplitBytes" -> maxSplit.toString, "splitIndex" -> idxPath))
    // the planned partitions must START at the bucketed index offsets
    // (min page offset per maxSplit-sized bucket) — this fails if the
    // index were silently ignored, because the fallback chunking starts
    // at multiples of maxSplit instead of page boundaries
    val expectedStarts = idx.as[(String, Long)].collect()
      .map(_._2).groupBy(_ / maxSplit).values.map(_.min).toSeq.sorted
    val plannedStarts = indexed.queryExecution.sparkPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.inputRDD.partitions.map(
          _.asInstanceOf[org.apache.spark.sql.execution.datasources.v2.DataSourceRDDPartition]
            .inputPartitions.head
            .asInstanceOf[graft.sources.WikiRevisionInputPartition].start)
    }.flatten.sorted
    assert(plannedStarts == expectedStarts)
    assert(plannedStarts.size <= Files.size(f) / maxSplit + 1) // O(ranges)
    assert(plannedStarts.size < 120)                           // not O(pages)
    val plain = WikiXml.read(spark, f.toString)
    assert(indexed.count() == plain.count())
    assert(indexed.agg(sum("rev_id")).as[Long].head() ==
      plain.agg(sum("rev_id")).as[Long].head())
  }

  test("bz2-compressed dumps read as a single partition") {
    val conf = new org.apache.hadoop.conf.Configuration()
    val codec = new org.apache.hadoop.io.compress.BZip2Codec()
    codec.setConf(conf)
    val f = Files.createTempFile("testwiki", ".xml.bz2")
    val out = codec.createOutputStream(Files.newOutputStream(f))
    out.write(Files.readAllBytes(Paths.get(fixturePath)))
    out.close()
    val df = WikiXml.read(spark, f.toString)
    assert(df.rdd.getNumPartitions == 1)
    assert(df.count() == 5)
  }

  test("multi-block bz2 splits across partitions with exact results") {
    val conf = new org.apache.hadoop.conf.Configuration()
    val codec = new org.apache.hadoop.io.compress.BZip2Codec()
    codec.setConf(conf)
    val f = Files.createTempFile("noisywiki", ".xml.bz2")
    val out = codec.createOutputStream(Files.newOutputStream(f))
    out.write(graft.sources.WikiFixtures.noisyXml(2000).getBytes("UTF-8"))
    out.close()
    assert(Files.size(f) > 2 * 900 * 1000, s"need >2 bz2 blocks, got ${Files.size(f)}")
    val whole = WikiXml.read(spark, f.toString)
    val split = WikiXml.read(spark, f.toString, Map("maxSplitBytes" -> "400000"))
    assert(split.rdd.getNumPartitions > 3)
    assert(whole.count() == 2000)
    assert(split.count() == 2000)
    assert(split.agg(sum("rev_id")).as[Long].head() ==
      whole.agg(sum("rev_id")).as[Long].head())
  }

  test("parser corner cases: missing ns, self-closing text, no comment, pageless file") {
    val xml =
      """<mediawiki>
        |  <page>
        |    <title>Sparse</title>
        |    <id>99</id>
        |    <revision>
        |      <id>991</id>
        |      <timestamp>2020-01-01T00:00:00Z</timestamp>
        |      <contributor deleted="deleted" />
        |      <text bytes="0" />
        |    </revision>
        |    <revision>
        |      <id>992</id>
        |      <text bytes="1">x</text>
        |    </revision>
        |  </page>
        |  <page>
        |    <title>Empty page</title>
        |    <ns>0</ns>
        |    <id>98</id>
        |  </page>
        |</mediawiki>
        |""".stripMargin
    val f = Files.createTempFile("sparse", ".xml")
    Files.writeString(f, xml)
    val rows = WikiXml.read(spark, f.toString).orderBy("rev_id").collect()
    assert(rows.length == 2) // revision-less page contributes nothing
    val r = rows.head
    assert(r.getAs[Int]("page_namespace") == 0)   // ns defaults to 0
    assert(r.getAs[String]("text") == "")          // self-closing <text/>
    assert(r.getAs[String]("user") == null)        // deleted contributor
    assert(r.getAs[Long]("user_id") == -1L)
    assert(r.getAs[String]("comment") == null)     // absent comment
    assert(r.getAs[Long]("parent_id") == -1L)
    assert(rows(1).getAs[java.sql.Timestamp]("timestamp") == null) // absent ts
  }

  test("raw mode emits each revision's verbatim dump substring") {
    val rows = WikiXml.readRaw(spark, fixturePath)
      .orderBy("rev_id").collect()
    assert(rows.map(_.getAs[Long]("rev_id")).toSeq ==
      Seq(101L, 102L, 103L, 201L, 301L))
    // exact substring check against the authored fixture, no re-serialization
    val fixture = graft.sources.WikiFixtures.standardXml
    rows.foreach { r =>
      val raw = r.getAs[String]("revision_xml")
      assert(raw.startsWith("<revision>") && raw.endsWith("</revision>"), raw.take(40))
      assert(fixture.contains(raw), s"rev ${r.getAs[Long]("rev_id")} not verbatim")
    }
    // page context rides along
    assert(rows.last.getAs[Long]("page_id") == 30L)
    assert(rows.last.getAs[String]("page_title") == "Category:Things")
  }

  test("raw mode composes with pushdown options") {
    val rows = WikiXml.readRaw(spark, fixturePath,
        Map("onlyArticles" -> "true", "skipRedirects" -> "true",
          "beginTime" -> "2020-06-01T00:00:00Z"))
      .select("rev_id").as[Long].collect().sorted
    assert(rows.toSeq == Seq(102L, 103L))
  }

  test("fileNames source lists files") {
    assert(WikiXml.fileNames(spark, fixturePath).count() == 1)
  }

  test("json ingest with the canonical schema") {
    val df = WikiXml.readJson(spark, graft.sources.WikiFixtures.jsonPath)
    assert(df.count() == 2)
    assert(df.select(max("rev_id")).as[Long].head() == 6L)
  }
}
