package graft.sources

import java.nio.file.{Files, Path, Paths}

/** Deterministic revision-dump XML fixtures for golden queries and tests
  * (our own authored equivalent of a tiny `pages-meta-history` export —
  * same shape as the reference's fixture usage in its local reader tests,
  * content original). */
object WikiFixtures {

  def page(id: Long, title: String, ns: Int, redirect: Boolean,
           revs: Seq[String]): String = {
    val r = if (redirect) "    <redirect title=\"Elsewhere\" />\n" else ""
    s"""  <page>
       |    <title>$title</title>
       |    <ns>$ns</ns>
       |    <id>$id</id>
       |$r${revs.mkString("\n")}
       |  </page>""".stripMargin
  }

  def rev(id: Long, parent: Option[Long], ts: String, user: String,
          userId: Option[Long], comment: String, text: String,
          minor: Boolean = false): String = {
    val p = parent.map(x => s"      <parentid>$x</parentid>\n").getOrElse("")
    val m = if (minor) "      <minor />\n" else ""
    val contrib = userId match {
      case Some(uid) =>
        s"      <contributor>\n        <username>$user</username>\n        <id>$uid</id>\n      </contributor>"
      case None =>
        s"      <contributor>\n        <ip>$user</ip>\n      </contributor>"
    }
    s"""    <revision>
       |      <id>$id</id>
       |$p      <timestamp>$ts</timestamp>
       |$contrib
       |$m      <comment>$comment</comment>
       |      <model>wikitext</model>
       |      <format>text/x-wiki</format>
       |      <text bytes="${text.length}" xml:space="preserve">$text</text>
       |      <sha1>x</sha1>
       |    </revision>""".stripMargin
  }

  /** Three pages: an article with 3 revisions (named + ip contributors, a
    * minor edit, XML entities), a redirect, a non-article namespace. */
  def standardXml: String = {
    val xml = new StringBuilder
    xml.append("<mediawiki xmlns=\"http://www.mediawiki.org/xml/export-0.11/\" version=\"0.11\">\n")
    xml.append(page(10, "Alpha &amp; Beta", 0, redirect = false, Seq(
      rev(101, None, "2020-01-01T00:00:00Z", "alice", Some(7),
        "create", "Start text with [[Link|anchor]] and &lt;tag&gt;"),
      rev(102, Some(101), "2020-06-01T12:00:00Z", "192.168.0.1", None,
        "edit by ip", "Second version text"),
      rev(103, Some(102), "2021-01-01T00:00:00Z", "bob", Some(9),
        "tweak", "Third version text", minor = true)))).append("\n")
    xml.append(page(20, "Old name", 0, redirect = true, Seq(
      rev(201, None, "2019-05-05T05:05:05Z", "carol", Some(11),
        "redirected", "#REDIRECT [[Elsewhere]]")))).append("\n")
    xml.append(page(30, "Category:Things", 14, redirect = false, Seq(
      rev(301, None, "2018-01-01T00:00:00Z", "dave", Some(13),
        "cat", "category page text")))).append("\n")
    xml.append("</mediawiki>\n")
    xml.toString
  }

  /** `n` article pages with 3 revisions each (for split tests). */
  def bigXml(n: Int): String =
    "<mediawiki>\n" + (1 to n).map(i =>
      page(1000 + i, s"Page $i", 0, redirect = false,
        (1 to 3).map(j => rev(i * 10 + j,
          if (j > 1) Some(i * 10 + j - 1) else None,
          f"2020-01-${(i % 27) + 1}%02dT00:00:0${j - 1}Z", s"u$i", Some(i),
          s"c$j", s"text $i $j " + ("pad " * 40))))).mkString("\n") +
      "\n</mediawiki>\n"

  /** Link-graph fixture: three articles whose current texts link to each
    * other (anchor-graph resolution, pig/experimental/temporalgraph.pig). */
  def graphXml: String = {
    val xml = new StringBuilder
    xml.append("<mediawiki>\n")
    xml.append(page(1, "Alpha", 0, redirect = false, Seq(
      rev(11, None, "2020-01-01T00:00:00Z", "u", Some(1), "c",
        "Alpha links to [[Beta|the second]] twice: [[Beta]]")))).append("\n")
    xml.append(page(2, "Beta", 0, redirect = false, Seq(
      rev(21, None, "2020-01-02T00:00:00Z", "u", Some(1), "c",
        "Beta links [[Alpha]] and [[Gamma|g]] and [[Missing]]")))).append("\n")
    xml.append(page(3, "Gamma", 0, redirect = false, Seq(
      rev(31, None, "2020-01-03T00:00:00Z", "u", Some(1), "c",
        "Gamma links nothing")))).append("\n")
    xml.append("</mediawiki>\n")
    xml.toString
  }

  def graphXmlPath: String = materialize("graphwiki.xml", graphXml)

  /** `n` pages of poorly-compressible pseudo-random text — produces
    * multi-block bz2 files for splittable-compression tests. */
  def noisyXml(n: Int): String = {
    val sb = new StringBuilder(n * 3000)
    sb.append("<mediawiki>\n")
    var i = 1
    while (i <= n) {
      val text = (0 until 200)
        .map(j => java.lang.Long.toHexString(
          graft.functions.Hashing.mix(i.toLong * 1000 + j)))
        .mkString(" ")
      sb.append(page(5000 + i, s"Noisy $i", 0, redirect = false,
        Seq(rev(i.toLong * 7, None, f"2020-02-${(i % 27) + 1}%02dT00:00:00Z",
          s"u$i", Some(i), "c", text)))).append("\n")
      i += 1
    }
    sb.append("</mediawiki>\n")
    sb.toString
  }

  /** Two JSON-lines revisions (S15 ingest fixture). */
  def jsonLines: String =
    """{"page_id":1,"page_title":"T","page_namespace":0,"rev_id":5,"parent_id":4,"timestamp":1577836800000,"user":"u","user_id":3,"comment":"c","text":"body"}
      |{"page_id":1,"page_title":"T","page_namespace":0,"rev_id":6,"parent_id":5,"timestamp":1577836900000,"user":"u","user_id":3,"comment":"d","text":"body2"}
      |""".stripMargin

  /** Write `content` once to a stable temp path keyed by `name`. */
  def materialize(name: String, content: String): String = {
    val dir = Paths.get(System.getProperty("java.io.tmpdir"), "graft-fixtures")
    Files.createDirectories(dir)
    val f = dir.resolve(name)
    if (!Files.exists(f) || Files.size(f) != content.getBytes("UTF-8").length)
      Files.write(f, content.getBytes("UTF-8"))
    f.toString
  }

  def standardXmlPath: String = materialize("testwiki.xml", standardXml)
  def jsonPath: String = materialize("revs.json", jsonLines)

  /** Authored 4-record WARC fixture (warcinfo + 2 responses + metadata),
    * ClueWeb09-style 0.18 version line and WARC-TREC-ID headers, CRLF
    * line ends per ISO 28500. Content original. */
  def warcRecord(version: String, headers: Seq[(String, String)],
                 body: String): String = {
    val block = body.getBytes("UTF-8")
    (s"WARC/$version\r\n" +
      headers.map { case (k, v) => s"$k: $v\r\n" }.mkString +
      s"Content-Length: ${block.length}\r\n\r\n") + body + "\r\n\r\n"
  }

  def standardWarc: String = {
    val sb = new StringBuilder
    sb.append(warcRecord("0.18", Seq(
      "WARC-Type" -> "warcinfo",
      "WARC-Record-ID" -> "<urn:uuid:0000-info>",
      "WARC-Date" -> "2020-03-01T00:00:00Z",
      "Content-Type" -> "application/warc-fields"),
      "software: graft-fixture 1.0\r\nformat: WARC file version 0.18\r\n"))
    sb.append(warcRecord("0.18", Seq(
      "WARC-Type" -> "response",
      "WARC-Record-ID" -> "<urn:uuid:0001-resp>",
      "WARC-TREC-ID" -> "clueweb09-en0000-00-00001",
      "WARC-Target-URI" -> "http://example.org/a",
      "WARC-Date" -> "2020-03-01T00:00:01Z",
      "Content-Type" -> "application/http;msgtype=response"),
      "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
        "<html><body>alpha page about dams</body></html>"))
    sb.append(warcRecord("0.18", Seq(
      "WARC-Type" -> "response",
      "WARC-Record-ID" -> "<urn:uuid:0002-resp>",
      "WARC-TREC-ID" -> "clueweb09-en0000-00-00002",
      "WARC-Target-URI" -> "http://example.org/b?x=1",
      "WARC-Date" -> "2020-03-01T00:00:02Z",
      "Content-Type" -> "application/http;msgtype=response"),
      "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
        "<html><body>beta page, much longer body text for length variety " +
        "with several words</body></html>"))
    sb.append(warcRecord("0.18", Seq(
      "WARC-Type" -> "metadata",
      "WARC-Record-ID" -> "<urn:uuid:0003-meta>",
      "WARC-TREC-ID" -> "clueweb09-en0000-00-00002",
      "WARC-Target-URI" -> "http://example.org/b?x=1",
      "WARC-Date" -> "2020-03-01T00:00:03Z",
      "Content-Type" -> "application/warc-fields"),
      "fetchTimeMs: 120\r\n"))
    sb.toString
  }

  def standardWarcPath: String = materialize("test.warc", standardWarc)

  /** `n` response records with deterministic pseudo-random bodies (for
    * split tests on plain multi-megabyte WARCs). */
  def bigWarc(n: Int): String = {
    val sb = new StringBuilder(n * 2500)
    var i = 1
    while (i <= n) {
      val body = "<html>" + (0 until 150)
        .map(j => java.lang.Long.toHexString(
          graft.functions.Hashing.mix(i.toLong * 977 + j)))
        .mkString(" ") + "</html>"
      sb.append(warcRecord("1.0", Seq(
        "WARC-Type" -> "response",
        "WARC-Record-ID" -> f"<urn:uuid:$i%08d>",
        "WARC-Target-URI" -> s"http://example.org/p$i",
        "WARC-Date" -> f"2020-03-${(i % 27) + 1}%02dT00:00:00Z",
        "Content-Type" -> "application/http;msgtype=response"), body))
      i += 1
    }
    sb.toString
  }
}
