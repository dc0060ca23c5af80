package graft.functions

import graft.model.{Link, LinkCtx}
import scala.collection.mutable.ArrayBuffer

/** Pure-Scala scalar text functions mirroring the reference's extractors
  * (SURVEY.md §2.7). Each is a plain function so it unit-tests without
  * Spark; the native expressions in `graft.plans` surface them to query
  * plans (codegen tier), and `GraftFunctions` exposes the Column API.
  *
  * References (behavioral spec only, no code reuse):
  *  - extract_links:  mapreduce/ExtractTemporalAnchorText.java:133-191,
  *    io/LinkProfile.java:26-57, python/json2anchor.py:40-80
  *  - extract_links_ctx: mapreduce/Json2Anchor.java:98-162
  *  - extract_refs: mapreduce/ExtractReferences.java:37,56-77
  *  - extract_templates: pig/eval/wikipedia/ExtractTemplate.java:22-160
  *  - plain_text: util/MediaWikiProcessor.java:11-57 (regex approximation)
  *  - normalize_title: mapreduce/PreprocessEZPageviews.java:115-205
  *  - freebase_encode: mapreduce/Anchor2Freebase.java:42-84
  *  - cut_last: pig/eval/wikipedia/CutLast.java:17-45
  */
object TextFunctions {

  /** All `[[target|anchor]]` wiki links. Skips empty bodies, `:`-qualified
    * special links (File:, Category:, interwiki), `#`-internal fragments,
    * and anchors containing newlines. Anchor defaults to the target. */
  def extractLinks(text: String): Seq[Link] = {
    if (text == null) return Seq.empty
    val out = ArrayBuffer.empty[Link]
    var i = 0
    var done = false
    while (!done) {
      val s = text.indexOf("[[", i)
      if (s < 0) done = true
      else {
        val e = text.indexOf("]]", s + 2)
        if (e < 0) done = true
        else {
          splitLink(text.substring(s + 2, e)).foreach(out += _)
          i = e + 2
        }
      }
    }
    out.toSeq
  }

  private def splitLink(body: String): Option[Link] = {
    if (body.isEmpty) return None
    val bar = body.indexOf('|')
    val (target, anchor) =
      if (bar < 0) (body, body)
      else (body.substring(0, bar), body.substring(bar + 1))
    if (target.isEmpty || anchor.isEmpty) None
    else if (target.contains(':')) None          // special/interwiki link
    else if (target.startsWith("#")) None        // internal fragment
    else if (anchor.contains('\n') || target.contains('\n')) None
    else Some(Link(anchor, target))
  }

  /** Links plus character offset and 20-char pre/post context windows. */
  def extractLinksWithContext(text: String, window: Int = 20): Seq[LinkCtx] = {
    if (text == null) return Seq.empty
    val out = ArrayBuffer.empty[LinkCtx]
    var i = 0
    var done = false
    while (!done) {
      val s = text.indexOf("[[", i)
      if (s < 0) done = true
      else {
        val e = text.indexOf("]]", s + 2)
        if (e < 0) done = true
        else {
          splitLink(text.substring(s + 2, e)).foreach { l =>
            val pre = text.substring(math.max(0, s - window), s)
            val post = text.substring(e + 2, math.min(text.length, e + 2 + window))
            out += LinkCtx(l.anchor, l.target, s, pre, post)
          }
          i = e + 2
        }
      }
    }
    out.toSeq
  }

  /** `http://…` references, one per whitespace-terminated URL. */
  private val RefRe = """http://\S+?\s""".r
  def extractReferences(text: String): Seq[String] =
    if (text == null) Seq.empty
    else RefRe.findAllIn(text).map(_.trim).toSeq

  /** Template-name prefixes the reference blacklists (citations, redirects,
    * formatting helpers — pig/eval/wikipedia/ExtractTemplate.java:26-66). */
  private val TemplateBlacklist: Seq[String] = Seq(
    "cite", "citation", "redirect", "use dmy dates", "use mdy dates",
    "refbegin", "refend", "reflist", "ref", "sfn", "main", "see also",
    "dead link", "webarchive", "isbn", "page needed", "by whom",
    "citation needed", "clarify", "convert", "ipa", "lang", "nihongo",
    "coord", "flag", "defaultsort", "authority control", "portal",
    "commons", "wikiquote", "wiktionary", "bbc", "imdb")

  /** Template names from `{{...}}`, lower-cased check against the blacklist;
    * bodies containing `|`-args beyond the name keep only the name; names
    * with newlines or `:` are dropped. */
  def extractTemplates(text: String): Seq[String] = {
    if (text == null) return Seq.empty
    val out = ArrayBuffer.empty[String]
    var i = 0
    var done = false
    while (!done) {
      val s = text.indexOf("{{", i)
      if (s < 0) done = true
      else {
        val e = text.indexOf("}}", s + 2)
        if (e < 0) done = true
        else {
          val body = text.substring(s + 2, e)
          val name = body.indexOf('|') match {
            case -1 => body
            case b  => body.substring(0, b)
          }
          val t = name.trim
          val lower = t.toLowerCase
          val bad = t.isEmpty || t.contains('\n') || t.contains(':') ||
            TemplateBlacklist.exists(lower.startsWith)
          if (!bad) out += t
          i = e + 2
        }
      }
    }
    out.toSeq
  }

  /** Markup → plaintext, regex pipeline approximating the reference's bliki
    * `PlainTextConverter` chain (strip comments, refs, templates, tables,
    * file/cat links, link markup, external links, html tags, urls, quotes,
    * then whitespace-normalize). Documented delta vs bliki: templates are
    * STRIPPED (any nesting depth), not transcluded/rendered. */
  def plainText(text: String): String = {
    if (text == null) return ""
    var t = text
    t = "(?s)<!--.*?-->".r.replaceAllIn(t, " ")
    t = "(?s)<ref[^>]*?/>".r.replaceAllIn(t, " ")
    t = "(?s)<ref[^>]*?>.*?</ref>".r.replaceAllIn(t, " ")
    // innermost-first to a fixpoint: handles {{..{{..{{..}}..}}..}} and
    // wikitables (which bliki also drops) at any nesting depth; the
    // iteration cap bounds adversarial inputs — leftover braces then
    // fall through as literal text rather than looping forever
    val template = "(?s)\\{\\{[^{}]*\\}\\}".r
    val table = "(?s)\\{\\|[^{}]*\\|\\}".r
    var rounds = 0
    var changed = true
    while (changed && rounds < 20) {
      val next = table.replaceAllIn(template.replaceAllIn(t, " "), " ")
      changed = next != t
      t = next
      rounds += 1
    }
    t = "(?s)\\[\\[[^\\[\\]]*:[^\\[\\]]*\\]\\]".r.replaceAllIn(t, " ") // File:/Category:
    t = "\\[\\[([^\\[\\]|]*)\\|([^\\[\\]]*)\\]\\]".r.replaceAllIn(t, m => java.util.regex.Matcher.quoteReplacement(m.group(2)))
    t = "\\[\\[([^\\[\\]]*)\\]\\]".r.replaceAllIn(t, m => java.util.regex.Matcher.quoteReplacement(m.group(1)))
    t = "\\[https?://\\S*( ([^\\]]*))?\\]".r.replaceAllIn(t, m => Option(m.group(2)).map(java.util.regex.Matcher.quoteReplacement).getOrElse(" "))
    t = "https?://\\S+".r.replaceAllIn(t, " ")
    t = "(?s)<[^>]+>".r.replaceAllIn(t, " ")
    t = t.replace("'''", "").replace("''", "")
    t = t.replace("&nbsp;", " ").replace("&amp;", "&")
      .replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
    t = "\\s+".r.replaceAllIn(t, " ")
    t.trim
  }

  /** Wikistats title normalization: cut `#fragment` / `&param` suffixes,
    * strip quotes, underscores for spaces, first char upper-cased. */
  def normalizeTitle(title: String): String = {
    if (title == null) return null
    var t = title
    val h = t.indexOf('#'); if (h >= 0) t = t.substring(0, h)
    val a = t.indexOf('&'); if (a >= 0) t = t.substring(0, a)
    t = t.replace("\"", "").trim
    t = t.replace(' ', '_')
    if (t.isEmpty) t
    else t.substring(0, 1).toUpperCase(java.util.Locale.ROOT) + t.substring(1)
  }

  /** Freebase MQL key encoding: chars outside [A-Za-z0-9_-] become `$XXXX`
    * (uppercase hex of the UTF-16 code unit). */
  def freebaseEncode(s: String): String = {
    if (s == null) return null
    val sb = new StringBuilder(s.length + 8)
    s.foreach { c =>
      if (c.isLetterOrDigit && c < 128 || c == '_' || c == '-') sb += c
      else sb ++= f"$$${c.toInt}%04X"
    }
    sb.toString
  }

  /** Drop the last n chars. */
  def cutLast(s: String, n: Int): String =
    if (s == null || n >= s.length) "" else s.substring(0, s.length - n)

  /** Multi-level public suffixes for the hand-rolled PSL subset of F5
    * (reference uses Guava's InternetDomainName; we keep the common cases —
    * the delta is documented in FIXTURES.md). */
  private val MultiSuffix: Set[String] = Set(
    "co.uk", "ac.uk", "org.uk", "gov.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "com.br", "com.cn", "com.mx", "co.in",
    "co.nz", "com.sg", "com.tw", "co.kr")

  /** F5 `ExtractDomain(url)`: `"secondLevelDomain \t publicSuffix"`, null on
    * malformed input (pig/eval/wikipedia/ExtractDomain.java:23-80). */
  def extractDomain(url: String): String = {
    if (url == null) return null
    val noScheme = {
      val i = url.indexOf("://")
      if (i < 0) url else url.substring(i + 3)
    }
    val hostEnd = noScheme.indexWhere(c => c == '/' || c == '?' || c == '#' || c == ':')
    val host = (if (hostEnd < 0) noScheme else noScheme.substring(0, hostEnd))
      .toLowerCase(java.util.Locale.ROOT)
    val labels = host.split('.').filter(_.nonEmpty)
    if (labels.length < 2 || labels.exists(l => !l.forall(c => c.isLetterOrDigit || c == '-')))
      return null
    val lastTwo = labels.takeRight(2).mkString(".")
    val (suffix, needed) =
      if (labels.length >= 3 && MultiSuffix.contains(lastTwo)) (lastTwo, 3)
      else (labels.last, 2)
    if (labels.length < needed) null
    else labels(labels.length - needed) + "\t" + suffix
  }

  /** Stopword/character-class language-ID heuristic (driver brief: text
    * analysis). Deterministic: CJK-ratio check first, then per-language
    * stopword hit counts over lower-cased whitespace tokens; ties break by
    * fixed language order; no hits → "und". */
  private val LangStopwords: Seq[(String, Set[String])] = Seq(
    "en" -> Set("the", "of", "and", "to", "in", "is", "that", "it", "was", "for", "with", "as", "on", "are", "this"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "von", "für", "auf", "den", "im", "zu"),
    "fr" -> Set("le", "la", "les", "de", "des", "et", "est", "une", "un", "dans", "pour", "que", "qui", "du", "au"),
    "es" -> Set("el", "la", "los", "las", "de", "y", "es", "en", "un", "una", "que", "por", "con", "para", "del"))

  def langId(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    var cjk = 0; var total = 0
    text.foreach { c =>
      if (!c.isWhitespace) {
        total += 1
        val b = Character.UnicodeScript.of(c)
        if (b == Character.UnicodeScript.HAN || b == Character.UnicodeScript.HIRAGANA ||
            b == Character.UnicodeScript.KATAKANA || b == Character.UnicodeScript.HANGUL) cjk += 1
      }
    }
    if (total > 0 && cjk * 2 > total) return "zh"
    val toks = text.toLowerCase(java.util.Locale.ROOT).split("\\s+")
    var best = "und"; var bestHits = 0
    LangStopwords.foreach { case (lang, sw) =>
      val hits = toks.count(sw.contains)
      if (hits > bestHits) { best = lang; bestHits = hits }
    }
    best
  }
}
