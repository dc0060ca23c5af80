package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus curation — the key-maker for
  * URL-level dedup (CommonCrawl-style pipelines dedup on canonical URL
  * before touching content) and for stable domain grouping. The
  * reference extracts/normalizes link targets (util/ExtractionUtils
  * domain + title normalization); this is the absolute-URL counterpart.
  *
  * The whole kernel is a `regexp_extract`/`regexp_replace`/`lower`
  * composition — codegen'd end to end, and every pattern is shared
  * Java-regex/RE2 syntax so the DuckDB oracle replays the identical
  * patterns (the same contract `scrubPii` keeps).
  *
  * Canonical form:
  *  - scheme and host lowercased (path/query case preserved — path case
  *    is significant per RFC 3986);
  *  - fragment dropped;
  *  - a leading `www.` host label dropped;
  *  - explicit default ports (`:80`, `:443`) dropped;
  *  - tracking parameters (`utm_*`, `gclid`, `fbclid`) dropped, with
  *    separator cleanup (no dangling `?`/`&`, no `&&`);
  *  - trailing slashes of a non-root path dropped, including directly
  *    before the `?` of a surviving query.
  */
object UrlFunctions {

  private val SchemeHost = "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)(.*)$"

  def normalizeUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, SchemeHost, 1))
    val host = regexp_replace(
      regexp_replace(lower(regexp_extract(noFrag, SchemeHost, 2)),
        "^www\\.", ""),
      ":(80|443)$", "")
    // path+query with tracking params removed and separators tidied
    val rest0 = regexp_extract(noFrag, SchemeHost, 3)
    val noTrack = regexp_replace(rest0, "(utm_[a-z]+|gclid|fbclid)=[^&#]*&?", "")
    val tidy = regexp_replace(regexp_replace(noTrack, "[?&]+$", ""), "\\?&", "?")
    val noSlash = regexp_replace(regexp_replace(tidy, "/+\\?", "?"),
      "^(/.*?)/+$", "$1")
    // non-URL input (no scheme) passes through unchanged so the kernel
    // is safe on mixed columns
    when(scheme === "", u).otherwise(
      concat(scheme, lit("://"), host, noSlash))
  }
}
