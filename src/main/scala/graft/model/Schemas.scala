package graft.model

/** Canonical data model of the engine, derived from the reference's record
  * types (see SURVEY.md §1; reference: the java/main/org/hedera/io Writable
  * records — RevisionHeader.java:13-20, Revision.java:16-18,
  * FullRevision.java:11-17, LinkProfile.java:17-21, RevisionDiff.java:23-26).
  *
  * All timestamps are epoch milliseconds in the reference; here they are
  * surfaced as java.sql.Timestamp at API edges and TimestampType in frames.
  */
final case class RevisionHeader(
    pageId: Long,
    revisionId: Long,
    parentId: Long,
    timestamp: java.sql.Timestamp,
    pageTitle: String,
    namespace: Int,
    length: Int,
    minor: Boolean)

/** The canonical 10-column relation the reference pivots around
  * (reference: pig/load/WikiRevisionLoader.java:123-138, WIKIREVISION.md:125-140). */
final case class FullRevision(
    page_id: Long,
    page_title: String,
    page_namespace: Int,
    rev_id: Long,
    parent_id: Long,
    timestamp: java.sql.Timestamp,
    user: String,
    user_id: Long,
    comment: String,
    text: String,
    minor: Boolean = false,
    redirect: Boolean = false)

/** A wiki link occurrence (reference: io/LinkProfile.java:59-76). */
final case class Link(anchor: String, target: String)

/** Link with byte offset + context windows
  * (reference: mapreduce/Json2Anchor.java:98-162). */
final case class LinkCtx(anchor: String, target: String, offset: Int, pre: String, post: String)

/** One typed diff chunk (reference: io/RevisionDiff.java:52-69 via
  * difflib.Delta; op in {INSERT, DELETE, CHANGE}). */
final case class Delta(
    op: String,
    origPos: Int,
    revPos: Int,
    origLines: Seq[String],
    revLines: Seq[String])
