package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.GraftFunctions

/** Changed-word bag-of-words and concat-patch operators (SURVEY §2.1
  * S13/S14): per revision, the words its text *added* vs the previous
  * revision of the same page; and per page, the first text plus all
  * patch words accumulated across later revisions.
  *
  * One lag window + one aggregation; the diff runs on token arrays
  * already inside the row (no re-shuffle of text).
  * Reference: experiments io/etl/RevisionBOWInputFormat.java:162-187,
  * RevisionConcatInputFormat.java:108-180.
  */
object BowOps {

  /** S13 — (key, rev, word, cnt) of words added by each revision. The
    * first revision of a key adds all its words. */
  def changedWordBow(df: DataFrame, key: String, ts: String, textCol: String,
                     revCol: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(ts), col(revCol))
    df.withColumn("toks", TermOps.tokens(col(textCol)))
      .withColumn("prev_toks",
        coalesce(lag(col("toks"), 1).over(w), array()))
      .select(col(key), col(revCol),
        explode(GraftFunctions.addedWords(col("prev_toks"), col("toks"))).as("word"))
      .groupBy(col(key), col(revCol), col("word"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** S14 — (key, first_text, patch_words): the initial text plus the
    * flattened added-word patches of every later revision. */
  def concatPatches(df: DataFrame, key: String, ts: String, textCol: String,
                    revCol: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(ts), col(revCol))
    df.withColumn("toks", TermOps.tokens(col(textCol)))
      .withColumn("prev_toks", lag(col("toks"), 1).over(w))
      .withColumn("patch",
        when(col("prev_toks").isNull, array()) // first revision: no patch
          .otherwise(GraftFunctions.addedWords(col("prev_toks"), col("toks"))))
      .groupBy(col(key))
      .agg(min_by(col(textCol), col(ts)).as("first_text"),
        flatten(collect_list(col("patch"))).as("patch_words"))
  }
}
