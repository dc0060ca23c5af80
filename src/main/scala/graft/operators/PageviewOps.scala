package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.GraftFunctions
import graft.functions.IntVectorSum

/** The pagecounts-ez pipeline (SURVEY §2.3 P6 + §2.5 A9 + §2.4 J3/J6,
  * reference: mapreduce/PreprocessEZPageviews.java:100-205,239-299,302-389
  * and etc/match_wikistats.sh:34-41): filter `en.z` lines → normalize
  * titles → decode compact hourly strings into daily vectors → element-wise
  * vector sum per title (titles that normalize identically merge).
  *
  * Scale stance: pure map work until one hash aggregation on title; the
  * vector sum is a typed Aggregator, so partial (map-side) combine applies
  * — the same shape as the reference's combiner.
  */
object PageviewOps {

  /** `lines` must have a single string column `value` shaped
    * `domain title total compactTs`. Returns (title, total, daily). */
  def pipeline(lines: DataFrame, days: Int, domain: String = "en.z"): DataFrame = {
    val parts = split(col("value"), " ")
    lines
      .filter(col("value").startsWith(domain + " "))
      .withColumn("parts", parts)
      .filter(size(col("parts")) >= 4)
      .select(
        GraftFunctions.normalizeTitle(element_at(col("parts"), 2)).as("title"),
        element_at(col("parts"), 3).cast("long").as("total"),
        GraftFunctions.decodeEz(element_at(col("parts"), 4), lit(days)).as("daily"))
      .filter(col("title").isNotNull && col("title") =!= "")
      .groupBy(col("title"))
      .agg(sum(col("total")).as("total"),
        udaf(IntVectorSum).apply(col("daily")).as("daily"))
  }
}
