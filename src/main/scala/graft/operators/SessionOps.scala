package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based BATCH sessionization — the bounded-data sibling of
  * `streaming/EventStreamOps.sessionizeEventTime` (same session
  * semantics: a session closes when the next event for the key is more
  * than `gapMs` later; same output shape, so a backfill job and the
  * live stream produce interchangeable tables).
  *
  * Scale shape: ONE shuffle — the key-partitioned window computes the
  * new-session flag (lag) and the running session index (cumulative
  * sum) in a single Window physical operator, and the session
  * aggregation reuses that partitioning (hash on the key co-locates
  * every (key, session) group already, so the groupBy plans without a
  * second exchange). Ties on the timestamp are safe by construction:
  * tied events have gap 0, so they always land in the same session and
  * every session aggregate is order-invariant under ties.
  */
object SessionOps {

  /** One row per (key, session): `session_idx` (1-based, in time order),
    * `start_ms`/`end_ms` (epoch millis), `n_events`, `sum_value`. */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
                 valueCol: String, gapMs: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("_tms"))
    val prev = lag(col("_tms"), 1).over(w)
    events
      // a null key or timestamp belongs to no session (and a null _tms
      // would sort first and silently seed a bogus leading session)
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol), unix_millis(col(tsCol)).as("_tms"),
        col(valueCol).as("_v"))
      .withColumn("_new",
        when(prev.isNull || col("_tms") - prev > gapMs, lit(1))
          .otherwise(lit(0)))
      .withColumn("_sess", sum(col("_new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("_sess"))
      .agg(min(col("_tms")).as("start_ms"), max(col("_tms")).as("end_ms"),
        count(lit(1)).as("n_events"), sum(col("_v")).as("sum_value"))
      .select(col(keyCol), col("_sess").as("session_idx"),
        col("start_ms"), col("end_ms"), col("n_events"), col("sum_value"))
  }
}
