package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-travel joins the built-in operators don't express directly
  * (driver brief: as-of and range joins as first-class operators).
  *
  * `asofJoin` matches each left row with the latest right row at or
  * before its timestamp, per key — the standard "state as of event time"
  * join (prices at trade time, page metadata at revision time).
  *
  * Implementation is the union+window shape, NOT a per-key sort-merge
  * UDF: tag both sides, union, and carry the last right-side values
  * forward with `last(ignoreNulls)` over (key, time). One shuffle on the
  * key, streaming window state — the same single-pass behavior Spark
  * gives every other window, so a key with 10^6 rows costs one sorted
  * partition pass, never a driver loop or an all-pairs time comparison.
  */
object AsofOps {

  /** Left rows gain `valueCols` from the latest right row with
    * `right.ts <= left.ts` on the same `key` (null when none exists).
    * A right and a left row at the same timestamp match ("<="): ties
    * order the right row first. For deterministic output the right side
    * should be unique per (key, ts) — pre-aggregate it otherwise. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               valueCols: Seq[String]): DataFrame = {
    val carryCols = left.columns.filterNot(c => c == key || c == ts).toSeq
    val rightSide = right.select(
      Seq(col(key), col(ts).as("__ts"), lit(0).as("__side")) ++
        valueCols.map(c => col(c).as(s"__v_$c")) ++
        carryCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val leftSide = left.select(
      Seq(col(key), col(ts).as("__ts"), lit(1).as("__side")) ++
        valueCols.map(c =>
          lit(null).cast(right.schema(c).dataType).as(s"__v_$c")) ++
        carryCols.map(col): _*)
    val w = Window.partitionBy(key).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rightSide.unionByName(leftSide)
      .select(
        Seq(col(key), col("__ts"), col("__side")) ++
          carryCols.map(col) ++
          valueCols.map(c =>
            last(col(s"__v_$c"), ignoreNulls = true).over(w).as(c)): _*)
      .filter(col("__side") === 1)
      .withColumnRenamed("__ts", ts)
      .drop("__side")
  }

  /** Range (interval) join: each fact row joins every dimension interval
    * `[startCol, endCol)` containing its `ts`, on the same `key`.
    *
    * The naive form is a non-equi join (quadratic per key). This is the
    * bucketed form: intervals explode to the fixed-width time buckets
    * they overlap, facts hash to their single bucket, and the join runs
    * on (key, bucket) equality with a residual containment filter — the
    * standard scale shape when interval lengths are bounded (pick
    * `bucketMs` near the typical interval length to keep the explode
    * factor small). Millisecond-exact via unix_micros. */
  def rangeJoin(facts: DataFrame, intervals: DataFrame, key: String,
                ts: String, startCol: String, endCol: String,
                bucketMs: Long): DataFrame = {
    def bucketOf(c: Column): Column =
      (unix_micros(c) / lit(1000L) / lit(bucketMs)).cast("long")
    val ivals = intervals.withColumn("__bucket",
      explode(sequence(bucketOf(col(startCol)),
        ((unix_micros(col(endCol)) / lit(1000L) - 1) / lit(bucketMs)).cast("long"))))
    val keyedFacts = facts.withColumn("__bucket", bucketOf(col(ts)))
    keyedFacts.join(ivals, Seq(key, "__bucket"))
      .filter(col(ts) >= col(startCol) && col(ts) < col(endCol))
      .drop("__bucket")
  }
}
