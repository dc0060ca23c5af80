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
  * UDF: tag both sides, union, and carry the last right-side ROW
  * forward with `last(ignoreNulls)` over (key, time). One shuffle on the
  * key, streaming window state — the same single-pass behavior Spark
  * gives every other window, so a key with 10^6 rows costs one sorted
  * partition pass, never a driver loop or an all-pairs time comparison.
  */
object AsofOps {

  /** Left rows gain `valueCols` from the latest right row with
    * `right.ts <= left.ts` on the same `key` (all null when none
    * exists). The right ROW is carried as one struct, so a null field in
    * the latest right row stays null (no falling back to a staler row)
    * and multiple valueCols always come from the same right row. Right
    * rows with a null timestamp never match. A right and a left row at
    * the same timestamp match ("<="): ties order the right row first.
    * For deterministic output the right side should be unique per
    * (key, ts) — pre-aggregate it otherwise. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               valueCols: Seq[String]): DataFrame = {
    requireFree(left, "left", asofReserved)
    requireFree(right, "right", asofReserved)
    val carryCols = left.columns.filterNot(c => c == key || c == ts).toSeq
    val rvType = org.apache.spark.sql.types.StructType(
      valueCols.map(c => right.schema(c.toString)).toArray)
    val rightSide = right.filter(col(ts).isNotNull).select(
      Seq(col(key), col(ts).as("__ts"), lit(0).as("__side"),
        struct(valueCols.map(col): _*).as("__rv")) ++
        carryCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val leftSide = left.select(
      Seq(col(key), col(ts).as("__ts"), lit(1).as("__side"),
        lit(null).cast(rvType).as("__rv")) ++
        carryCols.map(col): _*)
    val w = Window.partitionBy(key).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rightSide.unionByName(leftSide)
      .withColumn("__rv", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(
        Seq(col(key), col("__ts").as(ts)) ++ carryCols.map(col) ++
          valueCols.map(c => col(s"__rv.$c").as(c)): _*)
  }

  /** NEAREST-in-time as-of join: each left row takes the right row with
    * the smallest |right.ts − left.ts| on its key, from EITHER
    * direction — sensor/record alignment where "latest before" is the
    * wrong rule when the next reading is closer. Same union+window
    * shape as [[asofJoin]], carrying BOTH the last preceding and first
    * following right row (as (ts, values) structs) in ONE sorted pass
    * per key — one shuffle, streaming window state, no time-range
    * self-join. Distances compare EXACTLY — microseconds for timestamp
    * columns (cast-long floor-seconds would make every same-second
    * right row "tie", while the window can only carry one of them);
    * ties (exactly equidistant in micros) prefer the earlier right
    * row; right rows at the left row's exact ts match at distance 0.
    * Right side should be unique per (key, ts) for determinism.
    * Output adds `matched_ts` and `delta` (|Δ| in the ts column's
    * native cast-long unit, floor-seconds for timestamps — the exact
    * micro distance drives selection only) beside `valueCols`. */
  def asofNearest(left: DataFrame, right: DataFrame, key: String,
                  ts: String, valueCols: Seq[String]): DataFrame = {
    requireFree(left, "left", nearestReserved)
    requireFree(right, "right", nearestReserved)
    val carryCols = left.columns.filterNot(c => c == key || c == ts).toSeq
    val rvType = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("ts",
        right.schema(ts).dataType) +:
        valueCols.map(c => right.schema(c)).toArray.toSeq)
    val rightSide = right.filter(col(ts).isNotNull).select(
      Seq(col(key), col(ts).as("__ts"), lit(0).as("__side"),
        struct(col(ts).as("ts") +: valueCols.map(col): _*).as("__rv")) ++
        carryCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val leftSide = left.select(
      Seq(col(key), col(ts).as("__ts"), lit(1).as("__side"),
        lit(null).cast(rvType).as("__rv")) ++ carryCols.map(col): _*)
    // side 0 sorts before side 1 at equal ts: an equal-ts right row is
    // in the left row's PRECEDING frame (distance 0, prev wins ties)
    val ord = Window.partitionBy(key).orderBy(col("__ts"), col("__side"))
    val wPrev = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    // exact distance for selection: micros for timestamps (cast-long is
    // floor-seconds there, which misorders same-second neighbors)
    val exactTs: Column => Column =
      if (left.schema(ts).dataType ==
        org.apache.spark.sql.types.TimestampType) unix_micros
      else _.cast("long")
    val dPrev = exactTs(col("__ts")) - exactTs(col("__prev.ts"))
    val dNext = exactTs(col("__next.ts")) - exactTs(col("__ts"))
    val pick = when(col("__next").isNull, col("__prev"))
      .when(col("__prev").isNull, col("__next"))
      .when(dPrev <= dNext, col("__prev")).otherwise(col("__next"))
    rightSide.unionByName(leftSide)
      .withColumn("__prev", last(col("__rv"), ignoreNulls = true).over(wPrev))
      .withColumn("__next", first(col("__rv"), ignoreNulls = true).over(wNext))
      .filter(col("__side") === 1)
      .withColumn("__m", pick)
      .select(
        Seq(col(key), col("__ts").as(ts)) ++ carryCols.map(col) ++
          Seq(col("__m.ts").as("matched_ts"),
            abs(col("__m.ts").cast("long") - col("__ts").cast("long"))
              .as("delta")) ++
          valueCols.map(c => col(s"__m.$c").as(c)): _*)
  }

  private val nearestReserved =
    Set("__ts", "__side", "__rv", "__prev", "__next", "__m")

  /** Internal working columns, per operator — reject inputs that
    * already use them rather than silently clobbering or ambiguating
    * caller data (each operator only reserves its own names). */
  private val asofReserved = Set("__ts", "__side", "__rv")
  private val rangeReserved = Set("__bucket")
  private def requireFree(df: DataFrame, which: String,
                          reserved: Set[String]): Unit = {
    val clash = df.columns.toSet.intersect(reserved)
    require(clash.isEmpty,
      s"AsofOps: $which input uses reserved column name(s) ${clash.mkString(", ")}")
  }

  /** Microsecond-exact floor bucket over a micros Column (negative-safe:
    * pmod makes the numerator exactly divisible, so the double division
    * is exact — the repo's "div, not /" epoch-arithmetic convention). */
  private def floorBucketUs(us: Column, bucketUs: Long): Column =
    ((us - pmod(us, lit(bucketUs))) / lit(bucketUs)).cast("long")

  private def floorBucket(c: Column, bucketUs: Long): Column =
    floorBucketUs(unix_micros(c), bucketUs)

  /** Range (interval) join: each fact row joins every dimension interval
    * `[startCol, endCol)` containing its `ts`, on the same `key`.
    *
    * The naive form is a non-equi join (quadratic per key). This is the
    * bucketed form: intervals explode to the fixed-width time buckets
    * they overlap, facts hash to their single bucket, and the join runs
    * on (key, bucket) equality with a residual containment filter — the
    * standard scale shape when interval lengths are bounded (pick
    * `bucketMs` near the typical interval length to keep the explode
    * factor small).
    *
    * Buckets are computed at MICROSECOND resolution: the interval's top
    * bucket is the bucket of `end - 1µs` (the last contained instant),
    * so a fact in the final sub-millisecond slice of an interval is
    * never missed. Empty or inverted intervals (`end <= start`) explode
    * to zero buckets rather than a descending junk sequence. */
  def rangeJoin(facts: DataFrame, intervals: DataFrame, key: String,
                ts: String, startCol: String, endCol: String,
                bucketMs: Long): DataFrame = {
    requireFree(facts, "facts", rangeReserved)
    requireFree(intervals, "intervals", rangeReserved)
    val bucketUs = bucketMs * 1000L
    val startB = floorBucket(col(startCol), bucketUs)
    val endB = floorBucketUs(unix_micros(col(endCol)) - 1, bucketUs)
    val ivals = intervals.withColumn("__bucket",
      explode(when(endB >= startB, sequence(startB, endB))
        .otherwise(array().cast("array<bigint>"))))
    val keyedFacts = facts.withColumn("__bucket", floorBucket(col(ts), bucketUs))
    keyedFacts.join(ivals, Seq(key, "__bucket"))
      .filter(col(ts) >= col(startCol) && col(ts) < col(endCol))
      .drop("__bucket")
  }

  /** Interval-OVERLAP join: every (left, right) pair on the same `key`
    * whose half-open intervals intersect (`max(starts) < min(ends)`) —
    * the interval×interval sibling of [[rangeJoin]]'s point×interval.
    *
    * Same bucketed scale shape: both sides explode to the fixed-width
    * buckets they cover and the join runs on (key, bucket) equality
    * with the residual overlap filter — never a non-equi join. Each
    * overlapping pair would meet in EVERY shared bucket, so the pair
    * emits only from the bucket containing `max(starts)` (both
    * intervals contain that instant, and it lives in exactly one
    * bucket) — exactly-once without a distinct. Explode factor is
    * interval_length/bucket per side; pick `bucketMs` near the typical
    * interval length. Column names must not collide across sides
    * (rename before calling). */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame, key: String,
                          leftStart: String, leftEnd: String,
                          rightStart: String, rightEnd: String,
                          bucketMs: Long): DataFrame = {
    val bucketUs = bucketMs * 1000L
    def coveredBuckets(s: String, e: String): Column = {
      val sb = floorBucket(col(s), bucketUs)
      val eb = floorBucketUs(unix_micros(col(e)) - 1, bucketUs)
      explode(when(eb >= sb, sequence(sb, eb))
        .otherwise(array().cast("array<bigint>")))
    }
    val l = left.withColumn("__bucket", coveredBuckets(leftStart, leftEnd))
    val r = right.withColumn("__bucket", coveredBuckets(rightStart, rightEnd))
    val maxStart = greatest(col(leftStart), col(rightStart))
    l.join(r, Seq(key, "__bucket"))
      .filter(maxStart < least(col(leftEnd), col(rightEnd)))
      .filter(col("__bucket") === floorBucket(maxStart, bucketUs))
      .drop("__bucket")
  }
}
