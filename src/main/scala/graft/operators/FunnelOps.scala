package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-event funnel analysis: how many users performed step 1, then
  * step 2 strictly after their earliest step-1 completion, then step 3
  * after that, and so on (first-touch chaining — taking the EARLIEST
  * qualifying time at each step is the greedy-optimal rule: it can only
  * enlarge the set of events eligible for the next step, so a user is
  * counted iff ANY strictly-increasing assignment of their events to the
  * step sequence exists).
  *
  * Scale shape: per-step state is one row per surviving user — the
  * frontier (user_id, earliest completion time) — never the raw event
  * list. Each step is filter(type) → join(frontier) on user_id →
  * groupBy(user_id).min, so step k costs a filtered scan plus a keyed
  * join against a monotonically shrinking frontier; once survivors fit
  * in a broadcast, AQE demotes the shuffle join automatically. Time
  * comparisons run on integral epoch-micros so the rule is replicable
  * at a fixed resolution in any engine.
  *
  * No reference analogue (nearest are the per-page revision chains in
  * experiments/ExtractTemporalTFDF.java:40-88); built for the events
  * table as large-pipeline analytics surface.
  */
object FunnelOps {

  /** Per-step reach counts over `steps` event types, in order:
    * (step 1-based, event_type, n_users). */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val ev = events.select(col(userCol).as("user_id"),
      col(typeCol).as("event_type"), unix_micros(col(tsCol)).as("tus"))
    // localCheckpoint each frontier (one row per surviving user — tiny):
    // without it, counting step k re-executes the whole filter/join
    // chain for steps 1..k — O(steps²) scans of the events relation.
    // LAZY: the count union at the end is the one action; a frontier's
    // two consumers (its own count + the next step's join) share the
    // groupBy's shuffle stage, so a concurrent first touch re-reads at
    // most one reduce stage — no per-step eager job needed.
    val first = ev.filter(col("event_type") === steps.head)
      .groupBy("user_id").agg(min(col("tus")).as("frontier"))
      .localCheckpoint(false)
    val frontiers = steps.tail.foldLeft(List(first)) { (acc, step) =>
      val next = ev.filter(col("event_type") === step)
        .join(acc.head, "user_id")
        .filter(col("tus") > col("frontier"))
        .groupBy("user_id").agg(min(col("tus")).as("frontier"))
        .localCheckpoint(false)
      next :: acc
    }.reverse
    frontiers.zip(steps).zipWithIndex.map { case ((frontier, step), i) =>
      frontier.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("step"), lit(step).as("event_type"),
          col("n_users"))
    }.reduce(_ unionByName _)
  }

  /** First-touch WINDOWED funnel (the ClickHouse-windowFunnel shape,
    * with a stated deterministic anchor): the whole chain must
    * complete within `windowUs` microseconds of the user's EARLIEST
    * step-1 event. Anchoring to the first step-1 occurrence (rather
    * than searching all anchors) keeps the rule first-touch-greedy and
    * engine-replicable — a user whose only completing chain starts at
    * a LATER step-1 event is deliberately not counted, and the oracle
    * replays the same law. Same per-step scale shape as [[funnel]]:
    * the frontier is one (user_id, anchor, frontier-time) row per
    * surviving user, lazily checkpointed per step. */
  def windowedFunnel(events: DataFrame, userCol: String, typeCol: String,
                     tsCol: String, steps: Seq[String],
                     windowUs: Long): DataFrame = {
    require(steps.nonEmpty, "windowedFunnel needs at least one step")
    require(windowUs > 0, s"windowUs must be positive, got $windowUs")
    val ev = events.select(col(userCol).as("user_id"),
      col(typeCol).as("event_type"), unix_micros(col(tsCol)).as("tus"))
    val first = ev.filter(col("event_type") === steps.head)
      .groupBy("user_id").agg(min(col("tus")).as("anchor"))
      .select(col("user_id"), col("anchor"),
        col("anchor").as("frontier"))
      .localCheckpoint(false)
    val frontiers = steps.tail.foldLeft(List(first)) { (acc, step) =>
      val next = ev.filter(col("event_type") === step)
        .join(acc.head, "user_id")
        .filter(col("tus") > col("frontier") &&
          col("tus") <= col("anchor") + windowUs)
        .groupBy("user_id")
        .agg(min(col("anchor")).as("anchor"),
          min(col("tus")).as("frontier"))
        .localCheckpoint(false)
      next :: acc
    }.reverse
    frontiers.zip(steps).zipWithIndex.map { case ((frontier, step), i) =>
      frontier.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("step"), lit(step).as("event_type"),
          col("n_users"))
    }.reduce(_ unionByName _)
  }
}
