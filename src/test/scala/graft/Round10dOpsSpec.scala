package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.AsofOps

/** Round-10 fourth-batch operator pins: the nearest-in-time as-of join's
  * direction, tie, and no-match semantics on a crafted trace. */
class Round10dOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("asofNearest picks the closer neighbor from either direction, " +
    "prefers prev on ties, and yields nulls with no candidate") {
    val left = Seq(
      (100L, ts(100), 1L), // prev@90 (d=10) beats next@150 (d=50)
      (101L, ts(140), 1L), // next@150 (d=10) beats prev@90 (d=50)
      (102L, ts(120), 1L), // exact tie d=30: prev@90 wins
      (103L, ts(50), 1L),  // before all: next@90
      (104L, ts(999), 2L)  // key with no right rows at all
    ).toDF("event_id", "t", "k")
    val right = Seq(
      (ts(90), 1L, 900L), (ts(150), 1L, 1500L)
    ).toDF("t", "k", "v")
    val out = AsofOps.asofNearest(left, right, "k", "t", Seq("v"))
      .collect().map(r => r.getAs[Long]("event_id") ->
        ((Option(r.getAs[java.sql.Timestamp]("matched_ts")).map(_.getTime / 1000),
          Option(r.getAs[Any]("delta")).map(_.asInstanceOf[Long]),
          Option(r.getAs[Any]("v")).map(_.asInstanceOf[Long])))).toMap
    assert(out(100L) == ((Some(90L), Some(10L), Some(900L))))
    assert(out(101L) == ((Some(150L), Some(10L), Some(1500L))))
    assert(out(102L) == ((Some(90L), Some(30L), Some(900L))))
    assert(out(103L) == ((Some(90L), Some(40L), Some(900L))))
    assert(out(104L) == ((None, None, None)))
  }

  test("asofNearest matches a right row at the exact left timestamp " +
    "at distance zero") {
    val left = Seq((1L, ts(90), 1L)).toDF("event_id", "t", "k")
    val right = Seq((ts(90), 1L, 900L), (ts(91), 1L, 910L))
      .toDF("t", "k", "v")
    val r = AsofOps.asofNearest(left, right, "k", "t", Seq("v"))
      .select("delta", "v").head
    assert(r.getLong(0) == 0L && r.getLong(1) == 900L)
  }

  test("asofNearest agrees with asofJoin whenever the previous " +
    "neighbor is the closer one") {
    val sf = "/root/testdata/sf0.001"
    val ev = Tables.table(spark, sf, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("ts"), col("user_id"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("view_id"))
    val near = AsofOps.asofNearest(purchases, views, "user_id", "ts",
      Seq("view_id"))
    val asof = AsofOps.asofJoin(purchases, views, "user_id", "ts",
        Seq("view_id"))
      .withColumnRenamed("view_id", "asof_view_id")
    // wherever nearest chose the PRECEDING side, it must equal as-of
    val both = near.join(asof, Seq("user_id", "ts", "event_id"))
      .filter(col("matched_ts") <= col("ts"))
    assert(both.filter(col("view_id") =!= col("asof_view_id")).count() == 0)
    assert(both.count() > 0)
  }
}
