package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventStreamOps
import graft.streaming.EventStreamOps.{Event, Session}
import graft.sources.GraftSinks

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowedCounts aggregates event-time windows under a watermark") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    val out = EventStreamOps.windowedCounts(
      mem.toDF(), "ts", "user_id", "10 minutes", "5 minutes")
    val q = out.writeStream.format("memory").queryName("wc")
      .outputMode("update").start()
    try {
      mem.addData(
        Event(1, ts("2024-01-01 00:01:00"), 1.0),
        Event(1, ts("2024-01-01 00:04:00"), 2.0),
        Event(2, ts("2024-01-01 00:12:00"), 3.0))
      q.processAllAvailable()
      val rows = spark.sql("select user_id, n_events from wc")
        .as[(Long, Long)].collect().toMap
      assert(rows == Map(1L -> 2L, 2L -> 1L))
    } finally q.stop()
  }

  test("sessionize closes a session after the gap and carries state across batches") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    val out = EventStreamOps.sessionize(mem.toDS(), gapMs = 60000L,
      idleTimeout = false) // deterministic: close via the later-event path
    val q = out.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      mem.addData(
        Event(1, ts("2024-01-01 00:00:00"), 1.0),
        Event(1, ts("2024-01-01 00:00:30"), 2.0))
      q.processAllAvailable()
      // second batch: an event far past the gap closes the first session
      mem.addData(Event(1, ts("2024-01-01 01:00:00"), 5.0))
      q.processAllAvailable()
      val sessions = spark.sql("select user_id, n_events, sum_value from sess")
        .as[(Long, Int, Double)].collect()
      assert(sessions.toSeq == Seq((1L, 2, 3.0)))
    } finally q.stop()
  }

  test("sinks: tsv, json, parquet, dictionary round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("sinks").toString
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    GraftSinks.writeTsv(df, s"$dir/tsv", compression = Some("bzip2"))
    GraftSinks.writeJson(df, s"$dir/json")
    GraftSinks.writeParquet(df, s"$dir/pq")
    assert(spark.read.option("sep", "\t").csv(s"$dir/tsv").count() == 2)
    assert(spark.read.json(s"$dir/json").count() == 2)
    assert(spark.read.parquet(s"$dir/pq").count() == 2)
    assert(GraftSinks.countOnly(df) == 2L)
    val dict = operators.TermOps.dictionary(
      Seq((1L, "x y"), (2L, "x")).toDF("doc_id", "text"), "doc_id", "text")
    GraftSinks.writeDictionary(dict, s"$dir/dict")
    val back = spark.read.parquet(s"$dir/dict")
    assert(back.columns.sorted.toSeq == Seq("cf", "df", "id", "term"))
    assert(back.count() == 2)
  }
}
