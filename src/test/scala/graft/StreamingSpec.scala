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

  test("sessionizeEventTime emits identical sessions under shuffled micro-batch splits") {
    // the same event set, delivered (a) in order in one batch and (b) out
    // of order across three batches, must sessionize identically — the
    // event-time path's whole point
    def ms(m: Long) = new Timestamp(1700000000000L + m)
    val evts = Seq(
      Event(1, ms(0L), 1.0), Event(1, ms(30000L), 2.0),       // session A
      Event(1, ms(200000L), 5.0), Event(1, ms(210000L), 0.5), // session B
      Event(2, ms(10000L), 4.0))                              // session C
    val flush = Event(99, ms(10000000L), 0.0) // watermark pusher
    def run(name: String, batches: Seq[Seq[Event]]): Set[Session] = {
      implicit val sq = spark.sqlContext
      val mem = MemoryStream[Event]
      val q = EventStreamOps.sessionizeEventTime(mem.toDS(), gapMs = 60000L,
          watermark = "300 seconds")
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      } finally q.stop()
      spark.table(name).as[Session].collect().toSet
        .filter(_.user_id != 99L)
    }
    val inOrder = run("sess_et_a", Seq(evts, Seq(flush)))
    val shuffled = run("sess_et_b", Seq(
      Seq(evts(2), evts(4)),          // 200s and user-2 first
      Seq(evts(0), evts(3), evts(1)), // earlier events arrive later (in-watermark)
      Seq(flush)))
    val expected = Set(
      Session(1, 1700000000000L, 1700000030000L, 2, 3.0),
      Session(1, 1700000200000L, 1700000210000L, 2, 5.5),
      Session(2, 1700000010000L, 1700000010000L, 1, 4.0))
    assert(inOrder == expected)
    assert(shuffled == expected)
  }

  test("sessionizeEventTime flushes via timeout when the key sees no more data") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreamOps.sessionizeEventTime(mem.toDS(), gapMs = 60000L,
        watermark = "10 seconds")
      .writeStream.format("memory").queryName("sess_et_c")
      .outputMode("append").start()
    try {
      mem.addData(Event(1, ts("2024-01-01 00:00:00"), 1.0))
      q.processAllAvailable()
      // a different key pushes the watermark past user 1's session close;
      // user 1 itself has no new data — only the EventTimeTimeout can emit it
      mem.addData(Event(2, ts("2024-01-01 02:00:00"), 9.0))
      q.processAllAvailable()
      val sessions = spark.sql(
        "select user_id, n_events, sum_value from sess_et_c where user_id = 1")
        .as[(Long, Int, Double)].collect()
      assert(sessions.toSeq == Seq((1L, 1, 1.0)))
    } finally q.stop()
  }

  test("dedupWithinWatermark drops live-key duplicates and re-admits evicted keys") {
    implicit val sq = spark.sqlContext
    def ms(m: Long) = new Timestamp(1700000000000L + m)
    val mem = MemoryStream[Event]
    val q = EventStreamOps.dedupWithinWatermark(mem.toDF(), Seq("user_id"),
        "ts", "1 minute")
      .writeStream.format("memory").queryName("dedup_st")
      .outputMode("append").start()
    try {
      mem.addData(Event(1, ms(0L), 1.0), Event(1, ms(0L), 1.0), // in-batch dup
        Event(2, ms(10000L), 2.0))
      q.processAllAvailable()
      mem.addData(Event(1, ms(30000L), 9.0)) // cross-batch dup, state live
      q.processAllAvailable()
      val afterDups = spark.table("dedup_st")
        .as[Event].collect().map(e => (e.user_id, e.value)).sorted.toSeq
      assert(afterDups == Seq((1L, 1.0), (2L, 2.0)))
      // watermark pusher evicts both keys' state …
      mem.addData(Event(9, ms(3600000L), 0.0))
      q.processAllAvailable()
      // … so key 2 re-admits, while a late replay of key 1 (ts < wm) drops
      mem.addData(Event(2, ms(3600000L), 7.0), Event(1, ms(100000L), 9.9))
      q.processAllAvailable()
      val finalRows = spark.table("dedup_st").filter($"user_id" =!= 9L)
        .as[Event].collect().map(e => (e.user_id, e.value)).sorted.toSeq
      assert(finalRows == Seq((1L, 1.0), (2L, 2.0), (2L, 7.0)))
    } finally q.stop()
  }

  test("intervalJoin matches right rows only inside the per-key time window") {
    implicit val sq = spark.sqlContext
    def ms(m: Long) = new Timestamp(1700000000000L + m)
    val imps = MemoryStream[Event]
    val clicks = MemoryStream[Event]
    val q = EventStreamOps.intervalJoin(imps.toDF(), clicks.toDF(),
        "user_id", "ts", "value", "1 minute", "30 minutes")
      .writeStream.format("memory").queryName("ij_st")
      .outputMode("append").start()
    try {
      imps.addData(Event(1, ms(0L), 100.0), Event(2, ms(10000L), 200.0))
      q.processAllAvailable()
      clicks.addData(
        Event(1, ms(300000L), 1.0),  // 5 min after user-1 impression
        Event(1, ms(600000L), 2.0),  // 10 min after — also matches
        Event(2, ms(2400000L), 3.0), // 39:50 after user-2 impression — out
        Event(3, ms(300000L), 4.0))  // no impression for user 3
      q.processAllAvailable()
      val rows = spark.table("ij_st")
        .select($"user_id", $"right_value").as[(Long, Double)]
        .collect().sorted.toSeq
      assert(rows == Seq((1L, 1.0), (1L, 2.0)))
    } finally q.stop()
  }

  test("sinks: tsv, json, parquet, dictionary round-trip") {
    val dir = graft.Scratch.dir("sinks").toString
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
