package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{ClusterOps, FunnelOps, GraphOps}

/** Round-13 pins: the lazy-checkpoint law applied to the graph /
  * cluster / funnel fixpoints (job counts stay O(1) in the round
  * count, where the eager variants paid ≥1 materialization job per
  * round), and partition-order invariance of stats_sequential's
  * integer-scaled variance co-moments (the r12 red row). */
class Round13Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** Count Spark jobs submitted while `action` runs. */
  private def jobsDuring(action: => Unit): Int = {
    val n = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        n.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    // listener events are async; a short quiesce after the action is
    // enough for onJobStart (jobs are submitted synchronously before
    // their first result returns, the sleep only covers bus dispatch)
    try { action; Thread.sleep(300) }
    finally spark.sparkContext.removeSparkListener(l)
    n.get()
  }

  // --- lazy fixpoint checkpoints: job budget per extra round -----------

  // Under AQE, `toRdd` (which every localCheckpoint calls) eagerly
  // materializes the non-final query stages as their own jobs — so a
  // round's REAL shuffle work costs ~2 jobs regardless of checkpoint
  // mode, and what eagerness adds on top is exactly one extra
  // final-stage materialization job per checkpoint. The pin is the
  // total (construction + action) job budget per extra round: lazy
  // kcore measures ~2/round; the eager variant measured ~3/round (the
  // r12 driver-bench floor). A chain graph forces real peel progress.
  private def chainEdges(n: Int): DataFrame =
    (0 until n).map(i => (i.toLong, i + 1L)).toDF("src", "dst")

  test("kcore stays within ~2 jobs per extra peel round (lazy " +
    "checkpoints; eager measured ~3/round)") {
    val e = chainEdges(40)
    def run(rounds: Int): Int =
      jobsDuring(GraphOps.kcore(e, k = 2, rounds = rounds).count())
    val r2 = run(2)
    val r6 = run(6)
    assert(r6 - r2 <= 10, s"jobs per extra round too high: rounds=2 -> " +
      s"$r2, rounds=6 -> $r6 (eager per-round materialization is back?)")
  }

  test("funnel answers are exact after the lazy frontier sweep") {
    val ev = Seq(
      (1L, "a", "2024-01-01 00:00:00"), (1L, "b", "2024-01-01 00:01:00"),
      (1L, "c", "2024-01-01 00:02:00"), (1L, "d", "2024-01-01 00:03:00"),
      (2L, "a", "2024-01-01 00:00:00"), (2L, "b", "2024-01-01 00:05:00"),
      (3L, "a", "2024-01-01 00:00:00")
    ).toDF("user_id", "event_type", "ts")
      .withColumn("ts", col("ts").cast("timestamp"))
    val rows = FunnelOps.funnel(ev, "user_id", "event_type", "ts",
        Seq("a", "b", "c", "d"))
      .orderBy("step").collect().map(r => (r.getInt(0), r.getLong(2)))
    assert(rows.toSeq == Seq((1, 3L), (2, 2L), (3, 1L), (4, 1L)))
  }

  test("Lloyd training still assigns every vector after the lazy " +
    "centroid sweep") {
    val emb = (0 until 60).map { i =>
      (i.toLong, Array.tabulate(4)(d => ((i * 7 + d * 3) % 11).toDouble))
    }.toDF("vec_id", "embedding")
    val assigned = ClusterOps.kmeansAssign(emb, k = 3, iters = 4)
    assert(assigned.count() == 60)
    assert(assigned.select("cluster").distinct().count() <= 3)
  }

  // --- lazy checkpoints change no answers ------------------------------

  test("kcore/pagerank answers are unchanged by the lazy sweep " +
    "(spot values on a known graph)") {
    // triangle + pendant: kcore(k=2) keeps exactly the triangle
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("src", "dst")
    val core = GraphOps.kcore(e, k = 2, rounds = 3)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(core.toSeq == Seq((1L, 2L), (2L, 2L), (3L, 2L)))
    val ranks = GraphOps.pagerank(Seq((1L, 2L), (1L, 3L), (2L, 3L))
      .toDF("src", "dst"), iters = 1)
    val total = ranks.agg(sum("rank")).head.getDouble(0)
    assert(math.abs(total - (0.15 + 0.85 * (1.0 - 1.0 / 3.0))) < 1e-12)
  }

  // --- r13 operator batch edge cases -----------------------------------

  test("bpeTrain learns the expected merges on a known tiny corpus") {
    import graft.operators.TermOps
    // word table: low ×3, lower ×2, west ×1  →  adjacent pair counts
    // round 1: (l,o) 5, (o,w) 5, (w,e) 3, ... tie (l,o)=(o,w) breaks
    // to the lexicographically smaller left: (l,o)
    val docs = Seq((1L, "low low lower"), (2L, "low lower west"))
      .toDF("doc_id", "text")
    val m = TermOps.bpeTrain(docs, "doc_id", "text", rounds = 3)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // corpus word types: low (cnt 2... per-word occurrences: tokens
    // low,low,lower,low,lower,west → low×3, lower×2, west×1
    // r1 pairs: l-o 5, o-w 5, w-e 3, e-r 2, e-s 1, s-t 1 → (l,o)
    assert(m(0) == ((1, "l", "o", 5L)), s"r1 was ${m(0)}")
    // r2 symbols: [lo,w]×3, [lo,w,e,r]×2, [w,e,s,t] → (lo,w) 5
    assert(m(1) == ((2, "lo", "w", 5L)), s"r2 was ${m(1)}")
    // r3: [low]×3, [low,e,r]×2, [w,e,s,t] → (low,e) 2, (e,r) 2,
    // (w,e) 1, (e,s) 1, (s,t) 1 → tie breaks to left 'e' < 'low'
    assert(m(2) == ((3, "e", "r", 2L)), s"r3 was ${m(2)}")
  }

  test("bpeTrain's merge fold is greedy left-to-right ('aaaa' style " +
    "runs merge in non-overlapping pairs)") {
    import graft.operators.TermOps
    val docs = Seq((1L, "aaaa aaaa aa")).toDF("doc_id", "text")
    // word types: aaaa (cnt 2), aa (cnt 1); r1 pairs: (a,a) has
    // 3 positions in aaaa ×2 + 1 in aa = 7
    val m = TermOps.bpeTrain(docs, "doc_id", "text", rounds = 2)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m(0) == ((1, "a", "a", 7L)))
    // greedy LTR: aaaa → [aa, aa], aa → [aa]; r2 pairs: (aa,aa) 2
    assert(m(1) == ((2, "aa", "aa", 2L)), s"r2 was ${m(1)} — the fold " +
      "must merge non-overlapping pairs left-to-right")
  }

  test("ktruss keeps the 4-clique and drops pendant triangles at k=4") {
    // 4-clique on {1,2,3,4}: every edge sits in 2 triangles → survives
    // k=4 (support ≥ 2); the pendant triangle {4,5,6} has support-1
    // edges → dies in round 1
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (4L, 6L), (5L, 6L)).toDF("src", "dst")
    val out = GraphOps.ktruss(e, k = 4, rounds = 2)
      .orderBy("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 2L, 2L), (1L, 3L, 2L), (1L, 4L, 2L),
      (2L, 3L, 2L), (2L, 4L, 2L), (3L, 4L, 2L)), s"got ${out.toSeq}")
  }

  test("search_hybrid normalized scores stay in [0, 1] and the fused " +
    "score is their midpoint") {
    val rows = SparkEntry.queries("search_hybrid")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nt, nv, h) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(nt >= 0.0 && nt <= 1.0 && nv >= 0.0 && nv <= 1.0)
      assert(math.abs(h - (0.5 * nt + 0.5 * nv)) < 2e-6)
    }
  }

  test("mm_phash plans as a pure map: no exchange in the plan") {
    val df = SparkEntry.queries("mm_phash")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"mm_phash should be exchange-free, got:\n$plan")
  }

  // --- stats_sequential co-moment determinism (the r12 red row) --------

  test("stats_sequential is invariant to input partitioning (exact " +
    "integer co-moments feed the ln/exp chain)") {
    val q = SparkEntry.queries("stats_sequential")
    val base = q(spark, sf).collect().toSeq
    // same query over a deliberately re-partitioned events relation:
    // partial-aggregation order changes; exact BIGINT co-moments make
    // the doubles identical anyway. (The r12 bug summed raw doubles —
    // partition order leaked into the final ulps.)
    val old = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val alt = q(spark, sf).collect().toSeq
      assert(base.map(_.toString).sorted == alt.map(_.toString).sorted,
        "stats_sequential output depends on partitioning")
    } finally spark.conf.set("spark.sql.shuffle.partitions", old)
  }
}
