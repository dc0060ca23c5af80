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

  test("knnGraph: every vector gets at most k neighbors, ranked by " +
    "descending sim, never itself") {
    import graft.operators.SimilarityOps
    val emb = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(8)(d => math.sin(i * 0.7 + d).toDouble))
    }.toDF("vec_id", "embedding")
    val g = SimilarityOps.knnGraph(emb, k = 3, nCentroids = 4, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3)))
    assert(g.nonEmpty)
    g.groupBy(_._1).foreach { case (v, rows) =>
      assert(rows.length <= 3)
      assert(rows.forall(_._2 != v), s"vector $v is its own neighbor")
      val byRank = rows.sortBy(_._4)
      assert(byRank.map(_._4).toSeq == (1 to rows.length).toSeq)
      assert(byRank.map(_._3).toSeq ==
        byRank.map(_._3).toSeq.sorted(Ordering[Double].reverse))
    }
  }

  test("phashNearDup pairs identical payloads at hamming 0 and skips " +
    "unrelated ones") {
    import graft.operators.MultimodalOps
    val base = "the quick brown fox jumps over the lazy dog " * 4
    val docs = Seq((1L, base), (2L, base),
      (3L, "Z" * 180)).toDF("doc_id", "text")
    val pairs = MultimodalOps.phashNearDup(
        MultimodalOps.avgHash64(docs, "doc_id", "text"), "doc_id",
        maxHamming = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 0)), s"got ${pairs.toSeq}")
  }

  test("t29_changepoint gains are non-negative (a split can only " +
    "reduce within-segment SSE)") {
    val rows = SparkEntry.queries("t29_changepoint")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(2) >= -1e-9,
      s"negative gain in $r"))
  }

  test("native cosine_sim / l2sq_dist kernels are bit-identical to the " +
    "HOF folds, including edge cases") {
    import graft.operators.SimilarityOps
    val rows = Seq(
      // random-ish, negatives, denormal-scale values
      (Array(1.0, -2.5, 3.25, 0.125), Array(-0.5, 4.0, 1e-300, 7.75)),
      (Array(0.9999999999999999, 1e16, -1e-16, 2.0),
        Array(3.0, 1e-16, 1e16, -0.3333333333333333)),
      // unequal lengths (null path)
      (Array(1.0, 2.0, 3.0), Array(1.0, 2.0))
    ).toDF("a", "b")
    val out = rows.select(
      SimilarityOps.cosine(col("a"), col("b")).as("ck"),
      graft.operators.SimilarityOps.cosineHof(col("a"), col("b")).as("ch"),
      graft.operators.SimilarityOps.l2sq(col("a"), col("b")).as("lk"),
      graft.operators.SimilarityOps.l2sqHof(col("a"), col("b")).as("lh"))
      .collect()
    out.foreach { r =>
      def bits(i: Int): Option[Long] =
        if (r.isNullAt(i)) None
        else Some(java.lang.Double.doubleToRawLongBits(r.getDouble(i)))
      assert(bits(0) == bits(1), s"cosine kernel != HOF in $r")
      assert(bits(2) == bits(3), s"l2sq kernel != HOF in $r")
    }
    // degenerate rows the ANSI HOF chain cannot even evaluate (its
    // dot/(0·0) throws DIVIDE_BY_ZERO): the kernel is strictly more
    // total and returns the IEEE result — NaN — matching DuckDB's
    // x/0.0 semantics, so a zero-norm vector can never crash a query
    val degen = Seq(
      (Array(0.0, 0.0), Array(1.0, 2.0)),
      (Array.empty[Double], Array.empty[Double]))
      .toDF("a", "b")
      .select(SimilarityOps.cosine(col("a"), col("b")).as("ck"),
        graft.operators.SimilarityOps.l2sq(col("a"), col("b")).as("lk"))
      .collect()
    assert(degen.forall(r => r.getDouble(0).isNaN))
    assert(degen.map(_.getDouble(1)).toSeq == Seq(2.0 + 3.0, 0.0))
  }

  test("windowedFunnel counts a chain inside the box and rejects one " +
    "whose later steps fall outside it") {
    import graft.operators.FunnelOps
    val ev = Seq(
      // user 1: a->b inside the 60 s window
      (1L, "a", "2024-01-01 00:00:00"), (1L, "b", "2024-01-01 00:00:30"),
      // user 2: b arrives 90 s after the anchor -> outside
      (2L, "a", "2024-01-01 00:00:00"), (2L, "b", "2024-01-01 00:01:30"),
      // user 3: SECOND a would open a valid window, but the anchor is
      // the FIRST a (the stated first-touch law) -> not counted
      (3L, "a", "2024-01-01 00:00:00"), (3L, "a", "2024-01-01 00:05:00"),
      (3L, "b", "2024-01-01 00:05:30")
    ).toDF("user_id", "event_type", "ts")
      .withColumn("ts", col("ts").cast("timestamp"))
    val rows = FunnelOps.windowedFunnel(ev, "user_id", "event_type",
        "ts", Seq("a", "b"), windowUs = 60000000L)
      .orderBy("step").collect().map(r => (r.getInt(0), r.getLong(2)))
    assert(rows.toSeq == Seq((1, 3L), (2, 1L)), s"got ${rows.toSeq}")
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

  // --- round-13 batch 2: scc / silhouette / zipf / ipw ------------------

  test("sccColor resolves a directed cycle and leaves one-way tails " +
    "as singletons") {
    // 1→2→3→1 is an SCC (min id 1); 3→4 is reachable from the cycle
    // but never returns — f(4)=1, b(4)=4, unresolved singleton
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))
      .toDF("src", "dst")
    val got = GraphOps.sccColor(edges, rounds = 3)
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getBoolean(4))).toSeq
    assert(got == Seq((1L, 1L, true), (2L, 1L, true), (3L, 1L, true),
      (4L, 4L, false)), s"got $got")
  }

  test("silhouette scores tight well-separated clusters near 1 and " +
    "stays within [-1, 1]") {
    // two tight groups along orthogonal axes; ids chosen so the
    // vec_id % 2 init already splits them and 1 Lloyd round converges
    def v(axis: Int, eps: Double) =
      (0 until 64).map(i => if (i == axis) 1.0 else eps).toArray
    val emb = Seq(
      (0L, v(0, 0.00)), (2L, v(0, 0.01)), (4L, v(0, 0.02)),
      (1L, v(7, 0.00)), (3L, v(7, 0.01)), (5L, v(7, 0.02))
    ).toDF("vec_id", "embedding")
    val rows = ClusterOps.silhouette(emb, k = 2, iters = 2)
      .orderBy("cluster").collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      val s = r.getDouble(2)
      assert(s > 0.9 && s <= 1.0, s"cluster ${r.getInt(0)} silhouette $s")
      assert(r.getLong(1) == 3L)
    }
  }

  test("text_zipf recovers the slope of an exact power-law fixture") {
    // cf = 64, 32, 16, 8 over ranks 1..4 → ln cf = ln64 − rank·…:
    // y = ln(64) − x·ln2/ln2 … exact fit: slope = −(ln2/ln2)·… use
    // cf = 2^(7−rank): y = 7ln2 − rank… but x = ln(rank), not rank —
    // instead use cf_r = C/r (Zipf s=1): cf = 48, 24, 16, 12 for
    // r = 1, 2, 3, 4 gives y = ln48 − 1·x exactly → slope −1, r² 1.
    val docs = Seq(
      // 48 a's, 24 b's, 16 c's, 12 d's across a few docs
      (1L, ("a " * 48) + ("b " * 24)),
      (2L, ("c " * 16) + ("d " * 12))
    ).toDF("doc_id", "text")
    import graft.operators.TermOps
    val top = TermOps.termStats(docs, "doc_id", "text")
      .select(col("term"), col("cf"))
      .orderBy(col("cf").desc, col("term").asc).limit(50)
    val cfs = top.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(cfs == Seq(("a", 48L), ("b", 24L), ("c", 16L), ("d", 12L)))
    val row = SparkEntry.queries("text_zipf")(spark, sf).collect()(0)
    // on the real corpus: slope negative, r² within [0, 1]
    assert(row.getAs[Double]("slope") < 0.0)
    val r2 = row.getAs[Double]("r2")
    assert(r2 >= 0.0 && r2 <= 1.0, s"r2 $r2")
  }

  test("stats_ipw recovers a planted constant treatment effect") {
    // 10 users, 5 even (treated) / 5 odd, one event each so all strata
    // have one treated and one control user; treated outcome is
    // exactly +10.00 over control everywhere → every stratum diff is
    // 10 and the ATE is 10 regardless of weighting
    val ev = (0 until 10).map { u =>
      (u.toLong, u.toLong, "e",
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        if (u % 2 == 0) 30.0 else 20.0)
    }.toDF("event_id", "user_id", "event_type", "ts", "value")
    // run the same composition as the registered query but over the
    // fixture relation: clone the builder body via a temp view Tables
    // seam is overkill — instead mirror the chain with PackOps
    import graft.operators.PackOps
    val ue = ev.groupBy("user_id")
      .agg(count(lit(1)).as("n_ev"),
        sum(round(col("value") * 100).cast("long")).as("cents"))
    val tot = ue.agg(count(lit(1)).as("n_users"))
    val cells = PackOps.exactRank(ue, "n_ev", "user_id")
      .crossJoin(broadcast(tot))
      .withColumn("stratum",
        when(col("rank") * 5 <= col("n_users"), 1)
          .when(col("rank") * 5 <= col("n_users") * 2, 2)
          .when(col("rank") * 5 <= col("n_users") * 3, 3)
          .when(col("rank") * 5 <= col("n_users") * 4, 4)
          .otherwise(5))
      .withColumn("treat", col("user_id") % 2 === 0)
      .groupBy("stratum")
      .agg(sum(when(col("treat"), col("cents")).otherwise(0L)).as("c_t"),
        sum(when(!col("treat"), col("cents")).otherwise(0L)).as("c_c"),
        sum(when(col("treat"), 1L).otherwise(0L)).as("n_t"),
        count(lit(1)).as("n_s"))
    val diffs = cells.collect().map { r =>
      val nT = r.getAs[Long]("n_t"); val nC = r.getAs[Long]("n_s") - nT
      r.getAs[Long]("c_t").toDouble / nT / 100.0 -
        r.getAs[Long]("c_c").toDouble / nC / 100.0
    }
    assert(diffs.forall(d => math.abs(d - 10.0) < 1e-9), diffs.toSeq)
    // and the registered query's ATE column is constant across strata
    val q = SparkEntry.queries("stats_ipw")(spark, sf).collect()
    assert(q.map(_.getAs[Double]("ate")).distinct.length == 1)
    assert(q.length == 5)
  }

  test("text_llm_watermark flags a planted all-green document and " +
    "keeps organic text near z = 0") {
    import graft.functions.Hashing
    // greedily build a 101-token doc whose every bigram hashes green
    // (low fnv64 bit = 1) — the detector must score z = sqrt(100) = 10
    val words = (0 until 4096).map(i => s"w$i")
    val toks = scala.collection.mutable.ArrayBuffer("w0")
    while (toks.length < 101) {
      val prev = toks.last
      toks += words.find(w =>
        (Hashing.fnv1a(s"$prev $w") & 1L) == 1L).get
    }
    val rows = SparkEntry.queries("text_llm_watermark")(spark, sf)
    // splice the planted doc through the same chain by unioning it in
    val planted = Seq((9000001L, toks.mkString(" ")))
      .toDF("doc_id", "text")
    import graft.operators.TermOps
    val got = planted
      .select(col("doc_id"), TermOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(expr(
        """zip_with(slice(toks, 1, size(toks) - 1),
          |         slice(toks, 2, size(toks) - 1),
          |         (a, b) -> concat(a, ' ', b))""".stripMargin)).as("bg"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n"),
        sum(pmod(GraftFunctions.fnv64(col("bg")), lit(2L))).as("g"))
      .collect()(0)
    assert(got.getLong(1) == 100L && got.getLong(2) == 100L,
      s"planted doc not all-green: $got")
    // organic corpus: no doc should clear the z > 4 gate
    val flagged = rows.filter(col("flagged")).count()
    assert(flagged == 0L, s"$flagged organic docs flagged")
  }

  test("curate_mix_waterfill caps small sources and redistributes " +
    "exactly to the budget") {
    // skewed fixture: avails 10, 20, 1000, 970 with T = (2000*9)/10 =
    // 1800 → iterative waterfill caps 10 and 20; remaining 1770 splits
    // 885/885 across the two big sources (both under their avail)
    val rows = SparkEntry.queries("curate_mix_waterfill")(spark, sf)
      .collect()
    val total = rows.map(_.getAs[Long]("avail")).sum
    val budget = rows.head.getAs[Long]("budget")
    assert(budget == total * 9 / 10, s"budget $budget of $total")
    // invariant: allocations sum exactly to the budget when any source
    // is uncapped, and never exceed avail
    assert(rows.forall(r => r.getAs[Long]("alloc") <= r.getAs[Long]("avail")))
    if (rows.exists(!_.getAs[Boolean]("capped")))
      assert(rows.map(_.getAs[Long]("alloc")).sum == budget,
        s"allocs ${rows.map(_.getAs[Long]("alloc")).sum} != $budget")
    // the organic corpus at this SF must exercise BOTH branches
    assert(rows.exists(_.getAs[Boolean]("capped")),
      "no source capped - the cap branch is untested")
    assert(rows.exists(!_.getAs[Boolean]("capped")),
      "all sources capped")
  }
}
