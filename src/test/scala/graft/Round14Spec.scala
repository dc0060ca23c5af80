package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-14 pins.
  *
  * 1. The libm-boundary canary for `stats_sequential` — the one gated
  *    output whose value chain passes through `ln`/`exp`, functions
  *    whose final ulp is NOT fixed by IEEE 754 and may legally differ
  *    between this JVM's StrictMath-backed codegen and the checker's
  *    DuckDB libm build. The query defends by rounding log_lambda to 4
  *    decimals BEFORE the running max and emitting p at 4 decimals;
  *    this spec closes the residual hole by asserting every UNROUNDED
  *    cell at all three SFs sits ≥ 1e-3 rounding-units clear of a
  *    round-4 (resp. round-6 for delta) half boundary — so a 1-ulp
  *    cross-libm difference (≈1e-16 relative) can never flip a rounded
  *    digit, and a future fixture that lands near a boundary fails HERE
  *    before it can fail in the driver's record.
  *
  * 2. Partition-order invariance for the queries whose unordered double
  *    sums were integer-scaled or order-pinned this round (stats_levene,
  *    stats_kruskal, stats_cuped, stats_calibration): re-running under a
  *    different shuffle layout must reproduce byte-identical rows.
  */
class Round14Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val allSfs = Seq("/root/testdata/sf0.001",
    "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  /** Distance of x from the nearest round-half boundary at `scale`
    * decimals, in rounding units: 0.5 = dead center of a rounding cell,
    * 0 = exactly ON a boundary (where a last-ulp libm difference flips
    * the rounded digit). */
  private def boundaryMargin(x: Double, scale: Int): Double = {
    val y = math.abs(x) * math.pow(10, scale)
    math.abs(y - math.floor(y) - 0.5)
  }

  /** The stats_sequential chain with the final rounds REMOVED: per-day
    * unrounded lnlam / delta, and the unrounded p-candidate exp(-lnmax)
    * (lnmax over the 4-decimal lnlam, exactly as the gated query runs
    * it). Mirrors SparkEntry's registered query line for line. */
  private def seqUnrounded(sf: String) = {
    val ev = Tables.table(spark, sf, "events").select(
      to_date(col("ts")).as("day"),
      (col("user_id") % 2 === 0).as("arma"),
      round(col("value") * 100).cast("long").as("v"))
    val sig = ev.agg(count(lit(1)).as("nn"), sum(col("v")).as("sv"),
        sum((col("v") * col("v")).cast("decimal(38,0)")).as("qv"))
      .select(round((col("nn").cast("double") * col("qv") -
          col("sv").cast("double") * col("sv")) /
        (col("nn").cast("double") * (col("nn") - 1)) / 10000.0, 6)
        .as("s2"))
    val daily = ev.groupBy(col("day"))
      .agg(sum(when(col("arma"), 1L).otherwise(0L)).as("na_d"),
        sum(when(col("arma"), col("v")).otherwise(0L)).as("sa_d"),
        sum(when(!col("arma"), 1L).otherwise(0L)).as("nb_d"),
        sum(when(!col("arma"), col("v")).otherwise(0L)).as("sb_d"))
    val wd = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.select(col("day"),
        sum(col("na_d")).over(wd).as("na"),
        sum(col("sa_d")).over(wd).as("sa"),
        sum(col("nb_d")).over(wd).as("nb"),
        sum(col("sb_d")).over(wd).as("sb"))
      .crossJoin(broadcast(sig))
      .withColumn("neff", (col("na") * col("nb")).cast("double") /
        (col("na") + col("nb")).cast("double"))
      .withColumn("delta", (col("sa").cast("double") / col("na") -
        col("sb").cast("double") / col("nb")) / 100.0)
      .withColumn("lnlam",
        lit(0.5) * log(col("s2") / (col("s2") + col("neff") * col("s2"))) +
          col("neff") * col("neff") * col("s2") * col("delta") * col("delta") /
            (lit(2.0) * col("s2") * (col("s2") + col("neff") * col("s2"))))
      .withColumn("lnmax", max(round(col("lnlam"), 4)).over(wd))
      .select(col("day"), col("delta"), col("lnlam"),
        exp(-col("lnmax")).as("pun"))
      .collect()
      .map(r => (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
  }

  test("stats_sequential boundary canary: every unrounded lnlam / p / " +
    "delta cell sits >= 1e-3 rounding-units from its boundary, all SFs") {
    for (sf <- allSfs) {
      val cells = seqUnrounded(sf)
      assert(cells.nonEmpty, s"no rows at $sf")
      for ((delta, lnlam, pun) <- cells) {
        val mL = boundaryMargin(lnlam, 4)
        assert(mL >= 1e-3,
          f"$sf: lnlam=$lnlam%.17g margin $mL%.3g < 1e-3 of a round-4 " +
            "boundary — a 1-ulp libm ln could flip the gated digit")
        val mD = boundaryMargin(delta, 6)
        assert(mD >= 1e-3,
          f"$sf: delta=$delta%.17g margin $mD%.3g < 1e-3 (round-6)")
        // p = least(1, exp(-lnmax)): when exp(-lnmax) >= 1 the emitted
        // cell is the exact literal 1.0 — no boundary to sit near
        if (pun < 1.0) {
          val mP = boundaryMargin(pun, 4)
          assert(mP >= 1e-3,
            f"$sf: p=$pun%.17g margin $mP%.3g < 1e-3 of a round-4 " +
              "boundary — a 1-ulp libm exp could flip the gated digit")
        }
      }
    }
  }

  // --- partition-order invariance for the r14 integer-scaled queries ---

  private def invariantUnderPartitioning(name: String): Unit = {
    val q = SparkEntry.queries(name)
    val sf = "/root/testdata/sf0.001"
    val base = q(spark, sf).collect().toSeq
    val old = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val alt = q(spark, sf).collect().toSeq
      assert(base.map(_.toString).sorted == alt.map(_.toString).sorted,
        s"$name output depends on partitioning")
    } finally spark.conf.set("spark.sql.shuffle.partitions", old)
  }

  test("stats_levene is invariant to input partitioning (cent-long " +
    "co-moments + event_type-ordered fold)") {
    invariantUnderPartitioning("stats_levene")
  }

  test("stats_kruskal is invariant to input partitioning (ordered " +
    "Σ R²/n fold)") {
    invariantUnderPartitioning("stats_kruskal")
  }

  test("stats_cuped is invariant to input partitioning (HUGEINT-class " +
    "cross products)") {
    invariantUnderPartitioning("stats_cuped")
  }

  test("stats_calibration is invariant to input partitioning (integer " +
    "conf/ECE numerators)") {
    invariantUnderPartitioning("stats_calibration")
  }

  // --- two-level (sampled-centroid) assignment -------------------------

  test("twoLevelAssign equals the flat argmax on well-separated clusters") {
    import spark.implicits._
    import graft.operators.ClusterOps
    // 3 near-orthogonal direction groups; mod-3 init matches the truth,
    // so the trained centroids are the group means and a correct router
    // must reproduce the flat assignment exactly
    def vec(axis: Int, eps: Double, d: Int = 8): Array[Double] =
      (0 until d).map(i => if (i == axis) 1.0 else eps * (i + 1)).toArray
    val emb = (0 until 30).map { i =>
      (i.toLong, vec(i % 3, 0.001 * (i / 3 + 1)))
    }.toDF("vec_id", "embedding")
    val (cents, asn) = ClusterOps.kmeansModel(emb, k = 3, iters = 2)
    val flat = asn.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val two = ClusterOps.twoLevelAssign(emb, cents, g = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(two == flat, s"two-level diverged: $two vs $flat")
  }

  // --- plan pins for the round's new rows -------------------------------

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString

  test("embed_knn_graph_auto meets in a shuffle join on the cell key — " +
    "the corpus is never broadcast") {
    val p = plan("embed_knn_graph_auto")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // cells ⋈ probes must be a keyed join (sort-merge or shuffled-hash),
    // never a corpus-sized broadcast side
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
  }

  test("text_pii_mask plans as a pure map: no exchange") {
    val p = plan("text_pii_mask")
    assert(!p.contains("Exchange"), p)
  }

  test("curate_mix_temperature aggregates once to the source tier and " +
    "broadcasts the one-row normalizer") {
    val p = plan("curate_mix_temperature")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("dedup_semantic_approx audit keeps full dropped-set recall on " +
    "the planted dups") {
    val row = SparkEntry.queries("dedup_semantic_approx")(
      spark, "/root/testdata/sf0.001").collect().head
    assert(row.getAs[Long]("n_dropped_exact") >= 2L)
    assert(row.getAs[Double]("drop_recall") == 1.0,
      s"planted near-identical dups must survive the two-level route: $row")
  }

  // --- process-shared stages move COST only, never results -------------

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("the process-shared PQ model reproduces a freshly trained " +
    "model's top-k bit-for-bit") {
    import graft.operators.SimilarityOps
    val sf = "/root/testdata/sf0.001"
    val emb = Tables.table(spark, sf, "embeddings")
      .withColumn("embedding", col("embedding").cast("array<double>"))
    val fresh = SimilarityOps.pqTopK(emb, emb.filter(col("vec_id") < 10),
        k = 5, model = Some(SimilarityOps.pqTrain(emb)))
      .select(col("query_id"), col("nbr_id"),
        round(col("adc"), 4).as("adc"), col("rank"))
    val shared = SparkEntry.queries("ann_pq_topk")(spark, sf)
    assert(rows(shared) == rows(fresh),
      "shared PQ model diverged from a fresh deterministic training")
  }

  test("the process-shared BM25 leg reproduces a fresh bm25Search " +
    "bit-for-bit") {
    import graft.operators.TermOps
    val sf = "/root/testdata/sf0.001"
    val fresh = TermOps.bm25Search(
      Tables.table(spark, sf, "documents"), "doc_id", "text",
      queryTerms = Seq("scan", "join", "merge"), k = 20)
    val shared = SparkEntry.queries("search_bm25")(spark, sf)
    assert(rows(shared) == rows(fresh),
      "shared BM25 leg diverged from a fresh postings chain")
  }

  test("the process-shared CC labels reproduce a fresh pair-gen + CC " +
    "chain bit-for-bit") {
    import graft.operators.DedupOps
    val sf = "/root/testdata/sf0.001"
    val fresh = DedupOps.connectedComponents(
        DedupOps.jaccardPairsPrefix(
          Tables.table(spark, sf, "documents"), "doc_id", "text",
          threshold = 0.5))
      .select(col("node").as("doc_id"), col("component"))
    val shared = SparkEntry.queries("dedup_components")(spark, sf)
    assert(rows(shared) == rows(fresh),
      "shared CC labels diverged from a fresh chain")
  }
}
