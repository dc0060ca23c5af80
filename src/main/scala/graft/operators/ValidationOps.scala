package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (the Deequ/Great-Expectations
  * pattern): a check list evaluates in ONE aggregation pass over the
  * table — each check contributes a conditional-count column to a single
  * Aggregate, and the wide one-row result unpivots to
  * (check_name, n_violations, pass) rows.
  *
  * The one-pass shape is the whole point at 100 TB: N checks cost one
  * scan, not N scans, and the violation counters combine map-side like
  * any other partial aggregate. Uniqueness checks (count − count
  * distinct per key) ride the SAME Aggregate via Spark's Expand — still
  * a single pass over the data.
  *
  * Checks are violation PREDICATES (true = this row violates), so the
  * caller writes them positively ("n_chars <= 0") and null semantics
  * stay explicit in the predicate — a null that should count as a
  * violation must be caught with isNull/coalesce in the check itself,
  * exactly as in SQL.
  */
object ValidationOps {

  /** Evaluate row-level violation predicates plus key-uniqueness checks
    * in one aggregation pass. `checks` maps check name → violation
    * predicate; `uniqueKeys` maps check name → column that must be
    * unique (violations = count − count distinct = number of surplus
    * duplicate rows). */
  def expectations(df: DataFrame, checks: Seq[(String, Column)],
                   uniqueKeys: Seq[(String, String)] = Nil): DataFrame = {
    require(checks.nonEmpty || uniqueKeys.nonEmpty, "no checks given")
    val names = checks.map(_._1) ++ uniqueKeys.map(_._1)
    require(names.distinct.size == names.size, s"duplicate check names: $names")
    val aggs =
      checks.map { case (n, viol) =>
        sum(when(viol, lit(1L)).otherwise(lit(0L))).as(n)
      } ++ uniqueKeys.map { case (n, k) =>
        (count(col(k)) - countDistinct(col(k))).as(n)
      }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(names.map(n =>
        struct(lit(n).as("check_name"),
          coalesce(col(n), lit(0L)).as("n_violations"))): _*)).as("e"))
      .select(col("e.check_name").as("check_name"),
        col("e.n_violations").as("n_violations"),
        (col("e.n_violations") === 0L).as("pass"))
  }

  /** Two-sample Kolmogorov-Smirnov drift statistic per group: the max
    * absolute gap between the empirical CDFs of side A (`sideB` false)
    * and side B (true) — the standard distribution-shift monitor between
    * a reference batch and a new batch (expectations catch CONSTRAINT
    * violations; this catches the distribution moving while every
    * constraint still passes).
    *
    * Rank-exact and engine-replayable: both ECDFs are cumulative counts
    * over the per-value cells, so the statistic is a max over ratios of
    * exact longs — no approximation, no libm. Shape: one aggregation to
    * (group, value) cells with per-side conditional counts, one
    * per-group cumulative window over those cells, one max-agg. Cell
    * count = distinct values per group; for high-cardinality continuous
    * columns compose with the fixed-bin histogram first (the KS of the
    * binned ECDFs bounds the true KS within one bin's mass).
    *
    * Output: (group, n_a, n_b, ks). Groups present on only one side
    * produce a degenerate 0/0 division — keep both batches non-empty
    * per group (the monitoring use case guarantees it). */
  def ksDrift(df: DataFrame, groupCol: String, valCol: String,
              sideB: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = df
      .select(col(groupCol), col(valCol).as("v"),
        when(sideB, lit(1L)).otherwise(lit(0L)).as("b"))
      .groupBy(col(groupCol), col("v"))
      .agg(sum(lit(1L) - col("b")).as("ca"), sum(col("b")).as("cb"))
    val totals = cells.groupBy(col(groupCol))
      .agg(sum("ca").as("n_a"), sum("cb").as("n_b"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("v"))
    cells
      .withColumn("cuma", sum("ca").over(w))
      .withColumn("cumb", sum("cb").over(w))
      .join(broadcast(totals), Seq(groupCol))
      .select(col(groupCol), col("n_a"), col("n_b"),
        abs(col("cuma").cast("double") / col("n_a").cast("double") -
          col("cumb").cast("double") / col("n_b").cast("double")).as("d"))
      .groupBy(col(groupCol), col("n_a"), col("n_b"))
      .agg(round(max(col("d")), 6).as("ks"))
  }

  /** CUSUM changepoint locator over a per-(group, tick) count series:
    * the tick t* maximizing |S_t|, S_t = Σ_{i≤t}(x_i − μ) — where the
    * cumulative deviation from the series mean peaks, i.e. the
    * maximum-likelihood location of a single mean shift. The
    * level-shift sibling of [[rollingZScore]] (which flags local
    * spikes; CUSUM finds WHERE the baseline moved — the "did the feed
    * change on the 14th?" question).
    *
    * Exactness: μ = T/N never materializes — the statistic is scaled
    * by N (|N·C_t − t·T|, C_t the cumulative count), so every compared
    * value is an exact integer product and the argmax (ties → earlier
    * tick) is engine-exact. Shape: one exchange on the group key
    * (cumulative window + rank window share it); the per-group totals
    * broadcast. Long bound: N·C_t ≤ days × total — safe to ~10⁹ rows
    * per group-tick series.
    *
    * Output: (group, cp_tick, n_at_cp, scaled_dev, max_dev) — one row
    * per group; max_dev = scaled_dev / N is the unscaled |S_t*|. */
  def cusumChangepoint(counts: DataFrame, groupCol: String,
                       tickCol: String, nCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol)).orderBy(col(tickCol))
    val cum = counts
      .withColumn("tindex", row_number().over(w).cast("long"))
      .withColumn("ct", sum(col(nCol)).over(w))
    val tot = counts.groupBy(col(groupCol))
      .agg(count(lit(1)).as("nn"), sum(col(nCol)).as("tt"))
    cum.join(broadcast(tot), Seq(groupCol))
      .withColumn("sdev",
        abs(col("ct") * col("nn") - col("tindex") * col("tt")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col(groupCol)).orderBy(col("sdev").desc,
          col(tickCol).asc)))
      .filter(col("rn") === 1)
      .select(col(groupCol), col(tickCol).as("cp_tick"),
        col(nCol).as("n_at_cp"), col("sdev").as("scaled_dev"),
        round(col("sdev").cast("double") / col("nn").cast("double"), 4)
          .as("max_dev"))
  }

  /** Pearson chi-squared statistic of independence between two
    * categorical columns — the association monitor beside [[ksDrift]]:
    * KS watches ONE distribution move between batches; this watches two
    * attributes COUPLE (is language independent of source? did the
    * lang×source mix shift structurally?). A large chi² against the
    * (|A|−1)(|B|−1) dof says the contingency table's cells diverge from
    * the margins' product.
    *
    * Exactness contract: observed counts and margins are exact longs;
    * each cell's term is ((n·N − rₐ·c_b)²) / (N·rₐ·c_b) — the
    * expected-count form cleared of fractions — with the square taken
    * AFTER one exact-integer difference converts to double (n·N and
    * N·rₐ·c_b stay in long up to ~3·10⁹ rows; beyond that, test on a
    * stratified sample). The cell terms are summed by an ORDERED fold
    * over the (a, b)-sorted cell array — the contingency table is
    * |A|×|B| cells, tiny by construction — so both engines add the
    * same doubles in the same order. Absent cells enter as n = 0 via
    * the margins' cross product (required: their expected counts still
    * contribute).
    *
    * Output: one row (n_cells, dof, chi2). */
  def chiSquare(df: DataFrame, colA: String, colB: String): DataFrame = {
    val obs = df.groupBy(col(colA).as("a"), col(colB).as("b"))
      .agg(count(lit(1)).as("n"))
    val ra = obs.groupBy("a").agg(sum("n").as("ra"))
    val cb = obs.groupBy("b").agg(sum("n").as("cb"))
    val tot = obs.agg(sum("n").as("nn"))
    val grid = ra.crossJoin(broadcast(cb)).crossJoin(broadcast(tot))
      .join(obs, Seq("a", "b"), "left")
      .select(col("a"), col("b"), col("ra"), col("cb"), col("nn"),
        coalesce(col("n"), lit(0L)).as("n"))
    // n·N and ra·cb are ~N², N·ra·cb is ~N³ — DECIMAL(38,0) products
    // (HUGEINT in a replaying oracle) stay exact far past the BIGINT
    // ceiling; one cast to double after each exact difference/product
    val dnum = (col("n").cast("decimal(38,0)") * col("nn") -
      col("ra").cast("decimal(38,0)") * col("cb")).cast("double")
    val terms = grid.select(struct(col("a"), col("b"),
      (dnum * dnum / (col("nn").cast("decimal(38,0)") * col("ra") *
        col("cb")).cast("double"))
        .as("t")).as("s"))
    terms
      .agg(countDistinct(col("s.a")).as("na"),
        countDistinct(col("s.b")).as("nb"),
        array_sort(collect_list(col("s"))).as("arr"))
      .select(size(col("arr")).as("n_cells"),
        ((col("na") - 1L) * (col("nb") - 1L)).cast("int").as("dof"),
        round(aggregate(col("arr"), lit(0.0d),
          (acc, x) => acc + x.getField("t")), 4).as("chi2"))
  }

  /** ROC AUC of a score against a boolean label — the standard ranking
    * metric for evaluating a quality classifier / filter score before it
    * gates a corpus (does the score actually separate the class?). The
    * drift/expectations monitors above watch the DATA; this watches the
    * MODEL output that curation decisions hang off.
    *
    * Computed as the tie-corrected Mann-Whitney U: aggregate to per-value
    * cells (n, n_pos), one cumulative window over the ORDERED DISTINCT
    * score values for tie-group average ranks, then a single aggregate.
    * `r2` holds 2× the average rank so every intermediate stays an exact
    * integer — the whole statistic is integer arithmetic until one final
    * double division, which any engine replays bit-identically. The
    * unpartitioned window runs on the value-aggregated relation (distinct
    * scores ≪ rows — the ksDrift/dictionary-rank precedent), and the
    * integer form holds to ~2^31 rows per evaluation (r2pos ≤ 2N²);
    * beyond that, evaluate per-stratum and average.
    *
    * Output: one row (n_pos, n_neg, auc). AUC 0.5 = no separation;
    * degenerate single-class input yields null (0/0 division). */
  def rocAuc(df: DataFrame, score: Column, label: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = df
      .select(score.as("v"), when(label, lit(1L)).otherwise(lit(0L)).as("y"))
      .groupBy(col("v"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("npos"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // 2 × (average rank of the tie group at value v) = 2·cum − n + 1
    val ranked = cells.withColumn("r2",
      lit(2L) * sum(col("n")).over(w) - col("n") + lit(1L))
    // ΣR2⁺ and np(np+1) reach ~2n² — DECIMAL(38,0) accumulators
    // (HUGEINT in a replaying DuckDB oracle) keep them exact past the
    // ~2·10⁹-row BIGINT ceiling
    ranked
      .agg(sum((col("npos").cast("decimal(38,0)") * col("r2")))
          .as("r2pos"),
        sum(col("npos")).as("np"), sum(col("n") - col("npos")).as("nn"))
      .select(col("np").as("n_pos"), col("nn").as("n_neg"),
        round((col("r2pos") - col("np").cast("decimal(38,0)") *
            (col("np") + lit(1L))).cast("double")
          / (lit(2.0) * col("np").cast("double") * col("nn").cast("double")),
          6).as("auc"))
  }

  /** Rolling z-score anomaly detection over a per-(group, tick) series —
    * the volume-spike monitor (did today's event count jump > 3σ off its
    * trailing week?). The trailing frame excludes the current row, so a
    * spike can't mask itself by inflating its own baseline.
    *
    * Mean and variance come from exact integer sums (Σx, Σx²) over a
    * ROWS frame; z is ONE fixed-order double expression over those
    * integers — engine-replayable, unlike stddev_samp whose internal
    * accumulation order differs per engine. Integer-exact guard
    * `s2·cnt − s1² > 0` (variance strictly positive) and `cnt ≥ minPts`
    * gate the division, so a flat baseline yields null, never NaN/Inf.
    * Shape: one shuffle on the group key, then per-partition sorted
    * frames; state per row is O(1). Long-exactness bound: x²·lookback
    * per frame — holds to ~10⁹ events/tick/group.
    *
    * Output: (group, tick, n, z, anomaly) for every input row; `anomaly`
    * = |z| ≥ 3 (false where z is null). */
  def rollingZScore(counts: DataFrame, groupCol: String, tickCol: String,
                    nCol: String, lookback: Int = 7, minPts: Int = 3)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol)).orderBy(col(tickCol))
      .rowsBetween(-lookback, -1)
    counts
      .withColumn("s1", sum(col(nCol)).over(w))
      .withColumn("s2", sum(col(nCol) * col(nCol)).over(w))
      .withColumn("cnt", count(col(nCol)).over(w))
      .withColumn("z",
        when(col("cnt") >= minPts &&
            col("s2") * col("cnt") - col("s1") * col("s1") > 0L,
          round((((col(nCol) * col("cnt") - col("s1")).cast("double")) /
              col("cnt").cast("double")) /
            sqrt((col("s2") * col("cnt") - col("s1") * col("s1"))
              .cast("double") /
              (col("cnt") * (col("cnt") - lit(1L))).cast("double")), 4)))
      .select(col(groupCol), col(tickCol), col(nCol), col("z"),
        coalesce(abs(col("z")) >= 3.0, lit(false)).as("anomaly"))
  }
}
