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
}
