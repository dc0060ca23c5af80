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
}
