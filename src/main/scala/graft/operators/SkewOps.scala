package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY §2.6 O5 — the reference salts reduce keys by
  * wall-clock, FastExtractTemporalAnchorText.java:94-97; here salting is
  * deterministic and two-phase so results are exact).
  *
  * `saltedSum`: phase 1 aggregates on (key, salt) — skewed keys spread
  * over `salts` reducers with map-side partial aggregation; phase 2
  * merges the per-salt partials on the now low-cardinality (key) space.
  * At 100 TB this bounds the largest reduce partition by 1/salts at the
  * cost of one extra (tiny) shuffle; AQE's skew handling covers joins,
  * this covers aggregations with pathological key skew.
  */
object SkewOps {

  def saltedSum(df: DataFrame, key: String, valueCol: String,
                salts: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(hash(col(key), monotonically_increasing_id()), lit(salts)))
    salted.groupBy(col(key), col("_salt"))
      .agg(sum(col(valueCol)).as("_partial_sum"), count(lit(1)).as("_partial_n"))
      .groupBy(col(key))
      .agg(sum(col("_partial_sum")).as(s"sum_$valueCol"),
        sum(col("_partial_n")).as("n_rows"))
  }
}
