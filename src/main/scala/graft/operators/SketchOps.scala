package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distinct-count sketching (driver brief: sketches as first-class
  * custom operators). KMV — k minimum values — rather than HLL:
  * with a fixed hash the k smallest hash values of a set are a
  * DETERMINISTIC function of the set, so the estimate is reproducible
  * across engines and oracle-checkable (Spark's approx_count_distinct
  * HLL++ is not replicable in DuckDB). Estimator: the k-th smallest of
  * n distinct uniform hashes in [0, M) sits near k·M/n, so
  * n̂ = (k-1)·M / h_k (the unbiased form; Beyer et al., "On synopses
  * for distinct-value estimation under multiset operations",
  * SIGMOD 2007).
  *
  * Scale shape: hash is the codegen'd `hash32` column form, the k
  * smallest distinct hashes come from distinct + orderBy+limit
  * (TakeOrderedAndProject: per-partition top-k heaps, no global sort),
  * so the sketch costs one map pass + one k-row collect-free reduce.
  * Mergeability (union = k smallest of the combined sketches) is what
  * makes KMV a sketch rather than a sample.
  */
object SketchOps {

  /** (k_used, kth_hash, estimate) for the distinct count of non-null
    * `keyCol` values (nulls are excluded, the COUNT(DISTINCT col)
    * convention). If the true distinct count is < k the estimate is
    * exact (the count of distinct hashes seen); at ≥ k the (k-1)·M/h_k
    * estimator applies. Integral keys hash via the codegen'd hash32;
    * string keys via the native fnv64 expression folded to 32 bits —
    * anything else (including fractional numerics, where a cast to long
    * would merge distinct values) is rejected loudly rather than
    * silently collapsing under a lossy cast. */
  def kmvDistinct(df: DataFrame, keyCol: String, k: Int = 256): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, DecimalType, IntegerType, LongType, ShortType, StringType}
    val keyHash = df.schema(keyCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        SimilarityOps.hash32Col(col(keyCol).cast("long"))
      case d: DecimalType if d.scale == 0 && d.precision <= 18 =>
        // scale-0 decimals up to 18 digits cast to long losslessly
        SimilarityOps.hash32Col(col(keyCol).cast("long"))
      case StringType =>
        graft.plans.GraftSparkExtensions.install(df.sparkSession)
        pmod(expr(s"fnv64(`$keyCol`)"), lit(4294967296L))
      case dt => throw new IllegalArgumentException(
        s"kmvDistinct: unsupported key type ${dt.catalogString} for '$keyCol'")
    }
    val hashes = df
      .filter(col(keyCol).isNotNull)
      .select(keyHash.as("h"))
      .distinct()
      .orderBy(col("h").asc)
      .limit(k)
    hashes.agg(count(lit(1)).as("k_used"), max(col("h")).as("kth_hash"))
      .select(col("k_used"), col("kth_hash"),
        when(col("k_used") < k, col("k_used").cast("double"))
          .otherwise(round((col("k_used") - 1).cast("double") *
            lit(4294967296.0) / col("kth_hash"), 2)).as("estimate"))
  }
}
