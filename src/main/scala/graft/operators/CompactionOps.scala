package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small-file compaction — the operational rewrite every large table
  * needs after streaming/incremental ingestion: thousands of small files
  * per partition crush scan throughput (per-file open/footer cost,
  * tiny row groups defeat parquet stats) and the fix is a periodic
  * bin-packed rewrite into target-sized files (the OPTIMIZE /
  * rewriteDataFiles operation of Delta/Iceberg).
  *
  * Determinism contract: bin assignment is a pure function of the
  * per-file size relation — files sort by (size desc, file asc) and
  * sequential-fill into bins of `target` (bin = exclusive-running-sum
  * div target). Production feeds physical byte sizes; the oracle-gated
  * query feeds row counts (the engine-replicable proxy) — same
  * algorithm either way. Sequential fill over the size-sorted list is
  * the standard compaction packer: each bin lands within one file of
  * the target and the assignment is computable as one window cumsum,
  * where true first-fit-decreasing would need a sequential loop for a
  * marginal packing gain.
  *
  * Scale shape: the size relation is FILE-level metadata (one row per
  * small file — thousands of rows for a 100 TB partition, not billions),
  * so the single-partition window cumsum is trivially cheap; the data
  * itself moves in ONE hash exchange on the bin id (PlanSpec pins it),
  * and a `partitionBy(bin)` write then emits exactly one file per bin
  * because each bin's rows land in one task. Run per table-partition
  * (date/tenant), never globally.
  */
object CompactionOps {

  /** Deterministic bin assignment over a (file, size) relation:
    * (file, size, bin) with bin = div(exclusive running sum of sizes
    * ordered by size desc / file asc, target). */
  def assignBins(stats: DataFrame, fileCol: String, sizeCol: String,
                 target: Long): DataFrame = {
    require(target > 0, s"compaction target must be positive, got $target")
    val w = Window.orderBy(col(sizeCol).desc, col(fileCol).asc)
    stats
      .withColumn("_csum", sum(col(sizeCol)).over(w) - col(sizeCol))
      .select(col(fileCol), col(sizeCol),
        expr(s"_csum div ${target}L").as("bin"))
  }

  /** Route `df`'s rows to their compaction bins: broadcast the
    * file→bin map, one hash exchange on the bin id. The caller writes
    * the result with `.write.partitionBy("bin")` — one output file per
    * bin. */
  def compact(df: DataFrame, fileIdCol: String, bins: DataFrame): DataFrame =
    df.join(broadcast(bins.select(col(fileIdCol), col("bin"))), Seq(fileIdCol))
      .repartition(col("bin"))
}
