package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (TESTDATA.md) and the
  * engine's table-registration surface (SURVEY.md §2.1 S18: the reference
  * exposes its sources to Pig as named tables; here the equivalent is
  * registering DataFrames as temp views so `spark.sql` works over them).
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      // events.parquet stores TIMESTAMP(NANOS), which Spark's reader
      // rejects; read the raw int64 nanos and truncate to microseconds
      // (TimestampType precision — `div`, not `/`, since epoch-nanos
      // exceed double's 2^53 integer range).
      // Known pushdown cost of this workaround: predicates on the derived
      // `ts` cannot reach the parquet scan (row-group stats pruning is
      // lost). A production table written with µs timestamps gets the
      // pushdown for free; this is a testdata-format artifact, not an
      // operator-design choice.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register every test table as a temp view (S18 loader surface). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    All.foreach(n => table(spark, sfDir, n).createOrReplaceTempView(n))
}
