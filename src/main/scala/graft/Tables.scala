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
      // pushdown for free — [[eventsMicros]] is that layout, with a
      // PlanSpec test pinning the PushedFilters claim; this is a
      // testdata-format artifact, not an operator-design choice.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register every test table as a temp view (S18 loader surface). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    All.foreach(n => table(spark, sfDir, n).createOrReplaceTempView(n))

  /** µs-timestamp variant of the events table: rewrites the
    * TIMESTAMP(NANOS) parquet once per (JVM, sfDir) to a cached
    * TimestampType (µs) parquet and reads that. This is what a
    * production writer emits, and it restores the parquet row-group
    * pruning that the nanos workaround in [[table]] loses — `ts`
    * predicates reach PushedFilters again (pinned by a PlanSpec test).
    * The rewrite is one linear pass, amortized across every query in
    * the JVM. */
  def eventsMicros(spark: SparkSession, sfDir: String): DataFrame = {
    // the cache outlives the JVM (tmpdir + _SUCCESS gate), so the key must
    // change when the SOURCE changes, not just the path — fingerprint the
    // source parquet's file lengths+mtimes so a regenerated events table
    // can never be served stale µs data
    def fingerprint(f: java.io.File): Long = {
      val self = f.length ^ java.lang.Long.rotateLeft(f.lastModified, 21)
      val kids = Option(f.listFiles).getOrElse(Array.empty)
      kids.sortBy(_.getName).foldLeft(self) { (acc, k) =>
        java.lang.Long.rotateLeft(acc, 7) ^ fingerprint(k)
      }
    }
    val src = new java.io.File(sfDir, "events.parquet")
    val key = Integer.toHexString(
      new java.io.File(sfDir).getAbsolutePath.hashCode) + "-" +
      java.lang.Long.toHexString(fingerprint(src))
    val dir = new java.io.File(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), s"graft-events-us-$key")
    this.synchronized {
      if (!new java.io.File(dir, "_SUCCESS").exists())
        table(spark, sfDir, "events")
          .write.mode("overwrite").parquet(dir.toString)
    }
    spark.read.parquet(dir.toString)
  }
}
