package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: synthesize an sf1-equivalent dataset (10× sf0.1) for the
  * scale probe, since the driver only generates up to sf0.1. Replication
  * is workload-preserving, not a naive copy:
  *
  *  - documents: 10 copies per doc with fresh ids; copies ≥ 1 get their
  *    tokens deterministically permuted (sorted by a per-copy hash), so
  *    term/tf distributions scale exactly ×10 while shingle sets diverge —
  *    a plain copy would plant 10-deep exact/near-dup clusters everywhere
  *    and turn the dedup probes into a different (quadratic) workload;
  *  - events: 10 copies with fresh event/user ids and unchanged
  *    timestamps — per-user densities and window shapes stay identical,
  *    the user population grows ×10; `ts` is written as int64
  *    epoch-nanos to match the driver files (Tables.table's nanos shim
  *    applies the same way);
  *  - embeddings: 10 copies with fresh ids and a small deterministic
  *    per-copy perturbation on every coordinate, so vectors stay in the
  *    same region (cell/bucket distributions comparable) without being
  *    bit-identical.
  *
  * `runMain graft.ScaleData [outDir]` (default /tmp/graft-sf1).
  */
object ScaleData {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/graft-sf1")
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val copies = 10

    val docs = Tables.table(spark, src, "documents")
      .withColumn("copy", explode(sequence(lit(0), lit(copies - 1))))
      .withColumn("doc_id", col("doc_id") + col("copy") * lit(100000000L))
      .withColumn("text",
        when(col("copy") === 0, col("text")).otherwise(
          // permute tokens: sort by a per-(doc,copy) keyed hash
          array_join(transform(array_sort(transform(
            filter(split(col("text"), "\\s+"), t => t =!= ""),
            t => struct(xxhash64(t, col("doc_id")).as("h"), t.as("t")))),
            s => s.getField("t")), " ")))
      .withColumn("n_chars", length(col("text")))
      .select("doc_id", "text", "lang", "source", "n_chars")
    docs.repartition(8).write.mode("overwrite").parquet(s"$out/documents.parquet")

    val events = Tables.table(spark, src, "events")
      .withColumn("copy", explode(sequence(lit(0), lit(copies - 1))))
      .withColumn("event_id", col("event_id") + col("copy") * lit(100000000L))
      .withColumn("user_id", col("user_id") + col("copy") * lit(100000000L))
      .withColumn("ts", unix_micros(col("ts")) * lit(1000L)) // int64 nanos
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    events.repartition(8).write.mode("overwrite").parquet(s"$out/events.parquet")

    val embs = Tables.table(spark, src, "embeddings")
      .withColumn("copy", explode(sequence(lit(0), lit(copies - 1))))
      .withColumn("vec_id", col("vec_id") + col("copy") * lit(100000000L))
      .withColumn("embedding",
        transform(col("embedding"), (x, i) =>
          (x + (pmod(xxhash64(col("vec_id"), i), lit(1000L)).cast("float")
            / lit(50000.0f) - lit(0.01f)) * col("copy").cast("float"))
            .cast("float")))
      .select("vec_id", "embedding", "label")
    embs.repartition(4).write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    // small relational tables ride along unchanged so every query resolves
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
      .foreach { t =>
        spark.read.parquet(s"$src/$t.parquet")
          .write.mode("overwrite").parquet(s"$out/$t.parquet")
      }
    println(s"""{"scale_data":"$out","copies":$copies}""")
    spark.stop()
  }
}
