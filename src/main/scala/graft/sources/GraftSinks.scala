package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Sink surface (SURVEY §2.2 K1-K7). Thin by design: Spark's writers
  * already cover every output the reference hand-rolled; this fixes the
  * engine's defaults (TSV = tab separator with headers off, like the
  * reference's TextOutputFormat rows; parquet replaces SequenceFile;
  * compression option maps to the reference's bz2/snappy job conf).
  */
object GraftSinks {

  /** K1 — TSV rows (TextOutputFormat equivalent). */
  def writeTsv(df: DataFrame, path: String,
               compression: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).option("sep", "\t")
    compression.fold(w)(c => w.option("compression", c)).csv(path)
  }

  /** K2 — columnar binary output (SequenceFile's modern equivalent). */
  def writeParquet(df: DataFrame, path: String,
                   compression: String = "snappy"): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("compression", compression).parquet(path)

  /** K5 — JSON lines (Pig JsonStorage equivalent). */
  def writeJson(df: DataFrame, path: String,
                compression: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    compression.fold(w)(c => w.option("compression", c)).json(path)
  }

  /** K2b — ORC output: the second columnar format Spark ships natively.
    * Interop surface for warehouses standardized on ORC (Hive-lineage
    * clusters); same predicate-pushdown/column-pruning contract as the
    * parquet path. */
  def writeOrc(df: DataFrame, path: String,
               compression: String = "snappy"): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("compression", compression).orc(path)

  /** K4 — count-only terminal action (the reference's NullOutputFormat +
    * Hadoop-counter result, CountAnchor.java:48-56). */
  def countOnly(df: DataFrame): Long = df.count()

  /** K7 — dictionary tables sink: one parquet table replaces the
    * reference's seven front-coded/MPH blobs (BuildDictionary.java:66-129);
    * consumers join on `term` or use `id`. */
  def writeDictionary(dict: DataFrame, path: String): Unit =
    writeParquet(dict.select("term", "id", "df", "cf"), path)

  /** K3 — split-index side table (page → offsets); in Spark this is only
    * an optional optimization artifact (SURVEY §2.1 S19). */
  def writeSplitIndex(index: DataFrame, path: String): Unit =
    writeParquet(index, path)

  /** K2c — Hadoop SequenceFile interop sink for a (long key, string
    * value) frame: the reference's NATIVE output container
    * (SequenceFileOutputFormat throughout its jobs), so existing
    * MapReduce/Pig consumers can read this engine's output unchanged.
    * RDD API is justified here — Spark has no DataFrame writer for
    * SequenceFile, and the conversion is a per-partition map with no
    * driver involvement; parquet stays the engine-internal format. */
  def writeSequenceFile(df: DataFrame, path: String,
                        codec: Option[Class[_ <: org.apache.hadoop.io.compress.CompressionCodec]] = None): Unit = {
    import org.apache.hadoop.io.{LongWritable, Text}
    import org.apache.spark.rdd.RDD._
    val rdd = df.rdd.map(r => (new LongWritable(r.getLong(0)), new Text(r.getString(1))))
    codec match {
      case Some(c) => rdd.saveAsSequenceFile(path, Some(c))
      case None    => rdd.saveAsSequenceFile(path)
    }
  }

  /** K2c read side: SequenceFile[LongWritable, Text] → (key, value)
    * frame. Splittable the Hadoop way (block boundaries), so partition
    * planning matches what the reference's jobs saw. */
  def readSequenceFile(spark: org.apache.spark.sql.SparkSession, path: String,
                       keyCol: String = "key", valueCol: String = "value"): DataFrame = {
    import spark.implicits._
    spark.sparkContext.sequenceFile[Long, String](path).toDF(keyCol, valueCol)
  }
}
