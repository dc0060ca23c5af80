package graft.sources

import java.io.BufferedInputStream

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S19 — offline split-index job: the byte offset of every `<page>` tag
  * per dump file, distributed one task per file (the reference's
  * IndexSplits MapReduce job over FileNullInputFormat,
  * experiments mapreduce/IndexSplits.java:64-331). The index is an
  * ordinary parquet side table; `wikirev` consumes it via the
  * `splitIndex` option so partition planning aligns exactly on page
  * boundaries instead of scanning for them.
  * Compressed files yield no offsets (they are unsplittable anyway).
  */
object IndexSplits {

  def scanOffsets(file: String,
                  conf: Configuration = new Configuration()): Seq[Long] = {
    if (file.endsWith(".bz2") || file.endsWith(".gz")) return Seq.empty
    val p = new Path(file)
    val fs = FileSystem.get(p.toUri, conf)
    val in = new BufferedInputStream(fs.open(p), 1 << 16)
    try {
      val tag = "<page>".getBytes("UTF-8")
      val out = scala.collection.mutable.ArrayBuffer.empty[Long]
      var pos = 0L
      var i = 0
      var b = in.read()
      while (b >= 0) {
        pos += 1
        if (b == tag(i)) {
          i += 1
          if (i == tag.length) { out += pos - tag.length; i = 0 }
        } else i = if (b == tag(0)) 1 else 0
        b = in.read()
      }
      out.toSeq
    } finally in.close()
  }

  /** (file_name, offset) rows — write with `GraftSinks.writeSplitIndex`.
    * The session Hadoop conf (fs credentials, defaultFS) ships to the
    * executor-side scans via SerializableConfiguration, same as the
    * wikirev reader factory. */
  def build(spark: SparkSession, path: String): DataFrame = {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val offsetsUdf = udf((f: String) => scanOffsets(f, conf.value))
    WikiXml.fileNames(spark, path)
      .select(col("file_name"), explode(offsetsUdf(col("file_name"))).as("offset"))
  }
}
