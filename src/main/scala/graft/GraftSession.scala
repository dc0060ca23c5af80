package graft

import org.apache.spark.sql.SparkSession

/** Engine entry point: a SparkSession wired with the engine's native
  * expressions and the scale-tuned defaults used throughout (AQE with
  * skew-join handling on, UTC, bounded shuffle parallelism).
  */
object GraftSession {
  def build(master: String = "local[*]",
            shufflePartitions: Int = 32,
            appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", classOf[graft.plans.GraftSparkExtensions].getName)
      .getOrCreate()
    graft.plans.GraftSparkExtensions.install(spark) // idempotent if extensions ran
    GraftFunctions.register(spark)
    spark
  }
}
