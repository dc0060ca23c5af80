package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: capture the AQE FINAL plan of registered queries. A static
  * `.explain` shows the initial plan (`isFinalPlan=false`) with the
  * pre-runtime join strategies; this tool executes the frame's own
  * QueryExecution (collect(), so the AdaptiveSparkPlanExec finalizes)
  * and THEN prints the formatted plan — runtime broadcast conversions
  * and AQEShuffleRead (coalesced) nodes included. Not part of the
  * driver contract. `runMain graft.FinalPlan <sfDir> <query>…`. */
object FinalPlan {
  def main(args: Array[String]): Unit = {
    Scratch.sweepStale()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", Scratch.sparkLocalDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { q =>
      println(s"=== $q ===")
      val df = SparkEntry.queries(q)(spark, args(0))
      df.collect()
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
