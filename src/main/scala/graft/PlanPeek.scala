package graft
import org.apache.spark.sql.SparkSession

/** Local plan-inspection aid: `runMain graft.PlanPeek <sfDir> <query>`
  * prints the formatted physical plan of a registered query (the
  * .explain("formatted") loop the brief asks for, one query at a
  * time). Not part of the driver contract. */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { q =>
      println(s"=== $q ===")
      SparkEntry.queries(q)(spark, args(0)).explain("formatted")
    }
  }
}
