package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.Hashing
import graft.operators.SkewOps
import graft.plans.GraftSparkExtensions

class ExpressionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fnv64 native expression matches the Scala kernel (codegen path)") {
    GraftSparkExtensions.install(spark)
    val inputs = Seq("abc", "", "hello world", "日本語テキスト", "a\nb")
    val out = inputs.toDF("v").selectExpr("v", "fnv64(v) AS h")
      .as[(String, Long)].collect().toMap
    inputs.foreach(s => assert(out(s) == Hashing.fnv1a(s), s"mismatch for $s"))
  }

  test("fnv64 is null-safe and visible to spark.sql") {
    GraftSparkExtensions.install(spark)
    Seq(Option("x"), None).toDF("v").createOrReplaceTempView("fnv_in")
    val rows = spark.sql("SELECT fnv64(v) AS h FROM fnv_in")
      .collect().map(r => Option(r.get(0)))
    assert(rows.count(_.isEmpty) == 1)
    assert(rows.flatten.head == Hashing.fnv1a("x"))
  }

  test("fnv64 stays inside whole-stage codegen") {
    GraftSparkExtensions.install(spark)
    val plan = spark.range(10).selectExpr("fnv64(cast(id AS string)) AS h")
      .queryExecution.executedPlan.toString
    // "*(1)" marks a WholeStageCodegen stage; fnv64 must sit inside one
    assert(plan.contains("*(1) Project [fnv64("), plan)
    assert(!plan.contains("BatchEvalPython") && !plan.toLowerCase.contains("scalaudf"))
  }

  test("saltedSum equals the direct aggregation") {
    val df = (1 to 1000).map(i => (if (i % 10 == 0) "hot" else s"k${i % 7}", i.toDouble))
      .toDF("k", "v")
    val direct = df.groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("n"))
      .as[(String, Double, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    val salted = SkewOps.saltedSum(df, "k", "v")
      .as[(String, Double, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(salted.keySet == direct.keySet)
    salted.foreach { case (k, (s, n)) =>
      assert(n == direct(k)._2)
      assert(math.abs(s - direct(k)._1) < 1e-6)
    }
  }
}
