package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.SparkSessionExtensions

/** SparkSessionExtensions hook registering the engine's native
  * expressions into the SQL function registry, so `spark.sql("SELECT
  * fnv64(x) …")` plans the codegen expression (no UDF tier).
  *
  * Use either `spark.sql.extensions=graft.plans.GraftSparkExtensions` at
  * session build, or `GraftSparkExtensions.install(spark)` on a live
  * session.
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftSparkExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftSparkExtensions {
  private type Builder = Seq[Expression] => Expression

  val functions: Seq[(String, ExpressionInfo, Builder)] = Seq(
    ("fnv64",
      new ExpressionInfo(classOf[FnvHash64].getName, "fnv64"),
      (args: Seq[Expression]) => FnvHash64(args.head)))

  /** Runtime registration on an existing session (idempotent). After
    * this, `selectExpr("fnv64(col)")` / `expr("fnv64(col)")` plan the
    * native expression. */
  def install(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
