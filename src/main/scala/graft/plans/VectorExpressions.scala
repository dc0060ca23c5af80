package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native kernels for the embedding-similarity hot path. The HOF
  * formulation (`aggregate(zip_with(a, b, _*_), 0.0, _+_)` etc.) is
  * semantically right — a SEQUENTIAL left fold any engine replays
  * bit-identically — but higher-order functions never enter
  * whole-stage codegen: every candidate pair pays interpreted lambda
  * dispatch and boxed Doubles. These expressions run the SAME folds
  * (same IEEE operations, same order, same null propagation — each
  * accumulator's addition sequence is exactly its fold's) as tight
  * primitive loops inside codegen; Round13Spec pins bit-equality
  * against the HOF chain including the edge cases (empty arrays →
  * NaN, unequal lengths → null, null element → null).
  */
object VectorKernels {
  /** Cosine similarity — bit-identical to
    * `aggregate(zip_with(a,b,_*_),0,+) / (sqrt(aggregate(a,0,+x²)) *
    * sqrt(aggregate(b,0,+x²)))`. Boxed null when lengths differ or an
    * element is null (the zip_with padding / null-product path). */
  def cosineBoxed(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0d
    var na = 0.0d
    var nb = 0.0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  /** Squared L2 distance — bit-identical to
    * `aggregate(zip_with(a,b,(x,y)->(x-y)*(x-y)), 0.0, _+_)`. */
  def l2sqBoxed(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}

private[plans] trait VectorPairExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<double> arguments, got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    }
  protected def kernelName: String
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("vecres")
      s"""java.lang.Double $tmp =
         |  graft.plans.VectorKernels.$kernelName($a, $b);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }""".stripMargin
    })
}

/** `cosine_sim(a, b)` — codegen'd cosine similarity. */
case class CosineSim(left: Expression, right: Expression)
    extends VectorPairExpression {
  override protected def kernelName: String = "cosineBoxed"
  override def prettyName: String = "cosine_sim"
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.cosineBoxed(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** `l2sq_dist(a, b)` — codegen'd squared L2 distance. */
case class L2SqDist(left: Expression, right: Expression)
    extends VectorPairExpression {
  override protected def kernelName: String = "l2sqBoxed"
  override def prettyName: String = "l2sq_dist"
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.l2sqBoxed(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2SqDist =
    copy(left = newLeft, right = newRight)
}
