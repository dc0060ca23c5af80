package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** ArrayData adapters for the VByte doc-vector codec
  * (graft.functions.VByteCodec — byte-parity with the reference's
  * VByteDocVector container). */
object CodecKernels {
  def encodeData(ids: ArrayData): Array[Byte] =
    if (ids == null) null
    else graft.functions.VByteCodec.encode(ids.toLongArray())

  def decodeData(bytes: Array[Byte]): ArrayData =
    if (bytes == null) null
    else new GenericArrayData(graft.functions.VByteCodec.decode(bytes))
}

/** `vbyte_encode(array<bigint>)` → binary — the reference's compressed
  * doc-vector container (VByteDocVector byte format). */
case class VByteEncode(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, false) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"vbyte_encode requires array<bigint> (no nulls), got ${child.dataType.catalogString}")
  }
  override def dataType: DataType = BinaryType
  override def nullSafeEval(input: Any): Any =
    CodecKernels.encodeData(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.CodecKernels.encodeData($c)")
  override protected def withNewChildInternal(newChild: Expression): VByteEncode =
    copy(child = newChild)
  override def prettyName: String = "vbyte_encode"
}

/** `vbyte_decode(binary)` → array<bigint> — inverse of
  * [[VByteEncode]]. */
case class VByteDecode(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"vbyte_decode requires binary, got ${child.dataType.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    CodecKernels.decodeData(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.CodecKernels.decodeData($c)")
  override protected def withNewChildInternal(newChild: Expression): VByteDecode =
    copy(child = newChild)
  override def prettyName: String = "vbyte_decode"
}
