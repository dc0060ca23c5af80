package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{DiffFunctions, TextFunctions}

/** Static kernels backing the native text expressions — the codegen tier
  * of the scan-path extractors (SURVEY §2.7 F1-F4, F11, F16). Each method
  * takes Catalyst runtime values (`UTF8String`/`ArrayData`) and returns
  * Catalyst runtime values, so generated Java calls them directly: no
  * ScalaUDF row boxing, no catalyst↔scala converters, and the enclosing
  * `WholeStageCodegen` span stays intact (the downstream `explode` of the
  * returned array is itself codegen'd, which is why these are array
  * expressions rather than custom `Generator`s — a non-codegen Generator
  * would break the span).
  *
  * Null contract (mirrors the former UDF tier, where the kernels mapped
  * null to empty): null input ⇒ empty array / empty string, never null.
  * The string-level logic stays single-sourced in
  * [[graft.functions.TextFunctions]] / [[graft.functions.DiffFunctions]]
  * (reference behavior specs cited there).
  */
object TextKernels {

  val linkStructType: StructType = StructType(Seq(
    StructField("anchor", StringType), StructField("target", StringType)))
  val linkArrayType: ArrayType = ArrayType(linkStructType)

  val linkCtxStructType: StructType = StructType(Seq(
    StructField("anchor", StringType), StructField("target", StringType),
    StructField("offset", IntegerType),
    StructField("pre", StringType), StructField("post", StringType)))
  val linkCtxArrayType: ArrayType = ArrayType(linkCtxStructType)

  val deltaStructType: StructType = StructType(Seq(
    StructField("op", StringType),
    StructField("origPos", IntegerType), StructField("revPos", IntegerType),
    StructField("origLines", ArrayType(StringType)),
    StructField("revLines", ArrayType(StringType))))
  val deltaArrayType: ArrayType = ArrayType(deltaStructType)

  private def emptyArray: ArrayData = new GenericArrayData(Array.empty[Any])

  private def utf8(s: String): UTF8String =
    if (s == null) null else UTF8String.fromString(s)

  private def stringArray(xs: Seq[String]): ArrayData =
    new GenericArrayData(xs.map(utf8(_): Any).toArray)

  private def toStringSeq(a: ArrayData): IndexedSeq[String] =
    if (a == null) IndexedSeq.empty
    else {
      val n = a.numElements()
      val out = new Array[String](n)
      var i = 0
      while (i < n) {
        out(i) = if (a.isNullAt(i)) null else a.getUTF8String(i).toString
        i += 1
      }
      scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
    }

  def extractLinksData(s: UTF8String): ArrayData =
    if (s == null) emptyArray
    else new GenericArrayData(TextFunctions.extractLinks(s.toString)
      .map(l => InternalRow(utf8(l.anchor), utf8(l.target)): Any).toArray)

  def extractLinksCtxData(s: UTF8String): ArrayData =
    if (s == null) emptyArray
    else new GenericArrayData(TextFunctions.extractLinksWithContext(s.toString)
      .map(l => InternalRow(utf8(l.anchor), utf8(l.target), l.offset,
        utf8(l.pre), utf8(l.post)): Any).toArray)

  def extractRefsData(s: UTF8String): ArrayData =
    if (s == null) emptyArray
    else stringArray(TextFunctions.extractReferences(s.toString))

  def extractTemplatesData(s: UTF8String): ArrayData =
    if (s == null) emptyArray
    else stringArray(TextFunctions.extractTemplates(s.toString))

  def plainTextData(s: UTF8String): UTF8String =
    if (s == null) UTF8String.EMPTY_UTF8
    else UTF8String.fromString(TextFunctions.plainText(s.toString))

  def revDiffData(a: ArrayData, b: ArrayData): ArrayData =
    new GenericArrayData(DiffFunctions.diff(toStringSeq(a), toStringSeq(b))
      .map(d => InternalRow(utf8(d.op), d.origPos, d.revPos,
        stringArray(d.origLines), stringArray(d.revLines)): Any).toArray)

  def addedWordsData(a: ArrayData, b: ArrayData): ArrayData =
    stringArray(DiffFunctions.addedWords(toStringSeq(a), toStringSeq(b)))

  // ---- codegen templates (never-null results, null inputs forwarded to
  // the kernels, which map them to empty) ----

  private[plans] def genUnary(ctx: CodegenContext, ev: ExprCode,
      child: Expression, dt: DataType, fn: String): ExprCode = {
    val c = child.genCode(ctx)
    val jt = CodeGenerator.javaType(dt)
    ev.copy(
      code = code"${c.code}\n$jt ${ev.value} = graft.plans.TextKernels.$fn(" +
        code"${c.isNull} ? null : ${c.value});",
      isNull = FalseLiteral)
  }

  private[plans] def genBinary(ctx: CodegenContext, ev: ExprCode,
      left: Expression, right: Expression, dt: DataType, fn: String): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val jt = CodeGenerator.javaType(dt)
    ev.copy(
      code = code"${l.code}\n${r.code}\n" +
        code"$jt ${ev.value} = graft.plans.TextKernels.$fn(" +
        code"${l.isNull} ? null : ${l.value}, ${r.isNull} ? null : ${r.value});",
      isNull = FalseLiteral)
  }

  private[plans] def requireString(e: Expression, name: String): TypeCheckResult =
    if (e.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name requires a string argument, got ${e.dataType.catalogString}")

  private[plans] def requireStringArray(e: Expression, name: String): TypeCheckResult =
    e.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name requires array<string> arguments, got ${other.catalogString}")
    }
}

/** Base for the never-null unary string kernels. */
sealed abstract class TextKernelUnary extends UnaryExpression {
  protected def kernelFn: String
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    TextKernels.requireString(child, prettyName)
  override def eval(input: InternalRow): Any = evalKernel(child.eval(input))
  protected def evalKernel(in: Any): Any
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    TextKernels.genUnary(ctx, ev, child, dataType, kernelFn)
}

/** `extract_links(text)` → array<struct<anchor,target>> (F1). */
case class ExtractLinks(child: Expression) extends TextKernelUnary {
  override def prettyName: String = "extract_links"
  override def dataType: DataType = TextKernels.linkArrayType
  override protected def kernelFn: String = "extractLinksData"
  override protected def evalKernel(in: Any): Any =
    TextKernels.extractLinksData(in.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): ExtractLinks =
    copy(child = newChild)
}

/** `extract_links_ctx(text)` → array<struct<anchor,target,offset,pre,post>> (F2). */
case class ExtractLinksCtx(child: Expression) extends TextKernelUnary {
  override def prettyName: String = "extract_links_ctx"
  override def dataType: DataType = TextKernels.linkCtxArrayType
  override protected def kernelFn: String = "extractLinksCtxData"
  override protected def evalKernel(in: Any): Any =
    TextKernels.extractLinksCtxData(in.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): ExtractLinksCtx =
    copy(child = newChild)
}

/** `extract_refs(text)` → array<string> of http references (F3). */
case class ExtractRefs(child: Expression) extends TextKernelUnary {
  override def prettyName: String = "extract_refs"
  override def dataType: DataType = ArrayType(StringType)
  override protected def kernelFn: String = "extractRefsData"
  override protected def evalKernel(in: Any): Any =
    TextKernels.extractRefsData(in.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): ExtractRefs =
    copy(child = newChild)
}

/** `extract_templates(text)` → array<string> of non-blacklisted template names (F4). */
case class ExtractTemplates(child: Expression) extends TextKernelUnary {
  override def prettyName: String = "extract_templates"
  override def dataType: DataType = ArrayType(StringType)
  override protected def kernelFn: String = "extractTemplatesData"
  override protected def evalKernel(in: Any): Any =
    TextKernels.extractTemplatesData(in.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): ExtractTemplates =
    copy(child = newChild)
}

/** `plain_text(text)` → markup-stripped plaintext (F11). */
case class PlainText(child: Expression) extends TextKernelUnary {
  override def prettyName: String = "plain_text"
  override def dataType: DataType = StringType
  override protected def kernelFn: String = "plainTextData"
  override protected def evalKernel(in: Any): Any =
    TextKernels.plainTextData(in.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): PlainText =
    copy(child = newChild)
}

/** Base for the never-null binary token-array kernels. */
sealed abstract class TokenKernelBinary extends BinaryExpression {
  protected def kernelFn: String
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = TextKernels.requireStringArray(left, prettyName)
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else TextKernels.requireStringArray(right, prettyName)
  }
  override def eval(input: InternalRow): Any =
    evalKernel(left.eval(input), right.eval(input))
  protected def evalKernel(a: Any, b: Any): Any
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    TextKernels.genBinary(ctx, ev, left, right, dataType, kernelFn)
}

/** `rev_diff(orig, rev)` → array of typed INSERT/DELETE/CHANGE deltas (F16). */
case class RevDiff(left: Expression, right: Expression) extends TokenKernelBinary {
  override def prettyName: String = "rev_diff"
  override def dataType: DataType = TextKernels.deltaArrayType
  override protected def kernelFn: String = "revDiffData"
  override protected def evalKernel(a: Any, b: Any): Any =
    TextKernels.revDiffData(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RevDiff =
    copy(left = newLeft, right = newRight)
}

/** `added_words(orig, rev)` → multiset difference rev∖orig (S13/S14 patch words). */
case class AddedWords(left: Expression, right: Expression) extends TokenKernelBinary {
  override def prettyName: String = "added_words"
  override def dataType: DataType = ArrayType(StringType)
  override protected def kernelFn: String = "addedWordsData"
  override protected def evalKernel(a: Any, b: Any): Any =
    TextKernels.addedWordsData(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AddedWords =
    copy(left = newLeft, right = newRight)
}
