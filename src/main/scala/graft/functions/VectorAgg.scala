package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** A9 — element-wise integer-vector sum as a typed Aggregator (the
  * reference's pageview combiner/reducer pair,
  * mapreduce/PreprocessEZPageviews.java:302-389). Partial aggregation
  * (map-side combine) comes for free from the Aggregator contract.
  * Vectors of differing lengths sum over the longer length (missing
  * elements are 0), matching the reference's resize-then-add behavior.
  */
object IntVectorSum extends Aggregator[Seq[Int], Array[Int], Seq[Int]] {
  override def zero: Array[Int] = Array.emptyIntArray
  private def add(a: Array[Int], b: Seq[Int]): Array[Int] = {
    if (b == null) return a
    val out = if (a.length >= b.length) a else java.util.Arrays.copyOf(a, b.length)
    var i = 0
    while (i < b.length) { out(i) += b(i); i += 1 }
    out
  }
  override def reduce(buf: Array[Int], row: Seq[Int]): Array[Int] = add(buf, row)
  override def merge(a: Array[Int], b: Array[Int]): Array[Int] =
    add(a, b.toIndexedSeq)
  override def finish(r: Array[Int]): Seq[Int] = r.toIndexedSeq
  override def bufferEncoder: Encoder[Array[Int]] = ExpressionEncoder[Array[Int]]()
  override def outputEncoder: Encoder[Seq[Int]] = ExpressionEncoder[Seq[Int]]()
}

/** Element-wise float-vector sum (embedding centroids / similarity ops). */
object FloatVectorSum extends Aggregator[Seq[Float], Array[Float], Seq[Float]] {
  override def zero: Array[Float] = Array.emptyFloatArray
  private def add(a: Array[Float], b: Seq[Float]): Array[Float] = {
    if (b == null) return a
    val out = if (a.length >= b.length) a else java.util.Arrays.copyOf(a, b.length)
    var i = 0
    while (i < b.length) { out(i) += b(i); i += 1 }
    out
  }
  override def reduce(buf: Array[Float], row: Seq[Float]): Array[Float] = add(buf, row)
  override def merge(a: Array[Float], b: Array[Float]): Array[Float] =
    add(a, b.toIndexedSeq)
  override def finish(r: Array[Float]): Seq[Float] = r.toIndexedSeq
  override def bufferEncoder: Encoder[Array[Float]] = ExpressionEncoder[Array[Float]]()
  override def outputEncoder: Encoder[Seq[Float]] = ExpressionEncoder[Seq[Float]]()
}
