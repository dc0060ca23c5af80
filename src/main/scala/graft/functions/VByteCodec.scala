package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.hadoop.io.WritableUtils

/** The reference's compressed doc-vector byte format, replicated with
  * byte parity BY CONSTRUCTION: `org.clueweb.data.VByteDocVector`
  * (reference BuildVByteDocVectors.java:52,122-160) writes a Hadoop
  * VInt count followed by each term id as a Hadoop VInt, via
  * `WritableUtils` — the exact class Spark already ships in
  * hadoop-client, which this codec calls directly instead of
  * re-implementing the variable-length format. Ids ride as longs
  * (`writeVLong`; `writeVInt` is its int-range special case with
  * identical bytes), so dictionary ids survive past 2^31.
  *
  * This closes the documented "parquet replaces the VByte blobs" delta:
  * an engine user can emit vectors the reference's existing consumers
  * decode, and decode vectors the reference produced.
  */
object VByteCodec {

  def encode(ids: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(ids.length * 2 + 4)
    val out = new DataOutputStream(bos)
    WritableUtils.writeVLong(out, ids.length.toLong)
    var i = 0
    while (i < ids.length) { WritableUtils.writeVLong(out, ids(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  def decode(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = WritableUtils.readVLong(in).toInt
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = WritableUtils.readVLong(in); i += 1 }
    out
  }
}
