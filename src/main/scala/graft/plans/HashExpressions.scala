package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.Hashing

/** Static kernels + native expressions for the signature tier of the
  * dedup/similarity family (MinHash, SimHash, hyperplane sign-bits,
  * seeded/rolling hashes) and the pageview decode. These sit on the
  * per-document scan paths that dominate a corpus pass, so like the text
  * kernels they run as generated-Java calls on `UTF8String`/`ArrayData` —
  * no UDF boxing, whole-stage codegen intact.
  *
  * All hashes stay byte-identical to [[graft.functions.Hashing]] (the
  * oracle-replicable definitions); where profitable the kernels fold
  * UTF-8 bytes directly (FNV over token bytes + separator) instead of
  * materializing shingle Strings — same value as
  * `Hashing.fnv1a(tokens.mkString(" "))` by construction.
  */
object HashKernels {

  /** FNV-1a folded over `toks[start .. start+k)` joined by a single
    * space — equals `Hashing.fnv1a(mkString(" "))` without building the
    * String (separator byte 0x20 folded between tokens). */
  private def fnvShingle(toks: Array[UTF8String], start: Int, k: Int): Long = {
    var h = Hashing.FnvOffset
    var t = start
    while (t < start + k) {
      val bytes = toks(t).getBytes
      var i = 0
      while (i < bytes.length) {
        h ^= (bytes(i) & 0xffL); h *= Hashing.FnvPrime; i += 1
      }
      if (t < start + k - 1) { h ^= 0x20L; h *= Hashing.FnvPrime }
      t += 1
    }
    h
  }

  private def utf8Tokens(a: ArrayData): Array[UTF8String] = {
    val n = a.numElements()
    val out = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      out(i) = if (a.isNullAt(i)) UTF8String.EMPTY_UTF8 else a.getUTF8String(i)
      i += 1
    }
    out
  }

  /** FNV-1a hash of every k-token shingle — value-identical to
    * `transform(shingleStrings(toks, k), x -> fnv64(x))` (the separator
    * byte 0x20 folds between tokens, so each hash equals
    * `Hashing.fnv1a(window.mkString(" "))`) WITHOUT materializing the
    * shingle Strings: the interpreted HOF chain (slice + array_join per
    * window) measured ~2 s over sf0.1's documents, this kernel is a
    * tight byte fold in generated Java. Fewer than k tokens → empty
    * array (every caller pre-filters `size(toks) >= k`; note
    * shingleStrings itself must NOT be called unguarded there because
    * Spark's `sequence(0, n-k)` DESCENDS for n < k). */
  def shingleHashesData(a: ArrayData, k: Int): ArrayData = {
    if (a == null) return new GenericArrayData(Array.emptyLongArray)
    val toks = utf8Tokens(a)
    val n = toks.length
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](n - k + 1)
    var s = 0
    while (s <= n - k) { out(s) = fnvShingle(toks, s, k); s += 1 }
    new GenericArrayData(out)
  }

  /** MinHash signature over word k-shingles — same shingle semantics as
    * `Hashing.shingles` (empty → all-MaxValue signature; shorter than k
    * → one whole-list shingle) and same seeded family as
    * `Hashing.minHash`. */
  def minHashData(a: ArrayData, k: Int, num: Int): ArrayData = {
    val sig = Array.fill(num)(Long.MaxValue)
    if (a != null && a.numElements() > 0) {
      val toks = utf8Tokens(a)
      val n = toks.length
      val (shingleCount, width) =
        if (n < k) (1, n) else (n - k + 1, k)
      var s = 0
      while (s < shingleCount) {
        val base = fnvShingle(toks, s, width)
        var i = 0
        while (i < num) {
          val h = Hashing.mix(base ^ Hashing.mix(i.toLong))
          if (h < sig(i)) sig(i) = h
          i += 1
        }
        s += 1
      }
    }
    new GenericArrayData(sig)
  }

  /** 64-bit SimHash over the token multiset — bit-identical to
    * `Hashing.simHash`. */
  def simHashData(a: ArrayData): Long = {
    val acc = new Array[Int](64)
    if (a != null) {
      val n = a.numElements()
      var i = 0
      while (i < n) {
        val h =
          if (a.isNullAt(i)) Hashing.fnv1a("")
          else GraftExpressions.fnv1aUtf8(a.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
        i += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Hyperplane sign-bit signature of an embedding (float or double
    * array) — mirrors `SimilarityOps.signBits` including the null → 0L
    * convention of its UDF wrapper. */
  def signBitsData(a: ArrayData, planes: Int, isFloat: Boolean): Long = {
    if (a == null) return 0L
    val dims = a.numElements()
    var sig = 0L
    var p = 0
    while (p < planes) {
      var dot = 0.0
      var d = 0
      while (d < dims) {
        val x = if (isFloat) a.getFloat(d).toDouble else a.getDouble(d)
        dot += x * graft.operators.SimilarityOps.planeWeight(p, d, dims)
        d += 1
      }
      if (dot >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  /** Per-band FNV fold of a MinHash signature — bit-identical to the
    * former band UDF: h ^= sig(i); h *= FnvPrime over each band's rows,
    * band id folded into the top byte. */
  def bandBucketsData(sig: ArrayData, bands: Int, rows: Int): ArrayData = {
    val out = new Array[Long](bands)
    val n = if (sig == null) 0 else sig.numElements()
    var b = 0
    while (b < bands) {
      var h = Hashing.FnvOffset
      var i = b * rows
      while (i < (b + 1) * rows && i < n) {
        h ^= sig.getLong(i); h *= Hashing.FnvPrime; i += 1
      }
      out(b) = (b.toLong << 56) ^ (h >>> 8)
      b += 1
    }
    new GenericArrayData(out)
  }

  def seededData(s: UTF8String, seed: Int): Long =
    Hashing.mix(GraftExpressions.fnv1aUtf8(s) ^ Hashing.mix(seed.toLong))

  /** |A ∩ B| of two ASCENDING-sorted long arrays by a two-pointer merge
    * (equal runs count once, so the result is SET intersection size even
    * if a side carries duplicates). Allocation-free — `array_intersect`
    * builds a hash set per invocation, which dominated the prefix-join
    * verification at ~13 µs/pair; the merge reads the UnsafeArrayData
    * words in place. Precondition: sorted ascending, no null elements
    * (both guaranteed by the sort_array(collect_list(fnv64)) producers). */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements(); val m = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < n && j < m) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else {
        c += 1
        while (i < n && a.getLong(i) == x) i += 1
        while (j < m && b.getLong(j) == x) j += 1
      }
    }
    c
  }

  /** Base-31 rolling hash over UTF-16 code units — identical to
    * `Hashing.rollingHash` on the equivalent String. */
  def rollingData(s: UTF8String): Long = Hashing.rollingHash(s.toString)

  def langIdData(s: UTF8String): UTF8String =
    UTF8String.fromString(
      graft.functions.TextFunctions.langId(if (s == null) null else s.toString))

  /** pagecounts-ez decode (F18) — null/absent input decodes to a zeroed
    * day vector, matching `EzFunctions.decodeEz`. */
  def decodeEzData(s: UTF8String, days: Int): ArrayData =
    new GenericArrayData(
      graft.EzFunctions.decodeEz(if (s == null) null else s.toString, days))

  def normalizeTitleData(s: UTF8String): UTF8String =
    UTF8String.fromString(graft.functions.TextFunctions.normalizeTitle(s.toString))

  def freebaseEncodeData(s: UTF8String): UTF8String =
    UTF8String.fromString(graft.functions.TextFunctions.freebaseEncode(s.toString))

  def cutLastData(s: UTF8String, n: Int): UTF8String =
    UTF8String.fromString(
      graft.functions.TextFunctions.cutLast(if (s == null) null else s.toString, n))

  def extractDomainData(s: UTF8String): UTF8String = {
    val r = graft.functions.TextFunctions.extractDomain(s.toString)
    if (r == null) null else UTF8String.fromString(r)
  }

  private val EmptyFrames = new GenericArrayData(Array.empty[Any])

  /** 2D patch-grid signatures of a binary payload interpreted as a
    * row-major byte matrix of `width` columns — the ViT-style patch
    * extraction kernel: patch (pr, pc) folds its `patch`×`patch` byte
    * block (base-31 over unsigned bytes, the frame/stub convention) in
    * row-major order. The final image row may be ragged (len % width);
    * missing bytes simply don't fold, and a corner patch with ZERO bytes
    * is not emitted (so the output matches "patches that contain data",
    * which the SQL replay can express as patch <> ''). */
  def patchSigsData(bytes: Array[Byte], width: Int, patch: Int): ArrayData = {
    if (bytes == null || bytes.length == 0) return EmptyFrames
    val w = math.max(1, width)
    val p = math.max(1, patch)
    val rows = (bytes.length + w - 1) / w
    val prN = (rows + p - 1) / p
    val pcN = (w + p - 1) / p
    val out = new Array[Any](prN * pcN)
    var k = 0
    var pr = 0
    while (pr < prN) {
      var pc = 0
      while (pc < pcN) {
        var h = 1125899906842597L
        var folded = false
        var r = pr * p
        val rEnd = math.min(rows, pr * p + p)
        while (r < rEnd) {
          var c = pc * p
          val cEnd = math.min(w, pc * p + p)
          while (c < cEnd) {
            val idx = r * w + c
            if (idx < bytes.length) { h = 31 * h + (bytes(idx) & 0xff); folded = true }
            c += 1
          }
          r += 1
        }
        if (folded) { out(k) = InternalRow(pr, pc, h); k += 1 }
        pc += 1
      }
      pr += 1
    }
    if (k == out.length) new GenericArrayData(out)
    else new GenericArrayData(java.util.Arrays.copyOf(
      out.asInstanceOf[Array[AnyRef]], k))
  }

  /** 64-bit average-hash (aHash) of a string-as-grayscale payload —
    * the `mm_phash` chain as ONE codegen fold: the codepoint stream
    * splits into 64 integer-boundary linear blocks (block b spans
    * codepoints ⌊b·len/64⌋ until ⌊(b+1)·len/64⌋), bit b sets iff the
    * block's mean exceeds the global mean via the exact integer
    * cross-multiply `blocksum·len > total·blocksize` — bit-identical
    * to the HOF aggregate chain it replaces (Round15Spec pins it),
    * ~17× cheaper per byte (no per-char array materialization).
    * Returns (n_pix, phash); empty/null input → (0, 0) (callers
    * filter empties, matching the HOF chain's length>0 guard).
    * Same BMP parity contract as [[blockMeansData]]. */
  def aHash64Data(s: UTF8String): InternalRow = {
    if (s == null) return InternalRow(0L, 0L)
    val bytes = s.getBytes
    if (bytes.length == 0) return InternalRow(0L, 0L)
    val len = s.numChars().toLong
    val bsum = new Array[Long](64)
    var stot = 0L
    var bi = 0
    var i = 0L
    while (bi < bytes.length) {
      val b0 = bytes(bi) & 0xff
      var cp = 0
      // malformed-input guards (defensive, matching the other kernels):
      // an unexpected continuation lead (0x80-0xBF) or a sequence
      // truncated at the buffer end decodes as a single byte instead of
      // reading past `bytes` — unreachable from a valid UTF8String, but
      // the kernel must not be one bad cast away from a task-killing
      // ArrayIndexOutOfBoundsException (r15 advice)
      if (b0 < 0x80 || (b0 & 0xc0) == 0x80) { cp = b0; bi += 1 }
      else if ((b0 & 0xe0) == 0xc0) {
        if (bi + 2 > bytes.length) { cp = b0; bi += 1 }
        else { cp = ((b0 & 0x1f) << 6) | (bytes(bi + 1) & 0x3f); bi += 2 }
      } else if ((b0 & 0xf0) == 0xe0) {
        if (bi + 3 > bytes.length) { cp = b0; bi += 1 }
        else {
          cp = ((b0 & 0x0f) << 12) | ((bytes(bi + 1) & 0x3f) << 6) |
            (bytes(bi + 2) & 0x3f)
          bi += 3
        }
      } else {
        if (bi + 4 > bytes.length) { cp = b0; bi += 1 }
        else {
          cp = ((b0 & 0x07) << 18) | ((bytes(bi + 1) & 0x3f) << 12) |
            ((bytes(bi + 2) & 0x3f) << 6) | (bytes(bi + 3) & 0x3f)
          bi += 4
        }
      }
      // block of codepoint i under boundaries ⌊b·len/64⌋:
      // b = ((i+1)·64 − 1) div len (the standard partition inverse).
      // Clamped: on malformed input the single-byte fallback can decode
      // MORE codepoints than numChars() predicted, so i may pass len
      val blk = math.min(63, (((i + 1L) * 64L - 1L) / len).toInt)
      bsum(blk) += cp
      stot += cp
      i += 1L
    }
    var phash = 0L
    var b = 0
    while (b < 64) {
      val sz = ((b + 1L) * len / 64L) - (b.toLong * len / 64L)
      if (bsum(b) * len > stot * sz) phash |= (1L << b)
      b += 1
    }
    InternalRow(len, phash)
  }

  /** Block-mean RESIZE of a string-as-grayscale payload (the
    * `mm_resize` kernel): the codepoint stream reads as a row-major
    * `width`-column matrix, every pixel lands in the integer-boundary
    * `grid`×`grid` cell (pr = row·grid div rows — the avgHash64 block
    * convention; pc = (i mod width) div (width/grid)), and each
    * non-empty cell emits (pr, pc, n_pix, mean_gray) with the exact
    * integer mean (sum div count). One fold per document inside
    * whole-stage codegen — the pixels never leave the kernel, so what
    * reaches the downstream plan is ≤ grid² rows/doc instead of one
    * row per character (the r14 posexplode shape this replaces).
    * Same BMP parity contract as [[graft.operators.MultimodalOps
    * .avgHash64]]: codepoints here = Spark `split('')+ascii` = DuckDB
    * `unicode()` on BMP text; real image bytes are unaffected. */
  def blockMeansData(s: UTF8String, width: Int, grid: Int): ArrayData = {
    if (s == null) return EmptyFrames
    val bytes = s.getBytes
    if (bytes.length == 0) return EmptyFrames
    val w = math.max(1, width)
    val g = math.max(1, grid)
    val colDiv = math.max(1, w / g)
    val len = s.numChars().toLong
    val rowsImg = (len + w - 1) / w
    val cells = g * g
    val cnt = new Array[Long](cells)
    val sum = new Array[Long](cells)
    var bi = 0
    var i = 0L
    while (bi < bytes.length) {
      val b0 = bytes(bi) & 0xff
      var cp = 0
      // malformed-input guards (defensive, matching the other kernels):
      // an unexpected continuation lead (0x80-0xBF) or a sequence
      // truncated at the buffer end decodes as a single byte instead of
      // reading past `bytes` — unreachable from a valid UTF8String, but
      // the kernel must not be one bad cast away from a task-killing
      // ArrayIndexOutOfBoundsException (r15 advice)
      if (b0 < 0x80 || (b0 & 0xc0) == 0x80) { cp = b0; bi += 1 }
      else if ((b0 & 0xe0) == 0xc0) {
        if (bi + 2 > bytes.length) { cp = b0; bi += 1 }
        else { cp = ((b0 & 0x1f) << 6) | (bytes(bi + 1) & 0x3f); bi += 2 }
      } else if ((b0 & 0xf0) == 0xe0) {
        if (bi + 3 > bytes.length) { cp = b0; bi += 1 }
        else {
          cp = ((b0 & 0x0f) << 12) | ((bytes(bi + 1) & 0x3f) << 6) |
            (bytes(bi + 2) & 0x3f)
          bi += 3
        }
      } else {
        if (bi + 4 > bytes.length) { cp = b0; bi += 1 }
        else {
          cp = ((b0 & 0x07) << 18) | ((bytes(bi + 1) & 0x3f) << 12) |
            ((bytes(bi + 2) & 0x3f) << 6) | (bytes(bi + 3) & 0x3f)
          bi += 4
        }
      }
      // pr clamped like pc: on malformed input the single-byte fallback
      // can decode more codepoints than numChars() predicted (i > len)
      val pr = math.min(g - 1, ((i / w) * g / rowsImg).toInt)
      val pc = math.min(g - 1, ((i % w) / colDiv).toInt)
      val k = pr * g + pc
      cnt(k) += 1L
      sum(k) += cp
      i += 1L
    }
    val out = new Array[Any](cells)
    var k = 0
    var c = 0
    while (c < cells) {
      if (cnt(c) > 0L) {
        out(k) = InternalRow((c / g).toLong, (c % g).toLong, cnt(c),
          sum(c) / cnt(c))
        k += 1
      }
      c += 1
    }
    if (k == out.length) new GenericArrayData(out)
    else new GenericArrayData(java.util.Arrays.copyOf(
      out.asInstanceOf[Array[AnyRef]], k))
  }

  /** Per-frame energy stats of a binary payload — the audio
    * feature-extraction / silence-detection (VAD) plumbing: the same
    * chunk geometry as [[frameSigsData]], but each sampled frame emits
    * its exact integer energy (sum of squared unsigned bytes) and peak
    * byte value instead of a content signature. Energy of a 2^31-byte
    * frame still fits a long (255² · 2^31 < 2^48). */
  def frameEnergyData(bytes: Array[Byte], frameSize: Int,
                      stride: Int): ArrayData = {
    if (bytes == null || bytes.length == 0) return EmptyFrames
    val n = math.max(1, frameSize * stride)
    val frames = new Array[Any]((bytes.length + n - 1) / n)
    var f = 0
    var off = 0
    while (off < bytes.length) {
      var e = 0L
      var p = 0
      var i = off
      val end = math.min(bytes.length, off + frameSize)
      while (i < end) {
        val b = bytes(i) & 0xff
        e += b.toLong * b
        if (b > p) p = b
        i += 1
      }
      frames(f) = InternalRow(off / n, e, p)
      f += 1
      off += n
    }
    new GenericArrayData(frames)
  }

  /** Stereo (interleaved 2-channel) sibling of [[frameEnergyData]]:
    * the same frame geometry (frames start at off = k·frameSize·stride
    * and read `frameSize` bytes), but bytes deinterleave inside the
    * frame — even in-frame positions are channel L, odd are channel R
    * (the PCM interleave convention). Each sampled frame emits exact
    * integer per-channel energy (Σ b²) and peak plus the inter-channel
    * cross-sum Σ l·r over complete pairs — the correlation numerator a
    * stereo-width / mono-compatibility gate thresholds (all addends
    * non-negative: 255²·2³¹ < 2⁴⁸ holds per channel and for the
    * cross-sum alike). null/empty payload → empty array. */
  def frameEnergyStereoData(bytes: Array[Byte], frameSize: Int,
                            stride: Int): ArrayData = {
    if (bytes == null || bytes.length == 0) return EmptyFrames
    val n = math.max(1, frameSize * stride)
    val frames = new Array[Any]((bytes.length + n - 1) / n)
    var f = 0
    var off = 0
    while (off < bytes.length) {
      var el = 0L
      var er = 0L
      var pl = 0
      var pr = 0
      var xs = 0L
      var i = off
      val end = math.min(bytes.length, off + frameSize)
      while (i < end) {
        val l = bytes(i) & 0xff
        el += l.toLong * l
        if (l > pl) pl = l
        if (i + 1 < end) {
          val r = bytes(i + 1) & 0xff
          er += r.toLong * r
          if (r > pr) pr = r
          xs += l.toLong * r
        }
        i += 2
      }
      frames(f) = InternalRow(off / n, el, er, pl, pr, xs)
      f += 1
      off += n
    }
    new GenericArrayData(frames)
  }

  /** Per-chunk signatures of a binary payload — the frame-sampling
    * kernel: every `stride`th `frameSize`-byte chunk gets a base-31
    * fold over *unsigned* bytes (same convention as the media stub
    * decode). null/empty input → empty array (no frames). */
  def frameSigsData(bytes: Array[Byte], frameSize: Int, stride: Int): ArrayData = {
    if (bytes == null || bytes.length == 0) return EmptyFrames
    val n = math.max(1, frameSize * stride)
    val frames = new Array[Any]((bytes.length + n - 1) / n)
    var f = 0
    var off = 0
    while (off < bytes.length) {
      var h = 1125899906842597L
      var i = off
      val end = math.min(bytes.length, off + frameSize)
      while (i < end) { h = 31 * h + (bytes(i) & 0xff); i += 1 }
      frames(f) = InternalRow(off / n, h)
      f += 1
      off += n
    }
    new GenericArrayData(frames)
  }
}

/** `band_buckets(sig, bands, rows)` — fold a MinHash signature into one
  * 64-bit bucket key per band (band id in the top byte), the LSH banding
  * step. Native because the FNV-style fold overflows Long deliberately,
  * which ANSI-mode built-in arithmetic refuses to do.
  *
  * Null convention: a null signature array folds like an EMPTY signature
  * — each band yields its deterministic empty-fold key. Null signatures
  * never arise from `minhash_sig` (never-null); feeding externally-built
  * nullable signatures groups all null rows into the same buckets. */
case class BandBuckets(child: Expression, bands: Expression, rows: Expression)
    extends Expression {
  override def children: Seq[Expression] = Seq(child, bands, rows)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "band_buckets"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _)
      if GraftExpressions.nonNullIntLiteral(bands) &&
        GraftExpressions.nonNullIntLiteral(rows) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "band_buckets requires (array<bigint>, non-null int literal, non-null int literal)")
  }
  private lazy val bandsV = bands.eval().asInstanceOf[Int]
  private lazy val rowsV = rows.eval().asInstanceOf[Int]
  override def eval(input: InternalRow): Any =
    HashKernels.bandBucketsData(child.eval(input).asInstanceOf[ArrayData],
      bandsV, rowsV)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"${c.code}\nArrayData ${ev.value} = " +
      code"graft.plans.HashKernels.bandBucketsData(" +
      code"${c.isNull} ? null : ${c.value}, $bandsV, $rowsV);",
      isNull = FalseLiteral)
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BandBuckets =
    copy(child = newChildren(0), bands = newChildren(1), rows = newChildren(2))
}

/** `minhash_sig(tokens, k, num)` — k and num must be foldable ints. */
case class MinHashSig(child: Expression, k: Expression, num: Expression)
    extends Expression {
  override def children: Seq[Expression] = Seq(child, k, num)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType match {
      case ArrayType(StringType, _) => false; case _ => true
    }) TypeCheckResult.TypeCheckFailure("minhash_sig requires array<string>")
    else if (!GraftExpressions.nonNullIntLiteral(k) ||
      !GraftExpressions.nonNullIntLiteral(num))
      TypeCheckResult.TypeCheckFailure(
        "minhash_sig requires non-null int literal k/num")
    else TypeCheckResult.TypeCheckSuccess
  private lazy val kV = k.eval().asInstanceOf[Int]
  private lazy val numV = num.eval().asInstanceOf[Int]
  override def eval(input: InternalRow): Any =
    HashKernels.minHashData(child.eval(input).asInstanceOf[ArrayData], kV, numV)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"${c.code}\nArrayData ${ev.value} = " +
      code"graft.plans.HashKernels.minHashData(" +
      code"${c.isNull} ? null : ${c.value}, $kV, $numV);",
      isNull = FalseLiteral)
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashSig =
    copy(child = newChildren(0), k = newChildren(1), num = newChildren(2))
}

/** `shingle_hashes(tokens, k)` — FNV-1a of every k-token shingle (see
  * [[HashKernels.shingleHashesData]]); the codegen-tier map kernel of
  * the whole shingle→hash dedup family. */
case class ShingleHashes(child: Expression, k: Expression)
    extends Expression {
  override def children: Seq[Expression] = Seq(child, k)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType match {
      case ArrayType(StringType, _) => false; case _ => true
    }) TypeCheckResult.TypeCheckFailure("shingle_hashes requires array<string>")
    else if (!GraftExpressions.nonNullIntLiteral(k))
      TypeCheckResult.TypeCheckFailure(
        "shingle_hashes requires a non-null int literal k")
    else TypeCheckResult.TypeCheckSuccess
  private lazy val kV = k.eval().asInstanceOf[Int]
  override def eval(input: InternalRow): Any =
    HashKernels.shingleHashesData(
      child.eval(input).asInstanceOf[ArrayData], kV)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"${c.code}\nArrayData ${ev.value} = " +
      code"graft.plans.HashKernels.shingleHashesData(" +
      code"${c.isNull} ? null : ${c.value}, $kV);",
      isNull = FalseLiteral)
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ShingleHashes =
    copy(child = newChildren(0), k = newChildren(1))
}

/** `simhash64(tokens)` → 64-bit SimHash. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def prettyName: String = "simhash64"
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got ${other.catalogString}")
  }
  override def eval(input: InternalRow): Any =
    HashKernels.simHashData(child.eval(input).asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"${c.code}\nlong ${ev.value} = " +
      code"graft.plans.HashKernels.simHashData(${c.isNull} ? null : ${c.value});",
      isNull = FalseLiteral)
  }
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** `sign_bits(embedding, planes)` — hyperplane LSH signature; planes must
  * be a foldable int; accepts array<float> or array<double>. */
case class SignBits(child: Expression, planes: Expression) extends BinaryExpression {
  override def left: Expression = child
  override def right: Expression = planes
  override def prettyName: String = "sign_bits"
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _)
      if GraftExpressions.nonNullIntLiteral(planes) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "sign_bits requires array<float|double> and a non-null int literal plane count")
  }
  private lazy val planesV = planes.eval().asInstanceOf[Int]
  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def eval(input: InternalRow): Any =
    HashKernels.signBitsData(child.eval(input).asInstanceOf[ArrayData],
      planesV, isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"${c.code}\nlong ${ev.value} = " +
      code"graft.plans.HashKernels.signBitsData(" +
      code"${c.isNull} ? null : ${c.value}, $planesV, $isFloat);",
      isNull = FalseLiteral)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SignBits =
    copy(child = newLeft, planes = newRight)
}

/** `seeded_hash(s, seed)` — seeded FNV/splitmix family (null-safe). */
case class SeededHash(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "seeded_hash"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("seeded_hash requires (string, int)")
  override def nullSafeEval(s: Any, seed: Any): Any =
    HashKernels.seededData(s.asInstanceOf[UTF8String], seed.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, d) => s"graft.plans.HashKernels.seededData($s, $d)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SeededHash =
    copy(left = newLeft, right = newRight)
}

/** `sorted_intersect_count(a, b)` — set-intersection size of two
  * ascending-sorted long arrays (see
  * [[HashKernels.sortedIntersectCount]]); the codegen-tier verification
  * kernel of the prefix-filtered jaccard join. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "sorted_intersect_count"
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType,
      right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "sorted_intersect_count requires (array<bigint>, array<bigint>)")
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    HashKernels.sortedIntersectCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.plans.HashKernels.sortedIntersectCount($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** `rolling_fingerprint(s)` — base-31 rolling hash (null-safe). */
case class RollingFingerprint(child: Expression) extends UnaryExpression {
  override def prettyName: String = "rolling_fingerprint"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    TextKernels.requireString(child, prettyName)
  override def nullSafeEval(s: Any): Any =
    HashKernels.rollingData(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.plans.HashKernels.rollingData($s)")
  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)
}

/** `lang_id(text)` — stopword/char-class language heuristic; null → "und"
  * (the kernel's convention), never null. */
case class LangId(child: Expression) extends UnaryExpression {
  override def prettyName: String = "lang_id"
  override def nullable: Boolean = false
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    TextKernels.requireString(child, prettyName)
  override def eval(input: InternalRow): Any =
    HashKernels.langIdData(child.eval(input).asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"${c.code}\nUTF8String ${ev.value} = " +
      code"graft.plans.HashKernels.langIdData(${c.isNull} ? null : ${c.value});",
      isNull = FalseLiteral)
  }
  override protected def withNewChildInternal(newChild: Expression): LangId =
    copy(child = newChild)
}

/** `decode_ez(s, days)` (F18) — pagecounts-ez day vector; null input
  * decodes to zeros, never null; days must be a foldable int. */
case class DecodeEz(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "decode_ez"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType &&
      GraftExpressions.nonNullIntLiteral(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "decode_ez requires (string, non-null int literal)")
  private lazy val daysV = right.eval().asInstanceOf[Int]
  override def eval(input: InternalRow): Any =
    HashKernels.decodeEzData(left.eval(input).asInstanceOf[UTF8String], daysV)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = left.genCode(ctx)
    ev.copy(code = code"${c.code}\nArrayData ${ev.value} = " +
      code"graft.plans.HashKernels.decodeEzData(" +
      code"${c.isNull} ? null : ${c.value}, $daysV);",
      isNull = FalseLiteral)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DecodeEz =
    copy(left = newLeft, right = newRight)
}

/** `frame_sigs(bin, frame_size, stride)` — one (idx, sig) struct per
  * sampled fixed-size chunk of a binary payload, the frame-sampling
  * seam's hot path as a codegen expression (it runs once per row over
  * video-scale corpora, so no UDF boxing). null/empty payload → empty
  * array, never null. */
case class FrameSigs(child: Expression, frameSize: Expression,
                     stride: Expression) extends Expression {
  override def children: Seq[Expression] = Seq(child, frameSize, stride)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("idx", IntegerType, nullable = false),
      StructField("sig", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "frame_sigs"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType
      if GraftExpressions.nonNullIntLiteral(frameSize) &&
        GraftExpressions.nonNullIntLiteral(stride) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "frame_sigs requires (binary, non-null int literal, non-null int literal)")
  }
  private lazy val frameSizeV = frameSize.eval().asInstanceOf[Int]
  private lazy val strideV = stride.eval().asInstanceOf[Int]
  override def eval(input: InternalRow): Any =
    HashKernels.frameSigsData(child.eval(input).asInstanceOf[Array[Byte]],
      frameSizeV, strideV)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"${c.code}\nArrayData ${ev.value} = " +
      code"graft.plans.HashKernels.frameSigsData(" +
      code"${c.isNull} ? null : ${c.value}, $frameSizeV, $strideV);",
      isNull = FalseLiteral)
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FrameSigs =
    copy(child = newChildren(0), frameSize = newChildren(1),
      stride = newChildren(2))
}

/** `frame_energy(bin, frameSize, stride)` — one (idx, energy, peak)
  * struct per sampled frame: the feature-stat sibling of [[FrameSigs]]
  * (audio VAD / level-metering plumbing). Native so the per-byte
  * square-and-sum stays inside whole-stage codegen on media-scale
  * payloads; all arithmetic is exact integer. */
case class FrameEnergy(child: Expression, frameSize: Expression,
                       stride: Expression) extends Expression {
  override def children: Seq[Expression] = Seq(child, frameSize, stride)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("idx", IntegerType, nullable = false),
      StructField("energy", LongType, nullable = false),
      StructField("peak", IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "frame_energy"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType
      if GraftExpressions.nonNullIntLiteral(frameSize) &&
        GraftExpressions.nonNullIntLiteral(stride) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "frame_energy requires (binary, non-null int literal, non-null int literal)")
  }
  private lazy val frameSizeV = frameSize.eval().asInstanceOf[Int]
  private lazy val strideV = stride.eval().asInstanceOf[Int]
  override def eval(input: InternalRow): Any =
    HashKernels.frameEnergyData(child.eval(input).asInstanceOf[Array[Byte]],
      frameSizeV, strideV)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"${c.code}\nArrayData ${ev.value} = " +
      code"graft.plans.HashKernels.frameEnergyData(" +
      code"${c.isNull} ? null : ${c.value}, $frameSizeV, $strideV);",
      isNull = FalseLiteral)
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FrameEnergy =
    copy(child = newChildren(0), frameSize = newChildren(1),
      stride = newChildren(2))
}

/** `frame_energy_stereo(bin, frameSize, stride)` — one (idx, energy_l,
  * energy_r, peak_l, peak_r, xsum) struct per sampled frame of an
  * interleaved 2-channel payload (see
  * [[HashKernels.frameEnergyStereoData]]). Native for the
  * [[FrameEnergy]] reason: a per-byte square-and-sum over media-scale
  * payloads must stay inside whole-stage codegen. */
case class FrameEnergyStereo(child: Expression, frameSize: Expression,
                             stride: Expression) extends Expression {
  override def children: Seq[Expression] = Seq(child, frameSize, stride)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("idx", IntegerType, nullable = false),
      StructField("energy_l", LongType, nullable = false),
      StructField("energy_r", LongType, nullable = false),
      StructField("peak_l", IntegerType, nullable = false),
      StructField("peak_r", IntegerType, nullable = false),
      StructField("xsum", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "frame_energy_stereo"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType
      if GraftExpressions.nonNullIntLiteral(frameSize) &&
        GraftExpressions.nonNullIntLiteral(stride) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "frame_energy_stereo requires (binary, non-null int literal, non-null int literal)")
  }
  private lazy val frameSizeV = frameSize.eval().asInstanceOf[Int]
  private lazy val strideV = stride.eval().asInstanceOf[Int]
  override def eval(input: InternalRow): Any =
    HashKernels.frameEnergyStereoData(
      child.eval(input).asInstanceOf[Array[Byte]], frameSizeV, strideV)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"${c.code}\nArrayData ${ev.value} = " +
      code"graft.plans.HashKernels.frameEnergyStereoData(" +
      code"${c.isNull} ? null : ${c.value}, $frameSizeV, $strideV);",
      isNull = FalseLiteral)
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FrameEnergyStereo =
    copy(child = newChildren(0), frameSize = newChildren(1),
      stride = newChildren(2))
}

/** `patch_sigs(bin, width, patch)` — one (pr, pc, sig) struct per
  * non-empty patch of the payload read as a row-major `width`-column
  * byte matrix: the 2D sibling of [[FrameSigs]] (ViT-style patch
  * extraction plumbing). Native for the same reason: a per-byte fold
  * over image-scale payloads is a hot path that must stay inside
  * whole-stage codegen, and the deliberate Long overflow is outside
  * ANSI-mode built-in arithmetic. */
case class PatchSigs(child: Expression, width: Expression,
                     patch: Expression) extends Expression {
  override def children: Seq[Expression] = Seq(child, width, patch)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pr", IntegerType, nullable = false),
      StructField("pc", IntegerType, nullable = false),
      StructField("sig", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "patch_sigs"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType
      if GraftExpressions.nonNullIntLiteral(width) &&
        GraftExpressions.nonNullIntLiteral(patch) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "patch_sigs requires (binary, non-null int literal, non-null int literal)")
  }
  private lazy val widthV = width.eval().asInstanceOf[Int]
  private lazy val patchV = patch.eval().asInstanceOf[Int]
  override def eval(input: InternalRow): Any =
    HashKernels.patchSigsData(child.eval(input).asInstanceOf[Array[Byte]],
      widthV, patchV)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"${c.code}\nArrayData ${ev.value} = " +
      code"graft.plans.HashKernels.patchSigsData(" +
      code"${c.isNull} ? null : ${c.value}, $widthV, $patchV);",
      isNull = FalseLiteral)
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PatchSigs =
    copy(child = newChildren(0), width = newChildren(1),
      patch = newChildren(2))
}

/** `block_means(text, width, grid)` — one (pr, pc, n_pix, mean_gray)
  * struct per non-empty cell of the integer-boundary `grid`×`grid`
  * block grid over the payload read as a row-major `width`-column
  * codepoint matrix: the downsample (thumbnail) verb of the multimodal
  * family as a single codegen fold, so the per-pixel work never
  * materializes rows (see [[HashKernels.blockMeansData]]). null/empty
  * payload → empty array, never null. */
case class BlockMeans(child: Expression, width: Expression,
                      grid: Expression) extends Expression {
  override def children: Seq[Expression] = Seq(child, width, grid)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pr", LongType, nullable = false),
      StructField("pc", LongType, nullable = false),
      StructField("n_pix", LongType, nullable = false),
      StructField("mean_gray", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "block_means"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType
      if GraftExpressions.nonNullIntLiteral(width) &&
        GraftExpressions.nonNullIntLiteral(grid) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "block_means requires (string, non-null int literal, non-null int literal)")
  }
  private lazy val widthV = width.eval().asInstanceOf[Int]
  private lazy val gridV = grid.eval().asInstanceOf[Int]
  override def eval(input: InternalRow): Any =
    HashKernels.blockMeansData(child.eval(input).asInstanceOf[UTF8String],
      widthV, gridV)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"${c.code}\nArrayData ${ev.value} = " +
      code"graft.plans.HashKernels.blockMeansData(" +
      code"${c.isNull} ? null : ${c.value}, $widthV, $gridV);",
      isNull = FalseLiteral)
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BlockMeans =
    copy(child = newChildren(0), width = newChildren(1),
      grid = newChildren(2))
}

/** `ahash64(text)` — (n_pix, phash) aHash struct in one codegen fold
  * (see [[HashKernels.aHash64Data]]); empty/null → (0, 0), never null. */
case class AHash64(child: Expression) extends UnaryExpression {
  override def prettyName: String = "ahash64"
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n_pix", LongType, nullable = false),
    StructField("phash", LongType, nullable = false)))
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ahash64 requires string, got ${other.catalogString}")
  }
  override def eval(input: InternalRow): Any =
    HashKernels.aHash64Data(child.eval(input).asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"${c.code}\nInternalRow ${ev.value} = " +
      code"graft.plans.HashKernels.aHash64Data(${c.isNull} ? null : ${c.value});",
      isNull = FalseLiteral)
  }
  override protected def withNewChildInternal(newChild: Expression): AHash64 =
    copy(child = newChild)
}

/** `normalize_title(s)` — wikistats title normalization (null-safe). */
case class NormalizeTitle(child: Expression) extends UnaryExpression {
  override def prettyName: String = "normalize_title"
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    TextKernels.requireString(child, prettyName)
  override def nullSafeEval(s: Any): Any =
    HashKernels.normalizeTitleData(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.plans.HashKernels.normalizeTitleData($s)")
  override protected def withNewChildInternal(newChild: Expression): NormalizeTitle =
    copy(child = newChild)
}

/** `freebase_encode(s)` — MQL key encoding (null-safe). */
case class FreebaseEncode(child: Expression) extends UnaryExpression {
  override def prettyName: String = "freebase_encode"
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    TextKernels.requireString(child, prettyName)
  override def nullSafeEval(s: Any): Any =
    HashKernels.freebaseEncodeData(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.plans.HashKernels.freebaseEncodeData($s)")
  override protected def withNewChildInternal(newChild: Expression): FreebaseEncode =
    copy(child = newChild)
}

/** `cut_last(s, n)` — drop the last n chars; null string → "" (the
  * kernel's convention), never null. */
case class CutLast(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "cut_last"
  override def nullable: Boolean = false
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("cut_last requires (string, int)")
  override def eval(input: InternalRow): Any = {
    val n = right.eval(input)
    HashKernels.cutLastData(left.eval(input).asInstanceOf[UTF8String],
      if (n == null) 0 else n.asInstanceOf[Int])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    ev.copy(code = code"${l.code}\n${r.code}\nUTF8String ${ev.value} = " +
      code"graft.plans.HashKernels.cutLastData(" +
      code"${l.isNull} ? null : ${l.value}, ${r.isNull} ? 0 : ${r.value});",
      isNull = FalseLiteral)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CutLast =
    copy(left = newLeft, right = newRight)
}

/** `extract_domain(url)` — PSL-subset domain extraction; malformed input
  * → null (the kernel's convention). */
case class ExtractDomain(child: Expression) extends UnaryExpression {
  override def prettyName: String = "extract_domain"
  // null for MALFORMED input too, not only null input — the default
  // child-derived nullability would be wrong on non-null children
  override def nullable: Boolean = true
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    TextKernels.requireString(child, prettyName)
  override def nullSafeEval(s: Any): Any =
    HashKernels.extractDomainData(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // result can be null for non-null input (malformed url), so the
    // default defineCodeGen null contract does not apply
    val c = child.genCode(ctx)
    val resultTerm = ctx.freshName("domain")
    ev.copy(code = code"${c.code}\nUTF8String $resultTerm = ${c.isNull} ? " +
      code"null : graft.plans.HashKernels.extractDomainData(${c.value});\n" +
      code"boolean ${ev.isNull} = $resultTerm == null;\n" +
      code"UTF8String ${ev.value} = $resultTerm;")
  }
  override protected def withNewChildInternal(newChild: Expression): ExtractDomain =
    copy(child = newChild)
}
