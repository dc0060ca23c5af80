package graft.functions

/** Deterministic, seedable 64-bit hashing used by the dedup/similarity
  * operators (MinHash, SimHash, LSH, fingerprints). Self-contained FNV-1a +
  * splitmix64 finalizer so results are stable across Spark/JVM versions and
  * independent of Spark's murmur3 (`hash()`), which the oracle cannot
  * reproduce anyway.
  */
object Hashing {

  final val FnvOffset = 0xcbf29ce484222325L
  final val FnvPrime  = 0x100000001b3L

  /** FNV-1a over UTF-8 bytes. */
  def fnv1a(s: String): Long = {
    var h = FnvOffset
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= FnvPrime; i += 1 }
    h
  }

  /** splitmix64 finalizer — decorrelates seeded variants. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Seeded hash family: h_seed(s). */
  def seeded(s: String, seed: Int): Long = mix(fnv1a(s) ^ mix(seed.toLong))

  /** Polynomial rolling hash (Rabin–Karp) over code points, base 31,
    * in the positive-Long space. Used for document fingerprinting. */
  def rollingHash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) { h = h * 31 + s.charAt(i); i += 1 }
    h
  }

  /** Word k-shingles of a token list. Empty input yields no shingles (so
    * `minHash` returns its documented all-Long.MaxValue signature); an input
    * shorter than k yields the single joined shingle. */
  def shingles(tokens: Seq[String], k: Int): Seq[String] =
    if (tokens.isEmpty) Seq.empty
    else if (tokens.length < k) Seq(tokens.mkString(" "))
    else tokens.sliding(k).map(_.mkString(" ")).toSeq

  /** MinHash signature: for each of `num` seeded hash functions, the min
    * hash over the shingle set. Empty input → Long.MaxValue rows. */
  def minHash(shingleSet: Iterable[String], num: Int): Array[Long] = {
    val sig = Array.fill(num)(Long.MaxValue)
    shingleSet.foreach { sh =>
      val base = fnv1a(sh)
      var i = 0
      while (i < num) {
        val h = mix(base ^ mix(i.toLong))
        if (h < sig(i)) sig(i) = h
        i += 1
      }
    }
    sig
  }

  /** 64-bit SimHash over a token multiset. */
  def simHash(tokens: Seq[String]): Long = {
    val acc = new Array[Int](64)
    tokens.foreach { t =>
      val h = fnv1a(t)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
