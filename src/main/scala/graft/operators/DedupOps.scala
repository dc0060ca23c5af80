package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/** Deduplication operators for large text corpora (driver brief: a core
  * LLM-data-pipeline capability; reference analogue: the distinct-dedup
  * A13, python/id2title.py:41-59 — extended here to content and near-dup
  * semantics).
  *
  * Scale stance (100 TB):
  *  - exact dedup is a hash groupBy — one shuffle on the 128-bit content
  *    hash, never on the text itself;
  *  - near-dup is banded MinHash LSH: explode to (band_hash) keys and
  *    self-join per bucket — candidate generation is linear in corpus
  *    size + bucket sizes, NEVER all-pairs; huge buckets (degenerate
  *    content) are capped to bound worst-case joins;
  *  - verification (exact Jaccard) runs only on candidate pairs.
  */
object DedupOps {

  private val sigUdf = udf((toks: Seq[String], k: Int, num: Int) =>
    Hashing.minHash(Hashing.shingles(toks, k).toSet, num))
  private val bandUdf = udf((sig: Seq[Long], bands: Int, rows: Int) =>
    (0 until bands).map { b =>
      var h = Hashing.FnvOffset
      var i = b * rows
      while (i < (b + 1) * rows && i < sig.length) {
        h ^= sig(i); h *= Hashing.FnvPrime; i += 1
      }
      (b.toLong << 56) ^ (h >>> 8) // band id folded into the bucket key
    })
  private val jaccardUdf = udf((a: Seq[String], b: Seq[String]) => {
    val sa = a.toSet; val sb = b.toSet
    val inter = sa.intersect(sb).size
    val union = sa.size + sb.size - inter
    if (union == 0) 1.0 else inter.toDouble / union
  })
  private val simhashUdf = udf((toks: Seq[String]) => Hashing.simHash(toks))

  /** Exact content dedup: group by md5(text); emit (hash, keep_id = min id,
    * dup_count). Downstream `docs.join(result, "doc_id"==keep_id)` keeps one
    * representative per content group. */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Near-duplicate candidate pairs via banded MinHash LSH.
    *
    * signature(num = bands*rowsPerBand) → per-band bucket hash → explode →
    * groupBy bucket (bounded by `maxBucket`) → within-bucket pairs
    * (id_a < id_b) → distinct. `threshold`-level verification is the
    * caller's second stage (see `verifiedNearDups`).
    */
  def minhashCandidates(docs: DataFrame, idCol: String, textCol: String,
                        shingleK: Int = 3, bands: Int = 8,
                        rowsPerBand: Int = 4,
                        maxBucket: Int = 1000): DataFrame = {
    val num = bands * rowsPerBand
    val sigs = docs.select(col(idCol).as("doc_id"),
        TermOps.tokens(col(textCol)).as("toks"))
      .withColumn("sig", sigUdf(col("toks"), lit(shingleK), lit(num)))
      .withColumn("bucket", explode(bandUdf(col("sig"), lit(bands), lit(rowsPerBand))))
      .select("doc_id", "bucket")
    val grouped = sigs.groupBy("bucket")
      .agg(collect_list("doc_id").as("ids"))
      .filter(size(col("ids")) between(2, maxBucket))
    grouped.select(explode(pairCombinations(col("ids"))).as("p"))
      .select(col("p._1").as("id_a"), col("p._2").as("id_b"))
      .distinct()
  }

  private val pairCombinations = udf((ids: Seq[Long]) => {
    val s = ids.distinct.sorted
    for {
      i <- s.indices
      j <- (i + 1) until s.length
    } yield (s(i), s(j))
  })

  /** Candidates + exact n-gram Jaccard verification ≥ threshold. The
    * verify join fetches each side's tokens by id — two shuffles on ids,
    * Jaccard computed only for candidates. */
  def verifiedNearDups(docs: DataFrame, idCol: String, textCol: String,
                       threshold: Double, shingleK: Int = 3,
                       bands: Int = 8, rowsPerBand: Int = 4): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      TermOps.tokens(col(textCol)).as("toks"))
    val shingled = toks.select(col("id"),
      udf((t: Seq[String]) => Hashing.shingles(t, shingleK)).apply(col("toks")).as("sh"))
    minhashCandidates(docs, idCol, textCol, shingleK, bands, rowsPerBand)
      .join(shingled.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(shingled.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .withColumn("jaccard", jaccardUdf(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Exact n-gram Jaccard near-dup pairs via a shingle inverted-index
    * join — deterministic (oracle-checkable), unlike the probabilistic
    * LSH path. Shingles occurring in more than `maxShingleDf` docs are
    * excluded from the similarity (they carry no discriminative signal
    * and would blow up the self-join fanout at scale); docs with fewer
    * than `shingleK` tokens are skipped. Never an all-pairs product:
    * the join is keyed on shingle, intersection counts come from a
    * groupBy, and sizes join back by id. */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                   threshold: Double, shingleK: Int = 3,
                   maxShingleDf: Long = 100L): DataFrame = {
    // shingles travel as 64-bit FNV hashes: ~10× smaller shuffle keys for
    // the inverted-index join; a collision (~2^-64 per pair) would merge
    // two shingles and is detectable by the exact oracle. The whole
    // shingle→hash stage is built-in HOFs + the native fnv64 expression
    // (same kernel as Hashing.fnv1a), so the per-document hot path stays
    // inside whole-stage codegen — no UDF.
    graft.plans.GraftSparkExtensions.install(docs.sparkSession)
    val shingled = docs
      .select(col(idCol).as("id"), TermOps.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= shingleK)
      .withColumn("sh_str",
        array_distinct(TermOps.shingleStrings(col("toks"), shingleK)))
      .select(col("id"), explode(expr("transform(sh_str, x -> fnv64(x))")).as("sh"))
    val kept = shingled.groupBy("sh").agg(count(lit(1)).as("sdf"))
      .filter(col("sdf") <= maxShingleDf).select("sh")
    val shk = shingled.join(kept, Seq("sh"))
    val sizes = shk.groupBy("id").agg(count(lit(1)).as("n"))
    val inter = shk.select(col("sh"), col("id").as("id_a"))
      .join(shk.select(col("sh"), col("id").as("id_b")), Seq("sh"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("i"))
    inter
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n", "na"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n", "nb"), "id_b")
      .withColumn("jaccard",
        col("i").cast("double") / (col("na") + col("nb") - col("i")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Connected components over a near-dup pair list — the clustering
    * step that turns pairwise dedup output into "keep one doc per
    * cluster" (component id = min doc id in the component, so the
    * representative is deterministic).
    *
    * Iterative min-label propagation: each round every node takes the
    * minimum of its own label and its neighbors' labels; converges in
    * O(component diameter) rounds. Every round is one distributed
    * join + aggregation; the driver only inspects a scalar
    * changed-count per round (no data collect). Near-dup components
    * are shallow in practice (dup clusters are cliques or short
    * chains), so rounds stay single-digit; a component whose diameter
    * exceeds `maxIter` fails LOUDLY rather than returning silently
    * split components. The returned frame is persisted (it was
    * materialized by the final convergence check); callers owning
    * long sessions may unpersist it when done. */
  def connectedComponents(pairs: DataFrame, aCol: String = "id_a",
                          bCol: String = "id_b", maxIter: Int = 50): DataFrame = {
    // the edge list (often the output of an expensive dedup computation)
    // is re-joined every round — materialize it once instead of
    // recomputing its whole lineage per iteration
    val edges = pairs.select(col(aCol).as("u"), col(bCol).as("v"))
      .unionByName(pairs.select(col(bCol).as("u"), col(aCol).as("v")))
      .distinct()
      .persist()
    var labels = edges.select(col("u").as("node")).distinct()
      .withColumn("component", col("node"))
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("node", "v")
          .withColumnRenamed("component", "nbr_label"), Seq("v"))
        .groupBy(col("u").as("node"))
        .agg(min(col("nbr_label")).as("min_nbr"))
      // every labeled node has ≥1 neighbor (labels = distinct edge
      // endpoints), so an inner join is total here
      val next = labels.join(viaNeighbors, Seq("node"))
        .select(col("node"),
          least(col("component"), col("min_nbr")).as("component"))
      next.persist()
      val changed = next.join(labels.withColumnRenamed("component", "prev"), Seq("node"))
        .filter(col("component") =!= col("prev")).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      iter += 1
    }
    edges.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents: not converged after $maxIter rounds — " +
          "a component's diameter exceeds maxIter; raise it")
    labels
  }

  /** SimHash near-dup candidates: 64-bit signature split into `chunks`
    * pieces; docs sharing any chunk value are candidates (hamming ≤
    * chunks-1 guaranteed covered). Same explode/groupBy shape as LSH. */
  def simhashCandidates(docs: DataFrame, idCol: String, textCol: String,
                        chunks: Int = 4, maxBucket: Int = 1000): DataFrame = {
    val bits = 64 / chunks
    val chunkUdf = udf((sig: Long) =>
      (0 until chunks).map(c => (c.toLong << 58) ^ ((sig >>> (c * bits)) & ((1L << bits) - 1))))
    val keyed = docs.select(col(idCol).as("doc_id"),
        simhashUdf(TermOps.tokens(col(textCol))).as("sig"))
      .withColumn("bucket", explode(chunkUdf(col("sig"))))
    keyed.groupBy("bucket").agg(collect_list(struct("doc_id", "sig")).as("xs"))
      .filter(size(col("xs")) between(2, maxBucket))
      .select(explode(simhashPairs(col("xs"))).as("p"))
      .select(col("p.id_a"), col("p.id_b"), col("p.hamming"))
      .groupBy("id_a", "id_b").agg(min("hamming").as("hamming"))
  }

  private val simhashPairs = udf((xs: Seq[org.apache.spark.sql.Row]) => {
    val s = xs.map(r => (r.getLong(0), r.getLong(1))).distinct.sortBy(_._1)
    for {
      i <- s.indices
      j <- (i + 1) until s.length
    } yield SimPair(s(i)._1, s(j)._1, Hashing.hamming(s(i)._2, s(j)._2))
  })
}

case class SimPair(id_a: Long, id_b: Long, hamming: Int)
