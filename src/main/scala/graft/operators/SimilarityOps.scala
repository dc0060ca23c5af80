package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (`Array[Float]`), per the driver brief.
  *
  * Two paths:
  *  - `bruteForceTopK`: exact cosine top-k of a (small, broadcast) query
  *    set against the full corpus — the correctness baseline. One pass
  *    over the corpus, per-row top-k via window; dot products stay inside
  *    codegen'd higher-order functions (no UDF).
  *  - `lshTopK`: the scale path — random-hyperplane LSH buckets both
  *    sides; only same-bucket pairs are scored. Probes shrink the scored
  *    set from |corpus|×|queries| to bucket-local work; recall tunes via
  *    `planes` (fewer planes → bigger buckets → higher recall).
  */
object SimilarityOps {

  /** Cosine similarity of two float-array columns via built-in
    * higher-order functions (zip_with + aggregate — codegen-friendly,
    * no UDF). */
  /** Cosine similarity as the native codegen'd kernel (r13) —
    * bit-identical to the sequential HOF folds it replaced (pinned in
    * Round13Spec), but inside whole-stage codegen: the interpreted
    * zip_with/aggregate lambdas were the per-candidate cost of every
    * ANN scoring pass. */
  def cosine(a: Column, b: Column): Column =
    // the array<double> upcast keeps float-array callers working (the
    // HOF version coerced implicitly); SimplifyCasts erases it when
    // the input is already array<double> — every gated call site
    graft.GraftFunctions.cosineSim(a.cast("array<double>"),
      b.cast("array<double>"))

  /** The original HOF formulation, kept as the parity reference for
    * the kernel (and the literal shape the DuckDB oracles replay). */
  private[graft] def cosineHof(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y),
      lit(0.0d), (acc, x) => acc + x)
    val na = sqrt(aggregate(a, lit(0.0d), (acc, x) => acc + x * x))
    val nb = sqrt(aggregate(b, lit(0.0d), (acc, x) => acc + x * x))
    dot / (na * nb)
  }

  /** Johnson-Lindenstrauss random projection of an embedding column to
    * `outDims` dimensions, using the same deterministic hash-derived
    * hyperplane weights the LSH path uses ([[planeWeight]]: hash32 in
    * [-1, 1)). Dimensionality reduction as a PURE MAP — no training
    * pass, no model state, every vector projects independently, which
    * is what makes it the pre-ANN shrink step that needs zero extra
    * jobs at 100 TB (the dense sibling of Achlioptas' database-friendly
    * projections, JCSS 2003). Output is long-form (vec_id, dim, value)
    * scalar rows — oracle-comparable and trivially re-pivoted. Each
    * per-dim dot product is a SEQUENTIAL left fold (zip_with +
    * aggregate, codegen) so any engine replays it bit-identically in
    * array order; the weight vectors are plan-time literals. */
  def project(emb: DataFrame, idCol: String, embCol: String,
              inDims: Int, outDims: Int): DataFrame = {
    val projCols = (0 until outDims).map { p =>
      val w = array((0 until inDims).map(d =>
        lit(planeWeight(p, d, inDims))): _*)
      aggregate(zip_with(col(embCol).cast("array<double>"), w,
        (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)
    }
    emb.select(col(idCol).as("vec_id"),
        posexplode(array(projCols: _*)).as(Seq("dim", "value")))
      .select(col("vec_id"), col("dim"), round(col("value"), 4).as("value"))
  }

  /** Exact top-k neighbors for each query vector (queries broadcast). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("nbr_id"), col("embedding").as("nbr_emb"))
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("nbr_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("q_emb"), col("nbr_emb")))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("sim").desc, col("nbr_id").asc)))
      .filter(col("rank") <= k)
      .select("query_id", "nbr_id", "sim", "rank")
  }

  /** 32-bit multiply/xorshift/multiply hash. Chosen (over splitmix64) so
    * the DuckDB oracle can replicate it with plain BIGINT arithmetic. The
    * input is folded into [0, 2^32) FIRST and both multipliers are < 2^31,
    * so every intermediate stays below 2^63 for ANY Long input — no
    * 128-bit math in SQL, no ANSI overflow in Spark, no silent wrap in
    * the scalar form. */
  private[graft] def hash32(k: Long): Long = {
    val u0 = k & 0xffffffffL
    val u1 = (u0 * 1540483477L) & 0xffffffffL
    ((u1 ^ (u1 >>> 16)) * 1372383749L) & 0xffffffffL
  }

  /** Deterministic random hyperplanes: plane p, dim d weight =
    * hash32(p*dims + d + 1) scaled to [-1, 1). */
  private[graft] def planeWeight(p: Int, d: Int, dims: Int): Double =
    hash32(p.toLong * dims + d + 1L).toDouble / 2147483648.0 - 1.0

  /** Column-side hash32 of an id (same function, usable inside codegen —
    * no UDF). `pmod` folds negatives the same way the scalar `& mask`
    * does, so both forms agree on every Long. */
  private[graft] def hash32Col(c: Column): Column = {
    val u0 = pmod(c, lit(4294967296L))
    val u1 = (u0 * lit(1540483477L)) % lit(4294967296L)
    ((u1.bitwiseXOR(shiftright(u1, 16))) * lit(1372383749L)) % lit(4294967296L)
  }

  private[graft] def signBits(emb: Seq[Double], planes: Int): Long = {
    if (emb == null) return 0L
    val dims = emb.length
    var sig = 0L
    var p = 0
    while (p < planes) {
      var dot = 0.0
      var d = 0
      while (d < dims) { dot += emb(d) * planeWeight(p, d, dims); d += 1 }
      if (dot >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  /** Deterministic pseudo-random IVF coarse-centroid pick with no
    * assumptions about id density: order by a hash of the id and take
    * the first nCentroids — orderBy+limit plans as
    * TakeOrderedAndProject (one pass, per-partition top-k heaps), no
    * global sort shuffle. Shared by [[ivfTopK]]/[[ivfpqTopK]]; callers
    * composing several paths over one corpus (ann_recall) compute it
    * once and pass it to both via `cents` — results are unchanged
    * (same deterministic pick), only the cost moves. */
  def ivfCentroids(corpus: DataFrame, nCentroids: Int = 16): DataFrame =
    corpus
      .orderBy(hash32Col(col("vec_id") + lit(1L)), col("vec_id"))
      .limit(nCentroids)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_emb"))

  /** Corpus-side nearest-cell assignment (vec_id, cent_id, embedding):
    * one broadcast cosine pass + per-id argmax hash aggregation
    * (map-side combine collapses each id's nCentroids rows BEFORE the
    * shuffle; ties break to the smallest cent_id). Shared by
    * [[ivfTopK]]/[[ivfpqTopK]] via their `cells0` parameter so a
    * multi-path composition (ann_recall) assigns cells once. */
  def ivfCellAssign(corpus: DataFrame, cents: DataFrame): DataFrame =
    corpus.crossJoin(broadcast(cents))
      .withColumn("csim", cosine(col("embedding"), col("cent_emb")))
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("cent_id"), col("embedding").as("e")),
        struct(col("csim"), lit(0L) - col("cent_id"))).as("b"))
      .select(col("vec_id"), col("b.cent_id").as("cent_id"),
        col("b.e").as("embedding"))

  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nCentroids: Int = 16, nProbe: Int = 3,
              cents0: Option[DataFrame] = None,
              cells0: Option[DataFrame] = None): DataFrame = {
    val cents = cents0.getOrElse(ivfCentroids(corpus, nCentroids))
    def assign(df: DataFrame, idCol: String, embCol: String, keep: Int) = {
      val scored = df.crossJoin(broadcast(cents))
        .withColumn("csim", cosine(col(embCol), col("cent_emb")))
      if (keep == 1)
        // corpus side: per-id argmax as a hash aggregation — map-side
        // combine collapses each id's nCentroids rows to one BEFORE the
        // shuffle (the row_number window it replaces shuffled and sorted
        // all of them); ties break to the smallest cent_id, matching the
        // window's (csim desc, cent_id asc) order
        scored.groupBy(col(idCol))
          .agg(max_by(struct(col("cent_id"), col(embCol).as("e")),
            struct(col("csim"), lit(0L) - col("cent_id"))).as("b"))
          .select(col(idCol), col("b.cent_id").as("cent_id"),
            col("b.e").as(embCol))
      else
        scored.withColumn("crank", row_number().over(
            Window.partitionBy(idCol).orderBy(col("csim").desc, col("cent_id").asc)))
          .filter(col("crank") <= keep)
          .drop("cent_emb", "csim", "crank")
    }
    val cells = cells0
      .map(_.select(col("vec_id").as("nbr_id"), col("cent_id"),
        col("embedding").as("nbr_emb")))
      .getOrElse(assign(
        corpus.select(col("vec_id").as("nbr_id"), col("embedding").as("nbr_emb")),
        "nbr_id", "nbr_emb", keep = 1))
    val probes = assign(
      queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb")),
      "query_id", "q_emb", keep = nProbe)
    // probes = |queries| × nProbe rows — the query set is small by
    // contract (same reason bruteForceTopK/lshTopK broadcast it), so the
    // cell join never shuffles the corpus side
    val scored = cells.join(broadcast(probes), Seq("cent_id"))
      .filter(col("nbr_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("q_emb"), col("nbr_emb")))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("sim").desc, col("nbr_id").asc)))
      .filter(col("rank") <= k)
      .select("query_id", "nbr_id", "sim", "rank")
  }

  /** Embedding-cosine near-duplicate pairs (driver brief): hyperplane-LSH
    * buckets (few planes → high recall at `threshold` ≈ 1), within-bucket
    * pairs only, exact cosine verification. Complements the text-side
    * MinHash/Jaccard dedup for semantically-identical documents.
    *
    * `maxBucket` bounds the quadratic self-join: buckets above it are
    * dropped wholesale — the same deliberate recall/robustness trade the
    * MinHash/SimHash candidate generators make. A corpus whose identical
    * mass exceeds the cap should run `DedupOps.exactGroups` first (it
    * catches identical vectors' documents exactly); the cap exists for
    * the *near*-identical residue. */
  def embeddingNearDups(corpus: DataFrame, threshold: Double,
                        planes: Int = 8, maxBucket: Int = 2000): DataFrame = {
    // bucket-size cap via the same count-aggregate + semi-join shape the
    // minhash/simhash generators use (an aggregate gets map-side combine
    // and no per-bucket sort, where a window count would sort each
    // bucket's rows); singleton buckets (no possible pair) and over-cap
    // buckets drop before the self-join
    val sigs = corpus.select(col("vec_id"), col("embedding"))
      .withColumn("bucket",
        graft.GraftFunctions.signBitsCol(col("embedding"), lit(planes)))
    val sized = sigs.groupBy("bucket").agg(count(lit(1)).as("bn"))
      .filter(col("bn").between(2, maxBucket)).select("bucket")
    val keyed = sigs.join(sized, Seq("bucket"))
    val a = keyed.select(col("bucket"), col("vec_id").as("id_a"),
      col("embedding").as("emb_a"))
    val b = keyed.select(col("bucket"), col("vec_id").as("id_b"),
      col("embedding").as("emb_b"))
    a.join(b, Seq("bucket")).filter(col("id_a") < col("id_b"))
      .withColumn("sim", cosine(col("emb_a").cast("array<double>"),
        col("emb_b").cast("array<double>")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("sim"), 4).as("sim"))
      .distinct()
  }

  /** ANN top-k via random-hyperplane bucketing: corpus and queries hash to
    * `planes`-bit signatures; candidates = same-bucket rows; exact cosine +
    * top-k within candidates. Multi-probe: each query also probes the
    * `probes` single-bit-flip neighbor buckets to recover near-boundary
    * misses. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              planes: Int = 12, probes: Int = 4): DataFrame =
    lshCandidateTopK(corpus, queries, k, planes, probes, broadcastQueries = true)

  /** Corpus-vs-corpus ANN top-k — [[lshTopK]] WITHOUT the
    * broadcast-query contract, for query sets as large as the corpus
    * (the "join embeddings against themselves" shape). Both sides
    * shuffle ONCE on the bucket key (sort-merge join, pinned by hint —
    * fully spill-safe for arbitrarily large sides), and the per-query
    * top-k runs as a rank window whose `rank <= k` filter Spark rewrites
    * to WindowGroupLimit: each task keeps only its partial top-k heap
    * before the window shuffle, so no query's full candidate list ever
    * materializes.
    *
    * Scale controls: bucket population ~ |corpus| / 2^planes — raise
    * `planes` with corpus size so same-bucket work stays bounded; an
    * optional `maxBucket > 0` drops over-populated corpus buckets
    * wholesale (the same deliberate recall trade the dedup candidate
    * generators make — a hyperplane bucket that big means a dense
    * near-identical mass better served by `embeddingNearDups`/
    * `DedupOps.exactGroups` first). Default 0 = exact bucket-join
    * semantics, which the DuckDB oracle replicates verbatim. */
  def lshTopKJoin(corpus: DataFrame, queries: DataFrame, k: Int,
                  planes: Int = 12, probes: Int = 4,
                  maxBucket: Int = 0): DataFrame = {
    val capped =
      if (maxBucket <= 0) corpus
      else {
        val sigs = corpus.withColumn("bucket",
          graft.GraftFunctions.signBitsCol(col("embedding"), lit(planes)))
        val ok = sigs.groupBy("bucket").agg(count(lit(1)).as("bn"))
          .filter(col("bn") <= maxBucket).select("bucket")
        sigs.join(ok, Seq("bucket"), "left_semi").drop("bucket")
      }
    lshCandidateTopK(capped, queries, k, planes, probes,
      broadcastQueries = false)
  }

  private def lshCandidateTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                               planes: Int, probes: Int,
                               broadcastQueries: Boolean): DataFrame = {
    def sig(c: Column) = graft.GraftFunctions.signBitsCol(c, lit(planes))
    val c = corpus.select(col("vec_id").as("nbr_id"), col("embedding").as("nbr_emb"))
      .withColumn("bucket", sig(col("nbr_emb")))
    // multi-probe bucket list from built-ins: the signature plus its
    // single-bit-flip neighbors (no UDF on the query side either)
    val nFlips = math.min(probes, planes)
    val probeList =
      if (nFlips <= 0) array(col("sig"))
      else concat(array(col("sig")),
        expr(s"transform(sequence(0, ${nFlips - 1}, 1), b -> sig ^ shiftleft(1L, b))"))
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      .withColumn("sig", sig(col("q_emb")))
      .withColumn("bucket", explode(probeList))
      .drop("sig")
    // each (query, nbr) pair joins at most once: a corpus vector owns ONE
    // bucket and the probe list's values are distinct
    val scored = (if (broadcastQueries) c.join(broadcast(q), Seq("bucket"))
                  else c.join(q.hint("merge"), Seq("bucket")))
      .filter(col("nbr_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("q_emb"), col("nbr_emb")))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("sim").desc, col("nbr_id").asc)))
      .filter(col("rank") <= k)
      .select("query_id", "nbr_id", "sim", "rank")
  }

  /** Squared-L2 distance as a SEQUENTIAL left fold (zip_with +
    * aggregate): fixed evaluation order makes the double bit-replicable
    * in an oracle engine, same contract as [[cosine]]. */
  private[graft] def l2sq(a: Column, b: Column): Column =
    graft.GraftFunctions.l2sqDist(a.cast("array<double>"),
      b.cast("array<double>"))

  /** HOF parity reference for [[l2sq]] (see [[cosineHof]]). */
  private[graft] def l2sqHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0d), (acc, x) => acc + x)

  /** Scalar-quantization ANN (the SQ8 recipe of FAISS's
    * ScalarQuantizer): every dimension maps affinely to an 8-bit code
    * against the corpus-wide per-dim [min, max] envelope — 4 bytes/dim
    * → 1 byte/dim with NO training iteration and no codebook, the
    * cheapest compression rung on the brute → SQ → PQ ladder. Search
    * scores the full-precision query against each vector's midpoint
    * reconstruction (code + 0.5), so recall loss is quantization error
    * only: unlike IVF/LSH there is no candidate pruning and no missed
    * candidate, and unlike PQ the error is per-dimension, not
    * per-subspace.
    *
    * Scale shape: the envelope is 2·d numbers from ONE posexplode
    * aggregation (map-side combined), broadcast everywhere after;
    * encode/reconstruct is a pure map in codegen (`transform` with
    * index — no UDF, no shuffle); scoring is the same broadcast-query
    * scan + per-partition top-k heap as brute force. The quantize →
    * reconstruct chain is fixed-order IEEE arithmetic, so any engine
    * replays it bit-identically; constant dimensions (mx == mn) code
    * to 0 and reconstruct exactly at the envelope point. */
  def sqTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val stats = corpus
      .select(posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy("dim").agg(min("x").as("mn"), max("x").as("mx"))
      .groupBy()
      .agg(
        transform(array_sort(collect_list(struct(col("dim"), col("mn")))),
          s => s.getField("mn")).as("mns"),
        transform(array_sort(collect_list(struct(col("dim"), col("mx")))),
          s => s.getField("mx")).as("mxs"))
    val recon = corpus.crossJoin(broadcast(stats))
      .select(col("vec_id").as("nbr_id"),
        transform(col("embedding"), (x, i) => {
          val mn = element_at(col("mns"), i + lit(1))
          val mx = element_at(col("mxs"), i + lit(1))
          val code = when(mx === mn, lit(0.0d))
            .otherwise(least(lit(255.0d), greatest(lit(0.0d),
              floor((x - mn) * lit(255.0d) / (mx - mn)))))
          mn + (code + lit(0.5d)) * (mx - mn) / lit(256.0d)
        }).as("nbr_emb"))
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"))
    recon.crossJoin(broadcast(q))
      .filter(col("nbr_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("q_emb"), col("nbr_emb")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("sim").desc,
          col("nbr_id").asc)))
      .filter(col("rank") <= k)
      .select("query_id", "nbr_id", "sim", "rank")
  }

  /** Product-quantization ANN (Jégou et al., TPAMI 2011): the
    * memory-bound scale path the brute/IVF/LSH family lacks. The
    * 64-dim corpus compresses to `m` small codes per vector (8 codes ×
    * 16 centroids = 8 half-bytes vs 512 bytes of floats — the reason a
    * 100 TB embedding corpus can be searched from RAM); queries score
    * via asymmetric distance computation (ADC): per query, an m×codes
    * lookup table of subspace distances, then each corpus vector costs
    * m table lookups instead of a d-dim dot product.
    *
    * Deterministic by construction, like [[ClusterOps.kmeansAssign]]:
    * per-subspace codebooks train with the same no-RNG Lloyd recipe
    * (init = vec_id % codes, fixed 2 rounds, argmin ties to the lower
    * code), and every distance is the [[l2sq]] ordered fold, so the
    * whole pipeline — codebooks, codes, ADC distances — replays
    * exactly in SQL.
    *
    * Scale shape: codebooks (m × codes × dsub doubles) and the per-
    * query ADC tables (queries × m × codes rows) broadcast; the corpus
    * never re-shuffles — encoding is a broadcast join + argmin hash
    * aggregation on (vec_id, s), and the ADC scan is a broadcast
    * lookup join + one hash aggregation per (query, vec). Compose with
    * IVF coarse cells (ivfTopK) for IVFPQ when even the O(corpus ×
    * queries) table-lookup scan is too much.
    *
    * Output: (query_id, nbr_id, adc, rank) — adc ascending (smaller =
    * closer), self-matches excluded. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
             m: Int = 8, codes: Int = 16, dims: Int = 64,
             model: Option[(DataFrame, DataFrame)] = None): DataFrame =
    pqAdcRank(corpus, queries, k, m, codes, dims, candidates = None,
      model = model)

  /** IVFPQ: IVF coarse cells prune the candidate set, PQ codes answer
    * the distances — the composition both halves' scaladocs promise,
    * and the standard recipe for billion-vector search: the coarse
    * quantizer shrinks the scanned fraction to ~nProbe/nCentroids, and
    * within it every distance is m table lookups against the broadcast
    * ADC tables. The candidate relation joins the compressed corpus
    * keyed on vec_id (never re-shuffling full vectors), then the
    * broadcast ADC lookup attaches per-subspace distances. Same
    * deterministic contracts as [[ivfTopK]] and [[pqTopK]], so the
    * whole composition replays in SQL. */
  def ivfpqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                nCentroids: Int = 16, nProbe: Int = 3,
                m: Int = 8, codes: Int = 16, dims: Int = 64,
                model: Option[(DataFrame, DataFrame)] = None,
                cents0: Option[DataFrame] = None,
                cells0: Option[DataFrame] = None): DataFrame = {
    val cents = cents0.getOrElse(ivfCentroids(corpus, nCentroids))
    val cells = cells0.map(_.select(col("vec_id"), col("cent_id")))
      .getOrElse {
        corpus.crossJoin(broadcast(cents))
          .withColumn("csim", cosine(col("embedding"), col("cent_emb")))
          .groupBy(col("vec_id"))
          .agg(max_by(col("cent_id"),
            struct(col("csim"), lit(0L) - col("cent_id"))).as("cent_id"))
      }
    val probes = queries.select(col("vec_id").as("query_id"),
        col("embedding").as("q_emb"))
      .crossJoin(broadcast(cents))
      .withColumn("csim", cosine(col("q_emb"), col("cent_emb")))
      .withColumn("crank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("csim").desc, col("cent_id").asc)))
      .filter(col("crank") <= nProbe)
      .select(col("query_id"), col("cent_id"))
    val candidates = cells.join(broadcast(probes), Seq("cent_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"))
    pqAdcRank(corpus, queries, k, m, codes, dims, Some(candidates), model)
  }

  /** (vec_id → idAs, s, sub): the m per-subspace slices of `embedding`. */
  private def pqSubvectors(df: DataFrame, idAs: String, m: Int,
                           dsub: Int): DataFrame =
    df.select(col("vec_id").as(idAs),
      posexplode(array((0 until m).map(s =>
        slice(col("embedding"), s * dsub + 1, dsub)): _*)).as(Seq("s", "sub")))

  /** Deterministic per-subspace Lloyd codebook training + encoding over
    * a (vec_id, embedding) relation (init = vec_id % codes, 2 rounds,
    * argmin ties to the lower code — the pqTopK recipe, shared by the
    * plain and residual PQ paths). Returns (codebook (s, code, cent),
    * encoded (vec_id, s, code)). Codebooks are m×codes rows —
    * localCheckpoint'ed so the training subtree runs ONCE instead of
    * re-executing inside every consumer branch (encoding, the ADC
    * tables); same lineage-truncation move as GraphOps. */
  /** Train a PQ model ONCE and share it across search paths: returns
    * (codebook, encoded corpus) with the encoded relation
    * localCheckpoint'ed, for the `model` parameter of [[pqTopK]] /
    * [[ivfpqTopK]]. Training is deterministic, so passing a shared
    * model changes nothing about the results — only where the training
    * cost is paid. This IS the deployment shape at 100 TB: codebooks
    * train offline (on a sample) and every query batch reuses them;
    * `ann_recall` uses it to score the exhaustive and coarse-pruned
    * paths against one training run. */
  def pqTrain(corpus: DataFrame, m: Int = 8, codes: Int = 16,
              dims: Int = 64): (DataFrame, DataFrame) = {
    val (cb, enc) = pqCodebookEncode(
      corpus.select(col("vec_id"), col("embedding")), m, codes, dims)
    (cb, enc.localCheckpoint(eager = false))
  }

  private def pqCodebookEncode(vectors: DataFrame, m: Int, codes: Int,
                               dims: Int): (DataFrame, DataFrame) = {
    require(dims % m == 0, s"dims=$dims must split into m=$m subspaces")
    val dsub = dims / m
    // the (vec_id, s, sub) slices appear in every Lloyd round's
    // recompute AND assign — materialize once (lazy, r13) instead of
    // re-slicing the corpus in each of the 4+ consuming subtrees
    val subs = pqSubvectors(vectors, "vec_id", m, dsub)
      .localCheckpoint(eager = false)
    // centroid table (s, code, cent) from an assignment (vec_id, s, code)
    def recompute(assigned: DataFrame): DataFrame =
      subs.join(assigned, Seq("vec_id", "s"))
        .select(col("s"), col("code"), posexplode(col("sub")).as(Seq("dim", "v")))
        .groupBy("s", "code", "dim").agg(avg(col("v")).as("cv"))
        .groupBy("s", "code")
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("cv")))),
          x => x.getField("cv")).as("cent"))
    // nearest-code assignment (argmin l2sq, ties to the lower code)
    def assign(cent: DataFrame): DataFrame =
      subs.join(broadcast(cent), Seq("s"))
        .withColumn("d", l2sq(col("sub"), col("cent")))
        .groupBy("vec_id", "s")
        .agg(max_by(col("code"), struct(-col("d"), -col("code"))).as("code"))

    val init = subs.select(col("vec_id"), col("s"),
      pmod(col("vec_id"), lit(codes.toLong)).as("code"))
    val cent1 = recompute(init).localCheckpoint(eager = false)
    val cent2 = recompute(assign(cent1)).localCheckpoint(eager = false)
    (cent2, assign(cent2))
  }

  /** Corpus-wide k-NN GRAPH via the IVF cell prune: every vector is a
    * query against its `nProbe` nearest coarse cells — the graph
    * construction primitive under semantic dedup, label propagation
    * and graph-based ANN indexes (NSW/HNSW seeds), where the
    * brute-force alternative is O(n²).
    *
    * Scale shape: this is NOT [[ivfTopK]] with the corpus as queries —
    * that broadcasts the query side, which is corpus-sized here.
    * Instead both sides key on cent_id and meet in a SHUFFLE join:
    * cells (corpus argmax) and probes (top-nProbe per vector) each
    * carry O(n) rows, the join fans out to ~nProbe·n²/nCentroids
    * scored pairs (the prune), and the per-query top-k collapses in a
    * rank window partitioned by query. One broadcast of the
    * nCentroids-row centroid pick is the only replicated state.
    * At a FIXED nCentroids the pair count grows n² — callers at scale
    * pass nCentroids ≈ √n so pairs grow ~n^1.5 (the SemDeDup
    * k = ⌈√N⌉ law; measured 13× at ×10 rows with the fixed-16 demo
    * setting, SCALE.md r13). */
  /** Binary-quantization search (the Lucene/Elastic BQ recipe — the
    * compression rung below SQ8): every vector compresses to a 64-bit
    * SIGN mask (bit i = emb[i] > 0), the shortlist ranks by hamming
    * distance (bit_count of xor — pure integer, engine-exact, no float
    * compare anywhere), and exact cosine re-ranks the `shortlist` back
    * to `k`. Corpus rows carry only (vec_id, one long) through the
    * distance pass; full vectors surface for the queries×shortlist
    * re-rank only — at 100 TB the signature relation is 1/64th the
    * float width and the scan is one xor+popcount per row. */
  def bqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
             shortlist: Int = 20): DataFrame = {
    def withSig(df: DataFrame) = df.withColumn("sig", expr(
      """aggregate(sequence(0, 63), 0L, (acc, i) ->
        |  acc + IF(element_at(embedding, i + 1) > 0.0D,
        |           shiftleft(1L, i), 0L))""".stripMargin))
    val c = withSig(corpus.select(col("vec_id"), col("embedding")))
      .localCheckpoint(eager = false) // hamming pass + re-rank vectors
    val q = withSig(queries.select(col("vec_id"), col("embedding")))
      .select(col("vec_id").as("query_id"), col("sig").as("q_sig"),
        col("embedding").as("q_emb"))
    val short = c.select(col("vec_id").as("nbr_id"), col("sig"))
      .crossJoin(broadcast(q.select(col("query_id"), col("q_sig"))))
      .filter(col("nbr_id") =!= col("query_id"))
      .withColumn("ham", bit_count(col("sig").bitwiseXOR(col("q_sig"))))
      .withColumn("hrank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("ham").asc, col("nbr_id").asc)))
      .filter(col("hrank") <= shortlist)
      .select(col("query_id"), col("nbr_id"))
    c.select(col("vec_id").as("nbr_id"), col("embedding").as("nbr_emb"))
      .join(broadcast(short), "nbr_id")
      .join(broadcast(q.select(col("query_id"), col("q_emb"))), "query_id")
      .withColumn("sim", cosine(col("q_emb"), col("nbr_emb")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("sim").desc, col("nbr_id").asc)).cast("int"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("nbr_id"), col("sim"), col("rank"))
  }

  /** [[knnGraph]] with the IVF cell count derived from the corpus —
    * nCentroids = ⌈√N⌉ from one cheap count (the SemDeDup k ∝ √N law,
    * [[graft.operators.DedupOps.semanticDedupAuto]]): expected cell
    * occupancy is √N, so the cell-join candidate set grows ~n^1.5
    * instead of the fixed-cell n² (the r13 ×10 probes measured 13×/9.6×
    * on the pinned nCentroids=16 rows — the only super-linear rows in
    * SCALE.md). This is the default that cannot be mis-sized by corpus
    * growth; a fixed nCentroids stays right when the cell count is an
    * index-layout decision. */
  def knnGraphAuto(corpus: DataFrame, k: Int, nProbe: Int = 3): DataFrame = {
    val n = corpus.count() // column-pruned count; metadata-cheap
    val nc = math.max(1L, math.ceil(math.sqrt(n.toDouble)).toLong).toInt
    knnGraph(corpus, k, nc, nProbe)
  }

  /** Occupancy-targeted LSH kNN graph — the LINEAR-cost escape leg the
    * IVF variants calibrate against at corpus scale. The hyperplane
    * count grows with the corpus (smallest p ≥ 4 with
    * targetBucket·2^p ≥ N — an INTEGER search, no libm, so the oracle
    * replays identical comparisons), which pins expected bucket
    * occupancy at ~targetBucket (default 128, the measured recall/cost
    * knee) regardless of N: candidate volume is
    * O(N · (1+probes) · targetBucket) — corpus-linear — vs
    * [[knnGraph]]'s O(N²/cells) at fixed cells (r16 ×100 probe: 294×
    * wall for 100× data) and [[knnGraphAuto]]'s O(N^1.5) (207×).
    * Recall is the multi-probe LSH tradeoff (the signature plus its
    * single-bit flips); at 100 TB this bucketed shape — not an
    * all-pairs-within-cell shape — is what a production kNN-graph
    * build runs. */
  /** The occupancy law: smallest p ≥ 4 with targetBucket·2^p ≥ n.
    * Exposed so Round16Spec pins the integer search against the
    * oracle's SQL replay of the same comparisons. targetBucket = 128
    * is the measured recall/cost knee at sf0.1 (B=32: recall@5 0.20;
    * B=64: 0.32; B=128: 0.52 ≈ the IVF leg's 0.56 — all at ~1 s; the
    * r16 sweep in PLANS.md) — recall buys linearly in B while cost
    * stays corpus-linear with constant B. */
  // The 20-plane cap (.getOrElse(20)) binds only beyond ~134M vectors
  // (128·2^20); the oracle mirrors it with coalesce(min(p), 20) so the
  // two integer searches agree across the whole domain, not just the
  // verify envelope (r16 ADVICE).
  private[graft] def lshPlanesFor(n: Long, targetBucket: Int = 128): Int =
    (4 to 20).find(p => (targetBucket.toLong << p) >= n).getOrElse(20)

  def knnGraphLshAuto(corpus: DataFrame, k: Int, targetBucket: Int = 128,
                      probes: Int = 4): DataFrame = {
    val n = corpus.count() // column-pruned count; metadata-cheap
    lshCandidateTopK(corpus, corpus, k, lshPlanesFor(n, targetBucket),
      probes, broadcastQueries = false)
  }

  def knnGraph(corpus: DataFrame, k: Int, nCentroids: Int = 16,
               nProbe: Int = 3): DataFrame = {
    val cents = ivfCentroids(corpus, nCentroids)
    // one corpus × centroids cosine pass feeds BOTH the cell argmax
    // and the probe ranking (lazy checkpoint: the two consumers share
    // the materialized blocks inside the one result job)
    val scored = corpus.crossJoin(broadcast(cents))
      .withColumn("csim", cosine(col("embedding"), col("cent_emb")))
      .select(col("vec_id"), col("embedding"), col("cent_id"), col("csim"))
      .localCheckpoint(eager = false)
    val cells = scored.groupBy(col("vec_id"))
      .agg(max_by(struct(col("cent_id"), col("embedding").as("e")),
        struct(col("csim"), lit(0L) - col("cent_id"))).as("b"))
      .select(col("vec_id").as("nbr_id"), col("b.cent_id").as("cent_id"),
        col("b.e").as("nbr_emb"))
    val probes = scored
      .withColumn("crank", row_number().over(
        Window.partitionBy("vec_id")
          .orderBy(col("csim").desc, col("cent_id").asc)))
      .filter(col("crank") <= nProbe)
      .select(col("vec_id").as("query_id"), col("cent_id"),
        col("embedding").as("q_emb"))
    cells.join(probes, Seq("cent_id"))
      .filter(col("nbr_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("q_emb"), col("nbr_emb")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("sim").desc, col("nbr_id").asc)))
      .filter(col("rank") <= k)
      .select(col("query_id").as("vec_id"), col("nbr_id"), col("sim"),
        col("rank"))
  }

  /** Per-subspace PQ reconstruction-error audit: mean squared L2
    * distance between each vector's subvector and its assigned
    * codebook centroid — the quantization-quality scorecard a vector
    * store reads BEFORE trusting PQ recall (a subspace with outsized
    * MSE is where the code budget is failing; ann_recall only shows
    * the aggregate symptom). Same deterministic training as
    * [[pqTopK]]; one keyed join + one broadcast lookup after
    * training; output is m rows. */
  def pqDistortion(corpus: DataFrame, m: Int = 8, codes: Int = 16,
                   dims: Int = 64): DataFrame = {
    val dsub = dims / m
    val vectors = corpus.select(col("vec_id"), col("embedding"))
    val (cb, enc) = pqCodebookEncode(vectors, m, codes, dims)
    pqSubvectors(vectors, "vec_id", m, dsub)
      .join(enc, Seq("vec_id", "s"))
      .join(broadcast(cb), Seq("s", "code"))
      .withColumn("dd", l2sq(col("sub"), col("cent")))
      .groupBy("s")
      .agg(count(lit(1)).as("n_vecs"), avg(col("dd")).as("mse"))
  }

  private def pqAdcRank(corpus: DataFrame, queries: DataFrame, k: Int,
                        m: Int, codes: Int, dims: Int,
                        candidates: Option[DataFrame],
                        model: Option[(DataFrame, DataFrame)] = None): DataFrame = {
    require(dims % m == 0, s"dims=$dims must split into m=$m subspaces")
    val dsub = dims / m
    val (cent2, encoded) = model.getOrElse(pqCodebookEncode(
      corpus.select(col("vec_id"), col("embedding")), m, codes, dims))

    // ADC tables: distance from each query subvector to every centroid
    val qtab = pqSubvectors(queries, "query_id", m, dsub)
      .join(broadcast(cent2), Seq("s"))
      .select(col("query_id"), col("s"), col("code"),
        l2sq(col("sub"), col("cent")).as("d"))
    val scored = candidates match {
      case None =>
        // exhaustive ADC: every (query, vec) pair gets m lookups
        encoded.join(broadcast(qtab), Seq("s", "code"))
          .filter(col("vec_id") =!= col("query_id"))
      case Some(cand) =>
        // pruned ADC: candidates fan out to their m codes (join keyed on
        // vec_id), then the broadcast table lookup attaches distances
        cand.join(encoded, Seq("vec_id"))
          .join(broadcast(qtab), Seq("query_id", "s", "code"))
    }
    val adist = scored
      .groupBy("query_id", "vec_id")
      .agg(collect_list(struct(col("s"), col("d"))).as("ds"))
      // ordered fold over subspaces: engine-replicable sum
      .withColumn("adc", aggregate(
        transform(array_sort(col("ds")), x => x.getField("d")),
        lit(0.0d), (acc, x) => acc + x))
    adist.withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("adc").asc, col("vec_id").asc)))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("nbr_id"), col("adc"), col("rank"))
  }

  /** Residual IVFPQ (the FAISS-standard IndexIVFPQ recipe): PQ codes
    * encode the RESIDUAL of each vector against its assigned coarse
    * centroid, not the raw vector (Jégou et al., TPAMI 2011 §IV.C;
    * `ann_recall` measures the gap vs [[ivfpqTopK]]).
    *
    * Unlike the sampled-vector coarse cells of [[ivfTopK]]/[[ivfpqTopK]],
    * the coarse quantizer here is TRAINED ([[ClusterOps.kmeansModel]],
    * the same deterministic no-RNG Lloyd) — that is what makes residuals
    * work: against a cell MEAN, residual variance is the within-cell
    * variance (≤ total variance by the k-means objective), so the same
    * code budget quantizes a strictly smaller spread. Against a sampled
    * corpus vector the subtraction ADDS variance on weakly-clustered
    * data (var(x−c) ≈ var(x) + var(c)) and recall drops — measured and
    * documented via `ann_recall` on the synthetic corpus.
    *
    * Query side mirrors the encoder's frame: for each of its `nProbe`
    * probed cells the query forms the residual against THAT cell's
    * centroid, and the ADC table is keyed (query, cell, subspace, code).
    *
    * Determinism: trained centroids, cell argmax, Lloyd codebooks, and
    * the ordered-fold distances all reuse the existing no-RNG recipes;
    * the residual subtraction is elementwise double arithmetic — the
    * whole chain replays in SQL (`ann_ivfpq_residual`).
    *
    * Scale shape: [[ivfpqTopK]] plus the k-means training passes (run
    * them on a sample at 100 TB — pass a sampled `corpus` to
    * kmeansModel via the same recipe IVF quantizers conventionally use)
    * and one elementwise subtraction before encoding. The trainer's
    * final assignment IS the cell assignment (same argmax law), so no
    * separate corpus × centroids pass runs; the corpus-wide (vec,
    * cell, residual) relation is localCheckpoint'ed so encoding and
    * candidate generation read one materialization; the ADC tables
    * grow nProbe-fold (queries × nProbe × m × codes rows) and still
    * broadcast. */
  /** The trained residual-IVFPQ model: (coarse centroids, per-vector
    * cell assignment + residual, residual PQ codebook, residual PQ
    * codes). A pure deterministic function of the corpus — exposed so
    * the model can be trained once per process and shared between the
    * serving row and the recall harness's residual leg, exactly the
    * [[pqTrain]]/pqModel discipline. */
  def ivfpqResidualModel(corpus: DataFrame, nCentroids: Int = 16,
                         m: Int = 8, codes: Int = 16, dims: Int = 64)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    // trained coarse quantizer: k-means cell means (2 Lloyd rounds).
    // The model's FINAL assignment is the same (csim desc, cent_id asc)
    // argmax `cellsFull` needs, so it is REUSED (r13): the residual
    // forms from a keyed join against the corpus plus one broadcast
    // centroid lookup, instead of re-running a corpus × centroids
    // cosine pass that recomputed the assignment the trainer already
    // produced. Results are bit-identical — same assignment law.
    val (centsRaw, assignedRaw) =
      ClusterOps.kmeansModel(corpus, nCentroids, iters = 2)
    val cents = centsRaw
      .select(col("cluster").as("cent_id"), col("centroid").as("cent_emb"))
    // nearest cell per corpus vector, WITH the residual vs its centroid
    val cellsFull = assignedRaw
      .select(col("vec_id"), col("cluster").as("cent_id"))
      .join(corpus.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .join(broadcast(cents), Seq("cent_id"))
      .select(col("vec_id"), col("cent_id"),
        zip_with(col("embedding"), col("cent_emb"),
          (a, b) => a - b).as("resid"))
      .localCheckpoint(eager = false)
    val (cent2, encoded) = pqCodebookEncode(
      cellsFull.select(col("vec_id"), col("resid").as("embedding")),
      m, codes, dims)
    (cents, cellsFull, cent2, encoded)
  }

  def ivfpqResidualTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                        nCentroids: Int = 16, nProbe: Int = 3,
                        m: Int = 8, codes: Int = 16, dims: Int = 64,
                        model: Option[(DataFrame, DataFrame, DataFrame,
                          DataFrame)] = None): DataFrame = {
    require(dims % m == 0, s"dims=$dims must split into m=$m subspaces")
    val dsub = dims / m
    val (cents, cellsFull, cent2, encoded) = model.getOrElse(
      ivfpqResidualModel(corpus, nCentroids, m, codes, dims))

    // query probes: nProbe nearest cells, one residual per probed cell
    val probes = queries.select(col("vec_id").as("query_id"),
        col("embedding").as("q_emb"))
      .crossJoin(broadcast(cents))
      .withColumn("csim", cosine(col("q_emb"), col("cent_emb")))
      .withColumn("crank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("csim").desc, col("cent_id").asc)))
      .filter(col("crank") <= nProbe)
      .select(col("query_id"), col("cent_id"),
        zip_with(col("q_emb"), col("cent_emb"), (a, b) => a - b).as("q_res"))
    // per-(query, probed-cell) ADC tables against the shared codebook
    val qtab = probes.select(col("query_id"), col("cent_id"),
        posexplode(array((0 until m).map(s =>
          slice(col("q_res"), s * dsub + 1, dsub)): _*)).as(Seq("s", "sub")))
      .join(broadcast(cent2), Seq("s"))
      .select(col("query_id"), col("cent_id"), col("s"), col("code"),
        l2sq(col("sub"), col("cent")).as("d"))
    val cand = cellsFull.select(col("vec_id"), col("cent_id"))
      .join(broadcast(probes.select(col("query_id"), col("cent_id"))),
        Seq("cent_id"))
      .filter(col("vec_id") =!= col("query_id"))
    // candidates fan out to their m codes (join keyed on vec_id), then
    // the broadcast table lookup attaches the cell-frame distances
    val scored = cand.join(encoded, Seq("vec_id"))
      .join(broadcast(qtab), Seq("query_id", "cent_id", "s", "code"))
    val adist = scored
      .groupBy("query_id", "vec_id")
      .agg(collect_list(struct(col("s"), col("d"))).as("ds"))
      .withColumn("adc", aggregate(
        transform(array_sort(col("ds")), x => x.getField("d")),
        lit(0.0d), (acc, x) => acc + x))
    adist.withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("adc").asc, col("vec_id").asc)))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("nbr_id"), col("adc"), col("rank"))
  }

  /** The exact d×d mean-corrected scatter matrix (i, j, aij) of the
    * embedding corpus — ONE self-join on vec_id with map-side partial
    * aggregation (shuffle ≤ d² cells per partition, never n·d² rows).
    * Shared basis of [[pcaTop]] and the effective-rank audit. */
  def scatterMatrix(emb: DataFrame): DataFrame = {
    val e = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("emb"))
    val d = e.select(col("vec_id"), posexplode(col("emb")).as(Seq("i", "x")))
    val nRow = e.agg(count(lit(1)).cast("double").as("n"))
    val mu = d.groupBy("i").agg(sum(col("x")).as("sx"))
      .crossJoin(broadcast(nRow))
      .select(col("i"), (col("sx") / col("n")).as("mu"))
    val cells = d.alias("a").join(d.alias("b"), "vec_id")
      .groupBy(col("a.i").as("i"), col("b.i").as("j"))
      .agg(sum(col("a.x") * col("b.x")).as("sxx"))
    cells
      .join(mu.select(col("i"), col("mu").as("mi")), Seq("i"))
      .join(mu.select(col("i").as("j"), col("mu").as("mj")), Seq("j"))
      .crossJoin(broadcast(nRow))
      .select(col("i"), col("j"),
        (col("sxx") - col("n") * col("mi") * col("mj")).as("aij"))
  }

  /** Top principal component of the embedding corpus by POWER ITERATION
    * on the [[scatterMatrix]] — the embedding-space audit beside
    * [[graft.operators.TextAnalysisOps]]' text metrics: the dominant
    * direction's share of variance is the "is my embedding space
    * collapsing" drift check, and the component itself seeds
    * whitening/debiasing. The `iters` multiply-normalize rounds run on
    * d²-row relations, a 64×64 MODEL, not data. Determinism:
    * matrix·vector products and norms are ORDERED folds over j-sorted
    * arrays (the t14 list-state discipline) and v₀ = 1⃗, so both
    * engines walk identical IEEE sequences; the only cross-engine
    * noise is covariance sum order, absorbed by the caller's rounding.
    * Returns one row: (lambda, v) with v the unit top component (sign
    * fixed by v₀). */
  def pcaTop(emb: DataFrame, iters: Int): DataFrame = {
    val spark = emb.sparkSession
    val amat = scatterMatrix(emb)
    // per-i row vectors, j-ordered — the fold basis; tiny (d rows), one
    // checkpoint so the iteration doesn't replay the scatter join
    val ar = amat.groupBy("i")
      .agg(transform(array_sort(collect_list(struct(col("j"), col("aij")))),
        x => x.getField("aij")).as("row"))
      .localCheckpoint()
    val dims = ar.count().toInt
    var v = spark.range(1)
      .select(transform(sequence(lit(1), lit(dims)), _ => lit(1.0d)).as("v"),
        lit(0.0d).as("lambda"))
    for (_ <- 0 until iters) {
      val w = ar.crossJoin(broadcast(v.select(col("v"))))
        .select(col("i"), aggregate(
          zip_with(col("row"), col("v"), (a, b) => a * b),
          lit(0.0d), (acc, x) => acc + x).as("w"))
      v = w.agg(transform(
          array_sort(collect_list(struct(col("i"), col("w")))),
          x => x.getField("w")).as("wl"))
        .select(col("wl"), sqrt(aggregate(
          transform(col("wl"), x => x * x),
          lit(0.0d), (acc, x) => acc + x)).as("nm"))
        .select(transform(col("wl"), x => x / col("nm")).as("v"),
          col("nm").as("lambda"))
    }
    v.select(col("lambda"), col("v"))
  }

  /** Per-label centroid-cosine outlier flag — the embedding-space data
    * audit that catches mislabeled / off-distribution vectors before
    * they poison contrastive sampling or dedup thresholds: each vector's
    * cosine to its OWN label's mean vector, flagged when below
    * `threshold`.
    *
    * Scale shape: the centroid pass is one (label, dim)-keyed exchange
    * to O(labels × d) cells (the [[scatterMatrix]] discipline — the
    * corpus itself never self-joins); per-vector cosines are then a pure
    * map over a BROADCAST of the label→centroid-array relation, zero
    * further shuffles. Determinism: dot/norm are ORDERED zip_with folds
    * over the vector and the j-sorted centroid array (the t14
    * list-state discipline); only the centroid's per-dim sum order
    * differs across engines, absorbed by `round(roundTo)`. Zero-norm
    * sides report cosine 0 instead of NaN (whether 0 flags depends on
    * the sign of `threshold`). */
  def centroidOutliers(emb: DataFrame, idCol: String, labelCol: String,
                       embCol: String, threshold: Double,
                       roundTo: Int = 6): DataFrame = {
    val e = emb.select(col(idCol).as("vec_id"), col(labelCol).as("label"),
      col(embCol).cast("array<double>").as("v"))
    val cent = e
      .select(col("label"), posexplode(col("v")).as(Seq("i", "x")))
      .groupBy("label", "i")
      .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
      .groupBy("label")
      .agg(transform(
        array_sort(collect_list(struct(col("i"), (col("sx") / col("n")).as("mu")))),
        p => p.getField("mu")).as("c"))
    e.join(broadcast(cent), "label")
      .select(col("vec_id"), col("label"),
        aggregate(zip_with(col("v"), col("c"), (a, b) => a * b),
          lit(0.0d), (acc, x) => acc + x).as("dot"),
        aggregate(transform(col("v"), x => x * x),
          lit(0.0d), (acc, x) => acc + x).as("nv"),
        aggregate(transform(col("c"), x => x * x),
          lit(0.0d), (acc, x) => acc + x).as("nc"))
      .select(col("vec_id"), col("label"),
        when(col("nv") === 0.0d || col("nc") === 0.0d, lit(0.0d))
          .otherwise(round(col("dot") / (sqrt(col("nv")) * sqrt(col("nc"))),
            roundTo)).as("cos_c"))
      .withColumn("outlier", col("cos_c") < threshold)
  }
}
