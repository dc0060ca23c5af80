package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Lloyd clustering over an embedding column — the
  * centroid-training companion to `SimilarityOps.ivfTopK` (which takes
  * its coarse centroids as given) and the document-clustering step of a
  * curation pipeline (topic balancing, per-cluster sampling quotas).
  *
  * Everything is reproducible by construction: centroids initialize as
  * the element-wise mean of the vectors with `vec_id % k == cluster`
  * (no RNG), iterations are a fixed count, and the assignment argmax
  * tie-breaks on the lower cluster id — rerunning on the same corpus
  * gives bit-identical assignments on any cluster size.
  *
  * Scale shape (100 TB embedding corpus):
  *  - centroid recomputation is `posexplode` → hash aggregation on
  *    (cluster, dim) with map-side partial sums: k×d result rows, never
  *    a per-vector shuffle of full arrays;
  *  - the k×d centroid table broadcasts (k coarse clusters ≤ a few
  *    thousand); assignment is a broadcast nested-loop over k rows per
  *    vector with the cosine kernel inside codegen, reduced by a
  *    `max_by` hash aggregation — no window over the corpus;
  *  - iteration count is fixed and small (Lloyd on unit-norm-ish
  *    embeddings moves little after a few rounds; IVF coarse quantizers
  *    conventionally train on a sample anyway — pass a sampled
  *    DataFrame for that).
  */
object ClusterOps {

  private def assign(emb: DataFrame, centroids: DataFrame): DataFrame = {
    val scored = emb.crossJoin(broadcast(centroids))
      .withColumn("sim", SimilarityOps.cosine(col("embedding"), col("centroid")))
    // argmax by (sim, lower-cluster-wins): max of (sim, -cluster)
    scored.groupBy("vec_id")
      .agg(max_by(col("cluster"), struct(col("sim"), -col("cluster")))
        .as("cluster"))
  }

  private def recompute(emb: DataFrame, assigned: DataFrame): DataFrame =
    emb.join(assigned, "vec_id")
      .select(col("cluster"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("cluster", "dim").agg(avg(col("v")).as("cv"))
      .groupBy("cluster")
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("cv")))),
        x => x.getField("cv")).as("centroid"))

  /** The trained model form: (centroids (cluster, centroid), assignment
    * (vec_id, cluster)) after `iters` Lloyd rounds from the
    * deterministic sharded init — for consumers that need the centroid
    * VECTORS themselves (residual quantization in
    * `SimilarityOps.ivfpqResidualTopK`), not just the labels.
    *
    * Centroids are k×d rows — tiny — so localCheckpoint each Lloyd
    * round: every round's training subtree materializes ONCE instead of
    * nesting the prior round's full plan inside the next broadcast, so
    * plan depth and nested broadcast-job count stay O(1) in `iters`
    * (the lineage-truncation move of SimilarityOps' PQ codebooks and
    * GraphOps' rank iteration; Round9OpsSpec pins constant depth). */
  def kmeansModel(emb: DataFrame, k: Int, iters: Int): (DataFrame, DataFrame) = {
    val e = emb.select(col("vec_id"), col("embedding"))
    // LAZY checkpoints: each round's centroids have exactly one
    // consumer (the next assign's broadcast-collect, which runs as its
    // own sequential job anyway), so the eager variant's extra
    // materialization job per Lloyd round was pure scheduling floor —
    // the plan-depth truncation (the point of the checkpoint) is
    // identical either way.
    var centroids = recompute(
      e, e.select(col("vec_id"), pmod(col("vec_id"), lit(k)).as("cluster")))
      .localCheckpoint(false)
    var assigned = assign(e, centroids)
    for (_ <- 1 until iters) {
      centroids = recompute(e, assigned).localCheckpoint(false)
      assigned = assign(e, centroids)
    }
    (centroids, assigned)
  }

  /** Final (vec_id, cluster) assignment after `iters` Lloyd rounds from
    * the deterministic sharded init. `emb` needs (vec_id: long,
    * embedding: array<double>). */
  def kmeansAssign(emb: DataFrame, k: Int, iters: Int): DataFrame =
    kmeansModel(emb, k, iters)._2
      .select(col("vec_id"), col("cluster").cast("int").as("cluster"))

  /** Centroid-based silhouette of the trained partition — per vector,
    * a = cosine distance to its OWN final centroid, b = distance to the
    * nearest OTHER centroid, s = (b−a)/max(a,b) (0 when both distances
    * are 0), reported as the per-cluster mean. The O(n·k) simplified
    * silhouette — the form that scales; true pairwise silhouette is
    * O(n²). Per-point s rounds to 6 decimals BEFORE the vec_id-ordered
    * mean fold so a replaying engine folds identical doubles in
    * identical order.
    *
    * Scale shape: one corpus × broadcast-centroids cosine pass (k rows
    * per vector inside codegen) reduced by one hash aggregation — the
    * same shape as [[kmeansAssign]]'s assignment step; the mean fold
    * runs over per-cluster lists (bounded by cluster population — for
    * truly huge clusters swap the fold for sum(round(s,6)), which is
    * order-free only in its rounded inputs' count, hence the fold).
    *
    * Output: (cluster: int, n: long, mean_silhouette: double). */
  def silhouette(emb: DataFrame, k: Int, iters: Int): DataFrame = {
    val (cents, asn) = kmeansModel(emb.select(col("vec_id"),
      col("embedding")), k, iters)
    emb.join(asn.select(col("vec_id"), col("cluster").as("own")), "vec_id")
      .crossJoin(broadcast(cents))
      .withColumn("sim",
        SimilarityOps.cosine(col("embedding"), col("centroid")))
      .groupBy(col("vec_id"), col("own"))
      .agg(max(when(col("cluster") === col("own"), col("sim"))).as("a_sim"),
        max(when(col("cluster") =!= col("own"), col("sim"))).as("b_sim"))
      .withColumn("a", lit(1.0) - col("a_sim"))
      .withColumn("b", lit(1.0) - col("b_sim"))
      .withColumn("sil", round(
        when(greatest(col("a"), col("b")) === 0.0, lit(0.0))
          .otherwise((col("b") - col("a")) / greatest(col("a"), col("b"))),
        6))
      .groupBy(col("own"))
      .agg(count(lit(1)).as("n"),
        array_sort(collect_list(struct(col("vec_id"), col("sil"))))
          .as("arr"))
      .select(col("own").cast("int").as("cluster"), col("n"),
        round(aggregate(col("arr"), lit(0.0d),
          (acc, x) => acc + x.getField("sil")) / col("n"), 6)
          .as("mean_silhouette"))
  }

  /** Two-level (coarse → fine) centroid assignment — the sampled-
    * assignment escape for k ∝ √N clusterings, where the flat argmax
    * is O(N·k) = O(N^1.5) cosine evaluations and becomes the true
    * bottleneck of SemDeDup at corpus scale. The k centroids group
    * into g super-cells (mod-g mean init + ONE Lloyd refinement over
    * the k-row centroid table — driver-cheap), each vector picks its
    * nearest super-cell (g evaluations) and then the nearest centroid
    * WITHIN it (~k/g evaluations): O(N·(g + k/g)) = O(N·√k) at
    * g = ⌈√k⌉. Deterministic throughout (mod init, argmax ties to the
    * lower id — the kmeansAssign conventions), so the whole chain
    * replays in SQL.
    *
    * APPROXIMATE by construction: a vector whose flat-argmax centroid
    * lives in a different super-cell gets its within-cell second best —
    * the gated `dedup_semantic_approx` row audits exactly that
    * (assignment agreement + dropped-set recall vs the flat argmax).
    *
    * `centroids` is (cluster, centroid); returns (vec_id, cluster). */
  def twoLevelAssign(emb: DataFrame, centroids: DataFrame,
                     g: Int): DataFrame = {
    def supFrom(grouped: DataFrame): DataFrame =
      grouped
        .select(col("super"), posexplode(col("centroid")).as(Seq("dim", "v")))
        .groupBy("super", "dim").agg(avg(col("v")).as("cv"))
        .groupBy("super")
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("cv")))),
          x => x.getField("cv")).as("supc"))
    def assignCent(sup: DataFrame): DataFrame =
      centroids.crossJoin(broadcast(sup))
        .withColumn("sim",
          SimilarityOps.cosine(col("centroid"), col("supc")))
        .groupBy("cluster")
        .agg(max_by(col("super"), struct(col("sim"), -col("super")))
          .as("super"))
    val sup0 = supFrom(centroids
      .select(pmod(col("cluster"), lit(g)).as("super"), col("centroid")))
    val sup1 = supFrom(centroids.join(assignCent(sup0), "cluster")
        .select(col("super"), col("centroid")))
      .localCheckpoint(false) // consumed by the centroid map AND the vec pass
    val cmap = assignCent(sup1).localCheckpoint(false) // (cluster, super)
    // vectors choose among super-cells that own >= 1 centroid (a cell
    // every centroid deserted would strand its vectors)
    val live = sup1.join(cmap.select("super").distinct(), Seq("super"))
    val vsup = emb.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(live))
      .withColumn("sim", SimilarityOps.cosine(col("embedding"), col("supc")))
      .groupBy("vec_id")
      .agg(max_by(struct(col("super"), col("embedding").as("e")),
        struct(col("sim"), -col("super"))).as("b"))
      .select(col("vec_id"), col("b.super").as("super"),
        col("b.e").as("embedding"))
    // fine argmax within the chosen cell: a keyed broadcast join fans
    // each vector out to only its cell's ~k/g centroids
    vsup.join(broadcast(centroids.join(cmap, "cluster")), Seq("super"))
      .withColumn("sim",
        SimilarityOps.cosine(col("embedding"), col("centroid")))
      .groupBy("vec_id")
      .agg(max_by(col("cluster"), struct(col("sim"), -col("cluster")))
        .as("cluster"))
  }
}
