package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge relations — the link-graph
  * companion to the anchor-extraction side of the engine (the reference
  * builds anchor/link graphs — pig/ExtractAnchorText and the J1 anchor
  * join family — but leaves ranking to downstream consumers; a
  * training-data pipeline needs the rank signal in-engine to weight or
  * filter pages by centrality).
  *
  * PageRank here is the simplified formulation without dangling-mass
  * redistribution (rank sourced at sinks leaks; standard for quality
  * weighting where only the relative ordering matters):
  *
  *   r_{i+1}(v) = (1-d)/N + d * Σ_{(u,v)∈E} r_i(u)/outdeg(u)
  *
  * Scale shape (100 TB link graph):
  *  - the edge relation is joined to out-degrees ONCE and
  *    `localCheckpoint`ed (materialized hash-partitioned on `src`,
  *    lineage truncated, blocks freed by the context cleaner — the same
  *    discipline as `DedupOps.connectedComponents`); every iteration
  *    then shuffles only the rank table (O(N) rows of (long, double)) to
  *    meet it — the edge set (O(E), the big side) never re-shuffles
  *    after the first pass.
  *  - per-iteration work is one join + one hash aggregation with
  *    map-side partial sums; no windows, no collect (the single
  *    `nodes.count()` is a one-scalar action for the teleport constant).
  *  - iteration count is fixed (rank deltas converge geometrically in
  *    d); for long runs, `localCheckpoint` every few rounds truncates
  *    lineage exactly as `DedupOps.connectedComponents` does.
  */
object GraphOps {

  /** PageRank over `edges` (`src: long, dst: long`; parallel edges should
    * be pre-deduplicated by the caller if unweighted semantics are
    * intended). Returns (node, rank). */
  def pagerank(edges: DataFrame, iters: Int, damping: Double = 0.85,
               checkpointEvery: Int = 5): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    // checkpointed like `weighted`: `nodes` appears in EVERY iteration's
    // plan (the teleport re-join), so without materialization the
    // union+distinct over the raw edge relation — the widest scan in the
    // operator — would recompute once per round
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().localCheckpoint()
    val outdeg = e.groupBy("src").agg(count(lit(1)).cast("double").as("outdeg"))
    // one co-partitioned (src, dst, outdeg) relation reused every round
    val weighted = e.join(outdeg, "src").localCheckpoint()
    val n = nodes.count().toDouble
    val teleport = (1.0 - damping) / n
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    for (i <- 1 to iters) {
      val contribs = weighted
        .join(ranks, weighted("src") === ranks("node"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") / col("outdeg")).as("contrib"))
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) + lit(damping) * coalesce(col("contrib"), lit(0.0)))
            .as("rank"))
      // truncate the per-round join lineage before it compounds (the
      // rank table is O(N) (long, double) rows — cheap to materialize)
      if (i % checkpointEvery == 0 && i < iters)
        ranks = ranks.localCheckpoint()
    }
    ranks
  }
}
