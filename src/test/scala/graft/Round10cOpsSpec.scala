package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{GraphOps, PackOps}

/** Round-10 third-batch operator pins: doubled average ranks (Spearman's
  * integral rank encoding), local clustering coefficient, and the
  * bounded-round k-core peel. */
class Round10cOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- avgRank2 (Spearman's rank encoding) ----

  test("avgRank2 matches the window-computed doubled average rank " +
    "under heavy ties, per group") {
    val df = (1L to 400L).map(i => (s"g${i % 3}", i % 11)).toDF("g", "v")
    val expected = df.withColumn("r2",
      lit(2L) * rank().over(Window.partitionBy("g").orderBy("v")) +
        count(lit(1)).over(Window.partitionBy("g", "v")) - 1)
    val got = df.join(PackOps.avgRank2(df, "g", "v"), Seq("g", "v"))
    assert(got.select("g", "v", "r2")
      .except(expected.select("g", "v", "r2")).count() == 0)
    assert(got.count() == 400)
  }

  test("avgRank2 output is the histogram: one row per (group, value)") {
    val df = Seq(("a", 1), ("a", 1), ("a", 2), ("b", 1)).toDF("g", "v")
    val h = PackOps.avgRank2(df, "g", "v").collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    // group a: value 1 ties {ranks 1,2} → avg 1.5 → r2 = 3; value 2 →
    // rank 3 → r2 = 6; group b: value 1 → rank 1 → r2 = 2
    assert(h == Map(("a", 1) -> 3L, ("a", 2) -> 6L, ("b", 1) -> 2L))
  }

  // ---- local clustering coefficient ----

  test("clusteringCoefficient on a triangle with a pendant edge") {
    // triangle {1,2,3} plus pendant 4–1: node 1 has deg 3 and 1 triangle
    // → coeff 2·1/(3·2) = 1/3; nodes 2,3 have deg 2, coeff 1; node 4 has
    // deg 1 and is excluded (coefficient undefined below deg 2)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L))
      .toDF("src", "dst")
    val out = GraphOps.clusteringCoefficient(edges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(out == Map(
      1L -> ((3L, 1L, 0.333333)),
      2L -> ((2L, 1L, 1.0)),
      3L -> ((2L, 1L, 1.0))))
  }

  test("clusteringCoefficient counts each node's triangles once on K4") {
    // K4: every node has deg 3 and sits in C(3,2) = 3 triangles → coeff 1
    val nodes = (1L to 4L)
    val edges = (for (a <- nodes; b <- nodes if a < b) yield (a, b))
      .toDF("src", "dst")
    val out = GraphOps.clusteringCoefficient(edges).collect()
    assert(out.length == 4)
    assert(out.forall(r => r.getLong(1) == 3L && r.getLong(2) == 3L &&
      r.getDouble(3) == 1.0))
  }

  // ---- bounded-round k-core peel ----

  test("kcore peels a chain completely but keeps a clique intact") {
    // 5-chain 1–2–3–4–5 (2-core is empty) ∪ K4 {10,11,12,13}
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val k4 = for (a <- 10L to 13L; b <- 10L to 13L if a < b) yield (a, b)
    val edges = (chain ++ k4).toDF("src", "dst")
    val out = GraphOps.kcore(edges, k = 2, rounds = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(10L -> 3L, 11L -> 3L, 12L -> 3L, 13L -> 3L))
  }

  test("kcore honors bounded-round semantics: one round peels only " +
    "the current leaves") {
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val out = GraphOps.kcore(chain, k = 2, rounds = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // round 1 drops leaves 1 and 5 (degree 1) and their edges; the
    // surviving subgraph 2–3–4 is NOT yet re-checked — that's round 2
    assert(out == Map(2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("kcore at k=1 with enough rounds is the identity on a " +
    "duplicate-free edge list") {
    val edges = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("src", "dst")
    val out = GraphOps.kcore(edges, k = 1, rounds = 3)
    assert(out.count() == 5)
    assert(out.agg(sum("deg")).head.getLong(0) == 6L) // 2 × n_edges
  }
}
