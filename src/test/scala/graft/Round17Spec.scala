package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-17 pins:
  *  - the scratch-hygiene audit widened to temp FILES in main sources
  *    (the s19 split-index row leaked one top-level /tmp xml per run —
  *    the r16 audit only watched directory creation);
  *  - sweepStale's non-numeric-suffix rule (skip, never delete — the
  *    r16 ADVICE: an unparseable pid was classified as "dead").
  */
class Round17Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  // --- the shared brute-truth contract (r17: one corpus-quadratic brute
  // pass serves both recall audits) ------------------------------------

  test("brute truth restriction identity: top-5 for queries vec_id<10 " +
      "IS the corpus-wide top-5 filtered to those queries") {
    import graft.operators.SimilarityOps
    import org.apache.spark.sql.functions._
    val emb = Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
      .withColumn("embedding", col("embedding").cast("array<double>"))
    val direct = SimilarityOps.bruteForceTopK(
        emb, emb.filter(col("vec_id") < 10), k = 5)
      .select(col("query_id"), col("nbr_id"),
        round(col("sim"), 6).as("sim"), col("rank"))
    val restricted = SimilarityOps.bruteForceTopK(emb, emb, k = 5)
      .filter(col("query_id") < 10)
      .select(col("query_id"), col("nbr_id"),
        round(col("sim"), 6).as("sim"), col("rank"))
    assert(rows(direct) == rows(restricted),
      "per-query brute ranking is not restriction-stable — the shared " +
        "truth frame would change ann_recall")
  }

  test("the process-shared corpus/brute frames reproduce a fresh " +
      "embed_knn_recall_lsh chain bit-for-bit") {
    import graft.operators.SimilarityOps
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val emb = Tables.table(spark, sf, "embeddings")
      .withColumn("embedding", col("embedding").cast("array<double>"))
    val truth = SimilarityOps.bruteForceTopK(emb, emb, k = 5)
      .select(col("query_id"), col("nbr_id"))
    val got = SimilarityOps.knnGraphLshAuto(emb, k = 5)
      .select(col("query_id"), col("nbr_id"), lit(1L).as("hit"))
    val fresh = truth.join(got, Seq("query_id", "nbr_id"), "left_outer")
      .agg(count(lit(1)).as("n_truth"),
        coalesce(sum("hit"), lit(0L)).as("n_hit"))
      .select(col("n_truth"), col("n_hit"),
        round(col("n_hit").cast("double") / col("n_truth"), 4)
          .as("recall"))
    val shared = SparkEntry.queries("embed_knn_recall_lsh")(spark, sf)
    assert(rows(shared) == rows(fresh),
      "shared corpus/brute frames diverged from a fresh chain")
  }

  test("no main source file creates temp FILES outside Scratch either " +
      "(the r16 audit only covered directories)") {
    import scala.jdk.CollectionConverters._
    val needle = "createTemp" + "File" // split so this file passes
    val offenders = java.nio.file.Files.walk(
        java.nio.file.Paths.get("src/main"))
      .iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .filter(p => java.nio.file.Files.readString(p).contains(needle))
      .map(_.toString).toSeq
    assert(offenders.isEmpty,
      s"temp files created outside Scratch.dir: $offenders")
  }

  test("the process-shared residual-IVFPQ model reproduces a freshly " +
      "trained model's top-k bit-for-bit") {
    import graft.operators.SimilarityOps
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val emb = Tables.table(spark, sf, "embeddings")
      .withColumn("embedding", col("embedding").cast("array<double>"))
    val fresh = SimilarityOps.ivfpqResidualTopK(
        emb, emb.filter(col("vec_id") < 10), k = 5)
      .select(col("query_id"), col("nbr_id"),
        round(col("adc"), 4).as("adc"), col("rank"))
    val shared = SparkEntry.queries("ann_ivfpq_residual")(spark, sf)
    assert(rows(shared) == rows(fresh),
      "shared residual model diverged from a fresh deterministic training")
  }

  // --- round-17 operators ----------------------------------------------

  test("mm_audio_neardup: the shifted planted clip pairs with its base " +
      "(aligned overlap -> near simhash), the unrelated clip with " +
      "neither") {
    val r = SparkEntry.queries("mm_audio_neardup")(
        spark, "/root/testdata/sf0.001")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(r.contains((9000001L, 9000002L)),
      "base/shift overlapping clips not flagged as audio near-dups")
    assert(!r.contains((9000001L, 9000003L)) &&
           !r.contains((9000002L, 9000003L)),
      "unrelated clip flagged against the planted pair")
  }

  test("dedup_substring_src_eval cells sum to the corpus-wide " +
      "dedup_substring_eval confusion table") {
    val sf = "/root/testdata/sf0.001"
    val per = SparkEntry.queries("dedup_substring_src_eval")(spark, sf)
      .collect()
    val tot = SparkEntry.queries("dedup_substring_eval")(spark, sf)
      .collect().head
    def s(i: Int) = per.map(_.getLong(i)).sum
    assert(s(1) == tot.getLong(0), "n_docs mismatch")
    assert(s(2) == tot.getLong(1), "n_both_hot mismatch")
    assert(s(3) == tot.getLong(2), "n_exact_only mismatch")
    assert(s(4) == tot.getLong(3), "n_approx_only mismatch")
  }

  test("sweepStale SKIPS graft-run roots with a non-numeric suffix " +
      "(not ours to judge) and reclaims dead numeric ones") {
    val tmp = java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"))
    val weird = tmp.resolve("graft-run-not-a-pid")
    java.nio.file.Files.createDirectories(weird)
    val dead = tmp.resolve("graft-run-9223372036854775805")
    java.nio.file.Files.createDirectories(dead)
    try {
      Scratch.sweepStale()
      assert(java.nio.file.Files.exists(weird),
        "non-numeric-suffix root deleted — sweep overreached")
      assert(!java.nio.file.Files.exists(dead), "dead-run root not swept")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(weird.toFile)
      org.apache.commons.io.FileUtils.deleteQuietly(dead.toFile)
    }
  }
}
