package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.LayoutOps

/** Round-10 operator pins. */
class Round10OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- table-driven manifest pruning (VERDICT r9 item 5) ----

  test("manifestPrunedScanTable prunes via the manifest TABLE, " +
    "no manifest subtree on the query path") {
    val dir = java.nio.file.Files.createTempDirectory("graft_r10_mf")
      .toString + "/t"
    val df = (1L to 400L).map(i => (i, i % 5)).toDF("id", "g")
    LayoutOps.writeRangeLayout(df, "id", dir, numFiles = 8)
    LayoutOps.writeManifestTable(spark, dir, "id")
    // the `_`-prefixed manifest dir is invisible to the data listing
    assert(spark.read.parquet(dir).count() == 400)
    val (pruned, nRead) =
      LayoutOps.manifestPrunedScanTable(spark, dir, "id", 100L, 180L)
    assert(nRead > 0 && nRead < 8, s"read $nRead of 8 files")
    assert(pruned.select("id").as[Long].collect().toSet ==
      (100L to 180L).toSet)
    // query path is a pure pruned FileScan: one scan, over data files
    // only — the manifest intersection happened at planning, not here
    val p = pruned.queryExecution.executedPlan.toString
    assert("FileScan parquet".r.findAllIn(p).length == 1, p)
    assert(!p.contains("_manifest"), p)
    // and the scan's file index holds exactly the matched subset
    val scanned = pruned.select(input_file_name()).distinct().count()
    assert(scanned == nRead, s"scan touched $scanned files, planned $nRead")
  }

  test("manifestPrunedScanTable with an empty match returns an empty " +
    "frame with the data schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft_r10_mf2")
      .toString + "/t"
    val df = (1L to 50L).map(i => (i, i % 3)).toDF("id", "g")
    LayoutOps.writeRangeLayout(df, "id", dir, numFiles = 2)
    LayoutOps.writeManifestTable(spark, dir, "id")
    val (pruned, nRead) =
      LayoutOps.manifestPrunedScanTable(spark, dir, "id", 1000L, 2000L)
    assert(nRead == 0 && pruned.count() == 0)
    assert(pruned.columns.toSeq == Seq("id", "g"))
  }

  // ---- shared IVF stages: the cents0/cells0 fast path is an identity ----

  test("ivfTopK and ivfpqTopK return identical results with and without " +
    "shared cents/cells (the ann_recall sharing refactor is a no-op on " +
    "values)") {
    import graft.operators.SimilarityOps
    val emb = Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
      .withColumn("embedding", col("embedding").cast("array<double>"))
    val q = emb.filter(col("vec_id") < 10)
    val cents = SimilarityOps.ivfCentroids(emb).localCheckpoint()
    val cells = SimilarityOps.ivfCellAssign(emb, cents).localCheckpoint()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("query_id"), col("nbr_id"), col("rank"))
        .collect().map(_.toSeq).toSet
    assert(rows(SimilarityOps.ivfTopK(emb, q, k = 5)) ==
      rows(SimilarityOps.ivfTopK(emb, q, k = 5,
        cents0 = Some(cents), cells0 = Some(cells))))
    assert(rows(SimilarityOps.ivfpqTopK(emb, q, k = 5)) ==
      rows(SimilarityOps.ivfpqTopK(emb, q, k = 5,
        cents0 = Some(cents), cells0 = Some(cells))))
  }
}
