package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: sequential timing of the heavy-tail queries at two scale
  * factors, for the sf0.1 → sf1 scaling curve in SCALE.md (the per-round
  * Bench runs 4-way concurrent, which is honest for wall-clock but noisy
  * for per-query scaling ratios). `runMain graft.ScaleProbe <dir> [names…]`
  * prints one JSON line of per-query seconds (best of 2, sequential).
  */
object ScaleProbe {
  val DefaultQueries: Seq[String] = Seq(
    "dedup_exact", "dedup_minhash_cand", "dedup_simhash", "dedup_jaccard",
    "dedup_components", "dedup_embedding", "text_repetition", "search_bm25",
    "a4_term_stats", "a5_dict_scalable", "ann_brute_topk", "ann_ivf_topk",
    "ann_lsh_topk", "w4_asof_join", "w5_range_join", "s8_sampler_events",
    "sketch_kmv", "curate_docs")

  def main(args: Array[String]): Unit = {
    Scratch.sweepStale() // reclaim temp-dir debris from dead runs
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else DefaultQueries
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect() // JVM warmup
    def time(name: String): Double = {
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      runs.min
    }
    val results = names.map(n => n -> time(n))
    val js = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    println(s"""{"scale_probe":$js,"dir":"$dir"}""")
    spark.stop()
  }
}
