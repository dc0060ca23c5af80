package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators._
import graft.functions.IntVectorSum

class OperatorsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- RevisionOps ----

  test("changeRatioSample follows the reference carry rules") {
    val df = Seq(
      (1L, "A", 1, 1000.0), (2L, "A", 2, 1005.0), (3L, "A", 3, 1200.0),
      (4L, "A", 4, 1250.0), (5L, "A", 5, 2000.0), (6L, "B", 1, 50.0))
      .toDF("id", "key", "off", "len")
      .withColumn("ts", timestamp_seconds(lit(1700000000L) + col("off")))
    val kept = RevisionOps.changeRatioSample(df, "key", "ts", "len")
      .select("id").as[Long].collect().sorted
    // A: r2 replaces r1 (0.5% change), r3 flushes r2 (19%), r4 gray-zone
    // dropped (4%), r5 flushes r3 (67%), r5 emitted at end; B: single row.
    assert(kept.toSeq == Seq(2L, 3L, 5L, 6L))
  }

  test("changeRatioSample skips rows below the minimum size") {
    val df = Seq(
      (1L, "A", 1, 1000.0), (2L, "A", 2, 5.0), // tiny row must not reset the carry
      (3L, "A", 3, 1200.0), (4L, "A", 4, 2000.0))
      .toDF("id", "key", "off", "len")
      .withColumn("ts", timestamp_seconds(lit(1700000000L) + col("off")))
    val kept = RevisionOps.changeRatioSample(df, "key", "ts", "len", minLen = 10.0)
      .select("id").as[Long].collect().sorted
    // with id=2 excluded: r3 flushes r1 (20% change), r4 flushes r3 (67%),
    // r4 emitted at end
    assert(kept.toSeq == Seq(1L, 3L, 4L))
  }

  test("changeRatioSample emits every key's last buffer across partitions") {
    val rows = (1 to 100).flatMap { k =>
      (1 to 5).map(i => (k.toLong * 10 + i, s"k$k", i, 100.0)) // no changes
    }
    val df = rows.toDF("id", "key", "off", "len")
      .withColumn("ts", timestamp_seconds(lit(1700000000L) + col("off")))
    val kept = RevisionOps.changeRatioSample(df, "key", "ts", "len")
    // identical lengths → only the final (carried) row per key survives
    assert(kept.count() == 100)
    assert(kept.select("off").distinct().as[Int].collect().toSeq == Seq(5))
  }

  test("pairs adds lagged columns per key") {
    val df = Seq((1L, "A", 1, 10.0), (2L, "A", 2, 20.0), (3L, "B", 1, 5.0))
      .toDF("id", "key", "off", "v")
      .withColumn("ts", timestamp_seconds(lit(1000L) + col("off")))
    val out = RevisionOps.pairs(df, "key", "ts", Seq("id", "v"), "id")
      .select("id", "prev_id").as[(Long, Option[Long])].collect().toMap
    assert(out(1L).isEmpty && out(3L).isEmpty)
    assert(out(2L).contains(1L))
  }

  test("roundUp: exact boundary stays, otherwise next boundary; anchor shifts") {
    val df = Seq(
      ("2024-01-01 05:00:00", 3600L, 0L, "2024-01-01 05:00:00"),
      ("2024-01-01 05:00:01", 3600L, 0L, "2024-01-01 06:00:00"),
      ("2024-01-01 00:59:59", 86400L, 3600L, "2024-01-01 01:00:00"),
      ("2024-01-01 01:00:01", 86400L, 3600L, "2024-01-02 01:00:00"))
      .toDF("ts", "unit", "anchor", "expected")
    df.collect() // force schema
    val checks = df.select(col("expected"),
      date_format(RevisionOps.roundUp(col("ts").cast("timestamp"), 3600L), "yyyy-MM-dd HH:mm:ss").as("h"),
      date_format(RevisionOps.roundUp(col("ts").cast("timestamp"), 86400L, 3600L), "yyyy-MM-dd HH:mm:ss").as("d"))
      .collect()
    assert(checks(0).getString(1) == "2024-01-01 05:00:00")
    assert(checks(1).getString(1) == "2024-01-01 06:00:00")
    assert(checks(2).getString(2) == "2024-01-01 01:00:00")
    assert(checks(3).getString(2) == "2024-01-02 01:00:00")
  }

  test("roundUp is exact at microsecond precision") {
    val df = Seq("2024-01-01 05:00:00.000000", "2024-01-01 05:00:00.000001")
      .toDF("s").withColumn("ts", col("s").cast("timestamp"))
    val out = df.select(col("s"),
        date_format(RevisionOps.roundUp(col("ts"), 3600L), "HH:mm").as("b"))
      .as[(String, String)].collect().toMap
    assert(out("2024-01-01 05:00:00.000000") == "05:00") // boundary stays
    assert(out("2024-01-01 05:00:00.000001") == "06:00") // 1µs past → next
  }

  test("denseDailyCounts gap-fills missing days with 0") {
    val df = Seq(("a", "2024-01-01 10:00:00"), ("a", "2024-01-03 10:00:00"))
      .toDF("k", "s").withColumn("ts", col("s").cast("timestamp"))
    val out = RevisionOps.denseDailyCounts(df, "k", "ts", "2024-01-01", "2024-01-04")
      .orderBy("day").as[(String, String, Long)].collect()
    assert(out.map(_._3).toSeq == Seq(1L, 0L, 1L, 0L))
    assert(out.map(_._2).toSeq ==
      Seq("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"))
  }

  // ---- TermOps ----

  test("stripBoilerplate removes high-df lines, keeps order, drops empty docs") {
    val docs = Seq(
      (1L, "keep a\nBOILER\nkeep b\nkeep a"),   // duplicate line within one doc
      (2L, "BOILER\nother"),
      (3L, "BOILER"))                            // fully boilerplate
      .toDF("doc_id", "text")
    val out = TextAnalysisOps.stripBoilerplate(docs, "doc_id", "text", minDf = 3L)
      .as[(Long, String)].collect().toMap
    // BOILER appears in 3 distinct docs; the in-doc duplicate "keep a"
    // counts once per doc and survives both times, in position order
    assert(out == Map(1L -> "keep a\nkeep b\nkeep a", 2L -> "other"))
  }

  test("contamination flags docs sharing n-grams with the probe set, and only those") {
    val bench = "alpha beta gamma delta epsilon zeta eta theta" // 8 tokens
    val docs = Seq(
      (1L, s"prefix words here $bench trailing text"),       // leaks the probe
      (2L, "completely unrelated content with many words present"),
      (3L, s"$bench"),                                       // verbatim probe copy
      (4L, "short doc")                                      // under n tokens
    ).toDF("doc_id", "text")
    val probes = Seq((100L, bench)).toDF("pid", "ptext")
    val out = TextAnalysisOps.contamination(docs, "doc_id", "text",
        probes, "pid", "ptext", n = 8)
      .as[(Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(out.keySet == Set((1L, 100L), (3L, 100L)))
    assert(out((3L, 100L)) == 1L) // exactly the one 8-gram
    assert(out((1L, 100L)) == 1L) // the planted gram, not the prefix/suffix ones
  }

  test("unicode analyzer splits on punctuation, whitespace analyzer keeps it") {
    val df = Seq((1L, "Don't stop-the count... 42x it's")).toDF("id", "text")
    val ws = df.select(TermOps.tokens(col("text")).as("t"))
      .as[Seq[String]].head()
    val uni = df.select(TermOps.tokens(col("text"), TermOps.Unicode).as("t"))
      .as[Seq[String]].head()
    assert(ws == Seq("don't", "stop-the", "count...", "42x", "it's"))
    assert(uni == Seq("don", "t", "stop", "the", "count", "42x", "it", "s"))
    intercept[IllegalArgumentException] {
      TermOps.tokens(col("text"), "lucene")
    }
  }

  test("termStats computes df/cf with min-df cut") {
    val docs = Seq((1L, "a b a"), (2L, "a c"), (3L, "c c d")).toDF("doc_id", "text")
    val stats = TermOps.termStats(docs, "doc_id", "text", minDf = 2)
      .as[(String, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(stats == Map("a" -> (2L, 3L), "c" -> (2L, 3L)))
  }

  test("dictionary ranks by df desc, term asc") {
    val docs = Seq((1L, "a b"), (2L, "a c"), (3L, "b a")).toDF("doc_id", "text")
    val dict = TermOps.dictionary(docs, "doc_id", "text")
      .select("term", "id").as[(String, Int)].collect().toMap
    assert(dict == Map("a" -> 1, "b" -> 2, "c" -> 3))
  }

  // ---- DedupOps ----

  private val nearDupDocs = {
    val base = (1 to 60).map("tok" + _).mkString(" ")
    val nearA = ((1 to 58).map("tok" + _) ++ Seq("x1", "x2")).mkString(" ")
    val other = (200 to 260).map("tok" + _).mkString(" ")
    Seq((1L, base), (2L, nearA), (3L, other), (4L, base))
      .toDF("doc_id", "text")
  }

  test("exactGroups finds content duplicates") {
    val g = DedupOps.exactGroups(nearDupDocs, "doc_id", "text")
    val dup = g.filter(col("dup_count") === 2).select("keep_id").as[Long].collect()
    assert(dup.toSeq == Seq(1L)) // docs 1 and 4 share content; keep min id
    assert(g.count() == 3)
  }

  test("verifiedNearDups finds the planted near-pair, not the unrelated doc") {
    val pairs = DedupOps.verifiedNearDups(nearDupDocs, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 1L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("jaccardPairs finds the planted near-pair with the exact score") {
    val pairs = DedupOps.jaccardPairs(nearDupDocs, "doc_id", "text", threshold = 0.5)
      .as[(Long, Long, Double)].collect()
    // docs 1/4 identical (jaccard 1.0); docs 1/2 and 2/4 share 56 of 60
    // shingles (58 common tokens → 56 common 3-shingles, 60 total each)
    val m = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(m((1L, 4L)) == 1.0)
    assert(m.contains((1L, 2L)) && m((1L, 2L)) > 0.8)
    assert(!m.keySet.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("containmentPairs catches an embedded doc that jaccard misses") {
    val small = (1 to 12).map("tok" + _).mkString(" ")
    val page = "intro words here " + small + " plus " +
      (300 to 380).map("w" + _).mkString(" ")
    val docs = Seq((1L, small), (2L, page),
      (3L, (500 to 560).map("z" + _).mkString(" "))).toDF("doc_id", "text")
    val c = DedupOps.containmentPairs(docs, "doc_id", "text", threshold = 0.9)
      .as[(Long, Long, Double)].collect()
    val m = c.map(p => (p._1, p._2) -> p._3).toMap
    // all 10 shingles of doc 1 appear contiguously inside doc 2
    assert(m((1L, 2L)) == 1.0)
    assert(!m.keySet.exists(p => p._1 == 3L || p._2 == 3L))
    // symmetric jaccard on the same pair: 10/(10+95-10) ≈ 0.105 — missed
    val j = DedupOps.jaccardPairs(docs, "doc_id", "text", threshold = 0.5)
      .as[(Long, Long, Double)].collect()
    assert(!j.exists(p => p._1 == 1L && p._2 == 2L))
  }

  test("connectedComponents labels chains and separate clusters by min id") {
    val pairs = Seq((2L, 1L), (2L, 3L), (8L, 7L)).toDF("id_a", "id_b")
    val out = DedupOps.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L))
  }

  test("connectedComponents emits self-pair-only nodes as singleton components") {
    // node 5 appears ONLY as (5,5): it must surface as its own singleton
    // component, not vanish; node 2's self-loop must not duplicate its row
    val pairs = Seq((2L, 1L), (5L, 5L), (2L, 2L)).toDF("id_a", "id_b")
    val out = DedupOps.connectedComponents(pairs)
      .as[(Long, Long)].collect()
    assert(out.length == out.distinct.length, "duplicate label rows")
    assert(out.toMap == Map(1L -> 1L, 2L -> 1L, 5L -> 5L))
  }

  test("connectedComponents closes a 100-node chain in O(log n) rounds") {
    // min-label propagation would need ~99 rounds here; the star
    // algorithm must stay within ~2·log2(n)+2
    val pairs = (1L until 100L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val (labels, rounds) = DedupOps.connectedComponentsWithRounds(pairs)
    val out = labels.as[(Long, Long)].collect()
    assert(out.length == 100 && out.forall(_._2 == 1L), out.sorted.take(10).toSeq)
    val bound = 2 * math.ceil(math.log(100.0) / math.log(2.0)).toInt + 2
    assert(rounds <= bound, s"took $rounds rounds, bound $bound")
  }

  test("connectedComponents matches a local union-find on a random graph") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(300)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter(p => p._1 != p._2)
    val parent = Array.tabulate(120)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(p => Seq(p._1, p._2)).distinct
    val expected = nodes.groupBy(n => find(n.toInt)).values
      .flatMap { ns => val m = ns.min; ns.map(_ -> m) }.toMap
    val out = DedupOps.connectedComponents(edges.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap
    assert(out == expected)
  }

  test("ivfTopK finds an identical vector (same cell guaranteed)") {
    def v(i: Int) = Array.tabulate(8)(d =>
      (graft.functions.Hashing.mix(i.toLong * 8 + d) % 1000).toFloat)
    val vecs = (1 to 50).map(i => (i.toLong, v(i))).toDF("vec_id", "embedding")
    val dup = Seq((100L, v(9))).toDF("vec_id", "embedding")
    val out = SimilarityOps.ivfTopK(vecs, dup, k = 3, nCentroids = 8, nProbe = 2)
      .filter(col("rank") === 1).select("nbr_id").as[Long].collect()
    assert(out.toSeq == Seq(9L))
  }

  test("embeddingNearDups finds a planted duplicate embedding") {
    def v(i: Int) = Array.tabulate(8)(d =>
      (graft.functions.Hashing.mix(i.toLong * 8 + d) % 1000).toFloat)
    val vecs = ((1 to 40).map(i => (i.toLong, v(i))) :+ (200L, v(5)))
      .toDF("vec_id", "embedding")
    val out = SimilarityOps.embeddingNearDups(vecs, threshold = 0.999)
      .as[(Long, Long, Double)].collect()
    assert(out.map(p => (p._1, p._2)).toSet == Set((5L, 200L)))
    assert(out.head._3 == 1.0)
  }

  test("simhashCandidates puts identical docs at hamming 0") {
    val out = DedupOps.simhashCandidates(nearDupDocs, "doc_id", "text")
      .filter(col("id_a") === 1L && col("id_b") === 4L)
      .select("hamming").as[Int].collect()
    assert(out.toSeq == Seq(0))
  }

  test("canonicalKeepList keeps component minima and singletons") {
    val docs = Seq(1L, 2L, 3L, 4L, 7L).toDF("doc_id")
    val components = Seq((1L, 1L), (2L, 1L), (4L, 4L)) // 3 and 7 uncovered
      .toDF("node", "component")
    val out = DedupOps.canonicalKeepList(docs, "doc_id", components)
      .as[(Long, Long, Boolean)].collect().toSeq.sorted
    assert(out == Seq((1L, 1L, true), (2L, 1L, false), (3L, 3L, true),
      (4L, 4L, true), (7L, 7L, true)))
  }

  test("incrementalExact classifies index-dup / snapshot-dup / new") {
    val indexed = Seq((10L, "old content"), (12L, "shared")).toDF("doc_id", "text")
    val newer = Seq(
      (21L, "shared"),       // dup of the index → lose to 12
      (22L, "fresh fresh"),  // new, min holder → keep
      (23L, "fresh fresh"),  // dup within snapshot → lose to 22
      (24L, "only here"))    // new singleton → keep
      .toDF("doc_id", "text")
    val out = DedupOps.incrementalExact(newer, "doc_id", "text", indexed)
      .select("doc_id", "dup_of", "keep")
      .as[(Long, Option[Long], Boolean)].collect()
      .map { case (id, d, k) => id -> ((d, k)) }.toMap
    assert(out(21L) == ((Some(12L), false)))
    assert(out(22L) == ((None, true)))
    assert(out(23L) == ((Some(22L), false)))
    assert(out(24L) == ((None, true)))
  }

  test("duplicatedSpans counts corpus-wide duplicated windows per doc") {
    // doc 1 and 2 share the exact 4-token span "p q r s"; doc 3 repeats
    // its own span twice; doc 4 is all-unique
    val docs = Seq(
      (1L, "a b c p q r s d"),   // 5 windows, 1 dup (p q r s)
      (2L, "x p q r s y z w"),   // 5 windows, 1 dup
      (3L, "m n o t m n o t"),   // 5 windows: "m n o t" twice → 2 dup
      (4L, "u1 u2 u3 u4 u5"))    // 2 windows, 0 dup
      .toDF("doc_id", "text")
    val out = DedupOps.duplicatedSpans(docs, "doc_id", "text", w = 4)
      .select("doc_id", "n_windows", "n_dup_windows")
      .as[(Long, Long, Long)].collect()
      .map { case (id, a, b) => id -> ((a, b)) }.toMap
    assert(out(1L) == ((5L, 1L)))
    assert(out(2L) == ((5L, 1L)))
    assert(out(3L) == ((5L, 2L)))
    assert(out(4L) == ((2L, 0L)))
  }

  // ---- PackOps ----

  test("epochShuffle is a per-epoch permutation with dense shard positions") {
    val docs = (1L to 100L).toDF("doc_id")
    val out = PackOps.epochShuffle(docs, "doc_id", epochs = 2, shards = 4)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.length == 200)
    // every (epoch, shard) block has contiguous 1..n positions
    out.groupBy(r => (r._2, r._3)).foreach { case (_, rows) =>
      assert(rows.map(_._4).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // deterministic: same input → identical assignment
    val again = PackOps.epochShuffle(docs, "doc_id", epochs = 2, shards = 4)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.sorted.toSeq == again.sorted.toSeq)
    // epochs produce different orders (decorrelated hash rounds)
    val byEpoch = out.groupBy(_._2).map { case (e, rows) =>
      e -> rows.sortBy(r => (r._3, r._4)).map(_._1).toSeq
    }
    assert(byEpoch(1L) != byEpoch(2L))
  }

  test("temperatureResample keeps the largest source whole-ish and downsamples none above it") {
    // source A: 400 docs (n_max, rate 1.0 → all kept); B: 100 docs
    // (rate sqrt(1/4) = 0.5)
    val docs = ((1L to 400L).map(i => (i, "A")) ++ (401L to 500L).map(i => (i, "B")))
      .toDF("doc_id", "source")
    val out = PackOps.temperatureResample(docs, "doc_id", "source")
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("A") == ((400L, 400L))) // h² · n_max < n_max · res² always
    val (bTotal, bKept) = out("B")
    assert(bTotal == 100L)
    assert(bKept > 30L && bKept < 70L) // hash-thresholded ≈ 50%
  }

  test("packSequences assigns per-shard running offsets and sequence ids") {
    val docs = Seq(
      (1L, "a b c", "s1"),       // 3 tokens, start 0,  seq 0
      (2L, "d e f g h", "s1"),   // 5 tokens, start 3,  seq 0
      (3L, "i j", "s1"),         // 2 tokens, start 8,  seq 1
      (4L, "k l m n", "s2"))     // other shard resets: start 0, seq 0
      .toDF("doc_id", "text", "source")
    val out = PackOps.packSequences(docs, "doc_id", "text", "source", budget = 8)
      .select("shard", "doc_id", "n_tokens", "tok_start", "seq_id")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(out == Set(
      ("s1", 1L, 3L, 0L, 0L), ("s1", 2L, 5L, 3L, 0L),
      ("s1", 3L, 2L, 8L, 1L), ("s2", 4L, 4L, 0L, 0L)))
  }

  // ---- SimilarityOps ----

  test("bruteForceTopK ranks an identical vector first") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)), (2L, Array(1.0f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f)), (4L, Array(0.9f, 0.1f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = SimilarityOps.bruteForceTopK(vecs, vecs.filter(col("vec_id") === 1L), 2)
      .orderBy("rank").select("nbr_id").as[Long].collect()
    assert(out.head == 2L) // identical vector is rank 1
    assert(out(1) == 4L)
  }

  test("lshTopK finds the identical vector (same bucket guaranteed)") {
    def v(i: Int) = Array.tabulate(8)(d =>
      (graft.functions.Hashing.mix(i.toLong * 8 + d) % 1000).toFloat)
    val vecs = (1 to 50).map(i => (i.toLong, v(i))).toDF("vec_id", "embedding")
    val dup = Seq((100L, v(7))).toDF("vec_id", "embedding")
    val out = SimilarityOps.lshTopK(vecs, dup, k = 3)
      .filter(col("rank") === 1).select("nbr_id").as[Long].collect()
    assert(out.toSeq == Seq(7L)) // identical direction → cosine 1.0, same bucket
  }

  test("lshTopKJoin matches lshTopK row-for-row (same buckets, no broadcast)") {
    def v(i: Int) = Array.tabulate(8)(d =>
      (graft.functions.Hashing.mix(i.toLong * 8 + d) % 1000).toFloat)
    val vecs = (1 to 60).map(i => (i.toLong, v(i))).toDF("vec_id", "embedding")
    val bySmall = SimilarityOps.lshTopK(vecs, vecs, k = 3)
      .as[(Long, Long, Double, Int)].collect().toSet
    val byJoin = SimilarityOps.lshTopKJoin(vecs, vecs, k = 3)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(byJoin == bySmall)
    assert(byJoin.nonEmpty)
  }

  test("lshTopKJoin maxBucket drops over-populated corpus buckets wholesale") {
    // 30 identical vectors share one bucket (31 > cap) plus a distinct
    // pair in another bucket (2 <= cap): only the small bucket survives
    def v(i: Int) = Array.tabulate(8)(d =>
      (graft.functions.Hashing.mix(i.toLong * 8 + d) % 1000).toFloat)
    val dense = (1 to 31).map(i => (i.toLong, v(1)))
    val sparsePair = Seq((100L, v(9)), (101L, v(9)))
    val vecs = (dense ++ sparsePair).toDF("vec_id", "embedding")
    val out = SimilarityOps.lshTopKJoin(vecs, vecs, k = 3, maxBucket = 10)
      .select("query_id", "nbr_id").as[(Long, Long)].collect()
    assert(out.forall { case (q, n) => Seq(100L, 101L).contains(n) }, out.toSeq)
    assert(out.map(_._1).toSet.intersect(Set(100L, 101L)).nonEmpty)
  }

  // ---- Aggregators ----

  test("IntVectorSum sums ragged vectors element-wise") {
    val df = Seq(("a", Seq(1, 2)), ("a", Seq(3, 4, 5)), ("b", Seq(10)))
      .toDF("k", "v")
    val out = df.groupBy("k")
      .agg(udaf(IntVectorSum).apply(col("v")).as("s"))
      .as[(String, Seq[Int])].collect().toMap
    assert(out("a") == Seq(4, 6, 5))
    assert(out("b") == Seq(10))
  }

  // ---- SketchOps ----

  test("kmvDistinct is exact under k and within ~3/sqrt(k) above it") {
    val small = (0L until 100L).map(i => Tuple1(i * 7)).toDF("k")
    val smallOut = SketchOps.kmvDistinct(small, "k", k = 256)
      .select("estimate").as[Double].head()
    assert(smallOut == 100.0) // below k → exact
    val big = (0L until 20000L).map(i => Tuple1(i * 13)).toDF("k")
    val est = SketchOps.kmvDistinct(big, "k", k = 256)
      .select("estimate").as[Double].head()
    assert(math.abs(est - 20000.0) / 20000.0 < 3.0 / math.sqrt(256.0), s"est=$est")
  }

  // ---- AsofOps ----

  test("asofJoin picks the latest right row at or before each left ts") {
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val left = Seq((1L, ts(100), 10L), (2L, ts(250), 10L), (3L, ts(50), 20L))
      .toDF("event_id", "ts", "user_id")
    val right = Seq((10L, ts(100), 7L), (10L, ts(200), 8L), (20L, ts(60), 9L))
      .toDF("user_id", "ts", "v")
    val out = AsofOps.asofJoin(left, right, "user_id", "ts", Seq("v"))
      .select("event_id", "v").as[(Long, Option[Long])].collect().toMap
    assert(out(1L).contains(7L)) // equal ts matches ("<=")
    assert(out(2L).contains(8L)) // latest prior, not first
    assert(out(3L).isEmpty)      // nothing at or before → null
  }

  test("asofJoin carries the whole latest right row (null fields stay null)") {
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val left = Seq((1L, ts(300), 10L)).toDF("event_id", "ts", "user_id")
    val right = Seq((10L, ts(100), Some(5L)), (10L, ts(200), None))
      .toDF("user_id", "ts", "v")
    val out = AsofOps.asofJoin(left, right, "user_id", "ts", Seq("v"))
      .select("v").as[Option[Long]].head()
    assert(out.isEmpty) // latest right row has v=null — no stale fallback
  }

  test("rangeJoin catches sub-millisecond interval ends; empty intervals explode to nothing") {
    def t(us: Long) = java.sql.Timestamp.from(
      java.time.Instant.EPOCH.plus(us, java.time.temporal.ChronoUnit.MICROS))
    val facts = Seq((1L, t(10000200L), 0L)).toDF("fact_id", "ts", "k")
    val ivals = Seq(
      (0L, t(10000000L), t(10000500L), 7L),  // fact in the last sub-ms slice
      (0L, t(5000000L), t(5000000L), 8L))    // empty interval [t, t)
      .toDF("k", "start_ts", "end_ts", "ival_id")
    val got = AsofOps.rangeJoin(facts, ivals, "k", "ts",
        "start_ts", "end_ts", bucketMs = 1000L)
      .select("fact_id", "ival_id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 7L)))
  }

  test("kmvDistinct hashes string keys via fnv64 and rejects unsupported types") {
    val docs = (0 until 100).map(i => Tuple1(s"doc-$i")).toDF("title")
    val est = SketchOps.kmvDistinct(docs, "title", k = 256)
      .select("estimate").as[Double].head()
    assert(est == 100.0)
    val arr = Seq(Tuple1(Seq(1, 2))).toDF("a")
    intercept[IllegalArgumentException](SketchOps.kmvDistinct(arr, "a"))
  }

  test("asofJoin equals the naive per-key latest-at-or-before computation") {
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    // deterministic pseudo-random trace: 120 left rows, 80 right rows,
    // 6 keys, colliding timestamps included
    val left = (0L until 120L).map(i => (i, ts((i * 37) % 500), i % 6))
      .toDF("event_id", "ts", "user_id")
    val rightRows = (0L until 80L).map(i => ((i * 53) % 6, ts((i * 29) % 500), i))
      .groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq // unique (key, ts)
    val right = rightRows.toDF("user_id", "ts", "v")
    val got = AsofOps.asofJoin(left, right, "user_id", "ts", Seq("v"))
      .select("event_id", "v").as[(Long, Option[Long])].collect().toMap
    val want = (0L until 120L).map { i =>
      val t = (i * 37) % 500
      val k = i % 6
      val candidates = rightRows.filter(r => r._1 == k && r._2.getTime <= t)
      i -> (if (candidates.isEmpty) None
            else Some(candidates.maxBy(_._2.getTime)._3))
    }.toMap
    assert(got == want)
  }

  test("rangeJoin equals the naive containment join") {
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    val facts = (0L until 200L).map(i => (i, ts(i * 37), i % 5))
      .toDF("fact_id", "ts", "k")
    val ivals = Seq((0L, ts(100), ts(900), 100L), (1L, ts(0), ts(50), 101L),
      (4L, ts(5000), ts(7400), 102L), (2L, ts(7000), ts(7001), 103L))
      .toDF("k", "start_ts", "end_ts", "ival_id")
    val got = AsofOps.rangeJoin(facts, ivals, "k", "ts",
        "start_ts", "end_ts", bucketMs = 1000L)
      .select("fact_id", "ival_id").as[(Long, Long)].collect().toSet
    val want = facts.as[(Long, java.sql.Timestamp, Long)].collect().flatMap { f =>
      ivals.as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)].collect()
        .filter(iv => iv._1 == f._3 && !f._2.before(iv._2) && f._2.before(iv._3))
        .map(iv => (f._1, iv._4))
    }.toSet
    assert(got == want && want.nonEmpty)
  }

  test("bm25Search ranks the doc stuffed with the query term first") {
    val docs = Seq(
      (1L, "scan scan scan scan filter"),
      (2L, "scan filter order by key"),
      (3L, "order by key value line"),
      (4L, "scan")).toDF("doc_id", "text")
    val out = TermOps.bm25Search(docs, "doc_id", "text", Seq("scan"), k = 3)
      .select("doc_id").as[Long].collect()
    assert(out.head == 1L || out.head == 4L) // highest tf or shortest doc
    assert(!out.contains(3L))                // no query term → unscored
  }

  // ---- TermOps: scalable dictionary rank ----

  test("dictionaryScalable assigns identical ids to the windowed dictionary") {
    val docs = (1L to 200L).map(i =>
      (i, s"w${i % 7} w${i % 13} w${i % 29} shared tail")).toDF("doc_id", "text")
    val a = operators.TermOps.dictionary(docs, "doc_id", "text")
      .select("term", "df", "cf", "id")
      .as[(String, Long, Long, Int)].collect().toSet
    val b = operators.TermOps.dictionaryScalable(docs, "doc_id", "text",
        minDf = 1L, buckets = 5)
      .as[(String, Long, Long, Int)].collect().toSet
    assert(a == b)
    assert(a.map(_._4) == (1 to a.size).toSet) // dense 1..N ids
  }

  // ---- TextAnalysisOps: scrub / repetition ----

  test("scrubPii replaces urls, emails and long digit runs, in that order") {
    val out = Seq(
      "mail a@b.co now", "see https://x.io/p?q=1 ok", "tel 12345678", "clean")
      .toDF("t").select(TextAnalysisOps.scrubPii(col("t")).as("s"))
      .as[String].collect().toSeq
    assert(out == Seq("mail <EMAIL> now", "see <URL> ok", "tel <NUM>", "clean"))
  }

  test("repetitionRatio: all-same doc high, distinct doc zero, short doc zero") {
    val out = Seq((1L, "x x x x x x"), (2L, "a b c d e f"), (3L, "a b"))
      .toDF("id", "t")
      .select(col("id"), TextAnalysisOps.repetitionRatio(col("t")).as("r"))
      .as[(Long, Double)].collect().toMap
    assert(out(1L) == 0.75) // 4 shingles, 1 distinct
    assert(out(2L) == 0.0)
    assert(out(3L) == 0.0)
  }

  test("surprisal ranks rare-token docs above common-token docs") {
    val docs = Seq(
      (1L, "common common common common"),
      (2L, "rare1 rare2 rare3 common")).toDF("doc_id", "text")
    val out = TextAnalysisOps.surprisal(docs, "doc_id", "text")
      .as[(Long, Double)].collect().toMap
    assert(out(2L) > out(1L))
    assert(out(1L) > 0.0) // common ≠ certain: cf < total
  }

  test("hash-threshold sampling is deterministic and rate-proportional") {
    val df = (0L until 1000L).toDF("doc_id")
    def kept() = df.filter(
      SimilarityOps.hash32Col(col("doc_id") + lit(1L)) % 100 < 20)
      .as[Long].collect().toSet
    val k = kept()
    assert(k == kept())               // deterministic
    assert(k.size > 120 && k.size < 280) // ~20% of 1000
  }

  // ---- MultimodalOps ----

  test("withMediaMeta is deterministic and preserves byte length") {
    val df = Seq((1L, "hello world"), (2L, "")).toDF("doc_id", "text")
      .withColumn("payload", encode(col("text"), "UTF-8"))
    def run() = MultimodalOps.withMediaMeta(df, "payload")
      .select("doc_id", "media_meta.n_bytes", "media_meta.format")
      .as[(Long, Long, String)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    val out = run()
    assert(out == run())
    assert(out(1L)._1 == 11L)
    assert(out(2L)._2 == "empty")
  }

  test("decodeMeta really decodes PNG headers and degrades to the stub otherwise") {
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    assert(MultimodalOps.decodeMeta(png(12, 34))._1 == 12)
    assert(MultimodalOps.decodeMeta(png(12, 34))._2 == 34)
    assert(MultimodalOps.decodeMeta(png(12, 34))._3 == "png")
    // valid signature, truncated body: stub fallback, no exception
    val corrupt = png(8, 8).take(16)
    assert(MultimodalOps.decodeMeta(corrupt) == MultimodalOps.stubDecode(corrupt))
    // non-PNG bytes: stub path unchanged
    val txt = "not an image".getBytes("UTF-8")
    assert(MultimodalOps.decodeMeta(txt) == MultimodalOps.stubDecode(txt))
  }

  test("sampleFrames yields one frame per stride chunk") {
    val df = Seq((1L, Array.fill[Byte](100)(7))).toDF("id", "payload")
    val out = MultimodalOps.sampleFrames(df, "payload", frameSize = 10, stride = 3)
    assert(out.count() == 4) // ceil(100 / 30)
  }
}
