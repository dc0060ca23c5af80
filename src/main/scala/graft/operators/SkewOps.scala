package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY §2.6 O5 — the reference salts reduce keys by
  * wall-clock, FastExtractTemporalAnchorText.java:94-97; here salting is
  * deterministic and two-phase so results are exact).
  *
  * `saltedSum`: phase 1 aggregates on (key, salt) — skewed keys spread
  * over `salts` reducers with map-side partial aggregation; phase 2
  * merges the per-salt partials on the now low-cardinality (key) space.
  * At 100 TB this bounds the largest reduce partition by 1/salts at the
  * cost of one extra (tiny) shuffle; AQE's skew handling covers joins,
  * this covers aggregations with pathological key skew.
  */
object SkewOps {

  def saltedSum(df: DataFrame, key: String, valueCol: String,
                salts: Int = 16): DataFrame = {
    // salt from STABLE row content, never monotonically_increasing_id:
    // the salt is a shuffle key, and a nondeterministic key makes the
    // map stage indeterminate — on a fetch-failure retry Spark must roll
    // the whole stage back (and result-stage retries can abort the job),
    // exactly the failure mode that matters when retries are routine at
    // 100 TB. xxhash64 over every column reproduces identical salts on
    // recomputation; exact-duplicate rows sharing a salt skews nothing
    // (they'd land in one reducer under any content-hash scheme).
    val salted = df.withColumn("_salt",
      pmod(xxhash64(df.columns.toIndexedSeq.map(col): _*), lit(salts.toLong)))
    salted.groupBy(col(key), col("_salt"))
      .agg(sum(col(valueCol)).as("_partial_sum"), count(lit(1)).as("_partial_n"))
      .groupBy(col(key))
      .agg(sum(col("_partial_sum")).as(s"sum_$valueCol"),
        sum(col("_partial_n")).as("n_rows"))
  }

  /** Key-distribution profiler: per power-of-two group-size bucket, how
    * many keys land there and the min/max/total rows — the diagnostic
    * that decides whether a key needs salting, AQE skew splitting, or
    * nothing, BEFORE the 100 TB job runs. Two hash aggregations with
    * map-side combine (sizes, then buckets); output is O(log maxSize)
    * rows. Buckets are exact integer comparisons, not float log2 (whose
    * 1-ulp drift at exact powers of two is engine-dependent). */
  def groupSizeHistogram(df: DataFrame, key: String): DataFrame = {
    val sizes = df.groupBy(col(key)).agg(count(lit(1)).as("sz"))
    val bucket = when(col("sz") >= 64, lit(64L))
      .when(col("sz") >= 32, lit(32L)).when(col("sz") >= 16, lit(16L))
      .when(col("sz") >= 8, lit(8L)).when(col("sz") >= 4, lit(4L))
      .when(col("sz") >= 2, lit(2L)).otherwise(lit(1L))
    sizes.groupBy(bucket.as("bucket_lo"))
      .agg(count(lit(1)).as("n_keys"), min(col("sz")).as("min_sz"),
        max(col("sz")).as("max_sz"), sum(col("sz")).as("n_rows"))
  }

  /** Key-sanity cap for carry-state operators — the P5 length-sanity
    * discipline moved to KEYS: drop every row of keys holding more than
    * `maxRows` rows. Sequential-per-key operators (the S8 sampler's
    * carry scan, per-key lag windows) serialize the hottest key no
    * matter how the rest of the job scales — the r11 planted-skew
    * probes measured 2.9×/2.6× floors from one user owning half the
    * events. A key that active is a bot or a broken client, and the
    * sane pipeline move is to exclude and FLAG it upstream, not to
    * crawl it.
    *
    * 100 TB shape: one COUNT aggregation (map-side partial combine
    * spreads even the hot key over all map tasks — a count is never
    * skewed) + a BROADCAST anti-join of the tiny over-cap key list; the
    * corpus never shuffles here and no per-key sequential pass happens
    * at all. [[hotKeyAudit]] is the flag side — always persist it next
    * to a capped run so dropped traffic is visible, never silent. */
  def capHotKeys(df: DataFrame, key: String, maxRows: Long): DataFrame = {
    val over = df.groupBy(col(key)).agg(count(lit(1)).as("_kn"))
      .filter(col("_kn") > maxRows).select(col(key).as("_ck"))
    // NULL-SAFE anti-join: a plain left_anti on the key never matches a
    // NULL group, so an over-cap null-key cohort would silently survive
    // while [[hotKeyAudit]] reports it dropped — <=> keeps the three
    // surfaces (cap, audit, oracle) agreeing on null keys too
    df.join(broadcast(over), df(key) <=> col("_ck"), "left_anti")
  }

  /** What [[capHotKeys]] would drop at `maxRows`: one audit row
    * (n_keys, n_keys_capped, n_rows_dropped) — the "cap-and-flag" half
    * of the key-sanity discipline. Same never-skewed count aggregation;
    * output is O(1). */
  def hotKeyAudit(df: DataFrame, key: String, maxRows: Long): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("kn"))
      .agg(count(lit(1)).as("n_keys"),
        sum(when(col("kn") > maxRows, 1L).otherwise(0L)).as("n_keys_capped"),
        sum(when(col("kn") > maxRows, col("kn")).otherwise(0L))
          .as("n_rows_dropped"))

  /** The `k` heaviest keys by group size (size desc, key asc tie-break) —
    * the concrete skew candidates the histogram points at. Aggregation +
    * TakeOrdered: no full sort materializes. */
  def heavyKeys(df: DataFrame, key: String, k: Int): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("sz"))
      .orderBy(col("sz").desc, col(key).asc)
      .limit(k)

  /** Salted SHUFFLE JOIN for pathological key skew — the join-side
    * counterpart of [[saltedSum]], for when the small side is still too
    * big to broadcast (the case AQE's broadcast demotion can't rescue)
    * and one hot key would otherwise pin a whole join task. The big side
    * takes a per-row salt in [0, salts); the small side replicates each
    * row across ALL salts; joining on (key, salt) splits every hot key's
    * rows over `salts` tasks and is EXACTLY the plain equi-join (each
    * big row meets each matching small row exactly once, at its own
    * salt). Cost: small side × salts shuffle volume — the standard trade.
    * The shuffle_hash hint pins the shuffled-join strategy so the salt
    * column isn't wasted on a plan that would broadcast anyway. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int = 8): DataFrame = {
    // deterministic content-derived salt — see the saltedSum comment:
    // a monotonically_increasing_id-based salt is a nondeterministic
    // shuffle join key, which forces whole-stage rollbacks (or worse)
    // on task retry. Hashing the full row spreads a hot key's rows
    // across salts exactly as well, and retried tasks reproduce it.
    val sb = big.withColumn("_salt",
      pmod(xxhash64(big.columns.toIndexedSeq.map(col): _*), lit(salts.toLong)))
    val ss = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    sb.join(ss.hint("shuffle_hash"), Seq(key, "_salt")).drop("_salt")
  }
}
