package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data preparation (driver brief: the
  * operations a large-scale training pipeline needs; no reference
  * analogue — the reference stops at corpus statistics).
  *
  * A tokenized corpus is consumed as fixed-budget training sequences;
  * the packer assigns every document a sequence id so a downstream
  * writer can group documents into sequences of ≤ `budget` tokens
  * (documents longer than the budget span sequences and are split by
  * the consumer at token granularity — the assignment here is by the
  * document's START offset, the standard contiguous-packing rule).
  *
  * Scale stance (100 TB): packing is per shard (`shardCol` — source,
  * crawl segment, bucket...), NOT global: the running token offset is a
  * window partitioned by shard, so shards pack in parallel and no
  * single-partition global ordering ever materializes. A global pack
  * over 100 TB would serialize the corpus through one task; per-shard
  * is what production pipelines run (sequences never cross shard
  * boundaries anyway, since shards are the unit of shuffling/epoching).
  */
object PackOps {

  /** Assign each document its token start offset and sequence id within
    * its shard: docs ordered by id, `tok_start` = running sum of
    * preceding token counts, `seq_id` = tok_start / budget.
    *
    * Output: (shard, doc_id, n_tokens, tok_start, seq_id). */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    shardCol: String, budget: Int): DataFrame = {
    require(budget > 0, s"pack budget must be positive, got $budget")
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col(shardCol).as("shard"), col(idCol).as("doc_id"),
        size(TermOps.tokens(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("tok_start", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      // integral `div`, not `/`: a corpus-scale token offset exceeds
      // double's 2^53 exact-integer range, where `/`+cast could misassign
      .withColumn("seq_id", expr(s"tok_start div $budget"))
  }
}
