package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Training-sequence packing (SURVEY.md §2.6 north-star): lay documents
 * out in (group, id) order and cut the concatenation into consecutive
 * packs of ~`budget` tokens — the "concat then chunk" construction LM
 * training uses to fill fixed-length context windows without padding
 * waste. A document's pack is where it STARTS:
 * `pack_id = (running_total_before_doc) div budget`, in exact integer
 * math (deterministic across runs, engines, and repartitioning — the
 * layout depends only on the (group, id) total order, never on physical
 * row placement).
 *
 * 100 TB shape: ONE window aggregate, partitioned by `groupCol` (at scale
 * the group is a shard/source, so partitions are bounded and independent
 * — no global coordination); the shuffle carries (ids, token counts),
 * never the text. Skew is bounded by the largest group; a grouping column
 * with million-doc groups should be pre-salted upstream (split groups),
 * which only relabels pack boundaries at the splits.
 *
 * No reference counterpart (the reference has no relational layer);
 * companion to the §2.6 text operators.
 */
object Packing {

  /** doc_id, group, n_tokens (whitespace tokens), cum_tokens (running
   *  total inclusive of this doc), pack_id (budget-chunk index where the
   *  doc starts). */
  def packSequences(df: DataFrame, textCol: String, idCol: String,
      groupCol: String, budget: Int): DataFrame = {
    require(budget >= 1, "budget must be >= 1")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol), col(groupCol),
        size(split(col(textCol), " ")).cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("pack_id",
        expr(s"(cum_tokens - n_tokens) div ${budget}L"))
  }
}
