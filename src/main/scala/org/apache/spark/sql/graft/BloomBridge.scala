package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Column bridge to Spark's built-in Bloom-filter expressions (the pair
 * Catalyst itself uses for runtime row-level join filtering) — exposed
 * here because they are not registered in the public function registry.
 *
 * `bloomAgg` builds the sketch DISTRIBUTED: per-partition filters are
 * OR-merged up the usual partial-aggregation tree, and only the final
 * ~`numBits/8`-byte bitset reaches the driver — which is exactly where it
 * must land anyway, since probing broadcasts the filter to every executor
 * as a literal. `mightContain` is codegen'd (a few XXH64 probes per row),
 * so a 100 TB corpus-side scan stays a narrow, shuffle-free map stage.
 *
 * Both sides hash with `xxhash64` (LongType input contract), matching the
 * keying used across the dedup operators.
 */
object GraftBloom {

  /** Aggregate a LongType hash column into a serialized Bloom filter
   *  (BinaryType). `numBits` must stay within Spark's runtime-filter
   *  creation cap (`spark.sql.optimizer.runtime.bloomFilter.maxNumBits`,
   *  default 2²⁶ ⇒ 8 MiB). */
  def bloomAgg(hashed: Column, estimatedItems: Long, numBits: Long): Column =
    ExpressionUtils.column(
      new BloomFilterAggregate(ExpressionUtils.expression(hashed),
        Literal(estimatedItems), Literal(numBits)).toAggregateExpression())

  /** Probe a serialized Bloom filter (as a literal/broadcast BinaryType
   *  column) with a LongType hash column. */
  def mightContain(bloomBits: Column, hashed: Column): Column =
    ExpressionUtils.column(
      BloomFilterMightContain(ExpressionUtils.expression(bloomBits),
        ExpressionUtils.expression(hashed)))
}
