package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Interval-overlap self-join — the join shape [[AsOfJoin]] (point→latest)
 * and the range join (point∈window) don't cover: every pair of intervals
 * `[s, e)` that OVERLAP, emitted exactly once. The co-presence miner
 * (users whose sessions overlapped, jobs that contended for a window,
 * sessions that overlapped an incident), and — like the as-of join — a
 * shape a naive formulation gets catastrophically wrong: `a JOIN b ON
 * a.s < b.e AND b.s < a.e` has no equi-key, so Spark plans a cartesian.
 *
 * Chunked-bucket plan instead:
 *
 *   1. explode each interval to the time chunks it touches
 *      (`s div C … (e−1) div C` — a long-typed `sequence` generator,
 *      bounded by span/C per interval);
 *   2. ONE equi-join on the chunk id with `id_a < id_b`;
 *   3. the overlap predicate filters in-chunk false positives, and the
 *      CANONICAL-CHUNK rule — keep the pair only in the chunk where its
 *      overlap STARTS, `greatest(s_a, s_b) div C == chunk` — makes each
 *      pair unique with ZERO dedup shuffle (no distinct).
 *
 * Ids must be longs (pack composite ids arithmetically) and times
 * non-negative µs (chunk indexing uses truncating DIV; both engines
 * agree only on non-negative operands — the EmbeddingQa shift rule).
 *
 * 100 TB shape: the exchange carries interval×chunks slim rows —
 * span/C-bounded replication, tuned by `chunkUs` against the per-chunk
 * quadratic (a chunk with k co-active intervals contributes C(k,2)
 * candidate pairs; pick C near the TYPICAL interval length so
 * replication stays ~2× while chunks stay small). An everyone-online
 * hot chunk is the documented skew knob: cap co-active intervals per
 * chunk as an exact order statistic (the winsorize-rank rule) or salt
 * the chunk — the [[SkewJoin]] alternatives, same trade-off.
 */
object IntervalJoin {

  def overlapPairs(df: DataFrame, idCol: String, startCol: String,
      endCol: String, chunkUs: Long): DataFrame = {
    require(chunkUs > 0, "chunkUs must be positive")
    // Contract violation fails LOUDLY: a silent `__s >= 0` filter would
    // let negative-time upstream data diverge from the plain quadratic
    // oracle instead of naming the bad row. The guard rides the __s
    // projection itself so column pruning can't elide it.
    val iv = df.select(col(idCol).cast("long").as("__id"),
        when(col(startCol).cast("long") < 0,
          raise_error(concat(lit("overlapPairs: negative start time for id "),
            col(idCol).cast("string"))))
          .otherwise(col(startCol).cast("long")).as("__s"),
        col(endCol).cast("long").as("__e"))
      .where(col("__e") > col("__s"))
    val chunked = iv.withColumn("__c",
      explode(sequence(expr(s"__s div $chunkUs"),
        expr(s"(__e - 1) div $chunkUs"))))
    val a = chunked.select(col("__c"), col("__id").as("id_a"),
      col("__s").as("s_a"), col("__e").as("e_a"))
    val b = chunked.select(col("__c"), col("__id").as("id_b"),
      col("__s").as("s_b"), col("__e").as("e_b"))
    a.join(b, Seq("__c"))
      .where(col("id_a") < col("id_b") &&
        col("s_a") < col("e_b") && col("s_b") < col("e_a") &&
        expr(s"greatest(s_a, s_b) div $chunkUs") === col("__c"))
      .select(col("id_a"), col("id_b"),
        greatest(col("s_a"), col("s_b")).as("overlap_start_us"),
        least(col("e_a"), col("e_b")).as("overlap_end_us"),
        (least(col("e_a"), col("e_b"))
          - greatest(col("s_a"), col("s_b"))).as("overlap_us"))
  }
}
