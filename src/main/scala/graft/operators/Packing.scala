package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.{DataFrame, Row}

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
 * 100 TB shape: the [[GlobalSequence]] construction applied PER GROUP —
 * never `Window.partitionBy(group)`, which serializes each group's sort
 * onto one task (a 3-source corpus would run on 3 tasks):
 *
 *   1. project to the slim (id, group, n_tokens) rows — the text never
 *      enters the shuffle;
 *   2. range-partition + sort by (group, id): one giant group SPREADS
 *      over many partitions, each sorted independently;
 *   3. one tiny pass collects per-(partition, group) token totals (≤
 *      #partitions + #groups-spanning-boundaries entries — broadcast-
 *      equivalent bytes), the driver prefix-sums them in partition
 *      order, and the attach pass starts each partition's running total
 *      from its broadcast offset.
 *
 * Both passes run over the SAME shuffled RDD (one lineage — see the
 * [[GlobalSequence.withSequentialId]] note: a separate DataFrame job
 * would re-sample range bounds and describe a different partitioning).
 * Null `n_tokens` (null text) mirrors window-sum semantics: it adds
 * nothing to the running total, `cum_tokens` is null until the group's
 * first non-null row, and the row's own `pack_id` is null.
 *
 * No reference counterpart (the reference has no relational layer);
 * companion to the §2.6 text operators.
 */
object Packing {

  /** Slim shuffle payload, range-clustered by (group, id): what the two
   *  RDD passes consume. Exposed for plan-shape assertions (PackingSpec
   *  pins rangepartitioning + no SinglePartition + no Window). */
  private[graft] def slimSorted(df: DataFrame, textCol: String, idCol: String,
      groupCol: String): DataFrame = {
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    df.select(col(idCol), col(groupCol),
        size(split(col(textCol), " ")).cast("long").as("n_tokens"))
      .repartitionByRange(n, col(groupCol), col(idCol))
      .sortWithinPartitions(col(groupCol), col(idCol))
  }

  /** doc_id, group, n_tokens (whitespace tokens), cum_tokens (running
   *  total inclusive of this doc), pack_id (budget-chunk index where the
   *  doc starts). */
  def packSequences(df: DataFrame, textCol: String, idCol: String,
      groupCol: String, budget: Int): DataFrame = {
    require(budget >= 1, "budget must be >= 1")
    val spark = df.sparkSession
    val sorted = slimSorted(df, textCol, idCol, groupCol)
    val rdd = sorted.rdd // ONE lineage: both jobs reuse this shuffle's map output

    // Pass 1 (tiny): per-(partition, group) token total + non-null count.
    // Groups are contiguous within a sorted partition, so this is a
    // streaming fold — no map of all groups held per task.
    val partTotals: Array[(Int, Array[(Any, Long, Long)])] =
      rdd.mapPartitionsWithIndex { (pid, it) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[(Any, Long, Long)]
        var cur: Any = null; var open = false; var tot = 0L; var nonNull = 0L
        it.foreach { r =>
          val g = r.get(1)
          if (!open || g != cur) {
            if (open) out += ((cur, tot, nonNull))
            cur = g; open = true; tot = 0L; nonNull = 0L
          }
          if (!r.isNullAt(2)) { tot += r.getLong(2); nonNull += 1L }
        }
        if (open) out += ((cur, tot, nonNull))
        Iterator.single((pid, out.toArray))
      }.collect()

    // Driver prefix-sum in partition order: offset(pid, g) = tokens of g in
    // partitions < pid; seen(pid, g) = whether any of those rows were
    // non-null (pins the all-null-prefix window semantics).
    val offsets = scala.collection.mutable.HashMap.empty[(Int, Any), (Long, Boolean)]
    val running = scala.collection.mutable.HashMap.empty[Any, (Long, Long)]
    partTotals.sortBy(_._1).foreach { case (pid, arr) =>
      arr.foreach { case (g, tot, nonNull) =>
        val (offTot, offNonNull) = running.getOrElse(g, (0L, 0L))
        offsets((pid, g)) = (offTot, offNonNull > 0L)
        running(g) = (offTot + tot, offNonNull + nonNull)
      }
    }
    val bOffsets = spark.sparkContext.broadcast(offsets.toMap)

    val outSchema = StructType(sorted.schema.fields ++ Seq(
      StructField("cum_tokens", LongType, nullable = true),
      StructField("pack_id", LongType, nullable = true)))

    // Pass 2: per-partition cumsum from the broadcast offset.
    val rows = rdd.mapPartitionsWithIndex { (pid, it) =>
      val offs = bOffsets.value
      var cur: Any = null; var open = false
      var cum = 0L; var seen = false
      it.map { r =>
        val g = r.get(1)
        if (!open || g != cur) {
          cur = g; open = true
          val (off, seenBefore) = offs.getOrElse((pid, g), (0L, false))
          cum = off; seen = seenBefore
        }
        if (r.isNullAt(2)) {
          Row.fromSeq(r.toSeq ++ Seq(if (seen) cum else null, null))
        } else {
          val t = r.getLong(2)
          cum += t; seen = true
          Row.fromSeq(r.toSeq ++ Seq(cum, Math.floorDiv(cum - t, budget.toLong)))
        }
      }
    }
    spark.createDataFrame(rows, outSchema)
  }

  /** Shard manifest over [[packSequences]]: one row per (group, pack) with
   *  the doc count, token total, and first document — the unit a trainer's
   *  data loader actually schedules. One hash-aggregate over the slim pack
   *  assignment (ids + counts, never text): adds a single bounded shuffle
   *  on (group, pack_id) after the packing passes. */
  def packManifest(df: DataFrame, textCol: String, idCol: String,
      groupCol: String, budget: Int): DataFrame =
    packSequences(df, textCol, idCol, groupCol, budget)
      .groupBy(col(groupCol), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("pack_tokens"),
        min(col(idCol)).as("first_doc"))

  /**
   * Length-bucketed INFERENCE batching with an exact padding-waste
   * audit — the serving-side complement of [[packSequences]]: inference
   * and eval runs can't concat documents, they pad every sequence in a
   * batch to the batch max, so the lever is grouping like-length
   * sequences ("bucketing" in every serving stack). This operator
   * assigns each row to one of `buckets` global length-quantile buckets,
   * cuts each bucket into consecutive `batchSize`-row batches in
   * (length, id) order, and reports per batch the row count, max length,
   * and wasted pad tokens (`n·max − Σlen`) — the number a capacity plan
   * actually needs. One row per batch; `buckets = 1` degenerates to
   * naive length-sorted batching for an A/B of the bucketing win.
   *
   * Integer-exact: quantile bucket is rank arithmetic
   * (`(rn−1)·B div total + 1`, [[Sampling.quantileBuckets]]'s formula),
   * per-bucket rank is `rn − min(rn) + 1` (buckets are contiguous in
   * rank space), batch is `(r−1) div batchSize` — all non-negative, so
   * Spark `DIV` ≡ DuckDB `//` and every batch boundary replays exactly.
   *
   * 100 TB shape: one [[GlobalSequence]] range-partition pass over the
   * slim (id, len) projection gives the global ranks; the per-bucket
   * offset table is `buckets` rows broadcast back; the batch report is
   * one hash aggregate on (bucket, batch). No per-bucket window task,
   * nothing text-shaped ever shuffles.
   */
  def padBatches(df: DataFrame, lenCol: String, idCol: String,
      buckets: Int, batchSize: Int): DataFrame = {
    require(buckets >= 1 && batchSize >= 1, "need buckets, batchSize >= 1")
    val slim = df.select(col(idCol), col(lenCol).cast("long").as("len"))
    val ranked = GlobalSequence.withSequentialId(slim,
      struct(col("len"), col(idCol)), "rn")
    val total = slim.agg(count(lit(1)).as("total"))
    val bucketed = ranked.crossJoin(broadcast(total))
      .withColumn("bucket", expr(s"(rn - 1) * $buckets div total + 1"))
    val offsets = bucketed.groupBy(col("bucket"))
      .agg(min(col("rn")).as("rn0"))
    bucketed.join(broadcast(offsets), Seq("bucket"))
      .withColumn("batch_id", expr(s"(rn - rn0) div $batchSize"))
      .groupBy(col("bucket"), col("batch_id"))
      .agg(count(lit(1)).as("n_seqs"), max(col("len")).as("max_len"),
        sum(col("len")).as("sum_len"))
      .select(col("bucket"), col("batch_id"), col("n_seqs"), col("max_len"),
        (col("n_seqs") * col("max_len") - col("sum_len")).as("waste_tokens"))
  }
}
