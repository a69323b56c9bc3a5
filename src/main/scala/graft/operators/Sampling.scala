package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/**
 * Deterministic sampling: keep the k rows with the smallest
 * xxhash64(id, salt) per group — uniform-ish, seedable, RNG-state-free,
 * stable across runs and cluster layouts. The single source of truth for
 * the `builtin:sample_group` lens op and the sampling queries.
 */
object Sampling {
  def perGroup(df: DataFrame, groupCol: String, idCol: String,
      k: Int, salt: Int = 42): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(xxhash64(col(idCol), lit(salt)), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .drop("__rn")
  }

  /**
   * Deterministic train/val/test assignment from the record id alone — no
   * RNG state, stable under reruns, repartitioning, and incremental
   * appends (a doc's split never changes when the corpus grows, unlike
   * `randomSplit`). Buckets come from a Knuth multiplicative mix
   * ((|id| mod 1000003)·2654435761 mod 2³², the golden-ratio constant)
   * taken mod 100 — plain OVERFLOW-FREE integer arithmetic (the pre-mod by
   * a prime keeps the product ≤ ~2.7e15, far under Long range, so engines
   * that error on BIGINT overflow — DuckDB — and engines that wrap —
   * Spark — compute the identical split for ANY id, including billions-
   * scale); swap in xxhash64 when portability of the exact assignment
   * doesn't matter. 100 TB shape: pure map stage.
   */
  def hashSplit(df: DataFrame, idCol: String,
      trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      "percentages must leave room for a test slice")
    val bucket =
      (((abs(col(idCol)) % lit(1000003L)) * lit(2654435761L)) % lit(4294967296L)) % lit(100)
    df.withColumn("split",
      when(bucket < trainPct, "train")
        .when(bucket < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /**
   * Deterministic corpus-mixture sampling — per-group keep rates, the
   * "data mixture weights" step of LM training-corpus assembly (keep 50%
   * of web text, 100% of books, ...). A row survives iff its id's mixer
   * bucket (mod 10⁶) falls under round(rate·10⁶) for its group; unknown
   * groups use `defaultRate`. The mixer follows hashSplit's portable
   * overflow-free integer recipe but with DIFFERENT prime/multiplier
   * constants, so mixture membership is statistically independent of
   * split assignment (sharing constants would make "sampled" correlate
   * with "train", biasing every split built from a mixed corpus —
   * mod-100 buckets are exactly the low digits of mod-10⁶ buckets).
   * Rates are rounded to 10⁻⁶ at plan time: the threshold compare is pure
   * integer math, identical in any engine.
   *
   * 100 TB shape: a map-side filter pushed into the scan — no shuffle, no
   * RNG state, rerun/repartition/append-stable membership.
   */
  /**
   * Exact k-quantile bucket assignment by a score column — the
   * curriculum/mixing step that bins a corpus into quality deciles before
   * per-bucket sampling rates are applied. Emits (id, rn, bucket) where
   * `rn` is the 1-based global rank under the TOTAL order (score, id) and
   * `bucket = (rn−1)·k div n + 1` — the equi-width rank formula, written
   * out explicitly on both engine sides rather than relying on `ntile`
   * (whose remainder-distribution rule differs in spirit across engines).
   *
   * 100 TB shape: a naive `row_number().over(Window.orderBy(score))`
   * funnels the corpus through ONE partition; this instead rides
   * `GlobalSequence.withSequentialId` (range-partition + per-partition
   * ranks + broadcast offsets — every stage parallel) and takes `n` from a
   * 1-row aggregate joined back by broadcast. Two passes, zero bottleneck
   * stages.
   *
   * Null scores rank FIRST (Spark's ascending default, which struct-field
   * comparison inherits); any SQL oracle over a nullable score column must
   * pin `ORDER BY score NULLS FIRST` explicitly — DuckDB's ascending
   * default is NULLS LAST, a silent divergence otherwise.
   */
  def quantileBuckets(df: DataFrame, scoreCol: String, idCol: String,
      k: Int = 10): DataFrame = {
    require(k >= 1, "need k >= 1")
    val scored =
      if (scoreCol == idCol) df.select(col(idCol))
      else df.select(col(idCol), col(scoreCol))
    val ranked = GlobalSequence.withSequentialId(
      scored, struct(col(scoreCol), col(idCol)), "rn")
    val total = scored.agg(count(lit(1)).as("n_total"))
    ranked.crossJoin(broadcast(total))
      .select(col(idCol), col("rn"),
        (expr(s"(rn - 1) * $k div n_total") + 1).as("bucket"))
  }

  /**
   * Deterministic global training order — a pseudorandom permutation of
   * the corpus as an explicit 1-based position column. LM training wants
   * documents visited in an order uncorrelated with ingest order
   * (source/time clustering biases early training); shuffling 100 TB with
   * `orderBy(rand())` is non-deterministic under retry. Instead: order by
   * `md5(id)` — a portable keyed permutation both Spark and any SQL oracle
   * compute identically — and attach contiguous positions via the
   * [[GlobalSequence]] two-pass construction (range-partition the hash,
   * per-partition ranks, broadcast offsets; no single-partition sort).
   * Rerun-, layout-, and engine-stable: position depends only on the id
   * set. 100 TB shape: identical to GlobalSequence — every stage parallel.
   */
  def shuffleOrder(df: DataFrame, idCol: String,
      as: String = "train_pos"): DataFrame =
    GlobalSequence.withSequentialId(
      df.withColumn("__shuffle_key", md5(col(idCol).cast("string"))),
      col("__shuffle_key"), as)
      .drop("__shuffle_key")

  /**
   * Deterministic fractional UPsampling — the other half of mixture
   * weighting: epoch multipliers > 1 ("books ×2.5, web ×0.5") replicate
   * each surviving row `floor(rate)` times plus one more iff the id's
   * mixer bucket falls under the fractional part. Same portable
   * overflow-free mixer recipe as `hashSplit`/`mixture` with a THIRD
   * (prime, multiplier) pair, so replication is independent of both
   * split assignment and downsample membership. Emits a 0-based `copy`
   * column — downstream `shuffleOrder` over (id, copy) interleaves the
   * epochs.
   *
   * 100 TB shape: a map-side `explode(sequence(...))` — no shuffle, no
   * RNG state; rerun/repartition/append-stable copy counts. Rows whose
   * copy count is zero are filtered before the explode (Spark's
   * `sequence(0, -1)` would DESCEND, not empty out).
   */
  def upsample(df: DataFrame, groupCol: String, idCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0): DataFrame = {
    (rates.values.toSeq :+ defaultRate).foreach(r =>
      require(r >= 0.0, s"rate $r negative"))
    // withColumn REPLACES an existing column of the same name — a second
    // upsample pass would silently destroy the first pass's copy index.
    require(!df.columns.contains("copy") && !df.columns.contains("__copies"),
      "input already carries a 'copy'/'__copies' column — rename it first " +
        "(re-upsampling replicated rows would clobber the copy index)")
    val bucket =
      (((abs(col(idCol)) % lit(999979L)) * lit(3266489917L)) % lit(4294967296L)) % lit(1000000L)
    def copiesFor(r: Double) =
      lit(math.floor(r).toLong) +
        when(bucket < lit(math.round((r - math.floor(r)) * 1e6)), lit(1L))
          .otherwise(lit(0L))
    val copies = rates.foldLeft(copiesFor(defaultRate)) {
      case (acc, (g, r)) => when(col(groupCol) === g, copiesFor(r)).otherwise(acc)
    }
    df.withColumn("__copies", copies)
      .where(col("__copies") >= 1)
      .withColumn("copy", explode(sequence(lit(0L), col("__copies") - 1)))
      .drop("__copies")
  }

  /**
   * Temperature-rebalanced mixture — the multilingual/multi-source
   * corpus-balancing knob (sampling with q_g ∝ p_g^α, the exponentiated
   * smoothing of XLM-R / mT5-style pipelines: α = 1 keeps natural
   * proportions, α → 0 approaches uniform-per-group, raising rare groups
   * and shrinking dominant ones while preserving the total corpus size in
   * expectation). Rates are COMPUTED from the corpus itself —
   * rate_g = (N · p_g^α / Σ p^α) / n_g — then applied through the same
   * deterministic integer mixer as [[upsample]] (floor copies + one more
   * iff the id's bucket falls under the fractional part), emitting the
   * same 0-based `copy` column.
   *
   * 100 TB shape: one per-group count (rows = #groups), one single-row
   * normalizer, both broadcast back — then a map-side explode; no
   * log-wide shuffle, no RNG state, rerun/repartition-stable. α = 1 is
   * the exact identity (every rate is exactly 1.0 in IEEE arithmetic:
   * floor 1 + frac 0), pinned in SamplingSpec.
   */
  def temperatureMixture(df: DataFrame, groupCol: String, idCol: String,
      alpha: Double): DataFrame = {
    require(alpha >= 0.0, s"alpha $alpha negative")
    require(!df.columns.contains("copy") && !df.columns.contains("__copies"),
      "input already carries a 'copy'/'__copies' column — rename it first")
    val n = df.groupBy(col(groupCol))
      .agg(count(lit(1)).cast("double").as("__ng"))
    val tot = n.agg(sum(col("__ng")).as("__N"),
      sum(pow(col("__ng"), lit(alpha))).as("__Z"))
    // Association mirrored EXACTLY by the DuckDB oracle fragment:
    // ((N * pow(ng, a)) / Z) / ng — cross-engine double parity.
    val rates = n.crossJoin(broadcast(tot))
      .select(col(groupCol),
        (col("__N") * pow(col("__ng"), lit(alpha)) / col("__Z") / col("__ng"))
          .as("__rate"))
    val bucket =
      (((abs(col(idCol)) % lit(999979L)) * lit(3266489917L)) % lit(4294967296L)) % lit(1000000L)
    val copies = (floor(col("__rate")).cast("long") +
      when(bucket < round((col("__rate") - floor(col("__rate"))) * lit(1e6)),
        lit(1L)).otherwise(lit(0L))).as("__copies")
    df.join(broadcast(rates), groupCol)
      .withColumn("__copies", copies)
      .where(col("__copies") >= 1)
      .withColumn("copy", explode(sequence(lit(0L), col("__copies") - 1)))
      .drop("__copies", "__rate")
  }

  /**
   * Token-budget mixture planner: given per-document token counts, a
   * total training-token budget, and desired mixture WEIGHTS (relative,
   * unnormalized), compute per-group epoch counts — the planning step
   * that turns "train on B tokens at mixture w" into the per-group rates
   * [[upsample]]/[[mixture]] execute. Per group g:
   * `target_tokens = floor(budget · w_g / Σw)` and
   * `epochs_micro = floor(1e6 · target_tokens / tokens)` — epochs > 1e6
   * means the group repeats (upsample), < 1e6 means it subsamples.
   * Integer outputs throughout, so the plan replays exactly cross-engine
   * and downstream integer-unit samplers consume it without FP drift.
   *
   * 100 TB shape: one groupBy over (group, tokens) — a shuffle of one
   * long per document — into a ≤ |groups| result; the weights map is a
   * broadcast-sized literal. The expensive part of a budget change is
   * re-running the SAMPLER, never the plan.
   */
  def tokenBudgetPlan(df: DataFrame, groupCol: String, tokenCol: String,
      budgetTokens: Long, weights: Map[String, Double],
      defaultWeight: Double = 0.0): DataFrame = {
    require(budgetTokens > 0, "need budgetTokens > 0")
    (weights.values.toSeq :+ defaultWeight).foreach(w =>
      require(w >= 0.0, s"weight $w negative"))
    val perGroup = df.groupBy(col(groupCol))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col(tokenCol)).cast("long").as("tokens"))
    val w = weights.foldLeft(lit(defaultWeight)) {
      case (acc, (g, v)) => when(col(groupCol) === g, lit(v)).otherwise(acc)
    }
    val weighted = perGroup.withColumn("__w", w)
    val totW = weighted.agg(sum(col("__w")).as("__sumw"))
    weighted.crossJoin(broadcast(totW))
      .select(col(groupCol), col("n_docs"), col("tokens"),
        floor(lit(budgetTokens.toDouble) * col("__w") / col("__sumw"))
          .cast("long").as("target_tokens"))
      .withColumn("epochs_micro",
        when(col("tokens") > 0,
          floor(lit(1e6) * col("target_tokens").cast("double") /
            col("tokens").cast("double")).cast("long"))
          .otherwise(lit(0L)))
  }

  def mixture(df: DataFrame, groupCol: String, idCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0): DataFrame = {
    (rates.values.toSeq :+ defaultRate).foreach(r =>
      require(r >= 0.0 && r <= 1.0, s"rate $r outside [0, 1]"))
    val bucket =
      (((abs(col(idCol)) % lit(999983L)) * lit(2246822519L)) % lit(4294967296L)) % lit(1000000L)
    val threshold = rates.foldLeft(lit(math.round(defaultRate * 1e6))) {
      case (acc, (g, r)) => when(col(groupCol) === g, lit(math.round(r * 1e6))).otherwise(acc)
    }
    df.where(bucket < threshold)
  }

  /**
   * Cluster-balanced (density-weighted) downsampling — the semantic
   * DIVERSITY sampler of D4 (Tirumala et al. 2023) / SSL-prototype
   * curation: assign every row to its nearest trained k-means cell (the
   * same coarse quantizer the IVF index and SemDeDup share) and keep it
   * with rate `min(1, targetPerCell / cellSize)`. Dense cells — the
   * boilerplate-heavy modes of the embedding space — thin toward
   * `targetPerCell` surviving rows; sparse cells survive whole, so the
   * sample equalizes coverage across semantic modes instead of
   * replicating the corpus's density skew.
   *
   * Membership is the deterministic integer-mixer compare with a FOURTH
   * (prime, multiplier) pair — independent of [[hashSplit]], [[mixture]],
   * and [[upsample]] membership, so stacked stages can't correlate. The
   * rate is `floor(1e6·target/size)` micro-units: the final compare is
   * pure integer math, identical in any engine given the same cell sizes.
   *
   * 100 TB shape: assignment is a map-side codegen argmin (the k·dim FMA
   * loop fused next to the scan); cell sizes are one ≤k-row aggregate
   * broadcast back; the keep decision is a map-side compare. The only
   * exchange carries (cell, count) pairs bounded by k — nothing
   * corpus-shaped shuffles, no RNG state, and per-row membership is
   * rerun/repartition-stable given fixed cell sizes. Output: the input
   * columns plus the row's `cell` (for downstream per-mode reporting).
   */
  def clusterBalanced(df: DataFrame, vecCol: String, idCol: String,
      centroids: Array[Array[Double]], targetPerCell: Long): DataFrame = {
    require(targetPerCell >= 1, "need targetPerCell >= 1")
    val assigned = df.withColumn("cell",
      org.apache.spark.sql.graft.GraftKmeans
        .nearestCentroid(col(vecCol), centroids).cast("long"))
    val sizes = assigned.groupBy(col("cell"))
      .agg(count(lit(1)).as("cell_n"))
    val bucket =
      (((abs(col(idCol)) % lit(999961L)) * lit(3432918353L)) % lit(4294967296L)) % lit(1000000L)
    val keepMicro = least(lit(1000000L),
      floor(lit(1e6) * lit(targetPerCell).cast("double")
        / col("cell_n").cast("double")).cast("long"))
    assigned.join(broadcast(sizes), Seq("cell"))
      .where(bucket < keepMicro)
      .select(df.columns.map(col) :+ col("cell"): _*)
  }

  /**
   * Key-skew profile — the join/partition-planning audit a 100 TB
   * deployment runs BEFORE picking a shuffle strategy: the top `k` keys
   * by frequency plus the global concentration numbers (distinct keys,
   * total rows, and the Herfindahl numerator Σnᵢ² — hhi/n_rows² is the
   * collision probability, and a top key's n vs n_rows/#partitions says
   * whether AQE skew-split or an explicit [[SkewJoin]] salt is needed).
   * All integer: the Σn² accumulates in DECIMAL(38,0) and is emitted as
   * BIGINT (exact while Σn² < 2⁶³; the oracle's HUGEINT agrees
   * digit-for-digit there).
   *
   * 100 TB shape: one partial-aggregated count per key (map-side
   * combine), a 1-row total aggregate broadcast back, and a TakeOrdered
   * top-k cut — never a global sort, nothing key-shaped moves twice.
   */
  def keySkew(df: DataFrame, keyCol: String, k: Int = 20): DataFrame = {
    require(k >= 1, "need k >= 1")
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.agg(
      count(lit(1)).as("n_keys"), sum(col("n")).as("n_rows"),
      sum(col("n").cast("decimal(38,0)") * col("n")).cast("long").as("hhi"))
    counts.orderBy(col("n").desc, col("key")).limit(k)
      .crossJoin(broadcast(totals))
  }

  /**
   * Systematic PPS (probability-proportional-to-size) sampling by token
   * count — the exact, deterministic way to draw "k docs ∝ their token
   * mass" for a corpus mix, with NO random state and NO floating point:
   * lay every document's token count end to end in doc-id order (the
   * [[Packing.packSequences]] range-spread cumulative sum — never a
   * single-partition window), then a document is picked once for every
   * multiple of W/k its token interval covers:
   *
   *   n_picks = (cum·k) div W − ((cum − n)·k) div W
   *
   * All operands non-negative integers, so Spark DIV ≡ DuckDB // and
   * the oracle replays pick-for-pick; the sum of n_picks telescopes to
   * EXACTLY k (spec-pinned). Docs longer than W/k tokens are picked
   * multiple times (true PPS-with-replacement semantics — the upsampling
   * a token-budget mix wants).
   *
   * 100 TB shape: the cumsum is the packSequences discipline (two passes
   * over ONE range exchange of slim rows, per-partition offsets via a
   * tiny driver prefix-sum); the corpus total W is one driver scalar
   * (the PageRank N-literal discipline). `cum·k` needs
   * tokens × k < 2⁶³ — at 10¹³ corpus tokens that bounds k at ~9·10⁵,
   * documented here.
   */
  /**
   * Largest-remainder (Hare-quota) budget allocation: split an integer
   * budget `k` across groups exactly proportionally to an integer weight
   * — the apportionment primitive behind every corpus-mix schedule
   * ("give each source tokens ∝ its mass, and make the totals add up to
   * EXACTLY the budget"). Each group gets `⌊w·k/W⌋`; the `k − Σ floors`
   * leftover units go to the largest remainders (`w·k mod W`), ties to
   * the smaller group key — a total order, so the allocation is unique
   * and the oracle replays it rank-for-rank. All non-negative integers
   * (Spark DIV ≡ DuckDB //); `w·k` must stay under 2⁶³ — same bound as
   * [[tokenPps]], documented there.
   *
   * 100 TB shape: whatever feeds this collapses to ONE row per group
   * first (the caller's aggregate); everything here runs on the
   * groups-cardinality table — two tiny windows (total + remainder
   * rank), no data-volume work at all.
   */
  def largestRemainder(groups: DataFrame, groupCol: String,
      weightCol: String, k: Long): DataFrame = {
    require(k >= 0, "budget must be non-negative")
    // Loud preconditions on the (tiny) groups table — the documented
    // "Σ quota ≡ k" contract dies silently otherwise: tot = 0 makes
    // every DIV NULL, a negative weight breaks DIV ≡ // floor parity.
    val chk = groups.agg(
      min(col(weightCol).cast("long")), sum(col(weightCol).cast("long"))).head
    require(!chk.isNullAt(0) && chk.getLong(0) >= 0,
      "weights must be non-negative (and at least one group present)")
    require(chk.getLong(1) > 0, "total weight must be positive")
    val wTot = Window.partitionBy()
    val wRank = Window.orderBy(col("__rem").desc, col(groupCol))
    groups
      .select(col(groupCol), col(weightCol).cast("long").as("__w"))
      .withColumn("__tot", sum(col("__w")).over(wTot))
      .withColumn("__base", expr(s"(__w * ${k}L) div __tot"))
      .withColumn("__rem", expr(s"(__w * ${k}L) % __tot"))
      .withColumn("__left", lit(k) - sum(col("__base")).over(wTot))
      .withColumn("__rk", row_number().over(wRank))
      .select(col(groupCol), col("__w").as("weight"),
        (col("__base") +
          when(col("__rk") <= col("__left"), 1L).otherwise(0L)).as("quota"))
  }

  def tokenPps(df: DataFrame, textCol: String, idCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val w = df.select(
      sum(size(split(col(textCol), " ")).cast("long")).as("w"))
      .head.getLong(0)
    require(w > 0, "corpus has no tokens")
    Packing.packSequences(df.withColumn("__g", lit(0)), textCol, idCol,
        "__g", budget = Int.MaxValue)
      .withColumn("n_picks",
        expr(s"(cum_tokens * $k) div ${w}L - " +
          s"((cum_tokens - n_tokens) * $k) div ${w}L"))
      .where(col("n_picks") >= 1)
      .select(col(idCol), col("n_tokens"), col("cum_tokens"), col("n_picks"))
  }
}
