package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Skew-safe shuffled equi-join — the manual salting escape hatch for
 * pathological hot keys (SURVEY.md §2.5 joins; the reference has no joins,
 * `host-go/engine/tests/append_lens_test.go:29-30` delegates relational
 * work to the host system).
 *
 * When one join key holds a disproportionate share of the probe side (a
 * null-ish sentinel id, a "default" user, one giant document source), a
 * plain shuffle join serializes that key's rows on ONE reducer: at 100 TB
 * a 5% hot key is 5 TB through a single task. AQE's skew-join split fixes
 * the common case (it splits oversized probe partitions and replicates the
 * matching build partitions), but it only triggers for sort-merge joins
 * with statistics above its thresholds, and never helps when the skewed
 * aggregation AFTER the join reuses the same key. Salting fixes it
 * structurally, independent of runtime stats:
 *
 *  - PROBE side: each row gets `salt = xxhash64(all columns) mod S` — rows
 *    of the SAME hot key scatter over S reducers. (Salting by key alone
 *    would be a no-op: every row of the hot key must land in a DIFFERENT
 *    bucket, so the salt hashes the whole row, not the key. Fully
 *    identical rows co-locate, which affects placement only, never the
 *    join result.)
 *  - BUILD side: replicated S× via a generated `explode(sequence())` —
 *    the classic fragment-replicate ("skew broadcast") trade: S copies of
 *    the small side buy S-way parallelism on the big side's hot keys.
 *  - Join on (keys…, salt): every probe row meets exactly one build copy,
 *    so the output multiset is EXACTLY the plain inner join's (the oracle
 *    for `q_join_skew` checks this by hash).
 *
 * 100 TB shape: shuffle volume is |probe| + S·|build| rows; pick S around
 * the cluster's reducer fan-out needed for the hottest key (S=8–64). The
 * build side must be the smaller input but need NOT fit in broadcast
 * memory — that's the regime where this beats both `broadcast()` (OOM)
 * and plain shuffle (hot-key serialization).
 */
object SkewJoin {

  /** Inner equi-join of `probe` (big, possibly skewed) with `build`
   *  (smaller; replicated `saltBuckets`×) on `keys`. Result is identical
   *  to `probe.join(build, keys)`. */
  def saltedInner(
      probe: DataFrame, build: DataFrame, keys: Seq[String],
      saltBuckets: Int = 16): DataFrame = {
    require(keys.nonEmpty, "need at least one join key")
    require(saltBuckets >= 1, "saltBuckets must be >= 1")
    val salted = probe.withColumn("__salt",
      pmod(xxhash64(probe.columns.map(col).toIndexedSeq: _*),
        lit(saltBuckets)).cast("int"))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
