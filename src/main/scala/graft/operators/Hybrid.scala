package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of several
 * per-query retrieval legs — the standard hybrid-search combiner: each
 * leg (e.g. BM25 lexical, embedding-cosine semantic) contributes
 * `1/(k0 + rank)` per retrieved doc, contributions sum across legs, and
 * the fused order cuts to top `k`. RRF is rank-based, so legs in
 * incomparable score units (integer BM25 micro-units vs IEEE cosines)
 * fuse without normalization constants — the per-QUERY retrieval sibling
 * of [[Ensemble.rankSum]]'s global Borda vote. Not in the reference (no
 * retrieval surface); SURVEY.md §2.6 north-star addition.
 *
 * Integer-exact: contributions are `1000000 DIV (k0 + rk)` — operands
 * are positive, where Spark's truncating `DIV` and DuckDB's flooring
 * `//` agree — so the fused scores and every tie-break replay
 * cross-engine bit-for-bit.
 *
 * 100 TB shape: the legs carry ALL the cost (each is already a bounded
 * top-k per query — ≤ legs·k_leg slim rows per query reach the fusion);
 * fusion itself is one union + one partial-aggregated sum keyed by
 * (query_id, doc_id) + the [[Similarity.cutTopK]] map-side partial cut.
 * Nothing here scales with the corpus, only with the query workload.
 *
 * Input legs: (query_id, doc_id, rk), rk 1-based as every search here
 * emits. Output: (query_id, doc_id, rrf_micro, rk).
 */
object Hybrid {

  def rrf(legs: Seq[DataFrame], k0: Int = 60, k: Int = 10): DataFrame = {
    require(legs.nonEmpty, "need at least one retrieval leg")
    require(k0 >= 1, "k0 must be >= 1 (the RRF dampening constant)")
    require(k >= 1, "need k >= 1")
    val contribs = legs.map(_.select(col("query_id"), col("doc_id"),
      expr(s"1000000 DIV ($k0 + rk)").cast("long").as("c")))
    // checkpointed: the cut and the score re-attach below both reference
    // the fused table, and its lineage is EVERY retrieval leg — without
    // the cut here, both references would re-run the legs (the
    // multi-reference re-execution trap). The table itself is bounded at
    // ≤ legs·k_leg slim rows per query.
    val fused = contribs.reduce(_ unionAll _)
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("c")).as("rrf_micro"))
      .localCheckpoint()
    Similarity.cutTopK(
      fused.select(col("query_id"), col("doc_id").as("neighbor_id"),
        col("rrf_micro").cast("double").as("cos")), k)
      .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rk"))
      .join(fused, Seq("query_id", "doc_id"))
      .select(col("query_id"), col("doc_id"), col("rrf_micro"), col("rk"))
  }
}
