package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Okapi BM25 relevance scoring (Robertson & Zaragoza 2009) of every
 * document against a fixed query-term set — the ranking function behind
 * classic retrieval and the standard "does this doc match my domain
 * keywords" scorer in data-curation pipelines (keyword-seeded corpus
 * selection). Complements [[TextAnalysis]]'s tf-idf table: tf-idf emits
 * per-(doc, term) weights; BM25 emits one calibrated per-doc relevance
 * score with length normalization. Not in the reference; SURVEY.md §2.6
 * north-star addition.
 *
 * Uses the Lucene-standard smoothed idf `ln(1 + (N − df + 0.5)/(df + 0.5))`
 * (always ≥ 0) and the k1/b saturation form. Each term's contribution
 * floors to integer micro-units BEFORE the per-doc sum (the FP-aggregate
 * discipline every score here follows), so scores are exact under any
 * partitioning and the whole computation replays cross-engine — the
 * DuckDB oracle re-derives df/avgdl/idf from the same table and matches
 * by hash.
 *
 * 100 TB shape: one tiny corpus aggregate (N, Σdl, and one df counter per
 * query term — a single row regardless of corpus size) broadcast into a
 * narrow per-doc map; no other shuffle. Per-doc cost is
 * O(terms × words). Query terms are a handful of constants by
 * construction (a query, not a vocabulary) — for whole-vocabulary
 * weighting use the tf-idf table instead.
 */
object Bm25 {

  /** (id, dl, score_micro) for every document; `dl` is whitespace word
   *  count, `score_micro` = Σ_terms floor(1e6 · idf_t · tf·(k1+1) /
   *  (tf + k1·(1 − b + b·dl/avgdl))). */
  def score(df: DataFrame, textCol: String, idCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    require(terms == terms.distinct, "query terms must be distinct")
    val ws = TextAnalysis.wsTokens(col(textCol))
    val dl = size(ws).cast("long")

    // Corpus statistics: one row — N, Σdl, df per term. Broadcast.
    val stats = df.select(
      (Seq(lit(1L).as("__one"), dl.as("__dl")) ++
        terms.zipWithIndex.map { case (t, i) =>
          when(array_contains(ws, t), 1L).otherwise(0L).as(s"__df_$i")
        }): _*)
      .agg(sum(col("__one")).as("n_docs"),
        (sum(col("__dl")).as("sum_dl") +:
          terms.indices.map(i => sum(col(s"__df_$i")).as(s"df_$i"))): _*)

    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val norm = lit(k1) * (lit(1.0 - b) + lit(b) * dl.cast("double") / avgdl)
    val contribs = terms.zipWithIndex.map { case (t, i) =>
      val tf = size(filter(ws, w => w === t)).cast("double")
      val idf = log(lit(1.0) +
        (col("n_docs").cast("double") - col(s"df_$i").cast("double") + lit(0.5))
          / (col(s"df_$i").cast("double") + lit(0.5)))
      floor(lit(1e6) * idf * (tf * lit(k1 + 1.0)) / (tf + norm)).cast("long")
    }
    df.crossJoin(broadcast(stats))
      .select(col(idCol), dl.as("dl"),
        contribs.reduce(_ + _).as("score_micro"))
  }

  /**
   * Inverted-index top-k retrieval: the SEARCH shape of BM25, returning
   * the `k` best-scoring documents for one query instead of scoring every
   * document ([[score]] is the corpus-sweep shape — per-doc scores for
   * selection pipelines; this is the serving/eval shape — "find the k
   * docs most relevant to these terms"). Scores are bit-identical to
   * [[score]] for every returned doc: same Lucene idf, same k1/b
   * saturation, same per-term integer micro-unit floors, and a term with
   * tf = 0 contributes exactly 0 there, so summing only matched postings
   * loses nothing.
   *
   * 100 TB shape: the posting-list discipline without materializing an
   * index — tokens explode INSIDE the scan projection and the
   * query-term `isin` filter drops every non-query token before anything
   * shuffles, so the exchange carries only (id, dl, term) rows for terms
   * that are actually in the query: per-term document frequency, not
   * corpus size. Per-term df is a ≤|terms|-row broadcast; the corpus
   * (N, Σdl) row likewise; the global top-k is TakeOrdered (per-partition
   * heaps, no full sort). Ties break deterministically on (score desc,
   * id asc).
   */
  def searchTopK(df: DataFrame, textCol: String, idCol: String,
      terms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    require(terms == terms.distinct, "query terms must be distinct")
    require(k >= 1, "need k >= 1")
    val ws = TextAnalysis.wsTokens(col(textCol))
    val dl = size(ws).cast("long")

    val corpus = df.agg(count(lit(1)).as("n_docs"),
      sum(dl).as("sum_dl"))
    val postings = df
      .select(col(idCol).as("id"), dl.as("dl"), explode(ws).as("w"))
      .where(col("w").isInCollection(terms))
      .groupBy(col("id"), col("dl"), col("w"))
      .agg(count(lit(1)).as("tf"))
    val docFreq = postings.groupBy(col("w"))
      .agg(count(lit(1)).as("df"))

    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val norm = lit(k1) * (lit(1.0 - b) +
      lit(b) * col("dl").cast("double") / avgdl)
    val tf = col("tf").cast("double")
    val idf = log(lit(1.0) +
      (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5))
        / (col("df").cast("double") + lit(0.5)))
    postings
      .join(broadcast(docFreq), Seq("w"))
      .crossJoin(broadcast(corpus))
      .select(col("id"), col("dl"),
        floor(lit(1e6) * idf * (tf * lit(k1 + 1.0)) / (tf + norm))
          .cast("long").as("contrib_micro"))
      .groupBy(col("id"), col("dl"))
      .agg(sum(col("contrib_micro")).as("score_micro"))
      .orderBy(col("score_micro").desc, col("id"))
      .limit(k)
      .select(col("id").as(idCol), col("dl"), col("score_micro"))
  }

  /**
   * Multi-query inverted-index retrieval: [[searchTopK]] for a BATCH of
   * queries — (query_id, doc_id, rk) with each query's top `k` docs by
   * the identical BM25 score ([[score]]-bit-identical per returned doc).
   * The retrieval face a hybrid-search pipeline fans out before rank
   * fusion (see [[Hybrid.rrf]]).
   *
   * 100 TB shape: the postings discipline of [[searchTopK]], shared
   * across queries — tokens explode inside the scan and the UNION of all
   * query vocabularies filters them before the one postings aggregate,
   * so corpus text never shuffles and adding a query costs only its
   * matched-postings replication (the broadcast (query_id, term) join
   * multiplies matched postings by the number of queries sharing the
   * term, never by |queries|). The per-query cut is the
   * [[Similarity.cutTopK]] map-side partial top-k: ≤ k·16 B per
   * (partition × query) through the exchange, no window, no global sort
   * — [[searchTopK]]'s TakeOrdered cut generalized to the multi-query
   * axis. Queries are driver-side literals by construction (a query
   * workload, not data).
   */
  def searchAllTopK(df: DataFrame, textCol: String, idCol: String,
      queries: Seq[(Long, Seq[String])], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty, "need at least one query")
    require(queries.map(_._1) == queries.map(_._1).distinct,
      "query ids must be distinct")
    queries.foreach { case (q, ts) =>
      require(ts.nonEmpty && ts == ts.distinct,
        s"query $q: terms must be non-empty and distinct")
    }
    require(k >= 1, "need k >= 1")
    val allTerms = queries.flatMap(_._2).distinct
    val ws = TextAnalysis.wsTokens(col(textCol))
    val dl = size(ws).cast("long")

    val corpus = df.agg(count(lit(1)).as("n_docs"), sum(dl).as("sum_dl"))
    val postings = df
      .select(col(idCol).as("id"), dl.as("dl"), explode(ws).as("w"))
      .where(col("w").isInCollection(allTerms))
      .groupBy(col("id"), col("dl"), col("w"))
      .agg(count(lit(1)).as("tf"))
    val docFreq = postings.groupBy(col("w"))
      .agg(count(lit(1)).as("df"))
    val queryTerms = df.sparkSession.createDataFrame(
      queries.flatMap { case (q, ts) => ts.map(t => (q, t)) })
      .toDF("query_id", "w")

    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val norm = lit(k1) * (lit(1.0 - b) +
      lit(b) * col("dl").cast("double") / avgdl)
    val tf = col("tf").cast("double")
    val idf = log(lit(1.0) +
      (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5))
        / (col("df").cast("double") + lit(0.5)))
    val scored = postings
      .join(broadcast(docFreq), Seq("w"))
      .join(broadcast(queryTerms), Seq("w"))
      .crossJoin(broadcast(corpus))
      .select(col("query_id"), col("id"),
        floor(lit(1e6) * idf * (tf * lit(k1 + 1.0)) / (tf + norm))
          .cast("long").as("contrib_micro"))
      .groupBy(col("query_id"), col("id"))
      .agg(sum(col("contrib_micro")).as("score_micro"))
    // integer micro scores are exact in double far below 2^53, so the
    // shared (value desc, id asc) top-k cut applies unchanged
    Similarity.cutTopK(
      scored.select(col("query_id"), col("id").as("neighbor_id"),
        col("score_micro").cast("double").as("cos")), k)
      .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rk"))
  }

  /**
   * Conjunctive (boolean-AND) retrieval: documents containing EVERY query
   * term — the filter-shaped companion to [[searchTopK]]'s ranked OR
   * (search engines run the conjunctive pass first and rank inside it).
   * Same scale discipline: the query-term `isin` filter drops non-query
   * tokens INSIDE the scan projection, so the one exchange carries at
   * most |terms| distinct rows per matching document, never corpus
   * volume; the ALL-terms check is a per-doc distinct-count equality —
   * integer, engine-portable.
   *
   * Output: (idCol, n_hits) where n_hits = total occurrences of query
   * terms in the doc (a cheap relevance proxy the caller can sort by).
   */
  def searchAnd(df: DataFrame, textCol: String, idCol: String,
      terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    require(terms == terms.distinct, "query terms must be distinct")
    val ws = TextAnalysis.wsTokens(col(textCol))
    df.select(col(idCol).as("id"), explode(ws).as("w"))
      .where(col("w").isInCollection(terms))
      .groupBy(col("id"))
      .agg(countDistinct(col("w")).as("n_terms"),
        count(lit(1)).as("n_hits"))
      .where(col("n_terms") === terms.size.toLong)
      .select(col("id").as(idCol), col("n_hits"))
  }
}
