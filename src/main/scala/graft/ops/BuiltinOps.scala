package graft.ops

import graft.operators.{Dedup, GlobalSequence, Sessionize, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * The built-in lens-op library. Each entry is the declarative, Catalyst-
 * optimizable equivalent of one of the reference's canonical WASM test
 * modules (the only concrete transform semantics the reference defines —
 * see SURVEY.md §2.3), plus general-purpose projection/filter ops.
 *
 * Registered under `builtin:<name>` paths; the registry is the analogue of
 * the reference's module cache by path
 * (reference: host-go/config/config.go:70-82).
 */
object BuiltinOps {

  /** name -> factory. A factory is cheap; any expensive op state belongs in
   *  lazy executor-side singletons (the reference amortizes instantiation
   *  with pools instead — host-go/repository/repository.go:281-330). */
  val registry: Map[String, Args => LensOp] = Map(
    "identity" -> (_ => LensOp.identity),

    // T1/T4 — rename, parameterized (reference:
    // tests/modules/rust_wasm32_rename/src/lib.rs:31-63). Invertible by
    // swapping src/dst. Errors on a missing source column like the module
    // errors on a missing document key.
    "rename" -> { a =>
      val (src, dst) = (a.str("src"), a.str("dst"))
      def doRename(from: String, to: String)(df: DataFrame): DataFrame = {
        require(df.columns.contains(from),
          s"The requested property was not found: '$from'")
        df.withColumnRenamed(from, to)
      }
      LensOp.invertible(s"rename($src->$dst)", doRename(src, dst), doRename(dst, src))
    },

    // General projection (lossy — no inverse, like a module without an
    // `inverse` export).
    "select" -> { a =>
      val cols = a.strList("cols")
      LensOp(s"select(${cols.mkString(",")})", df => df.select(cols.map(col): _*))
    },

    "drop" -> { a =>
      val cols = a.strList("cols")
      LensOp(s"drop(${cols.mkString(",")})", df => df.drop(cols: _*))
    },

    // SQL-expression projection; `exprs` are `SELECT`-list items.
    "select_expr" -> { a =>
      val exprs = a.strList("exprs")
      LensOp("select_expr", df => df.selectExpr(exprs: _*))
    },

    // T2/T3 — computed column (reference:
    // tests/modules/rust_wasm32_simple2/src/lib.rs:19-57 — age+1 with
    // inverse age-1). Invertible iff the caller supplies `inverse_expr`,
    // mirroring the optional `inverse` export.
    "with_column" -> { a =>
      val c = a.str("col")
      val fwdExpr = a.str("expr")
      def set(e: String)(df: DataFrame): DataFrame = df.withColumn(c, expr(e))
      a.strOpt("inverse_expr") match {
        case Some(inv) => LensOp.invertible(s"with_column($c=$fwdExpr)", set(fwdExpr), set(inv))
        case None      => LensOp(s"with_column($c=$fwdExpr)", set(fwdExpr))
      }
    },

    "cast" -> { a =>
      val (c, to) = (a.str("col"), a.str("to"))
      LensOp(s"cast($c as $to)", df => df.withColumn(c, col(c).cast(to)))
    },

    // T5 — filter (reference: tests/modules/rust_wasm32_filter/src/lib.rs:17-32,
    // consume-many/yield-one pull loop). Declarative predicate ⇒ Catalyst
    // pushes it into the scan. Lossy ⇒ no inverse.
    "filter" -> { a =>
      val p = a.str("expr")
      LensOp(s"filter($p)", df => df.filter(expr(p)))
    },

    // T6 — normalize / 1:N explode (reference:
    // tests/modules/rust_wasm32_normalize/src/lib.rs:22-78 — Book{Name,
    // PageNumbers[]} → Page{BookName, Number} via a pending queue; ours is
    // the generator expression, no buffering). Lossy ⇒ no inverse; see
    // `collect_group` for the (order-lossy) aggregate converse.
    "explode" -> { a =>
      val (c, as) = (a.str("col"), a.str("as"))
      LensOp(s"explode($c as $as)",
        df => df.withColumn(as, explode(col(c))).drop(c))
    },

    // Converse of explode: group by all other columns, collect the rest.
    // Set-level: a hidden host column would make every group a singleton.
    "collect_group" -> { a =>
      val (c, as) = (a.str("col"), a.str("as"))
      LensOp.setLevel(s"collect_group($c as $as)", { df =>
        val keys = df.columns.filterNot(_ == c).map(col).toSeq
        df.groupBy(keys: _*).agg(collect_list(col(c)).as(as))
      })
    },

    // T7 — stateful counter (reference:
    // tests/modules/rust_wasm32_counter/src/lib.rs:26-54). `order_by` gives
    // the deterministic contiguous sequence via the scalable two-pass
    // range-partition scheme (see GlobalSequence); without it you get the
    // one-pass unique-id variant (order = partition order, documented
    // non-deterministic — exactly as order-dependent as the reference's
    // single-threaded counter would be under parallelism).
    "counter" -> { a =>
      val as = a.strOpt("as").getOrElse("Id")
      a.strOpt("order_by") match {
        case Some(k) => LensOp(s"counter($as by $k)",
          df => GlobalSequence.withSequentialId(df, col(k), as))
        case None => LensOp(s"counter($as)",
          df => GlobalSequence.withUniqueId(df, as))
      }
    },

    // T8 — memory-stress identity (reference:
    // tests/modules/rust_wasm32_memory/src/lib.rs:42-60 — clones the item
    // 1000× then yields it unchanged; a leak detector for the WASM runtime,
    // moot on the JVM). Kept as a named identity so reference lens files
    // resolve.
    "memory" -> (_ => LensOp.invertible("memory", df => df, df => df)),

    // Set-level: a hidden host column would make every row unique.
    "distinct" -> (_ => LensOp.setLevel("distinct", df => df.distinct())),

    "limit" -> { a =>
      val n = a.int("n")
      LensOp(s"limit($n)", df => df.limit(n))
    },

    // Per-key gaps-and-islands sessionization (SURVEY.md §2.6).
    "sessionize" -> { a =>
      val (key, ts) = (a.str("key"), a.str("ts"))
      val gap = a.str("gap").toLong
      val tie = a.strOpt("tie").getOrElse(ts)
      LensOp(s"sessionize($key, gap=$gap)",
        df => Sessionize.assign(df, key, ts, gap, tie))
    },

    // Per-session ordered event paths (Sessionize.sequences): sessionize
    // then join the step column in (ts, tie) order per session — the
    // episode construction, one lens stage.
    "session_paths" -> { a =>
      val (key, ts) = (a.str("key"), a.str("ts"))
      val gap = a.str("gap").toLong
      val tie = a.strOpt("tie").getOrElse(ts)
      val step = a.str("step")
      val sep = a.strOpt("sep").getOrElse(">")
      LensOp.setLevel(s"session_paths($key, gap=$gap, step=$step)",
        df => Sessionize.sequences(
          Sessionize.assign(df, key, ts, gap, tie), key, ts, tie, step, sep))
    },

    // Ordered-sequence funnel over an event log (SURVEY.md §2.5):
    // mode=report (default) emits (stage, n_users); mode=users emits
    // per-user first-touch times; optional conversion window in the ts
    // column's units.
    "funnel" -> { a =>
      val (user, ts, typ) = (a.str("user"), a.str("ts"), a.str("type"))
      val stages = a.str("stages").split(",").map(_.trim).filter(_.nonEmpty).toSeq
      val window = a.strOpt("window").map(_.toLong)
      val mode = a.strOpt("mode").getOrElse("report")
      LensOp(s"funnel(${stages.mkString(">")}${window.fold("")(w => s", w=$w")}, $mode)",
        df => mode match {
          case "users" =>
            graft.operators.Funnel.userStages(df, user, ts, typ, stages, window)
          case _ =>
            graft.operators.Funnel.report(df, user, ts, typ, stages, window)
        })
    },

    // Deterministic per-group sampling: k smallest xxhash64(id, salt).
    "sample_group" -> { a =>
      val (group, id) = (a.str("group"), a.str("id"))
      val k = a.int("k")
      val salt = a.intOpt("salt").getOrElse(42)
      LensOp(s"sample_group($group, k=$k)",
        df => graft.operators.Sampling.perGroup(df, group, id, k, salt))
    },

    // ---- Dedup lens ops (SURVEY.md §2.6): the large-scale operators as
    // pipeline stages, so a lens file alone drives a dedup run.
    "dedup_exact" -> { a =>
      val (t, id) = (a.strOpt("text").getOrElse("text"),
        a.strOpt("id").getOrElse("doc_id"))
      // hash128: independent second hash chain for ≥10⁹-doc corpora
      // (see Dedup.contentKey) — same output schema, +8 bytes/row shuffle.
      val h128 = a.bool("hash128")
      LensOp(s"dedup_exact($t${if (h128) ", hash128" else ""})",
        df => Dedup.exact(df, t, id, h128))
    },

    "dedup_minhash" -> { a =>
      val (t, id) = (a.strOpt("text").getOrElse("text"),
        a.strOpt("id").getOrElse("doc_id"))
      val thr = a.doubleOpt("threshold").getOrElse(0.8)
      LensOp(s"dedup_minhash($t>=$thr)", df => Dedup.minHashLsh(df, t, id, thr))
    },

    "dedup_simhash" -> { a =>
      val (t, id) = (a.strOpt("text").getOrElse("text"),
        a.strOpt("id").getOrElse("doc_id"))
      val ham = a.intOpt("max_hamming").getOrElse(3)
      LensOp(s"dedup_simhash($t<=$ham)", df => Dedup.simHash(df, t, id, ham))
    },

    // Per-key integer EWMA over event time (Anomaly.ewmaByKey): the
    // trend-smoothing monitor.
    "ewma" -> { a =>
      val key = a.strOpt("key").getOrElse("user_id")
      val ts = a.strOpt("ts").getOrElse("ts_us")
      val v = a.strOpt("value").getOrElse("value")
      val id = a.strOpt("id").getOrElse("event_id")
      val num = a.intOpt("num").getOrElse(1).toLong
      val den = a.intOpt("den").getOrElse(4).toLong
      val scale = a.intOpt("scale").getOrElse(100).toLong
      LensOp.setLevel(s"ewma($v by $key, $num/$den)",
        df => graft.operators.Anomaly.ewmaByKey(df, key, ts, v, num, den,
          id, scale))
    },

    // Incremental cluster-map maintenance (Clusters.addEdges): fold the
    // incoming batch of duplicate pairs into a persisted cluster map.
    "cluster_update" -> { a =>
      val mapTable = a.str("map_table")
      val ac = a.strOpt("a").getOrElse("doc_a")
      val bc = a.strOpt("b").getOrElse("doc_b")
      LensOp.setLevel(s"cluster_update(map=$mapTable)",
        df => graft.operators.Clusters.addEdges(
          df.sparkSession.table(mapTable), df, ac, bc))
    },

    // Directed n-gram containment (Dedup.ngramContainment): the
    // asymmetric near-dup relation — truncations, quotes, wrapped copies.
    "dedup_containment" -> { a =>
      val (t, id) = (a.strOpt("text").getOrElse("text"),
        a.strOpt("id").getOrElse("doc_id"))
      val block = a.str("block")
      val tBp = a.intOpt("t_bp").getOrElse(9000).toLong
      val n = a.intOpt("n").getOrElse(3)
      LensOp(s"dedup_containment($t>=${tBp}bp)",
        df => Dedup.ngramContainment(df, t, id, block, tBp, n))
    },

    "similar_pairs" -> { a =>
      val (v, id) = (a.strOpt("vec").getOrElse("embedding"),
        a.strOpt("id").getOrElse("vec_id"))
      val block = a.str("block")
      val thr = a.double("threshold")
      LensOp(s"similar_pairs($v>=$thr)",
        df => Dedup.embeddingCosine(df, v, id, block, thr))
    },

    // ---- Text-analysis lens ops (SURVEY.md §2.6 north-star additions).
    // Pure Column expressions — stay inside whole-stage codegen; lossy
    // projections ⇒ no inverse (like a module without an `inverse` export).
    // HTML -> text extraction, the stage-zero of every published web
    // curation recipe (rule set: graft.operators.Html Scaladoc). Row-
    // level, zero shuffle.
    "html_extract" -> { a =>
      val in = a.strOpt("col").getOrElse("html")
      val out = a.strOpt("out").getOrElse("text")
      LensOp(s"html_extract($in)", df => df.withColumn(out,
        org.apache.spark.sql.graft.HtmlText.extract(col(in))))
    },

    // Main-content (boilerplate-aware) extraction — the tier RefinedWeb/
    // FineWeb run instead of a bare tag-strip (rule set:
    // graft.operators.Html.mainContent Scaladoc). Row-level, zero shuffle.
    "html_main" -> { a =>
      val in = a.strOpt("col").getOrElse("html")
      val out = a.strOpt("out").getOrElse("text")
      val minWords = a.intOpt("min_words").getOrElse(10)
      val linkPpm = a.intOpt("max_link_ppm").getOrElse(330000)
      LensOp(s"html_main($in)", df => df.withColumn(out,
        org.apache.spark.sql.graft.HtmlText.mainContent(col(in), minWords,
          linkPpm)))
    },

    // URL canonicalization (rule set: graft.operators.Urls Scaladoc) —
    // the identity key for crawl dedup / host quotas. Row-level.
    "url_canon" -> { a =>
      val in = a.strOpt("col").getOrElse("url")
      val out = a.strOpt("out").getOrElse(in)
      LensOp(s"url_canon($in)", df => df.withColumn(out,
        org.apache.spark.sql.graft.Url.canonicalize(col(in))))
    },

    "token_count" -> { a =>
      val (t, id) = (a.strOpt("text").getOrElse("text"),
        a.strOpt("id").getOrElse("doc_id"))
      LensOp(s"token_count($t)", df => TextAnalysis.tokenCounts(df, t, id))
    },

    // Gopher-style published heuristic filter set (Rae et al. 2021 App. A).
    "gopher_rules" -> { a =>
      val (t, id) = (a.strOpt("text").getOrElse("text"),
        a.strOpt("id").getOrElse("doc_id"))
      val minW = a.intOpt("min_words").getOrElse(10)
      val maxW = a.intOpt("max_words").getOrElse(100000)
      LensOp(s"gopher_rules($t)",
        df => TextAnalysis.gopherRules(df, t, id, minW, maxW))
    },

    // C4-style line-level cleaning (C4Clean.clean — Raffel et al. 2020).
    // Row-level projection: emits per-doc kept-line stats + clean_text +
    // c4_pass; compose with a downstream filter/select to drop.
    "c4_clean" -> { a =>
      val (t, id) = (a.strOpt("text").getOrElse("text"),
        a.strOpt("id").getOrElse("doc_id"))
      val minW = a.intOpt("min_line_words").getOrElse(3)
      val minL = a.intOpt("min_kept_lines").getOrElse(5)
      val punct = a.strOpt("terminal_punct").forall(_ != "false")
      val keep = a.strListOpt("keep").getOrElse(Nil)
      LensOp(s"c4_clean($t)",
        df => graft.operators.C4Clean.clean(df, t, id, minW, minL, punct, keep))
    },

    // CCNet paragraph-LM scoring / corpus partitioning (Ccnet — Wenzek
    // et al. 2020). Both set-level: scores explode to paragraphs, the
    // partition's buckets depend on the whole corpus.
    "ccnet_score" -> { a =>
      val (t, id) = (a.strOpt("text").getOrElse("text"),
        a.strOpt("id").getOrElse("doc_id"))
      val sep = a.strOpt("sep").getOrElse("\n")
      LensOp.setLevel(s"ccnet_score($t)",
        df => graft.operators.Ccnet.paragraphScores(df, t, id, sep))
    },

    "ccnet_partition" -> { a =>
      val (t, id) = (a.strOpt("text").getOrElse("text"),
        a.strOpt("id").getOrElse("doc_id"))
      val k = a.intOpt("k").getOrElse(3)
      val sep = a.strOpt("sep").getOrElse("\n")
      LensOp.setLevel(s"ccnet_partition($t, k=$k)",
        df => graft.operators.Ccnet.partition(df, t, id, k, sep))
    },

    // Intra-document repeated-line removal (TextAnalysis.dedupLines —
    // the RefinedWeb within-page rule). Row-level narrow map.
    "dedup_lines" -> { a =>
      val (t, id) = (a.strOpt("text").getOrElse("text"),
        a.strOpt("id").getOrElse("doc_id"))
      val sep = a.strOpt("sep").getOrElse("\n")
      LensOp(s"dedup_lines($t)",
        df => TextAnalysis.dedupLines(df, t, id, sep))
    },

    // Incremental snapshot ingest (Dedup.incrementalNew): two-input via
    // the catalog — the already-ingested corpus resolves by name; the
    // stream is the new dump. Survivors keep their full payload.
    "incremental_new" -> { a =>
      val (t, id) = (a.strOpt("text").getOrElse("text"),
        a.strOpt("id").getOrElse("doc_id"))
      val corpusTable = a.str("corpus_table")
      val bloomItems = a.intOpt("bloom_items").getOrElse(0)
      LensOp.setLevel(s"incremental_new(corpus=$corpusTable)",
        df => Dedup.incrementalNew(df, df.sparkSession.table(corpusTable),
          t, id, bloomExpectedItems = bloomItems.toLong))
    },

    // Snapshot diff (Dedup.snapshotDiff): the stream is the NEW snapshot,
    // the old one resolves from the catalog; emits (id, status).
    "snapshot_diff" -> { a =>
      val (t, id) = (a.strOpt("text").getOrElse("text"),
        a.strOpt("id").getOrElse("doc_id"))
      val oldTable = a.str("old_table")
      LensOp.setLevel(s"snapshot_diff(old=$oldTable)",
        df => Dedup.snapshotDiff(df.sparkSession.table(oldTable), df, id, t))
    },

    // Inverted-index BM25 retrieval (Bm25.searchTopK): top-k docs for a
    // fixed term list; only query-term postings shuffle.
    "search_topk" -> { a =>
      val (t, id) = (a.strOpt("text").getOrElse("text"),
        a.strOpt("id").getOrElse("doc_id"))
      val terms = a.strList("terms")
      val k = a.intOpt("k").getOrElse(10)
      LensOp.setLevel(s"search_topk(${terms.mkString("+")}, k=$k)",
        df => graft.operators.Bm25.searchTopK(df, t, id, terms, k))
    },

    // Conjunctive retrieval (Bm25.searchAnd): docs containing every term.
    "search_and" -> { a =>
      val (t, id) = (a.strOpt("text").getOrElse("text"),
        a.strOpt("id").getOrElse("doc_id"))
      val terms = a.strList("terms")
      LensOp.setLevel(s"search_and(${terms.mkString("&")})",
        df => graft.operators.Bm25.searchAnd(df, t, id, terms))
    },

    // Vocabulary-growth monitor (TextAnalysis.vocabGrowth).
    "vocab_growth" -> { a =>
      val (t, id) = (a.strOpt("text").getOrElse("text"),
        a.strOpt("id").getOrElse("doc_id"))
      val batch = a.intOpt("batch").getOrElse(50).toLong
      LensOp.setLevel(s"vocab_growth(batch=$batch)",
        df => TextAnalysis.vocabGrowth(df, t, id, batch))
    },

    // Per-group corpus drift (TextAnalysis.sourceDivergence): unigram
    // KL(group ‖ corpus) in integer micro-nats, one row per group.
    "divergence" -> { a =>
      val t = a.strOpt("text").getOrElse("text")
      val group = a.strOpt("group").getOrElse("source")
      LensOp.setLevel(s"divergence($group)",
        df => TextAnalysis.sourceDivergence(df, t, group))
    },

    // Nearest-centroid label confusion (EmbeddingQa.confusion): the
    // labeled-corpus sanity audit, integer-exact end to end.
    "label_confusion" -> { a =>
      val vec = a.strOpt("vec").getOrElse("embedding")
      val id = a.strOpt("id").getOrElse("vec_id")
      val label = a.strOpt("label").getOrElse("label")
      LensOp.setLevel(s"label_confusion($label by $vec)",
        df => graft.operators.EmbeddingQa.confusion(df, vec, id, label))
    },

    // PMI collocations (TextAnalysis.collocations): top-k adjacent pairs
    // by pointwise mutual information in integer micro-nats.
    "collocations" -> { a =>
      val t = a.strOpt("text").getOrElse("text")
      val minCount = a.intOpt("min_count").getOrElse(5).toLong
      val k = a.intOpt("k").getOrElse(100)
      LensOp.setLevel(s"collocations(min=$minCount, k=$k)",
        df => TextAnalysis.collocations(df, t, minCount, k))
    },

    // df-capped TF-IDF all-pairs cosine (TextAnalysis.tfidfCosinePairs):
    // similar-document pairs without embeddings, cos² in basis points.
    "tfidf_pairs" -> { a =>
      val (t, id) = (a.strOpt("text").getOrElse("text"),
        a.strOpt("id").getOrElse("doc_id"))
      val ppm = a.intOpt("df_cap_ppm").getOrElse(790000).toLong
      val minBp = a.intOpt("min_cos2_bp").getOrElse(7000).toLong
      LensOp.setLevel(s"tfidf_pairs(cap=${ppm}ppm, tau2=${minBp}bp)",
        df => TextAnalysis.tfidfCosinePairs(df, t, id, ppm, minBp))
    },

    // Trained multinomial NB classifier (TextAnalysis.nbClassify): fit on
    // a labeled catalog view, argmax-classify the incoming rows.
    "nb_classify" -> { a =>
      val (t, id) = (a.strOpt("text").getOrElse("text"),
        a.strOpt("id").getOrElse("doc_id"))
      val trainTable = a.str("train_table")
      val label = a.strOpt("label").getOrElse("lang")
      LensOp.setLevel(s"nb_classify(train=$trainTable, label=$label)",
        df => TextAnalysis.nbClassify(
          df.sparkSession.table(trainTable), df, t, id, label))
    },

    // Deterministic contrastive negatives (Contrastive.negatives): k
    // mixer-picked negatives per anchor over the rank space.
    "negatives" -> { a =>
      val id = a.strOpt("id").getOrElse("vec_id")
      val k = a.intOpt("k").getOrElse(4)
      LensOp.setLevel(s"negatives(k=$k)",
        df => graft.operators.Contrastive.negatives(df, id, k))
    },

    // Multi-signal rank-ensemble (Ensemble.rankSum): attach rank_sum over
    // the named signal columns (all higher-is-better). The stream keeps
    // its payload; ranks ride an id-keyed join.
    "rank_ensemble" -> { a =>
      val id = a.strOpt("id").getOrElse("doc_id")
      val sigs = a.strList("signals")
      LensOp.setLevel(s"rank_ensemble(${sigs.mkString("+")})",
        df => df.join(
          graft.operators.Ensemble.rankSum(df, id, sigs)
            .select(col(id), col("rank_sum")),
          Seq(id)))
    },

    // Cluster-balanced diversity downsampling (Sampling.clusterBalanced):
    // trains a k-cell quantizer on the stream, thins dense cells toward
    // `target` surviving rows. Two driver-visible phases by nature (the
    // sampling plan needs the finished centroids — Bloom-build
    // discipline).
    "cluster_balance" -> { a =>
      val (vec, id) = (a.strOpt("vec").getOrElse("embedding"),
        a.strOpt("id").getOrElse("vec_id"))
      val k = a.intOpt("k").getOrElse(16)
      val target = a.intOpt("target").getOrElse(100)
      LensOp.setLevel(s"cluster_balance(k=$k, target=$target)",
        df => {
          val cents = graft.operators.Kmeans.train(df, vec, id, k, iters = 3)
          graft.operators.Sampling.clusterBalanced(df, vec, id, cents,
            target.toLong)
        })
    },

    // Z-order clustering layout (Layout.zorderLayout): emits (id, zval,
    // pos) — the two-dimensional write order; callers join it back or
    // repartitionByRange(pos) before writing.
    "zorder" -> { a =>
      val id = a.str("id")
      val (da, db) = (a.str("dim_a"), a.str("dim_b"))
      LensOp.setLevel(s"zorder($da x $db)",
        df => graft.operators.Layout.zorderLayout(df, id, da, db))
    },

    // Count-min-sketch heavy hitters (TextAnalysis.heavyHitters): tokens
    // at >= `min_ppm` parts-per-million of the corpus, sketch-estimated.
    "heavy_hitters" -> { a =>
      val t = a.strOpt("text").getOrElse("text")
      val ppm = a.intOpt("min_ppm").getOrElse(1000).toLong
      LensOp.setLevel(s"heavy_hitters($t >= ${ppm}ppm)",
        df => graft.operators.TextAnalysis.heavyHitters(df, t, ppm))
    },

    // Integer-exact z-score outliers (Anomaly.zscoreOutliers): appends
    // value_int + is_outlier per row; stats broadcast, rows never shuffle.
    "outliers" -> { a =>
      val v = a.strOpt("value").getOrElse("value")
      val g = a.strOpt("group").getOrElse("event_type")
      val kNum = a.intOpt("k_num").getOrElse(3).toLong
      val kDen = a.intOpt("k_den").getOrElse(1).toLong
      val scale = a.intOpt("scale").getOrElse(1000).toLong
      LensOp.setLevel(s"outliers($v by $g, k=$kNum/$kDen)",
        df => graft.operators.Anomaly.zscoreOutliers(df, v, g, kNum, kDen, scale))
    },

    // Robust median/MAD outliers (Anomaly.madOutliers): modified z-score
    // over order statistics — exact, no FP clearing.
    "mad_outliers" -> { a =>
      val v = a.strOpt("value").getOrElse("value")
      val g = a.strOpt("group").getOrElse("event_type")
      val kNum = a.intOpt("k_num").getOrElse(7000).toLong
      val kDen = a.intOpt("k_den").getOrElse(1349).toLong
      val scale = a.intOpt("scale").getOrElse(1000).toLong
      LensOp.setLevel(s"mad_outliers($v by $g)",
        df => graft.operators.Anomaly.madOutliers(df, v, g, kNum, kDen, scale))
    },

    // Volume-spike detection (Anomaly.volumeSpikes): (group, bucket)
    // counts each z-tested against the group's own bucket history.
    "volume_spikes" -> { a =>
      val ts = a.strOpt("ts").getOrElse("ts_us")
      val g = a.strOpt("group").getOrElse("event_type")
      val bucketUs = a.strOpt("bucket_us").getOrElse("86400000000").toLong
      val kNum = a.intOpt("k_num").getOrElse(5).toLong
      val kDen = a.intOpt("k_den").getOrElse(2).toLong
      LensOp.setLevel(s"volume_spikes($g / ${bucketUs}us)",
        df => graft.operators.Anomaly.volumeSpikes(df, ts, g, bucketUs, kNum, kDen))
    },

    // Embedding-level decontamination (Dedup.embeddingAgainst): the
    // reference (eval) set resolves from the catalog and broadcasts;
    // emits flagged (vec_id, ref_id) pairs.
    "embed_contam" -> { a =>
      val (vec, id) = (a.strOpt("vec").getOrElse("embedding"),
        a.strOpt("id").getOrElse("vec_id"))
      val refTable = a.str("ref_table")
      val threshold = a.doubleOpt("threshold").getOrElse(0.4)
      LensOp.setLevel(s"embed_contam(ref=$refTable, t=$threshold)",
        df => Dedup.embeddingAgainst(df, df.sparkSession.table(refTable),
          vec, id, threshold))
    },

    // Perceptual image hash (Multimodal.imagePhash): payload column →
    // (doc, simhash) signature table, ready for simhash search/blocking.
    "phash" -> { a =>
      val payload = a.strOpt("payload").getOrElse("payload")
      val id = a.strOpt("id").getOrElse("doc_id")
      LensOp(s"phash($payload)",
        df => graft.operators.Multimodal.imagePhash(df, payload, id))
    },

    // PageRank over an edge table (Pagerank.run): the rows ARE the edges;
    // emits (node_id, pr_nano) after `iters` integer power iterations.
    "pagerank" -> { a =>
      val src = a.strOpt("src").getOrElse("src")
      val dst = a.strOpt("dst").getOrElse("dst")
      val iters = a.intOpt("iters").getOrElse(5)
      LensOp.setLevel(s"pagerank($src->$dst, iters=$iters)",
        df => graft.operators.Pagerank.run(df, src, dst, iters))
    },

    // Weighted PageRank (Pagerank.runWeighted): rank splits proportional
    // to positive integer edge weights.
    "pagerank_weighted" -> { a =>
      val src = a.strOpt("src").getOrElse("src")
      val dst = a.strOpt("dst").getOrElse("dst")
      val w = a.strOpt("w").getOrElse("w")
      val iters = a.intOpt("iters").getOrElse(5)
      LensOp.setLevel(s"pagerank_weighted($src->$dst by $w, iters=$iters)",
        df => graft.operators.Pagerank.runWeighted(df, src, dst, w, iters))
    },

    // Key-skew profile (Sampling.keySkew): top-k keys + global
    // concentration numbers, the pre-join partitioning audit.
    "key_skew" -> { a =>
      val key = a.str("key")
      val k = a.intOpt("k").getOrElse(20)
      LensOp.setLevel(s"key_skew($key, k=$k)",
        df => graft.operators.Sampling.keySkew(df, key, k))
    },

    // Personalized PageRank (Pagerank.personalized): teleport + dangling
    // mass restricted to a seed-node catalog view — TrustRank-style
    // quality propagation from a vetted seed list.
    "ppr" -> { a =>
      val src = a.strOpt("src").getOrElse("src")
      val dst = a.strOpt("dst").getOrElse("dst")
      val iters = a.intOpt("iters").getOrElse(5)
      val seedTable = a.str("seed_table")
      val seedCol = a.strOpt("seed_col").getOrElse("node_id")
      LensOp.setLevel(s"ppr($src->$dst, seeds=$seedTable, iters=$iters)",
        df => graft.operators.Pagerank.personalized(df, src, dst,
          df.sparkSession.table(seedTable), seedCol, iters))
    },

    // HITS hubs/authorities (Hits.run): the topic-local link-quality
    // signal next to pagerank.
    "hits" -> { a =>
      val src = a.strOpt("src").getOrElse("src")
      val dst = a.strOpt("dst").getOrElse("dst")
      val iters = a.intOpt("iters").getOrElse(5)
      LensOp.setLevel(s"hits($src->$dst, iters=$iters)",
        df => graft.operators.Hits.run(df, src, dst, iters))
    },

    // Exact per-node triangle counts (Graphs.triangleCounts): degree-
    // oriented wedge closure over an undirected edge stream.
    "triangles" -> { a =>
      val u = a.strOpt("a").orElse(a.strOpt("u")).getOrElse("u")
      val v = a.strOpt("b").orElse(a.strOpt("v")).getOrElse("v")
      LensOp.setLevel(s"triangles($u-$v)",
        df => graft.operators.Graphs.triangleCounts(df, u, v))
    },

    // k-core peeling (Graphs.kCore): dense-backbone membership after a
    // fixed number of minimum-degree peel rounds.
    "kcore" -> { a =>
      val u = a.strOpt("a").orElse(a.strOpt("u")).getOrElse("u")
      val v = a.strOpt("b").orElse(a.strOpt("v")).getOrElse("v")
      val k = a.intOpt("k").getOrElse(3)
      val rounds = a.intOpt("rounds").getOrElse(5)
      LensOp.setLevel(s"kcore($u-$v, k=$k, rounds=$rounds)",
        df => graft.operators.Graphs.kCore(df, u, v, k, rounds))
    },

    // Multi-source BFS (Graphs.bfsDistances): hop distance from a
    // seed-node catalog view, bounded at max_hops.
    "bfs" -> { a =>
      val u = a.strOpt("a").orElse(a.strOpt("u")).getOrElse("u")
      val v = a.strOpt("b").orElse(a.strOpt("v")).getOrElse("v")
      val seedTable = a.str("seed_table")
      val seedCol = a.strOpt("seed_col").getOrElse("node_id")
      val hops = a.intOpt("max_hops").getOrElse(3)
      LensOp.setLevel(s"bfs($u-$v, seeds=$seedTable, hops=$hops)",
        df => graft.operators.Graphs.bfsDistances(df, u, v,
          df.sparkSession.table(seedTable), seedCol, hops))
    },

    // Link prediction (Graphs.linkPrediction): top-k non-adjacent pairs
    // by (common neighbors, preferential attachment); hub centers above
    // max_center_degree are dropped from wedge enumeration, the rest
    // enumerate through salt-bucketed sub-cells.
    "link_predict" -> { a =>
      val u = a.strOpt("a").orElse(a.strOpt("u")).getOrElse("u")
      val v = a.strOpt("b").orElse(a.strOpt("v")).getOrElse("v")
      val k = a.intOpt("k").getOrElse(100)
      val maxC = a.intOpt("max_center_degree").map(_.toLong)
        .getOrElse(Long.MaxValue)
      val salt = a.intOpt("salt").getOrElse(8)
      LensOp.setLevel(s"link_predict($u-$v, k=$k)",
        df => graft.operators.Graphs.linkPrediction(df, u, v, k, maxC, salt))
    },

    // Deterministic sync label propagation (Graphs.labelPropagation):
    // weighted-majority communities with fixed rounds + tie-break.
    "label_prop" -> { a =>
      // endpoint args accept a/b (the graph-family convention) or u/v
      val u = a.strOpt("a").orElse(a.strOpt("u")).getOrElse("u")
      val v = a.strOpt("b").orElse(a.strOpt("v")).getOrElse("v")
      val w = a.strOpt("w").getOrElse("w")
      val iters = a.intOpt("iters").getOrElse(3)
      LensOp.setLevel(s"label_prop($u-$v, iters=$iters)",
        df => graft.operators.Graphs.labelPropagation(df, u, v, w, iters))
    },

    // Co-occurrence graph projection (Graphs.cooccurrenceEdges): entities
    // sharing >= min_weight distinct cells become a weighted edge; cells
    // with > max_cell entities are dropped, the rest pair through
    // salt-bucketed sub-cells.
    "cooccur_edges" -> { a =>
      val id = a.str("id")
      val cells = a.strList("cells")
      val minW = a.intOpt("min_weight").getOrElse(1).toLong
      val maxCell = a.intOpt("max_cell").map(_.toLong)
        .getOrElse(Long.MaxValue)
      val salt = a.intOpt("salt").getOrElse(8)
      LensOp.setLevel(s"cooccur_edges($id by ${cells.mkString(",")})",
        df => graft.operators.Graphs.cooccurrenceEdges(df, id, cells, minW,
          maxCell, salt))
    },

    // Exact per-group winsorization (Anomaly.winsorize): clip values into
    // the group's [pLo, pHi] order-statistic band.
    "winsorize" -> { a =>
      val v = a.strOpt("value").getOrElse("value")
      val id = a.strOpt("id").getOrElse("event_id")
      val g = a.strOpt("group").getOrElse("event_type")
      val lo = a.intOpt("p_lo_ppm").getOrElse(10000).toLong
      val hi = a.intOpt("p_hi_ppm").getOrElse(990000).toLong
      val scale = a.intOpt("scale").getOrElse(1000).toLong
      LensOp.setLevel(s"winsorize($v by $g, [$lo,$hi]ppm)",
        df => graft.operators.Anomaly.winsorize(df, v, id, g, lo, hi, scale))
    },

    // Exact per-group multi-quantile report (Anomaly.quantileReport):
    // order-statistic P50/P95/P99-style columns per group.
    "quantiles" -> { a =>
      val v = a.strOpt("value").getOrElse("value")
      val id = a.strOpt("id").getOrElse("event_id")
      val g = a.strOpt("group").getOrElse("event_type")
      val ppms = a.strListOpt("ppms")
        .map(_.map(_.toLong)).getOrElse(Seq(500000L, 950000L, 990000L))
      val scale = a.intOpt("scale").getOrElse(1000).toLong
      LensOp.setLevel(s"quantiles($v by $g)",
        df => graft.operators.Anomaly.quantileReport(df, v, id, g, ppms, scale))
    },

    // C4 bad-words page screen (TextAnalysis.blocklistScreen): exact
    // whole-token blocklist hits + keep verdict.
    "blocklist" -> { a =>
      val (t, id) = (a.strOpt("text").getOrElse("text"),
        a.strOpt("id").getOrElse("doc_id"))
      val terms = a.strList("terms")
      LensOp(s"blocklist(${terms.size} terms)",
        df => graft.operators.TextAnalysis.blocklistScreen(df, t, id, terms))
    },

    // Substring (phrase-aware) blocklist screen
    // (TextAnalysis.substringScreen): the C4 rule at its published
    // substring semantics — one Aho–Corasick pass per document.
    "substring_screen" -> { a =>
      val (t, id) = (a.strOpt("text").getOrElse("text"),
        a.strOpt("id").getOrElse("doc_id"))
      val pats = a.strList("patterns")
      LensOp(s"substring_screen(${pats.size} patterns)",
        df => graft.operators.TextAnalysis.substringScreen(df, t, id, pats))
    },

    // JL ±1 random projection (Similarity.randomProject): dimension cut
    // to d_out integer components, mixer-derived signs, long format.
    "random_proj" -> { a =>
      val (vec, id) = (a.strOpt("vec").getOrElse("embedding"),
        a.strOpt("id").getOrElse("vec_id"))
      val dOut = a.intOpt("d_out").getOrElse(16)
      val scale = a.intOpt("scale").getOrElse(1000000).toLong
      LensOp(s"random_proj(d_out=$dOut)",
        df => graft.operators.Similarity.randomProject(df, vec, id, dOut, scale))
    },

    // Length-bucketed inference batching (Packing.padBatches): per-batch
    // exact pad-waste audit over length-quantile buckets.
    "pad_batches" -> { a =>
      val len = a.strOpt("len").getOrElse("len")
      val id = a.strOpt("id").getOrElse("doc_id")
      val buckets = a.intOpt("buckets").getOrElse(8)
      val batch = a.intOpt("batch_size").getOrElse(32)
      LensOp.setLevel(s"pad_batches($buckets x $batch)",
        df => graft.operators.Packing.padBatches(df, len, id, buckets, batch))
    },

    // TextRank corpus keywords (TextAnalysis.textrankKeywords): word
    // co-occurrence graph scored by integer PageRank, top-k cut.
    "textrank" -> { a =>
      val (t, id) = (a.strOpt("text").getOrElse("text"),
        a.strOpt("id").getOrElse("doc_id"))
      val iters = a.intOpt("iters").getOrElse(5)
      val k = a.intOpt("k").getOrElse(50)
      LensOp.setLevel(s"textrank(iters=$iters, k=$k)",
        df => graft.operators.TextAnalysis.textrankKeywords(df, t, id, iters, k))
    },

    // BM25 keyword relevance (Bm25.score): per-doc score against a fixed
    // query-term list in integer micro-units.
    "bm25" -> { a =>
      val (t, id) = (a.strOpt("text").getOrElse("text"),
        a.strOpt("id").getOrElse("doc_id"))
      val terms = a.strList("terms")
      val k1 = a.doubleOpt("k1").getOrElse(1.2)
      val b = a.doubleOpt("b").getOrElse(0.75)
      LensOp(s"bm25(${terms.mkString(",")})",
        df => graft.operators.Bm25.score(df, t, id, terms, k1, b))
    },

    // Token-budget mixture planning (Sampling.tokenBudgetPlan): per-group
    // epoch plan to hit a token budget at the given weights; feed
    // epochs_micro/1e6 to `upsample`/`mixture` rates downstream.
    "token_budget" -> { a =>
      val group = a.str("group")
      val tokenCol = a.strOpt("tokens").getOrElse("n_ws_tokens")
      val budget = a.str("budget").toLong
      val weights = a.doubleMap("weights")
      val default = a.doubleOpt("default").getOrElse(0.0)
      LensOp.setLevel(s"token_budget($group, $budget)",
        df => graft.operators.Sampling.tokenBudgetPlan(
          df, group, tokenCol, budget, weights, default))
    },

    "quality_score" -> { a =>
      val (t, id) = (a.strOpt("text").getOrElse("text"),
        a.strOpt("id").getOrElse("doc_id"))
      LensOp(s"quality_score($t)", df => TextAnalysis.qualityScore(df, t, id))
    },

    "langid" -> { a =>
      val (t, id) = (a.strOpt("text").getOrElse("text"),
        a.strOpt("id").getOrElse("doc_id"))
      LensOp(s"langid($t)", df => TextAnalysis.languageId(df, t, id))
    },

    "fingerprint" -> { a =>
      val (t, id) = (a.strOpt("text").getOrElse("text"),
        a.strOpt("id").getOrElse("doc_id"))
      LensOp(s"fingerprint($t)", df => TextAnalysis.fingerprint(df, t, id))
    },

    "repetition" -> { a =>
      val (t, id) = (a.strOpt("text").getOrElse("text"),
        a.strOpt("id").getOrElse("doc_id"))
      LensOp(s"repetition($t)", df => TextAnalysis.repetition(df, t, id))
    },

    // PII redaction (TextAnalysis.redactPii): email/ip/phone scrub with
    // per-doc audit counts. Lossy (counts replace the raw text) ⇒ no inverse.
    // BPE merge training (Bpe.train): set-level — output is the merge
    // list, not the input rows.
    "bpe_train" -> { a =>
      val t = a.strOpt("text").getOrElse("text")
      val merges = a.intOpt("merges").getOrElse(100)
      val minFreq = a.intOpt("min_freq").getOrElse(2).toLong
      LensOp.setLevel(s"bpe_train($t, merges=$merges)",
        df => graft.operators.Bpe.train(df, t, merges, minFreq))
    },

    // Tokenizer application under a trained merge list (the lens file
    // carries the merges, like set_param carries static params).
    "bpe_encode" -> { a =>
      val (t, id) = (a.strOpt("text").getOrElse("text"),
        a.strOpt("id").getOrElse("doc_id"))
      val merges = a.strList("merges")
      LensOp(s"bpe_encode($t, ${merges.size} merges)",
        df => graft.operators.Bpe.encode(df, t, id, merges))
    },

    "normalize" -> { a =>
      val (t, id) = (a.strOpt("text").getOrElse("text"),
        a.strOpt("id").getOrElse("doc_id"))
      LensOp(s"normalize($t)", df => TextAnalysis.normalizeText(df, t, id))
    },

    "redact_pii" -> { a =>
      val (t, id) = (a.strOpt("text").getOrElse("text"),
        a.strOpt("id").getOrElse("doc_id"))
      LensOp(s"redact_pii($t)", df => TextAnalysis.redactPii(df, t, id))
    },

    "redact_cards" -> { a =>
      val (t, id) = (a.strOpt("text").getOrElse("text"),
        a.strOpt("id").getOrElse("doc_id"))
      LensOp(s"redact_cards($t)", df => TextAnalysis.redactCards(df, t, id))
    },

    // Structured-table mining: html column -> one row per table row
    // (table_idx, row_idx, n_cells, cells) — the 1:N face of
    // Html.extractTables.
    "html_tables" -> { a =>
      val in = a.strOpt("col").getOrElse("html")
      LensOp(s"html_tables($in)",
        df => graft.operators.Html.tables(df, in))
    },

    // RFC 9309 robots decisions: (robots, agent, path) columns ->
    // appended allowed/matched_rule/crawl_delay_ms/n_sitemaps.
    "robots_decide" -> { a =>
      val (r, ag, p) = (a.strOpt("robots").getOrElse("robots"),
        a.strOpt("agent").getOrElse("agent"),
        a.strOpt("path").getOrElse("path"))
      LensOp(s"robots_decide($r,$ag,$p)",
        df => graft.operators.Robots.decisions(df, r, ag, p))
    },

    // sitemaps.org walk: xml column -> one row per url/sitemap entry.
    "sitemap_entries" -> { a =>
      val in = a.strOpt("col").getOrElse("xml")
      LensOp(s"sitemap_entries($in)",
        df => graft.operators.Sitemap.entries(df, in))
    },

    // WARC record explode: binary .warc(.gz) column -> one row per
    // record with HTTP response split.
    "warc_records" -> { a =>
      val in = a.strOpt("col").getOrElse("payload")
      LensOp(s"warc_records($in)",
        df => graft.operators.Warc.records(df, in))
    },

    // Cross-corpus MinHash decontamination (Dedup.minHashLshAgainst):
    // two-input — the reference (eval/benchmark) corpus resolves from the
    // session catalog by name, like strip_contam. Emits the contaminated
    // pair set; compose with a downstream anti-join (or use mode=drop to
    // anti-join inline and keep the clean corpus rows).
    "minhash_against" -> { a =>
      val (t, id) = (a.strOpt("text").getOrElse("text"),
        a.strOpt("id").getOrElse("doc_id"))
      val refTable = a.str("ref_table")
      val threshold = a.doubleOpt("threshold").getOrElse(0.8)
      val drop = a.strOpt("mode").contains("drop")
      LensOp.setLevel(s"minhash_against(ref=$refTable, t=$threshold)",
        df => {
          val pairs = Dedup.minHashLshAgainst(
            df, df.sparkSession.table(refTable), t, id, threshold)
          if (!drop) pairs
          else df.join(pairs.select(org.apache.spark.sql.functions.col("doc_id")
            .as(id)).distinct(), Seq(id), "left_anti")
        })
    },

    // Reference-membership Bloom probe (Dedup.bloomReference): two-input
    // via the catalog; flags rows whose exact content may appear in the
    // reference (verify the flagged slice with an exact semi-join).
    "bloom_ref" -> { a =>
      val (t, id) = (a.strOpt("text").getOrElse("text"),
        a.strOpt("id").getOrElse("doc_id"))
      val refTable = a.str("ref_table")
      val items = a.intOpt("expected_items").getOrElse(100000)
      val fpp = a.doubleOpt("fpp").getOrElse(0.01)
      LensOp.setLevel(s"bloom_ref(ref=$refTable)",
        df => Dedup.bloomReference(
          df, df.sparkSession.table(refTable), t, id, items, fpp))
    },

    // DSIR importance selection (Dsir — Xie et al. 2023): two-input via
    // the catalog — the TARGET domain sample resolves by name, like
    // minhash_against. mode=weights (default) emits per-doc importance
    // weights; mode=select keeps the k corpus rows most resembling the
    // target (Gumbel-resampled at temperature > 0, hard top-k at 0).
    "dsir" -> { a =>
      val (t, id) = (a.strOpt("text").getOrElse("text"),
        a.strOpt("id").getOrElse("doc_id"))
      val targetTable = a.str("target_table")
      val tgtText = a.strOpt("target_text").getOrElse(t)
      val tgtId = a.strOpt("target_id").getOrElse(id)
      val buckets = a.intOpt("buckets").getOrElse(10007)
      val select = a.strOpt("mode").contains("select")
      val k = a.intOpt("k").getOrElse(1000)
      val temp = a.doubleOpt("temperature").getOrElse(0.0)
      LensOp.setLevel(s"dsir(target=$targetTable)",
        df => {
          val w = graft.operators.Dsir.weightsFromCounts(
            graft.operators.Dsir.hashedBigramCounts(df, t, id, buckets),
            graft.operators.Dsir.hashedBigramCounts(
              df.sparkSession.table(targetTable), tgtText, tgtId, buckets),
            buckets)
          if (!select) w
          else df.join(graft.operators.Dsir.resample(w, k, temp)
            .select(col("doc_id").as(id)), Seq(id), "left_semi")
        })
    },

    // Corpus-level segment dedup (Dedup.segmentDedup): set-level — the
    // surviving row set depends on cross-document frequencies.
    "segment_dedup" -> { a =>
      val (t, id) = (a.strOpt("text").getOrElse("text"),
        a.strOpt("id").getOrElse("doc_id"))
      val seg = a.intOpt("seg_tokens").getOrElse(10)
      val freq = a.intOpt("max_doc_freq").getOrElse(1)
      LensOp.setLevel(s"segment_dedup($t, seg=$seg, freq<=$freq)",
        df => Dedup.segmentDedup(df, t, id, seg, freq))
    },

    // Duplicated-run detection/removal (Spans): set-level — which spans
    // exist depends on corpus-wide n-gram frequencies.
    "dup_spans" -> { a =>
      val (t, id) = (a.strOpt("text").getOrElse("text"),
        a.strOpt("id").getOrElse("doc_id"))
      val n = a.intOpt("n").getOrElse(8)
      val minOcc = a.intOpt("min_occurrences").getOrElse(2)
      LensOp.setLevel(s"dup_spans($t, n=$n)",
        df => graft.operators.Spans.duplicateSpans(df, t, id, n, minOcc))
    },

    "strip_spans" -> { a =>
      val (t, id) = (a.strOpt("text").getOrElse("text"),
        a.strOpt("id").getOrElse("doc_id"))
      val n = a.intOpt("n").getOrElse(8)
      val minOcc = a.intOpt("min_occurrences").getOrElse(2)
      LensOp.setLevel(s"strip_spans($t, n=$n)",
        df => graft.operators.Spans.stripSpans(df, t, id, n, minOcc))
    },

    // Substring-level decontamination against a REFERENCE corpus
    // (Spans.stripContaminated). Two-input op: the reference side
    // resolves from the session catalog by name (`ref_table` — register
    // the eval set as a temp view before running the pipeline), the
    // standard Spark channel for a second input.
    "strip_contam" -> { a =>
      val (t, id) = (a.strOpt("text").getOrElse("text"),
        a.strOpt("id").getOrElse("doc_id"))
      val n = a.intOpt("n").getOrElse(8)
      val refTable = a.str("ref_table")
      LensOp.setLevel(s"strip_contam($t, ref=$refTable, n=$n)",
        df => graft.operators.Spans.stripContaminated(
          df, df.sparkSession.table(refTable), t, id, n))
    },

    // SemDeDup keep-one survivors (SemDedup.semantic): set-level — the
    // surviving row set depends on the corpus-trained quantizer.
    "semantic_dedup" -> { a =>
      val (v, id) = (a.strOpt("vec").getOrElse("embedding"),
        a.strOpt("id").getOrElse("vec_id"))
      val k = a.intOpt("k").getOrElse(8)
      val iters = a.intOpt("iters").getOrElse(3)
      val thr = a.double("threshold")
      LensOp.setLevel(s"semantic_dedup($v>=$thr, k=$k)",
        df => graft.operators.SemDedup.semantic(df, v, id, k, iters, thr))
    },

    // Exact k-quantile bucketing by a score column (Sampling.quantileBuckets).
    "quantile_buckets" -> { a =>
      val (score, id) = (a.str("score"), a.strOpt("id").getOrElse("doc_id"))
      val k = a.intOpt("k").getOrElse(10)
      LensOp.setLevel(s"quantile_buckets($score, k=$k)",
        df => graft.operators.Sampling.quantileBuckets(df, score, id, k))
    },

    // Corpus-trained unigram LM score (TextAnalysis.unigramLmScore):
    // set-level — every score depends on the whole corpus's token table.
    "unigram_lm" -> { a =>
      val (t, id) = (a.strOpt("text").getOrElse("text"),
        a.strOpt("id").getOrElse("doc_id"))
      LensOp.setLevel(s"unigram_lm($t)",
        df => TextAnalysis.unigramLmScore(df, t, id))
    },

    // Corpus-trained bigram LM score (CCNet-style perplexity filter).
    "bigram_lm" -> { a =>
      val (t, id) = (a.strOpt("text").getOrElse("text"),
        a.strOpt("id").getOrElse("doc_id"))
      LensOp.setLevel(s"bigram_lm($t)",
        df => TextAnalysis.bigramLmScore(df, t, id))
    },

    // Lloyd's k-means over an embedding column (Kmeans.cluster):
    // set-level — assignments depend on centroids trained on the corpus.
    "kmeans" -> { a =>
      val (v, id) = (a.strOpt("vec").getOrElse("embedding"),
        a.strOpt("id").getOrElse("vec_id"))
      val k = a.intOpt("k").getOrElse(8)
      val iters = a.intOpt("iters").getOrElse(5)
      LensOp.setLevel(s"kmeans($v, k=$k, iters=$iters)",
        df => graft.operators.Kmeans.cluster(df, v, id, k, iters))
    },

    // Overlapping token-window chunking (TextAnalysis.chunkDocuments).
    "chunk" -> { a =>
      val (t, id) = (a.strOpt("text").getOrElse("text"),
        a.strOpt("id").getOrElse("doc_id"))
      val w = a.intOpt("window").getOrElse(512)
      val st = a.intOpt("stride").getOrElse(w)
      LensOp.setLevel(s"chunk($t, $w/$st)",
        df => TextAnalysis.chunkDocuments(df, t, id, w, st))
    },

    // Global top-k vocabulary (set-level: defines its own row set).
    "vocab" -> { a =>
      val t = a.strOpt("text").getOrElse("text")
      val k = a.intOpt("k").getOrElse(10000)
      LensOp.setLevel(s"vocab($t, k=$k)",
        df => TextAnalysis.vocabulary(df, t, k))
    },

    // Top-k tf-idf terms per document (set-level).
    "tfidf" -> { a =>
      val (t, id) = (a.strOpt("text").getOrElse("text"),
        a.strOpt("id").getOrElse("doc_id"))
      val k = a.intOpt("k").getOrElse(5)
      LensOp.setLevel(s"tfidf($t, k=$k)",
        df => TextAnalysis.tfidfTopTerms(df, t, id, k))
    },

    // Training-sequence packing by running token count (Packing).
    "pack" -> { a =>
      val (t, id) = (a.strOpt("text").getOrElse("text"),
        a.strOpt("id").getOrElse("doc_id"))
      val group = a.str("group")
      val budget = a.intOpt("budget").getOrElse(2048)
      LensOp.setLevel(s"pack($group, budget=$budget)",
        df => graft.operators.Packing.packSequences(df, t, id, group, budget))
    },

    // Pack-level shard manifest (Packing.packManifest).
    "pack_manifest" -> { a =>
      val (t, id) = (a.strOpt("text").getOrElse("text"),
        a.strOpt("id").getOrElse("doc_id"))
      val group = a.str("group")
      val budget = a.intOpt("budget").getOrElse(2048)
      LensOp.setLevel(s"pack_manifest($group, budget=$budget)",
        df => graft.operators.Packing.packManifest(df, t, id, group, budget))
    },

    // Symmetric int8 embedding quantization (Quantize.int8).
    "quantize_int8" -> { a =>
      val (v, id) = (a.strOpt("vec").getOrElse("embedding"),
        a.strOpt("id").getOrElse("vec_id"))
      LensOp(s"quantize_int8($v)",
        df => graft.operators.Quantize.int8(df, v, id))
    },

    // Deterministic global training order (Sampling.shuffleOrder).
    "shuffle_order" -> { a =>
      val id = a.strOpt("id").getOrElse("doc_id")
      val as = a.strOpt("as").getOrElse("train_pos")
      LensOp.setLevel(s"shuffle_order($id)",
        df => graft.operators.Sampling.shuffleOrder(df, id, as))
    },

    // Deterministic per-group mixture rates (Sampling.mixture). `rates`
    // is a JSON object {group: rate}; unknown groups use `default`.
    "mixture" -> { a =>
      val (group, id) = (a.str("group"), a.strOpt("id").getOrElse("doc_id"))
      val default = a.doubleOpt("default").getOrElse(1.0)
      val rates = a.doubleMap("rates")
      LensOp(s"mixture($group)",
        df => graft.operators.Sampling.mixture(df, group, id, rates, default))
    },

    // Deterministic fractional upsampling (Sampling.upsample): epoch
    // multipliers > 1; set-level (changes row multiplicity).
    "upsample" -> { a =>
      val (group, id) = (a.str("group"), a.strOpt("id").getOrElse("doc_id"))
      val default = a.doubleOpt("default").getOrElse(1.0)
      val rates = a.doubleMap("rates")
      LensOp.setLevel(s"upsample($group)",
        df => graft.operators.Sampling.upsample(df, group, id, rates, default))
    },

    // Temperature-rebalanced mixture (Sampling.temperatureMixture):
    // rates computed from the corpus itself, q_g ∝ p_g^alpha.
    "temperature_mix" -> { a =>
      val (group, id) = (a.str("group"), a.strOpt("id").getOrElse("doc_id"))
      val alpha = a.double("alpha")
      LensOp.setLevel(s"temperature_mix($group, a=$alpha)",
        df => graft.operators.Sampling.temperatureMixture(df, group, id, alpha))
    },

    // Deterministic hash train/val/test assignment (Sampling.hashSplit).
    "train_split" -> { a =>
      val id = a.strOpt("id").getOrElse("doc_id")
      val train = a.intOpt("train_pct").getOrElse(90)
      val vp = a.intOpt("val_pct").getOrElse(5)
      LensOp(s"train_split($id $train/$vp)",
        df => graft.operators.Sampling.hashSplit(df, id, train, vp))
    },

    // Set-level (defines its own order): the CLI must not re-impose input
    // order after this stage.
    "sort" -> { a =>
      val keys = a.strList("cols")
      LensOp.setLevel(s"sort(${keys.mkString(",")})", { df =>
        val sortCols = keys.map {
          case k if k.endsWith(" desc") => col(k.stripSuffix(" desc")).desc
          case k                        => col(k).asc
        }
        df.sort(sortCols: _*)
      })
    }
  )

  def resolve(path: String, args: Args): LensOp = {
    val name = path.stripPrefix("builtin:")
    registry.get(name) match {
      case Some(factory) => factory(args)
      case None =>
        throw new IllegalArgumentException(s"unknown lens op: '$path'")
    }
  }
}
