package graft.queries

import graft.Tables
import graft.ext.{Components, Contamination, Dedup, Ranking, Sampling, Similarity, TextAnalysis}
import graft.ops.{AsOfJoin, Funnel, RangeJoin}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-3 pipeline operators: the temporal-join and corpus-assembly
  * surface a 100 TB training-data pipeline needs BETWEEN the per-doc
  * operators (dedup, quality, similarity — ExtQueries) and the final
  * corpus: as-of / range joins over the event stream, near-dup pair
  * graphs collapsed to components, ranked retrieval, deterministic
  * sampling, token-budget mixing, and exact distribution stats. Every
  * query is DuckDB-oracle-gated like the rest of the registry.
  */
object PipelineQueries {

  /** Trained BPE merge list shared by q153 (the merge table) and q154
    * (the corpus encode): one collect of the CAPPED word-frequency head
    * (top-1000 — model-sized by construction), then the pure driver
    * training loop. The corpus-scale work is the session `tok_counts`
    * artifact both queries already ride. */
  private def bpeMerges(s: SparkSession, d: String): Seq[graft.ext.Bpe.Merge] = {
    val wf = ExtQueries.docTokenCounts(s, d)
      .orderBy(col("cnt").desc, col("token")).limit(1000)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    graft.ext.Bpe.trainMerges(wf, 8)
  }

  /** nDCG@10 rank discounts: floor(1e6 / log2(r+1)) for r = 1..10 —
    * HARD CONSTANTS precomputed from the public formula so neither
    * engine evaluates a logarithm at runtime; the q206 plan and oracle
    * both read THIS sequence (grade-weighted sums over it are
    * BIGINT-exact by construction). */
  private[queries] val ndcgDisc = Seq(1000000L, 630929L, 500000L, 430676L,
    386852L, 356207L, 333333L, 315464L, 301029L, 289064L)

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Point-in-time attribution: each purchase joined to the user's most
    // recent click at-or-before it (AsOfJoin: union + one shuffle + one
    // window pass — no per-key pair blow-up).
    "q53_events_asof" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      AsOfJoin.asOfInner(purchases, clicks, "user_id", "ts",
          Seq("event_id", "ts", "value"), "event_id", "click_")
        .orderBy(col("event_id"))
        
    }),

    // Near-dup pair graph -> document clusters: connected components
    // (min-label propagation) over the q48 SimHash Hamming graph, from
    // the same shared per-session signature table; identical signatures
    // collapse to one representative before the loop.
    "q54_dedup_components" -> ((s, d) =>
      ExtQueries.simhashComps(s, d)
        .select(col("doc").as("doc_id"), col("comp").as("component"))
        .orderBy(col("doc_id"))),

    // BM25-ranked disjunctive retrieval over the inverted index (the
    // ranking layer above q49's conjunctive candidate lookup).
    "q55_fts_bm25" -> ((s, d) =>
      ExtQueries.bm25Top10(s, d, Seq("spark", "merge"))
        .orderBy(col("rank"))),

    // Retrieval-quality audit: MRR and recall@10 of the BM25 disjunctive
    // ranking (q55's scorer, same session index artifacts) against
    // exact-phrase relevance (q146's positional predicate) for three
    // fixed two-word queries — the measurement that justifies the
    // ranking parameters before anyone trusts the search surface, the
    // lexical twin of q109's ANN recall and q149's LSH dedup audit.
    // first_rel_rank = 0 encodes "no relevant doc in the top 10";
    // mrr_ppm is the integer-quantized reciprocal rank (q135's RRF
    // discipline — no float rank math crosses the oracle boundary).
    "q187_retrieval_mrr" -> ((s, d) => {
      val phrases = Seq(
        ("hash join", Seq("hash", "join")),
        ("spark merge", Seq("spark", "merge")),
        ("table scan", Seq("table", "scan")))
      val pos = ExtQueries.posPostings(s, d)
      phrases.map { case (label, terms) =>
        val ranked = ExtQueries.bm25Top10(s, d, terms)
        val rel = TextAnalysis.phraseHits(pos, terms)
          .select(col("doc").as("doc_id"))
        val relAgg = rel.agg(count(lit(1)).as("n_rel"))
        val hitAgg = ranked.join(rel, "doc_id")
          .agg(count(lit(1)).as("n_rel_topk"),
            coalesce(min(col("rank")), lit(0)).cast("long").as("first_rel_rank"))
        relAgg.crossJoin(hitAgg).select(lit(label).as("query"),
          col("n_rel"), col("n_rel_topk"), col("first_rel_rank"))
      }.reduce(_ unionByName _)
        .withColumn("mrr_ppm",
          when(col("first_rel_rank") > 0, expr("1000000 div first_rel_rank"))
            .otherwise(lit(0L)))
        .orderBy(col("query"))
    }),

    // Graded-relevance nDCG@10 of the BM25 ranking — the standard
    // retrieval metric q187's binary MRR cannot express: an exact-phrase
    // hit (grade 2) should outrank mere term co-occurrence (grade 1).
    // DCG discounts are LITERAL integers floor(1e6/log2(r+1)) shared
    // between the plan and the oracle (the q176/q204 discipline: no
    // runtime transcendental, no libm-parity exposure), so DCG, the
    // closed-form ideal DCG (grade-2 docs fill ranks first, then
    // grade-1, straight off the cumulative-discount array literal), and
    // the final ppm ratio are all BIGINT-exact. 100 TB shape: the
    // ranking legs are the session FTS artifacts' top-k, the grade sets
    // are two posting-join aggregates, and the metric math runs over
    // <= 10 rows per query.
    "q206_retrieval_ndcg" -> ((s, d) => {
      import s.implicits._
      val queries = Seq(
        ("hash join", Seq("hash", "join")),
        ("spark merge", Seq("spark", "merge")),
        ("table scan", Seq("table", "scan")))
      val cum = ndcgDisc.scanLeft(0L)(_ + _)
      val discDf = ndcgDisc.zipWithIndex.map { case (v, i) => (i + 1, v) }
        .toDF("rank", "disc")
      val cumArr = array(cum.map(lit): _*)
      def cumAt(n: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        element_at(cumArr, least(n, lit(10L)).cast("int") + 1)
      val pos = ExtQueries.posPostings(s, d)
      queries.map { case (label, terms) =>
        val ranked = ExtQueries.bm25Top10(s, d, terms)
        val phrase = TextAnalysis.phraseHits(pos, terms)
          .select(col("doc").as("doc_id"), lit(2L).as("g"))
        val conj = pos.where(col("token").isin(terms: _*))
          .groupBy(col("doc")).agg(countDistinct(col("token")).as("nt"))
          .where(col("nt") === terms.size)
          .select(col("doc").as("doc_id"), lit(1L).as("g"))
        val grades = phrase.unionByName(conj)
          .groupBy(col("doc_id")).agg(max(col("g")).as("grade"))
        val counts = grades.agg(
          coalesce(sum(when(col("grade") === 2, 1L)), lit(0L)).as("n_rel2"),
          coalesce(sum(when(col("grade") === 1, 1L)), lit(0L)).as("n_rel1"))
        val dcg = ranked.join(grades, Seq("doc_id"), "left")
          .join(broadcast(discDf), "rank")
          .agg(coalesce(sum(coalesce(col("grade"), lit(0L)) * col("disc")),
            lit(0L)).as("dcg"))
        counts.crossJoin(dcg)
          .select(lit(label).as("query"), col("n_rel2"), col("n_rel1"),
            col("dcg"),
            (lit(2L) * cumAt(col("n_rel2"))
              + cumAt(col("n_rel2") + col("n_rel1"))
              - cumAt(col("n_rel2"))).as("idcg"))
      }.reduce(_ unionByName _)
        .withColumn("ndcg_ppm", when(col("idcg") > 0,
          expr("CAST((1000000 * dcg) DIV idcg AS BIGINT)")).otherwise(lit(0L)))
        .orderBy(col("query"))
    }),

    // Exact-k deterministic stratified sample — the EVAL-SET primitive
    // q56's Bernoulli sampling cannot provide (a rate gives a binomial
    // count; an eval set needs EXACTLY k per stratum): rank each
    // stratum by the md5 draw (doc_id tiebreak) and keep rank <= k.
    // Same-id-same-rank on any engine, any run, any partitioning —
    // uniform without replacement by the symmetry of the hash. The
    // rank <= k predicate lowers to Spark's WindowGroupLimit
    // (plan-pinned): each partition keeps a k-row heap per stratum, so
    // the full stratum is NEVER sorted — top-k per key at map speed,
    // the only scale-safe shape for "20 eval docs per language" over
    // 100 TB.
    "q210_stratified_exact_k" -> ((s, d) => {
      val rk = row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
          .orderBy(Sampling.draw(col("doc_id")), col("doc_id")))
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          Sampling.draw(col("doc_id")).as("draw"))
        .withColumn("rk", rk)
        .where(col("rk") <= 20)
        .select(col("doc_id"), col("lang"), col("draw"),
          col("rk").cast("long").as("rk"))
        .orderBy(col("lang"), col("rk"))
    }),

    // Deterministic stratified Bernoulli sample: md5-draw vs per-language
    // hex thresholds (en 1/2, es 1/4, de 1/8, fr 3/4, default 1/16) —
    // reproducible membership, zero shuffle.
    "q56_sample_stratified" -> ((s, d) =>
      Sampling.stratifiedSample(Tables.documents(s, d), "doc_id", "lang",
          Seq("en" -> 0.5, "es" -> 0.25, "de" -> 0.125, "fr" -> 0.75), 0.0625)
        .select(col("doc_id"), col("lang"), col("source"),
          col("draw"), col("threshold"))
        .orderBy(col("doc_id"))),

    // Exact per-language doc-length distribution: min/max/avg + exact
    // interpolated quantiles at binary-exact fractions (.25/.5/.75/.875 —
    // every interpolation op is exact in IEEE double, so any engine
    // reproduces the same bits).
    "q57_doc_length_stats" -> ((s, d) =>
      Tables.documents(s, d).groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"),
          (sum(col("n_chars")).cast("double") /
            count(lit(1)).cast("double")).as("avg_chars"),
          expr("percentile(n_chars, array(0.25D, 0.5D, 0.75D, 0.875D))").as("p"))
        .select(col("lang"), col("n_docs"), col("min_chars"), col("max_chars"),
          col("avg_chars"),
          element_at(col("p"), 1).as("p25"), element_at(col("p"), 2).as("p50"),
          element_at(col("p"), 3).as("p75"), element_at(col("p"), 4).as("p875"))
        .orderBy(col("lang"))),

    // Token-budget mixing plan per (lang, source) cell — integer-exact
    // shares and per-cell deterministic sampling rates (ppm).
    "q58_mixing_plan" -> ((s, d) => {
      val prof = ExtQueries.docProfile(s, d)
        .select(col("lang"), col("source"), col("n_tokens"))
      Sampling.mixingPlan(prof, "lang", "source", "n_tokens", 50000L)
        .orderBy(col("lang"), col("source"))
    }),

    // Mixing plan REALIZED: close the plan→apply→verify loop on q58 —
    // apply each cell's sample_rate_ppm as a deterministic md5-draw
    // threshold (the q56 draw algebra, but the threshold computed
    // in-engine per cell: printf-hex of rate·2³²/10⁶, with the 'g'
    // keep-everything sentinel from Sampling.hexThreshold), then audit
    // what the plan actually delivers: kept docs/tokens per cell and
    // the budget fill ratio. The plan table is cells-sized (broadcast);
    // the apply is one map-side predicate per doc — no new shuffle
    // beyond the final cell rollup.
    "q193_mixing_realized" -> ((s, d) => {
      val prof = ExtQueries.docProfile(s, d)
        .select(col("lang"), col("source"), col("doc_id"),
          col("n_tokens").cast("long").as("n_tok"))
      val plan = Sampling.mixingPlan(prof, "lang", "source", "n_tok", 50000L)
        .select(col("lang"), col("source"), col("cell_budget"),
          col("sample_rate_ppm"))
      prof.join(broadcast(plan), Seq("lang", "source"))
        .withColumn("thr",
          when(col("sample_rate_ppm") >= 1000000L, lit("g"))
            .otherwise(format_string("%08x",
              expr("(sample_rate_ppm * 4294967296) div 1000000"))))
        .withColumn("draw", Sampling.draw(col("doc_id")))
        .groupBy(col("lang"), col("source"), col("cell_budget"),
          col("sample_rate_ppm"))
        .agg(sum(when(col("draw") < col("thr"), lit(1L)).otherwise(lit(0L)))
            .as("n_kept"),
          sum(when(col("draw") < col("thr"), col("n_tok")).otherwise(lit(0L)))
            .as("kept_tokens"))
        .select(col("lang"), col("source"), col("sample_rate_ppm"),
          col("n_kept"), col("kept_tokens"), col("cell_budget"),
          when(col("cell_budget") > 0,
            expr("(1000000 * kept_tokens) div cell_budget"))
            .otherwise(lit(0L)).as("fill_ppm"))
        .orderBy(col("lang"), col("source"))
    }),

    // Token-window chunking (window 32, stride 24 — overlapping LM
    // training chunks), emitted as hashes + counters.
    "q60_chunk_windows" -> ((s, d) =>
      TextAnalysis.chunkWindows(Tables.documents(s, d), "text", "doc_id", 32, 24)
        .orderBy(col("doc_id"), col("chunk_idx"))),

    // Greedy per-language sequence packing to a 512-token budget,
    // aggregated to the packing manifest.
    "q61_pack_sequences" -> ((s, d) => {
      val prof = ExtQueries.docProfile(s, d)
        .select(col("lang"), col("doc_id"), col("n_tokens"))
      Sampling.packSequences(prof, "lang", "doc_id", "n_tokens", 512L)
        .groupBy(col("lang"), col("seq_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).cast("bigint").as("n_tokens"))
        .orderBy(col("lang"), col("seq_id"))
    }),

    // Packing-efficiency curve: q61's concat packing swept over context
    // sizes {256, 512, 1024} — per (lang, ctx): documents split by a
    // sequence boundary (they start in one sequence and overflow into
    // the next, the docs whose attention masks a packer must handle)
    // and the sequence count. The measurement behind choosing a context
    // length; same sweep-as-predicate shape as q181/q189 — one prior-sum
    // window (q61's), each ctx level a predicate over the same rows.
    "q190_packing_efficiency" -> ((s, d) => {
      val prof = ExtQueries.docProfile(s, d)
        .select(col("lang"), col("doc_id"), col("n_tokens"))
      // q61's prior-sum via the sharded prefix (lang is a ~5-value enum;
      // a per-lang window serializes — the r10 q155 shape).
      val pt = graft.ops.ShardedRank.runningSum(prof, Seq("lang"),
        Seq(col("doc_id")), col("n_tokens"), "pt", exclusive = true)
      pt.select(col("lang"), col("n_tokens"), col("pt"),
          explode(array(lit(256L), lit(512L), lit(1024L))).as("ctx"))
        .groupBy(col("lang"), col("ctx"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("pt") % col("ctx") + col("n_tokens") > col("ctx"),
            lit(1L)).otherwise(lit(0L))).as("n_split_docs"),
          sum(col("n_tokens")).as("tot"))
        .withColumn("split_ppm", expr("(1000000 * n_split_docs) div n_docs"))
        .withColumn("n_seqs", expr("(tot + ctx - 1) div ctx"))
        .select(col("lang"), col("ctx"), col("n_docs"), col("n_split_docs"),
          col("split_ppm"), col("n_seqs"))
        .orderBy(col("lang"), col("ctx"))
    }),

    // Gopher-style repetition signals: duplicate-bigram and top-bigram
    // shares in ppm.
    "q62_repetition" -> ((s, d) =>
      TextAnalysis.repetitionProfile(Tables.documents(s, d), "text", "doc_id")
        .orderBy(col("doc_id"))),

    // Token-run collapse: the TRANSFORM q62 only measures — runs of the
    // same token longer than 2 truncate to 2 (word-grain elongation /
    // spam normalization). Keep rule is position-local (token i drops
    // iff its 2 original predecessors equal it), so the rewrite is one
    // typed pass at scan speed and the oracle states the same rule with
    // lag() windows; only docs that actually changed are output (the
    // cleaned-delta shape a pipeline writes back).
    "q152_run_collapse" -> ((s, d) =>
      TextAnalysis.collapseTokenRuns(Tables.documents(s, d), "text", "doc_id")
        .where(col("n_removed") > 0)
        .orderBy(col("doc_id"))),

    // Benchmark decontamination (GPT-3 appendix-C recipe): per candidate
    // doc, how many of its distinct trigrams occur anywhere in the
    // benchmark set (here: source 'src0' stands in for the eval suite;
    // its gram set broadcasts).
    "q64_decontaminate" -> ((s, d) => {
      // Both sides are slices of the session trigram artifact (carved by
      // the broadcast doc->source map), not fresh shingle scans.
      val sh = ExtQueries.trigramShingles(s, d)
      val srcMap = ExtQueries.docSourceMap(s, d)
      Contamination.benchmarkOverlapFromShingles(
          sh.join(broadcast(srcMap.where(col("source") =!= "src0")
            .select(col("doc"))), "doc"),
          sh.join(broadcast(srcMap.where(col("source") === "src0")
            .select(col("doc"))), "doc"))
        .orderBy(col("doc_id"))
    }),

    // Corpus vocabulary head: top-50 tokens by total frequency with doc
    // frequency (Zipf-head audit; TakeOrdered — the vocabulary is never
    // globally sorted).
    "q65_vocab_topk" -> ((s, d) =>
      TextAnalysis.vocabTopKFromStats(
          ExtQueries.docTokenCounts(s, d).select(col("token"), col("cnt").as("freq")),
          ExtQueries.docTokenDocFreq(s, d), 50)
        .orderBy(col("rank"))),

    // Corpus-wide duplicated-text share (Lee et al. 2022): ppm of each
    // doc's distinct trigrams that occur in >= 2 documents.
    "q69_dup_gram_share" -> ((s, d) =>
      Contamination.duplicateGramShareFromShingles(
          ExtQueries.trigramShingles(s, d))
        .orderBy(col("doc_id"))),

    // Ordered event funnel: users completing view -> click -> purchase,
    // each stage strictly after the previous one's first completion.
    "q70_event_funnel" -> ((s, d) =>
      Funnel.funnelCounts(Tables.events(s, d), "user_id", "ts", "event_type",
          Seq("view", "click", "purchase"))
        .orderBy(col("stage"))),

    // Weekly retention cohorts: users grouped by first-activity week,
    // counted per week-offset of later activity.
    "q71_retention_cohorts" -> ((s, d) => {
      // distinct BEFORE the join: a user's 10k same-week events must
      // collapse to one row before shuffling (the oracle's
      // DISTINCT-first shape).
      val ev = Tables.events(s, d)
        .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
        .distinct()
      val cohort = ev.groupBy(col("user_id"))
        .agg(min(col("week")).as("cohort_week"))
      // No re-distinct after the join: (user, week) rows are already
      // unique and week -> offset is bijective (both week-aligned).
      ev.join(cohort, "user_id")
        .select(col("user_id"), col("cohort_week"),
          expr("datediff(week, cohort_week) div 7").as("week_offset"))
        .groupBy(col("cohort_week"), col("week_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("cohort_week"), col("week_offset"))
        
    }),

    // Characteristic terms per source: top-5 tokens by tf*idf per
    // source (BM25-style floor(1000*s) score quantization).
    "q72_top_terms_source" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      TextAnalysis.topTermsFromStats(
          ExtQueries.docSourceTokenCounts(s, d)
            .select(col("source"), col("token"), col("cnt").as("tf")),
          ExtQueries.docTokenDocFreq(s, d),
          docs.where(col("doc_id").isNotNull).select(col("doc_id")).distinct().count(),
          "source", 5)
        .orderBy(col("source"), col("rank"))
    }),

    // Integer-exact equi-width doc-length histogram per language
    // (width 64, 16 buckets, overflow tail in the last).
    "q73_length_histogram" -> ((s, d) =>
      TextAnalysis.intHistogram(Tables.documents(s, d), "n_chars", "lang",
          64L, 16)
        .orderBy(col("lang"), col("bucket"))),

    // Incremental-crawl delta: docs whose content hash is absent from
    // the previous snapshot (doc_id % 10 < 8 stands in for it) — the
    // hash ANTI-join.
    "q74_snapshot_delta" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.newContentOnly(docs, docs.where(col("doc_id") % 10 < 8),
          "text", "doc_id")
        .orderBy(col("doc_id"))
    }),

    // Token totals with full CUBE subtotals over (lang, source) —
    // grouping-set breadth beyond q15's ROLLUP; grouping_id
    // disambiguates subtotal rows from genuine NULL groups.
    "q75_cube_tokens" -> ((s, d) => {
      val prof = ExtQueries.docProfile(s, d)
        .select(col("lang"), col("source"), col("n_tokens"))
      prof.cube(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).cast("bigint").as("n_tokens"),
          grouping_id().cast("int").as("gid"))
        .orderBy(col("gid"), col("lang").asc_nulls_first,
          col("source").asc_nulls_first)
    }),

    // Quartile assignment of docs by length within language (ntile over
    // a total order — deterministic bucket edges). Sharded ntile: lang
    // is a ~5-value enum, so ntile().over(partitionBy(lang)) serializes
    // (the r10 q155 shape); ops.ShardedRank bins identically.
    "q76_length_quartiles" -> ((s, d) =>
      graft.ops.ShardedRank.withNtile(
          Tables.documents(s, d)
            .select(col("doc_id"), col("lang"), col("n_chars")),
          Seq("lang"), col("n_chars"), col("doc_id"), 4, "quartile")
        .select(col("doc_id"), col("lang"), col("n_chars"), col("quartile"))
        .orderBy(col("doc_id"))),

    // Integer-exact 2-sigma outliers per event type: quantized values,
    // cross-multiplied variance compare ((n*v - s)^2 > 4(n*ssq - s^2))
    // in DECIMAL(38,0)/HUGEINT — no float mean/std ever computed, so
    // any engine flags the identical rows.
    "q77_value_outliers" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("event_type"),
        floor(col("value") * 1000).cast("long").as("vq"))
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      // vq is cast to decimal BEFORE squaring (the oracle's HUGEINT
      // pattern): a long vq*vq overflows at |value| >= ~3.04e6 where the
      // oracle stays exact. mean_q rides along in stats so the
      // aggregation isn't recomputed by a second join.
      val stats = ev.groupBy(col("event_type")).agg(
          count(lit(1)).as("n"),
          sum(col("vq")).as("sm"),
          sum(dec(col("vq")) * dec(col("vq"))).as("ssq"))
        .withColumn("mean_q", expr("sm div n"))
      ev.join(broadcast(stats), "event_type")
        .withColumn("dev", dec(col("n")) * dec(col("vq")) - dec(col("sm")))
        .withColumn("var4",
          dec(lit(4)) * (dec(col("n")) * dec(col("ssq")) -
            dec(col("sm")) * dec(col("sm"))))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          min(col("mean_q")).as("mean_q"),
          sum(when(col("dev") * col("dev") > col("var4"), 1L).otherwise(0L))
            .as("n_outliers"))
        .select(col("event_type"), col("n"), col("mean_q"), col("n_outliers"))
        .orderBy(col("event_type"))
    }),

    // Market-basket association over user event types: for every type
    // pair, the users holding both, plus integer-ppm support, confidence
    // (a→b) and lift — the "users who did X also did Y" surface next to
    // q78's adjacent-transition matrix (this one is set co-occurrence
    // over a user's whole history, order-free). The self-join runs on
    // the per-user DISTINCT type set (types-per-user bounded by the
    // event vocabulary), so pair rows are users × types-per-user², never
    // events²; all ratios are integer ppm. Overflow envelope:
    // 10⁶·n_ab·n_users stays under 2⁶³ up to ~3·10⁶ distinct users —
    // beyond that, scale support to per-mille or guard like q90.
    "q191_basket_lift" -> ((s, d) => {
      val ut = graft.ops.TransientCache.persist(
        Tables.events(s, d).select(col("user_id"), col("event_type")).distinct())
      val n = ut.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      val nu = ut.select(col("user_id")).distinct()
        .agg(count(lit(1)).as("n_users"))
      val pairs = ut.select(col("user_id"), col("event_type").as("type_a"))
        .join(ut.select(col("user_id"), col("event_type").as("type_b")), "user_id")
        .where(col("type_a") < col("type_b"))
        .groupBy(col("type_a"), col("type_b")).agg(count(lit(1)).as("n_ab"))
      pairs
        .join(n.select(col("event_type").as("type_a"), col("n").as("n_a")), "type_a")
        .join(n.select(col("event_type").as("type_b"), col("n").as("n_b")), "type_b")
        .crossJoin(nu)
        .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"), col("n_ab"),
          expr("(1000000 * n_ab) div n_users").as("support_ppm"),
          expr("(1000000 * n_ab) div n_a").as("conf_a_to_b_ppm"),
          expr("(1000000 * n_ab * n_users) div (n_a * n_b)").as("lift_ppm"))
        .orderBy(col("type_a"), col("type_b"))
    }),

    // Event-type transition matrix (first-order Markov counts): lead
    // over each user's total-ordered event sequence.
    "q78_event_transitions" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("to_type", lead(col("event_type"), 1).over(w))
        .where(col("to_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("from_type"), col("to_type"))
    }),

    // Deterministic 80/10/10 train/val/test split: md5 draw vs
    // cumulative thresholds — reproducible dataset versioning.
    "q79_split_assign" -> ((s, d) =>
      Sampling.splitAssign(Tables.documents(s, d), "doc_id", 0.8, 0.1)
        .select(col("doc_id"), col("draw"), col("split"))
        .orderBy(col("doc_id"))),

    // Near-dup graph degree distribution: how many docs have k near-dup
    // neighbours (graph-shape audit over the q48 pair set; a heavy tail
    // here predicts quadratic candidate blow-ups before they happen).
    "q80_neardup_degree" -> ((s, d) => {
      val pairs = Dedup.simhashHammingPairsFromSigs(ExtQueries.simhashSigs(s, d), 4)
      // one pass: explode each pair into both endpoints (a self-union
      // would run the band join + Hamming verify twice)
      val edges = pairs.select(
        explode(array(col("doc_a"), col("doc_b"))).as("doc"))
      edges.groupBy(col("doc")).agg(count(lit(1)).as("degree"))
        .groupBy(col("degree")).agg(count(lit(1)).as("n_docs"))
        .orderBy(col("degree"))
    }),

    // PII scrubbing pass: sequential email -> IPv4 -> digit-run
    // redaction with per-pattern counts and the redacted-text hash
    // (map-side column expressions; the synthetic corpus is PII-free, so
    // the fixture-level semantics live in ContaminationSpec).
    "q66_pii_redaction" -> ((s, d) =>
      TextAnalysis.withPiiRedaction(Tables.documents(s, d), "text")
        .select(col("doc_id"), col("n_email"), col("n_ipv4"),
          col("n_digit_run"), col("redacted_hash"))
        .orderBy(col("doc_id"))),

    // Dedup resolution: rank each near-dup component's members by the
    // q41 quality score (keep-best-not-first policy) — rank 1 survives,
    // the rest are the drop set.
    "q67_dedup_keep_best" -> ((s, d) => {
      val comps = ExtQueries.simhashComps(s, d)
      val qual = ExtQueries.docProfile(s, d)
        .select(col("doc_id"), col("quality"))
      Components.canonicalPerComponent(comps, "doc", "comp", qual,
          "doc_id", "quality")
        .select(col("comp").as("component"), col("doc").as("doc_id"),
          col("quality"), col("rank"), col("n_in_component"))
        .orderBy(col("component"), col("rank"))
    }),

    // Bounded-window range join: purchases within one hour AFTER each
    // click by the same user (bucket-banded equi-join, no theta-join
    // pair blow-up), aggregated per click.
    "q59_click_conversions" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"))
      RangeJoin.pairsWithinAfter(clicks, purchases, "user_id", "ts", "ts",
          3600000000L, Seq("value"), "p_")
        .groupBy(col("event_id"), col("user_id"), col("ts"))
        .agg(count(lit(1)).as("n_purchases"),
          sum(col("p_value").cast("decimal(18,6)")).as("purchase_value"))
        .orderBy(col("event_id"))
        
    }),

    // Oracle-reproducible HyperLogLog (A8's scale path): 256-register
    // sketch per order priority next to the exact distinct count — the
    // mergeable estimate that replaces count(DISTINCT) at 100 TB.
    "q81_hll_distinct" -> ((s, d) =>
      graft.ext.Sketches.hllDistinct(Tables.orders(s, d), "o_custkey",
          "o_orderpriority", 8)
        .orderBy(col("o_orderpriority"))),

    // HLL accuracy sweep — the operating curve q81's single point
    // cannot show (the q198/q189 audit discipline applied to
    // cardinality estimation): the same estimator at b = 4/8/12
    // register bits, each group's estimate against the exact distinct
    // count in ppm, with the published 1.04/√m standard error alongside
    // as a literal. The sweep is how a pipeline picks its sketch width
    // from measured — not assumed — error; b=4's bias (the alpha
    // approximation + linear-counting branch) shows up honestly because
    // the baseline is exact, not theory.
    "q223_hll_error_sweep" -> ((s, d) => {
      val se = Map(4 -> 260000L, 8 -> 65000L, 12 -> 16250L)
      Seq(4, 8, 12).map { b =>
        graft.ext.Sketches.hllDistinct(Tables.orders(s, d), "o_custkey",
            "o_orderpriority", b)
          .select(lit(b).as("b"), col("o_orderpriority"), col("n_exact"),
            col("n_buckets").cast("long").as("n_buckets"), col("est_milli"),
            expr("CAST((1000 * abs(est_milli - 1000 * n_exact)) " +
              "DIV n_exact AS BIGINT)").as("err_ppm"),
            lit(se(b)).as("theo_se_ppm"))
      }.reduce(_ unionByName _)
        .orderBy(col("b"), col("o_orderpriority"))
    }),

    // Misra–Gries heavy-hitter audit (Misra & Gries 1982; mergeable
    // per Agarwal et al. 2012): a k=256-counter summary over the corpus
    // token stream, audited against its two theorems — every token with
    // exact count > n/(k+1) is captured, and its estimate undershoots by
    // at most n/(k+1). The summary CONTENT is inherently order-
    // dependent, so the query emits only the order-INVARIANT facts: the
    // required heavy tokens (exactly reproducible by the oracle) and
    // the theorem booleans, which the Spark side computes from the REAL
    // sketch (a violated bound turns a TRUE into FALSE and the compare
    // red). CMS (q104) answers point queries with an overestimate; MG
    // lists heavy keys with a bounded underestimate — one scan, k-entry
    // partition state, driver crossing = partitions × k counters.
    "q226_misra_gries" -> ((s, d) => {
      import s.implicits._
      val k = 256
      val toks = TextAnalysis.tokenRows(Tables.documents(s, d), "text", "doc_id")
        .select(col("token"))
      val (n, summ) = graft.ext.Sketches.misraGries(toks, "token", k)
      val thr = n / (k + 1)
      val est = summ.toSeq.toDF("token", "est_cnt")
      ExtQueries.docTokenCounts(s, d)
        .where(col("cnt") > thr)
        .join(broadcast(est), Seq("token"), "left")
        .select(col("token"), col("cnt").cast("long").as("exact_cnt"),
          lit(n).as("n_stream"), lit(thr).as("threshold"), lit(k).as("k"),
          col("est_cnt").isNotNull.cast("int").as("captured"),
          (col("est_cnt").isNotNull && col("est_cnt") <= col("cnt") &&
            col("cnt") - col("est_cnt") <= lit(thr)).cast("int")
            .as("est_within_bound"))
        .orderBy(col("exact_cnt").desc, col("token"))
    }),

    // RM3-style pseudo-relevance feedback (Lavrenko & Croft 2001 made
    // integer-exact): the q55 BM25 top-10 are TREATED as relevant,
    // their postings vote expansion terms by rarity-weighted feedback
    // mass wgt = fb_tf · (n_corpus − df) — an all-BIGINT monotone
    // proxy for the relevance model's tf·idf weight (no ln at runtime,
    // so selection order can't hinge on transcendental parity; top-3
    // by wgt with term tiebreak). The expanded query then re-ranks via
    // [[graft.ext.Ranking.bm25TopKQuantized]] — per-term integer
    // quantization makes the score sum ORDER-FREE, which is what lets
    // a data-derived term set rank deterministically (the fixed-order
    // float sum of q55 needs its term list at plan-build time).
    // Feedback docs join broadcast (10 rows); expansion collect is 3
    // strings — model-sized driver crossings only.
    "q229_rm3_expansion" -> ((s, d) => {
      val qTerms = Seq("spark", "merge")
      val fb = ExtQueries.bm25Top10(s, d, qTerms).select(col("doc_id"))
      val post = ExtQueries.ftsPostingsTf(s, d)
      val dls = ExtQueries.ftsDocLengths(s, d)
      val dfall = post.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val nc = dls.agg(count(lit(1)).as("n_corpus"))
      val expTop = post.join(broadcast(fb), "doc_id")
        .where(!col("term").isin(qTerms: _*))
        .groupBy(col("term")).agg(sum(col("tf")).as("w"))
        .join(dfall, "term")
        .crossJoin(broadcast(nc))
        .withColumn("wgt", col("w") * (col("n_corpus") - col("df")))
        .orderBy(col("wgt").desc, col("term")).limit(3)
        .select(col("term")).collect().map(_.getString(0)).toSeq
      val expLit =
        if (expTop.isEmpty) lit(null).cast("string")
        else lit(expTop.mkString(" "))
      graft.ext.Ranking.bm25TopKQuantized(post, dls, qTerms ++ expTop, 10)
        .withColumn("exp_terms", expLit)
        .select(col("rank"), col("doc_id"), col("score_q"), col("exp_terms"))
        .orderBy(col("rank"))
    }),

    // BPE merge-candidate statistics: top-50 adjacent token pairs by
    // corpus frequency (one merge round of a tokenizer build).
    "q82_bpe_pairs" -> ((s, d) =>
      TextAnalysis.tokenPairTopKFromCounts(
          ExtQueries.docSourcePairCounts(s, d)
            .groupBy(col("tok_a"), col("tok_b")).agg(sum(col("n")).as("n")), 50)
        .orderBy(col("rank"))),

    // Rank-ensemble quality filter (the DataComp/Dolma-style multi-
    // signal blend): three independent per-doc signals — integer
    // quality score, Gopher dup-bigram ppm, token length — each ranked
    // WITHIN ITS LANGUAGE (signals aren't comparable across languages),
    // then blended by integer rank sum; top-5 per language survive.
    // Rank-blending needs no signal normalization — exactly why
    // production filters ensemble ranks, not raw scores.
    // Ranks come from ops.ShardedRank, NOT Window.partitionBy(lang):
    // a per-lang window caps parallelism at #languages and runs
    // near-serially when one language dominates (every real crawl —
    // the r10 counter finding: cpu ≈ wall on a 32-core box). The
    // range-shard form computes the identical row_number from one
    // balanced range shuffle + count offsets. The slim base (5 cols)
    // is persisted once — the rank legs and the final blend re-read
    // it instead of re-tokenizing the corpus four times.
    "q155_quality_ensemble" -> ((s, d) => {
      import graft.ops.{ShardedRank, TransientCache}
      val prof = ExtQueries.docProfile(s, d)
        .select(col("doc_id").cast("long").as("doc_id"), col("lang"),
          col("quality"), col("n_tokens").cast("long").as("n_tokens"))
      val rep = TextAnalysis.repetitionProfile(
          Tables.documents(s, d), "text", "doc_id")
        .select(col("doc_id"), col("dup_ppm"))
      val base = TransientCache.persist(prof.join(rep, "doc_id")
        .select(col("doc_id"), col("lang"), col("quality"),
          col("dup_ppm"), col("n_tokens")))
      // All three signal ranks in ONE ShardedRank pass: unpivot to
      // (lang, sig, key, doc_id) — descending signals negate the key
      // (tie stays doc_id asc) — and rank within (lang, sig). One rank
      // plan instead of three structurally-identical ones: same answer,
      // a third of the stage/codegen overhead.
      val sigs = base.select(col("lang"), col("doc_id"),
        explode(map(
          lit(1), -col("quality").cast("long"),
          lit(2), col("dup_ppm").cast("long"),
          lit(3), -col("n_tokens").cast("long"))).as(Seq("sig", "key")))
      val ranks = ShardedRank
        .withRank(sigs, Seq("lang", "sig"), col("key"), col("doc_id"), "rn")
        .groupBy(col("doc_id")).agg(
          max(when(col("sig") === 1, col("rn"))).as("r_q"),
          max(when(col("sig") === 2, col("rn"))).as("r_rep"),
          max(when(col("sig") === 3, col("rn"))).as("r_len"))
      val ranked = base.join(ranks, "doc_id")
        .withColumn("sum_rank",
          (col("r_q") + col("r_rep") + col("r_len")).cast("long"))
      // The top-5 blend needs no full rank: row_number + `rank <= 5`
      // triggers Spark's WindowGroupLimit pushdown, which keeps only 5
      // rows per (lang, input partition) BEFORE the per-lang shuffle —
      // the final window sorts ≤ 5·P rows per language whatever the
      // corpus size, so the per-lang partition here is skew-safe.
      val wTop = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(col("sum_rank"), col("doc_id"))
      ranked.withColumn("rank", row_number().over(wTop))
        .where(col("rank") <= 5)
        .select(col("lang"), col("rank"), col("doc_id"), col("quality"),
          col("dup_ppm"), col("n_tokens"), col("sum_rank"))
        .orderBy(col("lang"), col("rank"))
    }),

    // Full iterative BPE tokenizer TRAINING (Sennrich et al. 2016) —
    // q82's single-step pair statistics run to completion: 8 merge
    // rounds over the word-frequency table (the session tok_counts
    // artifact capped to the top-1000 words — model-sized driver state,
    // the centroid discipline; cap is CONTRACT, oracle-mirrored).
    // Deterministic total order per round (count desc, pair asc); the
    // oracle replays the identical loop as 8 unrolled SQL iterations
    // over guarded-string segmentations.
    "q153_bpe_train" -> ((s, d) => {
      import s.implicits._
      val merges = bpeMerges(s, d)
      merges.map(m => (m.rank, m.symA, m.symB, m.pairCount))
        .toDF("rank", "sym_a", "sym_b", "pair_count")
        .orderBy(col("rank"))
    }),

    // Corpus ENCODE under the trained merges: the tokenize step of the
    // pipeline. Merges bake into the plan as a chain of codegen'd
    // replace() calls over each token's guarded char segmentation —
    // scan-speed, no lookup table, unseen words encode by rule. Output:
    // per-source encoded token mass + the chars-per-symbol compression
    // the tokenizer achieves (the number a tokenizer build is judged
    // by), integer-exact in ppm.
    "q154_bpe_encode" -> ((s, d) => {
      val merges = bpeMerges(s, d)
      graft.queries.ExtQueries.docSourceTokenCounts(s, d)
        .withColumn("n_syms",
          graft.ext.Bpe.encodedLenCol(col("token"), merges).cast("long"))
        .withColumn("n_ch", length(col("token")).cast("long"))
        .groupBy(col("source"))
        .agg(sum(col("cnt")).as("n_tokens"),
          sum(col("cnt") * col("n_ch")).as("n_chars"),
          sum(col("cnt") * col("n_syms")).as("n_bpe_tokens"))
        .withColumn("compression_ppm",
          expr("(1000000 * n_bpe_tokens) div n_chars"))
        .orderBy(col("source"))
    }),

    // Tokenizer fertility per LANGUAGE: BPE symbols emitted per word
    // under the same trained merge table q153/q154 use — the
    // multilingual-equity metric (a language whose words fragment into
    // more symbols pays more context budget per word; the ratio
    // multilingual tokenizer builds are judged by, cf. the fertility
    // tables in the mT5/XLM-R literature). Encode cost is
    // vocabulary-sized — one codegen'd replace chain per DISTINCT
    // (lang, token) pair — and the corpus weighting is the same
    // count-aggregate shape as q154's per-source roll-up.
    "q200_bpe_fertility" -> ((s, d) => {
      val merges = bpeMerges(s, d)
      graft.ext.TextAnalysis
        .tokenRows(Tables.documents(s, d), "text", "doc_id")
        .join(Tables.documents(s, d)
          .select(col("doc_id").cast("long").as("doc"), col("lang")), "doc")
        .groupBy(col("lang"), col("token")).agg(count(lit(1)).as("cnt"))
        .withColumn("n_syms",
          graft.ext.Bpe.encodedLenCol(col("token"), merges).cast("long"))
        .groupBy(col("lang"))
        .agg(sum(col("cnt")).as("n_words"),
          sum(col("cnt") * col("n_syms")).as("n_bpe_tokens"))
        .select(col("lang"), col("n_words"), col("n_bpe_tokens"),
          expr("(1000000 * n_bpe_tokens) div n_words").as("fertility_ppm"))
        .orderBy(col("lang"))
    }),

    // Salted fact⋈dim join (skew lever for forced-shuffle plans): salt
    // disappears before the aggregate, so the result is exactly the
    // plain join's — which is what the oracle checks.
    "q83_salted_join" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_suppkey").as("suppkey"), col("l_extendedprice"))
      val sup = Tables.supplier(s, d)
        .join(Tables.nation(s, d), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey").as("suppkey"), col("n_name"))
      graft.ops.ScaleOps.saltedJoin(li, sup, "suppkey", 8)
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).as("revenue"))
        .orderBy(col("n_name"))
        
    }),

    // Skew salt plan: turn the per-key frequency profile into the
    // partitioning DECISION — for the heaviest shuffle keys, the salt
    // factor that would spread each one to <= T rows per reducer, and
    // the post-salt max reducer load that results (all integer-exact
    // ceil division). This is the measured input the q83 salting lever
    // and AQE's skew threshold otherwise take on faith.
    "q143_salt_plan" -> ((s, d) => {
      val target = 4096L
      // TakeOrdered head FIRST (distributed top-k), THEN the rank window
      // over only 20 rows — the q65 shape; a global row_number over the
      // whole vocabulary would single-partition it.
      val head = ExtQueries.docTokenCounts(s, d)
        .orderBy(col("cnt").desc, col("token")).limit(20)
        .withColumn("salt", expr(s"(cnt + ${target - 1}) div $target"))
        .withColumn("post_salt_rows", expr("(cnt + salt - 1) div salt"))
      head.withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("cnt").desc, col("token"))))
        .select(col("rank"), col("token"), col("cnt"), col("salt"),
          col("post_salt_rows"))
        .orderBy(col("rank"))
    }),

    // Bloom-pruned fact⋈dim join (runtime-filter lever, complement of
    // q83's salting): the selective dim predicate (p_size <= 2, ~4% of
    // parts) is compiled into a fixed-size bit filter that prunes the
    // fact BEFORE its shuffle; the exact join then removes the bloom's
    // false positives, so the result is exactly the plain join's — which
    // is what the oracle checks.
    "q141_bloom_prune_join" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
      val p = Tables.part(s, d).where(col("p_size") <= 2)
        .select(col("p_partkey"), col("p_brand"))
      graft.ops.ScaleOps.bloomPruneJoin(li, p, "l_partkey", "p_partkey")
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .as("revenue"))
        .orderBy(col("p_brand"))
        
    }),

    // UniMax language-balanced budget allocation (Chung et al. 2023):
    // water-fill 95% of the corpus token mass across languages with a
    // 1-epoch per-language cap — the successor to q120's temperature
    // sampling (caps repetition of low-resource languages instead of
    // upweighting them past usefulness). At this corpus the four
    // lower-mass languages cap at one full epoch and the high-resource
    // language absorbs the leftover — the regime the paper targets.
    // Closed-form prefix predicate, all-integer; PipelinePropertySpec
    // pins it against the paper's sequential greedy.
    "q144_unimax_alloc" -> ((s, d) => {
      val counts = ExtQueries.docProfile(s, d)
        .groupBy(col("lang"))
        .agg(sum(col("n_tokens").cast("bigint")).as("n_tokens"))
      Sampling.unimaxAlloc(counts, "lang", "n_tokens", 950000L, 1L)
        .orderBy(col("lang"))
    }),

    // End-to-end curation pipeline — the operators above composed the way
    // a training-data build actually chains them, as ONE declarative DAG
    // (Catalyst sees every stage; nothing materializes between steps):
    // quality gate (q41) -> exact dedup keep-lowest-id (q22) -> benchmark
    // decontamination (q64, any shared trigram) -> deterministic split
    // (q79) -> per-(split, lang) doc/token accounting.
    "q86_curation_pipeline" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      val bench = docs.where(col("source") === "src0")
      // Profile filter is row-wise, so slicing the shared full-table
      // profile equals profiling the pre-filtered corpus.
      val prof = ExtQueries.docProfile(s, d).where(col("source") =!= "src0")
        .where(col("quality") >= 35 && col("n_tokens") >= 5)
        .select(col("doc_id"), col("lang"), col("text"), col("n_tokens"))
      val w = Window.partitionBy(col("content_hash")).orderBy(col("doc_id"))
      val deduped = prof
        .withColumn("content_hash",
          md5(TextAnalysis.normalize(col("text")).cast("binary")))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1).drop("rn")
      val contaminated = Contamination
        .benchmarkOverlap(deduped, bench, "text", "doc_id", 3)
        .where(col("n_hit") > 0).select(col("doc_id"))
      val clean = deduped.join(contaminated, Seq("doc_id"), "left_anti")
      Sampling.splitAssign(clean, "doc_id", 0.8, 0.1)
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
        .orderBy(col("split"), col("lang"))
    }),

    // Leakage-free split: every SimHash near-dup component (the shared
    // q54 session artifact) lands WHOLE in one split — the draw runs on
    // the component id, singleton docs on their own id. Near-identical
    // train/test pairs are how eval numbers silently inflate; this is
    // the split-stage guard (Lee et al. 2022 §6).
    "q129_leakage_split" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val comps = ExtQueries.simhashComps(s, d)
        .select(col("doc").as("doc_id"), col("comp"))
      Sampling.groupAwareSplit(
          docs.join(comps, Seq("doc_id"), "left"), "doc_id", "comp", 0.8, 0.1)
        .select(col("doc_id"), col("group_key"), col("draw"), col("split"))
        .orderBy(col("doc_id"))
    }),

    // Quality-curriculum manifest: per-source NTILE(4) bins over the
    // shared profile's quality score — doc counts, token mass and score
    // envelope per bin, the table a curriculum sampler schedules from.
    "q130_curriculum_bins" -> ((s, d) =>
      Sampling.curriculumBins(
          ExtQueries.docProfile(s, d)
            .select(col("source"), col("doc_id"), col("quality"), col("n_tokens")),
          "source", "quality", "doc_id", "n_tokens", 4)
        .orderBy(col("source"), col("bin"))),

    // Greedy per-source token-budget selection: best-quality documents
    // first until each source's inclusive running token sum hits the
    // budget — the "top N tokens per domain" cut of a budgeted corpus.
    "q131_budget_select" -> ((s, d) =>
      Sampling.budgetSelect(
          ExtQueries.docProfile(s, d)
            .select(col("source"), col("doc_id"), col("quality"), col("n_tokens")),
          "source", "quality", "doc_id", "n_tokens", 800L)
        .orderBy(col("doc_id"))),

    // Hybrid retrieval rank fusion (Cormack et al. 2009 RRF): the BM25
    // lexical top-50 and the embedding cosine top-50 (query vector 0,
    // vec_id aligns 1:1 with doc_id) fused by reciprocal rank,
    // quantized integer-exact (1e9 div (60+rank)) — the standard
    // lexical+semantic hybrid search shape, both legs riding session
    // index artifacts.
    "q135_hybrid_rrf" -> ((s, d) => {
      val lex = Ranking.bm25TopKFromIndex(ExtQueries.ftsPostingsTf(s, d),
          ExtQueries.ftsDocLengths(s, d), Seq("spark", "merge"), 50)
        .select(col("doc_id"), col("rank").as("lex_rank"))
      val sem = Similarity.bruteForceTopK(Tables.embeddings(s, d), "vec_id",
          "embedding", col("vec_id") === 0, 50)
        .select(col("vec_id").cast("long").as("doc_id"), col("rank").as("sem_rank"))
      lex.join(sem, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          coalesce(col("lex_rank"), lit(0)).as("lex_rank"),
          coalesce(col("sem_rank"), lit(0)).as("sem_rank"),
          (coalesce(expr("1000000000 div (60 + lex_rank)"), lit(0L)) +
            coalesce(expr("1000000000 div (60 + sem_rank)"), lit(0L)))
            .as("rrf_score"))
        .orderBy(desc("rrf_score"), col("doc_id"))
        .limit(20)
    }),

    // DSIR importance resampling (Xie et al. 2023): hashed-bigram
    // log-ratio scores against the Spanish slice as the target
    // distribution; the 100 highest-scoring docs are the resampled
    // selection (deterministic top-k stand-in for the Gumbel draw).
    "q133_dsir_select" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      // The hashed-bigram profile is the artifact DSIR materializes once
      // per corpus; the model refit against a target slice is the cheap,
      // per-query half (512-row broadcast).
      val profile = graft.ops.SessionCache.getOrBuild(s, s"dsir_buckets:$d")(
        Sampling.dsirBucketCounts(docs, "text", "doc_id", 512))
      Sampling.dsirScoresFromBuckets(docs, profile, "doc_id",
          col("lang") === "es", 512)
        .join(docs.select(col("doc_id").as("doc"), col("lang")), "doc")
        .orderBy(desc("score"), col("doc"))
        .limit(100)
        .select(col("doc").as("doc_id"), col("lang"),
          col("score"), col("n_bigrams"))
    })
  )

  // ---------------------------------------------------------------- oracles

  /** Accent-folded tokenization CTE (mirrors Ranking.postingsWithTf's
    * fold+normalize+tokenize; q49's pipeline). */
  private val tokfCte =
    s"""WITH tokf AS (
       |  SELECT doc_id, list_filter(string_split(
       |    regexp_replace(lower(translate(text,
       |      '${TextAnalysis.accentFrom}', '${TextAnalysis.accentTo}')),
       |      '[^a-z0-9 ]', ' ', 'g'), ' '), x -> len(x) > 0) t
       |  FROM documents)""".stripMargin

  /** Shared BM25 scaffolding (accent-folded postings, doc lengths,
    * corpus stats) — one copy per oracle no matter how many query legs
    * ride it; per-query ranking legs come from [[bm25RankCtes]]. */
  private val bm25BaseCtes =
    s"""$tokfCte,
       |post AS (SELECT doc_id, unnest(t) term FROM tokf),
       |dl AS (SELECT doc_id, len(t) dl FROM tokf),
       |stats AS (SELECT count(*) n_corpus, sum(dl) tot_dl,
       |            CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) avgdl
       |          FROM dl)""".stripMargin

  /** One BM25 query leg over [[bm25BaseCtes]]'s `post`/`dl`/`stats`:
    * ends at `r_<qid>(doc_id, score_q, rank)` = the quantized-score
    * top-k with the engine's (score_q DESC, doc_id) tie rule. */
  private def bm25RankCtes(qid: String, terms: Seq[String], k: Int): String = {
    val inList = terms.map(t => s"'$t'").mkString(", ")
    val fixedSum = terms.map(t =>
      s"COALESCE(sum(CASE WHEN term = '$t' THEN sc END), CAST(0.0 AS DOUBLE))")
      .mkString("\n    + ")
    s"""tf_$qid AS (SELECT term, doc_id, count(*) tf
       |       FROM post WHERE term IN ($inList) GROUP BY 1, 2),
       |dft_$qid AS (SELECT term, count(*) df_t FROM tf_$qid GROUP BY 1),
       |sc_$qid AS (SELECT tf.doc_id, tf.term,
       |    ln(CAST(1.0 AS DOUBLE) +
       |       (CAST(n_corpus AS DOUBLE) - CAST(df_t AS DOUBLE) + CAST(0.5 AS DOUBLE))
       |       / (CAST(df_t AS DOUBLE) + CAST(0.5 AS DOUBLE)))
       |    * ((CAST(tf AS DOUBLE) * CAST(2.2 AS DOUBLE))
       |       / (CAST(tf AS DOUBLE) + CAST(1.2 AS DOUBLE) *
       |          (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * CAST(dl AS DOUBLE) / avgdl))) sc
       |  FROM tf_$qid tf JOIN dl USING (doc_id) JOIN dft_$qid USING (term) CROSS JOIN stats),
       |tot_$qid AS (SELECT doc_id,
       |    $fixedSum s
       |  FROM sc_$qid GROUP BY doc_id),
       |r_$qid AS (SELECT doc_id, score_q, rank FROM (
       |    SELECT doc_id, CAST(floor(s * CAST(1000.0 AS DOUBLE)) AS BIGINT) score_q,
       |      CAST(row_number() OVER (
       |        ORDER BY CAST(floor(s * CAST(1000.0 AS DOUBLE)) AS BIGINT) DESC, doc_id)
       |        AS INT) rank
       |    FROM tot_$qid) WHERE rank <= $k)""".stripMargin
  }

  /** CTE chain ending at `wl(token, n_syms)` — every distinct corpus
    * token encoded under the trained merges (the same e0..e8 replace
    * chain the Spark plan bakes in). Shared by the q154 and q200
    * oracles so the encode they weight cannot drift. */
  private def bpeEncodeWlSql: String = {
    val encodeChain = (1 to 8).map { i =>
      s"""e$i AS MATERIALIZED (SELECT token,
         |  replace(seg,
         |    ' ' || (SELECT a FROM b$i) || ' ' || (SELECT b FROM b$i) || ' ',
         |    ' ' || (SELECT a FROM b$i) || (SELECT b FROM b$i) || ' ') seg
         |  FROM e${i - 1})""".stripMargin
    }.mkString(",\n")
    s"""${bpeTrainSql(8)},
       |allw AS (SELECT DISTINCT token FROM pp),
       |e0 AS MATERIALIZED (SELECT token,
       |         ' ' || array_to_string(string_split(token, ''), ' ') || ' ' seg
       |       FROM allw),
       |$encodeChain,
       |wl AS (SELECT token,
       |         CAST(len(string_split(trim(seg), ' ')) AS BIGINT) n_syms
       |       FROM e8)""".stripMargin
  }

  private def bm25Sql(terms: Seq[String], k: Int): String =
    s"""$bm25BaseCtes,
       |${bm25RankCtes("q", terms, k)}
       |SELECT doc_id, score_q, rank FROM r_q ORDER BY rank""".stripMargin

  /** Distinct word trigrams per doc (mirrors Dedup.shingleRows n=3). */
  private[queries] val trigramCtes =
    s"""${ExtQueries.tokCte},
       |u AS (SELECT doc_id, t, unnest(t) w, generate_subscripts(t, 1) i FROM tok),
       |g AS (SELECT DISTINCT doc_id, w || ' ' || t[i+1] || ' ' || t[i+2] s
       |      FROM u WHERE i + 2 <= len(t))""".stripMargin

  /** Unrolled SQL twin of the BPE training loop: s0 = guarded char
    * segmentations of the capped word-frequency head; each round i
    * extracts adjacent symbol pairs, picks the (count desc, pair asc)
    * winner b{i}, and rewrites segmentations with the contract's single
    * non-overlapping replace. Shared by the q153 and q154 oracles so
    * the training they verify cannot drift. */
  private def bpeTrainSql(rounds: Int): String = {
    val base =
      s"""${ExtQueries.tokCte},
         |pp AS (SELECT unnest(t) token FROM tok),
         |wf AS (SELECT token, CAST(count(*) AS BIGINT) cnt FROM pp
         |       GROUP BY 1 ORDER BY cnt DESC, token LIMIT 1000),
         |s0 AS MATERIALIZED (SELECT token, cnt,
         |         ' ' || array_to_string(string_split(token, ''), ' ') || ' ' seg
         |       FROM wf)""".stripMargin
    val iters = (1 to rounds).map { i =>
      s"""p$i AS (SELECT t.cnt, t.sym[j.j] a, t.sym[j.j + 1] b
         |  FROM (SELECT cnt, string_split(trim(seg), ' ') sym FROM s${i - 1}) t,
         |  LATERAL (SELECT unnest(generate_series(1, len(t.sym) - 1)) j) j),
         |c$i AS (SELECT a, b, CAST(sum(cnt) AS BIGINT) n FROM p$i GROUP BY 1, 2),
         |b$i AS MATERIALIZED (SELECT a, b, n FROM c$i ORDER BY n DESC, a, b LIMIT 1),
         |s$i AS MATERIALIZED (SELECT token, cnt,
         |  replace(seg,
         |    ' ' || (SELECT a FROM b$i) || ' ' || (SELECT b FROM b$i) || ' ',
         |    ' ' || (SELECT a FROM b$i) || (SELECT b FROM b$i) || ' ') seg
         |  FROM s${i - 1})""".stripMargin
    }
    (base +: iters).mkString(",\n")
  }

  val oracles: Map[String, String] = Map(

    "q64_decontaminate" ->
      s"""$trigramCtes,
         |b AS (SELECT DISTINCT s FROM g JOIN documents USING (doc_id)
         |      WHERE source = 'src0'),
         |c AS (SELECT g.doc_id, g.s FROM g JOIN documents USING (doc_id)
         |      WHERE source <> 'src0'),
         |a AS (SELECT doc_id, CAST(count(*) AS BIGINT) n_grams,
         |        CAST(count(b.s) AS BIGINT) n_hit
         |      FROM c LEFT JOIN b ON c.s = b.s GROUP BY 1)
         |SELECT doc_id, n_grams, n_hit,
         |  CAST((1000000 * n_hit) // n_grams AS BIGINT) AS hit_ppm
         |FROM a ORDER BY doc_id""".stripMargin,

    // q226 oracle: the required heavy set is exact SQL; the theorem
    // columns are literals BECAUSE they are theorems — the Spark side
    // computes them from the live sketch, so a broken implementation
    // (a missing heavy key, an out-of-bound estimate) flips a boolean
    // and fails the hash compare.
    "q226_misra_gries" ->
      s"""${ExtQueries.tokCte},
         |p AS (SELECT unnest(t) token FROM tok),
         |f AS (SELECT token, CAST(count(*) AS BIGINT) exact_cnt
         |      FROM p GROUP BY 1),
         |t AS (SELECT CAST(sum(exact_cnt) AS BIGINT) n_stream FROM f)
         |SELECT token, exact_cnt, n_stream,
         |  CAST(n_stream // 257 AS BIGINT) threshold, CAST(256 AS INT) k,
         |  CAST(1 AS INT) captured, CAST(1 AS INT) est_within_bound
         |FROM f, t WHERE exact_cnt > n_stream // 257
         |ORDER BY exact_cnt DESC, token""".stripMargin,

    // q229 oracle: base leg via the shared fixed-order BM25 scaffold;
    // expansion selection and the expanded leg in generic SQL — legal
    // here BECAUSE the per-term floor makes the sum integer (order-
    // free), mirroring bm25TopKQuantized exactly.
    "q229_rm3_expansion" ->
      s"""$bm25BaseCtes,
         |${bm25RankCtes("q0", Seq("spark", "merge"), 10)},
         |fb AS (SELECT doc_id FROM r_q0),
         |dfall AS (SELECT term, count(DISTINCT doc_id) df
         |          FROM post GROUP BY 1),
         |expt AS (SELECT p.term, CAST(count(*) AS BIGINT) w
         |         FROM post p JOIN fb USING (doc_id)
         |         WHERE p.term NOT IN ('spark', 'merge') GROUP BY 1),
         |expf AS (SELECT term, w,
         |           CAST(w * (CAST(n_corpus AS BIGINT) - CAST(df AS BIGINT))
         |             AS BIGINT) wgt
         |         FROM expt JOIN dfall USING (term) CROSS JOIN stats
         |         ORDER BY wgt DESC, term LIMIT 3),
         |terms2 AS (SELECT term FROM expf
         |           UNION ALL SELECT 'spark' UNION ALL SELECT 'merge'),
         |tf2 AS (SELECT p.term, doc_id, count(*) tf FROM post p
         |        JOIN terms2 USING (term) GROUP BY 1, 2),
         |dft2 AS (SELECT term, count(*) df_t FROM tf2 GROUP BY 1),
         |sc2 AS (SELECT tf.doc_id,
         |    CAST(floor(
         |      ln(CAST(1.0 AS DOUBLE) +
         |         (CAST(n_corpus AS DOUBLE) - CAST(df_t AS DOUBLE) + CAST(0.5 AS DOUBLE))
         |         / (CAST(df_t AS DOUBLE) + CAST(0.5 AS DOUBLE)))
         |      * ((CAST(tf AS DOUBLE) * CAST(2.2 AS DOUBLE))
         |         / (CAST(tf AS DOUBLE) + CAST(1.2 AS DOUBLE) *
         |            (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * CAST(dl AS DOUBLE) / avgdl)))
         |      * CAST(1000.0 AS DOUBLE)) AS BIGINT) sq
         |  FROM tf2 tf JOIN dl USING (doc_id) JOIN dft2 USING (term)
         |  CROSS JOIN stats),
         |tot2 AS (SELECT doc_id, CAST(sum(sq) AS BIGINT) score_q
         |         FROM sc2 GROUP BY 1),
         |r2 AS (SELECT doc_id, score_q,
         |         CAST(row_number() OVER (ORDER BY score_q DESC, doc_id)
         |           AS INT) rank
         |       FROM tot2),
         |es AS (SELECT string_agg(term, ' ' ORDER BY wgt DESC, term) s
         |       FROM expf)
         |SELECT rank, doc_id, score_q, (SELECT s FROM es) exp_terms
         |FROM r2 WHERE rank <= 10 ORDER BY rank""".stripMargin,

    "q65_vocab_topk" ->
      s"""${ExtQueries.tokCte},
         |p AS (SELECT doc_id, unnest(t) token FROM tok),
         |f AS (SELECT token, CAST(count(*) AS BIGINT) freq,
         |        CAST(count(DISTINCT doc_id) AS BIGINT) doc_freq
         |      FROM p GROUP BY 1)
         |SELECT CAST(row_number() OVER (ORDER BY freq DESC, token) AS INT) AS rank,
         |  token, freq, doc_freq
         |FROM f QUALIFY rank <= 50 ORDER BY rank""".stripMargin,

    "q69_dup_gram_share" ->
      s"""$trigramCtes,
         |gdf AS (SELECT s, count(*) gdf FROM g GROUP BY 1),
         |a AS (SELECT doc_id, CAST(count(*) AS BIGINT) n_grams,
         |        CAST(sum(CASE WHEN gdf >= 2 THEN 1 ELSE 0 END) AS BIGINT) n_shared
         |      FROM g JOIN gdf USING (s) GROUP BY 1)
         |SELECT doc_id, n_grams, n_shared,
         |  CAST((1000000 * n_shared) // n_grams AS BIGINT) AS shared_ppm
         |FROM a ORDER BY doc_id""".stripMargin,

    "q80_neardup_degree" ->
      s"""WITH ${ExtQueries.simhashHammingCtes.stripPrefix("WITH ")},
         |e AS (SELECT doc_a doc FROM hp UNION ALL SELECT doc_b FROM hp),
         |deg AS (SELECT doc, count(*) degree FROM e GROUP BY 1)
         |SELECT CAST(degree AS BIGINT) AS degree, count(*) AS n_docs
         |FROM deg GROUP BY 1 ORDER BY 1""".stripMargin,

    "q77_value_outliers" ->
      """WITH q AS (SELECT event_type,
        |    CAST(floor(CAST(value AS DOUBLE) * 1000) AS BIGINT) vq
        |  FROM events),
        |st AS (SELECT event_type, count(*) n, CAST(sum(vq) AS BIGINT) sm,
        |         CAST(sum(CAST(vq AS HUGEINT) * vq) AS HUGEINT) ssq
        |       FROM q GROUP BY 1),
        |f AS (SELECT q.event_type, vq, n, sm, ssq,
        |        CAST(n AS HUGEINT) * vq - sm AS dev,
        |        4 * (CAST(n AS HUGEINT) * ssq - CAST(sm AS HUGEINT) * sm) AS var4
        |      FROM q JOIN st USING (event_type))
        |SELECT f.event_type, count(*) AS n,
        |  CAST(min(sm // n) AS BIGINT) AS mean_q,
        |  CAST(sum(CASE WHEN dev * dev > var4 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,

    "q191_basket_lift" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        |n AS (SELECT event_type, CAST(count(*) AS BIGINT) n FROM ut GROUP BY 1),
        |nu AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) n_users FROM ut),
        |pr AS (SELECT a.event_type type_a, b.event_type type_b,
        |         CAST(count(*) AS BIGINT) n_ab
        |       FROM ut a JOIN ut b ON a.user_id = b.user_id
        |         AND a.event_type < b.event_type
        |       GROUP BY 1, 2)
        |SELECT type_a, type_b, na.n n_a, nb.n n_b, n_ab,
        |  CAST((1000000 * n_ab) // n_users AS BIGINT) support_ppm,
        |  CAST((1000000 * n_ab) // na.n AS BIGINT) conf_a_to_b_ppm,
        |  CAST((1000000 * n_ab * n_users) // (na.n * nb.n) AS BIGINT) lift_ppm
        |FROM pr JOIN n na ON type_a = na.event_type
        |JOIN n nb ON type_b = nb.event_type CROSS JOIN nu
        |ORDER BY type_a, type_b""".stripMargin,

    "q78_event_transitions" ->
      """WITH s AS (SELECT event_type,
        |    lead(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) to_type
        |  FROM events)
        |SELECT event_type AS from_type, to_type, count(*) AS n
        |FROM s WHERE to_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q79_split_assign" -> {
      val t80 = graft.ext.Sampling.hexThreshold(0.8)
      val t90 = graft.ext.Sampling.hexThreshold(0.9)
      s"""SELECT doc_id, substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS draw,
         |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '$t80' THEN 'train'
         |    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '$t90' THEN 'val'
         |    ELSE 'test' END AS split
         |FROM documents ORDER BY doc_id""".stripMargin
    },

    // q54's component CTE + q79's split algebra, drawn on the group key.
    "q129_leakage_split" -> {
      val t80 = graft.ext.Sampling.hexThreshold(0.8)
      val t90 = graft.ext.Sampling.hexThreshold(0.9)
      s"""WITH RECURSIVE ${ExtQueries.simhashHammingCtes.stripPrefix("WITH ")},
         |e AS (SELECT doc_a a, doc_b b FROM hp
         |      UNION SELECT doc_b, doc_a FROM hp),
         |r AS (SELECT a AS node, a AS reach FROM e
         |      UNION
         |      SELECT r.node, e.b FROM r JOIN e ON r.reach = e.a),
         |comp AS (SELECT node AS doc_id, min(reach) AS component
         |         FROM r GROUP BY node),
         |g AS (SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS group_key
         |      FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id)
         |SELECT doc_id, group_key,
         |  substr(md5(CAST(group_key AS VARCHAR)), 1, 8) AS draw,
         |  CASE WHEN substr(md5(CAST(group_key AS VARCHAR)), 1, 8) < '$t80' THEN 'train'
         |    WHEN substr(md5(CAST(group_key AS VARCHAR)), 1, 8) < '$t90' THEN 'val'
         |    ELSE 'test' END AS split
         |FROM g ORDER BY doc_id""".stripMargin
    },

    "q130_curriculum_bins" ->
      s"""${ExtQueries.tokCte},
         |q AS (SELECT doc_id, ${ExtQueries.qualitySql} quality,
         |        CAST(len(t) AS INT) n_tokens FROM tok),
         |j AS (SELECT d.source, q.doc_id, q.quality, q.n_tokens
         |      FROM q JOIN documents d USING (doc_id)),
         |b AS (SELECT source, quality, n_tokens,
         |        NTILE(4) OVER (PARTITION BY source
         |          ORDER BY quality DESC, doc_id) bin
         |      FROM j)
         |SELECT source, CAST(bin AS INT) AS bin, count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
         |  CAST(min(quality) AS BIGINT) AS min_score,
         |  CAST(max(quality) AS BIGINT) AS max_score
         |FROM b GROUP BY source, bin ORDER BY source, bin""".stripMargin,

    "q131_budget_select" ->
      s"""${ExtQueries.tokCte},
         |q AS (SELECT doc_id, ${ExtQueries.qualitySql} quality,
         |        CAST(len(t) AS INT) n_tokens FROM tok),
         |j AS (SELECT d.source, q.doc_id, q.quality, q.n_tokens
         |      FROM q JOIN documents d USING (doc_id)),
         |c AS (SELECT source, doc_id, quality, n_tokens,
         |        CAST(sum(n_tokens) OVER (PARTITION BY source
         |          ORDER BY quality DESC, doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |          AS cum_tokens
         |      FROM j)
         |SELECT source, doc_id, quality, n_tokens, cum_tokens
         |FROM c WHERE cum_tokens <= 800 ORDER BY doc_id""".stripMargin,

    "q135_hybrid_rrf" ->
      s"""${ExtQueries.qeCtes},
         |m0 AS (SELECT c.vec_id doc_id,
         |         row_number() OVER (ORDER BY
         |           CAST(list_dot_product(q0.q, c.q) AS DOUBLE)
         |             / sqrt(CAST(n0.n AS DOUBLE) * CAST(nc.n AS DOUBLE)) DESC,
         |           c.vec_id) rnk
         |       FROM qe c
         |       CROSS JOIN (SELECT q FROM qe WHERE vec_id = 0) q0
         |       CROSS JOIN (SELECT n FROM nrm WHERE vec_id = 0) n0
         |       JOIN nrm nc ON c.vec_id = nc.vec_id
         |       WHERE c.vec_id <> 0),
         |m AS (SELECT doc_id, rnk FROM m0 WHERE rnk <= 50),
         |l AS (SELECT doc_id, rank rnk FROM (${bm25Sql(Seq("spark", "merge"), 50)})),
         |f AS (SELECT coalesce(l.doc_id, m.doc_id) doc_id, l.rnk lr, m.rnk mr
         |      FROM l FULL JOIN m ON l.doc_id = m.doc_id)
         |SELECT doc_id,
         |  CAST(coalesce(lr, 0) AS INT) AS lex_rank,
         |  CAST(coalesce(mr, 0) AS INT) AS sem_rank,
         |  CAST(coalesce(1000000000 // (60 + lr), 0)
         |     + coalesce(1000000000 // (60 + mr), 0) AS BIGINT) AS rrf_score
         |FROM f
         |ORDER BY rrf_score DESC, doc_id LIMIT 20""".stripMargin,

    "q133_dsir_select" ->
      s"""${ExtQueries.tokCte},
         |pr AS (SELECT doc_id, t[i] || '_' || t[i+1] g
         |       FROM tok, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) s
         |       WHERE len(t) >= 2),
         |b AS (SELECT doc_id, ('0x' || substr(md5(g), 1, 8))::BIGINT % 512 bucket FROM pr),
         |db AS (SELECT doc_id, bucket, count(*) c FROM b GROUP BY 1, 2),
         |m AS (SELECT bucket,
         |        sum(CASE WHEN d.lang = 'es' THEN c ELSE 0 END) tc,
         |        sum(c) rc
         |      FROM db JOIN documents d USING (doc_id) GROUP BY 1),
         |tot AS (SELECT sum(tc) tt, sum(rc) rt FROM m),
         |lam AS (SELECT bucket,
         |          CAST(floor(1000 * ln(
         |            (CAST(tc + 1 AS DOUBLE) * CAST(rt + 512 AS DOUBLE)) /
         |            (CAST(rc + 1 AS DOUBLE) * CAST(tt + 512 AS DOUBLE)))) AS BIGINT) lambda
         |        FROM m, tot),
         |sc AS (SELECT doc_id, CAST(sum(c * lambda) AS BIGINT) score,
         |         CAST(sum(c) AS BIGINT) n_bigrams
         |       FROM db JOIN lam USING (bucket) GROUP BY 1)
         |SELECT sc.doc_id, d.lang, score, n_bigrams
         |FROM sc JOIN documents d USING (doc_id)
         |ORDER BY score DESC, doc_id LIMIT 100""".stripMargin,

    "q75_cube_tokens" ->
      s"""${ExtQueries.tokCte},
         |d AS (SELECT doc_id, len(t) n_tok FROM tok),
         |j AS (SELECT lang, source, n_tok FROM d JOIN documents USING (doc_id))
         |SELECT lang, source, count(*) AS n_docs,
         |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
         |  CAST(GROUPING(lang, source) AS INT) AS gid
         |FROM j GROUP BY CUBE (lang, source)
         |ORDER BY gid, lang NULLS FIRST, source NULLS FIRST""".stripMargin,

    "q76_length_quartiles" ->
      """SELECT doc_id, lang, n_chars,
        |  CAST(ntile(4) OVER (PARTITION BY lang
        |    ORDER BY n_chars, doc_id) AS INT) AS quartile
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q72_top_terms_source" ->
      s"""${ExtQueries.tokCte},
         |p AS (SELECT doc_id, unnest(t) token FROM tok),
         |nd AS (SELECT count(DISTINCT doc_id) n FROM documents
         |       WHERE doc_id IS NOT NULL),
         |dfq AS (SELECT token, count(DISTINCT doc_id) doc_freq FROM p GROUP BY 1),
         |tf AS (SELECT source, token, count(*) tf
         |       FROM p JOIN documents USING (doc_id) GROUP BY 1, 2),
         |sc AS (SELECT source, token, CAST(tf AS BIGINT) tf,
         |         CAST(doc_freq AS BIGINT) doc_freq,
         |         CAST(floor(CAST(1000.0 AS DOUBLE) * CAST(tf AS DOUBLE)
         |           * ln(CAST(n AS DOUBLE) / CAST(doc_freq AS DOUBLE))) AS BIGINT) score_q
         |       FROM tf JOIN dfq USING (token) CROSS JOIN nd),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY source
         |        ORDER BY score_q DESC, token) AS INT) rank FROM sc)
         |SELECT source, rank, token, tf, doc_freq, score_q
         |FROM r WHERE rank <= 5 ORDER BY source, rank""".stripMargin,

    "q73_length_histogram" ->
      """SELECT lang, CAST(greatest(0, least(15, n_chars // 64)) AS INT) AS bucket,
        |  count(*) AS n, min(n_chars) AS lo, max(n_chars) AS hi
        |FROM documents WHERE n_chars IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q74_snapshot_delta" ->
      s"""WITH h AS (SELECT doc_id, md5(${ExtQueries.normSql}) content_hash FROM documents),
         |old AS (SELECT DISTINCT md5(${ExtQueries.normSql}) content_hash FROM documents
         |        WHERE doc_id % 10 < 8)
         |SELECT doc_id, content_hash FROM h
         |WHERE NOT EXISTS (SELECT 1 FROM old
         |                  WHERE old.content_hash = h.content_hash)
         |ORDER BY doc_id""".stripMargin,

    "q70_event_funnel" ->
      """WITH u0 AS (SELECT user_id, min(ts) t0 FROM events
        |            WHERE event_type = 'view' GROUP BY 1),
        |u1 AS (SELECT e.user_id, min(e.ts) t1 FROM events e
        |       JOIN u0 USING (user_id)
        |       WHERE e.event_type = 'click' AND e.ts > u0.t0 GROUP BY 1),
        |u2 AS (SELECT e.user_id, min(e.ts) t2 FROM events e
        |       JOIN u1 USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.ts > u1.t1 GROUP BY 1)
        |SELECT CAST(1 AS INT) AS stage, 'view' AS event_type,
        |  CAST((SELECT count(*) FROM u0) AS BIGINT) AS n_users
        |UNION ALL
        |SELECT CAST(2 AS INT), 'click', CAST((SELECT count(*) FROM u1) AS BIGINT)
        |UNION ALL
        |SELECT CAST(3 AS INT), 'purchase', CAST((SELECT count(*) FROM u2) AS BIGINT)
        |ORDER BY stage""".stripMargin,

    "q71_retention_cohorts" ->
      """WITH w AS (SELECT DISTINCT user_id,
        |             date_trunc('week', CAST(ts AS TIMESTAMP)) wk
        |           FROM events),
        |c AS (SELECT user_id, min(wk) cohort_week FROM w GROUP BY 1),
        |o AS (SELECT DISTINCT w.user_id, cohort_week,
        |        CAST(date_diff('day', cohort_week, wk) // 7 AS BIGINT) week_offset
        |      FROM w JOIN c USING (user_id))
        |SELECT cohort_week, week_offset, count(*) AS n_users
        |FROM o GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q66_pii_redaction" ->
      s"""WITH r1 AS (SELECT doc_id, text,
         |    regexp_replace(text, '${TextAnalysis.emailRe}', '<EMAIL>', 'g') t1
         |  FROM documents),
         |r2 AS (SELECT doc_id, text, t1,
         |    regexp_replace(t1, '${TextAnalysis.ipv4Re}', '<IP>', 'g') t2
         |  FROM r1)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '${TextAnalysis.emailRe}')) AS INT) AS n_email,
         |  CAST(len(regexp_extract_all(t1, '${TextAnalysis.ipv4Re}')) AS INT) AS n_ipv4,
         |  CAST(len(regexp_extract_all(t2, '${TextAnalysis.digitRunRe}')) AS INT) AS n_digit_run,
         |  md5(regexp_replace(t2, '${TextAnalysis.digitRunRe}', '<NUM>', 'g')) AS redacted_hash
         |FROM r2 ORDER BY doc_id""".stripMargin,

    "q67_dedup_keep_best" ->
      s"""WITH RECURSIVE ${ExtQueries.simhashHammingCtes.stripPrefix("WITH ")},
         |e AS (SELECT doc_a a, doc_b b FROM hp
         |      UNION SELECT doc_b, doc_a FROM hp),
         |r AS (SELECT a AS node, a AS reach FROM e
         |      UNION
         |      SELECT r.node, e.b FROM r JOIN e ON r.reach = e.a),
         |comp AS (SELECT node AS doc_id, min(reach) AS component
         |         FROM r GROUP BY node),
         |qual AS (SELECT doc_id,
         |    CAST(CASE WHEN len(t) > 0
         |      THEN (100 * len(list_distinct(t))) // len(t)
         |           - (50 * len(list_filter(t, x -> x IN (${TextAnalysis.langStopwords
               .flatMap(_._2).map(w => s"'$w'").mkString(", ")})))) // len(t)
         |      ELSE 0 END AS BIGINT) quality
         |  FROM tok),
         |j AS (SELECT component, comp.doc_id, quality,
         |        row_number() OVER (PARTITION BY component
         |          ORDER BY quality DESC, comp.doc_id) rn,
         |        count(*) OVER (PARTITION BY component) n_in_component
         |      FROM comp JOIN qual ON comp.doc_id = qual.doc_id)
         |SELECT component, doc_id, quality, CAST(rn AS INT) AS rank,
         |  CAST(n_in_component AS BIGINT) AS n_in_component
         |FROM j ORDER BY component, rank""".stripMargin,

    "q53_events_asof" ->
      """WITH p AS (SELECT event_id, user_id, ts, value FROM events
        |           WHERE event_type = 'purchase'),
        |c AS (SELECT event_id, user_id, ts, value FROM events
        |      WHERE event_type = 'click'),
        |j AS (SELECT p.event_id, p.user_id, p.ts, p.value,
        |        c.event_id click_event_id, c.ts click_ts, c.value click_value,
        |        row_number() OVER (PARTITION BY p.event_id
        |          ORDER BY c.ts DESC, c.event_id DESC) rn
        |      FROM p JOIN c ON p.user_id = c.user_id
        |        AND epoch_us(CAST(c.ts AS TIMESTAMP)) <= epoch_us(CAST(p.ts AS TIMESTAMP)))
        |SELECT event_id, user_id, ts, value,
        |  click_event_id, click_ts, click_value
        |FROM j WHERE rn = 1 ORDER BY event_id""".stripMargin,

    "q54_dedup_components" ->
      s"""WITH RECURSIVE ${ExtQueries.simhashHammingCtes.stripPrefix("WITH ")},
         |e AS (SELECT doc_a a, doc_b b FROM hp
         |      UNION SELECT doc_b, doc_a FROM hp),
         |r AS (SELECT a AS node, a AS reach FROM e
         |      UNION
         |      SELECT r.node, e.b FROM r JOIN e ON r.reach = e.a)
         |SELECT node AS doc_id, min(reach) AS component
         |FROM r GROUP BY node ORDER BY doc_id""".stripMargin,

    "q55_fts_bm25" -> bm25Sql(Seq("spark", "merge"), 10),

    "q187_retrieval_mrr" -> {
      val queries = Seq(
        ("a", "hash join", "hash", "join"),
        ("b", "spark merge", "spark", "merge"),
        ("c", "table scan", "table", "scan"))
      val rankLegs = queries.map { case (qid, _, w1, w2) =>
        bm25RankCtes(qid, Seq(w1, w2), 10)
      }.mkString(",\n")
      val relLegs = queries.map { case (qid, _, w1, w2) =>
        s"""rel_$qid AS (SELECT doc_id FROM tok
           |  WHERE len(list_filter(range(1, len(t)),
           |    j -> t[j] = '$w1' AND t[j+1] = '$w2')) > 0)""".stripMargin
      }.mkString(",\n")
      val metricLegs = queries.map { case (qid, label, _, _) =>
        s"""m_$qid AS (SELECT '$label' query,
           |    (SELECT CAST(count(*) AS BIGINT) FROM rel_$qid) n_rel,
           |    (SELECT CAST(count(*) AS BIGINT)
           |     FROM r_$qid JOIN rel_$qid USING (doc_id)) n_rel_topk,
           |    CAST(COALESCE((SELECT min(rank)
           |      FROM r_$qid JOIN rel_$qid USING (doc_id)), 0) AS BIGINT)
           |      first_rel_rank)""".stripMargin
      }.mkString(",\n")
      val unioned = queries.map { case (qid, _, _, _) =>
        s"SELECT * FROM m_$qid"
      }.mkString(" UNION ALL ")
      s"""$bm25BaseCtes,
         |$rankLegs,
         |${ExtQueries.tokCte.stripPrefix("WITH ")},
         |$relLegs,
         |$metricLegs
         |SELECT query, n_rel, n_rel_topk, first_rel_rank,
         |  CASE WHEN first_rel_rank > 0
         |       THEN CAST(1000000 // first_rel_rank AS BIGINT)
         |       ELSE CAST(0 AS BIGINT) END mrr_ppm
         |FROM ($unioned) ORDER BY query""".stripMargin
    },

    // q206 oracle: identical literal discounts, the same closed-form
    // ideal DCG off the cumulative list literal, BM25 legs from the
    // shared scaffolding.
    "q206_retrieval_ndcg" -> {
      val queries = Seq(
        ("a", "hash join", "hash", "join"),
        ("b", "spark merge", "spark", "merge"),
        ("c", "table scan", "table", "scan"))
      val discValues = ndcgDisc.zipWithIndex
        .map { case (v, i) => s"(${i + 1}, $v)" }.mkString(", ")
      val cumList = ndcgDisc.scanLeft(0L)(_ + _).mkString("[", ", ", "]")
      def cumAt(n: String) = s"$cumList[CAST(least($n, 10) AS INT) + 1]"
      val rankLegs = queries.map { case (qid, _, w1, w2) =>
        bm25RankCtes(qid, Seq(w1, w2), 10)
      }.mkString(",\n")
      val relLegs = queries.map { case (qid, _, w1, w2) =>
        s"""ph_$qid AS (SELECT doc_id FROM tok
           |  WHERE len(list_filter(range(1, len(t)),
           |    j -> t[j] = '$w1' AND t[j+1] = '$w2')) > 0),
           |gr_$qid AS (SELECT doc_id, max(g) grade FROM (
           |    SELECT doc_id, 2 g FROM ph_$qid
           |    UNION ALL
           |    SELECT doc_id, 1 g FROM tok
           |    WHERE list_contains(t, '$w1') AND list_contains(t, '$w2'))
           |  GROUP BY 1)""".stripMargin
      }.mkString(",\n")
      val metricLegs = queries.map { case (qid, label, _, _) =>
        s"""m_$qid AS (SELECT '$label' query,
           |  (SELECT CAST(COALESCE(sum(CASE WHEN grade = 2 THEN 1 END), 0)
           |     AS BIGINT) FROM gr_$qid) n_rel2,
           |  (SELECT CAST(COALESCE(sum(CASE WHEN grade = 1 THEN 1 END), 0)
           |     AS BIGINT) FROM gr_$qid) n_rel1,
           |  (SELECT CAST(COALESCE(sum(grade * dv), 0) AS BIGINT)
           |   FROM r_$qid r JOIN gr_$qid g USING (doc_id)
           |   JOIN disc ON disc.rnk = r.rank) dcg)""".stripMargin
      }.mkString(",\n")
      val unioned = queries.map { case (qid, _, _, _) =>
        s"SELECT * FROM m_$qid" }.mkString(" UNION ALL ")
      s"""$bm25BaseCtes,
         |$rankLegs,
         |${ExtQueries.tokCte.stripPrefix("WITH ")},
         |disc(rnk, dv) AS (VALUES $discValues),
         |$relLegs,
         |$metricLegs,
         |u AS (SELECT query, n_rel2, n_rel1, dcg,
         |    CAST(2 * ${cumAt("n_rel2")}
         |      + ${cumAt("n_rel2 + n_rel1")}
         |      - ${cumAt("n_rel2")} AS BIGINT) idcg
         |  FROM ($unioned))
         |SELECT query, n_rel2, n_rel1, dcg, idcg,
         |  CASE WHEN idcg > 0 THEN CAST((1000000 * dcg) // idcg AS BIGINT)
         |       ELSE CAST(0 AS BIGINT) END ndcg_ppm
         |FROM u ORDER BY query""".stripMargin
    },

    "q210_stratified_exact_k" ->
      """WITH s AS (SELECT doc_id, lang,
        |    substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) draw
        |  FROM documents),
        |r AS (SELECT *, row_number() OVER (PARTITION BY lang
        |         ORDER BY draw, doc_id) rk
        |      FROM s)
        |SELECT doc_id, lang, draw, CAST(rk AS BIGINT) rk
        |FROM r WHERE rk <= 20 ORDER BY lang, rk""".stripMargin,

    "q56_sample_stratified" ->
      """WITH s AS (SELECT doc_id, lang, source,
        |    substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) draw,
        |    CASE lang WHEN 'en' THEN '80000000' WHEN 'es' THEN '40000000'
        |      WHEN 'de' THEN '20000000' WHEN 'fr' THEN 'c0000000'
        |      ELSE '10000000' END threshold
        |  FROM documents)
        |SELECT doc_id, lang, source, draw, threshold
        |FROM s WHERE draw < threshold ORDER BY doc_id""".stripMargin,

    "q57_doc_length_stats" ->
      """SELECT lang, count(*) AS n_docs,
        |  min(n_chars) AS min_chars, max(n_chars) AS max_chars,
        |  CAST(sum(n_chars) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_chars,
        |  quantile_cont(n_chars, 0.25) AS p25,
        |  quantile_cont(n_chars, 0.5) AS p50,
        |  quantile_cont(n_chars, 0.75) AS p75,
        |  quantile_cont(n_chars, 0.875) AS p875
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q58_mixing_plan" ->
      s"""${ExtQueries.tokCte},
         |dlen AS (SELECT doc_id, len(t) n_tok FROM tok),
         |cells AS (SELECT lang, source, count(*) n_docs,
         |            CAST(sum(n_tok) AS BIGINT) n_tokens
         |          FROM dlen JOIN documents USING (doc_id) GROUP BY 1, 2),
         |w AS (SELECT *, sum(n_tokens) OVER () total_tokens,
         |        count(*) OVER () n_cells
         |      FROM cells)
         |SELECT lang, source, n_docs, n_tokens,
         |  CASE WHEN total_tokens = 0 THEN CAST(0 AS BIGINT)
         |    ELSE CAST((CAST(1000000 AS HUGEINT) * n_tokens) // total_tokens AS BIGINT)
         |  END AS share_ppm,
         |  CAST(50000 // n_cells AS BIGINT) AS cell_budget,
         |  CASE WHEN n_tokens = 0 THEN CAST(1000000 AS BIGINT)
         |    ELSE least(CAST(1000000 AS BIGINT),
         |      CAST((CAST(1000000 AS HUGEINT) * (50000 // n_cells)) // n_tokens AS BIGINT))
         |  END AS sample_rate_ppm
         |FROM w ORDER BY lang, source""".stripMargin,

    "q193_mixing_realized" ->
      s"""${ExtQueries.tokCte},
         |dlen AS (SELECT doc_id, CAST(len(t) AS BIGINT) n_tok FROM tok),
         |dd AS (SELECT doc_id, lang, source, n_tok
         |       FROM dlen JOIN documents USING (doc_id)),
         |cells AS (SELECT lang, source, CAST(sum(n_tok) AS BIGINT) n_tokens
         |          FROM dd GROUP BY 1, 2),
         |w AS (SELECT *, count(*) OVER () n_cells FROM cells),
         |plan AS (SELECT lang, source,
         |    CAST(50000 // n_cells AS BIGINT) cell_budget,
         |    CASE WHEN n_tokens = 0 THEN CAST(1000000 AS BIGINT)
         |      ELSE least(CAST(1000000 AS BIGINT),
         |        CAST((CAST(1000000 AS HUGEINT) * (50000 // n_cells)) // n_tokens
         |          AS BIGINT)) END sample_rate_ppm
         |  FROM w),
         |ap AS (SELECT dd.lang, dd.source, dd.n_tok, p.cell_budget,
         |         p.sample_rate_ppm,
         |         CASE WHEN p.sample_rate_ppm >= 1000000 THEN 'g'
         |              ELSE printf('%08x', (p.sample_rate_ppm * 4294967296) // 1000000)
         |         END thr,
         |         substr(md5(CAST(dd.doc_id AS VARCHAR)), 1, 8) draw
         |       FROM dd JOIN plan p USING (lang, source)),
         |k AS (SELECT lang, source, cell_budget, sample_rate_ppm,
         |        CAST(sum(CASE WHEN draw < thr THEN 1 ELSE 0 END) AS BIGINT) n_kept,
         |        CAST(sum(CASE WHEN draw < thr THEN n_tok ELSE 0 END) AS BIGINT) kept_tokens
         |      FROM ap GROUP BY 1, 2, 3, 4)
         |SELECT lang, source, sample_rate_ppm, n_kept, kept_tokens, cell_budget,
         |  CASE WHEN cell_budget > 0
         |       THEN CAST((1000000 * kept_tokens) // cell_budget AS BIGINT)
         |       ELSE CAST(0 AS BIGINT) END fill_ppm
         |FROM k ORDER BY lang, source""".stripMargin,

    "q60_chunk_windows" ->
      s"""${ExtQueries.tokCte},
         |s AS (SELECT doc_id, t, unnest(generate_series(1, len(t), 24)) st
         |      FROM tok WHERE len(t) > 0),
         |c AS (SELECT doc_id,
         |        CAST((st - 1) // 24 AS INT) chunk_idx,
         |        CAST(st - 1 AS INT) start_tok,
         |        list_slice(t, st, least(st + 31, len(t))) ch
         |      FROM s)
         |SELECT doc_id, chunk_idx, start_tok,
         |  CAST(len(ch) AS INT) AS n_chunk_tokens,
         |  md5(array_to_string(ch, ' ')) AS chunk_hash
         |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,

    "q61_pack_sequences" ->
      s"""${ExtQueries.tokCte},
         |d AS (SELECT doc_id, len(t) n_tok FROM tok),
         |p AS (SELECT lang, doc_id, n_tok,
         |        COALESCE(sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) pt
         |      FROM d JOIN documents USING (doc_id))
         |SELECT lang, CAST(pt // 512 AS BIGINT) AS seq_id, count(*) AS n_docs,
         |  CAST(sum(n_tok) AS BIGINT) AS n_tokens
         |FROM p GROUP BY 1, 2 ORDER BY lang, seq_id""".stripMargin,

    "q190_packing_efficiency" ->
      s"""${ExtQueries.tokCte},
         |d AS (SELECT doc_id, CAST(len(t) AS BIGINT) n_tok FROM tok),
         |p AS (SELECT lang, doc_id, n_tok,
         |        COALESCE(sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) pt
         |      FROM d JOIN documents USING (doc_id)),
         |ks AS (SELECT unnest([256, 512, 1024]) ctx),
         |a AS (SELECT lang, ctx, CAST(count(*) AS BIGINT) n_docs,
         |        CAST(sum(CASE WHEN pt % ctx + n_tok > ctx THEN 1 ELSE 0 END)
         |          AS BIGINT) n_split_docs,
         |        CAST(sum(n_tok) AS BIGINT) tot
         |      FROM p CROSS JOIN ks GROUP BY 1, 2)
         |SELECT lang, CAST(ctx AS BIGINT) ctx, n_docs, n_split_docs,
         |  CAST((1000000 * n_split_docs) // n_docs AS BIGINT) split_ppm,
         |  CAST((tot + ctx - 1) // ctx AS BIGINT) n_seqs
         |FROM a ORDER BY lang, ctx""".stripMargin,

    "q62_repetition" ->
      s"""${ExtQueries.tokCte},
         |u AS (SELECT doc_id, t, unnest(t) w, generate_subscripts(t, 1) i FROM tok),
         |g AS (SELECT doc_id, w || ' ' || t[i+1] g FROM u WHERE i < len(t)),
         |cnt AS (SELECT doc_id, g, count(*) c FROM g GROUP BY 1, 2),
         |agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) n_bigrams,
         |          CAST(count(*) AS BIGINT) n_distinct, CAST(max(c) AS BIGINT) mx
         |        FROM cnt GROUP BY 1)
         |SELECT doc_id, n_bigrams, n_distinct AS n_distinct_bigrams,
         |  CAST((1000000 * (n_bigrams - n_distinct)) // n_bigrams AS BIGINT) AS dup_ppm,
         |  CAST((1000000 * mx) // n_bigrams AS BIGINT) AS top_ppm
         |FROM agg ORDER BY doc_id""".stripMargin,

    // Keep rule stated positionally with lag(): token i drops iff both
    // original predecessors equal it (truncates every run to 2, keeping
    // the first occurrences) — exactly the JVM pass's rule.
    "q152_run_collapse" ->
      s"""${ExtQueries.tokCte},
         |u AS (SELECT doc_id, unnest(t) w, generate_subscripts(t, 1) i
         |      FROM tok),
         |k AS (SELECT doc_id, w, i,
         |        CASE WHEN w = lag(w, 1) OVER win AND w = lag(w, 2) OVER win
         |          THEN 0 ELSE 1 END keep
         |      FROM u WINDOW win AS (PARTITION BY doc_id ORDER BY i)),
         |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) n_tokens,
         |          CAST(count(*) FILTER (keep = 0) AS BIGINT) n_removed,
         |          string_agg(w, ' ' ORDER BY i) FILTER (keep = 1) text_clean
         |        FROM k GROUP BY doc_id)
         |SELECT doc_id, n_tokens, n_removed, text_clean
         |FROM agg WHERE n_removed > 0 ORDER BY doc_id""".stripMargin,

    "q59_click_conversions" ->
      """WITH c AS (SELECT event_id, user_id, ts,
        |             epoch_us(CAST(ts AS TIMESTAMP)) lt
        |           FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) rt, value
        |      FROM events WHERE event_type = 'purchase')
        |SELECT c.event_id, c.user_id, c.ts,
        |  count(*) AS n_purchases,
        |  CAST(sum(CAST(p.value AS DECIMAL(18,6))) AS DOUBLE) AS purchase_value
        |FROM c JOIN p ON p.user_id = c.user_id
        |  AND p.rt > c.lt AND p.rt <= c.lt + 3600000000
        |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin,

    // HLL mirror: same md5 hex slices, same scaled-integer harmonic sum
    // (BIGINT-exact), one float division + one ×1000 scaling — the exact
    // op sequence Sketches.hllDistinct evaluates, so doubles agree
    // bit-for-bit.
    // q223 oracle: the q81 estimator chain parametrized by b, one leg
    // per width, same alpha/linear-counting branches and milli floor.
    "q223_hll_error_sweep" -> {
      def leg(b: Int, seTheo: Long): String = {
        val hex = b / 4
        val m = 1L << b
        s"""SELECT $b b, ex.g AS o_orderpriority, n_exact,
           |  CAST(nb AS BIGINT) n_buckets,
           |  CAST(floor(est * 1000.0) AS BIGINT) est_milli,
           |  CAST((1000 * abs(CAST(floor(est * 1000.0) AS BIGINT)
           |    - 1000 * n_exact)) // n_exact AS BIGINT) err_ppm,
           |  CAST($seTheo AS BIGINT) theo_se_ppm
           |FROM (
           |  SELECT g, nb,
           |    CASE WHEN raw <= ${2.5 * m} AND nb < $m
           |      THEN $m.0 * ln($m.0 / CAST($m - nb AS DOUBLE))
           |      ELSE raw END est
           |  FROM (
           |    SELECT g, nb,
           |      (0.7213 / (1.0 + 1.079 / $m.0)) * ${m.toDouble * m}
           |        * 281474976710656.0 / CAST(s_total AS DOUBLE) raw
           |    FROM (
           |      SELECT g, CAST(count(*) AS BIGINT) nb,
           |        CAST(sum(CAST(1 AS BIGINT) << (48 - r)) AS BIGINT)
           |          + ($m - CAST(count(*) AS BIGINT)) * 281474976710656 s_total
           |      FROM (
           |        SELECT g, CAST(concat('0x', substr(h, 1, $hex)) AS INT) bucket,
           |          max(CASE WHEN x > 0 THEN 33 - length(bin(x)) ELSE 33 END) r
           |        FROM (SELECT o_orderpriority g,
           |                md5(CAST(o_custkey AS VARCHAR)) h,
           |                CAST(concat('0x', substr(md5(CAST(o_custkey AS VARCHAR)),
           |                  ${hex + 1}, 8)) AS BIGINT) x
           |              FROM orders WHERE o_custkey IS NOT NULL)
           |        GROUP BY 1, 2)
           |      GROUP BY 1)))
           |JOIN (SELECT o_orderpriority g, count(DISTINCT o_custkey) n_exact
           |      FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1) ex
           |  USING (g)""".stripMargin
      }
      val legs = Seq((4, 260000L), (8, 65000L), (12, 16250L))
        .map { case (b, se) => s"(${leg(b, se)})" }.mkString("\nUNION ALL\n")
      s"""SELECT * FROM (
         |$legs
         |) ORDER BY b, o_orderpriority""".stripMargin
    },

    "q81_hll_distinct" ->
      """WITH h AS (SELECT o_orderpriority g, md5(CAST(o_custkey AS VARCHAR)) h
        |           FROM orders WHERE o_custkey IS NOT NULL),
        |r0 AS (SELECT g, CAST(concat('0x', substr(h, 1, 2)) AS INT) bucket,
        |         CAST(concat('0x', substr(h, 3, 8)) AS BIGINT) x FROM h),
        |regs AS (SELECT g, bucket,
        |           max(CASE WHEN x > 0 THEN 33 - length(bin(x)) ELSE 33 END) r
        |         FROM r0 GROUP BY 1, 2),
        |s AS (SELECT g, CAST(sum(CAST(1 AS BIGINT) << (48 - r)) AS BIGINT) s_seen,
        |        CAST(count(*) AS BIGINT) nb
        |      FROM regs GROUP BY 1),
        |st AS (SELECT g, nb, s_seen + (256 - nb) * 281474976710656 s_total FROM s),
        |e1 AS (SELECT g, nb,
        |         (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0
        |           * 281474976710656.0 / CAST(s_total AS DOUBLE) raw
        |       FROM st),
        |e2 AS (SELECT g, nb,
        |         CASE WHEN raw <= 640.0 AND nb < 256
        |           THEN 256.0 * ln(256.0 / CAST(256 - nb AS DOUBLE))
        |           ELSE raw END est
        |       FROM e1),
        |ex AS (SELECT o_orderpriority g, count(DISTINCT o_custkey) n_exact
        |       FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1)
        |SELECT ex.g AS o_orderpriority, CAST(n_exact AS BIGINT) AS n_exact,
        |  CAST(nb AS INT) AS n_buckets,
        |  CAST(floor(est * 1000.0) AS BIGINT) AS est_milli
        |FROM ex JOIN e2 ON ex.g = e2.g ORDER BY 1""".stripMargin,

    "q82_bpe_pairs" ->
      s"""${ExtQueries.tokCte},
         |u AS (SELECT doc_id, t, unnest(t) w, generate_subscripts(t, 1) i FROM tok),
         |p AS (SELECT w tok_a, t[i+1] tok_b FROM u WHERE i < len(t)),
         |f AS (SELECT tok_a, tok_b, CAST(count(*) AS BIGINT) n FROM p GROUP BY 1, 2)
         |SELECT CAST(row_number() OVER (ORDER BY n DESC, tok_a, tok_b) AS INT) AS rank,
         |  tok_a, tok_b, n
         |FROM f QUALIFY rank <= 50 ORDER BY rank""".stripMargin,

    "q155_quality_ensemble" ->
      s"""${ExtQueries.tokCte},
         |base AS (SELECT d.doc_id, d.lang,
         |           CAST(len(t) AS BIGINT) n_tokens,
         |           ${ExtQueries.qualitySql} quality
         |         FROM tok JOIN documents d USING (doc_id)),
         |u AS (SELECT doc_id, t, unnest(t) w2, generate_subscripts(t, 1) i
         |      FROM tok),
         |g AS (SELECT doc_id, w2 || ' ' || t[i + 1] g FROM u WHERE i < len(t)),
         |cnt AS (SELECT doc_id, g, count(*) c FROM g GROUP BY 1, 2),
         |rep AS (SELECT doc_id,
         |          CAST((1000000 * (sum(c) - count(*))) // sum(c) AS BIGINT) dup_ppm
         |        FROM cnt GROUP BY doc_id),
         |j AS (SELECT b.doc_id, b.lang, b.quality, rep.dup_ppm, b.n_tokens
         |      FROM base b JOIN rep USING (doc_id)),
         |r AS (SELECT *,
         |    row_number() OVER (PARTITION BY lang ORDER BY quality DESC, doc_id) r_q,
         |    row_number() OVER (PARTITION BY lang ORDER BY dup_ppm, doc_id) r_rep,
         |    row_number() OVER (PARTITION BY lang ORDER BY n_tokens DESC, doc_id) r_len
         |  FROM j),
         |f AS (SELECT doc_id, lang, quality, dup_ppm, n_tokens,
         |        CAST(r_q + r_rep + r_len AS BIGINT) sum_rank FROM r),
         |t2 AS (SELECT *,
         |    CAST(row_number() OVER (PARTITION BY lang ORDER BY sum_rank, doc_id)
         |      AS INT) rank FROM f)
         |SELECT lang, rank, doc_id, quality, dup_ppm, n_tokens, sum_rank
         |FROM t2 WHERE rank <= 5 ORDER BY lang, rank""".stripMargin,

    "q153_bpe_train" -> {
      val rows = (1 to 8).map(i =>
        s"SELECT CAST($i AS INT) AS rank, a AS sym_a, b AS sym_b, n AS pair_count FROM b$i")
        .mkString("\n  UNION ALL ")
      s"""${bpeTrainSql(8)}
         |SELECT rank, sym_a, sym_b, pair_count FROM (
         |  $rows)
         |ORDER BY rank""".stripMargin
    },

    // q154/q200: encode ALL distinct corpus tokens (not just the capped
    // training head) under the trained merges via the shared wl chain,
    // then weight by per-source / per-language corpus counts.
    "q154_bpe_encode" ->
      s"""$bpeEncodeWlSql,
         |src AS (SELECT d.source, p.token
         |        FROM (SELECT doc_id, unnest(t) token FROM tok) p
         |        JOIN documents d USING (doc_id)),
         |agg AS (SELECT source, CAST(count(*) AS BIGINT) n_tokens,
         |          CAST(sum(length(token)) AS BIGINT) n_chars,
         |          CAST(sum(n_syms) AS BIGINT) n_bpe_tokens
         |        FROM src JOIN wl USING (token) GROUP BY 1)
         |SELECT source, n_tokens, n_chars, n_bpe_tokens,
         |  (1000000 * n_bpe_tokens) // n_chars AS compression_ppm
         |FROM agg ORDER BY source""".stripMargin,

    "q200_bpe_fertility" ->
      s"""$bpeEncodeWlSql,
         |lng AS (SELECT d.lang, p.token
         |        FROM (SELECT doc_id, unnest(t) token FROM tok) p
         |        JOIN documents d USING (doc_id)),
         |agg AS (SELECT lang, CAST(count(*) AS BIGINT) n_words,
         |          CAST(sum(n_syms) AS BIGINT) n_bpe_tokens
         |        FROM lng JOIN wl USING (token) GROUP BY 1)
         |SELECT lang, n_words, n_bpe_tokens,
         |  (1000000 * n_bpe_tokens) // n_words AS fertility_ppm
         |FROM agg ORDER BY lang""".stripMargin,

    "q83_salted_join" ->
      """SELECT n_name, count(*) AS n_items,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q143_salt_plan" ->
      s"""${ExtQueries.tokCte},
         |p AS (SELECT doc_id, unnest(t) token FROM tok),
         |f AS (SELECT token, CAST(count(*) AS BIGINT) cnt FROM p GROUP BY 1),
         |s AS (SELECT token, cnt, CAST((cnt + 4095) // 4096 AS BIGINT) AS salt FROM f)
         |SELECT CAST(row_number() OVER (ORDER BY cnt DESC, token) AS INT) AS rank,
         |  token, cnt, salt,
         |  CAST((cnt + salt - 1) // salt AS BIGINT) AS post_salt_rows
         |FROM s QUALIFY rank <= 20 ORDER BY rank""".stripMargin,

    "q141_bloom_prune_join" ->
      """SELECT p_brand, count(*) AS n_items,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_size <= 2
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q144_unimax_alloc" ->
      s"""${ExtQueries.tokCte},
         |c AS (SELECT lang, CAST(sum(len(t)) AS BIGINT) n_tokens
         |      FROM tok JOIN documents USING (doc_id) GROUP BY 1),
         |r AS (SELECT lang, n_tokens,
         |        CAST(row_number() OVER (ORDER BY n_tokens, lang) AS BIGINT) i,
         |        CAST(COALESCE(sum(n_tokens) OVER (ORDER BY n_tokens, lang
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) prefix,
         |        CAST(count(*) OVER () AS BIGINT) n_langs,
         |        CAST((CAST(950000 AS HUGEINT) * sum(n_tokens) OVER ()) // 1000000 AS BIGINT) budget
         |      FROM c),
         |f AS (SELECT *, (1 * n_tokens * (n_langs - i + 1) < budget - 1 * prefix) capped FROM r),
         |g AS (SELECT CAST(sum(CASE WHEN capped THEN n_tokens ELSE 0 END) AS BIGINT) capped_mass,
         |        CAST(sum(CASE WHEN capped THEN 1 ELSE 0 END) AS BIGINT) k,
         |        CAST(count(*) AS BIGINT) n_l FROM f),
         |a AS (SELECT lang, n_tokens, capped,
         |        CAST(CASE WHEN capped THEN 1 * n_tokens
         |             WHEN n_l = k THEN 0
         |             ELSE (budget - 1 * capped_mass) // (n_l - k) END AS BIGINT) alloc_tokens,
         |        CAST(CASE WHEN capped OR n_l = k THEN 0
         |             ELSE (budget - 1 * capped_mass) % (n_l - k) END AS BIGINT) alloc_rem
         |      FROM f, g)
         |SELECT lang, n_tokens, capped, alloc_tokens, alloc_rem,
         |  CAST(CASE WHEN n_tokens = 0 THEN 0
         |       ELSE (1000000 * alloc_tokens) // n_tokens END AS BIGINT) epochs_ppm
         |FROM a ORDER BY lang""".stripMargin,

    "q86_curation_pipeline" -> {
      val sw = graft.ext.TextAnalysis.langStopwords
        .flatMap(_._2).map(w => s"'$w'").mkString(", ")
      val t80 = graft.ext.Sampling.hexThreshold(0.8)
      val t90 = graft.ext.Sampling.hexThreshold(0.9)
      s"""$trigramCtes,
         |prof AS (SELECT doc_id, CAST(len(t) AS INT) n_tokens,
         |    CASE WHEN len(t) > 0
         |      THEN (100 * len(list_distinct(t))) // len(t)
         |           - (50 * len(list_filter(t, x -> x IN ($sw)))) // len(t)
         |      ELSE 0 END q
         |  FROM tok),
         |base AS (SELECT d.doc_id, d.lang, p.n_tokens,
         |           md5(${ExtQueries.normSql}) content_hash
         |         FROM documents d JOIN prof p USING (doc_id)
         |         WHERE d.source <> 'src0' AND p.q >= 35 AND p.n_tokens >= 5),
         |ded AS (SELECT doc_id, lang, n_tokens FROM (
         |    SELECT *, row_number() OVER (PARTITION BY content_hash
         |      ORDER BY doc_id) rn FROM base) WHERE rn = 1),
         |bg AS (SELECT DISTINCT s FROM g JOIN documents USING (doc_id)
         |       WHERE source = 'src0'),
         |clean AS (SELECT * FROM ded
         |          WHERE NOT EXISTS (SELECT 1 FROM g JOIN bg ON g.s = bg.s
         |                            WHERE g.doc_id = ded.doc_id)),
         |spl AS (SELECT *,
         |    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '$t80' THEN 'train'
         |      WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '$t90' THEN 'val'
         |      ELSE 'test' END split
         |  FROM clean)
         |SELECT split, lang, count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens
         |FROM spl GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    }
  )
}
