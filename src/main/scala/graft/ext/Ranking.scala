package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 ranked retrieval over the inverted-index postings table — the
  * ranking layer on top of [[TextAnalysis.invertedPostings]] (the
  * reference ranks its Spanish FTS hits with Postgres `ts_rank`,
  * `backend/olap_service.py` search endpoints; BM25 is the standard
  * public formulation — Robertson & Zaragoza, "The Probabilistic
  * Relevance Framework: BM25 and Beyond", 2009; the idf form below is
  * Lucene's `log(1 + (N - df + 0.5)/(df + 0.5))`, strictly positive).
  *
  * Scale design (100 TB): scoring touches ONLY the postings of the query
  * terms — a term-pruned scan (bucketed-by-term postings make it a
  * partition-pruned lookup), never the corpus. Document lengths and the
  * per-term document frequencies are tiny aggregates broadcast to the
  * candidate rows; the final top-k is a TakeOrdered, not a full sort.
  *
  * Engine parity: scores are computed in double with an EXPLICITLY
  * PARENTHESIZED expression mirrored in the oracle SQL (every IEEE op is
  * correctly rounded, so an identical expression tree yields identical
  * doubles; `ln` is the one library-dependent op), then quantized to
  * `floor(score * 1000)` so a sub-ulp `ln` divergence cannot flip the
  * hash; per-term partial scores are summed in FIXED term order via
  * conditional aggregation, never a data-ordered float sum. */
object Ranking {

  /** One-pass accent-folded tokenization: (doc_id, token array). BOTH
    * the postings and the doc-length tables derive from this single
    * persisted frame, so a scoring query tokenizes the corpus ONCE —
    * the interpreted fold+normalize+split HOF pass is what dominates
    * retrieval, and deriving dl separately used to pay it twice. */
  private def tokenizedFolded(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
      TextAnalysis.tokens(TextAnalysis.normalize(
        TextAnalysis.foldAccents(col(textCol)))).as("__toks"))

  /** Postings with term frequency: one row per (term, doc) with its
    * occurrence count, accent-folded and normalized like
    * [[TextAnalysis.invertedPostings]]. */
  def postingsWithTf(df: DataFrame, textCol: String, idCol: String): DataFrame =
    postingsFromTokens(tokenizedFolded(df, textCol, idCol))

  private def postingsFromTokens(tk: DataFrame): DataFrame =
    tk.select(col("doc_id"), explode(col("__toks")).as("term"))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).cast("int").as("tf"))

  /** Per-doc token count under the same tokenization (zero-token docs
    * keep their dl=0 row — they belong in the corpus stats). */
  def docLengths(df: DataFrame, textCol: String, idCol: String): DataFrame =
    tokenizedFolded(df, textCol, idCol)
      .select(col("doc_id"), size(col("__toks")).as("dl"))

  /** BM25(k1=1.2, b=0.75) per-(doc, term) partial score column. Mirrors
    * the oracle's expression token-for-token. */
  private def partialScore(n: Column, df: Column, tf: Column, dl: Column,
                           avgdl: Column): Column = {
    val idf = log(lit(1.0) +
      (n.cast("double") - df.cast("double") + lit(0.5)) /
        (df.cast("double") + lit(0.5)))
    val tfPart = (tf.cast("double") * lit(2.2)) /
      (tf.cast("double") + lit(1.2) *
        (lit(0.25) + lit(0.75) * dl.cast("double") / avgdl))
    idf * tfPart
  }

  /** Top-k docs for a disjunctive (OR) term query, ranked by quantized
    * BM25. Output: (doc_id, score_q, rank); score_q = floor(1000·score).
    * Term needles go through the same fold/normalize pipeline as the
    * postings. */
  def bm25TopK(docs: DataFrame, textCol: String, idCol: String,
               terms: Seq[String], k: Int): DataFrame = {
    val queryTerms = terms.flatMap(t => TextAnalysis.tokenizeJvm(
      TextAnalysis.normalizeJvm(TextAnalysis.foldAccentsJvm(t)))).distinct
    val tk = graft.ops.TransientCache.persist(
      tokenizedFolded(docs, textCol, idCol))
    bm25Core(postingsFromTokens(tk),
      tk.select(col("doc_id"), size(col("__toks")).as("dl")), queryTerms, k)
  }

  /** One-pass Spanish-preserving tokenization (the stemmer's alphabet
    * keeps accents). */
  private def tokenizedEs(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("doc_id"),
      TextAnalysis.tokens(TextAnalysis.normalizeEs(
        col(textCol).cast("string"))).as("__toks"))

  /** Lexeme-level (stemmed) postings with tf: the Snowball-Spanish stem
    * of every token occurrence — the frequency table a
    * `to_tsvector('spanish')` GIN index stores
    * (ref `database/migrations/001_initial_schema.sql:87-88`). */
  def stemmedPostingsWithTf(df: DataFrame, textCol: String, idCol: String): DataFrame =
    stemmedFromTokens(tokenizedEs(df, textCol, idCol))

  private def stemmedFromTokens(tk: DataFrame): DataFrame = {
    val spark = tk.sparkSession
    import spark.implicits._
    // Null id/token-array rows carry no postings; they must drop BEFORE
    // the primitive-Long decode (which throws on null) — while the dl
    // side keeps them, mirroring the surface-term column pipeline.
    tk.where(col("doc_id").isNotNull && col("__toks").isNotNull)
      .as[(Long, Seq[String])]
      .flatMap { case (id, toks) =>
        toks.map(t => (id, graft.ext.SpanishStemmer.stem(t)))
      }.toDF("doc_id", "term")
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).cast("int").as("tf"))
  }

  /** Per-doc token count under the Spanish-preserving tokenization
    * (stemming never changes token COUNT, only token content, so this is
    * the dl the stemmed score needs). */
  def docLengthsEs(df: DataFrame, textCol: String, idCol: String): DataFrame =
    tokenizedEs(df, textCol, idCol)
      .select(col("doc_id"), size(col("__toks")).as("dl"))

  /** Stemmed BM25 — ranked retrieval over LEXEMES, the `ts_rank` +
    * `plainto_tsquery('spanish')` semantics of the reference's search
    * endpoints: needle "tablas" scores docs containing "table" because
    * both stem to "tabl". Needles stem exactly once (Snowball is not
    * idempotent). Same scoring, quantization and top-k plan as
    * [[bm25TopK]]; same single shared tokenize pass. */
  def bm25TopKStemmed(docs: DataFrame, textCol: String, idCol: String,
                      terms: Seq[String], k: Int): DataFrame = {
    val queryStems = terms
      .flatMap(t => TextAnalysis.tokenizeJvm(TextAnalysis.normalizeEsJvm(t)))
      .map(graft.ext.SpanishStemmer.stem).distinct
    val tk = graft.ops.TransientCache.persist(
      tokenizedEs(docs, textCol, idCol))
    bm25Core(stemmedFromTokens(tk),
      tk.select(col("doc_id"), size(col("__toks")).as("dl")), queryStems, k)
  }

  /** BM25 over a PREBUILT surface-term index (postings-with-tf + doc
    * lengths) — the materialized-index form: the reference stores
    * exactly this as its GIN index, and a session shares one build
    * across queries. Inputs must NOT be re-persisted here (a transient
    * release would evict the caller's shared artifact), so only the
    * tiny term-filtered slice is transient-persisted. */
  def bm25TopKFromIndex(postings: DataFrame, dls: DataFrame,
                        terms: Seq[String], k: Int): DataFrame = {
    val queryTerms = terms.flatMap(t => TextAnalysis.tokenizeJvm(
      TextAnalysis.normalizeJvm(TextAnalysis.foldAccentsJvm(t)))).distinct
    bm25Core(postings, dls, queryTerms, k, persistDl = false)
  }

  /** Stemmed twin of [[bm25TopKFromIndex]] (lexeme index + Spanish
    * needle stemming). */
  def bm25TopKStemmedFromIndex(postings: DataFrame, dls: DataFrame,
                               terms: Seq[String], k: Int): DataFrame = {
    val queryStems = terms
      .flatMap(t => TextAnalysis.tokenizeJvm(TextAnalysis.normalizeEsJvm(t)))
      .map(graft.ext.SpanishStemmer.stem).distinct
    bm25Core(postings, dls, queryStems, k, persistDl = false)
  }

  private def bm25Core(post0: DataFrame, dl0: DataFrame,
                       queryTerms: Seq[String], k: Int,
                       persistDl: Boolean = true): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    // The term-filtered postings (tiny — query terms only) feed BOTH the
    // df_t aggregate and the candidate rows; the doc-length table feeds
    // both the corpus stats and the candidate join. Persist each once
    // (TransientCache, runner-released): without it every unshared plan
    // branch re-runs the full-corpus tokenize — the interpreted-HOF pass
    // that dominates this query. (The filter of a cached index is a NEW
    // plan, so transient-persisting it never touches the shared blocks.)
    val post = graft.ops.TransientCache.persist(
      post0.where(col("term").isin(queryTerms: _*)))
    val dl = if (persistDl) graft.ops.TransientCache.persist(dl0) else dl0
    // Corpus stats: one tiny agg row, broadcast onto every candidate.
    val stats = dl.agg(count(lit(1)).as("n_corpus"), sum(col("dl")).as("tot_dl"))
      .withColumn("avgdl", col("tot_dl").cast("double") / col("n_corpus").cast("double"))
    val dfT = post.groupBy(col("term")).agg(count(lit(1)).as("df_t"))
    val cand = post
      .join(broadcast(dfT), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("sc", partialScore(col("n_corpus"), col("df_t"),
        col("tf"), col("dl"), col("avgdl")))
    // Fixed-order sum of the per-term partials (each agg sees <= 1 row per
    // doc): float addition stays order-deterministic on both engines.
    val termAggs = queryTerms.zipWithIndex.map { case (t, i) =>
      sum(when(col("term") === t, col("sc"))).as(s"sc_$i")
    }
    val total = queryTerms.indices
      .map(i => coalesce(col(s"sc_$i"), lit(0.0)))
      .reduceLeft[Column](_ + _)
    val scored = cand.groupBy(col("doc_id"))
      .agg(termAggs.head, termAggs.tail: _*)
      .withColumn("score_q", floor(total * lit(1000.0)).cast("bigint"))
    import org.apache.spark.sql.expressions.Window
    // orderBy+limit lowers to TakeOrderedAndProject (per-partition top-k +
    // driver merge — scale-safe); the row_number window then runs over the
    // k surviving rows only, never the full candidate set.
    scored.orderBy(col("score_q").desc, col("doc_id")).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score_q").desc, col("doc_id"))).cast("int"))
      .select(col("doc_id"), col("score_q"), col("rank"))
  }

  /** BM25 top-k with PER-TERM integer quantization: each (doc, term)
    * partial floors to `floor(1000·sc)` BEFORE the sum, which then runs
    * in BIGINT — addition is order-free, so this form is safe for
    * DATA-DERIVED term sets (RM3 expansion, q229) where [[bm25Core]]'s
    * fixed-order float sum cannot apply (the term list is not known
    * when the plan's literal addition chain would be built). The price
    * is one floor per term instead of one per doc — a quantization
    * granularity difference, not an accuracy one, and the oracle
    * mirrors it exactly. Callers pass already-normalized terms. */
  def bm25TopKQuantized(post0: DataFrame, dl0: DataFrame,
                        queryTerms: Seq[String], k: Int): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    val post = graft.ops.TransientCache.persist(
      post0.where(col("term").isin(queryTerms: _*)))
    val stats = dl0.agg(count(lit(1)).as("n_corpus"), sum(col("dl")).as("tot_dl"))
      .withColumn("avgdl", col("tot_dl").cast("double") / col("n_corpus").cast("double"))
    val dfT = post.groupBy(col("term")).agg(count(lit(1)).as("df_t"))
    val scored = post
      .join(broadcast(dfT), "term")
      .join(dl0, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("sq", floor(partialScore(col("n_corpus"), col("df_t"),
        col("tf"), col("dl"), col("avgdl")) * lit(1000.0)).cast("bigint"))
      .groupBy(col("doc_id")).agg(sum(col("sq")).as("score_q"))
    import org.apache.spark.sql.expressions.Window
    scored.orderBy(col("score_q").desc, col("doc_id")).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score_q").desc, col("doc_id"))).cast("int"))
      .select(col("doc_id"), col("score_q"), col("rank"))
  }
}
