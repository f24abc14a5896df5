package graft.queries

import graft.Tables
import graft.ext.{SpanishStemmer, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** F17 completion: Snowball-Spanish STEMMED full-text search — the lexeme
  * semantics of the reference's `to_tsvector('spanish', ...)` GIN index
  * (reference: `database/migrations/001_initial_schema.sql:87-88,128-129`),
  * which was the last declared §2.8 divergence (accent-folding alone).
  *
  * Oracle strategy: DuckDB has no offline Snowball, so the oracle carries
  * the (surface term → stem) mapping as a golden VALUES table — hand-audited
  * against the published algorithm (see SpanishStemmerSpec's traced pairs).
  * The gate is real in both directions: a Spark-side stem the table lacks
  * adds an unmatched group (row-count mismatch), and a stem disagreeing
  * with the audited value breaks the hash.
  *
  * Scale: stemming is a per-token pure function inside a typed flatMap —
  * map-side at scan speed, no shuffle before the final aggregate; the
  * postings output is written bucketed by stem at real scale (q49 note).
  */
object StemmedFtsQueries {

  /** Spanish member captions keyed by nation key — the analogue of the
    * reference's Spanish caption columns its FTS indexes. Closed lexicon:
    * every token appears in the oracle's golden stem table. */
  val captions: Seq[(Int, String)] = Seq(
    0 -> "nación con montañas y valles grandes",
    1 -> "ciudades modernas con universidades brillantes",
    2 -> "el desierto tiene pueblos antiguos",
    3 -> "playas con música y bailes populares",
    4 -> "exporta petróleo y minerales",
    5 -> "café y comida deliciosa",
    6 -> "vinos exquisitos del sur",
    7 -> "historia milenaria de imperios antiguos",
    8 -> "tecnología avanzada y economía creciendo",
    9 -> "comercio marítimo en puertos grandes",
    10 -> "selvas tropicales y ríos grandes",
    11 -> "pescadores en islas del norte",
    12 -> "gobierno con presidencia y congreso",
    13 -> "universidades con estudiantes brillantes",
    14 -> "montañosas tierras y lagos",
    15 -> "producción industrial creciendo rápidamente",
    16 -> "canciones tradicionales y bailes históricas",
    17 -> "trabajadores con esperanza y corazón",
    18 -> "comunicación y soluciones de tecnología",
    19 -> "agricultura con actividades importantes",
    20 -> "volcanes y cordillera en la frontera",
    21 -> "conocimiento de biología y capacidades",
    22 -> "nacionalismo y movimientos del siglo",
    23 -> "amigos trabajando en la tierra",
    24 -> "niños creciendo con años de esperanza")

  /** Session-materialized stemmed-index artifacts (the
    * `to_tsvector('spanish')` GIN index the reference stores): surface
    * postings for search/audit, tf postings + doc lengths for ranking —
    * build once per session, queries probe the stored index
    * (ExtQueries.ftsInverted contract; Bench's cold pass measures the
    * builds). */
  private[queries] def stemSurfacePostings(s: SparkSession, d: String): DataFrame =
    graft.ops.SessionCache.getOrBuild(s, s"fts_stem_surface:$d")(
      TextAnalysis.stemmedPostings(Tables.documents(s, d), "text", "doc_id"))

  private[queries] def stemPostingsTf(s: SparkSession, d: String): DataFrame =
    graft.ops.SessionCache.getOrBuild(s, s"fts_stem_tf:$d")(
      graft.ext.Ranking.stemmedPostingsWithTf(Tables.documents(s, d), "text", "doc_id"))

  private[queries] def stemDocLengths(s: SparkSession, d: String): DataFrame =
    graft.ops.SessionCache.getOrBuild(s, s"fts_stem_dl:$d")(
      graft.ext.Ranking.docLengthsEs(Tables.documents(s, d), "text", "doc_id"))

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Stemmed lexeme index over real Spanish morphology: nation captions
    // → tokens → Snowball stems → per-stem document frequency. Conflation
    // is observable in the result (trabajadores+trabajando → one stem
    // with n_nations=2; montañas+montañosas likewise).
    "q122_fts_stemmed_es" -> ((s, d) => {
      import s.implicits._
      val caps = s.createDataFrame(captions).toDF("key", "caption")
      Tables.nation(s, d).select(col("n_nationkey").cast("int").as("key"))
        .join(broadcast(caps), "key")
        .select(col("key").cast("long"), col("caption"))
        .as[(Long, String)]
        .flatMap { case (k, cap) =>
          TextAnalysis.tokenizeJvm(TextAnalysis.normalizeEsJvm(cap))
            .map(t => (k, SpanishStemmer.stem(t)))
        }
        .toDF("nation_key", "stem")
        .groupBy(col("stem"))
        .agg(countDistinct(col("nation_key")).as("n_nations"),
          count(lit(1)).as("tf"))
        .orderBy(col("stem"))
    }),

    // Stemmed conjunctive search: plainto_tsquery('spanish') semantics —
    // the needles "tables"/"values" find docs containing "table"/"value"
    // because index AND needle go through the same single stemming pass.
    "q123_fts_stemmed_search" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      TextAnalysis.searchAllStems(stemSurfacePostings(s, d), Seq("tables", "values"))
        .join(docs.select(col("doc_id"), col("source"), col("lang")), "doc_id")
        .orderBy(col("doc_id"))
    }),

    // Full-vocabulary stem audit: every surface term in the documents
    // table grouped under its stem — verifies the complete 31-term
    // mapping (and the conflation counts) against the golden table.
    "q124_fts_stemmed_index" -> ((s, d) =>
      stemSurfacePostings(s, d)
        .groupBy(col("stem"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          countDistinct(col("term")).as("n_terms"))
        .orderBy(col("stem"))),

    // Stemmed BM25 (F17 ranked retrieval): ts_rank over the Spanish
    // lexeme index — Spanish-inflected needles (tablas, merges) rank
    // docs containing table/merge because they share stems; scoring,
    // quantization and top-k plan identical to q55's surface-term BM25.
    "q125_fts_stemmed_bm25" -> ((s, d) =>
      graft.ext.Ranking.bm25TopKStemmedFromIndex(stemPostingsTf(s, d),
        stemDocLengths(s, d), Seq("tablas", "merges"), 10)
        .orderBy(col("rank"))),

    // Hybrid retrieval, stemmed edition (r6 verdict item 6): q135's
    // BM25+ANN reciprocal-rank fusion with the lexical leg swapped to
    // the STEMMED lexeme index — the better retriever, since inflected
    // needles recall morphological variants the surface-term leg
    // misses. Both legs are session index artifacts; the fusion joins
    // two k-row tables; reciprocal ranks integer-quantized as in q135.
    "q140_hybrid_rrf_stemmed" -> ((s, d) => {
      val lex = graft.ext.Ranking.bm25TopKStemmedFromIndex(
          stemPostingsTf(s, d), stemDocLengths(s, d),
          Seq("tablas", "merges"), 50)
        .select(col("doc_id"), col("rank").as("lex_rank"))
      val sem = graft.ext.Similarity.bruteForceTopK(Tables.embeddings(s, d),
          "vec_id", "embedding", col("vec_id") === 0, 50)
        .select(col("vec_id").cast("long").as("doc_id"),
          col("rank").as("sem_rank"))
      lex.join(sem, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          coalesce(col("lex_rank"), lit(0)).as("lex_rank"),
          coalesce(col("sem_rank"), lit(0)).as("sem_rank"),
          (coalesce(expr("1000000000 div (60 + lex_rank)"), lit(0L)) +
            coalesce(expr("1000000000 div (60 + sem_rank)"), lit(0L)))
            .as("rrf_score"))
        .orderBy(desc("rrf_score"), col("doc_id"))
        .limit(20)
    })
  )

  // ---------------------------------------------------------------- oracles

  /** Golden stems for the caption lexicon — audited by hand against the
    * published Snowball Spanish algorithm (step-by-step traces in
    * SpanishStemmerSpec cover every branch these words exercise). */
  private val captionStems: Seq[(String, String)] = Seq(
    "actividades" -> "activ", "agricultura" -> "agricultur",
    "amigos" -> "amig", "antiguos" -> "antigu", "avanzada" -> "avanz",
    "años" -> "años", "bailes" -> "bail", "biología" -> "biolog",
    "brillantes" -> "brillant", "café" -> "caf", "canciones" -> "cancion",
    "capacidades" -> "capac", "ciudades" -> "ciudad", "comercio" -> "comerci",
    "comida" -> "com", "comunicación" -> "comun", "con" -> "con",
    "congreso" -> "congres", "conocimiento" -> "conoc",
    "corazón" -> "corazon", "cordillera" -> "cordiller",
    "creciendo" -> "crec", "de" -> "de", "del" -> "del",
    "deliciosa" -> "delici", "desierto" -> "desiert",
    "economía" -> "econom", "el" -> "el", "en" -> "en",
    "esperanza" -> "esper", "estudiantes" -> "estudi",
    "exporta" -> "export", "exquisitos" -> "exquisit",
    "frontera" -> "fronter", "gobierno" -> "gobiern",
    "grandes" -> "grand", "historia" -> "histori",
    "históricas" -> "histor", "imperios" -> "imperi",
    "importantes" -> "import", "industrial" -> "industrial",
    "islas" -> "islas", "la" -> "la", "lagos" -> "lag",
    "marítimo" -> "maritim", "milenaria" -> "milenari",
    "minerales" -> "mineral", "modernas" -> "modern",
    "montañas" -> "montañ", "montañosas" -> "montañ",
    "movimientos" -> "movimient", "música" -> "music",
    "nacionalismo" -> "nacional", "nación" -> "nacion",
    "niños" -> "niñ", "norte" -> "nort", "pescadores" -> "pescador",
    "petróleo" -> "petrole", "playas" -> "play",
    "populares" -> "popular", "presidencia" -> "president",
    "producción" -> "produccion", "pueblos" -> "puebl",
    "puertos" -> "puert", "rápidamente" -> "rapid", "ríos" -> "rios",
    "selvas" -> "selv", "siglo" -> "sigl", "soluciones" -> "solucion",
    "sur" -> "sur", "tecnología" -> "tecnolog", "tiene" -> "tien",
    "tierra" -> "tierr", "tierras" -> "tierr",
    "trabajadores" -> "trabaj", "trabajando" -> "trabaj",
    "tradicionales" -> "tradicional", "tropicales" -> "tropical",
    "universidades" -> "univers", "valles" -> "vall", "vinos" -> "vin",
    "volcanes" -> "volcan", "y" -> "y")

  /** Golden stems for the fixed 31-term documents vocabulary (TESTDATA.md;
    * the Spanish algorithm applied to the synthetic English terms — each
    * audited the same way: customer→custom and filter→filt lose the -er
    * verb suffix in RV, table/value/line/merge lose a residual -e,
    * data→dat a residual -a; order keeps -er because RV starts after it). */
  private val docStems: Seq[(String, String)] = Seq(
    "a" -> "a", "agg" -> "agg", "batch" -> "batch", "big" -> "big",
    "column" -> "column", "customer" -> "custom", "data" -> "dat",
    "dup" -> "dup", "fast" -> "fast", "filter" -> "filt",
    "group" -> "group", "hash" -> "hash", "join" -> "join", "key" -> "key",
    "line" -> "lin", "merge" -> "merg", "order" -> "order",
    "part" -> "part", "query" -> "query", "row" -> "row", "scan" -> "scan",
    "slow" -> "slow", "small" -> "small", "sort" -> "sort",
    "spark" -> "spark", "stream" -> "stream", "table" -> "tabl",
    "the" -> "the", "value" -> "valu", "vector" -> "vector",
    "window" -> "window")

  private def valuesRows(rows: Seq[(String, String)]): String =
    rows.map { case (t, s) => s"('$t', '$s')" }.mkString(",\n    ")

  private val docStemCte =
    s"""stems(term, stem) AS (VALUES
       |    ${valuesRows(docStems)}),
       |tok AS (SELECT doc_id, unnest(list_distinct(list_filter(string_split(
       |    regexp_replace(lower(text), '[^a-z0-9áéíóúüñ ]', ' ', 'g'), ' '),
       |    x -> len(x) > 0))) AS term
       |  FROM documents)""".stripMargin

  val oracles: Map[String, String] = Map(

    "q122_fts_stemmed_es" ->
      s"""WITH captions(key, caption) AS (VALUES
         |    ${captions.map { case (k, c) => s"($k, '$c')" }.mkString(",\n    ")}),
         |stems(term, stem) AS (VALUES
         |    ${valuesRows(captionStems)}),
         |tok AS (SELECT n.n_nationkey AS nation_key,
         |    unnest(list_filter(string_split(
         |      regexp_replace(lower(c.caption), '[^a-z0-9áéíóúüñ ]', ' ', 'g'),
         |      ' '), x -> len(x) > 0)) AS term
         |  FROM nation n JOIN captions c ON n.n_nationkey = c.key)
         |SELECT s.stem, CAST(count(DISTINCT t.nation_key) AS BIGINT) AS n_nations,
         |       CAST(count(*) AS BIGINT) AS tf
         |FROM tok t JOIN stems s USING (term)
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q123_fts_stemmed_search" ->
      s"""WITH $docStemCte,
         |m AS (SELECT t.doc_id FROM tok t JOIN stems s USING (term)
         |      WHERE s.stem IN ('tabl', 'valu')
         |      GROUP BY t.doc_id HAVING count(DISTINCT s.stem) = 2)
         |SELECT d.doc_id, d.source, d.lang
         |FROM m JOIN documents d USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    "q124_fts_stemmed_index" ->
      s"""WITH $docStemCte
         |SELECT s.stem, CAST(count(DISTINCT t.doc_id) AS BIGINT) AS n_docs,
         |       CAST(count(DISTINCT t.term) AS BIGINT) AS n_terms
         |FROM tok t JOIN stems s USING (term)
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Mirrors PipelineQueries.bm25Sql token-for-token (same explicit
    // parenthesization + floor-quantization), with the tf/df/candidate
    // CTEs keyed on the golden-table stem instead of the surface term.
    "q125_fts_stemmed_bm25" -> stemmedBm25Sql(10),

    // Stemmed lexical leg + ANN leg fused by RRF — q135's fusion with
    // the BETTER lexical retriever (the lexeme index conflates
    // inflections, so "tablas"/"merges" recall table/merge docs the
    // surface-term leg misses). Fusion arithmetic identical to q135.
    "q140_hybrid_rrf_stemmed" ->
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
         |l AS (SELECT doc_id, rank rnk FROM (${stemmedBm25Sql(50)})),
         |f AS (SELECT coalesce(l.doc_id, m.doc_id) doc_id, l.rnk lr, m.rnk mr
         |      FROM l FULL JOIN m ON l.doc_id = m.doc_id)
         |SELECT doc_id,
         |  CAST(coalesce(lr, 0) AS INT) AS lex_rank,
         |  CAST(coalesce(mr, 0) AS INT) AS sem_rank,
         |  CAST(coalesce(1000000000 // (60 + lr), 0)
         |     + coalesce(1000000000 // (60 + mr), 0) AS BIGINT) AS rrf_score
         |FROM f
         |ORDER BY rrf_score DESC, doc_id LIMIT 20""".stripMargin
  )

  /** The q125 stemmed-BM25 oracle, parameterized by k so the RRF fusion
    * oracle (q140) can embed the identical scoring text as its lexical
    * leg — one statement of the convention, two consumers. */
  private def stemmedBm25Sql(k: Int): String = {
      val stems = Seq("tabl", "merg") // stem("tablas"), stem("merges")
      val inList = stems.map(t => s"'$t'").mkString(", ")
      val fixedSum = stems.map(t =>
        s"COALESCE(sum(CASE WHEN stem = '$t' THEN sc END), CAST(0.0 AS DOUBLE))")
        .mkString("\n    + ")
      s"""WITH stems(term, stem) AS (VALUES
         |    ${valuesRows(docStems)}),
         |tokf AS (SELECT doc_id, list_filter(string_split(
         |    regexp_replace(lower(text), '[^a-z0-9áéíóúüñ ]', ' ', 'g'), ' '),
         |    x -> len(x) > 0) t
         |  FROM documents),
         |post AS (SELECT doc_id, unnest(t) term FROM tokf),
         |lex AS (SELECT p.doc_id, s.stem FROM post p JOIN stems s USING (term)),
         |tf AS (SELECT stem, doc_id, count(*) tf
         |       FROM lex WHERE stem IN ($inList) GROUP BY 1, 2),
         |dl AS (SELECT doc_id, len(t) dl FROM tokf),
         |stats AS (SELECT count(*) n_corpus, sum(dl) tot_dl,
         |            CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) avgdl
         |          FROM dl),
         |dft AS (SELECT stem, count(*) df_t FROM tf GROUP BY 1),
         |sc AS (SELECT tf.doc_id, tf.stem,
         |    ln(CAST(1.0 AS DOUBLE) +
         |       (CAST(n_corpus AS DOUBLE) - CAST(df_t AS DOUBLE) + CAST(0.5 AS DOUBLE))
         |       / (CAST(df_t AS DOUBLE) + CAST(0.5 AS DOUBLE)))
         |    * ((CAST(tf AS DOUBLE) * CAST(2.2 AS DOUBLE))
         |       / (CAST(tf AS DOUBLE) + CAST(1.2 AS DOUBLE) *
         |          (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * CAST(dl AS DOUBLE) / avgdl))) sc
         |  FROM tf JOIN dl USING (doc_id) JOIN dft USING (stem) CROSS JOIN stats),
         |tot AS (SELECT doc_id,
         |    $fixedSum s
         |  FROM sc GROUP BY doc_id),
         |q AS (SELECT doc_id, CAST(floor(s * CAST(1000.0 AS DOUBLE)) AS BIGINT) score_q FROM tot)
         |SELECT doc_id, score_q,
         |  CAST(row_number() OVER (ORDER BY score_q DESC, doc_id) AS INT) AS rank
         |FROM q QUALIFY rank <= $k ORDER BY rank""".stripMargin
  }
}
