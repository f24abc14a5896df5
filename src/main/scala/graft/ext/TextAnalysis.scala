package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for the large-scale training-data pipeline
  * surface (BASELINE.json north star; no counterpart in the reference —
  * the closest is its Spanish FTS, SURVEY.md §2.8 F17).
  *
  * Every function is a pure column expression (whole-stage codegen, no
  * UDFs, no shuffle): at 100 TB these run map-side at scan speed.
  */
object TextAnalysis {

  /** Lowercase + strip non-alphanumerics. TESTDATA documents are already
    * `[a-z0-9 ]` but arbitrary corpora aren't. */
  def normalize(text: Column): Column =
    regexp_replace(lower(text), "[^a-z0-9 ]", " ")

  /** Whitespace tokens, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => length(t) > 0)

  /** BPE-ish subword count: runs of letters / digits each count once
    * (a cheap proxy for byte-pair tokenizers). */
  def regexTokenCount(text: Column): Column =
    regexp_count(text, lit("[a-z]+|[0-9]+"))

  /** Stopword-list hit count for one language. */
  def stopwordHits(toks: Column, stopwords: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(stopwords)))

  /** Tiny per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. Order = detection priority. */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "is", "of", "to", "and", "in", "that"),
    "es" -> Seq("el", "la", "los", "las", "una", "para", "por", "como"),
    "de" -> Seq("der", "die", "das", "und", "ist", "mit", "von", "nicht"),
    "fr" -> Seq("le", "les", "une", "est", "pour", "dans", "sur", "avec"))

  /** Language-ID: argmax of stopword hits, priority order on ties, `und`
    * when nothing matches. Adds `s_<lang>` score columns + `lang_detected`. */
  def withLangId(df: DataFrame, textCol: String): DataFrame = {
    val toks = tokens(normalize(col(textCol)))
    val scored = langStopwords.foldLeft(df) { case (d, (l, sw)) =>
      d.withColumn(s"s_$l", stopwordHits(toks, sw))
    }
    val langs = langStopwords.map(_._1)
    val detected = langs.zipWithIndex.foldRight(lit("und")) { case ((l, i), els) =>
      val beats = langs.drop(i + 1).map(o => col(s"s_$l") >= col(s"s_$o")) :+
        (col(s"s_$l") > 0)
      val wins = langs.take(i).map(o => col(s"s_$l") > col(s"s_$o")) ++ beats
      when(wins.reduce(_ && _), lit(l)).otherwise(els)
    }
    scored.withColumn("lang_detected", detected)
  }

  /** Integer-exact quality scoring: lexical diversity minus stopword
    * density, in percent. Integer division keeps Spark and any SQL oracle
    * bit-identical (no float/decimal division divergence). */
  def withQuality(df: DataFrame, textCol: String): DataFrame = {
    val toks = tokens(normalize(col(textCol)))
    val allStops = langStopwords.flatMap(_._2)
    df.withColumn("n_tokens", size(toks))
      .withColumn("n_uniq", size(array_distinct(toks)))
      .withColumn("n_stop", stopwordHits(toks, allStops))
      .withColumn("quality",
        when(col("n_tokens") > 0,
          expr("(100 * n_uniq) div n_tokens - (50 * n_stop) div n_tokens"))
          .otherwise(lit(0L)))
  }

  /** Canonical document fingerprint: md5 over the sorted distinct token
    * set — robust to word order, engine-portable. */
  def fingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(normalize(text)))), " ").cast("binary"))

  /** Karp–Rabin rolling-hash fingerprint over character 5-grams: per
    * position i, g(i) = Σ_j ascii(c_{i+j})·31^j (exact BIGINT — max
    * ~1.2e8, no modulus needed, so any engine reproduces it); the doc
    * fingerprint is (n_grams, min g, max g) — the 1-minhash of the gram
    * hash stream plus its range. Pure codegen'd scalar expressions after
    * a position explode. */
  def rollingHashFingerprint(df: DataFrame, textCol: String,
                             idCol: String): DataFrame = {
    val k = 5
    val powers = (0 until k).map(j => math.pow(31, j).toLong)
    val gram = powers.zipWithIndex
      .map { case (p, j) => s"$p * ascii(substr(norm, i + $j, 1))" }
      .mkString(" + ")
    df.select(col(idCol).as("doc"), normalize(col(textCol)).as("norm"))
      .where(length(col("norm")) >= k)
      .select(col("doc"), col("norm"),
        explode(sequence(lit(1), length(col("norm")) - (k - 1))).as("i"))
      .selectExpr("doc", s"CAST($gram AS BIGINT) AS g")
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n_grams"), min(col("g")).as("min_hash"),
        max(col("g")).as("max_hash"))
  }
}
