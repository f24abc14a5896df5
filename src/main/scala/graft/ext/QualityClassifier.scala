package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Weak-supervised document quality classifier — the "train a cheap
  * classifier on heuristic labels, score the whole corpus" stage of the
  * public curation pipelines (CCNet's fastText LM filter, the
  * LLaMA-style "quality classifier" pass): a multinomial Naive Bayes
  * over hashed unigram buckets, trained IN-ENGINE on labels the Gopher
  * rules (q89) provide for free, then applied back to every document.
  *
  * No counterpart in the reference; standard practice per the public
  * corpus papers (Wenzek et al. 2020 CCNet; Touvron et al. 2023).
  *
  * Engine parity (the DSIR discipline, `Sampling.dsirScores`): features
  * are md5-hashed unigram buckets; each per-bucket log-likelihood ratio
  * collapses to ONE ln() of a rational of exact integer counts,
  * quantized floor(×1000) to BIGINT; document scores are then pure
  * BIGINT Σ count·λ + prior — bit-stable under any summation order.
  * The ln carries the same documented 1-ulp quantization-boundary risk
  * as q97/q105/q133 (see the ACCEPTED RISK note in Sampling).
  *
  * 100 TB shape: one token scan → one (doc, bucket) map-side-combined
  * groupBy; the model is a `buckets`-row table broadcast back onto the
  * profile — fixed-size driver state exactly like the DSIR λ table and
  * the PQ codebooks. Training and scoring share the one persisted
  * profile, so the corpus is walked once.
  */
object QualityClassifier {

  /** Per-document hashed-unigram bucket counts — the feature profile
    * both training and scoring consume. Bucketing matches the DSIR
    * convention: first 8 md5 hex chars as an integer, mod `buckets`
    * (DuckDB twin: `('0x' || substr(md5(token), 1, 8))::BIGINT % B`). */
  def bucketCounts(df: DataFrame, textCol: String, idCol: String,
                   buckets: Int): DataFrame =
    TextAnalysis.tokenRows(df, textCol, idCol)
      .withColumn("bucket", expr(
        s"CAST(conv(substring(md5(CAST(token AS BINARY)), 1, 8), 16, 10) AS BIGINT) % $buckets"))
      .groupBy(col("doc"), col("bucket"))
      .agg(count(lit(1)).as("c"))

  /** Train on `labels` = (doc, clean: boolean) and score every document:
    * λ_b = floor(1000·ln((cc_b+1)(td+B) / ((dc_b+1)(tc+B)))) — Laplace-
    * smoothed class-conditional ratio; prior_q = floor(1000·ln(n_clean /
    * n_dirty)). Returns (doc, clean, score_q, pred_clean) for EVERY
    * labeled doc — token-free docs score prior-only (coalesce 0). */
  def trainAndScore(docBuckets: DataFrame, labels: DataFrame,
                    buckets: Int): DataFrame = {
    val withFlag = docBuckets.join(labels, "doc")
    val model = withFlag.groupBy(col("bucket"))
      .agg(sum(when(col("clean"), col("c")).otherwise(lit(0L))).as("cc"),
        sum(when(!col("clean"), col("c")).otherwise(lit(0L))).as("dc"))
    // Class token totals AND class doc counts are four scalars — one
    // 1-row broadcast literal serves both λ and the prior.
    val totals = model.agg(sum(col("cc")).as("tc"), sum(col("dc")).as("td"))
      .crossJoin(labels.agg(
        sum(when(col("clean"), lit(1L)).otherwise(lit(0L))).as("n_clean"),
        sum(when(!col("clean"), lit(1L)).otherwise(lit(0L))).as("n_dirty")))
    val lambda = model.crossJoin(broadcast(totals))
      .withColumn("lambda", expr(
        s"""CAST(floor(1000 * ln(
           |  (CAST(cc + 1 AS DOUBLE) * CAST(td + $buckets AS DOUBLE)) /
           |  (CAST(dc + 1 AS DOUBLE) * CAST(tc + $buckets AS DOUBLE))
           |)) AS BIGINT)""".stripMargin))
      .select(col("bucket"), col("lambda"))
    val prior = totals.select(expr(
      "CAST(floor(1000 * ln(CAST(n_clean AS DOUBLE) / CAST(n_dirty AS DOUBLE))) AS BIGINT)")
      .as("prior_q"))
    val docScores = docBuckets.join(broadcast(lambda), "bucket")
      .groupBy(col("doc")).agg(sum(col("c") * col("lambda")).as("ll"))
    labels.join(docScores, Seq("doc"), "left")
      .crossJoin(broadcast(prior))
      .withColumn("score_q", coalesce(col("ll"), lit(0L)) + col("prior_q"))
      .withColumn("pred_clean", col("score_q") > 0L)
      .select(col("doc"), col("clean"), col("score_q"), col("pred_clean"))
  }
}
