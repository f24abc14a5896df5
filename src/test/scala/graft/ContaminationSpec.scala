package graft

import graft.ext.{Contamination, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit semantics for the corpus-hygiene operators (decontamination,
  * duplicate-gram share, vocabulary head) on hand-checkable fixtures:
  * gram distinctness, short/NULL docs, ppm arithmetic, rank ties. */
class ContaminationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("benchmarkOverlap: counts distinct-gram hits; short docs drop") {
    val cand = docs(
      1L -> "a b c d",       // bigrams: ab, bc, cd
      2L -> "x y x y x",     // bigrams (distinct): xy, yx
      3L -> "solo")          // < 2 tokens -> no grams -> absent
    val bench = docs(10L -> "b c d e", 11L -> "x y z")
    val got = Contamination.benchmarkOverlap(cand, bench, "text", "doc_id", 2)
      .orderBy("doc_id").collect()
    assert(got.length == 2)
    // doc 1: grams {a b, b c, c d}; bench has {b c, c d, d e, x y, y z} -> 2 hits
    assert(got(0).getAs[Long]("n_grams") == 3L)
    assert(got(0).getAs[Long]("n_hit") == 2L)
    assert(got(0).getAs[Long]("hit_ppm") == 666666L)
    // doc 2: distinct grams {x y, y x}; only "x y" in bench
    assert(got(1).getAs[Long]("n_grams") == 2L)
    assert(got(1).getAs[Long]("n_hit") == 1L)
    assert(got(1).getAs[Long]("hit_ppm") == 500000L)
  }

  test("duplicateGramShare: repeated-in-one-doc grams count once; minDf") {
    val d = docs(
      1L -> "a b a b",   // distinct bigrams: {a b, b a}
      2L -> "a b c",     // {a b, b c}
      3L -> "q r s")     // {q r, r s} — nothing shared
    val got = Contamination.duplicateGramShare(d, "text", "doc_id", 2)
      .orderBy("doc_id").collect()
    // "a b" is the only gram with df >= 2 (df counts docs, not occurrences)
    assert(got(0).getAs[Long]("n_grams") == 2L &&
      got(0).getAs[Long]("n_shared") == 1L &&
      got(0).getAs[Long]("shared_ppm") == 500000L)
    assert(got(1).getAs[Long]("n_shared") == 1L)
    assert(got(2).getAs[Long]("n_shared") == 0L &&
      got(2).getAs[Long]("shared_ppm") == 0L)
  }

  test("vocabTopK: freq/doc_freq split, tie rank by token, k cap") {
    val d = docs(
      1L -> "b b a",
      2L -> "a c b",
      3L -> (null: String))  // NULL text contributes nothing
    val got = TextAnalysis.vocabTopK(d, "text", "doc_id", 2)
      .orderBy("rank").collect()
    assert(got.length == 2)
    // b: freq 3 (2 docs); a: freq 2 (2 docs); c: freq 1 — cut by k=2
    assert(got(0).getAs[Int]("rank") == 1 &&
      got(0).getAs[String]("token") == "b" &&
      got(0).getAs[Long]("freq") == 3L &&
      got(0).getAs[Long]("doc_freq") == 2L)
    assert(got(1).getAs[String]("token") == "a" &&
      got(1).getAs[Long]("freq") == 2L)
  }

  test("vocabTopK: equal-frequency ties rank lexicographically") {
    val d = docs(1L -> "z y x")
    val got = TextAnalysis.vocabTopK(d, "text", "doc_id", 3)
      .orderBy("rank").collect()
    assert(got.map(_.getAs[String]("token")).toSeq == Seq("x", "y", "z"))
  }

  test("empty inputs produce empty, well-typed results") {
    val e = docs()
    assert(Contamination.benchmarkOverlap(e, e, "text", "doc_id", 2).count() == 0L)
    assert(Contamination.duplicateGramShare(e, "text", "doc_id", 2).count() == 0L)
    assert(TextAnalysis.vocabTopK(e, "text", "doc_id", 5).count() == 0L)
  }
}
