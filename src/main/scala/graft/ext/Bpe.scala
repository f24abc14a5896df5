package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training + corpus encode (Sennrich,
  * Haddow & Birch 2016, "Neural Machine Translation of Rare Words with
  * Subword Units" — the word-level training loop): merges learn from a
  * WORD-FREQUENCY table, never the token stream, so the corpus-scale
  * work is exactly one token-count aggregate (the session `tok_counts`
  * artifact) and training runs on a frequency table capped to the top-V
  * words — model-sized driver state, the k-means-centroid discipline.
  * Encoding then applies the learned merge list to each token as a
  * chain of codegen'd `replace` calls — scan-speed, no driver, no
  * shuffle, and new (unseen) words encode fine because merges are
  * position rules, not a lookup table.
  *
  * Determinism contract (oracle-replayable across engines):
  *   - a segmentation is the guarded string " s1 s2 ... sn ";
  *   - one merge application = ONE left-to-right non-overlapping
  *     `replace(seg, " a b ", " ab ")` pass (the SQL `replace`
  *     semantics, identical in the JVM); canonical BPE differs only
  *     when the same pair abuts itself ("a b a b" merges once here,
  *     twice in the paper's loop) — a corpus with q152's run collapse
  *     upstream never hits the divergence, and both engines implement
  *     the SAME rule, so the oracle compare is exact;
  *   - per round the winning pair maximizes (frequency-weighted count,
  *     then lexicographic (a, b) ascending) — total order, no RNG.
  *
  * Reference surface: the token statistics family of
  * /root/reference (BASELINE.json extension ops); q82's single-step
  * pair statistics are this loop's first iteration.
  */
object Bpe {

  final case class Merge(rank: Int, symA: String, symB: String, pairCount: Long)

  /** " a b c " guarded char segmentation of a word. */
  def guardedSeg(word: String): String =
    " " + word.toCharArray.mkString(" ") + " "

  /** One merge application — the contract's single non-overlapping
    * left-to-right pass (Java's String.replace == SQL replace). */
  def applyMerge(seg: String, a: String, b: String): String =
    seg.replace(" " + a + " " + b + " ", " " + a + b + " ")

  /** Train `nMerges` merges on a (word, freq) table. Pure driver loop —
    * the input is the CAPPED head of the word-frequency aggregate, so
    * its size is a constant of the model, not of the corpus. Stops
    * early when no adjacent pair remains. */
  def trainMerges(wordFreq: Seq[(String, Long)], nMerges: Int): Seq[Merge] = {
    var segs = wordFreq.map { case (w, f) => (guardedSeg(w), f) }
    val out = Seq.newBuilder[Merge]
    var r = 1
    var done = false
    while (r <= nMerges && !done) {
      val counts = scala.collection.mutable.LinkedHashMap.empty[(String, String), Long]
      segs.foreach { case (seg, f) =>
        val syms = seg.trim.split(" ")
        var i = 0
        while (i < syms.length - 1) {
          counts.updateWith((syms(i), syms(i + 1)))(v => Some(v.getOrElse(0L) + f))
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((a, b), n) = counts.minBy { case ((a, b), n) => (-n, a, b) }
        out += Merge(r, a, b, n)
        segs = segs.map { case (seg, f) => (applyMerge(seg, a, b), f) }
        r += 1
      }
    }
    out.result()
  }

  /** Column form of the guarded char segmentation: each char followed by
    * a space, with the leading guard — " a b c " (codegen'd regex, no
    * UDF). */
  def segCol(token: Column): Column =
    concat(lit(" "), regexp_replace(token, "(.)", "$1 "))

  /** Encode expression: the merge chain applied as nested codegen'd
    * `replace` calls over [[segCol]]. */
  def encodeSegCol(token: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(segCol(token)) { (seg, m) =>
      replace(seg, lit(" " + m.symA + " " + m.symB + " "),
        lit(" " + m.symA + m.symB + " "))
    }

  /** Encoded length (symbol count) of a token under the merge list. */
  def encodedLenCol(token: Column, merges: Seq[Merge]): Column =
    size(split(trim(encodeSegCol(token, merges)), " "))
}
