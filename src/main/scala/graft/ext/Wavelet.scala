package graft.ext

import scala.collection.mutable.ArrayBuffer

/** Haar wavelet synopsis (Matias, Vitter & Wang, SIGMOD 1998:
  * "Wavelet-Based Histograms for Selectivity Estimation") — the OTHER
  * classic synopsis next to the V-optimal histogram ([[VOptHistogram]]):
  * transform the ordered frequency vector, keep the few largest
  * coefficients, reconstruct approximately.
  *
  * Everything stays in exact int64 by using the UNNORMALIZED transform
  * (pairwise sums and differences — no √2): with the vector padded to
  * 16, reconstruction is 16·x_i = s_total ± d₄ ± 2·d₃ ± 4·d₂ ± 8·d₁,
  * so dropping detail coefficient d at level l (1 = finest) adds
  * exactly d²·2^(8−l) to Σ(16·x − 16·x̂)² — Haar details are
  * orthogonal, so the thresholding error is the SUM OF DROPPED
  * ENERGIES, no reconstruction pass needed. That integer energy is
  * also the keep/drop ranking key (imp DESC, lev, idx — the contract
  * the SQL oracle restates).
  *
  * The input is value-range-bounded (≤16 entries — model-sized driver
  * work, the q238/q240 discipline).
  */
object Wavelet {

  /** Details of the 16-padded vector as (lev, idx, coeff, energy) with
    * lev 1 = finest, plus the always-kept total coefficient. */
  def haarDetails(freqs: Seq[Long]): (Seq[(Int, Int, Long, Long)], Long) = {
    require(freqs.nonEmpty && freqs.length <= 16,
      s"vector must be value-range-bounded (≤16), got ${freqs.length}")
    freqs.foreach(f => require(math.abs(f) <= 3000000L,
      "rescale counts: wavelet energy would overflow int64"))
    var cur = (freqs ++ Seq.fill(16 - freqs.length)(0L)).toIndexedSeq
    var lev = 1
    val out = new ArrayBuffer[(Int, Int, Long, Long)]
    while (cur.length > 1) {
      val pairs = cur.grouped(2).toIndexedSeq
      pairs.zipWithIndex.foreach { case (p, i) =>
        val d = p(0) - p(1)
        out += ((lev, i, d, d * d * (1L << (8 - lev))))
      }
      cur = pairs.map(p => p(0) + p(1))
      lev += 1
    }
    (out.toSeq, cur.head)
  }

  /** 16·x̂ for all 16 positions from the total plus kept (lev, idx,
    * coeff) details: 16·x̂_i = s_total + Σ sign·coeff·2^(4−lev), sign
    * by bit (lev−1) of i, support block i >> lev. (WaveletSpec keeps
    * its own independent copy of this identity as the cross-check.) */
  def reconstruct16(total: Long, kept: Seq[(Int, Int, Long)]): Seq[Long] =
    (0 until 16).map { i =>
      var v = total
      kept.foreach { case (lev, idx, c) =>
        if ((i >> lev) == idx) {
          val sign = if (((i >> (lev - 1)) & 1) == 0) 1L else -1L
          v += sign * c * (1L << (4 - lev))
        }
      }
      v
    }

  /** Top-k thresholding: kept coefficients ranked by (energy DESC,
    * lev, idx) and the exact scaled SSE of the dropped rest. */
  def threshold(freqs: Seq[Long], k: Int)
      : (Seq[(Int, Int, Int, Long, Long)], Long, Long) = {
    val (details, total) = haarDetails(freqs)
    val ranked = details.sortBy { case (l, i, _, e) => (-e, l, i) }
    val kept = ranked.take(k).zipWithIndex.map {
      case ((l, i, c, e), r) => (r + 1, l, i, c, e)
    }
    (kept, total, ranked.drop(k).map(_._4).sum)
  }
}
