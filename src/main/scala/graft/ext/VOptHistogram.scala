package graft.ext

/** V-optimal histogram (Jagadish, Koudas, Muthukrishnan, Poosala,
  * Sevcik & Suel, VLDB 1998: "Optimal Histograms with Quality
  * Guarantees"): partition an ORDERED frequency vector into B
  * contiguous buckets minimizing total within-bucket SSE — the
  * synopsis that beats equi-width and equi-depth for selectivity
  * estimation, computed by exact O(V²·B) dynamic programming.
  *
  * The frequency vector here is VALUE-RANGE-bounded (V ≤ 16 whatever
  * the row count), so the DP is model-sized driver work at any data
  * scale — the same discipline as the q238 lattice.
  *
  * Integer exactness: SSE(seg) = Σf² − (Σf)²/len is rational with
  * denominator len; every segment error is scaled by LCM/len with
  * LCM = 720720 = lcm(1..16), so totals across different bucketings
  * compare in exact int64 (len always divides the LCM). Ties break
  * toward the smaller split index — the SQL oracle's (err, k)
  * row_number ranking, reproduced here by keeping the first minimum
  * while k ascends.
  */
object VOptHistogram {

  val Lcm: Long = 720720L

  /** 1-based inclusive index bounds into the frequency vector. */
  final case class Bucket(bucket: Int, loIdx: Int, hiIdx: Int,
                          nRows: Long, sseScaled: Long)

  /** Fit B buckets over `freqs` (ordered by domain value). Returns the
    * buckets and the total scaled SSE. */
  def fit(freqs: Seq[Long], b: Int): (Seq[Bucket], Long) = {
    val v = freqs.length
    require(b >= 1 && v >= b, s"need ≥ $b frequencies, got $v")
    require(v <= 16, s"frequency vector must be value-range-bounded (≤16), got $v")
    freqs.foreach(f => require(f >= 0L, "negative frequency"))
    val n = freqs.sum
    // 720720·n² < 2^63 ⟺ n ≤ 3.57e6 — beyond that, rescale counts
    // (divide by a common factor) before fitting; fail loudly here.
    require(n <= 3500000L,
      s"scaled SSE would overflow int64 at n=$n: rescale counts first")

    val cf = freqs.scanLeft(0L)(_ + _).toArray
    val cf2 = freqs.scanLeft(0L)((a, f) => a + f * f).toArray
    def err(lo: Int, hi: Int): Long = {
      val len = hi - lo + 1
      val sf = cf(hi) - cf(lo - 1)
      val sf2 = cf2(hi) - cf2(lo - 1)
      (Lcm / len) * (len * sf2 - sf * sf)
    }

    // dp(bb)(j) = (best error for bb buckets over 1..j, split index k)
    val dp = Array.ofDim[(Long, Int)](b + 1, v + 1)
    var j = 1
    while (j <= v) { dp(1)(j) = (err(1, j), 0); j += 1 }
    var bb = 2
    while (bb <= b) {
      j = bb
      while (j <= v) {
        var best = Long.MaxValue
        var bestK = 0
        var k = bb - 1
        while (k <= j - 1) {
          val e = dp(bb - 1)(k)._1 + err(k + 1, j)
          if (e < best) { best = e; bestK = k } // ties keep smallest k
          k += 1
        }
        dp(bb)(j) = (best, bestK)
        j += 1
      }
      bb += 1
    }

    val total = dp(b)(v)._1
    var cuts = List(v)
    var cur = v
    bb = b
    while (bb >= 2) { cur = dp(bb)(cur)._2; cuts = cur :: cuts; bb -= 1 }
    val all = 0 :: cuts
    val buckets = (1 to b).map { i =>
      val lo = all(i - 1) + 1
      val hi = all(i)
      Bucket(i, lo, hi, cf(hi) - cf(lo - 1), err(lo, hi))
    }
    (buckets, total)
  }
}
