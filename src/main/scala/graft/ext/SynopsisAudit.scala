package graft.ext

/** Selectivity-synopsis audit helpers: the three classic bucketings
  * over an ordered frequency vector — equi-width, equi-depth (Piatetsky-
  * Shapiro & Connell, SIGMOD 1984's baseline pair) and V-optimal
  * ([[VOptHistogram]]) — plus the uniform-spread prefix-range estimator
  * they all serve. Everything here is pure integer arithmetic over a
  * value-range-bounded vector (model-sized driver work), with the
  * deterministic boundary rules the SQL oracle mirrors literally.
  */
object SynopsisAudit {

  /** Equi-width buckets as 1-based inclusive index ranges:
    * hi_i = (i·V) DIV B — the remainder spreads over the leading
    * buckets' ends deterministically. */
  def equiWidth(v: Int, b: Int): Seq[(Int, Int)] =
    (1 to b).map(i => (((i - 1) * v) / b + 1, (i * v) / b))

  /** Equi-depth buckets from the cumulative counts (cf(0) = 0):
    * hi_i = least(greatest(min{j : cf(j)·B ≥ i·N}, hi_{i−1}+1), V−(B−i))
    * — cross-multiplied so no division is involved, clamped so every
    * bucket stays nonempty; the last bucket always ends at V. */
  def equiDepth(cf: IndexedSeq[Long], b: Int): Seq[(Int, Int)] = {
    val v = cf.length - 1
    val n = cf(v)
    var prev = 0
    (1 to b).map { i =>
      val hi =
        if (i == b) v
        else {
          val j = (1 to v).find(j => cf(j) * b >= i * n).getOrElse(v)
          math.min(math.max(j, prev + 1), v - (b - i))
        }
      val r = (prev + 1, hi)
      prev = hi
      r
    }
  }

  /** Estimated count for the prefix range (index ≤ t) under the
    * uniform-spread assumption: full buckets contribute their sum,
    * the straddling bucket contributes (sum·covered) DIV len. */
  def prefixEstimate(buckets: Seq[(Int, Int)], segSum: (Int, Int) => Long,
                     t: Int): Long =
    buckets.map { case (lo, hi) =>
      if (hi <= t) segSum(lo, hi)
      else if (lo > t) 0L
      else segSum(lo, hi) * (t - lo + 1) / (hi - lo + 1)
    }.sum
}
