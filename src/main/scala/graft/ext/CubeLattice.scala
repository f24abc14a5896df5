package graft.ext

import scala.collection.mutable.ArrayBuffer

/** Greedy view selection over the data-cube lattice (Harinarayan,
  * Rajaraman & Ullman, SIGMOD 1996: "Implementing Data Cubes
  * Efficiently") — which cuboids to materialize under a view budget.
  *
  * The model: a query at cuboid `w` is answered from the smallest
  * materialized ancestor (`v ⊇ w` on dimensions) at cost = that
  * ancestor's row count. The top cuboid (all dims) is always
  * materialized; each greedy step picks the view with the largest
  * total cost reduction ("benefit") summed over every cuboid it can
  * serve. The paper proves this greedy is within (1 − 1/e) of optimal.
  *
  * This is a PURE function over the 2^d-row cuboid-size table — the
  * lattice is dimension-count-sized, never data-sized, so collecting
  * it to the driver is model-sized state (the engine's standing rule).
  * Masks encode dimension sets (bit set = dim present); the subset
  * test is `(w & v) == w`.
  */
object CubeLattice {

  /** One greedy pick: (step, mask, viewSize, benefit, totalCost) where
    * totalCost = Σ over all cuboids of their post-pick answer cost. */
  def greedyPicks(sizes: Map[Long, Long], k: Int)
      : Seq[(Int, Long, Long, Long, Long)] = {
    require(sizes.nonEmpty, "empty lattice")
    val top = sizes.keys.max
    val all = sizes.keys.toSeq.sorted
    all.foreach { m =>
      require((m & top) == m, s"mask $m not a subset of top $top")
    }
    def minCost(w: Long, sel: Set[Long]): Long =
      sel.iterator.filter(v => (w & v) == w).map(sizes).min
    var selected = Set(top)
    val out = new ArrayBuffer[(Int, Long, Long, Long, Long)]
    var step = 1
    while (step <= k) {
      val cand = all.filterNot(selected)
      if (cand.nonEmpty) {
        val scored = cand.map { v =>
          val b = all.iterator.filter(w => (w & v) == w)
            .map(w => math.max(0L, minCost(w, selected) - sizes(v))).sum
          (v, b)
        }
        // Tiebreak: larger benefit first, then smaller mask.
        val (pick, benefit) = scored.maxBy { case (v, b) => (b, -v) }
        selected += pick
        val totalCost = all.map(w => minCost(w, selected)).sum
        out += ((step, pick, sizes(pick), benefit, totalCost))
      }
      step += 1
    }
    out.toSeq
  }
}
