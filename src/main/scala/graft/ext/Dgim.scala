package graft.ext

/** DGIM sliding-window bit counter (Datar, Gionis, Indyk & Motwani,
  * SICOMP 2002: "Maintaining Stream Statistics over Sliding Windows"):
  * approximate the number of 1s among the last N stream elements with
  * O(log²N) state — at most two buckets per power-of-two size, the two
  * oldest of a size merging when a third appears. The estimate (sum of
  * all in-window buckets minus half the oldest) is within 50% of the
  * true count BY THEOREM — the register that answers "how many
  * purchases in the last N events" at ingest without storing events.
  *
  * The fold is order-DEPENDENT by design; the engine's order contract
  * is (ts, event_id), the same one the CUSUM register pins. All state
  * is integers; buckets carry their end index for expiry.
  */
object Dgim {

  /** `buckets` sorted newest-first by end index; ≤ 2 per size. */
  final case class State(idx: Long, buckets: List[(Long, Long)])

  val empty: State = State(0L, Nil)

  /** Fold one bit; `n` = window length in elements. */
  def update(st: State, bit: Boolean, n: Long): State = {
    val idx = st.idx + 1
    var b = st.buckets.filter { case (_, end) => end > idx - n }
    if (bit) {
      b = (1L, idx) :: b
      var merged = true
      while (merged) {
        merged = false
        b.groupBy(_._1).toSeq.sortBy(_._1).find(_._2.length > 2)
          .foreach { case (sz, bs) =>
            val oldest2 = bs.sortBy(_._2).take(2) // two oldest of size
            val keep = b.filterNot(oldest2.contains)
            b = ((sz * 2, oldest2.map(_._2).max) :: keep)
              .sortBy(p => -p._2)
            merged = true
          }
      }
    }
    State(idx, b)
  }

  /** DGIM estimate: all in-window bucket sizes, half the oldest. */
  def estimate(st: State): Long = st.buckets match {
    case Nil => 0L
    case bs  => bs.map(_._1).sum - bs.last._1 / 2
  }

  def fold(bits: Iterable[Boolean], n: Long): State =
    bits.foldLeft(empty)((s, b) => update(s, b, n))
}
