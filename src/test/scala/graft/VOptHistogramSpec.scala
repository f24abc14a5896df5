package graft

import graft.ext.VOptHistogram
import org.scalatest.funsuite.AnyFunSuite

class VOptHistogramSpec extends AnyFunSuite {

  /** Brute force: enumerate every B-way contiguous partition and take
    * the minimum scaled SSE — the DP must match exactly. */
  private def bruteTotal(freqs: Seq[Long], b: Int): Long = {
    val v = freqs.length
    def err(lo: Int, hi: Int): Long = {
      val seg = freqs.slice(lo - 1, hi)
      val len = seg.length.toLong
      val sf = seg.sum
      val sf2 = seg.map(f => f * f).sum
      (VOptHistogram.Lcm / len) * (len * sf2 - sf * sf)
    }
    // choose b-1 cut points from 1..v-1
    def go(start: Int, left: Int): Seq[Seq[Int]] =
      if (left == 0) Seq(Seq(v))
      else (start to v - left).flatMap(c => go(c + 1, left - 1).map(c +: _))
    go(1, b - 1).map { cuts =>
      (0 +: cuts).sliding(2).map { case Seq(a, c) => err(a + 1, c) }.sum
    }.min
  }

  test("DP total equals brute-force minimum over all partitions") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 20) {
      val v = 5 + rnd.nextInt(8) // 5..12
      val freqs = Seq.fill(v)(rnd.nextInt(1000).toLong)
      val b = 2 + rnd.nextInt(3) // 2..4
      val (buckets, total) = VOptHistogram.fit(freqs, b)
      assert(total == bruteTotal(freqs, b), s"trial $trial: $freqs b=$b")
      // Buckets tile 1..v and their errors sum to the total.
      assert(buckets.map(_.bucket) == (1 to b))
      assert(buckets.head.loIdx == 1 && buckets.last.hiIdx == v)
      assert(buckets.sliding(2).forall {
        case Seq(a, c) => c.loIdx == a.hiIdx + 1; case _ => true })
      assert(buckets.map(_.sseScaled).sum == total)
      assert(buckets.map(_.nRows).sum == freqs.sum)
    }
  }

  test("uniform vector: zero SSE and deterministic smallest-k cuts") {
    val (buckets, total) = VOptHistogram.fit(Seq.fill(8)(5L), 4)
    assert(total == 0L)
    // All partitions are zero-error ties; (err, k) ranking picks the
    // smallest split at every stage → prefix cuts 1,2,3.
    assert(buckets.map(b => (b.loIdx, b.hiIdx)) ==
      Seq((1, 1), (2, 2), (3, 3), (4, 8)))
  }

  test("a perfectly step-shaped vector recovers the true steps") {
    val freqs = Seq(10L, 10L, 10L, 50L, 50L, 90L, 90L, 90L, 20L)
    val (buckets, total) = VOptHistogram.fit(freqs, 4)
    assert(total == 0L)
    assert(buckets.map(b => (b.loIdx, b.hiIdx)) ==
      Seq((1, 3), (4, 5), (6, 8), (9, 9)))
  }

  test("counts beyond the int64 envelope are rejected loudly") {
    intercept[IllegalArgumentException] {
      VOptHistogram.fit(Seq(4000000L, 1L, 1L, 1L), 2)
    }
  }
}
