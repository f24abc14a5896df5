package graft

import graft.ext.Wavelet
import org.scalatest.funsuite.AnyFunSuite

class WaveletSpec extends AnyFunSuite {

  /** Direct reconstruction: 16·x̂ from the total plus a coefficient
    * subset — the identity the dropped-energy shortcut must match. */
  private def reconstruct(total: Long,
                          kept: Seq[(Int, Int, Long)]): Seq[Long] =
    (0 until 16).map { i =>
      var v = total
      kept.foreach { case (lev, idx, c) =>
        val block = i >> lev        // which coefficient covers i
        if (block == idx) {
          val sign = if (((i >> (lev - 1)) & 1) == 0) 1L else -1L
          v += sign * c * (1L << (4 - lev))
        }
      }
      v
    }

  test("dropped-energy sum equals the reconstruction SSE (orthogonality)") {
    val rnd = new scala.util.Random(3)
    for (_ <- 1 to 10) {
      val f = Seq.fill(11)(rnd.nextInt(200).toLong)
      val x16 = (f ++ Seq.fill(5)(0L)).map(_ * 16L)
      for (k <- Seq(0, 3, 7, 15)) {
        val (kept, total, dropped) = Wavelet.threshold(f, k)
        val xhat = reconstruct(total, kept.map(t => (t._2, t._3, t._4)))
        val sse = x16.zip(xhat).map { case (a, b) =>
          (a - b) * (a - b) }.sum
        assert(sse == dropped, s"k=$k f=$f")
      }
    }
  }

  test("keeping all 15 details reconstructs exactly") {
    val f = Seq(3L, 1L, 4L, 1L, 5L, 9L, 2L, 6L)
    val (kept, total, dropped) = Wavelet.threshold(f, 15)
    assert(dropped == 0L)
    val xhat = reconstruct(total, kept.map(t => (t._2, t._3, t._4)))
    assert(xhat == (f ++ Seq.fill(8)(0L)).map(_ * 16L))
  }

  test("a single step edge concentrates into few coefficients") {
    // 8 high then 8 low: all energy sits in the level-4 coefficient.
    val f = Seq.fill(8)(10L) ++ Seq.fill(8)(2L)
    val (kept, _, dropped) = Wavelet.threshold(f, 1)
    assert(kept.head._2 == 4 && dropped == 0L)
  }

  test("oversized or overflowing vectors are rejected loudly") {
    intercept[IllegalArgumentException] {
      Wavelet.haarDetails(Seq.fill(17)(1L))
    }
    intercept[IllegalArgumentException] {
      Wavelet.haarDetails(Seq(4000000L))
    }
  }
}
