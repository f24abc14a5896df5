package graft

import graft.ext.SynopsisAudit
import org.scalatest.funsuite.AnyFunSuite

class SynopsisAuditSpec extends AnyFunSuite {

  test("equi-width tiles 1..v with the (i·V) DIV B rule") {
    assert(SynopsisAudit.equiWidth(11, 4) ==
      Seq((1, 2), (2 + 1, 5), (6, 8), (9, 11)))
    assert(SynopsisAudit.equiWidth(8, 4) ==
      Seq((1, 2), (3, 4), (5, 6), (7, 8)))
    val bks = SynopsisAudit.equiWidth(13, 4)
    assert(bks.head._1 == 1 && bks.last._2 == 13)
    assert(bks.sliding(2).forall {
      case Seq(a, b) => b._1 == a._2 + 1; case _ => true })
  }

  test("equi-depth splits at cross-multiplied quartiles and stays nonempty") {
    // f = (8, 1, 1, 1, 1, 1, 1, 2): N=16, quartile targets 4, 8, 12.
    val cf = IndexedSeq(0L, 8L, 9L, 10L, 11L, 12L, 13L, 14L, 16L)
    val bks = SynopsisAudit.equiDepth(cf, 4)
    // cf(1)=8 ≥ 4 and ≥ 8 → first two cuts both want index 1; the
    // clamp forces the second to 2. Third: cf(j)·4 ≥ 48 → j=5.
    assert(bks == Seq((1, 1), (2, 2), (3, 5), (6, 8)))
    assert(bks.forall { case (lo, hi) => lo <= hi })
  }

  test("prefix estimate is exact when every bucket edge aligns") {
    val f = IndexedSeq(5L, 5L, 7L, 7L)
    val cf = f.scanLeft(0L)(_ + _)
    def seg(lo: Int, hi: Int) = cf(hi) - cf(lo - 1)
    val bks = Seq((1, 2), (3, 4))
    // t at bucket boundaries: exact; t=1 inside (1,2): 10·1/2 = 5 = cf(1).
    (1 to 4).foreach { t =>
      val est = SynopsisAudit.prefixEstimate(bks, seg, t)
      if (t == 1) assert(est == 5L) else if (t == 3) assert(est == 10L + 7L)
      else assert(est == cf(t))
    }
  }

  test("uniform-spread straddle uses floor division") {
    val bks = Seq((1, 3))
    def seg(lo: Int, hi: Int) = 10L // 10 rows over 3 values
    assert(SynopsisAudit.prefixEstimate(bks, seg, 1) == 3L) // 10·1 DIV 3
    assert(SynopsisAudit.prefixEstimate(bks, seg, 2) == 6L)
    assert(SynopsisAudit.prefixEstimate(bks, seg, 3) == 10L)
  }
}
