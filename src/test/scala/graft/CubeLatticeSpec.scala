package graft

import graft.ext.CubeLattice
import org.scalatest.funsuite.AnyFunSuite

class CubeLatticeSpec extends AnyFunSuite {

  test("greedy reproduces the HRU paper's hand logic on a 2-dim lattice") {
    // Lattice: top {a,b}=3 (100 rows), {a}=2 (50), {b}=1 (80), {}=0 (1).
    val sizes = Map(3L -> 100L, 2L -> 50L, 1L -> 80L, 0L -> 1L)
    // Step 1 benefits: {a}: serves {a},{} → 2·(100−50)=100;
    // {b}: 2·(100−80)=40; {}: 1·99=99 → pick {a} (mask 2), benefit 100.
    // After: costs = top 100, {a} 50, {b} 100, {} 50 → total 300.
    // Step 2: {b}: serves {b} 100−80=20, {} 50−80<0 → 20;
    // {}: 50−1=49 → pick {} (mask 0), benefit 49; total 251.
    val picks = CubeLattice.greedyPicks(sizes, 2)
    assert(picks == Seq(
      (1, 2L, 50L, 100L, 300L),
      (2, 0L, 1L, 49L, 251L)))
  }

  test("benefit ties break toward the smaller mask") {
    // Two children of identical size: equal benefit, smaller mask wins.
    val sizes = Map(3L -> 10L, 2L -> 5L, 1L -> 5L, 0L -> 5L)
    val picks = CubeLattice.greedyPicks(sizes, 1)
    assert(picks.head._2 == 0L || picks.head._2 == 1L)
    // mask 0 serves 1 cuboid (benefit 5); masks 1/2 serve 2 (benefit 10)
    // → tie between 1 and 2 → 1 wins.
    assert(picks.head._2 == 1L && picks.head._4 == 10L)
  }

  test("k beyond the lattice size stops after the candidates run out") {
    val sizes = Map(1L -> 10L, 0L -> 2L)
    assert(CubeLattice.greedyPicks(sizes, 5).map(_._1) == Seq(1))
  }

  test("a mask outside the top's subset lattice is rejected") {
    intercept[IllegalArgumentException] {
      CubeLattice.greedyPicks(Map(4L -> 10L, 3L -> 5L), 1)
    }
  }
}
