package graft

import graft.ext.Dgim
import org.scalatest.funsuite.AnyFunSuite

class DgimSpec extends AnyFunSuite {

  private def exactWindow(bits: Seq[Boolean], n: Int): Long =
    bits.takeRight(n).count(identity).toLong

  test("bucket invariant: at most two buckets per size, sizes are powers of two") {
    val rnd = new scala.util.Random(5)
    var st = Dgim.empty
    val bits = Seq.fill(3000)(rnd.nextInt(3) == 0)
    bits.foreach { b =>
      st = Dgim.update(st, b, 500L)
      val bySize = st.buckets.groupBy(_._1)
      assert(bySize.values.forall(_.length <= 2), s"3 of a size: ${st.buckets}")
      assert(bySize.keys.forall(s => (s & (s - 1)) == 0L), s"non-power size")
      // newest-first order maintained
      assert(st.buckets.map(_._2) == st.buckets.map(_._2).sorted.reverse)
    }
  }

  test("estimate stays within the 50% theorem bound on random streams") {
    for (seed <- 1 to 8) {
      val rnd = new scala.util.Random(seed)
      val density = 1 + rnd.nextInt(5)
      val bits = Seq.fill(4000)(rnd.nextInt(density) == 0)
      val n = 400
      val st = Dgim.fold(bits, n.toLong)
      val exact = exactWindow(bits, n)
      val est = Dgim.estimate(st)
      assert(math.abs(est - exact) <= exact / 2 + 1,
        s"seed=$seed est=$est exact=$exact")
    }
  }

  test("all-zeros stream estimates zero; sparse ones are exact") {
    assert(Dgim.estimate(Dgim.fold(Seq.fill(100)(false), 50L)) == 0L)
    // One 1 in-window: single size-1 bucket, estimate = 1 − 0 = 1.
    val bits = Seq.fill(60)(false) ++ Seq(true) ++ Seq.fill(10)(false)
    assert(Dgim.estimate(Dgim.fold(bits, 50L)) == 1L)
  }

  test("expired buckets leave the window") {
    val bits = Seq.fill(30)(true) ++ Seq.fill(200)(false)
    val st = Dgim.fold(bits, 50L)
    assert(Dgim.estimate(st) == 0L, s"stale buckets: ${st.buckets}")
  }

  test("no-expiry fold equals the bijective base-2 closed form (q272's oracle math)") {
    // q272's DuckDB oracle never runs the fold: it derives the bucket
    // structure from the bijective base-2 digits of the ones-count.
    // This property pins that the fold and the closed form agree on
    // random streams, so the oracle is a genuine independent check.
    def bijectiveDigits(k0: Long): List[Long] = { // index 0 = size 1
      var k = k0; val out = scala.collection.mutable.ListBuffer.empty[Long]
      while (k > 0) { val d = if (k % 2 == 0) 2L else 1L; out += d; k = (k - d) / 2 }
      out.toList
    }
    for (seed <- 1 to 10) {
      val rnd = new scala.util.Random(seed)
      val density = 1 + rnd.nextInt(4)
      val bits = Seq.fill(200 + rnd.nextInt(2000))(rnd.nextInt(density) == 0)
      val st = Dgim.fold(bits, Long.MaxValue / 4) // window >= stream: no expiry
      val k = bits.count(identity).toLong
      val digits = bijectiveDigits(k)
      // bucket-size multiset = digits (size 2^j appears digits(j) times)
      val expectSizes = digits.zipWithIndex
        .flatMap { case (d, j) => List.fill(d.toInt)(1L << j) }.sorted
      assert(st.buckets.map(_._1).sorted == expectSizes, s"seed=$seed")
      if (k > 0) {
        val top = 1L << (digits.length - 1)
        // estimate = k − 2^top/2; oldest bucket ends at the 2^top-th one
        assert(Dgim.estimate(st) == k - top / 2, s"seed=$seed")
        val onesIdx = bits.zipWithIndex.collect { case (true, i) => i + 1L }
        assert(st.buckets.last._2 == onesIdx(top.toInt - 1), s"seed=$seed")
      }
    }
  }

  test("fold is split-invariant (state carries across batches)") {
    val rnd = new scala.util.Random(9)
    val bits = Seq.fill(1000)(rnd.nextBoolean())
    val whole = Dgim.fold(bits, 128L)
    val (a, b) = bits.splitAt(337)
    val split = b.foldLeft(Dgim.fold(a, 128L))((s, x) =>
      Dgim.update(s, x, 128L))
    assert(whole == split)
  }
}
