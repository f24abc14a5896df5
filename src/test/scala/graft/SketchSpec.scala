package graft

import graft.ext.{Sketches, TextAnalysis}
import graft.ops.ScaleOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit semantics for the round-4 additions: the HLL sketch (register
  * math, duplicate-insensitivity, small-range correction), the BPE pair
  * head (boundary and ordering rules), and the salted join (result
  * equality with the plain join it replaces). */
class SketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("hllDistinct: duplicate-insensitive, groups independent, sane error") {
    import spark.implicits._
    // 400 distinct keys in group a (each twice — duplicates must not move
    // the estimate), 40 distinct in group b (linear-counting regime).
    val rows = (0 until 400).flatMap(i => Seq(("a", i.toLong), ("a", i.toLong))) ++
      (0 until 40).map(i => ("b", 10000L + i))
    val got = Sketches.hllDistinct(rows.toDF("g", "k"), "k", "g")
      .orderBy("g").collect()
    val a = got(0); val b = got(1)
    assert(a.getAs[Long]("n_exact") == 400L && b.getAs[Long]("n_exact") == 40L)
    // HLL at m=256: sigma ~ 6.5%; accept 3 sigma.
    assert(math.abs(a.getAs[Long]("est_milli") / 1000.0 / 400.0 - 1.0) < 0.2,
      s"group a estimate off: ${a.getAs[Long]("est_milli")}")
    assert(math.abs(b.getAs[Long]("est_milli") / 1000.0 / 40.0 - 1.0) < 0.2,
      s"group b estimate off: ${b.getAs[Long]("est_milli")}")
    // Dedup-insensitivity, exactly: single-copy input gives the SAME
    // registers, hence the same estimate.
    val single = (0 until 400).map(i => ("a", i.toLong))
    val gotSingle = Sketches.hllDistinct(single.toDF("g", "k"), "k", "g")
      .collect().head
    assert(gotSingle.getAs[Long]("est_milli") == a.getAs[Long]("est_milli"))
    // hex alignment guard, and the BIGINT-overflow ceiling (b=16 would
    // overflow s_total under ANSI on sparse groups)
    intercept[IllegalArgumentException] {
      Sketches.hllDistinct(rows.toDF("g", "k"), "k", "g", b = 7)
    }
    intercept[IllegalArgumentException] {
      Sketches.hllDistinct(rows.toDF("g", "k"), "k", "g", b = 16)
    }
  }

  test("tokenPairTopK: adjacent pairs only, within-doc, freq-then-lex order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "red fox red fox"),   // pairs: (red,fox)x2, (fox,red)x1
      (2L, "red fox"),           // (red,fox)
      (3L, "solo"),              // no pairs
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = TextAnalysis.tokenPairTopK(docs, "text", "doc_id", 10).collect()
    assert(got.map(r => (r.getAs[Int]("rank"), r.getAs[String]("tok_a"),
      r.getAs[String]("tok_b"), r.getAs[Long]("n"))).toSeq ==
      Seq((1, "red", "fox", 3L), (2, "fox", "red", 1L)))
  }

  test("saltedJoin: same rows as the plain equi-join") {
    import spark.implicits._
    val large = (0 until 200).map(i => (i % 3L, i.toLong)).toDF("k", "v")
    val small = Seq((0L, "x"), (1L, "y")).toDF("k", "tag") // key 2 unmatched
    val plain = large.join(small, "k")
      .collect().map(_.toString).sorted.toSeq
    val salted = ScaleOps.saltedJoin(large, small, "k", 4)
      .select("k", "v", "tag")
      .collect().map(_.toString).sorted.toSeq
    assert(salted == plain && plain.nonEmpty)
  }

  test("KMV closure: k-min of a union is recoverable from the two sketches alone") {
    // The property q151's pair stage rests on (Beyer et al. 2007): the
    // k smallest hashes of A∪B all lie inside K(A) ∪ K(B), so the union
    // sketch — and thus every pairwise estimate — derives from
    // sketch-sized state without touching raw data. Deterministic
    // LCG-scrambled "hashes" over overlapping integer sets.
    val k = 16
    def h(x: Int): Long = (x * 2654435761L + 1013904223L) % 1000000007L
    for (seed <- Seq(1, 7, 42)) {
      val a = (0 until 300).map(i => h(seed * 1000 + i)).toSet
      val b = (0 until 300).map(i => h(seed * 1000 + 150 + i)).toSet // 50% overlap
      def kmin(s: Set[Long]) = s.toSeq.sorted.take(k)
      val fromSketches = kmin((kmin(a) ++ kmin(b)).toSet)
      val fromUnion = kmin(a ++ b)
      assert(fromSketches == fromUnion,
        s"seed $seed: union k-min must be computable from the sketches")
    }
  }

  test("misraGries: theorems hold under skew, shuffling, and repartitioning") {
    import spark.implicits._
    // Zipf-ish stream: key i appears 2000/i times, i in 1..60, plus a
    // long tail of singletons — shuffled deterministically and split
    // across 7 partitions so the mergeable-summaries path is exercised.
    val stream = (1 to 60).flatMap(i => Seq.fill(2000 / i)(s"hh$i")) ++
      (1 to 3000).map(i => s"tail$i")
    val shuffled = new scala.util.Random(12345).shuffle(stream)
    val exact = stream.groupBy(identity).map { case (kk, v) => kk -> v.size.toLong }
    for (k <- Seq(16, 64)) {
      val (n, summ) = Sketches.misraGries(
        shuffled.toDF("key").repartition(7), "key", k)
      assert(n == stream.size.toLong)
      val bound = n / (k + 1)
      assert(summ.size <= k)
      exact.foreach { case (kk, cnt) =>
        val est = summ.getOrElse(kk, 0L)
        assert(est <= cnt, s"k=$k: overestimate on $kk: $est > $cnt")
        assert(cnt - est <= bound,
          s"k=$k: bound violated on $kk: $cnt - $est > $bound")
        if (cnt > bound)
          assert(summ.contains(kk), s"k=$k: heavy key $kk missing")
      }
    }
    // Empty input: zero stream, empty summary.
    val (n0, s0) = Sketches.misraGries(
      Seq.empty[String].toDF("key"), "key", 8)
    assert(n0 == 0L && s0.isEmpty)
  }

  import graft.ext.QDigest

  /** Both digest invariants + the size bound, against a brute count. */
  private def assertValidDigest(d: QDigest.Digest, xs: Seq[Long]): Unit = {
    val thr = d.n / d.k
    val leafBase = 1L << d.logU
    assert(d.n == xs.size.toLong)
    assert(d.nodes.values.sum == d.n, "counts must sum to n")
    assert(d.nodes.values.forall(_ > 0L), "no zero-count nodes")
    assert(d.nodes.size <= 3 * d.k,
      s"size ${d.nodes.size} exceeds 3k=${3 * d.k}")
    d.nodes.foreach { case (v, c) =>
      if (v < leafBase)
        assert(c <= thr, s"non-leaf $v count $c > thr $thr")
      if (v > 1L) {
        val triple = c + d.nodes.getOrElse(v ^ 1L, 0L) +
          d.nodes.getOrElse(v >>> 1, 0L)
        assert(triple > thr || thr == 0L,
          s"mergeable triple survived at $v: $triple <= $thr")
      }
    }
  }

  /** Rank-error theorem across a φ grid, against the sorted raw data. */
  private def assertQuantileTheorem(d: QDigest.Digest, xs: Seq[Long]): Unit = {
    val sorted = xs.sorted
    val bound = d.errBoundRanks
    for (phiPpm <- Seq(10000L, 250000L, 500000L, 750000L, 950000L, 990000L)) {
      val t = math.max(1L, (phiPpm * d.n + 999999L) / 1000000L)
      val vhat = QDigest.quantile(d, t)
      val cntLt = sorted.count(_ < vhat).toLong
      val cntLe = sorted.count(_ <= vhat).toLong
      assert(cntLt + 1 <= t + bound && cntLe >= t - bound,
        s"phi=$phiPpm: vhat=$vhat rank interval [$cntLt+1, $cntLe] " +
          s"misses target $t +- $bound")
    }
  }

  // Deterministic skewed sample on [0, 256): quadratic residues pile
  // mass unevenly, exercising both merge-heavy and exact regions.
  private def qdFixture: Seq[Long] =
    (0 until 5000).map(i => (i.toLong * i * 2654435761L) % 256 match {
      case m if m < 0 => m + 256
      case m          => m
    })

  test("qDigest: invariants, size and rank-error theorems vs brute force") {
    val xs = qdFixture
    for (k <- Seq(5, 20, 100)) {
      val b = new QDigest.Builder(8, k)
      xs.foreach(b.add)
      val d = b.result()
      assertValidDigest(d, xs)
      assertQuantileTheorem(d, xs)
    }
    // k >= n: thr = 0, nothing merges — the digest IS the exact
    // histogram and every quantile is exact.
    val exact = new QDigest.Builder(8, 8192)
    xs.foreach(exact.add)
    val d0 = exact.result()
    assert(d0.errBoundRanks == 0L)
    assertQuantileTheorem(d0, xs)
  }

  test("qDigest: merge keeps validity and the bound in either order") {
    val xs = qdFixture
    val parts = xs.grouped(1700).toSeq
    val ds = parts.map { p =>
      val b = new QDigest.Builder(8, 20)
      p.foreach(b.add)
      b.result()
    }
    val ab = QDigest.merge(QDigest.merge(ds(0), ds(1)), ds(2))
    val bc = QDigest.merge(ds(0), QDigest.merge(ds(1), ds(2)))
    for (d <- Seq(ab, bc)) {
      assertValidDigest(d, xs)
      assertQuantileTheorem(d, xs)
    }
    intercept[IllegalArgumentException] {
      QDigest.merge(ab, new QDigest.Builder(9, 20).result())
    }
  }

  test("qDigest: domain clamping and distributed per-group build") {
    import spark.implicits._
    // Out-of-domain values clamp to the edges.
    val b = new QDigest.Builder(4, 100)
    Seq(-7L, -1L, 0L, 15L, 99L).foreach(b.add)
    val d = b.result()
    assert(QDigest.quantile(d, 1) == 0L && QDigest.quantile(d, 5) == 15L)
    // buildPerGroup: groups are independent, n exact per group, and the
    // theorems hold whatever partitioning fed the tree reduction.
    val xs = qdFixture
    val rows = xs.map(("a", _)) ++ xs.take(900).map(x => ("b", x * 3 % 256))
    for (nPart <- Seq(1, 7)) {
      val got = QDigest.buildPerGroup(
        rows.toDF("g", "v").repartition(nPart).as[(String, Long)], 8, 20)
      assert(got.keySet == Set("a", "b"))
      assertValidDigest(got("a"), xs)
      assertQuantileTheorem(got("a"), xs)
      val bxs = xs.take(900).map(x => x * 3 % 256)
      assertValidDigest(got("b"), bxs)
      assertQuantileTheorem(got("b"), bxs)
    }
  }
}
