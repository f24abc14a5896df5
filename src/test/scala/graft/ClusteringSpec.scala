package graft

import graft.ext.Clustering
import org.scalatest.funsuite.AnyFunSuite

/** Unit semantics for integer-exact two-pass k-means: assignment
  * geometry, distance tie-breaks, centroid update movement, and the
  * empty-cluster degeneracy. */
class ClusteringSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def emb(rows: (Long, Seq[Double])*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("two clear clusters: seeds split, update keeps the split") {
    val e = emb(
      1L -> Seq(0.0, 0.0),    // seed A
      2L -> Seq(0.5, 0.5),    // seed B
      3L -> Seq(0.01, 0.02),  // near A
      4L -> Seq(0.49, 0.51),  // near B
      5L -> Seq(0.4, 0.4))    // near B
    val got = Clustering.kmeansTwoPass(e, "vec_id", "embedding", 2)
      .orderBy("vec_id").collect()
    val c1 = got.map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("c1")).toMap
    val c2 = got.map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("c2")).toMap
    assert(c1(1L) == 1L && c1(3L) == 1L)
    assert(c1(2L) == 2L && c1(4L) == 2L && c1(5L) == 2L)
    // the split is stable through the centroid update
    assert(c2 == c1)
    // seed A's own pass-2 distance, by hand: vecs 1/3 offset-quantize to
    // (1000,1000)/(1010,1020); cluster {1,3}'s x10 centroid is
    // (10050, 10100); d2(vec 1) = (10000-10050)^2 + (10000-10100)^2.
    val d2 = got.map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("d2")).toMap
    assert(d2(1L) == 50L * 50L + 100L * 100L)
  }

  test("exact distance tie goes to the lower centroid id") {
    val e = emb(
      1L -> Seq(0.0),
      2L -> Seq(0.5),
      3L -> Seq(0.25))  // exactly equidistant from both seeds
    val got = Clustering.kmeansTwoPass(e, "vec_id", "embedding", 2)
      .orderBy("vec_id").collect()
    assert(got(2).getAs[Long]("c1") == 1L)
  }

  test("identical seeds: one cluster wins every tie, the other empties") {
    val e = emb(
      1L -> Seq(0.1, 0.1),
      2L -> Seq(0.1, 0.1),  // same point as seed 1 -> every tie -> cid 1
      3L -> Seq(0.3, 0.3),
      4L -> Seq(-0.2, 0.0))
    val got = Clustering.kmeansTwoPass(e, "vec_id", "embedding", 2)
      .orderBy("vec_id").collect()
    assert(got.forall(_.getAs[Long]("c1") == 1L))
    // pass 2 has only cluster 1's centroid; everyone stays there
    assert(got.forall(_.getAs[Long]("c2") == 1L))
  }

  test("empty input yields a typed empty result, not a crash") {
    val e = emb()
    val got = Clustering.kmeansTwoPass(e, "vec_id", "embedding", 3)
    assert(got.count() == 0L)
    assert(got.columns.toSeq == Seq("vec_id", "c1", "c2", "d2"))
  }

  test("k larger than the input clusters every vector to itself") {
    val e = emb(1L -> Seq(0.0), 2L -> Seq(0.4))
    val got = Clustering.kmeansTwoPass(e, "vec_id", "embedding", 5)
      .orderBy("vec_id").collect()
    assert(got.length == 2)
    assert(got(0).getAs[Long]("c1") == 1L && got(1).getAs[Long]("c1") == 2L)
    // singleton centroids equal their members (x10 exact) -> d2 = 0
    assert(got.forall(_.getAs[Long]("d2") == 0L))
  }

  test("semDedup: earliest in-cluster near-dup dominates; distinct kept") {
    // cluster A: 1 and 3 identical (cos 1), 5 near-parallel; cluster B:
    // 2 and 4 orthogonal-ish directions, below the 0.3 threshold.
    val e = emb(
      1L -> Seq(0.9, 0.0),
      2L -> Seq(-0.9, 0.8),
      3L -> Seq(0.9, 0.0),   // duplicate of 1 -> dropped, dominated by 1
      4L -> Seq(-0.8, -0.9), // cos(2,4) < 0 -> kept even if co-clustered
      5L -> Seq(0.89, 0.01)) // near-parallel to 1 -> dropped
    val got = Clustering.semDedup(e, "vec_id", "embedding", 2)
      .orderBy("vec_id").collect()
    val byId = got.map(r => r.getAs[Long]("vec_id") ->
      ((r.getAs[Boolean]("kept"), r.getAs[Long]("dominated_by")))).toMap
    assert(byId(1L) == ((true, -1L)))
    assert(byId(3L) == ((false, 1L)))
    assert(byId(5L) == ((false, 1L)))
    assert(byId(2L)._1 && byId(4L)._1)
  }

  test("semDedup: collapsed mega-cluster takes the salted path, identical output") {
    // Identical seeds (vecs 1, 2) collapse EVERYTHING into cluster 1 —
    // the Lloyd's degeneracy documented on kmeansTwoPass and the exact
    // skew scenario the guard exists for: one 24-member cluster, far
    // above skewBlockLimit=4, so nearDupPairs' dispatch must route the
    // whole pair expansion through the salted branch (blk_n=24 > 4; the
    // plain branch filters blk_n <= limit, so these pairs can ONLY come
    // from the salted join).
    val rows = Seq(1L -> Seq(0.5, 0.5), 2L -> Seq(0.5, 0.5)) ++
      (3L to 22L).map(i => i -> Seq(0.5 + (i - 2) * 0.001, 0.5)) ++
      Seq(23L -> Seq(-0.5, 0.5), 24L -> Seq(0.5, -0.5))
    val e = emb(rows: _*)
    val salted = Clustering.semDedup(e, "vec_id", "embedding", 2,
        skewBlockLimit = 4, nSalts = 8)
      .orderBy("vec_id").collect().toSeq
    val plain = Clustering.semDedup(e, "vec_id", "embedding", 2)
      .orderBy("vec_id").collect().toSeq
    assert(salted == plain)
    // the collapse really happened: every vector in cluster 1
    assert(salted.forall(_.getAs[Long]("cluster") == 1L))
    // and the salted path found the real dominations: 1 dominates every
    // near-parallel vector; the two orthogonal vectors (cos 0 / cos < 0
    // against everything) survive.
    val byId = salted.map(r => r.getAs[Long]("vec_id") ->
      ((r.getAs[Boolean]("kept"), r.getAs[Long]("dominated_by")))).toMap
    assert(byId(1L) == ((true, -1L)))
    assert((2L to 22L).forall(i => byId(i) == ((false, 1L))))
    assert(byId(23L)._1 && byId(24L)._1)
  }

  test("semDedup: duplicates in DIFFERENT clusters are both kept") {
    // seeds 1 and 2 are far apart; 3 duplicates 1 but sits in seed 2's
    // cluster only if geometry says so — here it stays with 1, while 4
    // duplicates 2 in the other cluster: domination never crosses
    // clusters, so 4 is dropped by 2 but never by anything in cluster 1.
    val e = emb(
      1L -> Seq(0.9, 0.9),
      2L -> Seq(-0.9, -0.9),
      3L -> Seq(0.9, 0.9),
      4L -> Seq(-0.9, -0.9))
    val got = Clustering.semDedup(e, "vec_id", "embedding", 2)
      .orderBy("vec_id").collect()
    val byId = got.map(r => r.getAs[Long]("vec_id") ->
      ((r.getAs[Boolean]("kept"), r.getAs[Long]("dominated_by")))).toMap
    assert(byId(1L)._1 && byId(2L)._1)
    assert(byId(3L) == ((false, 1L)) && byId(4L) == ((false, 2L)))
  }
}
