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
}
