package graft

import graft.ext.ProductQuantization
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit semantics for PQ-ADC: recall on separable clusters, tie/shape
  * invariants, duplicate-code behaviour, and input guards. */
class ProductQuantizationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def emb(rows: (Long, Seq[Double])*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  // Four well-separated groups in 4-d (two 2-d subspaces), three members
  // each, member noise far below the group separation.
  private def grouped = emb(
    (0 until 12).map { i =>
      val g = i % 4
      val base = Seq(Seq(0.9, 0.9, 0.9, 0.9), Seq(-0.9, -0.9, 0.9, 0.9),
        Seq(0.9, -0.9, -0.9, 0.9), Seq(-0.9, 0.9, 0.9, -0.9))(g)
      val noise = 0.002 * (i / 4 + 1)
      i.toLong -> base.map(_ + noise)
    }: _*)

  test("separable groups: every query's top-2 are its own group members") {
    val got = ProductQuantization.pqTopK(grouped, "vec_id", "embedding",
        col("vec_id") < 4, k = 2, m = 2, codes = 4)
      .collect()
    assert(got.length == 8) // 4 queries x top-2
    got.foreach { r =>
      val q = r.getAs[Long]("query_id"); val n = r.getAs[Long]("nbr_id")
      assert(n % 4 == q % 4,
        s"query $q pulled neighbour $n from another group")
      assert(n != q)
    }
    // ranks are 1..k per query, ADC distances non-decreasing in rank
    val byQ = got.groupBy(_.getAs[Long]("query_id"))
    byQ.values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2))
      assert(sorted(0).getAs[Long]("approx_d") <= sorted(1).getAs[Long]("approx_d"))
    }
  }

  test("identical vectors share codes: equal ADC distance, id tie-break") {
    // 5 and 6 duplicate vector 4's embedding exactly -> same codes, so a
    // query sees identical approx_d; ranks break ties by id.
    val e = emb(
      0L -> Seq(0.5, 0.5), 1L -> Seq(-0.5, 0.5),
      4L -> Seq(0.51, 0.52), 5L -> Seq(0.51, 0.52), 6L -> Seq(0.51, 0.52))
    val got = ProductQuantization.pqTopK(e, "vec_id", "embedding",
        col("vec_id") === 0, k = 3, m = 2, codes = 2)
      .orderBy("rank").collect()
    val top = got.filter(r => Set(4L, 5L, 6L)(r.getAs[Long]("nbr_id")))
    assert(top.length == 3)
    assert(top.map(_.getAs[Long]("approx_d")).distinct.length == 1)
    assert(top.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("nbr_id")).toSeq ==
      Seq(4L, 5L, 6L))
  }

  test("ivfpq: probing ALL cells equals plain PQ; partial probe stays in-group") {
    // nprobe == nlist means no candidate is pruned -> IVFADC must equal
    // the unpruned ADC ranking row-for-row.
    val full = ProductQuantization.ivfpqTopK(grouped, "vec_id", "embedding",
        col("vec_id") < 4, k = 2, m = 2, codes = 4, nlist = 4, nprobe = 4)
      .collect().map(_.toString).sorted.toSeq
    val plain = ProductQuantization.pqTopK(grouped, "vec_id", "embedding",
        col("vec_id") < 4, k = 2, m = 2, codes = 4)
      .collect().map(_.toString).sorted.toSeq
    assert(full == plain && full.nonEmpty)
    // single-probe on the separable fixture: the query's own cell holds
    // its group (seeds 0..3 are one per group), so top-2 stay in-group
    val pruned = ProductQuantization.ivfpqTopK(grouped, "vec_id", "embedding",
        col("vec_id") < 4, k = 2, m = 2, codes = 4, nlist = 4, nprobe = 1)
      .collect()
    assert(pruned.length == 8)
    pruned.foreach { r =>
      assert(r.getAs[Long]("nbr_id") % 4 == r.getAs[Long]("query_id") % 4)
    }
    intercept[IllegalArgumentException] {
      ProductQuantization.ivfpqTopK(grouped, "vec_id", "embedding",
        col("vec_id") < 4, k = 2, m = 2, codes = 4, nlist = 4, nprobe = 5)
    }
  }

  test("empty input and bad dims fail safe") {
    val none = ProductQuantization.pqTopK(emb(), "vec_id", "embedding",
      col("vec_id") < 4, k = 2, m = 2, codes = 4)
    assert(none.count() == 0L &&
      none.columns.toSeq == Seq("query_id", "rank", "nbr_id", "approx_d"))
    intercept[IllegalArgumentException] {
      ProductQuantization.pqTopK(emb(1L -> Seq(0.1, 0.2, 0.3)), "vec_id",
        "embedding", col("vec_id") < 1, k = 1, m = 2, codes = 1)
    }
  }

  test("sqTopK: span-255 grid codes losslessly (approx ≡ exact, all hits)") {
    // Values on the 0.000..0.255 milli-grid make every per-dim span
    // exactly 255, so code = value and reconstruction is the identity:
    // the SQ ranking must coincide with exact ranking (hit = 1
    // everywhere) and approx_d must equal the exact squared distance.
    val vecs = emb(
      0L -> Seq(0.000, 0.255), 1L -> Seq(0.001, 0.254),
      2L -> Seq(0.100, 0.150), 3L -> Seq(0.255, 0.000),
      4L -> Seq(0.200, 0.050))
    val got = graft.ext.Similarity.sqTopK(vecs, "vec_id", "embedding",
        col("vec_id") < 2, k = 3)
      .orderBy("query_id", "rank").collect()
    assert(got.length == 6)
    assert(got.forall(_.getInt(4) == 1), "span-255 codec must be lossless")
    // query 0 = (0, 255); its nearest is vec 1 = (1, 254): d = 1 + 1.
    val top = got.find(r => r.getLong(0) == 0L && r.getInt(1) == 1).get
    assert(top.getLong(2) == 1L && top.getLong(3) == 2L)
  }

  test("sqTopK: deterministic across runs and ranks are 1..k per query") {
    import spark.implicits._
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    def run() = graft.ext.Similarity.sqTopK(e, "vec_id", "embedding",
        col("vec_id") < 5, k = 3)
      .orderBy("query_id", "rank")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getInt(4))).toSeq
    val a = run()
    assert(a == run(), "SQ ranking must be run-deterministic")
    a.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._2).sorted == Seq(1, 2, 3))
    }
    assert(a.forall(r => r._4 >= 0L), "squared distances are non-negative")
  }
}
