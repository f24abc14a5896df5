package graft

import graft.ext.{Clustering, Contamination, Sampling, TextAnalysis}
import graft.ops.Funnel
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the corpus-hygiene / analytics operators: on random
  * inputs the distributed implementations must satisfy the algebraic
  * invariants a naive reference obeys by construction. Fixed seeds (the
  * PipelinePropertySpec pattern) keep failures reproducible. */
class HygienePropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val vocab = Vector("aa", "bb", "cc", "dd", "ee")
  private val docGen: Gen[String] = for {
    n <- Gen.choose(0, 12)
    ws <- Gen.listOfN(n, Gen.oneOf(vocab))
  } yield ws.mkString(" ")

  private def corpus(seed: Long, n: Int): Seq[(Long, String)] = {
    val g = Gen.listOfN(n, docGen)
    g(Gen.Parameters.default, org.scalacheck.rng.Seed(seed)).getOrElse(Nil)
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
  }

  private def toDf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("duplicateGramShare: 0 <= n_shared <= n_grams, ppm consistent") {
    for (seed <- 1L to 6L) {
      val d = toDf(corpus(seed, 25))
      val rows = Contamination.duplicateGramShare(d, "text", "doc_id", 2).collect()
      rows.foreach { r =>
        val (g, s, ppm) = (r.getAs[Long]("n_grams"), r.getAs[Long]("n_shared"),
          r.getAs[Long]("shared_ppm"))
        assert(g > 0 && s >= 0 && s <= g)
        assert(ppm == 1000000L * s / g)
      }
      graft.ops.TransientCache.releaseAll()
    }
  }

  test("benchmarkOverlap: hits bounded by grams; self-overlap is total") {
    for (seed <- 1L to 4L) {
      val c = corpus(seed, 15).filter(_._2.split(" ").count(_.nonEmpty) >= 2)
      val d = toDf(c)
      Contamination.benchmarkOverlap(d, d, "text", "doc_id", 2).collect()
        .foreach { r =>
          // every doc's grams are in the benchmark (it IS the benchmark)
          assert(r.getAs[Long]("n_hit") == r.getAs[Long]("n_grams"))
          assert(r.getAs[Long]("hit_ppm") == 1000000L)
        }
    }
  }

  test("funnel counts are monotone non-increasing across stages") {
    import spark.implicits._
    val tGen = for {
      u <- Gen.choose(0L, 5L)
      t <- Gen.choose(0L, 30L)
      ty <- Gen.oneOf("view", "click", "purchase", "other")
    } yield (u, t, ty)
    for (seed <- 1L to 6L) {
      val evs = Gen.listOfN(60, tGen)(Gen.Parameters.default,
          org.scalacheck.rng.Seed(seed)).getOrElse(Nil)
        .zipWithIndex.map { case ((u, t, ty), i) =>
          (i.toLong, u, new java.sql.Timestamp(t * 1000L), ty)
        }
      val df = evs.toDF("event_id", "user_id", "ts", "event_type")
      val counts = Funnel.funnelCounts(df, "user_id", "ts", "event_type",
          Seq("view", "click", "purchase"))
        .orderBy("stage").collect().map(_.getAs[Long]("n_users"))
      assert(counts.length == 3)
      assert(counts(0) >= counts(1) && counts(1) >= counts(2))
    }
  }

  test("splitAssign: splits partition the corpus; rates order the draws") {
    for (seed <- 1L to 4L) {
      val d = toDf(corpus(seed, 40))
      val got = Sampling.splitAssign(d, "doc_id", 0.6, 0.2)
        .select("draw", "split").collect()
        .map(r => r.getString(0) -> r.getString(1))
      // every row labeled; draw ordering respects the split bands
      val t60 = Sampling.hexThreshold(0.6)
      val t80 = Sampling.hexThreshold(0.8)
      got.foreach { case (draw, split) =>
        val expected =
          if (draw < t60) "train" else if (draw < t80) "val" else "test"
        assert(split == expected)
      }
    }
  }

  test("kmeans: assignments reference live clusters and d2 is non-negative") {
    import spark.implicits._
    val vGen = Gen.listOfN(4, Gen.choose(-500, 500))
    for (seed <- 1L to 4L) {
      val vecs = Gen.listOfN(20, vGen)(Gen.Parameters.default,
          org.scalacheck.rng.Seed(seed)).getOrElse(Nil)
        .zipWithIndex.map { case (v, i) =>
          (i.toLong, v.map(_.toDouble / 1000.0))
        }
      val df = vecs.toDF("vec_id", "embedding")
      val got = Clustering.kmeansTwoPass(df, "vec_id", "embedding", 3).collect()
      assert(got.length == vecs.length)
      val c1s = got.map(_.getAs[Long]("c1")).toSet
      got.foreach { r =>
        assert(r.getAs[Long]("d2") >= 0L)
        // pass-2 clusters can only be clusters that pass 1 populated
        assert(c1s.contains(r.getAs[Long]("c2")))
      }
      graft.ops.TransientCache.releaseAll()
    }
  }

  test("intHistogram: bucket counts sum to the row count; bounds ordered") {
    import spark.implicits._
    val g = Gen.listOfN(50, Gen.choose(-10L, 2000L))
    for (seed <- 1L to 4L) {
      val vals = g(Gen.Parameters.default, org.scalacheck.rng.Seed(seed))
        .getOrElse(Nil).zipWithIndex.map { case (v, i) => (s"g${i % 3}", v) }
      val df = vals.toDF("grp", "v")
      val h = TextAnalysis.intHistogram(df, "v", "grp", 64L, 16).collect()
      assert(h.map(_.getAs[Long]("n")).sum == vals.length.toLong)
      h.foreach { r =>
        val b = r.getAs[Int]("bucket")
        assert(b >= 0 && b < 16)
        assert(r.getAs[Long]("lo") <= r.getAs[Long]("hi"))
      }
    }
  }
}
