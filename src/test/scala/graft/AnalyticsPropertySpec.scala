package graft

import graft.ext.{Components, TextAnalysis}
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the round-4 analytics operators: gopherFlags
  * against a naive JVM reference, PageRank invariants on random
  * digraphs. Fixed seeds (HygienePropertySpec pattern) keep failures
  * reproducible. */
class AnalyticsPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val vocab =
    Vector("aa", "bb", "the", "a", "is", "word", "x1", "longishtoken", "of")
  private val docGen: Gen[String] = for {
    n <- Gen.choose(0, 80)
    ws <- Gen.listOfN(n, Gen.oneOf(vocab))
  } yield ws.mkString(" ")

  private def corpus(seed: Long, n: Int): Seq[(Long, String)] = {
    val g = Gen.listOfN(n, docGen)
    g(Gen.Parameters.default, org.scalacheck.rng.Seed(seed)).getOrElse(Nil)
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
  }

  test("gopherFlags: column algebra matches a naive JVM reference") {
    import spark.implicits._
    val enStops = TextAnalysis.enStopwords.toSet
    for (seed <- 1L to 5L) {
      val rows = corpus(seed, 30)
      val got = TextAnalysis.gopherFlags(rows.toDF("doc_id", "text"), "text")
        .orderBy("doc_id")
        .select("doc_id", "n_words", "len_sum", "n_alpha", "n_stop_present",
          "pass_gopher")
        .collect()
      rows.sortBy(_._1).zip(got).foreach { case ((id, text), r) =>
        val toks = TextAnalysis.tokenizeJvm(TextAnalysis.normalizeJvm(text))
        val nWords = toks.length.toLong
        val lenSum = toks.map(_.length.toLong).sum
        val nAlpha = toks.count(_.exists(c => c >= 'a' && c <= 'z')).toLong
        val nStop = enStops.count(toks.contains).toLong
        assert(r.getLong(0) == id)
        assert(r.getLong(1) == nWords, s"n_words for '$text'")
        assert(r.getLong(2) == lenSum, s"len_sum for '$text'")
        assert(r.getLong(3) == nAlpha, s"n_alpha for '$text'")
        assert(r.getLong(4) == nStop, s"n_stop_present for '$text'")
        val expectPass = nWords >= 50 && nWords <= 100000 &&
          lenSum >= 3 * nWords && lenSum <= 10 * nWords &&
          5 * nAlpha >= 4 * nWords && nStop >= 2
        assert(r.getBoolean(5) == expectPass, s"pass_gopher for '$text'")
      }
    }
  }

  test("pageRank: base floor, mass ceiling, and node universe on random digraphs") {
    import spark.implicits._
    for (seed <- 1L to 4L) {
      val gen = for {
        n <- Gen.choose(2, 12)
        m <- Gen.choose(1, 25)
        es <- Gen.listOfN(m, for {
          a <- Gen.choose(0, n - 1); b <- Gen.choose(0, n - 1)
          if a != b
        } yield (a.toLong, b.toLong))
      } yield es.distinct
      val edges = gen(Gen.Parameters.default, org.scalacheck.rng.Seed(seed))
        .getOrElse(Nil)
      if (edges.nonEmpty) {
        val df = edges.toDF("src", "dst")
        val pr = Components.pageRank(df, "src", "dst", 3).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSet
        assert(pr.keySet == nodes, "every edge endpoint is ranked")
        // every rank >= damped base; truncating integer division can only
        // LOSE mass, so the total never exceeds n * pr0
        assert(pr.values.forall(_ >= 150000L))
        assert(pr.values.map(BigInt(_)).sum <= BigInt(nodes.size) * 1000000L)
        // integer arithmetic admits an EXACT reference: simulate the
        // same update rule on the driver and require equality
        val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
        var ref = nodes.map(_ -> 1000000L).toMap
        for (_ <- 1 to 3) {
          val cin = edges.groupBy(_._2).view.mapValues(_.map { case (u, _) =>
            (ref(u) * 17) / (20 * outdeg(u))
          }.sum).toMap
          ref = nodes.map(n => n -> (150000L + cin.getOrElse(n, 0L))).toMap
        }
        assert(pr == ref, s"distributed PageRank diverges from reference on $edges")
      }
      graft.ops.TransientCache.releaseAll()
    }
  }

  test("CUSUM prefix identity: C_i - min prefix C equals the direct " +
    "max(0, S+d) recursion on random integer series") {
    val rnd = new scala.util.Random(7)
    (0 until 200).foreach { _ =>
      val n = 1 + rnd.nextInt(60)
      val d = Array.fill(n)(rnd.nextInt(2001) - 1000L) // deviations in [-1000, 1000]
      // direct recursion (the statistic's definition)
      val direct = d.scanLeft(0L)((s, x) => math.max(0L, s + x)).drop(1)
      // the window-expressible identity q161 uses: S_i = C_i - min(0, C_1..C_i)
      var c = 0L
      var minC = 0L // the 0 init IS the empty prefix (C_0 = 0)
      val viaPrefix = d.map { x =>
        c += x
        if (c < minC) minC = c
        c - minC
      }
      assert(direct.sameElements(viaPrefix),
        s"identity broken for ${d.take(8).mkString(",")}...")
    }
  }

  test("weighted-sample keys: heavier docs get stochastically smaller keys") {
    import spark.implicits._
    // key_q = floor(1e9 * ln(2^32/(u+1)) / w): for FIXED u, a larger
    // weight strictly shrinks the key — verify the monotonicity on a
    // grid (the property that makes A-ES weight-proportional).
    val df = (1 to 50).map(i => (i.toLong, i.toLong * 7 % 13 + 1))
      .toDF("doc_id", "w")
    val keyed = df.selectExpr("doc_id", "w",
      "CAST(conv(substring(md5(CAST(CAST(doc_id AS STRING) AS BINARY)), 1, 8), 16, 10) AS BIGINT) AS u")
      .selectExpr("doc_id", "w", "u",
        "CAST(floor(1000000000 * (ln(4294967296.0 / (CAST(u AS DOUBLE) + 1.0)) / CAST(w AS DOUBLE))) AS BIGINT) AS key_q",
        "CAST(floor(1000000000 * (ln(4294967296.0 / (CAST(u AS DOUBLE) + 1.0)) / CAST(w * 2 AS DOUBLE))) AS BIGINT) AS key_q_double_w")
      .collect()
    keyed.foreach { r =>
      assert(r.getLong(3) >= 0 && r.getLong(4) >= 0)
      assert(r.getLong(4) <= r.getLong(3),
        "doubling the weight must not grow the key")
    }
  }

  test("zOrderKey: column interleave matches a JVM reference and is injective") {
    import spark.implicits._
    def ref(x: Long, y: Long, bits: Int): Long =
      (0 until bits).map { i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }.reduce(_ | _)
    val pairs = {
      val g = Gen.listOfN(200,
        Gen.zip(Gen.choose(0L, (1L << 21) - 1), Gen.choose(0L, (1L << 21) - 1)))
      g(Gen.Parameters.default, org.scalacheck.rng.Seed(7L)).get
    }.distinct
    val got = pairs.toDF("x", "y")
      .select(org.apache.spark.sql.functions.col("x"),
        org.apache.spark.sql.functions.col("y"),
        graft.ext.Layout.zOrderKey(
          org.apache.spark.sql.functions.col("x"),
          org.apache.spark.sql.functions.col("y")).as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) == ref(r.getLong(0), r.getLong(1), 21),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
    assert(got.map(_.getLong(2)).distinct.length == pairs.length,
      "distinct (x,y) pairs must get distinct Morton keys")
  }

  test("BucketedPrefix: bucketed two-phase scans equal the naive global fold " +
    "for random keys and widths") {
    import spark.implicits._
    // Random unique non-negative keys (sparse, so buckets are ragged
    // and some are empty), random values incl. zeros, random bucket
    // widths incl. 1 (every key its own bucket) and a width larger
    // than the whole key range (one bucket = the single-partition
    // window this op replaces).
    val keyGen = Gen.choose(0L, 4000L)
    for (seed <- 1L to 5L; width <- Seq(1L, 7L, 64L, 100000L)) {
      val keys = Gen.listOfN(120, keyGen)(Gen.Parameters.default,
        org.scalacheck.rng.Seed(seed * 31 + width)).getOrElse(Nil)
        .distinct
      val vals = Gen.listOfN(keys.length, Gen.choose(-50L, 50L))(
        Gen.Parameters.default, org.scalacheck.rng.Seed(seed))
        .getOrElse(Nil)
      val rows = keys.zip(vals)
      val df = rows.toDF("k", "x")
      val sorted = rows.sortBy(_._1)
      val refSums = sorted.scanLeft(0L) { case (acc, (_, x)) => acc + x }.tail
      val gotSums = graft.ops.BucketedPrefix
        .runningSums(df, "k", Seq("x"), width)
        .orderBy("k").select("run_x").collect().map(_.getLong(0)).toSeq
      assert(gotSums == refSums, s"sums diverge (seed=$seed width=$width)")
      val refMaxes = sorted.map(_._2)
        .scanLeft(Option.empty[Long]) { (acc, x) =>
          Some(acc.fold(x)(math.max(_, x)))
        }.dropRight(1)
      val gotMaxes = graft.ops.BucketedPrefix
        .runningMaxExclusive(df, "k", Seq("x"), width)
        .orderBy("k").select("run_x").collect()
        .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq
      assert(gotMaxes == refMaxes, s"maxes diverge (seed=$seed width=$width)")
    }
  }

  test("q258: a day opening above its intra-day max reports the carried-in " +
    "level at midnight") {
    import spark.implicits._
    // 5 users hold sessions across midnight: all start 21:00 day 1, the
    // ends stagger through day 2 (00:20..01:40, one drop each). Day 2's
    // change instants only ever see concurrency 4..0, but the day OPENS
    // at 5 — the r8-advice case where "peak among within-day instants"
    // under-reports the true peak. Events every 20 min keep each user's
    // chain one 30-min-gap session.
    val t0 = java.time.Instant.parse("2024-03-01T21:00:00Z")
    val rows = for {
      u <- 1 to 5
      end = t0.plusSeconds((200 + (u - 1) * 20) * 60) // 00:20 + (u-1)*20min
      n = (java.time.Duration.between(t0, end).toMinutes / 20).toInt
      i <- 0 to n
    } yield (u.toLong * 1000 + i, t0.plusSeconds(i * 20L * 60), u.toLong)
    val dir = java.nio.file.Files.createTempDirectory("peak_conc").toString
    // `value` is part of the production events schema (TESTDATA.md) and
    // the shared session artifact (r12) aggregates it; the fixture
    // carries a constant so the artifact analyzes — q258 never reads it.
    rows.map { case (eid, ts, uid) =>
      (eid, java.sql.Timestamp.from(ts), uid, 1.0d)
    }.toDF("event_id", "ts", "user_id", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q258_peak_concurrency")(spark, dir)
      .collect().map(r => (r.getTimestamp(0).toInstant, r.getLong(1),
        r.getTimestamp(2).toInstant))
    assert(got.length == 2, s"expected 2 day rows, got ${got.toSeq}")
    val day1 = java.time.Instant.parse("2024-03-01T00:00:00Z")
    val day2 = java.time.Instant.parse("2024-03-02T00:00:00Z")
    assert(got(0) == ((day1, 5L, t0)), s"day1 row: ${got(0)}")
    // Carried-in level 5 beats the intra-day max 4; earliest moment at
    // the peak is the day boundary itself.
    assert(got(1) == ((day2, 5L, day2)), s"day2 row: ${got(1)}")
  }
}
