package graft

import graft.ext.{Components, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit semantics for the round-4 analytics operators (Gopher flags,
  * integer PageRank, gap-fill/rolling, block dedup, SCD-2, regression) —
  * closed-form fixtures the sf-level oracle queries don't isolate. */
class AnalyticsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("gopherFlags: closed-form fixture hits each rule boundary") {
    import spark.implicits._
    // 50 words of the 4-letter word 'word' + 'the is' -> passes everything
    val good = (Seq.fill(48)("word") ++ Seq("the", "is")).mkString(" ")
    val short = "the is word"                    // word count < 50
    val thin = (Seq.fill(25)("a b") :+ "the is").mkString(" ") // mean len < 3
    val df = Seq((1L, good), (2L, short), (3L, thin))
      .toDF("doc_id", "text")
    val got = TextAnalysis.gopherFlags(df, "text")
      .orderBy("doc_id")
      .select("n_words", "flag_word_count", "flag_mean_len", "flag_alpha",
        "flag_stop", "pass_gopher")
      .collect()
    assert(got(0).getBoolean(5), "good doc passes")
    assert(got(0).getLong(0) == 50L)
    assert(!got(1).getBoolean(1) && !got(1).getBoolean(5), "short doc fails word count")
    assert(!got(2).getBoolean(2) && !got(2).getBoolean(5), "thin doc fails mean length")
    assert(got(2).getBoolean(3), "thin doc is still alphabetic")
  }

  test("pageRank: 2-cycle is the exact fixpoint; chain decays in closed form") {
    import spark.implicits._
    val cycle = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val prC = Components.pageRank(cycle, "src", "dst", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // contribution = (1000000*17) div 20 = 850000; 150000 + 850000 = 1000000
    assert(prC == Map(1L -> 1000000L, 2L -> 1000000L))

    val edge = Seq((1L, 2L)).toDF("src", "dst")
    val prE = Components.pageRank(edge, "src", "dst", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // node 1 is a source: 150000 after iter 1 and stays; node 2 gets
    // 150000 + (150000*17) div 20 = 277500 from iter 2 onward
    assert(prE == Map(1L -> 150000L, 2L -> 277500L))
  }

  test("pageRankAuto: the driver loop and the distributed fixpoint are " +
    "bit-identical on an irregular digraph (both dispatch paths)") {
    import spark.implicits._
    // irregular: cycles, a dangling sink, a hub, multi-in-degree nodes
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L), (4L, 5L),
      (2L, 5L), (6L, 1L), (6L, 5L), (7L, 6L)).toDF("src", "dst")
    val dist = Components.pageRank(g, "src", "dst", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val local = Components.pageRankAuto(g, "src", "dst", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local == dist, s"local=$local dist=$dist")
    // limit 0 forces the distributed branch through the Auto dispatcher
    val forced = Components.pageRankAuto(g, "src", "dst", 3, localEdgeLimit = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(forced == dist)
    graft.ops.TransientCache.releaseAll()
  }

  test("pageRank: deep loop truncates lineage per round and matches an independent reference") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L), (4L, 2L))
    val df = edges.toDF("src", "dst")

    // Independent driver-side re-derivation of the integer recurrence
    // (same contract as the scaladoc: pr' = 150000 + Σ (pr*17) div (20*od)).
    val od = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    var ref = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to 10) {
      val in = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map(e => ref(e._1) * 17 / (20 * od(e._1))).sum
      }
      ref = nodes.map(n => n -> (150000L + in.getOrElse(n, 0L))).toMap
    }

    val deep = Components.pageRank(df, "src", "dst", 10)          // truncates (> 4)
    val got = deep.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == ref, "10-iteration ranks must match the independent recurrence")

    // Lineage bound: the checkpointed loop's plan holds ONE round over a
    // materialized LogicalRDD; the unrolled loop's plan stacks all 10.
    val unrolled = Components.pageRank(df, "src", "dst", 10, truncateAfter = 10)
    def planSize(p: org.apache.spark.sql.DataFrame): Int =
      p.queryExecution.optimizedPlan.collect { case n => n }.size
    assert(planSize(deep) < planSize(unrolled) / 3,
      s"truncated plan (${planSize(deep)} nodes) must be far smaller than " +
        s"the unrolled plan (${planSize(unrolled)} nodes)")
    assert(unrolled.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == ref,
      "truncation must not change values")
    graft.ops.TransientCache.releaseAll()
  }

  test("pageRank: ranks bounded below by damped base and conserve mass") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)).toDF("src", "dst")
    val pr = Components.pageRank(edges, "src", "dst", 3).collect()
    assert(pr.length == 3)
    assert(pr.forall(_.getLong(1) >= 150000L))
    // no redistribution losses beyond integer-div truncation: total <= n * 1e6
    assert(pr.map(_.getLong(1)).sum <= 3000000L)
  }

  test("q92 block dedup: shared 20-token block counted once per occurrence") {
    import spark.implicits._
    val block = (1 to 20).map(i => s"tok$i").mkString(" ")
    val df = Seq(
      (1L, block + " unique one"),   // block 0 shared, block 1 unique
      (2L, block + " other tail"),   // block 0 shared (dup of doc 1's)
      (3L, "totally different words here"))
      .toDF("doc_id", "text")
    // the q92 plan shape, built directly over the fixture
    val toks = TextAnalysis.tokens(TextAnalysis.normalize(col("text")))
    import org.apache.spark.sql.expressions.Window
    val blocks = df.select(col("doc_id"), toks.as("t"))
      .where(size(col("t")) > 0)
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, (size(t) + 19) div 20 - 1), " +
          "i -> md5(CAST(concat_ws(' ', slice(t, i * 20 + 1, 20)) AS BINARY)))")))
      .withColumnRenamed("pos", "blk_idx").withColumnRenamed("col", "block_hash")
    val wF = Window.partitionBy(col("block_hash")).orderBy(col("doc_id"), col("blk_idx"))
    val res = blocks
      .withColumn("rn", row_number().over(wF))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy(col("block_hash"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_blocks"),
        sum(when(col("cnt") >= 2, 1L).otherwise(0L)).as("n_dup"),
        sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_kept"))
      .orderBy("doc_id").collect()
    // doc 1: 2 blocks, 1 dup, keeps both (first occurrence of the shared block)
    assert(res(0).getLong(1) == 2L && res(0).getLong(2) == 1L && res(0).getLong(3) == 2L)
    // doc 2: 2 blocks, 1 dup, keeps only its unique tail block
    assert(res(1).getLong(1) == 2L && res(1).getLong(2) == 1L && res(1).getLong(3) == 1L)
    // doc 3: 1 block, no dups
    assert(res(2).getLong(1) == 1L && res(2).getLong(2) == 0L && res(2).getLong(3) == 1L)
  }

  test("q227 Theil–Sen: pair-count identity and median is a realized pairwise slope") {
    val d = "/root/testdata/sf0.001"
    val rows = graft.queries.AnalyticsQueries.defs("q227_theilsen")(spark, d)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nDays = r.getAs[Long]("n_days"); val nPairs = r.getAs[Long]("n_pairs")
      assert(nPairs == nDays * (nDays - 1) / 2,
        s"${r.getString(0)}: $nPairs pairs for $nDays days")
    }
    // The lower-median rule: the reported slope must be one of the
    // actual pairwise slopes, reproduced independently on the driver.
    val daily = Tables.events(spark, d)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(expr("CAST(floor(value * 1000) AS BIGINT)")).as("vq"))
      .select(col("event_type"),
        expr("CAST(unix_micros(day) DIV 86400000000 AS BIGINT)").as("didx"),
        col("vq"))
      .collect().groupBy(_.getString(0))
    rows.foreach { r =>
      val pts = daily(r.getString(0))
        .map(x => (x.getAs[Long]("didx"), x.getAs[Long]("vq"))).sortBy(_._1)
      val slopes = (for {
        i <- pts.indices; j <- (i + 1) until pts.length
      } yield math.floor(1000.0 * (pts(j)._2 - pts(i)._2).toDouble /
          (pts(j)._1 - pts(i)._1).toDouble).toLong).sorted
      val lowerMed = slopes((slopes.length + 1) / 2 - 1)
      assert(r.getAs[Long]("ts_slope_milli") == lowerMed,
        s"${r.getString(0)}: median mismatch")
    }
    graft.ops.TransientCache.releaseAll()
  }

  test("edge inputs: empty graphs, null text, degenerate domains don't crash") {
    import spark.implicits._
    // pageRank on an empty edge list -> empty result, no job failure
    val emptyEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Components.pageRank(emptyEdges, "src", "dst", 3).count() == 0)
    graft.ops.TransientCache.releaseAll()

    // gopherFlags on null text: null stats propagate, nothing throws
    val withNull = Seq((1L, null.asInstanceOf[String]), (2L, "the is word"))
      .toDF("doc_id", "text")
    val gf = TextAnalysis.gopherFlags(withNull, "text")
      .orderBy("doc_id").collect()
    assert(gf(0).isNullAt(gf(0).fieldIndex("n_words")))
    // null text FAILS the gate (not null): n_stop_present's otherwise(0)
    // makes flag_stop false, and null AND false = false — a null doc can
    // never pass a quality filter
    assert(!gf(0).getBoolean(gf(0).fieldIndex("pass_gopher")))
    assert(!gf(1).isNullAt(gf(1).fieldIndex("n_words")))

    // histogram quantiles on a single-value domain: width clamps to 1,
    // every estimate is that value
    val flat = Seq.fill(10)(("en", 42L)).zipWithIndex
      .map { case ((l, v), i) => (i.toLong, l, v) }
      .toDF("doc_id", "lang", "n_chars")
    flat.createOrReplaceTempView("flat_docs")
    val v = flat.select(col("lang"), col("n_chars").as("x"))
    val b = v.agg(min(col("x")).as("gmin"), max(col("x")).as("gmax"))
    val est = v.crossJoin(b)
      .withColumn("w", expr("greatest((gmax - gmin + 63) div 64, 1)"))
      .withColumn("bin", expr("least((x - gmin) div w, 63)"))
      .groupBy(col("lang"), col("gmin"), col("w"), col("bin"))
      .agg(count(lit(1)).as("bn"))
      .select(expr("gmin + bin * w").as("lo"))
      .collect()
    assert(est.forall(_.getLong(0) == 42L))
  }

  test("q88/q90/q91/q95/q98 registry queries: internal invariants at sf0.001") {
    val d = "/root/testdata/sf0.001"
    val defs = graft.queries.AnalyticsQueries.defs

    // pivot: row_total == sum of the five priority cells
    val piv = defs("q88_pivot_priority")(spark, d).collect()
    piv.foreach { r =>
      val cells = (1 to 5).map(i => r.getLong(i)).sum
      assert(cells == r.getLong(6), s"row_total mismatch for ${r.getString(0)}")
    }

    // regression: correlation in [-1, 1], n positive
    val reg = defs("q90_price_regression")(spark, d).collect()
    assert(reg.nonEmpty)
    reg.foreach { r =>
      val corr = r.getDouble(4)
      assert(corr >= -1.0 - 1e-9 && corr <= 1.0 + 1e-9)
      assert(r.getLong(1) > 0)
    }

    // gap-fill: dense grid — every (type, day) combination exactly once,
    // and the zero-filled counts sum back to the raw event count
    val gf = defs("q91_daily_gapfill")(spark, d)
    val nTypes = gf.select("event_type").distinct().count()
    val nDays = gf.select("day").distinct().count()
    assert(gf.count() == nTypes * nDays)
    val rawCount = Tables.events(spark, d).count()
    val filledSum = gf.agg(sum("n_events")).head().getLong(0)
    assert(filledSum == rawCount)

    // rolling: roll7_n >= n_events and roll7 over first row equals the row
    val roll = defs("q95_rolling_7d")(spark, d).collect()
    roll.foreach { r =>
      assert(r.getLong(4) >= r.getLong(2), "roll7_n >= day's n_events")
    }

    // histogram quantiles: estimates bounded by the value domain and
    // monotone in the quantile
    val hq = defs("q99_hist_quantiles")(spark, d).collect()
      .groupBy(_.getString(0))
    val (xmin, xmax) = {
      val r = Tables.documents(spark, d)
        .agg(min("n_chars"), max("n_chars")).head()
      (r.getLong(0), r.getLong(1))
    }
    hq.foreach { case (_, rows) =>
      val byQ = rows.sortBy(_.getLong(1)).map(_.getLong(3))
      assert(byQ.sameElements(byQ.sorted), "estimates monotone in q")
      byQ.foreach(e => assert(e >= xmin && e <= xmax))
    }

    // source overlap: full pair matrix, shared bounded by either side
    val ov = defs("q100_source_overlap")(spark, d).collect()
    val nSrc = Tables.documents(spark, d).select("source").distinct().count()
    assert(ov.length == nSrc * (nSrc - 1) / 2)
    ov.foreach { r =>
      assert(r.getLong(2) <= math.min(r.getLong(3), r.getLong(4)))
      assert(r.getLong(5) <= 1000000L)
    }

    // weighted sample: 100 rows, ranks contiguous, keys nondecreasing
    val ws = defs("q101_weighted_sample")(spark, d).collect()
    assert(ws.length == 100)
    assert(ws.map(_.getInt(0)).sameElements(1 to 100))
    val keys = ws.map(_.getLong(4))
    assert(keys.sameElements(keys.sorted))

    // interval lookup: every matched event lands in its user's CURRENT
    // version (all events postdate the order history), and the match
    // count equals the events whose user has any order history
    val il = defs("q102_interval_lookup")(spark, d).collect()
    val scdCur = defs("q98_scd2_customer")(spark, d).collect()
      .filter(_.getBoolean(5)).map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(il.nonEmpty)
    il.foreach { r =>
      val (user, ver) = (r.getLong(1), r.getInt(3))
      scdCur.get(user).foreach(cur => assert(ver == cur,
        s"event matched version $ver but current is $cur for user $user"))
    }
    val usersWithOrders = Tables.orders(spark, d)
      .where(col("o_custkey") < 20).select("o_custkey").distinct()
      .collect().map(_.getLong(0)).toSet
    val expected = Tables.events(spark, d)
      .where(col("user_id") < 20).collect()
      .count(r => usersWithOrders(r.getAs[Long]("user_id")))
    assert(il.length == expected)

    // FK audit: the star is referentially intact and keys are bounded
    val fk = defs("q103_fk_audit")(spark, d).collect()
    assert(fk.length == 5)
    fk.foreach { r =>
      assert(r.getLong(3) == 0L, s"${r.getString(0)} has orphans")
      assert(r.getLong(2) <= r.getLong(1) && r.getLong(1) > 0)
    }

    // ANN recall: one row per query vector, hits bounded by k
    val rec = defs("q109_ann_recall")(spark, d).collect()
    assert(rec.length == 10)
    rec.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(1) <= 3)
      assert(r.getLong(2) == 1000000L * r.getLong(1) / 3)
    }

    // keyset page: exactly one page, strictly increasing cursor order
    val ks = defs("q114_keyset_page")(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(ks.length == 10)
    ks.sliding(2).foreach {
      case Array(a, b) => assert(Ordering[(String, String)].lt(a, b))
      case _ =>
    }

    // RANGE-frame rolling equals the dense-grid ROWS form on active days
    val rangeRoll = defs("q111_range_frame")(spark, d)
      .select(col("event_type"), col("day"), col("r7_n"))
    val gridRoll = defs("q95_rolling_7d")(spark, d)
      .where(col("n_events") > 0)
      .select(col("event_type"), col("day"), col("roll7_n"))
    val joinedRoll = rangeRoll.join(gridRoll, Seq("event_type", "day"))
    assert(joinedRoll.count() == rangeRoll.count())
    assert(joinedRoll.where(col("r7_n") =!= col("roll7_n")).count() == 0,
      "RANGE frame and dense-grid ROWS frame disagree")

    // reconciliation statuses partition by the cutoffs
    val rc = defs("q112_snapshot_reconcile")(spark, d).collect()
    rc.foreach { r =>
      val day = r.get(1).toString
      val status = r.getString(4)
      if (day < "2024-01-11") assert(status == "removed")
      else if (day >= "2024-01-21") assert(status == "added")
      else assert(status == "same")
    }

    // set algebra: |A\B| + |B\A| + |A∩B| == |A∪B|
    val so = defs("q113_vocab_setops")(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(so("except_a") + so("except_b") + so("intersect") == so("union"))

    // co-occurrence: canonical pair order, positive doc counts
    val co = defs("q116_cooccurrence")(spark, d).collect()
    assert(co.length == 30)
    co.foreach(r => assert(r.getString(1) < r.getString(2) && r.getLong(3) > 0))

    // triangles: 3 wedges per triangle bound, coefficient in [0, 1e6]
    val tg = defs("q117_knn_triangles")(spark, d).collect().head
    assert(3 * tg.getLong(2) <= tg.getLong(3))
    assert(tg.getLong(4) >= 0 && tg.getLong(4) <= 1000000L)

    // new users: the curve ends at the full distinct user base
    val nu = defs("q118_new_users")(spark, d).collect()
    val totalUsers = Tables.events(spark, d)
      .select("user_id").distinct().count()
    assert(nu.map(_.getLong(1)).sum == totalUsers)
    assert(nu.last.getLong(2) == totalUsers)

    // Gini: bounded in [0, 1e6); a uniform fixture scores exactly 0
    val gi = defs("q121_token_gini")(spark, d).collect()
    gi.foreach(r => assert(r.getLong(3) >= 0 && r.getLong(3) < 1000000L))
    locally {
      import spark.implicits._
      val uniform = Seq((1L, "aa bb cc"), (2L, "aa bb cc"))
        .toDF("doc_id", "text")
      val tfU = TextAnalysis.tokenRows(uniform, "text", "doc_id")
        .groupBy(col("token")).agg(count(lit(1)).as("f"))
        .withColumn("i", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("f"), col("token"))).cast("bigint"))
        .agg(count(lit(1)).as("n"), sum(col("f")).as("s"),
          sum(col("i") * col("f")).as("si"))
        .selectExpr("(1000000 * (2 * si - (n + 1) * s)) div (n * s)")
        .head().getLong(0)
      assert(tfU == 0L, "uniform frequencies must score Gini 0")
    }

    // temperature mix: shares sum to ~1e6 (floor loss < n_langs) and
    // the α=0.5 rule upweights the smallest slice vs its raw share
    val tm = defs("q120_temperature_mix")(spark, d).collect()
    val shareSum = tm.map(_.getLong(2)).sum
    assert(shareSum <= 1000000L && shareSum > 1000000L - tm.length)
    val totTok = tm.map(_.getLong(1)).sum
    val smallest = tm.minBy(_.getLong(1))
    assert(smallest.getLong(2) > 1000000L * smallest.getLong(1) / totTok,
      "temperature sampling must upweight the low-resource slice")

    // KMV sketch: identities hold and the estimate branch activates
    val kmv = defs("q115_kmv_sketch")(spark, d).collect().head
    assert(kmv.getLong(7) >= math.max(kmv.getLong(5), kmv.getLong(6)))
    assert(kmv.getLong(8) == kmv.getLong(5) + kmv.getLong(6) - kmv.getLong(7))
    assert(kmv.getLong(4) == kmv.getLong(1) + kmv.getLong(2) - kmv.getLong(3))
    assert(kmv.getLong(1) > 0 && kmv.getLong(3) >= kmv.getLong(1))

    // sliding reach: every event lands in exactly 7 overlapping windows
    val sr = defs("q110_sliding_reach")(spark, d)
    assert(sr.agg(sum("n_events")).head().getLong(0) ==
      7L * Tables.events(spark, d).count())

    // CMS: estimates are one-sided (est >= exact), ranks contiguous
    val cms = defs("q104_cms_heavy_hitters")(spark, d).collect()
    assert(cms.length == 20)
    assert(cms.map(_.getInt(0)).sameElements(1 to 20))
    cms.foreach { r =>
      assert(r.getLong(3) >= r.getLong(2), "CMS estimate below exact count")
      assert(r.getLong(4) == r.getLong(3) - r.getLong(2))
    }

    // LM scoring: log-probs are negative, averages bounded by the sum,
    // and every multi-token doc is scored
    val lm = defs("q105_lm_score")(spark, d).collect()
    val nMultiTok = Tables.documents(spark, d)
      .where(size(split(col("text"), " ")) >= 2).count()
    assert(lm.length == nMultiTok)
    lm.foreach { r =>
      assert(r.getLong(1) > 0 && r.getLong(2) < 0)
      assert(r.getLong(3) <= 0 && r.getLong(3) >= r.getLong(2))
    }

    // incremental agg: the merged old+delta table accounts for every event
    val inc = defs("q106_incremental_agg")(spark, d)
    assert(inc.agg(sum("n_events")).head().getLong(0) ==
      Tables.events(spark, d).count())

    // native session windows: per user, sessions ordered and disjoint
    // (next start is at least gap past the previous last event)
    val sess = defs("q107_session_native")(spark, d).collect()
      .groupBy(_.getLong(0))
    sess.foreach { case (_, rows) =>
      rows.foreach(r => assert(r.getLong(3) >= 1))
      val sorted = rows.sortBy(_.get(1).toString)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.get(2).toString <= b.get(1).toString,
            "sessions overlap: next start precedes previous end")
        case _ =>
      }
    }

    // SCD-2: per customer — versions contiguous from 1, exactly one
    // current row, intervals chain (next valid_from == prev valid_to)
    val scd = defs("q98_scd2_customer")(spark, d).collect()
      .groupBy(_.getLong(0))
    scd.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getInt(1))
      assert(sorted.head.getInt(1) == 1)
      assert(sorted.count(_.getBoolean(5)) == 1)
      assert(sorted.last.getBoolean(5), "last version is the current one")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.get(4) == b.get(3), "intervals chain without gap")
        case _ =>
      }
    }
  }
}
