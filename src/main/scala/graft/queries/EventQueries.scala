package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructType}

/** Event-stream batch twins: the deterministic batch formulations of the
  * streaming operators in graft.streaming.EventsStream (oracle-checkable;
  * the streaming forms are asserted equivalent in StreamingSpec). */
object EventQueries {

  /** Session-lifetime 30-min-gap session table — q45's construction,
    * factored into a shared artifact because THREE queries re-derived
    * it independently (q45, q258, q270; r12 optimization, guide §2.4
    * "remove shuffles outright"): the window+rollup chain is the
    * expensive half of each consumer at sf0.1 — and q258's union even
    * recomputed it twice inside one plan before the explode rewrite
    * below. Same lifecycle as the signature artifacts: built once per
    * session (priced by Bench's cold pass and the first-pass build
    * ledger), a materialized table at cluster scale.
    * Columns: user_id, session_id, n_events, session_start,
    * session_end, total_value. */
  private def sessionTable(s: SparkSession, d: String): DataFrame =
    graft.ops.SessionCache.getOrBuild(s, s"sessions:$d") {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("is_new",
          when(col("prev_ts").isNull ||
            unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800000000L, 1)
            .otherwise(0))
        .withColumn("session_id", sum(col("is_new")).over(run))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"),
          sum(col("value").cast("decimal(18,6)")).as("total_value"))
    }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Gap-based sessionization (30 min): the batch twin of
    // EventsStream.sessionize, via lag + running sum of session starts.
    // Output unchanged since r1; the construction now reads the shared
    // session artifact.
    "q45_events_sessionize" -> ((s, d) =>
      sessionTable(s, d)
        .select(col("user_id"), col("session_id"), col("n_events"),
          col("session_start"), col("session_end"), col("total_value"))
        .orderBy(col("user_id"), col("session_id"))),

    // Peak concurrent sessions per day — the capacity number a serving
    // or ingest planner reads off the session table. Sessions (q45's
    // 30-min-gap construction) become +1/−1 boundary deltas netted per
    // distinct instant, then ONE exact global prefix sum via
    // ops.BucketedPrefix (q178's two-phase scan — the running sum is
    // over a global time order yet no single-partition window exists).
    // Half-open [start, end): an end and a start at the same instant
    // net inside the same groupBy key, so tie order cannot matter, and
    // a single-event session (start == end) nets to zero duration —
    // both engines agree by construction. Concurrency is piecewise
    // constant; each day's peak considers BOTH its change instants and
    // its carried-in opening level (the prior present day's closing
    // value, r8 advice: a day opening above its intra-day max — prior
    // day closed at 5, first boundary drops to 4 — must report 5). The
    // opening comes from a day-grain triangular join over per-day
    // closing levels (days², calendar-bounded — a decade is 3650 rows).
    // Peak ties resolve to the EARLIEST moment: midnight when the
    // carried-in level ties-or-beats the intra-day max, else the
    // earliest tying instant. Row domain stays days WITH change
    // instants. 100 TB: deltas are session-bounded (2 rows/session),
    // the scan is bucket-parallel, the day rollup calendar-bounded.
    "q258_peak_concurrency" -> ((s, d) => {
      // Boundary deltas in ONE pass over the shared session artifact:
      // the previous union-of-two-selects re-ran the whole sessionize
      // window chain once PER BRANCH (two full window passes in one
      // plan — measured as two ~850 ms shuffle-read stages at sf0.1);
      // explode(±1 struct) emits both boundaries from a single read
      // (guide §2.4). Same multiset of (us, dlt) rows, so the grouped
      // sums are unchanged.
      val deltas = sessionTable(s, d)
        .select(explode(array(
          struct(unix_micros(col("session_start")).as("us"),
            lit(1L).as("dlt")),
          struct(unix_micros(col("session_end")).as("us"),
            lit(-1L).as("dlt")))).as("b"))
        .select(col("b.us").as("us"), col("b.dlt").as("dlt"))
        .groupBy(col("us")).agg(sum(col("dlt")).as("delta"))
      // materialize (r12): three independent consumer branches (day
      // close, peaks, final join) raced the lazy cache and re-ran the
      // prefix chain each — see TransientCache.materialize.
      val cum = graft.ops.TransientCache.materialize(
        graft.ops.BucketedPrefix
          .runningSums(deltas, "us", Seq("delta"), 3600000000L)
          .select(col("us"), col("run_delta").as("conc"))
          .withColumn("day", date_trunc("day", timestamp_micros(col("us")))))
      val dayClose = cum.groupBy(col("day"))
        .agg(max_by(col("conc"), col("us")).as("close"))
      val opening = dayClose.as("x")
        .join(dayClose.as("y"), col("y.day") < col("x.day"), "left")
        .groupBy(col("x.day").as("day"))
        .agg(max_by(col("y.close"), col("y.day")).as("opening"))
      val peaks = cum.groupBy(col("day"))
        .agg(max(col("conc")).as("inmax"))
        .join(opening, Seq("day"))
        .select(col("day"), col("opening"), col("inmax"),
          greatest(col("inmax"), col("opening")).as("peak_concurrency"))
      cum.join(peaks, Seq("day"))
        .where(col("conc") === col("peak_concurrency"))
        .groupBy(col("day"), col("peak_concurrency"), col("opening"))
        .agg(min(col("us")).as("peak_at_us"))
        .unionByName(peaks // carried-in strictly above every instant: no tying row
          .where(col("opening") > col("inmax"))
          .select(col("day"), col("peak_concurrency"), col("opening"),
            lit(null).cast("long").as("peak_at_us")))
        .select(col("day"), col("peak_concurrency"),
          when(col("opening").isNotNull &&
              col("opening") >= col("peak_concurrency"), col("day"))
            .otherwise(timestamp_micros(col("peak_at_us"))).as("peak_at"))
        .orderBy(col("day"))
    }),

    // Watermark lateness sweep under bounded-disorder arrival — the
    // curve that SIZES a streaming watermark before deployment. The
    // fixture's event_id is exactly time-ordered (generated in ts
    // order), so out-of-order arrival is simulated deterministically:
    // within each 64-event block, events arrive in md5(event_id)
    // order — bounded disorder (≤ 63 positions), the shape partitioned
    // checkpointed ingest actually produces, and both engines replay
    // it bit-for-bit. Each event's high-water mark (largest ts seen
    // STRICTLY before it in arrival order) comes from
    // ops.BucketedPrefix.runningMaxExclusive — a global running max
    // with no single-partition window. lateness = max(0, hwm − ts);
    // swept W ∈ {0 s, 1 s, 10 s, 60 s}: the events a watermark of W
    // would drop (lateness > W) in ppm, plus the max lateness — read
    // off the W where drop_ppm is acceptable. 100 TB: arrival ranks
    // are block-local row_numbers (block-parallel), the prefix scan is
    // bucket-parallel, the sweep is one scan of the persisted
    // lateness column.
    "q259_watermark_lateness" -> ((s, d) => {
      val wBlk = Window.partitionBy(col("blk")).orderBy(col("h"), col("event_id"))
      val arr = Tables.events(s, d)
        .select(col("event_id"), unix_micros(col("ts")).as("us"))
        .withColumn("blk", expr("event_id div 64"))
        .withColumn("h", md5(col("event_id").cast("string").cast("binary")))
        .withColumn("arrival",
          col("blk") * 64 + row_number().over(wBlk).cast("long") - 1)
      // materialize (r12): two consumer branches (totals + the sweep
      // join) raced the lazy cache.
      val lat = graft.ops.TransientCache.materialize(
        graft.ops.BucketedPrefix
          .runningMaxExclusive(arr, "arrival", Seq("us"), 4096L)
          .select(col("us"),
            greatest(coalesce(col("run_us") - col("us"), lit(0L)), lit(0L))
              .as("late_us")))
      val caps = Seq(0L, 1000000L, 10000000L, 60000000L)
      val capDf = s.range(1)
        .select(explode(array(caps.map(lit): _*)).as("watermark_us"))
      val tot = lat.agg(count(lit(1)).as("n_events"),
        max(col("late_us")).as("max_late_us"))
      capDf.join(lat, col("late_us") > col("watermark_us"), "left")
        .groupBy(col("watermark_us"))
        .agg(count(col("us")).as("n_dropped"))
        .crossJoin(tot)
        .select(col("watermark_us"), col("n_dropped"), col("n_events"),
          expr("(1000000 * n_dropped) div n_events").as("drop_ppm"),
          col("max_late_us"))
        .orderBy(col("watermark_us"))
    }),

    // Time-weighted daily average under last-observation-carried-
    // forward — the aggregation monitoring and finance read off
    // sparse gauges, where a plain AVG over-weights busy hours: each
    // observation holds until the series' next one, intervals clip to
    // day boundaries, and the day's value is Σv·overlap ÷ Σoverlap in
    // exact integer µs·milli arithmetic (v ≤ ~3·10⁵ milli × day ≤
    // 8.64·10¹⁰ µs keeps every product < 2⁶³). The day expansion is a
    // bounded sequence() explode (gaps are observation-bounded);
    // series are window-partition-parallel, the rollup is
    // (type, day)-keyed — the 100 TB shape is one window + one
    // explode + one groupBy, no self-join. Same-timestamp ties order
    // by event_id; the zero-length interval drops, so the LATER
    // observation is the one that holds — both engines replay the
    // same lead() order.
    "q266_time_weighted_avg" -> ((s, d) => {
      // Consecutive-event pairing per type WITHOUT lead() over a
      // partitionBy(event_type) window (a ~5-value enum — the r10 q155
      // serialization shape): sharded rank within type, then an
      // equi-join of rank r to rank r+1 — identical pairs, and the
      // join shuffles on (type, rank), which no type skew can
      // serialize. The last event per type has no successor and drops,
      // exactly like the old nts IS NOT NULL filter.
      val rn = graft.ops.ShardedRank.withRank(
        Tables.events(s, d)
          .select(col("event_type"), col("ts"), col("event_id"),
            expr("CAST(floor(value * 1000) AS BIGINT)").as("v")),
        Seq("event_type"), col("ts"), col("event_id"), "rn")
      val nxt = rn.select(col("event_type").as("et2"),
        (col("rn") - 1).as("rn2"), col("ts").as("nts"))
      val iv = rn.join(nxt,
          col("event_type") === col("et2") && col("rn") === col("rn2"))
        .drop("et2", "rn2", "rn")
      iv.withColumn("day",
          explode(sequence(date_trunc("day", col("ts")),
            date_trunc("day", col("nts")), expr("interval 1 day"))))
        .withColumn("ov_start",
          greatest(unix_micros(col("ts")), unix_micros(col("day"))))
        .withColumn("ov_end", least(unix_micros(col("nts")),
          unix_micros(col("day")) + lit(86400000000L)))
        .where(col("ov_end") > col("ov_start"))
        .withColumn("dur", col("ov_end") - col("ov_start"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n_intervals"), sum(col("dur")).as("dur_us"),
          expr("CAST(sum(v * dur) DIV sum(dur) AS BIGINT)").as("twa_milli"))
        .orderBy(col("event_type"), col("day"))
    }),

    // F18 JSON decode: parse the props payload, aggregate per event type.
    "q46_events_json" -> ((s, d) => {
      val schema = new StructType().add("k", IntegerType)
      Tables.events(s, d)
        .select(col("event_type"),
          from_json(col("props"), schema).getField("k").as("k"))
        .groupBy(col("event_type"))
        .agg(count(col("k")).as("n"),
          sum(col("k")).cast("bigint").as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy(col("event_type"))
    }),

    // Cross-user session interval-overlap pairs per day — the RANGE
    // JOIN Spark has no native operator for, expressed bucket-bounded:
    // each session (q45's 30-min-gap construction, CLOSED [st, en]
    // intervals) lands in every 1-hour bucket it touches (a
    // span-bounded sequence() explode), candidate pairs form only
    // INSIDE a bucket (equi-join on the bucket key — never a global
    // theta join), and each overlapping pair is counted exactly once,
    // in the bucket containing max(st_a, st_b) — the canonical
    // interval-join dedup rule, so no global DISTINCT is needed
    // either. A pair's day is the day of that same overlap start.
    // 100 TB: bucket population is exactly the concurrency q258
    // measures, so pair work is Σ_buckets(concurrency²) — capacity-
    // bounded, never sessions².
    "q270_session_overlap" -> ((s, d) => {
      val hour = 3600000000L
      // Shared session artifact (r12): same 30-min-gap construction,
      // built once per session instead of per consumer.
      val sess = sessionTable(s, d)
        .select(col("user_id"),
          unix_micros(col("session_start")).as("st"),
          unix_micros(col("session_end")).as("en"))
      val b = sess.withColumn("bkt",
        explode(sequence(expr(s"st div $hour"), expr(s"en div $hour"))))
      b.as("a").join(b.as("b"),
          col("a.bkt") === col("b.bkt") &&
            col("a.user_id") < col("b.user_id") &&
            col("a.st") <= col("b.en") && col("b.st") <= col("a.en") &&
            expr(s"greatest(a.st, b.st) div $hour") === col("a.bkt"))
        .select(col("a.user_id").as("ua"), col("b.user_id").as("ub"),
          greatest(col("a.st"), col("b.st")).as("ov"))
        .groupBy(date_trunc("day", timestamp_micros(col("ov"))).as("day"))
        // countDistinct over BOTH columns directly — the previous
        // ua*10^7+ub packing silently collides (and overflows) once
        // user_id >= 10^7, which the oracle mirrored and so could
        // never catch (r9 advice).
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("ua"), col("ub")).as("n_user_pairs"))
        .orderBy(col("day"))
    }),

    // DGIM sliding-window bit-counting register (Datar, Gionis, Indyk
    // & Motwani, SICOMP 2002), driver-gated (r9 verdict item 6:
    // ext/Dgim was the one operator family with no oracle row). Each
    // event_type's register replays over its full (ts, event_id)-
    // ordered stream — bit = odd integer part of value, ~50% ones —
    // with the window >= stream length: the NO-EXPIRY regime, where
    // the final bucket structure has a closed-form INDEPENDENT
    // characterization. The "merge the two oldest of a size when a
    // third appears" counter is exactly the bijective base-2 numeral
    // system (digits 1..2), so after k ones the bucket-size multiset
    // equals the bijective digits of k, the oldest bucket covers the
    // oldest 2^topdigit ones (its end index pins the order contract),
    // and the DGIM estimate is k - 2^topdigit/2. The oracle derives
    // every column arithmetically (a log-depth recursive CTE for the
    // digits), never running the fold — a two-sided proof of the merge
    // cascade. Windowed EXPIRY, the register's other half, is pinned
    // by DgimSpec's property tests (estimate within the 50% theorem
    // bound at real windows) and the streaming register twin.
    // 100 TB: registers are per-key sequential BY DEFINITION (the same
    // contract as the CUSUM/hwm registers): keys partition the work,
    // each partition folds its contiguous sorted runs in one pass with
    // O(log² n) state per register — no driver state, no collect.
    "q272_dgim_register" -> ((s, d) => {
      import s.implicits._
      val bits = Tables.events(s, d)
        .select(col("event_type"),
          (floor(col("value")).cast("long") % 2 === 1).as("bit"),
          col("ts"), col("event_id"))
        .repartition(col("event_type"))
        .sortWithinPartitions(col("event_type"), col("ts"), col("event_id"))
        .select(col("event_type"), col("bit"))
        .as[(String, Boolean)]
      val folded = bits.mapPartitions { it =>
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(String, Long, Long, Long, Long, Long, String, Long)]
        var cur: String = null
        var st = graft.ext.Dgim.empty
        var ones = 0L
        def emit(): Unit = if (cur != null) {
          val bs = st.buckets // newest-first; last = oldest = largest
          out += ((cur, st.idx, ones, graft.ext.Dgim.estimate(st),
            bs.length.toLong, bs.lastOption.map(_._1).getOrElse(0L),
            bs.reverse.map(_._1).mkString(","),
            bs.lastOption.map(_._2).getOrElse(0L)))
        }
        it.foreach { case (t, b) =>
          if (t != cur) { emit(); cur = t; st = graft.ext.Dgim.empty; ones = 0L }
          st = graft.ext.Dgim.update(st, b, Long.MaxValue / 4)
          if (b) ones += 1
        }
        emit()
        out.iterator
      }.toDF("event_type", "n_events", "n_ones", "dgim_estimate",
        "n_buckets", "max_bucket_size", "buckets", "oldest_end_idx")
      folded.orderBy(col("event_type"))
    }),

    // Mergeable quantile sketch (q-digest, Shrivastava et al., SenSys
    // 2004) — the summary the sketch family was missing: HLL answers
    // distinct, CMS/MG answer frequency, DGIM answers windows; NONE
    // answers "what is p95 per group?" at a state size independent of
    // the value universe. Each event_type's value stream (micro-
    // quantized onto the [0, 2^30) integer grid) folds into a ≤ 3k-node
    // digest via partition-local builders + treeAggregate (driver
    // crossing = one digest per group, never partitions × state), then
    // a φ-grid {p25, p50, p75, p95, p99} is answered from the digests
    // alone. Digest CONTENT is merge-tree-dependent (like every
    // parallel-reduced summary), so the emitted row is the q226
    // Misra–Gries discipline: order-invariant exact facts (n, target
    // rank ⌈φn⌉, the exact quantile from the value histogram — the
    // expensive twin the sketch replaces at scale) plus the two
    // THEOREMS as booleans computed from the live sketch — the answer's
    // true-rank interval intersects target ± logU·⌊n/k⌋, and the node
    // count stays ≤ 3k. A broken compress, merge, or query flips a
    // boolean and reddens the hash compare. The exact leg rides
    // ops.BucketedPrefix over the (type, value) histogram — no
    // low-cardinality window anywhere. All integer arithmetic: the one
    // float op (value µ-quantization) is a single IEEE multiply both
    // engines evaluate on identical operands.
    "q275_qdigest_quantiles" -> ((s, d) => {
      import s.implicits._
      val logU = 30
      val k = 2000
      val u = 1L << logU
      val phis = Seq(250000L, 500000L, 750000L, 950000L, 990000L)
      val vq = least(greatest(
        floor(col("value") * lit(1000000d)).cast("long"), lit(0L)),
        lit(u - 1L))
      val ev = Tables.events(s, d).select(col("event_type"), vq.as("vq"))
      val digests =
        graft.ext.QDigest.buildPerGroup(ev.as[(String, Long)], logU, k)
      val est = graft.ext.QDigest.estimates(digests, phis)
      val estDf = est.map(e => (e.group, e.phiPpm, e.n, e.targetRank,
          e.vhat, e.errBound, e.digestNodes))
        .toDF("event_type", "phi_ppm", "n", "target_rank", "vhat",
          "err_bound", "digest_nodes")
      // materialize (r12): audit + exact-quantile branches raced the
      // lazy cache and re-ran the events histogram each.
      val hist = graft.ops.TransientCache.materialize(
        ev.groupBy(col("event_type"), col("vq"))
          .agg(count(lit(1)).as("c")))
      // Exact rank interval of each digest answer: one broadcast of the
      // 25 (type, φ) rows against the histogram.
      val audit = hist
        .join(broadcast(estDf.select(col("event_type"), col("phi_ppm"),
          col("vhat"))), Seq("event_type"))
        .groupBy(col("event_type"), col("phi_ppm"))
        .agg(sum(when(col("vq") < col("vhat"), col("c")).otherwise(lit(0L)))
            .as("cnt_lt"),
          sum(when(col("vq") <= col("vhat"), col("c")).otherwise(lit(0L)))
            .as("cnt_le"))
      // Exact quantiles: global bucketed prefix sum over typeIdx·U + vq
      // (per-type cum = global cum − the preceding types' totals, which
      // the digests already hold driver-side).
      val types = digests.keys.toSeq.sorted
      val offs = types.scanLeft(0L)((acc, t) => acc + digests(t).n)
      val idxCol = types.zipWithIndex.foldLeft(lit(-1L)) {
        case (acc, (t, i)) =>
          when(col("event_type") === lit(t), lit(i.toLong)).otherwise(acc)
      }
      val offCol = types.zipWithIndex.foldLeft(lit(0L)) {
        case (acc, (t, i)) =>
          when(col("event_type") === lit(t), lit(offs(i))).otherwise(acc)
      }
      val cum = graft.ops.BucketedPrefix
        .runningSums(hist.withColumn("gkey", idxCol * lit(u) + col("vq")),
          "gkey", Seq("c"), 1L << 22)
        .withColumn("cum_type", col("run_c") - offCol)
      val exact = cum
        .join(broadcast(estDf.select(col("event_type"), col("phi_ppm"),
          col("target_rank").as("t_rank"))), Seq("event_type"))
        .where(col("cum_type") >= col("t_rank"))
        .groupBy(col("event_type"), col("phi_ppm"))
        .agg(min(col("vq")).as("exact_q"))
      estDf.join(audit, Seq("event_type", "phi_ppm"))
        .join(exact, Seq("event_type", "phi_ppm"))
        .select(col("event_type"), col("phi_ppm"), col("n"),
          col("target_rank"), col("exact_q"), col("err_bound"),
          (col("cnt_lt") + lit(1L) <= col("target_rank") + col("err_bound") &&
            col("cnt_le") >= col("target_rank") - col("err_bound"))
            .cast("int").as("within_bound"),
          (col("digest_nodes") <= lit(3L * k)).cast("int").as("size_le_3k"))
        .orderBy(col("event_type"), col("phi_ppm"))
    }),

    // Trailing-7-day distinct users per day via HLL REGISTER-MERGE — the
    // sliding-window face of the q81 sketch and the whole reason HLL
    // registers (not just estimates) are the stored artifact: day-grain
    // registers are built ONCE from the raw scan (m = 256 rows per day),
    // and every trailing window is answered by max-merging seven
    // register sets — never by rescanning seven days of events. The
    // window expansion is an explode of each day-register row to the <= 7
    // window days it serves (equi-join against the calendar-bounded day
    // list — no range/nested-loop join anywhere), so the merge costs
    // O(days x m), independent of event count. The exact leg (the audit
    // twin) rides the same explode over the distinct (day, user) rows:
    // 7x |user-days| map-side rows into one count-distinct — linear, and
    // at 100 TB it is the fixture-affordable truth the register path
    // replaces. n_days counts the source days each window actually saw
    // (honest left edge: day 1's "7-day" window holds one day).
    "q278_sliding_hll" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .where(col("user_id").isNotNull)
        .withColumn("day", date_trunc("day", col("ts")))
      // materialize (r12): day-list + window-merge branches raced the
      // lazy cache and re-built the registers each.
      val regs = graft.ops.TransientCache.materialize(
        graft.ext.Sketches.hllRegisters(ev, "user_id", "day", 8))
      val days = regs.select(col("day")).distinct()
      val winDays = sequence(col("day"),
        col("day") + expr("interval 6 days"), expr("interval 1 day"))
      val winRegs = regs
        .select(col("bucket"), col("r"), explode(winDays).as("wday"))
        .join(broadcast(days.select(col("day").as("wday"))), Seq("wday"))
        .select(col("wday").as("day"), col("bucket"), col("r"))
        .groupBy(col("day"), col("bucket")).agg(max(col("r")).as("r"))
      val est = graft.ext.Sketches.hllEstimateFromRegisters(winRegs, "day", 8)
      val nDays = days
        .select(col("day").as("srcday"), explode(winDays).as("wday"))
        .join(broadcast(days.select(col("day").as("wday"))), Seq("wday"))
        .groupBy(col("wday").as("day"))
        .agg(count(lit(1)).cast("long").as("n_days"))
      val exact = ev.select(col("day"), col("user_id")).distinct()
        .select(col("user_id"), explode(winDays).as("wday"))
        .join(broadcast(days.select(col("day").as("wday"))), Seq("wday"))
        .groupBy(col("wday").as("day"))
        .agg(countDistinct(col("user_id")).as("n_exact"))
      est.join(nDays, Seq("day")).join(exact, Seq("day"))
        .select(col("day"), col("n_days"), col("n_exact"),
          col("n_buckets"), col("est_milli"))
        .orderBy(col("day"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q45_events_sessionize" ->
      """WITH l AS (
        |  SELECT user_id, event_id, ts, value,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) pts
        |  FROM events),
        |s AS (
        |  SELECT *, CASE WHEN pts IS NULL
        |      OR epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(CAST(pts AS TIMESTAMP)) > 1800000000
        |    THEN 1 ELSE 0 END nw
        |  FROM l),
        |x AS (
        |  SELECT *, sum(nw) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) sid
        |  FROM s)
        |SELECT user_id, CAST(sid AS BIGINT) AS session_id, count(*) AS n_events,
        |  min(ts) AS session_start, max(ts) AS session_end,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q258_peak_concurrency" ->
      """WITH l AS (
        |  SELECT user_id, event_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) pts
        |  FROM events),
        |s AS (
        |  SELECT *, CASE WHEN pts IS NULL
        |      OR epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(CAST(pts AS TIMESTAMP)) > 1800000000
        |    THEN 1 ELSE 0 END nw
        |  FROM l),
        |x AS (
        |  SELECT *, sum(nw) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) sid
        |  FROM s),
        |se AS (SELECT user_id, sid, min(ts) st, max(ts) en FROM x GROUP BY 1, 2),
        |dl AS (SELECT epoch_us(CAST(st AS TIMESTAMP)) us, 1 dlt FROM se
        |       UNION ALL
        |       SELECT epoch_us(CAST(en AS TIMESTAMP)), -1 FROM se),
        |g AS (SELECT us, sum(dlt) delta FROM dl GROUP BY 1),
        |c AS (SELECT us, CAST(sum(delta) OVER (ORDER BY us
        |        ROWS UNBOUNDED PRECEDING) AS BIGINT) conc
        |      FROM g),
        |cd AS (SELECT us, conc, date_trunc('day', make_timestamp(us)) AS day FROM c),
        |dcl AS (SELECT day, arg_max(conc, us) clsv FROM cd GROUP BY 1),
        |op AS (SELECT x.day, arg_max(y.clsv, y.day) opening
        |       FROM dcl x LEFT JOIN dcl y ON y.day < x.day GROUP BY 1),
        |pk AS (SELECT im.day, op.opening, im.inmax,
        |         greatest(im.inmax, coalesce(op.opening, im.inmax)) peak
        |       FROM (SELECT day, max(conc) inmax FROM cd GROUP BY 1) im
        |       JOIN op ON im.day = op.day),
        |pt AS (SELECT cd.day, min(us) mus
        |       FROM cd JOIN pk ON cd.day = pk.day AND cd.conc = pk.peak
        |       GROUP BY 1)
        |SELECT pk.day AS day, CAST(pk.peak AS BIGINT) AS peak_concurrency,
        |  CASE WHEN pk.opening IS NOT NULL AND pk.opening >= pk.peak
        |    THEN pk.day ELSE make_timestamp(pt.mus) END AS peak_at
        |FROM pk LEFT JOIN pt ON pk.day = pt.day ORDER BY 1""".stripMargin,

    "q259_watermark_lateness" ->
      """WITH a AS (SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) us,
        |    event_id // 64 blk, md5(CAST(event_id AS VARCHAR)) h
        |  FROM events),
        |r AS (SELECT *, blk * 64 + row_number() OVER (PARTITION BY blk
        |        ORDER BY h, event_id) - 1 arrival
        |      FROM a),
        |m AS (SELECT us, max(us) OVER (ORDER BY arrival
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) mx
        |      FROM r),
        |lt AS (SELECT us, greatest(coalesce(mx - us, 0), 0) late_us FROM m),
        |w AS (SELECT CAST(unnest([0, 1000000, 10000000, 60000000]) AS BIGINT) watermark_us),
        |t AS (SELECT count(*) n_events, max(late_us) max_late_us FROM lt),
        |g AS (SELECT watermark_us, count(lt.us) n_dropped
        |      FROM w LEFT JOIN lt ON late_us > watermark_us GROUP BY 1)
        |SELECT watermark_us, CAST(n_dropped AS BIGINT) AS n_dropped,
        |  CAST(n_events AS BIGINT) AS n_events,
        |  CAST((1000000 * n_dropped) // n_events AS BIGINT) AS drop_ppm,
        |  CAST(max_late_us AS BIGINT) AS max_late_us
        |FROM g CROSS JOIN t ORDER BY watermark_us""".stripMargin,

    "q266_time_weighted_avg" ->
      """WITH e AS (SELECT event_type, CAST(ts AS TIMESTAMP) ts, event_id,
        |    CAST(floor(value * 1000) AS BIGINT) v FROM events),
        |l AS (SELECT *, lead(ts) OVER (PARTITION BY event_type
        |        ORDER BY ts, event_id) nts FROM e),
        |iv AS (SELECT * FROM l WHERE nts IS NOT NULL),
        |dx AS (SELECT event_type, v, ts, nts,
        |    unnest(generate_series(date_trunc('day', ts),
        |      date_trunc('day', nts), INTERVAL 1 DAY)) AS day
        |  FROM iv),
        |ov AS (SELECT event_type, day, v,
        |    greatest(epoch_us(ts), epoch_us(day)) s,
        |    least(epoch_us(nts), epoch_us(day) + 86400000000) e2
        |  FROM dx),
        |f AS (SELECT event_type, day, v, e2 - s dur FROM ov WHERE e2 > s)
        |SELECT event_type, day, CAST(count(*) AS BIGINT) AS n_intervals,
        |  CAST(sum(dur) AS BIGINT) AS dur_us,
        |  CAST(sum(v * dur) // sum(dur) AS BIGINT) AS twa_milli
        |FROM f GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q46_events_json" ->
      """SELECT event_type,
        |  count(CAST(props->>'$.k' AS INT)) AS n,
        |  CAST(sum(CAST(props->>'$.k' AS INT)) AS BIGINT) AS sum_k,
        |  min(CAST(props->>'$.k' AS INT)) AS min_k,
        |  max(CAST(props->>'$.k' AS INT)) AS max_k
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // q270 oracle: the range join stated DIRECTLY (oracle-sized data);
    // the engine's bucketed form must produce the identical pair set.
    "q270_session_overlap" ->
      """WITH l AS (
        |  SELECT user_id, event_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) pts
        |  FROM events),
        |s AS (
        |  SELECT *, CASE WHEN pts IS NULL
        |      OR epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(CAST(pts AS TIMESTAMP)) > 1800000000
        |    THEN 1 ELSE 0 END nw
        |  FROM l),
        |x AS (
        |  SELECT *, sum(nw) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) sid
        |  FROM s),
        |se AS (SELECT user_id, sid,
        |         epoch_us(CAST(min(ts) AS TIMESTAMP)) st,
        |         epoch_us(CAST(max(ts) AS TIMESTAMP)) en
        |       FROM x GROUP BY 1, 2),
        |pr AS (SELECT a.user_id ua, b.user_id ub, greatest(a.st, b.st) ov
        |       FROM se a JOIN se b ON a.user_id < b.user_id
        |         AND a.st <= b.en AND b.st <= a.en)
        |SELECT date_trunc('day', make_timestamp(ov)) AS day,
        |  CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(count(DISTINCT (ua, ub)) AS BIGINT) AS n_user_pairs
        |FROM pr GROUP BY 1 ORDER BY 1""".stripMargin,

    // q272 oracle: the DGIM merge rule is never folded here — the
    // bucket structure is derived arithmetically from the bijective
    // base-2 characterization (see the query comment), so the compare
    // proves the engine's fold against independent math.
    "q272_dgim_register" ->
      """WITH RECURSIVE e AS (
        |  SELECT event_type,
        |    CASE WHEN CAST(floor(value) AS BIGINT) % 2 = 1 THEN 1 ELSE 0 END bi,
        |    row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) idx
        |  FROM events),
        |k AS (SELECT event_type, count(*) n_events,
        |        CAST(sum(bi) AS BIGINT) n_ones
        |      FROM e GROUP BY 1),
        |rec AS (
        |  SELECT event_type, n_ones r, -1 j, CAST(0 AS BIGINT) digit FROM k
        |  UNION ALL
        |  SELECT event_type,
        |    (r - CASE WHEN r % 2 = 0 THEN 2 ELSE 1 END) // 2,
        |    j + 1,
        |    CAST(CASE WHEN r % 2 = 0 THEN 2 ELSE 1 END AS BIGINT)
        |  FROM rec WHERE r > 0),
        |digits AS (SELECT event_type, j, digit FROM rec WHERE j >= 0),
        |agg AS (SELECT event_type, sum(digit) n_buckets, max(j) mj
        |        FROM digits GROUP BY 1),
        |ex AS (SELECT event_type, j,
        |         unnest(generate_series(1, CAST(digit AS INT))) u
        |       FROM digits),
        |bstr AS (SELECT event_type,
        |           string_agg(CAST(CAST(1 AS BIGINT) << j AS VARCHAR), ','
        |                      ORDER BY j DESC) buckets
        |         FROM ex GROUP BY 1),
        |o AS (SELECT event_type, idx,
        |        row_number() OVER (PARTITION BY event_type ORDER BY idx) rk
        |      FROM e WHERE bi = 1),
        |oe AS (SELECT o.event_type, o.idx oldest_end
        |       FROM o JOIN agg ON o.event_type = agg.event_type
        |         AND o.rk = (CAST(1 AS BIGINT) << agg.mj))
        |SELECT k.event_type,
        |  CAST(k.n_events AS BIGINT) AS n_events,
        |  k.n_ones AS n_ones,
        |  CAST(coalesce(k.n_ones - (CAST(1 AS BIGINT) << agg.mj) // 2, 0)
        |    AS BIGINT) AS dgim_estimate,
        |  CAST(coalesce(agg.n_buckets, 0) AS BIGINT) AS n_buckets,
        |  CAST(coalesce(CAST(1 AS BIGINT) << agg.mj, 0) AS BIGINT)
        |    AS max_bucket_size,
        |  coalesce(bstr.buckets, '') AS buckets,
        |  CAST(coalesce(oe.oldest_end, 0) AS BIGINT) AS oldest_end_idx
        |FROM k LEFT JOIN agg USING (event_type)
        |  LEFT JOIN bstr USING (event_type)
        |  LEFT JOIN oe USING (event_type)
        |ORDER BY event_type""".stripMargin,

    // q275 oracle: every exact column re-derived independently (micro-
    // quantization, ⌈φn⌉ target, histogram-cumulative quantile); the
    // theorem columns are literals BECAUSE they are theorems — the
    // Spark side computes them from the live digest, so a broken
    // compress/merge/query flips a boolean and fails the hash compare.
    "q275_qdigest_quantiles" ->
      """WITH e AS (
        |  SELECT event_type,
        |    least(greatest(CAST(floor(value * CAST(1000000 AS DOUBLE))
        |      AS BIGINT), 0), 1073741823) vq
        |  FROM events),
        |k AS (SELECT event_type, CAST(count(*) AS BIGINT) n
        |      FROM e GROUP BY 1),
        |ph AS (SELECT CAST(unnest([250000, 500000, 750000, 950000,
        |                           990000]) AS BIGINT) phi_ppm),
        |t AS (SELECT event_type, phi_ppm, n,
        |        greatest(CAST(1 AS BIGINT),
        |          CAST((phi_ppm * n + 999999) // 1000000 AS BIGINT))
        |          target_rank,
        |        CAST(30 * (n // 2000) AS BIGINT) err_bound
        |      FROM k CROSS JOIN ph),
        |h AS (SELECT event_type, vq, CAST(count(*) AS BIGINT) c
        |      FROM e GROUP BY 1, 2),
        |hc AS (SELECT event_type, vq,
        |         CAST(sum(c) OVER (PARTITION BY event_type
        |           ORDER BY vq) AS BIGINT) cum
        |       FROM h),
        |x AS (SELECT t.event_type, t.phi_ppm, min(hc.vq) exact_q
        |      FROM t JOIN hc ON t.event_type = hc.event_type
        |        AND hc.cum >= t.target_rank
        |      GROUP BY 1, 2)
        |SELECT t.event_type, t.phi_ppm, t.n, t.target_rank, x.exact_q,
        |  t.err_bound, CAST(1 AS INT) within_bound,
        |  CAST(1 AS INT) size_le_3k
        |FROM t JOIN x ON t.event_type = x.event_type
        |  AND t.phi_ppm = x.phi_ppm
        |ORDER BY t.event_type, t.phi_ppm""".stripMargin,

    // q278 oracle: the q81 register/estimate SQL at day grain, window
    // merge via the same explode-to-window-days + day-list equi-join.
    "q278_sliding_hll" ->
      """WITH ev AS (SELECT date_trunc('day', ts) AS day, user_id
        |            FROM events WHERE user_id IS NOT NULL),
        |h AS (SELECT day, md5(CAST(user_id AS VARCHAR)) h FROM ev),
        |r0 AS (SELECT day, CAST(concat('0x', substr(h, 1, 2)) AS INT) bucket,
        |         CAST(concat('0x', substr(h, 3, 8)) AS BIGINT) x FROM h),
        |regs AS (SELECT day, bucket,
        |           max(CASE WHEN x > 0 THEN 33 - length(bin(x)) ELSE 33 END) r
        |         FROM r0 GROUP BY 1, 2),
        |days AS (SELECT DISTINCT day FROM regs),
        |wx AS (SELECT bucket, r,
        |         unnest(generate_series(day, day + INTERVAL 6 DAY,
        |           INTERVAL 1 DAY)) wday
        |       FROM regs),
        |wr AS (SELECT wx.wday AS day, wx.bucket, max(wx.r) r
        |       FROM wx JOIN days dd ON dd.day = wx.wday GROUP BY 1, 2),
        |s AS (SELECT day, CAST(sum(CAST(1 AS BIGINT) << (48 - r)) AS BIGINT) s_seen,
        |        CAST(count(*) AS BIGINT) nb
        |      FROM wr GROUP BY 1),
        |st AS (SELECT day, nb, s_seen + (256 - nb) * 281474976710656 s_total FROM s),
        |e1 AS (SELECT day, nb,
        |         (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0
        |           * 281474976710656.0 / CAST(s_total AS DOUBLE) raw
        |       FROM st),
        |e2 AS (SELECT day, nb,
        |         CASE WHEN raw <= 640.0 AND nb < 256
        |           THEN 256.0 * ln(256.0 / CAST(256 - nb AS DOUBLE))
        |           ELSE raw END est
        |       FROM e1),
        |ndx AS (SELECT day, unnest(generate_series(day, day + INTERVAL 6 DAY,
        |          INTERVAL 1 DAY)) wday FROM days),
        |ndw AS (SELECT ndx.wday AS day, CAST(count(*) AS BIGINT) n_days
        |        FROM ndx JOIN days dd ON dd.day = ndx.wday GROUP BY 1),
        |ux AS (SELECT user_id, unnest(generate_series(day, day + INTERVAL 6 DAY,
        |         INTERVAL 1 DAY)) wday
        |       FROM (SELECT DISTINCT day, user_id FROM ev)),
        |exact AS (SELECT ux.wday AS day, CAST(count(DISTINCT ux.user_id) AS BIGINT) n_exact
        |          FROM ux JOIN days dd ON dd.day = ux.wday GROUP BY 1)
        |SELECT e2.day, ndw.n_days, exact.n_exact,
        |  CAST(e2.nb AS INT) n_buckets,
        |  CAST(floor(e2.est * 1000.0) AS BIGINT) est_milli
        |FROM e2 JOIN ndw ON ndw.day = e2.day
        |JOIN exact ON exact.day = e2.day
        |ORDER BY e2.day""".stripMargin
  )
}
