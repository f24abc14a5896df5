package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global running aggregates WITHOUT a single-partition window.
  *
  * The classic prefix-scan shape — `sum(x) OVER (ORDER BY k)` — moves
  * the whole input into ONE task in Spark (WindowExec warns precisely
  * about this), which is the one plan that cannot survive a corpus-sized
  * input. This op is the scale form, first shipped inline for q178's KS
  * statistic (r7 verdict item 5) and factored out once q258/q259 needed
  * the same discipline:
  *
  *  1. bucket the (integer) global order key by a VALUE-based width —
  *     deterministic, no sampled range boundaries;
  *  2. within-bucket running aggregates via a window PARTITIONED by
  *     bucket (parallel across buckets);
  *  3. bucket-prefix offsets computed RECURSIVELY over the bucket-total
  *     table (r8 advice: a flat triangular join is O(B²) comparisons,
  *     and for epoch-microsecond keys B grows linearly with the data's
  *     time span): buckets are grouped into super-buckets of
  *     [[superWidth]]; within a super-bucket the exclusive prefix is a
  *     window PARTITIONED by super-bucket (parallel, ≤ superWidth rows
  *     per partition), and only the super-bucket totals — B/superWidth
  *     rows — go through the triangular join. Offset cost drops from
  *     O(B²) to O(B·superWidth + (B/superWidth)²): a decade of 1-hour
  *     buckets is B ≈ 87 k → 87 k·1024 + 85² instead of 7.6e9
  *     comparisons, and the joined table stays broadcast-scale.
  *
  * Caller contract: `orderCol` must be globally unique (aggregate ties
  * away first, as q178 does at the distinct-value grain) so inclusive /
  * exclusive semantics are unambiguous, and non-negative (`div`
  * truncates toward zero, so a negative key range would fold around
  * bucket 0). Output keeps every input column and appends one `run_<c>`
  * column per requested aggregate.
  */
object BucketedPrefix {

  /** Buckets per super-bucket in the offset recursion. 1024 keeps both
    * legs tiny over any realistic key range: the per-super window sorts
    * ≤1024 bucket-total rows, and the triangular join squares only
    * B/1024. */
  private val superWidth = 1024L

  /** Inclusive running SUM of each column in `sumCols` over the global
    * `orderCol` order. Peer-free input ⇒ identical to the peer-inclusive
    * RANGE frame of a plain `ORDER BY` window. */
  def runningSums(df: DataFrame, orderCol: String, sumCols: Seq[String],
                  bucketWidth: Long): DataFrame =
    running(df, orderCol, sumCols, bucketWidth, exclusive = false,
      sum(_), (a, b) => a + b, lit(0L))

  /** EXCLUSIVE running MAX (strict prefix — the row's own value is not
    * included; the first row gets NULL): the watermark/out-of-order
    * shape, "the largest key seen strictly before me". */
  def runningMaxExclusive(df: DataFrame, orderCol: String, maxCols: Seq[String],
                          bucketWidth: Long): DataFrame =
    running(df, orderCol, maxCols, bucketWidth, exclusive = true,
      max(_), (a, b) => greatest(a, b), lit(null).cast("long"))

  private def running(df: DataFrame, orderCol: String, cols: Seq[String],
                      bucketWidth: Long, exclusive: Boolean,
                      agg: Column => Column,
                      combine: (Column, Column) => Column,
                      zero: Column): DataFrame = {
    val bkt = col("__bp_bkt")
    val withB = df.withColumn("__bp_bkt",
      expr(s"$orderCol div $bucketWidth"))
    val tAggs = cols.map(c => agg(col(c)).as(s"__bp_t_$c"))
    // Null-as-identity combine: either leg below may be legitimately
    // absent (first bucket of a super-bucket, first super-bucket), and
    // all-absent must STAY null so the callers' zero/null semantics at
    // the final combine are preserved.
    def nullAware(a: Column, b: Column): Column =
      when(a.isNull, b).when(b.isNull, a).otherwise(combine(a, b))
    val btot = withB.groupBy(bkt).agg(tAggs.head, tAggs.tail: _*)
      .withColumn("__bp_sup", expr(s"__bp_bkt div $superWidth"))
    // Leg A — strictly-prior buckets INSIDE my super-bucket: a window
    // partitioned by super-bucket (parallel; ≤ superWidth rows each).
    val wSup = Window.partitionBy(col("__bp_sup")).orderBy(bkt)
      .rowsBetween(Window.unboundedPreceding, -1)
    val withinSup = cols.foldLeft(btot) { (acc, c) =>
      acc.withColumn(s"__bp_w_$c", agg(col(s"__bp_t_$c")).over(wSup))
    }
    // Leg B — strictly-prior SUPER-buckets: triangular join over the
    // super-totals only (B/superWidth rows — the only quadratic piece).
    val sAggs = cols.map(c => agg(col(s"__bp_t_$c")).as(s"__bp_s_$c"))
    val stot = btot.groupBy(col("__bp_sup")).agg(sAggs.head, sAggs.tail: _*)
    val pAggs = cols.map(c => agg(col(s"y.__bp_s_$c")).as(s"__bp_p_$c"))
    val sOffs = stot.as("x")
      .join(stot.as("y"), col("y.__bp_sup") < col("x.__bp_sup"), "left")
      .groupBy(col("x.__bp_sup").as("__bp_sup"))
      .agg(pAggs.head, pAggs.tail: _*)
    val offs = withinSup.join(broadcast(sOffs), Seq("__bp_sup"))
      .select(bkt +: cols.map(c =>
        nullAware(col(s"__bp_p_$c"), col(s"__bp_w_$c")).as(s"__bp_o_$c")): _*)
    val frame = if (exclusive)
      Window.partitionBy(bkt).orderBy(col(orderCol))
        .rowsBetween(Window.unboundedPreceding, -1)
    else
      Window.partitionBy(bkt).orderBy(col(orderCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withLocal = cols.foldLeft(withB) { (acc, c) =>
      acc.withColumn(s"__bp_l_$c", agg(col(c)).over(frame))
    }
    val joined = withLocal.join(broadcast(offs), Seq("__bp_bkt"))
    val out = cols.foldLeft(joined) { (acc, c) =>
      // sum mode: null legs coalesce to the zero element; max mode:
      // greatest() ignores nulls, and all-null (first row overall,
      // exclusive) stays null — the caller's "nothing seen yet".
      val o = col(s"__bp_o_$c")
      val l = col(s"__bp_l_$c")
      val combined =
        if (exclusive) combine(o, l)
        else combine(coalesce(o, zero), coalesce(l, zero))
      acc.withColumn(s"run_$c", combined)
    }
    out.drop("__bp_bkt" +: cols.flatMap(c =>
      Seq(s"__bp_l_$c", s"__bp_o_$c")): _*)
  }
}
