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
  *  3. bucket-prefix offsets from a triangular join over the
  *     bucket-total table (buckets², but buckets are bounded by
  *     key-range/width — broadcast-scale), combined with the
  *     within-bucket leg.
  *
  * Caller contract: `orderCol` must be globally unique (aggregate ties
  * away first, as q178 does at the distinct-value grain) so inclusive /
  * exclusive semantics are unambiguous, and non-negative (`div`
  * truncates toward zero, so a negative key range would fold around
  * bucket 0). Output keeps every input column and appends one `run_<c>`
  * column per requested aggregate.
  */
object BucketedPrefix {

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
    val btot = withB.groupBy(bkt).agg(tAggs.head, tAggs.tail: _*)
    // Strictly-prior buckets only (y < x): the offset leg is exclusive
    // at bucket grain by construction, which serves both modes.
    val oAggs = cols.map(c => agg(col(s"y.__bp_t_$c")).as(s"__bp_o_$c"))
    val offs = btot.as("x")
      .join(btot.as("y"), col("y.__bp_bkt") < col("x.__bp_bkt"), "left")
      .groupBy(col("x.__bp_bkt").as("__bp_bkt"))
      .agg(oAggs.head, oAggs.tail: _*)
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
