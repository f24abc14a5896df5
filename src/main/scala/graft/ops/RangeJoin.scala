package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded-window range join: pair left rows with right rows of the same
  * key whose timestamp falls in `(left.t, left.t + window]` — the
  * "conversions within an hour of the click" shape. Spark lowers a raw
  * `key = key AND rt > lt AND rt <= lt + w` predicate to an equi-join on
  * the key ONLY, leaving the time bounds as a post-join filter: per-key
  * cost is |L_k|×|R_k| pairs, quadratic on hot keys.
  *
  * Scale design (100 TB): band both sides into time buckets of exactly
  * the window width. A right row at time rt can only match left rows in
  * bucket(rt) or bucket(rt)−1, so replicating the RIGHT side to those two
  * buckets and equi-joining on (key, bucket) bounds the fan-out to the
  * rows that can actually pair, at a fixed 2× replication of the right
  * side — the standard interval-banding rewrite (cf. Spark's own
  * RangeJoinExec proposals and DuckDB/Postgres band-join literature). The
  * exact bounds are re-checked post-join; semantics are identical to the
  * theta join. */
object RangeJoin {

  /** For each left row, the matching right rows within `(lt, lt + windowMicros]`
    * on the same key, as (left row, right payload) pairs. `leftTime` /
    * `rightTime` must be TimestampType columns. */
  def pairsWithinAfter(left: DataFrame, right: DataFrame, keyCol: String,
                       leftTime: String, rightTime: String, windowMicros: Long,
                       rightCols: Seq[String], prefix: String = "r_"): DataFrame = {
    require(windowMicros > 0, s"windowMicros must be positive (got $windowMicros)")
    val lb = left.select(
      struct(left.columns.map(col): _*).as("__lv"),
      col(keyCol).as("__key"),
      unix_micros(col(leftTime)).as("__lt"))
      .withColumn("__b", floor(col("__lt") / windowMicros))
    val rb = right.select(
      struct(rightCols.map(col): _*).as("__rv"),
      col(keyCol).as("__rkey"),
      unix_micros(col(rightTime)).as("__rt"))
      // A right row can serve left buckets floor(rt/w) and floor(rt/w)-1.
      .withColumn("__b", explode(array(floor(col("__rt") / windowMicros),
        floor(col("__rt") / windowMicros) - 1)))
    lb.join(rb, col("__key") === col("__rkey") && lb("__b") === rb("__b") &&
        col("__rt") > col("__lt") && col("__rt") <= col("__lt") + windowMicros)
      .select(Seq(col("__lv"), col("__rv")): _*)
      .select(left.columns.map(c => col(s"__lv.$c").as(c)) ++
        rightCols.map(c => col(s"__rv.$c").as(s"$prefix$c")): _*)
  }
}
