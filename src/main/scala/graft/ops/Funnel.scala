package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over an event stream: for a stage sequence
  * (e.g. view → click → purchase), each user completes stage i at the
  * FIRST event of that type strictly after their stage-(i-1) completion
  * — the standard product-analytics funnel semantics (no counterpart in
  * the reference; extension surface like the q53/q59 temporal joins).
  *
  * 100 TB shape: stage i is one equi-join on the user key against the
  * (user, t_{i-1}) table plus one min-aggregate — all shuffles are on
  * the same user key, so after the first exchange the chain stays
  * co-partitioned (no re-shuffle under AQE); nothing pairwise, nothing
  * driver-side. The summary collapses to a stages-sized row set.
  */
object Funnel {

  /** Per-user first-completion time of every stage: columns
    * `userCol, t0..t{k-1}` (null = stage never reached; later stages are
    * null whenever an earlier one is, by construction). */
  def stageTimes(events: DataFrame, userCol: String, tsCol: String,
                 typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "at least one funnel stage")
    val first = events.where(col(typeCol) === stages.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t0"))
    stages.zipWithIndex.drop(1).foldLeft(first) { case (acc, (st, i)) =>
      val prev = s"t${i - 1}"
      val cur = s"t$i"
      val nxt = events.where(col(typeCol) === st)
        .select(col(userCol), col(tsCol))
        .join(acc.select(col(userCol), col(prev)), Seq(userCol))
        .where(col(tsCol) > col(prev))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as(cur))
      acc.join(nxt, Seq(userCol), "left")
    }
  }

  /** Funnel summary: `stage` (1-based), `event_type`, `n_users` who
    * reached it. The per-stage counts aggregate to ONE row before the
    * stack unpivot, so the result is stages-sized regardless of corpus
    * size. */
  def funnelCounts(events: DataFrame, userCol: String, tsCol: String,
                   typeCol: String, stages: Seq[String]): DataFrame = {
    val st = stageTimes(events, userCol, tsCol, typeCol, stages)
    val counts = st.agg(
      count(col("t0")).as("c0"),
      stages.indices.drop(1).map(i => count(col(s"t$i")).as(s"c$i")): _*)
    // Unpivot via explode of literal structs, not a selectExpr string —
    // stage names are caller data and must never be spliced into SQL
    // text (a quote in a name would parse-error or inject).
    val rows = stages.zipWithIndex.map { case (s, i) =>
      struct(lit(i + 1).cast("int").as("stage"), lit(s).as("event_type"),
        col(s"c$i").as("n_users"))
    }
    counts.select(explode(array(rows: _*)).as("r"))
      .select(col("r.stage").as("stage"), col("r.event_type").as("event_type"),
        col("r.n_users").as("n_users"))
  }
}
