package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-GROUP 1-based ranks without a single-task-per-group sort.
  *
  * `row_number() OVER (PARTITION BY g ORDER BY k, tie)` caps parallelism
  * at the number of distinct groups — fine when groups are plentiful and
  * balanced, a scale-killer when one group dominates (the r10 verdict's
  * q155 finding: four windows partitioned by `lang` ran near-serially,
  * because every real crawl is mostly one language).
  *
  * This is the distributed-sort form of ranking, the same two-phase
  * shape Spark's own `orderBy` uses, finished with count offsets:
  *
  *  1. range-repartition by (grp, key, tie) — the range partitioner
  *     SPLITS heavy groups and heavy tie-runs across tasks by the full
  *     sort key, so balance holds under any group or key-value skew
  *     (value-bucketing schemes keep a hot key value in one task; the
  *     sampled range boundaries cut straight through it);
  *  2. sort within partitions and take `monotonically_increasing_id()`
  *     — ids are consecutive per row within a partition, so the id
  *     minus the per-(partition, grp) minimum IS the local rank, with
  *     no row-grain window anywhere in the plan;
  *  3. global rank = local rank + an exclusive running count over the
  *     (partition, grp) count table — P·|groups| rows, broadcast-scale,
  *     its window partitioned by grp over an AGGREGATE (bucket-grain by
  *     construction, the sanctioned census shape).
  *
  * Correctness does not depend on where the sampled boundaries land:
  * offsets come from the ACTUAL per-partition counts, so any split is
  * exact; boundaries only steer balance. The sorted/id'd intermediate
  * is persisted via [[TransientCache]] (the count pass and the output
  * read it; ids must be assigned once) — the caller's owner releases it
  * after materializing, the operator-persist contract.
  *
  * Caller contract: `tie` must make (keyAsc, tie) a total order within
  * each group — ranks are then exactly
  * `row_number() OVER (PARTITION BY grp ORDER BY keyAsc ASC, tie ASC)`.
  * Descending ranks: negate the key (`-col` preserves tie order).
  * Output appends `out` (LongType) and keeps every input column.
  *
  * 100 TB: one range shuffle of slim rows (parallelism = shuffle
  * partitions, balanced by sampling), one bucket-grain aggregate, one
  * broadcast join. Nothing — global, per-group, or per-key-value — is
  * ever sorted in a single task.
  */
object ShardedRank {

  def withRank(df: DataFrame, grp: Seq[String], keyAsc: Column, tie: Column,
               out: String): DataFrame = {
    require(grp.nonEmpty, "ShardedRank needs a group key; use " +
      "ext.Layout's global-rank discipline for ungrouped ranks")
    val g = grp.map(col)
    val rangeKeys = g :+ col("__sr_key") :+ col("__sr_tie")
    val mid = TransientCache.persist(df
      .withColumn("__sr_key", keyAsc)
      .withColumn("__sr_tie", tie)
      .repartitionByRange(rangeKeys: _*)
      .sortWithinPartitions(rangeKeys: _*)
      // Nondeterministic expressions are never reordered past the sort,
      // and ids are consecutive within a partition in row order — after
      // the sort above, id order IS (grp, key, tie) order.
      .withColumn("__sr_mid", monotonically_increasing_id())
      .withColumn("__sr_pid", spark_partition_id()))
    val cnt = mid.groupBy((col("__sr_pid") +: g): _*)
      .agg(min(col("__sr_mid")).as("__sr_mn"), count(lit(1)).as("__sr_cnt"))
    val wOff = Window.partitionBy(g: _*).orderBy(col("__sr_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = cnt
      .withColumn("__sr_off", coalesce(sum(col("__sr_cnt")).over(wOff), lit(0L)))
      .select((col("__sr_pid") +: g :+ col("__sr_mn") :+ col("__sr_off")): _*)
    mid.join(broadcast(off), "__sr_pid" +: grp)
      .withColumn(out,
        col("__sr_mid") - col("__sr_mn") + col("__sr_off") + lit(1L))
      .drop("__sr_key", "__sr_tie", "__sr_mid", "__sr_pid",
        "__sr_mn", "__sr_off")
  }
}
