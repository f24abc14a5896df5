package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** Post-read fan-out for heavy per-row map work over an unsplittable
  * scan (guide §2.5: "one huge unsplittable file — repartition
  * immediately after the read").
  *
  * The test corpus is single-file, single-ROW-GROUP parquet, and a
  * parquet row group cannot be split below its boundary: however many
  * byte-range splits the scan planner makes, exactly one task decodes
  * all rows, and every narrow operator fused into that scan stage
  * (md5 signatures, shingling explodes, codec decodes) runs on one
  * core of 32 — measured on q276 (1.65 s single-task sketch stage).
  * An explicit hash repartition on a well-spread DETERMINISTIC key
  * (never rand(): retried tasks must reproduce the assignment,
  * SPARK-38388) moves a few slim MB once and parallelizes everything
  * downstream.
  *
  * Scale-adaptive, not a local-mode constant: when the input already
  * carries at least the session's default parallelism (a real
  * partitioned table at cluster scale), this is a NO-OP — the shuffle
  * is only inserted when the scan is measurably under-parallel.
  * Streaming inputs pass through untouched (their micro-batch
  * partitioning is the ingest contract, and `.rdd` is illegal on an
  * unstarted stream).
  */
object Fanout {

  /** Repartition `df` to the session's core count by `key` iff the
    * physical plan would otherwise run narrower than half the cores.
    * `key` must be deterministic and well-spread (≫ cores distinct
    * values); downstream must not rely on row order.
    *
    * Two-tier check: inputs whose LOGICAL plan already contains a
    * wide operator (aggregate/join/window/sort/repartition) inherit
    * shuffle parallelism and skip untouched — inspected on the
    * analyzed tree, because the alternative (`.rdd`) forces a full
    * discarded physical-planning pass per call, measured at
    * ~0.1-0.3 s on complex inputs. Only scan-shaped plans (cheap to
    * plan) pay the exact partition-count probe that keeps this a
    * no-op on real partitioned tables at cluster scale. */
  def byKey(df: DataFrame, key: Column): DataFrame = {
    if (df.isStreaming) return df
    import org.apache.spark.sql.catalyst.plans.logical._
    val wide = df.queryExecution.analyzed.collectFirst {
      case p @ (_: Aggregate | _: Join | _: Window | _: Sort |
                _: Distinct | _: Deduplicate) => p
      case p: RepartitionOperation => p
    }
    if (wide.nonEmpty) return df
    val n = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 > n) df
    else df.repartition(n, key)
  }
}
