package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-lifetime cache of persisted derived tables, keyed by
  * (session instance, logical key). The same contract as the member
  * catalog's cache: entries live as long as their session, entries of
  * stopped sessions are evicted on access, and — unlike TransientCache —
  * nothing here is released per-query, because the cached artifact is
  * shared ACROSS queries (e.g. the simhash signature table feeding both
  * the cluster and the Hamming-pair pass; at cluster scale it would be a
  * persisted table on storage, not an in-memory cache). */
object SessionCache {

  private val cache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  /** Per-session log of cache-miss build cost (key -> cumulative
    * seconds). Artifact builds are the one cross-query cost in the
    * engine, and charging them to whichever query happens to run first
    * made round-over-round per-query comparisons ambiguous (r6 verdict
    * item 2). Misses are timed HERE — the single choke point through
    * which every session artifact is born — and Bench drains the log
    * per pass so warm totals decompose into query work + artifact
    * builds. */
  private val buildLog =
    scala.collection.concurrent.TrieMap.empty[SparkSession, scala.collection.concurrent.TrieMap[String, Double]]

  private def recordBuild(spark: SparkSession, key: String, secs: Double): Unit = {
    val m = buildLog.getOrElseUpdate(spark, scala.collection.concurrent.TrieMap.empty)
    m.put(key, m.getOrElse(key, 0.0) + secs)
  }

  /** Return and clear the accumulated artifact-build seconds for this
    * session (key -> seconds since the last drain). */
  def drainBuildLog(spark: SparkSession): Map[String, Double] =
    buildLog.remove(spark).map(_.toMap).getOrElse(Map.empty)

  /** The materialized row blocks behind each artifact, so [[clear]] can
    * free them deterministically: `Dataset.unpersist` is a no-op on a
    * localCheckpoint'd Dataset (its blocks belong to the checkpointed
    * RDD, not the CacheManager), and waiting for the ContextCleaner to
    * GC them would let a 278-query cold pass (clear per query, rebuild
    * per query) pile up dead block sets. */
  private val blocks =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), org.apache.spark.rdd.RDD[_]]

  /** The checkpointed InternalRow RDD under a localCheckpoint'd Dataset
    * (its analyzed plan is one `LogicalRDD(rdd)` leaf). Reflective read
    * because LogicalRDD is private[sql]; best-effort — a None just means
    * [[clear]] leaves the blocks to the ContextCleaner. */
  private def checkpointRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collectLeaves().headOption.flatMap { leaf =>
      try Some(leaf.getClass.getMethod("rdd").invoke(leaf)
        .asInstanceOf[org.apache.spark.rdd.RDD[_]])
      catch { case _: Throwable => None }
    }

  def getOrBuild(spark: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    cache.keys.filter(_._1.sparkContext.isStopped).foreach(cache.remove)
    cache.get((spark, key)) match {
      case Some(df) => df
      case None =>
        // Not getOrElseUpdate: TrieMap may evaluate the builder in two
        // racing threads and only store one. A race loser's build is
        // self-contained (its own checkpoint blocks), so dropping the
        // reference leaks nothing beyond blocks the ContextCleaner
        // reclaims on GC.
        //
        // Eager localCheckpoint, not persist+count (r13 optimization,
        // guide §5 "localCheckpoint is a cheaper way to cut lineage"):
        // the artifact is a session-lifetime TABLE, and a persisted
        // plan drags its full build lineage into every consumer — each
        // consumer re-analyzes the multi-thousand-node build tree
        // (q206: 3.8k plan lines) and every consumer STAGE ships the
        // build plan inside its task binary (the bench tail's recurring
        // "Broadcasting large task binary with size 2 MiB"; ~30-90 ms
        // of measured fixed CPU per task on 32-task artifact-scan
        // stages with KB-sized inputs). The checkpoint truncates the
        // plan to one LogicalRDD leaf — small analysis trees, small
        // task binaries — and skips the columnar encode/decode of
        // InMemoryRelation (measured: artifact first-pass ledger
        // 34.3 → 26.1 s, subset cold 59.8 → 47.3 s, warm −8%).
        // Statistics and output partitioning survive: LogicalRDD
        // .fromDataset propagates originStats/originConstraints, so
        // broadcast-join decisions on artifact consumers are unchanged.
        val t0 = System.nanoTime()
        val src = build
        // BUILD exactly as before r13 (persist + count: the cache build
        // preserves the plan's final partitioning and AQE-coalesces its
        // INTERMEDIATE stages), then checkpoint FROM the cache — one
        // cheap extra pass over MB-scale rows — and drop the columnar
        // copy. Two checkpoint-the-plan-directly variants were measured
        // WORSE before landing here: with AQE coalescing on, MB-scale
        // artifacts materialize at 1-5 partitions and every
        // artifact-over-artifact build's map side goes near-serial
        // (full-suite ledger 40 → 52 s: nb_scored 2.1→5.8,
        // ppjoin_verified 2.0→4.6, lsh_pairs 1.8→3.6); with coalescing
        // disabled for the build, long chains pay full-width
        // intermediate stages instead (NB-family cold A/B: 15.7 → 19.1 s
        // ledger). Cache-then-checkpoint keeps the measured build cost
        // AND the truncated consumer lineage; originStats come from the
        // cache's ACTUAL materialized size, the best estimate available.
        val cached = src.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        cached.count()
        val built = cached.localCheckpoint(true)
        cached.unpersist(blocking = false)
        val winner = cache.putIfAbsent((spark, key), built).getOrElse(built)
        if (winner eq built) {
          recordBuild(spark, key, (System.nanoTime() - t0) / 1e9)
          checkpointRdd(built).foreach { r =>
            blocks.put((spark, key), r)
            // Record the build plan's census facts before the lineage
            // is out of reach (PlanAudit scaladoc) — the executed plan
            // is final here, the checkpoint already ran it.
            graft.PlanAudit.registerArtifact(r.id, src.queryExecution.executedPlan)
          }
        }
        winner
    }
  }

  /** Session-keyed memo for an arbitrary trained-model value (codebooks,
    * LUT plans, driver-side state) — the [[getOrBuild]] pattern without
    * persist management: the builder owns any persistence of the
    * DataFrames it embeds. Same race contract: losers drop their build
    * without touching caches.
    *
    * BUILDER CONTRACT (required for the race to be leak-free): for a
    * given key, every invocation of the builder must produce DataFrames
    * whose logical plans CANONICALIZE EQUAL (deterministic build from the
    * same inputs). Spark's CacheManager registers persisted entries by
    * plan equality, so a race loser's persist() is then a no-op on the
    * winner's entry and dropping the loser leaks nothing. A builder with
    * nondeterministic plans (fresh random seeds, current-time literals)
    * would leak the loser's cached blocks for the session — don't memo
    * such builds. Every current builder (PQ codebooks, kNN graph,
    * simhash signatures) is plan-deterministic by construction. */
  private val values =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Any]

  def memo[T](spark: SparkSession, key: String)(build: => T): T = {
    values.keys.filter(_._1.sparkContext.isStopped).foreach(values.remove)
    values.get((spark, key)) match {
      case Some(v) => v.asInstanceOf[T]
      case None =>
        // Model builders run their own actions (k-means fits, codebook
        // training), so timing the closure captures the real cost.
        val t0 = System.nanoTime()
        val built = build
        val prior = values.putIfAbsent((spark, key), built)
        if (prior.isEmpty) recordBuild(spark, key, (System.nanoTime() - t0) / 1e9)
        prior.map(_.asInstanceOf[T]).getOrElse(built)
    }
  }

  /** Evict every entry belonging to `spark`, unpersisting cached tables —
    * the cold-measurement hook behind Bench's cold pass: with the cache
    * cleared before each query, a query pays the FULL build cost of the
    * artifacts it normally shares (signature tables, kNN graph, PQ model,
    * member catalog), so the amortization claim is measured rather than
    * asserted. Model [[memo]] entries are evicted without touching
    * storage: their builders own any embedded persists, which Spark's
    * CacheManager would hand straight back to a plan-equal rebuild — so a
    * truly cold measurement must pair this with
    * `spark.catalog.clearCache()` (Bench's cold pass does). */
  def clear(spark: SparkSession): Unit = {
    cache.keys.filter(_._1 eq spark).foreach { k =>
      cache.remove(k).foreach(_.unpersist(blocking = false))
      // Free the checkpoint blocks too (unpersist above is a no-op on
      // a localCheckpoint'd Dataset — see [[blocks]]), and drop the
      // census registration with them.
      blocks.remove(k).foreach { r =>
        try r.unpersist(blocking = false) catch { case _: Throwable => () }
        graft.PlanAudit.unregisterArtifact(r.id)
      }
    }
    values.keys.filter(_._1 eq spark).foreach(values.remove)
  }
}
