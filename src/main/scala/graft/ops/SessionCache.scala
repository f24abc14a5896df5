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

  def getOrBuild(spark: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    cache.keys.filter(_._1.sparkContext.isStopped).foreach(cache.remove)
    cache.get((spark, key)) match {
      case Some(df) => df
      case None =>
        // Not getOrElseUpdate: TrieMap may evaluate the builder in two
        // racing threads and only store one. The loser must NOT
        // unpersist its build: Spark's CacheManager registers cache
        // entries by logical-plan equality, so unpersisting the loser's
        // (identical) plan would evict the WINNER's entry and the
        // "cached" table would silently recompute forever after. The
        // loser's persist was a no-op on the already-cached plan, so
        // dropping the reference leaks nothing.
        val built = build.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        cache.putIfAbsent((spark, key), built).getOrElse(built)
    }
  }

  /** Session-keyed memo for an arbitrary trained-model value (codebooks,
    * LUT plans, driver-side state) — the [[getOrBuild]] pattern without
    * persist management: the builder owns any persistence of the
    * DataFrames it embeds. Same race contract: losers drop their build
    * without touching caches. */
  private val values =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Any]

  def memo[T](spark: SparkSession, key: String)(build: => T): T = {
    values.keys.filter(_._1.sparkContext.isStopped).foreach(values.remove)
    values.get((spark, key)) match {
      case Some(v) => v.asInstanceOf[T]
      case None =>
        val built = build
        values.putIfAbsent((spark, key), built)
          .map(_.asInstanceOf[T]).getOrElse(built)
    }
  }
}
