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
        // racing threads and only store one — the loser's persist would
        // leak cached blocks for the session lifetime. Build, race via
        // putIfAbsent, unpersist the loser.
        val built = build.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        cache.putIfAbsent((spark, key), built) match {
          case Some(winner) => built.unpersist(blocking = false); winner
          case None => built
        }
    }
  }
}
