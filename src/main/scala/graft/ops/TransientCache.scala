package graft.ops

import org.apache.spark.sql.DataFrame

/** Registry for operator-internal persists with a caller-owned release
  * point.
  *
  * Operators like MinHash-LSH and SimHash banding persist an intermediate
  * (signatures, shingle rows) that feeds several join sides of the plan
  * they return. The operator cannot unpersist it — the caller has not
  * materialized the plan yet — and a bare `.persist()` leaks cached
  * blocks for the session lifetime when operators run repeatedly (bench +
  * verify in one JVM). So: operators register here, and whoever owns the
  * query lifecycle (Verify/Bench after each query, a service after each
  * request) calls [[releaseAll]] once the result is materialized.
  *
  * Deliberately NOT the member catalog's session cache (MemberCatalog) —
  * that one is session-lifetime by design.
  */
object TransientCache {

  private val live = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Persist `df` and register it for the next [[releaseAll]]. */
  def persist(df: DataFrame): DataFrame = {
    df.persist()
    live.add(df)
    df
  }

  /** Unpersist (non-blocking) everything registered since the last call. */
  def releaseAll(): Unit = {
    var df = live.poll()
    while (df != null) {
      try df.unpersist(blocking = false)
      catch { case _: Throwable => () } // session may already be stopped
      df = live.poll()
    }
  }
}
