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

  // Thread-scoped: a query's operator persists and its owner's releaseAll
  // happen on the same driver thread. A JVM-global queue would let
  // concurrent owners (parallel test suites, a future multi-tenant
  // service) unpersist each other's in-flight intermediates — harmless
  // for correctness (recompute) but a silent perf cliff.
  private val live = new ThreadLocal[java.util.ArrayDeque[DataFrame]] {
    override def initialValue() = new java.util.ArrayDeque[DataFrame]()
  }

  /** Persist `df` and register it for this thread's next [[releaseAll]]. */
  def persist(df: DataFrame): DataFrame = {
    df.persist()
    live.get.add(df)
    df
  }

  /** Track an already-materialized cached Dataset (e.g. a localCheckpoint)
    * for this thread's next [[releaseAll]] without re-persisting it. */
  def track(df: DataFrame): DataFrame = {
    live.get.add(df)
    df
  }

  /** Unpersist (non-blocking) everything this thread registered since its
    * last call. */
  def releaseAll(): Unit = {
    val q = live.get
    var df = q.poll()
    while (df != null) {
      try df.unpersist(blocking = false)
      catch { case _: Throwable => () } // session may already be stopped
      df = q.poll()
    }
  }
}
