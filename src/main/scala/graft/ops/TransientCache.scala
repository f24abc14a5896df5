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

  /** [[persist]] + EAGER materialization (r12 optimization). A lazy
    * persist is populated by whichever consumer stage runs first — but
    * Spark submits independent stages (and broadcast-exchange builds)
    * CONCURRENTLY, and concurrent consumers of a not-yet-cached plan
    * each recompute the full upstream chain before any of them fills
    * the cache. For an intermediate with several independent consumer
    * branches (q258's prefix-sum table: day-close, peaks and the final
    * join; q230's audit base: two rank legs + the row count) the chain
    * ran 3-4× — visible as duplicated shuffle-read stages and a
    * cpu_ms/wall ratio far above the plan's real work. The count()
    * here pins the cache exactly once, inside the owning query's timed
    * region, before the fan-out. MEASURED TRADE-OFF (r12): flipping
    * every persist to eager made the 10-query probe 57% SLOWER
    * (21.5 s → 33.7 s) — the count() barrier also destroys the
    * cross-subtree stage overlap the scheduler exploits — so this is
    * strictly a targeted tool for sites where duplicated upstream
    * compute is measured to dominate, never a default. */
  def materialize(df: DataFrame): DataFrame = {
    val p = persist(df)
    p.count()
    p
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
