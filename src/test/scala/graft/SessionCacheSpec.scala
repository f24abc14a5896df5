package graft

import graft.ops.SessionCache
import org.scalatest.funsuite.AnyFunSuite

/** Contract tests for the session-lifetime cache: build-once sharing,
  * the clear() cold-measurement hook, and memo's single-build race
  * semantics.
  *
  * Runs against a PRIVATE `newSession()` (SessionCache keys by session
  * instance): sbt runs suites in parallel in one JVM, and a clear() of
  * the shared test session would evict other suites' live artifacts
  * mid-flight — in particular it would flip CodegenCensusSpec's pinned
  * warm-state plans to their cold shapes. The toy range(5) plans here
  * collide with nobody through the plan-equality CacheManager either. */
class SessionCacheSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark.newSession()

  test("getOrBuild builds once, shares, and rebuilds after clear") {
    var builds = 0
    def build() = { builds += 1; spark.range(5).toDF("n") }
    val key = "sessioncachespec:gob"
    val a = SessionCache.getOrBuild(spark, key)(build())
    val b = SessionCache.getOrBuild(spark, key)(build())
    assert(builds == 1, "second access must reuse the cached table")
    assert(a.collect().length == 5 && (a eq b))
    SessionCache.clear(spark)
    val c = SessionCache.getOrBuild(spark, key)(build())
    assert(builds == 2, "clear() must force a rebuild")
    assert(c.collect().length == 5)
    SessionCache.clear(spark)
  }

  test("memo builds once and survives value reads; clear evicts") {
    var builds = 0
    val key = "sessioncachespec:memo"
    def v() = SessionCache.memo(spark, key) { builds += 1; 42 }
    assert(v() == 42 && v() == 42 && builds == 1)
    SessionCache.clear(spark)
    assert(v() == 42 && builds == 2, "clear() must evict memo values")
    SessionCache.clear(spark)
  }
}
