package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Pins the two release paths of [[graft.util.CacheRelease]] — the
  * machinery behind every lazily-returned result built on persisted
  * intermediates (dedupCorpus, pplBuckets, forecast trends, sampling):
  * (1) the listener path: the caller's FIRST action over the result
  * unpersists the interior caches; (2) the TTL fallback: a caller that
  * builds the plan but NEVER runs an action cannot pin executor
  * storage for the session — the reaper force-releases after the TTL
  * (the round-12 advice's abandoned-plan hole). */
class CacheReleaseSpec extends SparkSpec {
  import spark.implicits._

  private def eventually(timeoutMs: Long)(cond: => Boolean): Boolean = {
    val t0 = System.currentTimeMillis()
    while (!cond && System.currentTimeMillis() - t0 < timeoutMs)
      Thread.sleep(50)
    cond
  }

  test("listener path: the first action over the result releases the" +
    " interior cache") {
    val base = (1 to 100).toDF("x")
      .persist(StorageLevel.MEMORY_AND_DISK)
    base.count() // materialize the cache
    assert(base.storageLevel != StorageLevel.NONE)
    val result = graft.util.CacheRelease.releaseAfterFirstAction(
      base.select((col("x") * 2).as("y")), Seq(base), ttlSeconds = 3600L)
    assert(result.count() == 100L)
    // listener fires asynchronously after the action completes
    assert(eventually(10000L)(base.storageLevel == StorageLevel.NONE),
      "cache still pinned after the first action")
  }

  test("TTL fallback: a plan that is built but NEVER executed still" +
    " releases its caches after the TTL (no session-lifetime pin)") {
    val base = (1 to 100).toDF("x")
      .persist(StorageLevel.MEMORY_AND_DISK)
    base.count()
    assert(base.storageLevel != StorageLevel.NONE)
    val result = graft.util.CacheRelease.releaseAfterFirstAction(
      base.select((col("x") * 2).as("y")), Seq(base), ttlSeconds = 1L)
    // deliberately NO action on `result` — the abandoned-plan case
    assert(eventually(15000L)(base.storageLevel == StorageLevel.NONE),
      "abandoned plan pinned the cache past the TTL")
    // the result still computes correctly after the early release
    // (fail-open contract: recompute, never break)
    assert(result.count() == 100L)
  }

  test("release is idempotent: TTL firing after the listener already" +
    " released is a no-op, and unrelated actions don't trigger it") {
    val base = (1 to 50).toDF("x").persist(StorageLevel.MEMORY_AND_DISK)
    base.count()
    val result = graft.util.CacheRelease.releaseAfterFirstAction(
      base.select(col("x")), Seq(base), ttlSeconds = 2L)
    // an UNRELATED action must not release the cache
    (1 to 10).toDF("z").count()
    assert(base.storageLevel != StorageLevel.NONE,
      "unrelated action released the cache")
    assert(result.count() == 50L)
    assert(eventually(10000L)(base.storageLevel == StorageLevel.NONE))
    Thread.sleep(2500L) // let the TTL fire post-release: must not throw
    assert(result.count() == 50L)
  }
}
