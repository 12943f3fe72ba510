package graft.util

import org.apache.spark.sql.DataFrame

/** Listener-based cache release for lazily-returned results built on
  * persisted intermediates (extracted from TextDedup's round-7 clusters
  * fix): the caches live until the CALLER's first action over the
  * result, then unpersist — so a multi-action interior (an iterative
  * op, a pipeline stage that runs several jobs) reads cached
  * intermediates instead of re-evaluating the upstream lineage per
  * action, without the operator leaking storage after the caller is
  * done. */
object CacheRelease {

  /** One shared daemon timer backing the TTL fallback below — a single
    * thread for the whole JVM, never blocks shutdown. */
  private lazy val reaper =
    java.util.concurrent.Executors.newSingleThreadScheduledExecutor(
      (r: Runnable) => {
        val t = new Thread(r, "graft-cache-release")
        t.setDaemon(true)
        t
      })

  /** Return `result`; when the first query whose analyzed plan contains
    * `result` (or any of `caches`) as a subtree completes, unpersist
    * every cache and unregister. Canonicalized comparison keeps the
    * match exprId-insensitive; any plan-inspection surprise fails OPEN
    * (release early — a recompute, never a storage leak).
    *
    * TTL fallback: a caller that builds the plan but never runs an
    * action would otherwise pin the caches (and this listener) for the
    * session's life — so after `ttlSeconds` without a matching action
    * the caches force-release (idempotent with the listener path).
    * Fails open like everything here: a caller that waits longer than
    * the TTL before its first action recomputes lazily, it never
    * breaks. */
  def releaseAfterFirstAction(result: DataFrame,
                              caches: Seq[DataFrame],
                              ttlSeconds: Long = 600L): DataFrame = {
    val lm = result.sparkSession.listenerManager
    val watched = (result +: caches).map(_.queryExecution.analyzed.canonicalized)
    val once = new java.util.concurrent.atomic.AtomicBoolean(false)
    lazy val listener: org.apache.spark.sql.util.QueryExecutionListener =
      new org.apache.spark.sql.util.QueryExecutionListener {
        private def touchesResult(
            qe: org.apache.spark.sql.execution.QueryExecution): Boolean =
          try qe.analyzed.exists(n => watched.exists(_ == n.canonicalized))
          catch { case scala.util.control.NonFatal(_) => true }
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit = if (touchesResult(qe)) release()
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = if (touchesResult(qe)) release()
      }
    def release(): Unit = if (once.compareAndSet(false, true)) {
      caches.foreach(_.unpersist())
      lm.unregister(listener)
    }
    lm.register(listener)
    reaper.schedule(new Runnable { def run(): Unit = release() },
      ttlSeconds, java.util.concurrent.TimeUnit.SECONDS)
    result
  }
}
