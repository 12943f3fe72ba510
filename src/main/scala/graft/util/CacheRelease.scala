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

  /** Return `result`; when the first query whose analyzed plan contains
    * `result` (or any of `caches`) as a subtree completes, unpersist
    * every cache and unregister. Canonicalized comparison keeps the
    * match exprId-insensitive; any plan-inspection surprise fails OPEN
    * (release early — a recompute, never a storage leak). */
  def releaseAfterFirstAction(result: DataFrame,
                              caches: Seq[DataFrame]): DataFrame = {
    val lm = result.sparkSession.listenerManager
    val watched = (result +: caches).map(_.queryExecution.analyzed.canonicalized)
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      private val once = new java.util.concurrent.atomic.AtomicBoolean(false)
      private def touchesResult(
          qe: org.apache.spark.sql.execution.QueryExecution): Boolean =
        try qe.analyzed.exists(n => watched.exists(_ == n.canonicalized))
        catch { case scala.util.control.NonFatal(_) => true }
      private def release(): Unit = if (once.compareAndSet(false, true)) {
        caches.foreach(_.unpersist())
        lm.unregister(this)
      }
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = if (touchesResult(qe)) release()
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = if (touchesResult(qe)) release()
    }
    lm.register(listener)
    result
  }
}
