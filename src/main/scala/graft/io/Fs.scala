package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Driver-side filesystem ops through the Hadoop FileSystem API, so the
  * maintenance paths (snapshot state versions, recent-store retention,
  * day compaction, streaming index existence) work identically on
  * file://, hdfs:// and s3a:// — a `java.io.File` would silently target
  * the driver's local disk on a real cluster. All calls are
  * catalog-scale (a handful of directories), never data-scale. */
object Fs {

  def fs(s: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(s.sparkContext.hadoopConfiguration)

  def exists(s: SparkSession, path: String): Boolean =
    fs(s, path).exists(new Path(path))

  /** Names of child DIRECTORIES of `path` (empty if missing). */
  def listDirNames(s: SparkSession, path: String): Seq[String] = {
    val f = fs(s, path); val p = new Path(path)
    if (!f.exists(p)) Nil
    else f.listStatus(p).toSeq.filter(_.isDirectory).map(_.getPath.getName)
  }

  /** Total length of files under `path` whose name passes `keep`. */
  def totalBytes(s: SparkSession, path: String,
                 keep: String => Boolean): Long = {
    val f = fs(s, path)
    val it = f.listFiles(new Path(path), true)
    var sum = 0L
    while (it.hasNext) {
      val st = it.next()
      if (keep(st.getPath.getName)) sum += st.getLen
    }
    sum
  }

  /** Recursive delete (no-op when missing). */
  def delete(s: SparkSession, path: String): Unit = {
    val f = fs(s, path); val p = new Path(path)
    if (f.exists(p)) { f.delete(p, true); () }
  }

  /** Atomic-on-same-fs rename; fails loudly rather than half-moving. */
  def rename(s: SparkSession, from: String, to: String): Unit = {
    require(fs(s, from).rename(new Path(from), new Path(to)),
      s"rename $from -> $to failed")
  }

  /** Crash-recoverable publish of a fully-written `staging` directory
    * onto `path` — the reference's tmp→bak→move protocol
    * (reference app/utils.py:494-508). The live copy is RENAMED aside
    * (never unlinked) before the staging dir takes its place, so every
    * failure point leaves a complete copy on disk:
    *
    *   1. `path` → `path_bak`   (live data now at the bak name)
    *   2. `staging` → `path`    (new data live)
    *   3. delete `path_bak`
    *
    * A crash between 1 and 2 leaves `path` missing but both `_bak` and
    * the staging dir intact — [[recoverPublished]] (or the next publish,
    * which re-stages from scratch) restores service; nothing is lost.
    * Readers can observe a missing `path` only inside the 1→2 rename
    * pair — on HDFS/local two metadata ops; on object stores where
    * rename is copy+delete the window is wider, which is inherent to the
    * store, not this protocol. A stale bak from a previous crash is
    * cleared first so step 1 cannot fail on an existing destination.
    *
    * The bak is a SIBLING named `_bak_<leaf>`: the leading underscore
    * keeps it invisible to Spark's partition/file discovery, so
    * publishing a partition dir inside a live table root never makes a
    * phantom partition appear mid-swap. */
  def publish(s: SparkSession, staging: String, path: String): Unit = {
    val bak = bakPath(path)
    delete(s, bak)
    if (exists(s, path)) rename(s, path, bak)
    rename(s, staging, path)
    delete(s, bak)
  }

  private def bakPath(path: String): String = {
    val p = new Path(path)
    new Path(p.getParent, "_bak_" + p.getName).toString
  }

  /** Recovery for a crash inside [[publish]]: if `path` is missing but
    * its bak survives, move the bak back into place. Returns true if
    * a restore happened. Call on startup before serving reads. */
  def recoverPublished(s: SparkSession, path: String): Boolean = {
    val bak = bakPath(path)
    if (!exists(s, path) && exists(s, bak)) { rename(s, bak, path); true }
    else false
  }
}
