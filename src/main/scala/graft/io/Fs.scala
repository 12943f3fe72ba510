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
}
