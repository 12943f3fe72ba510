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

  /** Names of child FILES of `path` (empty if missing). */
  def listFileNames(s: SparkSession, path: String): Seq[String] = {
    val f = fs(s, path); val p = new Path(path)
    if (!f.exists(p)) Nil
    else f.listStatus(p).toSeq.filter(_.isFile).map(_.getPath.getName)
  }

  /** Create an empty marker file (atomic create; parents made as
    * needed). Overwrites nothing: creating an already-present marker
    * is a no-op. */
  def touch(s: SparkSession, path: String): Unit = {
    val f = fs(s, path); val p = new Path(path)
    if (!f.exists(p)) { f.create(p, false).close() }
  }

  /** Write `bytes` as a single file at `path` (overwrites; parents made
    * as needed). Driver-side, for small state blobs — never data. */
  def writeBytes(s: SparkSession, path: String, bytes: Array[Byte]): Unit = {
    val out = fs(s, path).create(new Path(path), true)
    try out.write(bytes) finally out.close()
  }

  /** Read a whole file as bytes. */
  def readBytes(s: SparkSession, path: String): Array[Byte] = {
    val f = fs(s, path); val p = new Path(path)
    val len = f.getFileStatus(p).getLen.toInt
    val buf = new Array[Byte](len)
    val in = f.open(p)
    try in.readFully(0L, buf) finally in.close()
    buf
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
    * The bak is a SIBLING named `_bak_<leaf>` with any `=` in the leaf
    * escaped to `%3D`: discovery's hidden-path filter skips `_`-prefixed
    * names ONLY when they contain no `=` (a raw `_bak_day=1` would be
    * inferred as a conflicting partition column and fail every
    * concurrent read of the table root), so the escape is what actually
    * keeps a mid-swap bak invisible when publishing a partition dir
    * inside a live lake. */
  def publish(s: SparkSession, staging: String, path: String): Unit = {
    val bak = bakPath(path)
    delete(s, bak)
    if (exists(s, path)) rename(s, path, bak)
    rename(s, staging, path)
    delete(s, bak)
  }

  private def bakPath(path: String): String = {
    val p = new Path(path)
    new Path(p.getParent, "_bak_" + encodeLeaf(p.getName)).toString
  }

  // '=' must not appear in a bak name (see publish); %3D matches how
  // Spark itself escapes '=' inside partition VALUES
  private def encodeLeaf(name: String): String = name.replace("=", "%3D")
  private def decodeLeaf(name: String): String = name.replace("%3D", "=")

  /** Recovery for a crash inside [[publish]]: if `path` is missing but
    * its bak survives, move the bak back into place. Returns true if
    * a restore happened. Call on startup before serving reads. */
  def recoverPublished(s: SparkSession, path: String): Boolean = {
    val bak = bakPath(path)
    if (!exists(s, path) && exists(s, bak)) { rename(s, bak, path); true }
    else false
  }

  /** Recovery sweep over a whole directory tree — for publish targets
    * that generic readers reach without a single entry point, like the
    * day partitions [[graft.io.Lake.compactDay]] republishes inside a
    * lake root (a snapshot or IVF index heals in its reader; a lake is
    * read by plain `spark.read.parquet(root)`, which cannot). Walks
    * the tree's DIRECTORIES (catalog-scale: partition dirs, not data
    * files) and for every `_bak_<leaf>`:
    *   - main sibling missing → crash between publish's two renames:
    *     rename the bak back into place (the restored paths are
    *     returned);
    *   - main sibling present → crash between rename 2 and the bak
    *     delete: the bak is stale, delete it.
    * Run at startup or before maintenance; idempotent either way. */
  def recoverTree(s: SparkSession, root: String): Seq[String] = {
    val restored = Seq.newBuilder[String]
    def sweep(dir: String): Unit = {
      val names = listDirNames(s, dir)
      val (baks, plain) = names.partition(_.startsWith("_bak_"))
      baks.foreach { b =>
        val main = s"$dir/${decodeLeaf(b.stripPrefix("_bak_"))}"
        if (!exists(s, main)) { rename(s, s"$dir/$b", main); restored += main }
        else delete(s, s"$dir/$b")
      }
      // recurse into live dirs (incl. just-restored ones — a nested
      // crash artifact under a restored partition is still healed)
      (plain ++ baks.map(b => decodeLeaf(b.stripPrefix("_bak_")))).distinct
        .foreach(n => sweep(s"$dir/$n"))
    }
    if (exists(s, root)) sweep(root)
    restored.result()
  }
}
