package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Versioned index publication — the rebuild-and-swap lifecycle every
  * FAISS-serving deployment runs (the reference rebuilds offline with
  * `create-index` and nodes load the artifact, vector_search_cluster.py
  * §3.2/§3.3): each publish writes a fresh `v_N` directory and then
  * flips a `_LATEST` pointer file, so readers always see a COMPLETE
  * version and rollback is one pointer write.
  *
  * Commit protocol (same discipline as the streaming ingest loops'
  * marker files): the version directory is fully written BEFORE the
  * pointer moves; the pointer itself is written to a temp name and
  * renamed over `_LATEST` — atomic on HDFS/local filesystems (on
  * rename-as-copy object stores, pair with a conditional-put pointer or
  * a manifest service; the directory-then-pointer ordering already
  * guarantees a reader never sees a partial index, only possibly a
  * stale pointer). Old versions stay on disk for rollback/time-travel
  * until [[prune]] drops them. */
object IndexVersions {

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Versions present under `dir` (sorted ascending; empty if none). */
  def versions(spark: SparkSession, dir: String): Seq[Long] = {
    val f = fs(spark, dir)
    val p = new Path(dir)
    if (!f.exists(p)) Nil
    else f.listStatus(p).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("v_") => n.drop(2).toLong }
      .sorted
  }

  /** The version `_LATEST` points at, if published. No pointer → None:
    * a version directory without a pointer (publish crashed between
    * directory write and pointer flip) is deliberately NOT served —
    * re-publishing simply claims the next version number. */
  def latest(spark: SparkSession, dir: String): Option[Long] = {
    val f = fs(spark, dir)
    val ptr = new Path(s"$dir/_LATEST")
    if (!f.exists(ptr)) None
    else {
      val in = f.open(ptr)
      try {
        val b = new Array[Byte](32)
        val n = in.read(b)
        Some(new String(b, 0, math.max(n, 0), "UTF-8").trim.toLong)
      } finally in.close()
    }
  }

  /** Publish the next version: `write` receives the fresh version
    * directory; the pointer flips only after it returns. Returns the
    * published version number. */
  def publish(spark: SparkSession, dir: String)(write: String => Unit): Long = {
    val next = versions(spark, dir).lastOption.getOrElse(0L) + 1L
    write(s"$dir/v_$next")
    setPointer(spark, dir, next)
    next
  }

  /** Point `_LATEST` at an existing version (rollback = point at an
    * older one). Temp-write + single-step OVERWRITING rename
    * (`FileContext` with `Options.Rename.OVERWRITE` — POSIX rename on
    * local, atomic overwrite on HDFS): there is no instant where the
    * pointer is absent. The previous delete-then-rename form had a
    * crash window in which a published index silently stopped being
    * served (ADVICE r7). */
  def setPointer(spark: SparkSession, dir: String, version: Long): Unit = {
    require(versions(spark, dir).contains(version),
      s"setPointer: version $version does not exist under $dir")
    val f = fs(spark, dir)
    val tmp = f.makeQualified(new Path(s"$dir/_LATEST.tmp"))
    val out = f.create(tmp, true)
    try out.write(version.toString.getBytes("UTF-8")) finally out.close()
    val ptr = f.makeQualified(new Path(s"$dir/_LATEST"))
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      ptr.toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, ptr, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** The directory to read — the pointed-at version. */
  def latestPath(spark: SparkSession, dir: String): Option[String] =
    latest(spark, dir).map(v => s"$dir/v_$v")

  /** Drop versions older than the newest `keep` (never the pointed-at
    * one, even if old). */
  def prune(spark: SparkSession, dir: String, keep: Int): Seq[Long] = {
    val f = fs(spark, dir)
    val all = versions(spark, dir)
    val pinned = latest(spark, dir)
    val drop = all.dropRight(keep).filterNot(pinned.contains)
    drop.foreach(v => f.delete(new Path(s"$dir/v_$v"), true))
    drop
  }
}
