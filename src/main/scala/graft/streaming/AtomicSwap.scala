package graft.streaming

import java.io.File

import org.apache.spark.sql.DataFrame

/** Crash-safe table swap for foreachBatch materializations (shared by
  * ChangelogStream and GraphStream).
  *
  * Protocol: write `path.tmp-B`, rename `path` → `path.old-B`, rename tmp →
  * `path`, delete old. Every rename result is checked. The crash window
  * between the two renames is closed by `recover`, which callers run before
  * reading: if the table is missing but a backup exists, the backup is
  * rolled back; stale tmp/old directories from interrupted batches are
  * swept. Re-running a batch after recovery is idempotent (same batchId,
  * deterministic result). */
object AtomicSwap {

  /** Roll back an interrupted swap and sweep leftovers; call before reading
    * `path`. Returns true if the table exists after recovery. */
  def recover(path: String): Boolean = {
    val target = new File(path)
    val dir = Option(target.getParentFile).getOrElse(new File("."))
    val name = target.getName
    val leftovers = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith(s"$name.old-") || f.getName.startsWith(s"$name.tmp-"))
    if (!target.exists()) {
      // crashed between the two renames: restore the newest backup
      // newest backup by NUMERIC batch id — a lexicographic name sort would
      // order "old-9" after "old-10" and restore the wrong generation
      leftovers.filter(_.getName.startsWith(s"$name.old-"))
        .sortBy(f => f.getName.stripPrefix(s"$name.old-").toLongOption.getOrElse(-1L))
        .lastOption.foreach { backup =>
          if (!backup.renameTo(target))
            throw new java.io.IOException(s"recovery rename failed: $backup -> $target")
        }
    }
    // sweep whatever remains (stale tmps, superseded backups)
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith(s"$name.old-") || f.getName.startsWith(s"$name.tmp-"))
      .foreach(deleteRecursively)
    target.exists()
  }

  /** Write `df` as the new content of `path` with checked renames. */
  def swap(df: DataFrame, path: String, batchId: Long): Unit = {
    val tmp = s"$path.tmp-$batchId"
    df.write.mode("overwrite").parquet(tmp)
    swapDir(tmp, path, batchId)
  }

  /** Swap an ALREADY-WRITTEN directory into place as the new content of
    * `path` — the rename half of [[swap]], for callers that stage many
    * tables in one partitioned write (BucketedStore). `src` must be on the
    * same filesystem as `path`. */
  def swapDir(src: String, path: String, batchId: Long): Unit = {
    val target = new File(path)
    val old = new File(s"$path.old-$batchId")
    if (target.exists() && !target.renameTo(old))
      throw new java.io.IOException(s"swap rename failed: $target -> $old")
    if (!new File(src).renameTo(target)) {
      // restore the backup before failing so readers still see the old table
      if (old.exists()) old.renameTo(target)
      throw new java.io.IOException(s"swap rename failed: $src -> $target")
    }
    deleteRecursively(old)
  }

  private[streaming] def deleteRecursively(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete()
    ()
  }
}
