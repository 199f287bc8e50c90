package graft.sources

import org.apache.spark.sql.SparkSession

/** Crash-safe replacement of standing-artifact directories. Spark's
  * `mode("overwrite")` DELETES the target before writing, so a job
  * killed mid-write loses the live artifact with no copy left. Here the
  * replacement relations land under `path/.stage` first, then swap into
  * place with CHECKED renames (HDFS-style filesystems return false
  * instead of throwing), parking the previous live copy at
  * `path/.old-<dir>` until its replacement is in — at every point at
  * least one complete copy exists. A crash between the two renames
  * leaves the previous copy parked; recover by renaming it back or
  * re-running the write. */
private[sources] object StagedWrite {

  /** @param writeTo writes each relation under the given stage root
    *   (same directory names as `dirs`). */
  def swapIn(s: SparkSession, path: String, dirs: Seq[String])
      (writeTo: String => Unit): Unit = {
    import org.apache.hadoop.fs.Path
    val stage = s"$path/.stage"
    writeTo(stage)
    // everything staged is fully materialized; now swap
    val fs = new Path(path).getFileSystem(s.sparkContext.hadoopConfiguration)
    def move(from: Path, to: Path): Unit =
      require(fs.rename(from, to),
        s"staged swap: rename $from -> $to failed; live data is intact, " +
          "re-run after clearing the target")
    dirs.foreach { d =>
      val live = new Path(s"$path/$d")
      val old = new Path(s"$path/.old-$d")
      fs.delete(old, true)
      if (fs.exists(live)) move(live, old)
      move(new Path(s"$stage/$d"), live)
      fs.delete(old, true)
    }
    fs.delete(new Path(stage), true)
  }
}
