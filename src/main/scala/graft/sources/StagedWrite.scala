package graft.sources

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.SparkSession

/** Crash-safe, OBJECT-STORE-SAFE replacement of standing-artifact
  * directories via a generation layout + manifest pointers.
  *
  * Spark's `mode("overwrite")` DELETES the target before writing, so a
  * job killed mid-write loses the live artifact with no copy left. The
  * previous fix (stage dir + directory rename swap) assumed RENAME IS
  * ATOMIC — true on HDFS/POSIX, false on S3-class object stores, where
  * "rename" is a per-object copy+delete and a reader can observe a
  * half-moved directory. Here nothing that is live is ever moved:
  *
  *  1. each write lands COMPLETE under a fresh `path/gen-<n>/` dir;
  *  2. the commit is ONE small pointer file PER RELATION,
  *     `path/CURRENT-<dir>`, whose content is the generation holding
  *     that relation's live copy — written to the side and renamed
  *     over the old pointer (single-file rename: atomic on HDFS/POSIX;
  *     a single-object server-side copy on S3A, so readers see the old
  *     pointer or the new one, never a partial artifact). Relations
  *     committed together move pointer-by-pointer; a reader racing the
  *     commit can briefly pair a new relation with an old sibling —
  *     the same window the rename swap had, now bounded by two tiny
  *     file ops instead of directory moves;
  *  3. readers [[resolve]] a relation's pointer to its live dir;
  *  4. the superseded generation is kept as GRACE for in-flight
  *     readers (a query planned against it still scans its files after
  *     the swap); it is retired on the group's next commit. A
  *     generation holding relations outside the committing group is
  *     never touched (one store path can host several relation groups,
  *     e.g. the LSH index's shingles+bands and its labels).
  *
  * A crash before the pointer commit leaves a partial `gen-<n>` dir
  * that a later attempt deletes and rewrites; the live generation is
  * never touched. SINGLE-WRITER contract: one maintenance job
  * (write/append/compact) at a time per store — concurrent writers
  * would race the pointers (last commit wins, the other's generation
  * is silently superseded).
  *
  * Reads fall back to `path/<dir>` when no pointer exists, so a plain
  * flat directory (pre-pointer layout, or hand-laid test fixtures)
  * stays readable. */
private[graft] object StagedWrite {

  private def fsOf(s: SparkSession, path: String) =
    new Path(path).getFileSystem(s.sparkContext.hadoopConfiguration)

  /** The directory holding relation `dir`'s live copy: `path/<gen>`
    * per the CURRENT-<dir> pointer, or `path` itself for a
    * flat/pointer-less layout. */
  def resolve(s: SparkSession, path: String, dir: String): String =
    pointer(s, path, dir).map(g => s"$path/$g").getOrElse(path)

  private def pointer(s: SparkSession, path: String, dir: String): Option[String] = {
    val fs = fsOf(s, path)
    val cur = new Path(s"$path/CURRENT-$dir")
    if (!fs.exists(cur)) None
    else {
      val in = fs.open(cur)
      val content =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      require(content.startsWith("gen-")
          && content.stripPrefix("gen-").toIntOption.nonEmpty,
        s"corrupt pointer $cur: '$content'")
      Some(content)
    }
  }

  /** @param writeTo writes each relation under the given generation
    *   root (same directory names as `dirs`); the generation goes live
    *   only when every dir exists and the pointers commit. */
  def swapIn(s: SparkSession, path: String, dirs: Seq[String])
      (writeTo: String => Unit): Unit = {
    val fs = fsOf(s, path)
    fs.mkdirs(new Path(path))
    def genDirs() = fs.listStatus(new Path(path)).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("gen-"))
      .flatMap(st => st.getPath.getName.stripPrefix("gen-").toIntOption
        .map(st.getPath -> _))
    val previous = dirs.flatMap(d => pointer(s, path, d)).distinct
    val next = (genDirs().map(_._2) ++
      previous.map(_.stripPrefix("gen-").toInt) :+ 0).max + 1
    val stage = s"$path/gen-$next"
    // a previous attempt that crashed before its pointer commit left a
    // partial dir here — it was never live, so rewrite it
    fs.delete(new Path(stage), true)
    writeTo(stage)
    dirs.foreach(d => require(fs.exists(new Path(s"$stage/$d")),
      s"staged swap: $stage/$d missing after write; pointers NOT moved"))
    // the commit: write each relation's pointer beside, rename over
    // CURRENT-<dir> in one single-file operation each
    val fc = FileContext.getFileContext(new Path(path).toUri,
      s.sparkContext.hadoopConfiguration)
    dirs.foreach { d =>
      val tmp = new Path(s"$path/.CURRENT-$d.tmp")
      val out = fs.create(tmp, true)
      try out.write(s"gen-$next".getBytes("UTF-8")) finally out.close()
      fc.rename(tmp, new Path(s"$path/CURRENT-$d"), Options.Rename.OVERWRITE)
    }
    // retire this group's older generations: a gen dir goes when it
    // holds ONLY this group's relations and is neither the new live
    // copy nor the just-superseded grace copy. Generations hosting
    // other groups' relations are their business, not ours.
    genDirs().foreach { case (p, k) =>
      val name = s"gen-$k"
      val contents = fs.listStatus(p).map(_.getPath.getName).toSet
      if (k != next && !previous.contains(name)
          && contents.subsetOf(dirs.toSet))
        fs.delete(p, true)
    }
    // a flat pre-pointer layout is this group's GRACE copy on its
    // first generational commit (an in-flight reader resolved it a
    // moment ago); like a gen dir, it is retired on the group's NEXT
    // commit
    if (previous.nonEmpty)
      dirs.foreach(d => fs.delete(new Path(s"$path/$d"), true))
  }
}
