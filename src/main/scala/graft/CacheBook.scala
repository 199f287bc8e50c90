package graft

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lifecycle registry for memoized/persisted relations.
  *
  * Several query families memoize expensive relations per (session,
  * corpus) — the dedup shingle/pair/label stack, the shared customer
  * slice, the similarity bucketed table. Memoization is what makes a
  * family of related queries pay the build once, but a cache with no
  * release is an executor-memory leak across corpora in a long-lived
  * session (and in the bench itself, which runs every query in one JVM:
  * the block store only grows through the run, and the pressure taxes
  * every later query).
  *
  * Every site that persists or checkpoints a long-lived relation
  * registers a release thunk here under a SCOPE (the query-family
  * prefix: "d", "s", "slice", "x"). [[Bench]] releases each scope as
  * soon as its last consumer family has run; any caller can
  * [[releaseAll]] between corpora. Thunks both unpersist the blocks AND
  * evict the owning memo-map entry, so a later call rebuilds from
  * source instead of recomputing through a dead checkpoint (an
  * unpersisted localCheckpoint has no lineage to recompute from —
  * a stale handle would fail, not just slow down).
  */
object CacheBook {
  private val book =
    mutable.Map.empty[(SparkSession, String), mutable.ListBuffer[() => Unit]]

  /** Register a release thunk for `scope` on `s`. The thunk must be
    * idempotent (release may race a session-wide releaseAll). */
  def register(s: SparkSession, scope: String)(thunk: () => Unit): Unit =
    synchronized {
      book.getOrElseUpdate((s, scope), mutable.ListBuffer.empty) += thunk
    }

  /** Run and drop every thunk registered for (session, scope). */
  def release(s: SparkSession, scope: String): Unit = {
    val thunks = synchronized { book.remove((s, scope)).map(_.toList).getOrElse(Nil) }
    thunks.foreach(t => try t() catch { case _: Throwable => () })
  }

  /** Release every scope registered on the session. */
  def releaseAll(s: SparkSession): Unit = {
    val scopes = synchronized { book.keys.filter(_._1 eq s).map(_._2).toList }
    scopes.foreach(release(s, _))
  }

  /** Scopes currently holding registered caches for the session. */
  def liveScopes(s: SparkSession): Seq[String] =
    synchronized { book.keys.filter(_._1 eq s).map(_._2).toList.sorted }

  /** Free the block-store data behind an EAGER `localCheckpoint(true)`
    * frame: the checkpointed RDD hides under the plan's LogicalRDD
    * leaves (plain `unpersist()` on the Dataset does nothing — the
    * cache manager never saw it). Safe on non-checkpoint plans (no
    * LogicalRDD leaf, no-op). */
  def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
      case _ => ()
    }
}
