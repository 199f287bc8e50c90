package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bridge into `private[sql]` session cloning and plan re-binding.
  *
  * Bounded streaming runs need per-QUERY SQL conf (state-store width,
  * maintenance interval, no-data-batch policy). Mutating the shared
  * session's conf with save/restore is RACY under concurrent query
  * submission (graft.Verify dumps queries on a 4-thread pool — a
  * no-data-batch=false scope leaking into a concurrent left-join start
  * would swallow its watermark-flush emission). Instead each bounded
  * stream starts from a throwaway CLONE carrying its conf: the shared
  * session is never touched, and the clone is dropped with the query. */
object SessionBridge {

  /** Copy of `s` (same SparkContext/shared state, snapshot of the
    * session conf + temp catalog) whose conf can be freely mutated. */
  def cloneSession(s: SparkSession): SparkSession =
    s.asInstanceOf[org.apache.spark.sql.classic.SparkSession].cloneSession()

  /** `df`'s logical plan re-bound to session `ss` — execution (and a
    * streaming start) then reads ITS conf, not the building session's. */
  def withSession(ss: SparkSession, df: DataFrame): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      ss.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      df.queryExecution.logical)
}
