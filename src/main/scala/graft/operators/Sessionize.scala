package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gaps-and-islands sessionization: rows of one key belong to the same
  * session while consecutive timestamps are within `gapSeconds`.
  *
  * One shuffle on the key + a sort within partitions; the session index
  * is a running sum over boundary markers — no self-join, no explosion.
  * Timestamps compare in integer MICROSECONDS (`unix_micros`) so the
  * result is exact and engine-portable (no float epoch).
  *
  * Determinism: ordering is (time, tiebreak) with `tiebreak` unique per
  * key, so equal-time rows sessionize identically on every run/engine.
  */
object Sessionize {
  def apply(
      df: DataFrame,
      key: String,
      time: String,
      tiebreak: String,
      gapSeconds: Long,
      sessionCol: String = "session_idx"): DataFrame = {

    val w = Window.partitionBy(key).orderBy(col(time).asc, col(tiebreak).asc)
    val prev = lag(unix_micros(col(time)), 1).over(w)
    val newSession: Column =
      when(prev.isNull || unix_micros(col(time)) - prev > gapSeconds * 1000000L, 1).otherwise(0)
    df.withColumn(sessionCol,
      sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }
}
