package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the latest right row with
  * `right.time < left.time` (strictly prior) on the same key.
  *
  * Spark-first design: instead of a range join (which Catalyst would plan
  * as a broadcast-nested-loop or an exploding theta join), we UNION the
  * two sides and take a running `last(_, ignoreNulls)` window per key —
  * one shuffle on the key, linear work per partition, no pair explosion.
  * At 100 TB this is the only shape that survives: cost is a single
  * sort-within-partition of |L|+|R|, independent of match fan-out.
  *
  * Determinism: rows are ordered by (time, side, tiebreak) — right rows
  * sort AFTER left rows at equal time (strict inequality), and
  * `tiebreak` (a unique right-side column) resolves equal-time right
  * rows so "latest" is total, not planner-dependent.
  */
object AsOfJoin {
  /** @param toleranceSeconds if set, a match is dropped (null) when the
    *   prior right row is older than the tolerance window — standard
    *   as-of-join tolerance semantics. */
  def apply(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      time: String,
      rightVals: Seq[String],
      tiebreak: String,
      outPrefix: String = "prior_",
      toleranceSeconds: Option[Long] = None): DataFrame = {

    val l = left.withColumn("__side", lit(0))
    val r = right.select(
      (keys.map(col) :+ col(time)) ++ (rightVals :+ tiebreak :+ time).distinct
        .map(c => col(c).as(s"__r_$c")): _*)
      .withColumn("__side", lit(1))

    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(time).asc, col("__side").asc, col(s"__r_$tiebreak").asc)
      .rowsBetween(Window.unboundedPreceding, -1)

    val withPrior0 = rightVals.foldLeft(unioned) { (df, v) =>
      df.withColumn(outPrefix + v, last(col(s"__r_$v"), ignoreNulls = true).over(w))
    }
    val withPrior = toleranceSeconds match {
      case None => withPrior0
      case Some(tol) =>
        // the prior row's own time bounds the lookback window
        val priorTime = last(col(s"__r_$time"), ignoreNulls = true).over(w)
        val inWindow =
          unix_micros(col(time)) - unix_micros(priorTime) <= tol * 1000000L
        rightVals.foldLeft(withPrior0) { (df, v) =>
          df.withColumn(outPrefix + v, when(inWindow, col(outPrefix + v)))
        }
    }
    withPrior.filter(col("__side") === 0)
      .drop("__side")
      .drop((rightVals :+ tiebreak :+ time).distinct.map("__r_" + _): _*)
  }
}
