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
  def apply(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      time: String,
      rightVals: Seq[String],
      tiebreak: String,
      outPrefix: String = "prior_"): DataFrame = {

    val l = left.withColumn("__side", lit(0))
    val r = right.select(
      (keys.map(col) :+ col(time)) ++ (rightVals :+ tiebreak).distinct.map(c => col(c).as(s"__r_$c")): _*)
      .withColumn("__side", lit(1))

    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(time).asc, col("__side").asc, col(s"__r_$tiebreak").asc)
      .rowsBetween(Window.unboundedPreceding, -1)

    val withPrior = rightVals.foldLeft(unioned) { (df, v) =>
      df.withColumn(outPrefix + v, last(col(s"__r_$v"), ignoreNulls = true).over(w))
    }
    withPrior.filter(col("__side") === 0)
      .drop("__side")
      .drop((rightVals :+ tiebreak).distinct.map("__r_" + _): _*)
  }
}
