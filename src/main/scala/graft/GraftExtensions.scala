package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.functions.AlphanumScramble

/** Spark extension point: `--conf spark.sql.extensions=graft.GraftExtensions`
  * makes graft's custom Catalyst expressions available to pure-SQL users
  * (`SELECT graft_alphanum(col, 'pepper') ...`). For an already-running
  * session use [[GraftExtensions.register]]. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[AlphanumScramble].getName, name),
        builder))
    }
}

object GraftExtensions {
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_alphanum" -> (children => AlphanumScramble(children(0), children(1))))

  /** Register all graft SQL functions on a live session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      ColumnBridge.registerFunction(spark, name, builder)
    }
}
