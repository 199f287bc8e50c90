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
  /** Int parameters (signature widths, shingle sizes) arrive from SQL
    * as integer literals — anything else is a config error worth
    * failing loudly at plan time. */
  private def intLit(e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => sys.error(s"expected an integer literal, got $other")
  }

  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_alphanum" -> (children => AlphanumScramble(children(0), children(1))),
    // collision-free FPE mode (value, pepper)
    "graft_alphanum_unique" -> (children =>
      graft.functions.AlphanumFpe(children(0), children(1))),
    // |A ∩ B| of two sorted distinct arrays (the Jaccard verify kernel)
    "graft_sorted_intersect" -> (children =>
      graft.functions.SortedIntersectCount(children(0), children(1))),
    // max-abs int8 quantization of a double array
    "graft_int8_quantize" -> (children =>
      graft.functions.Int8Quantize(children(0))),
    // (words, bits, chunkHexChars) -> simhash signature
    "graft_simhash" -> (children =>
      graft.functions.SimHash(children(0), intLit(children(1)), intLit(children(2)))),
    // (words, k, hexChars) -> sorted distinct k-shingle hash set
    "graft_shingle_set" -> (children =>
      graft.functions.ShingleHashSet(children(0), intLit(children(1)), intLit(children(2)))))

  /** Register all graft SQL functions on a live session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      ColumnBridge.registerFunction(spark, name, builder)
    }
}
