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
    GraftExtensions.functions.foreach { case (name, cls, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(cls, name),
        builder))
    }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.expressions.Cast
  import org.apache.spark.sql.types._

  /** Int parameters (signature widths, shingle sizes) arrive from SQL
    * as integer literals — anything else is a config error worth
    * failing loudly at plan time. */
  private def intLit(e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => sys.error(s"expected an integer literal, got $other")
  }

  // the kernel expressions can't declare inputTypes (ExpectsInputTypes
  // is private[sql]), so the SQL builders coerce here: without the
  // cast, an array<int> column reaches SortedIntersectCount's
  // getLong over 4-byte-packed elements — silently wrong counts, not
  // an analysis error
  private def str(e: Expression): Expression = Cast(e, StringType)
  private def longArr(e: Expression): Expression = Cast(e, ArrayType(LongType))
  private def dblArr(e: Expression): Expression = Cast(e, ArrayType(DoubleType))
  private def strArr(e: Expression): Expression = Cast(e, ArrayType(StringType))

  val functions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_alphanum", classOf[AlphanumScramble].getName,
      (children: Seq[Expression]) =>
        AlphanumScramble(str(children(0)), str(children(1)))),
    // FPE mode (value, pepper) — injective per (length, alphabet)
    // class, reference parity (see AlphanumFpe's contract)
    ("graft_alphanum_unique", classOf[graft.functions.AlphanumFpe].getName,
      (children: Seq[Expression]) =>
        graft.functions.AlphanumFpe(str(children(0)), str(children(1)))),
    // |A ∩ B| of two SORTED distinct long arrays (the Jaccard verify kernel)
    ("graft_sorted_intersect", classOf[graft.functions.SortedIntersectCount].getName,
      (children: Seq[Expression]) =>
        graft.functions.SortedIntersectCount(longArr(children(0)), longArr(children(1)))),
    // max-abs int8 quantization of a double array
    ("graft_int8_quantize", classOf[graft.functions.Int8Quantize].getName,
      (children: Seq[Expression]) =>
        graft.functions.Int8Quantize(dblArr(children(0)))),
    // (words, bits, chunkHexChars) -> simhash signature
    ("graft_simhash", classOf[graft.functions.SimHash].getName,
      (children: Seq[Expression]) =>
        graft.functions.SimHash(strArr(children(0)),
          intLit(children(1)), intLit(children(2)))),
    // (words, k, hexChars) -> sorted distinct k-shingle hash set
    ("graft_shingle_set", classOf[graft.functions.ShingleHashSet].getName,
      (children: Seq[Expression]) =>
        graft.functions.ShingleHashSet(strArr(children(0)),
          intLit(children(1)), intLit(children(2)))))

  /** Register all graft SQL functions on a live session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      ColumnBridge.registerFunction(spark, name, builder)
    }
}
