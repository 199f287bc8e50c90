package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.functions.{Determinism, ShingleHashSet}

class ShingleHashSetSpec extends SparkSpec {
  import spark.implicits._

  // the Column formula the expression replaces (Dedup.shingleSets shape)
  private def columnFormula(words: org.apache.spark.sql.Column) = {
    val sh = array_distinct(transform(
      sequence(lit(0), greatest(size(words) - 3, lit(0))),
      i => concat_ws(" ", slice(words, i + 1, lit(3)))))
    sort_array(array_distinct(transform(sh, x => Determinism.md5IdxK(x, 12))))
  }

  private def exprVersion(words: org.apache.spark.sql.Column) =
    ColumnBridge.column(ShingleHashSet(ColumnBridge.expression(words), 3, 12))

  test("matches the transform+md5IdxK Column formula exactly") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b",                       // fewer words than k
      "one",                       // single word
      "",                          // empty text -> one empty shingle
      "dup dup dup dup dup",       // repeated shingles collapse
      "Unicode café naïve résumé words here",
      (1 to 40).map(i => s"w$i").mkString(" "))
    val df = texts.toDF("text").select(split(col("text"), " ").as("w"))
    val rows = df.select(
      columnFormula(col("w")).as("a"), exprVersion(col("w")).as("b"))
      .as[(Seq[Long], Seq[Long])].collect()
    rows.zip(texts).foreach { case ((a, b), t) =>
      assert(a == b, s"mismatch for: '$t'")
    }
  }

  test("agrees with jvmMd5Idx on a known shingle") {
    val df = Seq("alpha beta gamma").toDF("text")
      .select(exprVersion(split(col("text"), " ")).as("h"))
    val got = df.as[Seq[Long]].collect().head
    assert(got.contains(Determinism.jvmMd5Idx("alpha beta gamma", 12)))
  }
}
