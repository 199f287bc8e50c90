package graft

import org.apache.spark.sql.functions._

/** Pins the round-14 native MaxSim scorer to the Column tree it
  * replaced: graft.functions.MaxSimMicro must produce BIT-IDENTICAL
  * longs to the unrolled element_at/greatest/floor tree (which is also
  * the shape of the DuckDB oracle's sqlMaxSim string) on random
  * vectors, including negative components and exact ties. */
class MaxSimExprSpec extends SparkSpec {

  private val M = 8
  private val Sub = 8

  /** The pre-round-14 Column tree, verbatim. */
  private def treeMaxSim(qv: org.apache.spark.sql.Column,
      dv: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    def tokDot(t: Int, u: Int) =
      (1 to Sub).map(i =>
        element_at(qv, (t - 1) * Sub + i) * element_at(dv, (u - 1) * Sub + i))
        .reduceLeft(_ + _)
    (1 to M).map { t =>
      floor(greatest((1 to M).map(u => tokDot(t, u)): _*)
        * lit(1000000.0)).cast("long")
    }.reduceLeft(_ + _)
  }

  private def exprMaxSim(qv: org.apache.spark.sql.Column,
      dv: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.MaxSimMicro(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(qv),
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(dv),
        M, Sub))

  test("native MaxSimMicro == element_at/greatest/floor tree, bit-exact") {
    val rnd = new scala.util.Random(14)
    val rows = (1 to 400).map { _ =>
      val a = Array.fill(64)(rnd.nextDouble() * 2 - 1)
      val b =
        if (rnd.nextInt(4) == 0) a.clone() // exact self-pair: tie-heavy max
        else Array.fill(64)(rnd.nextDouble() * 2 - 1)
      (a, b)
    }
    import spark.implicits._
    val df = rows.toDF("a", "b")
      .select(treeMaxSim(col("a"), col("b")).as("tree"),
        exprMaxSim(col("a"), col("b")).as("native"))
    assert(df.filter(col("tree") =!= col("native")).count() === 0L)
    // and not degenerate: scores vary
    assert(df.select(countDistinct(col("native"))).head().getLong(0) > 100L)
  }

  test("short input nulls like the element_at tree") {
    import spark.implicits._
    val df = Seq((Array.fill(8)(0.5), Array.fill(64)(0.5)))
      .toDF("a", "b")
      .select(exprMaxSim(col("a"), col("b")).as("native"))
    assert(df.head().isNullAt(0))
  }
}
