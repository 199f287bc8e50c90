package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import org.apache.spark.sql.graftbridge.ColumnBridge
import graft.functions.SortedIntersectCount

class SortedIntersectCountSpec extends SparkSpec {
  import spark.implicits._

  private def inter(pairs: Seq[(Seq[Long], Seq[Long])]): Seq[Int] =
    pairs.toDF("a", "b")
      .select(ColumnBridge.column(SortedIntersectCount(
        ColumnBridge.expression(col("a")), ColumnBridge.expression(col("b")))))
      .as[Int].collect().toSeq

  test("matches set intersection on 200 random sorted distinct arrays") {
    val rnd = new Random(42)
    def arr() = Seq.fill(rnd.nextInt(40))(rnd.nextLong(50L)).distinct.sorted
    val pairs = Seq.fill(200)((arr(), arr()))
    val got = inter(pairs)
    pairs.zip(got).foreach { case ((a, b), n) =>
      assert(n == a.toSet.intersect(b.toSet).size, s"a=$a b=$b")
    }
  }

  test("edges: empty, disjoint, identical") {
    assert(inter(Seq((Nil, Seq(1L, 2L)))) == Seq(0))
    assert(inter(Seq((Seq(1L, 3L), Seq(2L, 4L)))) == Seq(0))
    assert(inter(Seq((Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)))) == Seq(3))
  }
}
