package graft

import java.security.MessageDigest

/** st_ann_ingest teeth: the stateless literal-array probe (the
  * executor-shipped centroid snapshot) plus stream-static cell join
  * must equal a naive in-JVM standing-index probe of the delta — same
  * old-seeded centroid draw, same (cos desc, cid asc) probe ranking,
  * same micro-unit radius — on the real sf0.001 corpus.
  */
class AnnIngestSpec extends SparkSpec {
  import spark.implicits._

  private def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.indices.map(i => a(i) * b(i)).reduceLeft(_ + _)

  test("streamed probe == naive standing-index probe of the delta") {
    val dir = "/root/testdata/sf0.001"
    val vs = spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
      .as[(Long, Array[Double])].collect().toMap
    val norm = vs.view.mapValues(v => math.sqrt(dot(v, v))).toMap
    def cos(a: Long, b: Long): Double = dot(vs(a), vs(b)) / (norm(a) * norm(b))

    val tNew = vs.keys.max * 4 / 5
    val cents = vs.keys.filter(_ < tNew).toSeq
      .sortBy(id => (md5Hex(id.toString), id)).take(24)
    def probe(id: Long, k: Int): Seq[Long] =
      cents.map(c => (c, cos(id, c))).sortBy { case (c, s) => (-s, c) }
        .take(k).map(_._1)
    val cellOf = vs.keys.filter(_ < tNew).map(id => id -> probe(id, 1).head).toMap

    val expected = (for {
      q <- vs.keys.filter(_ >= tNew).toSeq
      cell <- probe(q, 2)
      old <- cellOf.collect { case (id, c) if c == cell => id }
      if math.floor(cos(q, old) * 1000000.0).toLong >= 300000L
    } yield (q, old, cos(q, old))).toSet

    val got = graft.queries.StreamingQueries.queries("st_ann_ingest")(spark, dir)
      .as[(Long, Long, Double)].collect().toSet
    assert(got.nonEmpty, "delta must produce matches at gate scale")
    assert(got == expected, s"diff=${(got diff expected).take(3)} / " +
      s"${(expected diff got).take(3)}")
  }
}
