package graft

import graft.queries.Similarity
import org.apache.spark.sql.functions._

/** Teeth for s_silhouette beyond the full oracle: a whole-trajectory
  * naive replay — the md5-ordered K(N) centroid draw, the argmax-cosine
  * assignment with cid tie-break, and the per-point (b−a)/b score with
  * the SAME left-to-right IEEE dot chain — must reproduce every
  * per-cell mean/min exactly, and the cells must conserve the corpus.
  * A tie-break slip or a drifted float chain dies here, not in a hash
  * mismatch nobody can localize.
  */
class SilhouetteSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.indices.map(i => a(i) * b(i)).reduceLeft(_ + _)

  test("s_silhouette equals a naive whole-trajectory replay and conserves") {
    val vs = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val norm = vs.view.mapValues(v => math.sqrt(dot(v, v))).toMap
    def cos(v: Long, c: Long): Double = dot(vs(v), vs(c)) / (norm(v) * norm(c))

    val k = Similarity.kFor(vs.size.toLong)
    val cents = vs.keys.toSeq
      .sortBy(id => (md5Hex(id.toString), id)).take(k)
    val naive = vs.keys.toSeq.map { id =>
      val own = cents.map(c => (-cos(id, c), c)).min._2
      val a = 1.0 - cos(id, own)
      val b = 1.0 - cents.filter(_ != own).map(c => cos(id, c)).max
      val sPpm = if (b <= 0.0) 0L
        else math.floor(1000000.0 * (b - a) / b).toLong
      (own, sPpm)
    }
    val expect = naive.groupBy(_._1).map { case (cid, g) =>
      val ss = g.map(_._2)
      cid -> (ss.length.toLong, ss.map(BigInt(_)).sum / ss.length, ss.min)
    }

    val got = Similarity.queries("s_silhouette")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), BigInt(r.getLong(2)), r.getLong(3)))
      .toMap
    assert(got.keySet == expect.keySet, "cell sets differ")
    assert(got.values.map(_._1).sum == vs.size, "points not conserved")
    for ((cid, e) <- expect)
      assert(got(cid) == e, s"cell $cid: ${got(cid)} vs $e")
    // scores live in [0, 1e6): a forced a <= b makes negatives impossible
    assert(got.values.forall { case (_, mean, mn) =>
      mn >= 0L && mean >= 0 && mean < 1000000 })
  }

  test("s_dunn equals a naive replay over the same draw and assignment") {
    val vs = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val norm = vs.view.mapValues(v => math.sqrt(dot(v, v))).toMap
    def cos(v: Long, c: Long): Double = dot(vs(v), vs(c)) / (norm(v) * norm(c))

    val k = Similarity.kFor(vs.size.toLong)
    val cents = vs.keys.toSeq
      .sortBy(id => (md5Hex(id.toString), id)).take(k)
    val sep = (for (a <- cents; b <- cents if a < b)
      yield math.floor((1.0 - cos(a, b)) * 1000000.0).toLong).min
    val diam = vs.keys.map { id =>
      val own = cents.map(c => (-cos(id, c), c)).min._2
      math.floor((1.0 - cos(id, own)) * 2000000.0).toLong
    }.max
    val got = Similarity.queries("s_dunn")(spark, dir).collect()(0)
    assert(got.getLong(0) == sep, s"sep ${got.getLong(0)} vs $sep")
    assert(got.getLong(1) == diam, s"diam ${got.getLong(1)} vs $diam")
    assert(got.getLong(2) == 1000000L * sep / diam)
  }
}
