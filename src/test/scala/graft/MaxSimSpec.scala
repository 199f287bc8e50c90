package graft

import org.apache.spark.sql.functions._

import graft.queries.Similarity

/** s_maxsim teeth independent of the SQL oracle.
  *
  * 1. Trajectory equivalence on the real sf0.001 corpus: the engine's
  *    result must equal a naive in-JVM replication of the SAME pipeline
  *    — md5-ordered centroid draw, argmax-cosine assignment, NProbe
  *    probes, then per-candidate MaxSim (sum over query tokens of the
  *    max sub-dot against doc tokens, floored to micro-units) with
  *    (ms desc, vec_id asc) ranking. Any drift in the slice offsets,
  *    the greatest() selection, or the integer flooring shows here.
  * 2. The late-interaction property itself, at the scorer level: a doc
  *    whose token slices are a PERMUTATION of the query's scores
  *    exactly the query's self-score (each query facet finds its match
  *    in a different doc region), while its full-vector cosine is far
  *    below 1 — the multi-facet relevance single-vector cosine cannot
  *    express.
  */
class MaxSimSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val K = 5
  private val NQ = 5
  private val NProbe = 2
  // derive K through the engine's own formula so the naive reference
  // cannot desync from the trajectory under test (K is data-derived
  // since round 13: kFor(N) for the vec index, kFor(8N) for tokens)
  private def kOf(n: Long) = graft.queries.Similarity.kFor(n)
  private val M = 8 // tokens per vector
  private val S = 8 // dims per token

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.indices.map(i => a(i) * b(i)).reduceLeft(_ + _)

  private def tokDot(q: Array[Double], d: Array[Double], t: Int, u: Int): Double =
    (0 until S).map(i => q(t * S + i) * d(u * S + i)).reduceLeft(_ + _)

  private def maxSim(q: Array[Double], d: Array[Double]): Long =
    (0 until M).map { t =>
      math.floor((0 until M).map(u => tokDot(q, d, t, u)).max * 1000000.0).toLong
    }.sum

  test("s_maxsim == naive probe-bounded MaxSim rerank on the real corpus") {
    val vs = spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
      .as[(Long, Array[Double])].collect().toMap
    val norm = vs.view.mapValues(v => math.sqrt(dot(v, v))).toMap
    def cos(a: Long, b: Long): Double = dot(vs(a), vs(b)) / (norm(a) * norm(b))

    // md5-ordered fixed centroid draw, then argmax-cos assignment
    val cents = vs.keys.toSeq.sortBy(id => (md5Hex(id.toString), id)).take(kOf(vs.size))
    def nearestCells(id: Long, n: Int): Seq[Long] =
      cents.map(c => (c, cos(id, c))).sortBy { case (c, s) => (-s, c) }
        .take(n).map(_._1)
    val cellOf: Map[Long, Long] = vs.keys.map(id => id -> nearestCells(id, 1).head).toMap

    val expected = (0L until NQ).flatMap { q =>
      val probed = nearestCells(q, NProbe).toSet
      val cand = vs.keys.filter(id => id != q && probed(cellOf(id)))
      cand.map(id => (id, maxSim(vs(q), vs(id)))).toSeq
        .sortBy { case (id, ms) => (-ms, id) }.take(K).zipWithIndex
        .map { case ((id, ms), i) => (q, id, ms, i + 1) }
    }.toSet

    val got = Similarity.queries("s_maxsim")(spark, dir)
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(got == expected)
  }

  test("s_maxsim_tok == naive per-token retrieval + MaxSim rerank") {
    val vs = spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
      .as[(Long, Array[Double])].collect().toMap
    def tok(v: Array[Double], t: Int): Array[Double] =
      v.slice(t * S, t * S + S)
    def dot8(a: Array[Double], b: Array[Double]): Double =
      (0 until S).map(i => a(i) * b(i)).reduceLeft(_ + _)

    // md5-rank token-centroid draw over (vec_id, t) keys
    val tokKeys = for (id <- vs.keys.toSeq; t <- 0 until M) yield (id, t)
    val cents: Seq[(Int, Array[Double])] = tokKeys
      .sortBy { case (id, t) => (md5Hex(s"$id#${t + 1}"), id, t) }
      .take(kOf(M.toLong * vs.size)).zipWithIndex
      .map { case ((id, t), i) => (i + 1, tok(vs(id), t)) }
    def bestCells(tv: Array[Double], n: Int): Seq[Int] =
      cents.map { case (cid, cv) => (cid, dot8(tv, cv)) }
        .sortBy { case (cid, s) => (-s, cid) }.take(n).map(_._1)

    val cellOfTok: Map[(Long, Int), Int] =
      tokKeys.map { case (id, t) => (id, t) -> bestCells(tok(vs(id), t), 1).head }.toMap
    // probe count grows as ceil(NProbe·sqrt(K/24)) with the derived
    // token K (the engine's nProbeTok sqrt rule)
    val np = math.max(NProbe, math.ceil(
      NProbe * math.sqrt(kOf(M.toLong * vs.size).toDouble / 24)).toInt)
    val expected = (0L until NQ).flatMap { q =>
      val probed = (0 until M).flatMap(t => bestCells(tok(vs(q), t), np)).toSet
      val cand = vs.keys.filter(id => id != q &&
        (0 until M).exists(t => probed(cellOfTok((id, t)))))
      cand.map(id => (id, maxSim(vs(q), vs(id)))).toSeq
        .sortBy { case (id, ms) => (-ms, id) }.take(K).zipWithIndex
        .map { case ((id, ms), i) => (q, id, ms, i + 1) }
    }.toSet

    val got = Similarity.queries("s_maxsim_tok")(spark, dir)
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(got == expected)
  }

  test("permuted-slice doc scores the query's self-score; cosine does not") {
    // query = 8 distinct one-hot-ish token slices; doc = the same slices
    // rotated one token position. Every query token still finds its
    // exact match somewhere in the doc, so MaxSim(q, d) == MaxSim(q, q);
    // the aligned dot (what cosine sees) collapses to ~0.
    val q = Array.tabulate(64) { i => if (i % S == i / S % S) 1.0 else 0.0 }
    val d = Array.tabulate(64) { i =>
      val t = i / S; val src = (t + 1) % M; q(src * S + (i % S))
    }
    val df = Seq((q, d)).toDF("qv", "dv")
    val Array(selfMs, permMs, alignedDot) = df.select(
      Similarity.maxSimMicro(col("qv"), col("qv")),
      Similarity.maxSimMicro(col("qv"), col("dv")),
      round(lit(dot(q, d)), 9)).as[(Long, Long, Double)].collect()
      .flatMap(t => Array(t._1.toDouble, t._2.toDouble, t._3))
    assert(selfMs == permMs, s"self=$selfMs perm=$permMs")
    assert(selfMs == M * 1000000L) // 8 unit slices, exact micro floor
    assert(alignedDot == 0.0)
  }

  test("per-token retrieval closes the single-vector first-stage blind spot") {
    // against the multi-vector ground truth, the cosine-cell first
    // stage misses most of the true MaxSim top-k (its candidates rank
    // by aligned cosine — the signal a multi-facet match lacks), while
    // per-token retrieval recovers all of it on the gate corpus
    def hits(name: String): Int =
      Similarity.queries(name)(spark, dir)
        .as[(Long, Int, Double)].collect().map(_._2).sum
    val rerank = hits("s_maxsim_recall")
    val tok = hits("s_maxsim_tok_recall")
    assert(tok == NQ * 5, s"tok=$tok") // full recall, NQueries x K
    assert(tok > rerank, s"tok=$tok rerank=$rerank")
  }
}
