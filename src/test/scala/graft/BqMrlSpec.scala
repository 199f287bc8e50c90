package graft

/** s_bq_topk / s_mrl_topk teeth independent of the SQL oracle: each
  * two-stage pipeline (coarse prune → exact rescore) must equal a
  * naive in-JVM reference running the SAME trajectory on the real
  * sf0.001 corpus — sign-bit packing and hamming for BQ, prefix-dim
  * cosine for MRL, identical (rank, vec_id) tie-breaks, left-to-right
  * IEEE dot chains. Also pins that the coarse stage actually PRUNES
  * (candidate set is RescoreC of N-1, not all pairs) and that the
  * recall evals count exactly |bf ∩ ann| per query.
  */
class BqMrlSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val C = 50 // RescoreC
  private val K = 5
  private val NQ = 5

  // left-to-right sums match VecOps' unrolled IEEE chains
  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.indices.map(i => a(i) * b(i)).reduceLeft(_ + _)
  private def prefDot(a: Array[Double], b: Array[Double], d: Int): Double =
    (0 until d).map(i => a(i) * b(i)).reduceLeft(_ + _)

  private lazy val vs: Map[Long, Array[Double]] =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
      .as[(Long, Array[Double])].collect().toMap
  private lazy val norm: Map[Long, Double] =
    vs.view.mapValues(v => math.sqrt(dot(v, v))).toMap

  private def cos(a: Long, b: Long): Double =
    dot(vs(a), vs(b)) / (norm(a) * norm(b))

  /** rescore candidates and rank exactly like Similarity.topk */
  private def finalTopk(cands: Map[Long, Seq[Long]]): Set[(Long, Long, Double, Int)] =
    cands.toSeq.flatMap { case (q, cand) =>
      cand.map(c => (c, cos(q, c)))
        .sortBy { case (c, s) => (-s, c) }.take(K).zipWithIndex
        .map { case ((c, s), i) => (q, c, s, i + 1) }
    }.toSet

  test("s_bq_topk == naive sign-bit hamming prune + exact rescore") {
    def sig(v: Array[Double]): (Long, Long) = {
      def half(lo: Int): Long =
        (0 until 32).map(i => if (v(lo + i) > 0) 1L << i else 0L).sum
      (half(0), half(32))
    }
    val sigs = vs.view.mapValues(sig).toMap
    def ham(a: Long, b: Long): Int = {
      val (a1, a2) = sigs(a); val (b1, b2) = sigs(b)
      java.lang.Long.bitCount(a1 ^ b1) + java.lang.Long.bitCount(a2 ^ b2)
    }
    val cands = (0L until NQ.toLong).map { q =>
      q -> vs.keys.filter(_ != q).toSeq
        .map(c => (c, ham(q, c))).sortBy { case (c, h) => (h, c) }
        .take(C).map(_._1)
    }.toMap
    // the coarse stage prunes: C of N-1 survive, never the full corpus
    assert(vs.size - 1 > C && cands.values.forall(_.size == C))

    val got = graft.queries.Similarity.queries("s_bq_topk")(spark, dir)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(got == finalTopk(cands),
      s"diff=${(got diff finalTopk(cands)).take(3)}")
  }

  test("s_mrl_topk == naive prefix-dim coarse + full-dim rescore") {
    val d = 16 // MrlDim
    val pn = vs.view.mapValues(v => math.sqrt(prefDot(v, v, d))).toMap
    def pcos(a: Long, b: Long): Double =
      prefDot(vs(a), vs(b), d) / (pn(a) * pn(b))
    val cands = (0L until NQ.toLong).map { q =>
      q -> vs.keys.filter(_ != q).toSeq
        .map(c => (c, pcos(q, c))).sortBy { case (c, s) => (-s, c) }
        .take(C).map(_._1)
    }.toMap

    val got = graft.queries.Similarity.queries("s_mrl_topk")(spark, dir)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(got == finalTopk(cands),
      s"diff=${(got diff finalTopk(cands)).take(3)}")
  }

  test("sig packing: distributed bqSig == plain-Scala over random vectors") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(42)
    val vecs = (0 until 300).map(i =>
      (i.toLong, Array.fill(64)(rnd.nextDouble() * 2 - 1)))
    def half(v: Array[Double], lo: Int): Long =
      (0 until 32).map(j => if (v(lo + j) > 0) 1L << j else 0L).sum
    val expected = vecs.map { case (id, v) => (id, half(v, 0), half(v, 32)) }.toSet

    val df = vecs.toDF("vec_id", "v")
    val got = df.select(col("vec_id"),
        graft.queries.Similarity.bqSig(col("v"), 0).as("s1"),
        graft.queries.Similarity.bqSig(col("v"), 32).as("s2"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expected, s"diff=${(got diff expected).take(3)}")
    // signatures are nonneg 32-bit halves by construction — the
    // signed-shift/overflow edge the two-half packing exists to avoid
    assert(got.forall(t => t._2 >= 0 && t._2 < (1L << 32)
      && t._3 >= 0 && t._3 < (1L << 32)))
  }

  test("recall evals count exactly |bf ∩ ann| per query") {
    val bf = (0L until NQ.toLong).map { q =>
      q -> vs.keys.filter(_ != q).toSeq
        .map(c => (c, cos(q, c))).sortBy { case (c, s) => (-s, c) }
        .take(K).map(_._1).toSet
    }.toMap
    for (name <- Seq("s_bq", "s_mrl")) {
      val ann = graft.queries.Similarity.queries(s"${name}_topk")(spark, dir)
        .select("q", "vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val recall = graft.queries.Similarity.queries(s"${name}_recall")(spark, dir)
        .as[(Long, Int, Double)].collect()
      assert(recall.length == NQ)
      recall.foreach { case (q, hits, r) =>
        val expect = (bf(q) intersect ann(q)).size
        assert(hits == expect && r == expect / K.toDouble,
          s"$name q=$q hits=$hits expect=$expect")
      }
    }
  }
}
