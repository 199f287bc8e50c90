package graft

import org.apache.spark.sql.functions._

import graft.queries.Similarity

/** Teeth for the PQ reconstruction-error audit beyond the full oracle:
  * structural shape (one row per subspace, every sub-vector scored),
  * internal consistency, and the semantic floor — the deployed
  * codebook must beat the zero-vector codebook (distortion strictly
  * below raw sub-vector energy), else the quantizer learned nothing.
  */
class PqDistortionSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("s_pq_distortion: 8 subspaces, full coverage, beats the zero codebook") {
    val got = Similarity.queries("s_pq_distortion")(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSeq == (0 until 8), "one row per subspace")
    val ns = got.map(_._2).distinct
    assert(ns.length == 1, s"unequal subspace coverage $ns")
    val emb = Tables.load(spark, dir, "embeddings").count()
    assert(ns.head == emb, "every vector scored in every subspace")
    for ((m, n, sum, mean) <- got) {
      assert(sum >= 0 && mean >= 0)
      assert(mean == sum / n, s"m=$m mean inconsistent")
    }
    // zero-codebook bar: raw per-(vec, subspace) energy floor(1e6*sum x^2),
    // averaged — the deployed quantizer must sit strictly below it
    val e = Tables.load(spark, dir, "embeddings")
    val energies = (0 until 8).map { m =>
      val terms = (1 to 8).map(i =>
        expr(s"element_at(embedding, ${m * 8 + i}) * element_at(embedding, ${m * 8 + i})"))
      e.select(floor(terms.reduceLeft(_ + _) * lit(1000000.0)).cast("long").as("en"))
        .agg(avg("en")).collect()(0).getDouble(0)
    }
    for ((m, _, _, mean) <- got)
      assert(mean < energies(m), s"m=$m distortion $mean >= energy ${energies(m)}")
  }
}
