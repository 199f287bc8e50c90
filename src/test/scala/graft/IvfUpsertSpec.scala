package graft

import org.apache.spark.sql.functions._

/** s_ivf_upsert teeth: the production invariant that nightly upserts
  * never drift from a rebuild. Per-vector assignment is independent, so
  * (standing old assignment) ∪ (delta assigned against the SAME
  * standing centroids) must equal assigning the full corpus from
  * scratch against those centroids — row for row, cells included. Also
  * pins that the delta is non-empty and that the standing centroid draw
  * really excludes new vectors.
  */
class IvfUpsertSpec extends SparkSpec {
  import spark.implicits._

  test("upsert assignment == from-scratch rebuild on the same centroids") {
    val dir = "/root/testdata/sf0.001"
    val S = graft.queries.Similarity
    val e = S.vecs(spark, dir)
    val tNew = e.agg(max("vec_id")).head().getLong(0) * 4 / 5
    val seed = e.filter(col("vec_id") < tNew)
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(24)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("n").as("cn"))

    val merged = S.upsertAssign(e, seed, tNew)
      .select("vec_id", "cid").as[(Long, Long)].collect().toSet
    val rebuild = S.assignTo(e, seed)
      .select("vec_id", "cid").as[(Long, Long)].collect().toSet
    assert(merged == rebuild, s"diff=${(merged diff rebuild).take(5)}")

    // the delta exists and the standing draw predates it
    val nNew = e.filter(col("vec_id") >= tNew).count()
    assert(nNew > 0 && merged.size > nNew)
    val cids = seed.select("cid").as[Long].collect()
    assert(cids.forall(_ < tNew))
  }

  test("probe sweep: recall monotone non-decreasing in nprobe") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.queries.Similarity.queries("s_probe_sweep")(spark, dir)
      .as[(Int, Long, Int, Double)].collect()
    assert(rows.length == 20) // 4 sweep points x 5 queries
    rows.groupBy(_._2).foreach { case (q, rs) =>
      val byProbe = rs.sortBy(_._1).map(_._3)
      assert(byProbe.zip(byProbe.tail).forall { case (a, b) => a <= b },
        s"q=$q hits not monotone: ${byProbe.toSeq}")
    }
    // teeth: the sweep must show a real trade somewhere (nprobe=1
    // strictly worse than nprobe=4 for at least one query)
    assert(rows.filter(_._1 == 1).map(_._3).sum <
      rows.filter(_._1 == 4).map(_._3).sum)
  }
}
