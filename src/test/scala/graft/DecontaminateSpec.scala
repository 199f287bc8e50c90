package graft

import org.apache.spark.sql.functions._

/** d_decontaminate teeth beyond the SQL oracle: (1) the bench-pool
  * restricted pipeline must equal the full near-dup pair relation
  * filtered to bench-pool endpoints at the 0.5 leak bar (same band
  * table, same verify — the restriction is a pruning, not a different
  * detector); (2) the fuzzy gate's reason to exist — a paraphrased
  * benchmark leak that shares only a minority of exact 5-gram windows
  * still trips the shingle-Jaccard bar.
  */
class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  test("d_decontaminate == bench-pool slice of the full pair relation") {
    val dir = "/root/testdata/sf0.001"
    val pairs = graft.queries.Dedup.queries("d_minhash_lsh")(spark, dir)
      .as[(Long, Long, Double)].collect()
    val expected = pairs
      .filter(p => p._1 < 50 && p._2 >= 50 && p._3 >= 0.5)
      .groupBy(_._2).map { case (b, ps) =>
        (b, ps.length.toLong, ps.map(_._3).max)
      }.toSet
    val got = graft.queries.Dedup.queries("d_decontaminate")(spark, dir)
      .as[(Long, Long, Double)].collect().toSet
    assert(got.nonEmpty, "gate corpus must contain leaks")
    assert(got == expected, s"diff=${(got diff expected).take(3)}")
  }

  test("paraphrased leak: low exact 5-gram overlap, still caught") {
    val words = (0 until 40).map(i => s"tok$i")
    val bench = words.mkString(" ")
    // paraphrase: two word substitutions, 5% of the text
    val edited = words.updated(10, "swapA").updated(30, "swapB")
    val pool = edited.mkString(" ")

    // exact 5-gram windows: each substitution breaks 5 windows — the
    // n-gram contamination counter sees well under 80% overlap
    val g = (s: Seq[String]) => s.sliding(5).map(_.mkString(" ")).toSet
    val shared = (g(words) intersect g(edited)).size.toDouble / g(words).size
    assert(shared < 0.8, s"5-gram overlap $shared")

    val df = Seq((0L, bench), (100L, pool)).toDF("doc_id", "text")
    val sh = df.select(col("doc_id"),
      graft.queries.Dedup.shingleHashCol(col("text")).as("sh"))
    val caught = graft.queries.Dedup.lshPairs(sh, minJac = 0.5)
      .as[(Long, Long, Double)].collect()
    assert(caught.exists(p => p._1 == 0L && p._2 == 100L && p._3 >= 0.5),
      s"got ${caught.toSeq}")
  }
}
