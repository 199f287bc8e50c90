package graft

import org.apache.spark.sql.functions._

/** Invariants of the curation/export pack (Pack I) that the value-exact
  * gate can't express: packing capacity bounds, split totality,
  * mixture amplification bounds. Runs on the sf0.001 fixture tables.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) = graft.queries.Curation.queries(name)(spark, dir)

  test("x_split is total, 3-valued, and ~90/5/5") {
    val counts = q("x_split").groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "val", "test"))
    val n = counts.values.sum
    assert(counts("train") > n * 8 / 10, "train holds the ~90% mass")
    assert(counts("val") < n / 10 && counts("test") < n / 10)
    // incremental-safety: assignment depends only on doc_id, so the
    // same doc filtered from a subset corpus gets the same split
    val sub = graft.queries.Curation.queries("x_split")(spark, dir)
      .filter(col("doc_id") < 50).as[(Long, String, String)].collect()
    val full = q("x_split").as[(Long, String, String)].collect()
      .filter(_._1 < 50)
    assert(sub.sorted.sameElements(full.sorted))
  }

  test("x_pack bins are contiguous per shard and overflow-bounded") {
    val packed = q("x_pack").as[(Long, Int, Int, Int)].collect()
    val byShard = packed.groupBy(_._2)
    byShard.foreach { case (_, rows) =>
      val bins = rows.map(_._3).distinct.sorted.toSeq
      assert(bins == bins.indices.toSeq, "bins start at 0 and have no gaps")
    }
    // a bin holds docs whose EXCLUSIVE cumsum fell under the boundary,
    // so fill exceeds the budget by at most its own largest document
    val fills = packed.groupBy(r => (r._2, r._3)).map { case (_, rows) =>
      (rows.map(_._4).sum, rows.map(_._4).max)
    }
    fills.foreach { case (fill, maxDoc) =>
      assert(fill < 256 + maxDoc, s"bin fill $fill exceeds budget + largest doc $maxDoc")
    }
  }

  test("x_shuffle ranks are a permutation per shard, shards match x_pack") {
    val shf = q("x_shuffle").as[(Long, Int, Int)].collect()
    shf.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length),
        "ranks must be contiguous 1..n within a shard")
    }
    // same shard contract as packing: the reader walks one shard's
    // bins in this shard's shuffle order
    val packShards = q("x_pack").select("doc_id", "shard")
      .as[(Long, Int)].collect().toMap
    assert(shf.forall(r => packShards(r._1) == r._2))
  }

  test("x_corpus_diff statuses partition exactly by the carve rules") {
    // old skips %10==7, new skips %10==3 and revises %5==0 — so the
    // status sets are fully determined by doc_id arithmetic: added =
    // %10==7, removed = %10==3, changed = %5==0 (0,5 mod 10 never
    // collide with the skip residues); everything else is unchanged
    // and must be ABSENT from the diff
    val ids = q("x_split").select("doc_id").as[Long].collect().toSet
    val rows = q("x_corpus_diff")
      .select("doc_id", "status").as[(Long, String)].collect()
    val byStatus = rows.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byStatus.keySet == Set("added", "removed", "changed"))
    assert(byStatus("added") == ids.filter(_ % 10 == 7))
    assert(byStatus("removed") == ids.filter(_ % 10 == 3))
    assert(byStatus("changed") == ids.filter(_ % 5 == 0))
    assert(rows.length == rows.map(_._1).distinct.length, "one row per doc")
  }

  test("x_mix amplification is per-lang bounded and epoch-contiguous") {
    val copies = q("x_mix").groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n"), max("epoch").as("mx"))
      .as[(Long, String, Long, Int)].collect()
    copies.foreach { case (_, lang, n, mx) =>
      assert(mx == n - 1, "epoch indices are 0..n-1")
      val (lo, hi) = lang match {
        case "en" => (2, 3) case "es" => (1, 2) case _ => (1, 1)
      }
      assert(n >= lo && n <= hi, s"$lang weight bounds violated: $n copies")
    }
  }

  test("x_mix_temp: sqrt-temperature quotas flatten skewed sources") {
    // sources 400/100/16 docs: natural shares 78/19/3 %, sqrt weights
    // 20/10/4 -> quota shares ~59/29/12 % of total=258. The naive
    // reference recomputes the allocation arithmetic independently.
    val rows = (1L to 400L).map((_, "big")) ++
      (401L to 500L).map((_, "mid")) ++ (501L to 516L).map((_, "small"))
    val d = rows.toDF("doc_id", "source")
    val got = graft.queries.Curation.temperatureMix(d)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    val ws = Map("big" -> 400, "mid" -> 100, "small" -> 16).map {
      case (s, n) => s -> math.floor(math.sqrt(n * 1000000.0)).toLong
    }
    val sw = ws.values.sum
    val total = rows.size / 2
    val sizes = Map("big" -> 400L, "mid" -> 100L, "small" -> 16L)
    // a quota above the source's size keeps the whole source
    val want = ws.map { case (s, w) => s -> math.min(total * w / sw, sizes(s)) }
    assert(got == want, s"got $got want $want")
    // direction: big's kept FRACTION is the smallest, small's largest
    assert(got("big") * 16 < got("small") * 400,
      "sqrt temperature must over-represent the small source")
  }
}
