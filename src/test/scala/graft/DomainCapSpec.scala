package graft

import graft.functions.Determinism
import graft.queries.Curation

/** x_domain_cap: URL canonicalization (host extraction + subdomain
  * strip) lands every doc on its registrable domain, and the hash-
  * priority cap keeps exactly the top-DomainCap docs per domain —
  * verified against a naive in-JVM reference on the same corpus. */
class DomainCapSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("kept set, ranks, and totals equal the naive per-domain top-C") {
    val ids = Tables.load(spark, dir, "documents")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    def pick(seed: String, opts: Seq[String]): String =
      opts((Determinism.jvmMd5Idx(seed) % opts.size).toInt)
    val byDomain = ids.groupBy(id => pick(s"dom#$id", Curation.Domains))
    val expected = byDomain.flatMap { case (dom, ds) =>
      val ranked = ds.sortBy(id => (Determinism.jvmMd5Idx(s"cap#$id"), id))
      ranked.take(Curation.DomainCap).zipWithIndex.map { case (id, i) =>
        id -> ((dom, i + 1, ds.size))
      }
    }

    val got = Curation.queries("x_domain_cap")(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(2), r.getInt(3), r.getInt(4)), r.getString(1)))
      .toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, exp) => assert(got(id)._1 == exp, s"doc $id") }
    // the synthesized URL round-trips: subdomain from Subs, domain =
    // the canonicalized host, path carries the doc id
    got.foreach { case (id, ((dom, _, _), url)) =>
      val ok = Curation.Subs.exists(sub => url == s"https://$sub.$dom/p/$id")
      assert(ok, s"url $url does not canonicalize to $dom")
    }
    // teeth: at least one domain actually hits its cap (docs dropped)
    assert(byDomain.exists(_._2.size > Curation.DomainCap),
      "corpus too small for the cap to bind — raise sf or lower DomainCap")
  }
}
