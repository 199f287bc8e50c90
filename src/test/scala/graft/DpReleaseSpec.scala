package graft

import java.security.MessageDigest

/** x_dp_release teeth beyond the SQL oracle: the distributed release
  * must equal a naive in-JVM discrete-Laplace mechanism run over the
  * same cells (true counts + trailing-ones geometric difference from
  * the same md5 seeds), the mechanism must actually perturb (both
  * noise signs appear across cells), and no released count can be
  * negative.
  */
class DpReleaseSpec extends SparkSpec {
  import spark.implicits._

  private def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
  private def idx6(s: String): Long =
    java.lang.Long.parseLong(md5Hex(s).substring(0, 6), 16)
  private def trailingOnes(v: Long): Int =
    java.lang.Long.bitCount(v ^ (v + 1)) - 1

  test("x_dp_release == naive discrete-Laplace over the true cells") {
    val dir = "/root/testdata/sf0.001"
    val cells = spark.read.parquet(s"$dir/documents.parquet")
      .groupBy("lang", "source").count()
      .as[(String, String, Long)].collect()

    val expected = cells.map { case (lang, source, n) =>
      val key = s"$lang|$source"
      val noise = trailingOnes(idx6(s"dpA#$key")) - trailingOnes(idx6(s"dpB#$key"))
      (lang, source, math.max(n + noise, 0L))
    }.toSet

    val got = graft.queries.Curation.queries("x_dp_release")(spark, dir)
      .as[(String, String, Long)].collect()
    assert(got.toSet == expected,
      s"diff=${(got.toSet diff expected).take(3)}")

    // mechanism teeth: perturbation is real and two-sided across cells
    val noises = cells.map { case (lang, source, _) =>
      val key = s"$lang|$source"
      trailingOnes(idx6(s"dpA#$key")) - trailingOnes(idx6(s"dpB#$key"))
    }
    assert(noises.exists(_ > 0) && noises.exists(_ < 0),
      s"noise must take both signs, got ${noises.distinct.sorted.toSeq}")
    assert(noises.forall(n => math.abs(n) <= 24), "geometric draw is 24-bit-bounded")
    assert(got.forall(_._3 >= 0L), "released counts clamp at zero")
  }
}
