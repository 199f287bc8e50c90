package graft

import graft.functions.ScrubConfig

class ScrubConfigSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = ScrubConfig.fromJson(
    """{"tables": {"customer": {"name": "given_name", "balance": "null"}}}""")

  test("configured columns scrub, others pass through") {
    val df = Seq((1L, "Margaret", 12.5), (2L, "Margaret", 99.0))
      .toDF("id", "name", "balance")
    val out = cfg("customer", df).as[(Long, String, Option[String])].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1L, 2L), "untouched column intact")
    assert(out.forall(_._2 == out.head._2), "deterministic scrub")
    assert(out.head._2 != "Margaret" && out.head._2.head.isUpper)
    assert(out.forall(_._3.isEmpty), "null transform applied")
  }

  test("unconfigured tables are untouched; unknown transforms fail fast") {
    val df = Seq((1, "x")).toDF("a", "b")
    assert(cfg("orders", df).collect().toSeq == df.collect().toSeq)
    intercept[RuntimeException] {
      ScrubConfig.fromJson("""{"tables": {"t": {"c": "not_a_transform"}}}""")
    }
  }

  test("config without a tables key fails instead of silently not scrubbing") {
    intercept[RuntimeException] {
      ScrubConfig.fromJson("""{"customer": {"c_name": "given_name"}}""")
    }
  }
}
