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

  test("custom transforms register, resolve via config JSON, and pepper-scope") {
    import graft.functions.Transforms
    import org.apache.spark.sql.functions.{concat, lit, md5, substring}
    // the reference's custom-module shape: user code extends the
    // registry, config refers to it by name — with instance-scoped
    // pepper, so two instances of the same custom type diverge
    Transforms.registerCustom("mask_tail") { (c, pepper) =>
      concat(substring(c.cast("string"), 1, 2),
        substring(md5(concat(c.cast("string"), lit(pepper))), 1, 4))
    }
    try {
      val cfg2 = ScrubConfig.fromJson(
        """{"transforms": {"code_a": "mask_tail", "code_b": "mask_tail"},
           "tables": {"t": {"x": "code_a", "y": "code_b"}}}""")
      val df = Seq(("secret01", "secret01")).toDF("x", "y")
      val r = cfg2("t", df).as[(String, String)].collect().head
      assert(r._1.startsWith("se") && r._1.length == 6, "custom transform applied")
      assert(r._1 != r._2, "instance name scopes the pepper — same type, different keying")
      // deterministic: same input, same instance, same output
      assert(cfg2("t", df).as[(String, String)].collect().head == r)
      // builtin names cannot be shadowed by user code
      intercept[IllegalArgumentException] {
        Transforms.registerCustom("null")((c, _) => c)
      }
      // the unknown-name error survives and now lists the custom name
      val err = intercept[RuntimeException] {
        ScrubConfig.fromJson("""{"tables": {"t": {"c": "not_a_transform"}}}""")
      }
      assert(err.getMessage.contains("mask_tail"))
    } finally Transforms.unregisterCustom("mask_tail")
    // after unregistration the name is unknown again
    intercept[RuntimeException] {
      ScrubConfig.fromJson("""{"tables": {"t": {"c": "mask_tail"}}}""")
    }
  }
}
