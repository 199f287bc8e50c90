package graft

import org.apache.spark.sql.functions._

import graft.functions.Transforms

/** Per-invocation pepper override (the CLI `--pepper` flag): the
  * override must take precedence over the GRAFT_PEPPER environment and
  * change every derived scrub deterministically. */
class PepperSpec extends SparkSpec {
  import spark.implicits._

  private def scrambleOf(v: String): String =
    Seq(v).toDF("v").select(Transforms.alphanum(col("v")).cast("string"))
      .as[String].head()

  test("setPepper changes scrub output; resetPepper restores it") {
    try {
      val base = scrambleOf("Account-1234")
      Transforms.setPepper("round5-secret")
      val overridden = scrambleOf("Account-1234")
      assert(overridden != base, "a different pepper must change the scramble")
      // deterministic under the override
      assert(scrambleOf("Account-1234") == overridden)
      Transforms.resetPepper()
      assert(scrambleOf("Account-1234") == base)
    } finally Transforms.resetPepper()
  }

  test("same transform type under two instance names scrubs differently") {
    val cfg = graft.functions.ScrubConfig.fromJson(
      """{"transforms": {"inst_a": "given_name", "inst_b": "given_name"},
         "tables": {"t": {"a": "inst_a", "b": "inst_b", "c": "given_name"}}}""")
    val df = Seq(("Margaret", "Margaret", "Margaret")).toDF("a", "b", "c")
    val (a, b, c) = cfg("t", df).as[(String, String, String)].head()
    assert(a != b, "instance name must scope the pepper (transform.py:43-44)")
    // a bare type reference is its own instance named by the type, so
    // it diverges from a differently-named instance of the same type
    assert(c != a && c != b)
    // deterministic: the same instance name reproduces its output
    val (a2, _, _) = cfg("t", df).as[(String, String, String)].head()
    assert(a2 == a)
  }

  test("TransformField --pepper flag routes through the override") {
    try {
      Transforms.setPepper("cli-pepper")
      val direct = scrambleOf("Zip-99")
      Transforms.resetPepper()
      val out = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(out)) {
        tools.TransformField.main(Array("alphanum", "Zip-99", "--pepper", "cli-pepper"))
      }
      assert(out.toString.trim.linesIterator.toSeq.last == direct)
    } finally Transforms.resetPepper()
  }
}
