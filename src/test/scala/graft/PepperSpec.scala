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
