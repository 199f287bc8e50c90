package graft

import org.apache.spark.sql.functions._

import graft.functions.Transforms

class TransformsSpec extends SparkSpec {
  import spark.implicits._

  private def one(v: String, f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): String =
    Seq(v).toDF("v").select(f(col("v")).as("r")).as[String].head()

  test("transforms are deterministic (pepper-keyed, not random)") {
    assert(one("Johnson", Transforms.givenName(_)) == one("Johnson", Transforms.givenName(_)))
    assert(one("abc123", Transforms.alphanum(_)) == one("abc123", Transforms.alphanum(_)))
  }

  test("given_name preserves case pattern") {
    val titled = one("Margaret", Transforms.givenName(_))
    assert(titled.head.isUpper && titled.tail.forall(_.isLower))
    val upper = one("MARGARET", Transforms.givenName(_))
    assert(upper == upper.toUpperCase)
    // same name, different case -> same underlying pick (seed uppercased)
    assert(upper.toLowerCase == titled.toLowerCase)
  }

  test("alphanum preserves character classes and length") {
    val out = one("Ab3-x9", Transforms.alphanum(_))
    assert(out.length == 6)
    assert(out(0).isUpper && out(1).isLower && out(2).isDigit)
    assert(out(3) == '-')
    assert(out(4).isLower && out(5).isDigit)
    assert(out != "Ab3-x9")
  }

  test("geozip keeps the 3-digit geo prefix") {
    val out = one("90210", Transforms.geozip(_))
    assert(out.startsWith("902") && out.length == 5 && out.forall(_.isDigit))
  }

  test("words preserves word count and approximate shape") {
    val out = one("The quick brown fox", Transforms.words(_))
    val words = out.split(" ")
    assert(words.length == 4)
    assert(words(0).head.isUpper, "Title case preserved on first word")
  }

  test("incConst numbers only transformed rows; exclude and empties pass through") {
    val df = Seq(
      (1L, "alpha"), (2L, "keep-me"), (3L, ""), (4L, "beta"), (5L, null))
      .toDF("id", "v")
    val out = Transforms.incConst(df, "v", "member", Some("keep"), "id")
      .orderBy("id").select("v").as[Option[String]].collect().toSeq
    assert(out == Seq(Some("member 1"), Some("keep-me"), Some(""),
      Some("member 2"), None))
  }

  test("date_year jitters within the original year") {
    val df = Seq("1997-03-05", "2000-11-30").toDF("s")
      .select(col("s").cast("timestamp").as("d"))
    val out = df.select(year(col("d")).as("y0"),
      year(Transforms.dateYear(col("d"))).as("y1"))
      .as[(Int, Int)].collect()
    out.foreach { case (y0, y1) => assert(y0 == y1) }
  }
}
