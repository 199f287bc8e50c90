package graft

import java.nio.file.{Files, Paths}

import graft.functions.{ScrubConfig, Transforms}
import graft.operators.{SliceRoot, Slicer}
import graft.plans.{Reference, SchemaGraph, TableDef}
import graft.sources.{SliceWriter, SqlWriter}
import graft.tools.SliceTransform

/** Offline re-scrub round trip (reference `transform` concept,
  * slice_db/transform.py:111): scrubbing AT dump time and dumping
  * plain then re-scrubbing the written slice — same config, same
  * pepper — must produce identical segments, with the manifest
  * preserved and the INSERT scripts regenerated from scrubbed rows. */
class SliceTransformSpec extends SparkSpec {
  import spark.implicits._

  private val graph = SchemaGraph(
    tables = Seq(TableDef("p", Seq("pid")), TableDef("c", Seq("cid"))),
    references = Seq(Reference("cp", "c", Seq("pid"), "p", Seq("pid"))))

  private val tables = Map(
    "p" -> Seq((1, "Margaret", "4111111111111111"), (2, "Henry", "x"))
      .toDF("pid", "name", "note"),
    "c" -> Seq((10, 1, "Springfield"), (11, 2, "Shelbyville"))
      .toDF("cid", "pid", "city"))

  private def result() =
    new Slicer(graph, tables(_)).run(Seq(SliceRoot("p", "pid = 1")))

  private val cfg = ScrubConfig.fromJson(
    """{"tables": {"p": {"name": "given_name"}, "c": {"city": "city"}}}""")

  private def rowsOf(dir: String, t: String): Seq[Seq[Any]] =
    spark.read.parquet(s"$dir/data/$t").collect()
      .map(_.toSeq).toSeq.sortBy(_.mkString("|"))

  test("dump-then-rescrub equals scrub-at-dump, manifest preserved, sql regenerated") {
    Transforms.setPepper("round-trip-pepper")
    try {
      val plain = Files.createTempDirectory("st-plain").toString
      val atDump = Files.createTempDirectory("st-atdump").toString
      val rescrub = Files.createTempDirectory("st-rescrub").toString

      // plain dump WITH sql scripts (they embed raw values)
      val r = result()
      SliceWriter.write(r, plain)
      SqlWriter.write(r, plain)
      // scrubbed-at-dump reference output
      SliceWriter.write(result(), atDump, cfg.apply)

      SliceTransform.transform(spark, plain, rescrub, cfg)

      for (t <- Seq("p", "c"))
        assert(rowsOf(rescrub, t) == rowsOf(atDump, t),
          s"re-scrubbed $t differs from scrubbed-at-dump")
      // the scrub actually moved the configured columns
      assert(rowsOf(rescrub, "p") != rowsOf(plain, "p"))
      // manifest byte-identical (row counts / last_values scrub-invariant)
      assert(Files.readString(Paths.get(s"$rescrub/manifest.json"))
        == Files.readString(Paths.get(s"$plain/manifest.json")))
      // INSERT scripts regenerated from SCRUBBED rows — no raw leak
      val sql = spark.read.text(s"$rescrub/sql/p").as[String].collect().mkString("\n")
      assert(!sql.contains("Margaret"), "re-scrubbed INSERT script leaks a raw value")
      assert(sql.contains("INSERT INTO p"))
    } finally Transforms.resetPepper()
  }

  test("zip in / zip out round trip preserves the re-scrub") {
    Transforms.setPepper("round-trip-pepper")
    try {
      val plain = Files.createTempDirectory("st-zin").toString
      SliceWriter.write(result(), plain)
      val zin = s"$plain.zip"
      SliceWriter.zip(plain, zin)
      val unpacked = Files.createTempDirectory("st-zunpack").toString
      SliceWriter.unzip(zin, unpacked)
      val out = Files.createTempDirectory("st-zout").toString
      SliceTransform.transform(spark, unpacked, out, cfg)
      val atDump = Files.createTempDirectory("st-zatdump").toString
      SliceWriter.write(result(), atDump, cfg.apply)
      assert(rowsOf(out, "p") == rowsOf(atDump, "p"))
    } finally Transforms.resetPepper()
  }

  test("config naming a table absent from the slice fails fast") {
    val plain = Files.createTempDirectory("st-miss").toString
    SliceWriter.write(result(), plain)
    val bad = ScrubConfig.fromJson("""{"tables": {"nope": {"x": "null"}}}""")
    val e = intercept[IllegalArgumentException] {
      SliceTransform.transform(spark, plain,
        Files.createTempDirectory("st-missout").toString, bad)
    }
    assert(e.getMessage.contains("nope"))
  }

  test("flag parsing: loud failures, format restriction") {
    val p = SliceTransform.parse(Seq("--scrub", "s.json", "--pepper", "pp"))
    assert(p.scrubPath == "s.json" && p.pepper.contains("pp") && p.format == "parquet")
    intercept[RuntimeException] { SliceTransform.parse(Seq("--scrub")) }
    intercept[RuntimeException] { SliceTransform.parse(Seq("--scrub", "s.json", "extra")) }
    intercept[RuntimeException] { SliceTransform.parse(Seq()) } // --scrub required
    intercept[IllegalArgumentException] {
      SliceTransform.parse(Seq("--scrub", "s.json", "--format", "csv"))
    }
  }
}
