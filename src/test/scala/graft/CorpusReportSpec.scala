package graft

/** The corpus-card CLI composes gate-verified operators into one JSON
  * artifact; the spec checks the composition and serialization, not the
  * operators (each has its own oracle/spec). */
class CorpusReportSpec extends SparkSpec {

  test("corpus report writes the four sections as valid JSON") {
    spark // force shared session init before the tool's getOrCreate
    val out = java.nio.file.Files.createTempDirectory("graft-report")
      .resolve("report.json").toString
    graft.tools.CorpusReport.main(Array("/root/testdata/sf0.001", out))
    val json = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(out)))
    assert(json.startsWith("{") && json.trim.endsWith("}"))
    Seq("\"sources\":", "\"near_dup_pairs\":", "\"dq_profile\":",
      "\"top_source_overlaps\":", "\"est_jaccard_micro\"",
      "\"n_vocab\"", "\"minhash_lsh\"", "\"n_distinct\"").foreach { k =>
      assert(json.contains(k), s"missing $k in $json")
    }
  }
}
