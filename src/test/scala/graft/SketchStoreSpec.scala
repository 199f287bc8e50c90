package graft

import java.nio.file.Files

import graft.sources.SketchStore

/** SketchStore teeth: write/read round-trip preserves the sketch
  * exactly; a rewrite (the nightly merge's overwrite-whole semantics)
  * replaces the live generation atomically via the CURRENT pointer —
  * readers after the second write see only the new sketch. */
class SketchStoreSpec extends SparkSpec {
  import spark.implicits._

  test("round-trip preserves rows; rewrite swaps the live generation") {
    val dir = Files.createTempDirectory("sketchstore").toString
    val night1 = Seq(("srcA", 10L), ("srcA", 20L), ("srcB", 5L))
      .toDF("source", "h")
    SketchStore.write(dir, night1)
    val got1 = SketchStore.read(spark, dir).as[(String, Long)].collect().toSet
    assert(got1 == Set(("srcA", 10L), ("srcA", 20L), ("srcB", 5L)))

    // the nightly merge rewrites whole — new generation goes live,
    // the old sketch's rows are gone (a sketch is a value, not a log)
    val night2 = Seq(("srcA", 3L), ("srcB", 5L), ("srcC", 7L))
      .toDF("source", "h")
    SketchStore.write(dir, night2)
    val got2 = SketchStore.read(spark, dir).as[(String, Long)].collect().toSet
    assert(got2 == Set(("srcA", 3L), ("srcB", 5L), ("srcC", 7L)))
  }
}
