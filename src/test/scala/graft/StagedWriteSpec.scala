package graft

import org.apache.spark.sql.functions._

import graft.sources.{LshIndexStore, StagedWrite}

/** The object-store-safe commit: a generation goes live only when the
  * one-file CURRENT-<dir> pointer lands — a crash at ANY earlier point
  * leaves the previous generation live, readable, and untouched. */
class StagedWriteSpec extends SparkSpec {
  import spark.implicits._

  private def write(path: String, marker: Int): Unit =
    StagedWrite.swapIn(spark, path, Seq("data")) { st =>
      Seq(marker).toDF("m").write.mode("overwrite").parquet(s"$st/data")
    }

  private def readMarker(path: String): Int =
    spark.read.parquet(s"${StagedWrite.resolve(spark, path, "data")}/data")
      .head().getInt(0)

  test("crash mid-stage write: live generation untouched, retry succeeds") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-sw").toString
    write(tmp, 1)
    assert(readMarker(tmp) == 1)
    // the next rebuild dies halfway through writing its relations —
    // after some data is on disk, before the pointer commit
    intercept[RuntimeException] {
      StagedWrite.swapIn(spark, tmp, Seq("data")) { st =>
        Seq(99).toDF("m").write.mode("overwrite").parquet(s"$st/data")
        sys.error("killed mid-write")
      }
    }
    assert(readMarker(tmp) == 1, "pointer never moved; old generation live")
    // crash AFTER relations staged but BEFORE the pointer commit: a
    // fully-written generation dir with no pointer is not live either
    assert(new java.io.File(s"$tmp/gen-2/data").exists(),
      "partial attempt's files are on disk (and harmless)")
    // retry: a fresh generation goes live; the stale partial one is
    // garbage-collected by the successful commit
    write(tmp, 2)
    assert(StagedWrite.resolve(spark, tmp, "data") == s"$tmp/gen-3")
    assert(readMarker(tmp) == 2)
    assert(!new java.io.File(s"$tmp/gen-2").exists(),
      "crashed attempt's generation retired by the next commit")
  }

  test("missing staged dir refuses the pointer commit") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-sw2").toString
    write(tmp, 1)
    intercept[IllegalArgumentException] {
      StagedWrite.swapIn(spark, tmp, Seq("data")) { _ => () } // wrote nothing
    }
    assert(readMarker(tmp) == 1)
  }

  test("readers get one generation of grace across a commit") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-sw3").toString
    write(tmp, 1)
    // a reader plans against gen-1...
    val inFlight = spark.read
      .parquet(s"${StagedWrite.resolve(spark, tmp, "data")}/data")
    write(tmp, 2) // ...the nightly job swaps to gen-2 underneath it
    assert(inFlight.head().getInt(0) == 1,
      "in-flight reader still scans its (grace) generation")
    assert(readMarker(tmp) == 2, "new readers resolve the new generation")
    write(tmp, 3) // the NEXT commit retires gen-1
    assert(!new java.io.File(s"$tmp/gen-1").exists())
  }

  test("relation groups on one store path commit independently") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-sw5").toString
    write(tmp, 1) // group A ("data") -> gen-1
    StagedWrite.swapIn(spark, tmp, Seq("other")) { st => // group B -> gen-2
      Seq(7).toDF("m").write.mode("overwrite").parquet(s"$st/other")
    }
    // B's commit must not disturb A's live generation, and vice versa
    assert(readMarker(tmp) == 1)
    assert(spark.read
      .parquet(s"${StagedWrite.resolve(spark, tmp, "other")}/other")
      .head().getInt(0) == 7)
    write(tmp, 2) // A again -> gen-3; A's gen-1 becomes grace
    assert(readMarker(tmp) == 2)
    assert(spark.read
      .parquet(s"${StagedWrite.resolve(spark, tmp, "other")}/other")
      .head().getInt(0) == 7, "group B untouched by A's commits")
  }

  test("flat pointer-less layout stays readable and upgrades in place") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-sw4").toString
    // hand-laid flat layout (the pre-pointer format)
    Seq((1L, Seq(1L, 2L))).toDF("doc_id", "sh")
      .write.parquet(s"$tmp/shingles")
    Seq((1L, 0, "k")).toDF("doc_id", "bi", "bk")
      .write.parquet(s"$tmp/bands")
    assert(StagedWrite.resolve(spark, tmp, "shingles") == tmp)
    val (sh, _) = LshIndexStore.read(spark, tmp)
    assert(sh.count() == 1)
    // first pointer-committed write supersedes the flat dirs — but
    // keeps them as the grace copy (an in-flight reader may have just
    // resolved them)
    LshIndexStore.write(tmp,
      Seq((2L, Seq(3L, 4L)), (3L, Seq(5L, 6L))).toDF("doc_id", "sh"),
      Seq((2L, 0, "x"), (3L, 1, "y")).toDF("doc_id", "bi", "bk"))
    assert(StagedWrite.resolve(spark, tmp, "shingles") == s"$tmp/gen-1")
    val (sh2, _) = LshIndexStore.read(spark, tmp)
    assert(sh2.select("doc_id").as[Long].collect().toSet == Set(2L, 3L))
    assert(new java.io.File(s"$tmp/shingles").exists(),
      "flat layout is the grace copy of its group's first commit")
    // the group's NEXT commit retires the flat grace copy
    LshIndexStore.write(tmp,
      Seq((4L, Seq(7L, 8L))).toDF("doc_id", "sh"),
      Seq((4L, 0, "z")).toDF("doc_id", "bi", "bk"))
    assert(!new java.io.File(s"$tmp/shingles").exists(),
      "flat layout retired on the next commit, like any grace generation")
  }
}
