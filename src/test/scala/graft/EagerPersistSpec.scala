package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §4's eager-materialization rule as a source-scan test (the
  * PlanShapeSpec idiom, one level up): every `.persist(` in the query
  * packs must be materialized where it stands — wrapped in
  * [[CacheBook.materialize]] or followed by an explicit guarded
  * `count()` within a few lines. A lazy persist whose first consumers
  * are concurrent branches (futures, or the two sides of a self-join
  * compiled into one job) races: each branch computes the build before
  * either populates the cache, so the "shared" relation is built twice
  * — observed on the r03 shingle build and called out again by the r12
  * verdict on d_allpairs' self-joined prefix relation. The rule is
  * structural, so it is pinned structurally: this spec fails on any
  * new lazy persist, wherever it hides.
  *
  * Scope: `graft/queries` (the packs whose persists register with
  * CacheBook). Operators with loop-generation persists that an
  * immediate single action materializes by design (BpeVocab's
  * one-job-per-iteration merge loop) are outside the scope and
  * document their own contract.
  */
class EagerPersistSpec extends AnyFunSuite {

  private val Window = 6 // lines around the persist that must materialize it

  test("every query-pack persist is eagerly materialized (count or materialize)") {
    val dir = Paths.get("src/main/scala/graft/queries")
    val offenders = Files.list(dir).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .flatMap { p =>
        val lines = Files.readAllLines(p).asScala.toVector
        lines.zipWithIndex.collect {
          case (l, i) if l.contains(".persist(") =>
            val ctx = lines.slice(math.max(0, i - Window), i + Window + 1)
            // accept the audited helper, or the inline guarded idiom —
            // which requires BOTH the count AND the failure-unpersist
            // in the window (a stray count() on an unrelated frame
            // nearby must not satisfy the rule)
            val eager = ctx.exists(_.contains("CacheBook.materialize")) ||
              (ctx.exists(_.contains(".count()")) &&
                ctx.exists(_.contains(".unpersist(")))
            if (eager) None else Some(s"${p.getFileName}:${i + 1}")
          case _ => None
        }.flatten
      }.toList
    assert(offenders.isEmpty,
      s"lazy persists (no materialize/count within ±$Window lines): " +
        offenders.mkString(", "))
  }

  test("localCheckpoint memos are eager (the lazy flavor would race identically)") {
    val dir = Paths.get("src/main/scala/graft/queries")
    val offenders = Files.list(dir).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .flatMap { p =>
        Files.readAllLines(p).asScala.zipWithIndex.collect {
          case (l, i) if l.contains("localCheckpoint(") &&
              !l.contains("localCheckpoint(true)") &&
              !l.contains("localCheckpoint(eager = true)") =>
            s"${p.getFileName}:${i + 1}"
        }
      }.toList
    assert(offenders.isEmpty,
      s"non-eager localCheckpoint calls: ${offenders.mkString(", ")}")
  }
}
