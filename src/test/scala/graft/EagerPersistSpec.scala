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

  private val Window = 8 // forward/backward scan bound around the persist

  test("every query-pack persist is eagerly materialized (count or materialize)") {
    val dir = Paths.get("src/main/scala/graft/queries")
    val valDef = """\bva[lr]\s+(\w+)\s*=""".r
    val offenders = Files.list(dir).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .flatMap { p =>
        val lines = Files.readAllLines(p).asScala.toVector
        lines.zipWithIndex.collect {
          case (l, i) if l.contains(".persist(") =>
            // the enclosing statement: scan back to the nearest val/var
            // binding AT OR ABOVE the persist line's nesting level (by
            // indentation) — a deeper-indented val inside a lambda body
            // between the binding and its chained .persist is not the
            // statement start
            def indent(s: String) = s.takeWhile(_ == ' ').length
            val starts = (math.max(0, i - 40) to i).reverse
              .filter(j => valDef.findFirstIn(lines(j)).isDefined &&
                (j == i || indent(lines(j)) <= indent(lines(i))))
            val boundNames = starts.flatMap(j =>
              valDef.findFirstMatchIn(lines(j)).map(_.group(1)))
            val stmt = starts.headOption.map(j => lines.slice(j, i + 1))
              .getOrElse(Vector(l))
            val fwd = lines.slice(i + 1, i + Window + 1)
            // accept (a) the audited helper WRAPPING the persist
            // expression (materialize appears inside the same
            // statement), or (b) the identifier-matched idioms on the
            // bound name: CacheBook.materialize(name), or the guarded
            // name.count() + name.unpersist( pair. An adjacent
            // UNRELATED relation's materialize/count can no longer
            // false-pass a new lazy persist (r13 ADVICE).
            val wrapped = stmt.exists(_.contains("CacheBook.materialize"))
            val byName = boundNames.exists { n =>
              fwd.exists(_.contains(s"CacheBook.materialize($n)")) ||
                (fwd.exists(_.contains(s"$n.count()")) &&
                  fwd.exists(_.contains(s"$n.unpersist(")))
            }
            if (wrapped || byName) None else Some(s"${p.getFileName}:${i + 1}")
          case _ => None
        }.flatten
      }.toList
    assert(offenders.isEmpty,
      s"lazy persists (no statement-wrapping materialize, and no " +
        s"identifier-matched materialize/count within $Window lines): " +
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
