package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.SliceDump

/** The dump CLI's flag grammar — the loud-failure rules a long-running
  * ETL invocation depends on (a swallowed typo here scrubs nothing or
  * slices the wrong roots and still "works"). */
class SliceDumpParseSpec extends AnyFunSuite {

  test("flags parse anywhere among the (table, condition) pairs") {
    val p = SliceDump.parse(Seq("customer", "c_custkey <= 5",
      "--no-transaction", "orders", "o_orderkey < 9", "--disable-triggers",
      "--jobs", "4", "--pepper", "sk", "--graph", "g.json"))
    assert(p.roots.map(_.table) == Seq("customer", "orders"))
    assert(!p.transaction && p.disableTriggers && p.jobs == 4)
    assert(p.pepper.contains("sk") && p.graphPath.contains("g.json"))
  }

  test("unknown flags fail loudly wherever they appear") {
    val e = intercept[RuntimeException] {
      SliceDump.parse(Seq("--peper", "x", "customer", "c_custkey <= 5"))
    }
    assert(e.getMessage.contains("unknown flag --peper"))
  }

  test("a known value flag missing its value says so") {
    val e = intercept[RuntimeException] {
      SliceDump.parse(Seq("customer", "c_custkey <= 5", "--jobs"))
    }
    assert(e.getMessage.contains("--jobs requires a value"))
  }

  test("jobs > 1 with the default single transaction fails at parse time") {
    val e = intercept[IllegalArgumentException] {
      SliceDump.parse(Seq("customer", "c_custkey <= 5", "--jobs", "4"))
    }
    assert(e.getMessage.contains("--no-transaction"))
    // and the valid combination parses
    SliceDump.parse(Seq("customer", "c", "--jobs", "4", "--no-transaction"))
  }

  test("roots must be (table, condition) pairs") {
    intercept[IllegalArgumentException] { SliceDump.parse(Seq("customer")) }
    intercept[IllegalArgumentException] { SliceDump.parse(Seq.empty) }
  }
}
