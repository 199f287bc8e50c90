package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{SchemaConfig, SchemaGraph}

/** `schema-filter children` config-rewrite semantics (reference
  * slice_db/cli/schema_filter.py): the output is a MODIFIED dump
  * config, not a printed closure — reverse directions are stripped off
  * references that do not point into the child closure. */
class SchemaFilterSpec extends AnyFunSuite {

  private val g = SchemaGraph.tpch

  test("orders subtree: outside parent loses its reverse direction") {
    val f = g.filterChildren(Seq("orders"))
    // closure = orders + lineitem (via the reverse-enabled lineitem FK);
    // customer sits outside, so customer->orders must stop pulling
    // children — exactly the reference's directions.remove(REVERSE)
    val oc = f.references.find(_.id == "orders_customer").get
    assert(!oc.reverse)
    assert(oc.forward, "forward direction is untouched")
    val lo = f.references.find(_.id == "lineitem_orders").get
    assert(lo.reverse, "references inside the closure keep REVERSE")
    // tables and keys are unchanged
    assert(f.tables == g.tables)
  }

  test("closure-internal filter is the identity") {
    // customer's child closure covers every reverse-enabled reference's
    // parent, so nothing is stripped
    assert(g.filterChildren(Seq("customer")) == g)
    // nation has no reverse-enabled children at all
    assert(g.filterChildren(Seq("nation")) == g)
  }

  test("multi-root closure unions before stripping") {
    val f = g.filterChildren(Seq("customer", "orders"))
    assert(f == g, "customer already contains orders' closure")
  }

  test("filtered config round-trips through JSON") {
    val f = g.filterChildren(Seq("orders"))
    val back = SchemaConfig.fromJson(SchemaConfig.toJson(f))
    assert(back.references.map(r => (r.id, r.forward, r.reverse)) ==
      f.references.map(r => (r.id, r.forward, r.reverse)))
    assert(back.tables.map(_.id) == f.tables.map(_.id))
  }

  test("unknown root fails loudly") {
    intercept[RuntimeException](g.filterChildren(Seq("nope")))
  }
}
