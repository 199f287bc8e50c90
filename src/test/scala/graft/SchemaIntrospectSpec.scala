package graft

import graft.plans.{Reference, TableDef}
import graft.sources.SchemaIntrospect

/** SchemaIntrospect against RECORDED pg_catalog result fixtures: the
  * rows below are what the keySql/foreignKeySql statements return on a
  * PostgreSQL hosting an orders/customer/lineitem schema (no live
  * database in this container — the frames stand in for the JDBC
  * round-trip, which produces identically-shaped DataFrames). */
class SchemaIntrospectSpec extends SparkSpec {
  import spark.implicits._

  // (table_id, con_name, column_name, ord, is_primary)
  private val keyFixture = Seq(
    ("public.customer", "customer_pkey", "c_custkey", 1L, true),
    ("public.orders", "orders_pkey", "o_orderkey", 1L, true),
    // composite PK: ordinality carries column order
    ("public.lineitem", "lineitem_pkey", "l_orderkey", 1L, true),
    ("public.lineitem", "lineitem_pkey", "l_linenumber", 2L, true),
    // a table with BOTH a unique constraint and a PK: PK must win
    ("public.users", "users_email_key", "email", 1L, false),
    ("public.users", "users_pkey", "user_id", 1L, true),
    // unique-only table: first unique constraint becomes the key
    ("public.tokens", "tokens_value_key", "token_value", 1L, false))
    .toDF("table_id", "con_name", "column_name", "ord", "is_primary")

  // (ref_id, table_id, column_name, ref_table_id, ref_column_name, ord, deferrable)
  private val fkFixture = Seq(
    ("public.orders.orders_cust_fkey", "public.orders", "o_custkey",
      "public.customer", "c_custkey", 1L, false),
    // composite FK, fixture rows deliberately out of order: ordinality
    // must realign them
    ("public.lineitem.lineitem_ord_fkey", "public.lineitem", "l_linenumber",
      "public.orders", "o_linenumber", 2L, true),
    ("public.lineitem.lineitem_ord_fkey", "public.lineitem", "l_orderkey",
      "public.orders", "o_orderkey", 1L, true))
    .toDF("ref_id", "table_id", "column_name", "ref_table_id",
      "ref_column_name", "ord", "deferrable")

  test("fromFrames assembles tables, composite keys, and ordered FK columns") {
    val g = SchemaIntrospect.fromFrames(keyFixture, fkFixture)
    assert(g.table("public.lineitem") ==
      TableDef("public.lineitem", Seq("l_orderkey", "l_linenumber")))
    assert(g.table("public.users").key == Seq("user_id"), "PK preferred over unique")
    assert(g.table("public.tokens").key == Seq("token_value"), "unique fallback")
    val li = g.references.find(_.id == "public.lineitem.lineitem_ord_fkey").get
    assert(li == Reference("public.lineitem.lineitem_ord_fkey",
      "public.lineitem", Seq("l_orderkey", "l_linenumber"),
      "public.orders", Seq("o_orderkey", "o_linenumber"),
      reverse = false, deferrable = true))
  }

  test("introspected graph drives graph algorithms directly") {
    val g = SchemaIntrospect.fromFrames(keyFixture, fkFixture)
    // introspected references are FORWARD-ONLY by default (reverse
    // directions are per-dump intent, opted in by the operator): a
    // child reaches its ancestors, a parent pulls in no children
    assert(g.reachableFrom("public.lineitem")
      .contains("public.customer"), "lineitem reaches customer via orders")
    assert(!g.reachableFrom("public.customer").contains("public.lineitem"),
      "a customer root must not snowball into all orders/lineitems")
    val order = g.restoreOrder.map(_._1)
    assert(order.indexOf("public.customer") < order.indexOf("public.orders"))
    assert(order.indexOf("public.orders") < order.indexOf("public.lineitem"))
  }

  test("introspection SQL shape: catalog names and ordinality-aligned unnest") {
    // the statements must target the documented catalog relations and
    // alias the documented output columns (the fixture contract above)
    for (c <- Seq("pg_constraint", "pg_class", "pg_namespace", "pg_attribute",
        "WITH ORDINALITY", "table_id", "column_name", "ord"))
      assert(SchemaIntrospect.keySql.contains(c), s"keySql lacks $c")
    for (c <- Seq("pg_constraint", "unnest(con.conkey, con.confkey)",
        "ref_table_id", "ref_column_name", "condeferrable", "contype = 'f'"))
      assert(SchemaIntrospect.foreignKeySql.contains(c), s"foreignKeySql lacks $c")
  }
}
