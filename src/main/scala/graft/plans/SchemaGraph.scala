package graft.plans

/** Graph model of a relational schema, mirroring the reference's
  * `Schema`/`Table`/`Reference` (slice_db/dump.py:430-520) and the
  * forward/reverse reference directions (slice_db/formats/dump.py:11-30).
  *
  * This is pure metadata — it lives on the driver and is tiny (one entry
  * per table/FK), so graph algorithms here (toposort, cycle detection)
  * never touch executor data.
  *
  * @param columns key column(s) on the child side
  * @param refColumns referenced (parent) column(s)
  */
final case class Reference(
    id: String,
    table: String,
    columns: Seq[String],
    refTable: String,
    refColumns: Seq[String],
    forward: Boolean = true,
    reverse: Boolean = true,
    deferrable: Boolean = false)

/** @param key the table's key column(s) — the identity a slice discovers
  * @param unique whether `key` is genuinely UNIQUE (a primary key).
  *   When true, discovery's key count doubles as the manifest row count
  *   (zero extra jobs); when false (e.g. an event table keyed by a
  *   non-unique tuple) the manifest counts the materialized rows. */
final case class TableDef(id: String, key: Seq[String], unique: Boolean = true)

final case class SchemaGraph(tables: Seq[TableDef], references: Seq[Reference]) {
  val tableIds: Seq[String] = tables.map(_.id)
  def table(id: String): TableDef =
    tables.find(_.id == id).getOrElse(sys.error(s"No table $id"))

  /** references where `id` is the child (FK holder) — traversed FORWARD
    * (child rows pull in their parents). */
  def refsFrom(id: String): Seq[Reference] = references.filter(r => r.table == id && r.forward)

  /** references where `id` is the parent — traversed REVERSE (parent rows
    * pull in their children). */
  def refsTo(id: String): Seq[Reference] = references.filter(r => r.refTable == id && r.reverse)

  /** Table-level reachability closure from a root — which tables a
    * slice starting at `root` can touch, honoring reference directions
    * (the metadata analog of the reference's schema-filter `children`
    * visit, slice_db/cli/schema_filter.py:19-31). Driver-side only. */
  def reachableFrom(root: String): Set[String] = {
    val seen = collection.mutable.Set(root)
    var frontier = Set(root)
    while (frontier.nonEmpty) {
      val next = frontier.flatMap { t =>
        refsFrom(t).map(_.refTable) ++ refsTo(t).map(_.table)
      }.diff(seen)
      seen ++= next
      frontier = next
    }
    seen.toSet
  }

  /** The `schema-filter children` CONFIG REWRITE (not just the printed
    * closure): compute the child closure of `roots` along
    * reverse-enabled references, then strip the reverse direction off
    * every reference whose parent sits OUTSIDE the closure but whose
    * child sits inside — so a dump over the filtered config can reach
    * the subtree's children yet no outside parent pulls them back in.
    * Mirrors slice_db/cli/schema_filter.py:19-44 (visit over
    * reverse_references; directions.remove(REVERSE) on the rest). */
  def filterChildren(roots: Seq[String]): SchemaGraph = {
    val closure = collection.mutable.Set.empty[String]
    def visit(t: String): Unit = if (closure.add(t))
      references.foreach(r => if (r.refTable == t && r.reverse) visit(r.table))
    roots.foreach { r => table(r); visit(r) } // table() validates the id
    copy(references = references.map { r =>
      if (r.reverse && !closure(r.refTable) && closure(r.table))
        r.copy(reverse = false)
      else r
    })
  }

  /** Restore order: parents before children (Kahn). Cycle members are
    * emitted last, flagged so a restore would defer those constraints —
    * the reference handles this with deferrable FKs (slice_db/restore.py).
    */
  def restoreOrder: Seq[(String, Boolean)] = {
    val deps = tableIds.map { t =>
      // t depends on the parents it references (self-refs ignored)
      t -> references.collect { case r if r.table == t && r.refTable != t => r.refTable }.toSet
    }.toMap
    var remaining = deps
    val out = Seq.newBuilder[(String, Boolean)]
    while (remaining.nonEmpty) {
      val ready = remaining.collect { case (t, ds) if ds.forall(!remaining.contains(_)) => t }
        .toSeq.sorted
      if (ready.nonEmpty) {
        ready.foreach(t => out += ((t, false)))
        remaining = remaining -- ready
      } else {
        // cycle: break at a table whose incoming FK is declared
        // DEFERRABLE (slice_db restore defers exactly those constraints,
        // restore.py:221-263); fall back to the deterministic minimum
        val deferrableTables = remaining.keys.toSeq.filter(t =>
          references.exists(r => r.table == t && r.deferrable)).sorted
        val t = deferrableTables.headOption.getOrElse(remaining.keys.toSeq.min)
        out += ((t, true))
        remaining = remaining - t
      }
    }
    out.result()
  }
}

object SchemaGraph {
  /** The FK graph of the test corpus (what `slicedb schema` would infer
    * from pg_catalog foreign keys — slice_db/schema.py). */
  val tpch: SchemaGraph = SchemaGraph(
    tables = Seq(
      TableDef("region", Seq("r_regionkey")),
      TableDef("nation", Seq("n_nationkey")),
      TableDef("customer", Seq("c_custkey")),
      TableDef("supplier", Seq("s_suppkey")),
      TableDef("part", Seq("p_partkey")),
      TableDef("orders", Seq("o_orderkey")),
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic corpus
      // — manifest must count rows, not key tuples
      TableDef("lineitem", Seq("l_orderkey", "l_linenumber"), unique = false)),
    // Directions mirror how a slice-db config would set them
    // (slice_db/formats/dump.py:11-30): fact chains walk both ways
    // (a customer pulls its orders and lineitems), dimension refs are
    // forward-only (a nation must NOT pull every customer in it).
    references = Seq(
      Reference("nation_region", "nation", Seq("n_regionkey"), "region", Seq("r_regionkey"), reverse = false),
      Reference("customer_nation", "customer", Seq("c_nationkey"), "nation", Seq("n_nationkey"), reverse = false),
      Reference("supplier_nation", "supplier", Seq("s_nationkey"), "nation", Seq("n_nationkey"), reverse = false),
      Reference("orders_customer", "orders", Seq("o_custkey"), "customer", Seq("c_custkey")),
      Reference("lineitem_orders", "lineitem", Seq("l_orderkey"), "orders", Seq("o_orderkey")),
      Reference("lineitem_part", "lineitem", Seq("l_partkey"), "part", Seq("p_partkey"), reverse = false),
      Reference("lineitem_supplier", "lineitem", Seq("l_suppkey"), "supplier", Seq("s_suppkey"), reverse = false)))

  /** Forward-only variant: child rows pull parents, nothing fans out. */
  val tpchForward: SchemaGraph =
    tpch.copy(references = tpch.references.map(_.copy(reverse = false)))
}
