package graft.plans

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Config-driven FK graph loader — the analog of the reference's dump
  * config format (slice_db/formats/dump.py:10-63), which declares
  * tables, keys, and directed references as JSON. The reference can also
  * infer this from pg_catalog (slice_db/schema.py); on the lake side the
  * graph is declared, so any real schema can drive the Slicer without
  * code changes.
  *
  * Format:
  * {{{
  * { "tables": [{"id": "t", "key": ["k"]}],
  *   "references": [{"id": "r", "table": "child", "columns": ["fk"],
  *                   "refTable": "parent", "refColumns": ["pk"],
  *                   "forward": true, "reverse": false}] }
  * }}}
  */
object SchemaConfig {

  private val mapper = new ObjectMapper()

  private def strings(n: JsonNode): Seq[String] =
    n.elements().asScala.map(_.asText()).toSeq

  def fromJson(json: String): SchemaGraph = {
    val root = mapper.readTree(json)
    val tables = root.get("tables").elements().asScala.map { t =>
      TableDef(t.get("id").asText(), strings(t.get("key")),
        unique = Option(t.get("unique")).forall(_.asBoolean(true)))
    }.toSeq
    val refs = Option(root.get("references")).map(_.elements().asScala.map { r =>
      Reference(
        id = r.get("id").asText(),
        table = r.get("table").asText(),
        columns = strings(r.get("columns")),
        refTable = r.get("refTable").asText(),
        refColumns = strings(r.get("refColumns")),
        forward = Option(r.get("forward")).forall(_.asBoolean(true)),
        reverse = Option(r.get("reverse")).forall(_.asBoolean(true)),
        deferrable = Option(r.get("deferrable")).exists(_.asBoolean(false)))
    }.toSeq).getOrElse(Seq.empty)
    SchemaGraph(tables, refs)
  }

  def toJson(g: SchemaGraph): String = {
    def arr(xs: Seq[String]) = xs.map(x => "\"" + x + "\"").mkString("[", ", ", "]")
    val ts = g.tables.map(t =>
      s"""    {"id": "${t.id}", "key": ${arr(t.key)}, "unique": ${t.unique}}""")
    val rs = g.references.map(r =>
      s"""    {"id": "${r.id}", "table": "${r.table}", "columns": ${arr(r.columns)},
         |     "refTable": "${r.refTable}", "refColumns": ${arr(r.refColumns)},
         |     "forward": ${r.forward}, "reverse": ${r.reverse}, "deferrable": ${r.deferrable}}""".stripMargin)
    s"""{\n  "tables": [\n${ts.mkString(",\n")}\n  ],\n  "references": [\n${rs.mkString(",\n")}\n  ]\n}"""
  }
}
