package graft.functions

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** Config-driven scrubbing — the analog of the reference's transform
  * config (slice_db/formats/transform.py `TransformTable`: per-table
  * column→transform mapping) applied during a dump
  * (slice_db/transform.py). JSON:
  * {{{
  * { "tables": { "customer": { "c_name": "given_name",
  *                             "c_acctbal": "null" } } }
  * }}}
  * Transform names resolve from [[Transforms.byName]]; unknown names
  * fail fast at parse time, like the reference's registry lookup.
  */
final case class ScrubConfig(tables: Map[String, Map[String, String]]) {

  /** Scrub one table's rows: configured columns are transformed in
    * place (cast back to their original type where the transform is
    * type-preserving by contract), everything else passes through. */
  def apply(table: String, df: DataFrame): DataFrame =
    tables.get(table) match {
      case None => df
      case Some(cols) =>
        val out = df.schema.fields.map { f =>
          cols.get(f.name) match {
            case Some(name) => ScrubConfig.resolve(name)(col(f.name)).as(f.name)
            case None       => col(f.name)
          }
        }
        df.select(out.toIndexedSeq: _*)
    }
}

object ScrubConfig {
  private val mapper = new ObjectMapper()

  private[functions] def resolve(name: String): Column => Column =
    Transforms.byName.getOrElse(name,
      sys.error(s"unknown transform '$name'; one of ${Transforms.byName.keys.toSeq.sorted.mkString(", ")}"))

  def fromJson(json: String): ScrubConfig = {
    val root = mapper.readTree(json)
    // a config missing the "tables" key MUST fail, not parse as an
    // empty scrub: the caller believes PII is being transformed, and a
    // silent no-op here ships it raw
    val t = Option(root.get("tables")).getOrElse(
      sys.error("scrub config must have a top-level \"tables\" object"))
    val tables = t.fields().asScala.map { e =>
      e.getKey -> e.getValue.fields().asScala.map { c =>
        val name = c.getValue.asText()
        resolve(name) // fail fast on unknown transforms
        c.getKey -> name
      }.toMap
    }.toMap
    ScrubConfig(tables)
  }
}
