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
  * { "transforms": { "member_name": "given_name" },
  *   "tables": { "customer": { "c_name": "member_name",
  *                             "c_acctbal": "null" } } }
  * }}}
  * A column maps to a transform INSTANCE: either a name declared in the
  * optional "transforms" section (instance name → transform type) or a
  * bare type name, which is its own instance. The instance name scopes
  * the pepper — the effective pepper is `pepper + instanceName`, the
  * reference's per-instance derivation (slice_db/transform.py:43-44) —
  * so two instances of the same type scrub the same value differently,
  * and renaming an instance re-keys its output. Unknown names fail fast
  * at parse time, like the reference's registry lookup.
  */
final case class ScrubConfig(tables: Map[String, Map[String, String]],
    transforms: Map[String, String] = Map.empty) {

  /** Scrub one table's rows: configured columns are transformed in
    * place (cast back to their original type where the transform is
    * type-preserving by contract), everything else passes through. */
  def apply(table: String, df: DataFrame): DataFrame =
    tables.get(table) match {
      case None => df
      case Some(cols) =>
        val out = df.schema.fields.map { f =>
          cols.get(f.name) match {
            case Some(inst) => ScrubConfig.resolve(transforms, inst)(col(f.name)).as(f.name)
            case None       => col(f.name)
          }
        }
        df.select(out.toIndexedSeq: _*)
    }
}

object ScrubConfig {
  private val mapper = new ObjectMapper()

  /** Instance reference → transform Column builder, pepper scoped to
    * the instance name (reference parity: `pepper + name`). Pepper is
    * read when the Column is BUILT, so a setPepper override applies. */
  private[functions] def resolve(transforms: Map[String, String],
      inst: String): Column => Column = {
    val tpe = transforms.getOrElse(inst, inst)
    // builtins first, then Transforms.registerCustom entries (the
    // reference's custom-module registry); unknown names fail fast
    val builder = Transforms.resolveName(tpe).getOrElse(
      sys.error(s"unknown transform '$tpe'; one of ${Transforms.knownNames.mkString(", ")}"))
    c => builder(c, Transforms.Pepper + inst)
  }

  def fromJson(json: String): ScrubConfig = {
    val root = mapper.readTree(json)
    // a config missing the "tables" key MUST fail, not parse as an
    // empty scrub: the caller believes PII is being transformed, and a
    // silent no-op here ships it raw
    val t = Option(root.get("tables")).getOrElse(
      sys.error("scrub config must have a top-level \"tables\" object"))
    val transforms = Option(root.get("transforms")).map { tr =>
      tr.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
    }.getOrElse(Map.empty[String, String])
    val tables = t.properties().asScala.map { e =>
      e.getKey -> e.getValue.properties().asScala.map { c =>
        val inst = c.getValue.asText()
        resolve(transforms, inst) // fail fast on unknown transforms
        c.getKey -> inst
      }.toMap
    }.toMap
    ScrubConfig(tables, transforms)
  }
}
