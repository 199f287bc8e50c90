package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Transforms

/** Single-value scrub surface — analog of the reference's
  * `slicedb transform-field` (slice_db/cli/transform_field.py): apply a
  * named transform to one value from the command line.
  *
  * Usage: TransformField <transform> <value>
  */
object TransformField {
  /** The shared registry, with string-typed input handling for the CLI
    * (date_year takes a 'yyyy-MM-dd' string here). */
  val transforms: Map[String, Column => Column] =
    Transforms.byName + ("date_year" ->
      ((c: Column) => Transforms.dateYear(c.cast("timestamp")).cast("string")))

  def main(args: Array[String]): Unit = {
    val Array(name, value) = args.take(2)
    val f = transforms.getOrElse(name,
      sys.error(s"unknown transform '$name'; one of ${transforms.keys.toSeq.sorted.mkString(", ")}"))
    val spark = SparkSession.builder().master("local[1]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    println(Seq(value).toDF("v").select(f(col("v")).cast("string")).as[String].head())
    spark.stop()
  }
}
