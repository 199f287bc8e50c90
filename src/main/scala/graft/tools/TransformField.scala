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
  val transforms: Map[String, Column => Column] = Map(
    "given_name" -> Transforms.givenName,
    "surname" -> Transforms.surname,
    "city" -> Transforms.city,
    "us_state" -> Transforms.usState,
    "geozip" -> Transforms.geozip,
    "address1" -> Transforms.address1,
    "address2" -> Transforms.address2,
    "alphanum" -> Transforms.alphanum,
    "words" -> Transforms.words,
    "date_year" -> (c => Transforms.dateYear(c.cast("timestamp")).cast("string")),
    "null" -> (_ => Transforms.nul),
    "replace" -> Transforms.replaceDigits)

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
