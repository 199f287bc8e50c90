package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Multi-format source/sink surface. Parquet is the native interchange
  * (typed, splittable, column-pruned); ORC is equivalent for engines
  * that prefer it; CSV/JSON are the text-interchange edges of a
  * pipeline. CSV/JSON reads take an explicit schema — schema inference
  * is a full extra pass over the data and is banned at 100 TB.
  */
object Formats {
  val Supported: Set[String] = Set("parquet", "orc", "csv", "json")

  private def check(format: String): Unit =
    require(Supported.contains(format),
      s"unsupported format '$format'; one of ${Supported.toSeq.sorted.mkString(", ")}")

  def write(df: DataFrame, path: String, format: String = "parquet"): Unit = {
    check(format)
    val w = df.write.mode("overwrite").format(format)
    (if (format == "csv") w.option("header", "true") else w).save(path)
  }

  def read(spark: SparkSession, path: String, format: String = "parquet",
      schema: Option[StructType] = None): DataFrame = {
    check(format)
    val r = spark.read.format(format)
    val r2 = schema.fold(r)(r.schema)
    val r3 = if (format == "csv") r2.option("header", "true") else r2
    r3.load(path)
  }
}
