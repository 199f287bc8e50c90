package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loaders for the TPC-H-ish test corpus.
  *
  * At 100 TB these would be partitioned/bucketed catalog tables; the load
  * path stays the same (`spark.read.parquet` on a directory of files), and
  * all downstream operators rely only on the DataFrame, so filter pushdown
  * and column pruning reach the scan regardless of table size.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts is TIMESTAMP(NANOS), which Spark's parquet reader rejects;
    // sessions set spark.sql.legacy.parquet.nanosAsLong, so it arrives as
    // a long we convert to a microsecond timestamp (truncation — exact,
    // the corpus has none finer than micros; DuckDB ns→us casts likewise).
    if (name == "events") df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
}
