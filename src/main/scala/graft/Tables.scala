package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

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
    if (name == "events") df.withColumn("ts", normalizeEventTs(df.schema("ts").dataType))
    else df
  }

  /** events.ts has shipped as TIMESTAMP(NANOS) (arrives as an int64 of
    * nanos under the sessions' spark.sql.legacy.parquet.nanosAsLong) and
    * as TIMESTAMP(MICROS) isAdjustedToUTC=false (arrives as
    * TIMESTAMP_NTZ). Normalize either to a session-TZ microsecond
    * timestamp; sessions pin spark.sql.session.timeZone=UTC, so the
    * NTZ→TZ cast is value-preserving and both paths yield identical
    * instants (ns→us truncation is exact — the corpus has none finer). */
  def normalizeEventTs(dt: DataType): Column = dt match {
    case LongType         => timestamp_micros(expr("ts div 1000"))
    case TimestampNTZType => col("ts").cast(TimestampType)
    case _                => col("ts")
  }
}
