package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC ingest — how graft's operators would read a live PostgreSQL the
  * way the reference does (the reference pages rows over asyncpg;
  * Spark's JDBC source instead issues `numPartitions` range-partitioned
  * queries so the scan parallelizes across executors).
  *
  * `new Slicer(graph, t => JdbcSource.load(spark, url, t, keyOf(t), ...))`
  * slices a live database; everything downstream is unchanged because
  * operators only see DataFrames. NOT exercised in this container (no
  * database available; zero egress) — the test corpus drives the same
  * code paths through parquet instead.
  */
object JdbcSource {
  def load(
      spark: SparkSession,
      url: String,
      table: String,
      partitionColumn: String,
      lowerBound: Long,
      upperBound: Long,
      numPartitions: Int = 32,
      user: String = "",
      password: String = ""): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound)
      .option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
      .option("user", user)
      .option("password", password)
      .option("fetchsize", 10000)
      .load()

  /** Write a slice back over JDBC (restore path for live databases);
    * per-table ordering/deferral comes from RestoreWriter's plan. */
  def write(df: DataFrame, url: String, table: String,
      user: String = "", password: String = ""): Unit =
    df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("user", user)
      .option("password", password)
      .option("batchsize", 10000)
      .mode("append")
      .save()
}
