package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query at the given scale
  * factor, one JSON line on stdout. Failures are recorded explicitly
  * (name -> error) and fail the process — a crash must never be
  * reported as a timing. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: touch every table's scan path once. Otherwise the
    // alphabetically-first query absorbs ~5s of JVM/codegen/parquet
    // cold start that belongs to the harness, not the query (observed:
    // whichever query ran first was 4-6s slower than its warm cost).
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").limit(256).collect()
      catch { case _: Throwable => () }
    }
    // ... and the common codegen/JIT paths (hash, shuffle agg, window,
    // sort) with a synthetic relation, so the first timed query measures
    // its work, not Janino/JIT infrastructure start-up.
    locally {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(org.apache.spark.sql.functions.col("g"))
        .orderBy(org.apache.spark.sql.functions.col("id"))
      spark.range(0, 4096)
        .select(col("id"), (col("id") % 7).as("g"),
          md5(concat(col("id").cast("string"), lit("w"))).as("h"))
        .withColumn("rn", row_number().over(w))
        .groupBy("g").agg(count(lit(1)), min("h"), sum("rn"))
        .orderBy("g").collect()
    }
    val only = args.toSet // optional query-name filter for local iteration
    val errors = collection.mutable.Map.empty[String, String]
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
    def family(n: String) = n.takeWhile(_ != '_')
    val results = ordered.zipWithIndex.map { case ((name, fn), i) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() }
      catch { case e: Throwable =>
        errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
      }
      val elapsed = (System.nanoTime() - t0) / 1e9
      // UNTIMED family-boundary release: memoized caches are built for a
      // family and must not sit in the block store taxing every later
      // query (the r04 driver bench showed exactly that buildup). The GC
      // nudge lets the ContextCleaner reclaim now-unreferenced
      // checkpoint RDDs (per-call eager checkpoints inside operators).
      val last = i == ordered.size - 1 || family(ordered(i + 1)._1) != family(name)
      if (last) { CacheBook.release(spark, family(name)); System.gc() }
      name -> elapsed
    }
    CacheBook.releaseAll(spark)
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replaceAll("[\\x00-\\x1F]", " ") + "\""
    // short numbers keep the line inside tail captures; Locale.ROOT so a
    // comma-decimal JVM locale can't corrupt the JSON
    def sec(v: Double) = String.format(java.util.Locale.ROOT, "%.3f",
      java.lang.Double.valueOf(v))
    val qs = results.map { case (k, v) => q(k) + ":" + sec(v) }.mkString("{", ",", "}")
    val es = errors.toSeq.sortBy(_._1).map { case (k, v) => q(k) + ":" + q(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val json =
      s"""{"metric":"total","value":${sec(total)},"unit":"sec","queries":$qs,"errors":$es,"sf":"$sfDir"}"""
    // a line-capture of stdout can truncate a long JSON line (BENCH_r03
    // lost 9 queries + the total that way) — ALSO persist it to a file
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), json + "\n")
    catch { case _: Throwable => () } // stdout remains the contract
    println(json)
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
