package graft

import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches — the 100 TB shape for "distinct
  * users/tokens per day, and overall": each shard (day, partition)
  * builds an HLL sketch once; totals come from UNIONING sketches, never
  * from re-scanning the raw data. Spark's hll_sketch_agg/hll_union_agg
  * are deterministic for a given input multiset, so the union of
  * per-shard sketches must estimate EXACTLY what one pass over the
  * whole corpus estimates — that equality is the mergeability contract
  * an incremental rollup relies on. */
class SketchMergeSpec extends SparkSpec {
  import spark.implicits._

  test("union of per-shard HLL sketches == whole-corpus sketch estimate") {
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val whole = events
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("n"))
      .as[Long].head()
    // shard by a hash (stand-in for day/partition), sketch per shard,
    // union the sketches — no re-scan of raw rows
    val sketches = events
      .groupBy(pmod(hash(col("event_id")), lit(8)).as("shard"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    val merged = sketches
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("n"))
      .as[Long].head()
    assert(merged == whole,
      s"sketch union must be lossless vs one pass: $merged != $whole")
    // and the estimate is sane against the exact count (HLL error bound)
    val exact = events.select("user_id").distinct().count()
    assert(math.abs(merged - exact).toDouble / exact < 0.05,
      s"estimate $merged vs exact $exact outside 5%")
    // incremental day N+1: union(old sketches, new shard) == recompute
    val (oldE, newE) = (events.filter(pmod(hash(col("event_id")), lit(8)) =!= 7),
      events.filter(pmod(hash(col("event_id")), lit(8)) === 7))
    val incremental = oldE.agg(hll_sketch_agg(col("user_id")).as("sk"))
      .unionByName(newE.agg(hll_sketch_agg(col("user_id")).as("sk")))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("n"))
      .as[Long].head()
    assert(incremental == whole, "yesterday's sketch + today's batch == full recompute")
  }
}
