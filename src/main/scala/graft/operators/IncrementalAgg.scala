package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance (insert-only incremental view
  * maintenance) for the distributive aggregates: count, sum, min, max.
  *
  * The reference engine re-dumps a slice from scratch on every run;
  * a standing analytics rollup at 100 TB cannot. The scalable shape is
  * the classic partial-state one (same algebra Spark itself uses for
  * map-side combine, lifted to the job level):
  *
  *   state(full) == merge(state(base), state(delta))
  *
  * where `state` is a per-key partial-aggregate TABLE and `merge`
  * re-aggregates the union on the same key. A nightly delta batch then
  * costs one scan of the DELTA plus a key-shuffle of |state| + |delta
  * keys| — the 100-TB base fact table is never rescanned. count/sum
  * merge by summing, min/max by min/max (valid because deltas are
  * insert-only; deletes would need retractable aggregates — documented
  * contract, enforced nowhere cheaper than the ingest boundary).
  *
  * Merge is associative and commutative, so any batching of deltas —
  * nightly chains, out-of-order catch-ups, map-side combines — lands on
  * the same state (IncAggSpec holds both the split and the chain).
  */
object IncrementalAgg {

  /** Per-key partial-aggregate state of `df`: n/total/lo/hi over
    * `value`. `total` aggregates in DECIMAL(18,2) so state values are
    * exact and merge order cannot perturb them (double sums are
    * order-dependent; a standing table re-merged nightly would drift).
    */
  def state(df: DataFrame, keys: Seq[String], value: Column): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(value.cast("decimal(18,2)")).as("total"),
        min(value).as("lo"),
        max(value).as("hi"))

  /** Merge partial states on their key columns. Input frames must share
    * the state schema produced by [[state]]; the result is again valid
    * state, so merges chain. */
  def merge(keys: Seq[String], states: DataFrame*): DataFrame =
    states.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("n")).as("n"),
        sum(col("total")).as("total"),
        min(col("lo")).as("lo"),
        max(col("hi")).as("hi"))
}
