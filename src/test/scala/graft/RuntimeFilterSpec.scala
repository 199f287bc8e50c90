package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter injection — the scale feature that turns a
  * selective dim-side predicate into a fact-side scan filter BEFORE the
  * join shuffle: at 100 TB the shuffle of non-matching fact rows is the
  * cost, and the injected bloom probe drops them at the scan. The
  * default thresholds target cluster-sized scans (10 GB application
  * side), so the spec lowers them to demonstrate the plan shape on the
  * gate data; DEPLOY.md documents the production knobs. */
class RuntimeFilterSpec extends SparkSpec {

  test("selective dim filter injects a bloom probe into the fact scan") {
    val sf = "/root/testdata/sf0.001"
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val prev = keys.map(k => k -> scala.util.Try(spark.conf.get(k)).toOption)
    spark.conf.set(keys(0), "true")
    spark.conf.set(keys(1), "0") // default 10GB — cluster-sized
    spark.conf.set(keys(2), "-1") // force the shuffle-join shape
    try {
      val orders = spark.read.parquet(s"$sf/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
      val li = spark.read.parquet(s"$sf/lineitem.parquet")
      val j = li.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(sum("l_quantity").as("q"))
      val opt = j.queryExecution.optimizedPlan.toString
      assert(opt.contains("might_contain"),
        s"expected an injected bloom-filter probe in:\n$opt")
      // the filter is a pure pruning aid: result must match the
      // filter-free plan
      spark.conf.set(keys(0), "false")
      val plain = li.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(sum("l_quantity").as("q"))
      assert(j.collect().toSeq == plain.collect().toSeq)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("q_bloom_join ships with the probe in ITS plan (gate query, not just the mechanism)") {
    val df = graft.queries.Relational.queries("q_bloom_join")(
      spark, "/root/testdata/sf0.001")
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("might_contain"),
      s"expected the injected bloom probe in q_bloom_join's plan:\n$opt")
    // and the child-session conf scoping leaves the parent untouched
    assert(spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      != "0")
  }
}
