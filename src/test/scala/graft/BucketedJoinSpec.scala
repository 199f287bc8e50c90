package graft

import org.apache.spark.sql.functions._

/** The co-located-join posture made concrete: two tables bucketed on
  * the join key join WITHOUT a shuffle exchange — at 100 TB this is the
  * difference between a metadata-cheap join and re-shuffling both fact
  * tables every query. */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("join between co-bucketed tables plans no shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      (1L to 1000L).map(i => (i % 100, i)).toDF("k", "a")
        .write.mode("overwrite").bucketBy(8, "k").sortBy("k")
        .saveAsTable("bucketed_left")
      (1L to 500L).map(i => (i % 100, i * 2)).toDF("k", "b")
        .write.mode("overwrite").bucketBy(8, "k").sortBy("k")
        .saveAsTable("bucketed_right")

      val joined = spark.table("bucketed_left")
        .join(spark.table("bucketed_right"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == 1000L * 5) // 10 left x 5 right per key... sanity below
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS bucketed_left")
      spark.sql("DROP TABLE IF EXISTS bucketed_right")
    }
  }
}
