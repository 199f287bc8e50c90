package graft

import org.apache.spark.sql.functions._

import graft.operators.{SliceRoot, Slicer}
import graft.plans.{Reference, SchemaGraph, TableDef}
import graft.sources.SliceWriter

/** The bucketed-layout slice dump (SliceWriter.writeBucketed): a slice
  * landed as co-bucketed managed tables, so downstream fact-fact joins
  * on the bucket key plan with no shuffle exchange — the DEPLOY.md
  * "Joins" recipe made a one-call writer. */
class SliceBucketedSpec extends SparkSpec {
  import spark.implicits._

  private val graph = SchemaGraph(
    tables = Seq(TableDef("bord", Seq("oid")), TableDef("bline", Seq("lid"))),
    references = Seq(Reference("lo", "bline", Seq("oid"), "bord", Seq("oid"))))

  private val tables = Map(
    "bord" -> (1L to 200L).map(i => (i, s"o$i")).toDF("oid", "tag"),
    "bline" -> (1L to 600L).map(i => (i, i % 200 + 1, i * 10)).toDF("lid", "oid", "qty"))

  test("writeBucketed lands co-located tables; the fact join plans no shuffle") {
    val r = new Slicer(graph, tables(_)).run(Seq(SliceRoot("bord", "oid <= 150")))
    try {
      // bline's slice key is lid; override to its JOIN key oid so the
      // restored layout co-locates with bord
      SliceWriter.writeBucketed(r, "slice_bkt", 4,
        bucketKeys = Map("bline" -> Seq("oid")),
        scrub = (t, df) =>
          if (t == "bord") df.withColumn("tag", upper(col("tag"))) else df)

      val ord = spark.table("slice_bkt.bord")
      val line = spark.table("slice_bkt.bline")
      // contents = the slice's rows (scrub applied while dumping)
      assert(ord.count() == 150)
      assert(ord.filter(col("tag") === "O7").count() == 1, "scrub ran during dump")
      assert(line.count() == r.rows("bline").count())

      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = ord.join(line, "oid")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"co-bucketed slice join must not shuffle:\n$plan")
      assert(joined.count() == line.count(), "every sliced line matches its order")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS slice_bkt.bord")
      spark.sql("DROP TABLE IF EXISTS slice_bkt.bline")
      spark.sql("DROP DATABASE IF EXISTS slice_bkt")
    }
  }
}
