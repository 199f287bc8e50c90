package graft

import org.apache.spark.sql.functions._

import graft.queries.Similarity
import graft.sources.AnnIndexStore

/** Build-once/query-many: the persisted IVF index answers identically
  * to the in-session build, and its cid-partitioned layout prunes a
  * probe's scan to the probed cells' directories. */
class AnnIndexStoreSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("IVF index round-trips through parquet and answers identically") {
    val (cents, cells) = Similarity.buildIvfIndex(spark, dir)
    val fresh = Similarity.queryIvf(spark, dir, cents, cells).collect().toSeq
    assert(fresh.nonEmpty)
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    AnnIndexStore.write(tmp, cents, cells)
    val (c2, a2) = AnnIndexStore.read(spark, tmp)
    val reloaded = Similarity.queryIvf(spark, dir, c2, a2).collect().toSeq
    assert(reloaded == fresh)
  }

  test("cell probe prunes the scan to the probed partitions") {
    val (cents, cells) = Similarity.buildIvfIndex(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivf-p").toString
    AnnIndexStore.write(tmp, cents, cells)
    val someCid = cents.select("cid").orderBy("cid").head().getLong(0)
    val probe = spark.read.parquet(s"$tmp/cells").filter(col("cid") === someCid)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cid"),
      s"expected cid partition pruning in:\n$plan")
    assert(probe.count() > 0)
  }
}
