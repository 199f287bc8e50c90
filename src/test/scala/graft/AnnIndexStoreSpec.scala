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

  test("s_ivf_store_probe scans the artifact with a cid PartitionFilter " +
      "and matches s_ivf_ann") {
    val probe = Similarity.queries("s_ivf_store_probe")(spark, dir)
    val plan = probe.queryExecution.executedPlan.toString
    // the cells scan must carry the probe's cid set as a PARTITION
    // filter (directory pruning), not a post-scan data filter
    assert(plan.contains("PartitionFilters: [cid"),
      s"expected cid PartitionFilters in:\n$plan")
    val viaStore = probe.collect().toSeq
    val inSession = Similarity.queries("s_ivf_ann")(spark, dir).collect().toSeq
    assert(viaStore == inSession)
  }

  test("readCells prunes to exactly the requested cell ids") {
    val (cents, cells) = Similarity.buildIvfIndex(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivf-rc").toString
    AnnIndexStore.write(tmp, cents, cells)
    val cids = cents.select("cid").orderBy("cid").limit(2)
      .collect().map(_.getLong(0)).toSeq
    val pruned = AnnIndexStore.readCells(spark, tmp, cids)
    assert(pruned.select("cid").distinct().collect().map(_.getLong(0)).toSet
      == cids.toSet)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cid"),
      s"expected cid PartitionFilters in:\n$plan")
  }

  test("ANN query results memoize per (session, corpus): same instance " +
      "on re-call, so recall evals join cached frames") {
    val a = Similarity.queries("s_lsh_ann")(spark, dir)
    val b = Similarity.queries("s_lsh_ann")(spark, dir)
    assert(a eq b, "memoAnn must return the same persisted frame")
    CacheBook.release(spark, "s")
    val c = Similarity.queries("s_lsh_ann")(spark, dir)
    assert(!(a eq c), "release must evict the memo so a rebuild happens")
    CacheBook.release(spark, "s")
  }

  test("cell probe prunes the scan to the probed partitions") {
    val (cents, cells) = Similarity.buildIvfIndex(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivf-p").toString
    AnnIndexStore.write(tmp, cents, cells)
    val someCid = cents.select("cid").orderBy("cid").head().getLong(0)
    val live = graft.sources.StagedWrite.resolve(spark, tmp, "cells")
    val probe = spark.read.parquet(s"$live/cells").filter(col("cid") === someCid)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cid"),
      s"expected cid partition pruning in:\n$plan")
    assert(probe.count() > 0)
  }
}
