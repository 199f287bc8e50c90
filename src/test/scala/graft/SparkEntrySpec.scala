package graft

import org.scalatest.funsuite.AnyFunSuite

class SparkEntrySpec extends AnyFunSuite {

  test("query names are unique across packs (map ++ would silently drop dups)") {
    val packs = Seq(
      graft.queries.SliceQueries.queries, graft.queries.Relational.queries,
      graft.queries.TransformQueries.queries, graft.queries.TextAnalysis.queries,
      graft.queries.Dedup.queries, graft.queries.Similarity.queries,
      graft.queries.MultimodalQueries.queries, graft.queries.StreamingQueries.queries,
      graft.queries.Curation.queries, graft.queries.PipelineQueries.queries)
    val all = packs.flatMap(_.keys)
    val dups = all.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query names: $dups")
    assert(SparkEntry.queries.size == all.size)
  }

  test("every registered query has an oracle") {
    val missing =
      SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without a query: $orphans")
  }
}
