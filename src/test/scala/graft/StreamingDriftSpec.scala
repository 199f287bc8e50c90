package graft

import graft.queries.{Relational, StreamingQueries}

/** st_drift's whole claim is that incrementally-maintained cells are
  * invisible in the end state: the streamed readout must equal the
  * batch chi-square row for row — any batch-boundary dependence in
  * the cell merge shows up here as a diverging count. */
class StreamingDriftSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("streamed drift readout equals the batch chi-square exactly") {
    val streamed = StreamingQueries.queries("st_drift")(spark, dir)
      .collect().map(_.toSeq).toSeq
    val batch = Relational.queries("q_chisq")(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }
}
