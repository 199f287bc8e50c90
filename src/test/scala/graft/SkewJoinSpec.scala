package graft

import graft.operators.SkewJoin

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals the plain join, spread over salt partitions") {
    // hot key: 900 of 1000 rows share key 1
    val large = (1 to 1000).map(i => (if (i <= 900) 1 else i, i.toLong))
      .toDF("k", "id")
    val small = Seq((1, "hot"), (950, "cold")).toDF("k", "v")
    val plain = large.join(small, "k").select("id", "v")
      .as[(Long, String)].collect().toSet
    val salted = SkewJoin.salted(large, small, "k", "id", salts = 8)
      .select("id", "v").as[(Long, String)].collect().toSet
    assert(salted == plain)
    assert(plain.count(_._2 == "hot") == 900)
  }
}
