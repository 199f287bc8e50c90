package graft

import graft.queries.Relational

/** q_scd2 / q_zorder structural contracts the full oracles don't
  * spell out: SCD2 conserves facts (every purchase at-or-after its
  * user's first signup attributes to EXACTLY one version; exactly one
  * current version per user), and the z-order layout actually
  * localizes — mean z-block bounding-box area is a small fraction of
  * the grid, far below what a single-key lexicographic layout gives
  * the trailing dimension. */
class Scd2ZorderSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("SCD2 attributes each covered purchase exactly once") {
    val ev = Tables.load(spark, dir, "events")
      .select("user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2)))
    val firstSignup = ev.filter(_._2 == "signup").groupBy(_._1)
      .map { case (u, g) => u -> g.map(_._3).min }
    val covered = ev.filter(_._2 == "purchase").count { case (u, _, ts) =>
      firstSignup.get(u).exists(f => !ts.before(f))
    }

    val rows = Relational.queries("q_scd2")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(3), r.getLong(4)))
    assert(rows.map(_._4).sum == covered,
      s"fact conservation broken: attributed ${rows.map(_._4).sum} != covered $covered")
    // exactly one open (current) version per user
    val curByUser = rows.filter(_._3).groupBy(_._1).view.mapValues(_.length)
    assert(curByUser.values.forall(_ == 1) &&
      curByUser.keySet == firstSignup.keySet)
    // versions number 1..n densely per user
    for ((u, g) <- rows.groupBy(_._1))
      assert(g.map(_._2).sorted.toSeq == (1 to g.length))
  }

  test("z-blocks localize both dimensions of the grid") {
    val blocks = Relational.queries("q_zorder")(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(6)))  // n_rows, bbox_area
    val rows = blocks.map(_._1).sum
    // weighted mean bbox area per row; full grid is 256*256 = 65536
    val meanArea = blocks.map { case (n, a) => n.toDouble * a }.sum / rows
    assert(meanArea < 65536 / 16.0,
      s"z-layout has no locality: weighted mean bbox $meanArea")
    // every block's bbox is a bounded rectangle in BOTH dims — the
    // property a lexicographic (gx, gy) sort lacks for gy: the top 8
    // morton bits pin gx[7:4] and gy[7:4], so a block spans <= 16x16
    assert(blocks.forall(_._2 <= 16 * 16),
      "a z-block spans more than the 16x16 rectangle its prefix implies")
  }
}
