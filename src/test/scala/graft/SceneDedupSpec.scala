package graft

/** Scene-keyframe video dedup (m_scene_dedup): the twin video shares
  * every scene with its base (same frame stream, keyframes retouched
  * at one patch), so for each base video every one of its scenes must
  * pair with the same scene of the twin, cross-video, at dist <= 2 —
  * while unrelated videos' keyframes (independent 64-bit fingerprints)
  * essentially never collide. */
class SceneDedupSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("every scene of a video pairs with the same scene of its twin") {
    import spark.implicits._
    val scenes = queries.MultimodalQueries.queries("m_scenes")(spark, dir)
      .select("doc_id", "scene_id").as[(Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val pairs = queries.MultimodalQueries.queries("m_scene_dedup")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3), r.getInt(4)))

    // the shared-scene synthetic pair: base video v and twin v+100000
    // must pair scene-for-scene (aligned ids — same cut trajectory)
    val twinPairs = pairs.collect {
      case (va, sa, vb, sb, d) if vb == va + 100000L => (va, sa, sb, d)
    }
    val byVideo = twinPairs.groupBy(_._1)
    val missing = scenes.keys.flatMap { v =>
      scenes(v).flatMap { sid =>
        val hit = byVideo.getOrElse(v, Array.empty).exists(p =>
          p._2 == sid && p._3 == sid)
        if (hit) None else Some((v, sid))
      }
    }
    assert(missing.isEmpty,
      s"${missing.size} shared scenes not recalled (e.g. ${missing.take(3).mkString(",")})")
    // the retouch is one patch: aligned twin pairs stay within dist 2
    assert(twinPairs.filter(p => p._2 == p._3).forall(_._4 <= 2))

    // discriminativeness: pairs between UNRELATED videos (not a
    // base/twin couple) are md5 flukes — a vanishing fraction
    val unrelated = pairs.count { case (va, _, vb, _, _) =>
      vb != va + 100000L && va != vb + 100000L
    }
    assert(unrelated.toDouble / pairs.length < 0.02,
      s"$unrelated/${pairs.length} pairs between unrelated videos")
    CacheBook.releaseAll(spark)
  }
}
