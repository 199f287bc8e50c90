package graft

import java.security.MessageDigest

/** m_scenes teeth independent of the SQL oracle: the distributed
  * window/segment pipeline must equal a naive in-JVM scene segmentation
  * running the SAME per-frame level function (md5-derived integer
  * levels, cut at |Δ| ≥ 128, running cut count = scene id) on the real
  * sf0.001 corpus; and the segmentation must have teeth — multi-scene
  * videos exist, and per-video scene lengths sum to the frame count.
  */
class SceneCutSpec extends SparkSpec {
  import spark.implicits._

  private def md5Hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(bytes)
      .map(b => f"$b%02x").mkString
  private def idx6(hex: String): Long =
    java.lang.Long.parseLong(hex.substring(0, 6), 16)

  test("m_scenes == naive per-video cut segmentation") {
    val dir = "/root/testdata/sf0.001"
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()

    val expected = texts.flatMap { case (id, text) =>
      val h = md5Hex(text.getBytes("UTF-8"))
      val n = (1 + idx6(md5Hex((h + "f").getBytes("UTF-8"))) % 64).toInt
      val levels = (0 until n).map(i =>
        (idx6(md5Hex((h + "#" + i).getBytes("UTF-8"))) % 256).toInt)
      var sc = 0
      val sceneIds = levels.indices.map { i =>
        if (i > 0 && math.abs(levels(i) - levels(i - 1)) >= 128) sc += 1
        sc
      }
      // regroup: scene id -> (start frame, length)
      levels.indices.groupBy(sceneIds(_)).toSeq.map { case (sc, idxs) =>
        (id, sc, idxs.min, idxs.size.toLong)
      }
    }.toSet

    val got = graft.queries.MultimodalQueries.queries("m_scenes")(spark, dir)
      .as[(Long, Int, Int, Long)].collect().toSet
    assert(got == expected, s"diff=${(got diff expected).take(3)}")

    // teeth: cuts actually segment (some video has >= 3 scenes), and
    // scene lengths per video sum to the video's frame count
    assert(got.groupBy(_._1).values.exists(_.size >= 3))
    got.groupBy(_._1).foreach { case (id, scenes) =>
      val h = md5Hex(texts.find(_._1 == id).get._2.getBytes("UTF-8"))
      val n = 1 + idx6(md5Hex((h + "f").getBytes("UTF-8"))) % 64
      assert(scenes.toSeq.map(_._4).sum == n)
    }
  }
}
