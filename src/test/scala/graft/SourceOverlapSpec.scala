package graft

import java.nio.file.Files

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.queries.Dedup

/** d_source_overlap teeth: the bottom-k (KMV) estimate must equal an
  * in-JVM recomputation of the same sketch algorithm over the same
  * 48-bit shingle hashes (pins the two-phase salted bottom-k against
  * the plain definition — the salt phase must be a strict superset of
  * the final k), and the estimator must behave: identical sources
  * estimate exactly 1.0, disjoint sources exactly 0.0, and a planted
  * half-overlap vocabulary lands near its true shingle-set Jaccard. */
class SourceOverlapSpec extends SparkSpec {
  import spark.implicits._

  private val K = 64

  private def shingleCol = org.apache.spark.sql.graftbridge.ColumnBridge.column(
    graft.functions.ShingleHashSet(
      org.apache.spark.sql.graftbridge.ColumnBridge.expression(
        split(col("text"), " ")), 3, 12))

  test("engine sketch == naive KMV; identical/disjoint/overlap teeth") {
    val rnd = new Random(20260816L)
    val p1 = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val p2 = Vector("eta", "theta", "iota", "kappa", "lambda", "mu")
    val p3 = Vector("nu", "xi", "omicron", "pi", "rho", "sigma")
    def sentence(pool: Vector[String], n: Int): String =
      Seq.fill(n)(pool(rnd.nextInt(pool.size))).mkString(" ")

    val a = (0 until 40).map(i => (i.toLong, sentence(p1 ++ p2, 30), "srcA"))
    val b = (100 until 140).map(i => (i.toLong, sentence(p2 ++ p3, 30), "srcB"))
    val c = a.zipWithIndex.map { case ((_, text, _), i) => (200L + i, text, "srcC") }
    val d = (300 until 340).map(i => (i.toLong, sentence(p3.map(_ + "x"), 30), "srcD"))
    // srcE: a strict subset of srcA's docs — containment is ASYMMETRIC
    val e = a.take(8).zipWithIndex.map { case ((_, text, _), i) => (400L + i, text, "srcE") }
    val docs = (a ++ b ++ c ++ d ++ e)
      .map { case (id, text, src) => (id, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = Files.createTempDirectory("overlap").toString
    docs.write.parquet(s"$dir/documents.parquet")

    val got = Dedup.queries("d_source_overlap")(spark, dir)
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap

    // naive KMV from the same hash relation
    val bypool: Map[String, Seq[Long]] = spark.read
      .parquet(s"$dir/documents.parquet")
      .select(col("source"), explode(shingleCol).as("h"))
      .distinct().as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted.take(K)).toMap
    val srcs = bypool.keys.toSeq.sorted
    val expected = (for {
      i <- srcs.indices; j <- (i + 1) until srcs.size
    } yield {
      val (sa, sb) = (bypool(srcs(i)).toSet, bypool(srcs(j)).toSet)
      val union = (sa ++ sb).toSeq.sorted.take(K)
      val hits = union.count(h => sa(h) && sb(h)).toLong
      val kk = union.size.toLong
      (srcs(i), srcs(j)) -> (kk, hits, hits * 1000000L / kk)
    }).toMap
    assert(got == expected)

    assert(got(("srcA", "srcC"))._3 == 1000000L) // identical text sets
    assert(got(("srcA", "srcD"))._3 == 0L)       // disjoint vocabularies
    // planted half-overlap: estimate within sketch noise of the exact J
    val all: Map[String, Set[Long]] = spark.read
      .parquet(s"$dir/documents.parquet")
      .select(col("source"), explode(shingleCol).as("h"))
      .distinct().as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exactJ = all("srcA").intersect(all("srcB")).size.toDouble /
      all("srcA").union(all("srcB")).size
    val est = got(("srcA", "srcB"))._3 / 1e6
    assert(math.abs(est - exactJ) < 0.2, s"est=$est exact=$exactJ")

    // containment asymmetry: srcE ⊂ srcA, so E→A contains fully while
    // A→E cannot; and the engine matches a naive recompute of both
    // directions from the same union-bottom-k membership rows
    val cont = Dedup.queries("d_containment")(spark, dir)
      .as[(String, String, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5, r._6, r._7)).toMap
    val contExpected = (for {
      i <- srcs.indices; j <- (i + 1) until srcs.size
    } yield {
      val (sa, sb) = (bypool(srcs(i)).toSet, bypool(srcs(j)).toSet)
      val union = (sa ++ sb).toSeq.sorted.take(K)
      val (ka, kb) = (union.count(sa).toLong, union.count(sb).toLong)
      val hits = union.count(h => sa(h) && sb(h)).toLong
      (srcs(i), srcs(j)) -> (ka, kb, hits,
        if (ka == 0) 0L else hits * 1000000L / ka,
        if (kb == 0) 0L else hits * 1000000L / kb)
    }).toMap
    assert(cont == contExpected)
    val ae = cont(("srcA", "srcE"))
    assert(ae._5 == 1000000L, s"E->A containment: $ae")
    assert(ae._4 < 1000000L, s"A->E containment: $ae")
  }

  test("salted two-phase bottom-k == plain bottom-k on random skewed data") {
    // the scale path's claim — each (source, salt) group's bottom-k is
    // a superset of its contribution to the final bottom-k — held
    // against the definition on randomized hash sets, including
    // negative hashes (pmod salting) and a source too small to fill k
    val rnd = new Random(20260816L)
    val rows = (
      (0 until 3000).map(_ => ("big", rnd.nextLong())) ++
      (0 until 200).map(_ => ("mid", rnd.nextLong())) ++
      (0 until 9).map(_ => ("tiny", rnd.nextLong()))
    ).toDF("source", "h")
    val salted = Dedup.kmvBottomK(rows, salted = true)
      .as[(String, Long)].collect().toSet
    val plain = Dedup.kmvBottomK(rows, salted = false)
      .as[(String, Long)].collect().toSet
    assert(salted == plain)
    // and both equal the definition
    val raw: Seq[(String, Long)] = rows.as[(String, Long)].collect().toSeq.distinct
    val expected = raw.groupBy(_._1).toSeq.flatMap { case (src, hs) =>
      hs.map(_._2).sorted.take(64).map(h => (src, h)) }.toSet
    assert(plain == expected)
  }
}
