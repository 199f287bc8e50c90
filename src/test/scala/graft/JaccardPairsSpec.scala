package graft

import java.nio.file.Files

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.queries.Dedup

/** The blocked-Jaccard verify is a hand-written per-block merge loop
  * (collect block → local two-pointer intersect with an early-exit
  * bound). This spec regenerates its result from INDEPENDENT pieces —
  * a plain Spark self-join over the same blocks with
  * `array_intersect`-based Jaccard — on a randomized corpus seeded
  * with planted near-dups, and requires exact (a, b, jac) equality.
  * Guards: the early-exit bound must never drop a qualifying pair or
  * corrupt a reported jac value, and the block/sub-block keys must
  * match the join formulation. */
class JaccardPairsSpec extends SparkSpec {
  import spark.implicits._

  private def shingleCol = org.apache.spark.sql.graftbridge.ColumnBridge.column(
    graft.functions.ShingleHashSet(
      org.apache.spark.sql.graftbridge.ColumnBridge.expression(
        split(col("text"), " ")), 3, 12))

  test("block-local merge equals the self-join formula on a random corpus") {
    val rnd = new Random(20260812L)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    def sentence(n: Int): String = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")

    // base docs + planted near-dups (append/drop a word) + exact twins
    val base = (0 until 60).map { i =>
      val lang = if (rnd.nextBoolean()) "en" else "es"
      (i.toLong, sentence(20 + rnd.nextInt(30)), lang)
    }
    val mutated = base.filter(_ => rnd.nextBoolean()).take(20).map { case (id, text, lang) =>
      val words = text.split(" ")
      val drop = rnd.nextInt(words.length)
      (id + 1000L, (words.take(drop) ++ words.drop(drop + 1)).mkString(" ")
        + " " + vocab(rnd.nextInt(vocab.size)), lang)
    }
    val docs = (base ++ mutated)
      .map { case (id, text, lang) => (id, text, lang, text.length) }
      .toDF("doc_id", "text", "lang", "n_chars")
    val dir = Files.createTempDirectory("jacspec").toString
    docs.write.parquet(s"$dir/documents.parquet")

    val got = Dedup.queries("d_ngram_jaccard")(spark, dir)
      .as[(Long, Long, Double)].collect().toSet

    // independent formulation: plain self-join over the same blocks
    val sh = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"), expr("n_chars div 100").as("lb"),
        shingleCol.as("sh"))
    val b = Dedup.boundedBlocks(sh, 2000L)
    val expected = b.as("x").join(b.as("y"),
        col("x.lang") === col("y.lang") && col("x.lb") === col("y.lb")
          && col("x.sub") === col("y.sub") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        size(array_intersect(col("x.sh"), col("y.sh"))).as("inter"),
        size(col("x.sh")).as("sa"), size(col("y.sh")).as("sb"))
      .select(col("a"), col("b"),
        (col("inter") / (col("sa") + col("sb") - col("inter"))).as("jac"))
      .filter(col("jac") >= 0.2)
      .as[(Long, Long, Double)].collect().toSet

    assert(expected.nonEmpty, "corpus must plant at least one qualifying pair")
    assert(got == expected,
      s"missing=${expected -- got} extra=${got -- expected}")
  }

  test("the band curve conserves the pair relation it tunes") {
    val dir = "/root/testdata/sf0.001"
    val pairs = Dedup.queries("d_ngram_jaccard")(spark, dir).collect()
    val bands = Dedup.queries("d_jaccard_bands")(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(bands.map(_._2).sum == pairs.length.toLong,
      "bands lose pairs — the curve would mis-tune the threshold")
    for ((band, _, lo, hi) <- bands) {
      assert(lo <= hi && band >= 2 && band <= 10, s"band $band range")
      assert(math.floor(lo * 10).toInt == band || lo * 10 == band.toDouble,
        s"band $band holds a pair below its floor: $lo")
    }
  }
}
