package graft

import java.nio.file.Files

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.queries.Dedup

/** d_allpairs claims EXACTNESS: prefix filtering (df-ascending global
  * token order) plus PPJoin's positional filter must find every pair at
  * Jaccard >= 0.5 corpus-wide — zero recall loss, unlike the banded /
  * blocked paths. This spec regenerates the result from the definition:
  * a full O(N²) self-join over the same 4-gram shingle relation with
  * `array_intersect` Jaccard, on a randomized corpus seeded with planted
  * near-dups (word-dropped twins) and exact twins. Any pair the filters
  * wrongly prune — a prefix-length off-by-one, a broken tie in the
  * (df, token) order, a positional bound that's too tight — shows up as
  * a missing pair here. */
class AllPairsSpec extends SparkSpec {
  import spark.implicits._

  private def shingle4 = org.apache.spark.sql.graftbridge.ColumnBridge.column(
    graft.functions.ShingleHashSet(
      org.apache.spark.sql.graftbridge.ColumnBridge.expression(
        split(col("text"), " ")), 4, 12))

  test("prefix+positional filtering equals brute force on a random corpus") {
    val rnd = new Random(20260815L)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi")
    def sentence(n: Int): String =
      Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")

    // base docs + near-dup twins (drop one word — J stays high) +
    // exact twins (J = 1) + unrelated chaff
    val base = (0 until 50).map(i => (i.toLong, sentence(25 + rnd.nextInt(25))))
    val near = base.take(15).map { case (id, text) =>
      val words = text.split(" ")
      val drop = rnd.nextInt(words.length)
      (id + 1000L, (words.take(drop) ++ words.drop(drop + 1)).mkString(" "))
    }
    val exact = base.slice(15, 25).map { case (id, text) => (id + 2000L, text) }
    val docs = (base ++ near ++ exact)
      .map { case (id, text) => (id, text, "en", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "n_chars")
    val dir = Files.createTempDirectory("allpairs").toString
    docs.write.parquet(s"$dir/documents.parquet")

    val got = Dedup.queries("d_allpairs")(spark, dir)
      .as[(Long, Long, Double)].collect().toSet

    val sh = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), shingle4.as("sh"))
    val expected = sh.as("x").join(sh.as("y"),
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        size(array_intersect(col("x.sh"), col("y.sh"))).as("inter"),
        size(col("x.sh")).as("sa"), size(col("y.sh")).as("sb"))
      .select(col("a"), col("b"),
        (col("inter") / (col("sa") + col("sb") - col("inter"))).as("jac"))
      .filter(col("jac") >= 0.5)
      .as[(Long, Long, Double)].collect().toSet

    assert(expected.size >= 20,
      s"corpus must plant a meaningful pair set, got ${expected.size}")
    assert(got == expected,
      s"missing=${expected -- got} extra=${got -- expected}")
  }

  test("prefix length and positional bound are integer-exact") {
    // the binary-exact-threshold claim: ceil(0.5*n) == (n+1) div 2 for
    // every size the corpus can produce, so no float enters the filters
    for (n <- 1 to 600)
      assert(math.ceil(0.5 * n).toLong == (n + 1) / 2, s"n=$n")
  }
}
