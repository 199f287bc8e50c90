package graft

import org.apache.spark.sql.Row

import graft.functions.Determinism

/** Naive-JVM references for the learned quality classifier (x_qclf)
  * and per-detector coverage for the PII release-gate trio
  * (x_redact_pii): phone, IPv4, card + integer Luhn. */
class QclfPiiSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def rows(name: String): Map[Long, Row] =
    SparkEntry.queries(name)(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap

  test("x_qclf matches a plain-Scala hashed-linear scorer doc by doc") {
    import spark.implicits._
    val texts = graft.Tables.load(spark, dir, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = rows("x_qclf")
    // the full fasttext-style pipeline, re-derived naively: unigram +
    // bigram shingles, 48-bit md5 feature hash, 512-bucket fold,
    // embedded weight lookup, truncated-mean micro score
    for (id <- Seq(1L, 7L, 42L, 123L, 499L)) {
      val words = texts(id).split(" ", -1).toSeq
      val shingles = words ++
        (if (words.size < 2) Seq(words.mkString(" "))
         else words.sliding(2).map(_.mkString(" ")).toSeq)
      val ws = shingles.map { sh =>
        val b = (Determinism.jvmMd5Idx(sh, 12) % 512).toInt
        graft.queries.TextAnalysis.qclfWeights(b)
      }
      val want = ws.sum / ws.size
      val r = got(id)
      assert(r.getAs[Int]("n_feats") == ws.size, s"doc $id n_feats")
      assert(r.getAs[Long]("qclf_micro") == want, s"doc $id score")
      assert(r.getAs[Int]("kept") == (if (want >= 1000000L) 1 else 0))
      assert(r.getAs[Long]("margin_micro") == want - 1000000L)
    }
  }

  test("x_qclf_auc equals a naive midrank AUC + confusion replay") {
    import spark.implicits._
    // per-doc (score, label, pred) from the gate queries themselves —
    // the eval must grade THE deployed scorer and THE deployed label
    val scores = SparkEntry.queries("x_qclf")(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("qclf_micro"), r.getAs[Int]("kept"))).toMap
    val labels = SparkEntry.queries("x_gopher_filter")(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("keep")).toMap
    assert(scores.keySet == labels.keySet)
    val j = scores.toSeq.map { case (id, (s, p)) => (s, labels(id), p) }
    // midrank AUC: rank-sum of positives over the tie-grouped scores
    val sorted = j.map(_._1).distinct.sorted
    val byScore = j.groupBy(_._1)
    var r0 = 0L; var r2p = BigInt(0)
    for (s <- sorted) {
      val g = byScore(s); val c = g.size; val ca = g.count(_._2 == 1)
      r2p += BigInt(ca) * (2 * r0 + c + 1); r0 += c
    }
    val nPos = j.count(_._2 == 1).toLong
    val nNeg = j.size - nPos
    val aucPpm = ((BigInt(1000000) * (r2p - BigInt(nPos) * (nPos + 1))) /
      (2 * BigInt(nPos).max(1) * BigInt(nNeg).max(1))).toLong
    val tp = j.count(t => t._2 == 1 && t._3 == 1).toLong
    val fp = j.count(t => t._2 == 0 && t._3 == 1).toLong
    val fn = j.count(t => t._2 == 1 && t._3 == 0).toLong
    val got = SparkEntry.queries("x_qclf_auc")(spark, dir).collect()(0)
    assert(got.getAs[Long]("n_pos") == nPos && got.getAs[Long]("n_neg") == nNeg)
    assert(got.getAs[Long]("auc_ppm") == aucPpm, "auc")
    assert(got.getAs[Long]("tp") == tp && got.getAs[Long]("fp") == fp &&
      got.getAs[Long]("fn") == fn)
    assert(got.getAs[Long]("precision_ppm") ==
      1000000L * tp / math.max(1L, tp + fp))
    assert(got.getAs[Long]("recall_ppm") ==
      1000000L * tp / math.max(1L, tp + fn))
    // a fluency-trained scorer must beat coin-flip against the rule label
    assert(got.getAs[Long]("auc_ppm") > 500000L, s"auc ${got.getAs[Long]("auc_ppm")}")
  }

  test("x_qclf weights are nonnegative (cross-engine division contract)") {
    // Spark `div` truncates toward zero, DuckDB `//` floors — the
    // per-doc mean agrees across engines only because every weight
    // (hence every sum) is >= 0. A negative weight would reintroduce
    // the divergence silently.
    assert(graft.queries.TextAnalysis.qclfWeights.forall(_ >= 0L))
    assert(graft.queries.TextAnalysis.qclfWeights.length == 512)
  }

  test("x_redact_pii: every detector fires on its stratum and nowhere else") {
    val got = rows("x_redact_pii")
    // doc 0 sits in every stratum: all five detectors fire at once
    val d0 = got(0L)
    assert(d0.getAs[Int]("n_emails") == 1 && d0.getAs[Int]("n_urls") == 1)
    assert(d0.getAs[Int]("n_phones") == 1 && d0.getAs[Int]("n_ips") == 1)
    assert(d0.getAs[Int]("n_cards") == 2 && d0.getAs[Int]("n_cards_luhn") == 1)
    assert(d0.getAs[String]("redacted").endsWith(
      " contact <EMAIL> or <URL> call <PHONE> from <IP> card <CARD> or card <CARD>"))
    // single-stratum docs: exactly one detector kind fires
    val d49 = got(49L) // 49 = 7*7: phone only
    assert(d49.getAs[Int]("n_phones") == 1 && d49.getAs[Int]("n_emails") == 0
      && d49.getAs[Int]("n_ips") == 0 && d49.getAs[Int]("n_cards") == 0)
    val d121 = got(121L) // 11*11: cards only — and Luhn keeps just one
    assert(d121.getAs[Int]("n_cards") == 2 && d121.getAs[Int]("n_cards_luhn") == 1
      && d121.getAs[Int]("n_phones") == 0)
    val d81 = got(81L) // 3^4: ip only (81 % 9 == 0, not 5/7/11)
    assert(d81.getAs[Int]("n_ips") == 1 && d81.getAs[Int]("n_cards") == 0)
    // an untouched doc reports zero everywhere and unmodified text
    val d1 = got(1L)
    for (c <- Seq("n_emails", "n_urls", "n_phones", "n_ips", "n_cards",
        "n_cards_luhn"))
      assert(d1.getAs[Int](c) == 0, s"doc 1 $c")
    assert(!d1.getAs[String]("redacted").contains("<"))
  }

  test("the Luhn checksum discriminates: classic valid PAN passes, +1 fails") {
    // reference implementation straight from the spec (double every
    // second digit from the right, subtract 9 past 9)
    def luhnOk(s: String): Boolean = {
      val sum = s.reverse.zipWithIndex.map { case (ch, i) =>
        val d = ch - '0'
        if (i % 2 == 1) { val dd = 2 * d; if (dd > 9) dd - 9 else dd } else d
      }.sum
      sum % 10 == 0
    }
    assert(luhnOk("4111111111111111"))
    assert(!luhnOk("4111111111111112"))
    // and the deployed pipeline agrees (doc 0 carries exactly this pair)
    assert(rows("x_redact_pii")(0L).getAs[Int]("n_cards_luhn") == 1)
  }
}
