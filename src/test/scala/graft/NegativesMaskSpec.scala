package graft

import graft.functions.Determinism
import graft.queries.{Similarity, TextAnalysis}

/** s_negatives / x_mask_spans structural teeth beyond the full
  * oracles: negatives stay strictly below the positive threshold with
  * dense per-kind ranks and JVM-reproducible random draws; masking
  * round-trips — substituting each sentinel's target span back into
  * the input reconstructs the original document exactly. */
class NegativesMaskSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("negatives sit below the positive band with dense ranks and reproducible draws") {
    val rows = Similarity.queries("s_negatives")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getInt(4)))
    assert(rows.nonEmpty)
    // no self-pairs; every pair strictly below the near-dup threshold
    for ((q, cand, _, cm, _) <- rows) {
      assert(cand != q)
      assert(cm < Similarity.RangeTauMicro,
        s"pair ($q,$cand) at $cm is a positive, not a negative")
    }
    // both kinds fire; ranks are dense 1..n per (q, kind), ordered by cos desc
    val kinds = rows.map(_._3).toSet
    assert(kinds == Set("hard", "random"))
    for (((_, kind), g) <- rows.groupBy(r => (r._1, r._3))) {
      val sorted = g.sortBy(_._5)
      assert(sorted.map(_._5).toSeq == (1 to g.length))
      assert(sorted.map(-_._4).toSeq == sorted.map(-_._4).sorted.toSeq,
        "ranks not ordered by cos_micro desc")
      if (kind == "hard") assert(g.length <= Similarity.HardNegK)
    }
    // every random cand is one of the deterministic md5 draws for its q
    val nVecs = Tables.load(spark, dir, "embeddings").count()
    for ((q, cand, kind, _, _) <- rows if kind == "random") {
      val draws = (0 until Similarity.RandNegK)
        .map(j => Determinism.jvmMd5Idx(s"rng#$q#$j") % nVecs).toSet
      assert(draws.contains(cand), s"random cand $cand for q=$q not a draw")
    }
  }

  test("mask spans round-trip to the original text") {
    val texts = Tables.load(spark, dir, "documents").select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = TextAnalysis.queries("x_mask_spans")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getString(4), r.getString(5)))
    assert(rows.length == texts.size)
    val Sent = "<extra_id_(\\d+)>".r
    var masked = 0L; var words = 0L
    for ((id, nW, nSp, nM, input, target) <- rows) {
      // parse target into sentinel -> span words
      val parts = Sent.split(target).toList match {
        case "" :: rest => rest
        case other => other // no leading sentinel only if no spans
      }
      val ids = Sent.findAllMatchIn(target).map(_.group(1).toInt).toList
      assert(ids == (0 until nSp).toList, s"doc $id: sentinel ids $ids")
      val spans = ids.zip(parts.map(_.trim)).toMap
      val spanWords = spans.values.map(_.split(" ", -1).length).sum
      assert(nSp == 0 || spanWords == nM,
        s"doc $id: target words $spanWords != n_masked $nM")
      // substitute each sentinel back into the input
      val rebuilt = Sent.replaceAllIn(input,
        m => java.util.regex.Matcher.quoteReplacement(spans(m.group(1).toInt)))
      assert(rebuilt == texts(id), s"doc $id: round-trip mismatch")
      assert(nW == texts(id).split(" ", -1).length)
      masked += nM; words += nW
    }
    // the gate actually masks a plausible fraction corpus-wide
    val ratio = masked.toDouble / words
    assert(ratio > 0.05 && ratio < 0.35, s"noise density off: $ratio")
  }
}
