package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Determinism

/** Pack F — text analysis over `documents`, the per-document scoring
  * stage of a training-data pipeline. All scalar expressions: scales with
  * the scan, no shuffle except final ordering; each has a bit-identical
  * DuckDB oracle (double math written in the same left-to-right shape on
  * both sides so IEEE results agree exactly).
  */
object TextAnalysis {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  // shared pieces ------------------------------------------------------

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "on")
  private val stopSqlList = stopwords.map(w => s"'$w'").mkString(", ")

  private def wordsCol: Column = split(col("text"), " ")
  private val bpeish = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** Word k-shingles as an array column; <k words yields one shingle. */
  private def shingles(words: Column, k: Int): Column =
    transform(
      sequence(lit(0), greatest(size(words) - k, lit(0))),
      i => concat_ws(" ", slice(words, i + 1, lit(k))))
  private def sqlShingles(w: String, k: Int): String =
    s"""list_transform(range(0, greatest(len($w) - $k, 0) + 1),
        i -> array_to_string($w[CAST(i+1 AS INT):CAST(i+$k AS INT)], ' '))"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // whitespace tokens + BPE-ish regex tokens + chars
    "x_token_count" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        size(wordsCol).as("n_ws"),
        size(regexp_extract_all(col("text"), lit(bpeish), lit(0))).as("n_bpe"),
        length(col("text")).as("len"))
        .orderBy("doc_id")),

    // quality score: length saturation + stopword density. Computed in
    // INTEGER micro-units with one final /1e6 — engines disagree on
    // round() tie-breaking for doubles (Spark shortest-repr HALF_UP vs
    // DuckDB multiply-and-round), so no double is ever rounded here.
    "x_quality" -> ((s, dir) => {
      val w = wordsCol
      val nWords = size(w)
      val nStop = size(filter(w, x => x.isInCollection(stopwords)))
      val nPunct = length(regexp_replace(col("text"), "[^.,;:!?]", ""))
      docs(s, dir).select(
        col("doc_id"),
        nWords.as("n_words"),
        nStop.as("n_stop"),
        ((least(length(col("text")), lit(500)) * 1000L
          + floor(nStop * lit(500000L) / nWords)) / 1000000.0).as("quality"),
        (floor(nPunct * lit(1000000L) / length(col("text"))) / 1000000.0).as("punct_ratio"))
        .orderBy("doc_id")
    }),

    // language ID: stopword-marker counts, argmax w/ fixed priority.
    "x_langid" -> ((s, dir) => {
      val w = wordsCol
      def cnt(markers: Seq[String]) = size(filter(w, x => x.isInCollection(markers)))
      val cEn = cnt(Seq("the", "and", "of"))
      val cEs = cnt(Seq("el", "la", "de"))
      val cDe = cnt(Seq("der", "und", "das"))
      val cFr = cnt(Seq("le", "et", "les"))
      val g = greatest(cEn, cEs, cDe, cFr)
      docs(s, dir).select(
        col("doc_id"), col("lang"),
        when(cEn === g, "en").when(cEs === g, "es")
          .when(cDe === g, "de").otherwise("fr").as("pred_lang"))
        .orderBy("doc_id")
    }),

    // fingerprint: min 48-bit hash over word 5-shingles (winnowing
    // flavor — the min-hash IS the document sketch).
    "x_fingerprint" -> ((s, dir) => {
      val sh = shingles(wordsCol, 5)
      docs(s, dir).select(
        col("doc_id"),
        array_min(transform(sh, x => Determinism.md5IdxK(x, 12))).as("fp"),
        size(sh).as("n_shingles"))
        .orderBy("doc_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "x_token_count" ->
      s"""SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INT) AS n_ws,
           CAST(len(regexp_extract_all(text, '$bpeish')) AS INT) AS n_bpe,
           CAST(length(text) AS INT) AS len
         FROM documents ORDER BY doc_id""",

    "x_quality" ->
      s"""SELECT doc_id,
           CAST(len(w) AS INT) AS n_words,
           CAST(len(list_filter(w, x -> x IN ($stopSqlList))) AS INT) AS n_stop,
           ((least(length(text), 500) * 1000
             + floor(len(list_filter(w, x -> x IN ($stopSqlList))) * 500000 / len(w)))
            / 1000000.0) AS quality,
           (floor(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) * 1000000
             / length(text)) / 1000000.0) AS punct_ratio
         FROM (SELECT *, string_split(text, ' ') AS w FROM documents) ORDER BY doc_id""",

    "x_langid" ->
      """SELECT doc_id, lang,
           CASE WHEN c_en = g THEN 'en' WHEN c_es = g THEN 'es'
                WHEN c_de = g THEN 'de' ELSE 'fr' END AS pred_lang
         FROM (
           SELECT doc_id, lang,
             len(list_filter(w, x -> x IN ('the','and','of'))) AS c_en,
             len(list_filter(w, x -> x IN ('el','la','de'))) AS c_es,
             len(list_filter(w, x -> x IN ('der','und','das'))) AS c_de,
             len(list_filter(w, x -> x IN ('le','et','les'))) AS c_fr,
             greatest(
               len(list_filter(w, x -> x IN ('the','and','of'))),
               len(list_filter(w, x -> x IN ('el','la','de'))),
               len(list_filter(w, x -> x IN ('der','und','das'))),
               len(list_filter(w, x -> x IN ('le','et','les')))) AS g
           FROM (SELECT *, string_split(text, ' ') AS w FROM documents))
         ORDER BY doc_id""",

    "x_fingerprint" ->
      s"""SELECT doc_id,
           CAST(list_aggregate(list_transform(sh, x -> ${Determinism.sqlMd5IdxK("x", 12)}), 'min') AS BIGINT) AS fp,
           CAST(len(sh) AS INT) AS n_shingles
         FROM (SELECT doc_id, ${sqlShingles("string_split(text, ' ')", 5)} AS sh
               FROM documents) ORDER BY doc_id"""
  )
}
