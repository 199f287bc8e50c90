package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Transforms._

/** Pack B — scrub transforms, each wired to a real column of the test
  * corpus and mirrored bit-for-bit by DuckDB oracle SQL. */
object TransformQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t_given_name" -> ((s, dir) =>
      t(s, dir, "customer").select(col("c_custkey"), givenName(col("c_name")).as("scrubbed"))
        .orderBy("c_custkey")),

    "t_surname" -> ((s, dir) =>
      t(s, dir, "supplier").select(col("s_suppkey"), surname(col("s_name")).as("scrubbed"))
        .orderBy("s_suppkey")),

    "t_city" -> ((s, dir) =>
      t(s, dir, "nation").select(col("n_nationkey"), city(col("n_name")).as("scrubbed"))
        .orderBy("n_nationkey")),

    "t_us_state" -> ((s, dir) =>
      t(s, dir, "customer").select(col("c_custkey"),
        usState(col("c_name")).as("state"), usStateAbbr(col("c_name")).as("abbr"))
        .orderBy("c_custkey")),

    "t_geozip" -> ((s, dir) =>
      t(s, dir, "customer").select(col("c_custkey"),
        lpad((col("c_custkey") % 100000).cast("string"), 5, "0").as("zip"),
        geozip(lpad((col("c_custkey") % 100000).cast("string"), 5, "0")).as("scrubbed"))
        .orderBy("c_custkey")),

    "t_address1" -> ((s, dir) =>
      t(s, dir, "customer").select(col("c_custkey"), address1(col("c_name")).as("scrubbed"))
        .orderBy("c_custkey")),

    "t_address2" -> ((s, dir) =>
      t(s, dir, "customer").select(col("c_custkey"), address2(col("c_name")).as("scrubbed"))
        .orderBy("c_custkey")),

    "t_alphanum" -> ((s, dir) =>
      t(s, dir, "customer").select(col("c_custkey"), alphanum(col("c_name")).as("scrubbed"))
        .orderBy("c_custkey")),

    // FPE scramble — the unique=true mode for key columns: injective
    // per (length, alphabet) class, reference parity, so distinct names
    // of one class stay distinct (AlphanumFpeSpec holds the property
    // per class; the oracle reproduces the whole cipher).
    "t_alphanum_unique" -> ((s, dir) =>
      t(s, dir, "customer").select(col("c_custkey"),
        alphanumUnique(col("c_name")).as("scrubbed"))
        .orderBy("c_custkey")),

    "t_words" -> ((s, dir) =>
      t(s, dir, "part").select(col("p_partkey"), words(col("p_name")).as("scrubbed"))
        .orderBy("p_partkey")),

    // Projected as yyyy-MM-dd STRING: a DATE column round-trips as
    // datetime.date via pyarrow but midnight-Timestamp via duckdb-pandas,
    // so a serialized compare sees '1998-12-20' vs '1998-12-20 00:00:00'.
    "t_date_year" -> ((s, dir) =>
      t(s, dir, "orders").select(col("o_orderkey"),
          date_format(dateYear(col("o_orderdate")), "yyyy-MM-dd").as("scrubbed"))
        .orderBy("o_orderkey")),

    "t_const" -> ((s, dir) =>
      t(s, dir, "customer").select(col("c_custkey"), const("REDACTED").as("scrubbed"))
        .orderBy("c_custkey")),

    "t_null" -> ((s, dir) =>
      t(s, dir, "customer").select(col("c_custkey"), nul.as("scrubbed"))
        .orderBy("c_custkey")),

    "t_replace" -> ((s, dir) =>
      t(s, dir, "customer").select(col("c_custkey"), replaceDigits(col("c_name")).as("scrubbed"))
        .orderBy("c_custkey")),

    // compose: digit-masking THEN class-preserving scramble, chained.
    "t_compose" -> ((s, dir) =>
      t(s, dir, "customer").select(col("c_custkey"),
        alphanum(replaceDigits(col("c_name"))).as("scrubbed"))
        .orderBy("c_custkey")),

    // incrementing-const scrub (common.py:66-85): 'member N' with the
    // counter advancing only over transformed rows; names containing
    // '9' are excluded and keep their value without consuming a number.
    "t_inc_const" -> ((s, dir) =>
      incConst(t(s, dir, "customer").select("c_custkey", "c_name"),
        "c_name", "member", Some("9"), "c_custkey")
        .orderBy("c_custkey")),

    "t_jsonpath" -> ((s, dir) =>
      t(s, dir, "events").select(col("event_id"), jsonK(col("props")).as("scrubbed"))
        .orderBy("event_id")),

    // per-instance pepper scoping (slice_db/transform.py:43-44): two
    // config-declared instances of the SAME transform type applied to
    // the SAME value scrub differently, because the config layer
    // derives the effective pepper as pepper + instance name.
    "t_scoped_pepper" -> ((s, dir) => {
      val cfg = graft.functions.ScrubConfig.fromJson(
        """{"transforms": {"member_name": "given_name", "contact_name": "given_name"},
           "tables": {"customer": {"name_a": "member_name", "name_b": "contact_name"}}}""")
      cfg("customer", t(s, dir, "customer").select(col("c_custkey"),
          col("c_name").as("name_a"), col("c_name").as("name_b")))
        .orderBy("c_custkey")
    }),

    // table-level scrub: several transformed columns in one pass.
    "t_table_scrub" -> ((s, dir) =>
      t(s, dir, "customer").select(
        col("c_custkey"),
        concat(givenName(col("c_name")), lit(" "), surname(col("c_name"))).as("name"),
        col("c_nationkey"),
        nul.as("acctbal"),
        const("SEGMENT").as("mktsegment"))
        .orderBy("c_custkey")),

    // k-anonymity / l-diversity AUDIT — the release gate a scrub
    // pipeline runs before shipping a slice: group the table by its
    // quasi-identifier tuple (nation, coarse balance bucket) and flag
    // every class that re-identifies (size < k) or is sensitive-value
    // homogeneous (distinct mktsegment < l). One map-side-combined
    // aggregation — the class table is the shuffle, never the rows —
    // so the audit costs one scan at any table size. Negative balances
    // bucket by floor division, identical in both engines.
    "t_kanon_audit" -> ((s, dir) =>
      t(s, dir, "customer")
        .select(col("c_nationkey").as("nation"),
          floor(col("c_acctbal") / lit(1000.0)).cast("long").as("bal_bucket"),
          col("c_mktsegment"))
        .groupBy("nation", "bal_bucket")
        .agg(count(lit(1)).as("class_size"),
          countDistinct("c_mktsegment").as("l_div"))
        .select(col("nation"), col("bal_bucket"), col("class_size"), col("l_div"),
          (col("class_size") < 5).as("k_risk"), (col("l_div") < 2).as("l_risk"))
        .orderBy("nation", "bal_bucket"))
  )

  val oracleSql: Map[String, String] = Map(
    "t_given_name" ->
      s"SELECT c_custkey, ${sqlGivenName("c_name")} AS scrubbed FROM customer ORDER BY c_custkey",
    "t_surname" ->
      s"SELECT s_suppkey, ${sqlSurname("s_name")} AS scrubbed FROM supplier ORDER BY s_suppkey",
    "t_city" ->
      s"SELECT n_nationkey, ${sqlCity("n_name")} AS scrubbed FROM nation ORDER BY n_nationkey",
    "t_us_state" ->
      s"""SELECT c_custkey, ${sqlUsState("c_name")} AS state,
          ${sqlUsStateAbbr("c_name")} AS abbr FROM customer ORDER BY c_custkey""",
    "t_geozip" ->
      s"""SELECT c_custkey, zip, ${sqlGeozip("zip")} AS scrubbed FROM
          (SELECT c_custkey, lpad(CAST(c_custkey % 100000 AS VARCHAR), 5, '0') AS zip
           FROM customer) ORDER BY c_custkey""",
    "t_address1" ->
      s"SELECT c_custkey, ${sqlAddress1("c_name")} AS scrubbed FROM customer ORDER BY c_custkey",
    "t_address2" ->
      s"SELECT c_custkey, ${sqlAddress2("c_name")} AS scrubbed FROM customer ORDER BY c_custkey",
    "t_alphanum" ->
      s"SELECT c_custkey, ${sqlAlphanum("c_name")} AS scrubbed FROM customer ORDER BY c_custkey",
    "t_alphanum_unique" ->
      sqlAlphanumUnique("c_custkey", "c_name", "customer"),
    "t_words" ->
      s"SELECT p_partkey, ${sqlWords("p_name")} AS scrubbed FROM part ORDER BY p_partkey",
    "t_date_year" ->
      s"SELECT o_orderkey, strftime(${sqlDateYear("o_orderdate")}, '%Y-%m-%d') AS scrubbed FROM orders ORDER BY o_orderkey",
    "t_const" ->
      "SELECT c_custkey, 'REDACTED' AS scrubbed FROM customer ORDER BY c_custkey",
    "t_null" ->
      "SELECT c_custkey, CAST(NULL AS VARCHAR) AS scrubbed FROM customer ORDER BY c_custkey",
    "t_replace" ->
      s"""SELECT c_custkey, ${sqlReplaceDigits("c_name")} AS scrubbed FROM customer ORDER BY c_custkey""",
    "t_compose" ->
      s"""SELECT c_custkey, ${sqlAlphanum("masked")} AS scrubbed FROM
          (SELECT c_custkey, ${sqlReplaceDigits("c_name")} AS masked FROM customer)
          ORDER BY c_custkey""",
    "t_inc_const" ->
      s"""SELECT c_custkey, ${sqlIncConst("c_name", "member", "9", "c_custkey")} AS c_name
          FROM customer ORDER BY c_custkey""",
    "t_jsonpath" ->
      s"SELECT event_id, ${sqlJsonK("props")} AS scrubbed FROM events ORDER BY event_id",
    "t_scoped_pepper" ->
      s"""SELECT c_custkey,
          ${sqlGivenName("c_name", Pepper + "member_name")} AS name_a,
          ${sqlGivenName("c_name", Pepper + "contact_name")} AS name_b
          FROM customer ORDER BY c_custkey""",
    "t_table_scrub" ->
      s"""SELECT c_custkey,
          (${sqlGivenName("c_name")} || ' ' || ${sqlSurname("c_name")}) AS name,
          c_nationkey, CAST(NULL AS VARCHAR) AS acctbal, 'SEGMENT' AS mktsegment
          FROM customer ORDER BY c_custkey""",
    "t_kanon_audit" ->
      """SELECT c_nationkey AS nation,
           CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket,
           count(*) AS class_size,
           count(DISTINCT c_mktsegment) AS l_div,
           count(*) < 5 AS k_risk,
           count(DISTINCT c_mktsegment) < 2 AS l_risk
         FROM customer GROUP BY nation, bal_bucket
         ORDER BY nation, bal_bucket"""
  )
}
