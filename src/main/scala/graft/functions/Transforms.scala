package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import Determinism._

/** The scrub-transform library — Spark-native re-expression of the
  * reference's transform zoo (slice_db/transforms/person.py, address.py,
  * text.py, date.py, common.py, json.py).
  *
  * Every transform is a pure Column expression (whole-stage codegen, no
  * UDFs; the one custom Expression, [[AlphanumScramble]], implements
  * `doGenCode`). Each has an `sql*` twin producing the bit-identical
  * DuckDB SQL for the oracle gate. Determinism is pepper-keyed per the
  * contract in [[Determinism]]; distinct draws inside one transform use
  * salted seeds.
  *
  * 100 TB posture: these are scalar expressions — they scale with the
  * scan, shuffle nothing, and vocabularies are literal arrays baked into
  * the generated code (no join, no broadcast needed).
  */
object Transforms {
  /** Secret pepper keying every scrub (the reference takes it per dump;
    * slice_db derives per-instance peppers from it). Sources, highest
    * precedence first: a per-invocation [[setPepper]] (the CLI --pepper
    * flag, reference cli/main.py parity), the GRAFT_PEPPER env var, the
    * default. Resolved when a transform Column is BUILT, so set the
    * override before constructing expressions; the generated oracle SQL
    * reads the same value and always agrees. Per-transform salts
    * (the `salt` argument below) play the reference's instance-name
    * role: two transform types never share a seed stream. */
  def Pepper: String =
    pepperOverride.getOrElse(sys.env.getOrElse("GRAFT_PEPPER", "graft"))

  @volatile private var pepperOverride: Option[String] = None

  /** Per-invocation pepper override (CLI `--pepper`); call before any
    * transform expression is built. */
  def setPepper(p: String): Unit = pepperOverride = Some(p)

  /** Drop the override, falling back to GRAFT_PEPPER / default. */
  def resetPepper(): Unit = pepperOverride = None

  /** Name→transform registry parameterized by the EFFECTIVE pepper
    * (the analog of the reference's transform module registry,
    * slice_db/transform.py `TransformerProvider`, which derives a
    * per-instance pepper as `pepper + name`, transform.py:43-44).
    * [[ScrubConfig]] passes `Pepper + instanceName`; pepper-free
    * transforms ignore the argument. */
  lazy val byNameWith: Map[String, (Column, String) => Column] = Map(
    "given_name" -> ((c, p) => givenName(c, p)),
    "surname" -> ((c, p) => surname(c, p)),
    "city" -> ((c, p) => city(c, p)),
    "us_state" -> ((c, p) => usState(c, p)),
    "geozip" -> ((c, p) => geozip(c, p)),
    "address1" -> ((c, p) => address1(c, p)),
    "address2" -> ((c, p) => address2(c, p)),
    "alphanum" -> ((c, p) => alphanum(c, p)),
    "alphanum_unique" -> ((c, p) => alphanumUnique(c, p)),
    "words" -> ((c, p) => words(c, p)),
    "date_year" -> ((c, p) => dateYear(c, p)),
    "null" -> ((_, _) => nul),
    "replace" -> ((c, _) => replaceDigits(c)),
    "const" -> ((_, _) => const("REDACTED")))

  /** The registry with the plain session pepper — direct (non-config)
    * callers like the TransformField CLI. */
  lazy val byName: Map[String, Column => Column] =
    byNameWith.map { case (k, f) => k -> ((c: Column) => f(c, Pepper)) }

  /** CUSTOM transform registry — the reference's custom-module
    * extension point (reference README "Custom transforms";
    * slice_db/transform.py's Transform protocol resolves any
    * importable `module:Class` path): library users register a
    * `(Column, effectivePepper) => Column` builder under a name, and
    * [[ScrubConfig]] resolves it exactly like a builtin — the pepper
    * argument arrives instance-scoped (`Pepper + instanceName`), so a
    * custom transform participates in the same re-keying contract.
    * Builtin names cannot be shadowed: a config that silently swapped
    * `null` or `given_name` for user code would ship data the operator
    * believes is scrubbed. Unknown names still fail fast at config
    * parse, now listing custom names too. */
  private val customTransforms =
    scala.collection.concurrent.TrieMap.empty[String, (Column, String) => Column]

  def registerCustom(name: String)(builder: (Column, String) => Column): Unit = {
    require(!byNameWith.contains(name),
      s"cannot shadow builtin transform '$name'")
    customTransforms.put(name, builder)
    ()
  }

  def unregisterCustom(name: String): Unit = {
    customTransforms.remove(name)
    ()
  }

  /** Builtin-first name resolution (builtins are not shadowable). */
  def resolveName(name: String): Option[(Column, String) => Column] =
    byNameWith.get(name).orElse(customTransforms.get(name))

  /** Every resolvable transform name — the fail-fast error's menu. */
  def knownNames: Seq[String] =
    (byNameWith.keys ++ customTransforms.keys).toSeq.sorted

  private def seed(v: Column, salt: String, pepper: String): Column =
    concat(upper(v), lit(salt + pepper))

  /** SQL string-literal escape for builder-authored oracle text: a
    * pepper (or instance name) is caller-supplied via --pepper, and a
    * single quote in it would break — or inject into — the generated
    * oracle SQL. */
  private def sqlLit(s: String): String = s.replace("'", "''")

  private def sqlSeed(v: String, salt: String, pepper: String): String =
    s"(upper($v) || '${sqlLit(salt + pepper)}')"

  /** Re-apply the original's case pattern: ALLCAPS / alllower /
    * Title-case (leading capital) / as-picked. */
  private def caseApply(orig: Column, picked: Column): Column =
    when(upper(orig) === orig, upper(picked))
      .when(lower(orig) === orig, lower(picked))
      .when(upper(substring(orig, 1, 1)) === substring(orig, 1, 1),
        concat(upper(substring(picked, 1, 1)), substring(picked, 2, 1000000)))
      .otherwise(picked)
  private def sqlCaseApply(orig: String, picked: String): String =
    s"""(CASE WHEN upper($orig) = $orig THEN upper($picked)
        WHEN lower($orig) = $orig THEN lower($picked)
        WHEN upper(substr($orig, 1, 1)) = substr($orig, 1, 1)
          THEN (upper(substr($picked, 1, 1)) || substr($picked, 2))
        ELSE $picked END)"""

  // --- person (slice_db/transforms/person.py:9-37) ---

  def givenName(v: Column, pepper: String = Pepper): Column =
    caseApply(v, pick(seed(v, "", pepper), Vocab.givenNames))
  def sqlGivenName(v: String, pepper: String = Pepper): String =
    sqlCaseApply(v, sqlPick(sqlSeed(v, "", pepper), Vocab.givenNames))

  def surname(v: Column, pepper: String = Pepper): Column =
    caseApply(v, pick(seed(v, "", pepper), Vocab.surnames))
  def sqlSurname(v: String, pepper: String = Pepper): String =
    sqlCaseApply(v, sqlPick(sqlSeed(v, "", pepper), Vocab.surnames))

  // --- address (slice_db/transforms/address.py:10-146) ---

  def city(v: Column, pepper: String = Pepper): Column =
    pick(seed(v, "", pepper), Vocab.cities)
  def sqlCity(v: String, pepper: String = Pepper): String =
    sqlPick(sqlSeed(v, "", pepper), Vocab.cities)

  /** Deterministic (state, abbreviation) pair sharing one index. */
  def usState(v: Column, pepper: String = Pepper): Column =
    pick(seed(v, "", pepper), Vocab.usStates)
  def usStateAbbr(v: Column, pepper: String = Pepper): Column =
    pick(seed(v, "", pepper), Vocab.usStateAbbrs)
  def sqlUsState(v: String, pepper: String = Pepper): String =
    sqlPick(sqlSeed(v, "", pepper), Vocab.usStates)
  def sqlUsStateAbbr(v: String, pepper: String = Pepper): String =
    sqlPick(sqlSeed(v, "", pepper), Vocab.usStateAbbrs)

  /** Zip scramble preserving the 3-digit geo prefix (address.py:81-114). */
  def geozip(v: Column, pepper: String = Pepper): Column =
    concat(substring(v, 1, 3),
      lpad((choice(seed(v, "", pepper), 100)).cast("string"), 2, "0"))
  def sqlGeozip(v: String, pepper: String = Pepper): String =
    s"(substr($v, 1, 3) || lpad(CAST(${sqlChoice(sqlSeed(v, "", pepper), 100)} AS VARCHAR), 2, '0'))"

  def address1(v: Column, pepper: String = Pepper): Column =
    concat((choice(seed(v, "", pepper), 9999) + 1).cast("string"), lit(" "),
      pick(seed(v, "st#", pepper), Vocab.streets))
  def sqlAddress1(v: String, pepper: String = Pepper): String =
    s"(CAST(${sqlChoice(sqlSeed(v, "", pepper), 9999)} + 1 AS VARCHAR) || ' ' || ${sqlPick(sqlSeed(v, "st#", pepper), Vocab.streets)})"

  private val unitKinds = Seq("Apt", "Suite", "Unit")
  def address2(v: Column, pepper: String = Pepper): Column =
    concat(pick(seed(v, "u#", pepper), unitKinds), lit(" "),
      (choice(seed(v, "n#", pepper), 999) + 1).cast("string"))
  def sqlAddress2(v: String, pepper: String = Pepper): String =
    s"(${sqlPick(sqlSeed(v, "u#", pepper), unitKinds)} || ' ' || CAST(${sqlChoice(sqlSeed(v, "n#", pepper), 999)} + 1 AS VARCHAR))"

  // --- text (slice_db/transforms/text.py) ---

  /** Char-class-preserving scramble — the custom codegen Expression. */
  def alphanum(v: Column, pepper: String = Pepper): Column =
    ColumnBridge.column(AlphanumScramble(
      ColumnBridge.expression(v.cast("string")), ColumnBridge.expression(lit(pepper))))

  /** DuckDB mirror of [[AlphanumScramble]]. `v` must be a simple column
    * reference (it is spliced several times). */
  def sqlAlphanum(v: String, pepper: String = Pepper): String = {
    def draw = sqlMd5Idx(s"md5($v || '${sqlLit(pepper)}') || CAST(i AS VARCHAR)")
    s"""list_aggregate(list_transform(range(1, length($v) + 1), i ->
        CASE
          WHEN substr($v, CAST(i AS INT), 1) BETWEEN 'a' AND 'z' THEN chr(CAST(97 + $draw % 26 AS INT))
          WHEN substr($v, CAST(i AS INT), 1) BETWEEN 'A' AND 'Z' THEN chr(CAST(65 + $draw % 26 AS INT))
          WHEN substr($v, CAST(i AS INT), 1) BETWEEN '0' AND '9' THEN chr(CAST(48 + $draw % 10 AS INT))
          ELSE substr($v, CAST(i AS INT), 1) END),
      'string_agg', '')"""
  }

  /** FPE scramble (text.py:45-60 `unique=true`): format-preserving
    * encryption over the detected category alphabet — injective per
    * (length, alphabet) class, reference parity, for scrubbing
    * class-homogeneous key columns. See [[AlphanumFpe]] for the exact
    * contract and its limits. */
  def alphanumUnique(v: Column, pepper: String = Pepper): Column =
    ColumnBridge.column(AlphanumFpe(
      ColumnBridge.expression(v.cast("string")), ColumnBridge.expression(lit(pepper))))

  /** DuckDB mirror of [[alphanumUnique]] — a full SELECT (the Feistel
    * rounds chain as CTEs): projects `key` plus the encrypted `v` as
    * `scrubbed` from `table`, ordered by `key`. */
  def sqlAlphanumUnique(key: String, v: String, table: String,
      pepper: String = Pepper): String = {
    val all = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
    def feistel(r: Int): String = {
      val draw = sqlMd5Idx(s"md5('${sqlLit(pepper)}|fpe|$r|' || h$r.R) || CAST(i AS VARCHAR)")
      s"""coalesce(list_aggregate(list_transform(range(1, length(h$r.L) + 1), i ->
          ab[CAST((strpos(ab, h$r.L[CAST(i AS INT)]) - 1 + $draw) % length(ab) AS INT) + 1]),
          'string_agg', ''), '')"""
    }
    val rounds = (0 until AlphanumFpe.Rounds).map { r =>
      s"h${r + 1} AS (SELECT $key, ab, is_null, h$r.R AS L, ${feistel(r)} AS R FROM h$r)"
    }.mkString(",\n")
    s"""WITH base AS (SELECT $key, $v AS v FROM $table),
       ab AS (SELECT $key, v,
           CASE WHEN a0 = '' THEN '$all' ELSE a0 END AS ab
         FROM (SELECT *,
             (CASE WHEN regexp_matches(v, '[A-Z]') THEN 'ABCDEFGHIJKLMNOPQRSTUVWXYZ' ELSE '' END
              || CASE WHEN regexp_matches(v, '[a-z]') THEN 'abcdefghijklmnopqrstuvwxyz' ELSE '' END
              || CASE WHEN regexp_matches(v, '[0-9]') THEN '0123456789' ELSE '' END) AS a0
           FROM base)),
       m AS (SELECT $key, ab, (v IS NULL) AS is_null,
           coalesce(list_aggregate(list_transform(range(1, length(v) + 1), i ->
             CASE WHEN strpos(ab, v[CAST(i AS INT)]) > 0 THEN v[CAST(i AS INT)]
                  ELSE ab[CAST(ord(v[CAST(i AS INT)]) % length(ab) AS INT) + 1] END),
             'string_agg', ''), '') AS s
         FROM ab),
       h0 AS (SELECT $key, ab, is_null, substr(s, 1, length(s) // 2) AS L,
           substr(s, length(s) // 2 + 1) AS R FROM m),
       $rounds
       SELECT $key, CASE WHEN is_null THEN NULL ELSE (L || R) END AS scrubbed
       FROM h${AlphanumFpe.Rounds}
       ORDER BY $key"""
  }

  /** Per-word replacement preserving length bucket + case
    * (text.py:141-192): each word maps to a vocab word of the same
    * length (clamped to 12), case pattern re-applied. */
  def words(v: Column, pepper: String = Pepper): Column =
    array_join(transform(split(v, " "), w => wordPick(w, pepper)), " ")
  private def wordPick(w: Column, pepper: String): Column = {
    val bucketed = Vocab.wordsByLen.zipWithIndex.foldLeft(lit(null).cast("string")) {
      case (acc, (bucket, i)) =>
        when(least(length(w), lit(12)) === (i + 1),
          caseApply(w, pick(seed(w, "", pepper), bucket))).otherwise(acc)
    }
    when(length(w) === 0, w).otherwise(bucketed)
  }
  def sqlWords(v: String, pepper: String = Pepper): String = {
    val cases = Vocab.wordsByLen.zipWithIndex.map { case (bucket, i) =>
      s"WHEN least(length(w), 12) = ${i + 1} THEN ${sqlCaseApply("w", sqlPick(sqlSeed("w", "", pepper), bucket))}"
    }.mkString("\n")
    s"""list_aggregate(list_transform(string_split($v, ' '), w ->
        CASE WHEN length(w) = 0 THEN w $cases END), 'string_agg', ' ')"""
  }

  // --- date (slice_db/transforms/date.py:14-28): jitter within year ---

  def dateYear(v: Column, pepper: String = Pepper): Column = {
    val start = trunc(v, "year")
    val days = datediff(add_months(start, 12), start)
    val s = seed(date_format(v, "yyyy-MM-dd"), "d#", pepper)
    date_add(start, (md5Idx(s) % days).cast("int"))
  }
  def sqlDateYear(v: String, pepper: String = Pepper): String = {
    val start = s"date_trunc('year', $v)"
    val days = s"date_diff('day', $start, $start + INTERVAL 1 YEAR)"
    val s = sqlSeed(s"strftime($v, '%Y-%m-%d')", "d#", pepper)
    s"CAST($start + INTERVAL 1 DAY * (${sqlMd5Idx(s)} % $days) AS DATE)"
  }

  // --- common (slice_db/transforms/common.py:18-95) ---

  def const(value: String): Column = lit(value)
  def nul: Column = lit(null).cast("string")
  def replaceDigits(v: Column): Column = regexp_replace(v, "[0-9]", "X")
  def sqlReplaceDigits(v: String): String = s"regexp_replace($v, '[0-9]', 'X', 'g')"

  /** IncrementingConstTransform analog (common.py:66-85): each
    * transformed value becomes `value + ' ' + N` with a counter that
    * advances ONLY over transformed rows; null/empty values and values
    * containing `exclude` pass through without consuming a number. The
    * reference's counter is per-process row order; a distributed engine
    * needs an explicit deterministic order (`orderCol`), and the counter
    * is a running sum of the transform indicator over that order — an
    * inherently sequential global numbering, so the window is
    * single-reducer by construction (partition the scrub by a coarse key
    * and include the partition id in `value` when one sequence per
    * partition is acceptable at scale). */
  def incConst(df: org.apache.spark.sql.DataFrame, column: String,
      value: String, exclude: Option[String], orderCol: String)
      : org.apache.spark.sql.DataFrame = {
    val c = col(column)
    val xf = c.isNotNull && c =!= "" &&
      exclude.map(e => instr(c, e) === 0).getOrElse(lit(true))
    val w = org.apache.spark.sql.expressions.Window.orderBy(orderCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn("__xf", xf)
      .withColumn("__n", sum(when(col("__xf"), 1L).otherwise(0L)).over(w))
      .withColumn(column,
        when(col("__xf"), concat(lit(value), lit(" "), col("__n").cast("string")))
          .otherwise(c))
      .drop("__xf", "__n")
  }
  def sqlIncConst(column: String, value: String, exclude: String,
      orderCol: String): String =
    s"""CASE WHEN $column IS NOT NULL AND $column <> ''
          AND instr($column, '$exclude') = 0
        THEN '$value' || ' ' || CAST(sum(CASE WHEN $column IS NOT NULL
          AND $column <> '' AND instr($column, '$exclude') = 0
          THEN 1 ELSE 0 END) OVER (ORDER BY $orderCol
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR)
        ELSE $column END"""

  // --- json (slice_db/transforms/json.py:11-47) ---

  /** Scrub the numeric field `$.k` inside a JSON string column. */
  def jsonK(v: Column, pepper: String = Pepper): Column = {
    val k = get_json_object(v, "$.k")
    concat(lit("{\"k\": "), choice(seed(k, "j#", pepper), 100).cast("string"), lit("}"))
  }
  def sqlJsonK(v: String, pepper: String = Pepper): String = {
    val k = s"json_extract_string($v, '$$.k')"
    s"""('{"k": ' || CAST(${sqlChoice(sqlSeed(k, "j#", pepper), 100)} AS VARCHAR) || '}')"""
  }
}
