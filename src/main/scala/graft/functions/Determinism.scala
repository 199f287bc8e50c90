package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, pepper-keyed pseudo-randomness shared by all scrub
  * transforms.
  *
  * The reference seeds a PRNG from `md5(value + pepper)`
  * (slice_db/transforms/common.py:9-15) and then draws choices. Graft uses
  * a pure-SQL contract instead so the DuckDB oracle can reproduce every
  * transform bit-for-bit:
  *
  *   idx(seed, k) = int(first k hex chars of md5(utf8(seed)))
  *
  * `k=6` gives 16,777,216 values — plenty for `% N` choices. Everything is
  * built from codegen'd Catalyst functions (md5/conv/substring), so scrubs
  * run inside whole-stage codegen with zero UDFs.
  */
object Determinism {
  val K = 6

  /** Spark-side: deterministic non-negative Long from a seed string. */
  def md5Idx(seed: Column): Column =
    conv(substring(md5(seed.cast("binary")), 1, K), 16, 10).cast("long")

  /** Wider variant: first `k` hex chars (k<=15 keeps it in a positive
    * Long; k=12 gives 48 bits — used for shingle/minhash hashing). */
  def md5IdxK(seed: Column, k: Int): Column =
    conv(substring(md5(seed.cast("binary")), 1, k), 16, 10).cast("long")

  /** JVM-side twin of md5IdxK, for deriving literal constants (plane
    * coefficients, hash-family parameters) that bake into BOTH the
    * Column tree and the oracle SQL. */
  def jvmMd5Idx(s: String, k: Int = K): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, k), 16)
  }

  /** Deterministic choice out of N options (0-based index). */
  def choice(seed: Column, n: Int): Column = md5Idx(seed) % n

  /** Pick from a literal vocabulary (broadcast as a literal array —
    * codegen-friendly, no join). */
  def pick(seed: Column, options: Seq[String]): Column =
    element_at(lit(options.toArray), (choice(seed, options.size) + 1).cast("int"))

  // ---- DuckDB oracle SQL generators (must mirror the Spark side) ----

  /** hex→int of the first K chars of md5(expr) in portable SQL. */
  def sqlMd5Idx(seedSql: String): String = sqlMd5IdxK(seedSql, K)

  def sqlMd5IdxK(seedSql: String, k: Int): String = {
    val terms = (1 to k).map { i =>
      val mult = math.pow(16, k - i).toLong
      s"(strpos('0123456789abcdef', substr(md5($seedSql), $i, 1)) - 1) * $mult"
    }
    "(" + terms.mkString(" + ") + ")"
  }

  def sqlChoice(seedSql: String, n: Int): String = s"(${sqlMd5Idx(seedSql)} % $n)"

  def sqlPick(seedSql: String, options: Seq[String]): String = {
    val arr = options.map(o => "'" + o.replace("'", "''") + "'").mkString("[", ", ", "]")
    s"($arr[CAST(${sqlChoice(seedSql, options.size)} AS INT) + 1])"
  }
}
