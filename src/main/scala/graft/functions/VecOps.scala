package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<double>` embedding columns.
  *
  * Dot products are UNROLLED to a fixed-dimension left-to-right addition
  * chain — both the Spark Column tree and the DuckDB oracle SQL evaluate
  * the same IEEE operations in the same order, so cosines compare
  * BIT-EXACTLY (no rounding tolerance needed anywhere downstream).
  * `functions.aggregate`'s fold would also be sequential, but unrolling
  * keeps the whole thing inside whole-stage codegen with zero lambda
  * dispatch per element.
  */
object VecOps {
  val Dim = 64

  private def dotExpr(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(DotProduct(
      org.apache.spark.sql.graftbridge.ColumnBridge.expression(a),
      org.apache.spark.sql.graftbridge.ColumnBridge.expression(b)))

  def dot(a: Column, b: Column): Column = dotExpr(a, b)

  def norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine from precomputed norms (precompute per side BEFORE a join so
    * the norm isn't re-evaluated per pair). */
  def cosine(a: Column, b: Column, na: Column, nb: Column): Column =
    dot(a, b) / (na * nb)

  def sqlDot(a: String, b: String): String =
    (0 until Dim).map(i => s"$a[${i + 1}] * $b[${i + 1}]").mkString("(", " + ", ")")

  def sqlNorm(v: String): String = s"sqrt(${sqlDot(v, v)})"

  /** Deterministic hyperplane coefficients in [-1, 1], 3 decimals — the
    * JVM mirror of Determinism.md5Idx so literals bake into both the
    * Column tree and the oracle SQL identically. */
  def planeCoef(plane: Int, dim: Int): Double = {
    val md = MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$plane#$dim".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    val idx = java.lang.Long.parseLong(hex.substring(0, 6), 16)
    (idx % 2001 - 1000) / 1000.0
  }

  def plane(p: Int): Seq[Double] = (0 until Dim).map(d => planeCoef(p, d))

  /** Dot of a data vector against a literal plane: the plane bakes in
    * as an array literal, the same [[DotProduct]] loop does the work.
    * (A zip_with/aggregate fold was tried and is 5-10x slower: Spark
    * evaluates higher-order lambdas interpreted, per element. Callers
    * that bucket both sides of a self-join should still persist the
    * bucketed relation.) */
  def dotPlane(v: Column, coefs: Seq[Double]): Column =
    dotExpr(v, lit(coefs.toArray))

  def sqlDotPlane(v: String, coefs: Seq[Double]): String =
    coefs.zipWithIndex.map { case (c, i) => s"$v[${i + 1}] * ($c)" }.mkString("(", " + ", ")")

  /** Random-hyperplane LSH bucket: NPlanes sign bits packed into an int.
    * Parametrized (GRAFT_LSH_PLANES, default 8) because the bucket space
    * must scale with the corpus: expected bucket population is N/2^b, so
    * b ≈ log2(N) + c keeps it constant — a FIXED 8-bit space goes
    * quadratic within buckets at 100x data. Every consumer (d_embed_dup,
    * s_lsh_ann, s_ann_recall) and its oracle SQL derive from this one
    * value, so any setting stays oracle-exact; multi-probe generalizes
    * (NPlanes+1 probe keys at hamming<=1). */
  val NPlanes: Int = {
    val n = sys.env.getOrElse("GRAFT_LSH_PLANES", "8").toInt
    // bucket packs into a signed 32-bit int and the oracle XORs it
    // sign-extended to 64 bits: bit 31 (sign) or shift-wraparound at 32+
    // would silently corrupt bucketing / hamming distances
    require(n >= 1 && n <= 30, s"GRAFT_LSH_PLANES must be in [1, 30], got $n")
    n
  }
  def lshBucket(v: Column): Column =
    (0 until NPlanes).map(p => when(dotPlane(v, plane(p)) > 0, lit(1 << p)).otherwise(lit(0)))
      .reduce(_ + _)
  def sqlLshBucket(v: String): String =
    (0 until NPlanes).map(p =>
      s"(CASE WHEN ${sqlDotPlane(v, plane(p))} > 0 THEN ${1 << p} ELSE 0 END)")
      .mkString("(", " + ", ")")

  /** Sign-bit bucket over an arbitrary plane RANGE [base, base+n) —
    * the banded-LSH building block (s_dbscan's replica screen uses
    * four 16-plane bands: a near-exact pair missing one band's bucket
    * almost surely shares another, while each band's 2^16 bucket space
    * keeps the in-bucket pair term tiny). Same deterministic plane
    * family as [[lshBucket]] (= lshBucketAt(v, 0, NPlanes)). */
  def lshBucketAt(v: Column, base: Int, n: Int): Column = {
    require(n >= 1 && n <= 30, s"band width must be in [1, 30], got $n")
    (0 until n).map(p =>
      when(dotPlane(v, plane(base + p)) > 0, lit(1 << p)).otherwise(lit(0)))
      .reduce(_ + _)
  }
  def sqlLshBucketAt(v: String, base: Int, n: Int): String =
    (0 until n).map(p =>
      s"(CASE WHEN ${sqlDotPlane(v, plane(base + p))} > 0 THEN ${1 << p} ELSE 0 END)")
      .mkString("(", " + ", ")")
}
