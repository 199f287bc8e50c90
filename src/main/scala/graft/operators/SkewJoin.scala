package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * AQE's skew-join split covers sort-merge joins at runtime; salting is
  * the plan-level fallback when one hot key floods a partition anyway
  * (e.g. shuffle-hash paths, or an aggregation keyed on the hot key
  * downstream). The skewed (large) side derives a DETERMINISTIC salt
  * from a unique column — no rand(), so retried/speculated tasks
  * produce identical rows — and the small side replicates `salts`-fold;
  * the join key becomes (key, salt), spreading each hot key over
  * `salts` reducers.
  */
object SkewJoin {
  def salted(
      large: DataFrame,
      small: DataFrame,
      key: String,
      uniqueCol: String,
      salts: Int = 8): DataFrame = {
    val saltedLarge = large.withColumn("__salt", pmod(hash(col(uniqueCol)), lit(salts)))
    val replicatedSmall = small
      .withColumn("__salt", explode(lit((0 until salts).toArray)))
    saltedLarge.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
