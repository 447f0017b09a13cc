package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys at the 100 TB design point.
  *
  * AQE's skew-join splitting handles most cases at runtime; these helpers
  * cover the two patterns AQE can't: a single monster key inside an
  * aggregation, and a join whose skewed side must be salted *before* the
  * shuffle (e.g. when the plan is consumed by a non-AQE stage).
  */
object Skew {

  /** Two-phase aggregation: partial-aggregate on (key, salt) — spreading a
    * hot key over `saltBuckets` reducers — then final-aggregate on the key.
    * `spread(hash(all grouping-independent entropy))` keeps it deterministic.
    */
  def saltedCount(df: DataFrame, key: String, saltBuckets: Int = 16,
      entropy: Column): DataFrame =
    df.withColumn("__salt", pmod(hash(entropy), lit(saltBuckets)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum("__partial").as("n"))

  /** Salted equi-join: the skewed left side gets a deterministic salt in
    * [0, saltBuckets); the (small-ish) right side is exploded across all
    * salt values so every (key, salt) partition can match. Right-side
    * amplification is the price — use only on genuinely skewed keys.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltBuckets: Int = 16, leftEntropy: Column): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(hash(leftEntropy), lit(saltBuckets)))
    val explodedRight = right.withColumn("__salt",
      explode(array((0 until saltBuckets).map(lit): _*)))
    saltedLeft.join(explodedRight, Seq(key, "__salt")).drop("__salt")
  }
}
