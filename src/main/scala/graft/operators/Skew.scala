package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY.md §7.5): when one key carries a
  * disproportionate share of rows (the hot playlist, the bot user), a plain
  * hash shuffle lands it all on one task. AQE's runtime skew-join splitting
  * handles the join case automatically; these helpers cover what AQE does
  * not: skewed AGGREGATIONS, and joins where the build side must be
  * replicated explicitly.
  *
  * Salting is deterministic here — the salt is a hash of a second column,
  * not `rand()` — so results are reproducible (R3) while still spreading a
  * hot key over `saltBuckets` tasks.
  */
object Skew {

  /** Two-stage salted aggregation: count/sum by (key, salt) — spreading a
    * hot key across `saltBuckets` partial groups — then re-aggregate by key.
    * The first shuffle carries the salted partials (bounded fan-in per
    * task); the second only `keys × saltBuckets` rows.
    */
  def saltedCountSum(
      df: DataFrame,
      key: Column,
      value: Column,
      saltFrom: Column,
      saltBuckets: Int = 16): DataFrame =
    df.select(key.as("k"), value.as("v"),
        pmod(xxhash64(saltFrom), lit(saltBuckets)).as("salt"))
      .groupBy(col("k"), col("salt"))
      .agg(count(lit(1)).as("pc"), sum(col("v")).as("ps"))
      .groupBy(col("k"))
      .agg(sum(col("pc")).as("cnt"), sum(col("ps")).as("total"))

  /** Salted join for a skewed left key column: every left row gets a
    * deterministic salt in [0, saltBuckets); the (small) right side is
    * replicated once per salt value, and the join key becomes (key, salt) —
    * a hot key now hashes to `saltBuckets` different reducers. Right side
    * must be small enough to replicate ×saltBuckets (it usually is: skew
    * joins are fact×dim).
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      saltFrom: Column,
      saltBuckets: Int = 16): DataFrame = {
    val saltedLeft = left.withColumn("_salt",
      pmod(xxhash64(saltFrom), lit(saltBuckets)).cast("int"))
    val saltedRight = right.withColumn("_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedLeft.join(saltedRight, Seq(key, "_salt")).drop("_salt")
  }
}
