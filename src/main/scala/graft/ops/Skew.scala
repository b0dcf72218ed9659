package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (builder brief: "salting for
  * skew, AQE for runtime re-plan"). AQE's skew-join split handles most
  * cases automatically; explicit salting remains the tool when one key
  * dominates so heavily that even split partitions won't balance —
  * e.g. a null-heavy foreign key or a celebrity entity at 100 TB.
  */
object Skew {

  /** Salted equi-join: the skewed (large) side gets a random salt in
    * [0, saltFactor); the small side is exploded `saltFactor`× so every
    * (key, salt) bucket finds its match. Trades `saltFactor`× blow-up
    * of the small side for even distribution of the hot keys. */
  def saltedJoin(skewed: DataFrame, small: DataFrame, key: String,
      saltFactor: Int = 8, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0)
    val salted = skewed.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(saltFactor)).cast("int"))
    val exploded = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(exploded, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Top-N heaviest keys with their row share — the diagnostic that
    * decides whether salting is needed. */
  def keySkewProfile(df: DataFrame, key: String, topN: Int = 10): DataFrame = {
    val total = df.count()
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .withColumn("share", round(col("n") / lit(total.toDouble), 6))
      .orderBy(col("n").desc, col(key))
      .limit(topN)
  }
}
