package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY/brief: "salting for skew, AQE for runtime
  * re-plan"). AQE's skew-join split handles sort-merge joins on its own;
  * these helpers cover the two cases it doesn't: a single hot aggregation
  * key, and a broadcast-infeasible join with a hot key on the big side.
  * Salting is deterministic (hash-derived), so results are reproducible
  * run to run.
  */
object SkewOps {

  /** Two-phase aggregation for hot grouping keys: partial-aggregate on
    * (key, salt) — spreading one hot key over `saltBuckets` reducers —
    * then final-aggregate on key. `partial` must be decomposable
    * (sum/count/min/max; avg as sum+count).
    */
  def saltedAgg(df: DataFrame, keyCol: String, saltBuckets: Int,
      partial: Column, merge: Column => Column, as: String): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(hash(col(keyCol), spark_partition_id(), monotonically_increasing_id()),
        lit(saltBuckets)))
    salted
      .groupBy(col(keyCol), col("_salt"))
      .agg(partial.as("_partial"))
      .groupBy(col(keyCol))
      .agg(merge(col("_partial")).as(as))
  }

  /** Skew-safe equi-join: salt the big side by hashing its rows into
    * `saltBuckets`, replicate the small side once per salt value, join on
    * (key, salt). The hot key's rows land on `saltBuckets` different
    * reducers instead of one. Cost: small side × saltBuckets — use only
    * when the small side is modest but above the broadcast threshold.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltBuckets: Int): DataFrame = {
    val saltedBig = big.withColumn("_salt",
      pmod(hash(col(key), spark_partition_id(), monotonically_increasing_id()),
        lit(saltBuckets)))
    val replicatedSmall = small.withColumn("_salt",
      explode(array((0 until saltBuckets).map(lit): _*)))
    saltedBig.join(replicatedSmall, Seq(key, "_salt")).drop("_salt")
  }
}
