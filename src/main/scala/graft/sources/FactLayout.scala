package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical-layout helpers for the fact table beyond date partitioning:
  * hash bucketing on the join key. Two tables bucketed the same way
  * join with ZERO exchanges — at 100 TB this turns the repeated
  * series-key / user-key joins from full shuffles into local merges.
  * (Bucketing requires the table catalog; partition-dir layout alone
  * can't record the bucket spec.)
  */
object FactLayout {

  /** Write a frame as a bucketed, sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int, mode: String = "overwrite"): Unit =
    df.write
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .mode(mode)
      .saveAsTable(table)

  /** Co-located equi-join of two identically-bucketed tables. With
    * matching bucket specs Spark plans SortMergeJoin with no
    * ShuffleExchange on either side.
    */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
