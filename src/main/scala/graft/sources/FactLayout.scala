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

  /** The metrics fact frame in its hottest query shape — (metric_name,
    * skey, e, value) — written bucketed on the canonical series key.
    * Every per-series operation (instant eval, range-grid agg, as-of
    * lookup) clusters on skey; with the table bucketed on it, those
    * aggregations read pre-clustered data and plan with ZERO exchanges
    * (HashPartitioning(skey) satisfies any grouping whose keys include
    * skey — metric_name rides along since skey embeds the full label
    * set). At 100 TB this is the difference between re-shuffling the
    * fact table on every dashboard refresh and a pure scan-side
    * pipeline: the one shuffle happens at WRITE time, once.
    */
  def writeSeriesBucketed(spark: SparkSession, sfDir: String, table: String,
      numBuckets: Int): Unit = {
    import org.apache.spark.sql.functions._
    val m = graft.ingest.EventsIngest.cachedMetrics(spark, sfDir)
      .select(col("metric_name"),
        graft.promql.PromOps.seriesKey(col("labels")).as("skey"),
        col("e"), col("value"))
    m.write
      .bucketBy(numBuckets, "skey")
      .sortBy("skey", "e")
      .mode("overwrite")
      .saveAsTable(table)
  }

  /** The documents corpus and a doc_id-keyed derived frame (components,
    * features, captions — any of the dedup/curation side tables) written
    * bucketed on doc_id: the layout behind the "bucket both by doc_id
    * and the join is shuffle-free" claim the dedup scaladocs make
    * (caption_media_join, dedup_keep_best, filter_agreement). The one
    * shuffle happens at write time; every doc_id equi-join over the pair
    * then plans with zero exchanges — at 100 TB that is the difference
    * between re-shuffling the corpus on every curation pass and a
    * scan-side merge.
    */
  def writeDocBucketed(spark: SparkSession, df: DataFrame, table: String,
      numBuckets: Int): Unit =
    df.write
      .bucketBy(numBuckets, "doc_id")
      .sortBy("doc_id")
      .mode("overwrite")
      .saveAsTable(table)
}
