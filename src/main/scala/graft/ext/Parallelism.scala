package graft.ext

import org.apache.spark.sql.DataFrame

/** Parallelism floor for small scans. A fixture-sized parquet (one file
  * under `maxPartitionBytes`) plans as ONE input partition, and every
  * map-side stage chained onto it — token explodes, shingle hashing,
  * per-doc feature extraction — then runs single-threaded while the
  * rest of the executor idles. Widening the scan with a round-robin
  * repartition costs one trivial shuffle of the (small) base rows and
  * buys full-width parallelism for the expensive narrow stages that
  * follow.
  *
  * At 100 TB this is a NO-OP by construction: the guard fires only when
  * the planned scan has fewer partitions than the floor, which a real
  * corpus (thousands of splits) never does — so the helper is safe to
  * leave on every small-dimension read without ever shuffling a big one.
  */
object Parallelism {
  def widen(df: DataFrame, floorMax: Int = 16): DataFrame = {
    val floor = math.min(floorMax, df.sparkSession.sparkContext.defaultParallelism)
    if (df.rdd.getNumPartitions >= floor) df else df.repartition(floor)
  }
}
