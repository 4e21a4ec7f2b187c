package graft.ext

import org.apache.spark.sql.DataFrame

/** Registry for persisted frames whose lifetime must extend past the
  * function that created them (the returned DataFrame is lazy, so the
  * creator cannot unpersist before its consumer's action runs) but NOT
  * past the consuming query. A long-lived session running hundreds of
  * queries (Bench, Verify, the daemon) calls [[drain]] between queries;
  * without that, per-query shingle/result caches accumulate in executor
  * storage for the whole session — at 100 TB a leaked shingle cache is
  * executor-memory death. Persist sites that can already unpersist
  * inline (materialize-then-release) keep doing so; this registry is
  * only for the deferred cases.
  */
object CacheScope {
  private val frames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Track `df` (already persisted) for the next [[drain]]. Returns it. */
  def register(df: DataFrame): DataFrame = synchronized { frames += df; df }

  /** Persist `df` unless an identical canonical plan is already in the
    * CacheManager (two queries sharing a sub-pipeline — e.g. the exact
    * and Bloom decontamination variants build the same tagged-shingle
    * frame — would otherwise double-persist and warn), then track it for
    * the next [[drain]]. `storageLevel` resolves through the
    * CacheManager by PLAN, not by Dataset instance, so the guard holds
    * across separately-built identical frames.
    */
  def persistTracked(df: DataFrame): DataFrame = synchronized {
    if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      df.persist()
    frames += df
    df
  }

  /** Unpersist every registered frame. Safe to call repeatedly; frames
    * already evicted unpersist as a no-op.
    */
  def drain(): Unit = synchronized {
    frames.foreach(_.unpersist(blocking = false))
    frames.clear()
  }
}
