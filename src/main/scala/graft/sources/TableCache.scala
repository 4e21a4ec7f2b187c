package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped frame memo — the engine's buffer pool. Hot base
  * frames (the ingested fact frame, the documents/embeddings corpus)
  * are read by every registered query; materializing the scan (plus the
  * one-time parallelism-floor shuffle, see [[graft.ext.Parallelism]])
  * once per session turns a per-query cost into session warmup, exactly
  * like a warehouse warming its buffer pool. Long-lived sessions (Bench,
  * Verify, the daemon) then serve hundreds of queries off the cached
  * frames; [[graft.ext.CacheScope.drain]] deliberately does NOT touch
  * these — they are the documented steady state.
  *
  * Keying discipline (inherited from the original fact-frame memo): the
  * outer map keys on the session by exact IDENTITY — an identity hash
  * can be reused after GC and hand a new session a frame bound to a
  * stopped context. Weak keying alone cannot collect an entry here (the
  * cached DataFrames strongly reference their session — the classic
  * value→key cycle), so entries are ALSO removed explicitly by ONE
  * application-end listener per SparkContext that clears the maps
  * without capturing any session (see [[registerCleanup]]). A frame that
  * was unpersisted externally (e.g. `spark.catalog.clearCache()`) is
  * re-persisted and re-counted on next access.
  */
object TableCache {
  /** At-most-once cell: created (cheaply, empty) under the session
    * map's lock, filled OUTSIDE it under its OWN monitor, so a slow
    * first build serializes only callers of ITS key. The thunk is
    * passed at ACCESS time, not stored: a failed build leaves the cell
    * empty and the next caller's own builder runs — exactly the
    * semantics getOrElseUpdate had (a stored first-caller thunk would
    * re-run the first caller's closure forever and retain it for the
    * session's lifetime).
    */
  private final class Holder {
    private var v: DataFrame = null
    def value(build: => DataFrame): DataFrame = synchronized {
      if (v == null) {
        val built = build
        // null sentinel doubles as the "not yet built" marker, so a
        // null-returning builder must fail fast here — otherwise it
        // would silently re-run on every access forever
        require(built != null, "TableCache builder returned null")
        v = built
      }
      v
    }
  }

  /** [[Holder]] for non-frame session artifacts (a collected bloom
    * filter's bytes, a codebook) — same at-most-once semantics.
    */
  private final class ValueHolder {
    private var v: AnyRef = null
    def value(build: => AnyRef): AnyRef = synchronized {
      if (v == null) {
        val built = build
        require(built != null, "TableCache value builder returned null")
        v = built
      }
      v
    }
  }

  private val sessions =
    new java.util.WeakHashMap[SparkSession, scala.collection.mutable.Map[String, Holder]]()
  private val values =
    new java.util.WeakHashMap[SparkSession, scala.collection.mutable.Map[String, ValueHolder]]()
  private val plans =
    new java.util.WeakHashMap[SparkSession, scala.collection.mutable.Map[
      String, org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]]()

  /** The memoized frame for `key`, built on first access (at most once
    * per (session, key)) — memoization only, no persistence. The
    * session-wide lock covers only holder creation; the builder itself
    * runs under the holder's own per-key monitor, so one family's slow
    * first build (a driver-side collect, a multi-stage fixture
    * materialization) never blocks another family's warm lookup. A
    * builder that calls memo() recursively for a DIFFERENT key is safe
    * for the same reason (the map lock is released before forcing).
    */
  def memo(spark: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val perSession = sessionMap(spark)
    val holder = perSession.synchronized {
      perSession.getOrElseUpdate(key, new Holder)
    }
    holder.value(build)
  }

  /** A memoized non-frame session artifact (collected driver-side
    * values: a bloom filter's bytes, a codebook) — the value analogue
    * of [[memo]], same per-key locking and cleanup lifecycle. Unlike a
    * persisted frame, the value cannot be evicted by a cache clear; it
    * lives until application end.
    */
  def memoValue[T <: AnyRef](spark: SparkSession, key: String)(build: => T): T = {
    registerCleanup(spark)
    val perSession = values.synchronized {
      var m = values.get(spark)
      if (m == null) {
        m = scala.collection.mutable.Map.empty[String, ValueHolder]
        values.put(spark, m)
      }
      m
    }
    val holder = perSession.synchronized {
      perSession.getOrElseUpdate(key, new ValueHolder)
    }
    holder.value(build).asInstanceOf[T]
  }

  /** The memoized frame for `key`, building (and persisting) on first
    * access. `build` runs at most once per (session, key).
    */
  def getOrBuild(spark: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val df = memo(spark, key)(build)
    if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE) {
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.count() // fill before concurrent consumers race the cache
    }
    df
  }

  // (A round-18 `getOrCheckpoint` RDD-leaf sibling lived here briefly —
  // it restored AQE exchange reuse over session artifacts but lost the
  // columnar cache's batch-stat and column pruning; superseded by the
  // GraftWrapCachedScans query-stage-prep rule, which fixes the reuse
  // on this persisted form directly. See OPTIMIZATION_r18.md finding 1.)

  private def sessionMap(spark: SparkSession): scala.collection.mutable.Map[String, Holder] = {
    registerCleanup(spark)
    sessions.synchronized {
      var m = sessions.get(spark)
      if (m == null) {
        m = scala.collection.mutable.Map.empty[String, Holder]
        sessions.put(spark, m)
      }
      m
    }
  }

  /** One listener per CONTEXT that has already registered. Weak keys:
    * a stopped, collected context must not pin this guard map either.
    */
  private val cleanupRegistered =
    new java.util.WeakHashMap[org.apache.spark.SparkContext, java.lang.Boolean]()

  /** Registers the application-end cleanup exactly once per
    * SparkContext. The listener captures NO session (a strongly
    * captured session key would defeat the WeakHashMaps for the
    * application's lifetime) and is context-scoped, so derived
    * sessions (`spark.newSession()`) don't stack additional listeners
    * on the shared context. Clearing both maps wholesale at
    * application end is sound because Spark permits one active context
    * at a time: every live entry belongs to a session of the context
    * that just ended, and entries of previously stopped contexts were
    * cleared by their own end event.
    */
  private def registerCleanup(spark: SparkSession): Unit = {
    val sc = spark.sparkContext
    cleanupRegistered.synchronized {
      if (cleanupRegistered.get(sc) == null) {
        cleanupRegistered.put(sc, java.lang.Boolean.TRUE)
        sc.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            override def onApplicationEnd(
                end: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
              sessions.synchronized { sessions.clear() }
              values.synchronized { values.clear() }
              plans.synchronized { plans.clear() }
            }
          })
      }
    }
  }

  /** Statement cache for a pack of PURE query builders — the
    * prepared-statement analogue, caching what a warehouse's statement
    * cache actually stores: the OPTIMIZED logical plan. Per (session,
    * query, dataset) the builder runs once and its plan is carried
    * through analysis + optimization once; every subsequent call wraps
    * that plan in a FRESH DataFrame (fresh physical planning → fresh
    * Exchange nodes → fresh shuffles), so each action still recomputes
    * the full result from the base tables. Only the repeated
    * parse/plan-construction/analysis/optimization work (measured
    * 60–150 ms per action on deep plans) is served from the cache.
    * The wrapper must stay a NEW Dataset per call: re-executing a
    * memoized Dataset's own RDD would reuse the previous run's shuffle
    * map outputs and measure almost nothing.
    * ONLY for packs whose every entry is a pure plan builder (no writes,
    * no driver-side collects, no persist-tracked scratch frames, no
    * streaming runs) — wrapping an impure builder would skip the very
    * work its gate measures. Purity here also freezes the optimized
    * plan for the session: a builder whose PLAN depends on mutable
    * session state (not just its timing) is doubly unsafe to cache.
    */
  def planCachedPack(
      pack: Map[String, ((SparkSession, String) => DataFrame, String)],
      except: Set[String] = Set.empty)
      : Map[String, ((SparkSession, String) => DataFrame, String)] =
    pack.map {
      case (name, entry) if except(name) => name -> entry
      case (name, (fn, sql)) =>
        name -> (((spark: SparkSession, sfDir: String) => {
          val m = planMap(spark)
          val opt = m.synchronized {
            m.getOrElseUpdate(s"plan#$name#$sfDir",
              org.apache.spark.sql.graft.PlanShim.optimizedPlan(fn(spark, sfDir)))
          }
          org.apache.spark.sql.graft.PlanShim.ofRows(spark, opt)
        }, sql))
    }

  private def planMap(spark: SparkSession): scala.collection.mutable.Map[
      String, org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] = {
    registerCleanup(spark)
    plans.synchronized {
      var m = plans.get(spark)
      if (m == null) {
        m = scala.collection.mutable.Map.empty[
          String, org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]
        plans.put(spark, m)
      }
      m
    }
  }

  /** A parquet table widened to the parallelism floor, MEMOIZED but not
    * persisted: the standard read path for corpus tables. The memo
    * avoids re-planning the widen guard (`rdd.getNumPartitions` builds a
    * physical plan) on every query; keeping the frame unpersisted keeps
    * the parquet scan — with its column pruning, filter pushdown, and
    * size statistics — visible to every consumer's plan, which an
    * InMemoryRelation would hide. (A corpus table is also exactly the
    * frame that does NOT fit a buffer pool at 100 TB, unlike the
    * fact-frame projection behind [[getOrBuild]].)
    */
  def widenedParquet(spark: SparkSession, path: String): DataFrame =
    memo(spark, path)(
      graft.ext.Parallelism.widen(spark.read.parquet(path)))
}
