package graft

import java.util.concurrent.{Callable, CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.DataFrame
import graft.sources.TableCache

/** Contract of TableCache.memo's per-key holders (round 12): the
  * builder runs AT MOST ONCE per (session, key) under a thread race, a
  * slow build of one key never blocks a different key's lookup (the
  * session-wide map lock covers holder creation only — the property the
  * round-12 review fix exists for; under the old build-under-map-lock
  * scheme the cross-key test below deadlocks its 10 s timeout), and a
  * failed build leaves the cell empty so the next caller retries.
  */
class MemoConcurrencySpec extends SparkSpec {

  test("memo builds at most once per key under a 16-thread race") {
    val built = new AtomicInteger(0)
    val go = new CountDownLatch(1)
    val key = "memoSpec#race#" + System.nanoTime()
    val pool = Executors.newFixedThreadPool(16)
    try {
      val futures = (0 until 16).map { _ =>
        pool.submit(new Callable[DataFrame] {
          def call(): DataFrame = {
            go.await()
            TableCache.memo(spark, key) {
              built.incrementAndGet()
              spark.range(1).toDF("x")
            }
          }
        })
      }
      go.countDown()
      val out = futures.map(_.get(30, TimeUnit.SECONDS))
      assert(built.get() == 1, s"builder ran ${built.get()} times")
      // every racer gets the SAME frame instance, not an equal copy
      assert(out.forall(_ eq out.head))
    } finally pool.shutdown()
  }

  test("a slow build of one key does not block another key's memo access") {
    val slowEntered = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val slowKey = "memoSpec#slow#" + System.nanoTime()
    val fastKey = "memoSpec#fast#" + System.nanoTime()
    val pool = Executors.newFixedThreadPool(2)
    try {
      val slow = pool.submit(new Callable[Unit] {
        def call(): Unit = {
          TableCache.memo(spark, slowKey) {
            slowEntered.countDown()
            release.await() // a "collect job" in flight
            spark.range(1).toDF("x")
          }
          ()
        }
      })
      assert(slowEntered.await(10, TimeUnit.SECONDS))
      // with the slow build parked inside ITS holder, a different key
      // must complete — under a map-wide build lock this get times out
      val fast = pool.submit(new Callable[Unit] {
        def call(): Unit = { TableCache.memo(spark, fastKey)(spark.range(2).toDF("x")); () }
      })
      fast.get(10, TimeUnit.SECONDS)
      release.countDown()
      slow.get(10, TimeUnit.SECONDS)
    } finally pool.shutdown()
  }

  test("a failed build is retried; the first success is cached") {
    val attempts = new AtomicInteger(0)
    val key = "memoSpec#retry#" + System.nanoTime()
    def build: DataFrame = {
      if (attempts.incrementAndGet() == 1) sys.error("first build dies")
      spark.range(3).toDF("x")
    }
    intercept[RuntimeException] { TableCache.memo(spark, key)(build) }
    val ok = TableCache.memo(spark, key)(build)
    val again = TableCache.memo(spark, key)(build)
    assert(attempts.get() == 2, s"expected 2 attempts, saw ${attempts.get()}")
    assert(ok eq again)
  }
}
