package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit contract for the native KMV bottom-K-distinct aggregate
  * (graft_kmv_bottomk): dedup inside the buffer, K-cap, ascending
  * order, null skipping, literal-shape argument errors — plus the
  * merge-order invariance the sketch's set semantics promise.
  */
class KmvBottomKSpec extends SparkSpec {
  import spark.implicits._

  test("bottom-K distinct ascending, duplicates collapse, nulls skipped") {
    val df = Seq[(String, java.lang.Long)](
      ("a", 5L), ("a", 3L), ("a", 3L), ("a", 9L), ("a", 1L), ("a", null),
      ("b", 7L))
      .toDF("g", "h")
    val out = df.groupBy($"g")
      .agg(expr("graft_kmv_bottomk(h, 3)").as("hs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(out("a") == Seq(1L, 3L, 5L))
    assert(out("b") == Seq(7L))
  }

  test("result is partitioning-invariant (bounded merge is a set union)") {
    val vals = (1L to 1000L).map(i => (i * 2654435761L) % 100000L)
    def run(parts: Int): Seq[Long] =
      vals.toDF("h").repartition(parts)
        .agg(expr("graft_kmv_bottomk(h, 16)")).collect()(0).getSeq[Long](0)
    val expected = vals.distinct.sorted.take(16)
    assert(run(1) == expected)
    assert(run(7) == expected)
    assert(run(32) == expected)
  }

  test("fewer distinct values than K returns them all") {
    val out = Seq(4L, 4L, 2L).toDF("h")
      .agg(expr("graft_kmv_bottomk(h, 8)")).collect()(0).getSeq[Long](0)
    assert(out == Seq(2L, 4L))
  }

  test("k must be a positive integer literal") {
    val df = Seq(1L).toDF("h")
    val e1 = intercept[Exception](
      df.agg(expr("graft_kmv_bottomk(h, 0)")).collect())
    assert(e1.getMessage.contains("k >= 1") || e1.getMessage.contains("0"))
    val e2 = intercept[Exception](
      df.agg(expr("graft_kmv_bottomk(h, h)")).collect())
    assert(e2 != null)
  }
}
