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

  test("primitive buffer: eviction, duplicate-of-max, early-exit merge, negatives") {
    import graft.functions.LongBottomK
    def ref(vals: Seq[Long], k: Int): Seq[Long] = vals.distinct.sorted.take(k)

    // full-buffer eviction keeps the k smallest, duplicates (incl. of
    // the current max) are no-ops
    val b = new LongBottomK(3)
    Seq(5L, 9L, 7L, 9L, 7L, 4L, 8L, 4L).foreach(b.add)
    assert(b.arr.take(b.size).toSeq == Seq(4L, 5L, 7L))

    // merge early-exit: every incoming value ≥ max of a full buffer —
    // the walk must stop without perturbing the result
    val lo = new LongBottomK(3); Seq(1L, 2L, 3L).foreach(lo.add)
    val hi = new LongBottomK(3); Seq(3L, 50L, 60L).foreach(hi.add)
    val merged = {
      val agg = graft.functions.KmvBottomKAgg(org.apache.spark.sql.catalyst.expressions.Literal(1L), 3)
      agg.merge(lo, hi)
    }
    assert(merged.arr.take(merged.size).toSeq == Seq(1L, 2L, 3L))

    // negatives order before positives (signed comparison)
    val n = new LongBottomK(4)
    Seq(10L, -5L, 0L, -20L, 3L).foreach(n.add)
    assert(n.arr.take(n.size).toSeq == Seq(-20L, -5L, 0L, 3L))

    // randomized agreement with the reference construction, split
    // across two buffers merged in both orders
    val rnd = new scala.util.Random(42)
    (0 until 50).foreach { _ =>
      val vals = Seq.fill(rnd.nextInt(200))(rnd.nextLong() % 1000)
      val k = 1 + rnd.nextInt(16)
      val (l, r) = vals.splitAt(rnd.nextInt(vals.length + 1))
      val agg = graft.functions.KmvBottomKAgg(org.apache.spark.sql.catalyst.expressions.Literal(1L), k)
      val b1 = new LongBottomK(k); l.foreach(b1.add)
      val b2 = new LongBottomK(k); r.foreach(b2.add)
      val m12 = agg.merge(b1, b2)
      assert(m12.arr.take(m12.size).toSeq == ref(vals, k),
        s"k=$k vals=$vals")
      val c1 = new LongBottomK(k); l.foreach(c1.add)
      val c2 = new LongBottomK(k); r.foreach(c2.add)
      val m21 = agg.merge(c2, c1)
      assert(m21.arr.take(m21.size).toSeq == ref(vals, k))
      // serialize/deserialize roundtrip preserves the prefix
      val back = agg.deserialize(agg.serialize(m12))
      assert(back.arr.take(back.size).toSeq == m12.arr.take(m12.size).toSeq)
    }
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
