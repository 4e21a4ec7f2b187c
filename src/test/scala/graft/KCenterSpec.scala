package graft

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData

import graft.functions.KCenterAgg

/** Semantics + theory pins for greedy k-center diversity selection
  * (`diversity_kcenter`, [[graft.functions.KCenterAgg]]):
  *
  *  1. the covering-radius curve is monotone non-increasing (each d2 is
  *     the max-min distance at selection time; the candidate pool only
  *     shrinks and the selected set only grows);
  *  2. Gonzalez's 2-APPROXIMATION GUARANTEE, exhaustively: on random
  *     small instances the greedy covering radius is ≤ 2× the optimal
  *     k-center radius (≤ 4× in the squared metric the engine reports),
  *     with the optimum found by brute force over all k-subsets — the
  *     published bound the algorithm is chosen for, pinned as a test;
  *  3. determinism details: seed = lowest id with d2 = 0, ties to the
  *     lowest id;
  *  4. buffer serde round-trip (the shuffle path of the sample
  *     collection).
  */
class KCenterSpec extends SparkSpec {

  private def select(agg: KCenterAgg,
      pts: Seq[(Long, Array[Long])]): Seq[(Long, Long, Long)] = {
    val buf = mutable.ArrayBuffer.empty[(Long, Array[Long])] ++= pts
    val arr = agg.eval(buf).asInstanceOf[ArrayData]
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 3)
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
  }

  private def d2(a: Array[Long], b: Array[Long]): Long =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  private def radius(pts: Seq[(Long, Array[Long])], centers: Seq[Long]): Long = {
    val cs = pts.filter(p => centers.contains(p._1)).map(_._2)
    pts.map(p => cs.map(c => d2(p._2, c)).min).max
  }

  test("fixture selection: monotone covering curve, lowest-id seed") {
    val rows = graft.queries.ExtQueries.diversityKcenter(
      spark, "/root/testdata/sf0.001").orderBy("rank").collect()
    assert(rows.length == 8)
    assert(rows.head.getAs[Long]("d2") == 0L)
    val d2s = rows.map(_.getAs[Long]("d2")).drop(1)
    d2s.sliding(2).foreach { w =>
      assert(w(0) >= w(1), s"covering curve increased: ${d2s.toSeq}")
    }
  }

  test("property: greedy radius <= 2x optimal (4x squared), brute-forced") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val point = Gen.listOfN(3, Gen.choose(-50L, 50L)).map(_.toArray)
    val instance = for {
      n <- Gen.choose(3, 8)
      ps <- Gen.listOfN(n, point)
      k <- Gen.choose(2, 3)
    } yield (ps.zipWithIndex.map { case (p, i) => (i.toLong, p) }, k)
    val prop = Prop.forAll(instance) { case (pts, k) =>
      val agg = KCenterAgg(Literal(0L), Literal(0L), k = k)
      val sel = select(agg, pts).map(_._2)
      val greedy = radius(pts, sel)
      val opt = pts.map(_._1).combinations(k)
        .map(c => radius(pts, c)).min
      greedy <= 4 * opt
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, s"2-approximation violated: ${res.status}")
  }

  test("tie-break and duplicate-point behavior are deterministic") {
    val agg = KCenterAgg(Literal(0L), Literal(0L), k = 3)
    // two points equidistant from the seed: the lower id wins rank 2;
    // an exact duplicate of a selected point (id 3 == id 0) has
    // d_min = 0 and never wins while distinct points remain
    val pts = Seq(
      (0L, Array(0L, 0L)), (1L, Array(10L, 0L)),
      (2L, Array(-10L, 0L)), (3L, Array(0L, 0L)))
    val out = select(agg, pts)
    assert(out == Seq((1L, 0L, 0L), (2L, 1L, 100L), (3L, 2L, 100L)))
  }

  test("k larger than the point set stops at n selections") {
    val agg = KCenterAgg(Literal(0L), Literal(0L), k = 10)
    val out = select(agg, Seq((5L, Array(1L)), (7L, Array(4L))))
    assert(out == Seq((1L, 5L, 0L), (2L, 7L, 9L)))
  }

  test("buffer serialize/deserialize round-trips") {
    val agg = KCenterAgg(Literal(0L), Literal(0L), k = 2)
    val buf = mutable.ArrayBuffer((1L, Array(1L, 2L)), (9L, Array.empty[Long]))
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.map(_._1) == buf.map(_._1))
    assert(back.map(_._2.toSeq) == buf.map(_._2.toSeq))
  }
}
