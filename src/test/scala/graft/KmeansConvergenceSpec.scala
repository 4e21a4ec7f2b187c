package graft

/** Pins the convergence SIGNALS behind `emb_kmeans_full`'s fixed-depth
  * Lloyd's run — the two numbers a deployment's stopping rule actually
  * watches, both EXACT on these integer fixtures (no tolerance, no
  * noise):
  *
  *  - per-round assignment movement strictly declines (r1→r2 moves >
  *    r2→r3 moves) — the run is converging, not oscillating;
  *  - total SSE is non-increasing across rounds — Lloyd's monotonicity,
  *    which both the integer-mean recenter and the exact integer
  *    distance must preserve.
  *
  * The fixture's movement tail is long (measured: 32 of the 500
  * sf0.001 fixture vectors still moving at r2→r3 — the 6.4% figure the
  * bound below states), so a fixed-point assertion would
  * either lie or demand an absurd unroll depth; fixed depth + declining
  * movement is the honest production contract and the builder's
  * scaladoc states the measured numbers.
  */
class KmeansConvergenceSpec extends SparkSpec {

  private def assignments(sf: String, rounds: Int): Map[Long, Long] =
    graft.queries.ExtQueries.kmeansAssignment(spark, sf, rounds)
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def sse(sf: String, rounds: Int): Long =
    graft.queries.ExtQueries.kmeansAssignment(spark, sf, rounds)
      .agg(org.apache.spark.sql.functions.sum("d")).collect()(0).getLong(0)

  for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    test(s"assignment movement strictly declines per round at ${sf.split('/').last}") {
      val a1 = assignments(sf, 1)
      val a2 = assignments(sf, 2)
      val a3 = assignments(sf, 3)
      assert(a1.size == a2.size && a2.size == a3.size)
      val m12 = a2.count { case (v, c) => a1(v) != c }
      val m23 = a3.count { case (v, c) => a2(v) != c }
      assert(m12 > m23,
        s"movement must decline: r1->r2 moved $m12, r2->r3 moved $m23")
      // and the tail is small relative to the corpus: the census the
      // query reports is a near-converged clustering, not round noise
      // (measured 6.4% / 7.2% of the 500-vector small-sf fixtures; the
      // bound separates "settling tail" from "still churning")
      assert(m23 * 100 <= a3.size * 10,
        s"r2->r3 still moves $m23 of ${a3.size} vectors (>10%)")
    }

    test(s"SSE is non-increasing across rounds at ${sf.split('/').last}") {
      val s1 = sse(sf, 1)
      val s2 = sse(sf, 2)
      val s3 = sse(sf, 3)
      assert(s1 >= s2 && s2 >= s3,
        s"Lloyd monotonicity violated: sse rounds 1..3 = $s1, $s2, $s3")
    }
  }
}
