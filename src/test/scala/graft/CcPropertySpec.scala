package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.ext.Dedup

/** Randomized equivalence: distributed min-label propagation (with
  * pointer jumping and lineage checkpoints) must match a sequential
  * union-find on arbitrary small graphs — chains, stars, cycles, forests,
  * whatever the generator produces. Few cases, because each run costs
  * real Spark jobs; breadth comes from the generator, not the count.
  */
class CcPropertySpec extends SparkSpec {
  import spark.implicits._

  private val graphs: Gen[(Int, List[(Long, Long)])] = for {
    n <- Gen.choose(2, 24)
    m <- Gen.choose(0, n * 2)
    edges <- Gen.listOfN(m, for {
      a <- Gen.choose(0L, n - 1L); b <- Gen.choose(0L, n - 1L) if a != b
    } yield (a, b))
  } yield (n, edges)

  test("connectedComponents equals union-find on random graphs") {
    val prop = Prop.forAll(graphs) { case (n, edges) =>
      val parent = Array.tabulate(n.toLong.toInt)(i => i)
      def find(x: Int): Int =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = (0 until n).map(i => i.toLong -> find(i).toLong)
      val got = Dedup.connectedComponents(
          (0L until n.toLong).toDF("doc_id"),
          edges.toDF("doc_a", "doc_b"))
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(8).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }
}
