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
      // both strategy arms must agree with the sequential answer: cutoff
      // high → single-task union-find path; cutoff 0 → iterative
      // min-label-propagation path (otherwise small test graphs would
      // never exercise the 100 TB path)
      val nodes = (0L until n.toLong).toDF("doc_id")
      val edgeDf = edges.toDF("doc_a", "doc_b")
      Seq(Long.MaxValue, 0L).forall { cutoff =>
        val got = Dedup.connectedComponents(
            nodes, edgeDf, smallGraphEdgeCutoff = cutoff)
          .orderBy("doc_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq
        got == want
      }
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(8).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }

  test("banded near-dup pairs equal brute force on random fingerprints") {
    // clustered generator: base values plus small bit flips, so hamming
    // 1-4 pairs actually occur instead of almost never at 32 bits
    val fpSets: Gen[List[(Long, Long)]] = for {
      n <- Gen.choose(2, 12)
      bases <- Gen.listOfN(n, Gen.choose(0L, (1L << 32) - 1))
      perturbed <- Gen.sequence[List[Long], Long](bases.map { b =>
        Gen.choose(0, 4).flatMap(k =>
          Gen.listOfN(k, Gen.choose(0, 31)).map(_.foldLeft(b)((v, i) => v ^ (1L << i))))
      })
    } yield perturbed.zipWithIndex.map { case (fp, i) => (i.toLong, fp) }

    val prop = Prop.forAll(fpSets) { fps =>
      val got = Dedup.simhashNeardupPairs(
          fps.toDF("doc_id", "simhash"), numBands = 4, bits = 32)
        .orderBy("doc_a", "doc_b")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
      val brute = (for {
        (a, fa) <- fps; (b, fb) <- fps if a < b
        h = java.lang.Long.bitCount(fa ^ fb) if h <= 3
      } yield (a, b, h)).sortBy(p => (p._1, p._2))
      got == brute
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(8).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }
}
