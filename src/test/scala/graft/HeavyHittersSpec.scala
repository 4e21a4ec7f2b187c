package graft

import org.apache.spark.sql.functions._
import graft.ext.TextOps
import graft.queries.ExtQueries

/** The Misra–Gries summary and its two consumers: the heavy-hitters
  * query (candidate superset + exact re-count) and the incremental-dedup
  * membership invariants. The fixture corpus is near-uniform, so the
  * oracle run never exercises MG's decrement branch — these tests do,
  * on skewed synthetic streams, against brute-force counts.
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def brute(xs: Seq[String]): Map[String, Long] =
    xs.groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("misraGries holds every item above n/k (skewed random streams)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 20) {
      val k = 2 + rnd.nextInt(30)
      // zipf-ish: item i drawn with weight ~ 1/(i+1)
      val vocab = (0 until 50).map(i => s"w$i")
      val weights = vocab.indices.map(i => 1.0 / (i + 1))
      val total = weights.sum
      val n = 200 + rnd.nextInt(2000)
      val stream = Seq.fill(n) {
        var r = rnd.nextDouble() * total; var i = 0
        while (r > weights(i) && i < vocab.size - 1) { r -= weights(i); i += 1 }
        vocab(i)
      }
      val out = TextOps.misraGries(stream.iterator, k).toSet
      assert(out.size <= k, s"trial $trial: summary exceeded $k counters")
      val heavy = brute(stream).collect {
        case (w, c) if c * k > n => w
      }.toSet
      assert(heavy.subsetOf(out),
        s"trial $trial: missed heavy hitters ${heavy.diff(out)} (k=$k, n=$n)")
    }
  }

  test("misraGries decrement branch: dominant item survives k=3") {
    val stream = scala.util.Random.shuffle(
      (List.fill(60)("dom") ++ ('a' to 'z').map(_.toString).toList))
    val out = TextOps.misraGries(stream.iterator, 3).toSet
    assert(out.contains("dom")) // 60 of 86 occurrences > n/3
    assert(out.size <= 3)
  }

  test("heavy-hitter pipeline is partition-independent on a skewed stream") {
    val rnd = new scala.util.Random(7)
    val toks = Seq.fill(5000)(s"t${rnd.nextInt(rnd.nextInt(400) + 1)}")
    val expected = brute(toks).collect {
      case (t, c) if c * 50 > toks.size => (t, c)
    }.toSet
    for (parts <- Seq(1, 3, 8)) {
      val ds = toks.toDS().repartition(parts)
      val cands = ds.mapPartitions(it => TextOps.misraGries(it, 50))
        .toDF("token").distinct()
      val got = ds.toDF("token").join(broadcast(cands), Seq("token"))
        .groupBy("token").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * 50 > toks.size)
        .as[(String, Long)].collect().toSet
      assert(got == expected, s"partitions=$parts")
    }
  }

  test("cms_counts: estimate dominates the exact count, error within d*w bound") {
    val out = ExtQueries.all("cms_counts")._1(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length == 20)
    out.foreach { case (tok, cnt, est, over) =>
      assert(est >= cnt, s"$tok: CMS under-counted ($est < $cnt)")
      assert(over == est - cnt, tok)
    }
    // Markov bound on the min-row estimate: E[overcount] = (n - cnt)/w
    // per row; an overcount beyond 40x that expectation across ALL 20
    // probes would mean the hash rows are not spreading (the classic
    // failure is every row hashing alike). n = total tokens.
    val n = out.map(_._2).sum.max(1L) // top-20 mass is a lower bound on n
    assert(out.forall(_._4 <= 40L * n / 1024L + 1L),
      out.filter(_._4 > 40L * n / 1024L + 1L).mkString(","))
  }

  test("CMS counter grid is mergeable: any input partitioning, same counters") {
    // the sketch is a groupBy over (row, bucket) — partial per-partition
    // counters must merge to the identical grid however the token
    // stream is split (this is what lets per-day sketches add at 100 TB)
    val rnd = new scala.util.Random(11)
    val toks = Seq.fill(3000)(s"t${rnd.nextInt(200)}")
    def grid(parts: Int): Set[(Int, Long, Long)] =
      toks.toDS().repartition(parts).toDF("tok")
        .select(posexplode(array((0 until 4).map(j =>
          conv(substring(md5(concat(lit(s"$j:"), col("tok"))), 1, 15), 16, 10)
            .cast("long") % 1024): _*)).as(Seq("row", "bucket")))
        .groupBy("row", "bucket").agg(count(lit(1)).as("c"))
        .as[(Int, Long, Long)].collect().toSet
    assert(grid(1) == grid(8))
  }

  test("streamed CMS grid answers the same estimates as the batch sketch") {
    // the stream splits the token files across micro-batches
    // (maxFilesPerTrigger=1), so equality here means the state store
    // merged partial counter grids across batches into the exact batch
    // grid — the streaming form of mergeability
    val sf = "/root/testdata/sf0.001"
    val batch = ExtQueries.all("cms_counts")._1(spark, sf)
      .collect().map(_.toSeq).toSet
    val streamed = graft.queries.AnalyticsQueries.cmsCountsStream(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(batch.size == 20)
  }

  test("dedup_incremental: batch membership, corpus-side dup_of, kept sentinel") {
    // sf0.01: the 0.001 fixture's few cross-split near-dup pairs all sit
    // near jaccard 0.5, where 4-band×2-row LSH recall is ~0.68 per pair,
    // and none happens to collide — correct (the oracle models the same
    // scheme) but vacuous for the is_dup branch this test wants to see
    val sf = "/root/testdata/sf0.01"
    val rows = ExtQueries.dedupIncremental(spark, sf)
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2)))
    assert(rows.nonEmpty)
    def bucket(id: Long): Long = {
      val hex = org.apache.commons.codec.digest.DigestUtils.md5Hex(id.toString)
      java.lang.Long.parseLong(hex.substring(0, 15), 16) % 100
    }
    rows.foreach { case (id, isDup, dupOf) =>
      assert(bucket(id) >= 80, s"doc $id is not batch-side")
      if (isDup) assert(bucket(dupOf) < 80, s"dup_of $dupOf is not corpus-side")
      else assert(dupOf == -1L)
    }
    assert(rows.exists(_._2), "fixture should contain at least one cross dup")
  }
}
