package graft

import org.apache.spark.sql.functions._
import graft.ext.Dedup

/** The banded near-dup candidate generator and the connected-components
  * label propagation, checked against exhaustive JVM-side references.
  */
class DedupGraphSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Independent simhash reference: first `bits/4` md5 hex chars per
    * token, ±1 vote per bit, positive votes set the bit.
    */
  private def refSimhash(text: String, bits: Int): Long = {
    val hashes = text.toLowerCase.split(" ", -1)
      .map(t => java.lang.Long.parseLong(md5hex(t).take(bits / 4), 16))
    (0 until bits).map { i =>
      val vote = hashes.map(h => if (((h >> i) & 1L) == 1L) 1 else -1).sum
      if (vote > 0) 1L << i else 0L
    }.sum
  }

  test("simhashBits matches the JVM reference at 16 and 32 bits") {
    val texts = Seq("the quick brown fox", "the quick brown fox jumps",
      "lorem ipsum dolor", "a", "a b a b a")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    for (bits <- Seq(16, 32)) {
      val got = Dedup.simhashBits(docs, bits).orderBy("doc_id")
        .collect().map(_.getLong(1)).toSeq
      assert(got == texts.map(refSimhash(_, bits)), s"bits=$bits")
    }
  }

  test("banded near-dup pairs equal the brute-force hamming<=3 scan") {
    // fingerprints engineered to cover: identical, hamming 1-3 within one
    // band, hamming 3 spread across bands, hamming 4 (must be absent even
    // though a band matches), and far-apart values
    val fps = Seq(
      1L -> 0x12345678L, 2L -> 0x12345678L, // hamming 0
      3L -> 0x12345679L,                    // 1 vs doc1
      4L -> 0x1234567bL,                    // 2 vs doc1
      5L -> 0x92345779L,                    // 3 vs doc1, spread over 3 bands
      6L -> 0x12345677L,                    // 4 vs doc1, all in band0: other
                                            // bands match, so it IS a banding
                                            // candidate — must be filtered
      7L -> 0xffffffffL, 8L -> 0x00000000L)
      .toDF("doc_id", "simhash")
    val got = Dedup.simhashNeardupPairs(fps, numBands = 4, bits = 32)
      .orderBy("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val raw = fps.collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (a, sa) <- raw; (b, sb) <- raw if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (a, b, h)).sortBy(p => (p._1, p._2)).toSeq
    assert(got == brute)
    assert(!got.exists(p => p._1 == 1L && p._2 == 6L)) // hamming 4 excluded
  }

  test("connectedComponents finds min-label components across a chain") {
    // chain 1-2-3-4-5 (diameter forces several propagation rounds),
    // pair 7-8, singletons 6 and 9
    val nodes = (1L to 9L).toDF("doc_id")
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (5L, 4L), (7L, 8L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(nodes, edges)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      6L -> 6L, 7L -> 7L, 8L -> 7L, 9L -> 9L)
    assert(got == want)
  }

  test("connectedComponents with no edges is the identity labeling") {
    val nodes = (1L to 3L).toDF("doc_id")
    val edges = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(nodes, edges)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }
}
