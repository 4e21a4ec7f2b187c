package graft

import org.apache.spark.sql.functions._
import graft.queries.ExtQueries

/** End-to-end check of the representative-collapsed dedup grouping on a
  * corpus that HAS exact-duplicate clusters — the case the parquet
  * fixtures don't cover and the optimization's equivalence argument
  * rests on. The expected components come from an independent JVM
  * union-find over the full edge set (every exact-dup pair, every
  * hamming-≤3 simhash pair over ALL docs, no collapse).
  */
class DedupGroupsSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def refSimhash(text: String, bits: Int): Long = {
    val hashes = text.toLowerCase.split(" ", -1)
      .map(t => java.lang.Long.parseLong(md5hex(t).take(bits / 4), 16))
    (0 until bits).map { i =>
      val vote = hashes.map(h => if (((h >> i) & 1L) == 1L) 1 else -1).sum
      if (vote > 0) 1L << i else 0L
    }.sum
  }

  test("grouping with exact-dup clusters equals brute-force union-find") {
    // base texts; docs 0-2 exact copies, 3 a near-dup of them (small
    // token change), 4-5 exact copies of another text, 6 unrelated
    val texts = Seq(
      0L -> "the quick brown fox jumps over the lazy dog today",
      1L -> "the quick brown fox jumps over the lazy dog today",
      2L -> "the quick brown fox jumps over the lazy dog today",
      3L -> "the quick brown fox jumps over the lazy dog tonight",
      4L -> "entirely different content about spark query engines",
      5L -> "entirely different content about spark query engines",
      6L -> "unrelated corpus text with nothing shared at all here")
    val dir = java.nio.file.Files.createTempDirectory("dgspec").toString
    texts.map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // independent reference: union-find over ALL pairwise edges
    val parent = scala.collection.mutable.Map(texts.map(t => t._1 -> t._1): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val norm = texts.map { case (id, t) => id -> t.toLowerCase.replace(" ", "") }
    for ((a, ta) <- norm; (b, tb) <- norm if a < b && ta == tb) union(a, b)
    val fps = texts.map { case (id, t) => id -> refSimhash(t, 32) }
    for ((a, fa) <- fps; (b, fb) <- fps
         if a < b && java.lang.Long.bitCount(fa ^ fb) <= 3) union(a, b)
    val want = texts.map { case (id, _) =>
      (id, find(id), id != find(id)) }.sortBy(_._1)

    val got = ExtQueries.dedupGroups(spark, dir)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(got == want)
    // sanity on the scenario itself: the near-dup doc merged with the
    // exact cluster (0-3 one group), 4-5 another, 6 alone
    assert(want.count(!_._3) == 3, s"expected 3 groups in $want")
  }
}
