package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for corpus curation, in increasing fuzziness:
  * exact (content fingerprint), n-gram Jaccard (bucketed exact), and
  * MinHash+LSH (probabilistic candidate generation, then exact
  * verification on the tiny candidate set). Each stage is shaped for
  * scale: candidate generation never compares all pairs — it buckets
  * (by band hash or by partition columns) so the quadratic step only runs
  * inside small groups.
  */
object Dedup {

  /** Exact dedup: group by the normalized-content fingerprint; keep the
    * lowest doc_id as the canonical representative.
    */
  def exactGroups(docs: DataFrame): DataFrame =
    docs
      .groupBy(TextOps.fingerprint(col("text")).as("fp"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keep_doc"))

  /** Distinct n-gram shingles per document, with a bucket column to bound
    * downstream pair joins.
    */
  def shingleSets(docs: DataFrame, n: Int, bucket: Column): DataFrame =
    docs
      .select(col("doc_id"), bucket.as("bucket"),
        explode(TextOps.shingles("toks", n)).as("sh"))
      .distinct()

  /** Exact pairwise Jaccard within buckets: |A∩B| via a self-join on the
    * shingle, sizes via per-doc counts, one double division at the end.
    * The bucket key keeps the join quadratic only within small groups.
    */
  def jaccardPairs(shingles: DataFrame, minJaccard: Double): DataFrame = {
    val sizes = shingles.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val a = shingles.select(col("bucket"), col("doc_id").as("doc_a"), col("sh"))
    val b = shingles.select(col("bucket"), col("doc_id").as("doc_b"), col("sh"))
    val common = a.join(b, Seq("bucket", "sh"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("n_sh", "n_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("n_sh", "n_b"), "doc_b")
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), col("n_common"), col("n_a"),
        col("n_b"), col("jaccard"))
  }

  /** MinHash signature matrix: `numSigs` min-hashes per doc. Each seeded
    * md5 yields TWO independent 64-bit signatures (its two halves), and
    * the md5s are projected *before* the aggregation — numSigs/2 hash
    * evaluations per shingle instead of numSigs, with no repeated md5
    * inside the agg expressions.
    */
  def minhashSignatures(shingles: DataFrame, numSigs: Int): DataFrame = {
    require(numSigs % 2 == 0, "numSigs must be even (two sigs per md5)")
    val withHashes = (0 until numSigs / 2).foldLeft(shingles) { (df, s) =>
      df.withColumn(s"m$s", md5(concat(lit(s.toString), lit("|"), col("sh"))))
    }
    val sigAggs = (0 until numSigs).map { i =>
      min(substring(col(s"m${i / 2}"), 1 + 16 * (i % 2), 16)).as(s"sig$i")
    } :+ count(lit(1)).as("n_sh") // set size rides along: no separate pass
    withHashes
      .groupBy(col("doc_id"), col("bucket"))
      .agg(sigAggs.head, sigAggs.tail: _*)
  }

  /** LSH banding: concatenate `rowsPerBand` signatures per band and hash;
    * docs sharing any band hash (within a bucket) become candidate pairs.
    * Collision probability per band is jaccard^rowsPerBand — the knob that
    * trades recall for candidate-set size at scale.
    */
  def lshCandidates(sigs: DataFrame, numSigs: Int, rowsPerBand: Int): DataFrame = {
    val numBands = numSigs / rowsPerBand
    val bands = (0 until numBands).map { bnd =>
      val parts = (0 until rowsPerBand).map(r => col(s"sig${bnd * rowsPerBand + r}"))
      struct(lit(bnd).as("band"), md5(concat_ws(",", parts: _*)).as("bh"))
    }
    val exploded = sigs
      .select(col("doc_id"), col("bucket"), explode(array(bands: _*)).as("b"))
      .select(col("doc_id"), col("bucket"), col("b.band").as("band"), col("b.bh").as("bh"))
    exploded.as("x")
      .join(exploded.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.band") === col("y.band") &&
          col("x.bh") === col("y.bh") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
  }

  /** SimHash fingerprints (16-bit) per document: explode tokens, hash to
    * 16 bits, per-bit ±1 votes, reassemble the positive-vote bits.
    */
  def simhash16(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(TextOps.tokens(col("text"))).as("tok"))
      .withColumn("h", TextOps.tokenHash16(col("tok")))
    val votes = toks.groupBy(col("doc_id"))
      .agg(TextOps.simhashBitVotes(col("h"), 0).as("v0"),
        (1 until 16).map(i => TextOps.simhashBitVotes(col("h"), i).as(s"v$i")): _*)
    val fp = (0 until 16).map(i =>
      when(col(s"v$i") > 0, lit(1L << i)).otherwise(lit(0L))).reduce(_ + _)
    votes.select(col("doc_id"), fp.as("simhash"))
  }
}
