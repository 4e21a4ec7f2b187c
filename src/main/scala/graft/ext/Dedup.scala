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

  /** Distinct n-gram shingles per document, hashed to a 60-bit integer
    * (first 15 md5 hex chars) BEFORE the distinct — every downstream
    * shuffle, distinct, and join then carries an 8-byte long instead of a
    * ~40-byte shingle string. At corpus scale the shingle frame is the
    * biggest intermediate in the whole dedup pipeline, so narrowing it is
    * worth the (codegen'd, per-occurrence) md5. Set semantics are over
    * hashes: a 60-bit collision inside one document merges two shingles,
    * with probability ~n_sh²/2⁶¹ per doc — negligible, and the oracle
    * hashes identically so the comparison stays exact.
    */
  def shingleSets(docs: DataFrame, n: Int, bucket: Column): DataFrame =
    docs
      // the explode below fans each doc into hundreds of shingle rows and
      // is the CPU-heaviest step of every n-gram query; a small corpus
      // arrives as a single parquet split (≤ maxPartitionBytes), which
      // would pin the whole tokenize+md5 pipeline to ONE core. Hashing
      // docs across the cluster first costs one tiny shuffle of the raw
      // text and buys full parallelism — at real corpus scale the scan
      // already yields many splits and this keeps per-task fan-out even.
      .repartition(col("doc_id"))
      .select(col("doc_id"), bucket.as("bucket"),
        explode(TextOps.shingles("toks", n)).as("sh"))
      .select(col("doc_id"), col("bucket"),
        conv(substring(md5(col("sh")), 1, 15), 16, 10).cast("long").as("h"))
      .distinct()

  /** Exact pairwise Jaccard within buckets: |A∩B| via a self-join on the
    * shingle hash, sizes via per-doc counts, one double division at the
    * end. The bucket key keeps the join quadratic only within small
    * groups.
    *
    * `dfCap` is the scale guard: a shingle appearing in d documents of one
    * bucket emits d² rows from the self-join, and at corpus scale a
    * stop-shingle ("of the and"-class) is a full-blown skew key that
    * stalls one reducer. Shingles with document frequency > dfCap are
    * dropped from the sets BEFORE the join — per-shingle fan-out is then
    * ≤ dfCap², and Jaccard becomes Jaccard over the rare-shingle sets
    * (standard practice for near-dup mining; a shingle shared by more
    * than dfCap docs carries no dedup signal anyway). Sizes are computed
    * from the same capped sets so the ratio stays a true Jaccard. The
    * df pre-aggregation is a plain groupBy (map-side combined, no skew),
    * and the filter removes hot keys before any join sees them.
    */
  def jaccardPairs(shingles: DataFrame, minJaccard: Double,
      dfCap: Int = Int.MaxValue): DataFrame = {
    // the tokenize+explode+md5 shingle pipeline feeds the df cap AND
    // three downstream consumers (sizes, both self-join sides) — persist
    // it once instead of recomputing it per consumer (the same pattern
    // minhashLsh uses; ~35% of this query's time was re-shingling).
    // A caller may pass an already-persisted frame (the session-scoped
    // shingle cache shared by the jaccard/containment pair) — leave its
    // lifecycle to its owner; otherwise the persist is per-query and
    // released at the session's next CacheScope.drain().
    val sh =
      if (shingles.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
        shingles
      else CacheScope.register(shingles.persist())
    val capped =
      if (dfCap == Int.MaxValue) sh
      else {
        // the keep set is distinct (bucket, h) pairs with df ≤ cap: small
        // at fixture scale (broadcast); at corpus scale the join stays an
        // equi-join whose BUILD side has no hot keys — the stop-shingle
        // rows on the probe side match nothing and die at the join
        val keep = sh.groupBy(col("bucket"), col("h"))
          .agg(count(lit(1)).as("df"))
          .filter(col("df") <= dfCap)
          .select(col("bucket"), col("h"))
        sh.join(keep, Seq("bucket", "h"))
      }
    val sizes = capped.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val a = capped.select(col("bucket"), col("doc_id").as("doc_a"), col("h"))
    val b = capped.select(col("bucket"), col("doc_id").as("doc_b"), col("h"))
    val common = a.join(b, Seq("bucket", "h"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    val result = common
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
    // the pipeline ends here: persist the candidate-sized (tiny) result
    // LAZILY — the first consumer's action fills the cache, later
    // consumers read it, and plan-only callers (explain, plan-shape
    // specs) pay nothing; released at the session's next
    // CacheScope.drain()
    CacheScope.persistTracked(result)
  }

  /** Mersenne-prime modulus and the fixed affine-permutation constants
    * for MinHash: sig_i = min over shingle hashes h of (a_i·(h mod p) +
    * b_i) mod p. Integer-only, so the DuckDB oracle reproduces every
    * signature bit-for-bit; constants are generated (not magic) and
    * bounded below p so a·x + b stays < 2⁶² — no 64-bit overflow in
    * either engine (Spark ANSI mode would throw, DuckDB would error).
    */
  val MinhashP: Long = 2147483647L // 2^31 - 1
  def minhashCoeffs(numSigs: Int): Seq[(Long, Long)] =
    (1 to numSigs).map { i =>
      ((1103515245L * i + 12345L) % (MinhashP - 1) + 1L,
        (69069L * i + 1013904223L) % MinhashP)
    }

  /** MinHash signature matrix: `numSigs` min-hashes per doc, as affine
    * permutations of the (already md5-derived) shingle hash — zero
    * additional hashing per shingle row; the mins are map-side-combined
    * inside one aggregation.
    */
  def minhashSignatures(shingles: DataFrame, numSigs: Int): DataFrame = {
    val hmod = col("h") % MinhashP
    val sigAggs = minhashCoeffs(numSigs).zipWithIndex.map { case ((a, b), i) =>
      min((hmod * a + b) % MinhashP).as(s"sig$i")
    } :+ count(lit(1)).as("n_sh") // set size rides along: no separate pass
    shingles
      .groupBy(col("doc_id"), col("bucket"))
      .agg(sigAggs.head, sigAggs.tail: _*)
  }

  /** The exploded LSH band table `(doc_id, bucket, band, bh)` — the
    * shared index both the self-join candidate generator
    * ([[lshCandidates]]) and the incremental new-vs-corpus join consume.
    * At 100 TB this is the frame a production pipeline PERSISTS as the
    * corpus dedup index (bucketed by `(bucket, band, bh)`), so each
    * arriving batch joins against it without recomputing corpus
    * signatures.
    */
  def lshBands(sigs: DataFrame, numSigs: Int, rowsPerBand: Int): DataFrame = {
    val numBands = numSigs / rowsPerBand
    val bands = (0 until numBands).map { bnd =>
      val parts = (0 until rowsPerBand).map(r => col(s"sig${bnd * rowsPerBand + r}"))
      struct(lit(bnd).as("band"), md5(concat_ws(",", parts: _*)).as("bh"))
    }
    sigs
      .select(col("doc_id"), col("bucket"), explode(array(bands: _*)).as("b"))
      .select(col("doc_id"), col("bucket"), col("b.band").as("band"), col("b.bh").as("bh"))
  }

  /** LSH banding: concatenate `rowsPerBand` signatures per band and hash;
    * docs sharing any band hash (within a bucket) become candidate pairs.
    * Collision probability per band is jaccard^rowsPerBand — the knob that
    * trades recall for candidate-set size at scale.
    */
  def lshCandidates(sigs: DataFrame, numSigs: Int, rowsPerBand: Int): DataFrame = {
    val exploded = lshBands(sigs, numSigs, rowsPerBand)
    exploded.as("x")
      .join(exploded.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.band") === col("y.band") &&
          col("x.bh") === col("y.bh") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
  }

  /** SimHash near-duplicate pairs within a hamming-distance budget, found
    * WITHOUT an all-pairs comparison: split the 16-bit fingerprint into
    * `numBands` disjoint bands — any pair within hamming distance
    * `numBands - 1` must agree exactly on at least one band (pigeonhole),
    * so an equi-join on (band, band_value) generates a candidate superset
    * and the exact `bit_count(xor)` check filters it. The band join is the
    * shuffle key that replaces the quadratic scan at scale; with 32-bit
    * fingerprints the 8-bit bands give 256 buckets per band, so candidate
    * volume stays near-linear in corpus size.
    */
  def simhashNeardupPairs(fingerprints: DataFrame, numBands: Int = 4,
      bits: Int = 16): DataFrame = {
    val bandBits = bits / numBands
    val mask = (1 << bandBits) - 1
    val bandStructs = (0 until numBands).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("simhash"), b * bandBits).bitwiseAND(lit(mask)).as("bv"))
    }
    val banded = fingerprints
      .select(col("doc_id"), col("simhash"),
        explode(array(bandStructs: _*)).as("b"))
      .select(col("doc_id"), col("simhash"),
        col("b.band").as("band"), col("b.bv").as("bv"))
    banded.as("x")
      .join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.simhash").as("sim_a"), col("y.simhash").as("sim_b"))
      .distinct()
      .withColumn("hamming",
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .filter(col("hamming") <= numBands - 1)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** Connected components — the step that turns near-dup PAIRS into
    * dedup GROUPS (one canonical doc per transitive cluster). Strategy
    * is size-adaptive on the MEASURED symmetric edge count (the edge
    * set is the candidate-pair output, orders of magnitude smaller than
    * the corpus): a small graph is solved by single-task union-find
    * (executor-side `mapPartitions`, nodes never coalesced), a large one
    * by iterative min-label propagation. Each iteration of the large
    * path is one distributed join+agg
    * (every label becomes the min over itself and its neighbors); labels
    * are monotonically non-increasing, so an unchanged label sum is a
    * fixpoint and the loop ends after O(max component diameter)
    * iterations — dedup clusters are shallow, so this is a handful of
    * passes even at corpus scale. Per-iteration frames are checkpointed;
    * the explicit unpersist of the previous frame is best-effort only
    * (it routes through the CacheManager, which does not own a local
    * checkpoint's RDD blocks) — actual reclamation of a superseded
    * round's blocks is the ContextCleaner GC'ing the dereferenced RDD,
    * so transient memory can briefly hold two rounds of labels, still
    * O(|nodes|) with a small constant.
    *
    * `edges` needs columns (doc_a, doc_b); direction is ignored.
    * Returns (doc_id, component) where component = min doc_id reachable.
    */
  /** `distinctEdges = true` lets a caller that ALREADY guarantees
    * unique undirected pairs (e.g. the banded pair frame, which is
    * `.distinct()` at build) skip the symmetrization's dedup shuffle —
    * duplicates never affect correctness here (union-find unions are
    * idempotent, min-label aggregation is duplicate-blind); the dedup
    * only trims wasted per-iteration work when candidate generation
    * over-produces, so callers that cannot promise uniqueness keep the
    * default.
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
      maxIters: Int = 50,
      smallGraphEdgeCutoff: Long = 4000000L,
      distinctEdges: Boolean = false): DataFrame = {
    // Size-adaptive strategy choice, the same philosophy AQE applies to
    // joins: the EDGE set after candidate generation is orders of
    // magnitude smaller than the corpus (it holds near-dup pairs, not
    // documents), and when its measured size fits one task comfortably
    // (≤ `smallGraphEdgeCutoff` symmetric edges ≈ 64 MB of long pairs),
    // a single-task union-find replaces ~6 iterative rounds × 4 stages
    // of scheduler round-trips — two orders of magnitude cheaper at
    // small scale. The NODE frame never collapses: it stays distributed
    // and picks up its labels with one equi-join (isolated nodes keep
    // their own id via the left join). Above the cutoff the iterative
    // distributed loop below runs unchanged — that is the 100 TB path.
    val undirected = edges
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(edges.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    // unique (a < b) input pairs stay unique after both-direction
    // symmetrization, so the dedup shuffle is skippable when promised
    val sym0 = (if (distinctEdges) undirected else undirected.distinct())
      .localCheckpoint(true)
    val nEdges = sym0.count()
    if (nEdges <= smallGraphEdgeCutoff) {
      val spark = nodes.sparkSession
      import spark.implicits._
      // one task: union-find with path compression over the edge list,
      // emitting (node, min doc_id of its set) — executor-side, not a
      // driver collect; determinism comes from the min-root relabel.
      val edgeComp = sym0.select(col("src").cast("long"), col("dst").cast("long"))
        .as[(Long, Long)]
        .coalesce(1)
        .mapPartitions { it =>
          val parent = scala.collection.mutable.HashMap.empty[Long, Long]
          def find(x: Long): Long = {
            var r = x
            while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
            var c = x
            while (parent.getOrElse(c, c) != c) {
              val nxt = parent.getOrElse(c, c); parent(c) = r; c = nxt
            }
            r
          }
          it.foreach { case (a, b) =>
            val ra = find(a); val rb = find(b)
            if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
          }
          val members = parent.keySet ++ parent.values
          val minOfRoot = scala.collection.mutable.HashMap.empty[Long, Long]
          members.foreach { n =>
            val r = find(n)
            minOfRoot(r) = math.min(minOfRoot.getOrElse(r, Long.MaxValue), math.min(n, r))
          }
          members.iterator.map(n => (n, minOfRoot(find(n))))
        }
        .toDF("doc_id", "component")
      // no eager checkpoint and no sym0 release here: the caller's first
      // action materializes this frame while sym0's checkpoint blocks are
      // still referenced by its lineage, and once the caller drops the
      // frame the ContextCleaner reclaims the dereferenced checkpoint RDD
      // (df.unpersist could not free it anyway — the CacheManager does
      // not own a localCheckpoint's blocks). Saves one full
      // materialization job per call.
      return nodes.select(col("doc_id"))
        .join(edgeComp, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("component"), col("doc_id").cast("long")).as("component"))
    }
    connectedComponentsIterative(nodes, sym0, maxIters)
  }

  /** The distributed iterative path (min-label propagation + path
    * halving); `sym` must already be the symmetric, distinct edge list.
    */
  private def connectedComponentsIterative(nodes: DataFrame, sym: DataFrame,
      maxIters: Int): DataFrame = {
    // Eager localCheckpoint per iteration is load-bearing, not a cache:
    // `comp` appears twice in each step's plan (the label join and the
    // neighbor aggregation), so without lineage truncation the logical
    // plan DOUBLES every iteration — exponential planning cost that OOMs
    // the driver long before the data does. Checkpointing pins the rows
    // and restarts the plan from them, exactly how GraphX/GraphFrames run
    // iterative graph algorithms. (On a multi-node cluster prefer
    // `spark.sparkContext.setCheckpointDir` + `checkpoint()` if executor
    // loss must be survivable mid-algorithm.)
    // Each iteration folds a neighbor-min step AND a pointer-jump step
    // (label := label(label), path halving) into ONE lazily-checkpointed
    // frame, so the convergence-sum action both materializes the
    // checkpoint and measures it — one Spark job per iteration, and the
    // jump makes the round count logarithmic in component diameter
    // instead of linear. At corpus scale the per-round data is tiny;
    // scheduler round-trips, not bytes, are the cost being minimized.
    def sumLabels(df: DataFrame): Long =
      Option(df.agg(sum(col("component"))).head.get(0))
        .map(_.asInstanceOf[Long]).getOrElse(0L)
    var comp = nodes.select(col("doc_id"),
      col("doc_id").cast("long").as("component")).localCheckpoint(true)
    var sumBefore = sumLabels(comp)
    var converged = false
    var it = 0
    while (!converged && it < maxIters) {
      val viaNeighbors = sym
        .join(comp, col("dst") === col("doc_id"))
        .groupBy(col("src"))
        .agg(min(col("component")).as("ncomp"))
      val propagated = comp
        .join(viaNeighbors, col("doc_id") === col("src"), "left")
        .select(col("doc_id"),
          least(col("component"), coalesce(col("ncomp"), col("component")))
            .as("component"))
      // labels are always doc_ids, so label(label) resolves via self-join
      val next = propagated.as("p")
        .join(propagated.select(col("doc_id").as("jid"),
          col("component").as("jcomp")).as("q"),
          col("p.component") === col("q.jid"))
        .select(col("p.doc_id").as("doc_id"), col("q.jcomp").as("component"))
        .localCheckpoint(false)
      val sumAfter = sumLabels(next)
      comp.unpersist(false)
      comp = next
      converged = sumAfter == sumBefore
      sumBefore = sumAfter
      it += 1
    }
    sym.unpersist(false)
    comp
  }

  /** SimHash fingerprints per document at an arbitrary bit width:
    * explode tokens, hash each token to `bits` bits, per-bit ±1 votes,
    * reassemble the positive-vote bits. One shuffle (the groupBy), all
    * expressions codegen'd; the vote columns are map-side-combined so the
    * shuffle carries one row of `bits` ints per (partition, doc).
    */
  def simhashBits(docs: DataFrame, bits: Int): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(TextOps.tokens(col("text"))).as("tok"))
      .withColumn("h", TextOps.tokenHashBits(col("tok"), bits))
    val votes = toks.groupBy(col("doc_id"))
      .agg(TextOps.simhashBitVotes(col("h"), 0).as("v0"),
        (1 until bits).map(i => TextOps.simhashBitVotes(col("h"), i).as(s"v$i")): _*)
    val fp = (0 until bits).map(i =>
      when(col(s"v$i") > 0, lit(1L << i)).otherwise(lit(0L))).reduce(_ + _)
    votes.select(col("doc_id"), fp.as("simhash"))
  }

  /** SimHash fingerprints (16-bit) per document: explode tokens, hash to
    * 16 bits, per-bit ±1 votes, reassemble the positive-vote bits.
    */
  def simhash16(docs: DataFrame): DataFrame = simhashBits(docs, 16)
}
