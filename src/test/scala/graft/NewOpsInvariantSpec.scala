package graft

import org.apache.spark.sql.functions._

/** Mathematical invariants of the round-8 closing operators — the
  * properties that must hold for ANY corpus, checked on the fixture
  * (the DuckDB oracles pin exact values; these pin the algebra, so a
  * future refactor that keeps hash-matching a changed oracle still
  * can't violate the operator's meaning).
  */
class NewOpsInvariantSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("lm_predictability: scores are probabilities in basis points") {
    val rows = graft.queries.ExtQueries.lmPredictability(spark, sf)
      .select(col("lm_bp"), col("n_grams")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (bp, n) = (r.getLong(0), r.getLong(1))
      assert(n >= 1)
      // mean of per-bigram c12*10^4 div c1 with 1 <= c12 <= c1
      assert(bp >= 0 && bp <= 10000, s"lm_bp out of [0, 10000]: $bp")
    }
  }

  test("pagerank_step: teleport floor, degree identity, rank bounds") {
    val out = graft.queries.ExtQueries.pagerankStep(spark, sf)
    val rows = out.select(col("degree"), col("rank_bp")).collect()
    rows.foreach { r =>
      val (deg, bp) = (r.getLong(0), r.getLong(1))
      assert(bp >= 1500, s"below teleport floor: $bp")
      if (deg == 0) assert(bp == 1500, s"isolated doc not at floor: $bp")
    }
    // handshake identity: directed edge count = 2 * undirected pairs
    val sumDeg = out.agg(sum(col("degree"))).head().getLong(0)
    val nPairs = graft.queries.ExtQueries.winnowNeardup(spark, sf).count()
    assert(sumDeg == 2 * nPairs, s"sum(degree)=$sumDeg pairs=$nPairs")
  }

  test("m4_downsample: extent ordering, bucket range, mass conservation") {
    val out = graft.queries.AnalyticsQueries.m4Downsample(spark, sf)
    val rows = out.collect()
    rows.foreach { r =>
      val bucket = r.getAs[Long]("bucket")
      val (tf, tl) = (r.getAs[Long]("t_first"), r.getAs[Long]("t_last"))
      val (vmin, vmax) = (r.getAs[Double]("v_min"), r.getAs[Double]("v_max"))
      val (fv, lv) = (r.getAs[Double]("first_v"), r.getAs[Double]("last_v"))
      assert(bucket >= 0 && bucket < 50)
      assert(tf <= tl)
      assert(vmin <= fv && fv <= vmax, s"first_v outside [$vmin,$vmax]: $fv")
      assert(vmin <= lv && lv <= vmax, s"last_v outside [$vmin,$vmax]: $lv")
    }
    // every raw sample lands in exactly one bucket
    val total = rows.map(_.getAs[Long]("n")).sum
    val nEvents = graft.ingest.EventsIngest.readEvents(spark, sf).count()
    assert(total == nEvents, s"bucket mass $total != events $nEvents")
  }

  test("m4 boundary tiebreaks: min-v at shared t_first, max-v at shared t_last") {
    // The single-aggregation rewrite selects boundary points via
    // lexicographic struct min/max — on a TIMESTAMP TIE that means
    // first_v = min(v) at t_first and last_v = max(v) at t_last, the
    // previous filter-then-min/max semantics and what the DuckDB oracle
    // computes. The fixture has no guaranteed ties, so the oracle gate
    // alone would never catch a tiebreak regression — pin it here on a
    // synthetic frame whose every boundary is a tie.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Seq( // one metric, e in [0, 9] → W=50 buckets at e-span 10
      ("m", 0L, 5.0), ("m", 0L, 1.0), ("m", 0L, 3.0), // tie at t_first
      ("m", 9L, 2.0), ("m", 9L, 7.0), ("m", 9L, 4.0)  // tie at t_last
    ).toDF("metric", "e", "v")
    val ext = rows.groupBy($"metric").agg(min($"e").as("e0"), max($"e").as("e1"))
    val b = rows.join(broadcast(ext), "metric")
      .withColumn("bucket", expr("(e - e0) * 50 div (e1 - e0 + 1)"))
    val out = b.groupBy($"metric", $"bucket")
      .agg(count(lit(1)).as("n"),
        min(struct($"e", $"v")).as("fs"), max(struct($"e", $"v")).as("ls"),
        min($"v").as("v_min"), max($"v").as("v_max"))
      .select($"bucket", $"fs.e".as("t_first"), $"fs.v".as("first_v"),
        $"ls.e".as("t_last"), $"ls.v".as("last_v"))
      .orderBy($"bucket").collect()
    val first = out.head
    assert(first.getAs[Long]("t_first") == 0L)
    assert(first.getAs[Double]("first_v") == 1.0, "tie at t_first must pick min v")
    val last = out.last
    assert(last.getAs[Long]("t_last") == 9L)
    assert(last.getAs[Double]("last_v") == 7.0, "tie at t_last must pick max v")
  }

  test("char_diversity: impurity bounds and histogram sanity") {
    val rows = graft.queries.ExtQueries.charDiversity(spark, sf)
      .select(col("gini_bp"), col("n_chars"), col("n_distinct")).collect()
    rows.foreach { r =>
      val (bp, n, d) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(bp >= 0 && bp < 10000, s"gini out of [0, 10000): $bp")
      assert(d >= 1 && d <= n)
      // single-char text must sit at zero impurity
      if (d == 1) assert(bp == 0)
    }
  }

  test("substr_dedup: reported spans are genuinely verbatim and maximal-start") {
    val out = graft.queries.ExtQueries.substrDedup(spark, sf).collect()
    assert(out.nonEmpty, "fixture must contain shared >=16-token spans")
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), lower(col("text")))
      .collect().map(r => r.getLong(0) -> r.getString(1).split(" ", -1)).toMap
    out.foreach { r =>
      val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      val (sa, sb) = (r.getAs[Long]("start_a").toInt,
        r.getAs[Long]("start_b").toInt)
      val len = r.getAs[Long]("span_tokens").toInt
      assert(a < b && len >= 16)
      val (ta, tb) = (texts(a), texts(b))
      assert(sa + len <= ta.length && sb + len <= tb.length,
        s"span [$sa,+$len) overruns doc ($a,$b)")
      // the span really is verbatim, token for token
      assert(ta.slice(sa, sa + len).sameElements(tb.slice(sb, sb + len)),
        s"span ($a,$b)@($sa,$sb)+$len is not verbatim")
      // and maximal: extending one token left or right must break it
      val leftOk = sa == 0 || sb == 0 || ta(sa - 1) != tb(sb - 1)
      val rightOk = sa + len >= ta.length || sb + len >= tb.length ||
        ta(sa + len) != tb(sb + len)
      assert(leftOk && rightOk, s"span ($a,$b)@($sa,$sb)+$len not maximal")
    }
  }

  test("char_diversity: non-ASCII split semantics match DuckDB (code points)") {
    // the oracle gate only exercises ASCII fixture text; this pins the
    // engine's split(text, "") semantics on multi-byte chars and an
    // astral-plane surrogate pair (𝄞 U+1D11E) against the hand-computed
    // code-point histogram — the semantics DuckDB's string_split('')
    // was verified to use — so a future Unicode corpus cannot silently
    // diverge between engines. "héllo𝄞é": code points h,é,l,l,o,𝄞,é →
    // n=7, distinct=5, Σk²=1+4+4+1+1=11, gini = 10000 − 11·10⁴ div 49.
    import spark.implicits._
    val row = graft.queries.ExtQueries.charDiversityFrame(
        Seq((1L, "héllo𝄞é")).toDF("doc_id", "text"))
      .collect().head
    assert(row.getAs[Long]("n_chars") == 7, "surrogate pair must stay one char")
    assert(row.getAs[Long]("n_distinct") == 5)
    assert(row.getAs[Long]("gini_bp") == 10000L - 110000L / 49L)
  }

  test("kmv_intersect: sketch overlap bounded by k, estimates non-negative") {
    val rows = graft.queries.ExtQueries.kmvIntersect(spark, sf).collect()
    assert(rows.size == 10) // C(5,2) event-type pairs
    rows.foreach { r =>
      val nBoth = r.getAs[Long]("n_both")
      assert(nBoth >= 0 && nBoth <= 8, s"n_both outside [0, k]: $nBoth")
      assert(r.getAs[Double]("est_inter") >= 0.0)
      assert(r.getAs[Long]("exact_inter") >= 0L)
    }
  }

  test("rrf_fusion: rank-only fold — both-list docs beat equal single-list ranks") {
    val rows = graft.queries.ExtQueries.rrfFusion(spark, sf).collect()
    // lists are top-10 each; the fused set is their union
    assert(rows.length >= 10 && rows.length <= 20)
    val score = rows.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("rrf_s")).toMap
    rows.foreach { r =>
      val (s, d) = (r.getAs[Long]("r_sparse"), r.getAs[Long]("r_dense"))
      val expect =
        (if (s > 0) 100000000L / (60 + s) else 0L) +
          (if (d > 0) 100000000L / (60 + d) else 0L)
      assert(score(r.getAs[Long]("doc_id")) == expect)
      // a doc on both lists strictly outscores any doc on one list at
      // the same or worse rank — the property RRF is used for
      if (s > 0 && d > 0) rows.filter { o =>
        val (os, od) = (o.getAs[Long]("r_sparse"), o.getAs[Long]("r_dense"))
        (os == 0 && od >= d) || (od == 0 && os >= s)
      }.foreach(o =>
        assert(score(o.getAs[Long]("doc_id")) < score(r.getAs[Long]("doc_id"))))
    }
    // fused_rank is a permutation of 1..n
    assert(rows.map(_.getAs[Long]("fused_rank")).sorted.toSeq ==
      (1L to rows.length).toSeq)
  }

  test("emb_recall_at_k: recall in [0,1], exact vs self is 100%") {
    val rows = graft.queries.ExtQueries.embRecallAtK(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val bp = r.getAs[Long]("recall_bp")
      assert(bp >= 0 && bp <= 10000)
      assert(bp == r.getAs[Long]("n_hits") * 10000 / 5)
    }
  }

  test("session index frames equal their from-scratch computation") {
    import graft.queries.ExtQueries
    // the session-scoped vocabulary must be exactly the direct aggregate
    val direct = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(graft.ext.TextOps.tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val cached = ExtQueries.cachedTokenCounts(spark, sf)
    assert(cached.join(direct, Seq("tok"))
      .filter(cached("cnt") =!= direct("cnt")).count() == 0)
    assert(cached.count() == direct.count())
    // and must survive eviction (the re-persist guard): clearCache then
    // recompute must give the same frame
    spark.catalog.clearCache()
    val again = ExtQueries.cachedTokenCounts(spark, sf)
    assert(again.count() == direct.count())
  }

  test("ivfpq trained artifact: code table derives from both persisted parents") {
    // the round-12 trainer-once contract extended to the DERIVED
    // artifact: after a cold cache, building the cell-keyed code table
    // must READ its two parents' InMemoryRelations (PQ code table +
    // trained cell assignment), not re-embed the PQ encode or the
    // trainer DAG — a memo whose lineage re-embeds a parent
    // materializes that parent twice (CacheManager substitutes cached
    // fragments into consumers, never the reverse)
    spark.catalog.clearCache()
    val codes = graft.queries.ExtQueries.cachedIvfPqCodes(spark, sf)
    val imr = codes.queryExecution.withCachedData.collectFirst {
      case r: org.apache.spark.sql.execution.columnar.InMemoryRelation => r
    }
    assert(imr.nonEmpty, "ivfpq code table is not served from an InMemoryRelation")
    val inner = imr.get.cachedPlan.toString
    val scans = "InMemoryTableScan".r.findAllIn(inner).length
    assert(scans >= 2, s"ivfpq code table's cached plan reads $scans parent " +
      s"relations, expected both:\n${inner.take(1200)}")
  }

  test("ivfpq probe dominance: 2-probe ADC top-k is rankwise <= 1-probe") {
    // the trained cell's candidates are a SUBSET of the two probed
    // cells' (probe 1 is the training assignment), so at every rank the
    // multi-probe distance cannot exceed the single-probe distance —
    // the structural "second probe only helps" guarantee the
    // recall-vs-cost curve relies on
    def byRank(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rk")) ->
        r.getAs[Long]("adc_dist")).toMap
    val p1 = byRank(graft.queries.ExtQueries.annIvfPqTrained(spark, sf))
    val p2 = byRank(graft.queries.ExtQueries.annIvfPqTrainedMp(spark, sf))
    assert(p1.keySet == p2.keySet)
    p1.foreach { case (k, d1) =>
      assert(p2(k) <= d1, s"(qid, rk)=$k: mp=${p2(k)} > p1=$d1") }
  }

  test("snapshot_diff: statuses partition the churn rule exactly") {
    val out = graft.queries.ExtQueries.snapshotDiff(spark, sf)
    val byStatus = out.groupBy(col("status")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStatus.keySet.subsetOf(Set("added", "removed", "changed")))
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val nRemoved = d.filter(col("doc_id") % 7 === 0).count()
    val nAdded = d.filter(col("doc_id") % 13 === 0).count()
    val nChanged = d.filter(col("doc_id") % 7 =!= 0 &&
      col("doc_id") % 11 === 0).count()
    assert(byStatus.getOrElse("removed", 0L) == nRemoved)
    assert(byStatus.getOrElse("added", 0L) == nAdded)
    assert(byStatus.getOrElse("changed", 0L) == nChanged)
  }
}
