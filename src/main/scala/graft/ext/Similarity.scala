package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector-similarity operators over an embedding column (`array<float>`).
  *
  * All similarity math runs on **fixed-point integers**: components are
  * quantized to 1e-6 resolution (`floor(x*1e6 + 0.5)` — plain floor, not
  * banker's rounding, so every engine agrees), and dot products / norms are
  * exact BIGINT folds. Division and sqrt happen once, at the end, on
  * identical integers — so cosine scores are bit-identical across engines
  * and across partition orders. At cluster scale this is also the fast
  * path: integer multiply-add vectorizes better than double reduction and
  * needs no numerically-careful shuffle combining.
  */
object Similarity {

  /** array<float> → array<bigint> quantized at 1e-6. */
  def quantize(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * 1000000d + 0.5d).cast("long"))

  /** Exact integer dot product of two quantized vectors — a native
    * Catalyst expression ([[graft.functions.DotProductQ]]) generating one
    * fused loop in whole-stage codegen, no intermediate array.
    */
  def dotQ(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.DotProductQ(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** The composable built-in formulation (zip_with + aggregate) — kept as
    * the reference implementation the native expression is checked
    * against.
    */
  def dotQFold(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, p) => acc + p)

  /** Exact integer squared norm. */
  def normSqQ(a: Column): Column = dotQ(a, a)

  /** Cosine similarity from quantized vectors: one double division over
    * exact integers → deterministic.
    */
  def cosineQ(a: Column, b: Column): Column =
    dotQ(a, b).cast("double") /
      (sqrt(normSqQ(a).cast("double")) * sqrt(normSqQ(b).cast("double")))

  /** Cosine with precomputed squared norms — the pair-join form. Norms are
    * computed once per *vector* before the join, so each pair costs one
    * 64-element fold instead of three (3× cheaper on an N×M score join).
    */
  def cosineQN(a: Column, b: Column, normSqA: Column, normSqB: Column): Column =
    dotQ(a, b).cast("double") /
      (sqrt(normSqA.cast("double")) * sqrt(normSqB.cast("double")))

  /** Standard projection for similarity joins: id, cell, quantized vector,
    * squared norm.
    */
  def prepared(vectors: DataFrame, idAs: String, vecAs: String, normAs: String): DataFrame =
    vectors.select(col("vec_id").as(idAs),
      quantize(col("embedding")).as(vecAs))
      .withColumn(normAs, normSqQ(col(vecAs)))

  /** Brute-force top-k: broadcast the (small) query set against all
    * candidates; keep k per query by (cosine desc, vec_id) via the
    * native bounded top-k aggregate ([[Ranking.explodeTopK]]) — the
    * candidate scan parallelizes perfectly, the per-partition heaps ship
    * k rows per query each, and NOTHING is ever sorted. At 100 TB the
    * broadcast side plus the k-bounded combine is the whole trick.
    */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val q = broadcast(prepared(queries, "qid", "qv", "qn"))
    val c = prepared(candidates, "vec_id", "cv", "cn")
    val scored = q.join(c, col("qid") =!= col("vec_id"))
      .withColumn("cosine", cosineQN(col("qv"), col("cv"), col("qn"), col("cn")))
    Ranking.explodeTopK(scored, Seq("qid"),
      struct((-col("cosine")).as("nc"), col("vec_id")),
      struct(col("vec_id"), col("cosine")), k)
      .select(col("qid"), col("vec_id"), col("cosine"), col("rk"))
  }

  /** Deterministic random hyperplanes for sign-LSH: component (p, i) is
    * the first md5 nibble of "p_i" minus 8 (∈ [-8, 7]). Reproducible in
    * any engine with md5 — the planes are data-independent constants.
    */
  def hyperplanes(numPlanes: Int, dim: Int): Seq[Seq[Int]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until numPlanes).map { p =>
      (0 until dim).map { i =>
        val h = md.digest(s"${p}_$i".getBytes("UTF-8"))
        ((h(0) >> 4) & 0xf) - 8
      }
    }
  }

  /** Sign-LSH bucket id: bit j set iff the (integer) projection onto
    * plane j is non-negative. Vectors in the same bucket are likely
    * neighbors; at scale the bucket id is the shuffle key that replaces
    * the all-pairs join.
    */
  def lshBucket(qv: Column, planes: Seq[Seq[Int]]): Column =
    planes.zipWithIndex.map { case (plane, j) =>
      val planeCol = array(plane.map(c => lit(c.toLong)): _*)
      when(dotQ(qv, planeCol) >= 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)

  /** IVF-style cell centroids: integer-mean (floor) of the quantized
    * vectors per cell, computed by position with exact integer sums.
    * Returns (cell, centroid: array<bigint>). On a real corpus the cells
    * come from k-means over a sample; the fixture's `label` column plays
    * the cell id, and refining it is iterating exactly this aggregation.
    */
  def centroids(vectors: DataFrame, cellCol: String): DataFrame =
    vectors
      .select(col(cellCol).as("cell"),
        posexplode(quantize(col("embedding"))).as(Seq("pos", "q")))
      .groupBy(col("cell"), col("pos"))
      .agg((sum(col("q")) / count(lit(1))).cast("long").as("c"))
      .groupBy(col("cell"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
        s => s.getField("c")).as("centroid"))

  /** Route each vector to its `nProbe` nearest centroids by cosine —
    * IVF MULTI-PROBE, the recall lever at scale: neighbors that straddle
    * a cell boundary are recovered by probing the runner-up cells, at
    * ~nProbe× the single-probe candidate cost (still a tiny fraction of
    * brute force). Ties break on the cell id; the centroid set stays a
    * broadcast.
    */
  def routeCells(vectors: DataFrame, cents: DataFrame,
      nProbe: Int): DataFrame = {
    val v = prepared(vectors, "vec_id", "qv", "qn")
    Ranking.explodeTopK(
      v.join(broadcast(cents.withColumn("cn", normSqQ(col("centroid")))))
        .withColumn("sim",
          cosineQN(col("qv"), col("centroid"), col("qn"), col("cn"))),
      Seq("vec_id"),
      struct((-col("sim")).as("ns"), col("cell")),
      struct(col("cell")), nProbe)
      .select(col("vec_id"), col("cell"), col("rk").cast("long").as("probe"))
  }

  /** Assign each vector to its nearest centroid by cosine (tie → lowest
    * cell id). The centroid set is tiny → broadcast join, no shuffle of
    * the big side.
    */
  def assignCells(vectors: DataFrame, cents: DataFrame): DataFrame = {
    val v = prepared(vectors, "vec_id", "qv", "qn")
    v.join(broadcast(cents.withColumn("cn", normSqQ(col("centroid")))))
      .withColumn("sim", cosineQN(col("qv"), col("centroid"), col("qn"), col("cn")))
      .groupBy(col("vec_id"))
      // flat-buffer lexicographic max (round 18): a struct-max here
      // planned as SortAggregate per round; LexPair keeps the argmax a
      // codegen'd HashAggregate with map-side combine
      .agg(graft.functions.LexPair.max2(
        col("sim"), -col("cell"), "sim", "negcell").as("best"))
      .select(col("vec_id"), (-col("best.negcell")).cast("int").as("cell"),
        col("best.sim").as("cell_cos")) // winning cosine, for inertia stats
  }
}
