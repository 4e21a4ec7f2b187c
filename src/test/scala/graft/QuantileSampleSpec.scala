package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit contract for the native bottom-k quantile-sample aggregate
  * (graft_qsample): rank-capped selection with value payload,
  * ascending-value output, partitioning invariance (the bounded
  * ordered-union merge law), sub-k behavior, null skipping, and —
  * the strongest check — row-for-row equivalence of the full
  * aggregate-then-select plan with the old rank-window formulation on
  * pseudo-random data where the cap binds.
  */
class QuantileSampleSpec extends SparkSpec {
  import spark.implicits._

  private def hex(i: Long): String = f"${i * 2654435761L & 0xffffffffL}%032x"

  test("bottom-k by rank carries the value, output sorted by value") {
    val df = Seq(("b" * 32, 5.0), ("a" * 32, 9.0), ("c" * 32, 1.0),
      ("d" * 32, 7.0)).toDF("r", "v")
    val out = df.agg(expr("graft_qsample(r, v, 3)")).collect()(0).getSeq[Double](0)
    // bottom-3 ranks are a/b/c with values 9, 5, 1 -> ascending values
    assert(out == Seq(1.0, 5.0, 9.0))
  }

  test("partitioning-invariant where the cap binds (bounded merge law)") {
    val rows = (1L to 5000L).map(i => (hex(i), (i * 37 % 1000).toDouble))
    def run(parts: Int): Seq[Double] =
      rows.toDF("r", "v").repartition(parts)
        .agg(expr("graft_qsample(r, v, 1024)")).collect()(0).getSeq[Double](0)
    val expected = rows.sortBy(_._1).take(1024).map(_._2).sorted
    assert(run(1) == expected)
    assert(run(13) == expected)
    assert(run(32) == expected)
  }

  test("fewer rows than k returns them all; nulls are skipped") {
    val df = Seq[(String, java.lang.Double)](
      ("a" * 32, 2.0), ("b" * 32, null), (null, 3.0), ("c" * 32, 1.0))
      .toDF("r", "v")
    val out = df.agg(expr("graft_qsample(r, v, 100)")).collect()(0).getSeq[Double](0)
    assert(out == Seq(1.0, 2.0))
  }

  test("aggregate-then-select equals the rank-window formulation") {
    // the exact production shape on data where the 64-cap binds for
    // some groups and not others, including duplicate values
    val rows = (1L to 900L).map(i =>
      (s"g${i % 3}", hex(i), (i % 25).toDouble))
    val df = rows.toDF("g", "r", "v")
    val viaAgg = df.groupBy($"g")
      .agg(expr("graft_qsample(r, v, 64)").as("s"))
      .select($"g", explode(typedlit(Seq(50, 95, 99))).as("p"), $"s")
      .select($"g", $"p", element_at($"s", greatest(lit(1),
        ceil($"p" * size($"s") / lit(100)).cast("int"))).as("est"))
    import org.apache.spark.sql.expressions.Window
    val samp = df.withColumn("sk",
        row_number().over(Window.partitionBy($"g").orderBy($"r")))
      .filter($"sk" <= 64).drop("sk")
    val viaWindow = samp
      .withColumn("rn", row_number().over(
        Window.partitionBy($"g").orderBy($"v", $"r")))
      .withColumn("n", count(lit(1)).over(Window.partitionBy($"g")))
      .crossJoin(broadcast(Seq(50, 95, 99).toDF("p")))
      .filter($"rn" === greatest(lit(1L),
        ceil($"p" * $"n" / lit(100)).cast("long")))
      .select($"g", $"p", $"v".as("est"))
    val a = viaAgg.collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).sorted.toSeq
    val b = viaWindow.collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).sorted.toSeq
    assert(a == b)
  }

  test("rank order is binary UTF-8, not UTF-16 code units (non-BMP divergence)") {
    // U+FFFD is 3 UTF-8 bytes (ef bf bd), U+10000 is 4 (f0 90 80 80):
    // byte order puts U+FFFD FIRST, while Java's UTF-16 code-unit order
    // would put the surrogate pair first — the exact divergence the BPE
    // tie-break fix pinned. Spark's own orderBy agrees with byte order,
    // so bottom-1 must keep U+FFFD's value under either execution.
    val df = Seq(("�", 1.0), ("𐀀", 2.0)).toDF("r", "v")
    val out = df.agg(expr("graft_qsample(r, v, 1)")).collect()(0).getSeq[Double](0)
    assert(out == Seq(1.0), s"expected U+FFFD (byte order) to win, got $out")
    val viaSort = df.orderBy($"r").limit(1).collect()(0).getDouble(1)
    assert(viaSort == 1.0) // Spark's binary string order, the contract
  }

  test("update clones a rank backed by a caller-reused buffer (input aliasing)") {
    // UTF8String.getBytes returns the LIVE backing array (no copy) when
    // the string exactly occupies it. A caller that reuses its byte
    // buffer between rows must not be able to rewrite keys the aggregate
    // already buffered — the input-aliasing variant of the
    // representation-dependence class (round-15 verdict item 4).
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.{DoubleType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    val agg = graft.functions.QuantileSampleAgg(
      BoundReference(0, StringType, nullable = true),
      BoundReference(1, DoubleType, nullable = true), 10)
    val buf = agg.createAggregationBuffer()
    val backing = "aaaa".getBytes("UTF-8") // exact fit: getBytes aliases
    agg.update(buf, InternalRow(UTF8String.fromBytes(backing), 1.0))
    backing(0) = 'z'.toByte // the caller reuses its buffer for row 2
    agg.update(buf, InternalRow(UTF8String.fromBytes(backing), 2.0))
    val out = agg.eval(buf)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
      .toDoubleArray().toSeq
    // both ranks retained: "aaaa" was cloned at insert, not aliased
    assert(out == Seq(1.0, 2.0), s"aliased key corrupted the buffer: $out")
  }

  test("rank collision keeps the min value under any arrival/merge order") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.{DoubleType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    val agg = graft.functions.QuantileSampleAgg(
      BoundReference(0, StringType, nullable = true),
      BoundReference(1, DoubleType, nullable = true), 4)
    def evalSeq(b: java.util.TreeMap[Array[Byte], Double]): Seq[Double] =
      agg.eval(b).asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
        .toDoubleArray().toSeq
    def upd(b: java.util.TreeMap[Array[Byte], Double], r: String, v: Double) =
      agg.update(b, InternalRow(UTF8String.fromString(r), v))
    val b1 = agg.createAggregationBuffer()
    upd(b1, "cc", 9.0); upd(b1, "cc", 3.0)
    val b2 = agg.createAggregationBuffer()
    upd(b2, "cc", 3.0); upd(b2, "cc", 9.0)
    assert(evalSeq(b1) == Seq(3.0) && evalSeq(b2) == Seq(3.0))
    // and across partition merge, either direction
    val m1 = agg.createAggregationBuffer(); upd(m1, "cc", 9.0)
    val m2 = agg.createAggregationBuffer(); upd(m2, "cc", 3.0)
    assert(evalSeq(agg.merge(m1, m2)) == Seq(3.0))
    val m3 = agg.createAggregationBuffer(); upd(m3, "cc", 3.0)
    val m4 = agg.createAggregationBuffer(); upd(m4, "cc", 9.0)
    assert(evalSeq(agg.merge(m3, m4)) == Seq(3.0))
  }

  test("k must be a positive integer literal") {
    val df = Seq(("a" * 32, 1.0)).toDF("r", "v")
    val e = intercept[Exception](df.agg(expr("graft_qsample(r, v, 0)")).collect())
    assert(e.getMessage.contains("k >= 1") || e.getMessage.contains("0"))
  }
}
