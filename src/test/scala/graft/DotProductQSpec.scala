package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import graft.ext.Similarity
import graft.functions.DotProductQ

class DotProductQSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)), // 4+10+18 = 32
    (Seq(-7L, 0L), Seq(3L, 9L))) // -21
    .toDF("a", "b")

  test("native expression matches the fold formulation on equal lengths") {
    val out = vecs.select(
      Similarity.dotQ(col("a"), col("b")).as("native"),
      Similarity.dotQFold(col("a"), col("b")).as("fold")).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(32L, -21L))
    assert(out.forall(r => r.getLong(0) == r.getLong(1)))
    // length mismatch: native truncates to min length (0 here); the fold
    // null-pads — vectors in the engine are always equal-length
    val short = Seq((Seq.empty[Long], Seq(1L, 2L))).toDF("a", "b")
    assert(short.select(Similarity.dotQ(col("a"), col("b"))).head().getLong(0) == 0L)
  }

  test("equivalence on random quantized vectors (codegen path)") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 200).map { _ =>
      (Seq.fill(64)(rnd.nextInt(2000000).toLong - 1000000),
        Seq.fill(64)(rnd.nextInt(2000000).toLong - 1000000))
    }
    val df = rows.toDF("a", "b")
    val diff = df.filter(
      Similarity.dotQ(col("a"), col("b")) =!=
        Similarity.dotQFold(col("a"), col("b"))).count()
    assert(diff == 0)
  }

  test("null array yields null, not a crash") {
    val df = Seq((Some(Seq(1L)), Option.empty[Seq[Long]])).toDF("a", "b")
    assert(df.select(Similarity.dotQ(col("a"), col("b"))).head().isNullAt(0))
  }

  test("null ELEMENT fails with its position, on both eval paths") {
    // before round 14 a null element read 0 from UnsafeArrayData but
    // NPE'd from GenericArrayData — representation-dependent wrong
    // distances with no error (the KCenterAgg defect class, ADVICE r13)
    val df = Seq((Seq(Some(1L), None, Some(3L)), Seq(Some(10L), Some(20L), Some(30L))))
      .toDF("a", "b")
    val e = intercept[Exception] {
      df.select(Similarity.dotQ(col("a"), col("b"))).collect()
    }
    def root(t: Throwable): Throwable =
      if (t.getCause == null || t.getCause == t) t else root(t.getCause)
    assert(root(e).getMessage.contains("null element at position 1"),
      root(e).toString)
  }

  test("provably null-free inputs keep the uncheck fast path") {
    // containsNull=false on both sides selects the no-per-element-branch
    // template (the planning-time flag the codegen switches on)
    import org.apache.spark.sql.catalyst.expressions.{CreateArray, Literal}
    val arr = CreateArray(Seq(Literal(1L), Literal(2L)))
    assert(!arr.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .containsNull)
    val out = DotProductQ(arr, arr)
      .eval(org.apache.spark.sql.catalyst.InternalRow.empty)
    assert(out == 5L)
  }

  test("registered function is usable from SQL text") {
    ColumnBridge.registerFunction(spark, "graft_dotq",
      DotProductQ.info, DotProductQ.builder)
    val out = spark.sql(
      "SELECT graft_dotq(array(1L, 2L), array(10L, 20L))").head().getLong(0)
    assert(out == 50L)
  }
}
