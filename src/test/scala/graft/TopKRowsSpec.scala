package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit contract for the native grouped top-k aggregate (graft_topk):
  * bottom-k by the ord struct in ascending order, window-formulation
  * equivalence, partitioning invariance (bounded merge law), null
  * skipping, deterministic equal-ord collision, literal-shape argument
  * errors.
  */
class TopKRowsSpec extends SparkSpec {
  import spark.implicits._

  test("keeps the k smallest by (ord struct), payloads in ord order") {
    val df = Seq(
      ("q1", 3.0, 10L), ("q1", 1.0, 11L), ("q1", 2.0, 12L), ("q1", 9.0, 13L),
      ("q2", 5.0, 20L))
      .toDF("qid", "d", "id")
    val out = df.groupBy($"qid")
      .agg(expr("graft_topk(struct(d, id), struct(id, d), 2)").as("tk"))
      .select($"qid", posexplode($"tk").as(Seq("i", "r")))
      .select($"qid", $"i", $"r.id", $"r.d")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSet == Set(("q1", 0, 11L, 1.0), ("q1", 1, 12L, 2.0),
      ("q2", 0, 20L, 5.0)))
  }

  test("equivalent to the row_number window formulation") {
    // pseudo-random scores over 40 groups x 200 candidates; descending
    // score expressed by negating the ord field, ties broken by id —
    // exactly the (score DESC, id ASC) window ORDER BY
    val rows = for (g <- 0 until 40; i <- 0 until 200) yield {
      val h = (g * 200 + i) * 2654435761L % 997L
      (g.toLong, h.toDouble / 7.0, i.toLong)
    }
    val df = rows.toDF("g", "score", "id")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"g").orderBy($"score".desc, $"id".asc)
    val win = df.withColumn("rk", row_number().over(w)).filter($"rk" <= 10)
      .select($"g", $"id", $"score", $"rk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val agg = df.groupBy($"g")
      .agg(expr("graft_topk(struct(-score AS ns, id), struct(id, score), 10)").as("tk"))
      .select($"g", posexplode($"tk").as(Seq("i", "r")))
      .select($"g", $"r.id", $"r.score", ($"i" + 1).cast("int").as("rk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(agg == win)
  }

  test("result is partitioning-invariant (bounded merge keeps global top-k)") {
    val rows = (0 until 5000).map(i => ((i * 2654435761L) % 99991L, i.toLong))
    def run(parts: Int): Seq[(Long, Long)] =
      rows.toDF("h", "id").repartition(parts)
        .agg(expr("graft_topk(struct(h, id), struct(h, id), 12)").as("tk"))
        .select(explode($"tk").as("r")).select($"r.h", $"r.id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expected = rows.sorted.take(12)
    assert(run(1) == expected)
    assert(run(7) == expected)
    assert(run(32) == expected)
  }

  test("null ord or payload rows are skipped") {
    val df = Seq[(java.lang.Double, java.lang.Long)](
      (1.0, 1L), (null, 2L), (2.0, 3L))
      .toDF("d", "id")
    val out = df.agg(expr("graft_topk(d, id, 5)")).collect()(0).getSeq[Long](0)
    assert(out == Seq(1L, 3L))
  }

  test("equal-ord collision keeps one deterministic survivor") {
    // same ord for every row: the aggregate keeps exactly one payload,
    // and WHICH one is a pure function of the input set — re-running
    // under different partitionings agrees
    val df = (1L to 50L).map(i => (7.0, i)).toDF("d", "id")
    def run(parts: Int): Seq[Long] =
      df.repartition(parts.toInt)
        .agg(expr("graft_topk(d, id, 3)")).collect()(0).getSeq[Long](0)
    val r1 = run(1); val r7 = run(7); val r32 = run(32)
    assert(r1.length == 1 && r1 == r7 && r7 == r32)
  }

  test("k must be a positive integer literal") {
    val df = Seq((1.0, 1L)).toDF("d", "id")
    val e1 = intercept[Exception](
      df.agg(expr("graft_topk(d, id, 0)")).collect())
    assert(e1.getMessage.contains("k >= 1") || e1.getMessage.contains("0"))
    val e2 = intercept[Exception](
      df.agg(expr("graft_topk(d, id, id)")).collect())
    assert(e2 != null)
  }
}
