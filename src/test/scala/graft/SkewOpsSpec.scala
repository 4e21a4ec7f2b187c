package graft

import org.apache.spark.sql.functions._
import graft.ops.SkewOps

class SkewOpsSpec extends SparkSpec {
  import spark.implicits._

  // 10k rows on a hot key + a long tail
  private def skewed = ((1 to 10000).map(_ => ("hot", 1L)) ++
    (1 to 100).map(i => (s"k$i", i.toLong))).toDF("key", "v")

  test("salted aggregation equals the direct aggregation") {
    val direct = skewed.groupBy("key").agg(sum("v").as("total"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = SkewOps.saltedAgg(skewed, "key", saltBuckets = 8,
      partial = sum(col("v")), merge = sum, as = "total")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == direct)
  }

  test("salted join equals the direct join") {
    val dim = (1 to 100).map(i => (s"k$i", s"name$i")).toDF("key", "name")
      .union(Seq(("hot", "hotname")).toDF("key", "name"))
    val direct = skewed.join(dim, "key").groupBy("key")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = SkewOps.saltedJoin(skewed, dim, "key", saltBuckets = 8)
      .groupBy("key").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == direct)
    assert(salted("hot") == 10000L)
  }
}
