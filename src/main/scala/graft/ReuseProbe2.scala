package graft
import org.apache.spark.sql.functions._

/** Micro-test: does AQE reuse identical duplicated shuffle exchanges
  * (a) over a parquet scan, (b) over a cached (InMemoryRelation) scan?
  * Prints the final adaptive plan; a reused stage shows up as the same
  * ShuffleQueryStage id on both sides (or a ReusedExchange), a miss as
  * two distinct stage ids each with its own Exchange subtree.
  */
object ReuseProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    def dupAggJoin(base: org.apache.spark.sql.DataFrame): String = {
      def leg() = base.groupBy(col("k")).agg(sum(col("v")).as("s"))
      val l = leg()
      val r = leg().withColumnRenamed("s", "s2")
      val j = l.join(r, "k").agg(sum(col("s") + col("s2")))
      val qe = j.queryExecution
      qe.toRdd.count()
      qe.executedPlan.toString
    }
    val raw = spark.range(0, 1000000).select(
      (col("id") % 997).as("k"), (col("id") * 3).as("v"))
    println("===== (a) uncached base")
    println(dupAggJoin(raw))
    val cached = raw.persist()
    cached.count()
    println("===== (b) cached base")
    println(dupAggJoin(cached))
    val ckpt = raw.localCheckpoint(true)
    println("===== (c) localCheckpoint base")
    println(dupAggJoin(ckpt))
    println("===== (c) partitioning preserved? " +
      ckpt.repartition(8, col("k")).localCheckpoint(true)
        .queryExecution.executedPlan.outputPartitioning)
    spark.stop()
  }
}
