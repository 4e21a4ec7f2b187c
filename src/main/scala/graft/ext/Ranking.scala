package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grouped top-k as the native K-bounded aggregate
  * ([[graft.functions.TopKRowsAgg]], `graft_topk`) instead of a
  * `row_number()` window: the window form shuffles EVERY candidate row
  * to its group's partition and sorts the whole partition to keep k,
  * where the aggregate form heap-scans candidates in place — map-side
  * partial aggregation ships at most k rows per (partition, group) and
  * the merge is a bounded ordered union. Same output, same
  * determinism requirement (a total `ord`, i.e. include the unique
  * tiebreak the window's ORDER BY already carried); at 100 TB the
  * difference is sorting every per-query candidate list vs never
  * sorting anything.
  */
object Ranking {

  /** `scored.groupBy(gcols).agg(graft_topk(ord, payload, k))`, exploded
    * back to rows: (gcols…, payload fields flattened, rk) with `rk` the
    * 1-based rank in ascending `ord` order — exactly
    * `row_number() OVER (PARTITION BY gcols ORDER BY ord) <= k`.
    * Descending fields are expressed by negating them inside `ord`.
    */
  def explodeTopK(scored: DataFrame, gcols: Seq[String], ord: Column,
      payload: Column, k: Int): DataFrame = {
    val g = gcols.map(col)
    scored.groupBy(g: _*)
      .agg(call_function("graft_topk", ord, payload, lit(k)).as("_tk"))
      .select(g :+ posexplode(col("_tk")).as(Seq("_i", "_r")): _*)
      .select(g ++ Seq(col("_r.*"), (col("_i") + 1).cast("int").as("rk")): _*)
  }
}
