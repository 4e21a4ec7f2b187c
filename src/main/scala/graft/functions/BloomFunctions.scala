package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Session-extension registration for Spark's OWN Bloom-filter
  * expressions (`BloomFilterAggregate` / `BloomFilterMightContain`,
  * the machinery behind runtime row-level join filtering). Spark keeps
  * them out of the public function registry because the planner
  * normally injects them itself; the decontamination prefilter
  * (`ExtQueries.contaminationBloom`) wants the same build-once,
  * probe-everywhere shape explicitly, so they are surfaced under
  * graft_ names through the same `injectFunction` path as
  * [[DotProductQ]] — native codegen'd expressions, not UDFs.
  */
object BloomFunctions {

  val aggInfo = new ExpressionInfo(
    classOf[BloomFilterAggregate].getName, "graft_bloom_agg")

  def aggBuilder(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(child, items, bits) =>
      new BloomFilterAggregate(child, items, bits).toAggregateExpression()
    case Seq(child) => new BloomFilterAggregate(child).toAggregateExpression()
    case other => throw new IllegalArgumentException(
      s"graft_bloom_agg expects 1 or 3 arguments, got ${other.size}")
  }

  val containInfo = new ExpressionInfo(
    classOf[BloomFilterMightContain].getName, "graft_might_contain")

  def containBuilder(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(bloom, value) => BloomFilterMightContain(bloom, value)
    case other => throw new IllegalArgumentException(
      s"graft_might_contain expects 2 arguments, got ${other.size}")
  }
}
