package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, CreateNamedStruct, EqualTo, Expression, GreaterThan, If, IsNotNull, IsNull, LessThan, Literal, Or}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StructField, StructType}

/** Hash-aggregable latest-sample selection (round 18).
  *
  * Every instant-vector / grid-point evaluation needs "the
  * lexicographically greatest (e, value) pair per series" — Prometheus's
  * staleness rule with the value tie-break for second-truncated
  * timestamp collisions (reference staleness semantics:
  * internal/prometheus/client.go:58-93; the tie-break is this engine's
  * determinism addition). The obvious `max(struct(e, value))` is
  * correct but NOT hash-aggregable: struct buffers aren't mutable in
  * UnsafeRow aggregation buffers, so Spark plans SortAggregate + Sort
  * per selector — at 100 TB that's a sort over every sample in the
  * scan, per selector, where a hash aggregate holds one 16-byte entry
  * per series. This DeclarativeAggregate keeps the pair in two flat
  * primitive buffer slots (LongType e, DoubleType value), so the
  * planner stays in whole-stage-codegen'd HashAggregate, map-side
  * partials included.
  *
  * Ordering parity with `max(struct(e, value))`: comparisons are Spark
  * SQL semantics (NaN greatest, as in struct ordering). The one
  * divergence is the ±0.0 value tie at an IDENTICAL epoch second —
  * struct ordering ranks -0.0 < 0.0 while SQL comparison treats them
  * equal (this buffer then keeps the first-seen zero). The ingest path
  * never produces signed zeros, and no oracle depends on the
  * distinction; stated here rather than papered over.
  *
  * `earliest = true` flips both comparisons — the lexicographically
  * SMALLEST pair (min(struct(e, value)) parity) for first-sample
  * consumers like M4 downsampling. The value child may be any mutable
  * orderable primitive (double in the selector paths, DECIMAL(20,6) in
  * the exact rate paths — all decimals are UnsafeRow-mutable, so the
  * buffer stays hash-aggregable either way).
  */
case class LexPairAgg(
    eChild: Expression,
    vChild: Expression,
    earliest: Boolean = false,
    eName: String = "e",
    vName: String = "value")
  extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(eChild, vChild)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(eChild = newChildren(0), vChild = newChildren(1))
  override def nullable: Boolean = true
  override def prettyName: String =
    if (earliest) "graft_earliest" else "graft_latest"
  override def dataType: DataType = StructType(Seq(
    StructField(eName, eChild.dataType), StructField(vName, vChild.dataType)))

  private lazy val bufE = AttributeReference("bufE", eChild.dataType)()
  private lazy val bufV = AttributeReference("bufV", vChild.dataType)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(bufE, bufV)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(null, eChild.dataType), Literal(null, vChild.dataType))

  private def beats(e: Expression, v: Expression,
      thanE: Expression, thanV: Expression): Expression = {
    def gt(a: Expression, b: Expression): Expression =
      if (earliest) LessThan(a, b) else GreaterThan(a, b)
    Or(gt(e, thanE), And(EqualTo(e, thanE), gt(v, thanV)))
  }

  override lazy val updateExpressions: Seq[Expression] = {
    val take = And(And(IsNotNull(eChild), IsNotNull(vChild)),
      Or(IsNull(bufE), beats(eChild, vChild, bufE, bufV)))
    Seq(If(take, eChild, bufE), If(take, vChild, bufV))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val take = And(IsNotNull(bufE.right),
      Or(IsNull(bufE.left), beats(bufE.right, bufV.right, bufE.left, bufV.left)))
    Seq(If(take, bufE.right, bufE.left), If(take, bufV.right, bufV.left))
  }

  override lazy val evaluateExpression: Expression =
    CreateNamedStruct(Seq(
      Literal(eName), bufE, Literal(vName), bufV))
}

object LatestSample {
  /** `max(struct(e, value))` drop-in: same struct field names, so
    * downstream `.getField("e")` / `"value"` selects are unchanged. */
  def latest(e: Column, v: Column): Column =
    ColumnBridge.column(LexPairAgg(
      ColumnBridge.expression(e), ColumnBridge.expression(v))
      .toAggregateExpression())

  /** `min(struct(e, value))` drop-in. */
  def earliest(e: Column, v: Column): Column =
    ColumnBridge.column(LexPairAgg(
      ColumnBridge.expression(e), ColumnBridge.expression(v),
      earliest = true).toAggregateExpression())
}

/** The same flat-buffer lexicographic pair with caller-chosen field
  * names — the argmax/argmin-as-aggregate idiom the ANN cell
  * assignment and k-means rounds use (`max(struct(sim, negcell))`,
  * `min(struct(d, cell))`), which otherwise plans as SortAggregate for
  * exactly the struct-buffer reason documented above.
  */
object LexPair {
  def max2(a: Column, b: Column, aName: String, bName: String): Column =
    ColumnBridge.column(LexPairAgg(
      ColumnBridge.expression(a), ColumnBridge.expression(b),
      eName = aName, vName = bName).toAggregateExpression())

  def min2(a: Column, b: Column, aName: String, bName: String): Column =
    ColumnBridge.column(LexPairAgg(
      ColumnBridge.expression(a), ColumnBridge.expression(b),
      earliest = true, eName = aName, vName = bName)
      .toAggregateExpression())
}
