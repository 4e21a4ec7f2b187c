package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native Catalyst aggregate: the KMV (k-minimum-values) sketch — the K
  * smallest DISTINCT values of a long column, returned as one sorted
  * array (Bar-Yossef et al. 2002; Beyer et al. 2007 for the unbiased
  * distinct-count estimator the consumers apply). This IS the sketch's
  * defining construction, so the aggregate replaces the
  * distinct-then-rank formulation (a full dedup shuffle of every
  * (group, value) pair plus a per-group sort window) with one
  * aggregation whose buffers are K-BOUNDED everywhere: update folds a
  * value into a capped ordered set, map-side partial aggregation ships
  * at most K longs per (partition, group), and merge is a bounded
  * set-union — the property that makes the sketch serve at 100 TB,
  * where the distinct pre-pass would shuffle the corpus.
  *
  * Determinism: the result is a pure function of the input SET (dedup
  * inside the buffer, bottom-K by value, ascending order), so any
  * partitioning/merge order yields the identical array and the DuckDB
  * oracle can replay it as `ORDER BY h LIMIT K` over `DISTINCT`.
  */
case class KmvBottomKAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[Long]] {

  require(k >= 1, s"graft_kmv_bottomk needs k >= 1, got $k")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_kmv_bottomk expects (bigint, <literal k>), got $t")
    }
  }

  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv_bottomk"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): java.util.TreeSet[Long] =
    new java.util.TreeSet[Long]()

  private def add(buf: java.util.TreeSet[Long], v: Long): Unit = {
    // keep only values that can still be among the K smallest: skip
    // anything not below the current kth once the buffer is full
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last()) {
      if (buf.add(v)) { buf.pollLast(); () }
    }
  }

  override def update(buf: java.util.TreeSet[Long],
      input: InternalRow): java.util.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: java.util.TreeSet[Long],
      b2: java.util.TreeSet[Long]): java.util.TreeSet[Long] = {
    val it = b2.iterator()
    while (it.hasNext) add(b1, it.next())
    b1
  }

  override def eval(buf: java.util.TreeSet[Long]): Any = {
    val arr = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.TreeSet[Long]()
    var i = 0
    while (i < n) { buf.add(in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvBottomKAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): KmvBottomKAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvBottomKAgg =
    copy(child = newChildren(0))
}

object KmvBottomKAgg {
  val info = new ExpressionInfo(classOf[KmvBottomKAgg].getName, "graft_kmv_bottomk")

  /** `graft_kmv_bottomk(h, k)` — `k` must be a foldable integer literal
    * (it shapes the aggregate, not the data).
    */
  val builder: Seq[Expression] => Expression = {
    case Seq(h, k) if k.foldable =>
      KmvBottomKAgg(h, LiteralArgs.int(k, "graft_kmv_bottomk", "k"))
        .toAggregateExpression()
    case other => throw new IllegalArgumentException(
      s"graft_kmv_bottomk expects (h, <literal k>), got $other")
  }
}
