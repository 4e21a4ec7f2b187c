package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst aggregate: greedy farthest-point (k-center) selection
  * over quantized embedding vectors — the diversity/coreset-selection
  * primitive (Gonzalez 1985's 2-approximation; the seed of the
  * data-selection recipes that pick maximally-spread exemplars).
  *
  * Shape rationale: the greedy recurrence is sequential-global (each
  * pick depends on all previous picks), so like [[BpeTrainAgg]] it does
  * NOT belong unrolled in the plan — k unrolled argmax rounds would pay
  * ~3·k AQE stages. The published scale path is sample-then-greedy
  * (two-round k-center: a corpus-linear deterministic sample, then the
  * greedy loop on the node-sized sample), and this aggregate IS the
  * second round: the buffer collects the sampled vectors (bounded by
  * the caller's sample operator), `eval` runs the O(k·n·dim) loop once.
  *
  * Greedy semantics (pinned by the DuckDB oracle, which replays the
  * identical recurrence as unrolled CTEs): seed = lowest id, d2 = 0;
  * each later rank picks the point with the MAXIMUM min-squared-
  * euclidean distance to everything already selected (exact integer
  * arithmetic over the quantized grid), ties to the lowest id. Already-
  * selected points keep participating with d_min = 0 — they can never
  * win while a distinct point remains, and NOT special-casing them
  * keeps the recurrence identical to the oracle's join-based replay
  * even on corpora with exact-duplicate vectors.
  */
case class KCenterAgg(
    idChild: Expression,
    vecChild: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[(Long, Array[Long])]] {

  require(k >= 1, s"graft_kcenter needs k >= 1, got $k") // eval always emits the seed

  override def children: Seq[Expression] = Seq(idChild, vecChild)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    (idChild.dataType, vecChild.dataType) match {
      case (LongType, ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case (i, v) => TypeCheckResult.TypeCheckFailure(
        s"graft_kcenter expects (bigint, array<bigint>, <literal k>), got ($i, $v)")
    }
  }

  override def nullable: Boolean = false
  override def prettyName: String = "graft_kcenter"

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("rank", LongType, nullable = false),
    StructField("vec_id", LongType, nullable = false),
    StructField("d2", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): mutable.ArrayBuffer[(Long, Array[Long])] =
    mutable.ArrayBuffer.empty[(Long, Array[Long])]

  override def update(buf: mutable.ArrayBuffer[(Long, Array[Long])],
      input: InternalRow): mutable.ArrayBuffer[(Long, Array[Long])] = {
    val id = idChild.eval(input)
    val v = vecChild.eval(input)
    if (id != null && v != null) {
      // the declared type admits containsNull=true (transform() over a
      // parquet list column propagates element nullability), but a null
      // COMPONENT has no distance semantics — toLongArray() would NPE on
      // GenericArrayData or silently read 0 from UnsafeArrayData, so
      // check per element and fail with the offending position instead
      val ad = v.asInstanceOf[ArrayData]
      val n = ad.numElements()
      val arr = new Array[Long](n)
      var i = 0
      while (i < n) {
        if (ad.isNullAt(i)) throw new IllegalArgumentException(
          s"graft_kcenter: null element at position $i of vec for id=$id")
        arr(i) = ad.getLong(i); i += 1
      }
      buf += ((id.asInstanceOf[Long], arr))
    }
    buf
  }

  override def merge(b1: mutable.ArrayBuffer[(Long, Array[Long])],
      b2: mutable.ArrayBuffer[(Long, Array[Long])]): mutable.ArrayBuffer[(Long, Array[Long])] = {
    b1 ++= b2; b1
  }

  private def d2(a: Array[Long], b: Array[Long]): Long = {
    val n = math.min(a.length, b.length)
    var s = 0L; var i = 0
    while (i < n) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  override def eval(buf: mutable.ArrayBuffer[(Long, Array[Long])]): Any = {
    if (buf.isEmpty) return new GenericArrayData(Array.empty[Any])
    val pts = buf.sortBy(_._1).toArray // deterministic order, lowest id first
    val n = pts.length
    val rows = mutable.ArrayBuffer.empty[Any]
    rows += InternalRow(1L, pts(0)._1, 0L)
    // d_min to the selected set so far (seed = pts(0))
    val dmin = Array.tabulate(n)(i => d2(pts(i)._2, pts(0)._2))
    var r = 2
    while (r <= math.min(k, n)) {
      var bi = 0; var i = 1
      while (i < n) { // argmax d_min, tie -> lowest id (pts sorted by id)
        if (dmin(i) > dmin(bi)) bi = i
        i += 1
      }
      rows += InternalRow(r.toLong, pts(bi)._1, dmin(bi))
      i = 0
      while (i < n) {
        val d = d2(pts(i)._2, pts(bi)._2)
        if (d < dmin(i)) dmin(i) = d
        i += 1
      }
      r += 1
    }
    new GenericArrayData(rows.toArray)
  }

  override def serialize(buf: mutable.ArrayBuffer[(Long, Array[Long])]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (id, v) =>
      out.writeLong(id); out.writeInt(v.length)
      var i = 0
      while (i < v.length) { out.writeLong(v(i)); i += 1 }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[(Long, Array[Long])] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.ArrayBuffer.empty[(Long, Array[Long])]
    var i = 0
    while (i < n) {
      val id = in.readLong()
      val len = in.readInt()
      val v = new Array[Long](len)
      var j = 0
      while (j < len) { v(j) = in.readLong(); j += 1 }
      buf += ((id, v))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KCenterAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): KCenterAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KCenterAgg =
    copy(idChild = newChildren(0), vecChild = newChildren(1))
}

object KCenterAgg {
  val info = new ExpressionInfo(classOf[KCenterAgg].getName, "graft_kcenter")

  /** `graft_kcenter(id, qv, k)` — `k` must be a foldable integer
    * literal (it shapes the aggregate, not the data).
    */
  val builder: Seq[Expression] => Expression = {
    case Seq(id, v, k) if k.foldable =>
      KCenterAgg(id, v, LiteralArgs.int(k, "graft_kcenter", "k"))
        .toAggregateExpression()
    case other => throw new IllegalArgumentException(
      s"graft_kcenter expects (id, vec, <literal k>), got $other")
  }
}
