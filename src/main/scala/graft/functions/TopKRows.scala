package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Native Catalyst aggregate: deterministic grouped top-k — the k rows
  * with the SMALLEST `ord` values per group (callers express descending
  * orders by negating the field inside the `ord` struct), returning the
  * payloads in ascending `ord` order. This replaces the
  * `row_number() OVER (PARTITION BY g ORDER BY …) <= k` formulation the
  * retrieval/ANN family used: the window form shuffles every candidate
  * row to its group's partition and SORTS the whole partition to keep
  * k of them, where this buffer is k-bounded everywhere — map-side
  * partial aggregation ships at most k (ord, payload) pairs per
  * (partition, group) and merge is a bounded ordered union
  * (top-k-of-union = top-k-of-parts, the same mergeable-summary law as
  * [[KmvBottomKAgg]]/[[QuantileSampleAgg]]). At 100 TB that is the
  * difference between sorting every per-query candidate list and
  * heap-scanning it: candidates per query can be |corpus|/K after cell
  * pruning, and only k of them ever cross the wire.
  *
  * Determinism contract: `ord` must be a TOTAL order over the group —
  * include a unique tiebreak field (the window form already required
  * exactly this for cross-engine determinism: every consumer orders by
  * (score, unique id)). If equal `ord` keys do collide anyway, the
  * buffer keeps the payload with the smaller serialized bytes (unsigned
  * lexicographic over the row's UnsafeRow image), so the result is
  * still a pure function of the input SET under any arrival or merge
  * order — the same discipline as [[QuantileSampleAgg]]'s min-value
  * collision rule, generalized to arbitrary payload types. Null `ord`
  * or payload rows are skipped (a candidate without a rank is not a
  * candidate).
  *
  * `ord` may be any orderable Catalyst type (atomic or struct — struct
  * ordering is field-by-field, exactly the multi-column ORDER BY the
  * window form used); `payload` may be any type, typically a struct of
  * the output columns. Values are copied on buffer insert (Spark reuses
  * input row buffers between `update` calls — the input-aliasing rule
  * from the QuantileSampleAgg fix), and the copy is deferred to the
  * actual insert so rejected candidates pay nothing.
  */
case class TopKRowsAgg(
    ordChild: Expression,
    payloadChild: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeMap[Any, Any]] {

  require(k >= 1, s"graft_topk needs k >= 1, got $k")

  override def children: Seq[Expression] = Seq(ordChild, payloadChild)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(ordChild.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_topk ord type ${ordChild.dataType} is not orderable")
  }

  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk"
  override def dataType: DataType =
    ArrayType(payloadChild.dataType, containsNull = false)

  @transient private lazy val ordOrdering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(ordChild.dataType)

  @transient private lazy val ordComparator: java.util.Comparator[Any] =
    new java.util.Comparator[Any] {
      override def compare(a: Any, b: Any): Int = ordOrdering.compare(a, b)
    }

  /** One projection serves serialize (entry → bytes) and the collision
    * tiebreak (payload → bytes); UnsafeProjection reuses its output row,
    * so every serialized image is copied before retention/comparison
    * against another image.
    */
  @transient private lazy val pairProj: UnsafeProjection =
    UnsafeProjection.create(Array(ordChild.dataType, payloadChild.dataType))
  @transient private lazy val payloadProj: UnsafeProjection =
    UnsafeProjection.create(Array(payloadChild.dataType))

  /** The payload's UnsafeRow image, COPIED: `UnsafeRow.getBytes` returns
    * the projection's live reused buffer when the row exactly occupies
    * it, so two un-copied calls would compare an array with itself and
    * the collision survivor would silently become arrival-order
    * dependent (the same input-aliasing class as QuantileSampleAgg's
    * rank-key fix — caught here by the collision-determinism spec).
    */
  private def payloadBytes(p: Any): Array[Byte] = {
    val img = payloadProj(new GenericInternalRow(Array(p))).getBytes
    java.util.Arrays.copyOf(img, img.length)
  }

  override def createAggregationBuffer(): java.util.TreeMap[Any, Any] =
    new java.util.TreeMap[Any, Any](ordComparator)

  /** Insert (ord, payload) into the bottom-k buffer. `owned` marks
    * values this code already owns (deserialized or prior-buffer
    * entries); unowned values are copied at the insert.
    */
  private def add(buf: java.util.TreeMap[Any, Any], o: Any, p: Any,
      owned: Boolean): Unit = {
    def ownO = if (owned) o else InternalRow.copyValue(o)
    def ownP = if (owned) p else InternalRow.copyValue(p)
    if (buf.containsKey(o)) {
      // equal-ord collision: keep the lexicographically-smaller payload
      // image so the survivor is arrival/merge-order independent
      val cur = buf.get(o)
      if (QuantileSampleAgg.ByteOrder.compare(
          payloadBytes(p), payloadBytes(cur)) < 0) { buf.put(ownO, ownP); () }
    } else if (buf.size < k) {
      buf.put(ownO, ownP); ()
    } else if (ordOrdering.compare(o, buf.lastKey()) < 0) {
      buf.put(ownO, ownP)
      if (buf.size > k) { buf.pollLastEntry(); () }
    }
  }

  override def update(buf: java.util.TreeMap[Any, Any],
      input: InternalRow): java.util.TreeMap[Any, Any] = {
    val o = ordChild.eval(input)
    val p = payloadChild.eval(input)
    if (o != null && p != null) add(buf, o, p, owned = false)
    buf
  }

  override def merge(b1: java.util.TreeMap[Any, Any],
      b2: java.util.TreeMap[Any, Any]): java.util.TreeMap[Any, Any] = {
    val it = b2.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      add(b1, e.getKey, e.getValue, owned = true)
    }
    b1
  }

  override def eval(buf: java.util.TreeMap[Any, Any]): Any = {
    val arr = new Array[Any](buf.size)
    val it = buf.values().iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeMap[Any, Any]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    val row = new GenericInternalRow(2)
    while (it.hasNext) {
      val e = it.next()
      row.update(0, e.getKey)
      row.update(1, e.getValue)
      val bytes = pairProj(row).getBytes
      out.writeInt(bytes.length); out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[Any, Any] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.TreeMap[Any, Any](ordComparator)
    val row = new UnsafeRow(2)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val img = new Array[Byte](len)
      in.readFully(img)
      row.pointTo(img, len)
      // copy out of the row image so entries own independent storage
      buf.put(
        InternalRow.copyValue(row.get(0, ordChild.dataType)),
        InternalRow.copyValue(row.get(1, payloadChild.dataType)))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRowsAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKRowsAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKRowsAgg =
    copy(ordChild = newChildren(0), payloadChild = newChildren(1))
}

object TopKRowsAgg {
  val info = new ExpressionInfo(classOf[TopKRowsAgg].getName, "graft_topk")

  /** `graft_topk(ord, payload, k)` — `k` must be a foldable integer
    * literal (it shapes the aggregate, not the data).
    */
  val builder: Seq[Expression] => Expression = {
    case Seq(o, p, k) if k.foldable =>
      TopKRowsAgg(o, p, LiteralArgs.int(k, "graft_topk", "k"))
        .toAggregateExpression()
    case other => throw new IllegalArgumentException(
      s"graft_topk expects (ord, payload, <literal k>), got $other")
  }
}
