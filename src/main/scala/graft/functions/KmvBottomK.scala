package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bottom-K buffer over primitive longs: a sorted `Array[Long]` prefix
  * of length `size`, deduplicated, capped at `k`. Replaces the previous
  * `java.util.TreeSet[Long]` buffer (round-15 verdict note 2): every
  * TreeSet add/merge/serialize boxed each long into a node object; here
  * update is a binary search plus a primitive `System.arraycopy` shift
  * (k-bounded, cache-friendly, zero allocation past the one backing
  * array), and merge walks the other buffer's ascending prefix with an
  * EARLY EXIT — once the incoming value is ≥ this buffer's current max
  * with the buffer full, every remaining incoming value is too (both
  * sides sorted), so the tail of a large merge costs nothing.
  */
final class LongBottomK(val k: Int) {
  val arr = new Array[Long](k)
  var size = 0

  /** Largest value currently held; only meaningful when size == k. */
  @inline def max: Long = arr(size - 1)

  /** Insert keeping the sorted-distinct-bottom-k invariant: no-op for a
    * duplicate or for a value not among the k smallest seen so far.
    */
  def add(v: Long): Unit = {
    if (size == k && v >= arr(size - 1)) return
    var lo = 0
    var hi = size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (arr(mid) < v) lo = mid + 1 else hi = mid
    }
    if (lo < size && arr(lo) == v) return // already held (distinct set)
    val keep = if (size == k) size - lo - 1 else size - lo
    if (keep > 0) System.arraycopy(arr, lo, arr, lo + 1, keep)
    arr(lo) = v
    if (size < k) size += 1
  }
}

/** Native Catalyst aggregate: the KMV (k-minimum-values) sketch — the K
  * smallest DISTINCT values of a long column, returned as one sorted
  * array (Bar-Yossef et al. 2002; Beyer et al. 2007 for the unbiased
  * distinct-count estimator the consumers apply). This IS the sketch's
  * defining construction, so the aggregate replaces the
  * distinct-then-rank formulation (a full dedup shuffle of every
  * (group, value) pair plus a per-group sort window) with one
  * aggregation whose buffers are K-BOUNDED everywhere: update folds a
  * value into a capped sorted array, map-side partial aggregation ships
  * at most K longs per (partition, group), and merge is a bounded
  * sorted-union — the property that makes the sketch serve at 100 TB,
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
  extends TypedImperativeAggregate[LongBottomK] {

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

  override def createAggregationBuffer(): LongBottomK = new LongBottomK(k)

  override def update(buf: LongBottomK, input: InternalRow): LongBottomK = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: LongBottomK, b2: LongBottomK): LongBottomK = {
    var i = 0
    // ascending walk + early exit: once b1 is full and b2's next value
    // is not below b1's max, no later b2 value can enter either
    while (i < b2.size && !(b1.size == k && b2.arr(i) >= b1.max)) {
      b1.add(b2.arr(i))
      i += 1
    }
    b1
  }

  override def eval(buf: LongBottomK): Any =
    new GenericArrayData(java.util.Arrays.copyOf(buf.arr, buf.size))

  override def serialize(buf: LongBottomK): Array[Byte] = {
    val bytes = new Array[Byte](4 + 8 * buf.size)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.arr(i)); i += 1 }
    bytes
  }

  override def deserialize(bytes: Array[Byte]): LongBottomK = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    require(n >= 0 && n <= k && bytes.length == 4 + 8 * n,
      s"malformed kmv buffer: n=$n, k=$k, ${bytes.length} bytes")
    val buf = new LongBottomK(k)
    // serialized form is this aggregate's own sorted-distinct prefix —
    // restore by direct copy, no per-element re-insert
    var i = 0
    while (i < n) { buf.arr(i) = bb.getLong(); i += 1 }
    buf.size = n
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
