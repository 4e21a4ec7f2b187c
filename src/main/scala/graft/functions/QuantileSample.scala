package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst aggregate: the deterministic bottom-k quantile
  * SAMPLE — the k rows with the smallest rank strings (md5 of a unique
  * row id, so the sample is a fixed uniform subset both engines and
  * both execution modes select identically), returning the sampled
  * VALUES sorted ascending. This is [[KmvBottomKAgg]]'s shape with a
  * payload: the buffer is rank-capped at k everywhere, map-side partial
  * aggregation ships at most k (rank, value) pairs per (partition,
  * group), and merge is a bounded ordered union (bottom-k-of-union =
  * bottom-k-of-parts — the mergeable-sketch law the streaming twin
  * holds as state, [[graft.streaming.QuantileSketchStream]]). It
  * replaces the rank-window formulation that shuffled and sorted every
  * (group, row) pair to select a k-bounded sample — the difference
  * between shuffling the corpus and shuffling k rows per group at
  * 100 TB.
  *
  * The rank strings are assumed DISTINCT within a group (md5 of a
  * unique id — the same assumption the window formulation's
  * row_number tie order already relied on for cross-engine
  * determinism); a colliding rank would collapse rather than occupy
  * two sample slots — deterministically to the MIN value, so even then
  * the result is a pure function of the input set (see [[add]]). Rank
  * ORDER is Spark's own string order — binary
  * UTF-8 (≡ code-point ≡ DuckDB binary collation) — implemented by
  * keying the buffer on the rank's UTF-8 BYTES under unsigned
  * lexicographic comparison, never on java.lang.String's UTF-16
  * code-unit order, which diverges above the BMP (the representation-
  * dependence class the BPE tie-break fix pinned; for the md5-hex
  * ranks the engine feeds it the orders coincide, but the function's
  * contract must not depend on that). Quantile selection downstream is
  * pure rank selection over the returned ascending values
  * (`element_at(s, greatest(1, ceil(p·n/100)))`), identical to the
  * window twin's `rn = greatest(1, ceil(p·n/100))` over (value, rank)
  * order: the rank tiebreak can only permute EQUAL values, so the
  * selected value is unchanged.
  */
case class QuantileSampleAgg(
    rankChild: Expression,
    valueChild: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeMap[Array[Byte], Double]] {

  import QuantileSampleAgg.ByteOrder

  require(k >= 1, s"graft_qsample needs k >= 1, got $k")

  override def children: Seq[Expression] = Seq(rankChild, valueChild)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    (rankChild.dataType, valueChild.dataType) match {
      case (StringType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (r, v) => TypeCheckResult.TypeCheckFailure(
        s"graft_qsample expects (string rank, double value, <literal k>), got ($r, $v)")
    }
  }

  override def nullable: Boolean = false
  override def prettyName: String = "graft_qsample"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): java.util.TreeMap[Array[Byte], Double] =
    new java.util.TreeMap[Array[Byte], Double](ByteOrder)

  /** Insert (rank, value) into the bottom-k buffer.
    *
    * `copyKey`: `UTF8String.getBytes` returns the string's LIVE backing
    * array (no copy) when the string exactly occupies it, and Spark
    * reuses row buffers between `update` calls — so a key taken from an
    * input row must be cloned before the TreeMap retains it, or a later
    * row would silently rewrite buffered keys (the input-aliasing
    * variant of the representation-dependence class; the clone is
    * deferred to the actual insert, so rejected rows pay nothing).
    * Merge keys come from a deserialized (or already-cloned) buffer this
    * code owns, so they pass `copyKey = false`.
    *
    * Rank-key collision: keep the MIN value, so the surviving pair is a
    * pure function of the input SET under any arrival/merge order (the
    * previous put-overwrites behavior depended on partition order). For
    * the md5-of-unique-id ranks the engine feeds, collisions never
    * occur; the rule exists so the aggregate's determinism contract
    * does not.
    */
  private def add(buf: java.util.TreeMap[Array[Byte], Double],
      r: Array[Byte], v: Double, copyKey: Boolean): Unit = {
    if (buf.containsKey(r)) {
      if (v < buf.get(r)) { buf.put(r, v); () }
    } else if (buf.size < k) {
      buf.put(if (copyKey) r.clone() else r, v); ()
    } else if (ByteOrder.compare(r, buf.lastKey()) < 0) {
      buf.put(if (copyKey) r.clone() else r, v)
      if (buf.size > k) { buf.pollLastEntry(); () }
    }
  }

  override def update(buf: java.util.TreeMap[Array[Byte], Double],
      input: InternalRow): java.util.TreeMap[Array[Byte], Double] = {
    val r = rankChild.eval(input)
    val v = valueChild.eval(input)
    if (r != null && v != null)
      add(buf, r.asInstanceOf[UTF8String].getBytes, v.asInstanceOf[Double],
        copyKey = true)
    buf
  }

  override def merge(b1: java.util.TreeMap[Array[Byte], Double],
      b2: java.util.TreeMap[Array[Byte], Double]): java.util.TreeMap[Array[Byte], Double] = {
    val it = b2.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      add(b1, e.getKey, e.getValue, copyKey = false)
    }
    b1
  }

  override def eval(buf: java.util.TreeMap[Array[Byte], Double]): Any = {
    val arr = new Array[Double](buf.size)
    val it = buf.values().iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    java.util.Arrays.sort(arr)
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeMap[Array[Byte], Double]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeInt(e.getKey.length); out.write(e.getKey)
      out.writeDouble(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[Array[Byte], Double] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.TreeMap[Array[Byte], Double](ByteOrder)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val key = new Array[Byte](len)
      in.readFully(key)
      buf.put(key, in.readDouble()); i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSampleAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSampleAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantileSampleAgg =
    copy(rankChild = newChildren(0), valueChild = newChildren(1))
}

object QuantileSampleAgg {
  /** Unsigned lexicographic byte order over UTF-8 rank bytes — Spark's
    * own string comparison (UTF8String.binaryCompare) and DuckDB's
    * binary collation, independent of java.lang.String's UTF-16 order.
    */
  private[functions] val ByteOrder: java.util.Comparator[Array[Byte]] =
    new java.util.Comparator[Array[Byte]] {
      override def compare(a: Array[Byte], b: Array[Byte]): Int = {
        val n = math.min(a.length, b.length)
        var i = 0
        while (i < n) {
          val c = (a(i) & 0xff) - (b(i) & 0xff)
          if (c != 0) return c
          i += 1
        }
        a.length - b.length
      }
    }

  val info = new ExpressionInfo(classOf[QuantileSampleAgg].getName, "graft_qsample")

  /** `graft_qsample(rank, value, k)` — `k` must be a foldable integer
    * literal (it shapes the aggregate, not the data).
    */
  val builder: Seq[Expression] => Expression = {
    case Seq(r, v, k) if k.foldable =>
      QuantileSampleAgg(r, v, LiteralArgs.int(k, "graft_qsample", "k"))
        .toAggregateExpression()
    case other => throw new IllegalArgumentException(
      s"graft_qsample expects (rank, value, <literal k>), got $other")
  }
}
