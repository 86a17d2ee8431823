package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** K-minimum-values distinct-count sketch (Bar-Yossef et al., RANDOM'02) —
  * the mergeable alternative to `count(DISTINCT …)` for 100 TB corpora.
  *
  * Buffer = the k smallest DISTINCT hash values seen; output = that set as
  * a sorted ascending `array<bigint>`. The estimator is plain column
  * arithmetic downstream: `n̂ = (k−1)·P / h_(k)` when the buffer is full
  * (hashes uniform on [0, P)), exact `|buffer|` otherwise.
  *
  * Why this beats `count(DISTINCT)` at scale: the buffer is O(k) and
  * merge-associative, so partial aggregation keeps every executor's state
  * bounded and the shuffle ships ≤ k longs per group instead of the whole
  * distinct key set. Deterministic (no RNG, no timestamps) — the DuckDB
  * oracle replays it as `list_sort(list_distinct(list(h)))[1:k]`.
  *
  * Reference surface: pandas `Series.nunique` (exact) — this is the
  * sketch-sized variant a pipeline swaps in when exactness stops fitting.
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with UnaryLike[Expression] {

  require(k >= 2, s"graft_kmv needs k >= 2, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"graft_kmv expects an integral hash column, got $other")
    }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow
  ): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v match {
        case l: java.lang.Long    => l.longValue()
        case i: java.lang.Integer => i.longValue()
      }
      // insert only if it would make the k-smallest set (bounded buffer)
      if (buf.size < k || h < buf.last()) {
        buf.add(h)
        if (buf.size > k) buf.pollLast()
      }
    }
    buf
  }

  override def merge(
      b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]
  ): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) {
      val h = it.next()
      if (b1.size < k || h < b1.last()) {
        b1.add(h)
        if (b1.size > k) b1.pollLast()
      }
    }
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + buf.size * 8)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong()); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv"

  override def withNewMutableAggBufferOffset(offset: Int): KmvSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): KmvSketch = copy(child = c)
}

object KmvSketch {

  /** Builder for function-registry injection: `graft_kmv(hash, k)` with k
    * a foldable int literal. */
  def fromExprs(exprs: Seq[Expression]): KmvSketch = {
    require(exprs.length == 2, s"graft_kmv(hash, k) takes 2 args, got ${exprs.length}")
    val k = exprs(1) match {
      case Literal(v: Int, IntegerType) => v
      case other =>
        throw new IllegalArgumentException(s"graft_kmv k must be an int literal, got $other")
    }
    KmvSketch(exprs(0), k)
  }
}
