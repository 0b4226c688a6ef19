package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded-memory top-k aggregate (SURVEY.md §5 "partial top-k
  * pattern").
  *
  * The window-rank formulation of per-group top-k
  * (`row_number over (partition by g order by v desc) <= k`) must SORT
  * every group in full — at 100 TB that is a sort of the whole fact
  * table just to keep k rows per group. This aggregate keeps a k-sized
  * heap per group instead: partial aggregation bounds each map task's
  * state to k entries per local group, the shuffle moves only those
  * heaps, and merge is O(k). Semantics (including the ascending-id tie
  * break) match the window form exactly, which is how it is gated.
  *
  * Buffer = worst-at-root binary heap of (value, id), ordered by
  * (value desc, id asc); serialized compactly for shuffle transport.
  */
case class TopKAgg(
    valueExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Heap] {

  import TopKAgg.Heap

  override def children: Seq[Expression] = Seq(valueExpr, idExpr)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (valueExpr.dataType != DoubleType)
      TypeCheckFailure(s"topk_agg value must be DOUBLE, got ${valueExpr.dataType.sql}")
    else if (idExpr.dataType != LongType)
      TypeCheckFailure(s"topk_agg id must be BIGINT, got ${idExpr.dataType.sql}")
    else if (k <= 0) TypeCheckFailure(s"topk_agg k must be positive, got $k")
    else TypeCheckSuccess
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("value", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "topk_agg"

  override def createAggregationBuffer(): Heap = new Heap(k)

  override def update(buf: Heap, input: InternalRow): Heap = {
    val v = valueExpr.eval(input)
    val id = idExpr.eval(input)
    if (v != null && id != null)
      buf.offer(v.asInstanceOf[Double], id.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Heap, other: Heap): Heap = {
    other.foreach((v, id) => buf.offer(v, id))
    buf
  }

  override def eval(buf: Heap): Any = {
    val sorted = buf.sortedDescending
    new GenericArrayData(sorted.map { case (v, id) =>
      InternalRow(v, id)
    })
  }

  override def serialize(buf: Heap): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { (v, id) => out.writeDouble(v); out.writeLong(id) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Heap = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val h = new Heap(k)
    var i = 0
    while (i < n) { h.offer(in.readDouble(), in.readLong()); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(valueExpr = newChildren(0), idExpr = newChildren(1))
}

object TopKAgg {

  /** Fixed-capacity heap keeping the top-k by (value desc, id asc);
    * root is the current WORST kept entry so admission is O(1) reject /
    * O(log k) replace. */
  final class Heap(k: Int) {
    private val vs = new Array[Double](k)
    private val ids = new Array[Long](k)
    private var n = 0

    def size: Int = n

    /** a is worse than b under (value desc, id asc) ranking. */
    @inline private def worse(va: Double, ia: Long, vb: Double, ib: Long): Boolean =
      va < vb || (va == vb && ia > ib)

    def offer(v: Double, id: Long): Unit = {
      if (n < k) {
        vs(n) = v; ids(n) = id; n += 1
        siftUp(n - 1)
      } else if (k > 0 && worse(vs(0), ids(0), v, id)) {
        vs(0) = v; ids(0) = id
        siftDown(0)
      }
    }

    private def siftUp(start: Int): Unit = {
      var i = start
      while (i > 0) {
        val p = (i - 1) / 2
        if (worse(vs(i), ids(i), vs(p), ids(p))) { swap(i, p); i = p }
        else return
      }
    }

    private def siftDown(start: Int): Unit = {
      var i = start
      while (true) {
        val l = 2 * i + 1; val r = l + 1
        var m = i
        if (l < n && worse(vs(l), ids(l), vs(m), ids(m))) m = l
        if (r < n && worse(vs(r), ids(r), vs(m), ids(m))) m = r
        if (m == i) return
        swap(i, m); i = m
      }
    }

    @inline private def swap(i: Int, j: Int): Unit = {
      val tv = vs(i); vs(i) = vs(j); vs(j) = tv
      val ti = ids(i); ids(i) = ids(j); ids(j) = ti
    }

    def foreach(f: (Double, Long) => Unit): Unit = {
      var i = 0
      while (i < n) { f(vs(i), ids(i)); i += 1 }
    }

    /** Entries best-first: (value desc, id asc). */
    def sortedDescending: Array[(Double, Long)] =
      (0 until n).map(i => (vs(i), ids(i))).toArray
        .sortWith((a, b) => a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
  }

  def topk(value: Column, id: Column, k: Int): Column =
    GraftShim.column(
      TopKAgg(GraftShim.expression(value), GraftShim.expression(id), k)
        .toAggregateExpression())
}
