package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items sketch (Misra & Gries 1982) as a
  * `TypedImperativeAggregate` — the mergeable heavy-hitters summary a
  * 100 TB token-frequency pass runs instead of a full (token, count)
  * aggregate whose key space can exceed memory.
  *
  * State is AT MOST `capacity` counters regardless of input size:
  * partial aggregation bounds each map task to `capacity` entries, the
  * shuffle moves only those summaries, and merge is the PROVEN
  * mergeable-summaries rule (Agarwal et al., SODA 2012): sum counters
  * over the key union, then subtract the (capacity+1)-th largest
  * combined count from every counter and drop the non-positives —
  * errors add, the bound survives.
  *
  * Guarantee (what tools/check.py grades cross-engine): every emitted
  * estimate UNDERCOUNTS by at most n/(capacity+1) —
  * `true - n/(k+1) <= est <= true` — and every token with true
  * frequency above n/(capacity+1) is PRESENT in the summary. Exact
  * estimates are merge-order dependent (hence rows-only at the gate);
  * the bounds are not.
  */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGriesAgg.Summary] {

  import MisraGriesAgg.Summary

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType != StringType)
      TypeCheckFailure(s"mg_topk input must be STRING, got ${child.dataType.sql}")
    else if (capacity <= 0)
      TypeCheckFailure(s"mg_topk capacity must be positive, got $capacity")
    else TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("token", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "mg_topk"

  override def createAggregationBuffer(): Summary = new Summary(capacity)

  override def update(buf: Summary, input: InternalRow): Summary = {
    val v = child.eval(input)
    if (v != null) buf.offer(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: Summary, other: Summary): Summary = {
    buf.absorb(other)
    buf
  }

  override def eval(buf: Summary): Any =
    new GenericArrayData(buf.sortedDescending.map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c)
    })

  override def serialize(buf: Summary): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { (t, c) => out.writeUTF(t); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Summary = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val s = new Summary(capacity)
    var i = 0
    while (i < n) { s.put(in.readUTF(), in.readLong()); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

object MisraGriesAgg {

  /** Bounded counter map. The decrement-all step is charged against
    * the increments that filled the map (classic MG amortization), so
    * update stays O(1) amortized for any capacity. */
  final class Summary(capacity: Int) {
    private val counts = scala.collection.mutable.HashMap.empty[String, Long]

    def size: Int = counts.size

    /** Direct insert used by deserialization (counters, not raw items). */
    private[MisraGriesAgg] def put(t: String, c: Long): Unit = counts(t) = c

    /** MG update with one raw item. */
    def offer(t: String): Unit = {
      counts.get(t) match {
        case Some(c) => counts(t) = c + 1
        case None if counts.size < capacity => counts(t) = 1L
        case None =>
          // decrement-all; keys hitting zero free their slots
          val dead = List.newBuilder[String]
          counts.mapValuesInPlace { (_, c) => c - 1 }
          counts.foreach { case (k, c) => if (c <= 0) dead += k }
          dead.result().foreach(counts.remove)
      }
    }

    /** Mergeable-summaries rule: sum counters over the union, subtract
      * the (capacity+1)-th largest combined count, drop non-positives. */
    def absorb(other: Summary): Unit = {
      other.counts.foreach { case (t, c) =>
        counts(t) = counts.getOrElse(t, 0L) + c
      }
      if (counts.size > capacity) {
        val cut = counts.values.toArray.sorted(Ordering[Long].reverse)(capacity)
        val dead = List.newBuilder[String]
        counts.mapValuesInPlace { (_, c) => c - cut }
        counts.foreach { case (k, c) => if (c <= 0) dead += k }
        dead.result().foreach(counts.remove)
      }
    }

    def foreach(f: (String, Long) => Unit): Unit =
      counts.foreach { case (t, c) => f(t, c) }

    /** Entries (est desc, token asc) — a deterministic rendering of
      * whatever the summary holds. */
    def sortedDescending: Array[(String, Long)] =
      counts.toArray.sortWith((a, b) => a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
  }

  def mgTopk(token: Column, capacity: Int): Column =
    GraftShim.column(
      MisraGriesAgg(GraftShim.expression(token), capacity).toAggregateExpression())
}
