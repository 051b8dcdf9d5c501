package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * misra_gries(item string, k) -> array<struct<item, lower_count>>:
 * mergeable heavy-hitters sketch (Misra–Gries / space-saving family)
 * with FIXED state of at most k−1 counters per partial — the
 * 100 TB answer to "which tokens dominate this corpus" when an exact
 * token groupBy would shuffle the full vocabulary.
 *
 * Guarantees (the spec pins both): every item with true count
 * > N/k is present in the output, and each reported count is a lower
 * bound within N/k of the true count (N = total items). Partials
 * merge associatively (combine counters, then subtract the k-th
 * largest count and drop non-positives — Berinde et al.'s mergeable
 * summaries), so the same sketch serves batch map-side combine AND
 * streaming state. Reported counts can vary with merge order inside
 * the guarantee band — this is a sketch, pinned by properties, not by
 * an SQL oracle.
 *
 * Output is sorted (lower_count desc, item asc) so downstream top-m
 * slices are deterministic given the counters.
 */
case class MisraGriesAgg(child: Expression, k: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[String, Long]] {

  require(k >= 2, "misra_gries: k must be >= 2")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("lower_count", LongType, nullable = false))), containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    GorillaExprs.expect(child, StringType, s"$prettyName arg 1")
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  /** Keep at most k−1 counters: on overflow subtract the k-th largest
    * count from everyone and drop the non-positive survivors. */
  private def shrink(buf: java.util.HashMap[String, Long]): Unit = {
    if (buf.size() <= k - 1) return
    val counts = new Array[Long](buf.size())
    val it0 = buf.values().iterator()
    var i = 0
    while (it0.hasNext) { counts(i) = it0.next(); i += 1 }
    java.util.Arrays.sort(counts)
    val delta = counts(counts.length - k) // k-th largest (ascending order)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue - delta
      if (c <= 0) it.remove() else e.setValue(c)
    }
  }

  override def update(buf: java.util.HashMap[String, Long],
                      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      if (buf.containsKey(s)) buf.put(s, buf.get(s) + 1L)
      else { buf.put(s, 1L); shrink(buf) }
    }
    buf
  }

  override def merge(buf: java.util.HashMap[String, Long],
                     other: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (buf.containsKey(e.getKey)) buf.put(e.getKey, buf.get(e.getKey) + e.getValue)
      else buf.put(e.getKey, e.getValue)
    }
    shrink(buf)
    buf
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val entries = new Array[(String, Long)](buf.size())
    val it = buf.entrySet().iterator()
    var i = 0
    while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1 }
    val sorted = entries.sortBy { case (s, c) => (-c, s) }
    new GenericArrayData(sorted.map { case (s, c) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(s), c)) }: Array[Any])
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size())
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeUTF(e.getKey); out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.HashMap[String, Long](n * 2)
    var i = 0
    while (i < n) { buf.put(in.readUTF(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
