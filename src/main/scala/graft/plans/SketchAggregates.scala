package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch as a native mergeable aggregate —
  * the bounded-memory "top frequent items per group" primitive (token /
  * domain / n-gram heavy hitters over a 100 TB corpus, where an exact
  * per-key count table may itself be too hot to hold).
  *
  * Guarantees (Misra-Gries 1982; merge step per Agarwal et al.,
  * "Mergeable Summaries", PODS 2012 — both public): with `capacity` k
  * counters over N observed items, every estimate satisfies
  * `true − N/(k+1) ≤ est ≤ true`, any item with frequency > N/(k+1) is
  * guaranteed present, and merging two sketches preserves the combined
  * bound — so partial aggregation (map-side combine) is safe, which is
  * the whole point: the shuffle moves k counters per partition, never
  * the key universe. When k is at least the number of distinct items the
  * sketch degrades gracefully into EXACT counts (what the oracle gate
  * pins; the error bound is what the spec pins).
  *
  * Why TypedImperativeAggregate: the buffer is a hash map, not a fixed
  * row — Spark's own collect_set/percentile family uses exactly this
  * node; it partial-aggregates and serializes between stages like any
  * built-in.
  */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(capacity > 0, "capacity must be positive")

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("est", LongType))))

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val k = v.asInstanceOf[UTF8String].toString
      buf.get(k) match {
        case Some(c) => buf(k) = c + 1
        case None if buf.size < capacity => buf(k) = 1L
        case None =>
          // classic decrement step: no free counter — every counter pays
          // one, zeroed counters free their slot
          val dead = mutable.ArrayBuffer.empty[String]
          buf.keysIterator.foreach { key =>
            val c = buf(key) - 1
            if (c == 0L) dead += key else buf(key) = c
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(b1: mutable.HashMap[String, Long],
      b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] =
    MisraGriesAgg.mergeCounters(b1, b2, capacity)

  /** Deterministic output order: estimate descending, item ascending —
    * ties cannot reorder across partitionings. */
  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toArray.sortBy { case (k, c) => (-c, k) }
    new GenericArrayData(sorted.map { case (k, c) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(k), c))
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val kb = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length); out.write(kb); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(storage: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(storage))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt()); in.readFully(kb)
      buf(new String(kb, java.nio.charset.StandardCharsets.UTF_8)) = in.readLong()
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)
  override def prettyName: String = "freq_items_sketch"
}

object MisraGriesAgg {

  /** Aggregate Column: array of (item, est) structs, estimate-descending
    * with item-ascending tiebreak. Exact when `capacity` covers the
    * group's distinct items; Misra-Gries-bounded otherwise. */
  def freqItems(c: Column, capacity: Int): Column =
    GraftSqlBridge.column(
      MisraGriesAgg(GraftSqlBridge.expression(c), capacity)
        .toAggregateExpression())

  /** The mergeable-summaries reduction (Agarwal et al., PODS 2012),
    * shared by the aggregate's partial merge and ARTIFACT maintenance:
    * merging yesterday's persisted sketch with today's batch sketch
    * yields a sketch obeying the combined-stream bound — so a standing
    * heavy-hitters view over a growing corpus never re-scans the
    * archive (the d18/d24 index-maintenance posture, for sketches).
    * Mutates and returns `b1`. */
  def mergeCounters(b1: mutable.HashMap[String, Long],
      b2: mutable.HashMap[String, Long],
      capacity: Int): mutable.HashMap[String, Long] = {
    b2.foreach { case (k, c) => b1(k) = b1.getOrElse(k, 0L) + c }
    if (b1.size > capacity) {
      // subtract the (k+1)-th largest counter from everything and drop
      // the non-positive
      val vs = b1.values.toArray
      java.util.Arrays.sort(vs)
      val t = vs(vs.length - capacity - 1)
      val dead = mutable.ArrayBuffer.empty[String]
      b1.keysIterator.foreach { key =>
        val c = b1(key) - t
        if (c <= 0L) dead += key else b1(key) = c
      }
      dead.foreach(b1.remove)
    }
    b1
  }

  /** Sketch-artifact form of [[mergeCounters]] over the (item, est)
    * pairs [[freqItems]] emits / a caller persists. */
  def mergeSketches(a: Seq[(String, Long)], b: Seq[(String, Long)],
      capacity: Int): Seq[(String, Long)] = {
    val m = mergeCounters(mutable.HashMap(a: _*), mutable.HashMap(b: _*), capacity)
    m.toSeq.sortBy { case (k, c) => (-c, k) }
  }
}
