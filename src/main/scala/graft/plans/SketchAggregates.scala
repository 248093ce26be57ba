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

/** K-Minimum-Values distinct sketch (Bar-Yossef et al. 2002; Beyer et
  * al., SIGMOD 2007) — the mergeable cardinality summary whose killer
  * feature over HLL is set INTERSECTION: two KMV sketches estimate
  * |A ∩ B| (cross-source vocabulary overlap, audience overlap,
  * contamination between corpus snapshots), which HLL unions cannot do
  * without inclusion-exclusion error blow-up.
  *
  * State is the k smallest xxhash64 values of the group's distinct
  * items — a bounded sorted set, so map-side partials ship ≤ k longs per
  * partition regardless of the key universe (the [[MisraGriesAgg]]
  * posture, for cardinality). Hashes are stored SIGN-FLIPPED
  * (h ^ Long.MinValue) so natural signed ordering equals the unsigned
  * ordering of the raw hash: the emitted array is ascending, merge is a
  * plain `array_sort(array_union)[1..k]` of Catalyst array functions,
  * and the estimator's uniform u = flipped/2⁶⁴ + 0.5 ∈ [0,1).
  *
  * Estimators (all plain Column arithmetic over the array artifact —
  * see the companion): a sketch holding fewer than k hashes has seen
  * its whole distinct set and is EXACT; at capacity the unbiased
  * estimate is (k−1)/u₍ₖ₎.
  */
case class KmvAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 2, "k must be >= 2")

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType)

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long], f: Long): Unit =
    if (buf.size < k) { buf.add(f); () }
    else if (f < buf.last()) {
      if (buf.add(f)) { buf.remove(buf.last()); () }
    }

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val u = v.asInstanceOf[UTF8String]
      val h = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
      insert(buf, h ^ java.lang.Long.MIN_VALUE)
    }
    buf
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) insert(b1, it.next())
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) out.writeLong(it.next().longValue())
    out.flush(); bos.toByteArray
  }

  override def deserialize(storage: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(storage))
    val n = in.readInt()
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvAgg =
    copy(child = newChild)
  override def prettyName: String = "kmv_sketch"
}

object KmvAgg {

  import org.apache.spark.sql.functions._

  /** Aggregate Column: the ascending array of the group's k min flipped
    * hashes — the persisted artifact every estimator below reads. */
  def kmvSketch(c: Column, k: Int): Column =
    GraftSqlBridge.column(
      KmvAgg(GraftSqlBridge.expression(c), k).toAggregateExpression())

  /** Merge two sketch artifacts — hash-distinct union, keep the k
    * smallest. Associative/commutative, so snapshots fold in any
    * grouping (q42's union pattern). Pure Catalyst array functions: the
    * custom code is ONLY in the bounded aggregate. */
  def kmvMerge(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_union(a, b)), 1, k)

  /** Merge a collected LIST of sketch artifacts (cross-group rollup). */
  def kmvMergeAll(sks: Column, k: Int): Column =
    slice(array_sort(array_distinct(flatten(sks))), 1, k)

  private def uOf(f: Column): Column =
    f.cast("double") / 1.8446744073709552e19 + 0.5

  /** Distinct-count estimate: exact below capacity, (k−1)/u₍ₖ₎ at it. */
  def kmvDistinctEstimate(sk: Column, k: Int): Column =
    when(size(sk) < k, size(sk).cast("double"))
      .otherwise(lit((k - 1).toDouble) / uOf(element_at(sk, k)))

  /** Intersection estimate of the sets behind two sketches: over the
    * merged k-min union L, the members present in BOTH inputs estimate
    * the Jaccard similarity, scaled by the union estimate (Beyer et al.
    * 2007). Exact when the union fits under capacity (then L is the
    * whole hash-distinct union and the match count IS the exact
    * intersection — the branch keeps it integer-clean rather than
    * re-deriving it through (m/|L|)·|L| float arithmetic). */
  def kmvIntersectEstimate(a: Column, b: Column, k: Int): Column = {
    val l = kmvMerge(a, b, k)
    val matches = size(array_intersect(array_intersect(l, a), b))
    when(size(l) < k, matches.cast("double"))
      .otherwise(matches.cast("double") / size(l) * kmvDistinctEstimate(l, k))
  }
}
