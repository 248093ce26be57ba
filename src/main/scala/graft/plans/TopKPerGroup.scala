package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, Descending, Expression,
  InterpretedOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{
  AllTuples, ClusteredDistribution, Distribution, Partitioning,
  UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator custom plan (builder preference (c): LogicalPlan +
  * Strategy + SparkPlan): top-k rows per group under an ordering.
  *
  * Why not built-ins: the composable form —
  * `row_number().over(Window.partitionBy(keys).orderBy(ord)) <= k` —
  * shuffles EVERY row to its key's partition and fully sorts each
  * partition before discarding all but k. This operator keeps a bounded
  * heap per key on the map side, so at most k rows per (key, input
  * partition) reach the shuffle, then merges heaps per key — the same
  * partial/final split Spark applies to aggregates, applied to top-k. On
  * a 100 TB fact table with millions of rows per key and k≈10 that is a
  * ~|group|/k shuffle-volume reduction and no full sort.
  */
case class TopKPerGroupNode(
    keys: Seq[Expression], ordering: Seq[SortOrder], k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerGroupNode =
    copy(child = c)
}

/** One physical stage of top-k-per-group: a streaming heap pass over each
  * input partition. Planned twice — a `partial` instance over the raw
  * input (so at most k rows per (key, partition) reach the shuffle) and a
  * final instance that declares `ClusteredDistribution(keys)`, letting
  * `EnsureRequirements` insert Spark's own Tungsten exchange between the
  * two — the same partial/final split and shuffle machinery as a hash
  * aggregate, applied to top-k. No sort of the input ever happens; per-key
  * state is k row copies. */
case class TopKPerGroupExec(
    keys: Seq[Expression], ordering: Seq[SortOrder], k: Int,
    partial: Boolean, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else if (keys.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(keys) :: Nil

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def withNewChildInternal(c: SparkPlan): TopKPerGroupExec =
    copy(child = c)

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val boundKeys = keys
    val boundOrdering = ordering
    val kk = k
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(boundKeys, childOutput)
      val ord = TopKPerGroup.ordering(boundOrdering, childOutput)
      val heaps = new java.util.HashMap[UnsafeRow, TopKHeap]()
      it.foreach { row =>
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new TopKHeap(kk, ord)
          heaps.put(key.copy(), heap)
        }
        heap.offer(row.asInstanceOf[UnsafeRow])
      }
      val out = Seq.newBuilder[InternalRow]
      heaps.forEach((_, heap) =>
        heap.rows.toSeq.sorted(ord.asInstanceOf[Ordering[UnsafeRow]])
          .foreach(out += _))
      out.result().iterator
    }
  }
}

/** Bounded "first k under ord" heap: keeps the k smallest rows (ord
  * ascending = best first); the java PriorityQueue is a max-heap over ord
  * so the worst survivor is evicted first. */
private[plans] final class TopKHeap(
    k: Int, ord: Ordering[InternalRow]) {
  private val pq = new java.util.PriorityQueue[UnsafeRow](
    k, (a: UnsafeRow, b: UnsafeRow) => ord.compare(b, a))
  def offer(row: UnsafeRow): Unit = {
    if (pq.size < k) pq.add(row.copy())
    else if (ord.compare(row, pq.peek()) < 0) { pq.poll(); pq.add(row.copy()) }
  }
  def rows: Iterator[UnsafeRow] = {
    import scala.jdk.CollectionConverters._
    pq.iterator().asScala
  }
}

object TopKPerGroup {

  /** Code-generated row comparator (falls back to interpreted if codegen
    * fails) — the heap compares every input row, so an interpreted
    * ordering would put a reflective call on the per-row hot path. */
  private[plans] def ordering(sortOrder: Seq[SortOrder],
      output: Seq[Attribute]): Ordering[InternalRow] = {
    val bound = BindReferences.bindReferences(sortOrder, output)
    try org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
      .generate(bound)
    catch { case _: Exception => new InterpretedOrdering(bound) }
  }

  /** Planner strategy: partial heap pass → (exchange inserted by
    * EnsureRequirements) → final heap pass. */
  object TopKStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case TopKPerGroupNode(keys, ord, k, child) =>
        TopKPerGroupExec(keys, ord, k, partial = false,
          TopKPerGroupExec(keys, ord, k, partial = true, planLater(child))) :: Nil
      case _ => Nil
    }
  }

  /** Sort key for the custom operator. (Spark 4's `Column.desc` wraps an
    * internal ColumnNode, not a catalyst SortOrder, so direction is an
    * explicit flag here and the SortOrder is built from the plain
    * column's resolved expression.) */
  final case class SortKey(column: Column, descending: Boolean = false)

  def desc(c: Column): SortKey = SortKey(c, descending = true)
  def asc(c: Column): SortKey = SortKey(c)

  /** Column-API entry point: top `k` rows per `keys` group, "top" = first
    * under `ordering` (a unique tiebreak makes the result deterministic).
    * Registers the strategy on the session's experimental strategies
    * once. */
  def topKPerGroup(df: DataFrame, keys: Seq[Column], ordering: Seq[SortKey],
      k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    }
    val keyExprs = keys.map(GraftSqlBridge.expression)
    val ordExprs = ordering.map { sk =>
      SortOrder(GraftSqlBridge.expression(sk.column),
        if (sk.descending) Descending else Ascending)
    }
    GraftSqlBridge.ofRows(spark,
      TopKPerGroupNode(keyExprs, ordExprs, k, GraftSqlBridge.analyzedPlan(df)))
  }
}
