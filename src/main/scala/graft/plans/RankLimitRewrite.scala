package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{
  Alias, AttributeReference, EqualTo, Expression, ExprId, LessThan,
  LessThanOrEqual, Literal, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{
  Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite the composable top-k-per-group idiom —
  *
  *   row_number().over(Window.partitionBy(keys).orderBy(ord)) <= k,
  *   rank column dropped afterwards
  *
  * — into the [[TopKPerGroupNode]] physical operator, which keeps bounded
  * per-key heaps on the map side so at most k rows per (key, partition)
  * reach the shuffle, instead of shuffling and fully sorting every row.
  * Spark's own `InferWindowGroupLimit` (3.5+) inserts a map-side
  * WindowGroupLimit below the Window but still shuffles k rows per key
  * per partition AND runs the full Window machinery above; this rewrite
  * replaces the whole Window+Filter+Project tower. The W1 dedup-by-rank
  * operator (`Lake.dedupByKeys`, datatrack_spark_utils.py:51-95) plans
  * straight into it with k=1.
  *
  * Fires only when the rewrite is exactly semantics-preserving:
  *   - a single row_number window expression (rank/dense_rank admit ties,
  *     whose row multiplicity the heap does not reproduce);
  *   - the filter is a bare `rn <= k` / `rn < k` / `rn = 1` on that column;
  *   - the projection above drops the rank column (so nothing downstream
  *     needs the number itself, only the surviving rows).
  */
object RankLimitRewrite extends Rule[LogicalPlan] {

  private def limitOf(cond: Expression, rankId: ExprId): Option[Int] = cond match {
    case LessThanOrEqual(a: AttributeReference, Literal(k: Int, IntegerType))
      if a.exprId == rankId => Some(k)
    case LessThan(a: AttributeReference, Literal(k: Int, IntegerType))
      if a.exprId == rankId => Some(k - 1)
    case EqualTo(a: AttributeReference, Literal(1, IntegerType))
      if a.exprId == rankId => Some(1)
    case EqualTo(Literal(1, IntegerType), a: AttributeReference)
      if a.exprId == rankId => Some(1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projectList,
        Filter(cond,
          Window(Seq(alias @ Alias(WindowExpression(RowNumber(), _), _)),
            partSpec, orderSpec, child, _))) if orderSpec.nonEmpty =>
      limitOf(cond, alias.exprId) match {
        case Some(k) if k > 0 &&
            projectList.forall(_.references.subsetOf(child.outputSet)) =>
          // a WindowGroupLimit Spark already inserted is subsumed by the heap
          val inner = child match {
            case WindowGroupLimit(_, _, _, _, c) => c
            case c => c
          }
          Project(projectList, TopKPerGroupNode(partSpec, orderSpec, k, inner))
        case _ => p
      }
  }
}

/** Per-session, idempotent registration of the engine's planner surface on
  * sessions the engine did not build (the driver's Verify/Bench mains):
  * the rank-limit rewrite plus the TopKPerGroup strategy. Builder-owned
  * sessions get the same via `.withExtensions(new GraftExtensions)`. */
object GraftRuntime {
  private val registered = ConcurrentHashMap.newKeySet[SparkSession]()

  def ensure(spark: SparkSession): Unit =
    if (registered.add(spark)) {
      if (!spark.experimental.extraOptimizations.contains(RankLimitRewrite))
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ RankLimitRewrite
      if (!spark.experimental.extraStrategies.contains(TopKPerGroup.TopKStrategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ TopKPerGroup.TopKStrategy
      GraftFunctions.register(spark)
    }
}
