package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Registration of the engine's native expressions as SQL functions, both
  * via `SparkSessionExtensions` (builder-time: `.withExtensions(new
  * GraftExtensions)` / `spark.sql.extensions=graft.plans.GraftExtensions`)
  * and via the session's FunctionRegistry for an existing session — so
  * `spark.sql("SELECT cosine_sim(a, b)")` works next to the Column API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.definitions.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
    e.injectOptimizerRule(_ => RankLimitRewrite)
    e.injectPlannerStrategy(_ => TopKPerGroup.TopKStrategy)
  }
}

object GraftFunctions {

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal int argument, got $other")
  }

  /** Arity guard so `fn()` / `fn(a, b, c)` fails as an analysis-time
    * wrong-number-of-arguments error instead of an
    * IndexOutOfBoundsException (or silently ignored extras). */
  private def arity(fn: String, min: Int, max: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    args => {
      if (args.length < min || args.length > max)
        throw new IllegalArgumentException(
          s"$fn expects " +
            (if (min == max) s"$min argument(s)"
             else s"between $min and $max arguments") +
            s", got ${args.length}")
      build(args)
    }

  val definitions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("cosine_sim",
      new ExpressionInfo(classOf[CosineSimilarityExpr].getName, "cosine_sim"),
      arity("cosine_sim", 2, 2)(args => CosineSimilarityExpr(args(0), args(1)))),
    ("minhash_sig",
      new ExpressionInfo(classOf[MinHashSignatureExpr].getName, "minhash_sig"),
      arity("minhash_sig", 2, 2)(args =>
        MinHashSignatureExpr(args(0), intArg(args(1), "minhash_sig")))),
    ("shingles",
      new ExpressionInfo(classOf[ShinglesExpr].getName, "shingles"),
      arity("shingles", 2, 2)(args =>
        ShinglesExpr(args(0), intArg(args(1), "shingles")))),
    ("ngrams",
      new ExpressionInfo(classOf[NgramsExpr].getName, "ngrams"),
      arity("ngrams", 2, 2)(args =>
        NgramsExpr(args(0), intArg(args(1), "ngrams")))),
    ("cdc_chunks",
      new ExpressionInfo(classOf[CdcChunksExpr].getName, "cdc_chunks"),
      arity("cdc_chunks", 3, 3)(args =>
        CdcChunksExpr(args(0), intArg(args(1), "cdc_chunks"),
          intArg(args(2), "cdc_chunks")))),
    ("text_entropy",
      new ExpressionInfo(classOf[EntropyExpr].getName, "text_entropy"),
      arity("text_entropy", 1, 2)(args =>
        EntropyExpr(args(0), args.lift(1) match {
          case None => false
          case Some(Literal(v: Boolean, _)) => v
          case Some(other) => throw new IllegalArgumentException(
            s"text_entropy expects a literal boolean tokenLevel argument, got $other")
        }))),
    ("freq_items_sketch",
      new ExpressionInfo(classOf[MisraGriesAgg].getName, "freq_items_sketch"),
      arity("freq_items_sketch", 2, 2)(args =>
        MisraGriesAgg(args(0), intArg(args(1), "freq_items_sketch"))
          .toAggregateExpression())),
    ("kmv_sketch",
      new ExpressionInfo(classOf[KmvAgg].getName, "kmv_sketch"),
      arity("kmv_sketch", 2, 2)(args =>
        KmvAgg(args(0), intArg(args(1), "kmv_sketch"))
          .toAggregateExpression())),
    ("quantile_sketch",
      new ExpressionInfo(classOf[QuantileSketchAgg].getName, "quantile_sketch"),
      arity("quantile_sketch", 2, 2)(args =>
        QuantileSketchAgg(args(0), intArg(args(1), "quantile_sketch"))
          .toAggregateExpression())),
    ("quantile_sketch_merge",
      new ExpressionInfo(classOf[QuantileSketchMergeAgg].getName, "quantile_sketch_merge"),
      arity("quantile_sketch_merge", 2, 2)(args =>
        QuantileSketchMergeAgg(args(0), intArg(args(1), "quantile_sketch_merge"))
          .toAggregateExpression())),
    ("bpe_apply",
      new ExpressionInfo(classOf[BpeApplyExpr].getName, "bpe_apply"),
      arity("bpe_apply", 2, 2)(args => BpeApplyExpr(args(0), args(1)))),
    ("normalize_text",
      new ExpressionInfo(classOf[NormalizeTextExpr].getName, "normalize_text"),
      arity("normalize_text", 1, 1)(args => NormalizeTextExpr(args(0)))),
    // The reference's per-row rules entry point on the SQL surface:
    // categorize_bb(desc) returns the (categoria, subcategoria,
    // recorrente_suspeita, parcelado_suspeito) struct from the compiled
    // 23-rule chain — the same Column tree the DataFrame API builds, so
    // SQL and Column callers cannot diverge (categories_bb.py:223-274).
    ("categorize_bb",
      new ExpressionInfo(graft.rules.Categorizer.getClass.getName, "categorize_bb"),
      arity("categorize_bb", 1, 1)(args => org.apache.spark.sql.GraftSqlBridge.catalystExpression(
        graft.rules.Categorizer.categorize(
          org.apache.spark.sql.GraftSqlBridge.column(args(0)))))))

  /** Register on an already-built session. */
  def register(spark: SparkSession): Unit =
    definitions.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), info, builder)
    }
}
