package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's trusted-layer transformer abstraction
  * (base_entity_transformer.py:14-63): a multi-input → single-output
  * entity transform with pre/transform/post hooks, plus the write
  * contract (primary key, partition column) the loader needs. Concrete
  * transformers implement `transform`; the hooks default to identity
  * (base_entity_transformer_simple.py's pass-through variant is just
  * this trait with the defaults). */
trait EntityTransformer {
  /** Entity name, e.g. "fintrack_trusted.lancamentos" — the control
    * table's `entidade_trusted`. */
  def entityName: String
  /** Input table names (resolved to DataFrames by the runner). */
  def inputs: Seq[String]
  /** MERGE/dedup key of the output entity. */
  def primaryKey: Seq[String]
  /** Output partition column, if partitioned. */
  def partitionCol: Option[String] = None

  def preTransform(dfs: Map[String, DataFrame]): Map[String, DataFrame] = dfs
  def transform(dfs: Map[String, DataFrame]): DataFrame
  def postTransform(df: DataFrame): DataFrame = df
}

/** The trusted-load lifecycle around an [[EntityTransformer]] — the
  * composition the reference wires in datatrack_spark_utils.py:118-218 +
  * base_entity_transformer.py (SURVEY §3.3 "honorable mention"):
  * control-table incremental read per input → empty guard → pre →
  * transform → post → dedup by PK → version-guarded MERGE into the
  * target → watermark audit append. Every step is one of the engine's
  * proven verbs; this object is only the composition. */
object TrustedLoad {

  /** Outcome: the advanced control table (returned, not persisted — the
    * caller owns control-table storage), whether the run was skipped by
    * the all-inputs-empty guard, and the post-transform row count. */
  final case class LoadResult(control: DataFrame, skipped: Boolean, rows: Long)

  /** Run one trusted load.
    *
    * @param resolve        input name → DataFrame (catalog lookup, parquet
    *                       read — storage-agnostic like the reference's
    *                       spark.table)
    * @param incrementalCol per-input timestamp column for the watermark
    *                       read; inputs absent from the map are loaded in
    *                       full every run (dimension tables)
    * @param versionCol     ordering column for dedup-by-rank and the
    *                       newer-wins MERGE guard
    */
  def run(
      transformer: EntityTransformer,
      resolve: String => DataFrame,
      control: DataFrame,
      incrementalCol: Map[String, String],
      versionCol: String,
      targetPath: String,
      runAt: java.sql.Timestamp,
      fmt: TableFormat = ParquetTableFormat): LoadResult = {

    val spark = control.sparkSession

    // 1. incremental read per input (I1): strictly-newer rows + the new
    //    watermark scalar (one tiny agg per incremental input)
    val loaded: Seq[(String, DataFrame, Option[java.sql.Timestamp])] =
      transformer.inputs.map { name =>
        val df = resolve(name)
        incrementalCol.get(name) match {
          case Some(tsCol) =>
            val wm = ControlTable.currentWatermark(control, transformer.entityName, name)
            val (fresh, _) = ControlTable.incrementalLoad(df, tsCol, wm)
            val newWm = fresh.agg(max(col(tsCol))).collect()(0) match {
              case r if r.isNullAt(0) => wm // no fresh rows: watermark stands
              case r => Some(r.getTimestamp(0))
            }
            (name, fresh, newWm)
          case None => (name, df, None)
        }
      }

    // 2. P13 empty guard: every INCREMENTAL input empty → nothing to do
    //    (full-load inputs are reference data, they don't trigger a run)
    val incrementalDfs =
      loaded.filter(t => incrementalCol.contains(t._1)).map(_._2)
    if (incrementalDfs.nonEmpty && Lake.allInputsEmpty(incrementalDfs)) {
      return LoadResult(control, skipped = true, rows = 0L)
    }

    // 3. the transformer lifecycle: pre → transform → post
    val dfs = loaded.map { case (n, df, _) => n -> df }.toMap
    val out = transformer.postTransform(
      transformer.transform(transformer.preTransform(dfs)))

    // 4. W1 dedup within the batch, then version-guarded MERGE upsert.
    //    Materialized once: the row count and the merge both consume the
    //    deduped frame — without the checkpoint the dedup would compute
    //    twice (count job + merge input).
    val deduped = Lake.dedupByKeys(out, transformer.primaryKey, Some(versionCol))
      .localCheckpoint()
    val rows = deduped.count()
    fmt.merge(spark, targetPath, deduped, transformer.primaryKey, versionCol,
      transformer.partitionCol.toSeq)

    // 5. audit append per incremental input that advanced
    val nextControl = loaded.foldLeft(control) {
      case (ctl, (name, _, Some(newWm))) =>
        ControlTable.recordLoad(ctl, transformer.entityName, name, newWm, runAt)
      case (ctl, _) => ctl
    }
    LoadResult(nextControl, skipped = false, rows = rows)
  }
}
