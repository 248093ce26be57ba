package graft.lake

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Thin table-format seam (SURVEY §7.4 risk 2): the reference's lake verbs
  * — create/append, MERGE, DELETE-by-predicate — behind one trait so an
  * Iceberg/Delta implementation can slot in when those jars exist. The
  * shipped implementation realizes the same semantics over plain
  * partitioned parquet with full-rewrite MERGE/DELETE (correct, if not
  * snapshot-isolated — exactly the trade the reference's own join-based
  * fallback makes).
  */
trait TableFormat {
  def exists(spark: SparkSession, path: String): Boolean
  def read(spark: SparkSession, path: String): DataFrame
  /** First write creates, later writes append (etls_raw/main.py:318-345). */
  def createOrAppend(df: DataFrame, path: String, partitionCols: Seq[String]): Unit
  /** MERGE INTO semantics on a key list with newer-version-wins
    * (datatrack_spark_utils.py:306-362). */
  def merge(spark: SparkSession, path: String, source: DataFrame,
      keys: Seq[String], versionCol: String, partitionCols: Seq[String]): Unit
  /** DELETE FROM path WHERE col = value (forms_main.py:401-419). */
  def deleteWhere(spark: SparkSession, path: String, colName: String,
      value: String, partitionCols: Seq[String]): Unit
}

/** Parquet-directory implementation. Rewrites go through a temp directory
  * plus atomic-ish rename so a crashed rewrite never truncates the table. */
object ParquetTableFormat extends TableFormat {

  override def exists(spark: SparkSession, path: String): Boolean =
    new java.io.File(path).exists()

  override def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  override def createOrAppend(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit = {
    val w = df.write.mode(SaveMode.Append)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(path)
  }

  private def rewrite(spark: SparkSession, path: String, next: DataFrame,
      partitionCols: Seq[String]): Unit = {
    val tmp = path + ".__rewrite_tmp"
    val w = next.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(tmp)
    val dir = new java.io.File(path)
    val bak = new java.io.File(path + ".__rewrite_old")
    if (bak.exists()) scala.reflect.io.Directory(bak.toPath.toFile).deleteRecursively()
    if (dir.exists() && !dir.renameTo(bak))
      throw new java.io.IOException(s"rewrite: cannot move $path aside")
    if (!new java.io.File(tmp).renameTo(dir))
      throw new java.io.IOException(s"rewrite: cannot promote $tmp")
    scala.reflect.io.Directory(bak.toPath.toFile).deleteRecursively()
  }

  override def merge(spark: SparkSession, path: String, source: DataFrame,
      keys: Seq[String], versionCol: String, partitionCols: Seq[String]): Unit = {
    if (!exists(spark, path)) { createOrAppend(source, path, partitionCols); return }
    val target = read(spark, path).select(source.columns.map(col).toIndexedSeq: _*)
    // materialize the merge before the rewrite replaces its own input
    val merged = Lake.mergeUpsert(target, source, keys, versionCol).localCheckpoint()
    rewrite(spark, path, merged, partitionCols)
  }

  override def deleteWhere(spark: SparkSession, path: String, colName: String,
      value: String, partitionCols: Seq[String]): Unit = {
    val remaining = read(spark, path)
      .filter(col(colName) =!= value || col(colName).isNull)
      .localCheckpoint()
    rewrite(spark, path, remaining, partitionCols)
  }
}
