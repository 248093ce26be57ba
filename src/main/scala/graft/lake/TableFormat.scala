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
  /** Maintenance: rewrite small files toward `targetMb` data files
    * (the reference's rewrite_data_files analogue). */
  def compact(spark: SparkSession, path: String, partitionCols: Seq[String],
      targetMb: Int = 256): Unit
  /** Maintenance: drop all but the newest `retainLast` table snapshots
    * (expire_snapshots(retain_last=…), datatrack_spark_utils.py:756-768). */
  def expireSnapshots(path: String, retainLast: Int): Unit
}

/** Parquet-directory implementation. Rewrites go through a temp directory
  * plus atomic-ish rename so a crashed rewrite never truncates the table.
  *
  * All filesystem access goes through the Hadoop `FileSystem` API resolved
  * from the table path, so the lake verbs work unchanged against any
  * configured `fs.*` scheme (local, HDFS, s3a object stores — the
  * reference lands everything in MinIO over S3A, etls_raw/main.py:153-248),
  * not just `java.io.File` paths. Note the usual object-store caveat:
  * S3A "rename" is copy+delete, so snapshot archival costs a copy there —
  * the same trade every rename-based committer makes. */
object ParquetTableFormat extends TableFormat {

  import org.apache.hadoop.fs.{FileSystem, Path => HPath}

  /** Snapshots retained automatically after each rewrite; older ones are
    * reclaimed inline so long-running merge/delete loops can't grow the
    * table's footprint without bound. Call [[expireSnapshots]] with a
    * larger value only to trim further. */
  val autoRetainSnapshots = 2

  private def fsOf(path: String): (FileSystem, HPath) = {
    val p = new HPath(path)
    val conf = SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    (p.getFileSystem(conf), p)
  }

  override def exists(spark: SparkSession, path: String): Boolean = {
    val (fs, p) = fsOf(path)
    fs.exists(p)
  }

  override def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** The reference's file-layout posture for lake tables: zstd
    * compression and a bounded record count per data file
    * (spark-defaults-production.conf:60-61 zstd;
    * datatrack_spark_utils.py:402-413 256 MB targets / ≤1M rows per
    * file). Applied per-write so engine defaults stay untouched. */
  private def layoutWriter(df: DataFrame) =
    df.write
      .option("compression", "zstd")
      .option("maxRecordsPerFile", 1000000L)

  override def createOrAppend(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit = {
    val w = layoutWriter(df).mode(SaveMode.Append)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(path)
  }

  private val SnapshotSuffix = ".__snapshot_"

  /** Snapshot directories for `path`, oldest → newest. */
  def listSnapshots(path: String): Seq[HPath] = {
    val (fs, p) = fsOf(path)
    val parent = Option(p.getParent).getOrElse(new HPath("."))
    val prefix = p.getName + SnapshotSuffix
    if (!fs.exists(parent)) Seq.empty
    else fs.listStatus(parent).toIndexedSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(prefix))
      .map(_.getPath)
      .sortBy(_.getName)
  }

  /** Every rewrite archives the replaced table dir as the next numbered
    * snapshot (a rename, so it costs nothing on a rename-capable FS) —
    * the parquet analogue of a format snapshot: time-travel reads stay
    * possible until expiry reclaims the space, and a crashed rewrite
    * never truncates the live table. Snapshots beyond
    * [[autoRetainSnapshots]] are expired inline. */
  private def rewrite(spark: SparkSession, path: String, next: DataFrame,
      partitionCols: Seq[String]): Unit = {
    val tmp = path + ".__rewrite_tmp"
    val w = layoutWriter(next).mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(tmp)
    val (fs, dir) = fsOf(path)
    val nextIdx = listSnapshots(path).lastOption
      .map(_.getName.split(SnapshotSuffix.replace(".", "\\.")).last.toInt + 1)
      .getOrElse(0)
    val snap = new HPath(f"$path$SnapshotSuffix$nextIdx%05d")
    if (fs.exists(dir) && !fs.rename(dir, snap))
      throw new java.io.IOException(s"rewrite: cannot move $path aside")
    if (!fs.rename(new HPath(tmp), dir))
      throw new java.io.IOException(s"rewrite: cannot promote $tmp")
    expireSnapshots(path, autoRetainSnapshots)
  }

  override def expireSnapshots(path: String, retainLast: Int): Unit = {
    require(retainLast >= 0)
    val (fs, _) = fsOf(path)
    listSnapshots(path).dropRight(retainLast)
      .foreach(p => fs.delete(p, true))
  }

  /** Time-travel read — the Iceberg `VERSION AS OF` analogue over the
    * archived snapshot chain: `stepsBack = 1` is the table as it was
    * before the most recent rewrite (merge/delete/compact), 2 the state
    * before that, and so on. Fails loudly past the retention horizon
    * rather than silently serving the live table — a time-travel read
    * that falls back to "now" corrupts whatever audit asked for it. */
  def readSnapshot(spark: SparkSession, path: String,
      stepsBack: Int): DataFrame = {
    require(stepsBack >= 1, "stepsBack must be >= 1 (0 is the live table)")
    val snaps = listSnapshots(path)
    if (snaps.size < stepsBack)
      throw new IllegalArgumentException(
        s"readSnapshot: only ${snaps.size} snapshots retained at $path, " +
          s"cannot travel $stepsBack back — raise autoRetainSnapshots")
    spark.read.parquet(snaps(snaps.size - stepsBack).toString)
  }

  /** Small-file compaction: one rewrite that co-locates each partition's
    * rows into one writer task (unpartitioned tables use the optimizer's
    * size estimate for a ~targetMb shard count). At cluster scale the
    * per-partition file count generalizes to `repartition(n, cols :+
    * salt)`; the verb and the snapshot/expire lifecycle are the point. */
  override def compact(spark: SparkSession, path: String,
      partitionCols: Seq[String], targetMb: Int = 256): Unit = {
    val current = read(spark, path)
    val compacted =
      if (partitionCols.nonEmpty)
        current.repartition(partitionCols.map(col): _*)
      else
        graft.sources.Sources.sizeBasedRepartition(current, targetMb)
    rewrite(spark, path, compacted.localCheckpoint(), partitionCols)
  }

  /** S12 — external-table DDL over an existing parquet directory + MSCK
    * partition recovery (datatrack_spark_utils.py:627-680): the files are
    * the table; the catalog entry just points at them. Uses native
    * `USING PARQUET` DDL (the `STORED AS` Hive form needs Hive support). */
  def createExternalTable(spark: SparkSession, table: String, path: String): DataFrame = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"CREATE TABLE $table USING PARQUET LOCATION '$path'")
    // MSCK only applies to partitioned tables (unpartitioned ones reject it)
    if (spark.catalog.listColumns(table).filter(_.isPartition).count() > 0)
      spark.sql(s"MSCK REPAIR TABLE $table")
    spark.table(table)
  }

  /** Re-sync the catalog after files landed behind its back — the
    * MSCK REPAIR step of the reference's DDL path. */
  def repairTable(spark: SparkSession, table: String): Unit = {
    spark.sql(s"MSCK REPAIR TABLE $table")
    spark.catalog.refreshTable(table)
  }

  /** Destination-side schema evolution (the ALTER half of the
    * reference's evoluir_schema, datatrack_spark_utils.py:221-302 —
    * `Lake.conformToSchema` is the source half): ADD COLUMNS for every
    * source field the catalog table lacks. Returns the added names.
    * Type changes are rejected loudly — silent coercion corrupts lakes. */
  def evolveTable(spark: SparkSession, table: String,
      source: org.apache.spark.sql.types.StructType): Seq[String] = {
    val existing = spark.table(table).schema
    val byName = existing.fields.map(f => f.name -> f.dataType).toMap
    source.fields.foreach { f =>
      byName.get(f.name).foreach { t =>
        require(t == f.dataType,
          s"evolveTable: column ${f.name} is $t in $table but ${f.dataType} in source")
      }
    }
    val missing = source.fields.filter(f => !byName.contains(f.name))
    if (missing.nonEmpty) {
      val cols = missing.map(f => s"${f.name} ${f.dataType.sql}").mkString(", ")
      spark.sql(s"ALTER TABLE $table ADD COLUMNS ($cols)")
      spark.catalog.refreshTable(table)
    }
    missing.map(_.name).toIndexedSeq
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
