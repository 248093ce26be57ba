package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.IvfIndex
import graft.plans.NearestCentroidExpr

/** Streaming maintenance of the IVF ANN index — FAISS's
  * train-once/add-many contract run forever over an embedding stream
  * (the s22 lifecycle's streaming face, the way
  * [[DocIndexStreaming.spanIndexStream]] is d71's): a base build trains
  * the quantizer and writes the base inverted lists; each micro-batch
  * is assigned with the FROZEN quantizer and lands as its OWN
  * per-batch list layout (`b<batchId>/centroid_id=…`), committed by
  * creating an atomic `_COMMIT_batch_<batchId>` marker file.
  *
  * Why per-batch directories instead of the batch path's in-place
  * `mode(append)` ([[IvfIndex.append]]): an in-place append cannot be
  * made exactly-once under foreachBatch redelivery — a replay after a
  * crash between the append and the engine checkpoint would
  * double-insert rows, and partially-written files become visible to
  * readers immediately. Per-batch dirs restore both properties: the
  * marker is the atomic commit point (an uncommitted dir is never
  * unioned and a replay overwrites it byte-for-byte), and a replayed
  * batch sees its own marker and no-ops. Probes union the base and
  * every COMMITTED batch dir; each root is centroid_id-partitioned and
  * the `centroid_id IN (probe lists)` filter pushes through the Union
  * into every root's scan, so a probe still reads ~nProbe/k of the
  * data.
  *
  * Root count grows one-per-batch exactly like any log-structured
  * layout; [[compact]] bounds it: fold the current roots into a fresh
  * VERSIONED base (`base_v<m>`, where `m` = first batch id NOT folded),
  * RE-TRAINING the quantizer on the grown corpus — the moment a
  * production pipeline re-trains anyway, because a quantizer fitted on
  * the original archive drifts as the corpus distribution moves. The
  * base marker is the same atomic cutover (readers resolve the max
  * committed base, then union batches ≥ its fold point), and an
  * `exclude` set turns the fold into the ANN takedown path — the only
  * way to DELETE from inverted lists without transactional rewrites. */
object AnnIndexStreaming {

  private def fs(s: SparkSession, p: String) =
    new Path(p).getFileSystem(s.sparkContext.hadoopConfiguration)

  private def listMarkers(s: SparkSession, indexPath: String,
      prefix: String): Seq[Long] = {
    val f = fs(s, indexPath)
    val dir = new Path(indexPath)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(_.startsWith(prefix))
      .map(_.stripPrefix(prefix).toLong).sorted
  }

  /** The committed base version — the fold point `m`: batches with
    * id < m are inside this base; batches ≥ m ride alongside it. */
  def baseVersion(s: SparkSession, indexPath: String): Long =
    listMarkers(s, indexPath, "_COMMIT_base_v").lastOption.getOrElse(
      throw new IllegalStateException(
        s"no committed base under $indexPath — call init() first"))

  def basePath(indexPath: String, version: Long): String =
    s"$indexPath/base_v$version"

  /** The current base's lists dir (its `.centroids` sibling holds the
    * model every admission assigns with). */
  def currentBasePath(s: SparkSession, indexPath: String): String =
    basePath(indexPath, baseVersion(s, indexPath))

  /** Train the quantizer on the archive corpus and commit base v0. */
  def init(archive: DataFrame, vecCol: String, k: Int, iters: Int,
      indexPath: String): Unit = {
    val s = archive.sparkSession
    IvfIndex.build(archive, vecCol, k, iters, basePath(indexPath, 0L))
    fs(s, indexPath).create(new Path(indexPath, "_COMMIT_base_v0"), true)
      .close()
  }

  /** Ids of batches whose commit marker exists AND that are not yet
    * folded into the committed base, ascending. */
  def committedBatches(s: SparkSession, indexPath: String): Seq[Long] = {
    val fold = baseVersion(s, indexPath)
    listMarkers(s, indexPath, "_COMMIT_batch_").filter(_ >= fold)
  }

  /** One admission: assign the batch with the frozen CURRENT-base
    * quantizer, write its lists to `b<batchId>`, commit the marker.
    * Idempotent per batchId (see class doc). Public so the spec can
    * drive and replay it without a streaming engine. */
  def admitBatch(batch: DataFrame, batchId: Long, vecCol: String,
      indexPath: String): Unit = {
    if (batch.isEmpty) return
    val s = batch.sparkSession
    val f = fs(s, indexPath)
    if (f.exists(new Path(indexPath, s"_COMMIT_batch_$batchId"))) return // replay
    val cs = IvfIndex.loadCentroids(s, currentBasePath(s, indexPath))
    batch
      .withColumn("centroid_id",
        NearestCentroidExpr.nearestCentroid(col(vecCol), cs))
      .repartition(col("centroid_id"))
      .write.mode("overwrite").partitionBy("centroid_id")
      .parquet(s"$indexPath/b$batchId")
    f.create(new Path(indexPath, s"_COMMIT_batch_$batchId"), true).close()
  }

  /** The grown index: committed base ∪ its unfolded committed batches.
    * Each root is read separately (its own partition discovery) and
    * unioned, so a centroid_id filter prunes inside every root. */
  def currentLists(s: SparkSession, indexPath: String): DataFrame =
    (currentBasePath(s, indexPath) +: committedBatches(s, indexPath)
        .map(id => s"$indexPath/b$id"))
      .map(r => s.read.parquet(r))
      .reduce(_.unionByName(_))

  /** Fold base + committed batches into a fresh base, RE-TRAINING the
    * quantizer on the grown corpus (k may change — the occupancy knob
    * stays ∝ √N as the corpus grows). The new base's version is one
    * past the max folded batch id, so post-compaction admissions keep
    * arriving under monotone ids and the reader rule (`batch id ≥ fold
    * point`) stays a pure function of the marker set. Commit is the
    * same single-file-create cutover as admission: a crash mid-build
    * leaves the old base authoritative and a re-run overwrites the
    * half-written dir. `exclude` drops vectors during the fold — the
    * takedown/GDPR path for a layout whose per-list files are
    * immutable. Old roots are retained for time-travel/GC, invisible
    * to readers. */
  def compact(s: SparkSession, indexPath: String, vecCol: String,
      k: Int, iters: Int, exclude: Set[Long] = Set.empty): Unit = {
    val folded = committedBatches(s, indexPath)
    val newVersion = (folded :+ baseVersion(s, indexPath)).max + 1
    val corpus = currentLists(s, indexPath).drop("centroid_id")
    val kept =
      if (exclude.isEmpty) corpus
      else corpus.filter(!col("vec_id").isin(exclude.toSeq: _*))
    IvfIndex.build(kept, vecCol, k, iters, basePath(indexPath, newVersion))
    fs(s, indexPath)
      .create(new Path(indexPath, s"_COMMIT_base_v$newVersion"), true)
      .close()
  }

  /** Top-k cosine probe over the grown index — [[IvfIndex.probe]]'s
    * contract over the log-structured layout. */
  def probe(s: SparkSession, indexPath: String, queryVec: Array[Float],
      k: Int, nProbe: Int, excludeVecId: Option[Long] = None): DataFrame =
    IvfIndex.probeLists(currentLists(s, indexPath),
      IvfIndex.loadCentroids(s, currentBasePath(s, indexPath)),
      queryVec, k, nProbe, excludeVecId)

  /** The streaming writer: an embedding stream (vec_id, label, `vecCol`)
    * admitted into the index per micro-batch. Callers own trigger/start;
    * [[init]] must have built the base index first. */
  def annIndexStream(embeddings: DataFrame, indexPath: String,
      checkpointDir: String, vecCol: String = "embedding")
      : org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    embeddings.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        admitBatch(batch, batchId, vecCol, indexPath)
      }
}
