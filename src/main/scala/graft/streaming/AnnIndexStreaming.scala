package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.IvfIndex
import graft.plans.NearestCentroidExpr

/** Streaming maintenance of the IVF ANN index — FAISS's
  * train-once/add-many contract run forever over an embedding stream
  * (the s22 lifecycle's streaming face, the way
  * [[DocIndexStreaming.spanIndexStream]] is d71's): the archive build
  * trains the quantizer and writes the base inverted lists; each
  * micro-batch is assigned with the FROZEN quantizer and lands as its
  * OWN per-batch list layout (`b<batchId>/centroid_id=…`), committed by
  * creating an atomic `_COMMIT_b<batchId>` marker file.
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
  * data. Root count grows one-per-batch exactly like any
  * log-structured layout; periodic compaction — fold the committed
  * dirs into a fresh base via [[IvfIndex.build]] — bounds it, and is
  * the moment a production pipeline would also RE-TRAIN the quantizer
  * on the grown corpus. */
object AnnIndexStreaming {

  private def fs(s: SparkSession, p: String) =
    new Path(p).getFileSystem(s.sparkContext.hadoopConfiguration)

  def basePath(indexPath: String): String = s"$indexPath/base"

  /** Train the quantizer on the archive corpus and write the base
    * inverted lists + the k×d model. */
  def init(archive: DataFrame, vecCol: String, k: Int, iters: Int,
      indexPath: String): Unit =
    IvfIndex.build(archive, vecCol, k, iters, basePath(indexPath))

  /** Ids of batches whose commit marker exists, ascending. */
  def committedBatches(s: SparkSession, indexPath: String): Seq[Long] = {
    val f = fs(s, indexPath)
    val dir = new Path(indexPath)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("_COMMIT_b"))
      .map(_.stripPrefix("_COMMIT_b").toLong).sorted
  }

  /** One admission: assign the batch with the frozen stored quantizer,
    * write its lists to `b<batchId>`, commit the marker. Idempotent per
    * batchId (see class doc). Public so the spec can drive and replay
    * it without a streaming engine. */
  def admitBatch(batch: DataFrame, batchId: Long, vecCol: String,
      indexPath: String): Unit = {
    if (batch.isEmpty) return
    val s = batch.sparkSession
    val f = fs(s, indexPath)
    if (f.exists(new Path(indexPath, s"_COMMIT_b$batchId"))) return // replay
    val cs = IvfIndex.loadCentroids(s, basePath(indexPath))
    batch
      .withColumn("centroid_id",
        NearestCentroidExpr.nearestCentroid(col(vecCol), cs))
      .repartition(col("centroid_id"))
      .write.mode("overwrite").partitionBy("centroid_id")
      .parquet(s"$indexPath/b$batchId")
    f.create(new Path(indexPath, s"_COMMIT_b$batchId"), true).close()
  }

  /** The grown index: base lists ∪ every committed batch's lists. Each
    * root is read separately (its own partition discovery) and unioned,
    * so a centroid_id filter prunes inside every root. */
  def currentLists(s: SparkSession, indexPath: String): DataFrame =
    (basePath(indexPath) +: committedBatches(s, indexPath)
        .map(id => s"$indexPath/b$id"))
      .map(r => s.read.parquet(r))
      .reduce(_.unionByName(_))

  /** Top-k cosine probe over the grown index — [[IvfIndex.probe]]'s
    * contract over the log-structured layout. */
  def probe(s: SparkSession, indexPath: String, queryVec: Array[Float],
      k: Int, nProbe: Int, excludeVecId: Option[Long] = None): DataFrame =
    IvfIndex.probeLists(currentLists(s, indexPath),
      IvfIndex.loadCentroids(s, basePath(indexPath)),
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
