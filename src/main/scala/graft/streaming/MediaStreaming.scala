package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.ext.Multimodal

/** Streaming maintenance of the media content-hash set — the m04
  * admit→append lifecycle run forever over a media stream (the
  * multimodal family's streaming twin, completing the symmetry the
  * span/boilerplate/ANN/postings/budget families already have): each
  * micro-batch is judged against the committed hash set
  * ([[Multimodal.mediaIncrementalDedup]] — archive payload bytes are
  * never re-read, only their hashes), its decisions are emitted, and
  * the admitted hashes are set-unioned into a new index version.
  *
  * Exactly-once contract = [[DocIndexStreaming]]'s: versioned index
  * dirs committed by atomic `_COMMIT_v<batchId>` marker creation,
  * replayed batches detect their version and no-op, per-batch decision
  * output overwrites its own `batch=<id>` dir. The hash-set union is
  * idempotent on top of that (re-admitting a hash is a no-op), so this
  * is the most forgiving index in the engine — the machinery still
  * matters because a replayed probe against a grown index would flip
  * `admitted` decisions, not just double-count. */
object MediaStreaming {

  private val hashSchema = StructType(Seq(
    StructField("content_hash", StringType)))

  private def fs(s: SparkSession, p: String) =
    new Path(p).getFileSystem(s.sparkContext.hadoopConfiguration)

  /** The committed hash index (empty relation before any commit). */
  def currentHashIndex(s: SparkSession, indexPath: String): DataFrame =
    DocIndexStreaming.latestVersion(s, indexPath) match {
      case Some(v) => s.read.schema(hashSchema).parquet(s"$indexPath/v$v")
      case None    => graft.LocalTable.of(s, hashSchema, Seq.empty[Row])
    }

  /** One media admission: judge the batch against the committed hash
    * set, emit the per-row decisions (doc_id, content_hash, in_archive,
    * admitted) to `decisionsPath/batch=<id>`, union the ADMITTED hashes
    * into version `v<batchId>`, commit the marker. The new version is
    * built from the decisions' already-computed hashes — payload bytes
    * are hashed exactly once per row, ever. */
  def admitMediaBatch(batch: DataFrame, batchId: Long, indexPath: String,
      decisionsPath: String): Unit = {
    if (batch.isEmpty) return
    val s = batch.sparkSession
    val f = fs(s, indexPath)
    val committed = DocIndexStreaming.latestVersion(s, indexPath)
    if (committed.exists(_ >= batchId)) return // replay of an admitted batch
    val index = currentHashIndex(s, indexPath)
    val outDir = s"$decisionsPath/batch=$batchId"
    Multimodal.mediaIncrementalDedup(batch, index)
      .write.mode("overwrite").parquet(outDir)
    val admittedHashes = s.read.parquet(outDir)
      .filter(col("admitted")).select(col("content_hash"))
    StagedCommit.commit(
      p => index.unionByName(admittedHashes).distinct()
        .write.mode("overwrite").parquet(p),
      f, s.sparkContext.hadoopConfiguration,
      s"$indexPath/v$batchId",
      new Path(indexPath, s"_COMMIT_v$batchId"))
    ()
  }

  /** The streaming writer: wire a media stream (doc_id, media) into
    * per-batch dedup-on-admission. Callers own trigger/start. */
  def mediaDedupStream(media: DataFrame, indexPath: String,
      decisionsPath: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    media.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        admitMediaBatch(batch, batchId, indexPath, decisionsPath)
      }
}
