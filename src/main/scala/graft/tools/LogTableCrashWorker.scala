package graft.tools

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

import graft.LocalTable
import graft.lake.LogTable

/** Forkable writer for the LogTable crash soak: an endless, fully
  * DETERMINISTIC op sequence against one log table, so the parent spec
  * can `kill -9` it mid-append / mid-COW-rewrite / mid-commit and then
  * verify the surviving log against a declarative replay. The op for
  * version v is a pure function of v (no state beyond the log itself):
  *
  *   - v % 4 == 3           → MERGE: +1000 payload correction of batch
  *                            v-3 at ver=2 (newer-wins);
  *   - v % 8 == 5           → DELETE: drop batch v-4 by its tag
  *                            (batches ≡1 mod 8 — disjoint from the
  *                            merge targets ≡0 mod 4);
  *   - otherwise            → APPEND: 100 rows tagged batch=v.
  *
  * On (re)start the worker resumes at `currentVersion + 1` — exactly
  * what a replaying job does: the LOG, not the worker's memory, is the
  * source of truth, so a kill between commit and ack re-derives the
  * right next op. A crashed COW attempt's orphan files are invisible by
  * construction and the retry recomputes from the new snapshot.
  *
  * args: <tablePath> [fsScheme fsImplClass] — the optional pair installs
  * a Hadoop filesystem impl (the spec passes its simulated object store)
  * so the same worker soaks both claim strategies. */
object LogTableCrashWorker {

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("batch", LongType),
    StructField("payload", DoubleType), StructField("tag", StringType),
    StructField("ver", LongType)))

  private[graft] def batchRows(a: Long, plusPayload: Double, ver: Long): Seq[Row] =
    (0 until 100).map(i => Row(a * 1000 + i, a,
      (a + i).toDouble + plusPayload, s"b$a", ver))

  def main(args: Array[String]): Unit = {
    val mode = args(0) // ops | race
    val path = args(1)
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-logtable-crash-worker")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    mode match {
      case "ops" =>
        if (args.length >= 4)
          spark.sparkContext.hadoopConfiguration
            .set(s"fs.${args(2)}.impl", args(3))
        opsLoop(spark, path)
      case "race" =>
        race(spark, path, workerId = args(2), nBatches = args(3).toInt)
      case other => sys.error(s"unknown mode $other")
    }
  }

  private def opsLoop(spark: SparkSession, path: String): Unit = {
    var v = if (LogTable.exists(path)) LogTable.currentVersion(path).get + 1
            else 0L
    while (true) {
      println(s"[worker] op v$v"); System.out.flush()
      if (v % 4 == 3)
        LogTable.merge(spark, path,
          LocalTable.of(spark, schema, batchRows(v - 3, 1000.0, 2L)),
          Seq("k"), "ver")
      else if (v % 8 == 5)
        LogTable.deleteWhere(spark, path, "tag", s"b${v - 4}")
      else
        LogTable.append(spark, path,
          LocalTable.of(spark, schema, batchRows(v, 0.0, 1L)))
      println(s"[worker] done v$v"); System.out.flush()
      v += 1
    }
  }

  private[graft] def raceRows(workerId: String, seq: Long): Seq[Row] = {
    val base = (workerId.hashCode.toLong & 0xffff) * 10000000L
    (0 until 100).map(i => Row(base + seq * 1000 + i, seq,
      (seq + i).toDouble, s"r$workerId", 1L))
  }

  /** Two (or more) of these race ONE table concurrently, each appending
    * its own `nBatches` under the txn ledger — a killed-and-restarted
    * racer replays from batch 0 and the ledger no-ops everything that
    * already landed, so the final table must hold each (worker, batch)
    * EXACTLY once no matter how the races and kills interleave. */
  private def race(spark: SparkSession, path: String, workerId: String,
      nBatches: Int): Unit = {
    (0 until nBatches).foreach { seq =>
      println(s"[worker] race $workerId seq $seq"); System.out.flush()
      LogTable.append(spark, path,
        LocalTable.of(spark, schema, raceRows(workerId, seq.toLong)),
        txn = Some((s"racer-$workerId", seq.toLong)))
      println(s"[worker] raced $workerId seq $seq"); System.out.flush()
    }
    println(s"[worker] race done $workerId"); System.out.flush()
    spark.stop()
    sys.exit(0)
  }
}
