package graft.tools

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.StagedCommit

/** Micro-bench isolating the per-commit cost of the StagedCommit
  * protocol (stage-write → claim-by-rename → marker → post-commit
  * verify) against the legacy in-place shape (write target directly →
  * marker) it replaced in round 13 — the number that says whether the
  * staged-commit lifecycles' bench times carry protocol overhead or
  * noise. Same payload both ways: a small parquet write of the shape a
  * release-delta/postings version commit actually lands (the dominant
  * cost is the Spark write job in BOTH shapes; the protocol adds one
  * directory rename plus three existence probes on the driver).
  *
  * `runMain graft.tools.StagedCommitBench [nCommits] [rowsPerCommit]` */
object StagedCommitBench {
  def main(args: Array[String]): Unit = {
    val nCommits = if (args.nonEmpty) args(0).toInt else 40
    val rows = if (args.length > 1) args(1).toInt else 5000
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-stagedcommit-bench")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = java.nio.file.Files
      .createTempDirectory("graft-scbench-").toString
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(base).getFileSystem(conf)
    val payload = spark.range(rows.toLong)
      .select(col("id"), md5(col("id").cast("string")).as("tok"),
        (col("id") % 97).as("cnt"))
      .localCheckpoint() // freeze lineage: each commit pays only the write

    def timeAll(one: Int => Unit): Seq[Double] = {
      // warm the code path once before timing
      one(-1)
      (0 until nCommits).map { i =>
        val t0 = System.nanoTime()
        one(i)
        (System.nanoTime() - t0) / 1e6
      }
    }
    // legacy shape: write the target in place, then create the marker
    val legacy = timeAll { i =>
      payload.write.mode("overwrite").parquet(s"$base/legacy_v$i")
      fs.create(new Path(base, s"_LEGACY_$i"), true).close()
    }
    // staged shape: the real primitive, verify and all
    val staged = timeAll { i =>
      StagedCommit.commit(p => payload.write.parquet(p), fs, conf,
        s"$base/staged_v$i", new Path(base, s"_STAGED_$i"))
      ()
    }
    // conditional-put shape (round 15): claim file + nonce ownership +
    // data move + release, strategy pinned so it runs on the local FS —
    // measures the PROTOCOL's extra probes/creates (a real object
    // store's latencies ride on top of whatever the store charges)
    val condPut = timeAll { i =>
      StagedCommit.commitOutcomeWith(StagedCommit.ClaimStrategy.ConditionalPut,
        p => payload.write.parquet(p), fs, conf,
        s"$base/condput_v$i", new Path(base, s"_CONDPUT_$i"))
      ()
    }
    def stats(xs: Seq[Double]): (Double, Double, Double) = {
      val s = xs.sorted
      (s(s.size / 2), s.head, s(s.size * 9 / 10))
    }
    val (lm, lmin, lp90) = stats(legacy)
    val (sm, smin, sp90) = stats(staged)
    val (cm, cmin, cp90) = stats(condPut)
    def r(v: Double) = math.round(v * 10) / 10.0
    println(s"""{"metric":"staged_commit_overhead","n_commits":$nCommits,"rows_per_commit":$rows,""" +
      s""""legacy_ms":{"median":${r(lm)},"min":${r(lmin)},"p90":${r(lp90)}},""" +
      s""""staged_ms":{"median":${r(sm)},"min":${r(smin)},"p90":${r(sp90)}},""" +
      s""""condput_ms":{"median":${r(cm)},"min":${r(cmin)},"p90":${r(cp90)}},""" +
      s""""overhead_ms_median":${r(sm - lm)},"overhead_ratio_median":${r(sm / lm * 100) / 100},""" +
      s""""condput_overhead_ms_median":${r(cm - lm)},"condput_overhead_ratio_median":${r(cm / lm * 100) / 100}}""")
    spark.stop()
  }
}
