package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The reliable-checkpoint directory is SparkContext-GLOBAL state shared
  * by the Dedup and Graph iterative families — the guard must make
  * repeated same-root configuration a no-op (every `setCheckpointDir`
  * call mints a fresh UUID subdirectory) and make cross-root overrides
  * deliberate, audited events. */
class CheckpointDirSpec extends SparkSpec {

  test("configureCheckpointDir: same root is a no-op (no UUID re-mint); a different root overrides; None leaves state alone") {
    val sc = spark.sparkContext
    val df = spark.range(1).toDF("x")
    val d1 = java.nio.file.Files.createTempDirectory("graft-ckptdir1-").toString
    val d2 = java.nio.file.Files.createTempDirectory("graft-ckptdir2-").toString
    Dedup.configureCheckpointDir(df, Some(d1))
    val first = sc.getCheckpointDir
    assert(first.isDefined)
    assert(new org.apache.hadoop.fs.Path(first.get).getParent.toString
      .endsWith(new java.io.File(d1).getName))
    // same root again: reuse the minted subdir — a per-round re-mint
    // would scatter one iteration per directory (cutLineage docstring)
    Dedup.configureCheckpointDir(df, Some(d1))
    assert(sc.getCheckpointDir === first)
    // no dir requested: leave whatever is configured
    Dedup.configureCheckpointDir(df, None)
    assert(sc.getCheckpointDir === first)
    // different root: the override happens (and is audited to stderr)
    Dedup.configureCheckpointDir(df, Some(d2))
    val second = sc.getCheckpointDir
    assert(second.isDefined)
    assert(second != first)
    assert(new org.apache.hadoop.fs.Path(second.get).getParent.toString
      .endsWith(new java.io.File(d2).getName))
  }

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("checkpoint-root guard: a root change under a LIVE operator lease dies loudly with both roots named; release unblocks it; same-root concurrency untouched") {
    val sc = spark.sparkContext
    val df = spark.range(1).toDF("x")
    val (a, b) = (tmp("graft-roota-"), tmp("graft-rootb-"))
    def qual(d: String) = {
      val p = new org.apache.hadoop.fs.Path(d)
      val fs = p.getFileSystem(sc.hadoopConfiguration)
      p.makeQualified(fs.getUri, fs.getWorkingDirectory).toString
        .stripSuffix("/")
    }
    CheckpointRootGuard.acquire(sc, a, qual(a))
    try {
      // an OPERATOR racing with a different root dies loudly at entry —
      // the verdict-r14 scenario: two concurrent reliable-checkpoint
      // operators, different roots
      val edges = df.select(col("x").as("src"), (col("x") + 1).as("dst"))
        .union(df.select((col("x") + 1).as("src"), col("x").as("dst")))
      val e = intercept[IllegalStateException] {
        Graph.labelPropagation(edges, iters = 1, Some(b))
      }
      assert(e.getMessage.contains("refused") &&
        e.getMessage.contains(qual(b)) && e.getMessage.contains(qual(a)),
        s"the refusal must name both roots, got: ${e.getMessage}")
      // same root: concurrency is allowed (the soak's posture)
      Graph.labelPropagation(edges, iters = 1, Some(a)).collect()
      // a nested same-root lease in that call released cleanly
      assert(CheckpointRootGuard.liveState()._1 === Map(qual(a) -> 1))
    } finally CheckpointRootGuard.release(qual(a))
    // with the lease gone, the root change proceeds (audited)
    Dedup.configureCheckpointDir(df, Some(b))
    assert(spark.sparkContext.getCheckpointDir
      .exists(c => new org.apache.hadoop.fs.Path(c).getParent.toString
        .endsWith(new java.io.File(b).getName)))
  }

  test("checkpoint-root guard: a PENDING lazy reliable cut blocks a root change until it materializes (or is collected); extraction of the cut's RDD works on this Spark") {
    val sc = spark.sparkContext
    val (a, b) = (tmp("graft-rootc-"), tmp("graft-rootd-"))
    val df = spark.range(100).toDF("x")
    Dedup.configureCheckpointDir(df, Some(a))
    val cut = Dedup.cutLineage(df.select(col("x") * 2), Some(a),
      eager = false)
    // the reflection seam must actually find the checkpoint-marked RDD
    // on this Spark version — if this assertion ever fails, the guard
    // has silently degraded to lease-only (fail-open) and the
    // extraction needs updating for the new Dataset.checkpoint shape
    val rdd = CheckpointRootGuard.checkpointRdd(cut)
    assert(rdd.isDefined, "checkpoint-RDD extraction broke on this Spark")
    assert(!rdd.get.isCheckpointed)
    val e = intercept[IllegalStateException] {
      Dedup.configureCheckpointDir(df, Some(b))
    }
    assert(e.getMessage.contains("deferred cut pending"),
      s"the refusal must name the pending cut, got: ${e.getMessage}")
    // materializing the cut clears the guard: the checkpoint landed
    // under the root it was promised
    cut.count()
    assert(rdd.get.isCheckpointed)
    Dedup.configureCheckpointDir(df, Some(b))
    assert(spark.sparkContext.getCheckpointDir
      .exists(c => new org.apache.hadoop.fs.Path(c).getParent.toString
        .endsWith(new java.io.File(b).getName)))
  }
}
