package graft.ext

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
}
