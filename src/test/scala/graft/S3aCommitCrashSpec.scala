package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StagedCommit

/** Forkable committer for the object-store crash soak: loops
  * conditional-put StagedCommits of versioned multi-file artifacts on
  * the simulated s3a store ([[GraftS3aSimFs]] — non-atomic copy rename,
  * atomic create-if-absent) until the parent spec SIGKILLs it. No
  * SparkSession — the claim protocol is pure Hadoop FS, and a bare JVM
  * forks in well under a second, so each kill wave is cheap. On restart
  * it resumes one past the max committed marker, exactly like a
  * replaying engine whose checkpoint advanced. */
object S3aCommitCrashWorker {

  private[graft] def writePayload(fs: org.apache.hadoop.fs.FileSystem,
      dir: String, tag: String): Unit =
    (0 until 4).foreach { d =>
      (0 until 6).foreach { i =>
        val out = fs.create(new Path(s"$dir/part$d/f$i"), true)
        try out.write(tag.getBytes("UTF-8")) finally out.close()
      }
    }

  def main(args: Array[String]): Unit = {
    val base = args(0) // s3a://graft-sim/<local tmp dir>
    val conf = new Configuration()
    conf.set("fs.s3a.impl", classOf[GraftS3aSimFs].getName)
    val fs = new Path(base).getFileSystem(conf)
    val committed = fs.listStatus(new Path(base))
      .map(_.getPath.getName).filter(_.startsWith("_COMMIT_v"))
      .map(_.stripPrefix("_COMMIT_v").toInt)
    var v = if (committed.isEmpty) 0 else committed.max + 1
    while (true) {
      println(s"[worker] committing v$v"); System.out.flush()
      val ok = StagedCommit.commit(
        p => writePayload(fs, p, s"v$v"),
        fs, conf, s"$base/art_v$v", new Path(base, s"_COMMIT_v$v"))
      println(s"[worker] committed v$v ok=$ok"); System.out.flush()
      v += 1
    }
  }
}

/** kill -9 soak for the conditional-put claim: the crash shapes SPECIFIC
  * to the object-store protocol — a killed holder's orphaned claim file,
  * a partial non-atomic copy under a held claim, a claim never released
  * after the marker — produced by tearing a real committer JVM down
  * mid-commit, then recovered by the clean retry a replaying engine
  * would issue. The rename-claim twin of this lives in
  * CrashRestartSoakSpec; this one needs no Spark in the worker. */
class S3aCommitCrashSpec extends AnyFunSuite {

  private def fork(base: String, localBase: String, tag: String): Process = {
    val cmd = Seq(s"${sys.props("java.home")}/bin/java",
      "-Xmx256m", "-cp", sys.props("java.class.path"),
      "graft.S3aCommitCrashWorker", base)
    new ProcessBuilder(cmd: _*)
      .redirectOutput(new java.io.File(localBase, s"worker_$tag.out"))
      .redirectError(new java.io.File(localBase, s"worker_$tag.err"))
      .start()
  }

  private def outLines(localBase: String, tag: String): Seq[String] = {
    val f = java.nio.file.Paths.get(localBase, s"worker_$tag.out")
    if (!java.nio.file.Files.exists(f)) Seq.empty
    else scala.jdk.CollectionConverters
      .ListHasAsScala(java.nio.file.Files.readAllLines(f)).asScala.toSeq
  }

  test("kill -9 a conditional-put committer mid-commit, three waves: every acknowledged commit survives complete, the in-flight version recovers on one clean retry, crash litter (orphan claims, partial copies, stage dirs) never reaches a reader") {
    val local = java.nio.file.Files
      .createTempDirectory("graft-s3acrash-").toString
    val base = s"s3a://graft-sim$local"
    val conf = new Configuration()
    conf.set("fs.s3a.impl", classOf[GraftS3aSimFs].getName)
    val fs = new Path(base).getFileSystem(conf)
    fs.mkdirs(new Path(base))
    def marker(v: Int) = new Path(base, s"_COMMIT_v$v")
    def verifyComplete(v: Int): Unit = {
      (0 until 4).foreach { d =>
        (0 until 6).foreach { i =>
          val p = java.nio.file.Paths.get(local, s"art_v$v", s"part$d", s"f$i")
          assert(java.nio.file.Files.exists(p),
            s"v$v: committed artifact missing $p")
          assert(java.nio.file.Files.readString(p) === s"v$v",
            s"v$v: committed artifact carries a foreign tag")
        }
      }
    }
    var maxRecovered = -1
    (0 until 3).foreach { wave =>
      val tag = s"w$wave"
      val proc = fork(base, local, tag)
      // let it land at least 3 fresh commits this wave, then tear it out
      // mid-loop — commits dominate the wall clock, so the SIGKILL lands
      // inside stage-write/claim/move/marker with high probability
      val want = 4 // fresh commits this wave (each wave has its own log)
      val deadline = System.currentTimeMillis() + 60000
      while (outLines(local, tag).count(_.contains("] committed v")) < want) {
        if (System.currentTimeMillis() > deadline)
          fail(s"wave $wave: worker never reached $want commits\n" +
            outLines(local, tag).takeRight(10).mkString("\n"))
        Thread.sleep(25)
      }
      proc.destroyForcibly()
      proc.waitFor()
      assert(proc.exitValue() === 137, "destroyForcibly must be SIGKILL")
      val lines = outLines(local, tag)
      val acked = lines.collect {
        case l if l.contains("] committed v") =>
          l.split(" v")(1).split(" ")(0).toInt
      }
      val attempted = lines.collect {
        case l if l.contains("] committing v") =>
          l.split(" v")(1).trim.toInt
      }
      assert(acked.nonEmpty && attempted.nonEmpty)
      val maxAttempted = attempted.max
      // 1) every ACKNOWLEDGED commit is durable and complete — the
      // marker is the commit point, so an ack the parent observed must
      // survive any later crash
      acked.foreach { v =>
        assert(fs.exists(marker(v)), s"wave $wave: acked v$v lost its marker")
        verifyComplete(v)
      }
      // 2) the in-flight version either committed (killed between
      // marker and ack) or recovers on ONE clean retry — the engine's
      // redelivery. A retry must also break a killed holder's orphan
      // claim (lease 0) and clear its partial copy. The SIGKILL makes
      // those shapes probabilistic, so ALSO plant the two worst cases
      // deterministically on the version after the last attempt:
      // a held claim + a partial (truncated, foreign-free) copy — the
      // killed-mid-move litter — which the retry below must break,
      // clear and commit over.
      val planted = maxAttempted + 1
      locally {
        val out = fs.create(new Path(base, s".art_v${planted}_claim"), true)
        try out.write("killed-holder".getBytes("UTF-8"))
        finally out.close()
        val part = fs.create(new Path(s"$base/art_v$planted/part0/f0"), true)
        try part.write(s"v$planted".getBytes("UTF-8")) finally part.close()
      }
      (0 to planted).foreach { v =>
        if (!fs.exists(marker(v))) {
          assert(StagedCommit.commit(
            p => S3aCommitCrashWorker.writePayload(fs, p, s"v$v"),
            fs, conf, s"$base/art_v$v", marker(v)),
            s"wave $wave: clean retry of in-flight v$v failed to commit")
        }
        verifyComplete(v)
      }
      // 3) reader-facing litter audit: claim files may linger ONLY as
      // the documented inert shape (killed after the marker, before the
      // release — every read path checks the marker first); stage dirs
      // are dot-hidden by construction and invisible to the marker
      // listing and parquet readers. Plant the inert shape
      // deterministically too (a claim for an already-committed
      // version), so the audit's committed-claim branch is exercised
      // every wave and the next wave's resume must shrug it off.
      locally {
        val out = fs.create(new Path(base, ".art_v0_claim"), true)
        try out.write("unreleased-after-marker".getBytes("UTF-8"))
        finally out.close()
      }
      val names = new java.io.File(local).listFiles().map(_.getName)
      names.filter(_.endsWith("_claim")).foreach { c =>
        val v = c.stripPrefix(".art_v").stripSuffix("_claim").toInt
        assert(fs.exists(marker(v)),
          s"wave $wave: live (non-inert) claim left for uncommitted v$v")
      }
      assert(names.filter(_.contains("_stage_")).forall(_.startsWith(".")),
        "stage litter must stay dot-hidden")
      maxRecovered = planted
    }
    // the full history is dense and committed: versions 0..maxRecovered
    // all present, each complete under its own tag — no silent drops
    // across three kill/recover cycles
    (0 to maxRecovered).foreach { v =>
      assert(fs.exists(marker(v)))
      verifyComplete(v)
    }
    assert(maxRecovered >= 10,
      s"three waves should have driven a dense history, got $maxRecovered")
  }
}
