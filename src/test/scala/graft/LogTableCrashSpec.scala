package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.lake.LogTable

/** kill -9 soak for the log-structured table format: a real writer JVM
  * is SIGKILLed mid-append / mid-COW-rewrite / mid-log-commit across
  * multiple waves, and after every kill the surviving table must equal
  * the DECLARATIVE replay of its own committed log — appends exactly
  * once, merges newer-wins, deletes total, nothing partial, nothing
  * silently dropped. A fresh JVM resumes from the log alone (the
  * killed worker's memory is gone), and vacuum reclaims whatever the
  * kill orphaned without touching a single live row. Runs on the local
  * rename-claim path and again on the simulated object store
  * (conditional-put entries, non-atomic copy renames). */
class LogTableCrashSpec extends AnyFunSuite {

  private def forkWorker(local: String, tag: String,
      args: Seq[String]): Process = {
    val javaBin = s"${sys.props("java.home")}/bin/java"
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx3g", "-Dspark.ui.enabled=false",
      s"-Dderby.system.home=$local/derby_$tag",
      "-cp", sys.props("java.class.path"),
      "graft.tools.LogTableCrashWorker") ++ args)
    new ProcessBuilder(cmd: _*)
      .redirectOutput(new java.io.File(local, s"worker_$tag.out"))
      .redirectError(new java.io.File(local, s"worker_$tag.err"))
      .start()
  }

  private def outLines(local: String, tag: String): Seq[String] = {
    val f = java.nio.file.Paths.get(local, s"worker_$tag.out")
    if (!java.nio.file.Files.exists(f)) Seq.empty
    else scala.jdk.CollectionConverters
      .ListHasAsScala(java.nio.file.Files.readAllLines(f)).asScala.toSeq
  }

  /** The declarative state after the log committed versions 0..V: batch
    * a exists unless deleted at a+4 (batches ≡1 mod 8), carries the
    * +1000 correction when its merge (a+3, batches ≡0 mod 4) landed.
    * This is the worker's op rule replayed arithmetically — no Spark,
    * no log reads, so it can disagree with a corrupted table. */
  private def expectedRows(v: Long): Set[(Long, Long, Double, String)] =
    (0L to v).iterator.flatMap { a =>
      if (a % 4 == 3 || a % 8 == 5) Iterator.empty // op versions, not batches
      else if (a % 8 == 1 && a + 4 <= v) Iterator.empty // deleted at a+4
      else {
        val bump = if (a % 4 == 0 && a + 3 <= v) 1000.0 else 0.0
        (0 until 100).iterator.map(i =>
          (a * 1000 + i, a, (a + i).toDouble + bump, s"b$a"))
      }
    }.toSet

  private def tableRows(path: String): Set[(Long, Long, Double, String)] =
    LogTable.read(TestSpark.spark, path)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getString(3))).toSet

  private def soak(path: String, local: String, waves: Int,
      extraArgs: Seq[String], minVersions: Int): Unit = {
    var lastV = -1L
    (0 until waves).foreach { wave =>
      val tag = s"w$wave"
      val proc = forkWorker(local, tag, Seq("ops", path) ++ extraArgs)
      // enough ops that the kill lands inside append/COW/commit machinery
      val want = 6
      val deadline = System.currentTimeMillis() + 180000
      while (outLines(local, tag).count(_.startsWith("[worker] done v")) < want) {
        if (System.currentTimeMillis() > deadline) {
          proc.destroyForcibly(); proc.waitFor()
          fail(s"wave $wave: worker never reached $want ops\n" +
            outLines(local, tag).takeRight(10).mkString("\n"))
        }
        Thread.sleep(50)
      }
      proc.destroyForcibly()
      proc.waitFor()
      assert(proc.exitValue() === 137, "destroyForcibly must be SIGKILL")
      // the log is the commit truth: it must be gapless from 0, strictly
      // grown since last wave, and the table must equal the declarative
      // replay of exactly the committed prefix — a killed in-flight op
      // is either fully in (committed before the kill) or fully absent
      val v = LogTable.currentVersion(path)
        .getOrElse(fail(s"wave $wave: no committed version at all"))
      assert(v > lastV, s"wave $wave: log did not grow ($lastV -> $v)")
      lastV = v
      // acked ops must all be committed (the ack prints AFTER the verb
      // returns, which is after the log entry landed)
      val acked = outLines(local, tag).collect {
        case l if l.startsWith("[worker] done v") =>
          l.stripPrefix("[worker] done v").trim.toLong
      }
      assert(acked.forall(_ <= v),
        s"wave $wave: acked op beyond the committed log (${acked.max} > $v)")
      assert(tableRows(path) === expectedRows(v),
        s"wave $wave: table at v$v diverges from the declarative replay")
      // historical snapshots stay exact too (spot: the previous version)
      if (v >= 1) {
        val prev = LogTable.readVersion(TestSpark.spark, path, v - 1)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
            r.getString(3))).toSet
        assert(prev === expectedRows(v - 1),
          s"wave $wave: time travel to v${v - 1} diverges")
      }
    }
    // final audit: vacuum with zero grace reclaims every kill's orphaned
    // data files (no writer is live now) and the live fold is untouched
    val v = LogTable.currentVersion(path).get
    LogTable.vacuum(path, retainLast = 2, orphanGraceMs = 0L)
    assert(tableRows(path) === expectedRows(v), "vacuum changed the fold")
    intercept[IllegalArgumentException] {
      LogTable.readVersion(TestSpark.spark, path, 0L)
    } // pre-horizon time travel is loud, never silently wrong
    assert(v >= minVersions, s"soak should drive a dense history, got $v")
  }

  test("two live writer JVMs race one table; one is kill -9'd and its restart replays through the txn ledger — every batch lands exactly once") {
    val local = java.nio.file.Files
      .createTempDirectory("graft-lograce-").toString
    val path = s"$local/table"
    val n = 10
    val pa = forkWorker(local, "A", Seq("race", path, "A", n.toString))
    val pb = forkWorker(local, "B", Seq("race", path, "B", n.toString))
    // tear worker A out mid-race once it has landed a few batches
    val deadline = System.currentTimeMillis() + 180000
    while (outLines(local, "A").count(_.startsWith("[worker] raced")) < 3) {
      if (System.currentTimeMillis() > deadline) {
        pa.destroyForcibly(); pb.destroyForcibly()
        fail("worker A never landed 3 batches\n" +
          outLines(local, "A").takeRight(5).mkString("\n"))
      }
      Thread.sleep(50)
    }
    pa.destroyForcibly(); pa.waitFor()
    assert(pa.exitValue() === 137)
    // restart A from scratch: it re-runs batch 0..n-1; the ledger must
    // no-op everything its first life committed
    val pa2 = forkWorker(local, "A2", Seq("race", path, "A", n.toString))
    assert(pa2.waitFor(180, java.util.concurrent.TimeUnit.SECONDS)
      && pa2.exitValue() === 0,
      "restarted racer A failed:\n" + outLines(local, "A2").takeRight(5).mkString("\n"))
    assert(pb.waitFor(180, java.util.concurrent.TimeUnit.SECONDS)
      && pb.exitValue() === 0,
      "racer B failed:\n" + outLines(local, "B").takeRight(5).mkString("\n"))
    // exactly-once under cross-process races + kill + replay:
    val rows = LogTable.read(TestSpark.spark, path)
      .collect().map(r => (r.getString(3), r.getLong(1), r.getLong(0)))
    assert(rows.length === 2 * n * 100, s"got ${rows.length} rows")
    val perBatch = rows.groupBy(r => (r._1, r._2)).view.mapValues(_.length)
    assert(perBatch.size === 2 * n)
    assert(perBatch.values.forall(_ === 100),
      "some (worker, batch) landed a partial or duplicate append")
    // the ledger records both writers complete; the log has exactly one
    // version per landed append (kills and replays added none)
    val snap = LogTable.snapshot(path)
    assert(snap.txns === Map("racer-A" -> (n - 1).toLong,
      "racer-B" -> (n - 1).toLong))
    assert(snap.version === (2 * n - 1).toLong,
      s"log has ${snap.version + 1} versions for ${2 * n} appends")
  }

  test("kill -9 the log-table writer across three waves: committed log replays exactly, fresh JVMs resume from the log, vacuum reclaims the litter") {
    val local = java.nio.file.Files
      .createTempDirectory("graft-logcrash-").toString
    soak(s"$local/table", local, waves = 3, extraArgs = Nil,
      minVersions = 12)
  }

  test("same soak on the simulated object store (conditional-put log commits)") {
    val local = java.nio.file.Files
      .createTempDirectory("graft-logcrash-s3a-").toString
    // the parent session also needs the scheme for its own assertions
    TestSpark.spark.sparkContext.hadoopConfiguration
      .set("fs.s3a.impl", classOf[GraftS3aSimFs].getName)
    soak(s"s3a://graft-sim$local/table", local, waves = 2,
      extraArgs = Seq("s3a", classOf[GraftS3aSimFs].getName),
      minVersions = 8)
  }
}
