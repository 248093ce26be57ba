package graft.streaming

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, Path}

/** The one write-commit primitive every versioned-dir lifecycle here
  * shares: stage → claim-by-rename → marker.
  *
  * The naive shape — `df.write.mode("overwrite").parquet(target)` then
  * create the marker — has a clobber window: mode(overwrite) DELETES
  * the target first, so a second writer racing the same version (two
  * compactors resolving the same fold point, two hand-driven sessions
  * admitting the same batch id) can delete a directory whose marker a
  * reader already resolved, exposing partially-deleted data with no
  * error (explicit schemas make missing files read as silently fewer
  * rows). Staging + no-overwrite rename closes it:
  *
  *   - the write lands in a unique HIDDEN staging dir next to the
  *     target (dot-prefixed: ignored by parquet readers and by every
  *     marker listing here), so nothing committed is ever rewritten in
  *     place;
  *   - a racer that already committed the marker is detected before the
  *     claim and this stage is discarded — a committed directory is
  *     NEVER deleted;
  *   - a marker-less target (left by a writer that crashed before its
  *     marker) is invisible to readers and cleared before the claim;
  *   - the claim is `FileContext.rename` WITHOUT the overwrite flag —
  *     it throws if the destination exists — so when two same-version
  *     writers slip past every check, exactly ONE wins the rename and
  *     the loser aborts cleanly. Multi-dir commits (an IVF base is a
  *     lists dir + a centroids dir) claim in order and roll back
  *     already-claimed, still-marker-less dirs if a later claim loses.
  *
  * Crash contract is unchanged from the marker protocol: the marker is
  * the single atomic commit point; a crash anywhere before it leaves
  * the previous commit authoritative and orphans (staging dirs,
  * claimed-but-unmarked targets) that readers never see. */
private[graft] object StagedCommit {

  /** Stage-and-commit `targetPrefix` (+ each suffix in `suffixes` — use
    * `Seq("")` for a single directory). `write(stagePrefix)` must
    * produce `stagePrefix + sx` for every suffix. `beforeClaim` is a
    * test seam into the stage→claim window; `abortIf` runs after it
    * (the caller's tripwire — e.g. a layout re-list). Returns true iff
    * THIS call committed the marker.
    *
    * Marker ↔ target must be 1:1: the marker name is the committed-check
    * for the target, so a commit whose content varies under one target
    * name must encode the variation IN the name (the ANN base encodes
    * its fold point: `base_v<N>_f<M>`). Multi-dir variation belongs
    * under ONE parent dir (single atomic rename), not in multiple
    * suffixes — a same-name racer re-claiming between two suffix renames
    * could otherwise publish a mix of two builds.
    *
    * Only "destination already exists" counts as a lost race. Any other
    * I/O failure CLEANS UP AND PROPAGATES: swallowing it would return
    * false like a benign no-op, the foreachBatch caller would complete,
    * the engine checkpoint would advance, and the batch's data would be
    * silently absent forever — a real failure must fail the batch so
    * the engine retries it. */
  def commit(write: String => Unit, fs: FileSystem, conf: Configuration,
      targetPrefix: String, suffixes: Seq[String], marker: Path,
      beforeClaim: () => Unit = () => (),
      abortIf: () => Boolean = () => false): Boolean = {
    require(suffixes.nonEmpty, "at least one directory suffix")
    val t = new Path(targetPrefix)
    val stagePrefix = new Path(t.getParent,
      s".${t.getName}_stage_${java.util.UUID.randomUUID().toString.take(8)}")
      .toString
    def dropStages(): Unit =
      suffixes.foreach(sx => fs.delete(new Path(stagePrefix + sx), true))
    def abort(why: String): Boolean = {
      System.err.println(
        s"[graft] StagedCommit($targetPrefix): $why — aborting the commit " +
          "(readers unaffected)")
      dropStages()
      false
    }
    // a failed stage write (or seam) must not leak UUID-named stage dirs
    try { write(stagePrefix); beforeClaim() }
    catch { case e: Throwable => dropStages(); throw e }
    if (abortIf()) return abort("caller tripwire fired")
    if (fs.exists(marker)) return abort("a racer already committed")
    val fc = FileContext.getFileContext(t.toUri, conf)
    val claimed = scala.collection.mutable.ListBuffer[Path]()
    def rollback(): Unit = claimed.foreach(fs.delete(_, true))
    suffixes.foreach { sx =>
      val target = new Path(targetPrefix + sx)
      if (fs.exists(target)) {
        // re-check right before the destructive clear: only a
        // marker-less orphan of a crashed writer (invisible to readers)
        // may be deleted — a racer may have committed since our check,
        // and already-claimed dirs must not stay published half-ours
        if (fs.exists(marker)) { rollback(); return abort("a racer committed mid-claim") }
        fs.delete(target, true)
      }
      try {
        fc.rename(fs.makeQualified(new Path(stagePrefix + sx)),
          fs.makeQualified(target))
        claimed += target
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
          // lost the claim race — roll back our still-unmarked claims
          rollback()
          return abort(s"lost the claim race on $target")
        case e: java.io.IOException =>
          rollback(); dropStages()
          throw e // a real I/O failure, not a race — see the class doc
      }
    }
    fs.create(marker, true).close()
    true
  }
}
