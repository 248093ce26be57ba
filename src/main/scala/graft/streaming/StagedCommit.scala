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
    * (the caller's tripwire — e.g. a layout re-list). `targetCommitted`
    * overrides "is the target already committed?" when the marker name
    * is not 1:1 with the target dir (an ANN base `base_v<N>` can commit
    * under ANY `_COMMIT_base_v<N>_f<M>` marker — checking only OUR
    * marker would let a same-version different-fold racer delete the
    * winner's committed dir as an "orphan"). Returns true iff THIS call
    * committed the marker. */
  def commit(write: String => Unit, fs: FileSystem, conf: Configuration,
      targetPrefix: String, suffixes: Seq[String], marker: Path,
      beforeClaim: () => Unit = () => (),
      abortIf: () => Boolean = () => false,
      targetCommitted: Option[() => Boolean] = None): Boolean = {
    require(suffixes.nonEmpty, "at least one directory suffix")
    val committedCheck = targetCommitted.getOrElse(() => fs.exists(marker))
    val t = new Path(targetPrefix)
    val stagePrefix = new Path(t.getParent,
      s".${t.getName}_stage_${java.util.UUID.randomUUID().toString.take(8)}")
      .toString
    write(stagePrefix)
    beforeClaim()
    def abort(): Boolean = {
      suffixes.foreach(sx => fs.delete(new Path(stagePrefix + sx), true))
      false
    }
    if (abortIf() || committedCheck()) return abort()
    val fc = FileContext.getFileContext(t.toUri, conf)
    val claimed = scala.collection.mutable.ListBuffer[Path]()
    suffixes.foreach { sx =>
      val target = new Path(targetPrefix + sx)
      if (fs.exists(target)) {
        // re-check right before the destructive clear: only a
        // marker-less orphan of a crashed writer (invisible to readers)
        // may be deleted — a racer may have committed since our check
        if (committedCheck()) return abort()
        fs.delete(target, true)
      }
      try {
        fc.rename(fs.makeQualified(new Path(stagePrefix + sx)),
          fs.makeQualified(target))
        claimed += target
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException |
             _: java.io.IOException =>
          // lost the claim race — roll back our still-unmarked claims
          claimed.foreach(fs.delete(_, true))
          return abort()
      }
    }
    fs.create(marker, true).close()
    true
  }
}
