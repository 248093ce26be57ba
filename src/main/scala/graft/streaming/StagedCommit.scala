package graft.streaming

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, Path}

/** The one write-commit primitive every versioned-dir lifecycle here
  * shares: stage → claim-by-rename → marker.
  *
  * The naive shape — `df.write.mode("overwrite").parquet(target)` then
  * create the marker — has a clobber window: mode(overwrite) DELETES
  * the target first, so a second writer racing the same version (two
  * compactors resolving one fold point, two hand-driven sessions
  * admitting one batch id) can delete a directory whose marker a
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
  *     the loser aborts cleanly.
  *
  * The unit of commitment is ONE directory, deliberately: multi-dir
  * claims cannot be made atomic with renames (interleaved same-name
  * racers could publish a mix of two builds), so an artifact with
  * multiple parts must put them INSIDE one parent dir and commit the
  * parent (the ANN base does exactly this: `base_v<N>_f<M>/ivf` plus
  * `…/ivf.centroids` under one renameable parent). Likewise, marker ↔
  * target must be 1:1: a commit whose content varies under one target
  * name must encode the variation IN the name (the ANN base encodes its
  * fold point).
  *
  * Crash contract is unchanged from the marker protocol: the marker is
  * the single atomic commit point; a crash anywhere before it leaves
  * the previous commit authoritative and orphans (staging dirs,
  * claimed-but-unmarked targets) that readers never see.
  *
  * Residual (documented, bounded): delete-then-rename of a marker-less
  * orphan is not atomic, so TWO LIVE same-name writers (already a
  * violated single-writer contract) can interleave a clear of each
  * other's claimed-but-unmarked dir. The post-commit verification
  * closes the permanent case — a marker whose dir vanished is
  * un-committed and the commit THROWS so the engine retries — leaving
  * only a microsecond transient in which a racing reader fails loudly
  * on a missing dir (never silently partial).
  *
  * FILESYSTEM CONTRACT (enforced, not assumed): the claim's
  * exactly-one-winner guarantee IS `FileContext.rename` without the
  * overwrite flag being atomic — true on local FS and HDFS (and other
  * hierarchical stores: ADLS Gen2 / abfs, Ozone ofs), FALSE on flat
  * object stores, where "rename" is a client-side copy-then-delete with
  * no atomicity and no dst-exists check worth the name (S3A documents
  * this explicitly). On such a store two same-version writers could
  * BOTH "win", interleaving two builds under one committed name — the
  * exact corruption this primitive exists to prevent — so `commit`
  * enforces an ALLOW-LIST of schemes known rename-atomic
  * (file, hdfs/webhdfs/swebhdfs — all the NameNode's atomic rename —
  * viewfs, abfs/abfss, ofs/o3fs) and REFUSES everything else
  * by default: a deny-list of object stores can never be complete
  * (s3/s3a, oss, gs, cosn, obs, oci, … and whatever ships next year),
  * and an unknown scheme silently passing the guard is precisely the
  * silent weakening the guard exists to prevent. Porting to an object
  * store needs a different claim primitive: a conditional put — e.g.
  * `fs.create(claimFile, overwrite = false)` where the store gives
  * create-if-absent atomicity, or the store's native
  * If-None-Match/precondition API — holding the claim in a FILE the
  * winner creates before moving data, with the marker unchanged as the
  * commit point. That path is deliberately not implemented here: this
  * engine's lakes are file-system-backed, and a loud refusal beats a
  * silent maybe. A store that IS rename-atomic but not listed extends
  * `atomicRenameSchemes` — a one-line, reviewed decision. */
private[graft] object StagedCommit {

  /** Why a commit attempt ended — the typed answer to "did my write
    * land, and if not, what actually happened?". Callers that need to
    * react to the CAUSE (retry semantics, operator-facing error text,
    * cleanup of side artifacts written before the commit) must use
    * [[commitOutcome]] and match on this, NOT re-probe shared state
    * after the fact: a post-hoc probe names whatever changed LAST, not
    * what aborted THIS commit (a lost claim plus an unrelated
    * concurrent retrain re-probes as "tripwire", sending the operator
    * hunting a retrain that never aborted anything). */
  private[graft] sealed trait Outcome
  private[graft] object Outcome {
    /** This call created the marker — the version is committed. */
    case object Committed extends Outcome
    /** The caller's `abortIf` tripwire fired in the stage→claim window;
      * the stage was discarded, nothing was claimed. */
    case object Tripped extends Outcome
    /** A racer's marker was observed — the version is already
      * committed (with semantically equivalent content: same version,
      * same committed inputs); this call's build was discarded. */
    case object RacerCommitted extends Outcome
    /** A racer won the claim itself and its marker is still pending:
      * the version is NOT yet committed and not ours to finish. */
    case object LostClaim extends Outcome
  }

  /** Schemes with an atomic no-overwrite directory rename — the only
    * stores the claim is sound on (see the class doc). Scheme-less
    * targets resolve against the FileSystem's own URI (local FS =
    * "file"). Everything not listed is refused by default. */
  private val atomicRenameSchemes: Set[String] =
    Set("file", "hdfs", "webhdfs", "swebhdfs", "viewfs", "abfs", "abfss",
      "ofs", "o3fs")

  /** Fail fast unless `target` (or, as a fallback, the FileSystem
    * itself) lives on a store whose rename can implement the claim.
    * Checked before ANY I/O so a misconfigured deployment dies on its
    * first commit with the contract spelled out, not on a corrupted
    * index months later. */
  private[streaming] def requireAtomicRename(target: String,
      fs: FileSystem): Unit = {
    val scheme = Option(new Path(target).toUri.getScheme)
      .orElse(Option(fs.getUri).flatMap(u => Option(u.getScheme)))
      .map(_.toLowerCase(java.util.Locale.ROOT))
    scheme.filterNot(atomicRenameSchemes).foreach { s =>
      throw new UnsupportedOperationException(
        s"StagedCommit($target): scheme '$s://' is not on the " +
          "rename-atomic allow-list (file/hdfs/webhdfs/swebhdfs/viewfs/" +
          "abfs/abfss/ofs/o3fs). " +
          "Object stores have no atomic no-overwrite rename, so " +
          "the claim cannot guarantee exactly one same-version winner " +
          "— committing there could interleave two builds under one " +
          "committed name. Use a hierarchical filesystem, port the " +
          "claim to the store's conditional-put primitive " +
          "(create-if-absent claim file) per the StagedCommit contract " +
          "doc — or, if this store genuinely has atomic rename, add " +
          "its scheme to StagedCommit.atomicRenameSchemes.")
    }
  }

  /** Stage-and-commit the single directory `target`: `write(stagePath)`
    * populates the staging dir (including any nested layout), the claim
    * renames it onto `target`, and `marker` is created last.
    * `beforeClaim` is a test seam into the stage→claim window; `abortIf`
    * runs after it (the caller's tripwire — e.g. a layout re-list);
    * `afterClaim` is a test seam into the claim→marker window (the
    * racer-clear residual the post-commit verification guards).
    * Returns true iff THIS call committed the marker.
    *
    * Only "destination already exists" counts as a lost race. Any other
    * I/O failure CLEANS UP AND PROPAGATES: swallowing it would return
    * false like a benign no-op, the foreachBatch caller would complete,
    * the engine checkpoint would advance, and the batch's data would be
    * silently absent forever — a real failure must fail the batch so
    * the engine retries it. */
  def commit(write: String => Unit, fs: FileSystem, conf: Configuration,
      target: String, marker: Path,
      beforeClaim: () => Unit = () => (),
      abortIf: () => Boolean = () => false,
      afterClaim: () => Unit = () => ()): Boolean =
    commitOutcome(write, fs, conf, target, marker, beforeClaim, abortIf,
      afterClaim) == Outcome.Committed

  /** [[commit]] with the typed result — see [[Outcome]] for when the
    * distinction matters. Identical protocol; `commit` is the
    * cause-agnostic Boolean view of this. */
  private[graft] def commitOutcome(write: String => Unit, fs: FileSystem,
      conf: Configuration, target: String, marker: Path,
      beforeClaim: () => Unit = () => (),
      abortIf: () => Boolean = () => false,
      afterClaim: () => Unit = () => ()): Outcome = {
    requireAtomicRename(target, fs) // FS contract — see the class doc
    val t = new Path(target)
    val stage = new Path(t.getParent,
      s".${t.getName}_stage_${java.util.UUID.randomUUID().toString.take(8)}")
    def abort(why: String, outcome: Outcome): Outcome = {
      System.err.println(
        s"[graft] StagedCommit($target): $why — aborting the commit " +
          "(readers unaffected)")
      fs.delete(stage, true)
      outcome
    }
    // a failed stage write, seam, or tripwire must not leak UUID-named
    // stage dirs
    val tripped =
      try { write(stage.toString); beforeClaim(); abortIf() }
      catch { case e: Throwable => fs.delete(stage, true); throw e }
    if (tripped) return abort("caller tripwire fired", Outcome.Tripped)
    if (fs.exists(marker))
      return abort("a racer already committed", Outcome.RacerCommitted)
    if (fs.exists(t)) {
      // re-check right before the destructive clear: only a marker-less
      // orphan of a crashed writer (invisible to readers) may be
      // deleted — a racer may have committed since the check above
      if (fs.exists(marker))
        return abort("a racer committed mid-claim", Outcome.RacerCommitted)
      fs.delete(t, true)
    }
    try FileContext.getFileContext(t.toUri, conf)
      .rename(fs.makeQualified(stage), fs.makeQualified(t))
    catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
        return abort("lost the claim race", Outcome.LostClaim)
      case e: java.io.IOException =>
        fs.delete(stage, true)
        throw e // a real I/O failure, not a race — see the method doc
    }
    afterClaim() // test seam: the claim→marker racer-clear window
    // Claim verification: delete-then-rename is not atomic, so a
    // SAME-NAME racer's orphan-clear (its own line above) can delete OUR
    // just-claimed dir — reachable only when the single-writer-per-
    // target contract is already violated by a LIVE concurrent writer
    // (a crashed writer's orphan has no racer). If the racer then
    // crashed between its delete and its re-claim, a marker created
    // here would point at nothing FOREVER and the replay guard would
    // no-op the batch's data out of existence. Check BEFORE the marker
    // (common case: no marker ever exists) and verify again AFTER it
    // (backstop: un-commit — the marker was live for microseconds, a
    // reader that raced it fails loudly on the missing dir, never
    // silently). Either way the commit THROWS so the engine retries the
    // batch. If the racer's own re-claim landed instead, the dir exists
    // with semantically equivalent content (same committed inputs) and
    // the commit stands.
    def vanished(when: String, extra: String = ""): Nothing =
      throw new java.io.IOException(
        s"StagedCommit($target): target vanished $when — a concurrent " +
          "same-name writer violated the single-writer contract; " +
          s"caller must retry$extra")
    if (!fs.exists(t)) vanished("between claim and marker (not committed)")
    fs.create(marker, true).close()
    if (!fs.exists(t)) {
      val undone = try fs.delete(marker, false)
        catch { case _: java.io.IOException => false }
      vanished("after the marker commit",
        if (undone) "; the marker was un-committed"
        else s" — AND the marker could not be removed: delete $marker " +
          "manually or the replay guard will silently skip this version")
    }
    Outcome.Committed
  }
}
