package graft.streaming

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, Path}

/** The one write-commit primitive every versioned-dir lifecycle here
  * shares: stage → claim → marker, with the claim primitive selected by
  * what the target's store can make atomic (see [[ClaimStrategy]]).
  *
  * The naive shape — `df.write.mode("overwrite").parquet(target)` then
  * create the marker — has a clobber window: mode(overwrite) DELETES
  * the target first, so a second writer racing the same version (two
  * compactors resolving one fold point, two hand-driven sessions
  * admitting one batch id) can delete a directory whose marker a
  * reader already resolved, exposing partially-deleted data with no
  * error (explicit schemas make missing files read as silently fewer
  * rows). Staging + an atomic claim closes it:
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
  *   - on hierarchical stores the claim is `FileContext.rename` WITHOUT
  *     the overwrite flag — it throws if the destination exists — so
  *     when two same-version writers slip past every check, exactly ONE
  *     wins the rename and the loser aborts cleanly;
  *   - on object stores (no atomic rename) the claim is a FILE created
  *     with create-if-absent atomicity (a conditional put) that the
  *     winner holds while it moves the staged data — see the
  *     object-store section below.
  *
  * The unit of commitment is ONE directory, deliberately: multi-dir
  * claims cannot be made atomic (interleaved same-name racers could
  * publish a mix of two builds), so an artifact with multiple parts
  * must put them INSIDE one parent dir and commit the parent (the ANN
  * base does exactly this: `base_v<N>_f<M>/ivf` plus
  * `…/ivf.centroids` under one renameable parent). Likewise, marker ↔
  * target must be 1:1: a commit whose content varies under one target
  * name must encode the variation IN the name (the ANN base encodes its
  * fold point).
  *
  * Crash contract is unchanged from the marker protocol: the marker is
  * the single atomic commit point; a crash anywhere before it leaves
  * the previous commit authoritative and orphans (staging dirs,
  * claimed-but-unmarked targets, unreleased claim files) that readers
  * never see and the next same-version attempt clears.
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
  * ==Filesystem contract (enforced, not assumed)==
  *
  * The rename claim's exactly-one-winner guarantee IS
  * `FileContext.rename` without the overwrite flag being atomic — true
  * on local FS and HDFS, FALSE on flat object stores, where "rename" is
  * a client-side copy-then-delete with no atomicity and no dst-exists
  * check worth the name (S3A documents this explicitly). On such a
  * store two same-version writers could BOTH "win", interleaving two
  * builds under one committed name — the exact corruption this
  * primitive exists to prevent — so [[claimStrategyFor]] routes every
  * commit by an ALLOW-LIST of scheme capabilities and REFUSES unknown
  * schemes by default: a deny-list of object stores can never be
  * complete (oss, cosn, obs, oci, … and whatever ships next year), and
  * an unknown scheme silently passing the guard is precisely the
  * silent weakening the guard exists to prevent.
  *
  *   - '''Rename-atomic''' (file, hdfs/webhdfs/swebhdfs, viewfs,
  *     abfs/abfss, ofs/o3fs) → the rename claim. Two caveats the list
  *     cannot probe, on the deployment to honor: `abfs`/`abfss` rename
  *     is atomic ONLY on hierarchical-namespace (ADLS Gen2 HNS)
  *     accounts — a flat blob account behind the same driver emulates
  *     rename as a client-side copy, exactly the non-atomicity this
  *     guard exists to refuse, so abfs targets MUST be HNS-enabled;
  *     and `viewfs` is a mount fabric that inherits the semantics of
  *     whatever store each mount resolves to — every mount a commit
  *     target can land on must itself be rename-atomic (a viewfs mount
  *     backed by s3a forfeits the guarantee the scheme check granted).
  *   - '''Conditional-put''' (s3a/s3/s3n, gs) → the claim-file
  *     protocol below. Requires the store+connector to give
  *     `create(path, overwrite = false)` create-if-absent ATOMICITY:
  *     true for S3 via If-None-Match conditional writes (GA since
  *     2024; Hadoop ≥ 3.4.1 S3A wires it under
  *     `fs.s3a.conditional.create` semantics, and MinIO supports the
  *     same precondition), and for GCS via generation-match
  *     preconditions. On an older connector that emulates
  *     create-if-absent as HEAD-then-PUT the claim degrades to
  *     best-effort — deploy the conditional-write-capable connector or
  *     stay on a hierarchical store.
  *   - Anything else → refused before any I/O. A store that IS
  *     rename-atomic (or conditional-put-capable) but not listed
  *     extends the corresponding scheme set — a one-line, reviewed
  *     decision.
  *
  * ==Object-store claim (conditional put)==
  *
  * Rename cannot claim on a flat store, so the claim moves into a FILE
  * the winner creates with create-if-absent atomicity next to the
  * target (`.<name>_claim`, hidden like the stage), holding it while
  * the staged data moves; the marker is unchanged as the single commit
  * point:
  *
  *   1. marker present → a racer committed; abort.
  *   2. claim file present without a marker → its holder crashed (the
  *      single-writer contract says no live twin) — break it once its
  *      age exceeds `claimLeaseMs` (default 0: break immediately, the
  *      same eager-clear stance the rename path takes with marker-less
  *      orphan dirs; deployments that cannot rule out a STALLED live
  *      writer set the lease above their worst-case data-move time and
  *      a within-lease claim makes the commit THROW retryably instead).
  *   3. claim = `create(claimFile, overwrite = false)` stamped with
  *      this writer's nonce — exactly one same-version writer wins;
  *      the loser aborts as [[Outcome.LostClaim]].
  *   4. marker-less orphan target cleared, staged dir moved onto the
  *      target (the store's non-atomic rename is safe HERE because the
  *      claim serializes same-version writers).
  *   5. ownership re-verified (the claim still carries OUR nonce —
  *      a broken-and-stolen claim aborts with a throw, never a
  *      marker), target verified present, marker created, target
  *      re-verified (un-commit on failure, as the rename path), claim
  *      released.
  *
  * Residual, parallel to the rename path's: breaking a claim assumes
  * its holder is dead. A LIVE holder whose claim is broken (lease too
  * short, or two live same-version writers at lease 0 — both
  * single-writer-contract violations) can interleave its data move
  * with the breaker's; the ownership re-check before the marker plus
  * the post-marker verification keep every such interleaving LOUD
  * (abort or throw-and-retry) and permanence impossible, but the
  * transient window is the data-move duration, not the rename path's
  * microseconds — size `claimLeaseMs` accordingly. */
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

  /** Which primitive implements the claim on a given store — resolved
    * per commit by [[claimStrategyFor]] from the scheme allow-lists
    * (see the class doc's filesystem-contract section). */
  private[graft] sealed trait ClaimStrategy
  private[graft] object ClaimStrategy {
    /** No-overwrite directory rename — hierarchical stores. */
    case object AtomicRename extends ClaimStrategy
    /** Create-if-absent claim file (conditional put) — object stores
      * with write preconditions. */
    case object ConditionalPut extends ClaimStrategy
  }

  /** Schemes with an atomic no-overwrite directory rename. Scheme-less
    * targets resolve against the FileSystem's own URI (local FS =
    * "file"). abfs/abfss require HNS accounts and viewfs requires
    * rename-atomic mounts — see the class doc. */
  private val atomicRenameSchemes: Set[String] =
    Set("file", "hdfs", "webhdfs", "swebhdfs", "viewfs", "abfs", "abfss",
      "ofs", "o3fs")

  /** Object-store schemes whose connectors give `create(path,
    * overwrite=false)` create-if-absent atomicity (conditional put) —
    * the claim-file protocol's one requirement. See the class doc for
    * the connector versions that hold it. */
  private val conditionalPutSchemes: Set[String] =
    Set("s3a", "s3", "s3n", "gs")

  /** Resolve the claim primitive for `target` (or, as a fallback, the
    * FileSystem itself) — or refuse, BEFORE any I/O, so a misconfigured
    * deployment dies on its first commit with the contract spelled out,
    * not on a corrupted index months later. */
  private[graft] def claimStrategyFor(target: String,
      fs: FileSystem): ClaimStrategy = {
    val scheme = Option(new Path(target).toUri.getScheme)
      .orElse(Option(fs.getUri).flatMap(u => Option(u.getScheme)))
      .map(_.toLowerCase(java.util.Locale.ROOT))
    scheme match {
      case Some(s) if atomicRenameSchemes(s) => ClaimStrategy.AtomicRename
      case None => ClaimStrategy.AtomicRename // local FS default
      case Some(s) if conditionalPutSchemes(s) => ClaimStrategy.ConditionalPut
      case Some(s) =>
        throw new UnsupportedOperationException(
          s"StagedCommit($target): scheme '$s://' is on neither claim " +
            "allow-list (rename-atomic: file/hdfs/webhdfs/swebhdfs/" +
            "viewfs/abfs/abfss/ofs/o3fs — abfs requires an HNS account, " +
            "viewfs requires rename-atomic mounts; conditional-put: " +
            "s3a/s3/s3n/gs). Object stores have no atomic no-overwrite " +
            "rename, so the rename claim cannot guarantee exactly one " +
            "same-version winner — committing there could interleave " +
            "two builds under one committed name. Use a hierarchical " +
            "filesystem, a conditional-put-capable object store, or — " +
            "if this store genuinely has one of the two primitives — " +
            "add its scheme to the matching StagedCommit scheme set.")
    }
  }

  /** Stage-and-commit the single directory `target`: `write(stagePath)`
    * populates the staging dir (including any nested layout), the claim
    * (rename or claim-file, per [[claimStrategyFor]]) takes ownership,
    * and `marker` is created last. `beforeClaim` is a test seam into
    * the stage→claim window; `abortIf` runs after it (the caller's
    * tripwire — e.g. a layout re-list); `afterClaim` is a test seam
    * into the claim→marker window (the racer-clear residual the
    * post-commit verification guards). Returns true iff THIS call
    * committed the marker.
    *
    * Only a lost race (racer marker, lost claim) or a caller tripwire
    * counts as a clean `false`. Any other I/O failure CLEANS UP AND
    * PROPAGATES: swallowing it would return false like a benign no-op,
    * the foreachBatch caller would complete, the engine checkpoint
    * would advance, and the batch's data would be silently absent
    * forever — a real failure must fail the batch so the engine
    * retries it. */
  def commit(write: String => Unit, fs: FileSystem, conf: Configuration,
      target: String, marker: Path,
      beforeClaim: () => Unit = () => (),
      abortIf: () => Boolean = () => false,
      afterClaim: () => Unit = () => (),
      claimLeaseMs: Long = 0L): Boolean =
    commitOutcome(write, fs, conf, target, marker, beforeClaim, abortIf,
      afterClaim, claimLeaseMs) == Outcome.Committed

  /** [[commit]] with the typed result — see [[Outcome]] for when the
    * distinction matters. Identical protocol; `commit` is the
    * cause-agnostic Boolean view of this. */
  private[graft] def commitOutcome(write: String => Unit, fs: FileSystem,
      conf: Configuration, target: String, marker: Path,
      beforeClaim: () => Unit = () => (),
      abortIf: () => Boolean = () => false,
      afterClaim: () => Unit = () => (),
      claimLeaseMs: Long = 0L): Outcome =
    commitOutcomeWith(claimStrategyFor(target, fs), write, fs, conf,
      target, marker, beforeClaim, abortIf, afterClaim, claimLeaseMs)

  /** [[commitOutcome]] with the claim strategy pinned — the test seam
    * that lets the fault/racer battery drive the conditional-put
    * protocol against a SIMULATED object store (a local FilterFileSystem
    * with non-atomic rename + atomic create) without real s3 jars. */
  private[graft] def commitOutcomeWith(strategy: ClaimStrategy,
      write: String => Unit, fs: FileSystem, conf: Configuration,
      target: String, marker: Path,
      beforeClaim: () => Unit = () => (),
      abortIf: () => Boolean = () => false,
      afterClaim: () => Unit = () => (),
      claimLeaseMs: Long = 0L): Outcome = {
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
    strategy match {
      case ClaimStrategy.AtomicRename =>
        renameClaim(fs, conf, t, stage, marker, target, abort, afterClaim)
      case ClaimStrategy.ConditionalPut =>
        conditionalPutClaim(fs, t, stage, marker, target, abort, afterClaim,
          claimLeaseMs)
    }
  }

  /** The hierarchical-store claim: no-overwrite `FileContext.rename`
    * of the stage onto the target — see the class doc. */
  private def renameClaim(fs: FileSystem, conf: Configuration, t: Path,
      stage: Path, marker: Path, target: String,
      abort: (String, Outcome) => Outcome,
      afterClaim: () => Unit): Outcome = {
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
    commitMarkerVerified(fs, t, marker, target)
    Outcome.Committed
  }

  /** The object-store claim: create-if-absent claim file held across
    * the data move — see the class doc's conditional-put section. */
  private def conditionalPutClaim(fs: FileSystem, t: Path, stage: Path,
      marker: Path, target: String,
      abort: (String, Outcome) => Outcome,
      afterClaim: () => Unit, claimLeaseMs: Long): Outcome = {
    val claim = new Path(t.getParent, s".${t.getName}_claim")
    val nonce = java.util.UUID.randomUUID().toString
    def claimContent(): String =
      try {
        val in = fs.open(claim)
        try {
          // read to EOF or buffer-full: a single read() may legally
          // return short, and a short nonce must not read as "not ours"
          val buf = new Array[Byte](64)
          var off = 0
          var n = in.read(buf, off, buf.length - off)
          while (n > 0 && off + n < buf.length) {
            off += n
            n = in.read(buf, off, buf.length - off)
          }
          val len = off + math.max(n, 0)
          if (len <= 0) "" else new String(buf, 0, len, "UTF-8")
        } finally in.close()
      } catch { case _: java.io.IOException => "" }
    def releaseClaim(): Unit =
      // only the owner releases; best-effort (an unreleased claim after
      // a committed marker is inert — every path checks the marker
      // first — and a stale one is broken by the next attempt's lease)
      try { if (claimContent() == nonce) { fs.delete(claim, false); () } }
      catch { case _: java.io.IOException => () }
    if (fs.exists(marker))
      return abort("a racer already committed", Outcome.RacerCommitted)
    if (fs.exists(claim)) {
      if (fs.exists(marker)) // holder committed; its claim release failed
        return abort("a racer committed (inert claim left)",
          Outcome.RacerCommitted)
      val age =
        try System.currentTimeMillis() -
          fs.getFileStatus(claim).getModificationTime
        catch { case _: java.io.IOException => Long.MaxValue } // gone = stale
      if (age < claimLeaseMs) {
        fs.delete(stage, true)
        throw new java.io.IOException(
          s"StagedCommit($target): the claim file is held (age ${age}ms " +
            s"< lease ${claimLeaseMs}ms) — a same-version writer may be " +
            "live; caller must retry after the lease expires")
      }
      // stale claim of a crashed holder — the eager-clear stance the
      // rename path takes with marker-less orphan dirs (see class doc)
      fs.delete(claim, false)
    }
    val won =
      try {
        // the conditional put. On stores that apply the If-None-Match
        // precondition at object PUT (S3: the close()), the loss
        // surfaces from close(), not create() — the whole
        // create+write+close is one claim attempt, which is why the
        // catch wraps all three.
        val out = fs.create(claim, false)
        try out.write(nonce.getBytes("UTF-8")) finally out.close()
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
      }
    if (!won)
      return abort("lost the conditional-put claim race", Outcome.LostClaim)
    // from claim creation on, EVERY failure must release the claim and
    // clear the stage before propagating — an I/O throw here would
    // otherwise leak the stage forever and hold the claim for a lease
    def failing[A](body: => A): A =
      try body
      catch {
        case e: Throwable => fs.delete(stage, true); releaseClaim(); throw e
      }
    if (failing(fs.exists(marker))) { // racer committed while we claimed
      releaseClaim()
      return abort("a racer committed mid-claim", Outcome.RacerCommitted)
    }
    failing {
      // marker-less orphan (or a crashed holder's partial copy) —
      // invisible to readers, safe to clear under the claim
      if (fs.exists(t)) fs.delete(t, true)
      // the store's rename is a non-atomic copy, safe ONLY because the
      // claim serializes same-version writers
      if (!fs.rename(stage, t))
        throw new java.io.IOException(
          s"StagedCommit($target): the data move onto the target failed " +
            "(store rename returned false); caller must retry")
      afterClaim() // test seam: the claim→marker window
      // ownership re-check: a breaker that decided OUR claim was stale
      // (lease too short / live-twin contract violation) owns the
      // target now — committing a marker over its in-progress move
      // could mix two builds. Abort loudly; the breaker finishes.
      if (claimContent() != nonce)
        throw new java.io.IOException(
          s"StagedCommit($target): the claim was broken by a concurrent " +
            "same-version writer (single-writer contract violated or " +
            "lease too short) — caller must retry")
      commitMarkerVerified(fs, t, marker, target)
    }
    releaseClaim()
    Outcome.Committed
  }

  /** The shared commit tail: verify the claimed target survived the
    * claim→marker window, create the marker, verify again (un-commit on
    * failure). Throws so the engine retries — see [[renameClaim]]'s
    * inline rationale. */
  private def commitMarkerVerified(fs: FileSystem, t: Path, marker: Path,
      target: String): Unit = {
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
  }
}
