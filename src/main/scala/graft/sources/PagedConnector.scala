package graft.sources

import java.nio.file.{Files, Path, StandardCopyOption}

import scala.jdk.CollectionConverters._
import scala.util.Try

/** S7/S8 — the external-drive connector CONTRACT (Google Drive
  * `files.list` pagination, gdrive/client.py:13-53; SharePoint
  * `@odata.nextLink` paging, sp_list_client.py:46-219) realized over the
  * local filesystem: a paged listing source, a change-detection state file
  * with the reference's exact durability semantics
  * (bank_ori_lnd_finantial_files_extract.py:36-89), and the
  * drain/skip/mark driver loop.
  *
  * The listing/driver side is inherently driver-scale (thousands of
  * entries, one state file); the ROWS flow through the distributed engine
  * — the work list this produces feeds `landingFiles`/`extractPdfTexts`
  * and the per-file idempotent reload (`Lake.deleteByKeysAppend`), so
  * reprocessing a file never duplicates rows.
  */
object PagedConnector {

  /** One remote file's listing entry (the reference keys its state on
    * Drive's (id, modifiedTime, size)). */
  final case class FileMeta(id: String, name: String, modifiedTime: String,
      size: Long)

  /** A source that lists in pages: returns one page of entries plus the
    * next page token, `None` when drained — the `nextPageToken` /
    * `@odata.nextLink` shape shared by both reference connectors. */
  trait PagedSource {
    def listPage(pageToken: Option[String], pageSize: Int): (Seq[FileMeta], Option[String])
  }

  /** Deterministic name-ordered paging over a local directory (the
    * engine's stand-in for the Drive/Graph HTTP clients; the reference
    * also sorts listings by name for stable processing order,
    * gdrive/client.py:52). Page tokens are the start offset. */
  final class LocalFsPagedSource(root: Path) extends PagedSource {
    private def all(): Seq[FileMeta] = {
      val stream = Files.list(root)
      try stream.iterator().asScala
        .filter(Files.isRegularFile(_))
        .filterNot(_.getFileName.toString.startsWith("_state"))
        .map { p =>
          FileMeta(
            id = p.getFileName.toString,
            name = p.getFileName.toString,
            modifiedTime = Files.getLastModifiedTime(p).toString,
            size = Files.size(p))
        }
        .toSeq.sortBy(_.name)
      finally stream.close()
    }

    // The listing is snapshotted once per drain (at the tokenless first
    // page) and later pages serve from the snapshot — offset tokens over
    // a re-computed listing would duplicate or skip entries if files
    // land mid-drain, the same consistency contract a real paged API's
    // server-side cursor provides.
    @volatile private var snapshot: Seq[FileMeta] = Nil

    override def listPage(pageToken: Option[String],
        pageSize: Int): (Seq[FileMeta], Option[String]) = {
      if (pageToken.isEmpty) snapshot = all()
      val files = snapshot
      val start = pageToken.map(_.toInt).getOrElse(0)
      val page = files.slice(start, start + pageSize)
      val next = if (start + pageSize < files.length) Some((start + pageSize).toString) else None
      (page, next)
    }
  }

  /** Drain every page (the reference's while-nextPageToken loop). */
  def listAll(src: PagedSource, pageSize: Int): Seq[FileMeta] = {
    val out = Seq.newBuilder[FileMeta]
    var token: Option[String] = None
    var more = true
    while (more) {
      val (page, next) = src.listPage(token, pageSize)
      out ++= page
      token = next
      more = next.isDefined
    }
    out.result()
  }

  // ---- _state.json change detection ----------------------------------

  /** state: file id → (modifiedTime, size) of the last successful run. */
  type State = Map[String, (String, Long)]

  /** Tolerant load (load_state): missing → empty; blank → empty;
    * corrupt → renamed aside as `.bad` and empty, so one bad write never
    * wedges the connector. */
  def loadState(statePath: Path): State = {
    if (!Files.exists(statePath)) return Map.empty
    val raw = Try(Files.readString(statePath)).getOrElse("")
    if (raw.trim.isEmpty) return Map.empty
    parseState(raw).getOrElse {
      Try(Files.move(statePath,
        statePath.resolveSibling(statePath.getFileName.toString + ".bad"),
        StandardCopyOption.REPLACE_EXISTING))
      Map.empty
    }
  }

  /** Atomic save (save_state): write a temp sibling, then rename over —
    * a crash mid-write never leaves a truncated state file. */
  def saveState(statePath: Path, state: State): Unit = {
    val tmp = statePath.resolveSibling(statePath.getFileName.toString + ".tmp")
    Files.writeString(tmp, renderState(state))
    Files.move(tmp, statePath, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** should_skip: unchanged means same modifiedTime AND same size. */
  def shouldSkip(meta: FileMeta, state: State): Boolean =
    state.get(meta.id).exists { case (mt, sz) =>
      mt == meta.modifiedTime && sz == meta.size
    }

  /** The work list for this run: listed files not skipped by state. */
  def newWork(files: Seq[FileMeta], state: State): Seq[FileMeta] =
    files.filterNot(shouldSkip(_, state))

  /** Record a successful process of `meta`. */
  def markProcessed(state: State, meta: FileMeta): State =
    state + (meta.id -> (meta.modifiedTime, meta.size))

  // ---- I5 daily-run guard --------------------------------------------

  private def runKey(job: String) = "__run:" + job

  /** I5 — daily-run guard (the reference's Airflow-side skip-if-already-
    * uploaded-today check, forms job :104-121): true when the state file
    * records a successful run of `job` for `day`. The day is passed in
    * (never read from a clock) so reruns and tests are deterministic. */
  def alreadyRanOn(statePath: Path, job: String, day: String): Boolean =
    loadState(statePath).get(runKey(job)).exists(_._1 == day)

  /** Record a successful run of `job` for `day` (atomic, same file as
    * the file-skip state). */
  def markRun(statePath: Path, job: String, day: String): Unit =
    saveState(statePath,
      markProcessed(loadState(statePath), FileMeta(runKey(job), job, day, 0L)))

  // ---- flat JSON codec (id -> {modifiedTime, size}), JDK-only ---------

  private def renderState(state: State): String =
    state.toSeq.sortBy(_._1).map { case (id, (mt, sz)) =>
      s"""  ${q(id)}: {"modifiedTime": ${q(mt)}, "size": $sz}"""
    }.mkString("{\n", ",\n", "\n}")

  private def q(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private val EntryRe =
    """"((?:[^"\\]|\\.)*)"\s*:\s*\{\s*"modifiedTime"\s*:\s*"((?:[^"\\]|\\.)*)"\s*,\s*"size"\s*:\s*(\d+)\s*\}""".r

  private def parseState(raw: String): Option[State] = {
    val t = raw.trim
    if (!t.startsWith("{") || !t.endsWith("}")) return None
    if (t.replaceAll("\\s", "") == "{}") return Some(Map.empty)
    val entries = EntryRe.findAllMatchIn(t).map { m =>
      unq(m.group(1)) -> (unq(m.group(2)), m.group(3).toLong)
    }.toMap
    // every value object must have matched, else the file is corrupt
    val expected = "\"modifiedTime\"".r.findAllIn(t).length
    if (entries.isEmpty || entries.size != expected) None else Some(entries)
  }

  private def unq(s: String): String =
    s.replace("\\\"", "\"").replace("\\\\", "\\")
}
