package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.lake.Lake
import graft.sources.JdbcMeta.ColumnMeta
import graft.sources.PagedConnector._
import graft.sources.{JdbcMeta, PagedConnector}

/** S6 projection-builder logic and the S7/S8 paged-connector contract
  * (pagination drain, `_state.json` durability, change-detection skip,
  * reprocessing-produces-no-duplicates through the lake). */
class ConnectorSpec extends SparkSpec {

  private def tmpDir() = Files.createTempDirectory("graft-conn-")

  // ---- S7/S8 paged listing + state -----------------------------------

  test("paged listing drains all pages in deterministic name order") {
    val dir = tmpDir()
    ('a' to 'e').foreach(c => Files.writeString(dir.resolve(s"$c.pdf"), c.toString))
    val src = new LocalFsPagedSource(dir)
    val (page1, tok1) = src.listPage(None, 2)
    assert(page1.map(_.name) === Seq("a.pdf", "b.pdf") && tok1.isDefined)
    val all = listAll(src, pageSize = 2)
    assert(all.map(_.name) === Seq("a.pdf", "b.pdf", "c.pdf", "d.pdf", "e.pdf"))
    assert(listAll(src, pageSize = 99).map(_.name) === all.map(_.name))
  }

  test("state lifecycle: skip unchanged, reprocess changed, atomic save") {
    val dir = tmpDir()
    Files.writeString(dir.resolve("x.pdf"), "v1")
    Files.writeString(dir.resolve("y.pdf"), "v1")
    val statePath = dir.resolve("_state.json")
    val src = new LocalFsPagedSource(dir)

    // first run: everything is new work
    val files1 = listAll(src, 10)
    var state = loadState(statePath)
    assert(newWork(files1, state).map(_.name) === Seq("x.pdf", "y.pdf"))
    state = files1.foldLeft(state)(markProcessed)
    saveState(statePath, state)

    // second run, nothing changed: zero work
    assert(newWork(listAll(src, 10), loadState(statePath)).isEmpty)

    // y changes (size + mtime): only y is re-listed as work
    Files.writeString(dir.resolve("y.pdf"), "v2-longer")
    Files.setLastModifiedTime(dir.resolve("y.pdf"),
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() + 5000))
    val work3 = newWork(listAll(src, 10), loadState(statePath))
    assert(work3.map(_.name) === Seq("y.pdf"))
    // no stray tmp file after the atomic save
    assert(!Files.exists(dir.resolve("_state.json.tmp")))
  }

  test("state load is tolerant: missing, blank, corrupt (renamed .bad)") {
    val dir = tmpDir()
    val statePath = dir.resolve("_state.json")
    assert(loadState(statePath) === Map.empty)
    Files.writeString(statePath, "   ")
    assert(loadState(statePath) === Map.empty)
    Files.writeString(statePath, """{"x": {"modifiedTime": "t1", "size": }""")
    assert(loadState(statePath) === Map.empty)
    assert(Files.exists(dir.resolve("_state.json.bad")))
    assert(!Files.exists(statePath))
    // round-trip survives quoting-hostile ids
    val s: State = Map("we\"ird\\id" -> ("2026-08-12T00:00:00Z", 42L))
    saveState(statePath, s)
    assert(loadState(statePath) === s)
  }

  test("reprocessing a changed file produces no duplicates through the lake") {
    val dir = tmpDir()
    Files.writeString(dir.resolve("doc1.txt"), "a\nb")
    Files.writeString(dir.resolve("doc2.txt"), "c")
    val src = new LocalFsPagedSource(dir)
    val statePath = dir.resolve("_state.json")

    def rowsOf(work: Seq[FileMeta]) = {
      val rows = work.flatMap { f =>
        Files.readString(dir.resolve(f.name)).linesIterator.map(l => Row(f.id, l))
      }
      LocalTable.of(spark, StructType(Seq(
        StructField("landing_object_key", StringType),
        StructField("line", StringType))), rows)
    }

    // run 1: land both files
    var state = loadState(statePath)
    val work1 = newWork(listAll(src, 10), state)
    var table = rowsOf(work1)
    state = work1.foldLeft(state)(markProcessed); saveState(statePath, state)
    assert(table.count() === 3)

    // doc1 changes; run 2 reprocesses ONLY doc1 and displaces its rows
    Files.writeString(dir.resolve("doc1.txt"), "a2\nb2\nnew")
    Files.setLastModifiedTime(dir.resolve("doc1.txt"),
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() + 5000))
    val work2 = newWork(listAll(src, 10), loadState(statePath))
    assert(work2.map(_.name) === Seq("doc1.txt"))
    table = Lake.deleteByKeysAppend(table, rowsOf(work2), "landing_object_key")
    val byKey = table.groupBy("landing_object_key").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKey === Map("doc1.txt" -> 3L, "doc2.txt" -> 1L))
  }

  test("I5 daily-run guard: one run per day per job, reset next day") {
    val statePath = tmpDir().resolve("_state.json")
    assert(!PagedConnector.alreadyRanOn(statePath, "forms", "2026-08-12"))
    PagedConnector.markRun(statePath, "forms", "2026-08-12")
    assert(PagedConnector.alreadyRanOn(statePath, "forms", "2026-08-12"))
    assert(!PagedConnector.alreadyRanOn(statePath, "forms", "2026-08-13"))
    assert(!PagedConnector.alreadyRanOn(statePath, "other_job", "2026-08-12"))
    // the guard coexists with file-skip entries in the same state file
    PagedConnector.saveState(statePath, PagedConnector.markProcessed(
      PagedConnector.loadState(statePath),
      FileMeta("a.pdf", "a.pdf", "t1", 3L)))
    assert(PagedConnector.alreadyRanOn(statePath, "forms", "2026-08-12"))
    assert(PagedConnector.shouldSkip(FileMeta("a.pdf", "a.pdf", "t1", 3L),
      PagedConnector.loadState(statePath)))
  }

  // ---- S6 projection builder -----------------------------------------

  private val pgCols = Seq(
    ColumnMeta("id", "integer", Some("int4")),
    ColumnMeta("payload", "USER-DEFINED", Some("geometry")),
    ColumnMeta("doc", "ARRAY", Some("_text")),
    ColumnMeta("name", "character varying", Some("varchar")))

  private val oraCols = Seq(
    ColumnMeta("ID", "NUMBER"),
    ColumnMeta("SCAN", "BLOB"),
    ColumnMeta("NOTES", "CLOB"),
    ColumnMeta("NAME", "VARCHAR2"))

  test("S6: postgres matches on udt_name, oracle on data_type; order kept") {
    assert(JdbcMeta.projectionList("postgres", pgCols, Set("geometry", "_text"))
      === "\"id\", \"name\"")
    assert(JdbcMeta.projectionList("oracle", oraCols, Set("BLOB", "CLOB"))
      === "\"ID\", \"NAME\"")
    assert(JdbcMeta.extractionQuery("oracle", "FIN", "BILLS", oraCols, Set("BLOB", "CLOB"))
      === "(SELECT \"ID\", \"NAME\" FROM FIN.BILLS) T")
  }

  test("S6: all columns excluded fails loudly; unknown dialect rejected") {
    intercept[IllegalStateException] {
      JdbcMeta.survivingColumns("oracle", oraCols,
        Set("NUMBER", "BLOB", "CLOB", "VARCHAR2"))
    }
    intercept[IllegalArgumentException] {
      JdbcMeta.metadataQuery("mysql", "s", "t")
    }
    assert(JdbcMeta.metadataQuery("postgres", "public", "bills")
      .contains("information_schema.columns"))
    assert(JdbcMeta.metadataQuery("oracle", "FIN", "BILLS")
      .contains("all_tab_columns"))
  }
}
