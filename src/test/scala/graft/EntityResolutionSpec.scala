package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.ext.EntityResolution

/** Entity-resolution semantics: dictionary-level fuzzy candidates,
  * transitive merging, longest-spelling survivorship, record-level
  * canonical assignment. */
class EntityResolutionSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType)))

  private def recs(rows: (Long, String)*) =
    LocalTable.of(spark, schema, rows.map { case (i, n) => Row(i, n) })

  test("fuzzyCandidates: within-block edit-distance pairs over the distinct dictionary") {
    val d = recs(
      (1L, "acme corp"), (2L, "acme corp"),  // duplicates collapse first
      (3L, "acme cor"),                       // deletion, dist 1
      (4L, "acme korp"),                      // substitution vs acme corp, dist 1
      (5L, "zenith ltd"))                     // different block entirely
    val got = EntityResolution.fuzzyCandidates(d, "name")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(got === Set(
      ("acme cor", "acme corp", 1),
      ("acme corp", "acme korp", 1)))
    // NOTE "acme cor" vs "acme korp" is dist 2 — linked only transitively
  }

  test("canonicalize: transitive chain merges, longest spelling survives, every record maps") {
    val d = recs(
      (1L, "acme corp"), (2L, "acme cor"), (3L, "acme korp"),
      (4L, "zenith ltd"), (5L, "acme corp"))
    val pairs = EntityResolution.fuzzyCandidates(d, "name")
    val got = EntityResolution.canonicalize(d, "id", "name", pairs)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    // chain acme cor — acme corp — acme korp all canonicalize to a
    // 9-char spelling; "acme corp" < "acme korp" breaks the length tie
    assert(got(1L) === (("acme corp", "acme corp")))
    assert(got(2L) === (("acme cor", "acme corp")))
    assert(got(3L) === (("acme korp", "acme corp")))
    assert(got(5L) === (("acme corp", "acme corp")))
    // the singleton keeps itself
    assert(got(4L) === (("zenith ltd", "zenith ltd")))
    assert(got.size === 5, "every record is assigned exactly once")
  }

  test("canonicalize with no pairs is the identity mapping") {
    val d = recs((1L, "alpha"), (2L, "omega"))
    val noPairs = EntityResolution.fuzzyCandidates(d, "name")
    assert(noPairs.count() === 0)
    val got = EntityResolution.canonicalize(d, "id", "name", noPairs)
      .collect().map(r => r.getString(1) -> r.getString(2))
    assert(got.forall { case (n, g) => n == g })
  }
}
