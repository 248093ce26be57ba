package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.ext.DataQuality

/** Data-quality profiling semantics: heavy-key shares/cumulative shares
  * with deterministic tiebreaks, and per-column null/distinct/range
  * profiles including all-NULL and non-numeric columns. */
class DataQualitySpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", StringType), StructField("v", LongType)))

  private def tbl(rows: (String, java.lang.Long)*) =
    LocalTable.of(spark, schema, rows.map { case (k, v) => Row(k, v) })

  test("keySkewProfile: exact shares, integer cumulative sums, key tiebreak, topK cut") {
    val d = tbl(
      ("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L), ("a", 5L),
      ("b", 1L), ("b", 2L), ("b", 3L),
      ("c", 1L), ("d", 1L))
    val got = DataQuality.keySkewProfile(d, "k", topK = 3)
      .orderBy("rnk").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got === Seq(
      ("a", 5L, 1, 0.5, 0.5),
      ("b", 3L, 2, 0.3, 0.8),
      ("c", 1L, 3, 0.1, 0.9))) // c before d: count tie broken by key
  }

  test("keySkewProfile: topK larger than key count returns every key") {
    val d = tbl(("x", 1L), ("y", 1L))
    val got = DataQuality.keySkewProfile(d, "k", topK = 10).collect()
    assert(got.length === 2)
    assert(got.map(_.getDouble(3)).sum === 1.0)
  }

  test("profile: nulls, distincts (NULLs excluded), numeric ranges, non-numeric NULL ranges") {
    val s2 = StructType(Seq(
      StructField("name", StringType), StructField("score", DoubleType),
      StructField("n", LongType)))
    val d = LocalTable.of(spark, s2, Seq(
      Row("x", 1.5, 10L), Row("x", -2.0, 20L), Row(null, null, 30L),
      Row("y", 1.5, null)))
    val got = DataQuality.profile(d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Double]))).toMap
    assert(got("name") === ((1L, 2L, None, None)))
    assert(got("score") === ((1L, 2L, Some(-2.0), Some(1.5)))) // 1.5 twice -> 2 distinct
    assert(got("n") === ((1L, 3L, Some(10.0), Some(30.0))))
    assert(got.keySet === Set("name", "score", "n"))
  }

  test("pseudonymize: joinability preserved, NULL passthrough, salt changes tokens") {
    val d = tbl(("u1", 1L), ("u1", 2L), ("u2", 3L), (null, 4L))
    val tok = DataQuality.pseudonymize(d, Seq("k"), "s1")
    val rawCounts = d.groupBy("k").count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    val tokCounts = tok.groupBy("k").count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    // same multiset of group sizes (the token mapping is a bijection on keys)
    assert(tokCounts.values.toSeq.sorted === rawCounts.values.toSeq.sorted)
    assert(tokCounts(None) === 1L, "NULL keys stay NULL")
    val tokens = tok.select("k").distinct().collect().map(r => Option(r.getString(0)))
    assert(!tokens.flatten.exists(t => t == "u1" || t == "u2"), "raw ids never leak")
    // deterministic under the same salt; different under another salt
    val again = DataQuality.pseudonymize(d, Seq("k"), "s1")
      .collect().map(_.toSeq).toSet
    assert(again === tok.collect().map(_.toSeq).toSet)
    val other = DataQuality.pseudonymize(d, Seq("k"), "s2")
      .select("k").collect().flatMap(r => Option(r.getString(0))).toSet
    assert(other.intersect(tokens.flatten.toSet).isEmpty, "salts must not share tokens")
  }

  test("constraintAudit: per-rule counts, NULL-excluding uniqueness, referential orphans, clean table zeros") {
    import org.apache.spark.sql.functions._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("ref", LongType),
      StructField("v", LongType)))
    val child = LocalTable.of(spark, schema, Seq(
      Row(1L, 10L, 5L), Row(1L, 10L, 5L),         // duplicate id
      Row(null, 10L, -1L),                        // null id + negative v
      Row(3L, 99L, 2L)))                          // orphan ref
    val parent = LocalTable.of(spark,
      StructType(Seq(StructField("pid", LongType))), Seq(Row(10L)))
    val audit = DataQuality.constraintAudit(child, Seq(
      "null_id" -> col("id").isNull,
      "negative_v" -> (col("v") < 0)),
      uniqueKey = Some(Seq("id")))
      .unionByName(DataQuality.referentialViolations(
        child, "ref", parent, "pid", "orphan_ref"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 4 rows, 2 distinct non-null ids -> 2 "duplicates" (the extra copy AND the null row)
    assert(audit === Map("null_id" -> 1L, "negative_v" -> 1L,
      "duplicate_key" -> 2L, "orphan_ref" -> 1L))
    val clean = LocalTable.of(spark, schema, Seq(Row(1L, 10L, 5L), Row(2L, 10L, 6L)))
    val zeros = DataQuality.constraintAudit(clean, Seq(
      "null_id" -> col("id").isNull), uniqueKey = Some(Seq("id")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(zeros.values.forall(_ === 0L))
  }

  test("mergeable profile: merged halves equal the whole-table profile; merge order free") {
    import org.apache.spark.sql.functions._
    val schema = StructType(Seq(
      StructField("k", StringType), StructField("v", LongType)))
    val rows = (1L to 30L).map(i => Row(s"k${i % 7}", i)) :+ Row(null, null)
    val d = LocalTable.of(spark, schema, rows)
    def prof(df: org.apache.spark.sql.DataFrame) = DataQuality.profileSketch(df)
    val p1 = prof(d.filter(col("v") <= 10))
    val p2 = prof(d.filter(col("v") > 10 && col("v") <= 20))
    val p3 = prof(d.filter(col("v") > 20 || col("v").isNull))
    def fin(p: org.apache.spark.sql.DataFrame) =
      DataQuality.finalizeProfile(p).collect().map(r =>
        r.getString(0) -> (r.getLong(1), r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Double]),
          Option(r.get(4)).map(_.asInstanceOf[Double]))).toMap
    val mergedLtoR = fin(DataQuality.mergeProfileSketches(
      DataQuality.mergeProfileSketches(p1, p2), p3))
    val mergedRtoL = fin(DataQuality.mergeProfileSketches(p1,
      DataQuality.mergeProfileSketches(p2, p3)))
    assert(mergedLtoR === mergedRtoL, "merge must be association-free")
    // at this cardinality the HLL estimate is exact: whole == merged
    val whole = fin(prof(d))
    assert(mergedLtoR === whole)
    assert(whole("v") === ((1L, 30L, Some(1.0), Some(30.0))))
    assert(whole("k")._1 === 1L) // the one NULL key
    assert(whole("k")._2 === 7L) // k0..k6
  }

  private val vSchema = StructType(Seq(StructField("x", DoubleType)))
  private def vals(xs: Double*) =
    LocalTable.of(spark, vSchema, xs.map(Row(_)))

  test("psiDrift: identical distributions give exactly zero psi per bin") {
    val d = vals(1.0, 2.0, 3.0, 4.0, 5.0)
    val got = DataQuality.psiDrift(d, vals(1.0, 2.0, 3.0, 4.0, 5.0), "x", 4)
      .collect()
    assert(got.length === 4)
    assert(got.forall(_.getAs[Double]("psi") === 0.0),
      "p == q per bin must emit psi exactly 0.0")
  }

  test("psiDrift: hand-computed two-bin drift") {
    // ref buckets [3, 1], cur buckets [1, 3]; add-half shares 0.7/0.3
    val got = DataQuality.psiDrift(
      vals(0.0, 0.0, 0.0, 10.0), vals(10.0, 10.0, 10.0, 0.0), "x", 2)
      .collect().map(r => r.getInt(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got(0)._1 === 0.7)
    assert(got(0)._2 === 0.3)
    // (0.7-0.3)*ln(0.7/0.3) = 0.338919... , floor@6 both bins
    assert(got(0)._3 === 0.338919)
    assert(got(1)._3 === 0.338919)
  }

  test("psiDrift: out-of-range current values clamp into the edge bins") {
    val got = DataQuality.psiDrift(
      vals(0.0, 2.5, 5.0, 7.5, 10.0), vals(-100.0, 100.0), "x", 4)
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    // 2 current values; edge bins hold one each: share (2*1+1)/(2*2+4) = 0.375
    assert(got(0) === 0.375)
    assert(got(3) === 0.375)
    assert(got(1) === 0.125) // (0+0.5)/4 smoothed empty
    assert(got(2) === 0.125)
  }

  test("psiDrift: degenerate reference (min == max) collapses to bucket 0, finite psi") {
    val got = DataQuality.psiDrift(
      vals(5.0, 5.0, 5.0), vals(5.0, 7.0), "x", 3).collect()
    assert(got.length === 3)
    assert(got.forall(r => !r.getAs[Double]("psi").isNaN &&
      !r.getAs[Double]("psi").isInfinite))
    val byBucket = got.map(r => r.getInt(0) -> r.getDouble(1)).toMap
    // all three ref rows in bucket 0: (2*3+1)/(2*3+3) = 7/9
    assert(byBucket(0) === 7.0 / 9.0)
  }

  test("psiDrift: empty bins stay on the spine with smoothed finite shares") {
    val got = DataQuality.psiDrift(
      vals(0.0, 10.0), vals(0.0, 10.0), "x", 5).collect()
    assert(got.length === 5, "empty interior bins must not drop off the spine")
    assert(got.forall(r => r.getDouble(1) > 0.0 && r.getDouble(2) > 0.0))
  }

  test("persisted sketch artifacts: profile + KMV survive a parquet round-trip and merge") {
    import org.apache.spark.sql.functions._
    import graft.plans.KmvAgg
    val schema = StructType(Seq(
      StructField("k", StringType), StructField("v", LongType)))
    val d = LocalTable.of(spark, schema,
      (1L to 40L).map(i => Row(s"k${i % 11}", i)))
    val base = java.nio.file.Files.createTempDirectory("graft_sketch").toString
    // day-1 and day-2 profile artifacts persisted as parquet tables (the
    // d56 maintenance posture THROUGH the artifact table, not in-memory)
    DataQuality.profileSketch(d.filter(col("v") <= 20))
      .write.parquet(s"$base/p1")
    DataQuality.profileSketch(d.filter(col("v") > 20))
      .write.parquet(s"$base/p2")
    val merged = DataQuality.finalizeProfile(DataQuality.mergeProfileSketches(
      spark.read.parquet(s"$base/p1"), spark.read.parquet(s"$base/p2")))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(merged("k") === 11L, s"persisted+merged distinct estimate: $merged")
    assert(merged("v") === 40L)
    // KMV artifact: persisted per-half sketches merge to the whole's sketch
    d.filter(col("v") <= 20)
      .agg(KmvAgg.kmvSketch(col("k"), 64).as("sk")).write.parquet(s"$base/k1")
    d.filter(col("v") > 20)
      .agg(KmvAgg.kmvSketch(col("k"), 64).as("sk")).write.parquet(s"$base/k2")
    val a = spark.read.parquet(s"$base/k1").collect().head.getSeq[Long](0)
    val b = spark.read.parquet(s"$base/k2").collect().head.getSeq[Long](0)
    val whole = d.agg(KmvAgg.kmvSketch(col("k"), 64).as("sk"))
      .collect().head.getSeq[Long](0)
    val mergedSk = d.limit(1).select(KmvAgg.kmvMerge(
      typedLit(a), typedLit(b), 64).as("m")).collect().head.getSeq[Long](0)
    assert(mergedSk === whole)
    assert(whole.length === 11)
  }

  test("psiDrift: an empty reference baseline fails loudly, not as fake drift") {
    val ex = intercept[IllegalArgumentException] {
      DataQuality.psiDrift(vals(), vals(1.0, 2.0), "x", 4)
    }
    assert(ex.getMessage.contains("empty baseline"))
    // all-NULL reference is the same failure
    val allNull = LocalTable.of(spark, vSchema, Seq(Row(null), Row(null)))
    intercept[IllegalArgumentException] {
      DataQuality.psiDrift(allNull, vals(1.0), "x", 4)
    }
  }

  test("psiDrift: NULL values are excluded from both sides") {
    val d = LocalTable.of(spark, vSchema,
      Seq(Row(1.0), Row(3.0), Row(null)))
    val got = DataQuality.psiDrift(d, d, "x", 2).collect()
    assert(got.forall(_.getAs[Double]("psi") === 0.0))
    // shares reflect n=2, not n=3: bin share (2*1+1)/(2*2+2) = 0.5
    assert(got.forall(_.getAs[Double]("ref_share") === 0.5))
  }

  test("kAnonymityAudit: violating classes emitted with sizes, satisfied classes silent") {
    val schema = StructType(Seq(
      StructField("seg", StringType), StructField("zip", StringType)))
    val df = LocalTable.of(spark, schema, Seq(
      Row("A", "z1"), Row("A", "z1"), Row("A", "z1"),   // size 3 — ok at k=3
      Row("B", "z1"), Row("B", "z1"),                   // size 2 — violates
      Row("C", "z9")))                                  // size 1 — violates
    val got = DataQuality.kAnonymityAudit(df, Seq("seg", "zip"), k = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set(("B", "z1", 2L), ("C", "z9", 1L)))
    assert(DataQuality.kAnonymityAudit(df, Seq("seg", "zip"), k = 2)
      .collect().map(_.getLong(2)).toSeq === Seq(1L),
      "at k=2 only the singleton class violates")
    intercept[IllegalArgumentException] {
      DataQuality.kAnonymityAudit(df, Seq.empty, k = 3)
    }
    intercept[IllegalArgumentException] {
      DataQuality.kAnonymityAudit(df, Seq("seg"), k = 1)
    }
  }

  test("dpHistogram: seeded noise is replayable and seed-scoped; true counts never leave; noise bounded by the 60-bit tail") {
    import org.apache.spark.sql.functions.col
    val schema = StructType(Seq(
      StructField("src", StringType), StructField("lang", StringType)))
    val rows = (1 to 400).map(i =>
      Row(s"s${i % 8}", if (i % 3 == 0) "en" else "de"))
    val df = LocalTable.of(spark, schema, rows)
    val out = DataQuality.dpHistogram(df, Seq("src", "lang"), eps = 0.5,
      seed = "t")
    assert(out.columns.toSeq === Seq("src", "lang", "noisy_count", "eps"),
      "no true-count column in a DP release")
    val got = out.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    // replayable: same seed twice, and under any partitioning
    val again = DataQuality.dpHistogram(df.repartition(7), Seq("src", "lang"),
      eps = 0.5, seed = "t").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(again === got)
    // a different seed is an independent draw
    val other = DataQuality.dpHistogram(df, Seq("src", "lang"), eps = 0.5,
      seed = "t2").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(other !== got)
    // |ln u1 − ln u2|/ε ≤ 2·60·ln2/ε — every noisy count stays within it
    val truth = df.groupBy(col("src"), col("lang")).count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val bound = 2 * 60 * math.log(2) / 0.5
    for ((k, noisy) <- got)
      assert(math.abs(noisy - truth(k)) <= bound, s"$k: $noisy vs ${truth(k)}")
    intercept[IllegalArgumentException] {
      DataQuality.dpHistogram(df, Seq("src"), eps = 0.0, seed = "t")
    }
    intercept[IllegalArgumentException] {
      DataQuality.dpHistogram(df, Seq.empty, eps = 0.5, seed = "t")
    }
  }

  test("dpHistogram: the group key is injective — separator injection and NULLs cannot share a noise draw") {
    val schema = StructType(Seq(
      StructField("a", StringType), StructField("b", StringType)))
    // ("x|y", "z") and ("x", "y|z") would collide under naive 'a|b'
    // concatenation; (null, "q") and ("q", null) under null-skipping
    val df = LocalTable.of(spark, schema, Seq(
      Row("x|y", "z"), Row("x", "y|z"), Row(null, "q"), Row("q", null)))
    val out = DataQuality.dpHistogram(df, Seq("a", "b"), eps = 0.5, seed = "t")
      .collect()
    assert(out.length === 4, "four distinct groups")
    val noises = out.map(_.getDouble(2) - 1.0) // every true count is 1
    assert(noises.distinct.length === 4,
      s"each group must carry an independent draw: ${noises.toSeq}")
  }

  test("releaseDelta: statuses, per-source attribution, exact token accounting, partitioning invariance") {
    val relSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("source", StringType),
      StructField("text", StringType)))
    def rel(rows: (Long, String, String)*) = LocalTable.of(spark, relSchema,
      rows.map { case (i, s, t) => Row(i, s, t) })
    // v1: docs 1-4; v2 removes 2, changes 3 (+2 tokens) and 4 (-1 token,
    // source moved web->books: must count under v2's source), adds 5
    val v1 = rel(
      (1L, "web", "alpha beta"),
      (2L, "web", "gone now"),
      (3L, "books", "one two three"),
      (4L, "web", "x y z"),
      (6L, "web", ""))
    val v2 = rel(
      (1L, "web", "alpha beta"),
      (3L, "books", "one two three four five"),
      (4L, "books", "x y"),
      (5L, "books", "brand new doc"),
      (6L, "web", ""))
    val got = DataQuality.releaseDelta(v1, v2).collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8))).toMap
    // web: removed doc 2 (2 tokens); unchanged 1 and 6 (empty doc =
    //   unchanged, zero tokens); net = -2
    assert(got("web") === ((0L, 1L, 0L, 2L, 0L, 2L, 0L, -2L)), got("web"))
    // books: changed 3 (+2) and 4 (-1, attributed here via its NEW
    //   source); added 5 (3 tokens); net = 3 + 2 - 1 = 4
    assert(got("books") === ((1L, 0L, 2L, 0L, 3L, 0L, 1L, 4L)), got("books"))
    // partitioning invariance: the full-outer join and sums are
    // key-partitioned aggregates of exact integers
    val re = DataQuality.releaseDelta(v1.repartition(7), v2.repartition(3))
      .collect().map(r => r.getString(0) -> r.getLong(8)).toMap
    assert(re === got.map { case (k, v) => k -> v._8 })
  }
}
