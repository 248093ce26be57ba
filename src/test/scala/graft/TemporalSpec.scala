package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Temporal

/** Funnel + retention-cohort semantics on synthetic event streams —
  * the oracle gate (q50/q51) proves corpus agreement with DuckDB; these
  * pin the edge semantics the corpus may never exercise. */
class TemporalSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("user_id", LongType),
    StructField("ts_us", LongType),
    StructField("event_type", StringType)))

  private def events(rows: (Long, Long, String)*) =
    LocalTable.of(spark, schema,
      rows.map { case (u, t, e) => Row(u, t, e) })

  private def row(df: org.apache.spark.sql.DataFrame, user: Long): Row =
    df.filter(col("user_id") === user).collect()(0)

  test("funnel: greedy-earliest ordered matching per user") {
    val f = Temporal.funnel(events(
      // u1 completes all three in order
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      // u2: click precedes the first view — stage 2 never completes even
      // though a click exists; the later purchase cannot count either
      (2L, 10L, "click"), (2L, 20L, "view"), (2L, 30L, "purchase"),
      // u3: greedy takes the FIRST view (5) then first click AFTER it (15),
      // not the later view/click pair
      (3L, 5L, "view"), (3L, 15L, "click"), (3L, 40L, "view"), (3L, 50L, "click")),
      Seq("view", "click", "purchase"))
    val r1 = row(f, 1L)
    assert((r1.getLong(1), r1.getLong(2), r1.getLong(3), r1.getInt(4)) === ((10L, 20L, 30L, 3)))
    val r2 = row(f, 2L)
    assert(r2.getLong(1) === 20L)
    assert(r2.isNullAt(2) && r2.isNullAt(3))
    assert(r2.getInt(4) === 1)
    val r3 = row(f, 3L)
    assert((r3.getLong(1), r3.getLong(2)) === ((5L, 15L)))
    assert(r3.getInt(4) === 2)
  }

  test("funnel: strict ordering — a tie does not advance the stage") {
    val f = Temporal.funnel(events(
      (1L, 10L, "view"), (1L, 10L, "click"), (1L, 11L, "click")),
      Seq("view", "click"))
    val r = row(f, 1L)
    // the click at ts==10 is NOT strictly after the view; the one at 11 is
    assert(r.getLong(2) === 11L)
  }

  test("funnel: user with no first-step events still appears, zero stages") {
    val f = Temporal.funnel(events((1L, 10L, "purchase")),
      Seq("view", "click", "purchase"))
    val r = row(f, 1L)
    assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
    assert(r.getInt(4) === 0)
  }

  test("funnel: generalizes beyond three steps") {
    val f = Temporal.funnel(events(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "c"), (1L, 4L, "d"),
      (2L, 1L, "a"), (2L, 2L, "b"), (2L, 3L, "d")),
      Seq("a", "b", "c", "d"))
    assert(row(f, 1L).getInt(5) === 4)
    val r2 = row(f, 2L)
    // u2 skips c: the d at ts=3 cannot count without a completed c
    assert(r2.getInt(5) === 2)
    assert(r2.isNullAt(3) && r2.isNullAt(4))
  }

  test("funnel: conversion window bounds every later stage against stage 1") {
    val es = events(
      // u1 converts fully inside the window
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      // u2's purchase lands past view+window — stage 3 must not count
      (2L, 10L, "view"), (2L, 20L, "click"), (2L, 200L, "purchase"),
      // u3's click itself is outside the window — stuck at stage 1
      (3L, 10L, "view"), (3L, 150L, "click"), (3L, 160L, "purchase"))
    val f = Temporal.funnel(es, Seq("view", "click", "purchase"),
      withinUs = Some(50L))
    assert(row(f, 1L).getInt(4) === 3)
    assert(row(f, 2L).getInt(4) === 2)
    assert(row(f, 3L).getInt(4) === 1)
    // no window → all three convert eventually
    val unbounded = Temporal.funnel(es, Seq("view", "click", "purchase"))
    assert(Seq(1L, 2L, 3L).map(row(unbounded, _).getInt(4)) === Seq(3, 3, 3))
    intercept[IllegalArgumentException](
      Temporal.funnel(es, Seq("view"), withinUs = Some(0L)))
  }

  test("retention cohorts: gate query shape on the corpus") {
    val got = Temporal.q51RetentionCohorts.run(spark, "/root/testdata/sf0.001")
      .collect()
    // offset 0 row exists for every cohort day and counts its own cohort
    val day0 = got.filter(_.getInt(1) == 0).map(_.getLong(2)).sum
    val users = Tables(spark, "/root/testdata/sf0.001", "events")
      .select(col("user_id")).distinct().count()
    assert(day0 === users, "every user is active on their own cohort day")
    // no negative offsets by construction
    assert(got.forall(_.getInt(1) >= 0))
  }

  private val transSchema = StructType(Seq(
    StructField("user_id", LongType),
    StructField("ts_us", LongType),
    StructField("event_id", LongType),
    StructField("event_type", StringType)))

  private def transEvents(rows: (Long, Long, Long, String)*) =
    LocalTable.of(spark, transSchema,
      rows.map { case (u, t, i, e) => Row(u, t, i, e) })

  test("eventTransitions: per-user consecutive pairs, probabilities per prev state") {
    val t = Temporal.eventTransitions(
      transEvents(
        (1L, 10L, 1L, "v"), (1L, 20L, 2L, "c"),
        (1L, 30L, 3L, "v"), (1L, 40L, 4L, "c"),
        (2L, 10L, 5L, "c"), (2L, 20L, 6L, "p")),
      tsCol = "ts_us")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(t((("v", "c"))) === ((2L, 1.0)))
    assert(t((("c", "v"))) === ((1L, 0.5)))
    assert(t((("c", "p"))) === ((1L, 0.5)))
    // u1's last event and u2's first event never pair up across users
    assert(t.size === 3)
  }

  test("topPaths: 3-step windows per user, counts, k cap and deterministic cut") {
    // u1: a b c d → paths (a,b,c), (b,c,d); u2: a b c → (a,b,c); u3: x y (too short)
    val df = transEvents(
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"), (1L, 30L, 3L, "c"), (1L, 40L, 4L, "d"),
      (2L, 10L, 5L, "a"), (2L, 20L, 6L, "b"), (2L, 30L, 7L, "c"),
      (3L, 10L, 8L, "x"), (3L, 20L, 9L, "y"))
    val out = Temporal.topPaths(df, k = 10, tsCol = "ts_us")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq === Seq(("a", "b", "c", 2L), ("b", "c", "d", 1L)))
    // k caps the cut; the tie between the two n=1 paths breaks lexicographically
    val top1 = Temporal.topPaths(df, k = 1, tsCol = "ts_us").collect()
    assert(top1.length === 1 && top1(0).getString(0) === "a")
  }

  test("trailingRangeSum: value-based frame includes peers, excludes out-of-window rows") {
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts_us", LongType),
      StructField("value", DoubleType)))
    val df = LocalTable.of(spark, schema, Seq(
      Row(1L, 0L, 1.0), Row(1L, 50L, 2.0), Row(1L, 50L, 4.0), // peers at 50
      Row(1L, 100L, 8.0),  // window 100: includes ts 0 (boundary inclusive)
      Row(1L, 201L, 16.0), // 201-100=101: ts-100 rows out, only itself
      Row(2L, 60L, 32.0))) // other user isolated
    val got = graft.operators.Temporal
      .trailingRangeSum(df, windowUs = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(x => (x._1, x._2))
    // SQL RANGE semantics: peers (same ts) share one frame — BOTH ts=50
    // rows see 1+2+4=7
    assert(got.toSeq === Seq(
      (1L, 0L, 1.0), (1L, 50L, 7.0), (1L, 50L, 7.0),
      (1L, 100L, 15.0), (1L, 201L, 16.0), (2L, 60L, 32.0)))
  }

  test("rankDistributions: peer groups share percent_rank and cume_dist") {
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", DoubleType)))
    val df = LocalTable.of(spark, schema, Seq(
      Row(1L, 10.0), Row(2L, 10.0), Row(3L, 5.0)))
    val got = graft.operators.Temporal.rankDistributions(df, "k", "v")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(2), r.getDouble(3)))).toMap
    // DESC order: the two 10s are peers (rank 1, 2 of them), 5 is rank 3
    assert(got(1L) === ((0.0, 2.0 / 3.0)))
    assert(got(2L) === ((0.0, 2.0 / 3.0)))
    assert(got(3L) === ((1.0, 1.0)))
    // single row: percent_rank is defined as 0, cume_dist as 1
    val one = graft.operators.Temporal.rankDistributions(
      LocalTable.of(spark, schema, Seq(Row(9L, 1.0))), "k", "v")
      .collect()(0)
    assert((one.getDouble(2), one.getDouble(3)) === ((0.0, 1.0)))
  }

  test("eventTransitions: single-event users emit nothing; ties order by event_id") {
    val t = Temporal.eventTransitions(
      transEvents(
        (1L, 10L, 2L, "a"), (1L, 10L, 1L, "b"), // same ts: order is b (id 1) → a (id 2)
        (2L, 99L, 3L, "z")),
      tsCol = "ts_us")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(t === Map(("b", "a") -> 1L))
  }

  test("anomalyZScores: exclusive trailing frame, minObs/zero-variance skips, per-key isolation") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("k", StringType), StructField("day", LongType),
      StructField("cnt", LongType)))
    val a = Seq(10L, 12L, 11L, 10L, 13L, 11L, 12L, 100L, 11L)
    val rows =
      a.zipWithIndex.map { case (v, i) => Row("a", (i + 1).toLong, v) } ++
        // key b: constant baseline -> zero variance everywhere -> no rows
        (1 to 6).map(d => Row("b", d.toLong, 7L)) ++
        // key c: too little history -> below minObs everywhere
        Seq(Row("c", 1L, 1L), Row("c", 2L, 2L), Row("c", 3L, 3L))
    val got = Temporal.anomalyZScores(
      LocalTable.of(spark, schema, rows), "k", "day", "cnt")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getDouble(3), r.getBoolean(4))).toMap
    assert(got.keySet.forall(_._1 == "a"), "b (var=0) and c (minObs) emit nothing")
    // days 1-3 lack history; day 4 is the first scored point
    assert(got.keySet.map(_._2) === Set(4L, 5L, 6L, 7L, 8L, 9L))
    assert(got(("a", 4L))._1 === -1.0) // frame [10,12,11]: mu=11, var=1
    val (z8, flag8) = got(("a", 8L))
    assert(z8 > 70 && flag8, "the 100-count spike z-scores far past the threshold")
    val (z9, flag9) = got(("a", 9L))
    // day 9's frame CONTAINS the spike (inflating sd) but isn't one itself
    assert(math.abs(z9) < 1 && !flag9)
    val (z5, flag5) = got(("a", 5L))
    assert(z5 > 2.0 && flag5, "13 vs tight [10,12,11,10] baseline crosses 2 sigma")
  }

  test("q62 winsorize shape: R-7 percentile clipping on a hand series") {
    import org.apache.spark.sql.types._
    // replicate the q62 pipeline on a known series: 1..19 plus outlier 1000
    val schema = StructType(Seq(
      StructField("event_type", StringType), StructField("value", DoubleType)))
    val rows = ((1 to 19).map(_.toDouble) :+ 1000.0).map(v => Row("A", v))
    val ev0 = LocalTable.of(spark, schema, rows)
    val pct = ev0.groupBy(col("event_type")).agg(
      percentile(col("value"), lit(0.05)).as("p05"),
      percentile(col("value"), lit(0.95)).as("p95"))
    val got = ev0.join(broadcast(pct), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(count(when(col("value") < col("p05") ||
          col("value") > col("p95"), lit(1))).as("n_clipped"),
        round(min(col("p05")), 6).as("p05"),
        round(min(col("p95")), 6).as("p95"),
        round(sum(greatest(col("p05"), least(col("p95"), col("value")))), 2)
          .as("sum_winsorized"))
      .collect()(0)
    // R-7 on 20 values: p05 → 1.95, p95 → 19 + 0.05·(1000−19) = 68.05
    assert(got.getLong(1) === 2L)        // the 1 (below p05) and the 1000
    assert(got.getDouble(2) === 1.95)
    assert(got.getDouble(3) === 68.05)
    assert(got.getDouble(4) === 259.0)   // 1.95 + Σ(2..19) + 68.05
  }

  test("trailingEwma: hand-computed decay, window truncation, per-user isolation") {
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("ts_us", LongType), StructField("value", DoubleType)))
    val df = LocalTable.of(spark, schema, Seq(
      Row(1L, 1L, 10L, 1.0), Row(2L, 1L, 20L, 2.0), Row(3L, 1L, 30L, 4.0),
      Row(9L, 2L, 10L, 8.0)))
    val got = Temporal.trailingEwma(df, alpha = 0.5, window = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(1L) === 0.5)    // 1·0.5
    assert(got(2L) === 1.25)   // 2·0.5 + 1·0.5·0.5
    assert(got(3L) === 2.5)    // 4·0.5 + 2·0.25 — the 1.0 truncated out
    assert(got(9L) === 4.0)    // other user unaffected
    // untruncated window: full recursion (α=0.5): e3 = 4·0.5+2·0.25+1·0.125
    val full = Temporal.trailingEwma(df, alpha = 0.5, window = 50)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(full(3L) === 2.625)
  }
}
