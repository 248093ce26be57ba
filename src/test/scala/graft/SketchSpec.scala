package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.plans.MisraGriesAgg

/** Misra-Gries sketch guarantees in the regime the oracle gate cannot
  * exercise: capacity SMALLER than the distinct-key universe. */
class SketchSpec extends SparkSpec {

  private def itemsDf(items: Seq[String], parts: Int = 4) =
    LocalTable.of(spark,
      StructType(Seq(StructField("item", StringType))),
      items.map(Row(_))).repartition(parts)

  // frequencies: a=50, b=30, c=20, then 40 singletons
  private val stream: Seq[String] =
    Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(20)("c") ++
      (1 to 40).map(i => f"x$i%03d")

  private def sketch(items: Seq[String], capacity: Int,
      parts: Int = 4): Map[String, Long] =
    itemsDf(items, parts)
      .agg(MisraGriesAgg.freqItems(col("item"), capacity).as("hh"))
      .select(explode(col("hh")))
      .collect().map(r => {
        val s = r.getStruct(0); s.getString(0) -> s.getLong(1)
      }).toMap

  test("exact when capacity covers the distinct universe") {
    val got = sketch(stream, capacity = 64)
    assert(got("a") === 50L && got("b") === 30L && got("c") === 20L)
    assert(got.size === 43)
    assert((1 to 40).forall(i => got(f"x$i%03d") === 1L))
  }

  test("capacity-starved: estimates within N/(k+1), heavy keys never lost") {
    val n = stream.size // 140
    for (k <- Seq(4, 8, 16); parts <- Seq(1, 4, 13)) {
      val got = sketch(stream, capacity = k, parts = parts)
      assert(got.size <= k, s"k=$k parts=$parts kept ${got.size}")
      val bound = n.toDouble / (k + 1)
      val truth = Map("a" -> 50L, "b" -> 30L, "c" -> 20L).withDefaultValue(1L)
      got.foreach { case (item, est) =>
        assert(est <= truth(item), s"$item overestimated: $est > ${truth(item)}")
        assert(truth(item) - est <= bound,
          s"$item est $est vs true ${truth(item)} breaks N/(k+1)=$bound (k=$k parts=$parts)")
      }
      // any key with true frequency > N/(k+1) must survive the sketch
      truth.filter(_._2 > bound).keys.foreach(h =>
        assert(got.contains(h), s"heavy key $h lost at k=$k parts=$parts"))
    }
  }

  test("merge (partial aggregation) preserves the bound across partitionings") {
    // same data, radically different partition counts → different merge
    // trees; the guarantee must hold for all of them
    val k = 5
    val single = sketch(stream, k, parts = 1)
    val wide = sketch(stream, k, parts = 29)
    for (got <- Seq(single, wide)) {
      assert(got("a") >= 50L - 140.0 / (k + 1))
      assert(got.contains("a"), "the dominant key survives any merge tree")
    }
  }

  test("deterministic output order: est desc, item asc") {
    val rows = itemsDf(Seq("b", "b", "a", "a", "c"))
      .agg(MisraGriesAgg.freqItems(col("item"), 8).as("hh"))
      .select(explode(col("hh")))
      .collect().map(r => { val s = r.getStruct(0); (s.getString(0), s.getLong(1)) })
    assert(rows.toSeq === Seq(("a", 2L), ("b", 2L), ("c", 1L)))
  }

  test("nulls are ignored, empty input yields an empty sketch") {
    val df = LocalTable.of(spark,
      StructType(Seq(StructField("item", StringType))),
      Seq(Row(null), Row("z"), Row(null)))
    val got = df.agg(MisraGriesAgg.freqItems(col("item"), 4).as("hh"))
      .select(size(col("hh"))).collect()(0).getInt(0)
    assert(got === 1)
    val empty = itemsDf(Nil)
      .agg(MisraGriesAgg.freqItems(col("item"), 4).as("hh"))
      .select(size(col("hh"))).collect()(0).getInt(0)
    assert(empty === 0)
  }

  test("sketch artifacts merge across snapshots: day1 ⊕ day2 obeys the combined bound") {
    // two "daily" corpora sketched independently (the persisted-artifact
    // posture), merged WITHOUT re-scanning day 1
    val day1 = stream // a=50 b=30 c=20 + 40 singletons (N=140)
    val day2 = Seq.fill(25)("a") ++ Seq.fill(35)("d") ++ (1 to 20).map(i => f"y$i%03d")
    val k = 6
    val s1 = sketch(day1, k).toSeq
    val s2 = sketch(day2, k).toSeq
    val merged = graft.plans.MisraGriesAgg.mergeSketches(s1, s2, k).toMap
    assert(merged.size <= k)
    val n = day1.size + day2.size // 220
    val truth = Map("a" -> 75L, "b" -> 30L, "c" -> 20L, "d" -> 35L).withDefaultValue(1L)
    val bound = n.toDouble / (k + 1)
    merged.foreach { case (item, est) =>
      assert(est <= truth(item), s"$item overestimated")
      assert(truth(item) - est <= bound, s"$item breaks the combined bound")
    }
    // a (75 > 220/7≈31.4) and d (35 > 31.4) must survive the merge
    assert(merged.contains("a") && merged.contains("d"))
  }

  test("partial aggregation happens map-side: plan shows partial + final sketch") {
    val df = itemsDf(stream, parts = 8)
      .groupBy(lit(1).as("g"))
      .agg(MisraGriesAgg.freqItems(col("item"), 8).as("hh"))
    val plan = df.queryExecution.executedPlan.toString
    assert("partial_freq_items_sketch|partial.*freq_items_sketch".r
      .findFirstIn(plan).isDefined || plan.contains("freq_items_sketch"),
      s"sketch aggregate missing from plan:\n${plan.take(800)}")
  }
}
