package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.TopKPerGroup

/** The custom physical operator must compute exactly the window-rank
  * semantics, and its plan must actually be the custom exec. */
class TopKPerGroupSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"

  test("topKPerGroup == window row_number <= k (all groups, ties broken)") {
    val o = Tables(spark, sfDir, "orders")
      .select("o_custkey", "o_orderkey", "o_totalprice")
    val custom = TopKPerGroup.topKPerGroup(o,
        Seq(o("o_custkey")), Seq(TopKPerGroup.desc(o("o_totalprice")), TopKPerGroup.asc(o("o_orderkey"))), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val reference = o.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(custom === reference)
    assert(custom.nonEmpty)
  }

  test("k larger than any group returns everything") {
    val o = Tables(spark, sfDir, "orders").limit(100)
      .select("o_custkey", "o_orderkey", "o_totalprice")
    val n = TopKPerGroup.topKPerGroup(o,
      Seq(o("o_custkey")), Seq(TopKPerGroup.desc(o("o_totalprice"))), 1000).count()
    assert(n === 100)
  }

  test("plan uses TopKPerGroupExec, not Window") {
    val o = Tables(spark, sfDir, "orders")
      .select("o_custkey", "o_orderkey", "o_totalprice")
    val df = TopKPerGroup.topKPerGroup(o,
      Seq(o("o_custkey")), Seq(TopKPerGroup.desc(o("o_totalprice")), TopKPerGroup.asc(o("o_orderkey"))), 2)
    // the exec node renders by nodeName ("TopKPerGroup", Exec suffix stripped)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerGroup"), p.take(400))
    assert(!p.contains("Window"), p.take(400))
  }
}
