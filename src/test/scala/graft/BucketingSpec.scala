package graft

import org.apache.spark.sql.functions._

/** Bucketed-table co-located join (the reference's Iceberg `F.bucket`
  * transform analogue, SURVEY §4 shuffle/partitioning row): writing both
  * join sides bucketed+sorted by the join key lets the sort-merge join
  * run with ZERO Exchange — the decisive layout optimization for
  * repeatedly-joined 100 TB fact tables. */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans without a shuffle") {
    val sfDir = "/root/testdata/sf0.001"
    // clean any leftover managed-table locations from aborted runs
    Seq("b_orders", "b_lineitem").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) scala.reflect.io.Directory(loc).deleteRecursively()
    }

    Tables(spark, sfDir, "orders")
      .write.mode("overwrite")
      .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("b_orders")
    Tables(spark, sfDir, "lineitem")
      .write.mode("overwrite")
      .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("b_lineitem")

    // the broadcast path would hide the bucketing win on tiny data — the
    // merge hint must sit on a JOIN INPUT to force sort-merge
    val joined = spark.table("b_lineitem").hint("merge")
      .join(spark.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(round(sum(col("l_extendedprice")), 2).as("v"))

    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the join itself must consume bucketed scans directly: the only
    // allowed exchange is the final single-key aggregation
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).toSeq
    assert(plan.contains("SortMergeJoin"), plan.take(600))
    assert(exchanges.length <= 1, s"${exchanges.length} exchanges:\n${plan.take(1000)}")
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey"), plan.take(1000))
    assert(!plan.contains("Exchange hashpartitioning(o_orderkey"), plan.take(1000))

    // row-level equivalence with the unbucketed join
    val reference = Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(round(sum(col("l_extendedprice")), 2).as("v"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    val got = joined.collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(got === reference)

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }
}
