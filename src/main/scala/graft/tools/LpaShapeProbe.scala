package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.Graph

/** Ad-hoc A/B of the two d53 label-propagation round shapes (dev only):
  * the round-15 single-exchange form (repartition(dst) + two
  * same-partition aggregates, raw join rows shuffled) vs the pre-r15
  * form (map-side-combined vote aggregate + row_number window, two
  * exchanges). Alternating min-of-N per the repo's A/B protocol. */
object LpaShapeProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env("SPARK_GRAFT_SF_DIR")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def edges = Graph.tradeEdges(
      graft.Tables(spark, dir, "orders"), graft.Tables(spark, dir, "lineitem"))

    def oldShape(edgesDf: DataFrame, iters: Int): DataFrame = {
        def cut(df: DataFrame): DataFrame = df.localCheckpoint()
        val e = cut(edgesDf.select(col("src"), col("dst")))
        val nodes = cut(e.select(col("src").as("node"))
          .union(e.select(col("dst").as("node"))).distinct())
        var labels = nodes.withColumn("label", col("node"))
        for (_ <- 1 to iters) {
          val votes = e
            .join(labels.withColumnRenamed("node", "src"), Seq("src"))
            .groupBy(col("dst").as("node"), col("label"))
            .agg(count(lit(1)).as("votes"))
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col("node"))
            .orderBy(col("votes").desc, col("label").asc)
          labels = cut(votes
            .withColumn("__rn", row_number().over(w))
            .filter(col("__rn") === 1)
            .select(col("node"), col("label")))
        }
        labels.select(col("node"), col("label").as("community"))
    }

    // hybrid: map-side-combined vote aggregate (its own (dst,label)
    // exchange) + min-struct winner (second, skinny exchange; no sort)
    def hybridShape(edgesDf: DataFrame, iters: Int): DataFrame = {
        def cut(df: DataFrame): DataFrame = df.localCheckpoint()
        val e = cut(edgesDf.select(col("src"), col("dst")))
        val nodes = cut(e.select(col("src").as("node"))
          .union(e.select(col("dst").as("node"))).distinct())
        var labels = nodes.withColumn("label", col("node"))
        for (_ <- 1 to iters) {
          val votes = e
            .join(labels.withColumnRenamed("node", "src"), Seq("src"))
            .groupBy(col("dst").as("node"), col("label"))
            .agg(count(lit(1)).as("votes"))
          labels = cut(votes
            .groupBy(col("node"))
            .agg(min(struct((-col("votes")).as("nv"), col("label").as("l")))
              .getField("l").as("label")))
        }
        labels.select(col("node"), col("label").as("community"))
    }

    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); val n = f
      require(n > 0); (System.nanoTime() - t0) / 1e9
    }
    // warmup both
    Graph.labelPropagation(edges, 2).write.format("noop").mode("overwrite").save()
    oldShape(edges, 2).write.format("noop").mode("overwrite").save()
    hybridShape(edges, 2).write.format("noop").mode("overwrite").save()
    val rounds = sys.env.getOrElse("PROBE_ROUNDS", "4").toInt
    var newBest = Double.MaxValue
    var oldBest = Double.MaxValue
    var hybBest = Double.MaxValue
    for (r <- 1 to rounds) {
      val tNew = time { Graph.labelPropagation(edges, 2)
        .write.format("noop").mode("overwrite").save(); 1L }
      val tOld = time { oldShape(edges, 2)
        .write.format("noop").mode("overwrite").save(); 1L }
      val tHyb = time { hybridShape(edges, 2)
        .write.format("noop").mode("overwrite").save(); 1L }
      newBest = math.min(newBest, tNew)
      oldBest = math.min(oldBest, tOld)
      hybBest = math.min(hybBest, tHyb)
      println(f"round $r: new=$tNew%.3f old=$tOld%.3f hybrid=$tHyb%.3f")
    }
    println(f"BEST new=$newBest%.3f old=$oldBest%.3f hybrid=$hybBest%.3f")
    // sanity: identical results
    val a = Graph.labelPropagation(edges, 2).collect().map(_.toSeq).toSet
    val b = oldShape(edges, 2).collect().map(_.toSeq).toSet
    val c = hybridShape(edges, 2).collect().map(_.toSeq).toSet
    println(s"results_equal=${a == b && b == c}")
    spark.stop()
  }
}
