package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage-level timing of the kernel margin miner (dev only):
  * collects, pass A, pass B, each wall-timed separately. */
object MarginStageProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env("SPARK_GRAFT_SF_DIR")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val src = e.filter(col("vec_id") % 2 === 0)
    val tgt = e.filter(col("vec_id") % 2 === 1)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-16s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    for (round <- 1 to 2) {
      println(s"-- round $round --")
      val tgtRows = t("collect tgt")(tgt.collect())
      val srcRows = t("collect src")(src.collect())
      val srcEmbs = srcRows.map(_.getSeq[Float](1).toArray)
      val tgtEmbs = tgtRows.map(_.getSeq[Float](1).toArray)
      val par = spark.sparkContext.defaultParallelism
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vec_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("embedding",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType))))
      val tgtKnn = t("pass A")(graft.LocalTable.of(spark, schema,
          tgtRows.toIndexedSeq)
        .repartition(par)
        .select(col("vec_id"), graft.plans.KnnAvgMicrosExpr.knnAvgMicros(
          col("embedding"), srcEmbs, 4, rowIsLeft = false).as("tgt_knn"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap)
      val targets = new graft.plans.MarginTargetsRef(
        tgtRows.map(_.getLong(0)), tgtEmbs,
        tgtRows.map(r => tgtKnn(r.getLong(0))))
      val n = t("pass B")(src.repartition(par).select(col("vec_id").as("src_id"),
          graft.plans.MarginBestExpr.marginBest(
            col("embedding"), targets, 4, 1.02).as("__b"))
        .filter(col("__b").isNotNull).count())
      println(s"rows=$n")
    }
    spark.stop()
  }
}
