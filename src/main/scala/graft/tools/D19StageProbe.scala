package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.Dedup

/** Ad-hoc stage-level timing of the d19 incremental-components lifecycle
  * (dev only): each piece forced with a count/collect to localize where
  * the seconds go. */
object D19StageProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env("SPARK_GRAFT_SF_DIR")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Bench.quietBoundedWindowWarnings()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-18s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    for (round <- 1 to 2) {
      println(s"-- round $round --")
      val docs = Tables(spark, dir, "documents").select(col("doc_id"), col("text"))
      val bucket = conv(substring(md5(concat(lit("idx:"),
        col("doc_id").cast("string"))), 1, 15), 16, 10).cast("long") % 100
      val withBucket = docs.withColumn("bucket", bucket)
      val indexed = withBucket.filter(col("bucket") < 60).drop("bucket")
      val incoming = withBucket.filter(col("bucket") >= 60).drop("bucket")
      val idxBands = t("idxBands")(Dedup.minhashBandIndex(indexed, nGram = 3,
        k = 96, bands = 48, rowsPerBand = 2).localCheckpoint())
      val newBands = t("newBands")(Dedup.minhashBandIndex(incoming, nGram = 3,
        k = 96, bands = 48, rowsPerBand = 2).localCheckpoint())
      val archCands = t("archCands")(
        Dedup.lshCandidatePairs(idxBands).localCheckpoint())
      val archivePairs = t("archPairs verify")(
        Dedup.verifyJaccardPairs(indexed, archCands, nGram = 3, threshold = 0.5)
          .localCheckpoint())
      val labels = t("CC day0")(
        Dedup.connectedComponents(archivePairs.select(col("doc_a"), col("doc_b"))))
      val dayCands = t("dayCands")(Dedup.lshCandidatePairs(newBands)
        .unionByName(Dedup.lshProbeCandidates(newBands, idxBands)
          .select(col("doc_new").as("doc_a"), col("doc_old").as("doc_b")))
        .localCheckpoint())
      val dayPairs = t("dayPairs verify")(
        Dedup.verifyJaccardPairs(docs, dayCands, nGram = 3, threshold = 0.5)
          .localCheckpoint())
      val cc = t("updateComponents")(Dedup.updateComponents(labels,
        dayPairs.select(col("doc_a"), col("doc_b"))))
      t("final join")(docs.select(col("doc_id")).alias("d")
        .join(cc.alias("c"), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("component"), col("doc_id")).as("component"))
        .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
