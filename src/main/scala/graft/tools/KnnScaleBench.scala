package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** Ad-hoc scaling check of the kNN classifiers on SPARK_GRAFT_SF_DIR:
  * brute-force vs fixed-k IVF (nCentroids=16 — the pre-round-15 gate
  * sizing, kept as the degradation baseline) vs √-sized IVF
  * (nCentroids ∝ √|seed| — what the gate now runs via
  * Similarity.SqrtGridCentroids, plus the wider nProbe=8 probe).
  * Not part of the driver contract. */
object KnnScaleBench {
  def main(args: Array[String]): Unit = {
    val dir = sys.env("SPARK_GRAFT_SF_DIR")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "24g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val bucket = conv(substring(md5(concat(lit("lbl:"),
      col("vec_id").cast("string"))), 1, 15), 16, 10).cast("long") % 100
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"), col("label"))
      .withColumn("bucket", bucket).localCheckpoint()
    val labeled = e.filter(col("bucket") < 80).drop("bucket")
    val unlabeled = e.filter(col("bucket") >= 80).drop("bucket", "label")
    val nSeed = labeled.count()
    val sqrtC = math.max(16, math.sqrt(nSeed.toDouble).toInt)
    println(s"seed=$nSeed unlabeled=${unlabeled.count()} sqrtCentroids=$sqrtC")
    def time(label: String)(f: => Long): Unit = {
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }.minBy(_._1)
      println(f"$label%-24s ${best._1}%8.3f s   rows=${best._2}")
    }
    time("brute")(Similarity.knnClassify(labeled, unlabeled, 5).count())
    time("ivf16/4 (fixed-k)")(Similarity.knnClassifyIvf(
      labeled, unlabeled, 5, nCentroids = 16, nProbe = 4, kmeansIters = 0).count())
    time(s"ivf$sqrtC/8 (scaled)")(Similarity.knnClassifyIvf(
      labeled, unlabeled, 5, nCentroids = sqrtC, nProbe = 8, kmeansIters = 0).count())
    spark.stop()
  }
}
