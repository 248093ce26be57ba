package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** Ad-hoc scaling check of the margin miners on SPARK_GRAFT_SF_DIR:
  * dense cross-matrix vs fixed-k IVF (nCentroids=16 — the pre-round-15
  * gate sizing, kept as the degradation baseline) vs √-sized IVF
  * (nCentroids ∝ √side — constant list occupancy, so candidates per
  * query stay bounded as the corpus grows; what the gate now runs via
  * Similarity.SqrtGridCentroids). Not part of the driver contract; set
  * SPARK_GRAFT_SKIP_DENSE=1 to skip the quadratic baseline at large
  * sf. */
object MarginScaleBench {
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
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val src = e.filter(col("vec_id") % 2 === 0)
    val tgt = e.filter(col("vec_id") % 2 === 1)
    val side = src.count()
    val sqrtC = math.max(16, math.sqrt(side.toDouble).toInt)
    println(s"side=$side sqrtCentroids=$sqrtC")
    def time(label: String)(f: => Long): Unit = {
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }.minBy(_._1)
      println(f"$label%-24s ${best._1}%8.3f s   rows=${best._2}")
    }
    if (sys.env.get("SPARK_GRAFT_SKIP_DENSE").isEmpty)
      time("dense")(Similarity.marginMine(src, tgt, 4, 1.02).count())
    time("ivf16/4 (fixed-k)")(Similarity.marginMineIvf(src, tgt, 4, 1.02,
      nCentroids = 16, nProbe = 4, kmeansIters = 0).count())
    time(s"ivf$sqrtC/4 (sqrt-N)")(Similarity.marginMineIvf(src, tgt, 4, 1.02,
      nCentroids = sqrtC, nProbe = 4, kmeansIters = 0).count())
    spark.stop()
  }
}
