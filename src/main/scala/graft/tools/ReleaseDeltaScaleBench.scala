package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.DataQuality
import graft.streaming.ReleaseDeltaStreaming

/** Ad-hoc scaling check of the release-delta card on SPARK_GRAFT_SF_DIR:
  * the batch full-outer operator vs the streamed posture (N disjoint
  * admissions into sources-sized state + report-by-subtraction). Run at
  * sf0.1 and at the 10× tmp/sf1 corpus to confirm both paths scale with
  * the corpus (one doc_id-keyed join per batch/admission; state and
  * report stay sources-sized). Not part of the driver contract. */
object ReleaseDeltaScaleBench {
  def main(args: Array[String]): Unit = {
    val dir = sys.env("SPARK_GRAFT_SF_DIR")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val batches = sys.env.getOrElse("SPARK_GRAFT_DELTA_BATCHES", "4").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // EXACTLY the gated releases (d94/d95): measuring a hand-copied
    // recipe would silently drift from the shipped operators
    val (v1, v2) = DataQuality.syntheticReleases(spark, dir)
    println(s"v1=${v1.count()} v2=${v2.count()}")
    def time(label: String)(f: => Long): Unit = {
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }.minBy(_._1)
      println(f"$label%-28s ${best._1}%8.3f s   rows=${best._2}")
    }
    time("batch full-outer")(
      DataQuality.releaseDelta(v1, v2.drop("bucket")).count())
    def streamed(): Long = {
      val root = java.nio.file.Files
        .createTempDirectory("graft-reldelta-scale-").toString
      val statePath = s"$root/state"
      val span = 95.0 / batches
      (0 until batches).foreach { i =>
        val lo = 5 + span * i
        val hi = if (i == batches - 1) 100.0 else 5 + span * (i + 1)
        ReleaseDeltaStreaming.admitBatch(
          v2.filter(col("bucket") >= lo && col("bucket") < hi).drop("bucket"),
          i.toLong, v1, statePath)
      }
      ReleaseDeltaStreaming.releaseDeltaFromState(
        ReleaseDeltaStreaming.currentState(spark, statePath), v1).count()
    }
    time(s"streamed ($batches admissions)")(streamed())
    spark.stop()
  }
}
