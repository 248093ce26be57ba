package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.ext.Dedup

/** Ad-hoc A/B of the span-dedup duplicate-test shapes (window vs
  * precount) on SPARK_GRAFT_SF_DIR — used for the round-7 skew-stress
  * measurements recorded in NOTES.md. Not part of the driver contract. */
object SpanShapeBench {
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
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    // warmup (codegen + JIT) on a small slice
    Dedup.duplicatedSpans(docs.limit(500), 8).count()
    def time(label: String)(f: => Long): Unit = {
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }.minBy(_._1)
      println(f"$label%-28s ${best._1}%8.3f s   rows=${best._2}")
    }
    time("window")(Dedup.duplicatedSpans(docs, 8).count())
    time("precount")(
      Dedup.duplicatedSpans(docs, 8, precountFingerprints = true).count())
    time("window keepFirst")(
      Dedup.duplicatedSpans(docs, 8, keepFirst = true).count())
    time("precount keepFirst")(
      Dedup.duplicatedSpans(docs, 8, keepFirst = true,
        precountFingerprints = true).count())
    spark.stop()
  }
}
