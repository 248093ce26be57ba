package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Retrieval

/** Same-JVM alternating A/B of the s09 BM25 shapes: postings-build cost
  * alone, the materialized-index query, and the fully-lazy variant —
  * `runMain graft.tools.Bm25ShapeBench [sfDir]`. */
object Bm25ShapeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val bucket = (conv(substring(md5(concat(lit("qry:"),
      col("doc_id").cast("string"))), 1, 15), 16, 10).cast("long") % 100)
    def docs = graft.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), bucket.as("bucket"))
    def corpus = docs.filter(col("bucket") < 95).select(col("doc_id"), col("text"))
    def queries = docs.filter(col("bucket") >= 95)
      .select(col("doc_id").as("query_id"),
        concat_ws(" ", slice(graft.ext.TextStats.tokens(col("text")), 1, 6)).as("text"))
      .filter(length(col("text")) > 0)

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warmup
    noop(Retrieval.bm25TopK(corpus, queries, 5))
    val variants = Seq[(String, () => Unit)](
      "postings_build" -> (() => { Retrieval.postings(corpus).localCheckpoint(); () }),
      "materialized" -> (() => noop(Retrieval.bm25TopK(corpus, queries, 5))),
      "lazy" -> (() => noop(
        Retrieval.bm25TopK(corpus, queries, 5, materializeIndex = false))))
    val mins = collection.mutable.Map[String, Double]().withDefaultValue(Double.MaxValue)
    for (_ <- 1 to 3; (name, f) <- variants) {
      val t = time(f())
      mins(name) = math.min(mins(name), t)
      println(f"$name%-15s $t%.3f")
    }
    println("== mins == " + mins.toSeq.sortBy(_._1)
      .map { case (n, t) => f"$n=$t%.3f" }.mkString(" "))
    spark.stop()
  }
}
