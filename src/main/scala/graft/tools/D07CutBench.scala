package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.ext.Dedup

/** Ad-hoc same-JVM alternating A/B of the d07 candidate-list lineage
  * cut: eager localCheckpoint (a job barrier before the verify stage)
  * vs lazy (one shared RDD, materialized inside the verify action).
  * Replicates minhashNearDupPairs' exact pipeline from its public
  * pieces. Not part of the driver contract. */
object D07CutBench {
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

    def run(eagerCut: Boolean): Long = {
      val bandRows = Dedup.minhashBandIndex(docs, 3, 96, 48, 2)
        .localCheckpoint(false)
      val cands = Dedup.lshCandidatePairs(bandRows, Dedup.DefaultBucketCap)
        .localCheckpoint(eagerCut)
      Dedup.verifyJaccardPairs(docs, cands, 3, 0.5).count()
    }
    // warmup both shapes (codegen + JIT)
    val w = docs.limit(500).localCheckpoint(true)
    Seq(true, false).foreach { e =>
      val b = Dedup.minhashBandIndex(w, 3, 96, 48, 2).localCheckpoint(false)
      Dedup.verifyJaccardPairs(w,
        Dedup.lshCandidatePairs(b, Dedup.DefaultBucketCap).localCheckpoint(e),
        3, 0.5).count()
    }
    val times = collection.mutable.Map[Boolean, List[Double]]()
      .withDefaultValue(Nil)
    for (i <- 1 to 3; eager <- Seq(true, false)) {
      val t0 = System.nanoTime(); val n = run(eager)
      val s = (System.nanoTime() - t0) / 1e9
      times(eager) ::= s
      println(f"pass $i eager=$eager%-5s $s%8.3f s  rows=$n")
    }
    println(f"MIN eager=${times(true).min}%.3f s  lazy=${times(false).min}%.3f s")
    spark.stop()
  }
}
