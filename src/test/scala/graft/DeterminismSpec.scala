package graft

import org.apache.spark.sql.DataFrame

import graft.ext.{Dedup, TextStats}

/** Repeated-run determinism for the token-surgery rebuild family (d38
  * rare-token scrub, d44 span corruption, d22 span scrub): same input
  * under five different physical regimes — input partitionings 1/3/7/32
  * and a different shuffle-partition count — must produce byte-identical
  * result sets. This pins the [[TextStats.positionalRebuild]] contract:
  * collect_list's arrival order varies with partitioning, and the
  * canonical array_sort must erase that variance completely. */
class DeterminismSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def docs: DataFrame =
    Tables(spark, sfDir, "documents").select("doc_id", "text")

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def acrossRegimes(name: String)(run: DataFrame => DataFrame): Unit = {
    val base = canon(run(docs))
    assert(base.nonEmpty, s"$name: empty result set")
    for (p <- Seq(1, 3, 7, 32)) {
      val r = canon(run(docs.repartition(p)))
      assert(r === base, s"$name: result drifted at input partitioning $p")
    }
    val saved = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "5")
    try {
      val r = canon(run(docs.repartition(11)))
      assert(r === base, s"$name: result drifted at shuffle-partitions 5")
    } finally spark.conf.set("spark.sql.shuffle.partitions", saved)
  }

  test("d38 rare-token scrub is bit-identical across partitionings and reruns") {
    acrossRegimes("d38")(d => TextStats.rareTokenScrub(d, minCount = 100L))
  }

  test("d44 span corruption is bit-identical across partitionings and reruns") {
    acrossRegimes("d44")(d =>
      TextStats.spanCorruption(d, spanLen = 4, ratePerMillion = 300000,
        seed = "sc7"))
  }

  test("d22 span scrub is bit-identical across partitionings and reruns") {
    acrossRegimes("d22")(d => Dedup.scrubDuplicatedSpans(d, windowTokens = 8))
  }

  test("d73 boilerplate scrub is bit-identical across partitionings and reruns") {
    val withSource = Tables(spark, sfDir, "documents")
      .select("doc_id", "source", "text")
    val run = (d: DataFrame) => Dedup.scrubBoilerplate(d, windowTokens = 3, minDocs = 2)
    val base = run(withSource).collect().map(_.toString).sorted.toSeq
    for (p <- Seq(1, 7, 32)) {
      val r = run(withSource.repartition(p)).collect().map(_.toString).sorted.toSeq
      assert(r === base, s"d73: result drifted at input partitioning $p")
    }
  }
}
