package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ext.Dedup

/** Near-dup semantics: shingling, exact Jaccard, MinHash+LSH recall
  * against the exact answer on the real corpus, SimHash locality. */
class DedupSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def strDf(rows: (Long, String)*) =
    LocalTable.of(spark,
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))),
      rows.map { case (k, v) => Row(k, v) })

  test("shingles: distinct word n-grams, short-text and empty guards") {
    val df = strDf((1L, "a b c d"), (2L, "a b"), (3L, ""), (4L, "x x x x"))
    val got = df.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L) === Seq("a b c", "b c d"))
    assert(got(2L) === Seq())
    assert(got(3L) === Seq())
    assert(got(4L) === Seq("x x x")) // distinct collapses repeats
  }

  test("jaccard on known sets") {
    val df = strDf((1L, "unused"))
      .select(Dedup.jaccard(
        array(lit("a"), lit("b"), lit("c")),
        array(lit("b"), lit("c"), lit("d"))).as("j"))
    assert(df.collect()(0).getDouble(0) === 0.5)
  }

  test("minhash+LSH finds exactly the exact-Jaccard>=0.5 pairs on the corpus") {
    val docs = Tables(spark, sfDir, "documents").select("doc_id", "text")
    // exact brute-force answer (test-only; the operator itself never does this)
    val sh = docs.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
    val exact = sh.as("a").join(sh.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        Dedup.jaccard(col("a.sh"), col("b.sh")).as("j"))
      .filter(col("j") >= 0.5)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashNearDupPairs(docs, 3, 16, 8, 2, 0.5)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "corpus should contain injected near-dups")
    assert(lsh === exact)
  }

  test("simhash: identical texts collide, perturbed text stays close, unrelated far") {
    val df = strDf(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "the quick brown fox jumps over the lazy cat again and again"),
      (4L, "completely different words about spark query engines at scale"))
    val sig = Dedup.simhashSignatures(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(ham(sig(1L), sig(2L)) === 0)
    assert(ham(sig(1L), sig(3L)) < ham(sig(1L), sig(4L)))
  }
}
