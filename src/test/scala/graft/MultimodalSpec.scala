package graft

import org.apache.spark.sql.functions._

import graft.ext.Multimodal

/** Binary-column plumbing: schema, batch-shaped decode, determinism. */
class MultimodalSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("mediaTable schema: binary payload + typed metadata struct") {
    val m = Multimodal.mediaTable(Tables(spark, sfDir, "documents"))
    assert(m.schema("media").dataType.typeName === "binary")
    assert(m.schema("meta").dataType.typeName === "struct")
    val r = m.filter(col("doc_id") === 3).collect()(0)
    assert(r.getAs[String]("kind") === "image") // 3 % 3 == 0
  }

  test("decodeFeatures: stub decode is deterministic and content-dependent") {
    val m = Multimodal.mediaTable(Tables(spark, sfDir, "documents")).limit(20)
    val f1 = Multimodal.decodeFeatures(m, () => Multimodal.MediaDecoder.DeterministicStub)
      .orderBy("doc_id").collect()
    val f2 = Multimodal.decodeFeatures(m, () => Multimodal.MediaDecoder.DeterministicStub)
      .orderBy("doc_id").collect()
    assert(f1.toSeq === f2.toSeq)
    val r = f1(0)
    assert(r.getAs[Long]("n_bytes") > 0)
    // ASCII word-soup bytes → mean intensity strictly inside (32, 127)
    val mean = r.getAs[Double]("mean_intensity")
    assert(mean > 32.0 && mean < 127.0)
  }

  test("n_bytes matches the text byte length end-to-end") {
    val docs = Tables(spark, sfDir, "documents").limit(10)
    val feats = Multimodal.decodeFeatures(Multimodal.mediaTable(docs),
      () => Multimodal.MediaDecoder.DeterministicStub)
    val joined = feats.join(docs, "doc_id")
      .select(col("n_bytes"), length(col("text")).cast("long").as("tl"))
      .collect()
    assert(joined.forall(r => r.getLong(0) === r.getLong(1)))
  }
}
