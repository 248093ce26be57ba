package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Similarity search over the `embeddings` table (`Array[Float]`, 64-dim):
  * brute-force cosine top-k as the exact baseline, a k-NN self-join, an
  * embedding-cosine near-dup pair finder, and a random-hyperplane LSH
  * bucketing as the approximate scale path.
  *
  * Scale design: the exact paths broadcast the (tiny) query side so the
  * corpus scan never shuffles; the threshold pair-join is blocked by LSH
  * buckets at scale (the brute-force variant here is the oracle-checkable
  * baseline). Dot products are `zip_with`+`aggregate` higher-order
  * expressions in double precision — codegen'd, no UDF.
  */
object Similarity {

  /** Cosine similarity of two float-array columns, accumulated in double —
    * a native codegen'd Catalyst expression (graft.plans.CosineSimilarityExpr);
    * the equivalent zip_with+aggregate HOF chain is interpreted and breaks
    * whole-stage codegen on the hot pair-join path. */
  def cosine(a: Column, b: Column): Column =
    graft.plans.CosineSimilarityExpr.cosineSim(a, b)

  /** Random-hyperplane sign bit: hyperplane `p`'s component for dimension
    * `d` is ±1 derived from a seeded hash — deterministic, no stored
    * model. Returns the `nBits`-bit signature of `v`. */
  def lshSignature(v: Column, nBits: Int): Column =
    aggregate(sequence(lit(0), lit(nBits - 1)), lit(0L),
      (acc, p) => {
        val proj = aggregate(
          zip_with(v, sequence(lit(0), size(v) - 1),
            (x, d) => x.cast("double") *
              when(xxhash64(p, d).bitwiseAND(1) === 1, 1.0).otherwise(-1.0)),
          lit(0.0), (a2, x) => a2 + x)
        acc + when(proj > 0, call_function("shiftleft", lit(1L), p)).otherwise(lit(0L))
      })

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")

  // ---- catalog queries -----------------------------------------------

  /** Brute-force cosine top-20 for one query vector (vec_id=0). The query
    * row is broadcast; the corpus side is a single scan + TakeOrdered —
    * no shuffle of the corpus. */
  val s01CosineTopk: Q = Q(
    "s01_cosine_topk",
    Some("""
      WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
      SELECT vec_id, label,
             round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), CAST(qe AS DOUBLE[])), 6) AS cos_sim
      FROM embeddings, q
      WHERE vec_id <> 0
      ORDER BY cos_sim DESC, vec_id ASC
      LIMIT 20
    """),
    (s, dir) => {
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
      e.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"), col("label"),
          round(cosine(col("embedding"), col("qe")), 6).as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id").asc)
        .limit(20)
    })

  /** k-NN join: top-3 cosine neighbors for each of the first 20 vectors.
    * Query side broadcast (tiny) against one corpus scan; per-query top-k
    * via window rank. */
  val s02KnnJoin: Q = Q(
    "s02_knn_join",
    Some("""
      SELECT qid, vec_id AS nn_id, cos_sim, rk
      FROM (
        SELECT q.vec_id AS qid, e.vec_id,
               round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])), 6) AS cos_sim,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])), 6) DESC,
                                           e.vec_id ASC) AS rk
        FROM embeddings q JOIN embeddings e ON q.vec_id <> e.vec_id
        WHERE q.vec_id < 20) x
      WHERE rk <= 3
    """),
    (s, dir) => {
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      val scored = e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          round(cosine(col("embedding"), col("qe")), 6).as("cos_sim"))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("cos_sim").desc, col("vec_id").asc)
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("qid"), col("vec_id").as("nn_id"), col("cos_sim"), col("rk"))
    })

  /** Embedding-cosine near-dup pairs above a threshold — the brute-force
    * baseline of the near-dup family (d06/d07 analogue in vector space).
    * Oracle-checkable; the LSH-bucketed variant (s04) is the scale path. */
  val s03CosineNearDup: Q = Q(
    "s03_cosine_neardup",
    Some("""
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) >= 0.4
    """),
    (s, dir) => {
      val e = emb(s, dir)
      val par = s.sparkContext.defaultParallelism
      val a = e.select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
        .repartition(par)
      val b = e.select(col("vec_id").as("vec_b"), col("embedding").as("eb"))
      a.join(b, col("vec_a") < col("vec_b"))
        .select(col("vec_a"), col("vec_b"),
          round(cosine(col("ea"), col("eb")), 6).as("cos_sim"))
        .filter(col("cos_sim") >= 0.4)
    })

  /** Approximate NN via random-hyperplane LSH: 12-bit signatures, probe
    * the query's bucket plus all buckets at hamming ≤ 2, exact-rescore
    * candidates. Seeded-hash hyperplanes are not ANSI-SQL-expressible →
    * rows-only driver check; recall vs s01 proven in SimilaritySpec. */
  val s04AnnLsh: Q = Q(
    "s04_ann_lsh",
    None,
    (s, dir) => annTopK(emb(s, dir), queryVecId = 0, k = 10, nBits = 12, maxProbeHamming = 3))

  /** LSH-bucketed approximate top-k for one query id. */
  def annTopK(embeddings: DataFrame, queryVecId: Long, k: Int, nBits: Int,
      maxProbeHamming: Int): DataFrame = {
    val sigs = embeddings.select(col("vec_id"), col("label"), col("embedding"),
      lshSignature(col("embedding"), nBits).as("sig"))
    val q = sigs.filter(col("vec_id") === queryVecId)
      .select(col("sig").as("qsig"), col("embedding").as("qe"))
    sigs.filter(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(q))
      .filter(bit_count(col("sig").bitwiseXOR(col("qsig"))) <= maxProbeHamming)
      .select(col("vec_id"), col("label"),
        round(cosine(col("embedding"), col("qe")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
      .limit(k)
  }

  /** IVF-style ANN: a coarse quantizer (here: a deterministic subset of
    * the corpus as centroids — a k-means fit would slot into the same
    * shape) partitions vectors into inverted lists by nearest centroid;
    * a query probes only its `nProbe` nearest centroids' lists and
    * exact-rescores those candidates.
    *
    * Scale shape: centroid assignment is scan × broadcast(centroids) +
    * argmin — one pass, no shuffle of the corpus; the probe reads only
    * `nProbe/nCentroids` of the data. At 100 TB the lists would be
    * written bucketed-by-centroid so a probe is a partition-pruned scan. */
  def ivfAssignments(embeddings: DataFrame, nCentroids: Int): DataFrame = {
    val centroids = broadcast(embeddings
      .filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("ce")))
    val scored = embeddings.crossJoin(centroids)
      .select(col("vec_id"), col("label"), col("embedding"), col("centroid_id"),
        cosine(col("embedding"), col("ce")).as("c_sim"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("c_sim").desc, col("centroid_id").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("label"), col("embedding"), col("centroid_id"))
  }

  /** IVF probe: exact top-k within the query's nProbe nearest lists. */
  def annTopKIvf(embeddings: DataFrame, queryVecId: Long, k: Int,
      nCentroids: Int, nProbe: Int): DataFrame = {
    val assigned = ivfAssignments(embeddings, nCentroids)
    val centroids = broadcast(embeddings
      .filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("ce")))
    val q = embeddings.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("qe"))
    val probes = broadcast(centroids.crossJoin(broadcast(q))
      .select(col("centroid_id"), cosine(col("ce"), col("qe")).as("c_sim"))
      .orderBy(col("c_sim").desc, col("centroid_id").asc)
      .limit(nProbe)
      .select(col("centroid_id").as("probe_id")))
    assigned
      .join(probes, col("centroid_id") === col("probe_id"))
      .filter(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        round(cosine(col("embedding"), col("qe")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
      .limit(k)
  }

  /** IVF ANN over the corpus (rows-only driver check; recall proven on
    * planted clusters in SimilaritySpec). */
  val s05AnnIvf: Q = Q(
    "s05_ann_ivf",
    None,
    (s, dir) => annTopKIvf(emb(s, dir), queryVecId = 0, k = 10,
      nCentroids = 16, nProbe = 4))

  val all: Seq[Q] = Seq(s01CosineTopk, s02KnnJoin, s03CosineNearDup, s04AnnLsh, s05AnnIvf)
}
