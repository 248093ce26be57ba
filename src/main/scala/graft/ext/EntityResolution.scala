package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Entity resolution over dimension records — the master-data half of the
  * dedup story: the d-family finds near-duplicate DOCUMENTS by content;
  * this family finds duplicate ENTITY SPELLINGS (customer names, product
  * names, vendors) by fuzzy identity and canonicalizes every record to a
  * golden spelling. The pipeline is the canonical shape, each stage an
  * already-audited primitive of this engine:
  *
  *   1. the record table collapses to its DISTINCT value dictionary
  *      (vocabulary-sized — the whole reason dictionary-level ER scales:
  *      the quadratic fuzzy step never sees record counts),
  *   2. blocking + pairwise edit distance over the dictionary →
  *      candidate pairs (equi-join on the blocking key; quadratic only
  *      inside a block — the d06 discipline),
  *   3. [[Dedup.connectedComponents]] over the pairs → spelling groups
  *      (chains of pairwise matches merge — transitivity is exactly what
  *      a pairwise threshold lacks),
  *   4. survivorship (longest spelling, ties lexicographic) + one
  *      record-level equi-join assigns every row its golden value.
  */
object EntityResolution {

  /** Blocked fuzzy candidate pairs over a value DICTIONARY: distinct
    * values sharing `blockChars` leading characters whose Levenshtein
    * distance is ≤ `maxDist`. Both engines implement identical textbook
    * edit distance, so the pair set is exactly reproducible. Sharper
    * blocking keys (phonetic codes, d49's shingle sketches, d59's
    * winnowed fingerprints) slot into the same equi-join shape. */
  def fuzzyCandidates(records: DataFrame, nameCol: String,
      blockChars: Int = 2, maxDist: Int = 1): DataFrame = {
    require(blockChars >= 1 && maxDist >= 0, "bad blocking parameters")
    val dict = records.select(col(nameCol).as("nm")).distinct()
      .withColumn("blk", substring(col("nm"), 1, blockChars))
    val a = dict.select(col("nm").as("name_a"), col("blk"))
    val b = dict.select(col("nm").as("name_b"), col("blk").as("blk_b"))
    a.join(b, col("blk") === col("blk_b") && col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("int"))
      .filter(col("dist") <= maxDist)
      .select(col("name_a"), col("name_b"), col("dist"))
  }

  /** Canonicalize every record: spelling groups from the candidate
    * pairs (min-label connected components over the dictionary),
    * survivorship picks each group's longest spelling (ties to the
    * lexicographically smallest), and one record-level equi-join maps
    * each row to its golden value — record-count work is that single
    * linear join, nothing quadratic ever touches it. */
  def canonicalize(records: DataFrame, idCol: String, nameCol: String,
      pairs: DataFrame): DataFrame = {
    val labels = Dedup.connectedComponents(
      pairs.select(col("name_a").as("doc_a"), col("name_b").as("doc_b")))
      .select(col("doc_id").as("nm"), col("component"))
    val dict = records.select(col(nameCol).as("nm")).distinct()
      .join(labels, Seq("nm"), "left")
      .withColumn("cluster", coalesce(col("component"), col("nm")))
    val golden = dict.groupBy(col("cluster"))
      .agg(min(struct((-length(col("nm"))).as("nl"), col("nm").as("nm")))
        .as("__best"))
      .select(col("cluster"), col("__best.nm").as("golden_name"))
    records.select(col(idCol), col(nameCol).as("nm"))
      .join(dict.select(col("nm"), col("cluster")), Seq("nm"))
      .join(broadcast(golden), Seq("cluster"))
      .select(col(idCol), col("nm").as(nameCol), col("golden_name"))
  }

  /** The deterministic dirty-records fixture (q60/d55 pattern): every
    * part whose key is divisible by 11 carries a corrupted spelling
    * with its third character deleted — edit distance exactly 1 from
    * the clean dictionary entry. */
  private def dirtyParts(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "part").select(col("p_partkey"),
      when(col("p_partkey") % 11 === 0,
        concat(substring(col("p_name"), 1, 2), expr("substring(p_name, 4)")))
        .otherwise(col("p_name")).as("name"))

  /** q64 — blocked fuzzy candidates over the dirty part-name
    * dictionary. */
  val q64FuzzyCandidates: Q = Q(
    "q64_fuzzy_candidates",
    Some("""
      WITH recs AS (
        SELECT p_partkey,
               CASE WHEN p_partkey % 11 = 0
                    THEN substr(p_name, 1, 2) || substr(p_name, 4)
                    ELSE p_name END AS name
        FROM part),
      dict AS (SELECT DISTINCT name FROM recs),
      blocked AS (SELECT name, substr(name, 1, 2) AS blk FROM dict)
      SELECT a.name AS name_a, b.name AS name_b,
             CAST(levenshtein(a.name, b.name) AS INT) AS dist
      FROM blocked a JOIN blocked b
        ON a.blk = b.blk AND a.name < b.name
      WHERE levenshtein(a.name, b.name) <= 1
    """),
    (s, dir) => fuzzyCandidates(dirtyParts(s, dir), "name"))

  /** q65 — canonicalized part records: every row carrying a corrupted
    * spelling maps back to its golden (longest) form. The oracle closes
    * the pair relation with a recursive CTE (the d17 transitive-closure
    * pattern) so chained matches merge identically. */
  val q65GoldenRecords: Q = Q(
    "q65_golden_records",
    Some("""
      WITH RECURSIVE recs AS (
        SELECT p_partkey,
               CASE WHEN p_partkey % 11 = 0
                    THEN substr(p_name, 1, 2) || substr(p_name, 4)
                    ELSE p_name END AS name
        FROM part),
      dict AS (SELECT DISTINCT name FROM recs),
      blocked AS (SELECT name, substr(name, 1, 2) AS blk FROM dict),
      prs AS (
        SELECT a.name AS name_a, b.name AS name_b
        FROM blocked a JOIN blocked b
          ON a.blk = b.blk AND a.name < b.name
        WHERE levenshtein(a.name, b.name) <= 1),
      e AS (SELECT name_a AS s, name_b AS d FROM prs
            UNION ALL SELECT name_b, name_a FROM prs),
      reach(src, lbl) AS (
        SELECT name, name FROM dict
        UNION
        SELECT e.s, r.lbl FROM e JOIN reach r ON e.d = r.src),
      lab AS (SELECT src AS name, min(lbl) AS cluster FROM reach GROUP BY 1),
      g AS (
        SELECT lab.cluster, lab.name,
               row_number() OVER (PARTITION BY lab.cluster
                 ORDER BY len(lab.name) DESC, lab.name ASC) AS rn
        FROM lab),
      golden AS (
        SELECT g.cluster, g.name AS golden_name FROM g WHERE rn = 1)
      SELECT r.p_partkey, r.name, golden.golden_name
      FROM recs r
      JOIN lab ON lab.name = r.name
      JOIN golden ON golden.cluster = lab.cluster
    """),
    (s, dir) => {
      val recs = dirtyParts(s, dir)
      canonicalize(recs, "p_partkey", "name", fuzzyCandidates(recs, "name"))
    })

  val all: Seq[Q] = Seq(q64FuzzyCandidates, q65GoldenRecords)
}
