package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{LocalTable, Q, Tables}
import graft.lake.Lake

/** Lake-maintenance operators (SURVEY §2.1/§2.5) proven through the
  * correctness gate: MERGE-shaped upsert, dedup-by-rank, schema evolution,
  * idempotent delete+append. The reference runs these as Iceberg SQL; here
  * they are join/window rewrites with identical semantics.
  */
object LakeQ {

  /** S10/J2 — MERGE INTO on a PK with newer-version-wins update, insert of
    * unmatched source rows, survival of untouched target rows
    * (datatrack_spark_utils.py:306-362). */
  val q19MergeUpsert: Q = Q(
    "q19_merge_upsert",
    Some("""
      WITH tgt AS (SELECT *, CAST(1 AS BIGINT) AS version FROM orders),
      src AS (
        SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
               o_totalprice + 1000.0 AS o_totalprice,
               o_orderdate, o_orderpriority, CAST(2 AS BIGINT) AS version
        FROM orders WHERE o_orderkey % 10 = 0
        UNION ALL
        SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), 'N', 123.45,
               TIMESTAMP '2000-01-01 00:00:00', '1-URGENT', CAST(2 AS BIGINT))
      SELECT coalesce(t.o_orderkey, s.o_orderkey) AS o_orderkey,
             CASE WHEN s.o_orderkey IS NOT NULL
                       AND (t.o_orderkey IS NULL OR s.version > t.version)
                  THEN s.o_custkey ELSE t.o_custkey END AS o_custkey,
             CASE WHEN s.o_orderkey IS NOT NULL
                       AND (t.o_orderkey IS NULL OR s.version > t.version)
                  THEN s.o_orderstatus ELSE t.o_orderstatus END AS o_orderstatus,
             CASE WHEN s.o_orderkey IS NOT NULL
                       AND (t.o_orderkey IS NULL OR s.version > t.version)
                  THEN s.o_totalprice ELSE t.o_totalprice END AS o_totalprice,
             CASE WHEN s.o_orderkey IS NOT NULL
                       AND (t.o_orderkey IS NULL OR s.version > t.version)
                  THEN s.o_orderdate ELSE t.o_orderdate END AS o_orderdate,
             CASE WHEN s.o_orderkey IS NOT NULL
                       AND (t.o_orderkey IS NULL OR s.version > t.version)
                  THEN s.o_orderpriority ELSE t.o_orderpriority END AS o_orderpriority
      FROM tgt t FULL OUTER JOIN src s ON t.o_orderkey = s.o_orderkey
    """),
    (s, dir) => {
      val orders = Tables(s, dir, "orders")
      val target = orders.withColumn("version", lit(1L))
      val updates = orders.filter(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey"), col("o_custkey"),
          lit("U").as("o_orderstatus"),
          (col("o_totalprice") + 1000.0).as("o_totalprice"),
          col("o_orderdate"), col("o_orderpriority"), lit(2L).as("version"))
      val inserted = LocalTable.of(s,
        StructType(Seq(
          StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
          StructField("o_orderstatus", StringType), StructField("o_totalprice", DoubleType),
          StructField("o_orderdate", TimestampType), StructField("o_orderpriority", StringType),
          StructField("version", LongType))),
        Seq(Row(-1L, -1L, "N", 123.45,
          java.sql.Timestamp.valueOf("2000-01-01 00:00:00"), "1-URGENT", 2L)))
      Lake.mergeUpsert(target, updates.unionByName(inserted),
          Seq("o_orderkey"), "version")
        .drop("version")
    })

  /** W1 — dedup-by-rank through `Lake.dedupByKeys`: one surviving row per
    * order, ranked by ship recency with a deterministic tiebreak
    * (datatrack_spark_utils.py:51-95). */
  val q23DedupByRank: Q = Q(
    "q23_dedup_by_rank",
    Some("""
      SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity
      FROM (
        SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity,
               row_number() OVER (PARTITION BY l_orderkey
                                  ORDER BY l_shipdate DESC, l_linenumber DESC, l_quantity DESC) AS rn
        FROM lineitem) x
      WHERE rn = 1
    """),
    (s, dir) =>
      Lake.dedupByKeys(
          Tables(s, dir, "lineitem")
            .select("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity"),
          keys = Seq("l_orderkey"),
          orderCol = Some("l_shipdate"),
          tiebreak = Seq("l_linenumber", "l_quantity")))

  /** Schema evolution — project a source missing two destination columns
    * into the destination shape with typed NULL backfill + reorder
    * (datatrack_spark_utils.py:221-302). */
  val q24SchemaEvolution: Q = Q(
    "q24_schema_evolution",
    Some("""
      SELECT c_custkey,
             CAST(NULL AS VARCHAR) AS c_phone,
             c_name,
             c_acctbal,
             CAST(NULL AS VARCHAR) AS c_comment
      FROM customer
    """),
    (s, dir) =>
      Lake.conformToSchema(
        Tables(s, dir, "customer").select("c_custkey", "c_name", "c_acctbal"),
        StructType(Seq(
          StructField("c_custkey", LongType),
          StructField("c_phone", StringType),
          StructField("c_name", StringType),
          StructField("c_acctbal", DoubleType),
          StructField("c_comment", StringType)))))

  /** I2 — idempotent per-source reload: drop one lineage key's rows,
    * append the re-parse, verify totals per source
    * (forms_main.py:401-423). */
  val q25DeleteAppend: Q = Q(
    "q25_delete_append",
    Some("""
      WITH reloaded AS (
        SELECT doc_id, text, lang, source, CAST(length(text) AS BIGINT) AS n_chars
        FROM documents WHERE source = 'src1'),
      merged AS (
        SELECT doc_id, text, lang, source, n_chars
        FROM documents WHERE source <> 'src1'
        UNION ALL SELECT * FROM reloaded)
      SELECT source, count(*) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS total_chars
      FROM merged
      GROUP BY source
    """),
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      val reloaded = docs.filter(col("source") === "src1")
        .withColumn("n_chars", length(col("text")).cast("long"))
      Lake.deleteByKeyAppend(docs, reloaded, "source", "src1")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
    })

  /** Salted skew join at the gate (builder checklist: "skewed keys →
    * salting"): two thirds of all orders are remapped onto ONE hot
    * customer key, then joined to the customer dim through
    * [[graft.lake.SkewJoin.saltedEquiJoin]] — the hot key's rows spread
    * over 8 (key, salt) reducers instead of hammering one. The dim side
    * carries a shuffle_hash hint so the join actually shuffles (a
    * broadcast would hide the skew — and at 100 TB the build side of a
    * skewed join is not always broadcastable); PlanSpec asserts the
    * broadcast-free shape. The salt never changes row-level results, so
    * the oracle is the plain unsalted join. */
  val q44SkewSaltedJoin: Q = Q(
    "q44_skew_salted_join",
    Some("""
      WITH skewed AS (
        SELECT CASE WHEN o_custkey % 3 = 0 THEN 1 ELSE o_custkey END AS k,
               o_totalprice
        FROM orders)
      SELECT c_mktsegment AS segment,
             round(sum(o_totalprice), 2) AS total,
             count(*) AS n_rows
      FROM skewed JOIN customer ON k = c_custkey
      GROUP BY c_mktsegment
    """),
    (s, dir) => {
      val skewed = Tables(s, dir, "orders")
        .select(when(col("o_custkey") % 3 === 0, lit(1L))
          .otherwise(col("o_custkey")).as("k"), col("o_totalprice"))
      val dim = Tables(s, dir, "customer")
        .select(col("c_custkey").as("rk"), col("c_mktsegment"))
        .hint("shuffle_hash")
      graft.lake.SkewJoin.saltedEquiJoin(skewed, dim, "k", "rk", salts = 8)
        .groupBy(col("c_mktsegment").as("segment"))
        .agg(round(sum(col("o_totalprice")), 2).as("total"),
          count(lit(1)).as("n_rows"))
    })

  /** The whole trusted-load lifecycle at the gate: three
    * [[graft.lake.TrustedLoad]] runs against one target table — an
    * initial half-load (rows up to a date split), the incremental
    * remainder (the control-table watermark excludes everything already
    * loaded), and a correction batch at a later version that newer-wins
    * a subset of keys. The final table must equal the one-shot answer —
    * proving the incremental composition loses nothing, duplicates
    * nothing, and applies corrections exactly once; the oracle computes
    * that one-shot answer directly. */
  val q45TrustedLifecycle: Q = Q(
    "q45_trusted_lifecycle",
    Some("""
      SELECT o_orderkey,
             round(o_totalprice + CASE WHEN o_orderkey % 100 = 0
                                       THEN 1000.0 ELSE 0.0 END, 2) AS total,
             c_mktsegment AS segment
      FROM orders JOIN customer ON o_custkey = c_custkey
    """),
    (s, dir) => {
      import graft.lake.{ControlTable, EntityTransformer, TrustedLoad}
      val target = java.nio.file.Files
        .createTempDirectory("graft-q45-").toString + "/t"
      def withTs(df: org.apache.spark.sql.DataFrame) =
        df.withColumn("ingest_ts", col("o_orderdate").cast("timestamp"))
      val orders = withTs(Tables(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"))
      val cust = Tables(s, dir, "customer").select("c_custkey", "c_mktsegment")
      val enricher = new EntityTransformer {
        override val entityName = "trusted.q45"
        override val inputs = Seq("orders", "customer")
        override val primaryKey = Seq("o_orderkey")
        override def transform(dfs: Map[String, org.apache.spark.sql.DataFrame]) =
          dfs("orders").join(broadcast(dfs("customer")),
              col("o_custkey") === col("c_custkey"))
            .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("total"),
              col("c_mktsegment").as("segment"), col("ingest_ts"))
      }
      val inc = Map("orders" -> "ingest_ts")
      def run(ctl: org.apache.spark.sql.DataFrame,
          src: org.apache.spark.sql.DataFrame, at: String) =
        TrustedLoad.run(enricher,
          n => if (n == "orders") src else cust, ctl, inc, "ingest_ts",
          target, java.sql.Timestamp.valueOf(at)).control
      // run 1: everything shipped before the split date
      val split = "1995-07-01"
      val c1 = run(ControlTable.empty(s),
        orders.filter(col("o_orderdate") < lit(split)), "2025-01-01 00:00:00")
      // run 2: the full source again — the watermark loads only the rest
      val c2 = run(c1, orders, "2025-01-02 00:00:00")
      // run 3: corrections for 1%% of keys at a later version
      val corrections = orders.filter(col("o_orderkey") % 100 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
        .withColumn("ingest_ts",
          lit(java.sql.Timestamp.valueOf("2035-01-01 00:00:00")))
      run(c2, corrections, "2025-01-03 00:00:00")
      s.read.parquet(target).select("o_orderkey", "total", "segment")
    })

  val all: Seq[Q] = Seq(q19MergeUpsert, q23DedupByRank, q24SchemaEvolution,
    q25DeleteAppend, q44SkewSaltedJoin, q45TrustedLifecycle)
}
