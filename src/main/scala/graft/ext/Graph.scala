package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Iterative graph analytics over relationally-derived edge lists — the
  * second member of the engine's Pregel-shaped family next to
  * [[Dedup.connectedComponents]]. The motivating pipeline use is the
  * published web-corpus quality prior: link-graph centrality (PageRank
  * over the crawl graph) ranks pages for curation the way the reference
  * corpora (Common Crawl derivatives) were themselves built.
  *
  * Scale posture mirrors connectedComponents: each iteration is ONE
  * shuffle join (ranks ⋈ edges on the source key) plus one aggregate on
  * the destination key; ranks are a node-sized table, edges are scanned
  * per round but never expanded; lineage is cut per round so the plan
  * does not grow with the iteration count.
  */
object Graph {

  /** Damped PageRank, `iters` synchronous rounds from a uniform start.
    *
    * `edges` is a directed (src, dst) edge list — callers deduplicate if
    * multi-edges should not weigh double. Every node must appear as a
    * source (no dangling-mass redistribution is implemented); symmetric
    * edge lists satisfy this by construction, and the builder below
    * emits both directions. Per-round ranks round to 9 decimals — the
    * d35 training-loop contract that makes the iteration bit-identical
    * across engines and partitionings, which is what lets DuckDB UNROLL
    * the loop in SQL and hash-match the distributed result.
    *
    * Output: (node, rank) with rank rounded to 6. */
  def pageRank(edges: DataFrame, iters: Int, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(damping > 0 && damping < 1, "damping must be in (0,1)")
    val e = edges.select(col("src"), col("dst")).localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().localCheckpoint()
    val n = nodes.count()
    val base = (1.0 - damping) / n
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    var ranks = nodes.withColumn("rank", round(lit(1.0 / n), 9))
    for (_ <- 1 to iters) {
      val contribs = e
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .join(outDeg, Seq("src"))
        .select(col("dst").as("node"), (col("rank") / col("deg")).as("c"))
      ranks = nodes
        .join(contribs.groupBy(col("node")).agg(sum(col("c")).as("s")),
          Seq("node"), "left")
        .select(col("node"),
          round(lit(base) + lit(damping) * coalesce(col("s"), lit(0.0)), 9)
            .as("rank"))
        .localCheckpoint()
    }
    ranks.select(col("node"), round(col("rank"), 6).as("rank"))
  }

  /** The corpus' natural link graph: the customer–supplier bipartite
    * graph from order lines (distinct trading pairs), both directions so
    * every node has out-degree ≥ 1. Node ids are prefixed to keep the
    * two key spaces apart. */
  def tradeEdges(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val pairs = lineitem.select(col("l_orderkey"), col("l_suppkey"))
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("c"),
        concat(lit("s"), col("l_suppkey")).as("s"))
      .distinct()
    pairs.select(col("c").as("src"), col("s").as("dst"))
      .union(pairs.select(col("s").as("src"), col("c").as("dst")))
  }

  /** PageRank over the customer–supplier trade graph, 3 rounds. */
  val d46PageRank: Q = Q(
    "d46_pagerank",
    Some("""
      WITH pairs AS (
        SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS c,
               's' || CAST(l_suppkey AS VARCHAR) AS s
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      e AS (
        SELECT c AS src, s AS dst FROM pairs
        UNION ALL
        SELECT s AS src, c AS dst FROM pairs),
      nodes AS (SELECT DISTINCT src AS node FROM e
                UNION SELECT DISTINCT dst FROM e),
      nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
      deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
      r0 AS (SELECT node, round(1.0 / nn.n, 9) AS rank FROM nodes CROSS JOIN nn),
      r1 AS (
        SELECT nodes.node,
               round(0.15 / nn.n + 0.85 * coalesce(s.s, 0.0), 9) AS rank
        FROM nodes CROSS JOIN nn
        LEFT JOIN (
          SELECT e.dst AS node, sum(r0.rank / deg.deg) AS s
          FROM e JOIN r0 ON r0.node = e.src JOIN deg ON deg.src = e.src
          GROUP BY 1) s ON s.node = nodes.node),
      r2 AS (
        SELECT nodes.node,
               round(0.15 / nn.n + 0.85 * coalesce(s.s, 0.0), 9) AS rank
        FROM nodes CROSS JOIN nn
        LEFT JOIN (
          SELECT e.dst AS node, sum(r1.rank / deg.deg) AS s
          FROM e JOIN r1 ON r1.node = e.src JOIN deg ON deg.src = e.src
          GROUP BY 1) s ON s.node = nodes.node),
      r3 AS (
        SELECT nodes.node,
               round(0.15 / nn.n + 0.85 * coalesce(s.s, 0.0), 9) AS rank
        FROM nodes CROSS JOIN nn
        LEFT JOIN (
          SELECT e.dst AS node, sum(r2.rank / deg.deg) AS s
          FROM e JOIN r2 ON r2.node = e.src JOIN deg ON deg.src = e.src
          GROUP BY 1) s ON s.node = nodes.node)
      SELECT node, round(rank, 6) AS rank FROM r3
    """),
    (s, dir) => pageRank(
      tradeEdges(Tables(s, dir, "orders"), Tables(s, dir, "lineitem")),
      iters = 3))

  val all: Seq[Q] = Seq(d46PageRank)
}
