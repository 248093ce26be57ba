package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Q, Tables}

/** Data-quality / profiling operators — the observability layer a 100 TB
  * pipeline runs beside every load (the reference's control-table lineage
  * implies these; SURVEY §2.1's landing audits are their small-scale
  * cousins). Both operators collapse the corpus to tiny aggregates
  * map-side before anything shuffles.
  */
object DataQuality {

  /** Heavy-key diagnostics for a join/shuffle key: the top-`topK` keys by
    * row count with exact share and cumulative share of the table. This is
    * the planning input for salting/AQE-skew decisions — a key whose share
    * is 0.2 will straggle any 1000-executor shuffle on that column.
    *
    * Scale shape: one partial-aggregatable groupBy (corpus → |keys| rows),
    * a single-row total that broadcasts, and a TakeOrderedAndProject for
    * the top-K cut; the rank/cumulative window runs over exactly `topK`
    * rows, so its single partition is bounded by construction, never
    * data-sized. Determinism: share and cum_share are single IEEE
    * divisions of exact integer counts (the cumulative sum is taken over
    * LONGs, order-free), and the rank order carries a key tiebreak.
    */
  def keySkewProfile(df: DataFrame, keyCol: String,
      topK: Int = 20): DataFrame = {
    require(topK > 0, "topK must be positive")
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("__total"))
    val top = counts.orderBy(col("cnt").desc, col("key")).limit(topK)
    // bounded window: exactly topK rows after the limit
    val w = Window.orderBy(col("cnt").desc, col("key"))
    top
      .withColumn("rnk", row_number().over(w))
      .withColumn("__cum", sum(col("cnt")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(total))
      .select(col("key"), col("cnt"), col("rnk"),
        (col("cnt").cast("double") / col("__total").cast("double")).as("share"),
        (col("__cum").cast("double") / col("__total").cast("double"))
          .as("cum_share"))
  }

  /** Per-column table profile: NULL count, exact distinct count, and (for
    * numeric columns) min/max — the expectations snapshot a pipeline
    * diffs between loads to catch schema drift, null explosions and
    * out-of-range values. One wide aggregate over a single scan (the
    * multi-distinct Expand multiplies rows by #columns map-side — the
    * standard profiling cost, all partial-aggregatable), then a `stack`
    * unpivot of the single result row to long form. */
  def profile(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.toIndexedSeq
    def isNumeric(f: StructField): Boolean = f.dataType match {
      case _: NumericType => true
      case _ => false
    }
    val aggs: IndexedSeq[Column] = cols.flatMap { f =>
      val c = col(f.name)
      Seq(
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"__nulls_${f.name}"),
        count_distinct(c).as(s"__nd_${f.name}")) ++
        (if (isNumeric(f))
          Seq(min(c).cast("double").as(s"__min_${f.name}"),
            max(c).cast("double").as(s"__max_${f.name}"))
        else Nil)
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.flatMap { f =>
      val minMax =
        if (isNumeric(f)) Seq(s"__min_${f.name}", s"__max_${f.name}")
        else Seq("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)")
      Seq(s"'${f.name}'", s"__nulls_${f.name}", s"__nd_${f.name}") ++ minMax
    }
    wide.select(expr(
      s"stack(${cols.size}, ${stackArgs.mkString(", ")}) AS " +
        "(col_name, n_nulls, n_distinct, min_num, max_num)"))
  }

  /** d47 — key-skew profile of the orders fact's customer key. */
  val d47KeySkewProfile: Q = Q(
    "d47_key_skew_profile",
    Some("""
      WITH c AS (SELECT o_custkey AS key, count(*) AS cnt
                 FROM orders GROUP BY 1),
      t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM c),
      top AS (SELECT key, cnt FROM c ORDER BY cnt DESC, key LIMIT 20),
      r AS (SELECT key, cnt,
                   row_number() OVER (ORDER BY cnt DESC, key) AS rnk,
                   CAST(sum(cnt) OVER (ORDER BY cnt DESC, key
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS cum
            FROM top)
      SELECT r.key, r.cnt, r.rnk,
             CAST(r.cnt AS DOUBLE) / CAST(t.total AS DOUBLE) AS share,
             CAST(r.cum AS DOUBLE) / CAST(t.total AS DOUBLE) AS cum_share
      FROM r CROSS JOIN t
    """),
    (s, dir) => keySkewProfile(Tables(s, dir, "orders"), "o_custkey"))

  /** d48 — full-table profile of orders (nulls / distincts / numeric
    * ranges per column). */
  val d48DataProfile: Q = Q(
    "d48_data_profile",
    Some("""
      SELECT 'o_orderkey' AS col_name,
             CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
             count(DISTINCT o_orderkey) AS n_distinct,
             CAST(min(o_orderkey) AS DOUBLE) AS min_num,
             CAST(max(o_orderkey) AS DOUBLE) AS max_num
      FROM orders
      UNION ALL
      SELECT 'o_custkey',
             CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             count(DISTINCT o_custkey),
             CAST(min(o_custkey) AS DOUBLE), CAST(max(o_custkey) AS DOUBLE)
      FROM orders
      UNION ALL
      SELECT 'o_orderstatus',
             CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             count(DISTINCT o_orderstatus),
             CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
      FROM orders
      UNION ALL
      SELECT 'o_totalprice',
             CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             count(DISTINCT o_totalprice),
             CAST(min(o_totalprice) AS DOUBLE), CAST(max(o_totalprice) AS DOUBLE)
      FROM orders
      UNION ALL
      SELECT 'o_orderdate',
             CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             count(DISTINCT o_orderdate),
             CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
      FROM orders
      UNION ALL
      SELECT 'o_orderpriority',
             CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             count(DISTINCT o_orderpriority),
             CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
      FROM orders
    """),
    (s, dir) => profile(Tables(s, dir, "orders")))

  val all: Seq[Q] = Seq(d47KeySkewProfile, d48DataProfile)
}
