package graft.operators

import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.functions.{dates, money}

/** Scalar-function operators (SURVEY §2.8) demonstrated end-to-end on the
  * corpus: pt-BR money parse/format round-trip, multi-format date
  * normalization, descriptive statistics, distinct aggregates. All pure
  * codegen'd Column expressions — no UDFs anywhere.
  */
object Scalars {

  /** F8 — multi-format date parse: the corpus dates are re-rendered in the
    * reference's three source formats (dd/MM/yyyy, yyyy-MM-dd, dd-MM-yyyy;
    * helpers.py:39-82) then normalized back by the engine's
    * `toDateMulti` coalesce chain. */
  val q16MultiformatDates: Q = Q(
    "q16_multiformat_dates",
    Some("""
      WITH raw AS (
        SELECT o_orderkey,
               CASE CAST(o_orderkey % 3 AS INTEGER)
                 WHEN 0 THEN strftime(o_orderdate, '%d/%m/%Y')
                 WHEN 1 THEN strftime(o_orderdate, '%Y-%m-%d')
                 ELSE strftime(o_orderdate, '%d-%m-%Y') END AS raw_date
        FROM orders)
      SELECT o_orderkey, raw_date,
             CAST(coalesce(
               try_strptime(raw_date, '%d/%m/%Y'),
               try_strptime(raw_date, '%Y-%m-%d'),
               try_strptime(raw_date, '%d-%m-%Y'),
               try_strptime(raw_date, '%Y%m%d')) AS DATE) AS parsed
      FROM raw
    """),
    (s, dir) => {
      val rendered = Tables(s, dir, "orders")
        .select(col("o_orderkey"),
          when(col("o_orderkey") % 3 === 0, date_format(col("o_orderdate"), "dd/MM/yyyy"))
            .when(col("o_orderkey") % 3 === 1, date_format(col("o_orderdate"), "yyyy-MM-dd"))
            .otherwise(date_format(col("o_orderdate"), "dd-MM-yyyy")).as("raw_date"))
      rendered.withColumn("parsed", dates.toDateMulti(col("raw_date")))
    })

  /** F1/F13 — BRL money round-trip: format each price as "R$ 1.234,56"
    * (compare_budget.py:108-111) and parse it back with `brlToDouble`
    * (bb_bill.py:28-40). The string is constructed from integer cents in
    * BOTH engines so grouping/rounding is bit-identical. */
  val q17BrlRoundtrip: Q = Q(
    "q17_brl_roundtrip",
    Some("""
      WITH cents AS (
        SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS c
        FROM orders)
      SELECT o_orderkey,
             'R$ ' || replace(format('{:,}', c // 100), ',', '.')
                   || ',' || lpad(CAST(c % 100 AS VARCHAR), 2, '0') AS brl,
             CAST(replace(replace(replace(
               'R$ ' || replace(format('{:,}', c // 100), ',', '.')
                     || ',' || lpad(CAST(c % 100 AS VARCHAR), 2, '0'),
               'R$ ', ''), '.', ''), ',', '.') AS DOUBLE) AS parsed
      FROM cents
    """),
    (s, dir) => {
      val cents = Tables(s, dir, "orders")
        .select(col("o_orderkey"),
          round(col("o_totalprice") * 100).cast("long").as("c"))
      val brl = concat(
        lit("R$ "),
        regexp_replace(format_number(expr("c DIV 100"), 0), ",", "."),
        lit(","),
        lpad((col("c") % 100).cast("string"), 2, "0"))
      cents.select(col("o_orderkey"), brl.as("brl"))
        .withColumn("parsed", money.brlToDouble(col("brl")))
    })

  /** A8 — descriptive statistics (`describe()`/`summary()`,
    * inspect_bradesco_output.py:189-190) computed as explicit aggregates
    * so both engines agree on types. */
  val q21SummaryStats: Q = Q(
    "q21_summary_stats",
    Some("""
      SELECT l_returnflag,
             count(l_quantity) AS n,
             round(avg(l_quantity), 6) AS mean_qty,
             round(stddev_samp(l_quantity), 6) AS std_qty,
             min(l_quantity) AS min_qty,
             max(l_quantity) AS max_qty,
             round(avg(l_extendedprice), 4) AS mean_price
      FROM lineitem
      GROUP BY l_returnflag
    """),
    (s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          count(col("l_quantity")).as("n"),
          round(avg(col("l_quantity")), 6).as("mean_qty"),
          round(stddev_samp(col("l_quantity")), 6).as("std_qty"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          round(avg(col("l_extendedprice")), 4).as("mean_price")))

  /** Distinct aggregates (SURVEY §2.4 "free in Spark" note): exact
    * distinct counts per group — expand + two-phase agg under AQE. */
  val q22DistinctCounts: Q = Q(
    "q22_distinct_counts",
    Some("""
      SELECT l_returnflag,
             count(DISTINCT l_partkey) AS n_parts,
             count(DISTINCT l_suppkey) AS n_supps,
             count(*) AS n_rows
      FROM lineitem
      GROUP BY l_returnflag
    """),
    (s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows")))

  /** Approximate sketches (SURVEY §2.4 free-capability note):
    * HyperLogLog++ distinct counts (`approx_count_distinct`, rsd 2%) and
    * KLL-style quantiles (`percentile_approx`). Sketch internals differ
    * across engines, so the contract checked cross-engine is the exact
    * value plus a deterministic bounds test: the approximate answer must
    * land within the documented tolerance of the exact one (TRUE in the
    * oracle). At 100 TB the sketch is the point — one pass, fixed-size
    * state per group, no expand like exact DISTINCT. */
  val q40ApproxSketches: Q = Q(
    "q40_approx_sketches",
    Some("""
      SELECT l_returnflag,
             count(DISTINCT l_partkey) AS n_exact,
             TRUE AS approx_cd_ok,
             TRUE AS approx_p50_ok
      FROM lineitem
      GROUP BY l_returnflag
    """),
    (s, dir) => {
      val li = Tables(s, dir, "lineitem")
      // two aggregates joined on the tiny group key: countDistinct plans
      // an Expand and the percentile pair plans object aggregation —
      // mixed in ONE agg they degrade to a single giant SortAggregate
      // (14 s at sf0.1 vs ~1 s split)
      val cd = li.groupBy(col("l_returnflag")).agg(
        countDistinct(col("l_partkey")).as("n_exact"),
        approx_count_distinct(col("l_partkey"), 0.02).as("n_approx"))
      val pct = li.groupBy(col("l_returnflag")).agg(
        expr("percentile_approx(l_quantity, 0.5, 1000)").as("p50_approx"),
        expr("percentile(l_quantity, 0.5)").as("p50_exact"))
      cd.join(pct, "l_returnflag")
        .select(
          col("l_returnflag"), col("n_exact"),
          (abs(col("n_approx") - col("n_exact")) <=
            col("n_exact") * 0.05).as("approx_cd_ok"),
          (abs(col("p50_approx") - col("p50_exact")) <=
            greatest(abs(col("p50_exact")) * 0.05, lit(0.5))).as("approx_p50_ok"))
    })

  /** Mergeable Datasketches HLL (Spark 4 `hll_sketch_agg` /
    * `hll_union_agg`): sketches built per (flag, status) sub-group then
    * UNIONED to per-flag estimates — the shape that matters at 100 TB,
    * where per-partition/per-day sketches are persisted once and every
    * rollup is a cheap union instead of a re-scan (exact DISTINCT cannot
    * pre-aggregate this way). Checked against the exact count with the
    * q40 bounds pattern. */
  val q42HllMergeable: Q = Q(
    "q42_hll_mergeable",
    Some("""
      SELECT l_returnflag,
             count(DISTINCT l_partkey) AS n_exact,
             TRUE AS sketch_ok
      FROM lineitem
      GROUP BY l_returnflag
    """),
    (s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val perPart = li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(expr("hll_sketch_agg(l_partkey, 14)").as("sk"))
      val merged = perPart.groupBy(col("l_returnflag"))
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("n_approx"))
      val exact = li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_exact"))
      exact.join(merged, "l_returnflag")
        .select(col("l_returnflag"), col("n_exact"),
          (abs(col("n_approx") - col("n_exact")) <=
            col("n_exact") * 0.05).as("sketch_ok"))
    })

  /** Equi-width histogram per event type — the distribution snapshot
    * behind every data-viz/monitoring panel, without DuckDB's missing
    * width_bucket: bucket = clamp(floor((v − min)/width)) with min/max
    * from a first group-bounded aggregate broadcast back into one
    * bucketing scan. Pure IEEE arithmetic on both engines — exact
    * min/max, one subtraction, one division, one floor — so bucket
    * assignment is bit-identical; a degenerate min==max group collapses
    * to bucket 0 by the explicit width-0 guard on BOTH sides. */
  val q67Histogram: Q = Q(
    "q67_histogram",
    Some("""
      WITH bounds AS (
        SELECT event_type, min(value) AS lo, max(value) AS hi
        FROM events GROUP BY 1),
      b AS (
        SELECT e.event_type,
               CASE WHEN bounds.hi = bounds.lo THEN 0
                    ELSE least(7, CAST(floor((e.value - bounds.lo) /
                      ((bounds.hi - bounds.lo) / 8)) AS INT)) END AS bucket,
               bounds.lo, bounds.hi
        FROM events e JOIN bounds USING (event_type))
      SELECT event_type, bucket, count(*) AS n,
             round(min(lo) + bucket * ((min(hi) - min(lo)) / 8), 6)
               AS bucket_lo
      FROM b
      GROUP BY 1, 2
    """),
    (s, dir) => {
      val ev = graft.Tables(s, dir, "events").select(col("event_type"), col("value"))
      val bounds = ev.groupBy(col("event_type"))
        .agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
      val width = (col("hi") - col("lo")) / 8
      ev.join(broadcast(bounds), Seq("event_type"))
        .withColumn("bucket",
          when(col("hi") === col("lo"), lit(0))
            .otherwise(least(lit(7),
              floor((col("value") - col("lo")) / width).cast("int"))))
        .groupBy(col("event_type"), col("bucket"))
        .agg(count(lit(1)).as("n"),
          round(min(col("lo")) + col("bucket") * ((min(col("hi")) - min(col("lo"))) / 8), 6)
            .as("bucket_lo"))
    })

  /** Equi-DEPTH histogram per event type — q67's equi-width sibling and
    * the form optimizers and drift monitors actually want (equal-mass
    * bins track the distribution's shape; equi-width wastes bins on
    * empty tails): quartile boundaries from the exact R-7 percentile
    * (Spark `percentile` ≡ DuckDB `quantile_cont` — the d45 parity),
    * broadcast back into one conditional-count scan. Boundary doubles
    * are emitted raw: an interpolated boundary either equals a data
    * value exactly (frac 0 — identical on both engines) or lies strictly
    * between two adjacent data values, where a ulp of interpolation
    * noise cannot flip any row's bin. At 100 TB swap the exact
    * percentile for q40's `approx_percentile` sketch — same shape, the
    * group-bounded object agg becomes mergeable. */
  val q70EquidepthHistogram: Q = Q(
    "q70_equidepth_histogram",
    Some("""
      WITH b AS (
        SELECT event_type,
               quantile_cont(value, 0.25) AS p25,
               quantile_cont(value, 0.5)  AS p50,
               quantile_cont(value, 0.75) AS p75
        FROM events GROUP BY 1)
      SELECT e.event_type, b.p25, b.p50, b.p75,
             CAST(sum(CASE WHEN e.value <= b.p25 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
             CAST(sum(CASE WHEN e.value > b.p25 AND e.value <= b.p50
                      THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN e.value > b.p50 AND e.value <= b.p75
                      THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             CAST(sum(CASE WHEN e.value > b.p75 THEN 1 ELSE 0 END) AS BIGINT) AS n3
      FROM events e JOIN b USING (event_type)
      GROUP BY 1, 2, 3, 4
    """),
    (s, dir) => {
      val ev = graft.Tables(s, dir, "events")
        .select(col("event_type"), col("value"))
      val b = ev.groupBy(col("event_type")).agg(
        expr("percentile(value, 0.25)").as("p25"),
        expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.75)").as("p75"))
      ev.join(broadcast(b), Seq("event_type"))
        .groupBy(col("event_type"), col("p25"), col("p50"), col("p75"))
        .agg(
          sum(when(col("value") <= col("p25"), 1L).otherwise(0L)).as("n0"),
          sum(when(col("value") > col("p25") && col("value") <= col("p50"), 1L)
            .otherwise(0L)).as("n1"),
          sum(when(col("value") > col("p50") && col("value") <= col("p75"), 1L)
            .otherwise(0L)).as("n2"),
          sum(when(col("value") > col("p75"), 1L).otherwise(0L)).as("n3"))
    })

  /** Spark 4 VARIANT semi-structured path (parse_json → variant_get):
    * the open-schema JSON ingestion type — parse once into the binary
    * variant encoding, extract typed paths lazily, absent paths are
    * NULL (not errors) under try_variant_get. The gate round-trips
    * order rows through a nested JSON payload and must reproduce the
    * direct relational aggregate — if any typed extraction were wrong,
    * the totals diverge. Scale note: variant parse+extract is a pure
    * codegen projection (no shuffle), and variant columns store the
    * parsed binary form so repeated path access never re-parses text. */
  val q71VariantJson: Q = Q(
    "q71_variant_json",
    Some("""
      SELECT o_orderpriority AS prio, count(*) AS n,
             round(sum(o_totalprice), 2) AS total,
             CAST(count(*) AS BIGINT) AS n_missing_null
      FROM orders
      GROUP BY 1
    """),
    (s, dir) => {
      graft.Tables(s, dir, "orders")
        .select(to_json(struct(col("o_orderkey"),
          struct(col("o_totalprice"), col("o_orderpriority")).as("meta")))
          .as("payload"))
        .select(parse_json(col("payload")).as("v"))
        .select(
          expr("variant_get(v, '$.meta.o_orderpriority', 'string')").as("prio"),
          expr("variant_get(v, '$.meta.o_totalprice', 'double')").as("price"),
          expr("try_variant_get(v, '$.meta.no_such_field', 'double')").as("missing"))
        .groupBy(col("prio"))
        .agg(count(lit(1)).as("n"), round(sum(col("price")), 2).as("total"),
          sum(when(col("missing").isNull, 1L).otherwise(0L)).as("n_missing_null"))
    })

  /** Welch two-sample t-test per event type — the experimentation
    * primitive (A/B assignment by the d11 salted-hash split, so both
    * engines replay the arms): t = (x̄_a − x̄_b)/√(s²_a/n_a + s²_b/n_b)
    * and the Welch–Satterthwaite dof, all derived from single-pass
    * partial moment sums (n, Σv, Σv²) — the only corpus-sized work is
    * one map-side-combining aggregate per arm; the t arithmetic runs on
    * six numbers per group. Means/variances come from integer-free but
    * order-dependent float sums → round@6 on both sides before the
    * final arithmetic, then floor@6 the emitted statistics. */
  val q74AbTtest: Q = Q(
    "q74_ab_ttest",
    Some("""
      WITH armed AS (
        SELECT event_type, value,
               CASE WHEN CAST(concat('0x', substr(md5('ab:' || CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT) % 2 = 0
                    THEN 'a' ELSE 'b' END AS arm
        FROM events),
      m AS (
        SELECT event_type, arm, count(*) AS n,
               round(avg(value), 6) AS mean,
               round(var_samp(value), 6) AS var
        FROM armed GROUP BY 1, 2),
      wide AS (
        SELECT a.event_type,
               a.n AS n_a, b.n AS n_b, a.mean AS mean_a, b.mean AS mean_b,
               a.var / a.n AS sa, b.var / b.n AS sb
        FROM m a JOIN m b USING (event_type)
        WHERE a.arm = 'a' AND b.arm = 'b')
      SELECT event_type, n_a, n_b, mean_a, mean_b,
             floor((mean_a - mean_b) / sqrt(sa + sb) * 1e6 + 0.5) / 1e6
               AS t_stat,
             floor((sa + sb) * (sa + sb) /
               (sa * sa / (n_a - 1) + sb * sb / (n_b - 1)) * 1e6 + 0.5) / 1e6
               AS welch_dof
      FROM wide
    """),
    (s, dir) => {
      val ev = graft.Tables(s, dir, "events")
        .select(col("event_type"), col("value"),
          when(conv(substring(md5(concat(lit("ab:"),
            col("event_id").cast("string"))), 1, 15), 16, 10).cast("long")
            % 2 === 0, "a").otherwise("b").as("arm"))
      val m = ev.groupBy(col("event_type"), col("arm"))
        .agg(count(lit(1)).as("n"), round(avg(col("value")), 6).as("mean"),
          round(var_samp(col("value")), 6).as("var"))
      val a = m.filter(col("arm") === "a").select(col("event_type"),
        col("n").as("n_a"), col("mean").as("mean_a"), col("var").as("var_a"))
      val b = m.filter(col("arm") === "b").select(col("event_type"),
        col("n").as("n_b"), col("mean").as("mean_b"), col("var").as("var_b"))
      val sa = col("var_a") / col("n_a")
      val sb = col("var_b") / col("n_b")
      val se2 = sa + sb
      a.join(b, Seq("event_type"))
        .select(col("event_type"), col("n_a"), col("n_b"),
          col("mean_a"), col("mean_b"),
          (floor((col("mean_a") - col("mean_b")) / sqrt(se2) * 1e6 + 0.5) / 1e6)
            .as("t_stat"),
          (floor(se2 * se2 / (sa * sa / (col("n_a") - 1) +
            sb * sb / (col("n_b") - 1)) * 1e6 + 0.5) / 1e6).as("welch_dof"))
    })

  /** Chi-square independence cells for the event_type × A/B-arm
    * contingency table (q74's categorical sibling): per cell the
    * observed count, the independence-expected count
    * row_total·col_total/N, and the (o−e)²/e contribution. Cells are
    * emitted UNSUMMED — each contribution is a fixed chain of IEEE ops
    * over exact integers (bit-identical cross-engine, no rounding),
    * where a summed statistic would inherit summation-order ulps; the
    * caller folds Σ contrib against a χ² table with (R−1)(C−1) dof.
    * One partial-aggregatable count per cell; everything after is
    * cells-sized. */
  val q76ChiSquareCells: Q = Q(
    "q76_chi_square_cells",
    Some("""
      WITH armed AS (
        SELECT event_type,
               CASE WHEN CAST(concat('0x', substr(md5('ab:' || CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT) % 2 = 0
                    THEN 'a' ELSE 'b' END AS arm
        FROM events),
      cells AS (SELECT event_type, arm, count(*) AS o FROM armed GROUP BY 1, 2),
      rt AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS r_tot FROM cells GROUP BY 1),
      ct AS (SELECT arm, CAST(sum(o) AS BIGINT) AS c_tot FROM cells GROUP BY 1),
      nn AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells)
      SELECT c.event_type, c.arm, c.o,
             CAST(rt.r_tot AS DOUBLE) * ct.c_tot / nn.n AS e,
             (c.o - CAST(rt.r_tot AS DOUBLE) * ct.c_tot / nn.n)
               * (c.o - CAST(rt.r_tot AS DOUBLE) * ct.c_tot / nn.n)
               / (CAST(rt.r_tot AS DOUBLE) * ct.c_tot / nn.n) AS contrib
      FROM cells c JOIN rt USING (event_type) JOIN ct USING (arm) CROSS JOIN nn
    """),
    (s, dir) => {
      val cells = graft.Tables(s, dir, "events")
        .select(col("event_type"),
          when(conv(substring(md5(concat(lit("ab:"),
            col("event_id").cast("string"))), 1, 15), 16, 10).cast("long")
            % 2 === 0, "a").otherwise("b").as("arm"))
        .groupBy(col("event_type"), col("arm"))
        .agg(count(lit(1)).as("o"))
      val rt = cells.groupBy(col("event_type")).agg(sum(col("o")).as("r_tot"))
      val ct = cells.groupBy(col("arm")).agg(sum(col("o")).as("c_tot"))
      val nn = cells.agg(sum(col("o")).as("n"))
      val e = col("r_tot").cast("double") * col("c_tot") / col("n")
      cells.join(broadcast(rt), Seq("event_type"))
        .join(broadcast(ct), Seq("arm"))
        .crossJoin(broadcast(nn))
        .select(col("event_type"), col("arm"), col("o"), e.as("e"),
          ((col("o") - e) * (col("o") - e) / e).as("contrib"))
    })

  val all: Seq[Q] = Seq(q67Histogram, q70EquidepthHistogram, q71VariantJson,
    q74AbTtest, q76ChiSquareCells,
    q16MultiformatDates, q17BrlRoundtrip, q21SummaryStats, q22DistinctCounts,
    q40ApproxSketches, q42HllMergeable)
}
