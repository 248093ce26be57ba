package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.rules.{Categorizer, CategoryRule}

/** The reference's flagship analytics pair — monthly_summary.py's five
  * report datasets + compare_budget's console totals (SURVEY §3.3) — run as
  * one Spark DAG over a categorized transaction table synthesized from
  * `lineitem ⋈ part` (descriptions from part names, values signed by return
  * flag, competência from ship month).
  *
  * Scale posture: the transaction build is a single lineitem pass joined
  * to part on partkey (broadcast by stats/AQE when part fits, shuffle join
  * when it doesn't — no hardcoded hint on an SF-scaled table); each report
  * is a partial-agg rollup of that pass. The rule chain and every oracle CASE are generated from
  * the SAME `CategoryRule` list (Categorizer.categorizeSqlField), so rule
  * order cannot drift between engine and oracle.
  */
object FinTrackQ {

  /** Part-vocabulary rules shared with RulesQ's q18 (order matters). */
  val partRules: Seq[CategoryRule] = Seq(
    CategoryRule("Hardware", "Fasteners", Seq("BOLT", "\\bROD\\b")),
    CategoryRule("Hardware", "Forge", Seq("ANVIL", "PLATE")),
    CategoryRule("Gadgets", "Widgets", Seq("WIDGET"), forceRecorrente = true),
    CategoryRule("Gadgets", "Gizmos", Seq("GIZMO")),
    CategoryRule("Machinery", "Gears", Seq("GEAR")))

  val hints = Seq("\\bNEW\\b", "\\bHOT\\b", "ASSINAT|MENSAL")

  /** Categorized transaction table: one row per lineitem. */
  def transactions(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_extendedprice",
        "l_returnflag", "l_shipdate")
    val p = Tables(s, dir, "part").select("p_partkey", "p_name")
    val descricao = concat(upper(col("p_name")),
      when(col("l_linenumber") % 5 === 0, lit(" PARC 02/10"))
        .when(col("l_linenumber") % 5 === 1, lit(" ASSINATURA MENSAL"))
        .otherwise(lit("")))
    val valor = when(col("l_returnflag") === "R", -col("l_extendedprice"))
      .otherwise(col("l_extendedprice"))
    // descricao is constructed pre-normalized (upper, single-spaced).
    // part scales with SF — no broadcast hint; stats/AQE broadcast it at
    // small SF and degrade to a shuffle join at scale.
    val cat = Categorizer.categorizeNormalized(col("descricao"), partRules, hints)
    li.join(p, col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("l_linenumber"),
        descricao.as("descricao"), valor.as("valor"),
        date_format(col("l_shipdate"), "yyyy-MM").as("competencia"))
      .withColumn("c", cat)
      .select(col("l_orderkey"), col("l_linenumber"), col("descricao"),
        col("valor"), col("competencia"),
        col("c.categoria").as("categoria"),
        col("c.subcategoria").as("subcategoria"),
        col("c.recorrente_suspeita").as("recorrente_suspeita"),
        col("c.parcelado_suspeito").as("parcelado_suspeito"))
  }

  /** Shared oracle CTE: the same transaction build in DuckDB SQL, with the
    * categorize CASE generated from the rule list. */
  private def txSql: String = {
    val d = "descricao"
    s"""
      WITH tx AS (
        SELECT l_orderkey, l_linenumber,
               upper(p_name) ||
                 CASE CAST(l_linenumber % 5 AS INTEGER)
                   WHEN 0 THEN ' PARC 02/10'
                   WHEN 1 THEN ' ASSINATURA MENSAL'
                   ELSE '' END AS descricao,
               CASE WHEN l_returnflag = 'R' THEN -l_extendedprice
                    ELSE l_extendedprice END AS valor,
               strftime(l_shipdate, '%Y-%m') AS competencia
        FROM lineitem JOIN part ON l_partkey = p_partkey),
      cat AS (
        SELECT *,
               ${Categorizer.categorizeSqlField(d, partRules, "categoria", hints)} AS categoria,
               ${Categorizer.categorizeSqlField(d, partRules, "subcategoria", hints)} AS subcategoria,
               ${Categorizer.recorrenteSql(d, partRules, hints)} AS recorrente_suspeita,
               ${Categorizer.parceladoSql(d)} AS parcelado_suspeito
        FROM tx)
    """
  }

  /** monthly_by_category.csv (monthly_summary.py:31-39): totals per
    * competência × categoria. */
  val q27MonthlyByCategory: Q = Q(
    "q27_monthly_by_category",
    Some(txSql + """
      SELECT competencia, categoria, round(sum(valor), 2) AS total,
             count(*) AS n_tx
      FROM cat GROUP BY 1, 2
    """),
    (s, dir) =>
      transactions(s, dir)
        .groupBy(col("competencia"), col("categoria"))
        .agg(round(sum(col("valor")), 2).as("total"), count(lit(1)).as("n_tx")))

  /** by_categoria×parcelado (monthly_summary.py:41-49). */
  val q28CategoryParcelado: Q = Q(
    "q28_category_parcelado",
    Some(txSql + """
      SELECT categoria, parcelado_suspeito, round(sum(valor), 2) AS total,
             count(*) AS n_tx
      FROM cat GROUP BY 1, 2
    """),
    (s, dir) =>
      transactions(s, dir)
        .groupBy(col("categoria"), col("parcelado_suspeito"))
        .agg(round(sum(col("valor")), 2).as("total"), count(lit(1)).as("n_tx")))

  /** recurrent-only filtered agg (monthly_summary.py:51-60). */
  val q29RecurrentOnly: Q = Q(
    "q29_recurrent_only",
    Some(txSql + """
      SELECT competencia, categoria, round(sum(valor), 2) AS total
      FROM cat WHERE recorrente_suspeita GROUP BY 1, 2
    """),
    (s, dir) =>
      transactions(s, dir)
        .filter(col("recorrente_suspeita"))
        .groupBy(col("competencia"), col("categoria"))
        .agg(round(sum(col("valor")), 2).as("total")))

  /** top-15 |valor| expenses with unique tiebreak (monthly_summary.py:
    * 62-67) and the top-parcelados variant folded into one report via a
    * flag column. */
  val q30TopExpenses: Q = Q(
    "q30_top_expenses",
    Some(txSql + """
      SELECT l_orderkey, l_linenumber, categoria, valor,
             round(abs(valor), 2) AS valor_abs
      FROM cat
      ORDER BY valor_abs DESC, l_orderkey ASC, l_linenumber ASC
      LIMIT 15
    """),
    (s, dir) =>
      transactions(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"), col("categoria"),
          col("valor"), round(abs(col("valor")), 2).as("valor_abs"))
        .orderBy(col("valor_abs").desc, col("l_orderkey").asc, col("l_linenumber").asc)
        .limit(15))

  /** Grand totals (compare_budget.py:101-103, A7): one-row summary. */
  val q31GrandTotals: Q = Q(
    "q31_grand_totals",
    Some(txSql + """
      SELECT round(sum(valor), 2) AS total_geral,
             round(sum(CASE WHEN valor > 0 THEN valor ELSE 0 END), 2) AS total_gastos,
             round(sum(CASE WHEN valor < 0 THEN valor ELSE 0 END), 2) AS total_estornos,
             count(*) AS n_tx
      FROM cat
    """),
    (s, dir) =>
      transactions(s, dir)
        .agg(
          round(sum(col("valor")), 2).as("total_geral"),
          round(sum(when(col("valor") > 0, col("valor")).otherwise(0.0)), 2).as("total_gastos"),
          round(sum(when(col("valor") < 0, col("valor")).otherwise(0.0)), 2).as("total_estornos"),
          count(lit(1)).as("n_tx")))

  val all: Seq[Q] = Seq(
    q27MonthlyByCategory, q28CategoryParcelado, q29RecurrentOnly,
    q30TopExpenses, q31GrandTotals)
}
