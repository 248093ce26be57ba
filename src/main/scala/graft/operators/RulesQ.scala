package graft.operators

import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.rules.{Categorizer, CategoryRule}

/** The rules engine (U1) end-to-end: ordered first-match regex
  * categorization compiled to one native when/rlike chain, exercised over
  * transaction-like descriptions synthesized from `part` names. The DuckDB
  * oracle replays the identical ordered CASE chain, proving the compiled
  * Column preserves first-match + force_recorrente + fallback semantics
  * (rules/categories_bb.py:223-274).
  */
object RulesQ {

  /** Part-vocabulary ruleset (order matters; WIDGET carries
    * force_recorrente, mirroring the reference's always-recurring
    * merchants). */
  private val partRules = Seq(
    CategoryRule("Hardware", "Fasteners", Seq("BOLT", "\\bROD\\b")),
    CategoryRule("Hardware", "Forge", Seq("ANVIL", "PLATE")),
    CategoryRule("Gadgets", "Widgets", Seq("WIDGET"), forceRecorrente = true),
    CategoryRule("Gadgets", "Gizmos", Seq("GIZMO")),
    CategoryRule("Machinery", "Gears", Seq("GEAR")))

  private val hints = Seq("\\bNEW\\b", "\\bHOT\\b")

  val q18CategorizeRules: Q = Q(
    "q18_categorize_rules",
    Some("""
      WITH d AS (
        SELECT upper(p_name) ||
               CASE WHEN p_partkey % 7 = 0 THEN ' PARC 02/10' ELSE '' END AS descricao
        FROM part),
      c AS (
        SELECT descricao,
          CASE
            WHEN regexp_matches(descricao, 'BOLT|\bROD\b') THEN 'Hardware'
            WHEN regexp_matches(descricao, 'ANVIL|PLATE') THEN 'Hardware'
            WHEN regexp_matches(descricao, 'WIDGET') THEN 'Gadgets'
            WHEN regexp_matches(descricao, 'GIZMO') THEN 'Gadgets'
            WHEN regexp_matches(descricao, 'GEAR') THEN 'Machinery'
            WHEN regexp_matches(descricao, '\bPARC \d{2}/\d{2}\b') THEN 'Compras'
            WHEN regexp_matches(descricao, 'PAGAMENTO|PGTO|PAGTO|ESTORNO|CR[ÉE]DITO DE') THEN 'Financeiro'
            ELSE 'Outros' END AS categoria,
          CASE
            WHEN regexp_matches(descricao, 'BOLT|\bROD\b') THEN 'Fasteners'
            WHEN regexp_matches(descricao, 'ANVIL|PLATE') THEN 'Forge'
            WHEN regexp_matches(descricao, 'WIDGET') THEN 'Widgets'
            WHEN regexp_matches(descricao, 'GIZMO') THEN 'Gizmos'
            WHEN regexp_matches(descricao, 'GEAR') THEN 'Gears'
            WHEN regexp_matches(descricao, '\bPARC \d{2}/\d{2}\b') THEN 'Parcelado'
            WHEN regexp_matches(descricao, 'PAGAMENTO|PGTO|PAGTO|ESTORNO|CR[ÉE]DITO DE') THEN 'Pagamentos'
            ELSE 'Geral' END AS subcategoria,
          (regexp_matches(descricao, '\bNEW\b|\bHOT\b') OR
           CASE
             WHEN regexp_matches(descricao, 'BOLT|\bROD\b') THEN FALSE
             WHEN regexp_matches(descricao, 'ANVIL|PLATE') THEN FALSE
             WHEN regexp_matches(descricao, 'WIDGET') THEN TRUE
             ELSE FALSE END) AS recorrente_suspeita,
          regexp_matches(descricao, '\bPARC \d{2}/\d{2}\b') AS parcelado_suspeito
        FROM d)
      SELECT categoria, subcategoria, recorrente_suspeita, parcelado_suspeito,
             count(*) AS n
      FROM c
      GROUP BY 1, 2, 3, 4
    """),
    (s, dir) => {
      val descricao = concat(upper(col("p_name")),
        when(col("p_partkey") % 7 === 0, lit(" PARC 02/10")).otherwise(lit("")))
      // descricao is constructed pre-normalized (upper, single-spaced)
      val cat = Categorizer.categorizeNormalized(col("descricao"), partRules, hints)
      Tables(s, dir, "part")
        .select(descricao.as("descricao"))
        .select(col("descricao"), cat.as("c"))
        .select(
          col("c.categoria").as("categoria"),
          col("c.subcategoria").as("subcategoria"),
          col("c.recorrente_suspeita").as("recorrente_suspeita"),
          col("c.parcelado_suspeito").as("parcelado_suspeito"))
        .groupBy("categoria", "subcategoria", "recorrente_suspeita", "parcelado_suspeito")
        .agg(count(lit(1)).as("n"))
    })

  val all: Seq[Q] = Seq(q18CategorizeRules)
}
