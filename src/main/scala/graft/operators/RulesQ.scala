package graft.operators

import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.rules.{Categorizer, CategoryRule}

/** The rules engine (U1) end-to-end: ordered first-match regex
  * categorization compiled to one native when/rlike chain, exercised over
  * transaction-like descriptions. The DuckDB oracle replays the identical
  * ordered CASE chain — generated from the SAME rule list by
  * [[Categorizer.categorizeSqlField]] — proving the compiled Column
  * preserves first-match + force_recorrente + the 4-stage fallback cascade
  * (rules/categories_bb.py:223-274).
  *
  * Two gates: q18 runs a small part-vocabulary ruleset over synthesized
  * `part` descriptions (rule mechanics at table scale); q80 runs the FULL
  * 23-rule BB table ([[Categorizer.bbRules]]) over a merchant-string corpus
  * that covers every rule and every fallback branch.
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
    Some {
      val d = "descricao"
      s"""
      WITH d AS (
        SELECT upper(p_name) ||
               CASE WHEN p_partkey % 7 = 0 THEN ' PARC 02/10' ELSE '' END AS descricao
        FROM part),
      c AS (
        SELECT descricao,
          ${Categorizer.categorizeSqlField(d, partRules, "categoria", hints)} AS categoria,
          ${Categorizer.categorizeSqlField(d, partRules, "subcategoria", hints)} AS subcategoria,
          ${Categorizer.recorrenteSql(d, partRules, hints)} AS recorrente_suspeita,
          ${Categorizer.parceladoSql(d)} AS parcelado_suspeito
        FROM d)
      SELECT categoria, subcategoria, recorrente_suspeita, parcelado_suspeito,
             count(*) AS n
      FROM c
      GROUP BY 1, 2, 3, 4
      """
    },
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

  /** Merchant-description corpus for the full BB table: every one of the
    * 23 rules is hit by at least one sample (force_recorrente and
    * NULL-subcategory rules included), plus all four fallback branches
    * (parcelado, city+store "Loja física", payment words, Outros) and the
    * hint-driven recurrence on both rule matches and the Outros fallback.
    * Samples are pre-normalized (upper, single-spaced). */
  val bbSamples: Seq[String] = Seq(
    "FIAP PARC 03/12 FORTALEZA",      // r1 Educação (rule wins over parcelado fallback; flag stays)
    "CURSO DE INGLES ONLINE",         // r1 Educação, NULL subcategoria
    "RDSAUDE ONLINE TELEMEDICINA",    // r2 Saúde force_recorrente
    "WELLHUB ACADEMIA PLUS",          // r3 Saúde force_recorrente
    "OPENAI CHATGPT SUBSCR",          // r4 Assinaturas force + hint
    "DL*GOOGLE YOUTUBEPREMIUM",       // r5 Assinaturas (escaped-star pattern)
    "AMAZON MARKETPLACE BR",          // r5 Assinaturas
    "MERCADOLIVRE*TECHSHOP",          // r6 Compras/E-commerce
    "MERCADOPAGO *FEIRINHA",          // r7 Financeiro/Carteira digital
    "ANCORA DISTRIBUIDORA LTDA",      // r8 Mercado (rule wins over store-word fallback)
    "MERCADINHO SAO LUIZ 04",         // r9 Mercado, NULL subcategoria
    "SUPERMERCADO BOM PRECO",         // r9 Mercado, NULL subcategoria
    "UBER *TRIP HELP.UBER.COM",       // r10 Transporte/Apps
    "ITC PARKING SHOPPING",           // r11 Transporte/Estacionamento
    "SOBRAL E PALACIO POSTO 7",       // r12 Transporte/Combustível
    "HABACUCBANDEIRA AULAS BT",       // r13 Lazer/Beach Tennis
    "RIOMAR FORTALEZA LOJA 23",       // r14 Lazer/Shopping
    "SESC IPARANA",                   // r15 Lazer/Clube
    "PINK FESTAS BUFFET INFANTIL",    // r16 Lazer/Eventos
    "PODIUM BT ARENA MENSAL",         // r17 Lazer/Esporte + MENSAL hint → recorrente
    "M V VARIEDADES EIRELI",          // r18 Casa/Varejo
    "TOKIO MARINE*AUTO 04/2025",      // r19 Seguros force_recorrente
    "DPSSA FARMACIA MATRIZ",          // r20 Compras/Loja física (rule, not fallback)
    "IFD*BURGUER DO QUEIROZ",         // r21 Alimentação/Delivery
    "RESTAURANT CASA DE FADOS",       // r22 Alimentação/Restaurante
    "IOF COMPRA INTERNACIONAL",       // r23 Financeiro/Tarifas
    "PAPELARIA CENTRAL PARC 02/10",   // fallback 1: parcelado
    "BOUTIQUE ANA EUSEBIO",           // fallback 2: store word + city suffix
    "COMERCIO DE TECIDOS SAO PAULO",  // fallback 2
    "LOJA DAS FLORES SALVADOR",       // fallback 2
    "PGTO DEBITO AUTOMATICO",         // fallback 3: payment words
    "CANCELAMENTO DE COMPRA",         // fallback 3
    "ESTORNO COMPRA INDEVIDA",        // fallback 3
    "TRANSFERENCIA ENVIADA",          // fallback 4: Outros
    "CLUBE DO LIVRO PLANO MENSAL",    // Outros + MENSAL hint → recorrente
    "SPOTIFY MONTHLY PLAN")           // Outros + MONTHLY hint → recorrente

  /** The FULL reference rule table (all 23 rules + exact cascade) through
    * the correctness gate: each part row picks a merchant sample by
    * `p_partkey % 36`, the compiled chain categorizes it, and the DuckDB
    * oracle replays the generated CASE cascade over the same sample pick. */
  val q80CategorizeBB: Q = Q(
    "q80_categorize_bb",
    Some {
      val d = "descricao"
      val pick = bbSamples.zipWithIndex
        .map { case (s, i) => s"WHEN $i THEN '$s'" }
        .mkString(" ")
      s"""
      WITH d AS (
        SELECT CASE CAST(p_partkey % ${bbSamples.size} AS INTEGER) $pick END AS descricao
        FROM part),
      c AS (
        SELECT descricao,
          ${Categorizer.categorizeSqlField(d, Categorizer.bbRules, "categoria")} AS categoria,
          ${Categorizer.categorizeSqlField(d, Categorizer.bbRules, "subcategoria")} AS subcategoria,
          ${Categorizer.recorrenteSql(d, Categorizer.bbRules)} AS recorrente_suspeita,
          ${Categorizer.parceladoSql(d)} AS parcelado_suspeito
        FROM d)
      SELECT descricao, categoria, subcategoria, recorrente_suspeita,
             parcelado_suspeito, count(*) AS n
      FROM c
      GROUP BY 1, 2, 3, 4, 5
      """
    },
    (s, dir) => {
      val descricao = element_at(
        array(bbSamples.map(lit): _*),
        (col("p_partkey") % bbSamples.size + 1).cast("int"))
      val cat = Categorizer.categorizeNormalized(col("descricao"))
      Tables(s, dir, "part")
        .select(descricao.as("descricao"))
        .select(col("descricao"), cat.as("c"))
        .select(col("descricao"),
          col("c.categoria").as("categoria"),
          col("c.subcategoria").as("subcategoria"),
          col("c.recorrente_suspeita").as("recorrente_suspeita"),
          col("c.parcelado_suspeito").as("parcelado_suspeito"))
        .groupBy("descricao", "categoria", "subcategoria",
          "recorrente_suspeita", "parcelado_suspeito")
        .agg(count(lit(1)).as("n"))
    })

  val all: Seq[Q] = Seq(q18CategorizeRules, q80CategorizeBB)
}
