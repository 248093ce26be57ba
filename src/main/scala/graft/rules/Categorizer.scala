package graft.rules

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.textnorm

/** One ordered first-match categorization rule — the reference's
  * `CategoryRule` config shape (rules/categories_bb.py:16-214): a category
  * pair plus alternative regex patterns, with an optional "this merchant is
  * always recurring" override. */
final case class CategoryRule(
    categoria: String,
    subcategoria: String,
    patterns: Seq[String],
    forceRecorrente: Boolean = false)

/** The reference's rules engine (U1, rules/categories_bb.py:223-274) is a
  * per-row Python function applied with pandas `.apply`. Here the ordered
  * rule list is COMPILED to a single native `Column`: an ordered
  * `when(rlike).otherwise(...)` chain over the normalized description.
  *
  * Scale rationale: a compiled chain is pure Catalyst — codegen'd,
  * null-safe, and usable inside any pushdown-friendly plan; a UDF would
  * break whole-stage codegen and hide the expression from the optimizer on
  * a 100 TB scan.
  *
  * Semantics preserved from the reference:
  *   - normalization = upper + whitespace-collapse before matching
  *     (categories_bb.py:219-220);
  *   - recurrence is computed INDEPENDENTLY of rule order: hint regex OR
  *     the matched rule's force_recorrente (categories_bb.py:226-233);
  *   - installment detector `PARC dd/dd` (categories_bb.py:226);
  *   - first-match on the ordered rule list, then the fallback cascade:
  *     installment → Compras/Parcelado, payment/refund words → Financeiro,
  *     else Outros (categories_bb.py:252-274).
  */
object Categorizer {

  /** Recurrence hints (categories_bb.py:216,227). */
  val recorrenteHints: Seq[String] =
    Seq("SUBSCR", "ASSINAT", "MENSAL", "MONTHLY", "ANUIDADE")

  /** Installment marker (categories_bb.py:226 / F17). */
  val parcPattern = "\\bPARC \\d{2}/\\d{2}\\b"

  /** Payment / refund vocabulary for the Financeiro fallback
    * (categories_bb.py:263-270). */
  val pagamentoPattern = "PAGAMENTO|PGTO|PAGTO|ESTORNO|CR[ÉE]DITO DE"

  private def norm(desc: Column): Column = textnorm.normUpper(desc)

  private def ruleRegex(r: CategoryRule): String =
    r.patterns.mkString("|")

  /** Compile the ordered rule list into one struct-valued Column with
    * fields (categoria, subcategoria, recorrente_suspeita,
    * parcelado_suspeito). */
  def categorize(desc: Column, rules: Seq[CategoryRule],
      hints: Seq[String] = recorrenteHints): Column =
    categorizeNormalized(norm(desc), rules, hints)

  /** Same chain over an ALREADY-normalized (upper, space-collapsed)
    * description. Use this when the input is known-normalized or the
    * caller materializes the normalization once: the `desc` expression is
    * inlined into every rlike branch of the chain (~2·rules+3 of them), so
    * passing a raw column through `categorize` pays trim+collapse+upper
    * per branch per row. */
  def categorizeNormalized(n: Column, rules: Seq[CategoryRule],
      hints: Seq[String] = recorrenteHints): Column = {
    val parc = n.rlike(parcPattern)

    val fallback = struct(
      when(parc, lit("Compras"))
        .when(n.rlike(pagamentoPattern), lit("Financeiro"))
        .otherwise(lit("Outros")).as("categoria"),
      when(parc, lit("Parcelado"))
        .when(n.rlike(pagamentoPattern), lit("Pagamentos"))
        .otherwise(lit("Geral")).as("subcategoria"),
      lit(false).as("force_recorrente"))

    val matched = rules.foldRight(fallback) { (r, acc) =>
      when(n.rlike(ruleRegex(r)), struct(
        lit(r.categoria).as("categoria"),
        lit(r.subcategoria).as("subcategoria"),
        lit(r.forceRecorrente).as("force_recorrente"))).otherwise(acc)
    }

    val recorrente = n.rlike(hints.mkString("|")) ||
      matched.getField("force_recorrente")

    struct(
      matched.getField("categoria").as("categoria"),
      matched.getField("subcategoria").as("subcategoria"),
      recorrente.as("recorrente_suspeita"),
      parc.as("parcelado_suspeito"))
  }

  /** ANSI-SQL rendering of the same compiled chain, for DuckDB oracles:
    * generates the ordered CASE for one output field over a normalized
    * description expression. Guarantees the oracle and the Column chain
    * share one source of truth for rule order and fallbacks. */
  def categorizeSqlField(descExpr: String, rules: Seq[CategoryRule],
      field: String, hints: Seq[String] = recorrenteHints): String = {
    def m(re: String) = s"regexp_matches($descExpr, '$re')"
    val ruleCases = rules.map { r =>
      val out = field match {
        case "categoria"    => s"'${r.categoria}'"
        case "subcategoria" => s"'${r.subcategoria}'"
        case "force"        => if (r.forceRecorrente) "TRUE" else "FALSE"
      }
      s"WHEN ${m(ruleRegex(r))} THEN $out"
    }.mkString(" ")
    val fallback = field match {
      case "categoria" =>
        s"WHEN ${m(parcPattern)} THEN 'Compras' " +
        s"WHEN ${m(pagamentoPattern)} THEN 'Financeiro' ELSE 'Outros'"
      case "subcategoria" =>
        s"WHEN ${m(parcPattern)} THEN 'Parcelado' " +
        s"WHEN ${m(pagamentoPattern)} THEN 'Pagamentos' ELSE 'Geral'"
      case "force" => "ELSE FALSE"
    }
    s"CASE $ruleCases $fallback END"
  }

  /** SQL for the two boolean flags. */
  def parceladoSql(descExpr: String): String =
    s"regexp_matches($descExpr, '$parcPattern')"

  def recorrenteSql(descExpr: String, rules: Seq[CategoryRule],
      hints: Seq[String] = recorrenteHints): String =
    s"(regexp_matches($descExpr, '${hints.mkString("|")}') OR " +
      categorizeSqlField(descExpr, rules, "force", hints) + ")"

  /** Representative transaction ruleset in the spirit of the reference's
    * BB rules table (rules/categories_bb.py:16-214) — same mechanics,
    * engine-owned data. Order matters: first match wins. */
  val transactionRules: Seq[CategoryRule] = Seq(
    CategoryRule("Transporte", "Apps", Seq("\\bUBER\\b", "\\b99\\s?APP", "CABIFY")),
    CategoryRule("Transporte", "Combustível", Seq("POSTO", "IPIRANGA", "SHELL", "PETROBRAS")),
    CategoryRule("Alimentação", "Delivery", Seq("IFOOD", "IFD\\*", "RAPPI")),
    CategoryRule("Alimentação", "Mercado", Seq("SUPERMERCADO", "MERCADO", "ATACAD")),
    CategoryRule("Alimentação", "Restaurante", Seq("RESTAURANTE", "CHURRASCARIA", "PIZZARIA")),
    CategoryRule("Assinaturas", "Streaming", Seq("NETFLIX", "SPOTIFY", "PRIME VIDEO", "HBO"),
      forceRecorrente = true),
    CategoryRule("Saúde", "Farmácia", Seq("FARMACIA", "DROGARIA", "PAGUE MENOS")),
    CategoryRule("Moradia", "Utilidades", Seq("ENERGIA", "ENEL", "CAGECE", "INTERNET"),
      forceRecorrente = true),
    CategoryRule("Educação", "Cursos", Seq("CURSO", "UDEMY", "ESCOLA", "FACULDADE")),
    CategoryRule("Lazer", "Viagem", Seq("AIRBNB", "HOTEL", "LATAM", "GOL\\b", "AZUL\\b")),
    CategoryRule("Financeiro", "Tarifas", Seq("TARIFA", "ANUIDADE", "JUROS", "IOF")))
}
