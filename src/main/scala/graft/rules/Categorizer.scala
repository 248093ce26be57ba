package graft.rules

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** One ordered first-match categorization rule — the reference's
  * `CategoryRule` config shape (rules/categories_bb.py:8-13): a category
  * plus an OPTIONAL subcategory and alternative regex patterns, with an
  * optional "this merchant is always recurring" override. */
final case class CategoryRule(
    categoria: String,
    subcategoria: Option[String],
    patterns: Seq[String],
    forceRecorrente: Boolean = false)

object CategoryRule {
  /** Convenience constructors for rules with a non-null subcategory. */
  def apply(categoria: String, subcategoria: String,
      patterns: Seq[String]): CategoryRule =
    new CategoryRule(categoria, Option(subcategoria), patterns, false)
  def apply(categoria: String, subcategoria: String, patterns: Seq[String],
      forceRecorrente: Boolean): CategoryRule =
    new CategoryRule(categoria, Option(subcategoria), patterns, forceRecorrente)
}

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
  * Semantics preserved from the reference, branch by branch
  * (categories_bb.py:223-274):
  *   - normalization = upper + whitespace-collapse + trim, null → ""
  *     (categories_bb.py:219-220 `_norm`);
  *   - `parcelado_suspeito` = installment marker `PARC\s+\d{2}/\d{2}`
  *     (:226), reported identically on every branch (the three fallbacks
  *     that hardcode False are only reachable when the marker is absent,
  *     because the parcelado fallback catches every marked row first);
  *   - rule match (first match wins over the ordered list, :229-239):
  *     recorrente = hint-regex match OR the rule's force_recorrente;
  *   - parcelado fallback (:242-248): Compras / "Parcelado (loja física)",
  *     recorrente forced False;
  *   - city-suffix + store-word fallback (:251-258): Compras /
  *     "Loja física", recorrente forced False;
  *   - payment/refund fallback (:261-267): Financeiro /
  *     "Pagamentos/Créditos/Estornos", recorrente forced False;
  *   - final fallback (:269-274): Outros / NULL subcategory, recorrente =
  *     hint-regex match.
  *
  * Known, deliberate divergence: pattern word boundaries (`\b`) are
  * ASCII here (Java rlike default and DuckDB RE2 — the oracle engine —
  * agree) while Python's are Unicode-aware, so a rule word IMMEDIATELY
  * adjacent to an accented letter (e.g. "DELIÉ" for `\bDELI\b`) matches
  * here and not in CPython. All of the reference's merchant vocabulary
  * is ASCII and every real parsed description keeps word boundaries at
  * spaces/punctuation, so the divergence surface is empty on the real
  * corpus; making `\b` Unicode-aware (`(?U)`) would break RE2 oracle
  * parity for no observed gain. Normalization IS Unicode-faithful (see
  * [[norm]]).
  */
object Categorizer {

  /** Recurrence hints, verbatim (categories_bb.py:216). */
  val recorrenteHints: Seq[String] =
    Seq("\\bSUBSCR\\b", "\\bASSINAT\\b", "\\bMENSAL\\b", "\\bMONTHLY\\b")

  /** Installment marker (categories_bb.py:226 / F17). */
  val parcPattern = "\\bPARC\\s+\\d{2}/\\d{2}\\b"

  /** City-at-end-of-description marker for the generic-store fallback
    * (categories_bb.py:251). */
  val cityPattern = "\\b(FORTALEZA|SAO PAULO|EUSEBIO|SALVADOR)\\b$"

  /** Store-word marker for the generic-store fallback
    * (categories_bb.py:252). */
  val storePattern = "\\b(COMERCIO|COMÉRCIO|VAREJO|BOUTIQUE|LOJA|DISTRIBUIDORA)\\b"

  /** Payment / refund vocabulary for the Financeiro fallback
    * (categories_bb.py:261). */
  val pagamentoPattern =
    "\\b(PAGAMENTO|PGTO|PAGTO|CREDITO|CR[ÉE]DITO|ESTORNO|CANCELAMENTO)\\b"

  /** `_norm` (categories_bb.py:219-220): upper + FULL whitespace collapse
    * + trim, with the Python `desc or ""` null guard. `(?U)` makes Java's
    * `\s` Unicode-aware like Python's — PDF-extracted text carries
    * non-breaking spaces (U+00A0), which Python `\s+` collapses and
    * ASCII `\s+` would leave in place, breaking e.g. the city-at-end
    * anchor of the Loja-física fallback. */
  private def norm(desc: Column): Column =
    upper(trim(regexp_replace(coalesce(desc, lit("")), "(?U)\\s+", " ")))

  private def ruleRegex(r: CategoryRule): String =
    r.patterns.mkString("|")

  private def litSub(sub: Option[String]): Column =
    sub.map(lit).getOrElse(lit(null).cast("string"))

  /** Compile the ordered rule list into one struct-valued Column with
    * fields (categoria, subcategoria, recorrente_suspeita,
    * parcelado_suspeito). */
  def categorize(desc: Column, rules: Seq[CategoryRule] = bbRules,
      hints: Seq[String] = recorrenteHints): Column =
    categorizeNormalized(norm(desc), rules, hints)

  /** Same chain over an ALREADY-normalized (upper, space-collapsed,
    * non-null) description. Use this when the input is known-normalized or
    * the caller materializes the normalization once: the `desc` expression
    * is inlined into every rlike branch of the chain (~2·rules+5 of them),
    * so passing a raw column through `categorize` pays
    * trim+collapse+upper per branch per row. */
  def categorizeNormalized(n: Column, rules: Seq[CategoryRule] = bbRules,
      hints: Seq[String] = recorrenteHints): Column = {
    val parc = n.rlike(parcPattern)
    val hint = n.rlike(hints.mkString("|"))
    val lojaFisica = n.rlike(cityPattern) && n.rlike(storePattern)
    val pagamento = n.rlike(pagamentoPattern)

    def branch(cat: Column, sub: Column): Column = struct(
      cat.as("categoria"), sub.as("subcategoria"))

    // Fallback cascade, in reference order (categories_bb.py:242-274).
    val fallback =
      when(parc,
        branch(lit("Compras"), lit("Parcelado (loja física)")))
      .when(lojaFisica,
        branch(lit("Compras"), lit("Loja física")))
      .when(pagamento,
        branch(lit("Financeiro"), lit("Pagamentos/Créditos/Estornos")))
      .otherwise(branch(lit("Outros"), lit(null).cast("string")))

    val matched = rules.foldRight(fallback) { (r, acc) =>
      when(n.rlike(ruleRegex(r)),
        branch(lit(r.categoria), litSub(r.subcategoria))).otherwise(acc)
    }

    // recorrente as its OWN chain (identical values; the parity spec and
    // the q18/q80 gates pin it): on the fallback regime the cascade
    // forces recorrente off everywhere except Outros, which is
    // equivalently `hint && !parc && !loja && !pagamento` — And
    // short-circuits left-to-right, so a no-hint row (the common case)
    // answers with ONE regex where the struct-cascade form pays four.
    // The rule rlikes are shared with `matched` by codegen
    // subexpression elimination, so the second chain adds no regex work.
    val recorrente = rules.foldRight(
        (hint && !parc && !lojaFisica && !pagamento): Column) { (r, acc) =>
      when(n.rlike(ruleRegex(r)),
        if (r.forceRecorrente) lit(true) else hint).otherwise(acc)
    }

    struct(
      matched.getField("categoria").as("categoria"),
      matched.getField("subcategoria").as("subcategoria"),
      recorrente.as("recorrente_suspeita"),
      parc.as("parcelado_suspeito"))
  }

  /** ANSI-SQL rendering of the same compiled chain, for DuckDB oracles:
    * generates the ordered CASE for one output field over a normalized
    * description expression. Guarantees the oracle and the Column chain
    * share one source of truth for rule order and the fallback cascade.
    * `field` ∈ {categoria, subcategoria, recorrente}. */
  def categorizeSqlField(descExpr: String, rules: Seq[CategoryRule],
      field: String, hints: Seq[String] = recorrenteHints): String = {
    // SQL-literal escape: an apostrophe in a future rule pattern or
    // category label (common in merchant names) must not corrupt the
    // generated oracle.
    def lit(s: String) = "'" + s.replace("'", "''") + "'"
    def m(re: String) = s"regexp_matches($descExpr, ${lit(re)})"
    val hintSql = m(hints.mkString("|"))
    val lojaSql = s"(${m(cityPattern)} AND ${m(storePattern)})"
    val ruleCases = rules.map { r =>
      val out = field match {
        case "categoria"    => lit(r.categoria)
        case "subcategoria" =>
          r.subcategoria.map(lit).getOrElse("CAST(NULL AS VARCHAR)")
        case "recorrente"   => if (r.forceRecorrente) "TRUE" else hintSql
      }
      s"WHEN ${m(ruleRegex(r))} THEN $out"
    }.mkString(" ")
    val fallback = field match {
      case "categoria" =>
        s"WHEN ${m(parcPattern)} THEN 'Compras' " +
        s"WHEN $lojaSql THEN 'Compras' " +
        s"WHEN ${m(pagamentoPattern)} THEN 'Financeiro' ELSE 'Outros'"
      case "subcategoria" =>
        s"WHEN ${m(parcPattern)} THEN 'Parcelado (loja física)' " +
        s"WHEN $lojaSql THEN 'Loja física' " +
        s"WHEN ${m(pagamentoPattern)} THEN 'Pagamentos/Créditos/Estornos' " +
        "ELSE CAST(NULL AS VARCHAR)"
      case "recorrente" =>
        s"WHEN ${m(parcPattern)} THEN FALSE " +
        s"WHEN $lojaSql THEN FALSE " +
        s"WHEN ${m(pagamentoPattern)} THEN FALSE ELSE $hintSql"
    }
    s"CASE $ruleCases $fallback END"
  }

  /** SQL for the two boolean flags. */
  def parceladoSql(descExpr: String): String =
    s"regexp_matches($descExpr, '${parcPattern.replace("'", "''")}')"

  def recorrenteSql(descExpr: String, rules: Seq[CategoryRule],
      hints: Seq[String] = recorrenteHints): String =
    categorizeSqlField(descExpr, rules, "recorrente", hints)

  /** The reference's BB rule table, ported verbatim — all 23 ordered
    * `CategoryRule`s from rules/categories_bb.py:16-214. Order matters:
    * first match wins. */
  val bbRules: Seq[CategoryRule] = Seq(
    // Educação (categories_bb.py:20-25)
    CategoryRule("Educação", None,
      Seq("\\bFIAP\\b", "\\bUDEMY\\b", "\\bCOURSERA\\b", "\\bCURSO\\b")),
    // Saúde / Bem-estar (:30-41)
    CategoryRule("Saúde", "Telemedicina/Serviços",
      Seq("\\bRDSAUDE\\b", "\\bRDSAUDE ONLINE\\b"), forceRecorrente = true),
    CategoryRule("Saúde", "Academia/Bem-estar",
      Seq("\\bWELLHUB\\b", "\\bGYMPASS\\b"), forceRecorrente = true),
    // Assinaturas / serviços digitais (:46-57)
    CategoryRule("Assinaturas", "Software/IA",
      Seq("\\bOPENAI\\b", "\\bCHATGPT\\b"), forceRecorrente = true),
    CategoryRule("Assinaturas", "Google/Amazon (digital)",
      Seq("\\bDL\\*GOOGLE\\b", "\\bGOOGLE\\b", "\\bAMAZON\\b"),
      forceRecorrente = true),
    // Compras / e-commerce / pagamentos (:62-73)
    CategoryRule("Compras", "E-commerce",
      Seq("\\bMERCADOLIVRE\\b", "\\bMERCADO LIVRE\\b")),
    CategoryRule("Financeiro", "Pagamentos/Carteira digital",
      Seq("\\bMERCADOPAGO\\b", "\\bMERCADO PAGO\\b", "\\bPAYGO\\b")),
    // Mercado / alimentação em casa (:78-95)
    CategoryRule("Mercado", "Supermercado",
      Seq("\\bANCORA DISTRIBUIDORA\\b")),
    CategoryRule("Mercado", None,
      Seq("\\bPINHEIRO\\b", "\\bMERCADINHO SAO LUIZ\\b", "\\bMERCADO 901\\b",
        "\\bMERCADINHO\\b", "\\bSUPERMERCADO\\b")),
    // Transporte (:100-123)
    CategoryRule("Transporte", "Apps/Taxi",
      Seq("\\bUBER\\b", "HELP\\.UBER", "WWW\\.UBER\\.COM")),
    CategoryRule("Transporte", "Estacionamento",
      Seq("\\bPARKING\\b", "\\bITC PARKING\\b", "\\bESTACIONA\\b",
        "\\bTEIXEIRA ESTACIONA\\b", "\\bTEIXEIRA ESTACIONAME\\b")),
    CategoryRule("Transporte", "Combustível",
      Seq("\\bSOBRAL E PALACIO\\b")),
    // Lazer / Esporte (:128-157)
    CategoryRule("Lazer", "Esporte / Beach Tennis",
      Seq("\\bHABACUC\\b", "\\bHABACUCBANDEIRA\\b")),
    CategoryRule("Lazer", "Shopping", Seq("\\bRIOMAR\\b")),
    CategoryRule("Lazer", "Clube/Atividades", Seq("\\bSESC\\b")),
    CategoryRule("Lazer", "Eventos",
      Seq("\\bPINK FESTAS\\b", "\\bZP\\*PLAY NAS FRIAS\\b",
        "\\bPLAY NAS FRIAS\\b")),
    CategoryRule("Lazer", "Esporte", Seq("\\bPODIUM BT\\b", "\\bPODIUM\\b")),
    // Casa / Variedades (:162-167)
    CategoryRule("Casa", "Varejo/Variedades",
      Seq("\\bM V VARIEDADES\\b", "\\bMUNDO E CIA\\b", "\\bVARIEDADES\\b",
        "\\bMUNDO\\b")),
    // Seguros (:172-177)
    CategoryRule("Seguros", "Auto",
      Seq("\\bBRADESCO AUT\\*", "\\bTOKIO MARINE\\*AUTO\\b",
        "\\bTOKIO MARINE\\b"), forceRecorrente = true),
    // Compras (loja física genérica) (:182-187)
    CategoryRule("Compras", "Loja física",
      Seq("\\bDPSSA\\b", "\\bCASA BLANCA\\b")),
    // Alimentação (iFood / delivery / restaurantes) (:192-203)
    CategoryRule("Alimentação", "Delivery",
      Seq("\\bIFD\\*", "\\bIFOOD\\b", "\\bRAPPI\\b", "\\bUBER EATS\\b")),
    CategoryRule("Alimentação", "Restaurante/Lanchonete",
      Seq("\\bRESTAURANT\\b", "\\bGASTRONOMIA\\b", "\\bDELI\\b",
        "\\bALIMENTACAO\\b")),
    // Financeiro (tarifas/juros/etc) (:208-213)
    CategoryRule("Financeiro", "Tarifas/Juros/IOF",
      Seq("\\bIOF\\b", "\\bJUROS\\b", "\\bENCARG\\b", "\\bMULTA\\b",
        "\\bTARIFA\\b", "\\bANUIDADE\\b")))
}
