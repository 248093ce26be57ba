package graft

import java.nio.file.{Files, Path, Paths}
import java.util.regex.Pattern

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.parse.{Parsers, PdfText}
import graft.rules.Categorizer

/** Reference-parity proof for the rules engine: an INDEPENDENT row-level
  * Scala transcription of `categorize_bb` (rules/categories_bb.py:16-274 —
  * the rule table is re-typed here verbatim, NOT shared with
  * [[Categorizer.bbRules]], so a drifted rule in either copy fails the
  * test) is compared against the compiled Catalyst chain on three corpora:
  * the gate's merchant samples, a generated adversarial corpus (casing /
  * whitespace / word-boundary near-misses / fallback interactions), and
  * the descriptions parsed from the reference's real checked-in BB bill
  * PDFs. */
class CategorizerParitySpec extends SparkSpec {

  // ---- direct transcription of categories_bb.py ------------------------

  private case class PRule(cat: String, sub: Option[String],
      pats: Seq[String], force: Boolean)

  private val pRules: Seq[PRule] = Seq(
    PRule("Educação", None,
      Seq("\\bFIAP\\b", "\\bUDEMY\\b", "\\bCOURSERA\\b", "\\bCURSO\\b"), false),
    PRule("Saúde", Some("Telemedicina/Serviços"),
      Seq("\\bRDSAUDE\\b", "\\bRDSAUDE ONLINE\\b"), true),
    PRule("Saúde", Some("Academia/Bem-estar"),
      Seq("\\bWELLHUB\\b", "\\bGYMPASS\\b"), true),
    PRule("Assinaturas", Some("Software/IA"),
      Seq("\\bOPENAI\\b", "\\bCHATGPT\\b"), true),
    PRule("Assinaturas", Some("Google/Amazon (digital)"),
      Seq("\\bDL\\*GOOGLE\\b", "\\bGOOGLE\\b", "\\bAMAZON\\b"), true),
    PRule("Compras", Some("E-commerce"),
      Seq("\\bMERCADOLIVRE\\b", "\\bMERCADO LIVRE\\b"), false),
    PRule("Financeiro", Some("Pagamentos/Carteira digital"),
      Seq("\\bMERCADOPAGO\\b", "\\bMERCADO PAGO\\b", "\\bPAYGO\\b"), false),
    PRule("Mercado", Some("Supermercado"),
      Seq("\\bANCORA DISTRIBUIDORA\\b"), false),
    PRule("Mercado", None,
      Seq("\\bPINHEIRO\\b", "\\bMERCADINHO SAO LUIZ\\b", "\\bMERCADO 901\\b",
        "\\bMERCADINHO\\b", "\\bSUPERMERCADO\\b"), false),
    PRule("Transporte", Some("Apps/Taxi"),
      Seq("\\bUBER\\b", "HELP\\.UBER", "WWW\\.UBER\\.COM"), false),
    PRule("Transporte", Some("Estacionamento"),
      Seq("\\bPARKING\\b", "\\bITC PARKING\\b", "\\bESTACIONA\\b",
        "\\bTEIXEIRA ESTACIONA\\b", "\\bTEIXEIRA ESTACIONAME\\b"), false),
    PRule("Transporte", Some("Combustível"),
      Seq("\\bSOBRAL E PALACIO\\b"), false),
    PRule("Lazer", Some("Esporte / Beach Tennis"),
      Seq("\\bHABACUC\\b", "\\bHABACUCBANDEIRA\\b"), false),
    PRule("Lazer", Some("Shopping"), Seq("\\bRIOMAR\\b"), false),
    PRule("Lazer", Some("Clube/Atividades"), Seq("\\bSESC\\b"), false),
    PRule("Lazer", Some("Eventos"),
      Seq("\\bPINK FESTAS\\b", "\\bZP\\*PLAY NAS FRIAS\\b",
        "\\bPLAY NAS FRIAS\\b"), false),
    PRule("Lazer", Some("Esporte"), Seq("\\bPODIUM BT\\b", "\\bPODIUM\\b"), false),
    PRule("Casa", Some("Varejo/Variedades"),
      Seq("\\bM V VARIEDADES\\b", "\\bMUNDO E CIA\\b", "\\bVARIEDADES\\b",
        "\\bMUNDO\\b"), false),
    PRule("Seguros", Some("Auto"),
      Seq("\\bBRADESCO AUT\\*", "\\bTOKIO MARINE\\*AUTO\\b",
        "\\bTOKIO MARINE\\b"), true),
    PRule("Compras", Some("Loja física"),
      Seq("\\bDPSSA\\b", "\\bCASA BLANCA\\b"), false),
    PRule("Alimentação", Some("Delivery"),
      Seq("\\bIFD\\*", "\\bIFOOD\\b", "\\bRAPPI\\b", "\\bUBER EATS\\b"), false),
    PRule("Alimentação", Some("Restaurante/Lanchonete"),
      Seq("\\bRESTAURANT\\b", "\\bGASTRONOMIA\\b", "\\bDELI\\b",
        "\\bALIMENTACAO\\b"), false),
    PRule("Financeiro", Some("Tarifas/Juros/IOF"),
      Seq("\\bIOF\\b", "\\bJUROS\\b", "\\bENCARG\\b", "\\bMULTA\\b",
        "\\bTARIFA\\b", "\\bANUIDADE\\b"), false))

  private val pHints =
    Seq("\\bSUBSCR\\b", "\\bASSINAT\\b", "\\bMENSAL\\b", "\\bMONTHLY\\b")

  private case class CatOut(categoria: String, subcategoria: Option[String],
      recorrente: Boolean, parcelado: Boolean)

  /** categorize_bb (categories_bb.py:223-274), line by line. `(?U)\s+`
    * mirrors Python's Unicode-aware whitespace collapse (NBSP included);
    * pattern `\b` stays ASCII in both this port and the engine — the
    * documented deliberate divergence from CPython (Categorizer scaladoc),
    * shared so the parity contract is exact. */
  private def categorizeBBPort(desc: String): CatOut = {
    val d = Option(desc).getOrElse("").toUpperCase(java.util.Locale.ROOT)
      .replaceAll("(?U)\\s+", " ").trim
    def find(p: String): Boolean =
      Pattern.compile(p, Pattern.CASE_INSENSITIVE).matcher(d).find()

    val parcelado = find("\\bPARC\\s+\\d{2}/\\d{2}\\b")
    var recorrente = pHints.exists(find)

    for (rule <- pRules; pat <- rule.pats)
      if (find(pat)) {
        if (rule.force) recorrente = true
        return CatOut(rule.cat, rule.sub, recorrente, parcelado)
      }

    if (parcelado)
      return CatOut("Compras", Some("Parcelado (loja física)"), false, true)

    if (find("\\b(FORTALEZA|SAO PAULO|EUSEBIO|SALVADOR)\\b$") &&
        find("\\b(COMERCIO|COMÉRCIO|VAREJO|BOUTIQUE|LOJA|DISTRIBUIDORA)\\b"))
      return CatOut("Compras", Some("Loja física"), false, false)

    if (find("\\b(PAGAMENTO|PGTO|PAGTO|CREDITO|CR[ÉE]DITO|ESTORNO|CANCELAMENTO)\\b"))
      return CatOut("Financeiro", Some("Pagamentos/Créditos/Estornos"),
        false, parcelado)

    CatOut("Outros", None, recorrente, parcelado)
  }

  // ---- compiled-chain runner -------------------------------------------

  private def runChain(descs: Seq[String]): Seq[CatOut] = {
    val df = LocalTable.of(spark,
      StructType(Seq(StructField("d", StringType))),
      descs.map(Row(_)))
    df.select(Categorizer.categorize(col("d")).as("c"))
      .select("c.categoria", "c.subcategoria", "c.recorrente_suspeita",
        "c.parcelado_suspeito")
      .collect().toSeq
      .map(r => CatOut(r.getString(0), Option(r.getString(1)),
        r.getBoolean(2), r.getBoolean(3)))
  }

  private def assertParity(descs: Seq[String]): Unit = {
    val chain = runChain(descs)
    descs.zip(chain).foreach { case (d, got) =>
      val want = categorizeBBPort(d)
      assert(got === want, s"parity break on '$d'")
    }
  }

  // ---- corpora -----------------------------------------------------------

  test("parity on the gate's merchant samples") {
    assertParity(graft.operators.RulesQ.bbSamples)
  }

  test("parity on a generated adversarial corpus") {
    val merchants = Seq(
      "FIAP", "UDEMY", "CURSO", "RDSAUDE ONLINE", "WELLHUB", "GYMPASS",
      "OPENAI", "CHATGPT", "DL*GOOGLE", "GOOGLE", "AMAZON", "MERCADOLIVRE",
      "MERCADO LIVRE", "MERCADOPAGO", "MERCADO PAGO", "PAYGO",
      "ANCORA DISTRIBUIDORA", "PINHEIRO", "MERCADINHO SAO LUIZ",
      "MERCADO 901", "MERCADINHO", "SUPERMERCADO", "UBER", "HELP.UBER.COM",
      "PARKING", "ESTACIONA", "TEIXEIRA ESTACIONAME", "SOBRAL E PALACIO",
      "HABACUC", "RIOMAR", "SESC", "PINK FESTAS", "ZP*PLAY NAS FRIAS",
      "PODIUM BT", "PODIUM", "M V VARIEDADES", "MUNDO E CIA", "MUNDO",
      "BRADESCO AUT*SEGURO", "TOKIO MARINE*AUTO", "TOKIO MARINE", "DPSSA",
      "CASA BLANCA", "IFD*REST", "IFOOD", "RAPPI", "UBER EATS",
      "RESTAURANT", "GASTRONOMIA", "DELI", "ALIMENTACAO", "IOF", "JUROS",
      "ENCARGOS", "MULTA", "TARIFA BANCARIA", "ANUIDADE DIFERENCIADA",
      // word-boundary near-misses (must NOT match the rules)
      "UBERLANDIA TRANSPORTES", "GOOGLEMAPSTORE", "SUBMUNDO", "PODIUMX",
      "AMAZONIA VIAGENS", "DELICIA DOCES", "MULTASERV", "RIOMARED",
      // payment / fallback vocabulary
      "PAGAMENTO EFETUADO", "PGTO DEB CC", "PAGTO FATURA", "CREDITO",
      "CRÉDITO EM CONTA", "ESTORNO", "CANCELAMENTO", "CREDITOS EXTRAS",
      // store words and cities (alone and combined)
      "COMERCIO DE PECAS", "VAREJO POPULAR", "BOUTIQUE ZEN", "LOJA 5",
      "DISTRIBUIDORA NORTE", "FORTALEZA", "SAO PAULO", "EUSEBIO",
      "SALVADOR", "COMERCIO DE PECAS FORTALEZA", "VAREJO POPULAR SAO PAULO",
      "BOUTIQUE ZEN EUSEBIO", "LOJA 5 SALVADOR", "FORTALEZA COMERCIO",
      // hints
      "SUBSCR", "ASSINAT", "ASSINATURA", "MENSAL", "MONTHLY", "MENSALIDADE",
      // misc
      "TRANSFERENCIA PIX", "ZZZ")
    val suffixes = Seq("", " PARC 02/10", " PARC  11/12", " MENSAL",
      " FORTALEZA", " LOJA FORTALEZA", " PARC 3/10")
    val base = for (m <- merchants; s <- suffixes) yield m + s
    // casing + whitespace variants of a deterministic slice
    val variants = base.zipWithIndex.collect {
      case (d, i) if i % 3 == 0 => d.toLowerCase(java.util.Locale.ROOT)
      case (d, i) if i % 3 == 1 => s"  ${d.replace(" ", "\t ")} "
    }
    // non-breaking space (PDF extraction artifact): Unicode \s+ collapse
    // must fold it so the city-at-end anchor still fires
    val nbsp = Seq("LOJA DAS FLORES SALVADOR", "BOUTIQUE ZEN EUSEBIO",
      "PGTO FATURA")
    assertParity(base ++ variants ++ nbsp :+ null :+ "" :+ "   ")
  }

  test("parity on seeded fuzz descriptions (scalacheck)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // fragments chosen to collide with rule vocabulary, boundaries,
    // hints, cities, store words, stars, digits, accents and exotic
    // whitespace — then concatenated into random multi-fragment
    // descriptions with random joiners
    val frags = Gen.oneOf(
      "UBER", "UBERX", "GOOGLE", "GOOGLEX", "AMAZON", "AMAZONIA", "FIAP",
      "CURSO", "CURSOS", "DELI", "DELICIA", "MUNDO", "SUBMUNDO", "PODIUM",
      "IOF", "MULTA", "MULTAS", "TARIFA", "PARC", "02/10", "2/10", "11/12",
      "PGTO", "PAGTO", "CREDITO", "CREDITOS", "ESTORNO", "CANCELAMENTO",
      "MENSAL", "MENSALIDADE", "MONTHLY", "SUBSCR", "ASSINAT", "ASSINATURA",
      "LOJA", "BOUTIQUE", "COMERCIO", "VAREJO", "DISTRIBUIDORA",
      "FORTALEZA", "SAO", "PAULO", "SAO PAULO", "EUSEBIO", "SALVADOR",
      "IFD*", "DL*GOOGLE", "ZP*PLAY", "TOKIO", "MARINE*AUTO", "M", "V",
      "VARIEDADES", "café", "São", "ação", "x1", "99", "*", "", " ")
    val joiner = Gen.oneOf(" ", "  ", "\t", " ", " * ", "/")
    val desc = for {
      n  <- Gen.chooseNum(1, 6)
      fs <- Gen.listOfN(n, frags)
      js <- Gen.listOfN(n, joiner)
    } yield fs.zip(js).map { case (f, j) => f + j }.mkString.trim
    val corpus = Gen.listOfN(400, desc)
      .pureApply(Gen.Parameters.default, Seed(4242L))
      .distinct
    assertParity(corpus)
  }

  test("parity on the reference's real parsed BB bill descriptions") {
    val url = getClass.getResource("/landing_real")
    assert(url != null, "landing_real fixture dir missing from test resources")
    val root = Paths.get(url.toURI)
      .resolve("01_clientes/cruz_raulino_familia/01_bancos/bb/faturas")
    val pdfs: Seq[Path] = Files.walk(root).iterator().asScala
      .filter(p => p.toString.toLowerCase.endsWith(".pdf")).toSeq
      .sortBy(_.toString)
    assert(pdfs.size === 4)
    val descs = pdfs.flatMap { p =>
      Parsers.parseBBBill(PdfText.extractText(Files.readAllBytes(p)))
        .map(_.descricao)
    }
    assert(descs.size > 100, s"unexpectedly small real corpus: ${descs.size}")
    assertParity(descs)
    // and the real corpus must actually land in real categories
    val cats = descs.map(categorizeBBPort(_).categoria).toSet
    assert(cats.contains("Educação") || cats.contains("Transporte") ||
      cats.contains("Alimentação"))
  }
}
