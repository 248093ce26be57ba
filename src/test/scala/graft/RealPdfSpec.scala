package graft

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import graft.parse.{Parsers, ParsePipeline, PdfText}
import graft.sources.Sources

/** End-to-end proof against the reference's REAL checked-in bank PDFs
  * (spark/scripts/data/raw/drive/01_clientes/cruz_raulino_familia/...,
  * copied verbatim into src/test/resources/landing_real): extraction
  * (PdfText), parsing (Parsers), and the distributed pipeline
  * (Sources.landingFiles → extractPdfTexts → ParsePipeline) all run on
  * real pdfplumber-grade documents — CID/Type0 fonts with ToUnicode CMaps
  * (BB faturas), WinAnsi TrueType (Bradesco), positioned text requiring
  * reading-order assembly.
  *
  * Golden expectations come from the reference's own inspection harness:
  * inspect_bradesco_output.py:121-130 validates card finals
  * 0039/9952/9953 against the parsed Bradesco bills. */
class RealPdfSpec extends SparkSpec {

  private val root: Path = {
    val url = getClass.getResource("/landing_real")
    assert(url != null, "landing_real fixture dir missing from test resources")
    Paths.get(url.toURI)
  }

  private def pdfsUnder(sub: String): Seq[Path] = {
    val dir = root.resolve("01_clientes/cruz_raulino_familia/01_bancos").resolve(sub)
    Files.walk(dir).iterator().asScala
      .filter(p => p.toString.toLowerCase.endsWith(".pdf")).toSeq.sortBy(_.toString)
  }

  private def text(p: Path): String = PdfText.extractText(Files.readAllBytes(p))

  test("all 15 real PDFs extract non-empty text") {
    val all = pdfsUnder("")
    assert(all.size === 15)
    all.foreach { p =>
      val t = text(p)
      assert(t.length > 200, s"near-empty extraction for $p (${t.length} chars)")
    }
  }

  test("BB faturas (CID fonts + ToUnicode): transactions, card context, resumo") {
    val faturas = pdfsUnder("bb/faturas")
    assert(faturas.size === 4)
    faturas.foreach { p =>
      val rows = Parsers.parseBBBill(text(p))
      assert(rows.nonEmpty, s"no transactions parsed from $p")
      assert(rows.forall(_.final_cartao != null), s"rows without card context in $p")
    }
    // the October 2025 bill, field-level
    val out25 = text(faturas.find(_.toString.contains("Out_25")).get)
    val rows = Parsers.parseBBBill(out25)
    assert(rows.map(_.final_cartao).distinct.sorted === Seq("3116", "4229"))
    assert(rows.exists(r => r.titular_cartao == "Sergio Maia Raulino" &&
      r.final_cartao == "4229"))
    val fiap = rows.find(_.descricao.startsWith("FIAP")).get
    assert(fiap.valor === 490.0 && fiap.pais === "BR" && fiap.data === "05/09")
    // negative payment row survives the sign
    assert(rows.exists(_.valor < -15000))
    val resumo = Parsers.parseFaturaResumo(out25)
    assert(resumo.vencimento === "05/10/2025")
    assert(resumo.valor_total === 13703.95)
    assert(resumo.titular != null)
    // every bill in the corpus yields a vencimento and a total
    faturas.foreach { p =>
      val r = Parsers.parseFaturaResumo(text(p))
      assert(r.vencimento != null && r.vencimento.matches("""\d{2}/\d{2}/\d{4}"""),
        s"no vencimento from $p")
      assert(r.valor_total != null && r.valor_total > 0, s"no total from $p")
    }
  }

  test("BB extratos (real C/D layout): movements, groups, header") {
    val extratos = pdfsUnder("bb/extratos")
    assert(extratos.size === 4)
    extratos.foreach { p =>
      val rows = Parsers.parseExtrato(text(p))
      assert(rows.nonEmpty, s"no movements parsed from $p")
    }
    val jan = text(extratos.find(_.toString.contains("2026/01")).get)
    val hdr = Parsers.parseExtratoHeader(jan).get
    assert(hdr.agencia === "4041-X" && hdr.conta === "18506-X")
    assert(hdr.cliente === "SERGIO MAIA RAULINO")
    val rows = Parsers.parseExtrato(jan)
    // Pix credit of 461,80 on 02/01 with its Documento column recovered
    val pix = rows.find(r => r.valor == 461.80).get
    assert(pix.sinal === "+" && pix.data === "02/01/2026" &&
      pix.documento === "21.144.035.264.451")
    assert(pix.grupo === "Pix - Recebido")
    // debits carry the negative sign
    assert(rows.exists(r => r.sinal == "-" && r.valor == -1448.63))
    // boleto payee wrapped onto the next line lands in complemento
    assert(rows.exists(r => Option(r.complemento).exists(_.contains("COELCE"))))
  }

  test("Bradesco faturas (real layout): reference golden finals 0039/9952/9953") {
    val faturas = pdfsUnder("bradesco/faturas")
    assert(faturas.size === 3)
    val perDoc = faturas.map(p => p -> Parsers.parseBradesco(text(p))).toMap
    perDoc.foreach { case (p, rows) => assert(rows.nonEmpty, s"no rows from $p") }
    // the reference's own golden (inspect_bradesco_output.py --expected-finals)
    val finals = perDoc.values.flatten.map(_.cartao_final).toSet
    assert(finals === Set("0039", "9952", "9953"))
    val jan = perDoc.find(_._1.toString.contains("2026/01")).get._2
    assert(jan.map(_.cartao_final).toSet === Set("0039", "9952", "9953"))
    // the November bill only carries the two main cards
    val nov = perDoc.find(_._1.toString.contains("2025/11")).get._2
    assert(nov.map(_.cartao_final).toSet === Set("9952", "9953"))
    // all parsed values are plausible money (no date/doc tokens leaked in)
    perDoc.values.flatten.foreach(r => assert(math.abs(r.valor) < 100000, r.toString))
    // payment with leading minus → tipo pagamento, negative value
    val pagto = jan.find(_.tipo == "pagamento").get
    assert(pagto.valor === -12027.45 && pagto.descricao.startsWith("PAGTO"))
    // day/month sandwich resolves to dd/MM
    val grill = jan.find(_.descricao == "FORTALEZA GRILL").get
    assert(grill.data === "07/12" && grill.valor === 134.26)
    assert(jan.forall(_.titular_cartao != null))
    assert(jan.exists(r => r.titular_cartao == "SERGIO M RAULINO" &&
      r.cartao_final == "9953"))
    assert(jan.exists(r => r.titular_cartao == "PAULA V C RAULINO" &&
      r.cartao_final == "9952"))
  }

  test("Bradesco extratos: header + movements (an extractor the reference never " +
      "built — etls_raw/main.py:231-232)") {
    val extratos = pdfsUnder("bradesco/extratos")
    assert(extratos.size === 4)
    extratos.foreach { p =>
      assert(Parsers.parseBradescoExtrato(text(p)).nonEmpty, s"no movements from $p")
    }
    val out = text(extratos.find(_.toString.contains("2025/10")).get)
    val hdr = Parsers.parseBradescoExtratoHeader(out).get
    assert(hdr.nome === "SERGIO MAIA RAULINO")
    assert(hdr.agencia === "2515" && hdr.conta === "7787-9")
    val rows = Parsers.parseBradescoExtrato(out)
    // pending-histórico line above a dated credit, saldo column, complemento
    val pix = rows.find(r => r.documento == "1033051").get
    assert(pix.data === "03/11/25" && pix.historico === "Transfe Pix" &&
      pix.valor === 2980.0 && pix.saldo === 2980.0 &&
      pix.complemento === "Rem: Sergio Maia Raulino 03/11")
    // debit: separate minus token binds to the value
    val debit = rows.find(r => r.documento == "1356578").get
    assert(debit.valor === -59.80 && debit.saldo === 12.82 &&
      debit.complemento.contains("Des: Becker"))
    // undated row inherits the last seen date
    val carried = rows.find(r => r.documento == "1241170").get
    assert(carried.data === "05/12/25" && carried.valor === 1000.0 &&
      carried.saldo === null)
    // inline-histórico row with both value and balance
    val rent = rows.find(r => r.documento == "8044755").get
    assert(rent.historico === "Rent.inv.facil" && rent.data === "05/11/25" &&
      rent.valor === 0.02 && rent.saldo === 5256.08)
    // balances are not movements
    assert(!rows.exists(r => Option(r.historico).exists(_.toUpperCase.startsWith("SALDO"))))
    // distributed path
    val raw = LocalTable.of(spark,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("landing_object_key",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))),
      Seq(org.apache.spark.sql.Row("x.pdf", out)))
    assert(ParsePipeline.bradescoExtratos(raw).count() === rows.size.toLong)
  }

  test("real forms CSV: multiline pt-BR headers, rename map, BRL/date parse, NULL survival") {
    val csv = root.resolve(
      "02_forms/cruz_raulino_familia/forms_gastos_compartilhados_20260103.csv")
    assert(Files.exists(csv))
    val df = Sources.readFormsCsv(spark, csv.toString, "cruz_raulino_familia")
    val rows = df.collect()
    assert(rows.length === 151)
    // the quirky embedded-newline headers landed on the normalized names
    assert(df.columns.take(8) === Array("carimbo", "lancado_por", "data_pagamento",
      "vencimento", "descricao", "valor", "tipo_de_custo", "categoria"))
    // pt-BR money without the R$ prefix, including single-decimal values
    val vals = rows.flatMap(r => Option(r.getAs[java.lang.Double]("valor")))
    assert(vals.contains(92.6) && vals.contains(237.63))
    // real-world dirt: one blank valor plus five free-text entries the
    // users typed into the money column ("388,29 ifood", "Frangolandia"…)
    // — all degrade to NULL (the reference's float-parse failure
    // contract), never to a crash under ANSI mode
    assert(rows.count(_.isNullAt(df.columns.indexOf("valor"))) === 6)
    // submitters and dates parse
    assert(rows.map(_.getAs[String]("lancado_por")).distinct.sorted
      === Array("Sergio", "Valesca"))
    assert(rows.forall(!_.isNullAt(df.columns.indexOf("carimbo"))))
    assert(rows.forall(_.getAs[String]("client_slug") == "cruz_raulino_familia"))
    // accented categories survive UTF-8 end-to-end
    assert(rows.exists(_.getAs[String]("categoria") == "1. Alimentação"))
  }

  test("FinTrackJob runs the full §3 slice on the real forms export") {
    val csv = root.resolve(
      "02_forms/cruz_raulino_familia/forms_gastos_compartilhados_20260103.csv")
    val out = Files.createTempDirectory("graft-realjob-").toString
    val budget = Seq("1. Alimentação" -> 2000.0, "3. Água, Luz e Gás" -> 800.0,
      "99. Inexistente" -> 50.0)
    val (monthly, compare) = graft.jobs.FinTrackJob.run(spark, csv.toString,
      "cruz_raulino_familia", budget, out,
      java.sql.Timestamp.valueOf("2026-01-03 00:00:00"))
    val m = monthly.collect()
    assert(m.nonEmpty && m.forall(r => r.getAs[String]("categoria") != null))
    val c = compare.collect().map(r => r.getAs[String]("categoria") -> r).toMap
    // budgeted-but-unspent category zero-fills; real categories join
    assert(c("99. Inexistente").getAs[Double]("realizado") === 0.0)
    assert(c.contains("1. Alimentação") &&
      !c("1. Alimentação").getAs[Boolean]("sem_orcamento"))
    // unbudgeted real spend is flagged
    assert(c.exists { case (_, r) => r.getAs[Boolean]("sem_orcamento") })
    // reports land as CSV files
    assert(Files.list(Paths.get(out, "monthly_by_category")).iterator().asScala
      .exists(_.toString.endsWith(".csv")))
  }

  test("distributed path: landingFiles → extractPdfTexts → ParsePipeline on real corpus") {
    val landing = Sources.landingFiles(spark, root.toString)
    val byKind = landing.groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the two forms CSVs under 02_forms are listed but are not bank docs:
    // the folder-based classifier puts them in 'desconhecido', exactly as
    // the reference's classifier would
    assert(byKind === Map("fatura_bb" -> 4L, "extrato_bb" -> 4L,
      "fatura_bradesco" -> 3L, "extrato_bradesco" -> 4L, "desconhecido" -> 2L))

    val texts = Sources.extractPdfTexts(landing).cache()
    try {
      assert(texts.count() === 15)

      // executor-side parse of the BB bills, then the rules engine
      val bb = texts.filter(org.apache.spark.sql.functions.col("path").contains("/faturas/"))
        .filter(org.apache.spark.sql.functions.col("path").contains("/bb/"))
        .withColumnRenamed("path", "landing_object_key")
      val bills = ParsePipeline.bbBills(bb)
      val n = bills.count()
      assert(n > 100, s"expected >100 bill rows across 4 faturas, got $n")
      assert(bills.filter("categoria IS NULL").count() === 0)
      // reference-faithful categorization of REAL transactions under the
      // verbatim 23-rule table: the known merchants land in the buckets
      // categories_bb.py puts them in
      val cats = bills.select("descricao", "categoria", "subcategoria",
          "recorrente_suspeita").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2),
          r.getBoolean(3)))
      def catOf(prefix: String) = cats.filter(_._1.startsWith(prefix))
      assert(catOf("FIAP").nonEmpty && catOf("FIAP").forall(c =>
        c._2 == "Educação" && c._3 == null),
        "FIAP rows must be Educação with NULL subcategory")
      val uber = cats.filter(_._1.contains("UBER"))
      assert(uber.nonEmpty && uber.forall(_._2 == "Transporte"))
      val wellhub = cats.filter(c => c._1.contains("WELLHUB") ||
        c._1.contains("GYMPASS"))
      assert(wellhub.forall(c => c._2 == "Saúde" && c._4),
        "Wellhub/Gympass rows must be Saúde and force-recurring")
      val pagRe = "\\b(PAGAMENTO|PGTO|PAGTO|ESTORNO)\\b".r.unanchored
      val pagto = cats.filter(c => pagRe.matches(c._1))
      assert(pagto.nonEmpty, "real corpus should contain payment/refund rows")
      // every payment-vocabulary row that no rule claimed takes the
      // Financeiro fallback with the reference's exact subcategory
      assert(pagto.filter(_._2 == "Financeiro").forall(c =>
        c._3 == "Pagamentos/Créditos/Estornos" ||
        c._3 == "Pagamentos/Carteira digital" || c._3 == "Tarifas/Juros/IOF"),
        s"unexpected Financeiro subcategories: ${pagto.toSeq}")
      assert(pagto.exists(_._3 == "Pagamentos/Créditos/Estornos"),
        "at least one row must take the payment fallback branch")

      // executor-side parse of the real Bradesco bills incl. mode back-fill
      val brad = texts.filter(org.apache.spark.sql.functions.col("path").contains("/bradesco/faturas/"))
        .withColumnRenamed("path", "landing_object_key")
      val bradRows = ParsePipeline.bradescoBills(brad)
      assert(bradRows.count() > 50)
      assert(bradRows.select("cartao_final").distinct().collect()
        .map(_.getString(0)).toSet === Set("0039", "9952", "9953"))
    } finally texts.unpersist()
  }
}
