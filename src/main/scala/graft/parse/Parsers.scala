package graft.parse

/** Pure text→rows line machines for the three bank-document families the
  * reference parses with driver-side pdfplumber+pandas (SURVEY §2.9 U3):
  * BB credit-card bill (bb_bill.py:169-229), BB checking statement
  * (bb_statement.py:84-202), Bradesco bill (bradesco_bill.py:108-312).
  *
  * Architecture: the reference parses ONE document at a time on the
  * driver — its scaling anti-pattern (SURVEY §3.1). Here each parser is a
  * pure `String => Seq[Row-case-class]` fold over lines, applied
  * executor-side via `flatMap` on a `Dataset[(docId, text)]` — per-document
  * state lives inside a single row's computation, so thousands of documents
  * parse in parallel with zero driver involvement and no cross-row state.
  *
  * Parsers operate on extracted TEXT (the reference's own parse layer is
  * text-only after pdfplumber's extract_text; PDF byte decoding is an
  * isolated adapter concern — see ext.Multimodal for the binary plumbing).
  */
object Parsers {

  // ---------- BB credit-card bill --------------------------------------

  /** One bill transaction (fatura_bb_lancamentos, FIXTURES §2). */
  final case class BBBillTxn(
      titular_cartao: String, final_cartao: String, data: String,
      pais: String, descricao: String, valor: Double)

  private val CardContext = """^([A-ZÀ-ÿ][A-ZÀ-ÿ .]+) \(Cartão (\d{4})\)$""".r
  private val BillTxn     = """^(\d{2}/\d{2}) (.+?)(?: ([A-Z]{2}))? R\$ (-?[\d.,]+)$""".r

  /** pt-BR money string → Double (scalar twin of functions.money.brlToDouble,
    * for use inside executor-side parsers). */
  def brl(s: String): Option[Double] = {
    val cleaned = s.replaceAll("R\\$|[\\s ]", "")
    val trailing = cleaned.endsWith("-")
    val canon = (if (trailing) cleaned.dropRight(1) else cleaned)
      .replace(".", "").replace(",", ".")
    if (canon.matches("-?\\d+(\\.\\d+)?"))
      Some(if (trailing) -canon.toDouble else canon.toDouble)
    else None
  }

  /** Fold over bill lines: card-context lines set (holder, final); txn
    * lines emit rows under the current context. */
  def parseBBBill(text: String): Seq[BBBillTxn] = {
    final case class St(holder: String, card: String, out: Vector[BBBillTxn])
    text.linesIterator.map(_.trim).filter(_.nonEmpty)
      .foldLeft(St(null, null, Vector.empty)) { (st, line) =>
        line match {
          case CardContext(holder, card) => St(holder, card, st.out)
          case BillTxn(data, desc, pais, valor) =>
            brl(valor) match {
              case Some(v) =>
                st.copy(out = st.out :+
                  BBBillTxn(st.holder, st.card, data, pais, desc.trim, v))
              case None => st
            }
          case _ => st
        }
      }.out
  }

  /** BB bill summary record — representative subset of `FaturaResumo`
    * (bb_bill.py:64-86); fields recovered by first-match regexes over the
    * whole document (F6 find-first extraction, bb_bill.py:43-58). All
    * nullable: absent fields stay null. */
  final case class FaturaResumo(
      titular: String, vencimento: String, valor_total: java.lang.Double,
      limite_unico: java.lang.Double, pagamento_minimo: java.lang.Double,
      fatura_fechada_em: String)

  private val RVencimento = """Vencimento:?\s*(\d{2}/\d{2}/\d{4})""".r.unanchored
  private val RValorTotal = """Valor total desta fatura\s+R\$\s*([\d.,]+)""".r.unanchored
  private val RLimite     = """Limite único\s+R\$\s*([\d.,]+)""".r.unanchored
  private val RPagMin     = """Pagamento mínimo\s+R\$\s*([\d.,]+)""".r.unanchored
  private val RFechada    = """Fatura fechada em:?\s*(\d{2}/\d{2}/\d{4})""".r.unanchored

  def parseFaturaResumo(text: String): FaturaResumo = {
    def find1(re: scala.util.matching.Regex): Option[String] =
      re.findFirstMatchIn(text).map(_.group(1))
    def money1(re: scala.util.matching.Regex): java.lang.Double =
      find1(re).flatMap(brl).map(Double.box).orNull
    // titular: first card-context holder, else first all-caps name line
    val titular = text.linesIterator.map(_.trim).collectFirst {
      case CardContext(h, _) => h
      case l if l.matches("[A-ZÀ-Þ][A-ZÀ-Þ ]{5,}") => l
    }.orNull
    FaturaResumo(
      titular,
      find1(RVencimento).orNull,
      money1(RValorTotal),
      money1(RLimite),
      money1(RPagMin),
      find1(RFechada).orNull)
  }

  // ---------- BB checking-account statement ----------------------------

  /** One statement movement (extrato_bb_lancamentos, FIXTURES §3). */
  final case class ExtratoTxn(
      data: String, lote: String, documento: String, grupo: String,
      historico: String, complemento: String, historico_full: String,
      valor: Double, sinal: String)

  /** Statement header (ExtratoHeader, bb_statement.py:35-42). */
  final case class ExtratoHeader(
      cliente: String, periodo_inicio: String, periodo_fim: String,
      agencia: String, conta: String, competencia: String)

  private val Cliente  = """^Cliente (.+)$""".r
  private val Periodo  = """^Período: (\d{2}) a (\d{2}/(\d{2})/(\d{4}))\s+Agência: (\S+) Conta: (\S+)$""".r
  private val StmtTxn  = """^(\d{2}/\d{2}/\d{4})(?: (\d{2,}))?(?: (\d{2,}))? (.+?) ([\d.,]+) \(([+-])\)$""".r
  private val GroupLine = """^[A-Za-zÀ-ÿ][A-Za-zÀ-ÿ /-]*$""".r

  def parseExtratoHeader(text: String): Option[ExtratoHeader] = {
    var cliente: String = null
    var hdr: ExtratoHeader = null
    text.linesIterator.map(_.trim).foreach {
      case Cliente(c) => cliente = c.trim
      case Periodo(d0, fim, mm, yyyy, ag, conta) if hdr == null =>
        // "Período: 01 a 30/11/2025" → start shares month/year with end
        // (date recomposition, bb_statement.py:53-63 / SURVEY F14)
        hdr = ExtratoHeader(cliente, s"$d0/$mm/$yyyy", fim, ag, conta, s"$yyyy-$mm")
      case _ =>
    }
    Option(hdr).map(h => if (h.cliente == null) h.copy(cliente = cliente) else h)
  }

  /** Line machine with group-section state and continuation-line append
    * (bb_statement.py:84-202): non-transaction alpha lines set the current
    * `grupo`; lines following a transaction that match neither pattern are
    * appended to that transaction's `complemento`. */
  def parseExtrato(text: String): Seq[ExtratoTxn] = {
    final case class St(grupo: String, out: Vector[ExtratoTxn], open: Boolean)
    val res = text.linesIterator.map(_.trim).filter(_.nonEmpty)
      .foldLeft(St(null, Vector.empty, false)) { (st, line) =>
        line match {
          case Cliente(_) | Periodo(_, _, _, _, _, _) => st.copy(open = false)
          case StmtTxn(data, lote, doc, hist, valor, sinal) =>
            brl(valor) match {
              case Some(v) =>
                val signed = if (sinal == "-") -v else v
                st.copy(out = st.out :+ ExtratoTxn(data, lote, doc, st.grupo,
                  hist.trim, null, hist.trim, signed, sinal), open = true)
              case None => st.copy(open = false)
            }
          // All-caps detail line right after a movement → continuation
          // appended to complemento (bb_statement.py continuation handling);
          // mixed-case alpha lines are section/group headers.
          case cont if st.open && st.out.nonEmpty &&
              cont == cont.toUpperCase(java.util.Locale.ROOT) &&
              cont.matches("[A-ZÀ-Þ][A-ZÀ-Þ0-9 .,/-]*") =>
            val last = st.out.last
            val comp = if (last.complemento == null) cont
                       else last.complemento + " " + cont
            st.copy(out = st.out.init :+ last.copy(
              complemento = comp, historico_full = last.historico + " | " + comp))
          case GroupLine() => St(line, st.out, open = false)
          case _ => st.copy(open = false)
        }
      }
    res.out
  }

  // ---------- Bradesco credit-card bill --------------------------------

  /** One Bradesco bill row (fatura_bradesco_lancamentos, FIXTURES §4). */
  final case class BradescoTxn(
      data: String, descricao: String, cidade: String, valor: Double,
      tipo: String, titular_cartao: String, cartao_final: String)

  private val BradCard = """^(.+?) Cartão \d{4} XXXX XXXX (\d{4})$""".r
  private val BradCardNoHolder = """^Cartão \d{4} XXXX XXXX (\d{4})$""".r
  private val BradPay  = """^(\d{2}/\d{2}) (PAGTO\.?.*?) ([\d.,]+-?)$""".r
  private val BradTxn  = """^(\d{2}/\d{2}) (.+?) ([\d.,]+-?)$""".r

  /** Ignore-list sanitation (bradesco_bill.py ignore/sanitize lists). */
  private val ignorePrefixes =
    Seq("SALDO ANTERIOR", "TOTAL ", "LIMITE ", "VENCIMENTO")

  /** City heuristic: trailing alphabetic token of length ≥ 4 that is fully
    * uppercase (bradesco_bill.py desc/city splitting, :151-312). */
  private[parse] def splitCity(desc: String): (String, String) = {
    val toks = desc.split(" ")
    if (toks.length >= 2 && toks.last.matches("[A-ZÀ-ÿ]{4,}"))
      (toks.init.mkString(" "), toks.last)
    else (desc, null)
  }

  def parseBradesco(text: String): Seq[BradescoTxn] = {
    final case class St(holder: String, card: String, out: Vector[BradescoTxn])
    text.linesIterator.map(_.trim).filter(_.nonEmpty)
      .foldLeft(St(null, null, Vector.empty)) { (st, line) =>
        line match {
          case _ if ignorePrefixes.exists(line.startsWith) => st
          case BradCardNoHolder(card) => St(null, card, st.out)
          case BradCard(holder, card) => St(holder.trim, card, st.out)
          case BradPay(data, desc, valor) =>
            brl(valor).fold(st)(v => st.copy(out = st.out :+
              BradescoTxn(data, desc.trim, null, v, "pagamento", st.holder, st.card)))
          case BradTxn(data, desc, valor) =>
            brl(valor).fold(st) { v =>
              val (d, city) = splitCity(desc.trim)
              val tipo = if (v < 0) "ajuste" else "compra"
              st.copy(out = st.out :+
                BradescoTxn(data, d, city, v, tipo, st.holder, st.card))
            }
          case _ => st
        }
      }.out
  }
}
