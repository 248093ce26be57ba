package graft.parse

import java.util.zip.Inflater

import scala.collection.mutable

/** Minimal PDF → text extractor over raw bytes, JDK-only (the reference
  * front-ends its parsers with pdfplumber's `extract_text` and joins page
  * texts with "\n" — bb_bill.py:89-92, bb_statement.py:28-31,
  * bradesco_bill.py:27-30; no PDF library ships in this environment, so
  * the engine carries its own extractor for the text-PDF subset the
  * pipeline actually ingests).
  *
  * Supported subset — machine-generated text PDFs:
  *   - content streams stored raw or /FlateDecode-compressed
  *     (java.util.zip.Inflater is the same zlib pdfplumber uses);
  *   - text shown with Tj / ' / " / TJ inside BT..ET, literal `(...)`
  *     strings (with \-escapes and octal) and `<...>` hex strings;
  *   - line structure from the text-positioning operators (Td, TD, T*, '),
  *     the layout cue pdfplumber derives from glyph positions;
  *   - byte-to-char mapping per PDFDocEncoding/WinAnsi ≈ latin-1, which
  *     covers the pt-BR corpus.
  * Image/font/xref streams are skipped (no BT block). Encrypted PDFs and
  * exotic filters (DCT, LZW) are out of scope — they would arrive via a
  * real PDF jar behind this same seam.
  */
object PdfText {

  /** All page texts joined with "\n" — the reference's page-concat
    * contract. Returns "" for bytes with no extractable text. */
  def extractText(pdf: Array[Byte]): String =
    contentStreams(pdf).map(textOfContentStream).filter(_.nonEmpty).mkString("\n")

  // ---- stream location + decode --------------------------------------

  private val StreamRe =
    """(?s)<<(.{0,2000}?)>>\s*stream\r?\n""".r

  /** Decoded candidate content streams, in document order. */
  private[parse] def contentStreams(pdf: Array[Byte]): Seq[String] = {
    // latin-1 is byte-transparent: char i == byte i, so offsets line up
    val doc = new String(pdf, java.nio.charset.StandardCharsets.ISO_8859_1)
    StreamRe.findAllMatchIn(doc).flatMap { m =>
      val dict = m.group(1)
      val start = m.end
      val end = doc.indexOf("endstream", start)
      if (end < 0) None
      else {
        val raw = pdf.slice(start, trimEol(doc, end))
        val data =
          if (dict.contains("/FlateDecode")) inflate(raw)
          else if (dict.contains("/Filter")) None // unsupported filter
          else Some(raw)
        data.map(b => new String(b, java.nio.charset.StandardCharsets.ISO_8859_1))
          .filter(_.contains("BT"))
      }
    }.toSeq
  }

  private def trimEol(doc: String, end: Int): Int = {
    var e = end
    if (e > 0 && doc.charAt(e - 1) == '\n') e -= 1
    if (e > 0 && doc.charAt(e - 1) == '\r') e -= 1
    e
  }

  private def inflate(data: Array[Byte]): Option[Array[Byte]] =
    try {
      val inf = new Inflater()
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(data.length * 4)
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && inf.needsInput()) throw new java.util.zip.DataFormatException("truncated")
        out.write(buf, 0, n)
      }
      inf.end()
      Some(out.toByteArray)
    } catch { case _: Exception => None }

  // ---- content-stream tokenizer --------------------------------------

  /** Text of one content stream: shows append to the current line;
    * Td, TD, T* and ' start a new one. */
  private[parse] def textOfContentStream(cs: String): String = {
    val lines = mutable.ArrayBuffer.empty[StringBuilder]
    def line(): StringBuilder = {
      if (lines.isEmpty) lines += new StringBuilder
      lines.last
    }
    def newLine(): Unit =
      if (lines.isEmpty || lines.last.nonEmpty) lines += new StringBuilder

    var i = 0
    val n = cs.length
    // most recent string operands, consumed by the next operator token
    var pendingStrings = mutable.ArrayBuffer.empty[String]
    while (i < n) {
      cs.charAt(i) match {
        case '(' =>
          val (s, next) = literalString(cs, i)
          pendingStrings += s; i = next
        case '<' if i + 1 < n && cs.charAt(i + 1) != '<' =>
          val (s, next) = hexString(cs, i)
          pendingStrings += s; i = next
        case '[' | ']' => i += 1 // TJ arrays: strings collected, kerning numbers ignored
        case '%' => // comment to EOL
          while (i < n && cs.charAt(i) != '\n' && cs.charAt(i) != '\r') i += 1
        case c if c.isWhitespace => i += 1
        case _ =>
          val start = i
          while (i < n && !cs.charAt(i).isWhitespace &&
            !"()<>[]/%".contains(cs.charAt(i))) i += 1
          if (i == start) { i += 1 } // lone delimiter (e.g. '/Name' head)
          else cs.substring(start, i) match {
            case "Tj" | "TJ" =>
              pendingStrings.foreach(line() ++= _); pendingStrings.clear()
            case "'" | "\"" =>
              newLine(); pendingStrings.foreach(line() ++= _); pendingStrings.clear()
            case "Td" | "TD" | "T*" => newLine(); pendingStrings.clear()
            // numbers are operands (TJ kerning, Td coords): keep strings
            case t if t.matches("[-+.0-9]+") => ()
            case _ => pendingStrings.clear()
          }
      }
    }
    lines.map(_.toString).mkString("\n").replaceAll("\n+$", "")
  }

  /** `(...)` literal string with escapes; returns (decoded, indexAfter). */
  private def literalString(cs: String, open: Int): (String, Int) = {
    val sb = new StringBuilder
    var i = open + 1
    var depth = 1
    val n = cs.length
    while (i < n && depth > 0) {
      cs.charAt(i) match {
        case '\\' if i + 1 < n =>
          cs.charAt(i + 1) match {
            case 'n' => sb += '\n'; i += 2
            case 'r' => sb += '\r'; i += 2
            case 't' => sb += '\t'; i += 2
            case 'b' => sb += '\b'; i += 2
            case 'f' => sb += '\f'; i += 2
            case '(' => sb += '('; i += 2
            case ')' => sb += ')'; i += 2
            case '\\' => sb += '\\'; i += 2
            case '\r' => i += (if (i + 2 < n && cs.charAt(i + 2) == '\n') 3 else 2) // continuation
            case '\n' => i += 2
            case d if d >= '0' && d <= '7' =>
              var j = i + 1; var v = 0
              while (j < n && j < i + 4 && cs.charAt(j) >= '0' && cs.charAt(j) <= '7') {
                v = v * 8 + (cs.charAt(j) - '0'); j += 1
              }
              sb += v.toChar; i = j
            case other => sb += other; i += 2
          }
        case '(' => depth += 1; sb += '('; i += 1
        case ')' =>
          depth -= 1
          if (depth > 0) sb += ')'
          i += 1
        case c => sb += c; i += 1
      }
    }
    (sb.toString, i)
  }

  /** `<hex>` string; returns (decoded, indexAfter). */
  private def hexString(cs: String, open: Int): (String, Int) = {
    val close = cs.indexOf('>', open + 1)
    if (close < 0) return ("", cs.length)
    val hex = cs.substring(open + 1, close).filterNot(_.isWhitespace)
    val padded = if (hex.length % 2 == 1) hex + "0" else hex
    val sb = new StringBuilder
    var k = 0
    while (k + 2 <= padded.length) {
      sb += Integer.parseInt(padded.substring(k, k + 2), 16).toChar
      k += 2
    }
    (sb.toString, close + 1)
  }
}
