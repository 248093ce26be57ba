package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.ISO_8859_1
import java.util.zip.Deflater

/** Test-only generator of small but REAL PDFs (valid xref, catalog, page
  * tree, Helvetica font, FlateDecode-compressed content streams) so the
  * engine's extractor is exercised against actual PDF bytes rather than a
  * hand-rolled mock of itself. One `BT … Td (line) Tj … ET` block per
  * page, one text line per show — the shape every simple PDF writer
  * (reportlab, wkhtmltopdf, print-to-PDF) emits. */
object PdfFixture {

  /** A PDF whose page texts are `pages` (each a list of lines). */
  def pdf(pages: Seq[Seq[String]], compress: Boolean = true): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
    def write(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    def beginObj(): Unit = offsets += out.size()

    val nPages = pages.length
    // object ids: 1 catalog, 2 pages, 3..(2+n) page, (3+n)..(2+2n) content, last font
    val pageIds = (0 until nPages).map(3 + _)
    val contentIds = (0 until nPages).map(3 + nPages + _)
    val fontId = 3 + 2 * nPages

    write("%PDF-1.4\n%âãÏÓ\n")
    beginObj(); write(s"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    beginObj(); write(s"2 0 obj << /Type /Pages /Kids [${pageIds.map(i => s"$i 0 R").mkString(" ")}] /Count $nPages >> endobj\n")
    pages.indices.foreach { p =>
      beginObj()
      write(s"${pageIds(p)} 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        s"/Resources << /Font << /F1 $fontId 0 R >> >> /Contents ${contentIds(p)} 0 R >> endobj\n")
    }
    pages.zipWithIndex.foreach { case (lines, p) =>
      val shows = lines.zipWithIndex.map { case (l, i) =>
        val y = if (i == 0) "50 750 Td" else "0 -14 Td"
        s"$y (${escape(l)}) Tj"
      }.mkString("\n")
      val content = s"BT\n/F1 10 Tf\n$shows\nET".getBytes(ISO_8859_1)
      val data = if (compress) deflate(content) else content
      val filter = if (compress) " /Filter /FlateDecode" else ""
      beginObj()
      write(s"${contentIds(p)} 0 obj << /Length ${data.length}$filter >> stream\n")
      out.write(data)
      write("\nendstream endobj\n")
    }
    beginObj()
    write(s"$fontId 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
      "/Encoding /WinAnsiEncoding >> endobj\n")

    val xrefPos = out.size()
    write(s"xref\n0 ${offsets.length + 1}\n0000000000 65535 f \n")
    offsets.foreach(o => write(f"$o%010d 00000 n \n"))
    write(s"trailer << /Size ${offsets.length + 1} /Root 1 0 R >>\n")
    write(s"startxref\n$xrefPos\n%%EOF\n")
    out.toByteArray
  }

  /** PDF-literal-string escaping; non-ASCII goes out as octal so the byte
    * stream is pure ASCII regardless of content. */
  private def escape(s: String): String =
    s.flatMap {
      case '(' => "\\("
      case ')' => "\\)"
      case '\\' => "\\\\"
      case c if c < 128 => c.toString
      case c if c < 256 => f"\\${c.toInt}%03o"
      case c => c.toString // outside latin-1: not representable here
    }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(data); d.finish()
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }
}
