package graft.ingest

import java.io.InputStream
import java.util.zip.ZipFile
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}
import scala.collection.mutable

/** Dependency-free `.xlsx` (OOXML SpreadsheetML) reader — the real input
  * format of the reference pipeline (`apoc.load.xls`, refresh-vmware.cypher:26):
  * an RVTools export is an Excel workbook, and this makes the engine ingest
  * one end-to-end without adding POI or any other library (an xlsx file is a
  * zip of XML parts; `java.util.zip` + StAX are in the JDK).
  *
  * Contract matches the CSV/parquet loaders: header row → column names, every
  * cell a nullable string (numbers keep their raw lexical form, booleans
  * normalize to TRUE/FALSE, empty → null), row order preserved.
  *
  * Scale position: a workbook is a small driver-side configuration input
  * (RVTools exports are MBs — bounded by vSphere inventory size, not data
  * scale), so parsing happens on the driver and the rows enter Spark via
  * `createDataFrame`, exactly like the in-memory fixture path. Ingesting
  * MANY workbooks in parallel is a `paths.par`-style loop over this reader,
  * not a reason to distribute the parse of one small zip.
  *
  * Handled SpreadsheetML features: shared strings (including rich-text runs),
  * inline strings, formula string results (`t="str"`), booleans, sparse rows
  * and sparse cells (missing `r` attributes fall back to positional order),
  * phonetic runs excluded. Not handled (absent from RVTools exports): 1904
  * date system, styles-driven date formatting — date cells surface as their
  * raw serial numbers, consistent with schema-on-read string typing.
  */
object Xlsx {

  // One configured factory per thread (the Epub/Dash discipline, r16):
  // XMLInputFactory.newInstance() per call serializes concurrent parse
  // tasks on the ServiceLoader lock. Not shared across threads.
  private val factories = new ThreadLocal[XMLInputFactory] {
    override def initialValue(): XMLInputFactory = {
      val f = XMLInputFactory.newInstance()
      // untrusted input: no DTDs, no external entities (XXE hardening).
      f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
      f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, java.lang.Boolean.FALSE)
      f
    }
  }

  private def newFactory: XMLInputFactory = factories.get()

  private def withStream[T](zip: ZipFile, entry: String)(f: XMLStreamReader => T): Option[T] = {
    Option(zip.getEntry(entry)).map { e =>
      val in: InputStream = zip.getInputStream(e)
      val r = newFactory.createXMLStreamReader(in)
      try f(r) finally { r.close(); in.close() }
    }
  }

  private def attr(r: XMLStreamReader, local: String): Option[String] =
    (0 until r.getAttributeCount)
      .find(i => r.getAttributeLocalName(i) == local)
      .map(r.getAttributeValue)

  /** "BC7" → 0-based column index 54. */
  private[ingest] def colIndex(ref: String): Int =
    ref.takeWhile(_.isLetter).foldLeft(0)((a, c) => a * 26 + (c.toUpper - 'A' + 1)) - 1

  /** Sheet name → worksheet zip-entry path, in workbook (tab) order. */
  private[ingest] def sheetEntries(zip: ZipFile): Seq[(String, String)] = {
    val rels = withStream(zip, "xl/_rels/workbook.xml.rels") { r =>
      val m = mutable.Map.empty[String, String]
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "Relationship")
          for (id <- attr(r, "Id"); tgt <- attr(r, "Target"))
            m(id) = if (tgt.startsWith("/")) tgt.drop(1) else s"xl/$tgt"
      }
      m.toMap
    }.getOrElse(Map.empty)
    withStream(zip, "xl/workbook.xml") { r =>
      val out = mutable.ArrayBuffer.empty[(String, String)]
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "sheet")
          for (name <- attr(r, "name"); rid <- attr(r, "id"); tgt <- rels.get(rid))
            out += name -> tgt
      }
      out.toSeq
    }.getOrElse(Seq.empty)
  }

  /** The shared-string table, rich-text runs concatenated, phonetics skipped. */
  private[ingest] def sharedStrings(zip: ZipFile): IndexedSeq[String] =
    withStream(zip, "xl/sharedStrings.xml") { r =>
      val out = mutable.ArrayBuffer.empty[String]
      val sb = new StringBuilder
      var inT = false
      var phoneticDepth = 0
      while (r.hasNext) r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "si" => sb.clear()
          case "rPh" | "phoneticPr" => phoneticDepth += 1
          case "t" if phoneticDepth == 0 => inT = true
          case _ =>
        }
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA if inT =>
          sb.appendAll(r.getTextCharacters, r.getTextStart, r.getTextLength)
        case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
          case "t" => inT = false
          case "rPh" | "phoneticPr" => phoneticDepth -= 1
          case "si" => out += sb.toString
          case _ =>
        }
        case _ =>
      }
      out.toIndexedSeq
    }.getOrElse(IndexedSeq.empty)

  /** One worksheet as sparse rows: per row, 0-based column index → cell text. */
  private def sheetRows(zip: ZipFile, entry: String,
      shared: IndexedSeq[String]): Seq[Map[Int, String]] =
    withStream(zip, entry) { r =>
      val rows = mutable.ArrayBuffer.empty[Map[Int, String]]
      var row: mutable.Map[Int, String] = null
      var cellCol = -1
      var cellType = "n"
      var lastCol = -1
      var capture = false
      val text = new StringBuilder
      var inIs = false
      while (r.hasNext) r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "row" => row = mutable.Map.empty; lastCol = -1
          case "c" if row != null =>
            cellCol = attr(r, "r").map(colIndex).getOrElse(lastCol + 1)
            cellType = attr(r, "t").getOrElse("n")
            text.clear()
          case "is" => inIs = true
          case "v" => capture = true; text.clear()
          case "t" if inIs => capture = true
          case _ =>
        }
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA if capture =>
          text.appendAll(r.getTextCharacters, r.getTextStart, r.getTextLength)
        case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
          case "v" | "t" => capture = false
          case "is" => inIs = false
          case "c" if row != null && cellCol >= 0 =>
            val raw = text.toString
            val value = cellType match {
              case "s" => raw.toIntOption.flatMap(shared.lift).orNull
              // a valueless boolean cell is absent, not FALSE — map the
              // lexical form only when one exists.
              case "b" =>
                if (raw.isEmpty) null
                else if (raw == "1" || raw.equalsIgnoreCase("true")) "TRUE" else "FALSE"
              case _ => raw // n, str, inlineStr, e — raw lexical form
            }
            if (value != null && value.nonEmpty) row(cellCol) = value
            lastCol = cellCol
            cellCol = -1
          case "row" => rows += row.toMap; row = null
          case _ =>
        }
        case _ =>
      }
      rows.toSeq
    }.getOrElse(Seq.empty)

  /** All sheets of a workbook: name → (header, data rows padded to header
    * width, nulls for absent cells). Header = first non-empty row.
    */
  def readWorkbook(path: String): Map[String, (Seq[String], Seq[Seq[String]])] = {
    val zip = new ZipFile(path)
    try {
      val shared = sharedStrings(zip)
      sheetEntries(zip).map { case (name, entry) =>
        val rows = sheetRows(zip, entry, shared).dropWhile(_.isEmpty)
        val parsed = rows match {
          case head +: data =>
            // width covers the widest DATA row too, not just the header —
            // otherwise trailing unlabeled cells are silently truncated.
            // Extra columns get synthetic _c<i> header names.
            val width = (head.keys.max + 1) max
              data.flatMap(_.keys.maxOption).map(_ + 1).maxOption.getOrElse(0)
            val header = (0 until width).map(i => head.getOrElse(i, s"_c$i"))
            val body = data.filter(_.nonEmpty)
              .map(m => (0 until width).map(i => m.getOrElse(i, null: String)))
            (header, body)
          case _ => (Seq.empty[String], Seq.empty[Seq[String]])
        }
        name -> parsed
      }.toMap
    } finally zip.close()
  }
}
