package graft.fixtures

import java.io.FileOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}
import scala.collection.mutable

/** Writes a genuine OOXML `.xlsx` workbook for round-trip tests — the same
  * zip-of-XML structure Excel produces, with no library dependency. Header
  * cells go through the shared-string table, integer-looking data cells are
  * written as number cells, and everything else as inline strings, so one
  * round trip exercises the reader's shared / numeric / inline paths plus
  * sparse (null) cells.
  */
object XlsxFixture {

  private def esc(s: String): String = s
    .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;").replace("\"", "&quot;")

  private def colLetters(i0: Int): String = {
    var i = i0 + 1
    val sb = new StringBuilder
    while (i > 0) { val r = (i - 1) % 26; sb.insert(0, ('A' + r).toChar); i = (i - 1) / 26 }
    sb.toString
  }

  private val NsMain = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
  private val NsRel = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
  private val IntLike = "^-?\\d{1,15}$".r

  def write(path: String, sheets: Seq[(String, Seq[String], Seq[Seq[String]])]): Unit = {
    val shared = mutable.LinkedHashMap.empty[String, Int]
    def sharedIdx(s: String): Int = shared.getOrElseUpdate(s, shared.size)

    def sheetXml(header: Seq[String], rows: Seq[Seq[String]]): String = {
      val sb = new StringBuilder
      sb ++= s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?><worksheet xmlns="$NsMain"><sheetData>"""
      sb ++= "<row r=\"1\">"
      header.zipWithIndex.foreach { case (h, c) =>
        sb ++= s"""<c r="${colLetters(c)}1" t="s"><v>${sharedIdx(h)}</v></c>"""
      }
      sb ++= "</row>"
      rows.zipWithIndex.foreach { case (row, ri) =>
        sb ++= s"""<row r="${ri + 2}">"""
        row.zipWithIndex.foreach { case (v, c) =>
          if (v != null) {
            val ref = s"${colLetters(c)}${ri + 2}"
            v match {
              case IntLike() => sb ++= s"""<c r="$ref"><v>$v</v></c>"""
              case _ => sb ++= s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${esc(v)}</t></is></c>"""
            }
          }
        }
        sb ++= "</row>"
      }
      sb ++= "</sheetData></worksheet>"
      sb.toString
    }

    // render sheets first so the shared-string table is complete before
    // sharedStrings.xml is emitted.
    val rendered = sheets.map { case (name, header, rows) => (name, sheetXml(header, rows)) }

    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
        """<Default Extension="xml" ContentType="application/xml"/>""" +
        """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
        rendered.indices.map(i =>
          s"""<Override PartName="/xl/worksheets/sheet${i + 1}.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""").mkString +
        """<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>""" +
        "</Types>"

    val rootRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        s"""<Relationship Id="rId1" Type="$NsRel/officeDocument" Target="xl/workbook.xml"/>""" +
        "</Relationships>"

    val workbook =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?><workbook xmlns="$NsMain" xmlns:r="$NsRel"><sheets>""" +
        rendered.zipWithIndex.map { case ((name, _), i) =>
          s"""<sheet name="${esc(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
        }.mkString +
        "</sheets></workbook>"

    val workbookRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        rendered.indices.map(i =>
          s"""<Relationship Id="rId${i + 1}" Type="$NsRel/worksheet" Target="worksheets/sheet${i + 1}.xml"/>""").mkString +
        s"""<Relationship Id="rId${rendered.size + 1}" Type="$NsRel/sharedStrings" Target="sharedStrings.xml"/>""" +
        "</Relationships>"

    val sst =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?><sst xmlns="$NsMain" count="${shared.size}" uniqueCount="${shared.size}">""" +
        shared.keys.map(s => s"""<si><t xml:space="preserve">${esc(s)}</t></si>""").mkString +
        "</sst>"

    val zos = new ZipOutputStream(new FileOutputStream(path))
    def part(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    try {
      part("[Content_Types].xml", contentTypes)
      part("_rels/.rels", rootRels)
      part("xl/workbook.xml", workbook)
      part("xl/_rels/workbook.xml.rels", workbookRels)
      part("xl/sharedStrings.xml", sst)
      rendered.zipWithIndex.foreach { case ((_, xml), i) =>
        part(s"xl/worksheets/sheet${i + 1}.xml", xml)
      }
    } finally zos.close()
  }
}
