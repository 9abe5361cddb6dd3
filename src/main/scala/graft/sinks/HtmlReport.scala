package graft.sinks

import graft.core._

/** HTML viewer sink (K5 — /root/reference/src/table2html/__main__.py):
  * static report with a TOC, one section per table, rowspan compaction of
  * consecutive same-`row_` groups (W4, :175-206) and per-row agreement
  * color classes (:209-214). Report-only: not on any perf path.
  */
object HtmlReport {

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def cellText(c: Cell): String = c match {
    case Cell.Null => ""
    case Cell.Str(s) => s
    case Cell.Multi(vs) => vs.map(v => s"${v.value} (${v.agreementLevel})").mkString(" | ")
  }

  private def agreementClass(row: RowData): String =
    s"agreement-${math.min(row.agreementLevelOrDefault, 5)}"

  /** Consecutive rows sharing a non-null row_ form one rowspan group. */
  def rowGroups(rows: List[RowData]): List[List[RowData]] = {
    val groups = scala.collection.mutable.ListBuffer.empty[List[RowData]]
    var current = scala.collection.mutable.ListBuffer.empty[RowData]
    var currentKey: Option[Int] = None
    rows.foreach { r =>
      if (current.nonEmpty && r.rowIdx.isDefined && r.rowIdx == currentKey) current += r
      else {
        if (current.nonEmpty) groups += current.toList
        current = scala.collection.mutable.ListBuffer(r)
        currentKey = r.rowIdx
      }
    }
    if (current.nonEmpty) groups += current.toList
    groups.toList
  }

  private def renderFragment(sb: StringBuilder, frag: Fragment): Unit = {
    val columns = frag.columnNames
    sb ++= s"""<table class="fragment" data-page="${frag.page}">\n<thead><tr>"""
    columns.foreach(c => sb ++= s"<th>${esc(c)}</th>")
    sb ++= "</tr></thead>\n<tbody>\n"
    rowGroups(frag.rows).foreach { group =>
      // per column: a value shared by the whole group renders once with a
      // rowspan (W4 run-length compaction)
      val shared = columns.map { c =>
        val vals = group.map(r => r.get(c).map(cellText).getOrElse(""))
        if (group.size > 1 && vals.distinct.size == 1) Some(vals.head) else None
      }
      group.zipWithIndex.foreach { case (row, i) =>
        sb ++= s"""<tr class="${agreementClass(row)}">"""
        columns.zip(shared).foreach { case (c, sharedVal) =>
          sharedVal match {
            case Some(v) => if (i == 0) sb ++= s"""<td rowspan="${group.size}">${esc(v)}</td>"""
            case None => sb ++= s"<td>${esc(row.get(c).map(cellText).getOrElse(""))}</td>"
          }
        }
        sb ++= "</tr>\n"
      }
    }
    sb ++= "</tbody></table>\n"
  }

  def render(docId: String, doc: TableDoc): String = {
    val sb = new StringBuilder
    sb ++= s"""<!DOCTYPE html><html><head><meta charset="utf-8"><title>${esc(docId)}</title><style>
      |.agreement-1 { background: #fff } .agreement-2 { background: #eaf7ea }
      |.agreement-3 { background: #d4efd4 } .agreement-4 { background: #bfe8bf }
      |.agreement-5 { background: #a9e0a9 }
      |table.fragment { border-collapse: collapse } td, th { border: 1px solid #999; padding: 2px 6px }
      |</style></head><body>
      |""".stripMargin
    sb ++= s"<h1>${esc(docId)}</h1>\n"
    doc.citation match {
      case Cell.Str(s) => sb ++= s"<p class=\"citation\">${esc(s)}</p>\n"
      case _ =>
    }
    sb ++= "<nav><ol>\n"
    doc.tables.zipWithIndex.foreach { case (_, i) =>
      sb ++= s"""<li><a href="#table-$i">Table ${i + 1}</a></li>\n"""
    }
    sb ++= "</ol></nav>\n"
    doc.tables.zipWithIndex.foreach { case (t, i) =>
      sb ++= s"""<section id="table-$i"><h2>Table ${i + 1}</h2>\n"""
      t.fragments.foreach(renderFragment(sb, _))
      sb ++= "</section>\n"
    }
    sb ++= "</body></html>"
    sb.toString
  }
}
