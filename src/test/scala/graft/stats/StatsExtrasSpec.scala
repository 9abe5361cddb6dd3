package graft.stats

import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark
import graft.core._
import graft.merge.MergedDoc
import graft.sinks.CsvExport

/** O3 (stats sort + empty listing) and K4 (csv writer contract) coverage. */
class StatsExtrasSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def row(vals: (String, String)*): RowData =
    RowData(vals.toVector.map { case (k, v) => (k, Cell.Str(v): Cell) })

  private def doc(nTables: Int): TableDoc =
    TableDoc((0 until nTables).toList.map(i =>
      TableData(List(Fragment(List(row("name" -> s"n$i", "pop" -> "7")), page = i + 1)))))

  test("csv export: one file per (paper, table), $page column, minimal quoting") {
    import spark.implicits._
    val d = TableDoc(List(
      TableData(List(
        Fragment(List(row("common_name" -> "Lantern, Fox", "status" -> "stable")), 1),
        Fragment(List(row("common_name" -> "Glass \"Frog\"", "extra" -> "x")), 2))),
      TableData(List(Fragment(List(row("a" -> "1")), 1)))))
    val merged = Seq(MergedDoc("https://x/doc/paper1", 2, 2, 3, TableDoc.toJsonString(d))).toDS()
    val out = java.nio.file.Files.createTempDirectory("graft-csv").toString
    val n = CsvExport.export(merged, out)
    assert(n == 2)
    def read(name: String): String = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(out, name)), "UTF-8")
    val f0 = read("paper1_0.csv")
    // header = union of row columns in first-seen order + $page
    assert(f0.startsWith("common_name,status,extra,$page\n"), f0)
    // comma forces quoting; absent column renders empty
    assert(f0.contains("\"Lantern, Fox\",stable,,1\n"), f0)
    // embedded quotes double
    assert(f0.contains("\"Glass \"\"Frog\"\"\",,x,2\n"), f0)
    assert(read("paper1_1.csv") == "a,$page\n1,1\n")
  }

  test("csv export: docs sharing a basename get hash-disambiguated, never overwritten") {
    import spark.implicits._
    val d = TableDoc(List(TableData(List(Fragment(List(row("a" -> "1")), 1)))))
    val merged = Seq(
      MergedDoc("runA/paper.tables.json", 1, 1, 1, TableDoc.toJsonString(d)),
      MergedDoc("runB/paper.tables.json", 1, 1, 1, TableDoc.toJsonString(d))).toDS()
    val out = java.nio.file.Files.createTempDirectory("graft-csv-dup").toString
    val n = CsvExport.export(merged, out)
    val files = new java.io.File(out).listFiles().map(_.getName).sorted
    assert(n == 2 && files.length == 2, files.mkString(","))
    assert(files.forall(_.startsWith("paper-")), "hash suffix applied to colliding basenames")
  }

  test("stats sort: by table count with doc_id tiebreak (O3 --sort)") {
    import spark.implicits._
    val docs = Seq(("d1", 1), ("d2", 3), ("d3", 3), ("d4", 2)).map { case (id, n) =>
      MergedDoc(id, 1, n, n, TableDoc.toJsonString(doc(n)))
    }.toDS()
    val per = Stats.perDocStats(spark, docs).toDF()
    val desc = Stats.sortStats(per, "desc").collect().map(_.getString(0)).toSeq
    assert(desc == Seq("d2", "d3", "d4", "d1"))
    val asc = Stats.sortStats(per, "asc").collect().map(_.getString(0)).toSeq
    assert(asc == Seq("d1", "d4", "d2", "d3"))
    assert(Stats.sortStats(per, "none").collect().length == 4)
    intercept[IllegalArgumentException](Stats.sortStats(per, "bogus"))
  }

  test("empty papers listing over extraction output (O3 --empty)") {
    import spark.implicits._
    val ex = Seq(("u1", 0), ("u2", 2), ("u3", 0)).toDF("url", "n_tables")
    val e = Stats.emptyPapers(ex).collect().map(_.getString(0)).toSet
    assert(e == Set("u1", "u3"))
  }
}
