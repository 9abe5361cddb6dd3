package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

/** S12 filenorm full semantics (reference filenorm/__main__.py:28-66). */
class FileNormSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("keeper fold: normalized-twin preference, else shortest path") {
    // rival's normalized basename equals ours -> the normalized one is kept
    assert(FileNorm.pickKeeper(Seq("/a/my_paper.pdf", "/a/My Paper.pdf")) == "/a/my_paper.pdf")
    assert(FileNorm.pickKeeper(Seq("/a/My Paper.pdf", "/a/my_paper.pdf")) == "/a/my_paper.pdf")
    // otherwise the shorter path wins; ties keep the earlier file
    assert(FileNorm.pickKeeper(Seq("/a/longer-name.pdf", "/a/x.pdf")) == "/a/x.pdf")
    assert(FileNorm.pickKeeper(Seq("/a/aa.pdf", "/a/bb.pdf")) == "/a/aa.pdf")
  }

  test("plan: duplicates dropped, keepers renamed to normalized names with collision suffixes") {
    import spark.implicits._
    val files = Seq(
      ("/in/My Paper.PDF", "m1"),   // duplicate pair -> normalized name wins...
      ("/in/my_paper.pdf", "m1"),   // ...this one is kept, no rename needed
      ("/in/Other Doc.pdf", "m2"),  // kept, renamed other_doc.pdf
      ("/in/Other-Doc.pdf", "m3"),  // kept, same normalized name -> other_doc_1.pdf
      ("/in/unique.pdf", "m4")      // kept, already normalized
    ).toDF("path", "md5")
    val plan = FileNorm.plan(spark, files).collect()
      .map(r => r.getString(0) -> ((r.getBoolean(2), Option(r.getString(3))))).toMap

    assert(plan("/in/My Paper.PDF") == ((false, None)))          // dropped duplicate
    assert(plan("/in/my_paper.pdf") == ((true, None)))           // kept, name already canonical
    // collision numbering follows lexicographic path order:
    // "Other Doc.pdf" < "Other-Dok.pdf" ("-"(45) > " "(32))
    assert(plan("/in/Other Doc.pdf") == ((true, Some("other_doc.pdf"))))
    assert(plan("/in/Other-Doc.pdf") == ((true, Some("other_doc_1.pdf"))))
    assert(plan("/in/unique.pdf") == ((true, None)))
  }

  test("suffixed candidates never collide with a kept file already holding that name") {
    import spark.implicits._
    // 'other_doc_1.pdf' (distinct content) already occupies the first
    // suffix slot; the family-scoped seen-walk must step over it
    val files = Seq(
      ("/in/Other Doc.pdf", "m1"),
      ("/in/Other-Doc.pdf", "m2"),
      ("/in/other_doc_1.pdf", "m3")).toDF("path", "md5")
    val plan = FileNorm.plan(spark, files).collect()
      .map(r => r.getString(0) -> Option(r.getString(3))).toMap
    val finals = plan.map { case (path, newName) =>
      newName.getOrElse(path.split('/').last)
    }.toList
    assert(finals.distinct.size == 3, s"final names must be unique: $finals")
    assert(plan("/in/Other Doc.pdf") == Some("other_doc.pdf"))
    assert(plan("/in/Other-Doc.pdf") == Some("other_doc_1.pdf"))
    // the occupant found its slot taken and moved on
    assert(plan("/in/other_doc_1.pdf") == Some("other_doc_1_1.pdf"))
  }

  test("family grouping strips every trailing _N group") {
    assert(FileNorm.familyOf("other_doc") == "other_doc")
    assert(FileNorm.familyOf("other_doc_1") == "other_doc")
    assert(FileNorm.familyOf("a_1_2") == "a")
    assert(FileNorm.familyOf("v2_report") == "v2_report") // interior digits stay
  }

  test("extension lowercased in the rename target") {
    import spark.implicits._
    val files = Seq(("/in/Report.PDF", "m1")).toDF("path", "md5")
    val plan = FileNorm.plan(spark, files).collect().head
    assert(plan.getBoolean(2))
    assert(plan.getString(3) == "report.pdf")
  }
}
