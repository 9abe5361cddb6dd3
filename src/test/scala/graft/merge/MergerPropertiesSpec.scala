package graft.merge

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.core._

/** Algebraic laws of the merge kernel over random small fragments —
  * properties the reference never states but its semantics imply.
  */
class MergerPropertiesSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, res.status.toString)
  }

  private val word: Gen[String] = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.take(8).mkString)
  private val rowGen: Gen[RowData] = for {
    n <- Gen.choose(1, 4)
    keys <- Gen.listOfN(n, word).map(_.distinct)
    vals <- Gen.listOfN(keys.size, word)
  } yield RowData(keys.zip(vals).map { case (k, v) => (k, Cell.Str(v): Cell) }.toVector)

  private val fragGen: Gen[List[RowData]] = Gen.nonEmptyListOf(rowGen).map(_.take(10))

  private def wrap(rows: List[RowData]): TableDoc =
    TableDoc(List(TableData(List(Fragment(rows, 1)))))

  test("self-merge of N copies yields the single-run rows at agreement N") {
    check(Prop.forAll(fragGen, Gen.choose(2, 4)) { (rows, n) =>
      val single = Merger.merge(List(wrap(rows))).tables.head.fragments.head.rows
      val multi = Merger.merge(List.fill(n)(wrap(rows))).tables.head.fragments.head.rows
      multi == single.map(r => r.copy(agreementLevel = Some(n)))
    })
  }

  test("zero page offsets are the identity") {
    check(Prop.forAll(fragGen) { rows =>
      val plain = Merger.merge(List(wrap(rows), wrap(rows)))
      val offset = Merger.merge(List(wrap(rows), wrap(rows)), pageOffsets = Some(List(0, 0)))
      TableDoc.toJsonString(plain) == TableDoc.toJsonString(offset)
    })
  }

  test("merge output always carries contiguous-from-zero row_ stamps per fragment") {
    check(Prop.forAll(fragGen, fragGen) { (a, b) =>
      val merged = Merger.merge(List(wrap(a), wrap(b)))
      merged.tables.forall(_.fragments.forall { f =>
        val stamps = f.rows.flatMap(_.rowIdx)
        stamps.size == f.rows.size && stamps.forall(_ >= 0)
      })
    })
  }

  test("merged rows are normalized fixpoints (normalize is idempotent on output)") {
    check(Prop.forAll(fragGen, fragGen) { (a, b) =>
      val merged = Merger.merge(List(wrap(a), wrap(b)))
      merged.tables.forall(_.fragments.forall(_.rows.forall { r =>
        r.normalize(rowAgreement = true) == r
      }))
    })
  }
}
