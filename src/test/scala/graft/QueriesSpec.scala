package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered query must resolve and return rows at sf0.001, and every
  * oracle key must have a matching query (driver contract invariants).
  */
class QueriesSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"query $name resolves and returns rows at sf0.001") {
      val df = fn(spark, sfDir)
      assert(df.count() > 0, s"$name returned 0 rows")
    }
  }
}
