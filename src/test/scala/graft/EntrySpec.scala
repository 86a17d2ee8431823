package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: entry() must return rows; queries/oracleSql
  * must stay aligned. */
class EntrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries and non-empty") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q))
    assert(o.size >= 115)
    assert(SparkEntry.oracleSql.values.forall(_.trim.nonEmpty))
  }

  test("query names are unique") {
    val names = SparkEntry.allQ.map(_.name)
    assert(names.distinct.size == names.size)
  }
}
