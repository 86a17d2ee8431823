package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSessionExtensions

/** GraftExtensions wiring + SQL-level function surface. */
class ExtensionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("GraftExtensions injects without error") {
    new graft.extensions.GraftExtensions().apply(new SparkSessionExtensions)
  }

  test("registered functions are callable from SQL") {
    Graft.init(spark)
    val r = spark
      .sql(
        "SELECT round(graft_ewm(x, 0.5) OVER (ORDER BY i ROWS UNBOUNDED PRECEDING), 6) AS e, " +
          "graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d " +
          "FROM VALUES (1, 10.0d), (2, 20.0d), (3, 30.0d) AS t(i, x) ORDER BY i"
      )
      .collect()
    assert(r.map(_.getDouble(0)).toSeq == Seq(10.0, 15.0, 22.5))
    assert(r.head.getDouble(1) == 11.0)
  }
}
