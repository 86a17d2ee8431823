package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.extensions.TextOps

/** PolyHash (codegen) must equal its HOF executable specification. */
class TextOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("codegen polyhash equals the HOF fold on the corpus") {
    Graft.init(spark)
    val bad = Graft
      .table(spark, TestSpark.sfDir, "documents")
      .select(
        TextOps.polyHash(col("text")).as("fast"),
        TextOps.polyHashHof(col("text")).as("spec")
      )
      .where(col("fast") =!= col("spec"))
      .count()
    assert(bad == 0)
  }

  test("topBigramFrac equals the explode-count-max spelling, hand values") {
    Graft.init(spark)
    import spark.implicits._
    val r = Seq(
      "a b c a b c b c", // 7 bigrams, "b c" ×3 → 3/7
      "x",               // no bigrams → null
      ""
    ).toDF("text")
      .select(TextOps.tokens(col("text")).as("tk"))
      .select(TextOps.topBigramFrac(col("tk")).as("f"))
      .collect()
      .map(row => if (row.isNullAt(0)) None else Some(row.getDouble(0)))
    assert(r(0).contains(3.0 / 7.0), s"got ${r(0)}")
    assert(r(1).isEmpty && r(2).isEmpty)
  }

  test("polyhash handles empty and single-char strings") {
    Graft.init(spark)
    import spark.implicits._
    val r = Seq("", "a", "zz").toDF("s")
      .select(TextOps.polyHash(col("s")).as("h"))
      .collect()
      .map(_.getLong(0))
    assert(r(0) == 0L)
    assert(r(1) == 'a'.toLong)
    assert(r(2) == ('z'.toLong * 31 + 'z'.toLong) % 1000000007L)
  }
}
