package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.extensions.{Similarity, TextOps}

/** orderedSumGrouped (running-window streaming fold, round 16) must be
  * bit-identical to the collect_list+HOF orderedSum specification on a
  * real skewed grouping (the corpus term postings), including
  * single-element groups and groups spanning partitions. */
class SimilarityFoldSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("orderedSumGrouped equals the collect_list orderedSum fold bit-for-bit") {
    Graft.init(spark)
    val postings = Graft
      .table(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))
      // non-trivial doubles: log-weighted counts exercise real FP folds
      .select(col("term"), col("doc_id"), (col("tf") * log(col("tf") + lit(1.0))).as("x"))
    val spec = postings
      .groupBy("term")
      .agg(
        aggregate(
          transform(array_sort(collect_list(struct(col("doc_id"), col("x")))), s => s("x")),
          lit(0.0),
          (a, v) => a + v
        ).as("s"),
        count(lit(1)).as("c")
      )
    val fast = Similarity.orderedSumGrouped(postings, Seq("term"), "doc_id", "x", "s", Some("c"))
    val joined = spec
      .withColumnRenamed("s", "s0")
      .withColumnRenamed("c", "c0")
      .join(fast, "term")
    assert(joined.count() == spec.count() && joined.count() == fast.count())
    // bit-exact: null-safe equality plus a 1/x probe that separates ±0.0
    val bad = joined
      .where(
        !(col("s0") <=> col("s")) ||
          !((lit(1.0) / col("s0")) <=> (lit(1.0) / col("s"))) ||
          col("c0") =!= col("c")
      )
      .count()
    assert(bad == 0)
  }

  test("orderedSumGrouped string-ordered ids match array_sort struct order") {
    Graft.init(spark)
    import spark.implicits._
    // string ids (the bm25/tfidf term case): window ORDER BY string must
    // agree with array_sort's struct ordering
    val rows = Seq(
      (1L, "b", 0.1), (1L, "a", 0.7), (1L, "c", -0.3),
      (2L, "z", 1e-17), (2L, "y", 1.0), (2L, "x", -1.0)
    ).toDF("g", "id", "x")
    val spec = rows
      .groupBy("g")
      .agg(
        aggregate(
          transform(array_sort(collect_list(struct(col("id"), col("x")))), s => s("x")),
          lit(0.0),
          (a, v) => a + v
        ).as("s")
      )
    val fast = Similarity.orderedSumGrouped(rows, Seq("g"), "id", "x", "s")
    val bad = spec
      .withColumnRenamed("s", "s0")
      .join(fast, "g")
      .where(
        !(col("s0") <=> col("s")) ||
          !((lit(1.0) / col("s0")) <=> (lit(1.0) / col("s")))
      )
      .count()
    assert(bad == 0)
  }
}
