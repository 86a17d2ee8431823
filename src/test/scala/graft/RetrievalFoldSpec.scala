package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.extensions.{Retrieval, Similarity, TextOps}

/** orderedSumGroupedTies (round 17, verdict #7) must be bit-identical to
  * the retained collect_list+HOF ordered-mean specification
  * (Retrieval.orderedMeanHof) on sort keys that REPEAT within a group —
  * the knPerplexity/surprisal family, where a doc's repeated bigram
  * carries one corpus-wide nll. The precondition (ties have identical x)
  * holds at every call site because x is a pure function of the sort key. */
class RetrievalFoldSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Bit-exact comparison incl. ±0.0 separation: Java's Double.toString
    * is roundtrip-unique, so the string cast distinguishes every double
    * bit pattern (including -0.0, which the 1/x probe cannot test under
    * ANSI mode — a group folding to exactly 0.0 makes 1/x a
    * DIVIDE_BY_ZERO error, not an Infinity). */
  private def assertBitEqual(
      spec: org.apache.spark.sql.DataFrame, // (key, m0, c0)
      fast: org.apache.spark.sql.DataFrame, // (key, m, c)
      key: String
  ): Unit = {
    val joined = spec.join(fast, key)
    assert(joined.count() == spec.count() && joined.count() == fast.count())
    val bad = joined
      .where(
        !(col("m0") <=> col("m")) ||
          !(col("m0").cast("string") <=> col("m").cast("string")) ||
          col("c0") =!= col("c")
      )
      .count()
    assert(bad == 0)
  }

  test("ties fold == HOF ordered mean on the real bigram-LM frame (repeated bigrams per doc)") {
    Graft.init(spark)
    // the knPerplexity scored frame, rebuilt from primitives: per-doc
    // bigrams joined to a corpus-wide nll — the exact non-unique-key shape
    val docs = Graft.table(spark, TestSpark.sfDir, "documents")
    val toks = docs.select(col("doc_id"), TextOps.tokens(col("text")).as("__tk"))
    val bgt = toks
      .where(size(col("__tk")) >= 2)
      .select(col("doc_id"), explode(TextOps.shinglesFromTokens(col("__tk"), 2)).as("p"))
    val cb = bgt.groupBy("p").agg(count(lit(1)).cast("double").as("cp"))
    val scored = bgt
      .join(broadcast(cb), "p")
      .withColumn("nll", -log(col("cp") / lit(1e6)))
      .select(col("doc_id"), col("p"), col("nll"))
    // a repeated bigram within a doc must exist for this gate to bite
    val dupGroups = scored.groupBy("doc_id", "p").count().where(col("count") > 1).count()
    assert(dupGroups > 0, "fixture has no repeated bigram — the tie path is untested")
    val spec = scored
      .groupBy("doc_id")
      .agg(Retrieval.orderedMeanHof(col("p"), col("nll")).as("m0"), count(lit(1)).as("c0"))
    val fast = Similarity
      .orderedSumGroupedTies(scored, Seq("doc_id"), "p", "nll", "s", Some("c"))
      .select(col("doc_id"), (col("s") / col("c")).as("m"), col("c"))
    assertBitEqual(spec, fast, "doc_id")
  }

  test("ties fold == HOF ordered mean on ±0.0 / tiny-magnitude edge rows") {
    Graft.init(spark)
    import spark.implicits._
    // ties carry identical values (the call-site precondition), incl.
    // negative zero and catastrophic-cancellation magnitudes
    val rows = Seq(
      (1L, "a", -0.0), (1L, "a", -0.0), (1L, "b", 1e-17), (1L, "c", -1e-17),
      (2L, "x", 0.0), (2L, "x", 0.0), (2L, "x", 0.0),
      (3L, "q", 3.141592653589793), (3L, "q", 3.141592653589793), (3L, "r", -3.141592653589793)
    ).toDF("g", "k", "x")
    val spec = rows
      .groupBy("g")
      .agg(Retrieval.orderedMeanHof(col("k"), col("x")).as("m0"), count(lit(1)).as("c0"))
    val fast = Similarity
      .orderedSumGroupedTies(rows, Seq("g"), "k", "x", "s", Some("c"))
      .select(col("g"), (col("s") / col("c")).as("m"), col("c"))
    assertBitEqual(spec, fast, "g")
  }
}
