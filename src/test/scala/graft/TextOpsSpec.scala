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

  test("native Tokens equals the HOF filter(split) specification (corpus + edges)") {
    Graft.init(spark)
    import spark.implicits._
    val corpus = Graft
      .table(spark, TestSpark.sfDir, "documents")
      .select(col("text"))
      .union(
        Seq("", " ", "  ", "a", " a", "a ", "  a  b  ", "a b", "a\tb", "a\nb c", "é ü  x")
          .toDF("text")
      )
    val bad = corpus
      .select(
        TextOps.tokens(col("text")).as("fast"),
        TextOps.tokensHof(col("text")).as("spec")
      )
      .where(col("fast") =!= col("spec"))
      .count()
    assert(bad == 0)
    // null text: both spellings are null
    val nr = Seq[Option[String]](None)
      .toDF("text")
      .select(
        TextOps.tokens(col("text")).isNull.as("fastNull"),
        TextOps.tokensHof(col("text")).isNull.as("specNull")
      )
      .head()
    assert(nr.getBoolean(0) && nr.getBoolean(1))
  }

  test("native Shingles equals the HOF transform/concat_ws specification (corpus + edges)") {
    Graft.init(spark)
    import spark.implicits._
    val corpus = Graft
      .table(spark, TestSpark.sfDir, "documents")
      .select(col("text"))
      .union(Seq("", "a", "a b", "a b c", "a b c d", "é ü x y").toDF("text"))
      .select(TextOps.tokens(col("text")).as("tk"))
    for (k <- Seq(1, 2, 3, 5)) {
      val bad = corpus
        .select(
          TextOps.shinglesFromTokens(col("tk"), k).as("fast"),
          TextOps.shinglesFromTokensHof(col("tk"), k).as("spec")
        )
        .where(col("fast") =!= col("spec"))
        .count()
      assert(bad == 0, s"k=$k")
    }
    // null tokens array: both spellings yield an EMPTY array
    val nr = Seq[Option[String]](None)
      .toDF("text")
      .select(TextOps.tokens(col("text")).as("tk"))
      .select(
        size(TextOps.shinglesFromTokens(col("tk"), 3)).as("fastN"),
        size(TextOps.shinglesFromTokensHof(col("tk"), 3)).as("specN")
      )
      .head()
    assert(nr.getInt(0) == 0 && nr.getInt(1) == 0)
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

  test("sequence packing tiles each shard's token stream without gaps") {
    Graft.init(spark)
    val docs = Graft.table(spark, TestSpark.sfDir, "documents")
    val L = 256
    val packed = TextOps.packSequences(docs, contextLen = L, shards = 8).collect()
    assert(packed.length == docs.count())
    packed.groupBy(_.getAs[Long]("shard")).foreach { case (shard, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("doc_id"))
      // intervals tile: doc k+1 starts exactly where doc k ended
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("tok_start") == a.getAs[Long]("tok_end"), s"gap in shard $shard")
        case _ =>
      }
      assert(sorted.head.getAs[Long]("tok_start") == 0L)
      // chunk spans are consistent with the interval and the context length
      sorted.filter(_.getAs[Long]("n_tok") > 0).foreach { r =>
        val cs = r.getAs[Long]("chunk_start"); val ce = r.getAs[Long]("chunk_end")
        assert(cs == r.getAs[Long]("tok_start") / L)
        assert(ce == (r.getAs[Long]("tok_end") - 1) / L)
        assert(r.getAs[Long]("n_chunks") == ce - cs + 1)
      }
    }
  }

  test("CdcBoundaries rolling pass equals the HOF boundary-filter specification") {
    import org.apache.spark.sql.functions._
    graft.functions.Registry.register(spark)
    val d = Graft
      .table(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"), col("text").as("__t"), length(col("text")).as("__len"))
    val hof = when(
      col("__len") >= 8,
      filter(
        sequence(lit(8), col("__len")),
        i => graft.extensions.TextOps.polyHash(col("__t").substr(i - lit(7), lit(8))) % lit(64L) === lit(0L)
      )
    ).otherwise(array().cast("array<int>"))
    val rows = d
      .select(
        col("doc_id"),
        hof.as("spec"),
        call_function("graft_cdc_bounds", col("__t"), lit(8), lit(64L)).as("got")
      )
      .collect()
    assert(rows.nonEmpty)
    var any = false
    rows.foreach { r =>
      val spec = r.getSeq[Int](1)
      val got = r.getSeq[Int](2)
      assert(got == spec, s"doc ${r.getLong(0)}: $got vs $spec")
      if (spec.nonEmpty) any = true
    }
    assert(any, "no document produced a boundary; the fixture makes this vacuous")
  }
}
