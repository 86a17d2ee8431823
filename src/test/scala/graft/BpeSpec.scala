package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.extensions.Bpe

/** BPE trainer semantics, pinned against an independent in-memory
  * reference implementation (the DuckDB oracle covers sf0.01; these pin
  * the greedy-fold contract and determinism under repartitioning).
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Reference single-machine BPE over a word-count map — the textbook
    * algorithm, written with none of the Spark machinery. */
  private def refBpe(words: Map[String, Long], rounds: Int): Seq[(String, String, Long)] = {
    var dict: Map[Vector[String], Long] =
      words.map { case (w, c) => w.split("").toVector -> c }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    for (_ <- 1 to rounds) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- dict; i <- 0 until syms.size - 1)
        pairs((syms(i), syms(i + 1))) = pairs.getOrElse((syms(i), syms(i + 1)), 0L) + c
      if (pairs.nonEmpty) {
        val ((l, r), c) = pairs.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((l, r, c))
        dict = dict.map { case (syms, cnt) =>
          val nb = scala.collection.mutable.ArrayBuffer.empty[String]
          for (s <- syms)
            if (nb.nonEmpty && nb.last == l && s == r) nb(nb.size - 1) = l + r
            else nb += s
          nb.toVector -> cnt
        }
      }
    }
    out.toSeq
  }

  test("applyMerge is the greedy left-to-right fold (overlap + chain cases)") {
    import spark.implicits._
    val df = Seq("aaa", "abab", "xaaby").toDF("word")
    val got = df
      .select(col("word"), Bpe.applyMerge(Bpe.charSyms(col("word")), "a", "a").as("s"))
      .orderBy("word")
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList)
      .toMap
    assert(got("aaa") == List("aa", "a"), "greedy: no re-match of the merged output in-pass")
    assert(got("abab") == List("a", "b", "a", "b"))
    assert(got("xaaby") == List("x", "aa", "b", "y"))
    val ab = df
      .select(col("word"), Bpe.applyMerge(Bpe.charSyms(col("word")), "a", "b").as("s"))
      .where(col("word") === "abab")
      .collect()
      .head
      .getSeq[String](1)
      .toList
    assert(ab == List("ab", "ab"), "adjacent matches must both merge (no delimiter sharing)")
  }

  test("segmentCol kernel == sequential applyMerge folds (the executable spec)") {
    import spark.implicits._
    val merges = Seq(
      Bpe.Merge(1, "l", "o", 0L),
      Bpe.Merge(2, "lo", "w", 0L),
      Bpe.Merge(3, "e", "r", 0L)
    )
    val folded = merges.foldLeft(Bpe.charSyms(col("word"))) { (s, m) =>
      Bpe.applyMerge(s, m.l, m.r)
    }
    val rows = Seq("low", "lower", "lowest", "newer", "wider", "lloww", "a")
      .toDF("word")
      .select(
        col("word"),
        Bpe.segmentCol(col("word"), merges).as("kernel"),
        folded.as("hof")
      )
      .collect()
    rows.foreach { r =>
      assert(
        r.getSeq[String](1) == r.getSeq[String](2),
        s"kernel/HOF divergence on '${r.getString(0)}'"
      )
    }
  }

  test("train matches the reference BPE on a crafted corpus, ties and all") {
    import spark.implicits._
    // 'low lower lowest newer newest': the classic Sennrich example shape
    val docs = Seq(
      "low low low lower lower lowest",
      "newer newer newer newest newest wider"
    ).map(t => (1L, t)).zipWithIndex.map { case ((_, t), i) => (i.toLong, t) }.toDF("doc_id", "text")
    val words = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w")
      .agg(count(lit(1)).as("c"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val want = refBpe(words, 8)
    val got = Bpe.train(docs, 8).map(m => (m.l, m.r, m.c)).toSeq
    assert(got == want)
  }

  test("train is repartition-stable and encode ratios are exact-count consistent") {
    val docs = Graft.table(spark, TestSpark.sfDir, "documents")
    val a = Bpe.train(docs, 6).toSeq
    val b = Bpe.train(docs.repartition(7), 6).toSeq
    assert(a.map(m => (m.rank, m.l, m.r, m.c)) == b.map(m => (m.rank, m.l, m.r, m.c)))
    val enc = Bpe.encode(docs, a).collect()
    assert(enc.nonEmpty)
    enc.foreach { r =>
      val nChars = r.getAs[Long]("n_chars"); val nBpe = r.getAs[Long]("n_bpe")
      assert(nBpe <= nChars && nBpe >= r.getAs[Long]("n_words"))
      assert(math.abs(r.getAs[Double]("ratio") - nBpe.toDouble / nChars) < 1e-6)
    }
  }
}
