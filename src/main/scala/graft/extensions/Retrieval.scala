package graft.extensions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text retrieval scoring (SURVEY §2.F): BM25 — the default lexical
  * ranking function of every search stack, and the retrieval half of a
  * RAG data pipeline.
  *
  * score(d, q) = Σ_{t∈q} idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
  * with the Lucene idf = ln((N − df + 0.5)/(df + 0.5) + 1).
  *
  * Determinism contract: per-doc term contributions fold in TERM ORDER
  * (same collect→sort→fold pattern as tfidfCosinePairs), and avgdl is
  * exact because document lengths are integers — integer-valued doubles
  * sum exactly (≪ 2^53), so partial-aggregation order cannot flip bits.
  *
  * Scale: postings filter to the query's terms at the scan (predicate
  * pushdown-friendly), corpus stats travel as a 1-row broadcast, and the
  * final top-k is orderBy+limit — planned as TakeOrderedAndProject
  * (per-partition heaps + driver merge), never a global sort.
  */
object Retrieval {

  def bm25(
      docs: DataFrame,
      terms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75,
      topK: Int = 10
  ): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val toks = docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("__tk"))
      .select(col("doc_id"), col("__tk"), size(col("__tk")).cast("double").as("dl"))
    val tf = toks
      .select(col("doc_id"), col("dl"), explode(col("__tk")).as("term"))
      .where(col("term").isInCollection(terms))
      .groupBy("doc_id", "dl", "term")
      .agg(count(lit(1)).cast("double").as("tf"))
    val stats = toks.agg(count(lit(1)).cast("double").as("__n"), avg(col("dl")).as("__avgdl"))
    val df0 = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val score: Column =
      log((col("__n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
        (col("tf") * lit(k1 + 1.0)) /
        (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("__avgdl")))
    val orderedSum =
      aggregate(
        transform(array_sort(collect_list(struct(col("term"), col("s")))), x => x("s")),
        lit(0.0),
        (acc, x) => acc + x
      )
    tf.join(broadcast(df0), "term")
      .crossJoin(broadcast(stats))
      .withColumn("s", score)
      .groupBy("doc_id")
      .agg(orderedSum.as("score"), count(lit(1)).cast("long").as("n_terms"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(topK)
  }

  /** Reciprocal-rank fusion (Cormack et al., SIGIR'09) of two ranked
    * candidate lists — THE standard way hybrid search merges a lexical
    * (BM25) list with a vector (cosine) list without score calibration:
    * rrf(d) = Σ_lists 1/(kk + rank_list(d)), absent-from-list ⇒ 0.
    *
    * Inputs are (doc_id, rank) frames (rank 1-based). Both lists are
    * top-N pools (tiny), so the fuse is a broadcast-sized full outer
    * join; the final cut is orderBy+limit → TakeOrderedAndProject.
    * Determinism: 1/(kk+r) is a single double division; the sum has two
    * fixed-order terms — the DuckDB oracle reproduces it exactly. */
  def rrfFuse(lex: DataFrame, vec: DataFrame, kk: Int = 60, topK: Int = 10): DataFrame = {
    val l = lex.select(col("doc_id"), col("rank").cast("long").as("r_lex"))
    val v = vec.select(col("doc_id"), col("rank").cast("long").as("r_vec"))
    val fused = l
      .join(v, Seq("doc_id"), "full_outer")
      .withColumn(
        "rrf",
        coalesce(lit(1.0) / (lit(kk.toDouble) + col("r_lex")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(kk.toDouble) + col("r_vec")), lit(0.0))
      )
    fused
      .orderBy(col("rrf").desc, col("doc_id").asc)
      .limit(topK)
      .select(col("doc_id"), col("r_lex"), col("r_vec"), col("rrf"))
  }

  /** CCNet-style LM-proxy quality score: per-doc mean token surprisal
    * −ln p(t) under the corpus's own unigram distribution. Wikipedia-like
    * text scores low (common tokens), gibberish and boilerplate-with-rare-
    * symbols score high — the classic cheap stand-in for a real LM
    * perplexity filter.
    *
    * Determinism: token surprisals fold per doc in TOKEN-STRING order
    * (collect→sort→fold); p(t) = count(t)/total where both sides are
    * exact integer-valued doubles.
    *
    * Scale: one unigram aggregate (map-side combine) joined back to the
    * postings — both shuffles are key-sized, the corpus scans twice. */
  def unigramSurprisal(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("__tk"))
      .select(col("doc_id"), explode(col("__tk")).as("term"))
    val uni = toks.groupBy("term").agg(count(lit(1)).cast("double").as("cnt"))
    val total = uni.agg(sum(col("cnt")).as("__total"))
    val orderedMean =
      aggregate(
        transform(array_sort(collect_list(struct(col("term"), col("nll")))), x => x("nll")),
        lit(0.0),
        (acc, x) => acc + x
      ) / count(lit(1))
    toks
      .join(broadcast(uni), "term")
      .crossJoin(broadcast(total))
      .withColumn("nll", -log(col("cnt") / col("__total")))
      .groupBy("doc_id")
      .agg(orderedMean.as("mean_nll"), count(lit(1)).cast("long").as("n_tok"))
  }

  /** Per-doc mean BIGRAM surprisal under an add-one-smoothed corpus
    * bigram LM (round 5 — the CCNet-style quality proxy one order up
    * from [[unigramSurprisal]]): p(b|a) = (c(a,b)+1)/(c(a)+V) with c(·)
    * corpus counts and V the vocabulary size; a doc's score is the mean
    * −ln p over its bigrams, folded in bigram order (FP-parity with the
    * DuckDB oracle). Docs with < 2 tokens emit nothing. The bigram-count
    * table is broadcast — right for natural-language vocabularies; swap
    * the join to a shuffle join for adversarial corpora where distinct
    * bigrams rival corpus size. */
  def bigramSurprisal(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), TextOps.tokens(col("text")).as("__tk"))
    val bgt = toks
      .where(size(col("__tk")) >= 2)
      .select(
        col("doc_id"),
        explode(
          transform(
            sequence(lit(1), size(col("__tk")) - 1),
            i =>
              struct(
                concat(element_at(col("__tk"), i), lit(" "), element_at(col("__tk"), i + 1)).as("b"),
                element_at(col("__tk"), i).as("a")
              )
          )
        ).as("s")
      )
      .select(col("doc_id"), col("s.b").as("b"), col("s.a").as("a"))
    val uni = docs
      .select(explode(TextOps.tokens(col("text"))).as("a"))
      .groupBy("a")
      .agg(count(lit(1)).cast("double").as("ca"))
    val vocab = uni.agg(count(lit(1)).cast("double").as("__v"))
    val cb = bgt.groupBy("b").agg(count(lit(1)).cast("double").as("cb"))
    val orderedMean =
      aggregate(
        transform(array_sort(collect_list(struct(col("b"), col("nll")))), x => x("nll")),
        lit(0.0),
        (acc, x) => acc + x
      ) / count(lit(1))
    bgt
      .join(broadcast(cb), "b")
      .join(broadcast(uni), "a")
      .crossJoin(broadcast(vocab))
      .withColumn("nll", -log((col("cb") + lit(1.0)) / (col("ca") + col("__v"))))
      .groupBy("doc_id")
      .agg(orderedMean.as("mean_nll"), count(lit(1)).cast("long").as("n_bigram"))
  }
}
