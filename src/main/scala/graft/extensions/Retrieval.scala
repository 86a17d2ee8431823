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
    // Corpus-index memo (round 16, guide §1.2): (N, avgdl) are pure
    // term-independent functions of the corpus — the statistics every
    // real index (Lucene) stores once, not a per-query aggregate. Before
    // this each bm25 call carried a full corpus-scan agg + crossJoin
    // just to broadcast these two scalars; they now ride as literals
    // (same doubles: N is an exact count and avgdl divides an exactly
    // summed integer-valued total, deterministic across partitionings —
    // the header's determinism note). Values match bm25Stats.
    //
    // SNAPSHOT SEMANTICS (ADVICE r16): the memo keys on the corpus's
    // canonicalized PLAN, so a path-backed corpus whose files gain/lose
    // rows mid-session keeps serving the first call's stats — exactly a
    // search index's behaviour (stats refresh on index rebuild, not per
    // query). For a corpus that mutates within one session, invalidate
    // with CacheRegistry.release(spark) (drops every session memo) or
    // CacheRegistry.invalidateStats(spark, "bm25:stats:") between
    // versions; streaming ingest carries its own frozen snapshot via
    // bm25ScoreStream/bm25Stats instead of this memo.
    val (nDocs, avgdl) = graft.CacheRegistry.memoStat(
      docs.sparkSession,
      s"bm25:stats:${graft.CacheRegistry.planKey(docs)}"
    ) {
      val r = toks.agg(count(lit(1)).cast("double"), avg(col("dl"))).head()
      // empty corpus: avg(dl) is NULL — getDouble would throw eagerly at
      // plan-construction time where the old crossJoin spelling was lazy
      // (ADVICE r16). avgdl=0.0 keeps the plan buildable; the tf side is
      // empty so the query still returns zero rows, like before.
      (r.getDouble(0), if (r.isNullAt(1)) 0.0 else r.getDouble(1))
    }
    val df0 = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val score: Column =
      log((lit(nDocs) - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
        (col("tf") * lit(k1 + 1.0)) /
        (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(avgdl)))
    // per-doc contributions fold in term order through the streaming
    // running-window spelling (Similarity.orderedSumGrouped, round 16):
    // bit-identical sum, no per-doc collect_list (term unique per doc)
    Similarity
      .orderedSumGrouped(
        tf.join(broadcast(df0), "term")
          .withColumn("s", score)
          .select(col("doc_id"), col("term"), col("s")),
        Seq("doc_id"),
        "term",
        "s",
        "score",
        Some("n_terms")
      )
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(topK)
  }

  /** STREAMING BM25 scoring — the retrieval gate of a continuous-ingest
    * pipeline: score arriving documents against a fixed query with the
    * corpus statistics (N, avgdl, per-term df) frozen as SNAPSHOT
    * literals, the same way the streaming quality/PII gates carry their
    * trained weights. Fully stateless (pure map-side expressions, no
    * watermark, works on batch and streaming frames alike), so
    * throughput is the scan rate. Scoring arithmetic is term-for-term
    * [[bm25]]'s, folded in the fixed term order of `terms` — handed the
    * stats [[bm25]] itself computes over a corpus, it reproduces that
    * corpus's scores row-for-row (spec-asserted). Emits docs matching
    * ≥ 1 query term, like the batch join semantics. */
  def bm25ScoreStream(
      docs: DataFrame,
      terms: Seq[String],
      n: Double,
      avgdl: Double,
      dfs: Map[String, Double],
      k1: Double = 1.2,
      b: Double = 0.75
  ): DataFrame = {
    require(terms.nonEmpty, "bm25ScoreStream needs at least one query term")
    val dl = size(TextOps.tokens(col("text"))).cast("double")
    def tf(t: String): Column =
      size(filter(TextOps.tokens(col("text")), x => x === lit(t))).cast("double")
    def idf(t: String): Column = {
      val df0 = dfs.getOrElse(t, 0.0)
      lit(math.log((n - df0 + 0.5) / (df0 + 0.5) + 1.0))
    }
    // alphabetical left fold = bm25's orderedSum over struct(term, s):
    // absent terms contribute an exact 0.0 (x + 0.0 never changes a
    // double), so the present terms fold in exactly the batch order.
    // distinct first: batch bm25's isInCollection counts a duplicated
    // query term once; folding it twice here would break row-for-row parity
    val sortedTerms = terms.distinct.sorted
    val contribs = sortedTerms.map { t =>
      val tft = tf(t)
      when(tft > 0.0, idf(t) * (tft * lit(k1 + 1.0)) / (tft + lit(k1) * (lit(1.0 - b) + lit(b) * dl / lit(avgdl))))
        .otherwise(lit(0.0))
    }
    val nHit = sortedTerms.map(t => when(tf(t) > 0.0, 1L).otherwise(0L)).reduce(_ + _)
    docs
      .select(
        col("doc_id"),
        contribs.reduce(_ + _).as("score"),
        nHit.as("n_terms")
      )
      .where(col("n_terms") > 0)
  }

  /** Corpus-stats snapshot for [[bm25ScoreStream]]: (N, avgdl, df per
    * query term) computed exactly as [[bm25]] computes them internally —
    * run batch-side on a corpus snapshot, carry the scalars into the
    * stream. */
  def bm25Stats(docs: DataFrame, terms: Seq[String]): (Double, Double, Map[String, Double]) = {
    val toks = docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("__tk"))
      .select(col("doc_id"), col("__tk"), size(col("__tk")).cast("double").as("dl"))
    val st = toks.agg(count(lit(1)).cast("double"), avg(col("dl"))).head()
    val dfs = toks
      .select(col("doc_id"), explode(col("__tk")).as("term"))
      .where(col("term").isInCollection(terms))
      .groupBy("doc_id", "term")
      .count()
      .groupBy("term")
      .agg(count(lit(1)).cast("double").as("df"))
      .collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .toMap
    (st.getDouble(0), st.getDouble(1), dfs)
  }

  /** RM3-style pseudo-relevance feedback (Lavrenko & Croft 2001 relevance
    * models, as deployed in Anserini/Indri): run BM25, take the top
    * `fbDocs` documents as pseudo-relevant, build the RM1 expansion
    * weight w(t) = Σ_d tf(t,d)/dl_d over those docs, append the top
    * `fbTerms` NEW terms (weight desc, term asc ties) to the query, and
    * re-run BM25 with the expanded term set — the standard recall lever
    * when the literal query under-describes the information need (and,
    * in a curation pipeline, the way a decontamination/retrieval sweep
    * widens around a seed query).
    *
    * Determinism: RM1 folds per-term contributions in doc_id order (the
    * bm25 orderedSum pattern); the expansion cut is TakeOrdered with a
    * total tie-break. The expansion itself is collected — it is
    * `fbTerms` strings, the same driver-sized-pool contract as
    * [[mmrRerank]]; both BM25 passes stay fully distributed. Output
    * carries the expansion terms so the oracle verifies WHAT was added,
    * not just the final ranking. */
  def rm3Expand(
      docs: DataFrame,
      terms: Seq[String],
      fbDocs: Int = 3,
      fbTerms: Int = 5,
      k1: Double = 1.2,
      b: Double = 0.75,
      topK: Int = 10
  ): DataFrame = {
    val exp = rm3ExpansionTerms(docs, terms, fbDocs, fbTerms, k1, b)
    import org.apache.spark.sql.expressions.Window
    val rk = Window.orderBy(col("score").desc, col("doc_id").asc) // topK rows — bounded
    bm25(docs, terms ++ exp, k1, b, topK)
      .withColumn("rk", row_number().over(rk).cast("long"))
      .withColumn("exp_terms", lit(exp.mkString(" ")))
      .select("rk", "doc_id", "score", "n_terms", "exp_terms")
  }

  /** The TRAINING half of RM3 on its own: the expansion term list, for
    * consumers that train offline and score elsewhere — most importantly
    * [[rm3ScoreStream]], which carries these terms into a continuous
    * scoring stream the way qualityScoreStream carries trained weights.
    * Identical arithmetic to the inline computation [[rm3Expand]] used
    * through round 7 (rm3Expand now delegates here). */
  def rm3ExpansionTerms(
      docs: DataFrame,
      terms: Seq[String],
      fbDocs: Int = 3,
      fbTerms: Int = 5,
      k1: Double = 1.2,
      b: Double = 0.75
  ): Seq[String] = {
    require(fbDocs >= 1 && fbTerms >= 0, "rm3 needs a non-empty feedback pool")
    // Trained-artifact memo (round 16, guide §1.2): the expansion list is
    // a pure function of (corpus plan, query, fb params) — the
    // logRegTrain/kmeansCentroids/bloomBuild contract, and exactly how
    // this file already describes deployment ("train offline, score
    // elsewhere"; rm3ScoreStream carries the SAME list as literals).
    // Before this every rm3Expand call re-ran feedback BM25 + the RM1
    // pass eagerly at plan-construction time — two extra corpus scans
    // per query submission. Terms are LENGTH-PREFIXED in the key (ADVICE
    // r16): a bare separator is forgeable by a term that contains it
    // (Seq("a\u0000b") collides with Seq("a","b")), and term text could
    // blur into the un-length-prefixed planKey suffix; "<len>:<term>"
    // makes every encoding unambiguous.
    graft.CacheRegistry.memoStat(
      docs.sparkSession,
      s"rm3:exp:$fbDocs:$fbTerms:$k1:$b:${terms.map(t => s"${t.length}:$t").mkString(",")}:${graft.CacheRegistry.planKey(docs)}"
    ) {
      rm3ExpansionTermsUncached(docs, terms, fbDocs, fbTerms, k1, b)
    }
  }

  /** The training computation itself (memo'd above; kept separable so
    * specs can assert memo == fresh). */
  private[graft] def rm3ExpansionTermsUncached(
      docs: DataFrame,
      terms: Seq[String],
      fbDocs: Int,
      fbTerms: Int,
      k1: Double,
      b: Double
  ): Seq[String] = {
    val fb = bm25(docs, terms, k1, b, fbDocs).select(col("doc_id"))
    val toks = docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("__tk"))
      .select(col("doc_id"), col("__tk"), size(col("__tk")).cast("double").as("dl"))
    val wtd = toks
      .join(broadcast(fb), "doc_id")
      .select(col("doc_id"), col("dl"), explode(col("__tk")).as("term"))
      .groupBy("doc_id", "dl", "term")
      .agg(count(lit(1)).cast("double").as("tf"))
      .select(col("term"), col("doc_id"), (col("tf") / col("dl")).as("w"))
    // doc contributions fold in doc_id order — streaming running-window
    // spelling (Similarity.orderedSumGrouped; doc_id unique per term)
    val rm1 = Similarity.orderedSumGrouped(
      wtd.select(col("term"), col("doc_id"), col("w")),
      Seq("term"),
      "doc_id",
      "w",
      "w"
    )
    rm1
      .where(!col("term").isInCollection(terms))
      .orderBy(col("w").desc, col("term").asc)
      .limit(fbTerms)
      .select("term")
      .collect()
      .map(_.getString(0))
      .toSeq
  }

  /** STREAMING RM3 scoring — the online half of pseudo-relevance
    * feedback: the expansion is trained OFFLINE on a corpus snapshot
    * ([[rm3ExpansionTerms]], plus [[bm25Stats]] over the expanded set)
    * and arriving documents are scored against the expanded query by the
    * stateless [[bm25ScoreStream]] fold. This is the qualityScoreStream
    * contract applied to retrieval: model state (expansion terms + corpus
    * stats) rides as literals, the stream stays shuffle-free, and
    * re-expansion is a snapshot refresh, not a stream operation. Handed
    * the stats bm25 computes over the snapshot corpus, the scored rows
    * reproduce [[rm3Expand]]'s second BM25 pass row-for-row
    * (spec-asserted); `exp_terms` carries WHAT was added, like the batch
    * output. */
  def rm3ScoreStream(
      docs: DataFrame,
      terms: Seq[String],
      expTerms: Seq[String],
      n: Double,
      avgdl: Double,
      dfs: Map[String, Double],
      k1: Double = 1.2,
      b: Double = 0.75
  ): DataFrame =
    bm25ScoreStream(docs, terms ++ expTerms, n, avgdl, dfs, k1, b)
      .withColumn("exp_terms", lit(expTerms.mkString(" ")))

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

  /** Maximal-marginal-relevance re-rank (Carbonell & Goldstein, SIGIR'98)
    * of a retrieval pool: greedily pick k docs maximizing
    * λ·sim(q,d) − (1−λ)·max_{s∈selected} sim(d,s) — relevance traded
    * against redundancy, the standard diversification pass after any
    * top-k retrieval. Ties break to the lowest doc_id; the empty-set
    * redundancy term is 0 (first pick = pure relevance).
    *
    * `pool` must carry (doc_id, simq, embedding) — the query similarity
    * comes from the retrieval stage that built the pool. MMR is
    * inherently sequential-greedy, so it runs DRIVER-SIDE on the
    * COLLECTED pool: bounded by the pool size (k' ≪ corpus, ≤ maxPool
    * guard), exactly like every production reranker — the distributed
    * work is building the pool, not re-ranking it. All dot products are
    * strict left-to-right double folds (same order as graft_dot and the
    * DuckDB oracle), so scores replay bit-for-bit. */
  def mmrRerank(pool: DataFrame, k: Int, lambda: Double, maxPool: Int = 1000): DataFrame = {
    val spark = pool.sparkSession
    val rows = pool.select(col("doc_id"), col("simq"), col("embedding")).collect()
    require(rows.length <= maxPool, s"MMR pool ${rows.length} exceeds maxPool $maxPool — shrink the retrieval pool")
    val ids = rows.map(_.getLong(0))
    val simq = rows.map(_.getDouble(1))
    val vecs = rows.map(_.getSeq[Float](2).map(_.toDouble).toArray)
    def dotL(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val mu = 1.0 - lambda
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)] // (doc_id, rk, mmr)
    val picked = scala.collection.mutable.Set.empty[Int]
    for (rk <- 1 to math.min(k, rows.length)) {
      var bestIdx = -1
      var bestScore = Double.NegativeInfinity
      for (i <- rows.indices if !picked(i)) {
        val red = if (picked.isEmpty) 0.0 else picked.iterator.map(j => dotL(vecs(i), vecs(j))).max
        val score = lambda * simq(i) - mu * red
        // ties → lowest doc_id: strict > keeps the earliest, so scan in
        // doc_id order
        if (score > bestScore || (score == bestScore && bestIdx >= 0 && ids(i) < ids(bestIdx))) {
          bestIdx = i; bestScore = score
        }
      }
      picked += bestIdx
      selected += ((ids(bestIdx), rk.toLong, bestScore))
    }
    import spark.implicits._
    selected.toSeq.toDF("doc_id", "rk", "mmr")
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
  /** Retained HOF spelling of the per-group ordered MEAN (the pre-r17
    * fold of the surprisal/perplexity family): sort struct(sortC, x) —
    * ties in sortC carry identical x at every site — then left-fold x
    * from 0.0 and divide by the group count. Kept as the executable
    * specification gating [[Similarity.orderedSumGroupedTies]]'s
    * bit-equality (RetrievalFoldSpec); production paths use the
    * streaming window fold. */
  private[graft] def orderedMeanHof(sortC: org.apache.spark.sql.Column, xC: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    aggregate(
      transform(array_sort(collect_list(struct(sortC.as("s"), xC.as("x")))), s => s("x")),
      lit(0.0),
      (acc, x) => acc + x
    ) / count(lit(1))

  def unigramSurprisal(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("__tk"))
      .select(col("doc_id"), explode(col("__tk")).as("term"))
    val uni = toks.groupBy("term").agg(count(lit(1)).cast("double").as("cnt"))
    val total = uni.agg(sum(col("cnt")).as("__total"))
    // DELIBERATELY the HOF ordered mean, not the r17 ties-fold: the fold
    // was tried here and in bigramSurprisal and REVERTED on measurement
    // (BENCH_sf1: x_surprisal2 0.84 → 1.46 s — the extra full sort +
    // window machinery costs more than the per-doc collect_list it
    // replaces, and these groups are doc-bounded, so the §5 hot-group
    // hazard does not apply). knPerplexity keeps the fold, where its
    // ObjectHashAggregate removal measured −16% at sf1.
    toks
      .join(broadcast(uni), "term")
      .crossJoin(broadcast(total))
      .withColumn("nll", -log(col("cnt") / col("__total")))
      .groupBy("doc_id")
      .agg(
        orderedMeanHof(col("term"), col("nll")).as("mean_nll"),
        count(lit(1)).as("n_tok")
      )
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
    // native 2-token Shingles + substring_index (round 16) — see
    // knPerplexity for the exactness argument
    val bgt = toks
      .where(size(col("__tk")) >= 2)
      .select(
        col("doc_id"),
        explode(TextOps.shinglesFromTokens(col("__tk"), 2)).as("b")
      )
      .select(col("doc_id"), col("b"), substring_index(col("b"), " ", 1).as("a"))
    val uni = docs
      .select(explode(TextOps.tokens(col("text"))).as("a"))
      .groupBy("a")
      .agg(count(lit(1)).cast("double").as("ca"))
    val vocab = uni.agg(count(lit(1)).cast("double").as("__v"))
    val cb = bgt.groupBy("b").agg(count(lit(1)).cast("double").as("cb"))
    // HOF ordered mean on purpose — see the unigramSurprisal note (the
    // r17 ties-fold was tried and reverted on BENCH_sf1 measurement;
    // doc-bounded groups carry no §5 hazard)
    bgt
      .join(broadcast(cb), "b")
      .join(broadcast(uni), "a")
      .crossJoin(broadcast(vocab))
      .withColumn("nll", -log((col("cb") + lit(1.0)) / (col("ca") + col("__v"))))
      .groupBy("doc_id")
      .agg(
        orderedMeanHof(col("b"), col("nll")).as("mean_nll"),
        count(lit(1)).as("n_bigram")
      )
  }

  /** Per-doc perplexity under an interpolated Kneser–Ney bigram LM
    * (Kneser & Ney, ICASSP 1995; the smoothing KenLM ships and CCNet
    * filters with — the canonical perplexity gate of web-corpus
    * curation), fixed discount D = 0.75:
    *
    *   p(b|a) = max(c(a,b) − D, 0)/c(a) + D·N₁₊(a·)/c(a) · N₁₊(·b)/T
    *
    * with c(a) the CONTEXT count (Σ_b c(a,b)), N₁₊(a·)/N₁₊(·b) distinct
    * right/left neighbours, T total distinct bigram types. The model is
    * trained on the corpus being scored, so every scored bigram has
    * c(a,b) ≥ 1 — no OOV path. Scores are exact-count arithmetic; the
    * per-doc mean folds bigrams in pair order (FP parity with the
    * oracle); ppl = exp(mean −ln p).
    *
    * Scale: counts are three hash-aggregates off one bigram extraction;
    * the per-pair probability table is vocabulary-sized (broadcast), the
    * corpus-sized side is scanned once — same shape as
    * [[bigramSurprisal]]. Docs with < 2 tokens emit nothing. */
  def knPerplexity(docs: DataFrame, discount: Double = 0.75): DataFrame = {
    val toks = docs.select(col("doc_id"), TextOps.tokens(col("text")).as("__tk"))
    // bigrams are exactly 2-token shingles: the native Shingles expression
    // (round 16, guide §4) replaces the interpreted per-bigram
    // transform/element_at/concat lambda chain; a/b2 split back out of the
    // joined string with substring_index — exact because tokens cannot
    // contain the separator (split-on-space tokenizer)
    val bgt = toks
      .where(size(col("__tk")) >= 2)
      .select(
        col("doc_id"),
        explode(TextOps.shinglesFromTokens(col("__tk"), 2)).as("p")
      )
      .select(
        col("doc_id"),
        col("p"),
        substring_index(col("p"), " ", 1).as("a"),
        substring_index(col("p"), " ", -1).as("b2")
      )
    // integer-valued doubles: sums/counts of longs < 2^53 are exact in
    // any order, so these aggregates need no ordered folds
    val kab = bgt.groupBy("a", "b2").agg(count(lit(1)).cast("double").as("cab"))
    val kctx = kab.groupBy("a").agg(sum(col("cab")).as("ca"), count(lit(1)).cast("double").as("n1fa"))
    val kcont = kab.groupBy("b2").agg(count(lit(1)).cast("double").as("n1pb"))
    val ktot = kab.agg(count(lit(1)).cast("double").as("__t"))
    val d = lit(discount)
    val kp = kab
      .join(broadcast(kctx), "a")
      .join(broadcast(kcont), "b2")
      .crossJoin(broadcast(ktot))
      .select(
        concat(col("a"), lit(" "), col("b2")).as("p"),
        (greatest(col("cab") - d, lit(0.0)) / col("ca") +
          d * col("n1fa") / col("ca") * (col("n1pb") / col("__t"))).as("pkn")
      )
    // streaming ties-fold (round 17, verdict #7): the per-doc bigram key
    // is NOT unique (a repeated bigram recurs), which is exactly why the
    // r16 orderedSumGrouped swap skipped this site — but pkn (hence nll)
    // is a pure function of the bigram string p, so ties carry identical
    // values and orderedSumGroupedTies' row_number tiebreak folds
    // bit-identically to the sorted HOF fold (orderedMeanHof, spec-gated).
    // Removes the last per-doc collect_list ObjectHashAggregate in a
    // query path (§5 hot-doc safety at 100 TB).
    val scored = bgt
      .join(broadcast(kp), "p")
      .withColumn("nll", -log(col("pkn")))
    Similarity
      .orderedSumGroupedTies(
        scored.select(col("doc_id"), col("p"), col("nll")),
        Seq("doc_id"), "p", "nll", "__snll", Some("n_bigram")
      )
      .select(col("doc_id"), (col("__snll") / col("n_bigram")).as("mean_nll"), col("n_bigram"))
      .withColumn("ppl", exp(col("mean_nll")))
  }
}
