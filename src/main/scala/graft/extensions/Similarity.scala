package graft.extensions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search (SURVEY.md §2.F) over
  * `(vec_id BIGINT, embedding ARRAY<FLOAT>, …)`.
  *
  * Scale design: the brute-force path broadcasts the (small) query set and
  * streams the corpus once — a map-only job plus a per-query top-k
  * aggregation; no corpus shuffle. The IVF path clusters the corpus once
  * (one extra shuffle to co-locate cells) and probes only nprobe cells per
  * query — the standard sub-linear ANN layout; at 100 TB the cell id also
  * becomes the storage partition key so probing prunes parquet files.
  *
  * All dot products run in DOUBLE with strict left-to-right accumulation
  * (`aggregate` HOF) so the DuckDB oracle (list_reduce) is bit-identical.
  */
object Similarity {

  /** Left-to-right double-precision dot product of two float/double
    * vectors — native codegen'd kernel (graft.functions.ArrayDot), not an
    * interpreted HOF fold; registered by Graft.init. */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  def l2norm(a: Column): Column = sqrt(call_function("graft_normsq", a))

  /** Cosine similarity (inputs need not be unit-norm). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2norm(a) * l2norm(b))

  /** Brute-force exact top-k: for every query vector, the k most-cosine-
    * similar corpus vectors (self excluded). Queries are broadcast; the
    * corpus is scanned once; rank window is per-query (small). */
  def topkBrute(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = corpus
      .repartition(col("vec_id"))
      .as("c")
      .crossJoin(broadcast(queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))))
      .where(col("q_id") =!= col("c.vec_id"))
      .select(
        col("q_id"),
        col("c.vec_id").as("nbr_id"),
        dot(col("q_emb"), col("c.embedding")).as("sim")
      )
    import org.apache.spark.sql.expressions.Window
    val rk = Window.partitionBy("q_id").orderBy(col("sim").desc, col("nbr_id").asc)
    scored
      .withColumn("rk", row_number().over(rk))
      .where(col("rk") <= k)
      .select("q_id", "rk", "nbr_id", "sim")
  }

  /** Exact cosine near-dup pairs (sim ≥ threshold, a < b). Brute-force
    * self-join — the oracle-verifiable exact path; use simhash/IVF
    * blocking when n² is unaffordable. */
  def cosinePairs(corpus: DataFrame, threshold: Double): DataFrame =
    // spread the streamed side: a single parquet file is one partition,
    // which would serialize the O(n²) dot products on one core
    corpus
      .repartition(col("vec_id"))
      .as("x")
      .join(corpus.as("y"), col("x.vec_id") < col("y.vec_id"))
      .select(
        col("x.vec_id").as("a_id"),
        col("y.vec_id").as("b_id"),
        dot(col("x.embedding"), col("y.embedding")).as("sim")
      )
      .where(col("sim") >= threshold)

  /** Bounded top-k accumulator for the heap aggregation path: keeps the k
    * best (sim, id) pairs; merge is k-bounded, so partial (map-side)
    * aggregation shrinks the shuffle from |corpus| rows per query to k
    * rows per partition per query — the SURVEY §2.F scale path. */
  final case class TopKAcc(k: Int, items: List[(Double, Long)]) {
    def add(sim: Double, id: Long): TopKAcc = insert((sim, id))
    private def insert(p: (Double, Long)): TopKAcc = {
      val merged = (p :: items).sortBy(x => (-x._1, x._2)).take(k)
      copy(items = merged)
    }
    def merge(o: TopKAcc): TopKAcc =
      copy(items = (items ++ o.items).sortBy(x => (-x._1, x._2)).take(k))
  }

  /** Exact top-k via a typed Aggregator (partial-agg heap) instead of a
    * window sort: equal results to topkBrute, but the per-query state
    * that crosses the shuffle is k pairs, not the whole scored corpus. */
  private def topkAgg(k: Int)(implicit outEnc: org.apache.spark.sql.Encoder[Seq[(Long, Double)]]) =
    new org.apache.spark.sql.expressions.Aggregator[(Long, Long, Double), TopKAcc, Seq[(Long, Double)]] {
      def zero: TopKAcc = TopKAcc(k, Nil)
      def reduce(b: TopKAcc, r: (Long, Long, Double)): TopKAcc = b.add(r._3, r._2)
      def merge(a: TopKAcc, b: TopKAcc): TopKAcc = a.merge(b)
      def finish(b: TopKAcc): Seq[(Long, Double)] = b.items.map(p => (p._2, p._1))
      def bufferEncoder: org.apache.spark.sql.Encoder[TopKAcc] =
        org.apache.spark.sql.Encoders.kryo[TopKAcc]
      def outputEncoder: org.apache.spark.sql.Encoder[Seq[(Long, Double)]] = outEnc
    }

  /** Heap-aggregate (q_id, nbr_id, sim) triples to ranked top-k rows —
    * the only per-query state crossing the shuffle is k pairs. Rank order
    * matches the window-sort paths: sim desc, nbr_id asc. */
  private def heapRank(
      scored: org.apache.spark.sql.Dataset[(Long, Long, Double)],
      k: Int
  ): DataFrame = {
    import scored.sparkSession.implicits._
    scored
      .groupByKey(_._1)
      .agg(topkAgg(k).toColumn.name("topk"))
      .toDF("q_id", "topk")
      .select(col("q_id"), posexplode(col("topk")).as(Seq("rk0", "p")))
      .select(
        col("q_id"),
        (col("rk0") + 1).cast("long").as("rk"),
        col("p._1").as("nbr_id"),
        col("p._2").as("sim")
      )
  }

  def topkHeap(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val scored = corpus
      .repartition(col("vec_id"))
      .as("c")
      .crossJoin(broadcast(queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))))
      .where(col("q_id") =!= col("c.vec_id"))
      .select(
        col("q_id"),
        col("c.vec_id").as("nbr_id"),
        dot(col("q_emb"), col("c.embedding")).as("sim")
      )
      .as[(Long, Long, Double)]
    heapRank(scored, k)
  }

  /** FILTERED exact top-k: for every query vector, the k most-similar
    * corpus vectors whose `filterKey` column EQUALS the query's (the
    * "filtered ANN" shape every vector store exposes — search within a
    * tenant / language / shard). Exact brute path: the predicate applies
    * BEFORE scoring, so each query scores only its slice of the corpus —
    * with a selectivity of 1/L (L label values) the scan does n/L dots
    * per query, not n. Queries broadcast as usual. */
  def topkBruteFiltered(corpus: DataFrame, queries: DataFrame, k: Int, filterKey: String = "label"): DataFrame = {
    val scored = corpus
      .repartition(col("vec_id"))
      .as("c")
      .crossJoin(
        broadcast(
          queries.select(
            col("vec_id").as("q_id"),
            col("embedding").as("q_emb"),
            col(filterKey).as("q_key")
          )
        )
      )
      .where(col("q_id") =!= col("c.vec_id") && col(s"c.$filterKey") === col("q_key"))
      .select(
        col("q_id"),
        col("c.vec_id").as("nbr_id"),
        dot(col("q_emb"), col("c.embedding")).as("sim")
      )
    import org.apache.spark.sql.expressions.Window
    val rk = Window.partitionBy("q_id").orderBy(col("sim").desc, col("nbr_id").asc)
    scored
      .withColumn("rk", row_number().over(rk))
      .where(col("rk") <= k)
      .select("q_id", "rk", "nbr_id", "sim")
  }

  /** FILTERED IVF probe: [[topkIvfWithCents]] with the equality predicate
    * pushed into the cell join — candidates are (query's nprobe cells) ∩
    * (matching filterKey), so the filter prunes BEFORE any dot product,
    * and on a cell-partitioned layout the scan reads only matching row
    * groups (parquet predicate pushdown on filterKey). Approximate like
    * the unfiltered probe; recall vs [[topkBruteFiltered]] is spec-
    * gated. The index must carry `filterKey` as a column. */
  def topkIvfFilteredWithCents(
      index: DataFrame,
      cents: DataFrame,
      queries: DataFrame,
      k: Int,
      nprobe: Int,
      filterKey: String = "label"
  ): DataFrame = {
    val qcells = queries
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col(filterKey).as("q_key"))
      .crossJoin(broadcast(cents))
      .select(col("q_id"), col("q_emb"), col("q_key"), col("cent_id"), dot(col("q_emb"), col("cent_emb")).as("csim"))
    import org.apache.spark.sql.expressions.Window
    val crk = Window.partitionBy("q_id").orderBy(col("csim").desc, col("cent_id").asc)
    val probes = qcells
      .withColumn("crk", row_number().over(crk))
      .where(col("crk") <= nprobe)
      .select(col("q_id"), col("q_emb"), col("q_key"), col("cent_id").as("cell"))
    val scored = index
      .join(broadcast(probes), index("cell") === probes("cell") && index(filterKey) === probes("q_key"))
      .where(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("nbr_id"), dot(col("q_emb"), col("embedding")).as("sim"))
    val rk = Window.partitionBy("q_id").orderBy(col("sim").desc, col("nbr_id").asc)
    scored
      .withColumn("rk", row_number().over(rk))
      .where(col("rk") <= k)
      .select("q_id", "rk", "nbr_id", "sim")
  }

  /** IVF (inverted-file) index: deterministic coarse quantizer — since
    * round 5 TRAINED via [[kmeansCentroids]] (bounded spherical Lloyd,
    * fixed seed, no RNG); every vector is assigned to its max-dot
    * centroid. Returns (vec_id, embedding, cell). At scale, write
    * partitioned by `cell` so probes prune storage.
    */
  /** UNTRAINED centroid INIT: the nCells lowest-id vectors — the fixed
    * "seed" kmeansCentroids starts from. Build side and probe side must
    * derive centroids the SAME way (same trainer, same params) — a
    * probe-side quantizer that differs from the build-side one silently
    * degrades recall (e.g. `vec_id < nCells` on a corpus whose ids are
    * non-contiguous selects the wrong — or an empty — set). */
  def ivfCentroids(vectors: DataFrame, nCells: Int): DataFrame =
    vectors
      .orderBy("vec_id")
      .limit(nCells)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_emb"))

  /** Scala-side strict left-fold dot — the SAME summation order as the
    * ArrayDot expression and DuckDB's `list_reduce` dot, so driver-held
    * centroid norms are bit-identical to oracle-computed ones. */
  private def dotLocal(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Ordered per-dim sum for centroid means: members folded in vec_id
    * order from 0.0 — mirrors DuckDB `list_reduce(list(x ORDER BY
    * vec_id), +)` (0 + x₀ = x₀). */
  private[graft] def orderedSum(idC: Column, xC: Column): Column =
    aggregate(
      transform(array_sort(collect_list(struct(idC.as("i"), xC.as("x")))), s => s("x")),
      lit(0.0),
      (a, v) => a + v
    )

  /** STREAMING spelling of groupBy(keys).agg(orderedSum(id, x)) — the
    * round-16 guide §4/§5 rewrite of the hot-path fold. Bit-identical
    * sum: a running window `sum(x)` adds rows in (id ASC) frame order
    * with Sum's update `coalesce(sum, 0.0) + x`, i.e. ((0.0+x₁)+x₂)+…,
    * exactly the HOF fold's seed-0.0 left fold; the group result is the
    * running value at the LAST id (`max_by`). Equality is spec-asserted
    * (SimilaritySpec) and every consuming query stays oracle-green.
    *
    * Why: [[orderedSum]] plans as ObjectHashAggregate — collect_list
    * holds each group's rows in ONE task's memory and the sort+fold runs
    * through interpreted HOF eval. This spelling is sort-based and
    * spillable (the 100 TB-safe shape for hot groups) and stays inside
    * codegen'd window/hash-agg operators. Requires `idCol` UNIQUE within
    * a group (true at every call site: term/src/doc_id keys) — max_by
    * ties would otherwise be arbitrary.
    *
    * Emits df.groupBy(keys) with `out` = ordered sum and, when `cnt` is
    * set, the group row count. The window exchange establishes
    * hashpartitioning(keys), which the following hash-agg reuses — ONE
    * Exchange total, same as the ObjectHashAggregate plan. */
  private[graft] def orderedSumGrouped(
      df: DataFrame,
      keys: Seq[String],
      idCol: String,
      xCol: String,
      out: String,
      cnt: Option[String] = None
  ): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val run = df.withColumn("__osum_run", sum(col(xCol)).over(w))
    val aggs = max_by(col("__osum_run"), col(idCol)).as(out) +:
      cnt.map(c => count(lit(1)).as(c)).toSeq
    run.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** [[orderedSumGrouped]] for NON-unique sort keys whose ties carry
    * IDENTICAL x values (round 17, verdict #7 — the knPerplexity family:
    * a repeated bigram/term within a doc has one corpus-wide nll, so any
    * tie order folds the same value sequence and the running sum is
    * bit-identical to `array_sort(collect_list(struct(sortCol, x)))` +
    * left fold). A per-group `row_number` over (sortCol) makes the
    * running-sum endpoint well-defined for `max_by` — the tiebreak the
    * plain spelling cannot provide. Same §4/§5 rationale as
    * orderedSumGrouped: sort-based, spillable, codegen, ONE Exchange
    * (both windows share the group partitioning, which the final
    * aggregate then reuses); replaces the last per-doc collect_list
    * ObjectHashAggregates in query paths.
    *
    * PRECONDITION (caller-checked): rows equal on (keys, sortCol) have
    * equal xCol — true when x is a pure function of sortCol, as at every
    * call site. */
  private[graft] def orderedSumGroupedTies(
      df: DataFrame,
      keys: Seq[String],
      sortCol: String,
      xCol: String,
      out: String,
      cnt: Option[String] = None
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wOrd = Window.partitionBy(keys.map(col): _*).orderBy(col(sortCol))
    val wRun = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(sortCol), col("__ost_rn"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val run = df
      .withColumn("__ost_rn", row_number().over(wOrd))
      .withColumn("__ost_run", sum(col(xCol)).over(wRun))
    val aggs = max_by(col("__ost_run"), col("__ost_rn")).as(out) +:
      cnt.map(c => count(lit(1)).as(c)).toSeq
    run.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Deterministic bounded-Lloyd SPHERICAL k-means — round-5 upgrade
    * from sample-as-centroid index quality. Init = the nCells lowest-id
    * vectors (the fixed "seed"); each of `iters` rounds assigns every
    * vector to its max-dot centroid (ties → lowest cell, the same
    * ordering the IVF probe uses), recomputes each cell's per-dim mean
    * with members folded in vec_id order, then L2-NORMALIZES the mean
    * (the corpus is unit-norm, so max-dot assignment is cosine
    * assignment and the spherical update is the consistent Lloyd step —
    * un-normalized means let long centroids swallow cells and recall
    * DROPS below the untrained baseline, measured 0.86 vs 0.9). Empty
    * cells keep their previous centroid; a zero mean stays un-normalized.
    * Every FP step is fixed-order, so the DuckDB oracle replays the
    * trained centroids BIT-FOR-BIT (ExtensionQueries.kmeansCtes is the
    * term-for-term mirror). The driver holds only nCells×dim doubles;
    * each round is one map-side partial-agg pass over the corpus — at
    * 100 TB you train on a sample (pass a `.limit`ed corpus), exactly
    * as FAISS does. Memo'd per (session, corpus, nCells, iters). */
  def kmeansCentroids(corpus: DataFrame, nCells: Int, iters: Int = 1): DataFrame =
    graft.CacheRegistry.memo(
      corpus.sparkSession,
      s"sim:kmeans:$nCells:$iters:${graft.CacheRegistry.planKey(corpus)}"
    ) {
      val spark = corpus.sparkSession
      val vecD = transform(col("embedding"), v => v.cast("double"))
      var cents: Array[Array[Double]] = corpus
        .orderBy("vec_id")
        .limit(nCells)
        .select(vecD.as("e"))
        .collect()
        .map(_.getSeq[Double](0).toArray)
      // an empty corpus trains nothing — and the Lloyd pass below would
      // build array() of ZERO assign entries, an analysis-time error
      for (_ <- 1 to iters if cents.nonEmpty) {
        val entries = cents.zipWithIndex.map { case (ct, c0) =>
          struct((lit(-1.0) * dot(col("embedding"), typedLit(ct.toSeq))).as("nd"), lit(c0).as("c"))
        }
        val assign = array_min(array(entries.toIndexedSeq: _*)).getField("c")
        // Stage the nCells dot-products in their OWN projection below the
        // posexplode: computed alongside the Generate they inline into
        // generate_doConsume, which Janino cannot split past 64 KB at
        // larger nCells (whole-stage codegen then falls back to
        // interpreted for the whole stage). A Project supports
        // splitExpressions, and Generate between the two Projects stops
        // CollapseProject from undoing the staging.
        val rows = orderedSumGrouped(
          corpus
            .select(col("vec_id"), assign.as("c"), vecD.as("__v"))
            .select(col("vec_id"), col("c"), posexplode(col("__v")).as(Seq("d", "x"))),
          Seq("c", "d"),
          "vec_id",
          "x",
          "sx",
          Some("cnt")
        ).collect()
        val next = cents.map(_.clone())
        val touched = Array.fill(cents.length)(false)
        rows.foreach { r =>
          next(r.getInt(0))(r.getInt(1)) = r.getDouble(2) / r.getLong(3)
          touched(r.getInt(0)) = true
        }
        // spherical step: normalize only cells whose mean was recomputed
        for (c0 <- next.indices if touched(c0)) {
          val nrm = math.sqrt(dotLocal(next(c0), next(c0)))
          if (nrm != 0.0) {
            var i = 0
            while (i < next(c0).length) { next(c0)(i) = next(c0)(i) / nrm; i += 1 }
          }
        }
        cents = next
      }
      import spark.implicits._
      cents.zipWithIndex.toSeq
        .map { case (e, c0) => (c0.toLong, e.toSeq) }
        .toDF("cent_id", "cent_emb")
    }

  /** Deterministic power-iteration PCA (round 6): the corpus's top
    * principal component + mean, without ever materializing the d×d
    * covariance — each iteration is ONE distributed pass computing
    * w = Σ_x (x−μ)·⟨x−μ, v⟩ (mathematically C·v up to the 1/n scale,
    * which power iteration is invariant to), then the driver normalizes
    * the d-vector. The embedding-pipeline uses: dominant-direction
    * removal (ABTT/"all-but-the-top"), 1-D curriculum ordering, PCA'd
    * quantization.
    *
    * Every FP step is fixed-order so the DuckDB oracle replays the
    * trained component BIT-FOR-BIT (ExtensionQueries.pcaCtes): the mean
    * and each w fold members deterministically via [[chunkedDimSum]]
    * (vec_id-ordered within 4096-id chunks, chunk-ordered across —
    * measured 2.5–6× over the flat ordered fold, SCALING.md), per-row
    * dots fold dims in index order (graft_dot), the driver's norm folds
    * dims ascending, and init v₀ = 1/√d uniform (exact binary literal
    * at d = 64). Scale: driver holds 2·d doubles; each pass is a
    * map-side projection + (d × chunk)-group aggregate with bounded
    * lists; at 100 TB train on a `.limit`ed sample exactly like
    * [[kmeansCentroids]]. Memo'd per (session, corpus, iters). Returns
    * (mean, component); empty corpus → empty arrays. */
  /** Canonical chunk size for the two-level deterministic sums the
    * trainers use (pcaPower here, Classify.logRegTrain): a FLAT
    * id-ordered fold (collect_list the whole group, sort, reduce) is
    * bit-stable but materializes the corpus per group — measured 18 s /
    * 100k vectors and superlinear beyond. Folding id-ordered WITHIN
    * fixed `id DIV 4096` chunks and then chunk-ordered ACROSS chunk
    * sums is equally canonical (partitioning-independent), keeps every
    * collected list bounded, and spreads level-1 over chunks×d groups.
    * The fold TREE changes, so the paired oracles mirror the same two
    * levels term-for-term. */
  private[extensions] val SumChunk = 4096

  /** Two-level deterministic grouped sum: id-ordered within `id DIV
    * SumChunk` chunks, chunk-ordered across. Input must carry groupCols,
    * id, x; returns groupCols + (sx, cnt). NOTE: right only where
    * per-group lists are corpus-sized (pcaPower, logRegTrain, global
    * means) — for k-means/PQ the cells×dims grouping already bounds the
    * lists and chunking REGRESSES (measured 10.5 s vs 5.6 s at 320k:
    * the multiplied group count tips the hash aggregate into
    * sort-fallback). */
  private[extensions] def chunkedGroupSum(
      rows: DataFrame,
      idC: String,
      groupCols: Seq[String],
      xC: String
  ): DataFrame =
    // inner (data-sized) level through the streaming running-window
    // spelling (round 16) — id unique within a chunk at every caller;
    // the outer fold is over chunk subtotals (tiny) and keeps the
    // list-based spelling
    orderedSumGrouped(
      rows.withColumn("__ch", expr(s"$idC DIV $SumChunk")),
      groupCols :+ "__ch",
      idC,
      xC,
      "__sx",
      Some("__c")
    )
      .groupBy(groupCols.map(col): _*)
      .agg(orderedSum(col("__ch"), col("__sx")).as("sx"), sum(col("__c")).as("cnt"))

  /** [[chunkedGroupSum]] for the common single-dim-key case. */
  private[extensions] def chunkedDimSum(rows: DataFrame, idC: String, dC: String, xC: String): DataFrame =
    chunkedGroupSum(rows, idC, Seq(dC), xC)

  def pcaPower(corpus: DataFrame, iters: Int = 4): (Array[Double], Array[Double]) =
    graft.CacheRegistry.memoStat(
      corpus.sparkSession,
      s"sim:pca:$iters:${graft.CacheRegistry.planKey(corpus)}"
    ) {
      val vecD = transform(col("embedding"), v => v.cast("double"))
      val muRows = chunkedDimSum(
        corpus.select(col("vec_id"), posexplode(vecD).as(Seq("d", "x"))),
        "vec_id",
        "d",
        "x"
      ).collect()
      if (muRows.isEmpty) (Array.empty[Double], Array.empty[Double])
      else {
        val dim = muRows.map(_.getInt(0)).max + 1
        val mu = new Array[Double](dim)
        muRows.foreach(r => mu(r.getInt(0)) = r.getDouble(1) / r.getLong(2))
        var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
        for (_ <- 1 to iters) {
          val centered = zip_with(vecD, typedLit(mu.toSeq), (x, m) => x - m)
          val rows = chunkedDimSum(
            corpus
              // s staged BEFORE the explode: in the same projection the
              // per-vector dot would re-evaluate once per dimension
              .select(
                col("vec_id"),
                dot(centered, typedLit(v.toSeq)).as("s"),
                centered.as("__c")
              )
              .select(col("vec_id"), col("s"), posexplode(col("__c")).as(Seq("d", "cx")))
              .select(col("vec_id"), col("d"), (col("cx") * col("s")).as("xs")),
            "vec_id",
            "d",
            "xs"
          ).collect()
          val w = new Array[Double](dim)
          rows.foreach(r => w(r.getInt(0)) = r.getDouble(1))
          var nrm2 = 0.0
          var i = 0
          while (i < dim) { nrm2 += w(i) * w(i); i += 1 }
          val nrm = math.sqrt(nrm2)
          v = if (nrm == 0.0) w else w.map(_ / nrm)
        }
        (mu, v)
      }
    }

  /** k-center-greedy coreset selection (Sener & Savarese 2018's
    * active-learning rule; Gonzalez 1985's 2-approximation): start from
    * the lowest-id vector, then k−1 times pick the point FARTHEST from
    * its nearest already-picked center — the diversity sampler that
    * covers an embedding space with k exemplars, and the per-pick
    * distance is the coverage-radius curve (non-increasing; 2-approx of
    * the optimal k-center radius).
    *
    * Distributed shape: each round is ONE map-side pass (squared
    * distances to the ≤k selected centers as broadcast literals, min
    * folded via `least`) + a TakeOrdered(1) argmax with a (d² DESC,
    * vec_id ASC) tie-break — never a global sort, never a pair join;
    * driver holds k·d doubles. k passes over the corpus is the
    * textbook trade; at 100 TB you run it over a pre-sampled pool.
    * Deterministic: min/max over distinct doubles is order-insensitive
    * and ties break by id, so the DuckDB oracle replays every pick
    * (ExtensionQueries.kcSql). Returns (pick, vec_id, d2) — d2 NULL for
    * the seed pick. */
  def kcenterGreedy(corpus: DataFrame, k: Int): Array[(Long, Long, Option[Double])] =
    graft.CacheRegistry.memoStat(
      corpus.sparkSession,
      s"sim:kcenter:$k:${graft.CacheRegistry.planKey(corpus)}"
    ) {
      require(k >= 1, "k must be >= 1")
      val vecD = transform(col("embedding"), v => v.cast("double"))
      val firstRows = corpus.orderBy("vec_id").limit(1).select(col("vec_id"), vecD.as("e")).collect()
      if (firstRows.isEmpty) Array.empty[(Long, Long, Option[Double])]
      else {
        val centers = scala.collection.mutable.ArrayBuffer(
          firstRows.head.getLong(0) -> firstRows.head.getSeq[Double](1).toArray
        )
        val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Option[Double])](
          (1L, centers.head._1, None)
        )
        for (t <- 2 to k) {
          val dExprs = centers.map { case (_, c) =>
            val diff = zip_with(vecD, typedLit(c.toSeq), (x, m) => x - m)
            dot(diff, diff)
          }
          val dmin = if (dExprs.size == 1) dExprs.head else least(dExprs.toSeq: _*)
          val picked = corpus
            .select(col("vec_id"), dmin.as("d2"), vecD.as("e"))
            .orderBy(col("d2").desc, col("vec_id").asc)
            .limit(1)
            .collect()
          val r = picked.head
          centers += (r.getLong(0) -> r.getSeq[Double](2).toArray)
          out += ((t.toLong, r.getLong(0), Some(r.getDouble(1))))
        }
        out.toArray
      }
    }

  def ivfIndex(corpus: DataFrame, nCells: Int): DataFrame =
    // memo-persisted per (corpus, nCells) like pqIndex — an IVF index is
    // BUILT once and probed many times; without the barrier every action
    // on a probe replays the corpus×centroid quantization (measured: IVF
    // "probing" slower than brute force at 320k vectors because each run
    // repaid the 20M-dot assignment)
    graft.CacheRegistry.memo(
      corpus.sparkSession,
      s"sim:ivf:$nCells:${graft.CacheRegistry.planKey(corpus)}"
    ) {
      val cents = kmeansCentroids(corpus, nCells)
      val scored = corpus
        .crossJoin(broadcast(cents))
        .select(
          col("vec_id"),
          col("embedding"),
          col("cent_id"),
          dot(col("embedding"), col("cent_emb")).as("csim")
        )
      import org.apache.spark.sql.expressions.Window
      val rk = Window.partitionBy("vec_id").orderBy(col("csim").desc, col("cent_id").asc)
      scored
        .withColumn("rk", row_number().over(rk))
        .where(col("rk") === 1)
        .select(col("vec_id"), col("embedding"), col("cent_id").as("cell"))
    }

  /** Incremental IVF maintenance: assign an ingest batch to the BASE
    * corpus's trained centroids (no retraining — the index-append shape
    * of continuous ingest: a day's embeddings land in an hour, the
    * quarterly retrain stays a separate batch job). Returns base ∪ batch
    * rows as (vec_id, embedding, cell, is_new); base work is index reuse
    * only (memo'd), batch work is batch × nCells dots — at 100 TB the
    * corpus is never rescanned to admit new vectors. Pair with the
    * per-cell drift monitor (x_ann_append) to decide when assignment
    * quality has decayed enough to justify retraining. */
  def ivfAppend(base: DataFrame, batch: DataFrame, nCells: Int): DataFrame = {
    val idxBase = ivfIndex(base, nCells)
    // same DF ⇒ same memo key as ivfIndex's internal trainer call: the
    // centroids are computed once and shared
    val cents = kmeansCentroids(base, nCells)
    import org.apache.spark.sql.expressions.Window
    val rk = Window.partitionBy("vec_id").orderBy(col("csim").desc, col("cent_id").asc)
    val assigned = batch
      .crossJoin(broadcast(cents))
      .select(
        col("vec_id"),
        col("embedding"),
        col("cent_id"),
        dot(col("embedding"), col("cent_emb")).as("csim")
      )
      .withColumn("rk", row_number().over(rk))
      .where(col("rk") === 1)
      .select(col("vec_id"), col("embedding"), col("cent_id").as("cell"))
    idxBase
      .withColumn("is_new", lit(false))
      .unionByName(assigned.withColumn("is_new", lit(true)))
  }

  /** ANN top-k via IVF probing: each query scores only the vectors in its
    * nprobe nearest cells. Approximate — recall measured vs topkBrute in
    * the test suite. */
  def topkIvf(index: DataFrame, queries: DataFrame, k: Int, nCells: Int, nprobe: Int): DataFrame =
    // index rows = corpus rows (+cell), so retraining over them
    // reproduces EXACTLY the centroid set ivfIndex quantized against,
    // for any id distribution (deterministic trainer, memo'd per plan);
    // for a DISK-loaded index pass loadIvfCentroids to skip the retrain
    topkIvfWithCents(
      index,
      kmeansCentroids(index.select(col("vec_id"), col("embedding")), nCells),
      queries,
      k,
      nprobe
    )

  /** IVF probe against EXPLICIT coarse centroids — the no-retrain path a
    * persisted index uses ([[saveIvfIndex]] stores its trained centroids
    * alongside; [[loadIvfCentroids]] brings them back, and probing then
    * touches only the nprobe cells' files with ZERO corpus passes). */
  def topkIvfWithCents(
      index: DataFrame,
      cents: DataFrame,
      queries: DataFrame,
      k: Int,
      nprobe: Int
  ): DataFrame = {
    val qcells = queries
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .crossJoin(broadcast(cents))
      .select(col("q_id"), col("q_emb"), col("cent_id"), dot(col("q_emb"), col("cent_emb")).as("csim"))
    import org.apache.spark.sql.expressions.Window
    val crk = Window.partitionBy("q_id").orderBy(col("csim").desc, col("cent_id").asc)
    val probes = qcells
      .withColumn("crk", row_number().over(crk))
      .where(col("crk") <= nprobe)
      .select(col("q_id"), col("q_emb"), col("cent_id").as("cell"))
    val scored = index
      .join(broadcast(probes), "cell")
      .where(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("nbr_id"), dot(col("q_emb"), col("embedding")).as("sim"))
    val rk = Window.partitionBy("q_id").orderBy(col("sim").desc, col("nbr_id").asc)
    scored
      .withColumn("rk", row_number().over(rk))
      .where(col("rk") <= k)
      .select("q_id", "rk", "nbr_id", "sim")
  }

  /** Persist an IVF index partitioned BY CELL: at 100 TB the index is
    * built once and reused across sessions, and the cell-partitioned
    * layout lets a probe read only its nprobe cells' files — the
    * broadcast probe join on `cell` triggers dynamic partition pruning
    * on the scan (spec-asserted), so I/O scales with cells probed, not
    * corpus size. Pass `nCells` to ALSO persist the trained coarse
    * centroids (tiny) beside the rows, so later sessions probe via
    * [[loadIvfCentroids]] + [[topkIvfWithCents]] with no corpus retrain
    * pass. */
  def saveIvfIndex(index: DataFrame, path: String, nCells: Int = 0): Unit = {
    index.write.mode("overwrite").partitionBy("cell").parquet(path)
    if (nCells > 0)
      kmeansCentroids(index.select(col("vec_id"), col("embedding")), nCells)
        .coalesce(1)
        .write
        .mode("overwrite")
        .parquet(s"$path/_centroids")
  }

  /** Load a saved IVF index for `topkIvf`/`topkIvfLarge` probing (column
    * order restored — partitionBy moves `cell` last on disk). */
  def loadIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path).select(col("vec_id"), col("embedding"), col("cell"))

  /** Load the centroids [[saveIvfIndex]] persisted beside the index. */
  def loadIvfCentroids(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/_centroids").select(col("cent_id"), col("cent_emb"))

  /** Deterministic hyperplane set for sign-LSH over dim-d embeddings:
    * w(p, i) = sin(1 + p·dim + i). No RNG — the planes are a pure
    * function of (nPlanes, dim), so the DuckDB oracle replays them as
    * identical double literals. */
  def hyperplanes(nPlanes: Int, dim: Int): Seq[Seq[Double]] =
    (0 until nPlanes).map(p => (0 until dim).map(i => math.sin((1 + p * dim + i).toDouble)))

  /** Sign-LSH signature: bit p set iff dot(w_p, emb) > 0. */
  def hyperplaneSig(emb: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex
      .map { case (w, p) => when(dot(emb, array(w.map(lit): _*)) > 0, lit(1L << p)).otherwise(lit(0L)) }
      .reduce(_ + _)

  /** Embedding-cosine near-dup pairs, sub-quadratic: sign-LSH banding
    * (any pair agreeing on ≥1 of `bands` signature slices becomes a
    * candidate) + exact-dot verification, so false positives are
    * eliminated and the only approximation is recall on near-threshold
    * pairs (P[bit agree] = 1 − θ/π). Shuffle volume is vectors × bands —
    * the scale alternative to cosinePairs' O(n²) self-join, same contract
    * as minhashLshPairs for text.
    *
    * Parameter tradeoff: band width (nPlanes/bands bits) sets bucket
    * selectivity — a b-bit band has 2^b buckets, so candidate volume per
    * band is Σ_bucket n_b². The oracle-friendly small config (16 planes ×
    * 8 bands = 2-bit keys) is fine at test scale but FAR too coarse for a
    * large corpus; at 100 TB use wide bands (e.g. 64 planes, 4 × 16-bit
    * bands) for genuinely-near-dup thresholds (≥0.9 cosine), and set
    * `maxBucket` — the hot-bucket guard, same role as jaccardPairs'
    * maxDf: a bucket of n vectors contributes n² candidates, and pairs
    * that ONLY collide in an over-dense region of the sphere are below
    * any near-dup threshold anyway. 0 = no cap (oracle mode). */
  def cosineNeardupPairs(
      corpus: DataFrame,
      threshold: Double,
      dim: Int,
      nPlanes: Int = 16,
      bands: Int = 8,
      maxBucket: Long = 0L
  ): DataFrame = {
    require(nPlanes % bands == 0 && nPlanes <= 62, "bands must partition the signature")
    val planes = hyperplanes(nPlanes, dim)
    // spread the corpus first: a small parquet arrives as ONE split, and
    // the broadcast band-join parallelizes by stream-side partition.
    // The signature table is this operator's INDEX — persist-once per
    // (corpus, nPlanes, dim) like the shingle/minhash indexes (both sides
    // of the band self-join and the verify stage read it).
    val sigd = graft.CacheRegistry.memo(
      corpus.sparkSession,
      s"sim:signlsh:$nPlanes:$dim:${graft.CacheRegistry.planKey(corpus)}"
    ) {
      corpus
        .repartition(col("vec_id"))
        .select(col("vec_id"), col("embedding"), hyperplaneSig(col("embedding"), planes).as("sig"))
    }
    val bb = nPlanes / bands
    // embeddings ride through the band shuffle (bands × row-size extra
    // volume) so collision rows verify INLINE: the alternative — id-only
    // candidates + distinct + two fetch joins — shuffles the full
    // candidate set through a distinct and re-joins the corpus twice,
    // three extra stages that dominate when candidates >> survivors.
    // A pair colliding in k bands computes its dot k times; the dedup
    // runs AFTER the threshold filter, when almost nothing is left.
    val banded0 = sigd.select(
      col("vec_id"),
      col("embedding"),
      posexplode(
        array((0 until bands).map(b => pmod(shiftright(col("sig"), b * bb), lit(1L << bb))): _*)
      ).as(Seq("band", "bkey"))
    )
    val banded =
      if (maxBucket <= 0L) banded0
      else {
        val hot = banded0.groupBy("band", "bkey").count().where(col("count") > maxBucket)
          .select("band", "bkey")
        banded0.join(hot, Seq("band", "bkey"), "left_anti")
      }
    banded
      .as("x")
      .join(banded.as("y"), Seq("band", "bkey"))
      .where(col("x.vec_id") < col("y.vec_id"))
      .select(
        col("x.vec_id").as("a_id"),
        col("y.vec_id").as("b_id"),
        dot(col("x.embedding"), col("y.embedding")).as("sim")
      )
      .where(col("sim") >= threshold)
      .distinct()
  }

  /** IVF probing for query sets too large to broadcast: probes meet the
    * index through a SHUFFLE join co-partitioned on `cell` (at 100 TB,
    * cell is also the storage partition key, so the index side arrives
    * pre-partitioned), and per-query top-k uses the bounded-heap
    * Aggregator, so only k pairs per query per partition cross the final
    * shuffle. Centroids stay broadcast — nCells is small by design.
    * Result-identical to topkIvf (same ranking tiebreaks; spec-asserted). */
  def topkIvfLarge(index: DataFrame, queries: DataFrame, k: Int, nCells: Int, nprobe: Int): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._
    val cents = kmeansCentroids(index.select(col("vec_id"), col("embedding")), nCells)
    val qcells = queries
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .crossJoin(broadcast(cents))
      .select(col("q_id"), col("q_emb"), col("cent_id"), dot(col("q_emb"), col("cent_emb")).as("csim"))
    import org.apache.spark.sql.expressions.Window
    val crk = Window.partitionBy("q_id").orderBy(col("csim").desc, col("cent_id").asc)
    val probes = qcells
      .withColumn("crk", row_number().over(crk))
      .where(col("crk") <= nprobe)
      .select(col("q_id"), col("q_emb"), col("cent_id").as("cell"))
    val scored = index
      .repartition(col("cell"))
      .join(probes.repartition(col("cell")), "cell")
      .where(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("nbr_id"), dot(col("q_emb"), col("embedding")).as("sim"))
      .as[(Long, Long, Double)]
    heapRank(scored, k)
  }

  /** Chunked-broadcast IVF probing — the MIDDLE route between the
    * broadcast prober ([[topkIvf]]: ~2.4× cheaper per query, but the
    * probe broadcast grows with the query count and becomes executor-
    * unsafe past `broadcastQueriesMax`) and the co-partitioned shuffle
    * prober ([[topkIvfLarge]]: memory-flat but pays the two-sided cell
    * shuffle + candidate ser/de). Queries split into ⌈n/chunkMax⌉
    * deterministic hash chunks; each chunk runs the broadcast prober
    * UNDER the memory ceiling and its (queries×k)-sized result is
    * localCheckpoint'ed so chunks execute as SEQUENTIAL jobs — exactly
    * one probe broadcast is live at a time (a single union-of-broadcasts
    * plan would hold all C broadcasts on every executor at once, which
    * is the failure mode the ceiling exists to prevent).
    *
    * EAGER operator (each chunk materializes at call time — the pagerank
    * localCheckpoint contract): right for batch serving where the result
    * is consumed immediately; use [[topkIvfLarge]] when the output must
    * stay a lazy plan. Result-identical to [[topkIvf]] on the same
    * queries (chunking partitions q_ids exactly; per-query results are
    * independent). SCALING.md `ivfchunk` measures the per-query cost
    * staying on the broadcast curve from 100k to 1M queries.
    *
    * The ceiling is ENFORCED, not assumed: hash chunking makes chunk
    * sizes Binomial(n, 1/C) — tight for distinct vec_ids, but duplicate
    * or hash-skewed ids can push one chunk past chunkMax. One cheap
    * max-per-chunk aggregate verifies every chunk fits; on overflow the
    * chunk count doubles (two retries), and if a single hot vec_id still
    * exceeds the ceiling the route falls back to the memory-flat
    * [[topkIvfLarge]] prober rather than ever shipping an over-ceiling
    * broadcast. `knownCount` skips the cardinality pass when the caller
    * (the [[topk]] dispatcher) already has the query count memo'd. */
  def topkIvfChunked(
      index: DataFrame,
      queries: DataFrame,
      k: Int,
      nCells: Int,
      nprobe: Int,
      chunkMax: Long = 100000L,
      knownCount: Option[Long] = None
  ): DataFrame = {
    val cents = kmeansCentroids(index.select(col("vec_id"), col("embedding")), nCells)
    val qn = knownCount.getOrElse(queries.count())
    var chunks = math.max(1L, (qn + chunkMax - 1) / chunkMax).toInt
    if (chunks == 1) return topkIvfWithCents(index, cents, queries, k, nprobe)
    // exact ceiling check: max chunk size under the current chunk count
    def maxChunk(c: Int): Long =
      queries
        .groupBy(pmod(xxhash64(col("vec_id")), lit(c)))
        .agg(count(lit(1)).as("n"))
        .agg(max(col("n")))
        .head()
        .getLong(0)
    var tries = 0
    var worst = maxChunk(chunks)
    while (worst > chunkMax && tries < 2) { chunks *= 2; tries += 1; worst = maxChunk(chunks) }
    if (worst > chunkMax)
      return topkIvfLarge(index, queries, k, nCells, nprobe)
    (0 until chunks)
      .map { i =>
        val sub = queries.where(pmod(xxhash64(col("vec_id")), lit(chunks)) === i)
        topkIvfWithCents(index, cents, sub, k, nprobe).localCheckpoint()
      }
      .reduce(_ unionByName _)
  }

  // ------------------------------------------------------------------ PQ
  /** Product-quantization codebooks, TRAINED per subspace (round-5
    * upgrade from sample-as-centroid): the embedding splits into `m`
    * subspaces of dim/m dims; each subspace runs the same deterministic
    * bounded-Lloyd loop as [[kmeansCentroids]] — init = subvectors of
    * the kC lowest-id vectors, assignment by L2 argmin (|c|² − 2·v·c,
    * ties → lowest code, exactly the `pqIndex` assignment rule), means
    * folded in vec_id order, empty codes keep their previous centroid.
    * code_id is the DENSE 0-based rank, so codes are invariant under id
    * offsets, and every FP step is fixed-order so the DuckDB oracle
    * replays the trained books bit-for-bit
    * (ExtensionQueries.pqBooksCtes). Returns (code_id, sub, cent);
    * memo'd per (session, corpus, m, kC, iters). */
  def pqCodebooks(corpus: DataFrame, m: Int, dim: Int, kC: Int, iters: Int = 1): DataFrame = {
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    graft.CacheRegistry.memo(
      corpus.sparkSession,
      s"sim:pqbooks:$m:$dim:$kC:$iters:${graft.CacheRegistry.planKey(corpus)}"
    ) {
      val spark = corpus.sparkSession
      val dm = dim / m
      val initRows = corpus
        .orderBy("vec_id")
        .limit(kC)
        .select(transform(col("embedding"), v => v.cast("double")).as("e"))
        .collect()
        .map(_.getSeq[Double](0).toArray)
      // books(sub)(code) = centroid subvector
      var books: Array[Array[Array[Double]]] =
        Array.tabulate(m)(s => initRows.map(full => full.slice(s * dm, s * dm + dm)))
      // empty-corpus guard mirrors kmeansCentroids: zero init rows would
      // make array() of zero assign entries — an analysis-time error
      for (_ <- 1 to iters if initRows.nonEmpty) {
        // All m×kC literal dot-products are computed in ONE projection
        // straight off the scan — BEFORE any Generate — then exploded as
        // data. Computing them after the (sub, svec) explode inlined the
        // whole assignment into generate_doConsume, which Janino cannot
        // split past 64 KB (whole training stage fell back to interpreted).
        val perSub = array((0 until m).map { s0 =>
          val sv = slice(col("embedding"), s0 * dm + 1, dm)
          val entries = books(s0).zipWithIndex.map { case (ct, c0) =>
            struct(
              (lit(dotLocal(ct, ct)) - lit(2.0) * dot(sv, typedLit(ct.toSeq))).as("dist"),
              lit(c0).as("c")
            )
          }
          struct(
            array_min(array(entries.toIndexedSeq: _*)).getField("c").as("c"),
            transform(sv, v => v.cast("double")).as("svec")
          )
        }: _*)
        val rows = orderedSumGrouped(
          corpus
            .select(col("vec_id"), posexplode(perSub).as(Seq("sub", "e")))
            .select(
              col("vec_id"),
              col("sub"),
              col("e.c").as("c"),
              posexplode(col("e.svec")).as(Seq("d", "x"))
            ),
          Seq("sub", "c", "d"),
          "vec_id",
          "x",
          "sx",
          Some("cnt")
        ).collect()
        val next = books.map(_.map(_.clone()))
        rows.foreach(r => next(r.getInt(0))(r.getInt(1))(r.getInt(2)) = r.getDouble(3) / r.getLong(4))
        books = next
      }
      import spark.implicits._
      // a corpus shorter than kC trains fewer codes — emit what exists
      // (0 until kC would index past books(s0) and throw)
      (for (s0 <- 0 until m; c0 <- books(s0).indices) yield (c0, s0, books(s0)(c0).toSeq))
        .toDF("code_id", "sub", "cent")
    }
  }

  /** PQ assignment: per (vector, subspace) the nearest codebook centroid
    * by L2 (argmin of |c|² − 2·v·c — same ordering, one dot less; both
    * dots run strict left-to-right so the oracle is bit-identical).
    * This is the compressed index: m small ints per vector (m bytes at
    * kC ≤ 256) instead of dim floats — the memory path that lets a
    * 100 TB corpus' candidates live in RAM. Memoized per (corpus, m, kC)
    * like the text/sign-LSH indexes. */
  def pqIndex(corpus: DataFrame, m: Int, dim: Int, kC: Int, iters: Int = 1): DataFrame =
    graft.CacheRegistry.memo(
      corpus.sparkSession,
      s"sim:pq:$m:$dim:$kC:$iters:${graft.CacheRegistry.planKey(corpus)}"
    ) {
      val dm = dim / m
      val books = pqCodebooks(corpus, m, dim, kC, iters)
      val sub = corpus
        .repartition(col("vec_id"))
        .select(
          col("vec_id"),
          posexplode(
            array((0 until m).map(s => slice(col("embedding"), s * dm + 1, dm)): _*)
          ).as(Seq("sub", "svec"))
        )
        .join(broadcast(books), "sub")
        .select(
          col("vec_id"),
          col("sub"),
          col("code_id"),
          (dot(col("cent"), col("cent")) - lit(2.0) * dot(col("svec"), col("cent"))).as("dist")
        )
      import org.apache.spark.sql.expressions.Window
      val rk = Window.partitionBy("vec_id", "sub").orderBy(col("dist").asc, col("code_id").asc)
      sub
        .withColumn("rk", row_number().over(rk))
        .where(col("rk") === 1)
        .select("vec_id", "sub", "code_id")
    }

  /** ANN top-k via PQ asymmetric-distance scoring + exact re-rank: every
    * corpus vector gets an approximate score from its m codes against the
    * query's per-subspace lookup table (contributions folded in SUB ORDER
    * — a fixed-order m-term sum, so the score is bit-identical across
    * engines and runs), the top `k·oversample` shortlist is re-ranked
    * with the exact dot, and the top k emit. Approximation error stays in
    * the shortlist boundary; everything the shortlist contains ranks
    * exactly. Scale: the scoring join is broadcast-LUT map-side work over
    * the compressed index (no corpus-width shuffle); only (q, vec, score)
    * triples move. */
  def topkPq(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      m: Int,
      dim: Int,
      kC: Int,
      oversample: Int = 4,
      iters: Int = 1
  ): DataFrame = {
    val dm = dim / m
    val books = pqCodebooks(corpus, m, dim, kC, iters)
    val codes = pqIndex(corpus, m, dim, kC, iters)
    val lut = queries
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .select(
        col("q_id"),
        posexplode(
          array((0 until m).map(s => slice(col("q_emb"), s * dm + 1, dm)): _*)
        ).as(Seq("sub", "qsub"))
      )
      .join(broadcast(books), "sub")
      .select(col("q_id"), col("sub"), col("code_id"), dot(col("qsub"), col("cent")).as("contrib"))
    val ascore = codes
      .join(broadcast(lut), Seq("sub", "code_id"))
      .where(col("q_id") =!= col("vec_id"))
      .groupBy("q_id", "vec_id")
      .agg(
        aggregate(
          transform(array_sort(collect_list(struct(col("sub"), col("contrib")))), x => x("contrib")),
          lit(0.0),
          (acc, x) => acc + x
        ).as("ascore")
      )
    import org.apache.spark.sql.expressions.Window
    val srk = Window.partitionBy("q_id").orderBy(col("ascore").desc, col("vec_id").asc)
    val short = ascore
      .withColumn("srk", row_number().over(srk))
      .where(col("srk") <= k * oversample)
      .select("q_id", "vec_id")
    val rk = Window.partitionBy("q_id").orderBy(col("sim").desc, col("nbr_id").asc)
    short
      .join(queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb")), "q_id")
      .join(corpus.select(col("vec_id"), col("embedding")), "vec_id")
      .select(col("q_id"), col("vec_id").as("nbr_id"), dot(col("q_emb"), col("embedding")).as("sim"))
      .withColumn("rk", row_number().over(rk))
      .where(col("rk") <= k)
      .select("q_id", "rk", "nbr_id", "sim")
  }

  /** IVF-PQ composite — the standard large-scale ANN index shape (coarse
    * quantizer routes, product codes score): each query probes its nprobe
    * nearest IVF cells, ADC-scores ONLY those cells' members through the
    * PQ lookup table, then exact-re-ranks the shortlist. Scoring work per
    * query drops from corpus-sized (topkPq) to ~corpus·nprobe/nCells, and
    * the scored representation is the m-byte code, not the embedding —
    * the combination that keeps a 100 TB corpus' candidate scan in RAM.
    * Both building blocks are memo-persisted; both approximations
    * (cell routing, code scoring) stay inside the shortlist boundary and
    * the emitted top-k ranks exactly. */
  def topkIvfPq(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      nCells: Int,
      nprobe: Int,
      m: Int,
      dim: Int,
      kC: Int,
      oversample: Int = 4,
      iters: Int = 1
  ): DataFrame = {
    val dm = dim / m
    import org.apache.spark.sql.expressions.Window
    val idx = ivfIndex(corpus, nCells)
    // probe-side quantizer MUST be the build-side one: same trainer, same
    // rows, same params (see ivfCentroids doc for the failure mode)
    val cents = kmeansCentroids(idx.select(col("vec_id"), col("embedding")), nCells)
    val crk = Window.partitionBy("q_id").orderBy(col("csim").desc, col("cent_id").asc)
    val probes = queries
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .crossJoin(broadcast(cents))
      .select(col("q_id"), col("cent_id"), dot(col("q_emb"), col("cent_emb")).as("csim"))
      .withColumn("crk", row_number().over(crk))
      .where(col("crk") <= nprobe)
      .select(col("q_id"), col("cent_id").as("cell"))
    val cand = idx
      .select("vec_id", "cell")
      .join(broadcast(probes), "cell")
      .where(col("q_id") =!= col("vec_id"))
      .select("q_id", "vec_id")
    val books = pqCodebooks(corpus, m, dim, kC, iters)
    val lut = queries
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .select(
        col("q_id"),
        posexplode(
          array((0 until m).map(s => slice(col("q_emb"), s * dm + 1, dm)): _*)
        ).as(Seq("sub", "qsub"))
      )
      .join(broadcast(books), "sub")
      .select(col("q_id"), col("sub"), col("code_id"), dot(col("qsub"), col("cent")).as("contrib"))
    val ascore = pqIndex(corpus, m, dim, kC, iters)
      .join(cand, "vec_id")
      .join(broadcast(lut), Seq("q_id", "sub", "code_id"))
      .groupBy("q_id", "vec_id")
      .agg(
        aggregate(
          transform(array_sort(collect_list(struct(col("sub"), col("contrib")))), x => x("contrib")),
          lit(0.0),
          (acc, x) => acc + x
        ).as("ascore")
      )
    val srk = Window.partitionBy("q_id").orderBy(col("ascore").desc, col("vec_id").asc)
    val short = ascore
      .withColumn("srk", row_number().over(srk))
      .where(col("srk") <= k * oversample)
      .select("q_id", "vec_id")
    val rk = Window.partitionBy("q_id").orderBy(col("sim").desc, col("nbr_id").asc)
    short
      .join(queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb")), "q_id")
      .join(corpus.select(col("vec_id"), col("embedding")), "vec_id")
      .select(col("q_id"), col("vec_id").as("nbr_id"), dot(col("q_emb"), col("embedding")).as("sim"))
      .withColumn("rk", row_number().over(rk))
      .where(col("rk") <= k)
      .select("q_id", "rk", "nbr_id", "sim")
  }

  // ------------------------------------------------ int8 scalar quantization
  /** Symmetric per-vector int8 quantization: scale = max|x| / 127,
    * code_i = floor(x_i / scale + 0.5). Floor-of-shifted is the rounding
    * rule on purpose — both engines define floor identically, so codes
    * replay bit-for-bit in the oracle (`round()` half-cases differ between
    * implementations). 4× smaller than float32 — the compression step a
    * serving index applies before PQ is worth its training cost. Zero
    * vectors keep a null scale and null codes.
    *
    * Output: (vec_id, scale, codes array<int>). Dequantization is
    * code_i · scale; `quantError` reports the per-vector mean absolute
    * reconstruction error. */
  /** Staged (vec_id, embedding, scale, codes) — scale stages as an
    * attribute BEFORE the code lambda references it: HOF lambdas are
    * interpreted (no codegen CSE), so an inlined scale would recompute
    * the array-max once PER ELEMENT — the same staging rule
    * TextOps.shinglesFromTokens documents (measured here: 1.1s → 0.6s
    * for the quantized top-k at sf0.1). */
  private def quantStaged(corpus: DataFrame): DataFrame =
    corpus
      .select(
        col("vec_id"),
        col("embedding"),
        (array_max(transform(col("embedding"), x => abs(x.cast("double")))) / 127.0).as("__s")
      )
      .select(
        col("vec_id"),
        col("embedding"),
        when(col("__s") > 0, col("__s")).as("scale"),
        when(
          col("__s") > 0,
          transform(col("embedding"), x => floor(x.cast("double") / col("__s") + 0.5).cast("int"))
        ).as("codes")
      )

  def quantizeInt8(corpus: DataFrame): DataFrame =
    quantStaged(corpus).select("vec_id", "scale", "codes")

  /** Per-vector mean absolute reconstruction error of the int8 codes,
    * folded in index order (FP parity with the oracle's ordered
    * list_reduce). One projection chain — no self-join. */
  def quantError(corpus: DataFrame): DataFrame =
    quantStaged(corpus)
      .select(
        col("vec_id"),
        col("scale"),
        when(
          col("scale").isNotNull,
          aggregate(
            zip_with(col("codes"), col("embedding"), (c, x) => abs(c * col("scale") - x.cast("double"))),
            lit(0.0),
            (acc, d) => acc + d
          ) / size(col("embedding"))
        ).as("recon_mae")
      )

  /** Brute-force top-k over the QUANTIZED index: similarity is the
    * integer code dot (SIMD-friendly, 4× less memory traffic) rescaled by
    * scale_q·scale_c. Ranking replays exactly in the oracle because every
    * step is integer arithmetic plus one deterministic double multiply.
    * The real-recall contract (quantized ranking ≈ exact ranking) is
    * spec-asserted, not oracle-asserted — quantization error is the
    * operator's documented trade. */
  def topkQuantized(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val qc = quantizeInt8(corpus).where(col("scale").isNotNull)
    val qq = quantizeInt8(queries).where(col("scale").isNotNull)
    val scored = qc
      .repartition(col("vec_id"))
      .as("c")
      .crossJoin(
        broadcast(qq.select(col("vec_id").as("q_id"), col("codes").as("q_codes"), col("scale").as("q_scale")))
      )
      .where(col("q_id") =!= col("c.vec_id"))
      // integer code products sum EXACTLY in doubles (|dot| ≤ 64·127² ≪ 2^53),
      // so the codegen'd ArrayDot over double-cast codes is bit-identical to
      // the long-sum spelling — and ~5× faster than the interpreted
      // zip_with/aggregate HOF pair it replaces
      .select(
        col("q_id"),
        col("c.vec_id").as("nbr_id"),
        (dot(col("q_codes").cast("array<double>"), col("c.codes").cast("array<double>"))
          * col("q_scale") * col("c.scale")).as("sim")
      )
    import org.apache.spark.sql.expressions.Window
    val rk = Window.partitionBy("q_id").orderBy(col("sim").desc, col("nbr_id").asc)
    scored
      .withColumn("rk", row_number().over(rk))
      .where(col("rk") <= k)
      .select("q_id", "rk", "nbr_id", "sim")
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): SEMANTIC dedup — the
    * near-duplicate notion text shingles can't see (paraphrases, template
    * re-renders, translations sharing an embedding). The paper's trick is
    * the scale story: k-means the corpus first, then compare pairs only
    * WITHIN a cluster, turning the O(n²) cosine matrix into Σ_cell n_c² —
    * with balanced cells (profile them via [[ivfIndex]] +
    * `x_cluster_profile`) that is n²/nCells, and nCells grows with the
    * corpus. Removal rule here is deterministic keep-first-by-id: a vector
    * is removed iff some SMALLER-id vector in its cell has cosine ≥
    * `threshold` (the paper keeps the lowest-centroid-distance member per
    * dup group; any fixed tie-break works — this one needs no extra pass).
    *
    * Returns one row per corpus vector: (vec_id, cell, dup_of = smallest
    * such neighbor or NULL, keep). The within-cell pair join shuffles on
    * `cell` only; embeddings never replicate beyond their own cell. */
  def semDedup(corpus: DataFrame, nCells: Int, threshold: Double): DataFrame = {
    val idx = ivfIndex(corpus, nCells)
    val a = idx.select(col("cell"), col("vec_id").as("a_id"), col("embedding").as("a_emb"))
    val b = idx.select(col("cell"), col("vec_id").as("b_id"), col("embedding").as("b_emb"))
    val dupOf = a
      .join(b, "cell")
      .where(col("a_id") < col("b_id") && dot(col("a_emb"), col("b_emb")) >= threshold)
      .groupBy("b_id")
      .agg(min(col("a_id")).as("dup_of"))
      .withColumnRenamed("b_id", "vec_id")
    idx
      .select(col("vec_id"), col("cell"))
      .join(dupOf, Seq("vec_id"), "left")
      .withColumn("keep", col("dup_of").isNull)
  }

  // ------------------------------------------------- cost-based front door
  /** Session conf keys for the automatic ANN dispatch (see [[topk]]). */
  val AutoKey = "spark.graft.ann.auto" // default true; false pins brute
  val BruteMaxKey = "spark.graft.ann.bruteMax" // default 100000
  val IvfPqMinKey = "spark.graft.ann.ivfPqMin" // default 1000000
  /** Query-count ceiling for the broadcast-probe spelling: above it the
    * IVF route shuffles probes against the cell-partitioned index
    * ([[topkIvfLarge]]) instead of broadcasting queries×nprobe rows.
    * The default is a MEMORY guardrail, not a latency crossover —
    * SCALING.md's round-8 `ivflarge` curve measures broadcast ~2.4×
    * cheaper per query at every size it can run (the co-partition route
    * pays the two-sided cell shuffle + candidate ser/de), but at 100k
    * queries the probe broadcast is already ~130 MB shipped to EVERY
    * executor; past it the broadcast becomes driver/executor-unsafe long
    * before it becomes slow, while the co-partitioned route completes
    * the 1M-query point (5G candidates) in one shuffle-bound pass. */
  val BroadcastQueriesMaxKey = "spark.graft.ann.broadcastQueriesMax" // default 100000
  /** Route above the broadcast ceiling (round 9): true (default) →
    * [[topkIvfChunked]] — sequential broadcast chunks, ~3× cheaper per
    * query than the co-partitioned shuffle at every measured size
    * (SCALING.md `ivfchunk`: 100 s vs 296 s at 300k queries) but EAGER
    * (chunks materialize at call time) and wall-clock-linear in chunk
    * count; false → [[topkIvfLarge]] — one lazy shuffle-bound pass, the
    * right shape when the result must stay a plan (streaming joins,
    * further pushdown) or when a real cluster's scan cost makes
    * C index scans dearer than one co-partition shuffle. */
  val ChunkedBroadcastKey = "spark.graft.ann.chunkedBroadcast" // default true
  /** Written after every [[topk]] call: which plan the dispatch chose —
    * observable by monitoring/specs without re-deriving the decision. */
  val ChoiceKey = "spark.graft.ann.lastChoice"

  /** PQ subspace count for a dimension (must divide dim); 0 = PQ not
    * applicable, fall back to plain IVF. */
  private[graft] def pqSubspaces(dim: Int): Int =
    if (dim % 16 == 0) 16 else if (dim % 8 == 0) 8 else if (dim % 4 == 0) 4 else 0

  /** The pure dispatch rule, split out for direct spec coverage. Derived
    * from SCALING.md's measured curves: brute force stays flat to ~100k
    * vectors (parallel scan slack hides the linear cost — 0.82→1.39 s
    * across 20k→320k, vs an index build that only amortizes when reused),
    * the IVF probe is corpus-size-independent at fixed nprobe/nCells, and
    * past ~1M vectors the scored representation itself must shrink —
    * IVF-PQ's m-byte codes. recallTarget = 1.0 demands EXACT results:
    * always brute, regardless of size. */
  private[graft] def annPlan(n: Long, dim: Int, recallTarget: Double, bruteMax: Long, ivfPqMin: Long): String =
    if (recallTarget >= 1.0 || n <= bruteMax) "brute"
    else if (n <= ivfPqMin || pqSubspaces(dim) == 0) "ivf"
    else "ivfpq"

  /** IVF geometry from corpus size + recall target: nCells ~ √n (the
    * standard inverted-file sizing — cell population ≈ √n keeps probe
    * and routing balanced), nprobe as the cell fraction that met the
    * spec-asserted recall floors on the fixture corpora (nprobe/nCells =
    * 1/4 ↔ recall ≥ 0.9; 3/8 ↔ ≥ 0.95; 1/8 for relaxed targets). */
  private[graft] def ivfParams(n: Long, recallTarget: Double): (Int, Int) = {
    val nCells = math.max(16L, math.min(4096L, math.round(math.sqrt(n.toDouble)))).toInt
    val frac = if (recallTarget >= 0.95) 0.375 else if (recallTarget >= 0.9) 0.25 else 0.125
    (nCells, math.max(1, math.round(nCells * frac).toInt))
  }

  /** Memo'd cardinality/dimension probe — one eager aggregate per
    * (session, corpus plan), reused by every later dispatch on the same
    * corpus (the Halo.auto pattern). */
  private def corpusStats(corpus: DataFrame): (Long, Int) = {
    val boxed = graft.CacheRegistry.memoStat(
      corpus.sparkSession,
      s"ann:stats:${graft.CacheRegistry.planKey(corpus)}"
    ) {
      val r = corpus.agg(count(lit(1)), max(size(col("embedding")))).head()
      (Long.box(r.getLong(0)), Int.box(if (r.isNullAt(1)) 0 else r.getInt(1)))
    }
    (boxed._1.longValue(), boxed._2.intValue())
  }

  /** Cost-based ANN FRONT DOOR — closes the round-6 usability gap where
    * a user had to pick brute/IVF/PQ/IVF-PQ by hand from SCALING.md's
    * crossover tables. Dispatches on the memo'd corpus cardinality:
    *
    *   - n ≤ bruteMax (default 100k) or recallTarget = 1.0 → exact
    *     brute scan ([[topkBrute]]);
    *   - n ≤ ivfPqMin (default 1M) → trained-IVF probe over the memo'd
    *     index ([[topkIvf]]), geometry from [[ivfParams]];
    *   - beyond → IVF-PQ ([[topkIvfPq]]), PQ subspaces from the probed
    *     dimension, oversample widened with the recall target.
    *
    * Results are always (q_id, rk, nbr_id, sim) with EXACT sims on the
    * emitted rows (every routed path exact-re-ranks its shortlist), so
    * switching route changes only which neighbors the shortlist may
    * miss, bounded by the spec-asserted recall floors. The chosen plan
    * lands in [[ChoiceKey]]; `spark.graft.ann.auto=false` pins brute.
    * Dispatch overhead is the one memo'd count+dim aggregate —
    * SCALING.md measures it.
    *
    * EAGERNESS CAVEAT: every route returns a lazy plan EXCEPT
    * `ivf_chunked` (IVF corpus + queries above `broadcastQueriesMax`,
    * the default for that regime) — [[topkIvfChunked]] counts and
    * localCheckpoints chunk results at CALL time, because sequential
    * materialization is what keeps exactly one probe broadcast live.
    * Callers that need `topk` to stay a lazy plan in that regime should
    * pin `spark.graft.ann.chunkedBroadcast=false`, which routes to the
    * memory-flat (and lazy) [[topkIvfLarge]] instead. */
  def topk(corpus: DataFrame, queries: DataFrame, k: Int, recallTarget: Double = 0.9): DataFrame = {
    val spark = corpus.sparkSession
    if (!spark.conf.get(AutoKey, "true").toBoolean) {
      spark.conf.set(ChoiceKey, "brute(pinned)")
      return topkBrute(corpus, queries, k)
    }
    val bruteMax = spark.conf.get(BruteMaxKey, "100000").toLong
    val ivfPqMin = spark.conf.get(IvfPqMinKey, "1000000").toLong
    val qMax = spark.conf.get(BroadcastQueriesMaxKey, "100000").toLong
    val (n, dim) = corpusStats(corpus)
    val choice0 = annPlan(n, dim, recallTarget, bruteMax, ivfPqMin)
    // query-side scale: the broadcast-probe IVF spelling ships
    // queries×nprobe rows to every task — above the ceiling, switch to
    // the shuffle-co-partitioned prober (one memo'd count on the query
    // frame, only paid when the corpus route is IVF)
    val chunked = spark.conf.get(ChunkedBroadcastKey, "true").toBoolean
    val choice =
      if (choice0 == "ivf" && corpusStats(queries)._1 > qMax)
        (if (chunked) "ivf_chunked" else "ivf_large")
      else choice0
    spark.conf.set(ChoiceKey, choice)
    choice match {
      case "brute" => topkBrute(corpus, queries, k)
      case "ivf" =>
        val (nCells, nprobe) = ivfParams(n, recallTarget)
        topkIvf(ivfIndex(corpus, nCells), queries, k, nCells, nprobe)
      case "ivf_chunked" =>
        val (nCells, nprobe) = ivfParams(n, recallTarget)
        topkIvfChunked(
          ivfIndex(corpus, nCells), queries, k, nCells, nprobe,
          chunkMax = qMax, knownCount = Some(corpusStats(queries)._1))
      case "ivf_large" =>
        val (nCells, nprobe) = ivfParams(n, recallTarget)
        topkIvfLarge(ivfIndex(corpus, nCells), queries, k, nCells, nprobe)
      case _ =>
        val (nCells, nprobe) = ivfParams(n, recallTarget)
        topkIvfPq(
          corpus,
          queries,
          k,
          nCells,
          nprobe,
          m = pqSubspaces(dim),
          dim = dim,
          kC = 32,
          oversample = if (recallTarget >= 0.9) 8 else 4
        )
    }
  }
}
