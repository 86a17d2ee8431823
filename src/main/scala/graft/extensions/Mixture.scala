package graft.extensions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.CacheRegistry

/** Data-mixture balancing (SURVEY §2.F): given a target per-source token
  * distribution, compute the per-source keep fractions a sampler needs —
  * the "data mixing" stage that turns a raw crawl into a recipe-weighted
  * training corpus.
  *
  * Semantics: the LARGEST corpus achievable at the target mixture without
  * upsampling any source. The binding source is the one with the smallest
  * tokens_s / target_s ratio; `scale = min_s tokens_s / target_s` is the
  * total token budget, each source contributes `take_s = scale · target_s`,
  * and `keep_frac_s = take_s / tokens_s` (the binding source keeps 1.0).
  * A pipeline pairs `keep_frac` with the deterministic content-hash
  * sampler (`x_strat_sample`'s bucket rule) so the selection stays
  * reproducible and append-stable.
  *
  * Scale: one partial-agg pass over the corpus (map-side combine), a
  * 1-row global min, broadcast back over the per-source rows — no
  * corpus-sized shuffle beyond the source aggregate.
  */
object Mixture {

  /** Per-source mixture weights.
    *
    * @param docs       corpus with a `source` column
    * @param tokenCount per-row token count expression
    * @param targetFrac per-source target fraction expression (must be
    *                   positive; evaluated against the aggregated row, so
    *                   it may reference `source` only)
    */
  def mixtureWeights(docs: DataFrame, tokenCount: Column, targetFrac: Column): DataFrame = {
    val per = docs
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(tokenCount).cast("double").as("n_tokens"))
      // enforce the documented positivity contract in-plan: a zero/negative
      // target would otherwise flow through as a silent null/negative
      // keep_frac for EVERY source (the global min picks it up)
      .withColumn(
        "target_frac",
        when(
          targetFrac > 0.0,
          targetFrac
        ).otherwise(raise_error(concat(lit("mixtureWeights: target_frac must be > 0 for source "), col("source"))))
      )
    val scale = per.agg(min(col("n_tokens") / col("target_frac")).as("__scale"))
    per
      .crossJoin(broadcast(scale))
      .select(
        col("source"),
        col("n_docs"),
        col("n_tokens"),
        col("target_frac"),
        (col("__scale") * col("target_frac")).as("take_tokens"),
        (col("__scale") * col("target_frac") / col("n_tokens")).as("keep_frac")
      )
  }

  /** DSIR importance weights (Xie et al. 2023, arXiv:2302.03169, "Data
    * Selection for Language Models via Importance Resampling"): score every
    * raw document by how much more likely its hashed n-gram features are
    * under a TARGET domain (e.g. "docs that look like wikipedia") than
    * under the raw pool — the log importance weight
    * `Σ_feat (ln p_target[bucket] − ln p_raw[bucket])` over unigram +
    * bigram features hashed into `nBuckets`, with add-`alpha` smoothing on
    * both bucket distributions. Selection then keeps the top-weight docs
    * (threshold or resample) — the paper's replacement for heuristic
    * quality rules.
    *
    * Scale: feature extraction is map-side (tokens ++ bigrams, hashed mod
    * nBuckets); BOTH bucket histograms come out of ONE hash-aggregate over
    * the exploded features (target counts via conditional sum — no second
    * corpus pass); the bucket→log-ratio table is ≤ nBuckets rows, tiny, so
    * the per-doc scoring join is a broadcast — shuffle is the feature
    * explode plus one doc_id aggregate, linear in corpus size. The
    * exploded feature frame feeds the histogram AND the scoring join, so
    * it is memo-persisted (same rationale as the dedup indexes).
    *
    * Per-doc sums fold in feature-position order (FP-parity contract with
    * the DuckDB oracle). Docs with zero tokens surface with n_feat = 0 and
    * a NULL weight.
    *
    * @param isTarget row-level predicate over `docs` columns marking the
    *                 target-domain exemplars (they stay in the raw pool —
    *                 DSIR contrasts target vs ALL, not target vs rest)
    */
  def dsirWeights(
      docs: DataFrame,
      isTarget: Column,
      nBuckets: Int = 1024,
      alpha: Double = 1.0
  ): DataFrame = {
    require(nBuckets > 0 && alpha > 0.0, "need nBuckets > 0 and alpha > 0")
    val base = docs.select(col("doc_id"), isTarget.as("is_target"), col("text"))
    val feats = CacheRegistry.memo(
      docs.sparkSession,
      s"mixture:dsir:$nBuckets:${CacheRegistry.planKey(base)}"
    ) {
      base
        .select(col("doc_id"), col("is_target"), TextOps.tokens(col("text")).as("__tk"))
        .select(
          col("doc_id"),
          col("is_target"),
          concat(col("__tk"), TextOps.shinglesFromTokens(col("__tk"), 2)).as("__fs")
        )
        .select(col("doc_id"), col("is_target"), posexplode(col("__fs")).as(Seq("pos", "f")))
        .select(col("doc_id"), col("is_target"), col("pos"), pmod(TextOps.polyHash(col("f")), lit(nBuckets.toLong)).as("b"))
    }
    val counts = feats
      .groupBy("b")
      .agg(
        count(lit(1)).as("raw_n"),
        sum(when(col("is_target"), 1L).otherwise(0L)).as("tgt_n")
      )
    val tot = counts.agg(sum(col("raw_n")).as("raw_t"), sum(col("tgt_n")).as("tgt_t"))
    val lr = counts
      .crossJoin(broadcast(tot))
      .select(
        col("b"),
        (log((col("tgt_n") + alpha) / (col("tgt_t") + alpha * nBuckets)) -
          log((col("raw_n") + alpha) / (col("raw_t") + alpha * nBuckets))).as("lr")
      )
    val perDoc = feats
      .join(broadcast(lr), "b")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_feat"),
        aggregate(
          array_sort(collect_list(struct(col("pos"), col("lr")))),
          lit(0.0),
          (acc, x) => acc + x.getField("lr")
        ).as("logw")
      )
    base
      .select(col("doc_id"), col("is_target"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("is_target"),
        coalesce(col("n_feat"), lit(0L)).as("n_feat"),
        col("logw")
      )
  }

  /** Temperature-smoothed source sampling (round 6): the multilingual
    * sampling rule (XLM-R / mBERT): q_s ∝ p_s^α with α < 1 flattens the
    * source distribution so low-resource sources are upsampled —
    * `sample_factor = q_s / p_s` is what a sampler multiplies each
    * source's natural rate by. α = 1 is proportional sampling; α = 0 is
    * uniform. One partial-agg pass per corpus; the normalizer folds
    * sources in name order (FP-parity with the oracle); everything after
    * the aggregate is a broadcast-sized frame. */
  def temperatureMixture(docs: DataFrame, tokenCount: Column, alpha: Double): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, "alpha must be in [0, 1]")
    val per = docs
      .groupBy("source")
      .agg(sum(tokenCount).cast("double").as("n_tokens"))
    val tot = broadcast(per.agg(sum(col("n_tokens")).as("__total")))
    val p = per.crossJoin(tot).withColumn("p", col("n_tokens") / col("__total"))
    val z = broadcast(
      p.agg(
        aggregate(
          transform(array_sort(collect_list(struct(col("source"), pow(col("p"), alpha).as("pa")))), s => s("pa")),
          lit(0.0),
          (a, v) => a + v
        ).as("__z")
      )
    )
    p.crossJoin(z)
      .withColumn("q", pow(col("p"), alpha) / col("__z"))
      .withColumn("sample_factor", col("q") / col("p"))
      .select(col("source"), col("n_tokens"), col("p"), col("q"), col("sample_factor"))
  }

  /** Per-source token-share cap (round 6): no single source may exceed
    * `capFrac` of the corpus's total tokens — the "one crawl dump must not
    * dominate the mixture" guard that runs BEFORE recipe weighting. Docs
    * are admitted per source in a deterministic content-stable order
    * (polyHash(text), doc_id) until the source's RUNNING token total would
    * exceed the cap; every doc gets a keep/cut verdict plus its position
    * in the source's admission order, so the cut is auditable and
    * reproducible — re-running on the same corpus, or on a repartitioned
    * copy, selects the identical set (no RNG anywhere).
    *
    * Scale: the total-token scalar is a broadcast 1-row aggregate; the
    * only shuffle is ONE hash partition by `source` for the running-sum
    * window — sources pack independently, so a 100 TB corpus caps with
    * source-parallelism. A pathologically hot single source is the
    * window-skew case: split it by hashing docs into k sub-windows, cap
    * each at capTokens/k (the admission order stays deterministic). */
  def sourceCap(docs: DataFrame, tokenCount: Column, capFrac: Double): DataFrame = {
    require(capFrac > 0.0 && capFrac <= 1.0, "capFrac must be in (0, 1]")
    import org.apache.spark.sql.expressions.Window
    // Lazy localCheckpoint at the branch point (round 17, guide §5/§2.4):
    // `base` feeds both the total-token aggregate and the admission
    // window; without it the whole upstream (tokenize + hash + whatever
    // produced `docs` — in x_pipeline2 the dedup/score/gate chain)
    // executes once per branch. Narrow columns only — text is not
    // carried. Materializes at the consumer's first action.
    val base = docs.select(
      col("doc_id"),
      col("source"),
      tokenCount.cast("long").as("n_tok"),
      TextOps.polyHash(col("text")).as("__h")
    ).localCheckpoint(false)
    val tot = broadcast(base.agg(sum(col("n_tok")).cast("double").as("__total")))
    val w = Window.partitionBy("source").orderBy(col("__h").asc, col("doc_id").asc)
    base
      .crossJoin(tot)
      .withColumn("admit_rank", row_number().over(w).cast("long"))
      .withColumn(
        "cum_tok",
        sum(col("n_tok")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      )
      // explicit floor: Spark's double→long CAST truncates while DuckDB's
      // rounds-to-nearest — floor() is the one spelling both agree on
      .withColumn("cap_tok", floor(col("__total") * capFrac).cast("long"))
      .withColumn("keep", col("cum_tok") <= col("cap_tok"))
      .select(col("doc_id"), col("source"), col("n_tok"), col("admit_rank"), col("cum_tok"), col("cap_tok"), col("keep"))
  }

  /** Population Stability Index of each source's `metric` distribution
    * against the whole corpus — the standard drift / mixture-shift score
    * (PSI < 0.1 stable, 0.1–0.25 moderate, > 0.25 shifted). Buckets are
    * the corpus-wide deciles (exact interpolated percentiles — the same
    * Spark `percentile` ≡ DuckDB `quantile_cont` identity x_robust_length
    * relies on); shares are Laplace-smoothed (+0.5 per bucket) so an
    * empty source-bucket cannot produce ±∞.
    *
    * Scale: the decile row is a 1-row aggregate cross-broadcast onto the
    * scan, bucket assignment is map-side, and everything after the one
    * (source, bucket) hash-aggregate is key-sized — no corpus-width
    * shuffle, no row explosion. */
  def psiBySource(docs: DataFrame, metric: Column): DataFrame = {
    val d = docs.select(col("source"), metric.as("__m"))
    val edgeAggs = (1 to 9).map(i => percentile(col("__m"), lit(i / 10.0)).as(s"__e$i"))
    val edges = broadcast(d.agg(edgeAggs.head, edgeAggs.tail: _*))
    val bucket = (1 to 9)
      .map(i => when(col("__m") > col(s"__e$i"), 1).otherwise(0))
      .reduce(_ + _)
    val withB = d.crossJoin(edges).select(col("source"), bucket.as("bucket"))
    val sb = withB.groupBy("source", "bucket").agg(count(lit(1)).as("c_sb"))
    val gb = withB.groupBy("bucket").agg(count(lit(1)).as("c_b"))
    val st = sb.groupBy("source").agg(sum("c_sb").as("n_docs"))
    val gt = broadcast(gb.agg(sum("c_b").as("n_tot")))
    val grid = st.crossJoin(broadcast(gb.sparkSession.range(10).select(col("id").cast("int").as("bucket"))))
    val p = (col("c_sb") + lit(0.5)) / (col("n_docs") + lit(5.0))
    val q = (col("c_b") + lit(0.5)) / (col("n_tot") + lit(5.0))
    grid
      .join(sb, Seq("source", "bucket"), "left")
      .na.fill(0L, Seq("c_sb"))
      .join(broadcast(gb), Seq("bucket"))
      .crossJoin(gt)
      .groupBy("source", "n_docs")
      .agg(sum((p - q) * log(p / q)).as("psi"))
      .select(col("source"), col("n_docs"), col("psi"))
  }
}
