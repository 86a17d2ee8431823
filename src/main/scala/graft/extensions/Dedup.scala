package graft.extensions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.CacheRegistry

/** Deduplication operators (SURVEY.md §2.F) over a corpus
  * `(doc_id BIGINT, text STRING, …)`.
  *
  * Scale design (the 100 TB story):
  *  - exact dedup: one hash-aggregate on sha2(text) — map-side partial
  *    aggregation, no row data shuffled beyond (hash, id) pairs.
  *  - exact Jaccard pairs: inverted-index self-join on shingles. Any pair
  *    with Jaccard > 0 shares ≥ 1 shingle, so the index finds every
  *    candidate (recall 1 by construction, unlike LSH). Shuffle volume is
  *    Σ_doc |shingles|, and `maxDf` caps hot shingles (a shingle occurring
  *    in d docs contributes d² candidate rows — frequency capping is the
  *    standard skew guard; at 100 TB pair it with AQE skew-join handling).
  *  - MinHash-LSH: signature → bands → hash-bucket join. Shuffle volume is
  *    docs × bands (constant per doc, independent of doc length) — the
  *    sub-quadratic path when shingle-overlap candidates explode.
  */
object Dedup {

  /** The ONE place the default LSH banding lives (ADVICE r15: ScalePath's
    * banded-expectation derivation hardcoded 8/2 separately, so a change
    * to these defaults would silently diverge the expectation from what
    * lshCandidates/minhashLshPairs actually run). bands × rowsPerBand
    * must cover TextOps.minhashParams.size — the require() in each
    * entry point enforces it. */
  val DefaultBands = 8
  val DefaultRowsPerBand = 2

  /** Hash-spread the corpus before superlinear pair work. A single parquet
    * file scans as ONE partition, serializing every interpreted HOF
    * (tokenize/shingle/hash) and both sides of the self-joins; the shuffle
    * is O(corpus) — always worth it when the downstream is O(pairs). At
    * 100 TB the input arrives pre-split, but the explicit spread also
    * decouples compute parallelism from file layout. */
  /** Spread the CPU-bound index computation (tokenize/shingle/hash per
    * doc) — and the candidate self-joins that read the CACHED result
    * map-side — over the cluster's compute parallelism. The explicit
    * numPartitions matters (round 17): a bare `repartition(col)` is a
    * REPARTITION_BY_COL shuffle that AQE's byte-targeted coalescing may
    * fold to 1 partition once cached plans are re-optimizable
    * (canChangeCachedPlanOutputPartitioning), and every pair join over
    * the index — whose cost is per-CANDIDATE CPU (set intersection,
    * Levenshtein), not per byte — then serializes onto one core
    * (measured: x_containment_pairs 0.57 → 2.82 s, x_neardup_jaccard
    * 0.50 → 1.87, caught by the new second-probe machinery). An
    * explicit count is a REPARTITION_BY_NUM shuffle, which AQE never
    * coalesces. The count follows the session's defaultParallelism —
    * cluster-sized at any scale, not a local constant. */
  private def spread(docs: DataFrame): DataFrame =
    docs.repartition(docs.sparkSession.sparkContext.defaultParallelism, col("doc_id"))

  /** Exact duplicate groups: one row per distinct text with > minGroup
    * occurrences; keeper = min doc_id (deterministic). */
  def exactGroups(docs: DataFrame, minGroup: Long = 1L): DataFrame =
    docs
      .groupBy(sha2(col("text"), 256).as("text_hash"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_dups"))
      .where(col("n_dups") >= minGroup)

  /** Corpus with exact duplicates removed (keep lowest doc_id per text). */
  def dropExactDups(docs: DataFrame): DataFrame = {
    val keep = exactGroups(docs).select(col("keep_id").as("doc_id"))
    docs.join(keep, "doc_id")
  }

  /** Per-doc distinct k-shingle sets. Two projections on purpose: tokens
    * materialize first so the shingle HOF lambda reads a plain attribute
    * (CollapseProject keeps the split un-inlined — see TextOps note).
    *
    * Persisted (via CacheRegistry.memo, so jaccardPairs and the LSH
    * verification stage share ONE handle per (corpus, k) and
    * CacheRegistry.release drops it): this is the dedup index — both
    * sides of every candidate self-join consume it, and a cache barrier
    * also stops PushDownPredicates from re-inlining the tokenize+shingle
    * pipeline into pushed filters (that rule has no cost model; an
    * inlined predicate re-runs the HOFs per reference). Size is
    * O(docs · shingles), a few MB per million docs — cheap to keep even
    * at 100 TB corpus scale. */
  private def shingled(docs: DataFrame, k: Int): DataFrame =
    CacheRegistry.memo(docs.sparkSession, s"dedup:shingle:$k:${CacheRegistry.planKey(docs)}") {
      spread(docs)
        .select(col("doc_id"), TextOps.tokens(col("text")).as("__tk"))
        .select(col("doc_id"), TextOps.shingleSetFromTokens(col("__tk"), k).as("sh"))
    }

  /** Exact shingle-Jaccard near-dup pairs via inverted-index join.
    *
    * @param maxDf drop shingles occurring in more than maxDf docs (hot-key
    *              guard; pairs sharing ONLY ultra-common shingles are below
    *              any useful threshold anyway). 0 = no cap (oracle mode —
    *              exact equality with a brute-force cross join).
    */
  def jaccardPairs(docs: DataFrame, threshold: Double, k: Int = 3, maxDf: Long = 0L): DataFrame = {
    // One shingle computation per doc: stage the set, carry its size
    // through the explode so no extra size-join is needed.
    val inv0 = shingled(docs, k)
      .select(col("doc_id"), size(col("sh")).as("n_sh"), explode(col("sh")).as("s"))
    val inv =
      if (maxDf <= 0L) inv0
      else {
        val hot = inv0.groupBy("s").count().where(col("count") > maxDf).select("s")
        inv0.join(hot, Seq("s"), "left_anti")
      }
    inv
      .as("x")
      .join(inv.as("y"), "s")
      .where(col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .agg(count(lit(1)).as("n_inter"), max(col("x.n_sh")).as("n_a"), max(col("y.n_sh")).as("n_b"))
      .withColumn("jac", col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")))
      .where(col("jac") >= threshold)
      .select("a_id", "b_id", "jac")
  }

  /** Edit-distance-VERIFIED near-dup pairs (round 6): generate candidates
    * with the shingle-Jaccard inverted index (cheap, set-based, order-
    * blind), then verify each candidate with true Levenshtein on the raw
    * texts — the two-stage CDC/fuzzy-dedup shape, because Jaccard cannot
    * distinguish a reshuffled bag of words from a genuine small edit.
    * `edit_sim = 1 − lev / max(len_a, len_b)` in characters. Both engines
    * run codegen'd classic Levenshtein (Spark `levenshtein`, DuckDB
    * `levenshtein`) — integer-exact, no FP contract needed beyond the
    * final ratio. Scale: Levenshtein is O(len²) per pair, so it runs ONLY
    * on the banded candidate set (corpus-linear under the df-capped
    * index), never all pairs; the text join back is two hash joins on
    * doc_id. */
  def editDistPairs(
      docs: DataFrame,
      candJac: Double = 0.3,
      simThreshold: Double = 0.6,
      k: Int = 3,
      maxDf: Long = 0L
  ): DataFrame = {
    val cands = jaccardPairs(docs, candJac, k, maxDf)
    val txt = docs.select(col("doc_id"), col("text"))
    cands
      .join(txt.select(col("doc_id").as("a_id"), col("text").as("__ta")), "a_id")
      .join(txt.select(col("doc_id").as("b_id"), col("text").as("__tb")), "b_id")
      .withColumn("lev", levenshtein(col("__ta"), col("__tb")).cast("long"))
      .withColumn(
        "edit_sim",
        lit(1.0) - col("lev").cast("double") /
          greatest(length(col("__ta")), length(col("__tb"))).cast("double")
      )
      .where(col("edit_sim") >= simThreshold)
      .select(col("a_id"), col("b_id"), col("jac"), col("lev"), col("edit_sim"))
  }

  /** Directed shingle-CONTAINMENT pairs: C(a→b) = |Sₐ ∩ S_b| / |Sₐ| ≥
    * threshold, a ≠ b. Containment is the asymmetric cousin of Jaccard —
    * it detects quotes, excerpts, and supersets (a short doc fully
    * embedded in a long one scores C(short→long) ≈ 1 while its Jaccard is
    * tiny), which is what inclusion-dedup of a scraped corpus needs.
    * Same inverted-index join as [[jaccardPairs]] (any pair with
    * C ≥ threshold > 0 shares a shingle, so the index generates it); both
    * directions emit because C is directional.
    *
    * @param maxDf hot-shingle cap, same semantics/bias note as
    *              [[jaccardPairs]]; 0 = exact oracle mode. */
  def containmentPairs(docs: DataFrame, threshold: Double, k: Int = 3, maxDf: Long = 0L): DataFrame = {
    val inv0 = shingled(docs, k)
      .select(col("doc_id"), size(col("sh")).as("n_sh"), explode(col("sh")).as("s"))
    val inv =
      if (maxDf <= 0L) inv0
      else {
        val hot = inv0.groupBy("s").count().where(col("count") > maxDf).select("s")
        inv0.join(hot, Seq("s"), "left_anti")
      }
    inv
      .as("x")
      .join(inv.as("y"), "s")
      .where(col("x.doc_id") =!= col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .agg(count(lit(1)).as("n_inter"), max(col("x.n_sh")).as("n_a"))
      .withColumn("cont", col("n_inter").cast("double") / col("n_a"))
      .where(col("cont") >= threshold)
      .select("a_id", "b_id", "cont")
  }

  /** C4-style boilerplate scoring: a doc's fraction of distinct k-shingles
    * that are "hot" (document frequency ≥ minDf — navboxes, footers,
    * licence blurbs repeat verbatim across a crawl). Returns
    * (doc_id, n_sh, n_hot, frac); a curation pipeline thresholds `frac`
    * to drop template-dominated pages, the way C4 drops repeated lines.
    *
    * Scale: df is ONE key-sized aggregate over the shared shingle index
    * (no pair join anywhere), and the df table joins back shingle-keyed —
    * work is O(Σ shingles), same as the index build. When minDf keeps the
    * hot set small (the common case), materialize it and broadcast-anti-
    * join instead; here the general join covers any minDf. */
  def boilerplateStats(docs: DataFrame, minDf: Long, k: Int = 3): DataFrame = {
    val inv = shingled(docs, k)
      .select(col("doc_id"), size(col("sh")).as("n_sh"), explode(col("sh")).as("s"))
    val df0 = inv.groupBy("s").agg(count(lit(1)).as("df"))
    inv
      .join(df0, "s")
      .groupBy("doc_id")
      .agg(
        max(col("n_sh")).cast("long").as("n_sh"),
        sum(when(col("df") >= minDf, 1L).otherwise(0L)).as("n_hot")
      )
      .withColumn("frac", col("n_hot").cast("double") / col("n_sh"))
  }

  /** Per-doc winnowing fingerprint sets (TextOps.winnowFromHashes over the
    * positional shingle-hash sequence). Persisted via CacheRegistry.memo —
    * same index-reuse + pushdown-barrier rationale as `shingled`, at ~2/(w+1)
    * of its size. */
  private def winnowed(docs: DataFrame, k: Int, w: Int): DataFrame =
    CacheRegistry.memo(docs.sparkSession, s"dedup:winnow:$k:$w:${CacheRegistry.planKey(docs)}") {
      spread(docs)
        .select(col("doc_id"), TextOps.tokens(col("text")).as("__tk"))
        .select(col("doc_id"), TextOps.posShingleHashes(col("__tk"), k).as("__h"))
        .select(col("doc_id"), TextOps.winnowFromHashes(col("__h"), w).as("fps"))
    }

  /** Winnowing fingerprint table: (doc_id, fps) — the per-document content
    * signature a plagiarism/near-dup pipeline stores. */
  def winnowFingerprints(docs: DataFrame, k: Int = 3, w: Int = 4): DataFrame =
    winnowed(docs, k, w)

  /** Near-dup pairs by winnowing-fingerprint Jaccard — `jaccardPairs` run
    * on the winnowed signature instead of the full shingle set. Exact same
    * inverted-index shape (shuffle = Σ|fps|, candidates meet through the
    * fingerprint join) but every stage is ~w/2× smaller: winnowing IS the
    * index-compression knob. Same `maxDf` hot-key guard; 0 = oracle mode
    * (exact vs a brute-force cross join on the fingerprint sets). */
  def winnowPairs(
      docs: DataFrame,
      threshold: Double,
      k: Int = 3,
      w: Int = 4,
      maxDf: Long = 0L
  ): DataFrame = {
    val inv0 = winnowed(docs, k, w)
      .select(col("doc_id"), size(col("fps")).as("n_fp"), explode(col("fps")).as("f"))
    val inv =
      if (maxDf <= 0L) inv0
      else {
        val hot = inv0.groupBy("f").count().where(col("count") > maxDf).select("f")
        // recompute n_fp over the SURVIVING fingerprints: with the original
        // denominators, capped-out hot fingerprints would deflate sim near
        // the threshold (pairs silently dropped) — this keeps sim a true
        // Jaccard of the filtered sets. One extra hash-agg + broadcast-back,
        // only on the capped (non-oracle) path.
        val filtered = inv0.join(hot, Seq("f"), "left_anti")
        val nf = filtered.groupBy("doc_id").agg(count(lit(1)).as("n_fp2"))
        filtered
          .join(nf, "doc_id")
          .select(col("doc_id"), col("n_fp2").as("n_fp"), col("f"))
      }
    inv
      .as("x")
      .join(inv.as("y"), "f")
      .where(col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .agg(count(lit(1)).as("n_inter"), max(col("x.n_fp")).as("n_a"), max(col("y.n_fp")).as("n_b"))
      .withColumn("sim", col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")))
      .where(col("sim") >= threshold)
      .select("a_id", "b_id", "sim")
  }

  /** MinHash-LSH candidate pairs + exact-Jaccard verification.
    *
    * bands × rowsPerBand must equal TextOps.minhashParams.size. A pair
    * collides when any band of their signatures agrees exactly; collisions
    * are then verified with the true shingle Jaccard, so false positives
    * are eliminated and the only approximation is (deterministic,
    * parameter-controlled) recall on near-threshold pairs.
    */
  /** Banded MinHash signature table — the LSH dedup INDEX: one row per
    * (doc, band) keyed by the band's signature slice. The signature stage
    * (tokens → shingle bases → 16 cheap min-folds) memo-persists per
    * (corpus, k) — also a pushdown barrier: an isNotNull filter pushed
    * below the staging projects would re-inline the whole hash pipeline. */
  private def bandedSig(docs: DataFrame, k: Int, bands: Int, rowsPerBand: Int): DataFrame = {
    val sig = CacheRegistry
      .memo(docs.sparkSession, s"dedup:minhash:$k:${CacheRegistry.planKey(docs)}") {
        spread(docs)
          .select(col("doc_id"), TextOps.tokens(col("text")).as("__tk"))
          .select(col("doc_id"), TextOps.shingleBasesFromTokens(col("__tk"), k).as("__bh"))
          .select(col("doc_id"), TextOps.minhashSigFromBases(col("__bh")).as("sig"))
      }
      .where(col("sig").isNotNull)
    // (band_id, band signature slice) bucket key — slice is tiny, use it raw.
    sig.select(
      col("doc_id"),
      posexplode(
        array((0 until bands).map(b => slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)): _*)
      ).as(Seq("band", "bsig"))
    )
  }

  /** The LSH CANDIDATE stage alone: banded-signature bucket self-join,
    * distinct (a_id < b_id) pairs, no verification. Exposed separately
    * (round 15) because the two stages scale differently and the split is
    * the 100 TB story: the candidate exchange is docs × bands rows of
    * (band, bsig, doc_id) plus one 16-byte row per colliding pair —
    * corpus-linear plus true-pair-linear — while VERIFIED pair emission
    * ([[minhashLshPairs]]) additionally ships both shingle arrays to every
    * candidate row, which at extreme dup density (the factor-100 replica
    * tier: every doc a 99-way twin, ~74M true pairs) multiplies the
    * exchange by the ~2 KB array payload. Candidate recall is the
    * quantity the 1−(1−s^r)^b S-curve predicts ([[lshCalibration]]);
    * graft.ScalePath measures it against derived twin truth at factors
    * the exact oracle cannot reach. */
  def lshCandidates(
      docs: DataFrame,
      k: Int = 3,
      bands: Int = DefaultBands,
      rowsPerBand: Int = DefaultRowsPerBand
  ): DataFrame = {
    require(bands * rowsPerBand == TextOps.minhashParams.size, "bands×rows must cover the signature")
    val banded = bandedSig(docs, k, bands, rowsPerBand)
    banded
      .as("x")
      .join(banded.as("y"), Seq("band", "bsig"))
      .where(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
  }

  def minhashLshPairs(
      docs: DataFrame,
      threshold: Double,
      k: Int = 3,
      bands: Int = DefaultBands,
      rowsPerBand: Int = DefaultRowsPerBand
  ): DataFrame = {
    val cand = lshCandidates(docs, k, bands, rowsPerBand)
    // exact verification of candidates only
    val sh = shingled(docs, k)
    cand
      .join(sh.select(col("doc_id").as("a_id"), col("sh").as("sh_a")), "a_id")
      .join(sh.select(col("doc_id").as("b_id"), col("sh").as("sh_b")), "b_id")
      .withColumn(
        "jac",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))
      )
      .where(col("jac") >= threshold)
      .select("a_id", "b_id", "jac")
  }

  /** LSH candidate-recall calibration curve: for every exact-Jaccard pair
    * (sim ≥ minSim, inverted-index join), was it produced as a banded
    * MinHash candidate? Aggregated by 0.1-wide similarity bucket next to
    * the theoretical S-curve 1 − (1 − s^r)^b at the bucket midpoint —
    * the table an operator reads to pick (bands, rows) before committing
    * a corpus-sized dedup run to them.
    *
    * Scale: the ground-truth side is the exact pair join, which is
    * quadratic in matching shingles — so the sampling contract is
    * ENFORCED here, not left to the docstring: when the corpus exceeds
    * `maxDocs`, a deterministic content-hash filter
    * (polyHash(text) mod 1e6 < maxDocs·1e6/n, stable across runs,
    * partitionings and appends — no RNG) bounds the frame BOTH sides
    * see. Calibration is a property of the (bands, rows) parameters,
    * not of corpus size, so a hash-uniform sample estimates the same
    * curve; the quadratic cliff is unreachable through this signature.
    * Below the ceiling the filter is skipped and the result is exactly
    * the full-corpus curve. The one extra cost is a count() of the
    * input — one columnar scan, trivially amortized by the pair join
    * it bounds. */
  def lshCalibration(
      docs: DataFrame,
      minSim: Double = 0.1,
      k: Int = 3,
      bands: Int = DefaultBands,
      rowsPerBand: Int = DefaultRowsPerBand,
      maxDocs: Long = 20000L
  ): DataFrame = {
    require(bands * rowsPerBand == TextOps.minhashParams.size, "bands×rows must cover the signature")
    require(maxDocs > 0, "maxDocs must be positive: the exact ground-truth side is pair-quadratic")
    val n = docs.count()
    val sampled =
      if (n <= maxDocs) docs
      else {
        val keepPerM = math.max(1L, maxDocs * 1000000L / n)
        docs.where(pmod(TextOps.polyHash(col("text")), lit(1000000L)) < lit(keepPerM))
      }
    val exact = jaccardPairs(sampled, minSim, k)
    val banded = bandedSig(sampled, k, bands, rowsPerBand)
    val cand = banded
      .as("x")
      .join(banded.as("y"), Seq("band", "bsig"))
      .where(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
      .withColumn("is_cand", lit(1L))
    val sMid = least(col("bucket").cast("double") / 10.0 + lit(0.05), lit(1.0))
    exact
      .join(cand, Seq("a_id", "b_id"), "left")
      .groupBy(floor(col("jac") * 10).cast("long").as("bucket"))
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(coalesce(col("is_cand"), lit(0L))).as("n_cand")
      )
      .withColumn("recall", col("n_cand").cast("double") / col("n_pairs"))
      .withColumn(
        "theory",
        lit(1.0) - pow(lit(1.0) - pow(sMid, rowsPerBand.toDouble), bands.toDouble)
      )
  }

  /** INCREMENTAL near-dup: match a new batch of documents against an
    * existing corpus through the corpus's LSH index — the production
    * shape of continuous-ingest dedup, where recomputing (or even
    * rescanning) corpus pair space per increment is off the table.
    *
    * The corpus's banded signature table and shingle index are the same
    * memo-persisted handles `minhashLshPairs` builds, so a pipeline that
    * deduped the corpus once pays NOTHING corpus-sized here: batch docs
    * hash themselves (O(|batch|)), probe the index through the
    * (band, bsig) join, and exact-verify the collisions. Shuffle is
    * proportional to |batch| × bands + candidates, never corpus size; at
    * 100 TB corpus / GB-scale daily increments that asymmetry is the whole
    * game. The batch side is hinted broadcast-able — Spark drops the hint
    * by itself if the batch outgrows the threshold.
    *
    * Output: (a_id = corpus doc, b_id = batch doc, jac ≥ threshold).
    * Within-batch pairs are `minhashLshPairs(batch, …)` — separate call,
    * separate concern. */
  def minhashLshPairsAgainst(
      corpus: DataFrame,
      batch: DataFrame,
      threshold: Double,
      k: Int = 3,
      bands: Int = DefaultBands,
      rowsPerBand: Int = DefaultRowsPerBand
  ): DataFrame = {
    require(bands * rowsPerBand == TextOps.minhashParams.size, "bands×rows must cover the signature")
    val idx = bandedSig(corpus, k, bands, rowsPerBand)
    val probe = bandedSig(batch, k, bands, rowsPerBand)
    val cand = idx
      .as("x")
      .join(broadcast(probe.as("y")), Seq("band", "bsig"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
    val shC = shingled(corpus, k)
    val shB = shingled(batch, k)
    cand
      .join(shC.select(col("doc_id").as("a_id"), col("sh").as("sh_a")), "a_id")
      .join(broadcast(shB.select(col("doc_id").as("b_id"), col("sh").as("sh_b"))), "b_id")
      .withColumn(
        "jac",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))
      )
      .where(col("jac") >= threshold)
      .select("a_id", "b_id", "jac")
  }

  /** DECONTAMINATION: flag training documents that share k-gram content
    * with an eval/benchmark corpus — the gate every LLM data pipeline runs
    * before a training set ships (eval answers leaking into training data
    * invalidate the eval). Longer grams than near-dup dedup (k=5 vs 3):
    * contamination cares about verbatim spans, not document similarity.
    *
    * Mechanism: the eval side collapses to its distinct k-gram set —
    * benchmark corpora are small by nature, so it broadcasts — and
    * training postings probe it map-side; per-doc hit counts then need
    * only the one aggregate exchange. Training-side work is a single scan
    * regardless of how many benchmarks stack into `eval` (union them).
    *
    * Output per flagged train doc: (doc_id, n_hits = distinct shared
    * grams, n_grams = the doc's distinct gram count, frac = n_hits /
    * n_grams). Filter `n_hits >= minHits`; 1 = any verbatim overlap. */
  def contamination(
      train: DataFrame,
      eval: DataFrame,
      k: Int = 5,
      minHits: Long = 1L
  ): DataFrame = {
    val tr = shingled(train, k)
      .select(col("doc_id"), size(col("sh")).as("n_grams"), explode(col("sh")).as("s"))
    val ev = shingled(eval, k).select(explode(col("sh")).as("s")).distinct()
    tr.join(broadcast(ev), "s")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"), max(col("n_grams")).as("n_grams"))
      .where(col("n_hits") >= minHits)
      .select(
        col("doc_id"),
        col("n_hits"),
        col("n_grams"),
        (col("n_hits").cast("double") / col("n_grams")).as("frac")
      )
  }

  /** SimHash near-dup pairs: Hamming distance ≤ maxDist on the 30-bit
    * simhash. Blocking: 4 bands of ~8 bits — any pair within Hamming ≤ 3
    * agrees exactly on ≥ 1 band (pigeonhole), so recall is 1 for
    * maxDist ≤ 3; larger maxDist falls back to verified candidates only.
    */
  def simhashPairs(docs: DataFrame, maxDist: Int = 3): DataFrame = {
    val sh = CacheRegistry.memo(docs.sparkSession, s"dedup:simhash:${CacheRegistry.planKey(docs)}") {
      spread(docs)
        .select(col("doc_id"), TextOps.tokenHashes(col("text")).as("__th"))
        .select(col("doc_id"), TextOps.simhashFromHashes(col("__th")).as("sh"))
    }
    val bandBits = Seq((0, 8), (8, 8), (16, 8), (24, 6))
    val banded = sh.select(
      col("doc_id"),
      col("sh"),
      posexplode(
        array(bandBits.map { case (off, w) =>
          pmod(shiftright(col("sh"), off), lit(1L << w))
        }: _*)
      ).as(Seq("band", "bkey"))
    )
    banded
      .as("x")
      .join(banded.as("y"), Seq("band", "bkey"))
      .where(col("x.doc_id") < col("y.doc_id"))
      .select(
        col("x.doc_id").as("a_id"),
        col("y.doc_id").as("b_id"),
        TextOps.hamming(col("x.sh"), col("y.sh")).as("dist")
      )
      .distinct()
      .where(col("dist") <= maxDist)
  }

  /** TF-IDF cosine document pairs: sparse-vector similarity straight off
    * the token inverted index — the no-embedding text-similarity path.
    * Same shape and scale story as `jaccardPairs` (shuffle = Σ|terms|,
    * candidates meet through the term join), but weighted: common terms
    * contribute little (idf → 0), so the hot-key problem self-damps and
    * near-dups separate better than raw overlap.
    *
    * FP-parity contract: every sum that feeds an output or a comparison
    * (per-doc norm, per-pair dot) folds in TERM ORDER, so the result is
    * bit-identical to the DuckDB oracle's ordered list_reduce.
    *
    * @param maxDfFrac drop terms occurring in more than this fraction of
    *                  the corpus (from postings, norms AND dots — the
    *                  measure is well-defined, just stopword-free). The
    *                  term self-join contributes df² candidate rows per
    *                  term, so without the cap one stopword makes the
    *                  join quadratic in corpus size; idf damps such a
    *                  term's WEIGHT to ~0 anyway, so the cap changes
    *                  almost nothing above any useful threshold. This is
    *                  jaccardPairs' maxDf guard, expressed relatively. */
  def tfidfCosinePairs(docs: DataFrame, threshold: Double, maxDfFrac: Double = 0.1): DataFrame = {
    val spark = docs.sparkSession
    // weighted postings persist once: norms and BOTH sides of the pair
    // join read them
    val wp = CacheRegistry.memo(
      spark,
      s"dedup:tfidfw:$maxDfFrac:${CacheRegistry.planKey(docs)}"
    ) {
      val tf = spread(docs)
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("term"))
        .groupBy("doc_id", "term")
        .agg(count(lit(1)).as("tf"))
      val df0 = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val nDf = docs.agg(count(lit(1)).cast("double").as("__n"))
      tf.join(df0, "term")
        .crossJoin(broadcast(nDf))
        .where(col("df") <= col("__n") * maxDfFrac)
        .select(col("doc_id"), col("term"), (col("tf") * log(col("__n") / col("df"))).as("w"))
    }
    // per-term contributions fold in term order (FP determinism) through
    // the STREAMING running-window spelling (Similarity.orderedSumGrouped,
    // round 16): bit-identical sums, sort-based instead of per-group
    // collect_list — the pair-sized dot aggregate was the ObjectHashAgg
    // scale hazard of this operator (measured 0.87 → 0.62 s on the sf0.1
    // pair kernel; term unique per (doc) / per (a,b) pair, so the
    // last-row extraction is well-defined)
    val norms = Similarity
      .orderedSumGrouped(
        wp.select(col("doc_id"), col("term"), (col("w") * col("w")).as("p")),
        Seq("doc_id"),
        "term",
        "p",
        "__n2"
      )
      .select(col("doc_id"), sqrt(col("__n2")).as("nrm"))
    val dots = Similarity.orderedSumGrouped(
      wp.as("x")
        .join(wp.as("y"), "term")
        .where(col("x.doc_id") < col("y.doc_id"))
        .select(
          col("x.doc_id").as("a_id"),
          col("y.doc_id").as("b_id"),
          col("term"),
          (col("x.w") * col("y.w")).as("p")
        ),
      Seq("a_id", "b_id"),
      "term",
      "p",
      "dp"
    )
    dots
      .join(norms.select(col("doc_id").as("a_id"), col("nrm").as("na")), "a_id")
      .join(norms.select(col("doc_id").as("b_id"), col("nrm").as("nb")), "b_id")
      .withColumn("cos", col("dp") / (col("na") * col("nb")))
      .where(col("cos") >= threshold)
      .select("a_id", "b_id", "cos")
  }

  /** Near-dup CLUSTERS: connected components of the pair graph, labeled by
    * the component's minimum doc_id — the step a training pipeline runs
    * after pair generation, because near-dup is transitive in practice
    * (A~B, B~C ⇒ keep one of {A,B,C}, not two).
    *
    * Algorithm: distributed min-label propagation. Every doc starts with
    * label = doc_id; each round, a doc takes the min of its own label and
    * its neighbors' labels. Converges in O(diameter) rounds — near-dup
    * components are short chains (diameter ≤ a few), so 3–5 rounds in
    * practice; `maxIter` caps pathological graphs. Each round is one
    * shuffle join + one aggregate; labels persist round-over-round and the
    * previous round unpersists, so peak storage is 2 × O(docs) label rows.
    * Convergence detection is a single scalar aggregate — sum(label)
    * strictly decreases until fixpoint (labels only ever decrease), so no
    * per-row change-join is needed. At 100 TB the same loop holds:
    * edges are the (sparse) verified pair set, labels are (id, id) pairs;
    * for adversarial long-chain graphs swap in alternating large-star/
    * small-star (two-hop contraction, O(log n) rounds) — same join shape.
    *
    * @param pairs near-dup pairs (a_id, b_id, …) from jaccardPairs /
    *              minhashLshPairs / simhashPairs / Similarity.vecNearDup.
    * @return (doc_id, cluster_id, n_cluster, keep) for EVERY doc in
    *         `docs` — singletons form their own cluster; keep marks the
    *         canonical (minimum-id) doc per cluster.
    */
  def nearDupClusters(docs: DataFrame, pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    // The loop drives eager scalar actions (the convergence aggregate), so
    // it must run ONCE per (session, pair-plan), not once per plan
    // construction: the whole iteration is memo'd on the pairs' plan key
    // and the final persisted label table is the session-scoped fixture
    // (same lifecycle as the shingle/minhash indexes; release(spark)
    // drops it). Intermediate rounds persist/unpersist eagerly inside.
    val spark = docs.sparkSession
    val finalLabels = CacheRegistry.memo(
      spark,
      s"dedup:cc:${CacheRegistry.planKey(pairs)}:${CacheRegistry.planKey(docs)}"
    ) {
      val edges = pairs
        .select(col("a_id").as("u"), col("b_id").as("v"))
        .union(pairs.select(col("b_id").as("u"), col("a_id").as("v")))
        .persist()
      var labels = docs.select(col("doc_id"), col("doc_id").as("label")).persist()
      // coalesce: sum over ZERO rows is null — an empty corpus must yield
      // an empty result, not an NPE
      def labelSum(d: DataFrame): Long =
        d.agg(coalesce(sum("label"), lit(0L))).head.getLong(0)
      var prevSum = labelSum(labels)
      var it = 0
      var converged = edges.isEmpty // no edges → all singletons, done
      while (!converged && it < maxIter) {
        val fromNbr = edges
          .join(labels.select(col("doc_id").as("u"), col("label").as("ulab")), "u")
          .groupBy(col("v").as("doc_id"))
          .agg(min("ulab").as("nlab"))
        val next = labels
          .join(fromNbr, Seq("doc_id"), "left")
          .select(col("doc_id"), least(col("label"), coalesce(col("nlab"), col("label"))).as("label"))
          .persist()
        val nextSum = labelSum(next)
        labels.unpersist()
        labels = next
        converged = nextSum == prevSum
        prevSum = nextSum
        it += 1
      }
      edges.unpersist()
      // fail loudly rather than memo-cache SPLIT cluster labels: a
      // component whose propagation distance exceeds maxIter would
      // otherwise silently report two (or more) clusters as distinct
      require(
        converged,
        s"nearDupClusters: min-label propagation did not converge in $maxIter iterations " +
          "(a component's diameter exceeds the cap) — raise maxIter"
      )
      labels
    }
    val sized = finalLabels
      .groupBy(col("label").as("cluster_id"))
      .agg(count(lit(1)).as("n_cluster"))
    finalLabels
      .select(col("doc_id"), col("label").as("cluster_id"))
      .join(sized, "cluster_id")
      .select(
        col("doc_id"),
        col("cluster_id"),
        col("n_cluster"),
        (col("doc_id") === col("cluster_id")).as("keep")
      )
  }

  /** Corpus with near-dup clusters collapsed to their canonical doc. */
  def dropNearDups(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val keep = nearDupClusters(docs, pairs).where(col("keep")).select("doc_id")
    docs.join(keep, "doc_id")
  }

  /** Exact duplicated-SPAN detection (the substring-dedup shape of Lee et
    * al. 2021, "Deduplicating Training Data Makes Language Models Better",
    * at k-gram granularity): every position whose k-token gram occurs ≥
    * `minDf` times corpus-wide is "duplicated"; runs of overlapping or
    * adjacent duplicated positions merge into maximal spans, one row per
    * (doc, span) with its token extent. Unlike winnowing (which SAMPLES
    * fingerprints to find candidate doc pairs) this reports the exact
    * duplicated regions inside each doc — the input to span-level removal,
    * which Lee et al. show beats whole-doc dropping.
    *
    * Scale: the corpus-wide gram df is one hash-aggregate over positional
    * gram hashes (shuffle = Σ|doc| rows of (hash) — no text moves); the
    * duplicated-position filter is a semi-join on the gram hash (bloom /
    * DPP prune applies); span merging is a per-doc window — doc-local,
    * never cross-partition. No pair join anywhere: cost is linear in
    * corpus size, not in duplicate count squared. */
  def dupSpans(docs: DataFrame, k: Int = 8, minDf: Long = 2L): DataFrame = {
    // tokens staged as their own projection (same rationale as `shingled`:
    // an inlined tokenize re-runs inside every shingle lambda invocation —
    // O(|doc|²) per doc); the exploded gram frame is memo'd because BOTH
    // the df aggregate and the position semi-join consume it.
    val grams = CacheRegistry.memo(docs.sparkSession, s"dedup:dupspans:$k:${CacheRegistry.planKey(docs)}") {
      spread(docs)
        .select(col("doc_id"), TextOps.tokens(col("text")).as("__tk"))
        .select(col("doc_id"), TextOps.posShingleHashes(col("__tk"), k).as("__gh"))
        .select(col("doc_id"), posexplode(col("__gh")).as(Seq("pos", "gh")))
    }
    val dupGrams = grams.groupBy("gh").count().where(col("count") >= minDf).select("gh")
    val dupPos = grams.join(dupGrams, "gh").select("doc_id", "pos")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("pos")
    val wCum = w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    dupPos
      // island rule: a gap > k tokens between consecutive duplicated
      // positions starts a new span (spans [p, p+k-1] overlap or touch
      // exactly when the position delta is ≤ k); first row's NULL lag
      // falls to the ELSE branch = new island, same as the SQL CASE
      .withColumn("__ni", when(col("pos") - lag(col("pos"), 1).over(w) <= k, lit(0L)).otherwise(lit(1L)))
      .withColumn("__isl", sum(col("__ni")).over(wCum))
      .groupBy("doc_id", "__isl")
      .agg(
        min(col("pos")).cast("long").as("span_start"),
        (max(col("pos")) + k - 1).cast("long").as("span_end"),
        count(lit(1)).as("n_grams")
      )
      .withColumn("span_tokens", col("span_end") - col("span_start") + 1)
      .select("doc_id", "span_start", "span_end", "span_tokens", "n_grams")
  }

  /** Span-level removal — the actual rewrite step of Lee et al. 2021:
    * drop every token inside a duplicated span ([[dupSpans]]), keep the
    * rest, and emit the cleaned text's hash plus the removal accounting
    * (the ablation columns a curation run reports). Docs with no
    * duplicated spans pass through whole; a doc that is ALL duplicated
    * spans keeps zero tokens and carries a NULL clean hash.
    *
    * Scale: spans aggregate to one small array per affected doc (spans
    * per doc ≪ tokens per doc), the join back to the corpus is on doc_id
    * (same partitioning as any per-doc stage), and the rewrite itself is
    * a positional HOF filter — token arrays never explode corpus-wide,
    * and untouched docs take the left-join fast path. */
  def removeDupSpans(docs: DataFrame, k: Int = 8, minDf: Long = 2L): DataFrame = {
    val spans = dupSpans(docs, k, minDf)
      .groupBy("doc_id")
      // order inside the array is irrelevant: membership (any-span) is
      // what the positional filter consumes
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("__spans"))
    docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("__tk"))
      .join(spans, Seq("doc_id"), "left")
      .withColumn(
        "__kept",
        when(col("__spans").isNull, col("__tk")).otherwise(
          filter(
            col("__tk"),
            (t, i) =>
              !exists(
                col("__spans"),
                sp => i.cast("long") >= sp.getField("span_start") && i.cast("long") <= sp.getField("span_end")
              )
          )
        )
      )
      .select(
        col("doc_id"),
        size(col("__tk")).cast("long").as("n_tok"),
        size(col("__kept")).cast("long").as("n_kept"),
        (size(col("__tk")) - size(col("__kept"))).cast("long").as("n_removed"),
        when(size(col("__kept")) > 0, TextOps.polyHash(concat_ws(" ", col("__kept")))).as("clean_hash")
      )
  }
}
