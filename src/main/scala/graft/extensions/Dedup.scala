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

  /** Hash-spread the corpus before superlinear pair work. A single parquet
    * file scans as ONE partition, serializing every interpreted HOF
    * (tokenize/shingle/hash) and both sides of the self-joins; the shuffle
    * is O(corpus) — always worth it when the downstream is O(pairs). At
    * 100 TB the input arrives pre-split, but the explicit spread also
    * decouples compute parallelism from file layout. */
  private def spread(docs: DataFrame): DataFrame = docs.repartition(col("doc_id"))

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

  /** MinHash-LSH candidate pairs + exact-Jaccard verification.
    *
    * bands × rowsPerBand must equal TextOps.minhashParams.size. A pair
    * collides when any band of their signatures agrees exactly; collisions
    * are then verified with the true shingle Jaccard, so false positives
    * are eliminated and the only approximation is (deterministic,
    * parameter-controlled) recall on near-threshold pairs.
    */
  def minhashLshPairs(
      docs: DataFrame,
      threshold: Double,
      k: Int = 3,
      bands: Int = 8,
      rowsPerBand: Int = 2
  ): DataFrame = {
    require(bands * rowsPerBand == TextOps.minhashParams.size, "bands×rows must cover the signature")
    // staged: tokens → shingle bases → 16 cheap min-folds over the array;
    // persisted for the same index-reuse + pushdown-barrier reasons as
    // `shingled` (the isNotNull filter would otherwise be pushed below the
    // staging projects, re-inlining the whole hash pipeline into it)
    val sig = CacheRegistry
      .memo(docs.sparkSession, s"dedup:minhash:$k:${CacheRegistry.planKey(docs)}") {
        spread(docs)
          .select(col("doc_id"), TextOps.tokens(col("text")).as("__tk"))
          .select(col("doc_id"), TextOps.shingleBasesFromTokens(col("__tk"), k).as("__bh"))
          .select(col("doc_id"), TextOps.minhashSigFromBases(col("__bh")).as("sig"))
      }
      .where(col("sig").isNotNull)
    // (band_id, band signature slice) bucket key — slice is tiny, use it raw.
    val banded = sig.select(
      col("doc_id"),
      posexplode(
        array((0 until bands).map(b => slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)): _*)
      ).as(Seq("band", "bsig"))
    )
    val cand = banded
      .as("x")
      .join(banded.as("y"), Seq("band", "bsig"))
      .where(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
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
}
