package graft.extensions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic summaries for 100 TB-scale profiling — the three
  * workhorses every large pipeline reaches for once exact answers stop
  * fitting: KMV (distinct counts, see graft.functions.KmvSketch),
  * count-min (frequency estimates), Bloom (membership pre-filtering).
  *
  * Every sketch here is DETERMINISTIC — hash seeds are fixed constants
  * and all arithmetic is explicit modular integer math (base polyHash
  * mod P = 1e9+7) — so the DuckDB oracle replays each one bit-for-bit.
  * That is a deliberate departure from Spark's own `approx_count_distinct`
  * / `df.stat.bloomFilter`, whose internal hashing is not replayable
  * across engines; the structure (bounded mergeable state, broadcastable
  * filters) is the same.
  *
  * Reference surface: pandas `nunique` / `value_counts` / `isin` — these
  * are the sketch-sized variants of those exact kernels.
  */
object Sketch {

  val P: Long = TextOps.P // 1e9+7, shared with polyHash

  /** Fixed odd multipliers/offsets < P for the hash families. With inputs
    * already reduced mod P, (x%P)·a + b < 1e18 — no 64-bit overflow on
    * either engine (DuckDB BIGINT traps on overflow; Spark wraps — staying
    * bounded keeps them identical). */
  val seeds: Seq[(Long, Long)] = Seq(
    (973478391L, 12582917L),
    (714025467L, 37583921L),
    (550510237L, 93851103L),
    (433494437L, 54018521L)
  )

  /** h_i(x) = ((x mod P)·a_i + b_i) mod P — the i-th member of the
    * multiply-shift family over an integral column. pmod, not % — Spark's
    * % is sign-preserving, and a negative key would otherwise produce a
    * negative bit index that silently reads the Bloom word array from the
    * END (false negatives, the one error class Bloom must never make).
    * For non-negative inputs pmod ≡ %, so the DuckDB oracles are
    * unaffected. */
  def rehash(x: Column, i: Int): Column = {
    val (a, b) = seeds(i)
    pmod(pmod(x, lit(P)) * a + b, lit(P))
  }

  /** 2^b lookup table (b = 0..63) as a literal column — bit masks without
    * variable-shift expressions, identical on both engines (index 63 is
    * Long.MinValue; `&` is sign-agnostic). */
  val pow2: Array[Long] = (0 until 64).map(b => 1L << b).toArray

  // ------------------------------------------------------------------ Bloom

  /** Build a Bloom filter over `keys` (integral column) as a dense
    * Array[Long] of `bits/64` words, via pure relational ops: k hashes per
    * key → distinct (word, bit) → per-word Σ of distinct bit masks (≡ OR).
    *
    * The driver-side collect is O(bits/64) — constant in the data (1024
    * longs for bits=65536), the same shape Spark's own runtime bloom
    * filters ship to the scan. Build side is one pass + one key-sized
    * shuffle. */
  def bloomBuild(keys: DataFrame, keyCol: String, bits: Int, kHash: Int): Array[Long] = {
    require(bits % 64 == 0, "bits must be a multiple of 64")
    require(kHash >= 1 && kHash <= seeds.length, s"kHash must be 1..${seeds.length}")
    // Trained-artifact memo (round 16, guide §1.2): the filter is a pure
    // function of (key plan, bits, kHash) — the logRegTrain/kmeansCentroids
    // contract. Before this every call re-ran the build job eagerly.
    graft.CacheRegistry.memoStat(
      keys.sparkSession,
      s"sketch:bloom:$keyCol:$bits:$kHash:${graft.CacheRegistry.planKey(keys)}"
    ) {
      val k = col(keyCol)
      val hs = (0 until kHash).map(i => rehash(k, i) % bits)
      val words = keys
        .select(explode(array(hs: _*)).as("h"))
        .select((col("h") / 64).cast("long").as("w"), (col("h") % 64).cast("int").as("b"))
        .distinct()
        .groupBy("w")
        .agg(sum(element_at(lit(pow2), col("b") + 1)).as("mask"))
        .collect()
      val dense = new Array[Long](bits / 64)
      words.foreach(r => dense(r.getLong(0).toInt) = r.getLong(1))
      dense
    }
  }

  /** Membership test against a built filter — a pure codegen'd expression
    * on the probe scan (no join, no shuffle): all k bits set. The word
    * and pow2 literals are hoisted so the plan carries ONE copy of each
    * array, not kHash copies (words is bits/8 bytes — 256 KB at 2^21
    * bits). */
  def bloomContains(key: Column, words: Array[Long], bits: Int, kHash: Int): Column = {
    val w = lit(words)
    val p2 = lit(pow2)
    (0 until kHash)
      .map { i =>
        val h = rehash(key, i) % bits
        (element_at(w, ((h / 64).cast("int") + 1).cast("int"))
          .bitwiseAND(element_at(p2, ((h % 64).cast("int") + 1).cast("int"))) =!= 0L)
      }
      .reduce(_ && _)
  }

  // ------------------------------------------------------------ Count-min

  /** Count-min counter table over an exploded term column: d rows × w
    * buckets, counter(i, j) = #occurrences hashing to bucket j under h_i.
    * One groupBy with map-side partial aggregation; output is d·w rows —
    * broadcastable at any corpus size. Input terms are polyHashed first so
    * the row hashes are integral. */
  def cmsCounters(terms: DataFrame, termCol: String, d: Int, w: Int): DataFrame = {
    require(d >= 1 && d <= seeds.length, s"d must be 1..${seeds.length}")
    val h = TextOps.polyHash(col(termCol))
    val rows = (0 until d).map(i => struct(lit(i).as("i"), (rehash(h, i) % w).as("bkt")))
    terms
      .select(explode(array(rows: _*)).as("__cms_r"))
      .groupBy(col("__cms_r.i").as("__cms_i"), col("__cms_r.bkt").as("__cms_bkt"))
      .agg(count(lit(1)).as("__cms_cnt"))
  }

  /** Point-estimate a term's frequency from the counter table: min over
    * the d row counters the term hashes into. `counters` is broadcast —
    * estimates never touch the corpus again (the CMS property). LEFT join
    * + coalesce(0): a candidate hashing into a bucket no corpus term
    * touched must estimate 0, not vanish (and not take its min over only
    * the surviving buckets' collision counts). */
  def cmsEstimate(candidates: DataFrame, termCol: String, counters: DataFrame, d: Int, w: Int): DataFrame = {
    val h = TextOps.polyHash(col(termCol))
    val rows = (0 until d).map(i => struct(lit(i).as("i"), (rehash(h, i) % w).as("bkt")))
    // internal names are __cms-prefixed so caller columns can't collide
    candidates
      .withColumn("__cms_r", explode(array(rows: _*)))
      .join(
        broadcast(counters),
        col("__cms_r.i") === col("__cms_i") && col("__cms_r.bkt") === col("__cms_bkt"),
        "left"
      )
      .groupBy(candidates.columns.map(col): _*)
      .agg(min(coalesce(col("__cms_cnt"), lit(0L))).as("n_est"))
  }

  /** Equi-width histogram counters per key: the quantile summary that is
    * MERGEABLE by pure counter addition (shards/micro-batches histogram
    * independently against the same global (mn, mx) and the tables sum) —
    * unlike rank-based summaries, no merge logic at all. `stats` must
    * carry (keyCol, mn, mx) — global, so every shard buckets identically.
    * Values land in `least(floor((v-mn)/(mx-mn)·b), b-1)`; a degenerate
    * key (mx = mn) collapses to bucket 0. Output (keyCol, __bkt, __cnt),
    * b rows per key max — broadcastable at any corpus size. */
  def histCounters(d: DataFrame, keyCol: String, valCol: String, stats: DataFrame, b: Int): DataFrame = {
    val bkt = when(col("mx") === col("mn"), lit(0L))
      .otherwise(
        least(
          floor((col(valCol) - col("mn")) / (col("mx") - col("mn")) * lit(b.toDouble)).cast("long"),
          lit((b - 1).toLong)
        )
      )
    d.join(broadcast(stats), keyCol)
      .withColumn("__bkt", bkt)
      .groupBy(col(keyCol), col("__bkt"))
      .agg(count(lit(1)).as("__cnt"))
  }

  // ------------------------------------------------------------------ KMV

  /** The `graft_kmv(hash, k)` aggregate as a Column (requires Graft.init
    * or the GraftExtensions config on the session). */
  def kmv(hash: Column, k: Int): Column = call_function("graft_kmv", hash, lit(k))

  /** Distinct-count estimate from a KMV sketch array: exact size below k,
    * (k−1)·P / h_(k) at capacity. */
  def kmvEstimate(sketch: Column, k: Int): Column =
    when(size(sketch) < k, size(sketch).cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(P.toDouble) / element_at(sketch, k).cast("double"))

  /** Merge two KMV sketches: the k smallest of the union. Valid because
    * any union element ≤ the union's k-th smallest is, on whichever side
    * it came from, ≤ that side's k-th smallest — so it survives in that
    * side's sketch. */
  def kmvMerge(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_union(a, b)), 1, k)

  /** |A∪B| estimate from two sketches (estimate of the merged sketch). */
  def kmvUnionEstimate(a: Column, b: Column, k: Int): Column =
    kmvEstimate(kmvMerge(a, b, k), k)

  /** |A∩B| estimate (Beyer et al., PODS'07): below merged capacity the
    * sketches are the exact hash sets, so intersect exactly; at capacity,
    * the fraction of the merged k-set present in BOTH sketches is an
    * unbiased Jaccard-style estimator scaled by the union estimate —
    * corpus-overlap measurement with no join between the corpora. */
  def kmvIntersectEstimate(a: Column, b: Column, k: Int): Column = {
    val merged = kmvMerge(a, b, k)
    val common = size(array_intersect(array_intersect(merged, a), b))
    when(size(merged) < k, size(array_intersect(a, b)).cast("double"))
      .otherwise(common.cast("double") / k * kmvEstimate(merged, k))
  }
}
