package graft.extensions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis column library for the LLM-data-pipeline extensions
  * (SURVEY.md §2.F): tokenization, shingling, portable hashing, MinHash,
  * SimHash, language-ID heuristic, quality scoring, fingerprinting.
  *
  * Every function here is a pure Catalyst `Column` expression (HOFs over
  * arrays — codegen-friendly, no UDFs), and every hash uses explicit
  * modular arithmetic so the DuckDB oracle can reproduce the exact same
  * values with `list_transform`/`list_reduce`. All arithmetic stays below
  * 2^63 (p = 1e9+7; multipliers < 1e5; 1e5·1e9 ≪ 2^63).
  */
object TextOps {

  /** Modulus for all polynomial hashes (fits in 30 bits). */
  val P: Long = 1000000007L

  /** Whitespace tokens, empty strings removed (consecutive-space safety —
    * both Spark `split` and DuckDB `string_split` emit empty tokens there).
    * Native codegen'd expression (graft.functions.Tokens): the HOF
    * spelling's ArrayFilter is CodegenFallback, so the whole split+filter
    * subtree ran interpreted per row — the hot inner op of every
    * text-pipeline query (round-16 guide §4; PolyHash precedent). */
  def tokens(text: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.Tokens(org.apache.spark.sql.GraftBridge.expressionEager(text))
    )

  /** The original HOF spelling — kept as the executable specification of
    * the native Tokens expression (equality asserted in TextOpsSpec). */
  def tokensHof(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  /** PII regex classes, written in the Java∩RE2 common dialect so the
    * DuckDB oracle (RE2) matches the engine (java.util.regex) byte-for-
    * byte. Shared by the batch query (x_pii) and the streaming scan. */
  val PiiEmail = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PiiPhone = "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b"
  val PiiIp = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Fixed-order scrub (email → phone → ip): an address's digits are
    * never double-counted as a phone; order is part of the contract. */
  def piiRedact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, lit(PiiEmail), lit("[EMAIL]")),
        lit(PiiPhone),
        lit("[PHONE]")
      ),
      lit(PiiIp),
      lit("[IP]")
    )

  /** Polynomial rolling hash of a string's chars mod P — base 31 left
    * fold, as a native codegen'd expression (graft.functions.PolyHash;
    * ~40× fewer interpreted ops than the HOF spelling). ASCII-only
    * corpus: bytes ≡ code points ≡ DuckDB `unicode` per char. */
  def polyHash(s: Column): Column = call_function("graft_polyhash", s)

  /** The original HOF spelling — kept as the executable specification of
    * PolyHash (equality asserted in TextOpsSpec). */
  def polyHashHof(s: Column): Column =
    aggregate(
      transform(split(s, ""), c => ascii(c).cast("long")),
      lit(0L),
      (acc, x) => (acc * 31L + x) % P
    )

  /** k-token shingles from a STAGED tokens column (must be a materialized
    * attribute, not an expression: HOF lambdas are interpreted — no codegen
    * CSE — so an inlined `tokens(text)` subtree would re-run split+filter
    * once per `element_at`, ~3× per shingle. Staging keeps lambda refs
    * O(1) array reads; measured 30× faster on the sf0.1 corpus.) */
  def shinglesFromTokens(toks: Column, k: Int = 3): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.Shingles(
        org.apache.spark.sql.GraftBridge.expressionEager(
          // HOF-spelling parity: a NULL tokens array yields an EMPTY
          // shingle array (when(size(null) >= k) falls to otherwise)
          coalesce(toks, array().cast("array<string>"))
        ),
        k
      )
    )

  /** The original HOF spelling — kept as the executable specification of
    * the native Shingles expression (equality asserted in TextOpsSpec). */
  def shinglesFromTokensHof(toks: Column, k: Int = 3): Column =
    when(
      size(toks) >= k,
      transform(
        sequence(lit(1), size(toks) - (k - 1)),
        i => concat_ws(" ", (0 until k).map(j => element_at(toks, i + j)): _*)
      )
    ).otherwise(array().cast("array<string>"))

  /** k-token shingles (joined with single spaces), empty below k tokens.
    * Only for single-use contexts; hot paths stage tokens first. */
  def shingles(text: Column, k: Int = 3): Column = shinglesFromTokens(tokens(text), k)

  /** Distinct shingle set — the unit of near-dup Jaccard similarity. */
  def shingleSet(text: Column, k: Int = 3): Column = array_distinct(shingles(text, k))

  /** Distinct shingle set from a staged tokens column (hot path). */
  def shingleSetFromTokens(toks: Column, k: Int = 3): Column =
    array_distinct(shinglesFromTokens(toks, k))

  // ---- MinHash ---------------------------------------------------------
  /** Per-function (a, b) parameters: h_i(x) = (a_i·x + b_i) mod P.
    * Small fixed primes — deterministic, shared with the oracle SQL. */
  val minhashParams: Seq[(Long, Long)] = Seq(
    (7919L, 104729L), (12553L, 30011L), (17389L, 65537L), (23311L, 11939L),
    (29443L, 86243L), (37813L, 50021L), (43691L, 75577L), (54001L, 23459L),
    (62131L, 94007L), (70919L, 41843L), (78893L, 62987L), (83639L, 15149L),
    (90023L, 71993L), (94771L, 33533L), (99377L, 87887L), (99991L, 57923L)
  )

  /** Poly-hashes of the distinct k-shingle set (the MinHash base values).
    * Stage this into its own projection when several downstream
    * expressions consume it: CollapseProject keeps multiply-referenced
    * expensive producers un-inlined, so the HOF runs once per row instead
    * of once per consumer. */
  def shingleBases(text: Column, k: Int = 3): Column =
    transform(shingleSet(text, k), s => polyHash(s))

  /** Shingle base hashes from a staged tokens column (hot path). */
  def shingleBasesFromTokens(toks: Column, k: Int = 3): Column =
    transform(shingleSetFromTokens(toks, k), s => polyHash(s))

  /** Per-token poly-hashes (SimHash input) — same staging advice. */
  def tokenHashes(text: Column): Column =
    transform(tokens(text), t => polyHash(t))

  /** MinHash signature from a staged shingleBases column. */
  def minhashSigFromBases(bases: Column): Column = {
    val sig = minhashParams.map { case (a, b) =>
      aggregate(bases, lit(P), (acc, h) => least(acc, (h * a + b) % P))
    }
    when(size(bases) > 0, array(sig: _*))
  }

  /** MinHash signature (array of minhashParams.size values) over the
    * distinct k-shingle set; null signature for docs with no shingles. */
  def minhashSig(text: Column, k: Int = 3): Column =
    minhashSigFromBases(shingleBases(text, k))

  // ---- SimHash ---------------------------------------------------------
  /** 30-bit SimHash over whitespace tokens (with multiplicity): bit j set
    * iff Σ_tokens ±1 by token-hash bit j is positive. Bit index j is a
    * plan-time constant, so `shiftright` unrolls to pure codegen. */
  def simhash(text: Column): Column = simhashFromHashes(tokenHashes(text))

  /** SimHash from a staged tokenHashes column. */
  def simhashFromHashes(ths: Column): Column = {
    (0 until 30)
      .map { j =>
        val bitsum = aggregate(
          ths,
          lit(0L),
          (acc, h) => acc + when(pmod(shiftright(h, j), lit(2L)) === 1L, 1L).otherwise(-1L)
        )
        when(bitsum > 0L, lit(1L << j)).otherwise(0L)
      }
      .reduce(_ + _)
  }

  /** Hamming distance between two simhash values (30-bit). */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  // ---- Language ID heuristic -------------------------------------------
  /** Marker stopwords per language. Real-corpus heuristic: count marker
    * hits per language, argmax with fixed priority order (en first). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "les", "et", "est", "une"),
    "zh" -> Seq("de0", "le0", "shi", "zai", "he")
  )

  def langScore(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(text), t => markers.map(t === _).reduce(_ || _)))

  /** Predicted language: argmax marker count, ties broken by langMarkers
    * order (en > es > de > fr > zh). */
  def langPredict(text: Column): Column = {
    val scores = langMarkers.map { case (l, m) => l -> langScore(text, m) }
    val best = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und")) { case ((l, s), acc) => when(s === best, lit(l)).otherwise(acc) }
  }

  // ---- Quality scoring -------------------------------------------------
  /** Composite quality score in [0,1]:
    * 0.4·min(n_tok/100, 1) + 0.3·(distinct_tok/n_tok) + 0.3·stopword_ratio.
    */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val n = size(toks).cast("double")
    val lenScore = least(n / 100.0, lit(1.0))
    val distinctRatio = size(array_distinct(toks)).cast("double") / n
    val stopRatio = langScore(text, langMarkers.head._2).cast("double") / n
    when(n > 0, lenScore * 0.4 + distinctRatio * 0.3 + stopRatio * 0.3)
  }

  /** Fraction of 2-grams equal to the document's MOST COMMON 2-gram —
    * the Gopher-style "duplicate n-gram" repetition signal, computed
    * WITHOUT a shuffle: sort the bigram array, fold a (prev, run, best)
    * accumulator to find the longest equal run. Max run of a sorted array
    * = max multiplicity, so this equals the explode→count→max spelling at
    * zero exchanges — per-doc arrays stay inside the projection. */
  def topBigramFrac(toks: Column): Column = {
    val grams = array_sort(shinglesFromTokens(toks, 2))
    val best = aggregate(
      grams,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1L).otherwise(1L)
        struct(x.as("prev"), run.as("run"), greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best")
    )
    when(size(grams) > 0, best.cast("double") / size(grams))
  }

  /** Mean token length in characters. */
  def meanTokenLen(toks: Column): Column =
    when(
      size(toks) > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks)
    )

  // ---- Blocklist redaction ---------------------------------------------
  /** Token-level blocklist redaction: every token in `blocklist` becomes
    * `repl`, everything else passes through — the C4-style scrub
    * (Raffel et al. 2020 dropped pages on a blocklist hit; modern
    * pipelines redact-and-count so the filter threshold can be tuned
    * downstream). Pure map-side HOF: no shuffle, codegen-friendly. For a
    * blocklist too big for an in-expression literal (millions of terms),
    * explode tokens and broadcast-anti-join instead — the semantics here
    * are the small-list fast path. */
  def redactTokens(tk: Column, blocklist: Seq[String], repl: String = "[X]"): Column = {
    require(blocklist.nonEmpty, "blocklist must be non-empty")
    transform(tk, t => when(blocklist.map(t === _).reduce(_ || _), lit(repl)).otherwise(t))
  }

  /** Count of blocklist hits in a token array (the redaction's paired
    * metric: hit fraction drives the drop/keep decision). */
  def blocklistHits(tk: Column, blocklist: Seq[String]): Column =
    size(filter(tk, t => blocklist.map(t === _).reduce(_ || _)))

  // ---- Token counting --------------------------------------------------
  /** Whitespace token count. */
  def nTokens(text: Column): Column = size(tokens(text))

  /** BPE-ish sub-token count: runs of letters, runs of digits, and single
    * other non-space chars (the pre-tokenizer split a byte-BPE would see).
    */
  def nTokensBpe(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0)))

  // ---- Sequence packing ------------------------------------------------
  /** Megatron-style concat-and-chunk sequence packing (round 5): assign
    * every document a contiguous token interval in its SHARD's packed
    * token stream and derive which fixed-length training chunks it
    * spans. Shards (deterministic `doc_id mod shards` buckets) pack
    * independently — ONE window per shard, so a 100 TB corpus packs with
    * shard-parallelism and no global sort; within a shard the order is
    * doc_id (content-stable, append-reproducible). Returns (doc_id,
    * shard, n_tok, tok_start, tok_end, chunk_start, chunk_end,
    * n_chunks) with chunk bounds inclusive; zero-token docs carry null
    * chunk bounds (they occupy no chunk). */
  def packSequences(docs: DataFrame, contextLen: Int, shards: Int = 8): DataFrame = {
    require(contextLen > 0 && shards > 0, "contextLen and shards must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("shard").orderBy("doc_id")
    docs
      .select(
        col("doc_id"),
        pmod(col("doc_id"), lit(shards.toLong)).as("shard"),
        nTokens(col("text")).cast("long").as("n_tok")
      )
      .withColumn("tok_end", sum("n_tok").over(w))
      .withColumn("tok_start", col("tok_end") - col("n_tok"))
      .withColumn(
        "chunk_start",
        when(col("n_tok") > 0, floor(col("tok_start") / contextLen.toDouble))
      )
      .withColumn(
        "chunk_end",
        when(col("n_tok") > 0, floor((col("tok_end") - 1) / contextLen.toDouble))
      )
      .withColumn(
        "n_chunks",
        when(col("n_tok") > 0, col("chunk_end") - col("chunk_start") + 1)
      )
  }

  // ---- Fingerprinting --------------------------------------------------
  /** Whole-document rolling hash (order-sensitive). */
  def fpDocument(text: Column): Column = polyHash(text)

  /** Winnowing-style content fingerprint: min shingle hash (order-free,
    * robust to shuffling; equal for exact dups and near-dups sharing the
    * minimal shingle). */
  def fpMinShingle(text: Column, k: Int = 3): Column = {
    val bases = transform(shingleSet(text, k), s => polyHash(s))
    when(size(bases) > 0, array_min(bases))
  }

  /** POSITIONAL k-shingle hashes from a staged tokens column — the
    * winnowing input. Unlike `shingleBasesFromTokens` this keeps document
    * order and multiplicity: winnowing's window walk is positional. */
  def posShingleHashes(toks: Column, k: Int = 3): Column =
    transform(shinglesFromTokens(toks, k), s => polyHash(s))

  /** Overlapping token-window chunks from a staged tokens column — the
    * RAG ingestion split. Chunk i covers tokens [i·stride, i·stride+size);
    * the last chunk may be shorter but never empty; docs shorter than one
    * chunk yield themselves. Returns array<struct<chunk_id int, chunk
    * string>> for a single explode downstream. */
  def chunkTokens(toks: Column, size: Int, stride: Int): Column = {
    require(stride > 0 && size >= stride, "need 0 < stride <= size")
    val n = org.apache.spark.sql.functions.size(toks)
    // number of chunks: ceil(max(n - size, 0) / stride) + 1 for n > 0
    val nChunks = when(n <= size, lit(1))
      .otherwise(ceil((n - size).cast("double") / stride).cast("int") + 1)
    when(
      n > 0,
      transform(
        sequence(lit(0), nChunks - 1),
        i =>
          struct(
            i.cast("int").as("chunk_id"),
            concat_ws(" ", slice(toks, i * stride + 1, lit(size))).as("chunk")
          )
      )
    ).otherwise(array().cast("array<struct<chunk_id:int,chunk:string>>"))
  }

  /** Winnowing (Schleimer/Wilkerson/Aiken, SIGMOD'03) fingerprint SET from
    * a staged positional-shingle-hash column: slide a window of `w`
    * consecutive shingle hashes, keep each window's minimum VALUE, distinct
    * the selections. Keeping values (not positions) makes the paper's
    * rightmost-tie rule irrelevant — the min value per window is unique
    * regardless of which position it came from — so the result is a pure
    * deterministic function of the hash sequence, replayable in SQL.
    *
    * Guarantee: any shared substring of ≥ w+k−1 tokens contributes at
    * least one common fingerprint; fingerprint density is ~2/(w+1) of the
    * shingle count, so downstream pair joins shuffle ~w/2× less than the
    * full shingle inverted index. Documents shorter than one window keep
    * their global min (one fingerprint) — never silently empty. */
  def winnowFromHashes(h: Column, w: Int): Column =
    when(size(h) === 0, array().cast("array<long>"))
      .when(size(h) < w, array(array_min(h)))
      .otherwise(
        array_distinct(
          transform(sequence(lit(1), size(h) - (w - 1)), j => array_min(slice(h, j, lit(w))))
        )
      )

  // ---- Text normalization ----------------------------------------------
  /** Canonical text normalization (round 6): lowercase, collapse every
    * whitespace run to one space, trim. The idempotent pre-pass every
    * hash-keyed dedup stage should share — exact dedup on raw text misses
    * `"A  b"` vs `"a b"`. Pure map-side string expression: zero shuffle,
    * codegen'd, linear in bytes at any scale. Spark `regexp_replace`
    * replaces ALL matches; the DuckDB mirror needs the explicit 'g' flag. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  // ---- Corpus statistics: collocations + vocabulary ---------------------
  /** Adjacent-token (bigram) collocations ranked by pointwise mutual
    * information: pmi = ln( (c_ab/M) / ((c_a/N)·(c_b/N)) ) with unigram
    * total N, bigram total M, and a min-count floor that kills the
    * PMI-loves-rare-pairs pathology. The tokenizer-merge shortlist / Gensim
    * `Phrases` shape. Scale: two hash-aggregates (map-side combined), the
    * count join keys on single words (vocab-sized, not corpus-sized),
    * scalars travel as broadcast 1-row aggregates, and the final cut is
    * TakeOrdered(topK) — no global sort, no pair explosion (adjacent
    * bigrams only, corpus-linear). Deterministic: counts are exact and the
    * rank orders by (pmi DESC, w1, w2) with pmi computed in one fixed
    * association order mirrored by the oracle. */
  def pmiPairs(docs: DataFrame, minCount: Int = 5, topK: Int = 50): DataFrame = {
    val tk = docs.select(tokens(col("text")).as("tk"))
    val uni = tk
      .select(explode(col("tk")).as("w"))
      .groupBy("w")
      .agg(count(lit(1)).as("c"))
    // native 2-token Shingles + substring_index (round 16, guide §4) —
    // tokens cannot contain the separator, so the split-back is exact
    val bi = tk
      .filter(size(col("tk")) >= 2)
      .select(explode(shinglesFromTokens(col("tk"), 2)).as("b"))
      .select(
        substring_index(col("b"), " ", 1).as("w1"),
        substring_index(col("b"), " ", -1).as("w2")
      )
      .groupBy("w1", "w2")
      .agg(count(lit(1)).as("c_ab"))
    val nTot = broadcast(uni.agg(sum(col("c")).cast("double").as("n")))
    val mTot = broadcast(bi.agg(sum(col("c_ab")).cast("double").as("m")))
    val u1 = uni.select(col("w").as("w1"), col("c").as("c_a"))
    val u2 = uni.select(col("w").as("w2"), col("c").as("c_b"))
    bi.filter(col("c_ab") >= minCount)
      .join(u1, "w1")
      .join(u2, "w2")
      .crossJoin(nTot)
      .crossJoin(mTot)
      .withColumn(
        "pmi",
        log(
          (col("c_ab").cast("double") / col("m")) /
            ((col("c_a").cast("double") / col("n")) * (col("c_b").cast("double") / col("n")))
        )
      )
      .orderBy(col("pmi").desc, col("w1").asc, col("w2").asc)
      .limit(topK)
      .select(col("w1"), col("w2"), col("c_ab"), col("c_a"), col("c_b"), col("pmi"))
  }

  /** Top-V vocabulary with cumulative corpus coverage: rank tokens by
    * (count DESC, token ASC), emit each token's corpus share and the
    * running coverage of the vocabulary prefix — the "how big must V be
    * for 95% coverage" curve every tokenizer budget decision reads.
    * Scale: one hash-aggregate + TakeOrdered(V); the coverage window runs
    * over the V retained rows only (V ≪ vocab), never the corpus. */
  def vocabulary(docs: DataFrame, topV: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val uni = docs
      .select(explode(tokens(col("text"))).as("w"))
      .groupBy("w")
      .agg(count(lit(1)).as("c"))
    val nTot = broadcast(uni.agg(sum(col("c")).cast("double").as("n")))
    val top = uni.orderBy(col("c").desc, col("w").asc).limit(topV)
    val wr = Window.orderBy(col("c").desc, col("w").asc)
    top
      .crossJoin(nTot)
      .withColumn("rank", row_number().over(wr))
      .withColumn("share", col("c").cast("double") / col("n"))
      .withColumn(
        "cum_share",
        sum(col("c")).over(wr.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("double") / col("n")
      )
      .select(col("rank"), col("w").as("token"), col("c").as("cnt"), col("share"), col("cum_share"))
  }
}
