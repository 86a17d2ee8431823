package graft.extensions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding tokenizer TRAINING (Sennrich et al.,
  * ACL 2016) — the canonical subword-vocabulary builder every pretraining
  * pipeline runs before it can even count tokens.
  *
  * Spark-first shape (and the 100 TB story):
  *  - Training runs over the WORD-TYPE dictionary, not the token stream:
  *    one corpus-wide shuffle builds `(word, count)` (heavy-tailed text →
  *    dict ≪ corpus; English web text is ~10⁷ types per 10¹¹ tokens),
  *    and every merge iteration after that touches only the cached dict.
  *  - Each iteration is one hash-aggregate over adjacent symbol pairs
  *    (weighted by word count) + a TakeOrderedAndProject(1) argmax —
  *    never a global sort; the driver holds one (left, right) pair.
  *  - Merge application is a codegen'd `aggregate` fold per word TYPE
  *    (greedy left-to-right, exactly the reference semantics), so a word
  *    occurring 10⁹ times is re-segmented once.
  *  - Encoding joins the (broadcast-sized) trained dict back onto the
  *    token stream — map-side only.
  *  - Production note: real vocab sizes (30–50k merges) batch compatible
  *    merges per pass and checkpoint the dict every few hundred rounds;
  *    this module keeps one-merge-per-pass because the driver oracle
  *    replays each argmax exactly (ExtensionQueries.bpeCtes unrolls the
  *    same rounds in DuckDB).
  *
  * Determinism contract: pair counts are exact longs; the argmax breaks
  * ties by (count DESC, left ASC, right ASC); the fold is greedy
  * left-to-right — all three replayed verbatim by the oracle's
  * wrap-and-replace spelling (validated: `replace('(a)(a)(a)…')` shares
  * no delimiter between adjacent matches, so DuckDB's non-overlapping
  * left-to-right replace IS the greedy fold).
  */
object Bpe {

  final case class Merge(rank: Int, l: String, r: String, c: Long)

  /** Per-doc lowercase-alpha word array (occurrence order) — the shared
    * extraction of the dict builder and the stateless streaming counter.
    */
  def streamWords(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+"), lit(0))

  /** Lowercase-alpha word-frequency dictionary — BPE's training unit.
    * Restricting symbols to [a-z]+ keeps every symbol parenthesis-free,
    * which the oracle's wrapped-symbol encoding relies on. */
  def wordDict(docs: DataFrame): DataFrame =
    docs
      .select(explode(regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))

  /** Character symbolization of a word column. */
  def charSyms(word: Column): Column =
    filter(split(word, ""), c => c =!= "")

  /** One greedy left-to-right merge pass over a symbol array: fold that
    * replaces each (l, r) adjacency with the concatenated symbol, never
    * re-matching the freshly merged output within the same pass (the
    * accumulator top is `l+r`, not `l`). Accumulator starts at the first
    * symbol so `element_at(acc, -1)` is always in bounds (ANSI-safe). */
  def applyMerge(syms: Column, l: String, r: String): Column =
    aggregate(
      slice(syms, lit(2), greatest(size(syms) - 1, lit(0))),
      array(element_at(syms, 1)),
      (acc, x) =>
        when(
          element_at(acc, -1) === lit(l) && x === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r)))
        ).otherwise(concat(acc, array(x)))
    )

  /** Symbolization under a full merge sequence — ONE codegen'd imperative
    * kernel per word (functions/BpeSegment.scala), O(rounds × |word|).
    * The per-merge HOF fold (applyMerge) can't be nested to production
    * merge counts: each level references its input 3×, so `rounds` nested
    * folds inline into a 3^rounds expression tree (12 rounds hung Catalyst
    * analysis before reading a row, and stacked attribute-threaded
    * projections still blew up in per-task lambda rebinding). applyMerge
    * stays as the executable one-merge spec; BpeSpec pins kernel == fold.
    */
  def segmentCol(word: Column, merges: Seq[Merge]): Column =
    call_function(
      "graft_bpe_segment",
      word,
      lit(merges.map(m => m.l + " " + m.r).mkString(","))
    )

  /** Train `rounds` BPE merges. Memo'd on (rounds, corpus plan): training
    * is run once and replayed from the stat cache by every consumer
    * (encode, specs, the oracle query) — the dict scan happens `rounds`+1
    * times total, never per caller. */
  def train(docs: DataFrame, rounds: Int): Array[Merge] =
    graft.CacheRegistry.memoStat(
      docs.sparkSession,
      s"bpe:train:$rounds:${graft.CacheRegistry.planKey(docs)}"
    ) {
      require(rounds >= 1, "rounds must be >= 1")
      graft.functions.Registry.register(docs.sparkSession)
      val dict = wordDict(docs).persist()
      try {
        val out = scala.collection.mutable.ArrayBuffer.empty[Merge]
        // Round t re-segments the cached dict with the t-1 merges found so
        // far via the single BpeSegment kernel — O(t) per word, no
        // expression-tree growth round over round.
        var t = 1
        var exhausted = false
        while (t <= rounds && !exhausted) {
          val top = dict
            .select(col("cnt"), segmentCol(col("word"), out.toSeq).as("syms"))
            .where(size(col("syms")) >= 2)
            .select(
              explode(
                transform(
                  sequence(lit(1), size(col("syms")) - 1),
                  i =>
                    struct(
                      element_at(col("syms"), i).as("l"),
                      element_at(col("syms"), i + 1).as("r")
                    )
                )
              ).as("p"),
              col("cnt")
            )
            .groupBy(col("p.l").as("l"), col("p.r").as("r"))
            .agg(sum(col("cnt")).as("c"))
            .orderBy(col("c").desc, col("l").asc, col("r").asc)
            .limit(1)
            .collect()
          if (top.isEmpty) exhausted = true
          else {
            val row = top.head
            val m = Merge(t, row.getString(0), row.getString(1), row.getLong(2))
            out += m
            t += 1
          }
        }
        out.toArray
      } finally dict.unpersist(blocking = false)
    }

  /** Encode the corpus with a trained merge sequence: per-doc symbol
    * counts before (chars) and after (BPE tokens) — the compression-ratio
    * column every tokenizer budget reads. The merges are applied once per
    * word TYPE (broadcast dict), then joined map-side onto the per-doc
    * word stream; docs with zero alpha words drop out (mirrored oracle).
    */
  def encode(docs: DataFrame, merges: Seq[Merge]): DataFrame = {
    graft.functions.Registry.register(docs.sparkSession)
    val dict = wordDict(docs)
      .select(
        col("word"),
        length(col("word")).cast("long").as("n_char"),
        size(segmentCol(col("word"), merges)).cast("long").as("n_sym")
      )
    docs
      .select(
        col("doc_id"),
        explode(regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0))).as("word")
      )
      .join(broadcast(dict), "word")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_words"),
        sum(col("n_char")).as("n_chars"),
        sum(col("n_sym")).as("n_bpe")
      )
      .withColumn("ratio", col("n_bpe").cast("double") / col("n_chars").cast("double"))
  }
}
