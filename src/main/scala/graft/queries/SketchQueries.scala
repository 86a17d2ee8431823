package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Graft
import graft.ta.{prim => P}
import graft.extensions.{Retrieval, Similarity, Sketch, TextOps}

/** Sketch / profiling / ETL-surface queries (round 5): the probabilistic
  * summaries a 100 TB pipeline uses where exact answers stop fitting —
  * KMV distinct counts, count-min frequencies, Bloom join pre-filtering —
  * plus deterministic hash-sampled quantiles, JSON property extraction,
  * and two-stage lexical→vector retrieval. All hashes are fixed-seed
  * modular arithmetic, so every DuckDB oracle replays the sketch
  * bit-for-bit (see graft.extensions.Sketch).
  */
object SketchQueries {

  private val PP: Long = Sketch.P
  private def seeds(n: Int): Seq[(Int, Long, Long)] =
    Sketch.seeds.take(n).zipWithIndex.map { case ((a, b), i) => (i, a, b) }

  /** DuckDB VALUES table of the first n hash seeds: s(j, a, b). */
  private def seedsSql(n: Int): String =
    "(VALUES " + seeds(n).map { case (j, a, b) => s"($j, $a, $b)" }.mkString(", ") + ") s(j, a, b)"

  /** DuckDB h_j(x) for seed columns (a, b) in scope. */
  private def rehashSql(x: String): String = s"(($x % $PP) * a + b) % $PP"

  /** DuckDB 2^b lookup table CTE fragment: p2t(p2) — index 64 is
    * Long.MinValue, same two's-complement table as Sketch.pow2. */
  private val p2Sql: String =
    "(SELECT [" + Sketch.pow2.mkString(", ") + "]::BIGINT[] AS p2) p2t"

  private def docs(s: SparkSession, dir: String): DataFrame = Graft.table(s, dir, "documents")

  // ---------------------------------------------------------------- x_kmv_distinct

  /** KMV distinct-shingle counts per source + global ('__ALL__'), exact vs
    * estimate. The sketch column is the scale path (bounded merge state, ≤k
    * longs per group over the shuffle); `count(DISTINCT)` rides along as
    * the in-query verification column. */
  val qKmvDistinct: Q = {
    val k = 128
    Q(
      "x_kmv_distinct",
      (s, dir) => {
        // memo the tokenize→shingle→hash pipeline: the per-source and
        // global branches (× the countDistinct expand) would otherwise
        // re-run the HOF chain four times (measured 4.6s → 0.6s at sf0.1)
        val sh = graft.CacheRegistry.memo(s, s"kmv:sh:$dir") {
          docs(s, dir)
            .select(col("source"), explode(TextOps.shingles(col("text"))).as("sng"))
            .select(col("source"), TextOps.polyHash(col("sng")).as("h"))
        }
        def agg1(g: DataFrame) =
          g.groupBy("source")
            .agg(Sketch.kmv(col("h"), k).as("kmv"), countDistinct(col("h")).as("n_exact"))
        agg1(sh)
          .unionByName(agg1(sh.withColumn("source", lit("__ALL__"))))
          .select(
            col("source"),
            col("n_exact"),
            P.normd(Sketch.kmvEstimate(col("kmv"), k)).as("n_est"),
            size(col("kmv")).cast("long").as("n_kmv")
          )
          .orderBy("source")
      },
      Some(
        s"WITH toks AS (${ExtensionQueries.toksCte}), " +
          "psh AS (SELECT source, CASE WHEN len(tk) >= 3 THEN " +
          "list_transform(range(1, len(tk) - 1), i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]) " +
          "ELSE [] END AS sg FROM toks), " +
          s"hh AS (SELECT source, unnest(list_transform(sg, x -> ${ExtensionQueries.ph("x")})) AS h FROM psh), " +
          "g AS (SELECT source, h FROM hh UNION ALL SELECT '__ALL__' AS source, h FROM hh), " +
          "a AS (SELECT source, count(DISTINCT h) AS n_exact, list_sort(list_distinct(list(h))) AS hs FROM g GROUP BY 1) " +
          s"SELECT source, CAST(n_exact AS BIGINT) AS n_exact, " +
          s"round(CASE WHEN len(hs) < $k THEN len(hs)::DOUBLE " +
          s"ELSE (${sqlgen.d((k - 1).toDouble)} * ${sqlgen.d(PP.toDouble)}) / CAST(hs[$k] AS DOUBLE) END, 6) AS n_est, " +
          s"CAST(least(len(hs), $k) AS BIGINT) AS n_kmv FROM a ORDER BY source"
      )
    )
  }

  // ---------------------------------------------------------------- x_cms_heavy

  /** Count-min heavy hitters: estimate the top-10 exact tokens' counts
    * from a 4×16 counter table. w=16 forces real collisions on this
    * vocabulary (≈60 terms / 16 buckets), so `n_over = est − exact ≥ 0`
    * is exercised with genuinely positive overestimates, not vacuous.
    * The counter table is d·w rows — broadcastable at any corpus size. */
  val qCmsHeavy: Q = {
    val (d, w) = (4, 16)
    Q(
      "x_cms_heavy",
      (s, dir) => {
        val t = docs(s, dir).select(explode(TextOps.tokens(col("text"))).as("term"))
        val counters = Sketch.cmsCounters(t, "term", d, w)
        val top = t
          .groupBy("term")
          .agg(count(lit(1)).as("n_exact"))
          .orderBy(col("n_exact").desc, col("term"))
          .limit(10)
        Sketch
          .cmsEstimate(top, "term", counters, d, w)
          .select(col("term"), col("n_exact"), col("n_est"), (col("n_est") - col("n_exact")).as("n_over"))
          .orderBy(col("n_exact").desc, col("term"))
      },
      Some(
        s"WITH toks AS (${ExtensionQueries.toksCte}), t AS (SELECT unnest(tk) AS term FROM toks), " +
          s"hh AS (SELECT term, ${ExtensionQueries.ph("term")} AS h FROM t), " +
          s"cnt AS (SELECT j, ${rehashSql("h")} % $w AS bkt, count(*) AS cnt FROM hh, ${seedsSql(d)} GROUP BY 1, 2), " +
          "ex AS (SELECT term, count(*) AS n_exact FROM t GROUP BY 1), " +
          "top AS (SELECT term, n_exact FROM ex ORDER BY n_exact DESC, term LIMIT 10), " +
          s"est AS (SELECT top.term, top.n_exact, min(cnt.cnt) AS n_est FROM top, ${seedsSql(d)} " +
          s"JOIN cnt ON cnt.j = s.j AND cnt.bkt = ((${ExtensionQueries.ph("top.term")} % $PP) * a + b) % $PP % $w " +
          "GROUP BY 1, 2) " +
          "SELECT term, CAST(n_exact AS BIGINT) AS n_exact, CAST(n_est AS BIGINT) AS n_est, " +
          "CAST(n_est - n_exact AS BIGINT) AS n_over FROM est ORDER BY n_exact DESC, term"
      )
    )
  }

  // ---------------------------------------------------------------- x_bloom_join

  /** Bloom-filter semi-join pre-filter: a 65536-bit / 3-hash filter over
    * the BUILDING-segment customer keys ships to the orders scan as a
    * literal word array — membership is a pure codegen'd expression, no
    * join, no shuffle on the probe side. Exact semi-join truth rides along
    * to count false positives and PROVE zero false negatives (n_missed=0
    * is a Bloom guarantee, and the oracle checks it). The same shape as
    * Spark's runtime row-level filtering, but deterministic/replayable. */
  val qBloomJoin: Q = {
    val (bits, kH) = (65536, 3)
    Q(
      "x_bloom_join",
      (s, dir) => {
        val cust = Graft
          .table(s, dir, "customer")
          .where(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey"))
        val words = Sketch.bloomBuild(cust, "c_custkey", bits, kH)
        Graft
          .table(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"))
          .withColumn("pass", Sketch.bloomContains(col("o_custkey"), words, bits, kH))
          .join(
            broadcast(cust.distinct().withColumn("__t", lit(true))),
            col("o_custkey") === col("c_custkey"),
            "left"
          )
          .withColumn("truth", coalesce(col("__t"), lit(false)))
          .agg(
            count(lit(1)).as("n_probe"),
            count(when(col("pass"), 1)).as("n_pass"),
            count(when(col("truth"), 1)).as("n_true"),
            count(when(col("pass") && !col("truth"), 1)).as("n_fp"),
            count(when(col("truth") && !col("pass"), 1)).as("n_missed")
          )
      },
      Some(
        s"WITH bc AS (SELECT DISTINCT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'), " +
          s"hs AS (SELECT ${rehashSql("k")} % $bits AS h FROM bc, ${seedsSql(kH)}), " +
          "wb AS (SELECT DISTINCT h // 64 AS w, h % 64 AS bit FROM hs), " +
          s"words AS (SELECT w, CAST(sum(p2[bit + 1]) AS BIGINT) AS mask FROM wb, $p2Sql GROUP BY 1), " +
          s"phh AS (SELECT o_orderkey, o_custkey, ${rehashSql("o_custkey")} % $bits AS h FROM orders, ${seedsSql(kH)}), " +
          s"pt AS (SELECT o_orderkey, any_value(o_custkey) AS ck, " +
          "count(*) FILTER (WHERE (coalesce(w.mask, 0) & p2[(h % 64) + 1]) <> 0) AS ok, count(*) AS tot " +
          s"FROM phh CROSS JOIN $p2Sql LEFT JOIN words w ON w.w = h // 64 GROUP BY o_orderkey), " +
          "fl AS (SELECT o_orderkey, ok = tot AS pass, ck IN (SELECT k FROM bc) AS truth FROM pt) " +
          "SELECT CAST(count(*) AS BIGINT) AS n_probe, " +
          "CAST(count(*) FILTER (WHERE pass) AS BIGINT) AS n_pass, " +
          "CAST(count(*) FILTER (WHERE truth) AS BIGINT) AS n_true, " +
          "CAST(count(*) FILTER (WHERE pass AND NOT truth) AS BIGINT) AS n_fp, " +
          "CAST(count(*) FILTER (WHERE truth AND NOT pass) AS BIGINT) AS n_missed FROM fl"
      )
    )
  }

  // ---------------------------------------------------------------- x_hash_quantiles

  /** Deterministic hash-sampled quantiles: nearest-rank p50/p90/p99 of
    * n_chars per source, on the full data and on a ~10% content-hash
    * sample side by side. Ranks are pure integer arithmetic (ceil(q·n) =
    * (q·100·n + q·100 − 1-free form via (a·n + a) div b), so there is no
    * FP boundary to disagree on. The sample predicate is the same
    * fixed-seed rehash as every other sketch — reproducible at any scale,
    * no RNG. */
  val qHashQuantiles: Q = {
    val thr = 100000000L // P/10 → ~10% sample
    Q(
      "x_hash_quantiles",
      (s, dir) => {
        val d = docs(s, dir).select(col("doc_id"), col("source"), col("n_chars"))
        def ranked(dfX: DataFrame, tag: String): DataFrame = {
          val wS = Window.partitionBy("source").orderBy(col("n_chars"), col("doc_id"))
          val wC = Window.partitionBy("source")
          dfX
            .withColumn("rn", row_number().over(wS).cast("long"))
            .withColumn("n", count(lit(1)).over(wC))
            .groupBy("source")
            .agg(
              max(col("n")).as(s"n_$tag"),
              min(when(col("rn") === expr("(n + 1) div 2"), col("n_chars"))).as(s"p50_$tag"),
              min(when(col("rn") === expr("(9 * n + 9) div 10"), col("n_chars"))).as(s"p90_$tag"),
              min(when(col("rn") === expr("(99 * n + 99) div 100"), col("n_chars"))).as(s"p99_$tag")
            )
        }
        val full = ranked(d, "full")
        val samp = ranked(d.where(Sketch.rehash(col("doc_id"), 0) < thr), "samp")
        full
          .join(samp, Seq("source"), "left")
          .select(
            col("source"),
            col("n_full"),
            col("p50_full"),
            col("p90_full"),
            col("p99_full"),
            coalesce(col("n_samp"), lit(0L)).as("n_samp"),
            col("p50_samp"),
            col("p90_samp"),
            col("p99_samp")
          )
          .orderBy("source")
      },
      Some {
        val (a0, b0) = Sketch.seeds.head
        def rankedSql(src: String, tag: String): String =
          s"(SELECT source, max(n) AS n_$tag, " +
            s"min(CASE WHEN rn = (n + 1) // 2 THEN n_chars END) AS p50_$tag, " +
            s"min(CASE WHEN rn = (9 * n + 9) // 10 THEN n_chars END) AS p90_$tag, " +
            s"min(CASE WHEN rn = (99 * n + 99) // 100 THEN n_chars END) AS p99_$tag FROM " +
            "(SELECT source, n_chars, row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn, " +
            s"count(*) OVER (PARTITION BY source) AS n FROM $src) GROUP BY source)"
        "WITH d AS (SELECT doc_id, source, n_chars FROM documents), " +
          s"sm AS (SELECT * FROM d WHERE ((doc_id % $PP) * $a0 + $b0) % $PP < $thr), " +
          s"fa AS ${rankedSql("d", "full")}, sa AS ${rankedSql("sm", "samp")} " +
          "SELECT fa.source, n_full, p50_full, p90_full, p99_full, " +
          "coalesce(n_samp, 0) AS n_samp, p50_samp, p90_samp, p99_samp " +
          "FROM fa LEFT JOIN sa ON fa.source = sa.source ORDER BY fa.source"
      }
    )
  }

  // ---------------------------------------------------------------- x_json_extract

  /** JSON property extraction over the events stream — the ubiquitous
    * semi-structured ETL step. `get_json_object` stays inside whole-stage
    * codegen; at 100 TB the parse cost is per-row CPU on the scan with no
    * shuffle beyond the final key-sized aggregate. */
  val qJsonExtract: Q = Q(
    "x_json_extract",
    (s, dir) =>
      Graft
        .table(s, dir, "events")
        .select(col("event_type"), get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          P.normd(sum(col("k")).cast("double") / count(lit(1))).as("avg_k")
        )
        .orderBy("event_type"),
    Some(
      "SELECT event_type, CAST(count(*) AS BIGINT) AS n, CAST(sum(k) AS BIGINT) AS sum_k, " +
        "round(CAST(sum(k) AS DOUBLE) / count(*), 6) AS avg_k FROM " +
        "(SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events) " +
        "GROUP BY 1 ORDER BY 1"
    )
  )

  // ---------------------------------------------------------------- x_retrieve_rerank

  /** Two-stage retrieval: BM25 recalls a 20-candidate pool (lexical,
    * TakeOrdered — never a global sort), then the pool re-ranks by
    * embedding cosine against the top lexical hit's vector (the hybrid
    * search shape: cheap recall over the whole corpus, expensive scoring
    * over k' candidates only). At 100 TB stage 2 touches 20 rows. */
  val qRetrieveRerank: Q = {
    val terms = Seq("spark", "window", "agg")
    val pool = 20
    Q(
      "x_retrieve_rerank",
      (s, dir) => {
        val cand = Retrieval
          .bm25(docs(s, dir), terms, topK = pool)
          .select(col("doc_id"), col("score"))
        val e = Graft
          .table(s, dir, "embeddings")
          .select(col("vec_id").as("doc_id"), col("embedding"))
        val ce = cand.join(e, "doc_id")
        val q1 = ce
          .orderBy(col("score").desc, col("doc_id"))
          .limit(1)
          .select(col("embedding").as("q_emb"))
        // no trailing orderBy: the gate sorts rows itself, and a global
        // Sort node — even over 5 rows — would fail the plan-shape test
        ce.crossJoin(broadcast(q1))
          .withColumn("cos", Similarity.dot(col("embedding"), col("q_emb")))
          .orderBy(col("cos").desc, col("doc_id"))
          .limit(5)
          .select(col("doc_id"), P.normd(col("score")).as("bm25"), P.normd(col("cos")).as("cos"))
      },
      Some {
        import graft.queries.{sqlgen => G}
        val (k1, b) = (1.2, 0.75)
        val termList = terms.map(t => s"'$t'").mkString(", ")
        val dot = ExtensionQueries.dotSql("ce.embedding", "q1.q_emb")
        s"WITH toks AS (${ExtensionQueries.toksCte}), " +
          "dd AS (SELECT doc_id, tk, len(tk)::DOUBLE AS dl FROM toks), " +
          "t AS (SELECT doc_id, dl, unnest(tk) AS term FROM dd), " +
          s"tf AS (SELECT doc_id, dl, term, count(*)::DOUBLE AS tf FROM t WHERE term IN ($termList) GROUP BY 1, 2, 3), " +
          "df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1), " +
          "st AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dd), " +
          s"sc AS (SELECT tf.doc_id, tf.term, ln((st.n - df.df + ${G.d(0.5)}) / (df.df + ${G.d(0.5)}) + ${G.d(1.0)}) " +
          s"* (tf.tf * (${G.d(k1 + 1.0)})) / (tf.tf + ${G.d(k1)} * (${G.d(1.0)} - ${G.d(b)} + ${G.d(b)} * tf.dl / st.avgdl)) AS s " +
          "FROM tf JOIN df USING (term) CROSS JOIN st), " +
          "bm AS (SELECT doc_id, list_reduce(list(s ORDER BY term), (a, x) -> a + x) AS score FROM sc GROUP BY doc_id " +
          s"ORDER BY score DESC, doc_id LIMIT $pool), " +
          "ce AS (SELECT bm.doc_id, bm.score, e.embedding FROM bm JOIN embeddings e ON e.vec_id = bm.doc_id), " +
          "q1 AS (SELECT embedding AS q_emb FROM ce ORDER BY score DESC, doc_id LIMIT 1) " +
          s"SELECT ce.doc_id, round(ce.score, 6) AS bm25, round($dot, 6) AS cos " +
          s"FROM ce, q1 ORDER BY $dot DESC, ce.doc_id LIMIT 5"
      }
    )
  }

  // ---------------------------------------------------------------- x_hist_quantiles

  /** MERGEABLE histogram quantiles (per event_type over events.value):
    * a 128-bucket equi-width histogram is the quantile summary that
    * merges by pure counter addition — the distributed/streaming shape
    * ([[x_hash_quantiles]] samples instead; this bounds error by bucket
    * width, not sampling variance). Estimate = left edge of the first
    * bucket whose cumulative count reaches the nearest-rank target;
    * exact nearest-rank quantiles ride along as the error witness.
    * Mergeability (half-histograms sum to the whole) is spec-asserted;
    * every FP step (bucket assignment, edge reconstruction) is fixed-
    * order so the oracle replays it bit-for-bit. */
  val qHistQuantiles: Q = {
    val B = 128
    Q(
      "x_hist_quantiles",
      (s, dir) => {
        val d = Graft.table(s, dir, "events").select(col("event_id"), col("event_type"), col("value"))
        val stats = d
          .groupBy("event_type")
          .agg(min("value").as("mn"), max("value").as("mx"), count(lit(1)).as("n"))
        val hist = Sketch
          .histCounters(d, "event_type", "value", stats, B)
          .withColumnRenamed("__bkt", "bkt")
          .withColumnRenamed("__cnt", "cnt")
        val wCum = Window
          .partitionBy("event_type")
          .orderBy("bkt")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = hist
          .withColumn("cum", sum("cnt").over(wCum))
          .join(broadcast(stats), "event_type")
        val edge = col("mn") + col("bkt").cast("double") * ((col("mx") - col("mn")) / lit(B.toDouble))
        def est(rank: String, out: String) =
          min(when(col("cum") >= expr(rank), edge)).as(out)
        val ests = cum
          .groupBy("event_type")
          .agg(
            max(col("n")).as("n"),
            est("(n + 1) div 2", "p50_est"),
            est("(9 * n + 9) div 10", "p90_est"),
            est("(99 * n + 99) div 100", "p99_est")
          )
        val wS = Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))
        val exact = d
          .withColumn("rn", row_number().over(wS).cast("long"))
          .join(broadcast(stats.select(col("event_type"), col("n"))), "event_type")
          .groupBy("event_type")
          .agg(
            min(when(col("rn") === expr("(n + 1) div 2"), col("value"))).as("p50_exact"),
            min(when(col("rn") === expr("(9 * n + 9) div 10"), col("value"))).as("p90_exact"),
            min(when(col("rn") === expr("(99 * n + 99) div 100"), col("value"))).as("p99_exact")
          )
        ests
          .join(exact, "event_type")
          .select(
            col("event_type"),
            col("n"),
            P.normd(col("p50_exact")).as("p50_exact"),
            P.normd(col("p50_est")).as("p50_est"),
            P.normd(col("p90_exact")).as("p90_exact"),
            P.normd(col("p90_est")).as("p90_est"),
            P.normd(col("p99_exact")).as("p99_exact"),
            P.normd(col("p99_est")).as("p99_est")
          )
          .orderBy("event_type")
      },
      Some {
        def edgeSql = s"st.mn + bkt * ((st.mx - st.mn) / ${B}e0)"
        def estSql(rank: String, out: String) =
          s"min(CASE WHEN cum >= $rank THEN $edgeSql END) AS $out"
        "WITH d AS (SELECT event_id, event_type, value FROM events), " +
          "st AS (SELECT event_type, min(value) AS mn, max(value) AS mx, count(*) AS n FROM d GROUP BY 1), " +
          "h AS (SELECT d.event_type, CASE WHEN st.mx = st.mn THEN 0 " +
          s"ELSE least(CAST(floor((value - st.mn) / (st.mx - st.mn) * ${B}e0) AS BIGINT), ${B - 1}) END AS bkt, " +
          "count(*) AS cnt FROM d JOIN st USING (event_type) GROUP BY 1, 2), " +
          "c AS (SELECT event_type, bkt, cnt, sum(cnt) OVER (PARTITION BY event_type ORDER BY bkt " +
          "ROWS UNBOUNDED PRECEDING) AS cum FROM h), " +
          "est AS (SELECT c.event_type, max(st.n) AS n, " +
          estSql("(st.n + 1) // 2", "p50_est") + ", " +
          estSql("(9 * st.n + 9) // 10", "p90_est") + ", " +
          estSql("(99 * st.n + 99) // 100", "p99_est") +
          " FROM c JOIN st USING (event_type) GROUP BY 1), " +
          "r AS (SELECT event_type, value, row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn FROM d), " +
          "ex AS (SELECT r.event_type, " +
          "min(CASE WHEN rn = (st.n + 1) // 2 THEN value END) AS p50_exact, " +
          "min(CASE WHEN rn = (9 * st.n + 9) // 10 THEN value END) AS p90_exact, " +
          "min(CASE WHEN rn = (99 * st.n + 99) // 100 THEN value END) AS p99_exact " +
          "FROM r JOIN st USING (event_type) GROUP BY 1) " +
          "SELECT est.event_type, CAST(est.n AS BIGINT) AS n, " +
          "round(p50_exact, 6) AS p50_exact, round(p50_est, 6) AS p50_est, " +
          "round(p90_exact, 6) AS p90_exact, round(p90_est, 6) AS p90_est, " +
          "round(p99_exact, 6) AS p99_exact, round(p99_est, 6) AS p99_est " +
          "FROM est JOIN ex USING (event_type) ORDER BY event_type"
      }
    )
  }

  // ---------------------------------------------------------------- x_rrf_fusion

  /** Reciprocal-rank fusion of the BM25 lexical top-20 and the vector
    * cosine top-20 (query = embedding 0) — the calibration-free hybrid-
    * search merge (1/(60+rank) per list, absent ⇒ 0). Both pools are
    * TakeOrdered-sized; the fuse is a 20×20 full outer join. */
  val qRrfFusion: Q = {
    val terms = Seq("table", "scan", "fast", "window")
    val pool = 20
    Q(
      "x_rrf_fusion",
      (s, dir) => {
        val lex = Retrieval
          .bm25(docs(s, dir), terms, topK = pool)
          .withColumn("rank", row_number().over(Window.orderBy(col("score").desc, col("doc_id").asc)))
          .select("doc_id", "rank")
        val e = Graft.table(s, dir, "embeddings")
        val vec = Similarity
          .topkBrute(e, e.where(col("vec_id") === 0), pool)
          .select(col("nbr_id").as("doc_id"), col("rk").as("rank"))
        Retrieval
          .rrfFuse(lex, vec, kk = 60, topK = 10)
          .select(col("doc_id"), col("r_lex"), col("r_vec"), P.normd(col("rrf")).as("rrf"))
      },
      Some {
        import graft.queries.{sqlgen => G}
        val (k1, b) = (1.2, 0.75)
        val termList = terms.map(t => s"'$t'").mkString(", ")
        val dot = ExtensionQueries.dotSql("c.embedding", "q1.q_emb")
        val rrf = "coalesce(1e0/(60 + l.r_lex), 0e0) + coalesce(1e0/(60 + v.r_vec), 0e0)"
        s"WITH toks AS (${ExtensionQueries.toksCte}), " +
          "dd AS (SELECT doc_id, tk, len(tk)::DOUBLE AS dl FROM toks), " +
          "t AS (SELECT doc_id, dl, unnest(tk) AS term FROM dd), " +
          s"tf AS (SELECT doc_id, dl, term, count(*)::DOUBLE AS tf FROM t WHERE term IN ($termList) GROUP BY 1, 2, 3), " +
          "df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1), " +
          "st AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dd), " +
          s"sc AS (SELECT tf.doc_id, tf.term, ln((st.n - df.df + ${G.d(0.5)}) / (df.df + ${G.d(0.5)}) + ${G.d(1.0)}) " +
          s"* (tf.tf * (${G.d(k1 + 1.0)})) / (tf.tf + ${G.d(k1)} * (${G.d(1.0)} - ${G.d(b)} + ${G.d(b)} * tf.dl / st.avgdl)) AS s " +
          "FROM tf JOIN df USING (term) CROSS JOIN st), " +
          "bm AS (SELECT doc_id, list_reduce(list(s ORDER BY term), (a, x) -> a + x) AS score FROM sc GROUP BY doc_id " +
          s"ORDER BY score DESC, doc_id LIMIT $pool), " +
          "lexr AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r_lex FROM bm), " +
          "q1 AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0), " +
          "vr AS (SELECT doc_id, r_vec FROM (SELECT c.vec_id AS doc_id, " +
          s"row_number() OVER (ORDER BY $dot DESC, c.vec_id) AS r_vec " +
          s"FROM embeddings c, q1 WHERE c.vec_id <> 0) WHERE r_vec <= $pool) " +
          "SELECT coalesce(l.doc_id, v.doc_id) AS doc_id, l.r_lex, v.r_vec, " +
          s"round($rrf, 6) AS rrf " +
          "FROM lexr l FULL JOIN vr v ON l.doc_id = v.doc_id " +
          s"ORDER BY $rrf DESC, doc_id LIMIT 10"
      }
    )
  }

  // ---------------------------------------------------------------- x_mmr_rerank

  /** MMR-diversified re-rank of the cosine top-20 pool for query vector
    * 0: greedy λ·relevance − (1−λ)·redundancy selection of 5 (SIGIR'98).
    * The oracle UNROLLS the greedy iterations as chained CTEs (pool and
    * pairwise-sim tables once, one argmax CTE per pick), replaying the
    * driver-side fold bit-for-bit. */
  val qMmrRerank: Q = {
    val (pool, k, lambda) = (20, 5, 0.7)
    val mu = 1.0 - lambda
    Q(
      "x_mmr_rerank",
      (s, dir) => {
        val e = Graft.table(s, dir, "embeddings")
        val p = Similarity
          .topkBrute(e, e.where(col("vec_id") === 0), pool)
          .select(col("nbr_id").as("doc_id"), col("sim").as("simq"))
          .join(e.select(col("vec_id").as("doc_id"), col("embedding")), "doc_id")
        Retrieval
          .mmrRerank(p, k, lambda)
          .select(col("doc_id"), col("rk"), P.normd(col("mmr")).as("mmr"))
          .orderBy("rk")
      },
      Some {
        import graft.queries.{sqlgen => G}
        val dq = ExtensionQueries.dotSql("c.embedding", "q1.q_emb")
        val (l, m) = (G.d(lambda), G.d(mu))
        val base =
          "WITH q1 AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0), " +
            s"pool AS (SELECT c.vec_id AS doc_id, c.embedding, $dq AS simq " +
            s"FROM embeddings c, q1 WHERE c.vec_id <> 0 ORDER BY $dq DESC, c.vec_id LIMIT $pool), " +
            s"ps AS (SELECT a.doc_id AS ai, b.doc_id AS bi, ${ExtensionQueries.dotSql("a.embedding", "b.embedding")} AS s " +
            "FROM pool a, pool b), " +
            s"s1 AS (SELECT doc_id, $l * simq AS mmr FROM pool ORDER BY $l * simq DESC, doc_id LIMIT 1)"
        val iters = (2 to k)
          .map { i =>
            val selU = (1 until i).map(j => s"SELECT doc_id FROM s$j").mkString(" UNION ALL ")
            s"c$i AS (SELECT p.doc_id, $l * p.simq - $m * max(ps.s) AS mmr FROM pool p " +
              s"JOIN ps ON ps.ai = p.doc_id JOIN ($selU) sel ON ps.bi = sel.doc_id " +
              s"WHERE p.doc_id NOT IN ($selU) GROUP BY p.doc_id, p.simq), " +
              s"s$i AS (SELECT doc_id, mmr FROM c$i ORDER BY mmr DESC, doc_id LIMIT 1)"
          }
          .mkString(", ")
        val sel = (1 to k)
          .map(i => s"SELECT doc_id, CAST($i AS BIGINT) AS rk, round(mmr, 6) AS mmr FROM s$i")
          .mkString(" UNION ALL ")
        s"$base, $iters SELECT * FROM ($sel) ORDER BY rk"
      }
    )
  }

  // ---------------------------------------------------------------- x_shard_manifest

  /** Shard manifest over the packed-sequence layout: per shard, the doc
    * and token counts, the packed chunk count, and an order-insensitive
    * content digest (bit_xor of per-doc polyHashes). This is the export
    * reproducibility contract a training pipeline ships next to its
    * shards: a re-run must produce identical manifests, and any flipped
    * byte in any document flips its shard's digest. All-integer output;
    * xor is associative/commutative, so partial aggregation order cannot
    * change it at any scale. */
  val qShardManifest: Q = Q(
    "x_shard_manifest",
    (s, dir) => {
      val d = docs(s, dir)
      TextOps
        .packSequences(d, contextLen = 256, shards = 8)
        .join(d.select(col("doc_id"), TextOps.polyHash(col("text")).as("ph")), "doc_id")
        .groupBy("shard")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("n_tokens"),
          (max(col("chunk_end")) + 1).as("n_chunks"),
          expr("bit_xor(ph)").as("digest")
        )
        .orderBy("shard")
    },
    Some(
      s"WITH toks AS (${ExtensionQueries.toksCte}), " +
        "base AS (SELECT doc_id, doc_id % 8 AS shard, CAST(len(tk) AS BIGINT) AS n_tok, " +
        s"${ExtensionQueries.ph("text")} AS ph FROM toks), " +
        "packed AS (SELECT doc_id, shard, n_tok, ph, " +
        "sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS tok_end FROM base) " +
        "SELECT shard, CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens, " +
        "CAST(max(CASE WHEN n_tok > 0 THEN CAST(floor((tok_end - 1) / 256e0) AS BIGINT) END) + 1 AS BIGINT) AS n_chunks, " +
        "bit_xor(ph) AS digest FROM packed GROUP BY shard ORDER BY shard"
    )
  )

  // ---------------------------------------------------------------- x_shard_stats

  /** Per-shard ZONE-MAP stats beside the export manifest: min/max of the
    * sort/range columns (what file skipping prunes on) plus per-column
    * NDV (what dictionary encoding and join planning read). A pipeline
    * ships this next to its shards so a reader can prove a predicate
    * prunes N of M shards WITHOUT opening them — the same contract
    * parquet row-group statistics provide, lifted to shard granularity.
    * All-integer output; exact at any scale (one hash-aggregate). */
  val qShardStats: Q = Q(
    "x_shard_stats",
    (s, dir) =>
      docs(s, dir)
        .withColumn("shard", col("doc_id") % 8)
        .groupBy("shard")
        .agg(
          count(lit(1)).as("n_docs"),
          min("doc_id").as("min_id"),
          max("doc_id").as("max_id"),
          min("n_chars").as("min_chars"),
          max("n_chars").as("max_chars"),
          countDistinct("lang").as("ndv_lang"),
          countDistinct("source").as("ndv_source")
        )
        .orderBy("shard"),
    Some(
      "SELECT doc_id % 8 AS shard, CAST(count(*) AS BIGINT) AS n_docs, " +
        "min(doc_id) AS min_id, max(doc_id) AS max_id, " +
        "min(n_chars) AS min_chars, max(n_chars) AS max_chars, " +
        "CAST(count(DISTINCT lang) AS BIGINT) AS ndv_lang, " +
        "CAST(count(DISTINCT source) AS BIGINT) AS ndv_source " +
        "FROM documents GROUP BY 1 ORDER BY 1"
    )
  )

  // ---------------------------------------------------------------- x_kmv_overlap

  /** Corpus-overlap estimation from MERGED KMV sketches: per source pair,
    * the estimated distinct-shingle intersection (Beyer et al. k-set
    * estimator) against the exact inverted-index answer riding along.
    * The sketch path never joins the corpora — per-source sketches merge
    * in O(k), which is how train/eval overlap gets measured at 100 TB
    * (the exact column is a full co-occurrence join, the thing the
    * sketch exists to avoid). Estimator granularity is unionEst/k (each
    * merged-set element "weighs" ~22 shingles at k=128 on this corpus),
    * so k=512 here: absolute error on the ~100-350-element intersections
    * drops to a few elements' weight while the sketch stays 4 KB. */
  val qKmvOverlap: Q = {
    val k = 512
    Q(
      "x_kmv_overlap",
      (s, dir) => {
        val sh = graft.CacheRegistry.memo(s, s"kmv:sh:$dir") {
          docs(s, dir)
            .select(col("source"), explode(TextOps.shingles(col("text"))).as("sng"))
            .select(col("source"), TextOps.polyHash(col("sng")).as("h"))
        }
        val sk = sh.groupBy("source").agg(Sketch.kmv(col("h"), k).as("kmv"))
        val dh = sh.distinct()
        val exact = dh
          .as("x")
          .join(dh.as("y"), col("x.h") === col("y.h") && col("x.source") < col("y.source"))
          .groupBy(col("x.source").as("src_a"), col("y.source").as("src_b"))
          .agg(count(lit(1)).as("n_exact"))
        sk.as("a")
          .join(sk.as("b"), col("a.source") < col("b.source"))
          .select(
            col("a.source").as("src_a"),
            col("b.source").as("src_b"),
            P.normd(Sketch.kmvIntersectEstimate(col("a.kmv"), col("b.kmv"), k)).as("n_est"),
            P.normd(Sketch.kmvUnionEstimate(col("a.kmv"), col("b.kmv"), k)).as("n_union_est")
          )
          .join(exact, Seq("src_a", "src_b"), "left")
          .withColumn("n_exact", coalesce(col("n_exact"), lit(0L)))
          .orderBy("src_a", "src_b")
      },
      Some(
        s"WITH toks AS (${ExtensionQueries.toksCte}), " +
          "psh AS (SELECT source, CASE WHEN len(tk) >= 3 THEN " +
          "list_transform(range(1, len(tk) - 1), i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]) " +
          "ELSE [] END AS sg FROM toks), " +
          s"hh AS (SELECT DISTINCT source, unnest(list_transform(sg, x -> ${ExtensionQueries.ph("x")})) AS h FROM psh), " +
          s"sk AS (SELECT source, list_sort(list_distinct(list(h)))[1:$k] AS kmv FROM hh GROUP BY 1), " +
          "ex AS (SELECT x.source AS src_a, y.source AS src_b, count(*) AS n_exact " +
          "FROM hh x JOIN hh y ON x.h = y.h AND x.source < y.source GROUP BY 1, 2), " +
          "pr AS (SELECT a.source AS src_a, b.source AS src_b, " +
          s"list_sort(list_distinct(a.kmv || b.kmv))[1:$k] AS merged, a.kmv AS ak, b.kmv AS bk " +
          "FROM sk a JOIN sk b ON a.source < b.source), " +
          "es AS (SELECT src_a, src_b, " +
          s"CASE WHEN len(merged) < $k THEN len(list_filter(ak, x -> list_contains(bk, x)))::DOUBLE " +
          s"ELSE len(list_filter(merged, x -> list_contains(ak, x) AND list_contains(bk, x)))::DOUBLE / $k * " +
          s"((${sqlgen.d((k - 1).toDouble)} * ${sqlgen.d(PP.toDouble)}) / CAST(merged[$k] AS DOUBLE)) END AS n_est, " +
          s"CASE WHEN len(merged) < $k THEN len(merged)::DOUBLE " +
          s"ELSE (${sqlgen.d((k - 1).toDouble)} * ${sqlgen.d(PP.toDouble)}) / CAST(merged[$k] AS DOUBLE) END AS n_union_est " +
          "FROM pr) " +
          "SELECT es.src_a, es.src_b, round(n_est, 6) AS n_est, round(n_union_est, 6) AS n_union_est, " +
          "CAST(coalesce(ex.n_exact, 0) AS BIGINT) AS n_exact " +
          "FROM es LEFT JOIN ex ON es.src_a = ex.src_a AND es.src_b = ex.src_b " +
          "ORDER BY es.src_a, es.src_b"
      )
    )
  }

  val all: Seq[Q] = Seq(
    qKmvDistinct,
    qCmsHeavy,
    qBloomJoin,
    qHashQuantiles,
    qHistQuantiles,
    qJsonExtract,
    qRetrieveRerank,
    qRrfFusion,
    qMmrRerank,
    qShardManifest,
    qShardStats,
    qKmvOverlap
  )
}
