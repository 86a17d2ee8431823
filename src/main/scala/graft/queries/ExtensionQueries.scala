package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Graft
import graft.ta.{prim => P}
import graft.extensions.{Dedup, Media, Similarity, TextOps}

/** LLM-data-pipeline extension queries (SURVEY.md §2.F / §2.G Q46–Q48):
  * dedup, near-dup, similarity search, text analysis, multimodal plumbing —
  * each paired with a structurally identical DuckDB oracle.
  *
  * Hash portability contract: every hash is explicit modular arithmetic
  * (TextOps.polyHash base 31 mod 1e9+7). DuckDB `list_reduce` has no
  * initial accumulator (starts at the first element); Spark `aggregate`
  * starts at 0 — identical results because (0·31 + c₁) = c₁.
  */
object ExtensionQueries {

  private val P0: Long = TextOps.P

  // ---------------------------------------------------------------- SQL helpers
  /** tokens CTE fragment: tk = non-empty whitespace tokens. */
  private[queries] val toksCte =
    "SELECT *, list_filter(string_split(text, ' '), t -> t <> '') AS tk FROM documents"

  /** polyHash of a string expression (DuckDB side). */
  private[queries] def ph(s: String): String =
    s"list_reduce(list_transform(string_split($s, ''), c -> CAST(unicode(c) AS BIGINT)), " +
      s"(acc, x) -> (acc * 31 + x) % $P0)"

  /** distinct 3-shingle list from tk. */
  private val shExpr =
    "CASE WHEN len(tk) >= 3 THEN list_distinct(list_transform(range(1, len(tk) - 1), " +
      "i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) ELSE [] END"

  /** per-doc shingle base-hash list CTE chain (docs → toks → sh → bases). */
  private val basesCtes =
    s"toks AS ($toksCte), sh AS (SELECT doc_id, $shExpr AS s FROM toks), " +
      s"bases AS (SELECT doc_id, list_transform(s, x -> ${ph("x")}) AS bh, len(s) AS n_sh FROM sh)"

  /** Positional-shingle → winnowing-fingerprint CTE chain (mirror of
    * TextOps.posShingleHashes + winnowFromHashes: non-distinct shingles in
    * document order, window-of-w minima, distinct values). */
  private def winnowCtes(w: Int): String =
    s"toks AS ($toksCte), psh AS (SELECT doc_id, CASE WHEN len(tk) >= 3 THEN " +
      "list_transform(range(1, len(tk) - 1), i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]) " +
      "ELSE [] END AS s FROM toks), " +
      s"hs AS (SELECT doc_id, list_transform(s, x -> ${ph("x")}) AS h FROM psh), " +
      s"fps AS (SELECT doc_id, CASE WHEN len(h) = 0 THEN [] WHEN len(h) < $w THEN [list_min(h)] " +
      s"ELSE list_distinct(list_transform(range(1, len(h) - ${w - 1} + 1), j -> list_min(h[j:j+${w - 1}]))) " +
      "END AS fps FROM hs)"

  /** Pair CTEs for exact shingle-Jaccard via the INVERTED-INDEX join —
    * the same shape the engine uses, and (unlike the earlier brute cross
    * join with per-pair list_intersect) non-quadratic in docs, so the
    * oracle finishes at sf0.1 where the cross join DNF'd. Value-identical
    * to brute force: s is distinct, so co = |A∩B| and |A∪B| = nA+nB−co;
    * any pair with jac ≥ threshold > 0 shares a shingle and is generated.
    * `cond` filters the ordered (a, b) pair space. */
  private def jacIdxCtes(cond: String): String =
    s"$basesCtes, post AS (SELECT doc_id, unnest(s) AS sng FROM sh), " +
      "sz AS (SELECT doc_id, len(s) AS n FROM sh), " +
      "co AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS co " +
      s"FROM post a JOIN post b ON a.sng = b.sng WHERE $cond GROUP BY 1, 2), " +
      "jc AS (SELECT a_id, b_id, co::DOUBLE / (sa.n + sb.n - co) AS jac FROM co " +
      "JOIN sz sa ON sa.doc_id = co.a_id JOIN sz sb ON sb.doc_id = co.b_id)"

  /** Exact pairwise shingle-Jaccard ≥ threshold (inverted-index join). */
  private def jacPairsSql(threshold: Double): String =
    s"WITH ${jacIdxCtes("a.doc_id < b.doc_id")} " +
      s"SELECT a_id, b_id, round(jac, 6) AS jac FROM jc WHERE jac >= $threshold ORDER BY a_id, b_id"

  /** Duplicated-span CTE chain (mirror of Dedup.dupSpans): positional
    * k-gram hashes → corpus-wide df filter → per-doc island merge.
    * Defines `toks` and `spans(doc_id, span_start, span_end, span_tokens,
    * n_grams)`. */
  private def dupSpansCtes(k: Int, minDf: Int): String =
    s"toks AS ($toksCte), " +
      s"dsg AS (SELECT doc_id, unnest(range(1, len(tk) - $k + 2)) AS p1, tk FROM toks WHERE len(tk) >= $k), " +
      s"dsgg AS (SELECT doc_id, p1 - 1 AS pos, ${ph(s"array_to_string(tk[p1:p1+${k - 1}], ' ')")} AS gh FROM dsg), " +
      s"dshot AS (SELECT gh FROM dsgg GROUP BY gh HAVING count(*) >= $minDf), " +
      "dsd AS (SELECT doc_id, pos FROM dsgg JOIN dshot USING (gh)), " +
      s"dsw AS (SELECT doc_id, pos, CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= $k " +
      "THEN 0 ELSE 1 END AS ni FROM dsd), " +
      "dsi AS (SELECT doc_id, pos, sum(ni) OVER (PARTITION BY doc_id ORDER BY pos) AS isl FROM dsw), " +
      s"spans AS (SELECT doc_id, min(pos) AS span_start, max(pos) + $k - 1 AS span_end, " +
      s"max(pos) + $k - min(pos) AS span_tokens, count(*) AS n_grams FROM dsi GROUP BY doc_id, isl)"

  private[queries] def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(range(1, len($a) + 1), " +
      s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)"

  /** Unrolled bounded-Lloyd SPHERICAL k-means CTE chain — term-for-term
    * mirror of Similarity.kmeansCentroids (init = kC lowest-id vectors,
    * assign by max dot with ties → lowest cell, per-dim means folded in
    * vec_id order, L2-normalized, empty cells keep previous). Defines
    * `cents(cent_id, cent_emb)`. */
  private def kmeansCtes(kC: Int, dim: Int, iters: Int, from: String = "embeddings"): String = {
    val sb = new StringBuilder
    sb ++= s"cents0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, " +
      s"list_transform(embedding, v -> CAST(v AS DOUBLE)) AS emb " +
      s"FROM (SELECT * FROM $from ORDER BY vec_id LIMIT $kC)), "
    for (t <- 1 to iters) {
      sb ++= s"kasg$t AS (SELECT vec_id, embedding, c FROM (SELECT e.vec_id, e.embedding, ct.c, " +
        s"row_number() OVER (PARTITION BY e.vec_id ORDER BY ${dotSql("e.embedding", "ct.emb")} DESC, ct.c ASC) AS rk " +
        s"FROM $from e, cents${t - 1} ct) WHERE rk = 1), "
      sb ++= s"kmu$t AS (SELECT c, d, " +
        "list_reduce(list(CAST(embedding[d] AS DOUBLE) ORDER BY vec_id), (x, y) -> x + y) / count(*) AS mu " +
        s"FROM kasg$t, (SELECT unnest(range(1, ${dim + 1})) AS d) dd GROUP BY c, d), "
      sb ++= s"knc$t AS (SELECT c, list(mu ORDER BY d) AS mu0 FROM kmu$t GROUP BY c), "
      sb ++= s"knn$t AS (SELECT c, CASE WHEN list_reduce(list_transform(mu0, w -> w * w), (x, y) -> x + y) = 0 " +
        "THEN mu0 ELSE list_transform(mu0, v -> v / sqrt(list_reduce(list_transform(mu0, w -> w * w), (x, y) -> x + y))) END AS emb " +
        s"FROM knc$t), "
      sb ++= s"cents$t AS (SELECT p.c, coalesce(n.emb, p.emb) AS emb FROM cents${t - 1} p LEFT JOIN knn$t n ON n.c = p.c), "
    }
    sb ++= s"cents AS (SELECT c AS cent_id, emb AS cent_emb FROM cents$iters)"
    sb.toString
  }

  /** Unrolled per-subspace bounded-Lloyd CTE chain — mirror of
    * Similarity.pqCodebooks (L2-argmin assignment, vec_id-ordered means,
    * no normalization). Requires `subs(vec_id, sub, svec)` already
    * defined; defines `books(code_id, sub, cent)`. */
  private def pqBooksCtes(m: Int, dm: Int, kC: Int, iters: Int): String = {
    val sb = new StringBuilder
    sb ++= s"bk0 AS (SELECT c, sub, list_transform(embedding[(sub*$dm+1):(sub*$dm+$dm)], v -> CAST(v AS DOUBLE)) AS cent " +
      s"FROM (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, embedding " +
      s"FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT $kC)), (SELECT unnest(range(0, $m)) AS sub) si), "
    for (t <- 1 to iters) {
      sb ++= s"pasg$t AS (SELECT vec_id, sub, svec, c FROM (SELECT s.vec_id, s.sub, s.svec, b.c, " +
        s"row_number() OVER (PARTITION BY s.vec_id, s.sub ORDER BY " +
        s"(${dotSql("b.cent", "b.cent")} - 2 * ${dotSql("s.svec", "b.cent")}) ASC, b.c ASC) AS rk " +
        s"FROM subs s JOIN bk${t - 1} b ON s.sub = b.sub) WHERE rk = 1), "
      sb ++= s"pmu$t AS (SELECT sub, c, d, " +
        "list_reduce(list(CAST(svec[d] AS DOUBLE) ORDER BY vec_id), (x, y) -> x + y) / count(*) AS mu " +
        s"FROM pasg$t, (SELECT unnest(range(1, ${dm + 1})) AS d) dd GROUP BY sub, c, d), "
      sb ++= s"pnc$t AS (SELECT sub, c, list(mu ORDER BY d) AS cent FROM pmu$t GROUP BY sub, c), "
      sb ++= s"bk$t AS (SELECT p.sub, p.c, coalesce(n.cent, p.cent) AS cent FROM bk${t - 1} p " +
        s"LEFT JOIN pnc$t n ON n.sub = p.sub AND n.c = p.c), "
    }
    sb ++= s"books AS (SELECT c AS code_id, sub, cent FROM bk$iters)"
    sb.toString
  }

  /** Unrolled power-iteration PCA — term-for-term mirror of
    * Similarity.pcaPower: per-dim mean folded in vec_id order, v₀ the
    * uniform 1/√dim vector, each iteration s = ⟨x−μ, v⟩ folded in dim
    * order then w_d = Σ(x_d−μ_d)·s folded in vec_id order, norm folded in
    * dim order; final select projects every embedding onto the trained
    * component. list_reduce has no initial accumulator but 0 + x₀ = x₀
    * exactly, so it matches graft_dot's 0.0-seeded fold. */
  private def pcaCtes(dim: Int, iters: Int): String = {
    val v0 = sqlgen.d(1.0 / math.sqrt(dim.toDouble))
    val sb = new StringBuilder
    sb ++= s"cx0 AS (SELECT vec_id, label, unnest(range(1, ${dim + 1})) AS d, embedding FROM embeddings), "
    sb ++= "cxx AS (SELECT vec_id, label, d, CAST(embedding[d] AS DOUBLE) AS x FROM cx0), "
    // two-level deterministic sum (mirror of Similarity.chunkedDimSum):
    // vec_id-ordered within vec_id//4096 chunks, chunk-ordered across
    sb ++= "pmu1 AS (SELECT d, vec_id // 4096 AS ch, " +
      "list_reduce(list(x ORDER BY vec_id), (a, b) -> a + b) AS sx, count(*) AS c FROM cxx GROUP BY d, ch), "
    sb ++= "pmu AS (SELECT d, list_reduce(list(sx ORDER BY ch), (a, b) -> a + b) / sum(c) AS mu FROM pmu1 GROUP BY d), "
    sb ++= "cc AS (SELECT vec_id, label, d, x - mu AS cx FROM cxx JOIN pmu USING (d)), "
    sb ++= s"pv0 AS (SELECT list_transform(range(1, ${dim + 1}), i -> $v0) AS vl), "
    for (t <- 1 to iters) {
      sb ++= s"ps$t AS (SELECT vec_id, list_reduce(list(cx * vl[d] ORDER BY d), (a, b) -> a + b) AS s " +
        s"FROM cc CROSS JOIN pv${t - 1} GROUP BY vec_id), "
      sb ++= s"pw1$t AS (SELECT d, vec_id // 4096 AS ch, " +
        "list_reduce(list(cx * s ORDER BY vec_id), (a, b) -> a + b) AS ws " +
        s"FROM cc JOIN ps$t USING (vec_id) GROUP BY d, ch), "
      sb ++= s"pw$t AS (SELECT d, list_reduce(list(ws ORDER BY ch), (a, b) -> a + b) AS w FROM pw1$t GROUP BY d), "
      sb ++= s"pn$t AS (SELECT wl, sqrt(list_reduce(list_transform(wl, x -> x * x), (a, b) -> a + b)) AS nrm " +
        s"FROM (SELECT list(w ORDER BY d) AS wl FROM pw$t)), "
      sb ++= s"pv$t AS (SELECT CASE WHEN nrm = 0 THEN wl ELSE list_transform(wl, x -> x / nrm) END AS vl FROM pn$t), "
    }
    sb ++= s"pf AS (SELECT vec_id, label, " +
      "list_reduce(list(cx * vl[d] ORDER BY d), (a, b) -> a + b) AS proj, " +
      "list_reduce(list(cx * cx ORDER BY d), (a, b) -> a + b) AS n2 " +
      s"FROM cc CROSS JOIN pv$iters GROUP BY vec_id, label)"
    sb.toString
  }

  private def pcaSql(dim: Int, iters: Int): String =
    s"WITH ${pcaCtes(dim, iters)} " +
      "SELECT vec_id, CAST(label AS BIGINT) AS label, round(proj, 6) AS proj, " +
      "round(sqrt(n2), 6) AS cnorm FROM pf ORDER BY vec_id"

  /** ABTT removal mirror: residual norm after subtracting the projection
    * onto the trained component, folded in dim order. */
  private def pcaRemoveSql(dim: Int, iters: Int): String =
    s"WITH ${pcaCtes(dim, iters)}, " +
      "prr AS (SELECT c.vec_id, pf.proj, pf.n2, " +
      "list_reduce(list((c.cx - pf.proj * vl[c.d]) * (c.cx - pf.proj * vl[c.d]) ORDER BY c.d), (a, b) -> a + b) AS rn2 " +
      s"FROM cc c JOIN pf ON pf.vec_id = c.vec_id CROSS JOIN pv$iters " +
      "GROUP BY c.vec_id, pf.proj, pf.n2) " +
      "SELECT vec_id, round(proj, 6) AS proj, round(sqrt(n2), 6) AS cnorm, " +
      "round(sqrt(rn2), 6) AS rnorm, " +
      "round(CASE WHEN n2 > 0 THEN proj * proj / n2 END, 6) AS var_share " +
      "FROM prr ORDER BY vec_id"

  /** Unrolled logistic-regression training — term-for-term mirror of
    * Classify.logRegTrain: fixed-order features, w₀ = 0, each iteration
    * computes per-doc residual σ(w·x)−y (logit folded in feature order)
    * and per-feature gradient folded in doc_id order, then updates
    * w_i − lr·g_i/n in feature order. Final select scores every doc with
    * the trained weights. */
  /** σ(w·x) fragment over a row carrying `f` joined with a `wl` CTE. */
  private val lrSig =
    "1e0 / (1e0 + exp(-(list_reduce(list_transform(range(1, 6), i -> f[i] * wl[i]), (a, b) -> a + b))))"

  /** LR-training CTE chain (no WITH): defines ftoks/fb(doc_id, y, f)/
    * lnn/lw0..lw{iters}. Shared by [[lrSql]] and the pipeline oracle. */
  private def lrCtes(iters: Int, lr: Double): String = {
    val lrLit = sqlgen.d(lr)
    val feats =
      "[1e0, " +
        "CASE WHEN len(tk) > 0 THEN least(len(tk)::DOUBLE / 100, 1e0) ELSE 0e0 END, " +
        "CASE WHEN len(tk) > 0 THEN len(list_distinct(tk))::DOUBLE / len(tk) ELSE 0e0 END, " +
        "CASE WHEN len(tk) > 0 THEN len(list_filter(tk, t -> t IN ('the', 'a', 'of', 'and', 'is')))::DOUBLE / len(tk) ELSE 0e0 END, " +
        "CASE WHEN len(tk) > 0 THEN (CAST(list_reduce(list_transform(tk, t -> CAST(length(t) AS BIGINT)), (a, b) -> a + b) AS DOUBLE) / len(tk)) / 10 ELSE 0e0 END]"
    val sig = lrSig
    val sb = new StringBuilder
    sb ++= s"ftoks AS ($toksCte), "
    sb ++= "fb AS MATERIALIZED (SELECT doc_id, CASE WHEN source = 'src0' THEN 1e0 ELSE 0e0 END AS y, " +
      s"$feats AS f FROM ftoks), "
    sb ++= "lnn AS (SELECT count(*)::DOUBLE AS n FROM fb), "
    sb ++= "lw0 AS (SELECT [0e0, 0e0, 0e0, 0e0, 0e0] AS wl), "
    for (t <- 1 to iters) {
      sb ++= s"lr$t AS MATERIALIZED (SELECT doc_id, f, $sig - y AS r FROM fb CROSS JOIN lw${t - 1}), "
      // two-level gradient fold (mirror of Similarity.chunkedDimSum)
      sb ++= s"lg1$t AS (SELECT d, doc_id // 4096 AS ch, " +
        "list_reduce(list(f[d] * r ORDER BY doc_id), (a, b) -> a + b) AS gs " +
        s"FROM lr$t CROSS JOIN (SELECT unnest(range(1, 6)) AS d) dd GROUP BY d, ch), "
      sb ++= s"lg$t AS (SELECT d, list_reduce(list(gs ORDER BY ch), (a, b) -> a + b) AS g FROM lg1$t GROUP BY d), "
      sb ++= s"lw$t AS MATERIALIZED (SELECT list_transform(range(1, 6), i -> wl[i] - $lrLit * gl[i] / n) AS wl " +
        s"FROM lw${t - 1} CROSS JOIN (SELECT list(g ORDER BY d) AS gl FROM lg$t) gg CROSS JOIN lnn), "
    }
    // trailing comma-less: callers append their own CTEs / final select
    val out = sb.toString
    out.stripSuffix(", ").stripSuffix(",")
  }

  private def lrSql(iters: Int, lr: Double): String =
    s"WITH ${lrCtes(iters, lr)}, " +
      s"sc AS (SELECT doc_id, y, $lrSig AS score FROM fb CROSS JOIN lw$iters) " +
      "SELECT doc_id, y = 1e0 AS is_target, round(score, 6) AS score, score >= 0.5e0 AS pred " +
      "FROM sc ORDER BY doc_id"

  /** Unrolled k-center-greedy mirror: seed = lowest vec_id, each pick t
    * maximizes min squared distance to picks 1..t−1 (ties → lowest id);
    * per-pair d² folds dims in index order like graft_dot. */
  private def kcSql(dim: Int, k: Int): String = {
    def d2(a: String, b: String): String =
      s"list_reduce(list_transform(range(1, ${dim + 1}), i -> ($a.e[i] - $b.e[i]) * ($a.e[i] - $b.e[i])), (a, b) -> a + b)"
    val sb = new StringBuilder("WITH ")
    sb ++= "emb AS (SELECT vec_id, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS e FROM embeddings), "
    sb ++= "kp1 AS (SELECT vec_id, e FROM emb ORDER BY vec_id LIMIT 1), "
    for (t <- 2 to k) {
      val dists = (1 until t).map(j => d2("m", s"p$j"))
      val dmin = if (dists.size == 1) dists.head else s"least(${dists.mkString(", ")})"
      val joins = (1 until t).map(j => s"CROSS JOIN kp$j p$j").mkString(" ")
      sb ++= s"kd$t AS (SELECT m.vec_id, m.e, $dmin AS d2 FROM emb m $joins), "
      sb ++= s"kp$t AS (SELECT vec_id, e, d2 FROM (SELECT *, row_number() OVER (ORDER BY d2 DESC, vec_id ASC) AS rk FROM kd$t) WHERE rk = 1), "
    }
    val parts =
      "SELECT CAST(1 AS BIGINT) AS pick, vec_id, CAST(NULL AS DOUBLE) AS d2 FROM kp1" +:
        (2 to k).map(t => s"SELECT CAST($t AS BIGINT) AS pick, vec_id, round(d2, 6) AS d2 FROM kp$t")
    sb ++= s"pks AS (${parts.mkString(" UNION ALL ")}) SELECT pick, vec_id, d2 FROM pks ORDER BY pick"
    sb.toString
  }

  // ---------------------------------------------------------------- queries
  private def docs(s: SparkSession, dir: String): DataFrame = Graft.table(s, dir, "documents")
  private def embs(s: SparkSession, dir: String): DataFrame = Graft.table(s, dir, "embeddings")

  /** Q48 text analysis: token counts + fingerprints. */
  val qTextStats = Q(
    "x_text_stats",
    (s, dir) =>
      docs(s, dir)
        // stage tokens/bases as attributes: HOF lambdas over an inlined
        // tokens(text) subtree re-run split+filter per element_at (see
        // TextOps.shinglesFromTokens note)
        .select(col("doc_id"), col("text"), TextOps.tokens(col("text")).as("__tk"))
        .select(
          col("doc_id"),
          col("text"),
          col("__tk"),
          TextOps.shingleBasesFromTokens(col("__tk")).as("__bh")
        )
        .select(
          col("doc_id"),
          size(col("__tk")).cast("long").as("n_tok"),
          TextOps.nTokensBpe(col("text")).cast("long").as("n_tok_bpe"),
          size(array_distinct(col("__tk"))).cast("long").as("n_distinct"),
          TextOps.fpDocument(col("text")).as("fp_doc"),
          when(size(col("__bh")) > 0, array_min(col("__bh"))).as("fp_minshingle")
        )
        .orderBy("doc_id"),
    Some(
      s"WITH $basesCtes " +
        "SELECT toks.doc_id AS doc_id, len(tk) AS n_tok, " +
        raw"len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS n_tok_bpe, " +
        "len(list_distinct(tk)) AS n_distinct, " +
        s"${ph("text")} AS fp_doc, " +
        "CASE WHEN len(bh) > 0 THEN list_min(bh) END AS fp_minshingle " +
        "FROM toks JOIN bases ON toks.doc_id = bases.doc_id ORDER BY doc_id"
    )
  )

  /** Q48 language-ID heuristic + quality score. */
  val qLangQuality = Q(
    "x_lang_quality",
    (s, dir) =>
      docs(s, dir)
        .select(
          col("doc_id"),
          TextOps.langPredict(col("text")).as("lang_pred"),
          P.normd(TextOps.qualityScore(col("text"))).as("quality")
        )
        .orderBy("doc_id"),
    Some {
      def score(markers: Seq[String]) =
        s"len(list_filter(tk, t -> ${markers.map(m => s"t = '$m'").mkString(" OR ")}))"
      val scores = TextOps.langMarkers.map { case (l, m) => l -> score(m) }
      val sCols = scores.map { case (l, e) => s"$e AS s_$l" }.mkString(", ")
      val best = s"greatest(${scores.map("s_" + _._1).mkString(", ")})"
      val pred = scores.map { case (l, _) => s"WHEN s_$l = $best THEN '$l'" }.mkString(" ")
      s"WITH toks AS ($toksCte), sc AS (SELECT doc_id, tk, $sCols FROM toks) " +
        s"SELECT doc_id, CASE $pred ELSE 'und' END AS lang_pred, " +
        "round(0.4 * least(len(tk)::DOUBLE / 100, 1.0) + " +
        "0.3 * (len(list_distinct(tk))::DOUBLE / len(tk)) + " +
        "0.3 * (s_en::DOUBLE / len(tk)), 6) AS quality " +
        "FROM sc ORDER BY doc_id"
    }
  )

  /** Q46 exact dedup groups. */
  val qDedupExact = Q(
    "x_dedup_exact",
    (s, dir) =>
      Dedup
        .exactGroups(docs(s, dir))
        .select(col("text_hash"), col("keep_id"), col("n_dups"))
        .orderBy("keep_id"),
    Some(
      "SELECT sha256(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS n_dups " +
        "FROM documents GROUP BY text ORDER BY keep_id"
    )
  )

  /** Q46 near-dup: exact shingle-Jaccard pairs via inverted-index join. */
  val qNeardupJaccard = Q(
    "x_neardup_jaccard",
    (s, dir) =>
      Dedup
        .jaccardPairs(docs(s, dir), threshold = 0.5)
        .select(col("a_id"), col("b_id"), P.normd(col("jac")).as("jac"))
        .orderBy("a_id", "b_id"),
    Some(jacPairsSql(0.5))
  )

  /** Q46 directed shingle-containment pairs (C(a→b) = |A∩B|/|A| ≥ 0.5):
    * inclusion/quote detection — the asymmetric complement of
    * x_neardup_jaccard, off the same inverted index (both directions of
    * each qualifying pair emit). */
  val qContainmentPairs = Q(
    "x_containment_pairs",
    (s, dir) =>
      Dedup
        .containmentPairs(docs(s, dir), threshold = 0.5)
        .select(col("a_id"), col("b_id"), P.normd(col("cont")).as("cont"))
        .orderBy("a_id", "b_id"),
    Some(
      s"WITH $basesCtes, post AS (SELECT doc_id, unnest(s) AS sng FROM sh), " +
        "sz AS (SELECT doc_id, len(s) AS n FROM sh), " +
        "co AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS co " +
        "FROM post a JOIN post b ON a.sng = b.sng WHERE a.doc_id <> b.doc_id GROUP BY 1, 2), " +
        "cc AS (SELECT a_id, b_id, co::DOUBLE / sa.n AS cont FROM co JOIN sz sa ON sa.doc_id = co.a_id) " +
        "SELECT a_id, b_id, round(cont, 6) AS cont FROM cc WHERE cont >= 0.5 ORDER BY a_id, b_id"
    )
  )

  /** Q46 C4-style boilerplate fraction: share of each doc's distinct
    * 3-shingles with corpus document-frequency ≥ 3 (the cross-document
    * repeated-template signal a curation filter thresholds). */
  val qBoilerplate = Q(
    "x_boilerplate",
    (s, dir) =>
      Dedup
        .boilerplateStats(docs(s, dir), minDf = 3L)
        .select(col("doc_id"), col("n_sh"), col("n_hot"), P.normd(col("frac")).as("frac"))
        .orderBy("doc_id"),
    Some(
      s"WITH $basesCtes, post AS (SELECT doc_id, unnest(s) AS sng FROM sh), " +
        "dfq AS (SELECT sng, count(*) AS df FROM post GROUP BY 1) " +
        "SELECT p.doc_id, CAST(count(*) AS BIGINT) AS n_sh, " +
        "CAST(count(*) FILTER (d.df >= 3) AS BIGINT) AS n_hot, " +
        "round(count(*) FILTER (d.df >= 3)::DOUBLE / count(*), 6) AS frac " +
        "FROM post p JOIN dfq d USING (sng) GROUP BY p.doc_id ORDER BY p.doc_id"
    )
  )

  /** Q46 INCREMENTAL near-dup: a ~10% "daily batch" (doc_id ≡ 7 mod 10)
    * probes the remaining 90% "corpus" through its LSH index — corpus
    * work is index reuse only, batch work is O(|batch|). Oracle is the
    * brute-force corpus×batch cross join on the same shingle sets. */
  val qNeardupIncr = Q(
    "x_neardup_incr",
    (s, dir) => {
      val d = docs(s, dir)
      Dedup
        .minhashLshPairsAgainst(
          d.where(col("doc_id") % 10 =!= 7),
          d.where(col("doc_id") % 10 === 7),
          threshold = 0.5
        )
        .select(col("a_id"), col("b_id"), P.normd(col("jac")).as("jac"))
        .orderBy("a_id", "b_id")
    },
    Some(
      s"WITH ${jacIdxCtes("a.doc_id % 10 <> 7 AND b.doc_id % 10 = 7")} " +
        "SELECT a_id, b_id, round(jac, 6) AS jac FROM jc WHERE jac >= 0.5 ORDER BY a_id, b_id"
    )
  )

  /** Q46 decontamination: a 5% slice (doc_id ≡ 3 mod 20) plays the eval
    * benchmark; every other doc sharing a verbatim 5-gram with it is
    * flagged with its hit count. Oracle intersects the same distinct
    * 5-gram sets per doc. */
  val qContamination = Q(
    "x_contamination",
    (s, dir) => {
      val d = docs(s, dir)
      Dedup
        .contamination(
          d.where(col("doc_id") % 20 =!= 3),
          d.where(col("doc_id") % 20 === 3),
          k = 5
        )
        .select(col("doc_id"), col("n_hits"), col("n_grams").cast("long").as("n_grams"), P.normd(col("frac")).as("frac"))
        .orderBy("doc_id")
    },
    Some {
      val sh5 =
        "CASE WHEN len(tk) >= 5 THEN list_distinct(list_transform(range(1, len(tk) - 3), " +
          "i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3] || ' ' || tk[i+4])) ELSE [] END"
      s"WITH toks AS ($toksCte), sh5 AS (SELECT doc_id, $sh5 AS s FROM toks), " +
        "ev AS (SELECT list_distinct(flatten(list(s))) AS es FROM sh5 WHERE doc_id % 20 = 3) " +
        "SELECT t.doc_id, len(list_intersect(t.s, ev.es)) AS n_hits, len(t.s) AS n_grams, " +
        "round(len(list_intersect(t.s, ev.es))::DOUBLE / len(t.s), 6) AS frac " +
        "FROM sh5 t, ev WHERE t.doc_id % 20 <> 3 AND len(list_intersect(t.s, ev.es)) >= 1 " +
        "ORDER BY doc_id"
    }
  )

  /** Q46 winnowing fingerprints: per-doc signature summary. Every output
    * is an order-insensitive digest of the fingerprint SET (count, min,
    * sum mod P) — `list_distinct` ordering differences between engines
    * cannot surface. */
  val qWinnowFp = Q(
    "x_fp_winnow",
    (s, dir) =>
      Dedup
        .winnowFingerprints(docs(s, dir))
        .select(
          col("doc_id"),
          size(col("fps")).cast("long").as("n_fp"),
          when(size(col("fps")) > 0, array_min(col("fps"))).as("fp_min"),
          when(size(col("fps")) > 0, aggregate(col("fps"), lit(0L), (a, x) => a + x) % P0)
            .as("fp_sum")
        )
        .orderBy("doc_id"),
    Some(
      s"WITH ${winnowCtes(4)} " +
        "SELECT doc_id, len(fps) AS n_fp, " +
        "CASE WHEN len(fps) > 0 THEN list_min(fps) END AS fp_min, " +
        // CAST: DuckDB integer sums widen to HUGEINT, which the gate's
        // arrow bridge cannot hash against Spark's BIGINT
        s"CAST(CASE WHEN len(fps) > 0 THEN list_sum(fps) % $P0 END AS BIGINT) AS fp_sum " +
        "FROM fps ORDER BY doc_id"
    )
  )

  /** Q46 near-dup pairs by winnowing-fingerprint Jaccard: the compressed
    * (~w/2× smaller) signature join; oracle is the brute-force cross join
    * over the same fingerprint sets. */
  val qWinnowPairs = Q(
    "x_fp_winnow_pairs",
    (s, dir) =>
      Dedup
        .winnowPairs(docs(s, dir), threshold = 0.5)
        .select(col("a_id"), col("b_id"), P.normd(col("sim")).as("sim"))
        .orderBy("a_id", "b_id"),
    Some(
      // same inverted-index shape as jacIdxCtes, over the fingerprint sets
      s"WITH ${winnowCtes(4)}, post AS (SELECT doc_id, unnest(fps) AS fp FROM fps), " +
        "sz AS (SELECT doc_id, len(fps) AS n FROM fps), " +
        "co AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS co " +
        "FROM post a JOIN post b ON a.fp = b.fp WHERE a.doc_id < b.doc_id GROUP BY 1, 2), " +
        "jc AS (SELECT a_id, b_id, co::DOUBLE / (sa.n + sb.n - co) AS sim FROM co " +
        "JOIN sz sa ON sa.doc_id = co.a_id JOIN sz sb ON sb.doc_id = co.b_id) " +
        "SELECT a_id, b_id, round(sim, 6) AS sim FROM jc WHERE sim >= 0.5 ORDER BY a_id, b_id"
    )
  )

  /** TF-IDF cosine near-dup pairs: weighted sparse similarity off the
    * token inverted index (no embeddings). Both engines fold norm and dot
    * sums in term order — bit-identical doubles. */
  val qTfidfCosine = Q(
    "x_tfidf_cosine_pairs",
    (s, dir) =>
      Dedup
        .tfidfCosinePairs(docs(s, dir), threshold = 0.9)
        .select(col("a_id"), col("b_id"), P.normd(col("cos")).as("cos"))
        .orderBy("a_id", "b_id"),
    Some(
      s"WITH toks AS ($toksCte), t AS (SELECT doc_id, unnest(tk) AS term FROM toks), " +
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2), " +
        "df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1), " +
        "n AS (SELECT count(*)::DOUBLE AS n FROM documents), " +
        // mirrors tfidfCosinePairs' maxDfFrac=0.1 stopword cap
        "w AS (SELECT doc_id, term, tf * ln(n.n / df.df) AS w FROM tf JOIN df USING (term) CROSS JOIN n " +
        "WHERE df.df <= n.n * 0.1), " +
        "nrm AS (SELECT doc_id, sqrt(list_reduce(list(w * w ORDER BY term), (a, b) -> a + b)) AS nrm " +
        "FROM w GROUP BY doc_id), " +
        "dp AS (SELECT x.doc_id AS a_id, y.doc_id AS b_id, " +
        "list_reduce(list(x.w * y.w ORDER BY x.term), (a, b) -> a + b) AS dp " +
        "FROM w x JOIN w y ON x.term = y.term AND x.doc_id < y.doc_id GROUP BY 1, 2), " +
        "c AS (SELECT a_id, b_id, dp / (na.nrm * nb.nrm) AS cos FROM dp " +
        "JOIN nrm na ON na.doc_id = a_id JOIN nrm nb ON nb.doc_id = b_id) " +
        "SELECT a_id, b_id, round(cos, 6) AS cos FROM c WHERE cos >= 0.9 ORDER BY a_id, b_id"
    )
  )

  /** Q46 near-dup via MinHash-LSH (bands=8 × rows=2) + exact verify.
    * Oracle is the same brute-force set: with these parameters recall is 1
    * on this corpus (verified; LSH misses would fail the compare). */
  val qNeardupLsh = Q(
    "x_neardup_lsh",
    (s, dir) =>
      Dedup
        .minhashLshPairs(docs(s, dir), threshold = 0.5)
        .select(col("a_id"), col("b_id"), P.normd(col("jac")).as("jac"))
        .orderBy("a_id", "b_id"),
    Some(jacPairsSql(0.5))
  )

  /** LSH parameter-calibration curve (Dedup.lshCalibration): measured
    * candidate recall per 0.1 Jaccard bucket vs the 1−(1−s^r)^b theory
    * S-curve at the bucket midpoint. The oracle rebuilds the banded
    * signature table from the same 16 (a, b) hash params and joins band
    * slices exactly as the engine does.
    *
    * The gate exercises the ENFORCED sampling contract: maxDocs = 400 is
    * below every fixture's corpus (500 at sf0.01, 5000 at sf0.1), so the
    * deterministic content-hash filter fires and the oracle replays it
    * (ph(text) % 1e6 < 400e6 // count(*)) over an `sdocs` CTE — the
    * quadratic exact-pairs ground truth is computed on the same bounded
    * sample in both engines. */
  val qLshCurve = {
    val (bands, rpb) = (8, 2)
    val maxDocs = 400L
    Q(
      "x_lsh_curve",
      (s, dir) =>
        Dedup
          .lshCalibration(docs(s, dir), minSim = 0.01, bands = bands, rowsPerBand = rpb, maxDocs = maxDocs)
          .select(
            col("bucket"),
            col("n_pairs"),
            col("n_cand"),
            P.normd(col("recall")).as("recall"),
            P.normd(col("theory")).as("theory")
          )
          .orderBy("bucket"),
      Some {
        val mhCols = TextOps.minhashParams.zipWithIndex
          .map { case ((a, b), i) =>
            s"list_min(list_transform(bh, h -> (h * $a + $b) % $P0)) AS mh$i"
          }
          .mkString(", ")
        val bt = (0 until bands)
          .map(b => s"SELECT doc_id, $b AS band, mh${b * rpb} AS s1, mh${b * rpb + 1} AS s2 FROM mh")
          .mkString(" UNION ALL ")
        // sampled-docs CTE replaces the documents base table in the whole
        // chain (toks reads FROM sdocs): the engine-side content-hash
        // sample, replayed in integer arithmetic.
        s"WITH sdocs AS (SELECT * FROM documents WHERE ${ph("text")} % 1000000 < " +
          s"greatest(1, ${maxDocs} * 1000000 // (SELECT count(*) FROM documents))), " +
          s"${jacIdxCtes("a.doc_id < b.doc_id").replace("FROM documents", "FROM sdocs")}, " +
          s"mh AS (SELECT doc_id, $mhCols FROM bases WHERE n_sh > 0), " +
          s"bt AS ($bt), " +
          "cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id FROM bt a " +
          "JOIN bt b ON a.band = b.band AND a.s1 = b.s1 AND a.s2 = b.s2 AND a.doc_id < b.doc_id), " +
          "ex AS (SELECT a_id, b_id, jac FROM jc WHERE jac >= 0.01e0), " +
          "cv AS (SELECT CAST(floor(ex.jac * 10) AS BIGINT) AS bucket, count(*) AS n_pairs, " +
          "CAST(sum(CASE WHEN c.a_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_cand " +
          "FROM ex LEFT JOIN cand c ON c.a_id = ex.a_id AND c.b_id = ex.b_id GROUP BY 1) " +
          "SELECT bucket, n_pairs, n_cand, round(CAST(n_cand AS DOUBLE) / n_pairs, 6) AS recall, " +
          s"round(1e0 - pow(1e0 - pow(least(CAST(bucket AS DOUBLE) / 10e0 + 0.05e0, 1e0), ${rpb}e0), ${bands}e0), 6) AS theory " +
          "FROM cv ORDER BY bucket"
      }
    )
  }

  /** Q46 MinHash signatures (first 8 hash functions as columns). */
  val qMinhash = Q(
    "x_minhash_sig",
    (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), TextOps.shingleBases(col("text")).as("__bh"))
        .select(
          col("doc_id") +:
            TextOps.minhashParams.take(8).zipWithIndex.map { case ((a, b), i) =>
              when(
                size(col("__bh")) > 0,
                aggregate(col("__bh"), lit(TextOps.P), (acc, h) => least(acc, (h * a + b) % TextOps.P))
              ).as(s"mh$i")
            }: _*
        )
        .orderBy("doc_id"),
    Some {
      val cols = TextOps.minhashParams.take(8).zipWithIndex
        .map { case ((a, b), i) =>
          s"CASE WHEN n_sh > 0 THEN list_min(list_transform(bh, h -> (h * $a + $b) % $P0)) END AS mh$i"
        }
        .mkString(", ")
      s"WITH $basesCtes SELECT doc_id, $cols FROM bases ORDER BY doc_id"
    }
  )

  /** Q46 SimHash (30-bit) per document. */
  val qSimhash = Q(
    "x_simhash",
    (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), TextOps.tokenHashes(col("text")).as("__th"))
        .select(col("doc_id"), TextOps.simhashFromHashes(col("__th")).as("simhash"))
        .orderBy("doc_id"),
    Some {
      val terms = (0 until 30)
        .map { j =>
          s"(CASE WHEN list_sum(list_transform(th, h -> CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END)) > 0 " +
            s"THEN ${1L << j} ELSE 0 END)"
        }
        .mkString(" + ")
      s"WITH toks AS ($toksCte), th AS (SELECT doc_id, list_transform(tk, t -> ${ph("t")}) AS th FROM toks) " +
        s"SELECT doc_id, $terms AS simhash FROM th ORDER BY doc_id"
    }
  )

  /** Q47 int8 scalar quantization: per-vector scale + index-ordered mean
    * absolute reconstruction error. Floor-of-shifted rounding replays
    * bit-for-bit in DuckDB. */
  private val quantCtes =
    "q AS (SELECT vec_id, embedding, " +
      "list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale FROM embeddings), " +
      "qc AS (SELECT vec_id, embedding, scale, " +
      "CASE WHEN scale > 0 THEN list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) / scale + 0.5) AS INT)) END AS codes " +
      "FROM q)"

  val qVecQuant = Q(
    "x_vec_quant",
    (s, dir) =>
      Similarity
        .quantError(embs(s, dir))
        .select(col("vec_id"), P.normd(col("scale")).as("scale"), P.normd(col("recon_mae")).as("recon_mae"))
        .orderBy("vec_id"),
    Some(
      s"WITH $quantCtes " +
        "SELECT vec_id, round(scale, 6) AS scale, " +
        "round(CASE WHEN scale > 0 THEN list_reduce(list_transform(range(1, len(embedding) + 1), " +
        "i -> abs(codes[i] * scale - CAST(embedding[i] AS DOUBLE))), (a, b) -> a + b) / len(embedding) END, 6) AS recon_mae " +
        "FROM qc ORDER BY vec_id"
    )
  )

  /** Q47 top-k over the int8-quantized index (integer dot × scales) for
    * query vectors vec_id < 10 — the 4×-compressed serving path. The
    * oracle replays the quantized arithmetic; closeness to the EXACT
    * ranking is spec-asserted (SimilaritySpec). */
  val qVecQuantTopk = Q(
    "x_vec_quant_topk",
    (s, dir) => {
      val e = embs(s, dir)
      Similarity
        .topkQuantized(e, e.where(col("vec_id") < 10), k = 5)
        .select(col("q_id"), col("rk").cast("long").as("rk"), col("nbr_id"), P.normd(col("sim")).as("sim"))
        .orderBy("q_id", "rk")
    },
    Some {
      val idot = "list_reduce(list_transform(range(1, len(q.codes) + 1), " +
        "i -> CAST(q.codes[i] AS BIGINT) * CAST(c.codes[i] AS BIGINT)), (a, b) -> a + b)"
      s"WITH $quantCtes " +
        "SELECT q_id, rk, nbr_id, round(sim, 6) AS sim FROM (" +
        s"SELECT q.vec_id AS q_id, c.vec_id AS nbr_id, " +
        s"CAST($idot AS DOUBLE) * q.scale * c.scale AS sim, " +
        s"row_number() OVER (PARTITION BY q.vec_id ORDER BY CAST($idot AS DOUBLE) * q.scale * c.scale DESC, c.vec_id) AS rk " +
        "FROM qc q, qc c WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id " +
        "AND q.scale > 0 AND c.scale > 0) " +
        "WHERE rk <= 5 ORDER BY q_id, rk"
    }
  )

  /** Q47 brute-force cosine top-k (k=5) for query vectors vec_id < 10. */
  val qCosineTopk = Q(
    "x_cosine_topk",
    (s, dir) => {
      val e = embs(s, dir)
      Similarity
        .topkBrute(e, e.where(col("vec_id") < 10), k = 5)
        .select(col("q_id"), col("rk").cast("long").as("rk"), col("nbr_id"), P.normd(col("sim")).as("sim"))
        .orderBy("q_id", "rk")
    },
    Some(
      "SELECT q_id, rk, nbr_id, round(sim, 6) AS sim FROM (" +
        s"SELECT q.vec_id AS q_id, c.vec_id AS nbr_id, ${dotSql("q.embedding", "c.embedding")} AS sim, " +
        s"row_number() OVER (PARTITION BY q.vec_id ORDER BY ${dotSql("q.embedding", "c.embedding")} DESC, c.vec_id) AS rk " +
        "FROM embeddings q, embeddings c WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id) " +
        "WHERE rk <= 5 ORDER BY q_id, rk"
    )
  )

  /** Cost-based ANN front door (Similarity.topk): at fixture scale the
    * memo'd cardinality probe routes to the exact brute scan (n ≤
    * bruteMax), so the oracle is the brute SQL — the routed-path parity
    * (forced IVF / IVF-PQ via conf overrides) is spec-asserted in
    * AnnDispatchSpec. */
  val qAnnAuto = Q(
    "x_ann_auto",
    (s, dir) => {
      val e = embs(s, dir)
      Similarity
        .topk(e, e.where(col("vec_id") < 10), k = 5)
        .select(col("q_id"), col("rk").cast("long").as("rk"), col("nbr_id"), P.normd(col("sim")).as("sim"))
        .orderBy("q_id", "rk")
    },
    Some(
      "SELECT q_id, rk, nbr_id, round(sim, 6) AS sim FROM (" +
        s"SELECT q.vec_id AS q_id, c.vec_id AS nbr_id, ${dotSql("q.embedding", "c.embedding")} AS sim, " +
        s"row_number() OVER (PARTITION BY q.vec_id ORDER BY ${dotSql("q.embedding", "c.embedding")} DESC, c.vec_id) AS rk " +
        "FROM embeddings q, embeddings c WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id) " +
        "WHERE rk <= 5 ORDER BY q_id, rk"
    )
  )

  /** Q47 FILTERED top-k: exact same-label top-5 neighbors for query
    * vectors vec_id < 10 — the tenant/language-scoped search every
    * vector store exposes. The equality predicate applies BEFORE any
    * dot product (each query scores only its label's slice). */
  val qAnnFiltered = Q(
    "x_ann_filtered",
    (s, dir) => {
      val e = embs(s, dir)
      Similarity
        .topkBruteFiltered(e, e.where(col("vec_id") < 10), k = 5, filterKey = "label")
        .select(col("q_id"), col("rk").cast("long").as("rk"), col("nbr_id"), P.normd(col("sim")).as("sim"))
        .orderBy("q_id", "rk")
    },
    Some(
      "SELECT q_id, rk, nbr_id, round(sim, 6) AS sim FROM (" +
        s"SELECT q.vec_id AS q_id, c.vec_id AS nbr_id, ${dotSql("q.embedding", "c.embedding")} AS sim, " +
        s"row_number() OVER (PARTITION BY q.vec_id ORDER BY ${dotSql("q.embedding", "c.embedding")} DESC, c.vec_id) AS rk " +
        "FROM embeddings q, embeddings c WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id AND c.label = q.label) " +
        "WHERE rk <= 5 ORDER BY q_id, rk"
    )
  )

  /** Q47 embedding-cosine near-dup pairs (sim ≥ 0.45). */
  val qCosinePairs = Q(
    "x_cosine_pairs",
    (s, dir) =>
      Similarity
        .cosinePairs(embs(s, dir), threshold = 0.45)
        .select(col("a_id"), col("b_id"), P.normd(col("sim")).as("sim"))
        .orderBy("a_id", "b_id"),
    Some(
      s"SELECT a.vec_id AS a_id, b.vec_id AS b_id, round(${dotSql("a.embedding", "b.embedding")}, 6) AS sim " +
        "FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id " +
        s"AND ${dotSql("a.embedding", "b.embedding")} >= 0.45 ORDER BY a_id, b_id"
    )
  )

  /** Embedding near-dup, scale path: sign-LSH banding + exact-dot verify.
    * Deterministic (sin-formula hyperplanes emitted as literals), so the
    * oracle replays signature → bands → candidate join → verification
    * exactly; recall vs the exact x_cosine_pairs asserted in DedupSpec.
    *
    * Gate config is the SUB-QUADRATIC regime: 6-bit band keys (30 planes /
    * 5 bands) make candidate volume Σ_bucket n_b² ≈ n²/64 per band — ~150k
    * candidates at sf0.1 vs the 2M pairs x_cosine_pairs scores. (The old
    * 2-bit config had only 4 buckets per band and generated MORE candidates
    * than brute force — fine as an oracle exerciser, useless as a scale
    * demonstration.) Recall concentrates on genuinely-near pairs, as LSH
    * should; the exact path stays the recall oracle in DedupSpec. */
  val qVecNeardup = {
    val (nPlanes, bands, dim, threshold) = (30, 5, 64, 0.45)
    val bb = nPlanes / bands
    val planes = Similarity.hyperplanes(nPlanes, dim)
    def planeLit(w: Seq[Double]) = "[" + w.map(sqlgen.d).mkString(", ") + "]"
    val sigExpr = planes.zipWithIndex
      .map { case (w, p) =>
        s"(CASE WHEN ${dotSql("embedding", planeLit(w))} > 0 THEN ${1L << p} ELSE 0 END)"
      }
      .mkString(" + ")
    Q(
      "x_vec_neardup",
      (s, dir) =>
        Similarity
          .cosineNeardupPairs(embs(s, dir), threshold, dim, nPlanes, bands)
          .select(col("a_id"), col("b_id"), P.normd(col("sim")).as("sim"))
          .orderBy("a_id", "b_id"),
      Some(
        s"WITH sigs AS (SELECT vec_id, embedding, $sigExpr AS sig FROM embeddings), " +
          s"banded AS (SELECT vec_id, band, (sig >> (band * $bb)) % ${1L << bb} AS bkey " +
          s"FROM sigs, (SELECT unnest(range(0, $bands)) AS band)), " +
          "cand AS (SELECT DISTINCT x.vec_id AS a_id, y.vec_id AS b_id " +
          "FROM banded x JOIN banded y ON x.band = y.band AND x.bkey = y.bkey AND x.vec_id < y.vec_id) " +
          s"SELECT c.a_id, c.b_id, round(${dotSql("a.embedding", "b.embedding")}, 6) AS sim " +
          "FROM cand c JOIN sigs a ON c.a_id = a.vec_id JOIN sigs b ON c.b_id = b.vec_id " +
          s"WHERE ${dotSql("a.embedding", "b.embedding")} >= $threshold ORDER BY a_id, b_id"
      )
    )
  }

  /** Multimodal plumbing: binary payload + typed metadata + stub decode.
    * Oracle exploits the ASCII corpus: utf-8 byte values = char codes. */
  /** Content-defined chunking dedup ratio over the media payloads — see
    * Media.cdcChunkStats (boundaries from the trailing-8-byte rolling
    * hash, chunk hashes deduped corpus-wide). All-integer output. */
  val qMediaCdc = Q(
    "x_media_cdc",
    (s, dir) =>
      Media
        .cdcChunkStats(Media.asMediaTable(docs(s, dir)))
        .orderBy("doc_id"),
    Some {
      val wHash = ph("substring(t, i - 7, 8)")
      val cHash = ph("substring(t, p.s, p.l)")
      "WITH m AS (SELECT doc_id, text AS t, length(text) AS len FROM documents), " +
        s"b AS (SELECT doc_id, t, len, CASE WHEN len >= 8 THEN list_filter(range(8, len + 1), i -> $wHash % 64 = 0) " +
        "ELSE [] END AS bnds FROM m), " +
        "c AS (SELECT doc_id, t, list_prepend(1, list_transform(bnds, x -> x + 1)) AS ss, " +
        "list_append(bnds, len) AS es FROM b), " +
        "ch0 AS (SELECT doc_id, t, unnest(list_filter(list_transform(range(1, len(ss) + 1), " +
        "j -> {'s': ss[j], 'l': es[j] - ss[j] + 1}), q -> q.l > 0)) AS p FROM c), " +
        s"ch AS (SELECT doc_id, $cHash AS chash, CAST(p.l AS BIGINT) AS clen FROM ch0), " +
        "dfq AS (SELECT chash, count(*) AS cdf FROM ch GROUP BY 1) " +
        "SELECT ch.doc_id, count(*) AS n_chunks, " +
        "CAST(sum(CASE WHEN cdf >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks, " +
        "CAST(sum(CASE WHEN cdf >= 2 THEN clen ELSE 0 END) AS BIGINT) AS dup_bytes " +
        "FROM ch JOIN dfq USING (chash) GROUP BY 1 ORDER BY doc_id"
    }
  )

  /** REAL decode through the seam: each doc's text deterministically
    * encodes to a mono PCM-16 WAV (Media.synthWav — RIFF header, planted
    * odd-size LIST chunk, LE samples s_i = ((c_i·131+i) mod 4001) − 2000),
    * the executor-side decoder (Media.decodeWav) parses it back, and the
    * oracle computes the same integer features ANALYTICALLY from the text
    * — it never sees the bytes, so header-offset/pad/sign bugs in either
    * the encoder or the decoder hash-diverge. */
  val qMediaDecode = Q(
    "x_media_decode",
    (s, dir) => {
      import s.implicits._
      val wav = docs(s, dir)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, t) => (id, Media.synthWav(t)) })
        .toDF("doc_id", "payload")
      Media
        .decodeWavRows(s, wav)
        .toDF()
        .orderBy("doc_id")
    },
    Some(
      "WITH d AS (SELECT doc_id, string_split(text, '') AS cs, length(text) AS n FROM documents), " +
        "a AS (SELECT doc_id, n, 8000 + (n % 100) * 10 AS rate, " +
        "list_transform(range(0, n), i -> abs(((unicode(cs[i+1]) * 131 + i) % 4001) - 2000)) AS am FROM d) " +
        "SELECT doc_id, CAST(rate AS BIGINT) AS sample_rate, CAST(1 AS BIGINT) AS n_channels, " +
        "CAST(n AS BIGINT) AS n_samples, CAST(n * 1000 // rate AS BIGINT) AS duration_ms, " +
        "CAST(coalesce(list_sum(am), 0) AS BIGINT) AS abs_sum, " +
        "CAST((n + 255) // 256 AS BIGINT) AS n_windows, " +
        "CAST(coalesce(list_max(list_transform(range(0, (n + 255) // 256), " +
        "w -> list_sum(am[w*256+1 : least((w+1)*256, n)]))), 0) AS BIGINT) AS max_win_sum " +
        "FROM a ORDER BY doc_id"
    )
  )

  /** Second real decoder through the seam — BMP: each doc's text encodes
    * to a 24-bpp bottom-up BMP with real row padding (Media.synthBmp;
    * pixel channels from a content-derived base scalar + the top-down
    * pixel index), Media.decodeBmp parses it back, and the oracle
    * replays the features analytically. The position-weighted luminance
    * sum is order-SENSITIVE, so bottom-up re-ordering or stride-padding
    * bugs diverge where plain channel sums would not. */
  val qMediaDecodeBmp = Q(
    "x_media_decode_bmp",
    (s, dir) => {
      import s.implicits._
      val bmp = docs(s, dir)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, t) => (id, Media.synthBmp(t)) })
        .toDF("doc_id", "payload")
      Media
        .decodeBmpRows(s, bmp)
        .toDF()
        .orderBy("doc_id")
    },
    Some(
      s"WITH d AS (SELECT doc_id, length(text) AS n, ${ph("text")} % 251 AS base FROM documents), " +
        "g AS (SELECT doc_id, n, base, 1 + n % 16 AS w, " +
        "greatest(1, (n + (1 + n % 16) - 1) // (1 + n % 16)) AS h FROM d), " +
        "px AS (SELECT doc_id, w, h, base, unnest(range(0, w * h)) AS p FROM g), " +
        "ch AS (SELECT doc_id, w, h, p, (base * 3 + p * 7) % 256 AS b, " +
        "(base * 5 + p * 11) % 256 AS gg, (base * 2 + p * 13) % 256 AS r FROM px) " +
        "SELECT doc_id, CAST(max(w) AS BIGINT) AS width, CAST(max(h) AS BIGINT) AS height, " +
        "CAST(count(*) AS BIGINT) AS n_pixels, CAST(sum(r) AS BIGINT) AS sum_r, " +
        "CAST(sum(gg) AS BIGINT) AS sum_g, CAST(sum(b) AS BIGINT) AS sum_b, " +
        "CAST(sum(p * (b + gg + r)) AS BIGINT) AS wsum_lum " +
        "FROM ch GROUP BY doc_id ORDER BY doc_id"
    )
  )

  /** Magic-byte dispatcher over a MIXED-format payload column
    * (Media.decodeMixedRows): docs synthesize to WAV / BMP / raw bytes by
    * doc_id mod 3, one mapPartitions pass sniffs each payload's leading
    * bytes and routes it to the matching decoder. The oracle replays the
    * same routing BY THE MOD RULE (it never sees the bytes), so a sniffer
    * that misroutes even one payload diverges on that row's format tag
    * and features — and a payload whose decode differs from its format's
    * analytic replay diverges exactly as in the single-format gates. */
  val qMediaDecodeMixed = Q(
    "x_media_decode_mixed",
    (s, dir) => {
      import s.implicits._
      val mixed = docs(s, dir)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, t) =>
          val payload = (id % 3) match {
            case 0 => Media.synthWav(t)
            case 1 => Media.synthBmp(t)
            case _ => t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          }
          (id, payload)
        })
        .toDF("doc_id", "payload")
      Media.decodeMixedRows(s, mixed).toDF().orderBy("doc_id")
    },
    Some(
      // wav branch: abs_sum / n_samples (x_media_decode's replay)
      "WITH w0 AS (SELECT doc_id, string_split(text, '') AS cs, length(text) AS n FROM documents WHERE doc_id % 3 = 0), " +
        "w1 AS (SELECT doc_id, n, list_transform(range(0, n), i -> abs(((unicode(cs[i+1]) * 131 + i) % 4001) - 2000)) AS am FROM w0), " +
        "wav AS (SELECT doc_id, 'wav' AS format, CAST(coalesce(list_sum(am), 0) AS BIGINT) AS f1, CAST(n AS BIGINT) AS f2 FROM w1), " +
        // bmp branch: wsum_lum / n_pixels (x_media_decode_bmp's replay)
        s"b0 AS (SELECT doc_id, length(text) AS n, ${ph("text")} % 251 AS base FROM documents WHERE doc_id % 3 = 1), " +
        "b1 AS (SELECT doc_id, base, 1 + n % 16 AS w, greatest(1, (n + (1 + n % 16) - 1) // (1 + n % 16)) AS h FROM b0), " +
        "b2 AS (SELECT doc_id, w, h, base, unnest(range(0, w * h)) AS p FROM b1), " +
        "b3 AS (SELECT doc_id, w, h, p, (base * 3 + p * 7) % 256 AS b, (base * 5 + p * 11) % 256 AS gg, (base * 2 + p * 13) % 256 AS r FROM b2), " +
        "bmp AS (SELECT doc_id, 'bmp' AS format, CAST(sum(p * (b + gg + r)) AS BIGINT) AS f1, CAST(max(w) * max(h) AS BIGINT) AS f2 FROM b3 GROUP BY doc_id), " +
        // stub branch: byte_sum_64 / n_bytes (x_media_features' replay)
        "bin AS (SELECT doc_id, 'bin' AS format, " +
        "CAST(list_sum(list_transform(string_split(substr(text, 1, 64), ''), c -> CAST(unicode(c) AS BIGINT))) AS BIGINT) AS f1, " +
        "CAST(octet_length(encode(text)) AS BIGINT) AS f2 FROM documents WHERE doc_id % 3 = 2) " +
        "SELECT * FROM wav UNION ALL SELECT * FROM bmp UNION ALL SELECT * FROM bin ORDER BY doc_id"
    )
  )

  val qMediaFeatures = Q(
    "x_media_features",
    (s, dir) =>
      Media
        .extractFeatures(s, Media.asMediaTable(docs(s, dir)))
        .toDF()
        .select(
          col("doc_id"),
          col("n_bytes"),
          col("byte_sum_64"),
          col("width").cast("long").as("width"),
          col("frames").cast("long").as("frames")
        )
        .orderBy("doc_id"),
    Some(
      "SELECT doc_id, octet_length(encode(text)) AS n_bytes, " +
        "CAST(list_sum(list_transform(string_split(substr(text, 1, 64), ''), c -> CAST(unicode(c) AS BIGINT))) AS BIGINT) AS byte_sum_64, " +
        "octet_length(encode(text)) % 640 AS width, " +
        "octet_length(encode(text)) // 1024 + 1 AS frames " +
        "FROM documents ORDER BY doc_id"
    )
  )

  /** Multimodal frame sampling: 256-byte frame every 512 bytes of the
    * payload. Oracle exploits the ASCII corpus (byte value = char code). */
  val qMediaFrames = Q(
    "x_media_frames",
    (s, dir) =>
      Media
        .frameSample(s, Media.asMediaTable(docs(s, dir)), 256, 512)
        .toDF()
        .select(
          col("doc_id"),
          col("frame_id").cast("long").as("frame_id"),
          col("frame_len").cast("long").as("frame_len"),
          col("frame_sum")
        )
        .orderBy("doc_id", "frame_id"),
    Some(
      "WITH f AS (SELECT doc_id, unnest(range(0, CAST(ceil(octet_length(encode(text)) / 512.0) AS BIGINT))) AS frame_id, text FROM documents) " +
        "SELECT doc_id, frame_id, " +
        "least(CAST(octet_length(encode(text)) AS BIGINT) - frame_id * 512, 256) AS frame_len, " +
        "CAST(list_sum(list_transform(string_split(substr(text, CAST(frame_id * 512 + 1 AS INTEGER), 256), ''), c -> CAST(unicode(c) AS BIGINT))) AS BIGINT) AS frame_sum " +
        "FROM f ORDER BY doc_id, frame_id"
    )
  )

  /** Q47 scale path: IVF ANN top-k. Deterministic (fixed centroids +
    * total tie-breaks), so the DuckDB oracle replays the exact index →
    * probe → rank pipeline. Recall vs brute force asserted in tests. */
  val qAnnIvf = Q(
    "x_ann_ivf_topk",
    (s, dir) => {
      val e = embs(s, dir)
      val idx = Similarity.ivfIndex(e, nCells = 16)
      Similarity
        .topkIvf(idx, e.where(col("vec_id") < 10), k = 5, nCells = 16, nprobe = 4)
        .select(col("q_id"), col("rk").cast("long").as("rk"), col("nbr_id"), P.normd(col("sim")).as("sim"))
        .orderBy("q_id", "rk")
    },
    Some(
      s"WITH ${kmeansCtes(16, 64, 1)}, " +
        "assign AS (SELECT vec_id, embedding, cent_id, row_number() OVER (PARTITION BY vec_id " +
        s"ORDER BY ${dotSql("embedding", "cent_emb")} DESC, cent_id ASC) AS rk FROM embeddings, cents), " +
        "idx AS (SELECT vec_id, embedding, cent_id AS cell FROM assign WHERE rk = 1), " +
        "probes AS (SELECT q_id, q_emb, cell FROM (" +
        "SELECT q.vec_id AS q_id, q.embedding AS q_emb, c.cent_id AS cell, " +
        s"row_number() OVER (PARTITION BY q.vec_id ORDER BY ${dotSql("q.embedding", "c.cent_emb")} DESC, c.cent_id ASC) AS crk " +
        "FROM embeddings q, cents c WHERE q.vec_id < 10) WHERE crk <= 4), " +
        "scored AS (SELECT p.q_id, i.vec_id AS nbr_id, " +
        s"${dotSql("p.q_emb", "i.embedding")} AS sim, " +
        s"row_number() OVER (PARTITION BY p.q_id ORDER BY ${dotSql("p.q_emb", "i.embedding")} DESC, i.vec_id ASC) AS rk " +
        "FROM idx i JOIN probes p ON i.cell = p.cell WHERE p.q_id <> i.vec_id) " +
        "SELECT q_id, rk, nbr_id, round(sim, 6) AS sim FROM scored WHERE rk <= 5 ORDER BY q_id, rk"
    )
  )

  /** Q47 corpus CLUSTER PROFILE: per trained-k-means cell, the member
    * count, corpus share, and mean cosine-to-centroid (cohesion) — the
    * "topic distribution" summary a curation pipeline publishes to show
    * what a corpus contains and how tight each cluster is (and the
    * balance check before IVF cells become storage partitions). Mean
    * folds member sims in vec_id order (FP-parity with the oracle's
    * ordered list_reduce). */
  val qClusterProfile = Q(
    "x_cluster_profile",
    (s, dir) => {
      val e = embs(s, dir)
      val idx = Similarity.ivfIndex(e, nCells = 16)
      val cents = Similarity.kmeansCentroids(e.select(col("vec_id"), col("embedding")), 16)
      val total = e.agg(count(lit(1)).cast("double").as("__total"))
      val orderedMeanSim =
        aggregate(
          transform(array_sort(collect_list(struct(col("vec_id"), col("sim")))), x => x("sim")),
          lit(0.0),
          (a, v) => a + v
        ) / count(lit(1))
      idx
        .join(broadcast(cents), col("cell") === col("cent_id"))
        .withColumn("sim", Similarity.dot(col("embedding"), col("cent_emb")))
        .crossJoin(broadcast(total))
        .groupBy("cell")
        .agg(
          count(lit(1)).as("n_vecs"),
          P.normd(count(lit(1)).cast("double") / max(col("__total"))).as("share"),
          P.normd(orderedMeanSim).as("mean_sim")
        )
        .orderBy("cell")
    },
    Some(
      s"WITH ${kmeansCtes(16, 64, 1)}, " +
        "assign AS (SELECT vec_id, embedding, cent_id, row_number() OVER (PARTITION BY vec_id " +
        s"ORDER BY ${dotSql("embedding", "cent_emb")} DESC, cent_id ASC) AS rk FROM embeddings, cents), " +
        "idx AS (SELECT vec_id, embedding, cent_id AS cell FROM assign WHERE rk = 1), " +
        "tot AS (SELECT count(*)::DOUBLE AS total FROM embeddings), " +
        s"ms AS (SELECT i.cell, i.vec_id, ${dotSql("i.embedding", "c.cent_emb")} AS sim " +
        "FROM idx i JOIN cents c ON c.cent_id = i.cell) " +
        "SELECT cell, CAST(count(*) AS BIGINT) AS n_vecs, " +
        "round(count(*)::DOUBLE / max(tot.total), 6) AS share, " +
        "round(list_reduce(list(sim ORDER BY vec_id), (x, y) -> x + y) / count(*), 6) AS mean_sim " +
        "FROM ms CROSS JOIN tot GROUP BY cell ORDER BY cell"
    )
  )

  /** Large-query-set IVF path: shuffle join on cell + bounded-heap top-k
    * (no broadcast of the probe table). Same semantics as x_ann_ivf_topk,
    * so it shares the oracle SQL verbatim. */
  val qAnnIvfBig = Q(
    "x_ann_ivf_topk_big",
    (s, dir) => {
      val e = embs(s, dir)
      val idx = Similarity.ivfIndex(e, nCells = 16)
      Similarity
        .topkIvfLarge(idx, e.where(col("vec_id") < 10), k = 5, nCells = 16, nprobe = 4)
        .select(col("q_id"), col("rk"), col("nbr_id"), P.normd(col("sim")).as("sim"))
        .orderBy("q_id", "rk")
    },
    qAnnIvf.sql
  )

  /** PQ ANN: product-quantization codes (m=8 subspaces × 16 codes, dense
    * 0-based ids), ADC scoring with the per-query LUT folded in SUB ORDER
    * (fixed-order sum → bit-identical across engines; DuckDB list_reduce
    * starts at c0, Spark folds from 0.0 — identical because 0+c0 = c0),
    * 4× oversampled shortlist, exact re-rank. */
  val qAnnPq = {
    val (m, dm, kC, k, os) = (16, 4, 32, 5, 8)
    def sl(v: String) = s"$v[(sub*$dm+1):(sub*$dm+$dm)]"
    Q(
      "x_ann_pq_topk",
      (s, dir) => {
        val e = embs(s, dir)
        Similarity
          .topkPq(e, e.where(col("vec_id") < 10), k = k, m = m, dim = 64, kC = kC, oversample = os)
          .select(col("q_id"), col("rk").cast("long").as("rk"), col("nbr_id"), P.normd(col("sim")).as("sim"))
          .orderBy("q_id", "rk")
      },
      Some(
        s"WITH subsidx AS (SELECT unnest(range(0, $m)) AS sub), " +
          s"subs AS (SELECT vec_id, sub, ${sl("embedding")} AS svec FROM embeddings, subsidx), " +
          s"${pqBooksCtes(m, dm, kC, 1)}, " +
          "assign AS (SELECT vec_id, sub, code_id FROM (SELECT s.vec_id, s.sub, b.code_id, " +
          s"row_number() OVER (PARTITION BY s.vec_id, s.sub ORDER BY (${dotSql("cent", "cent")} - 2 * ${dotSql("svec", "cent")}) ASC, b.code_id ASC) AS rk " +
          "FROM subs s JOIN books b ON s.sub = b.sub) WHERE rk = 1), " +
          s"lut AS (SELECT q.vec_id AS q_id, b.sub, b.code_id, ${dotSql(sl("q.embedding").replace("sub", "b.sub"), "cent")} AS contrib " +
          "FROM embeddings q, books b WHERE q.vec_id < 10), " +
          "ascore AS (SELECT l.q_id, a.vec_id, list_reduce(list(l.contrib ORDER BY a.sub), (x, y) -> x + y) AS ascore " +
          "FROM assign a JOIN lut l ON a.sub = l.sub AND a.code_id = l.code_id " +
          "WHERE l.q_id <> a.vec_id GROUP BY l.q_id, a.vec_id), " +
          "short AS (SELECT q_id, vec_id FROM (SELECT q_id, vec_id, " +
          "row_number() OVER (PARTITION BY q_id ORDER BY ascore DESC, vec_id ASC) AS srk FROM ascore) " +
          s"WHERE srk <= ${k * os}), " +
          s"rr AS (SELECT s.q_id, s.vec_id AS nbr_id, ${dotSql("q.embedding", "v.embedding")} AS sim " +
          "FROM short s JOIN embeddings q ON q.vec_id = s.q_id JOIN embeddings v ON v.vec_id = s.vec_id), " +
          "ranked AS (SELECT q_id, nbr_id, sim, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, nbr_id ASC) AS rk FROM rr) " +
          s"SELECT q_id, rk, nbr_id, round(sim, 6) AS sim FROM ranked WHERE rk <= $k ORDER BY q_id, rk"
      )
    )
  }

  /** Q47 IVF-PQ composite: coarse cells route (nCells=16, nprobe=4), PQ
    * codes score (m=16 × kC=32 LUT, sub-ordered fold), exact re-rank —
    * the FAISS-shape index. Oracle composes the IVF and PQ oracle CTEs
    * with the candidate set restricted to probed cells. */
  val qAnnIvfPq: Q = {
    val (m, dm, kC, k, os, nprobe) = (16, 4, 32, 5, 8, 4)
    def sl(v: String) = s"$v[(sub*$dm+1):(sub*$dm+$dm)]"
    Q(
      "x_ann_ivfpq_topk",
      (s, dir) => {
        val e = embs(s, dir)
        Similarity
          .topkIvfPq(e, e.where(col("vec_id") < 10), k = k, nCells = 16, nprobe = nprobe, m = m, dim = 64, kC = kC, oversample = os)
          .select(col("q_id"), col("rk").cast("long").as("rk"), col("nbr_id"), P.normd(col("sim")).as("sim"))
          .orderBy("q_id", "rk")
      },
      Some(
        s"WITH ${kmeansCtes(16, 64, 1)}, " +
          "cassign AS (SELECT vec_id, cent_id, row_number() OVER (PARTITION BY vec_id " +
          s"ORDER BY ${dotSql("embedding", "cent_emb")} DESC, cent_id ASC) AS rk FROM embeddings, cents), " +
          "idx AS (SELECT vec_id, cent_id AS cell FROM cassign WHERE rk = 1), " +
          "probes AS (SELECT q_id, cell FROM (" +
          "SELECT q.vec_id AS q_id, c.cent_id AS cell, " +
          s"row_number() OVER (PARTITION BY q.vec_id ORDER BY ${dotSql("q.embedding", "c.cent_emb")} DESC, c.cent_id ASC) AS crk " +
          s"FROM embeddings q, cents c WHERE q.vec_id < 10) WHERE crk <= $nprobe), " +
          "cand AS (SELECT p.q_id, i.vec_id FROM idx i JOIN probes p ON i.cell = p.cell " +
          "WHERE p.q_id <> i.vec_id), " +
          s"subsidx AS (SELECT unnest(range(0, $m)) AS sub), " +
          s"subs AS (SELECT vec_id, sub, ${sl("embedding")} AS svec FROM embeddings, subsidx), " +
          s"${pqBooksCtes(m, dm, kC, 1)}, " +
          "passign AS (SELECT vec_id, sub, code_id FROM (SELECT s.vec_id, s.sub, b.code_id, " +
          s"row_number() OVER (PARTITION BY s.vec_id, s.sub ORDER BY (${dotSql("cent", "cent")} - 2 * ${dotSql("svec", "cent")}) ASC, b.code_id ASC) AS rk " +
          "FROM subs s JOIN books b ON s.sub = b.sub) WHERE rk = 1), " +
          s"lut AS (SELECT q.vec_id AS q_id, b.sub, b.code_id, ${dotSql(sl("q.embedding").replace("sub", "b.sub"), "cent")} AS contrib " +
          "FROM embeddings q, books b WHERE q.vec_id < 10), " +
          "ascore AS (SELECT l.q_id, a.vec_id, list_reduce(list(l.contrib ORDER BY a.sub), (x, y) -> x + y) AS ascore " +
          "FROM passign a JOIN cand cd ON cd.vec_id = a.vec_id " +
          "JOIN lut l ON a.sub = l.sub AND a.code_id = l.code_id AND l.q_id = cd.q_id " +
          "GROUP BY l.q_id, a.vec_id), " +
          "short AS (SELECT q_id, vec_id FROM (SELECT q_id, vec_id, " +
          "row_number() OVER (PARTITION BY q_id ORDER BY ascore DESC, vec_id ASC) AS srk FROM ascore) " +
          s"WHERE srk <= ${k * os}), " +
          s"rr AS (SELECT s.q_id, s.vec_id AS nbr_id, ${dotSql("q.embedding", "v.embedding")} AS sim " +
          "FROM short s JOIN embeddings q ON q.vec_id = s.q_id JOIN embeddings v ON v.vec_id = s.vec_id), " +
          "ranked AS (SELECT q_id, nbr_id, sim, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, nbr_id ASC) AS rk FROM rr) " +
          s"SELECT q_id, rk, nbr_id, round(sim, 6) AS sim FROM ranked WHERE rk <= $k ORDER BY q_id, rk"
      )
    )
  }

  /** Sequence packing (round 5): the concat-and-chunk layout a training
    * loader consumes — per-shard packed token intervals and the 256-token
    * chunks each doc spans. All-integer output; the oracle mirrors the
    * shard windows and the double-division floor exactly. */
  val qPack = Q(
    "x_pack",
    (s, dir) =>
      TextOps
        .packSequences(docs(s, dir), contextLen = 256, shards = 8)
        .orderBy("doc_id"),
    Some(
      s"WITH toks AS ($toksCte), " +
        "base AS (SELECT doc_id, doc_id % 8 AS shard, CAST(len(tk) AS BIGINT) AS n_tok FROM toks), " +
        // CAST the running sum: DuckDB window sum(BIGINT) yields HUGEINT,
        // which its pandas bridge materializes as float64 — the driver's
        // dtype-sensitive hash then sees 0.0 vs Spark's int64 0 (the one
        // r5 hash mismatch). BIGINT restores int64 on both sides.
        "packed AS (SELECT doc_id, shard, n_tok, " +
        "CAST(sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tok_end FROM base) " +
        "SELECT doc_id, shard, n_tok, tok_end - n_tok AS tok_start, tok_end, " +
        "CASE WHEN n_tok > 0 THEN CAST(floor((tok_end - n_tok) / 256e0) AS BIGINT) END AS chunk_start, " +
        "CASE WHEN n_tok > 0 THEN CAST(floor((tok_end - 1) / 256e0) AS BIGINT) END AS chunk_end, " +
        "CASE WHEN n_tok > 0 THEN CAST(floor((tok_end - 1) / 256e0) - floor((tok_end - n_tok) / 256e0) + 1 AS BIGINT) END AS n_chunks " +
        "FROM packed ORDER BY doc_id"
    )
  )

  /** §4.2 Z-order scan gate (round 5): events clustered on the
    * THREE-column Z-curve (user_id, ts_us, value) via writeZOrderedN,
    * read back through a conjunctive box filter on all three dims. The
    * layout must not change answers — the oracle runs the same filter
    * on the RAW events table — and LayoutSpec measures the file-skip
    * (< 50% of the time-sorted layout's files touch the box) that makes
    * the clustering worth it. The clustered write happens once per
    * (session, sf) via memoStat; timed reps measure the SCAN. */
  val qZorderScan = Q(
    "x_zorder_scan",
    (s, dir) => {
      val path = s"/tmp/graft_zorder_${math.abs(dir.hashCode)}"
      graft.CacheRegistry.memoStat(s, s"zorder:$dir") {
        graft.sources.Layout.writeZOrderedN(
          Graft
            .events(s, dir)
            .select(col("event_id"), col("user_id"), col("ts_us"), col("value")),
          path,
          Seq("value", "ts_us", "user_id"),
          files = 16,
          bits = 8
        )
        java.lang.Boolean.TRUE
      }
      s.read
        .parquet(path)
        .where(
          col("user_id").between(1, 3) &&
            col("ts_us") < 1705276800000000L && col("value") < 20.0
        )
        .select(col("event_id"), col("user_id"), col("ts_us"), P.normd(col("value")).as("value"))
        .orderBy("event_id")
    },
    Some(
      "SELECT event_id, user_id, epoch_us(ts) AS ts_us, round(value, 6) AS value FROM events " +
        "WHERE user_id BETWEEN 1 AND 3 " +
        "AND epoch_us(ts) < 1705276800000000 AND value < 20 ORDER BY event_id"
    )
  )

  /** SimHash near-dup pairs (Hamming ≤ 1, banded blocking — exact recall
    * by pigeonhole). Oracle: brute-force Hamming over the same simhash. */
  val qSimhashPairs = Q(
    "x_simhash_pairs",
    (s, dir) =>
      Dedup
        .simhashPairs(docs(s, dir), maxDist = 1)
        .select(col("a_id"), col("b_id"), col("dist").cast("long").as("dist"))
        .orderBy("a_id", "b_id"),
    Some {
      val terms = (0 until 30)
        .map { j =>
          s"(CASE WHEN list_sum(list_transform(th, h -> CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END)) > 0 " +
            s"THEN ${1L << j} ELSE 0 END)"
        }
        .mkString(" + ")
      s"WITH toks AS ($toksCte), th AS (SELECT doc_id, list_transform(tk, t -> ${ph("t")}) AS th FROM toks), " +
        s"simh AS (SELECT doc_id, $terms AS sh FROM th) " +
        "SELECT a.doc_id AS a_id, b.doc_id AS b_id, bit_count(xor(a.sh, b.sh)) AS dist " +
        "FROM simh a, simh b WHERE a.doc_id < b.doc_id AND bit_count(xor(a.sh, b.sh)) <= 1 " +
        "ORDER BY a_id, b_id"
    }
  )

  /** Q48 BM25 retrieval: top-10 docs for a fixed 4-term query. Constants
    * emit through sqlgen.d so both engines parse identical doubles; the
    * per-doc sum folds in term order (Retrieval.bm25's contract). */
  val qBm25 = Q(
    "x_bm25_topk",
    (s, dir) =>
      graft.extensions.Retrieval
        .bm25(docs(s, dir), Seq("table", "scan", "fast", "window"))
        .select(col("doc_id"), P.normd(col("score")).as("score"), col("n_terms")),
    Some {
      import graft.queries.{sqlgen => G}
      val k1 = 1.2; val b = 0.75
      s"WITH toks AS ($toksCte), d AS (SELECT doc_id, tk, len(tk)::DOUBLE AS dl FROM toks), " +
        "t AS (SELECT doc_id, dl, unnest(tk) AS term FROM d), " +
        "tf AS (SELECT doc_id, dl, term, count(*)::DOUBLE AS tf FROM t " +
        "WHERE term IN ('table','scan','fast','window') GROUP BY 1, 2, 3), " +
        "df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1), " +
        "st AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM d), " +
        s"sc AS (SELECT tf.doc_id, tf.term, ln((st.n - df.df + ${G.d(0.5)}) / (df.df + ${G.d(0.5)}) + ${G.d(1.0)}) " +
        s"* (tf.tf * (${G.d(k1 + 1.0)})) / (tf.tf + ${G.d(k1)} * (${G.d(1.0)} - ${G.d(b)} + ${G.d(b)} * tf.dl / st.avgdl)) AS s " +
        "FROM tf JOIN df USING (term) CROSS JOIN st) " +
        "SELECT doc_id, round(score, 6) AS score, n_terms FROM (" +
        "SELECT doc_id, list_reduce(list(s ORDER BY term), (a, x) -> a + x) AS score, count(*) AS n_terms " +
        "FROM sc GROUP BY doc_id) ORDER BY score DESC, doc_id LIMIT 10"
    }
  )

  /** RM3 pseudo-relevance feedback (Retrieval.rm3Expand): BM25 →
    * top-3 feedback docs → RM1 weights Σ tf/dl folded in doc order →
    * top-5 new expansion terms (weight desc, term asc) → BM25 re-run
    * with the expanded set. The oracle replays BOTH stages and the
    * expansion pick; exp_terms in the output verifies WHAT was added,
    * not just the final ranking. */
  val qRm3 = Q(
    "x_rm3_expand",
    (s, dir) =>
      graft.extensions.Retrieval
        .rm3Expand(docs(s, dir), Seq("table", "scan", "fast", "window"))
        .select(col("rk"), col("doc_id"), P.normd(col("score")).as("score"), col("n_terms"), col("exp_terms"))
        .orderBy("rk"),
    Some {
      import graft.queries.{sqlgen => G}
      val k1 = 1.2; val b = 0.75
      val q0 = "('table','scan','fast','window')"
      def bm25Stage(tag: String, termPred: String): String =
        s"tf$tag AS (SELECT doc_id, dl, term, count(*)::DOUBLE AS tf FROM t WHERE $termPred GROUP BY 1, 2, 3), " +
          s"df$tag AS (SELECT term, count(*)::DOUBLE AS df FROM tf$tag GROUP BY 1), " +
          s"sc$tag AS (SELECT tf$tag.doc_id, tf$tag.term, ln((st.n - df$tag.df + ${G.d(0.5)}) / (df$tag.df + ${G.d(0.5)}) + ${G.d(1.0)}) " +
          s"* (tf$tag.tf * (${G.d(k1 + 1.0)})) / (tf$tag.tf + ${G.d(k1)} * (${G.d(1.0)} - ${G.d(b)} + ${G.d(b)} * tf$tag.dl / st.avgdl)) AS s " +
          s"FROM tf$tag JOIN df$tag USING (term) CROSS JOIN st), " +
          s"agg$tag AS (SELECT doc_id, list_reduce(list(s ORDER BY term), (a, x) -> a + x) AS score, count(*) AS n_terms " +
          s"FROM sc$tag GROUP BY doc_id)"
      s"WITH toks AS ($toksCte), d AS (SELECT doc_id, tk, len(tk)::DOUBLE AS dl FROM toks), " +
        "t AS (SELECT doc_id, dl, unnest(tk) AS term FROM d), " +
        "st AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM d), " +
        bm25Stage("1", s"term IN $q0") + ", " +
        "fb AS (SELECT doc_id FROM agg1 ORDER BY score DESC, doc_id LIMIT 3), " +
        "wtd AS (SELECT t.term, t.doc_id, count(*)::DOUBLE / any_value(t.dl) AS w " +
        "FROM t JOIN fb USING (doc_id) GROUP BY t.term, t.doc_id), " +
        "rm1 AS (SELECT term, list_reduce(list(w ORDER BY doc_id), (a, x) -> a + x) AS w FROM wtd GROUP BY term), " +
        s"exp AS (SELECT term, w FROM rm1 WHERE term NOT IN $q0 ORDER BY w DESC, term LIMIT 5), " +
        "q2 AS (SELECT term FROM exp UNION SELECT unnest(['table','scan','fast','window']) AS term), " +
        bm25Stage("2", "term IN (SELECT term FROM q2)") + " " +
        "SELECT row_number() OVER (ORDER BY score DESC, doc_id) AS rk, doc_id, round(score, 6) AS score, n_terms, " +
        "(SELECT string_agg(term, ' ' ORDER BY w DESC, term) FROM exp) AS exp_terms " +
        "FROM agg2 ORDER BY score DESC, doc_id LIMIT 10"
    }
  )

  /** Q48 tf-idf top-3 terms per document (ties → lexicographic term):
    * tf = in-doc count, idf = ln(N/df), df over distinct doc terms. */
  val qTfidf = Q(
    "x_tfidf_top3",
    (s, dir) => {
      val d0 = docs(s, dir)
      val toks = d0
        .select(col("doc_id"), TextOps.tokens(col("text")).as("__tk"))
        .select(col("doc_id"), explode(col("__tk")).as("term"))
      // tf persisted (CacheRegistry): both the scoring branch and the
      // document-frequency aggregate consume it, and without the barrier
      // the tokenize HOF pipeline ran TWICE (column pruning makes the two
      // subtrees differ, so ReuseExchange cannot dedupe them). df comes
      // straight off tf — one row per (doc, term), so its per-term count
      // IS the document frequency; the old distinct() shuffle is gone.
      val tf = graft.CacheRegistry.memo(s, s"tfidf:tf:$dir") {
        toks.groupBy("doc_id", "term").count().withColumnRenamed("count", "tf")
      }
      // corpus size stays in-plan (1-row broadcast) — no driver action
      val nDf = d0.agg(count(lit(1)).cast("double").as("__n"))
      val df0 = tf.groupBy("term").count().withColumnRenamed("count", "df")
      val scored = tf
        .join(df0, "term")
        .crossJoin(broadcast(nDf))
        .withColumn("tfidf", col("tf") * log(col("__n") / col("df")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id")
        .orderBy(col("tfidf").desc, col("term").asc)
      scored
        .withColumn("rk", row_number().over(w))
        .where(col("rk") <= 3)
        .select(col("doc_id"), col("rk").cast("long").as("rk"), col("term"), P.normd(col("tfidf")).as("tfidf"))
        .orderBy("doc_id", "rk")
    },
    Some(
      s"WITH toks AS ($toksCte), t AS (SELECT doc_id, unnest(tk) AS term FROM toks), " +
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2), " +
        "df AS (SELECT term, count(DISTINCT doc_id) AS df FROM t GROUP BY 1), " +
        "n AS (SELECT count(*)::DOUBLE AS n FROM documents), " +
        "sc AS (SELECT tf.doc_id, tf.term, tf.tf * ln(n.n / df.df) AS tfidf, " +
        "row_number() OVER (PARTITION BY tf.doc_id ORDER BY tf.tf * ln(n.n / df.df) DESC, tf.term ASC) AS rk " +
        "FROM tf JOIN df ON tf.term = df.term CROSS JOIN n) " +
        "SELECT doc_id, rk, term, round(tfidf, 6) AS tfidf FROM sc WHERE rk <= 3 ORDER BY doc_id, rk"
    )
  )

  /** Q48 Gopher-style quality FILTER RULES, per-rule breakdown: length
    * bound, duplicate-bigram repetition cap (TextOps.topBigramFrac — the
    * shuffle-free sorted-run fold), stopword floor, mean-word-length
    * band. A pipeline filters on `pass` but ships the per-rule columns —
    * that's how filter ablations get measured. */
  val qQualityRules = Q(
    "x_quality_rules",
    (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), TextOps.tokens(col("text")).as("__tk"))
        .select(
          col("doc_id"),
          size(col("__tk")).cast("long").as("n_tok"),
          P.normd(TextOps.meanTokenLen(col("__tk"))).as("mwl"),
          P.normd(TextOps.topBigramFrac(col("__tk"))).as("rep2"),
          size(filter(col("__tk"), t => TextOps.langMarkers.head._2.map(t === _).reduce(_ || _)))
            .cast("long").as("stop_hits"),
          (size(col("__tk")) >= 30).as("r_len"),
          (TextOps.topBigramFrac(col("__tk")) <= 0.09).as("r_rep"),
          (size(filter(col("__tk"), t => TextOps.langMarkers.head._2.map(t === _).reduce(_ || _))) >= 2).as("r_stop"),
          (TextOps.meanTokenLen(col("__tk")).between(3.0, 8.0)).as("r_mwl")
        )
        .withColumn("pass", col("r_len") && col("r_rep") && col("r_stop") && col("r_mwl"))
        .orderBy("doc_id"),
    Some(
      s"WITH toks AS ($toksCte), " +
        "bg AS (SELECT doc_id, tk, CASE WHEN len(tk) >= 2 THEN list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1]) ELSE [] END AS g2 FROM toks), " +
        "u AS (SELECT doc_id, unnest(g2) AS g FROM bg), " +
        "mx AS (SELECT doc_id, max(cnt) AS mx FROM (SELECT doc_id, g, count(*) AS cnt FROM u GROUP BY 1, 2) GROUP BY 1), " +
        "st AS (SELECT bg.doc_id, len(tk) AS n_tok, " +
        "list_sum(list_transform(tk, t -> len(t)))::DOUBLE / len(tk) AS mwl, " +
        "CASE WHEN len(g2) > 0 THEN mx.mx::DOUBLE / len(g2) END AS rep2, " +
        "len(list_filter(tk, t -> t IN ('the','a','of','and','is'))) AS stop_hits " +
        "FROM bg LEFT JOIN mx ON bg.doc_id = mx.doc_id) " +
        "SELECT doc_id, n_tok, round(mwl, 6) AS mwl, round(rep2, 6) AS rep2, stop_hits, " +
        "n_tok >= 30 AS r_len, rep2 <= 0.09 AS r_rep, stop_hits >= 2 AS r_stop, " +
        "mwl BETWEEN 3.0 AND 8.0 AS r_mwl, " +
        "(n_tok >= 30 AND rep2 <= 0.09 AND stop_hits >= 2 AND mwl BETWEEN 3.0 AND 8.0) AS pass " +
        "FROM st ORDER BY doc_id"
    )
  )

  /** Q48 RAG chunking: overlapping 32-token windows, stride 24; one row
    * per chunk with its token count and content hash. */
  val qChunks = Q(
    "x_chunks",
    (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), TextOps.tokens(col("text")).as("__tk"))
        .select(col("doc_id"), explode(TextOps.chunkTokens(col("__tk"), 32, 24)).as("c"))
        .select(
          col("doc_id"),
          col("c.chunk_id").cast("long").as("chunk_id"),
          size(TextOps.tokens(col("c.chunk"))).cast("long").as("n_tok"),
          TextOps.polyHash(col("c.chunk")).as("chunk_hash")
        )
        .orderBy("doc_id", "chunk_id"),
    Some(
      s"WITH toks AS ($toksCte), " +
        "nc AS (SELECT doc_id, tk, CASE WHEN len(tk) <= 32 THEN 1 " +
        "ELSE CAST(ceil((len(tk) - 32)::DOUBLE / 24) AS INT) + 1 END AS n_chunks FROM toks WHERE len(tk) > 0), " +
        "ch AS (SELECT doc_id, unnest(range(0, n_chunks)) AS chunk_id, tk FROM nc), " +
        "cs AS (SELECT doc_id, chunk_id, array_to_string(tk[(chunk_id*24+1):(chunk_id*24+32)], ' ') AS chunk FROM ch) " +
        "SELECT doc_id, chunk_id, len(list_filter(string_split(chunk, ' '), t -> t <> '')) AS n_tok, " +
        s"${ph("chunk")} AS chunk_hash FROM cs ORDER BY doc_id, chunk_id"
    )
  )

  /** Q48 LM-proxy quality: mean unigram surprisal per doc under the
    * corpus's own token distribution (CCNet-style cheap perplexity). */
  val qSurprisal = Q(
    "x_surprisal",
    (s, dir) =>
      graft.extensions.Retrieval
        .unigramSurprisal(docs(s, dir))
        .select(col("doc_id"), P.normd(col("mean_nll")).as("mean_nll"), col("n_tok"))
        .orderBy("doc_id"),
    Some(
      s"WITH toks AS ($toksCte), t AS (SELECT doc_id, unnest(tk) AS term FROM toks), " +
        "uni AS (SELECT term, count(*)::DOUBLE AS cnt FROM t GROUP BY 1), " +
        "tot AS (SELECT sum(cnt) AS total FROM uni), " +
        "j AS (SELECT doc_id, t.term, -ln(cnt / total) AS nll FROM t JOIN uni USING (term) CROSS JOIN tot) " +
        "SELECT doc_id, round(list_reduce(list(nll ORDER BY term), (a, x) -> a + x) / count(*), 6) AS mean_nll, " +
        "count(*) AS n_tok FROM j GROUP BY doc_id ORDER BY doc_id"
    )
  )

  /** End-to-end curation pipeline (round 5): the Nemotron-CC-shaped
    * chain — exact dedup (keep lowest id per text) → near-dup clustering
    * over exact-Jaccard pairs (keep canonical per cluster) → quality
    * filter (composite score ≥ 0.5) → per-source kept docs/tokens (the
    * numbers a mixture recipe consumes) — composed as ONE lazy plan.
    * Proves the §2.F stages COMPOSE: each stage's output is the next
    * stage's input, no materialization between. Oracle chains the
    * already-proven per-stage SQL (inverted-index pairs restricted to
    * the exact-dedup survivors ≡ pairs of the deduped corpus, since
    * Jaccard of a pair is independent of other docs). */
  val qPipeline = Q(
    "x_pipeline",
    (s, dir) => {
      val d = docs(s, dir)
      val dEx = Dedup.dropExactDups(d)
      val keepNear = Dedup
        .nearDupClusters(dEx, Dedup.jaccardPairs(dEx, 0.5))
        .where(col("keep"))
        .select("doc_id")
      d.join(keepNear, "doc_id")
        .where(TextOps.qualityScore(col("text")) >= 0.5)
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(TextOps.nTokens(col("text")).cast("long")).as("n_tokens")
        )
        .orderBy("source")
    },
    Some {
      val enMarkers = TextOps.langMarkers.head._2
      val sEn = s"len(list_filter(tk, t -> ${enMarkers.map(m => s"t = '$m'").mkString(" OR ")}))"
      val quality =
        s"0.4 * least(len(tk)::DOUBLE / 100, 1.0) + " +
          s"0.3 * (len(list_distinct(tk))::DOUBLE / len(tk)) + " +
          s"0.3 * ($sEn::DOUBLE / len(tk))"
      s"WITH RECURSIVE ${jacIdxCtes("a.doc_id < b.doc_id")}, " +
        "ek AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text), " +
        "pairs AS (SELECT a_id, b_id FROM jc WHERE jac >= 0.5 " +
        "AND a_id IN (SELECT doc_id FROM ek) AND b_id IN (SELECT doc_id FROM ek)), " +
        "edges AS (SELECT a_id AS u, b_id AS v FROM pairs UNION ALL SELECT b_id, a_id FROM pairs), " +
        "reach(u, v) AS (SELECT u, v FROM edges UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u), " +
        "lab AS (SELECT e.doc_id, least(e.doc_id, coalesce(min(r.v), e.doc_id)) AS cl " +
        "FROM ek e LEFT JOIN reach r ON r.u = e.doc_id GROUP BY e.doc_id), " +
        "keepn AS (SELECT doc_id FROM lab WHERE doc_id = cl), " +
        "kept AS (SELECT toks.doc_id, source, tk FROM toks JOIN keepn ON toks.doc_id = keepn.doc_id), " +
        s"filt AS (SELECT doc_id, source, tk FROM kept WHERE len(tk) > 0 AND ($quality) >= 0.5) " +
        "SELECT source, count(*) AS n_docs, CAST(sum(len(tk)) AS BIGINT) AS n_tokens " +
        "FROM filt GROUP BY source ORDER BY source"
    }
  )

  /** Bigram-LM surprisal (round 5): add-one-smoothed conditional
    * p(b|a) = (c(a,b)+1)/(c(a)+V); per-doc mean −ln p folded in bigram
    * order on both engines. */
  val qSurprisal2 = Q(
    "x_surprisal2",
    (s, dir) =>
      graft.extensions.Retrieval
        .bigramSurprisal(docs(s, dir))
        .select(col("doc_id"), P.normd(col("mean_nll")).as("mean_nll"), col("n_bigram"))
        .orderBy("doc_id"),
    Some(
      s"WITH toks AS ($toksCte), t AS (SELECT doc_id, unnest(tk) AS a FROM toks), " +
        "uni AS (SELECT a, count(*)::DOUBLE AS ca FROM t GROUP BY 1), " +
        "vocab AS (SELECT count(*)::DOUBLE AS v FROM uni), " +
        "bgl AS (SELECT doc_id, unnest(list_transform(range(1, len(tk)), " +
        "i -> struct_pack(b := tk[i] || ' ' || tk[i+1], a := tk[i]))) AS s FROM toks WHERE len(tk) >= 2), " +
        "bgt AS (SELECT doc_id, s.b AS b, s.a AS a FROM bgl), " +
        "cb AS (SELECT b, count(*)::DOUBLE AS cb FROM bgt GROUP BY 1), " +
        "j AS (SELECT doc_id, b, -ln((cb + 1e0) / (ca + v)) AS nll " +
        "FROM bgt JOIN cb USING (b) JOIN uni USING (a) CROSS JOIN vocab) " +
        "SELECT doc_id, round(list_reduce(list(nll ORDER BY b), (x, y) -> x + y) / count(*), 6) AS mean_nll, " +
        "count(*) AS n_bigram FROM j GROUP BY doc_id ORDER BY doc_id"
    )
  )

  /** Q48 corpus language/source distribution with quality means. */
  val qLangDist = Q(
    "x_lang_dist",
    (s, dir) =>
      docs(s, dir)
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          P.normd(avg(length(col("text")))).as("avg_chars"),
          P.normd(avg(TextOps.nTokens(col("text")).cast("double"))).as("avg_tokens"),
          countDistinct(col("source")).as("n_sources")
        )
        .orderBy("lang"),
    Some(
      "SELECT lang, count(*) AS n_docs, round(avg(length(text)), 6) AS avg_chars, " +
        "round(avg(len(list_filter(string_split(text, ' '), t -> t <> ''))::DOUBLE), 6) AS avg_tokens, " +
        "count(DISTINCT source) AS n_sources FROM documents GROUP BY lang ORDER BY lang"
    )
  )

  // ------------------------------------------------- dataset split/sample
  /** Deterministic train/val/test split by content hash (80/10/10):
    * assignment is a pure function of the TEXT (not position or RNG), so
    * re-running on a grown corpus keeps every old doc in its old split —
    * the property a training pipeline needs for reproducible evals.
    * Hash-bucket arithmetic replays exactly in the oracle.
    *
    * Scale: one map-side hash + a 3-group aggregate; no shuffle beyond
    * the partial-agg exchange. */
  val qSplit = Q(
    "x_split",
    (s: SparkSession, dir: String) => {
      Graft.init(s)
      docs(s, dir)
        .select(
          col("doc_id"),
          col("n_chars"),
          pmod(TextOps.polyHash(col("text")), lit(100L)).as("bucket")
        )
        .withColumn(
          "split",
          when(col("bucket") < 80, "train").when(col("bucket") < 90, "val").otherwise("test")
        )
        .groupBy("split")
        .agg(
          count(lit(1)).as("n_docs"),
          sum("n_chars").as("total_chars"),
          P.normd(avg("n_chars")).as("avg_chars")
        )
        .orderBy("split")
    },
    Some(
      s"WITH d AS (SELECT doc_id, n_chars, ${ph("text")} % 100 AS bucket FROM documents), " +
        "s AS (SELECT CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split, " +
        "n_chars FROM d) " +
        "SELECT split, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars, " +
        "round(avg(n_chars), 6) AS avg_chars FROM s GROUP BY split ORDER BY split"
    )
  )

  /** Deterministic stratified sampling by source: per-source keep-rates
    * (content-hash threshold per stratum — sampleByKey without RNG, so
    * the sample is stable across runs and appends). Rates: even-numbered
    * sources 50%, odd 20%. */
  val qStratSample = Q(
    "x_strat_sample",
    (s: SparkSession, dir: String) => {
      Graft.init(s)
      val rate = when(
        pmod(regexp_extract(col("source"), "([0-9]+)$", 1).cast("long"), lit(2L)) === 0,
        50L
      ).otherwise(20L)
      docs(s, dir)
        .select(col("doc_id"), col("source"), pmod(TextOps.polyHash(col("text")), lit(100L)).as("bucket"))
        .withColumn("kept", (col("bucket") < rate).cast("int"))
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum("kept").as("n_kept")
        )
        .orderBy("source")
    },
    Some(
      s"WITH d AS (SELECT doc_id, source, ${ph("text")} % 100 AS bucket, " +
        "CASE WHEN CAST(regexp_extract(source, '([0-9]+)$', 1) AS BIGINT) % 2 = 0 THEN 50 ELSE 20 END AS rate " +
        "FROM documents) " +
        "SELECT source, count(*) AS n_docs, CAST(sum(CASE WHEN bucket < rate THEN 1 ELSE 0 END) AS BIGINT) AS n_kept " +
        "FROM d GROUP BY source ORDER BY source"
    )
  )

  /** Q46/Q48 mixture balancing: target mixture ∝ (source index + 1);
    * the engine reports the per-source keep fractions for the largest
    * corpus achievable at that mixture without upsampling. */
  val qMixture = Q(
    "x_mixture",
    (s, dir) => {
      val d = docs(s, dir)
        .select(col("source"), col("text"), TextOps.nTokens(col("text")).as("__nt"))
      val target =
        (regexp_extract(col("source"), "([0-9]+)$", 1).cast("long") + 1L).cast("double") / 210.0
      graft.extensions.Mixture
        .mixtureWeights(d, col("__nt"), target)
        .select(
          col("source"),
          col("n_docs"),
          col("n_tokens").cast("long").as("n_tokens"),
          P.normd(col("target_frac")).as("target_frac"),
          P.normd(col("take_tokens")).as("take_tokens"),
          P.normd(col("keep_frac")).as("keep_frac")
        )
        .orderBy("source")
    },
    Some(
      s"WITH toks AS ($toksCte), " +
        "per AS (SELECT source, count(*) AS n_docs, CAST(sum(len(tk)) AS DOUBLE) AS n_tokens, " +
        "(CAST(regexp_extract(source, '([0-9]+)$', 1) AS BIGINT) + 1)::DOUBLE / 210.0 AS target_frac " +
        "FROM toks GROUP BY source), " +
        "sc AS (SELECT min(n_tokens / target_frac) AS s FROM per) " +
        "SELECT source, n_docs, CAST(n_tokens AS BIGINT) AS n_tokens, " +
        "round(target_frac, 6) AS target_frac, " +
        "round(sc.s * target_frac, 6) AS take_tokens, " +
        "round(sc.s * target_frac / n_tokens, 6) AS keep_frac " +
        "FROM per, sc ORDER BY source"
    )
  )

  /** Q46 near-dup clustering: connected components of the exact-Jaccard
    * pair graph (min-label propagation), canonical doc = min id. Oracle:
    * recursive-CTE transitive closure, component label = min reachable id.
    */
  val qDedupCluster = Q(
    "x_dedup_cluster",
    (s, dir) => {
      val d = docs(s, dir)
      Dedup
        .nearDupClusters(d, Dedup.jaccardPairs(d, threshold = 0.5))
        .orderBy("doc_id")
    },
    Some(
      s"WITH RECURSIVE ${jacIdxCtes("a.doc_id < b.doc_id")}, " +
        "pairs AS (SELECT a_id, b_id FROM jc WHERE jac >= 0.5), " +
        "edges AS (SELECT a_id AS u, b_id AS v FROM pairs UNION ALL SELECT b_id, a_id FROM pairs), " +
        "reach(u, v) AS (SELECT u, v FROM edges UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u), " +
        "lab AS (SELECT d.doc_id, least(d.doc_id, coalesce(min(r.v), d.doc_id)) AS cluster_id " +
        "FROM documents d LEFT JOIN reach r ON r.u = d.doc_id GROUP BY d.doc_id), " +
        "sized AS (SELECT cluster_id, count(*) AS n_cluster FROM lab GROUP BY cluster_id) " +
        "SELECT l.doc_id, l.cluster_id, s.n_cluster, l.doc_id = l.cluster_id AS keep " +
        "FROM lab l JOIN sized s USING (cluster_id) ORDER BY doc_id"
    )
  )

  /** Embedding near-dup clustering: the SAME connected-components operator
    * over exact-cosine pairs — clustering is modality-generic (any pair
    * source: text Jaccard/LSH, simhash, vector cosine). */
  val qVecCluster = Q(
    "x_vec_cluster",
    (s, dir) => {
      val e = embs(s, dir)
      Dedup
        .nearDupClusters(
          e.select(col("vec_id").as("doc_id")),
          Similarity.cosinePairs(e, threshold = 0.45)
        )
        .select(col("doc_id").as("vec_id"), col("cluster_id"), col("n_cluster"), col("keep"))
        .orderBy("vec_id")
    },
    Some(
      "WITH RECURSIVE pairs AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id " +
        "FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id " +
        s"AND ${dotSql("a.embedding", "b.embedding")} >= 0.45), " +
        "edges AS (SELECT a_id AS u, b_id AS v FROM pairs UNION ALL SELECT b_id, a_id FROM pairs), " +
        "reach(u, v) AS (SELECT u, v FROM edges UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u), " +
        "lab AS (SELECT d.vec_id, least(d.vec_id, coalesce(min(r.v), d.vec_id)) AS cluster_id " +
        "FROM embeddings d LEFT JOIN reach r ON r.u = d.vec_id GROUP BY d.vec_id), " +
        "sized AS (SELECT cluster_id, count(*) AS n_cluster FROM lab GROUP BY cluster_id) " +
        "SELECT l.vec_id, l.cluster_id, s.n_cluster, l.vec_id = l.cluster_id AS keep " +
        "FROM lab l JOIN sized s USING (cluster_id) ORDER BY vec_id"
    )
  )

  /** SemDeDup (Abbas et al. 2023): semantic dedup via within-k-means-cell
    * cosine pairs — the paper's sub-quadratic answer to paraphrase/
    * template duplicates that text shingles can't see. The oracle replays
    * the trained coarse quantizer bit-for-bit (same kmeansCtes as IVF)
    * and the keep-first-by-id removal rule. */
  val qSemDedup = Q(
    "x_semdedup",
    (s, dir) =>
      Similarity
        .semDedup(embs(s, dir), nCells = 16, threshold = 0.4)
        .select(col("vec_id"), col("cell"), col("dup_of"), col("keep"))
        .orderBy("vec_id"),
    Some(
      s"WITH ${kmeansCtes(16, 64, 1)}, " +
        "assign AS (SELECT vec_id, embedding, cent_id, row_number() OVER (PARTITION BY vec_id " +
        s"ORDER BY ${dotSql("embedding", "cent_emb")} DESC, cent_id ASC) AS rk FROM embeddings, cents), " +
        "idx AS (SELECT vec_id, embedding, cent_id AS cell FROM assign WHERE rk = 1), " +
        "dups AS (SELECT b.vec_id AS vec_id, min(a.vec_id) AS dup_of " +
        "FROM idx a JOIN idx b ON a.cell = b.cell AND a.vec_id < b.vec_id " +
        s"WHERE ${dotSql("a.embedding", "b.embedding")} >= 0.4e0 GROUP BY 1) " +
        "SELECT i.vec_id, i.cell, d.dup_of, d.dup_of IS NULL AS keep " +
        "FROM idx i LEFT JOIN dups d ON d.vec_id = i.vec_id ORDER BY i.vec_id"
    )
  )

  /** Exact duplicated-span detection (Lee et al. 2021 substring dedup at
    * 8-gram granularity): positions whose gram repeats corpus-wide, merged
    * into maximal spans per doc. All-integer output — no FP contract
    * needed. */
  val qDupSpans = Q(
    "x_dup_spans",
    (s, dir) =>
      Dedup
        .dupSpans(docs(s, dir), k = 8, minDf = 2L)
        .orderBy("doc_id", "span_start"),
    Some(
      s"WITH ${dupSpansCtes(8, 2)} " +
        "SELECT doc_id, span_start, span_end, span_tokens, n_grams " +
        "FROM spans ORDER BY doc_id, span_start"
    )
  )

  /** Span-level removal (Lee et al. 2021's actual rewrite): drop the
    * duplicated-span tokens found by x_dup_spans, keep the rest; per-doc
    * removal accounting + cleaned-text hash. Oracle rewrites via an
    * explode/anti-join/re-aggregate of the same span set. */
  val qDupRemove = Q(
    "x_dup_remove",
    (s, dir) =>
      Dedup
        .removeDupSpans(docs(s, dir), k = 8, minDf = 2L)
        .orderBy("doc_id"),
    Some(
      s"WITH ${dupSpansCtes(8, 2)}, " +
        "tp AS (SELECT doc_id, unnest(tk) AS t, unnest(range(0, len(tk))) AS pos FROM toks), " +
        "cov AS (SELECT DISTINCT tp.doc_id, tp.pos FROM tp JOIN spans s " +
        "ON s.doc_id = tp.doc_id AND tp.pos BETWEEN s.span_start AND s.span_end), " +
        "kept AS (SELECT tp.doc_id, tp.pos, tp.t FROM tp LEFT JOIN cov " +
        "ON cov.doc_id = tp.doc_id AND cov.pos = tp.pos WHERE cov.pos IS NULL), " +
        "ka AS (SELECT doc_id, count(*) AS n_kept, array_to_string(list(t ORDER BY pos), ' ') AS clean FROM kept GROUP BY 1) " +
        "SELECT toks.doc_id AS doc_id, len(tk) AS n_tok, coalesce(ka.n_kept, 0) AS n_kept, " +
        "len(tk) - coalesce(ka.n_kept, 0) AS n_removed, " +
        s"CASE WHEN coalesce(ka.n_kept, 0) > 0 THEN ${ph("clean")} END AS clean_hash " +
        "FROM toks LEFT JOIN ka ON ka.doc_id = toks.doc_id ORDER BY doc_id"
    )
  )

  /** DSIR importance weights (Xie et al. 2023): hashed unigram+bigram
    * bucket log-likelihood ratio of a target domain (here sources
    * src0–src3) vs the raw pool — the importance-resampling score that
    * replaces heuristic quality rules. Bucket table broadcast; per-doc
    * sums fold in feature-position order. */
  val qDsirWeights = Q(
    "x_dsir_weights",
    (s, dir) => {
      Graft.init(s)
      graft.extensions.Mixture
        .dsirWeights(
          docs(s, dir),
          col("source").isin("src0", "src1", "src2", "src3"),
          nBuckets = 1024,
          alpha = 1.0
        )
        .select(col("doc_id"), col("is_target"), col("n_feat"), P.normd(col("logw")).as("logw"))
        .orderBy("doc_id")
    },
    Some {
      val b = 1024
      val bigrams =
        "CASE WHEN len(tk) >= 2 THEN list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1]) ELSE [] END"
      s"WITH toks AS ($toksCte), " +
        "fz AS (SELECT doc_id, source IN ('src0', 'src1', 'src2', 'src3') AS is_target, " +
        s"list_concat(tk, $bigrams) AS fs FROM toks), " +
        "e AS (SELECT doc_id, is_target, unnest(range(0, len(fs))) AS pos, unnest(fs) AS f FROM fz), " +
        s"hb AS (SELECT doc_id, is_target, pos, ${ph("f")} % $b AS bk FROM e), " +
        "bc AS (SELECT bk, CAST(count(*) AS BIGINT) AS raw_n, " +
        "CAST(count(*) FILTER (WHERE is_target) AS BIGINT) AS tgt_n FROM hb GROUP BY 1), " +
        "tot AS (SELECT CAST(sum(raw_n) AS BIGINT) AS raw_t, CAST(sum(tgt_n) AS BIGINT) AS tgt_t FROM bc), " +
        s"lr AS (SELECT bk, ln((tgt_n + 1.0) / (tgt_t + 1.0 * $b)) - ln((raw_n + 1.0) / (raw_t + 1.0 * $b)) AS lr " +
        "FROM bc CROSS JOIN tot), " +
        "pd AS (SELECT doc_id, count(*) AS n_feat, " +
        "list_reduce(list(lr ORDER BY pos), (a, x) -> a + x) AS logw FROM hb JOIN lr USING (bk) GROUP BY 1) " +
        "SELECT f.doc_id AS doc_id, f.is_target AS is_target, coalesce(pd.n_feat, 0) AS n_feat, " +
        "round(pd.logw, 6) AS logw FROM fz f LEFT JOIN pd ON pd.doc_id = f.doc_id ORDER BY f.doc_id"
    }
  )

  /** Per-language quality-percentile gate (the CCNet/Gopher composition:
    * score, rank WITHIN language, keep the top quartile — a language-fair
    * cut where a global threshold would drown low-resource languages).
    * Exact percent_rank here (one shuffle on lang); at 100 TB the
    * mergeable-histogram quantiles (`x_hist_quantiles`) give the same
    * threshold without a per-language sort — broadcast the per-lang p75
    * and filter map-side. */
  val qQualityGate = Q(
    "x_quality_gate",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang")
        .orderBy(col("__q").asc_nulls_first)
      docs(s, dir)
        .select(col("doc_id"), col("lang"), TextOps.qualityScore(col("text")).as("__q"))
        .withColumn("pr", percent_rank().over(w))
        .select(
          col("doc_id"),
          col("lang"),
          P.normd(col("__q")).as("quality"),
          P.normd(col("pr")).as("pr"),
          (col("pr") >= 0.75).as("keep")
        )
        .orderBy("doc_id")
    },
    Some(
      s"WITH toks AS ($toksCte), " +
        "sc AS (SELECT doc_id, lang, CASE WHEN len(tk) > 0 THEN " +
        "0.4 * least(len(tk)::DOUBLE / 100, 1.0) + " +
        "0.3 * (len(list_distinct(tk))::DOUBLE / len(tk)) + " +
        "0.3 * (len(list_filter(tk, t -> t IN ('the', 'a', 'of', 'and', 'is')))::DOUBLE / len(tk)) END AS q FROM toks), " +
        "pr AS (SELECT doc_id, lang, q, percent_rank() OVER (PARTITION BY lang ORDER BY q ASC NULLS FIRST) AS pr FROM sc) " +
        "SELECT doc_id, lang, round(q, 6) AS quality, round(pr, 6) AS pr, pr >= 0.75 AS keep " +
        "FROM pr ORDER BY doc_id"
    )
  )

  /** C4-style blocklist scrub: redact blocklist tokens, count hits, and
    * carry the drop decision (hit fraction over threshold) plus the
    * redacted text's hash — filter ablation data, not just a boolean. */
  val qRedact = Q(
    "x_redact",
    (s, dir) => {
      Graft.init(s)
      val bl = Seq("customer", "value", "spark")
      docs(s, dir)
        .select(col("doc_id"), TextOps.tokens(col("text")).as("__tk"))
        .select(
          col("doc_id"),
          size(col("__tk")).cast("long").as("n_tok"),
          TextOps.blocklistHits(col("__tk"), bl).cast("long").as("n_hits"),
          TextOps.polyHash(concat_ws(" ", TextOps.redactTokens(col("__tk"), bl))).as("red_hash")
        )
        .withColumn(
          "hit_frac",
          P.normd(when(col("n_tok") > 0, col("n_hits").cast("double") / col("n_tok")))
        )
        .withColumn("drop_doc", coalesce(col("hit_frac") > 0.15, lit(false)))
        .select("doc_id", "n_tok", "n_hits", "hit_frac", "drop_doc", "red_hash")
        .orderBy("doc_id")
    },
    Some {
      val inList = "('customer', 'value', 'spark')"
      s"WITH toks AS ($toksCte), " +
        "r AS (SELECT doc_id, len(tk) AS n_tok, " +
        s"len(list_filter(tk, t -> t IN $inList)) AS n_hits, " +
        s"${ph(s"array_to_string(list_transform(tk, t -> CASE WHEN t IN $inList THEN '[X]' ELSE t END), ' ')")} AS red_hash " +
        "FROM toks) " +
        "SELECT doc_id, n_tok, n_hits, " +
        "round(CASE WHEN n_tok > 0 THEN n_hits::DOUBLE / n_tok END, 6) AS hit_frac, " +
        "coalesce(round(CASE WHEN n_tok > 0 THEN n_hits::DOUBLE / n_tok END, 6) > 0.15e0, FALSE) AS drop_doc, " +
        "red_hash FROM r ORDER BY doc_id"
    }
  )

  /** Canonical normalization (round 6): lowercase, collapse whitespace
    * runs, trim — the idempotent pre-pass hash-keyed dedup shares. Output
    * carries before/after lengths, a changed flag, and the normalized
    * text's hash (the dedup key). Map-side only: zero shuffle. */
  val qNormalize = Q(
    "x_normalize",
    (s, dir) => {
      Graft.init(s)
      val norm = TextOps.normalizeText(col("text"))
      docs(s, dir)
        .select(
          col("doc_id"),
          length(col("text")).cast("long").as("n_raw"),
          length(norm).cast("long").as("n_norm"),
          (norm =!= col("text")).as("changed"),
          TextOps.polyHash(norm).as("norm_hash")
        )
        .orderBy("doc_id")
    },
    Some(
      "WITH nm AS (SELECT doc_id, text, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm FROM documents) " +
        s"SELECT doc_id, CAST(length(text) AS BIGINT) AS n_raw, CAST(length(norm) AS BIGINT) AS n_norm, " +
        s"norm <> text AS changed, ${ph("norm")} AS norm_hash FROM nm ORDER BY doc_id"
    )
  )

  /** PMI collocations (round 6): adjacent-bigram pointwise mutual
    * information with a min-count floor, top-50 — the tokenizer-merge /
    * phrase-detection shortlist. Corpus-linear (adjacent bigrams only);
    * final cut is TakeOrdered, never a global sort. */
  val qPmiPairs = Q(
    "x_pmi_pairs",
    (s, dir) => {
      Graft.init(s)
      TextOps
        .pmiPairs(docs(s, dir), minCount = 5, topK = 50)
        .withColumn("pmi", P.normd(col("pmi")))
        .orderBy("w1", "w2")
    },
    Some(
      s"WITH toks AS ($toksCte), " +
        "uc AS (SELECT w, count(*) AS c FROM (SELECT unnest(tk) AS w FROM toks) GROUP BY w), " +
        "nn AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM uc), " +
        "bc AS (SELECT w1, w2, count(*) AS c_ab FROM (SELECT tk[i] AS w1, tk[i+1] AS w2 " +
        "FROM (SELECT tk, unnest(range(1, len(tk))) AS i FROM toks WHERE len(tk) >= 2)) GROUP BY w1, w2), " +
        "mm AS (SELECT CAST(sum(c_ab) AS DOUBLE) AS m FROM bc), " +
        "j AS (SELECT w1, w2, c_ab, a.c AS c_a, b.c AS c_b, " +
        "ln((c_ab::DOUBLE / mm.m) / ((a.c::DOUBLE / nn.n) * (b.c::DOUBLE / nn.n))) AS pmi " +
        "FROM bc JOIN uc a ON a.w = bc.w1 JOIN uc b ON b.w = bc.w2 CROSS JOIN nn CROSS JOIN mm " +
        "WHERE c_ab >= 5), " +
        "r AS (SELECT *, row_number() OVER (ORDER BY pmi DESC, w1, w2) AS rk FROM j) " +
        "SELECT w1, w2, c_ab, c_a, c_b, round(pmi, 6) AS pmi FROM r WHERE rk <= 50 ORDER BY w1, w2"
    )
  )

  /** Top-V vocabulary + cumulative coverage (round 6): the "how big must
    * V be for X% coverage" curve behind every tokenizer budget. One
    * hash-aggregate + TakeOrdered(V); the coverage window sees V rows. */
  val qVocab = Q(
    "x_vocab",
    (s, dir) => {
      Graft.init(s)
      TextOps
        .vocabulary(docs(s, dir), topV = 100)
        .select(
          col("rank").cast("long").as("rank"),
          col("token"),
          col("cnt"),
          P.normd(col("share")).as("share"),
          P.normd(col("cum_share")).as("cum_share")
        )
        .orderBy("rank")
    },
    Some(
      s"WITH toks AS ($toksCte), " +
        "uc AS (SELECT w, count(*) AS c FROM (SELECT unnest(tk) AS w FROM toks) GROUP BY w), " +
        "nn AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM uc), " +
        "top AS (SELECT w, c FROM uc ORDER BY c DESC, w LIMIT 100), " +
        "r AS (SELECT w, c, row_number() OVER (ORDER BY c DESC, w) AS rank, " +
        "CAST(sum(c) OVER (ORDER BY c DESC, w ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum FROM top) " +
        "SELECT rank, w AS token, c AS cnt, round(c::DOUBLE / nn.n, 6) AS share, " +
        "round(cum / nn.n, 6) AS cum_share FROM r CROSS JOIN nn ORDER BY rank"
    )
  )

  // ------------------------------------------------------------ BPE training
  /** Unrolled BPE training rounds (mirror of Bpe.train): bw0/bs0 = the
    * word-type dict + char symbolization; per round t, bp{t} counts
    * adjacent symbol pairs weighted by word count, bm{t} takes the
    * (c DESC, l, r) argmax, bs{t} re-segments every word via
    * wrap-and-replace — each symbol gets its own '(...)' delimiter pair,
    * so DuckDB's non-overlapping left-to-right replace() IS the greedy
    * left-to-right merge fold (validated: '(a)(a)(a)' → '(aa)(a)',
    * '(a)(b)(a)(b)' → '(ab)(ab)'). Symbols are [a-z]+ by construction,
    * so '(' / ')' can never occur inside one. */
  private def bpeCtes(rounds: Int): String = {
    val ctes = scala.collection.mutable.ArrayBuffer(
      "bw0 AS MATERIALIZED (SELECT word, count(*) AS cnt FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word FROM documents) GROUP BY word)",
      "bs0 AS MATERIALIZED (SELECT word, cnt, list_filter(string_split(word, ''), c -> c <> '') AS syms FROM bw0)"
    )
    for (t <- 1 to rounds) {
      val prev = s"bs${t - 1}"
      // MATERIALIZED everywhere: bs{t-1} is referenced by both bp{t} and
      // bs{t}, so inlined CTEs would re-expand the chain 2^rounds times.
      ctes += s"bp$t AS MATERIALIZED (SELECT l, r, sum(cnt) AS c FROM (SELECT syms[i] AS l, syms[i+1] AS r, cnt FROM " +
        s"(SELECT syms, cnt, unnest(range(1, len(syms))) AS i FROM $prev WHERE len(syms) >= 2)) GROUP BY l, r)"
      ctes += s"bm$t AS MATERIALIZED (SELECT l, r, c FROM bp$t ORDER BY c DESC, l, r LIMIT 1)"
      ctes += s"bs$t AS MATERIALIZED (SELECT word, cnt, regexp_extract_all(replace('(' || array_to_string(syms, ')(') || ')', " +
        s"'(' || bm$t.l || ')(' || bm$t.r || ')', '(' || bm$t.l || bm$t.r || ')'), '\\(([a-z]+)\\)', 1) AS syms " +
        s"FROM $prev CROSS JOIN bm$t)"
    }
    ctes.mkString(", ")
  }

  private val bpeRounds = 12

  /** BPE tokenizer training (round 6): `bpeRounds` merges learned over
    * the lowercase-alpha word-type dict. Scale: ONE corpus shuffle builds
    * the dict; each round is a hash-aggregate over the cached dict + a
    * TakeOrdered(1) argmax (Bpe.scala has the full 100 TB story). The
    * oracle unrolls every round and replays each argmax exactly. */
  val qBpeMerges = Q(
    "x_bpe_merges",
    (s, dir) => {
      Graft.init(s)
      val ms = graft.extensions.Bpe.train(docs(s, dir), bpeRounds)
      import s.implicits._
      ms.toSeq
        .map(m => (m.rank.toLong, m.l, m.r, m.l + m.r, m.c))
        .toDF("mrank", "l", "r", "merged", "c")
        .orderBy("mrank")
    },
    Some(
      s"WITH ${bpeCtes(bpeRounds)} SELECT * FROM (" +
        (1 to bpeRounds)
          .map(t => s"SELECT CAST($t AS BIGINT) AS mrank, l, r, l || r AS merged, CAST(c AS BIGINT) AS c FROM bm$t")
          .mkString(" UNION ALL ") +
        ") ORDER BY mrank"
    )
  )

  /** BPE encode + compression ratio (round 6): the trained merges applied
    * once per word TYPE (broadcast dict), joined map-side onto the per-doc
    * word stream — per-doc chars vs BPE symbols, the tokens-per-byte
    * curve a tokenizer budget reads. Integer-exact sums; ratio is one
    * double division of exact longs. */
  val qBpeEncode = Q(
    "x_bpe_encode",
    (s, dir) => {
      Graft.init(s)
      val d = docs(s, dir)
      val ms = graft.extensions.Bpe.train(d, bpeRounds)
      graft.extensions.Bpe
        .encode(d, ms.toSeq)
        .select(
          col("doc_id"),
          col("n_words"),
          col("n_chars"),
          col("n_bpe"),
          P.normd(col("ratio")).as("ratio")
        )
        .orderBy("doc_id")
    },
    Some(
      s"WITH ${bpeCtes(bpeRounds)}, " +
        s"bdict AS (SELECT word, CAST(length(word) AS BIGINT) AS n_char, CAST(len(syms) AS BIGINT) AS n_sym FROM bs$bpeRounds), " +
        "bde AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word FROM documents) " +
        "SELECT doc_id, count(*) AS n_words, CAST(sum(n_char) AS BIGINT) AS n_chars, " +
        "CAST(sum(n_sym) AS BIGINT) AS n_bpe, round(sum(n_sym)::DOUBLE / sum(n_char), 6) AS ratio " +
        "FROM bde JOIN bdict USING (word) GROUP BY doc_id ORDER BY doc_id"
    )
  )

  // --------------------------------------------- classifier analysis layer
  /** TracIn-style influence (Pruthi 2020, single-checkpoint grad-dot):
    * which docs HELP the target-domain objective under the trained
    * quality LR. Oracle: lrCtes weights + the two-level validation
    * gradient fold + the map-side −(σ−y)·⟨x, ḡ⟩ spelling. */
  val qInfluence = Q(
    "x_influence",
    (s, dir) => {
      Graft.init(s)
      graft.extensions.Classify
        .tracinInfluence(docs(s, dir), col("source") === "src0", 0.5, 8)
        .select(col("doc_id"), col("is_target"), P.normd(col("influence")).as("influence"))
        .orderBy("doc_id")
    },
    Some(
      s"WITH ${lrCtes(8, 0.5)}, " +
        s"ir AS MATERIALIZED (SELECT doc_id, f, y, $lrSig - y AS r FROM fb CROSS JOIN lw8), " +
        "ig1 AS (SELECT d, doc_id // 4096 AS ch, " +
        "list_reduce(list(f[d] * r ORDER BY doc_id), (a, b) -> a + b) AS gs, count(*) AS c " +
        "FROM ir CROSS JOIN (SELECT unnest(range(1, 6)) AS d) dd WHERE y = 1e0 GROUP BY d, ch), " +
        "ig AS (SELECT d, list_reduce(list(gs ORDER BY ch), (a, b) -> a + b) AS g, CAST(sum(c) AS DOUBLE) AS nt FROM ig1 GROUP BY d), " +
        "igv AS (SELECT list(g / nt ORDER BY d) AS gv FROM ig) " +
        "SELECT doc_id, y = 1e0 AS is_target, " +
        "round(-(r * list_reduce(list_transform(range(1, 6), i -> f[i] * gv[i]), (a, b) -> a + b)), 6) AS influence " +
        "FROM ir CROSS JOIN igv ORDER BY doc_id"
    )
  )

  /** Classifier reliability bins (round 6): decile predicted-probability
    * bins vs empirical target rate — the calibration check before the
    * LR probability is trusted as a corpus gate. */
  val qLrCalibration = Q(
    "x_lr_calibration",
    (s, dir) => {
      Graft.init(s)
      graft.extensions.Classify
        .calibration(docs(s, dir), col("source") === "src0", 0.5, 8)
        .select(
          col("bin"),
          col("n"),
          P.normd(col("mean_pred")).as("mean_pred"),
          P.normd(col("rate")).as("rate")
        )
        .orderBy("bin")
    },
    Some(
      s"WITH ${lrCtes(8, 0.5)}, " +
        s"cs AS MATERIALIZED (SELECT doc_id, y, $lrSig AS score FROM fb CROSS JOIN lw8), " +
        "crg AS (SELECT min(score) AS mn, max(score) AS mx FROM cs), " +
        "cbn AS (SELECT doc_id, y, score, CASE WHEN mx = mn THEN 0 ELSE " +
        "CAST(least(floor((score - mn) / (mx - mn) * 10e0), 9e0) AS BIGINT) END AS bin " +
        "FROM cs CROSS JOIN crg) " +
        "SELECT bin, count(*) AS n, " +
        "round(list_reduce(list(score ORDER BY doc_id), (a, b) -> a + b) / count(*), 6) AS mean_pred, " +
        "round(sum(y) / count(*), 6) AS rate FROM cbn GROUP BY bin ORDER BY bin"
    )
  )

  /** Heuristic-vs-learned quality agreement (round 6): exact Pearson
    * correlation between TextOps.qualityScore and the LR probability,
    * five moments through the canonical two-level fold. */
  val qScoreCorr = Q(
    "x_score_corr",
    (s, dir) => {
      Graft.init(s)
      graft.extensions.Classify
        .scoreCorr(docs(s, dir), col("source") === "src0", 0.5, 8)
        .select(col("n"), P.normd(col("corr")).as("corr"))
    },
    Some(
      s"WITH ${lrCtes(8, 0.5)}, " +
        "cq AS MATERIALIZED (SELECT fb.doc_id AS doc_id, " +
        "0.4 * least(len(tk)::DOUBLE / 100, 1.0) + " +
        "0.3 * (len(list_distinct(tk))::DOUBLE / len(tk)) + " +
        "0.3 * (len(list_filter(tk, t -> t IN ('the', 'a', 'of', 'and', 'is')))::DOUBLE / len(tk)) AS x, " +
        s"$lrSig AS y2 FROM ftoks JOIN fb ON ftoks.doc_id = fb.doc_id CROSS JOIN lw8 WHERE len(tk) > 0), " +
        "cv AS (SELECT doc_id, d, [x, y2, x * y2, x * x, y2 * y2][d] AS v " +
        "FROM cq CROSS JOIN (SELECT unnest(range(1, 6)) AS d) dd), " +
        "cv1 AS (SELECT d, doc_id // 4096 AS ch, " +
        "list_reduce(list(v ORDER BY doc_id), (a, b) -> a + b) AS gs, count(*) AS c FROM cv GROUP BY d, ch), " +
        "cv2 AS (SELECT d, list_reduce(list(gs ORDER BY ch), (a, b) -> a + b) AS s, sum(c) AS c FROM cv1 GROUP BY d), " +
        "cvv AS (SELECT list(s ORDER BY d) AS sl, CAST(max(c) AS DOUBLE) AS n FROM cv2) " +
        "SELECT CAST(n AS BIGINT) AS n, " +
        "round((n * sl[3] - sl[1] * sl[2]) / (sqrt(n * sl[4] - sl[1] * sl[1]) * sqrt(n * sl[5] - sl[2] * sl[2])), 6) AS corr " +
        "FROM cvv"
    )
  )

  /** Kneser–Ney bigram perplexity (round 6): the KenLM/CCNet-style
    * perplexity gate with principled smoothing — absolute discounting
    * interpolated with the continuation distribution (distinct-neighbour
    * counts), vs x_surprisal2's add-one bigram LM. Oracle mirrors every
    * count table and the exact p(b|a) spelling. */
  val qKnPerplexity = Q(
    "x_kn_perplexity",
    (s, dir) =>
      graft.extensions.Retrieval
        .knPerplexity(docs(s, dir))
        .select(
          col("doc_id"),
          P.normd(col("mean_nll")).as("mean_nll"),
          P.normd(col("ppl")).as("ppl"),
          col("n_bigram")
        )
        .orderBy("doc_id"),
    Some(
      s"WITH toks AS ($toksCte), " +
        "kb0 AS (SELECT doc_id, unnest(list_transform(range(1, len(tk)), " +
        "i -> struct_pack(p := tk[i] || ' ' || tk[i+1], a := tk[i], b2 := tk[i+1]))) AS s FROM toks WHERE len(tk) >= 2), " +
        "kbg AS (SELECT doc_id, s.p AS p, s.a AS a, s.b2 AS b2 FROM kb0), " +
        "kab AS (SELECT a, b2, count(*)::DOUBLE AS cab FROM kbg GROUP BY a, b2), " +
        "kctx AS (SELECT a, sum(cab) AS ca, count(*)::DOUBLE AS n1fa FROM kab GROUP BY a), " +
        "kcont AS (SELECT b2, count(*)::DOUBLE AS n1pb FROM kab GROUP BY b2), " +
        "ktot AS (SELECT count(*)::DOUBLE AS t FROM kab), " +
        "kp AS (SELECT a || ' ' || b2 AS p, greatest(cab - 0.75e0, 0e0) / ca + " +
        "0.75e0 * n1fa / ca * (n1pb / t) AS pkn " +
        "FROM kab JOIN kctx USING (a) JOIN kcont USING (b2) CROSS JOIN ktot), " +
        "kj AS (SELECT doc_id, p, -ln(pkn) AS nll FROM kbg JOIN kp USING (p)) " +
        "SELECT doc_id, round(list_reduce(list(nll ORDER BY p), (x, y) -> x + y) / count(*), 6) AS mean_nll, " +
        "round(exp(list_reduce(list(nll ORDER BY p), (x, y) -> x + y) / count(*)), 6) AS ppl, " +
        "count(*) AS n_bigram FROM kj GROUP BY doc_id ORDER BY doc_id"
    )
  )

  // ------------------------------------------------------------ PageRank
  /** Unrolled weighted-PageRank oracle (mirror of Graphs.pagerank): edge
    * extraction via the same (ts, event_id)-ordered lead(), per-dst
    * contributions folded in src order, dangling mass folded in node
    * order, update spelled `(1-d)/nd + d*(cin + dm/nd)` verbatim.
    * MATERIALIZED throughout — pr{t-1} is referenced three times per
    * round (contributions, dangling, carry), so inlined CTEs would
    * re-expand the chain 3^iters times. */
  private def prCtes(iters: Int): String = {
    val sb = new StringBuilder
    sb ++= "pe AS MATERIALIZED (SELECT src, lead(src) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS dst " +
      "FROM (SELECT user_id, ts, event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS src FROM events) " +
      "WHERE src IS NOT NULL), "
    sb ++= "ped AS MATERIALIZED (SELECT src, dst, count(*) AS w FROM pe WHERE dst IS NOT NULL GROUP BY src, dst), "
    sb ++= "pod AS MATERIALIZED (SELECT src, sum(w) AS outw FROM ped GROUP BY src), "
    sb ++= "pnod AS MATERIALIZED (SELECT DISTINCT node FROM (SELECT src AS node FROM ped UNION ALL SELECT dst FROM ped)), "
    sb ++= "pnn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS nd FROM pnod), "
    sb ++= "pew AS MATERIALIZED (SELECT src, dst, CAST(w AS DOUBLE) / CAST(outw AS DOUBLE) AS p FROM ped JOIN pod USING (src)), "
    sb ++= "pr0 AS MATERIALIZED (SELECT node, 1e0 / nd AS rank FROM pnod CROSS JOIN pnn), "
    for (t <- 1 to iters) {
      val prev = s"pr${t - 1}"
      sb ++= s"pdm$t AS MATERIALIZED (SELECT coalesce(list_reduce(list(rank ORDER BY node), (a, b) -> a + b), 0e0) AS dm " +
        s"FROM $prev WHERE node NOT IN (SELECT src FROM pod)), "
      sb ++= s"pc$t AS MATERIALIZED (SELECT dst AS node, list_reduce(list(rank * p ORDER BY src), (a, b) -> a + b) AS cin " +
        s"FROM pew JOIN $prev ON $prev.node = pew.src GROUP BY dst), "
      sb ++= s"pr$t AS MATERIALIZED (SELECT pnod.node, (1e0 - 0.85e0) / nd + 0.85e0 * (coalesce(cin, 0e0) + dm / nd) AS rank " +
        s"FROM pnod LEFT JOIN pc$t USING (node) CROSS JOIN pdm$t CROSS JOIN pnn), "
    }
    sb.dropRight(2).toString
  }

  private val prIters = 10

  /** Weighted PageRank over the item-transition graph (round 6): the
    * crawl-graph centrality rank (Page et al., 1999) a web-derived
    * pretraining corpus filters by before any text heuristic runs.
    * Ranks stay distributed; each iteration is one join + one ordered
    * per-dst fold (Graphs.scala has the full 100 TB story). */
  val qPagerank = Q(
    "x_pagerank",
    (s, dir) => {
      Graft.init(s)
      graft.extensions.Graphs
        .pagerank(graft.extensions.Graphs.transitionEdges(Graft.events(s, dir)), 0.85, prIters)
        .select(col("node"), P.normd(col("rank")).as("rank"))
        .orderBy("node")
    },
    Some(
      s"WITH ${prCtes(prIters)} " +
        s"SELECT node, ${sqlgen.normd("rank")} AS rank FROM pr$prIters ORDER BY node"
    )
  )

  /** Per-source token-share cap (round 6): deterministic content-ordered
    * admission until a source hits capFrac of total tokens. One window
    * per source; the total is a broadcast scalar. */
  val qSourceCap = Q(
    "x_source_cap",
    (s, dir) => {
      Graft.init(s)
      graft.extensions.Mixture
        .sourceCap(docs(s, dir), TextOps.nTokens(col("text")), capFrac = 0.18)
        .orderBy("doc_id")
    },
    Some(
      s"WITH toks AS ($toksCte), " +
        s"b AS (SELECT doc_id, source, CAST(len(tk) AS BIGINT) AS n_tok, ${ph("text")} AS h FROM toks), " +
        "tt AS (SELECT CAST(sum(n_tok) AS DOUBLE) AS total FROM b), " +
        "w AS (SELECT doc_id, source, n_tok, " +
        "row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS admit_rank, " +
        "CAST(sum(n_tok) OVER (PARTITION BY source ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tok " +
        "FROM b) " +
        "SELECT doc_id, source, n_tok, admit_rank, cum_tok, " +
        "CAST(floor(tt.total * 0.18e0) AS BIGINT) AS cap_tok, " +
        "cum_tok <= CAST(floor(tt.total * 0.18e0) AS BIGINT) AS keep " +
        "FROM w CROSS JOIN tt ORDER BY doc_id"
    )
  )

  /** Edit-distance-verified near-dup pairs (round 6): shingle-Jaccard
    * inverted-index candidates (jac ≥ 0.3), verified with true
    * Levenshtein — integer-exact in both engines. O(len²) work runs only
    * on the candidate set. */
  val qEditDistPairs = Q(
    "x_editdist_pairs",
    (s, dir) => {
      Graft.init(s)
      Dedup
        .editDistPairs(docs(s, dir), candJac = 0.3, simThreshold = 0.5)
        .select(
          col("a_id"),
          col("b_id"),
          P.normd(col("jac")).as("jac"),
          col("lev"),
          P.normd(col("edit_sim")).as("edit_sim")
        )
        .orderBy("a_id", "b_id")
    },
    Some(
      s"WITH ${jacIdxCtes("a.doc_id < b.doc_id")}, " +
        "cand AS (SELECT a_id, b_id, jac FROM jc WHERE jac >= 0.3e0), " +
        "v AS (SELECT a_id, b_id, jac, CAST(levenshtein(da.text, db.text) AS BIGINT) AS lev, " +
        "1e0 - levenshtein(da.text, db.text)::DOUBLE / greatest(length(da.text), length(db.text))::DOUBLE AS edit_sim " +
        "FROM cand JOIN documents da ON da.doc_id = a_id JOIN documents db ON db.doc_id = b_id) " +
        "SELECT a_id, b_id, round(jac, 6) AS jac, lev, round(edit_sim, 6) AS edit_sim " +
        "FROM v WHERE edit_sim >= 0.5e0 ORDER BY a_id, b_id"
    )
  )

  /** Power-iteration PCA projection (round 6): project every embedding
    * onto the trained top principal component (Similarity.pcaPower — one
    * distributed pass per iteration, driver holds 2·d doubles). The
    * oracle replays mean, 4 power iterations, and the projection
    * bit-for-bit via [[pcaCtes]]. */
  val qPcaPower = Q(
    "x_pca_power",
    (s, dir) => {
      Graft.init(s)
      val e = embs(s, dir)
      val (mu, v) = Similarity.pcaPower(e, iters = 4)
      val vecD = transform(col("embedding"), x => x.cast("double"))
      val centered = zip_with(vecD, typedLit(mu.toSeq), (x, m) => x - m)
      e.select(
        col("vec_id"),
        col("label").cast("long").as("label"),
        P.normd(Similarity.dot(centered, typedLit(v.toSeq))).as("proj"),
        P.normd(sqrt(Similarity.dot(centered, centered))).as("cnorm")
      ).orderBy("vec_id")
    },
    Some(pcaSql(64, 4))
  )

  /** Learned quality classifier (round 6): logistic regression over the
    * heuristic quality features, trained by deterministic full-batch GD
    * (Classify.logRegTrain — one distributed pass per iteration, driver
    * holds 5 doubles), scoring every doc map-side with the broadcast
    * weights. The oracle replays training bit-for-bit via [[lrSql]]. */
  val qQualityLr = Q(
    "x_quality_lr",
    (s, dir) => {
      Graft.init(s)
      val d = docs(s, dir)
      val isTarget = col("source") === "src0"
      val w = graft.extensions.Classify.logRegTrain(d, isTarget, lr = 0.5, iters = 8)
      graft.extensions.Classify
        .score(d, w)
        .select(
          col("doc_id"),
          isTarget.as("is_target"),
          P.normd(col("score")).as("score"),
          (col("score") >= 0.5).as("pred")
        )
        .orderBy("doc_id")
    },
    Some(lrSql(8, 0.5))
  )

  /** ABTT dominant-direction removal (Mu & Viswanath 2018, "All-but-the-
    * Top"): subtract each embedding's projection onto the trained top
    * component — the post-processing that makes similarity scores usable
    * when one direction dominates the corpus. Reuses the memo'd pcaPower
    * training; the removal itself is map-side with the component as a
    * broadcast literal. */
  val qPcaRemove = Q(
    "x_pca_remove",
    (s, dir) => {
      Graft.init(s)
      val e = embs(s, dir)
      val (mu, v) = Similarity.pcaPower(e, iters = 4)
      val vecD = transform(col("embedding"), x => x.cast("double"))
      val centered = zip_with(vecD, typedLit(mu.toSeq), (x, m) => x - m)
      val vLit = typedLit(v.toSeq)
      e.select(
        col("vec_id"),
        centered.as("__c"),
        Similarity.dot(centered, vLit).as("proj"),
        Similarity.dot(centered, centered).as("__n2")
      ).select(
        col("vec_id"),
        P.normd(col("proj")).as("proj"),
        P.normd(sqrt(col("__n2"))).as("cnorm"),
        P.normd(
          sqrt(
            Similarity.dot(
              zip_with(col("__c"), vLit, (c, vv) => c - col("proj") * vv),
              zip_with(col("__c"), vLit, (c, vv) => c - col("proj") * vv)
            )
          )
        ).as("rnorm"),
        P.normd(when(col("__n2") > 0, col("proj") * col("proj") / col("__n2"))).as("var_share")
      ).orderBy("vec_id")
    },
    Some(pcaRemoveSql(64, 4))
  )

  /** Temperature-smoothed source sampling (XLM-R rule): q_s ∝ p_s^0.3,
    * sample_factor = q/p per source. One aggregate; broadcast scalars. */
  val qMixtureTemp = Q(
    "x_mixture_temp",
    (s, dir) => {
      Graft.init(s)
      graft.extensions.Mixture
        .temperatureMixture(docs(s, dir), TextOps.nTokens(col("text")), alpha = 0.3)
        .select(
          col("source"),
          col("n_tokens"),
          P.normd(col("p")).as("p"),
          P.normd(col("q")).as("q"),
          P.normd(col("sample_factor")).as("sample_factor")
        )
        .orderBy("source")
    },
    Some(
      s"WITH toks AS ($toksCte), " +
        "mp AS (SELECT source, CAST(sum(len(tk)) AS DOUBLE) AS n_tokens FROM toks GROUP BY source), " +
        "mt AS (SELECT sum(n_tokens) AS total FROM mp), " +
        "pp AS (SELECT source, n_tokens, n_tokens / mt.total AS p FROM mp CROSS JOIN mt), " +
        "zz AS (SELECT list_reduce(list(pow(p, 0.3e0) ORDER BY source), (a, b) -> a + b) AS z FROM pp) " +
        "SELECT source, n_tokens, round(p, 6) AS p, round(pow(p, 0.3e0) / zz.z, 6) AS q, " +
        "round((pow(p, 0.3e0) / zz.z) / p, 6) AS sample_factor FROM pp CROSS JOIN zz ORDER BY source"
    )
  )

  /** k-center-greedy coreset (round 6): 8 diversity exemplars + the
    * non-increasing coverage-radius curve (Similarity.kcenterGreedy —
    * one map-side pass + TakeOrdered(1) per pick). */
  val qKcenter = Q(
    "x_kcenter",
    (s, dir) => {
      Graft.init(s)
      val picks = Similarity.kcenterGreedy(embs(s, dir), k = 8)
      import s.implicits._
      picks.toSeq
        .map { case (p, id, d2) => (p, id, d2) }
        .toDF("pick", "vec_id", "d2")
        .withColumn("d2", P.normd(col("d2")))
        .orderBy("pick")
    },
    Some(kcSql(64, 8))
  )

  /** Round-6 end-to-end curation chain, LEARNED edition: normalize +
    * exact-dedup on the normalized hash (keep lowest id) → score with
    * the classifier trained on the full corpus → keep docs at/above the
    * corpus-mean score (data-derived gate, no hand threshold) → cap any
    * source at 25% of surviving tokens (deterministic admission) →
    * per-source kept docs/tokens. ONE lazy plan end to end; the oracle
    * chains the proven per-stage SQL (normalization hash, the full LR
    * training unroll, the two-level mean fold, the source-cap window). */
  val qPipeline2 = Q(
    "x_pipeline2",
    (s, dir) => {
      Graft.init(s)
      val d = docs(s, dir)
      val keep1 = d
        .withColumn("__nh", TextOps.polyHash(TextOps.normalizeText(col("text"))))
        .groupBy("__nh")
        .agg(min("doc_id").as("doc_id"))
        .select("doc_id")
      val deduped = d.join(keep1, "doc_id")
      val w = graft.extensions.Classify.logRegTrain(d, col("source") === "src0", lr = 0.5, iters = 8)
      val surv = graft.extensions.Classify.gateAboveMean(graft.extensions.Classify.score(deduped, w))
      graft.extensions.Mixture
        .sourceCap(surv, TextOps.nTokens(col("text")), capFrac = 0.25)
        .where(col("keep"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
        .orderBy("source")
    },
    Some(
      s"WITH ${lrCtes(8, 0.5)}, " +
        s"p2nm AS (SELECT doc_id, source, text, tk, ${ph("trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))")} AS nh FROM ftoks), " +
        "p2k1 AS (SELECT min(doc_id) AS doc_id FROM p2nm GROUP BY nh), " +
        "p2ded AS (SELECT p2nm.* FROM p2nm JOIN p2k1 USING (doc_id)), " +
        s"p2sc AS (SELECT p2ded.doc_id, source, text, tk, $lrSig AS score " +
        "FROM p2ded JOIN fb ON fb.doc_id = p2ded.doc_id CROSS JOIN lw8), " +
        // corpus-mean gate: two-level chunked fold (mirror of chunkedGroupSum)
        "p2m1 AS (SELECT doc_id // 4096 AS ch, list_reduce(list(score ORDER BY doc_id), (a, b) -> a + b) AS sx, " +
        "count(*) AS c FROM p2sc GROUP BY ch), " +
        "p2m AS (SELECT list_reduce(list(sx ORDER BY ch), (a, b) -> a + b) / sum(c) AS m FROM p2m1), " +
        "p2surv AS (SELECT doc_id, source, text, tk FROM p2sc CROSS JOIN p2m WHERE score >= m), " +
        s"p2st AS (SELECT doc_id, source, CAST(len(tk) AS BIGINT) AS n_tok, ${ph("text")} AS h FROM p2surv), " +
        "p2tt AS (SELECT CAST(sum(n_tok) AS DOUBLE) AS total FROM p2st), " +
        "p2w AS (SELECT doc_id, source, n_tok, " +
        "CAST(sum(n_tok) OVER (PARTITION BY source ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM p2st), " +
        "p2kept AS (SELECT p2w.* FROM p2w CROSS JOIN p2tt WHERE cum <= CAST(floor(total * 0.25e0) AS BIGINT)) " +
        "SELECT source, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens " +
        "FROM p2kept GROUP BY source ORDER BY source"
    )
  )

  /** PII scan + redaction (round 6b): the privacy pre-pass every released
    * training corpus runs (C4/Dolma-style). Three conservative regex
    * classes — email, NANP-style phone, IPv4 — counted per doc and
    * scrubbed in a fixed order (email → phone → ip, so an address's
    * digits are never double-counted as a phone). Patterns are written in
    * the Java∩RE2 common dialect so the DuckDB oracle matches byte-for-
    * byte. Map-side only: zero shuffle at any corpus size; the redacted
    * text ships as its polyHash, not the text itself. */
  val qPii = Q(
    "x_pii",
    (s, dir) => {
      Graft.init(s)
      graft.streaming.StreamingTa.piiScanStream(docs(s, dir)).orderBy("doc_id")
    },
    Some {
      val reEmail = TextOps.PiiEmail
      val rePhone = TextOps.PiiPhone
      val reIp = TextOps.PiiIp
      s"WITH r AS (SELECT doc_id, " +
        s"len(regexp_extract_all(text, '$reEmail')) AS n_email, " +
        s"len(regexp_extract_all(text, '$rePhone')) AS n_phone, " +
        s"len(regexp_extract_all(text, '$reIp')) AS n_ip, " +
        s"regexp_replace(regexp_replace(regexp_replace(text, '$reEmail', '[EMAIL]', 'g'), " +
        s"'$rePhone', '[PHONE]', 'g'), '$reIp', '[IP]', 'g') AS red FROM documents) " +
        s"SELECT doc_id, CAST(n_email AS BIGINT) AS n_email, CAST(n_phone AS BIGINT) AS n_phone, " +
        s"CAST(n_ip AS BIGINT) AS n_ip, CAST(n_email + n_phone + n_ip AS BIGINT) AS n_pii, " +
        s"(n_email + n_phone + n_ip) > 0 AS has_pii, ${ph("red")} AS red_hash " +
        "FROM r ORDER BY doc_id"
    }
  )

  /** Deterministic weighted sampling without replacement (round 6b) —
    * Efraimidis & Spirakis 2006: priority = ln(u)/w with u a hash-derived
    * uniform, take the k largest. The one-pass distributed answer to
    * "sample 50 docs proportional to length": no RNG state, reproducible
    * under any partitioning, and the cut is TakeOrderedAndProject — k·P
    * rows cross the wire, never the corpus. Weight = n_chars; u from
    * polyHash(text) so resampling a changed corpus is automatic. */
  val qWeightedSample = Q(
    "x_weighted_sample",
    (s, dir) => {
      Graft.init(s)
      val u = (TextOps.polyHash(col("text")).cast("double") + lit(0.5)) / lit(P0.toDouble)
      val key = log(u) / col("n_chars").cast("double")
      docs(s, dir)
        .where(col("n_chars") > 0)
        .select(
          col("doc_id"),
          col("source"),
          col("n_chars").cast("long").as("w"),
          key.as("__k")
        )
        .orderBy(col("__k").desc, col("doc_id"))
        .limit(50)
        .select(col("doc_id"), col("source"), col("w"), P.normd(col("__k")).as("priority"))
        .orderBy("doc_id")
    },
    Some(
      s"WITH r AS (SELECT doc_id, source, CAST(n_chars AS BIGINT) AS w, " +
        s"ln((${ph("text")} + 0.5e0) / $P0.0e0) / n_chars AS k " +
        "FROM documents WHERE n_chars > 0 ORDER BY k DESC, doc_id LIMIT 50) " +
        "SELECT doc_id, source, w, round(k, 6) AS priority FROM r ORDER BY doc_id"
    )
  )

  /** Corpus snapshot diff (round 6b) — dataset versioning: given two
    * releases of a corpus, account every doc as added / removed / changed
    * / unchanged by content hash, per source. The audit table a recurring
    * crawl publishes next to each release (what Dolma/C4 changelogs
    * tabulate). Two deterministic snapshot views of `documents` stand in
    * for the releases: old = doc_id % 11 ≠ 0 with %13-docs pre-
    * normalization (a simulated edit), new = doc_id % 17 ≠ 0 verbatim.
    * One doc_id-equi full-outer join + one hash-aggregate: at 100 TB both
    * sides shuffle once on doc_id (or co-bucket by doc_id and the join is
    * shuffle-free); only (source, status) counts come back. */
  val qCorpusDiff = Q(
    "x_corpus_diff",
    (s, dir) => {
      Graft.init(s)
      val d = docs(s, dir)
      val old = d
        .where(col("doc_id") % 11 =!= 0)
        .select(
          col("doc_id"),
          col("source"),
          TextOps
            .polyHash(
              when(col("doc_id") % 13 === 0, TextOps.normalizeText(col("text")))
                .otherwise(col("text"))
            )
            .as("h_old")
        )
      val nw = d
        .where(col("doc_id") % 17 =!= 0)
        .select(col("doc_id"), col("source"), TextOps.polyHash(col("text")).as("h_new"))
      old
        .withColumnRenamed("source", "src_old")
        .join(nw.withColumnRenamed("source", "src_new"), Seq("doc_id"), "full_outer")
        .select(
          coalesce(col("src_new"), col("src_old")).as("source"),
          when(col("h_old").isNull, "added")
            .when(col("h_new").isNull, "removed")
            .when(col("h_old") === col("h_new"), "unchanged")
            .otherwise("changed")
            .as("status")
        )
        .groupBy("source", "status")
        .agg(count(lit(1)).as("n"))
        .orderBy("source", "status")
    },
    Some(
      "WITH old AS (SELECT doc_id, source, " +
        s"${ph("CASE WHEN doc_id % 13 = 0 THEN trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) ELSE text END")} AS h_old " +
        "FROM documents WHERE doc_id % 11 <> 0), " +
        s"nw AS (SELECT doc_id, source, ${ph("text")} AS h_new FROM documents WHERE doc_id % 17 <> 0), " +
        "j AS (SELECT coalesce(nw.source, old.source) AS source, " +
        "CASE WHEN h_old IS NULL THEN 'added' WHEN h_new IS NULL THEN 'removed' " +
        "WHEN h_old = h_new THEN 'unchanged' ELSE 'changed' END AS status " +
        "FROM old FULL OUTER JOIN nw USING (doc_id)) " +
        "SELECT source, status, count(*) AS n FROM j GROUP BY source, status ORDER BY source, status"
    )
  )

  /** Leakage-free split (round 6b): assign train/val/test by near-dup
    * CLUSTER, not by doc — the eval-integrity fix for x_split's blind
    * spot, where two near-duplicates can straddle train and test and leak
    * the answer (Lee et al. 2021 measure exactly this). Split key =
    * polyHash of the cluster representative id, so every member of a
    * cluster lands in the same partition by construction; the output
    * carries the measured cross-split leak count (structurally 0 here,
    * and the column is the audit a pipeline asserts on). Cost on top of
    * clustering: one map-side bucket + one hash-agg. */
  val qSplitLeakfree = Q(
    "x_split_leakfree",
    (s, dir) => {
      val d = docs(s, dir)
      val cl = Dedup.nearDupClusters(d, Dedup.jaccardPairs(d, threshold = 0.5))
      val lab = cl.select(
        col("doc_id"),
        col("cluster_id"),
        pmod(TextOps.polyHash(col("cluster_id").cast("string")), lit(100L)).as("bucket")
      )
      val split = lab.withColumn(
        "split",
        when(col("bucket") < 80, "train").when(col("bucket") < 90, "val").otherwise("test")
      )
      val leaky = split
        .groupBy("cluster_id")
        .agg(countDistinct(col("split")).as("__ns"))
        .agg(count(when(col("__ns") > 1, 1)).as("leaky_clusters"))
      split
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"), countDistinct(col("cluster_id")).as("n_clusters"))
        .crossJoin(broadcast(leaky))
        .orderBy("split")
    },
    Some(
      s"WITH RECURSIVE ${jacIdxCtes("a.doc_id < b.doc_id")}, " +
        "pairs AS (SELECT a_id, b_id FROM jc WHERE jac >= 0.5), " +
        "edges AS (SELECT a_id AS u, b_id AS v FROM pairs UNION ALL SELECT b_id, a_id FROM pairs), " +
        "reach(u, v) AS (SELECT u, v FROM edges UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u), " +
        "lab AS (SELECT d.doc_id, least(d.doc_id, coalesce(min(r.v), d.doc_id)) AS cluster_id " +
        "FROM documents d LEFT JOIN reach r ON r.u = d.doc_id GROUP BY d.doc_id), " +
        s"sp AS (SELECT doc_id, cluster_id, CASE WHEN ${ph("CAST(cluster_id AS VARCHAR)")} % 100 < 80 THEN 'train' " +
        s"WHEN ${ph("CAST(cluster_id AS VARCHAR)")} % 100 < 90 THEN 'val' ELSE 'test' END AS split FROM lab), " +
        "lk AS (SELECT count(*) FILTER (WHERE ns > 1) AS leaky_clusters FROM " +
        "(SELECT cluster_id, count(DISTINCT split) AS ns FROM sp GROUP BY cluster_id)) " +
        "SELECT split, count(*) AS n_docs, count(DISTINCT cluster_id) AS n_clusters, " +
        "max(lk.leaky_clusters) AS leaky_clusters FROM sp CROSS JOIN lk " +
        "GROUP BY split ORDER BY split"
    )
  )

  /** Per-class embedding outlier scoring (round 6b): distance to the
    * label centroid + within-label percentile — the mislabeled-example /
    * novelty filter (Northcutt's confident-learning shape on the
    * geometric side). Centroids are trained with the same fixed-order
    * fold contract as PCA/LR (vec_id-ordered per-dim sums collected to
    * the driver — 2·d·|labels| doubles), broadcast back as a map literal,
    * and the distance fold runs dim-ordered, so the oracle replays
    * training bit-for-bit. Scoring is map-side; the only shuffle is the
    * per-label rank window. */
  val qEmbedOutliers = Q(
    "x_embed_outliers",
    (s, dir) => {
      Graft.init(s)
      val e = embs(s, dir)
      val vecD = transform(col("embedding"), v => v.cast("double"))
      val cents: Map[Int, Seq[Double]] = graft.CacheRegistry.memoStat(
        s,
        s"embout:cents:${graft.CacheRegistry.planKey(e)}"
      ) {
        e.select(col("vec_id"), col("label"), posexplode(vecD).as(Seq("d", "x")))
          .groupBy("label", "d")
          .agg(Similarity.orderedSum(col("vec_id"), col("x")).as("sx"), count(lit(1)).as("cnt"))
          .collect()
          .groupBy(_.getInt(0))
          .map { case (lbl, rows) =>
            lbl -> rows.sortBy(_.getInt(1)).map(r => r.getDouble(2) / r.getLong(3)).toSeq
          }
      }
      val centCol = element_at(typedLit(cents), col("label"))
      val dist = sqrt(
        aggregate(
          zip_with(vecD, centCol, (x, c) => (x - c) * (x - c)),
          lit(0.0),
          (a, v) => a + v
        )
      )
      val w = org.apache.spark.sql.expressions.Window.partitionBy("label").orderBy("__dist")
      e.select(col("vec_id"), col("label"), dist.as("__dist"))
        .withColumn("pr", percent_rank().over(w))
        .select(
          col("vec_id"),
          col("label"),
          P.normd(col("__dist")).as("dist"),
          P.normd(col("pr")).as("pr"),
          (col("pr") >= 0.95).as("is_outlier")
        )
        .orderBy("vec_id")
    },
    Some(
      "WITH ex AS (SELECT vec_id, label, generate_subscripts(embedding, 1) AS d, " +
        "unnest(embedding)::DOUBLE AS x FROM embeddings), " +
        "cents AS (SELECT label, d, list_reduce(list(x ORDER BY vec_id), (a, b) -> a + b) / count(*) AS c " +
        "FROM ex GROUP BY label, d), " +
        "dists AS (SELECT e.vec_id, e.label, " +
        "sqrt(list_reduce(list((e.x - c.c) * (e.x - c.c) ORDER BY e.d), (a, b) -> a + b)) AS dist " +
        "FROM ex e JOIN cents c ON c.label = e.label AND c.d = e.d GROUP BY e.vec_id, e.label), " +
        "pr AS (SELECT vec_id, label, dist, percent_rank() OVER (PARTITION BY label ORDER BY dist) AS pr FROM dists) " +
        "SELECT vec_id, label, round(dist, 6) AS dist, round(pr, 6) AS pr, pr >= 0.95e0 AS is_outlier " +
        "FROM pr ORDER BY vec_id"
    )
  )

  /** Deletion-request propagation (round 6b): GDPR/right-to-be-forgotten
    * over a deduplicated corpus. Deleting only the requested doc_ids is
    * not enough — their near-duplicates carry the same content, so the
    * forget set must close over near-dup clusters (the flip side of
    * x_split_leakfree's integrity argument). Per-source audit: direct
    * requests, propagated removals, and what survives. Cost on top of
    * clustering: one broadcast semi-join of hit clusters + one hash-agg
    * — the request list is always tiny next to the corpus. */
  val qForget = Q(
    "x_forget",
    (s, dir) => {
      val d = docs(s, dir)
      val cl = Dedup.nearDupClusters(d, Dedup.jaccardPairs(d, threshold = 0.5))
      val direct = col("doc_id") % 97 === 5
      val hit = cl
        .where(direct)
        .select(col("cluster_id"))
        .distinct()
        .withColumn("__hit", lit(true))
      cl.join(broadcast(hit), Seq("cluster_id"), "left")
        .join(d.select(col("doc_id"), col("source")), Seq("doc_id"))
        .select(
          col("source"),
          direct.cast("int").as("__direct"),
          (coalesce(col("__hit"), lit(false)) && !direct).cast("int").as("__prop"),
          coalesce(col("__hit"), lit(false)).cast("int").as("__gone")
        )
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum("__direct").cast("long").as("n_direct"),
          sum("__prop").cast("long").as("n_propagated"),
          (count(lit(1)) - sum("__gone")).cast("long").as("n_kept")
        )
        .orderBy("source")
    },
    Some(
      s"WITH RECURSIVE ${jacIdxCtes("a.doc_id < b.doc_id")}, " +
        "pairs AS (SELECT a_id, b_id FROM jc WHERE jac >= 0.5), " +
        "edges AS (SELECT a_id AS u, b_id AS v FROM pairs UNION ALL SELECT b_id, a_id FROM pairs), " +
        "reach(u, v) AS (SELECT u, v FROM edges UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u), " +
        "lab AS (SELECT d.doc_id, least(d.doc_id, coalesce(min(r.v), d.doc_id)) AS cluster_id " +
        "FROM documents d LEFT JOIN reach r ON r.u = d.doc_id GROUP BY d.doc_id), " +
        "hit AS (SELECT DISTINCT cluster_id FROM lab WHERE doc_id % 97 = 5), " +
        "j AS (SELECT l.doc_id, l.cluster_id, d.source, l.doc_id % 97 = 5 AS direct, " +
        "h.cluster_id IS NOT NULL AS gone FROM lab l " +
        "JOIN documents d ON d.doc_id = l.doc_id LEFT JOIN hit h ON h.cluster_id = l.cluster_id) " +
        "SELECT source, count(*) AS n_docs, " +
        "CAST(sum(CASE WHEN direct THEN 1 ELSE 0 END) AS BIGINT) AS n_direct, " +
        "CAST(sum(CASE WHEN gone AND NOT direct THEN 1 ELSE 0 END) AS BIGINT) AS n_propagated, " +
        "CAST(count(*) - sum(CASE WHEN gone THEN 1 ELSE 0 END) AS BIGINT) AS n_kept " +
        "FROM j GROUP BY source ORDER BY source"
    )
  )

  /** Incremental IVF append + drift monitor (round 6b): a held-out ingest
    * batch (vec_id % 10 = 0) is assigned to the BASE-trained centroids
    * without retraining — the continuous-ingest index-maintenance shape —
    * and the per-cell audit compares mean centroid-similarity of base vs
    * appended vectors (ordered folds), the staleness signal that tells
    * operators when assignment quality has decayed enough to retrain.
    * Base-side work is memo'd index reuse; batch work is batch×nCells
    * dots; the oracle replays the base trainer and both assignments. */
  val qAnnAppend = Q(
    "x_ann_append",
    (s, dir) => {
      val e = embs(s, dir)
      val base = e.where(col("vec_id") % 10 =!= 0).select(col("vec_id"), col("embedding"))
      val nw = e.where(col("vec_id") % 10 === 0).select(col("vec_id"), col("embedding"))
      val cents = Similarity.kmeansCentroids(base, 16)
      val merged = Similarity.ivfAppend(base, nw, 16)
      def orderedMean(flag: org.apache.spark.sql.Column) = {
        val lst = transform(
          array_sort(collect_list(when(flag, struct(col("vec_id"), col("sim"))))),
          x => x("sim")
        )
        val cnt = sum(flag.cast("long"))
        when(cnt > 0, aggregate(lst, lit(0.0), (a, v) => a + v) / cnt.cast("double"))
      }
      merged
        .join(broadcast(cents), col("cell") === col("cent_id"))
        .withColumn("sim", Similarity.dot(col("embedding"), col("cent_emb")))
        .groupBy("cell")
        .agg(
          sum((!col("is_new")).cast("long")).as("n_base"),
          sum(col("is_new").cast("long")).as("n_new"),
          P.normd(orderedMean(!col("is_new"))).as("mean_sim_base"),
          P.normd(orderedMean(col("is_new"))).as("mean_sim_new")
        )
        .orderBy("cell")
    },
    Some(
      "WITH base AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 <> 0), " +
        "nw AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 = 0), " +
        s"${kmeansCtes(16, 64, 1, "base")}, " +
        "asgb AS (SELECT vec_id, cell, sim FROM (SELECT b.vec_id, ct.cent_id AS cell, " +
        s"${dotSql("b.embedding", "ct.cent_emb")} AS sim, " +
        s"row_number() OVER (PARTITION BY b.vec_id ORDER BY ${dotSql("b.embedding", "ct.cent_emb")} DESC, ct.cent_id ASC) AS rk " +
        "FROM base b, cents ct) WHERE rk = 1), " +
        "asgn AS (SELECT vec_id, cell, sim FROM (SELECT n.vec_id, ct.cent_id AS cell, " +
        s"${dotSql("n.embedding", "ct.cent_emb")} AS sim, " +
        s"row_number() OVER (PARTITION BY n.vec_id ORDER BY ${dotSql("n.embedding", "ct.cent_emb")} DESC, ct.cent_id ASC) AS rk " +
        "FROM nw n, cents ct) WHERE rk = 1), " +
        "u AS (SELECT vec_id, cell, sim, FALSE AS is_new FROM asgb " +
        "UNION ALL SELECT vec_id, cell, sim, TRUE AS is_new FROM asgn) " +
        "SELECT cell, " +
        "CAST(count(*) FILTER (WHERE NOT is_new) AS BIGINT) AS n_base, " +
        "CAST(count(*) FILTER (WHERE is_new) AS BIGINT) AS n_new, " +
        "round(CASE WHEN count(*) FILTER (WHERE NOT is_new) > 0 THEN " +
        "list_reduce(list(sim ORDER BY vec_id) FILTER (WHERE NOT is_new), (x, y) -> x + y) / (count(*) FILTER (WHERE NOT is_new)) END, 6) AS mean_sim_base, " +
        "round(CASE WHEN count(*) FILTER (WHERE is_new) > 0 THEN " +
        "list_reduce(list(sim ORDER BY vec_id) FILTER (WHERE is_new), (x, y) -> x + y) / (count(*) FILTER (WHERE is_new)) END, 6) AS mean_sim_new " +
        "FROM u GROUP BY cell ORDER BY cell"
    )
  )

  /** Zipf rank-frequency fit (round 6c): log-log OLS slope over the
    * top-200 terms — the corpus-health / tokenizer-sizing statistic
    * (natural language sits near slope −1; synthetic or templated
    * corpora drift). One hash-agg for term counts, a TakeOrdered(200)
    * cut, and the OLS folds run rank-ordered over just those 200 rows,
    * so the fit costs nothing at any corpus size. */
  val qZipf = Q(
    "x_zipf",
    (s, dir) => {
      Graft.init(s)
      val terms = docs(s, dir)
        .select(explode(TextOps.tokens(col("text"))).as("term"))
        .groupBy("term")
        .agg(count(lit(1)).as("cnt"))
      val totals = terms.agg(
        count(lit(1)).as("n_terms"),
        sum("cnt").cast("long").as("n_tokens")
      )
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("cnt").desc, col("term").asc)
      val top = terms
        .orderBy(col("cnt").desc, col("term").asc)
        .limit(200)
        .withColumn("rank", row_number().over(w))
        .select(log(col("rank").cast("double")).as("x"), log(col("cnt").cast("double")).as("y"), col("rank"))
      // rank-ordered folds: Σx, Σy, Σxy, Σx², Σy² — deterministic FP
      def fold(v: org.apache.spark.sql.Column) =
        aggregate(
          transform(array_sort(collect_list(struct(col("rank"), v.as("v")))), t => t("v")),
          lit(0.0),
          (a, x) => a + x
        )
      top
        .agg(
          count(lit(1)).cast("double").as("__n"),
          fold(col("x")).as("__sx"),
          fold(col("y")).as("__sy"),
          fold(col("x") * col("y")).as("__sxy"),
          fold(col("x") * col("x")).as("__sxx"),
          fold(col("y") * col("y")).as("__syy")
        )
        .crossJoin(broadcast(totals))
        .select(
          col("n_terms"),
          col("n_tokens"),
          P.normd(
            (col("__n") * col("__sxy") - col("__sx") * col("__sy")) /
              (col("__n") * col("__sxx") - col("__sx") * col("__sx"))
          ).as("zipf_slope"),
          P.normd(
            (col("__sy") - col("__sx") *
              ((col("__n") * col("__sxy") - col("__sx") * col("__sy")) /
                (col("__n") * col("__sxx") - col("__sx") * col("__sx")))) / col("__n")
          ).as("intercept"),
          P.normd(
            pow(col("__n") * col("__sxy") - col("__sx") * col("__sy"), 2) /
              ((col("__n") * col("__sxx") - col("__sx") * col("__sx")) *
                (col("__n") * col("__syy") - col("__sy") * col("__sy")))
          ).as("r2")
        )
    },
    Some(
      s"WITH toks AS ($toksCte), " +
        "tc AS (SELECT t AS term, count(*) AS cnt FROM (SELECT unnest(tk) AS t FROM toks) GROUP BY t), " +
        "tot AS (SELECT count(*) AS n_terms, CAST(sum(cnt) AS BIGINT) AS n_tokens FROM tc), " +
        "top AS (SELECT ln(CAST(row_number() OVER (ORDER BY cnt DESC, term ASC) AS DOUBLE)) AS x, " +
        "ln(CAST(cnt AS DOUBLE)) AS y, row_number() OVER (ORDER BY cnt DESC, term ASC) AS rank " +
        "FROM tc ORDER BY cnt DESC, term ASC LIMIT 200), " +
        "f AS (SELECT count(*)::DOUBLE AS n, " +
        "list_reduce(list(x ORDER BY rank), (a, b) -> a + b) AS sx, " +
        "list_reduce(list(y ORDER BY rank), (a, b) -> a + b) AS sy, " +
        "list_reduce(list(x * y ORDER BY rank), (a, b) -> a + b) AS sxy, " +
        "list_reduce(list(x * x ORDER BY rank), (a, b) -> a + b) AS sxx, " +
        "list_reduce(list(y * y ORDER BY rank), (a, b) -> a + b) AS syy FROM top) " +
        "SELECT tot.n_terms, tot.n_tokens, " +
        "round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope, " +
        "round((sy - sx * ((n * sxy - sx * sy) / (n * sxx - sx * sx))) / n, 6) AS intercept, " +
        "round(pow(n * sxy - sx * sy, 2) / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2 " +
        "FROM f CROSS JOIN tot"
    )
  )

  /** Robust per-source length outliers (round 6c): median/MAD robust
    * z-score on n_chars (|z| > 3.5, the Iglewicz–Hoaglin cut) — the
    * length filter that survives heavy-tailed web text where mean/stddev
    * clip half a source. Exact interpolated percentiles (Spark
    * `percentile` ≡ DuckDB `quantile_cont`); two source-keyed passes
    * (median, then MAD on the residual), stats broadcast back. */
  val qRobustLength = Q(
    "x_robust_length",
    (s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("source"), col("n_chars"))
      val med = d
        .groupBy("source")
        .agg(percentile(col("n_chars"), lit(0.5)).as("med"))
      val mad = d
        .join(broadcast(med), "source")
        .groupBy("source")
        .agg(percentile(abs(col("n_chars") - col("med")), lit(0.5)).as("mad"))
      val rz = lit(0.6745) * (col("n_chars") - col("med")) / nullif(col("mad"), lit(0.0))
      d.join(broadcast(med), "source")
        .join(broadcast(mad), "source")
        .select(
          col("doc_id"),
          col("source"),
          col("n_chars").cast("long").as("n_chars"),
          P.normd(col("med")).as("med"),
          P.normd(col("mad")).as("mad"),
          P.normd(rz).as("rz"),
          // flag off the ROUNDED z (both engines): a value within 5e-7 of
          // the 3.5 cut must not flip the flag on fp noise
          coalesce(abs(P.normd(rz)) > 3.5, lit(false)).as("is_len_outlier")
        )
        .orderBy("doc_id")
    },
    Some(
      "WITH med AS (SELECT source, quantile_cont(n_chars, 0.5e0) AS med FROM documents GROUP BY source), " +
        "mad AS (SELECT d.source, quantile_cont(abs(d.n_chars - m.med), 0.5e0) AS mad " +
        "FROM documents d JOIN med m USING (source) GROUP BY d.source), " +
        "z AS (SELECT d.doc_id, d.source, d.n_chars, m.med, a.mad, " +
        "0.6745e0 * (d.n_chars - m.med) / nullif(a.mad, 0.0e0) AS rz " +
        "FROM documents d JOIN med m USING (source) JOIN mad a USING (source)) " +
        "SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars, round(med, 6) AS med, " +
        "round(mad, 6) AS mad, round(rz, 6) AS rz, " +
        "coalesce(abs(round(rz, 6)) > 3.5e0, FALSE) AS is_len_outlier FROM z ORDER BY doc_id"
    )
  )

  /** Population Stability Index per source vs the corpus (decile buckets
    * of n_chars, Laplace-smoothed shares) — see Mixture.psiBySource. The
    * smoothed shares divide and log from integer counts identical on
    * both engines; the 10-term PSI sum rounds at 6 dp. */
  val qPsi = Q(
    "x_psi",
    (s, dir) =>
      graft.extensions.Mixture
        .psiBySource(docs(s, dir), col("n_chars"))
        .select(col("source"), col("n_docs"), P.normd(col("psi")).as("psi"))
        .orderBy("source"),
    Some {
      val p = "(c_sb + 0.5e0) / (n_docs + 5e0)"
      val q = "(c_b + 0.5e0) / (n_tot + 5e0)"
      "WITH d AS (SELECT source, n_chars AS m FROM documents), " +
        "e AS (SELECT " + (1 to 9).map(i => s"quantile_cont(m, 0.${i}e0) AS e$i").mkString(", ") + " FROM d), " +
        "b AS (SELECT source, (" + (1 to 9).map(i => s"CASE WHEN m > e$i THEN 1 ELSE 0 END").mkString(" + ") + ") AS bucket FROM d, e), " +
        "sb AS (SELECT source, bucket, count(*) AS c_sb FROM b GROUP BY 1, 2), " +
        "gb AS (SELECT bucket, count(*) AS c_b FROM b GROUP BY 1), " +
        "st AS (SELECT source, CAST(sum(c_sb) AS BIGINT) AS n_docs FROM sb GROUP BY 1), " +
        "gt AS (SELECT CAST(sum(c_b) AS BIGINT) AS n_tot FROM gb), " +
        "grid AS (SELECT st.source, st.n_docs, g.bucket FROM st, (SELECT unnest(range(0, 10)) AS bucket) g), " +
        "j AS (SELECT grid.source, grid.n_docs, grid.bucket, coalesce(sb.c_sb, 0) AS c_sb, gb.c_b, gt.n_tot " +
        "FROM grid LEFT JOIN sb ON sb.source = grid.source AND sb.bucket = grid.bucket " +
        "JOIN gb ON gb.bucket = grid.bucket CROSS JOIN gt) " +
        s"SELECT source, n_docs, round(sum(($p - $q) * ln($p / $q)), 6) AS psi " +
        "FROM j GROUP BY 1, 2 ORDER BY source"
    }
  )

  val all: Seq[Q] = Seq(
    qLshCurve,
    qPsi,
    qPii,
    qWeightedSample,
    qCorpusDiff,
    qSplitLeakfree,
    qEmbedOutliers,
    qForget,
    qAnnAppend,
    qZipf,
    qRobustLength,
    qInfluence,
    qLrCalibration,
    qScoreCorr,
    qKnPerplexity,
    qPagerank,
    qBpeMerges,
    qBpeEncode,
    qPipeline2,
    qKcenter,
    qPcaRemove,
    qMixtureTemp,
    qQualityLr,
    qNormalize,
    qPmiPairs,
    qVocab,
    qSourceCap,
    qEditDistPairs,
    qPcaPower,
    qSplit,
    qStratSample,
    qMixture,
    qDedupCluster,
    qVecCluster,
    qTfidf,
    qBm25,
    qRm3,
    qChunks,
    qSurprisal,
    qQualityRules,
    qLangDist,
    qTextStats,
    qLangQuality,
    qDedupExact,
    qNeardupJaccard,
    qContainmentPairs,
    qBoilerplate,
    qNeardupIncr,
    qContamination,
    qWinnowFp,
    qWinnowPairs,
    qNeardupLsh,
    qTfidfCosine,
    qMinhash,
    qSimhash,
    qSimhashPairs,
    qCosineTopk,
    qAnnAuto,
    qAnnFiltered,
    qCosinePairs,
    qMediaFeatures,
    qMediaCdc,
    qMediaDecode,
    qMediaDecodeBmp,
    qMediaDecodeMixed,
    qMediaFrames,
    qAnnIvf,
    qAnnIvfBig,
    qClusterProfile,
    qAnnPq,
    qAnnIvfPq,
    qVecQuant,
    qVecQuantTopk,
    qVecNeardup,
    qZorderScan,
    qPack,
    qSurprisal2,
    qPipeline,
    qSemDedup,
    qDupSpans,
    qRedact,
    qDupRemove,
    qDsirWeights,
    qQualityGate
  )
}
