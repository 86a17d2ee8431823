package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Graft
import graft.ta.{prim => P, IndicatorSpec, Strategy, registry}
import sqlgen._
import SeriesQueries.{Cte, emaSql}

/** Full-correctness oracle for the Strategy batch flagship
  * (`strategy50_batch`): 50 indicators compiled into ONE Spark plan over
  * the per-user value series, checked column-for-column against DuckDB.
  *
  * The oracle is COMPOSED from the already-proven per-indicator oracle
  * SQL (SeriesQueries/MomentumQueries/RecQueries — each green at the
  * driver gate on the same 10k-row fixture), joined on (series_id, ts).
  * Params are pinned to the proven variants (length 10 everywhere the
  * per-indicator oracle used 10), so every output column's arithmetic is
  * literally the audited SQL. The ten columns with no prior series-fixture
  * oracle (zlma, t3, the five weighted MAs, quantile@0.75, kurtosis,
  * geometric mean) get a fresh chain below, mirroring Ta.scala
  * expression-for-expression like every other oracle in this package.
  */
object Strategy50Queries {

  /** Pinned spec list — params chosen to match the proven per-indicator
    * oracles (NOT always the registry defaults: bias/cti/psl/stats pin to
    * the length-10 variants the gate already audits). */
  val specs: Seq[IndicatorSpec] = Seq(
    IndicatorSpec("sma", Map("length" -> 10)),
    IndicatorSpec("ema", Map("length" -> 10)),
    IndicatorSpec("wma", Map("length" -> 10)),
    IndicatorSpec("rma", Map("length" -> 10)),
    IndicatorSpec("dema", Map("length" -> 10)),
    IndicatorSpec("tema", Map("length" -> 10)),
    IndicatorSpec("trima", Map("length" -> 10)),
    IndicatorSpec("hma", Map("length" -> 10)),
    IndicatorSpec("zlma", Map("length" -> 10)),
    IndicatorSpec("alma", Map("length" -> 10)),
    IndicatorSpec("fwma", Map("length" -> 10)),
    IndicatorSpec("pwma", Map("length" -> 10)),
    IndicatorSpec("swma", Map("length" -> 10)),
    IndicatorSpec("sinwma", Map("length" -> 10)),
    IndicatorSpec("t3", Map("length" -> 10)),
    IndicatorSpec("kama", Map("length" -> 10)),
    IndicatorSpec("vidya", Map("length" -> 10)),
    IndicatorSpec("midpoint", Map("length" -> 10)),
    IndicatorSpec("linreg", Map("length" -> 10)),
    IndicatorSpec("rsi", Map("length" -> 10)),
    IndicatorSpec("macd", Map()),
    IndicatorSpec("mom", Map("length" -> 10)),
    IndicatorSpec("roc", Map("length" -> 10)),
    IndicatorSpec("cmo", Map("length" -> 10)),
    IndicatorSpec("apo", Map()),
    IndicatorSpec("ppo", Map()),
    IndicatorSpec("bias", Map("length" -> 10)),
    IndicatorSpec("cfo", Map("length" -> 10)),
    IndicatorSpec("cg", Map("length" -> 10)),
    IndicatorSpec("coppock", Map()),
    IndicatorSpec("cti", Map("length" -> 10)),
    IndicatorSpec("er", Map("length" -> 10)),
    IndicatorSpec("psl", Map("length" -> 10)),
    IndicatorSpec("slope", Map("length" -> 1)),
    IndicatorSpec("trix", Map("length" -> 10)),
    IndicatorSpec("tsi", Map()),
    IndicatorSpec("stdev", Map("length" -> 10)),
    IndicatorSpec("variance", Map("length" -> 10)),
    IndicatorSpec("median", Map("length" -> 10)),
    IndicatorSpec("quantile", Map("length" -> 10, "q" -> 0.75)),
    IndicatorSpec("mad", Map("length" -> 10)),
    IndicatorSpec("skew", Map("length" -> 10)),
    IndicatorSpec("kurtosis", Map("length" -> 10)),
    IndicatorSpec("zscore", Map("length" -> 10)),
    IndicatorSpec("entropy", Map("length" -> 10)),
    IndicatorSpec("log_return", Map()),
    IndicatorSpec("percent_return", Map()),
    IndicatorSpec("drawdown", Map()),
    IndicatorSpec("decay", Map("length" -> 5)),
    IndicatorSpec("geometric_mean", Map("length" -> 10)),
    IndicatorSpec("kst", Map()),
    IndicatorSpec("stochrsi", Map("length" -> 10)),
    IndicatorSpec("vhf", Map("length" -> 10))
  )

  /** Oracle for the columns with no prior series-fixture query: one Cte
    * chain over the user series mirroring Ta.scala term-for-term
    * (weights/coefficients emitted as identical double literals). */
  private val extrasOuts = Seq(
    "zlma_10", "t3_10", "alma_10", "fwma_10", "pwma_10", "swma_10",
    "sinwma_10", "quantile_10", "kurtosis_10", "geomean_10"
  )

  private val extrasSql: String = {
    // mirror of Ta.wdotMa: reverse to lag order, normalize by Σw, gate at n
    def wdotSql(x: String, weights: Seq[Double]): String = {
      val s = weights.sum
      gate(x, weights.size, wdot(x, weights.reverse.map(_ / s)))
    }
    val n = 10
    val almaW = { val m = 0.85 * (n - 1); val s = n / 6.0; (0 until n).map(i => math.exp(-(i - m) * (i - m) / (2 * s * s))) }
    val fibW = Iterator.iterate((1.0, 1.0)) { case (a, b) => (b, a + b) }.map(_._1).take(n).toSeq
    val pasW = (0 until n).scanLeft(1.0) { case (acc, k) => acc * (n - 1 - k) / (k + 1) }.take(n)
    val triW = ((1 to 5) ++ (5 to 1 by -1)).map(_.toDouble)
    val sinW = (0 until n).map(i => math.sin((i + 1) * math.Pi / (n + 1)))
    // t3 Tillson coefficients, a = 0.7 (mirror of Ta.t3)
    val a = 0.7
    val tc1 = -a * a * a
    val tc2 = 3.0 * a * a + 3.0 * a * a * a
    val tc3 = -6.0 * a * a - 3.0 * a - 3.0 * a * a * a
    val tc4 = 1.0 + 3.0 * a + a * a * a + 3.0 * a * a
    var b: Cte = SeriesQueries.series
      .addSel("x0", s"2e0 * close - lag(close, 4) $ov AS zl")
    b = emaSql(b, "zl", "zlma_10", n)
    for (i <- 1 to 6) b = emaSql(b, if (i == 1) "close" else s"e${i - 1}", s"e$i", n)
    b = b
      .addSel("xt3", s"(${d(tc1)})*e6 + (${d(tc2)})*e5 + (${d(tc3)})*e4 + (${d(tc4)})*e3 AS t3_10")
      .addSel(
        "xw",
        s"${wdotSql("close", almaW)} AS alma_10, ${wdotSql("close", fibW)} AS fwma_10, " +
          s"${wdotSql("close", pasW)} AS pwma_10, ${wdotSql("close", triW)} AS swma_10, " +
          s"${wdotSql("close", sinW)} AS sinwma_10"
      )
      .addSel("xq", s"${rquantile("close", 0.75, n)} AS quantile_10")
      // rolling kurtosis via the moment closed form (mirror of prim.rkurt;
      // same staging the green stats2_10 oracle uses for skew/kurt)
      .addSel(
        "xk1",
        s"sum(close) ${fr(n)} AS ks1, sum(close*close) ${fr(n)} AS ks2, " +
          s"sum(close*close*close) ${fr(n)} AS ks3, sum(close*close*close*close) ${fr(n)} AS ks4, " +
          s"count(close) ${fr(n)} AS kcnt"
      )
      .addSel(
        "xk2",
        "ks2/10e0 - (ks1/10e0)*(ks1/10e0) AS km2, " +
          "ks4/10e0 - 4e0*(ks1/10e0)*(ks3/10e0) + 6e0*(ks1/10e0)*(ks1/10e0)*(ks2/10e0) - 3e0*(ks1/10e0)*(ks1/10e0)*(ks1/10e0)*(ks1/10e0) AS km4"
      )
      .addSel(
        "xk3",
        s"CASE WHEN kcnt >= $n AND km2 > 0 THEN ((11e0)*((${sdiv("km4", "(km2*km2)")}) - 3e0) + 6e0) * 9e0 / (8e0*7e0) END AS kurtosis_10"
      )
      .addSel("xg1", "CASE WHEN close > 0 THEN ln(close) END AS lnx")
      .addSel("xg2", s"CASE WHEN count(lnx) ${fr(n)} >= $n THEN exp(avg(lnx) ${fr(n)}) END AS geomean_10")
    b.result(
      s"SELECT series_id, ts, ${extrasOuts.map(o => s"${normd(o)} AS $o").mkString(", ")} FROM ${b.top}"
    )
  }

  /** (subquery SQL, columns taken from it) — every subquery is a complete
    * per-indicator oracle already green at the driver gate. */
  private def parts: Seq[(String, Seq[String])] = Seq(
    SeriesQueries.qSma.sql.get -> Seq("sma_10"),
    SeriesQueries.qEma.sql.get -> Seq("ema_10"),
    SeriesQueries.qWma.sql.get -> Seq("wma_10"),
    SeriesQueries.qRma.sql.get -> Seq("rma_10"),
    SeriesQueries.qDema.sql.get -> Seq("dema_10"),
    SeriesQueries.qTema.sql.get -> Seq("tema_10"),
    SeriesQueries.qTrima.sql.get -> Seq("trima_10"),
    SeriesQueries.qHma.sql.get -> Seq("hma_10"),
    SeriesQueries.qRsi.sql.get -> Seq("rsi_10"),
    SeriesQueries.qMacd.sql.get -> Seq("macd", "macds", "macdh"),
    SeriesQueries.qMomRoc.sql.get -> Seq("mom_10", "roc_10", "slope_1"),
    SeriesQueries.qStats.sql.get -> Seq("stdev_10", "variance_10", "median_10", "zscore_10"),
    SeriesQueries.qStats2.sql.get -> Seq("mad_10", "skew_10", "entropy_10"),
    SeriesQueries.qReturns.sql.get -> Seq("log_return_1", "percent_return_1"),
    SeriesQueries.qDrawdown.sql.get -> Seq("dd", "dd_pct", "dd_log"),
    MomentumQueries.qOscillators.sql.get -> Seq(
      "cmo_10", "apo_12_26", "ppo_12_26", "bias_10", "er_10", "psl_10", "midpoint_10", "vhf_10"
    ),
    MomentumQueries.qLinreg.sql.get -> Seq(
      "linreg_10_slope", "linreg_10_intercept", "linreg_10_tsf", "linreg_10_r",
      "cfo_10", "cti_10", "cg_10"
    ),
    MomentumQueries.qCoppockKst.sql.get -> Seq("coppock_10_11_14", "kst", "kst_signal"),
    MomentumQueries.qTrixTsi.sql.get -> Seq("trix_10", "tsi_13_25"),
    RecQueries.qKama.sql.get -> Seq("kama_10"),
    RecQueries.qVidya.sql.get -> Seq("vidya_10"),
    RecQueries.qDecay.sql.get -> Seq("decay_5"),
    MomentumQueries.qStochRsi.sql.get -> Seq("stochrsi_k", "stochrsi_d"),
    extrasSql -> extrasOuts
  )

  /** All output columns of the batch (53 specs). */
  val outs: Seq[String] = parts.flatMap(_._2)

  val q: Q = Q(
    "strategy50_batch",
    (s: SparkSession, dir: String) => {
      Graft.init(s)
      registry
        .strategy(Graft.userSeries(s, dir), Strategy("batch50", specs))
        .select(col("series_id") +: col("ts") +: outs.map(o => P.normd(col(o)).as(o)): _*)
        .orderBy("series_id", "ts")
    },
    Some(composeJoin(parts))
  )
}
