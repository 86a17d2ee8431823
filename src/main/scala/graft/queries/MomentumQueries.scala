package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Graft
import graft.ta.{prim => P}
import graft.ta.Ta._
import sqlgen._
import SeriesQueries.{Cte, emaSql}

/** Momentum/trend indicators over the per-user value series, paired with
  * structurally identical DuckDB oracle SQL (reference: pandas_ta/momentum/
  * and pandas_ta/trend/ — formulas per SURVEY.md §2.B declared spec).
  */
object MomentumQueries {

  private def series = SeriesQueries.series

  private def mk(name: String, outs: Seq[String], sql: String)(
      build: DataFrame => DataFrame
  ): Q =
    Q(
      name,
      (spark: SparkSession, dir: String) => {
        Graft.init(spark)
        build(Graft.userSeries(spark, dir))
          .select(col("series_id") +: col("ts") +: outs.map(o => P.normd(col(o)).as(o)): _*)
          .orderBy("series_id", "ts")
      },
      Some(sql)
    )

  private def fin(b: Cte, outs: Seq[String]): String =
    b.result(
      s"SELECT series_id, ts, ${outs.map(o => s"${normd(o)} AS $o").mkString(", ")} FROM ${b.top}$orderTail"
    )

  // ------------------------------------------- rolling-sum oscillators
  val qOscillators = {
    val b = series
      .addSel("t1", s"close - lag(close, 1) $ov AS dd")
      .addSel(
        "t2",
        "CASE WHEN dd IS NULL THEN NULL WHEN dd > 0 THEN dd ELSE 0e0 END AS up, " +
          "CASE WHEN dd IS NULL THEN NULL WHEN dd < 0 THEN -dd ELSE 0e0 END AS dn, " +
          "CASE WHEN dd > 0 THEN 1e0 ELSE 0e0 END AS gt, " +
          "abs(dd) AS ad"
      )
      .addSel(
        "t3",
        s"100e0 * ${sdiv(s"(${rsum("up", 10)} - ${rsum("dn", 10)})", s"(${rsum("up", 10)} + ${rsum("dn", 10)})")} AS cmo_10, " +
          s"${rmean("close", 12)} - ${rmean("close", 26)} AS apo_12_26, " +
          s"100e0 * ${sdiv(s"(${rmean("close", 12)} - ${rmean("close", 26)})", rmean("close", 26))} AS ppo_12_26, " +
          s"100e0 * (${sdiv("close", rmean("close", 10))} - 1e0) AS bias_10, " +
          s"${sdiv(s"abs(close - lag(close, 10) $ov)", rsum("ad", 10))} AS er_10, " +
          s"100e0 * ${rsum("gt", 10)} / 10e0 AS psl_10, " +
          s"(${rmax("close", 10)} + ${rmin("close", 10)}) / 2e0 AS midpoint_10, " +
          s"${sdiv(s"abs(${rmax("close", 10)} - ${rmin("close", 10)})", rsum("ad", 10))} AS vhf_10"
      )
    val outs = Seq("cmo_10", "apo_12_26", "ppo_12_26", "bias_10", "er_10", "psl_10", "midpoint_10", "vhf_10")
    mk("oscillators", outs, fin(b, outs)) {
      _.ta.cmo(10).ta.apo(12, 26).ta.ppo(12, 26).ta.bias(10).ta.er(10).ta
        .psl(10).ta.midpoint(10).ta.vhf(10)
    }
  }

  // ------------------------------------------- linreg family + cg/cfo/cti
  val qLinreg = {
    val (slope10, rest10) = linregCalc("linreg_10", 10)
    val b = series
      .addSel("lr1", linregStage("close", 10))
      .addSel("lr2", slope10)
      .addSel("lr3", rest10)
      .addSel(
        "lr4",
        s"100e0 * ${sdiv("(close - linreg_10_tsf)", "close")} AS cfo_10, " +
          s"linreg_10_r AS cti_10, " +
          s"-(${sdiv(
              s"CASE WHEN count(close) ${fr(10)} >= 10 THEN ${(1 to 10).map(i => s"lag(close, ${i - 1}) $ov * (${d(i.toDouble)})").mkString(" + ")} END",
              rsum("close", 10)
            )}) AS cg_10"
      )
    val outs = Seq("linreg_10_slope", "linreg_10_intercept", "linreg_10_tsf", "linreg_10_r", "cfo_10", "cti_10", "cg_10")
    mk("linreg_10", outs, fin(b, outs))(_.ta.linreg(10).ta.cfo(10).ta.cti(10).ta.cg(10))
  }

  // ------------------------------------------- coppock + kst
  val qCoppockKst = {
    def roc(x: String, k: Int) = s"100e0 * (${sdiv(x, s"lag($x, $k) $ov")} - 1e0)"
    val kstTerms = Seq((10, 10, 1), (15, 10, 2), (20, 10, 3), (30, 15, 4))
      .map { case (r, s, i) =>
        s"${d(i.toDouble)} * (${gate(s"r$r", s, s"avg(r$r) ${fr(s)}")})"
      }
      .mkString(" + ")
    val b = series
      .addSel("t1", s"${roc("close", 11)} + ${roc("close", 14)} AS rsum2, " +
        Seq(10, 15, 20, 30).map(r => s"${roc("close", r)} AS r$r").mkString(", "))
      .addSel("t2", s"${wma("rsum2", 10)} AS coppock_10_11_14, $kstTerms AS kst")
      .addSel("t3", s"${rmean("kst", 9)} AS kst_signal")
    val outs = Seq("coppock_10_11_14", "kst", "kst_signal")
    mk("coppock_kst", outs, fin(b, outs))(_.ta.coppock(10, 11, 14).ta.kst())
  }

  // ------------------------------------------- trix + tsi
  val qTrixTsi = {
    val b0 = emaSql(emaSql(emaSql(series, "close", "te1", 10), "te1", "te2", 10), "te2", "te3", 10)
      .addSel("tx", s"100e0 * (${sdiv("te3", s"lag(te3, 1) $ov")} - 1e0) AS trix_10, " +
        s"close - lag(close, 1) $ov AS dd, abs(close - lag(close, 1) $ov) AS ad")
    val b1 = emaSql(emaSql(b0, "dd", "ds", 25), "ds", "dss", 13)
    val b = emaSql(emaSql(b1, "ad", "asx", 25), "asx", "ass", 13)
      .addSel("tf", s"100e0 * ${sdiv("dss", "ass")} AS tsi_13_25")
    val outs = Seq("trix_10", "tsi_13_25")
    mk("trix_tsi", outs, fin(b, outs))(_.ta.trix(10).ta.tsi(13, 25))
  }

  // ------------------------------------------- stochrsi
  val qStochRsi = {
    val b = series
      .addSel("t1", s"close - lag(close, 1) $ov AS dd")
      .addSel(
        "t2",
        "CASE WHEN dd IS NULL THEN NULL WHEN dd > 0 THEN dd ELSE 0e0 END AS up, " +
          "CASE WHEN dd IS NULL THEN NULL WHEN dd < 0 THEN -dd ELSE 0e0 END AS dn"
      )
      .addSel("t3", s"${rma("up", 10)} AS ru, ${rma("dn", 10)} AS rd")
      .addSel("t4", s"100e0 * ${sdiv("ru", "(ru + rd)")} AS rsi")
      .addSel("t5", s"${rmin("rsi", 10)} AS rlo, ${rmax("rsi", 10)} AS rhi")
      .addSel("t6", s"100e0 * ${sdiv("(rsi - rlo)", "(rhi - rlo)")} AS srsi")
      .addSel("t7", s"${rmean("srsi", 3)} AS stochrsi_k")
      .addSel("t8", s"${rmean("stochrsi_k", 3)} AS stochrsi_d")
    val outs = Seq("stochrsi_k", "stochrsi_d")
    mk("stochrsi_10", outs, fin(b, outs))(_.ta.stochrsi(10, 3, 3))
  }

  def all: Seq[Q] = Seq(qOscillators, qLinreg, qCoppockKst, qTrixTsi, qStochRsi)
}
