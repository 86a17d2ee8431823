package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Graft
import graft.ta.{prim => P}
import graft.ta.Ta._
import sqlgen._
import SeriesQueries.{Cte, madSql, emaSql}

/** OHLCV indicators over the daily bars fixture (30 rows / sf), paired
  * with structurally identical DuckDB oracle SQL.
  */
object BarsQueries {

  def bars = new Cte("bars", barsCte)

  private def mk(name: String, outs: Seq[String], sql: String)(
      build: DataFrame => DataFrame
  ): Q =
    Q(
      name,
      (spark: SparkSession, dir: String) => {
        Graft.init(spark)
        build(Graft.bars(spark, dir))
          .select(col("series_id") +: col("ts") +: outs.map(o => P.normd(col(o)).as(o)): _*)
          .orderBy("series_id", "ts")
      },
      Some(sql)
    )

  private def fin(b: Cte, outs: Seq[String]): String =
    b.result(
      s"SELECT series_id, ts, ${outs.map(o => s"${normd(o)} AS $o").mkString(", ")} FROM ${b.top}$orderTail"
    )

  private val trSql =
    s"CASE WHEN lag(close, 1) $ov IS NULL THEN NULL ELSE " +
      s"greatest(high - low, abs(high - lag(close, 1) $ov), abs(low - lag(close, 1) $ov)) END"

  // ------------------------------------------------- true range / atr
  val qAtr = {
    val b = bars
      .addSel("t1", s"$trSql AS true_range")
      .addSel("t2", s"${rma("true_range", 10)} AS atr_10")
      .addSel("t3", s"100e0 * ${sdiv("atr_10", "close")} AS natr_10")
    mk("tr_atr_10", Seq("true_range", "atr_10", "natr_10"), fin(b, Seq("true_range", "atr_10", "natr_10"))) {
      _.ta.natr(10)
    }
  }

  // ------------------------------------------------- stoch
  val qStoch = {
    val b = bars
      .addSel("t1", s"${rmin("low", 10)} AS ll, ${rmax("high", 10)} AS hh")
      .addSel("t2", s"100e0 * ${sdiv("(close - ll)", "(hh - ll)")} AS fastk")
      .addSel("t3", s"${rmean("fastk", 3)} AS stoch_k")
      .addSel("t4", s"${rmean("stoch_k", 3)} AS stoch_d")
    mk("stoch_10_3_3", Seq("stoch_k", "stoch_d"), fin(b, Seq("stoch_k", "stoch_d")))(_.ta.stoch(10, 3, 3))
  }

  // ------------------------------------------------- willr + cci
  val qWillrCci = {
    val b0 = bars
      .addSel("t1", s"${rmin("low", 10)} AS ll, ${rmax("high", 10)} AS hh, (high + low + close) / 3e0 AS tp")
      .addSel("t2", s"100e0 * ${sdiv("(close - hh)", "(hh - ll)")} AS willr_10")
    val b = madSql(b0, "tp", "tpmad", 10)
      .addSel("t4", s"${sdiv(s"(tp - ${rmean("tp", 10)})", "(0.015e0 * tpmad)")} AS cci_10")
    mk("willr_cci_10", Seq("willr_10", "cci_10"), fin(b, Seq("willr_10", "cci_10"))) {
      _.ta.willr(10).ta.cci(10)
    }
  }

  // ------------------------------------------------- ao / bop / uo
  val qAoBopUo = {
    val b = bars
      .addSel("t1", "(high + low) / 2e0 AS hl2c, lag(close, 1) " + ov + " AS pc")
      .addSel(
        "t2",
        s"${rmean("hl2c", 5)} - ${rmean("hl2c", 20)} AS ao_5_20, " +
          s"${sdiv("(close - open)", "(high - low)")} AS bop, " +
          "CASE WHEN pc IS NULL THEN NULL ELSE close - least(low, pc) END AS bp, " +
          "CASE WHEN pc IS NULL THEN NULL ELSE greatest(high, pc) - least(low, pc) END AS trn"
      )
      .addSel(
        "t3",
        s"${sdiv(rsum("bp", 7), rsum("trn", 7))} AS a7, " +
          s"${sdiv(rsum("bp", 14), rsum("trn", 14))} AS a14, " +
          s"${sdiv(rsum("bp", 28), rsum("trn", 28))} AS a28"
      )
      .addSel("t4", "100e0 * (4e0*a7 + 2e0*a14 + a28) / 7e0 AS uo_7_14_28")
    mk("ao_bop_uo", Seq("ao_5_20", "bop", "uo_7_14_28"), fin(b, Seq("ao_5_20", "bop", "uo_7_14_28"))) {
      _.ta.ao(5, 20).ta.bop.ta.uo(7, 14, 28)
    }
  }

  // ------------------------------------------------- eri
  val qEri = {
    val b = emaSql(bars, "close", "eline", 10)
      .addSel("t5", "high - eline AS bull_10, low - eline AS bear_10")
    mk("eri_10", Seq("bull_10", "bear_10"), fin(b, Seq("bull_10", "bear_10")))(_.ta.eri(10))
  }

  // ------------------------------------------------- bbands
  val qBbands = {
    val b = bars
      .addSel("t1", s"${rmean("close", 5)} AS mid, ${rstd("close", 5)} * 2e0 AS dev")
      .addSel(
        "t2",
        "mid AS bbm_5_2, mid - dev AS bbl_5_2, mid + dev AS bbu_5_2, " +
          s"100e0 * ${sdiv("(2e0 * dev)", "mid")} AS bbb_5_2, " +
          s"${sdiv("(close - (mid - dev))", "(2e0 * dev)")} AS bbp_5_2"
      )
    val outs = Seq("bbl_5_2", "bbm_5_2", "bbu_5_2", "bbb_5_2", "bbp_5_2")
    mk("bbands_5_2", outs, fin(b, outs))(_.ta.bbands(5, 2.0))
  }

  // ------------------------------------------------- donchian + accbands
  val qChannels = {
    val b = bars
      .addSel(
        "t1",
        s"${rmin("low", 10)} AS dcl_10, ${rmax("high", 10)} AS dcu_10, " +
          s"high * (1e0 + 4e0 * ${sdiv("(high - low)", "(high + low)")}) AS au, " +
          s"low * (1e0 - 4e0 * ${sdiv("(high - low)", "(high + low)")}) AS al"
      )
      .addSel(
        "t2",
        "(dcl_10 + dcu_10) / 2e0 AS dcm_10, " +
          s"${rmean("au", 10)} AS accbu_10, ${rmean("al", 10)} AS accbl_10, ${rmean("close", 10)} AS accbm_10"
      )
    val outs = Seq("dcl_10", "dcm_10", "dcu_10", "accbl_10", "accbm_10", "accbu_10")
    mk("channels_10", outs, fin(b, outs))(_.ta.donchian(10).ta.accbands(10))
  }

  // ------------------------------------------------- ui + pdist
  val qUiPdist = {
    val b = bars
      .addSel("t1", s"${rmax("close", 10)} AS hh, lag(close, 1) $ov AS pc")
      .addSel("t2", s"(100e0 * ${sdiv("(close - hh)", "hh")}) * (100e0 * ${sdiv("(close - hh)", "hh")}) AS d2, " +
        "2e0 * (high - low) - abs(close - open) + abs(open - pc) AS pdist")
      .addSel("t3", s"${rmean("d2", 10)} AS m10")
      .addSel("t4", "CASE WHEN m10 >= 0 THEN sqrt(m10) END AS ui_10")
    mk("ui_pdist", Seq("ui_10", "pdist"), fin(b, Seq("ui_10", "pdist"))) {
      _.ta.ui(10).ta.pdist()
    }
  }

  // ------------------------------------------------- cumulative volume ops
  val qVolCum = {
    val b = bars
      .addSel("t1", s"row_number() $ov AS rnn, close - lag(close, 1) $ov AS dc, volume - lag(volume, 1) $ov AS dv, " +
        s"${sdiv("close", s"lag(close, 1) $ov")} - 1e0 AS r1")
      .addSel(
        "t2",
        "CASE WHEN rnn = 1 THEN 1e0 WHEN dc > 0 THEN 1e0 WHEN dc < 0 THEN -1e0 ELSE 0e0 END * volume AS sgnv, " +
          "CASE WHEN high != low THEN ((close - low) - (high - close)) / (high - low) ELSE 0e0 END * volume AS clvv, " +
          "coalesce(r1 * volume, 0e0) AS pvtr, volume * close AS pvol, " +
          "CASE WHEN dc IS NULL OR dv IS NULL THEN NULL WHEN dc >= 0 AND dv >= 0 THEN 1e0 " +
          "WHEN dc >= 0 AND dv < 0 THEN 2e0 WHEN dc < 0 AND dv >= 0 THEN 3e0 ELSE 4e0 END AS pvr"
      )
      .addSel("t3", s"sum(sgnv) $cum AS obv, sum(clvv) $cum AS ad, sum(pvtr) $cum AS pvt")
    val outs = Seq("obv", "ad", "pvt", "pvol", "pvr")
    mk("vol_cum", outs, fin(b, outs))(_.ta.obv.ta.ad.ta.pvt.ta.pvol.ta.pvr)
  }

  // ------------------------------------------------- cmf / efi / eom / mfi
  val qVolWindow = {
    val b0 = bars
      .addSel(
        "t1",
        "CASE WHEN high != low THEN ((close - low) - (high - close)) / (high - low) ELSE 0e0 END * volume AS clvv, " +
          s"(close - lag(close, 1) $ov) * volume AS fraw, " +
          s"(high + low) / 2e0 - lag((high + low) / 2e0, 1) $ov AS dhl2, " +
          "(high + low + close) / 3e0 AS tp"
      )
      .addSel(
        "t2",
        s"${sdiv(rsum("clvv", 10), rsum("volume", 10))} AS cmf_10, " +
          s"1e8 * dhl2 * ${sdiv("(high - low)", "volume")} AS eomraw, " +
          s"tp - lag(tp, 1) $ov AS dtp"
      )
      .addSel(
        "t3",
        s"${rmean("eomraw", 14)} AS eom_14, " +
          "CASE WHEN dtp > 0 THEN tp * volume ELSE 0e0 END AS posf, " +
          "CASE WHEN dtp < 0 THEN tp * volume ELSE 0e0 END AS negf"
      )
      .addSel("t4", s"100e0 * ${sdiv(rsum("posf", 10), s"(${rsum("posf", 10)} + ${rsum("negf", 10)})")} AS mfi_10")
    val b = emaSql(b0, "fraw", "efi_10", 10)
    val outs = Seq("cmf_10", "efi_10", "eom_14", "mfi_10")
    mk("vol_window", outs, fin(b, outs))(_.ta.cmf(10).ta.efi(10).ta.eom(14).ta.mfi(10))
  }

  // ------------------------------------------------- price transforms
  val qPriceTransforms = {
    val b = bars.addSel(
      "t1",
      s"(${rmax("high", 10)} + ${rmin("low", 10)}) / 2e0 AS midprice_10, " +
        "(high + low) / 2e0 AS hl2, (high + low + close) / 3e0 AS hlc3, " +
        "(open + high + low + close) / 4e0 AS ohlc4, (high + low + 2e0 * close) / 4e0 AS wcp"
    )
    val outs = Seq("midprice_10", "hl2", "hlc3", "ohlc4", "wcp")
    mk("price_transforms", outs, fin(b, outs))(_.ta.midprice(10).ta.hl2.ta.hlc3.ta.ohlc4.ta.wcp)
  }

  // ------------------------------------------------- vwap + vwma
  val qVwap = {
    val b = bars
      .addSel("t1", "(high + low + close) / 3e0 AS tp")
      .addSel(
        "t2",
        s"${sdiv(s"sum(tp * volume) $cum", s"sum(volume) $cum")} AS vwap, " +
          s"${sdiv(rmean("close * volume", 10), rmean("volume", 10))} AS vwma_10"
      )
    mk("vwap_vwma", Seq("vwap", "vwma_10"), fin(b, Seq("vwap", "vwma_10")))(_.ta.vwap.ta.vwma(10))
  }

  // ------------------------------------------------- aroon
  val qAroon = {
    val b = bars
      .addSel("t1", s"list(high) ${fr(11)} AS hs, list(low) ${fr(11)} AS ls")
      .addSel(
        "t2",
        "CASE WHEN len(hs) = 11 THEN 100e0 * (10e0 - (list_position(list_reverse(hs), list_aggregate(hs, 'max')) - 1e0)) / 10e0 END AS aroon_u_10, " +
          "CASE WHEN len(ls) = 11 THEN 100e0 * (10e0 - (list_position(list_reverse(ls), list_aggregate(ls, 'min')) - 1e0)) / 10e0 END AS aroon_d_10"
      )
    mk("aroon_10", Seq("aroon_u_10", "aroon_d_10"), fin(b, Seq("aroon_u_10", "aroon_d_10")))(_.ta.aroon(10))
  }

  // ------------------------------------------------- chop / vortex / qstick
  val qTrendStats = {
    val b = bars
      .addSel("t1", s"$trSql AS true_range, lag(low, 1) $ov AS pl, lag(high, 1) $ov AS ph")
      .addSel(
        "t2",
        "CASE WHEN pl IS NULL THEN NULL ELSE abs(high - pl) END AS vmp, " +
          "CASE WHEN ph IS NULL THEN NULL ELSE abs(low - ph) END AS vmm, " +
          s"${sdiv(rsum("true_range", 10), s"(${rmax("high", 10)} - ${rmin("low", 10)})")} AS chopr"
      )
      .addSel(
        "t3",
        s"100e0 * (CASE WHEN chopr > 0 THEN ln(chopr) END) / (${d(math.log(10.0))}) AS chop_10, " +
          s"${sdiv(rsum("vmp", 10), rsum("true_range", 10))} AS vtxp_10, " +
          s"${sdiv(rsum("vmm", 10), rsum("true_range", 10))} AS vtxm_10, " +
          s"${rmean("(close - open)", 10)} AS qstick_10"
      )
    val outs = Seq("chop_10", "vtxp_10", "vtxm_10", "qstick_10")
    mk("trend_stats_10", outs, fin(b, outs))(_.ta.chop(10).ta.vortex(10).ta.qstick(10))
  }

  // ------------------------------------------------- signals
  val qSignals = {
    val b = bars
      .addSel("t1", s"${rmean("close", 10)} AS sma_10, close - lag(close, 1) $ov AS dc")
      .addSel(
        "t2",
        "CASE WHEN dc > 0 THEN 1e0 ELSE 0e0 END AS increasing_1, " +
          "CASE WHEN dc < 0 THEN 1e0 ELSE 0e0 END AS decreasing_1, " +
          "CASE WHEN close > sma_10 THEN 1e0 ELSE 0e0 END AS ts_trends, " +
          s"CASE WHEN close > sma_10 AND lag(close, 1) $ov IS NOT NULL AND lag(sma_10, 1) $ov IS NOT NULL " +
          s"AND lag(close, 1) $ov <= lag(sma_10, 1) $ov THEN 1e0 ELSE 0e0 END AS xup, " +
          "CASE WHEN close >= sma_10 THEN 1e0 ELSE 0e0 END AS above_sma"
      )
      .addSel(
        "t3",
        s"CASE WHEN ts_trends = 1 AND coalesce(lag(ts_trends, 1) $ov, 0e0) = 0 THEN 1e0 ELSE 0e0 END AS ts_entries, " +
          s"CASE WHEN ts_trends = 0 AND coalesce(lag(ts_trends, 1) $ov, 0e0) = 1 THEN 1e0 ELSE 0e0 END AS ts_exits"
      )
    val outs = Seq("increasing_1", "decreasing_1", "ts_trends", "ts_entries", "ts_exits", "xup", "above_sma")
    mk("signals_10", outs, fin(b, outs)) { df =>
      df.ta
        .increasing(1)
        .ta
        .decreasing(1)
        .ta
        .sma(10)
        .withColumn("__trend", when(col("close") > col("sma_10"), 1.0).otherwise(0.0))
        .ta
        .tsignals("__trend")
        .ta
        .crossAbove("close", "sma_10", "xup")
        .ta
        .above("close", "sma_10", "above_sma")
    }
  }

  // ------------------------------------------------- candles
  val qCandles = {
    val b = bars
      .addSel("t1", s"lag(high, 1) $ov AS ph, lag(low, 1) $ov AS pl")
      .addSel(
        "t2",
        "CASE WHEN ph IS NOT NULL AND high < ph AND low > pl THEN 1e0 ELSE 0e0 END AS cdl_inside, " +
          Seq("open", "high", "low", "close")
            .map(s => s"${sdiv(s"($s - ${rmean(s, 10)})", rstd(s, 10))} AS ${s}_z_10")
            .mkString(", ")
      )
    val outs = Seq("cdl_inside", "open_z_10", "high_z_10", "low_z_10", "close_z_10")
    mk("candles_10", outs, fin(b, outs))(_.ta.cdlInside.ta.cdlZ(10))
  }

  /** SQL surface PHASE 4b — the single-window-level W/ELEM wrappers
    * (round 9): willr/cci/ao/bop/donchian/accbands/eri/aroon/midprice/
    * vwma/mom/slope/midpoint as one-call graft_* functions over pure
    * SQL text. Oracle = composeJoin of the per-indicator oracles the
    * accessor queries already pass, plus an inline part for the three
    * kinds (mom/slope/midpoint) whose accessor oracles live on the
    * user-series fixture. */
  val qSqlSurface5 = Q(
    "x_sql_surface5",
    (spark: SparkSession, dir: String) => {
      Graft.init(spark)
      Graft.bars(spark, dir).createOrReplaceTempView("graft_bars5")
      val outs = Seq(
        "willr_10", "cci_10", "ao_5_20", "bop",
        "dcl_10", "dcm_10", "dcu_10", "accbl_10", "accbm_10", "accbu_10",
        "bull_10", "bear_10", "aroon_u_10", "aroon_d_10",
        "midprice_10", "vwma_10", "mom_10", "slope_10", "midpoint_10",
        "kcb_20", "kcl_20", "kcu_20", "apo_12_26", "ppo_12_26", "bias_26"
      )
      spark
        .sql(
          """SELECT series_id, ts,
            |  graft_willr(high, low, close, 10) AS willr_10,
            |  graft_cci(high, low, close, 10, 0.015) AS cci_10,
            |  graft_ao(high, low, 5, 20) AS ao_5_20,
            |  graft_bop(open, high, low, close) AS bop,
            |  dc.dcl AS dcl_10, dc.dcm AS dcm_10, dc.dcu AS dcu_10,
            |  ab.accbl AS accbl_10, ab.accbm AS accbm_10, ab.accbu AS accbu_10,
            |  er.bull AS bull_10, er.bear AS bear_10,
            |  ar.aroon_u AS aroon_u_10, ar.aroon_d AS aroon_d_10,
            |  graft_midprice(high, low, 10) AS midprice_10,
            |  graft_vwma(close, volume, 10) AS vwma_10,
            |  graft_mom(close, 10) AS mom_10,
            |  graft_slope(close, 10) AS slope_10,
            |  graft_midpoint(close, 10) AS midpoint_10,
            |  kc.kcb AS kcb_20, kc.kcl AS kcl_20, kc.kcu AS kcu_20,
            |  graft_apo(close, 12, 26) AS apo_12_26,
            |  graft_ppo(close, 12, 26) AS ppo_12_26,
            |  graft_bias(close, 26) AS bias_26
            |FROM (
            |  SELECT *,
            |    graft_donchian(high, low, 10) AS dc,
            |    graft_accbands(high, low, close, 10) AS ab,
            |    graft_eri(high, low, close, 10) AS er,
            |    graft_aroon(high, low, 10) AS ar,
            |    graft_kc(high, low, close, 20, 2.0) AS kc
            |  FROM graft_bars5
            |)""".stripMargin
        )
        .select(
          col("series_id") +: col("ts") +: outs.map(o => P.normd(col(o)).as(o)): _*
        )
        .orderBy("series_id", "ts")
    },
    Some {
      val inlinePart =
        s"WITH bars AS ($barsCte) SELECT series_id, ts, " +
          s"round(close - lag(close, 10) $ov, 6) AS mom_10, " +
          s"round((close - lag(close, 10) $ov) / 10e0, 6) AS slope_10, " +
          s"round((${rmax("close", 10)} + ${rmin("close", 10)}) / 2e0, 6) AS midpoint_10, " +
          s"round(${rmean("close", 12)} - ${rmean("close", 26)}, 6) AS apo_12_26, " +
          s"round(100e0 * ${sdiv(s"(${rmean("close", 12)} - ${rmean("close", 26)})", rmean("close", 26))}, 6) AS ppo_12_26, " +
          s"round(100e0 * (${sdiv("close", rmean("close", 26))} - 1e0), 6) AS bias_26 " +
          s"FROM bars$orderTail"
      composeJoin(Seq(
        qWillrCci.sql.get -> Seq("willr_10", "cci_10"),
        qAoBopUo.sql.get -> Seq("ao_5_20", "bop"),
        qChannels.sql.get -> Seq("dcl_10", "dcm_10", "dcu_10", "accbl_10", "accbm_10", "accbu_10"),
        qEri.sql.get -> Seq("bull_10", "bear_10"),
        qAroon.sql.get -> Seq("aroon_u_10", "aroon_d_10"),
        qPriceTransforms.sql.get -> Seq("midprice_10"),
        qVwap.sql.get -> Seq("vwma_10"),
        CompositeQueries.qKc.sql.get -> Seq("kcb_20", "kcl_20", "kcu_20"),
        inlinePart -> Seq("mom_10", "slope_10", "midpoint_10", "apo_12_26", "ppo_12_26", "bias_26")
      ))
    }
  )

  def all: Seq[Q] = Seq(
    qAtr, qStoch, qWillrCci, qAoBopUo, qEri, qBbands, qChannels, qUiPdist,
    qVolCum, qVolWindow, qPriceTransforms, qVwap, qAroon, qTrendStats,
    qSignals, qCandles, qSqlSurface5
  )
}
