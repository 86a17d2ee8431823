package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Graft
import graft.ta.{prim => P, IndicatorSpec, Strategy, registry}
import sqlgen._

/** Second flagship gate entry: the FULL OHLCV registry surface as ONE
  * compiled Strategy over the daily bars — window composites through the
  * leveled column compiler plus ALL 14 REC kernels through the single
  * batched repartition+sort+mapPartitions pass — checked column-for-
  * column against DuckDB.
  *
  * Params pin to the variants the per-indicator gate queries already
  * audit (same convention as Strategy50Queries); the oracle joins those
  * queries' SQL verbatim on (series_id, ts). ~100 output columns.
  */
object StrategyOhlcvQueries {

  val specs: Seq[IndicatorSpec] = Seq(
    IndicatorSpec("true_range", Map()),
    IndicatorSpec("atr", Map("length" -> 10)),
    IndicatorSpec("natr", Map("length" -> 10)), // shares the true_range/atr_10 stages
    IndicatorSpec("stoch", Map("k" -> 10)),
    IndicatorSpec("willr", Map("length" -> 10)),
    IndicatorSpec("cci", Map("length" -> 10)),
    IndicatorSpec("ao", Map()),
    IndicatorSpec("bop", Map()),
    IndicatorSpec("uo", Map()),
    IndicatorSpec("eri", Map("length" -> 10)),
    IndicatorSpec("bbands", Map("length" -> 5)),
    IndicatorSpec("donchian", Map("length" -> 10)),
    IndicatorSpec("accbands", Map("length" -> 10)),
    IndicatorSpec("ui", Map("length" -> 10)),
    IndicatorSpec("pdist", Map()),
    IndicatorSpec("obv", Map()),
    IndicatorSpec("ad", Map()),
    IndicatorSpec("pvt", Map()),
    IndicatorSpec("pvol", Map()),
    IndicatorSpec("pvr", Map()),
    IndicatorSpec("cmf", Map("length" -> 10)),
    IndicatorSpec("efi", Map("length" -> 10)),
    IndicatorSpec("eom", Map("length" -> 14)),
    IndicatorSpec("mfi", Map("length" -> 10)),
    IndicatorSpec("midprice", Map("length" -> 10)),
    IndicatorSpec("hl2", Map()),
    IndicatorSpec("hlc3", Map()),
    IndicatorSpec("ohlc4", Map()),
    IndicatorSpec("wcp", Map()),
    IndicatorSpec("vwap", Map()),
    IndicatorSpec("vwma", Map("length" -> 10)),
    IndicatorSpec("aroon", Map("length" -> 10)),
    IndicatorSpec("chop", Map("length" -> 10)),
    IndicatorSpec("vortex", Map("length" -> 10)),
    IndicatorSpec("qstick", Map("length" -> 10)),
    IndicatorSpec("cdl_inside", Map()),
    IndicatorSpec("cdl_z", Map("length" -> 10)),
    IndicatorSpec("dm", Map("length" -> 14)),
    IndicatorSpec("adx", Map("length" -> 14)),
    IndicatorSpec("kc", Map("length" -> 20)),
    IndicatorSpec("massi", Map()),
    IndicatorSpec("rvi", Map("length" -> 14)),
    IndicatorSpec("thermo", Map("length" -> 20)),
    IndicatorSpec("aberration", Map("length" -> 5, "atr_length" -> 15)),
    IndicatorSpec("cksp", Map()),
    IndicatorSpec("dpo", Map("length" -> 20)),
    IndicatorSpec("pvo", Map()),
    IndicatorSpec("brar", Map("length" -> 26)),
    IndicatorSpec("adosc", Map()),
    IndicatorSpec("pgo", Map("length" -> 14)),
    IndicatorSpec("ttm_trend", Map("length" -> 6)),
    IndicatorSpec("amat", Map()),
    IndicatorSpec("increasing", Map()),
    IndicatorSpec("decreasing", Map()),
    IndicatorSpec("kdj", Map("length" -> 9)),
    IndicatorSpec("tos_stdevall", Map()),
    IndicatorSpec("cdl_doji", Map("length" -> 10)),
    IndicatorSpec("cdl_pattern", Map()),
    IndicatorSpec("candle_utils", Map()),
    IndicatorSpec("geometric_mean", Map("length" -> 10)),
    IndicatorSpec("ichimoku", Map("tenkan" -> 3, "kijun" -> 5, "senkou" -> 8, "shift" -> 5)),
    IndicatorSpec("rvgi", Map("length" -> 10)),
    IndicatorSpec("smi", Map("length" -> 10)),
    IndicatorSpec("squeeze", Map("bb_length" -> 10, "kc_length" -> 10, "mom_length" -> 6)),
    IndicatorSpec("squeeze_pro", Map("bb_length" -> 10, "kc_length" -> 10, "mom_length" -> 6)),
    IndicatorSpec("stc", Map("tclength" -> 5, "fast" -> 6, "slow" -> 10)),
    IndicatorSpec("inertia", Map("length" -> 10, "rvi_length" -> 7)),
    IndicatorSpec("aobv", Map()),
    IndicatorSpec("kvo", Map("fast" -> 10, "slow" -> 16, "signal" -> 5)),
    IndicatorSpec("nvi", Map()),
    IndicatorSpec("pvi", Map()),
    // REC kernels — all run in ONE batched pass
    IndicatorSpec("jma", Map("length" -> 7)),
    IndicatorSpec("ha", Map()),
    IndicatorSpec("mcgd", Map("length" -> 10)),
    IndicatorSpec("ssf", Map("length" -> 10)),
    IndicatorSpec("hwma", Map()),
    IndicatorSpec("fisher", Map("length" -> 9)),
    IndicatorSpec("hilo", Map()),
    IndicatorSpec("psar", Map()),
    IndicatorSpec("supertrend", Map("length" -> 7)),
    IndicatorSpec("qqe", Map("length" -> 6, "smooth" -> 3)),
    IndicatorSpec("rsx", Map("length" -> 10)),
    IndicatorSpec("td_seq", Map()),
    IndicatorSpec("ebsw", Map("length" -> 20, "bars" -> 10)),
    IndicatorSpec("hwc", Map())
  )

  /** (subquery SQL from the proven per-indicator query, columns taken). */
  private def parts: Seq[(String, Seq[String])] = Seq(
    BarsQueries.qAtr.sql.get -> Seq("true_range", "atr_10", "natr_10"),
    BarsQueries.qStoch.sql.get -> Seq("stoch_k", "stoch_d"),
    BarsQueries.qWillrCci.sql.get -> Seq("willr_10", "cci_10"),
    BarsQueries.qAoBopUo.sql.get -> Seq("ao_5_20", "bop", "uo_7_14_28"),
    BarsQueries.qEri.sql.get -> Seq("bull_10", "bear_10"),
    BarsQueries.qBbands.sql.get -> Seq("bbl_5_2", "bbm_5_2", "bbu_5_2", "bbb_5_2", "bbp_5_2"),
    BarsQueries.qChannels.sql.get -> Seq("dcl_10", "dcm_10", "dcu_10", "accbl_10", "accbm_10", "accbu_10"),
    BarsQueries.qUiPdist.sql.get -> Seq("ui_10", "pdist"),
    BarsQueries.qVolCum.sql.get -> Seq("obv", "ad", "pvt", "pvol", "pvr"),
    BarsQueries.qVolWindow.sql.get -> Seq("cmf_10", "efi_10", "eom_14", "mfi_10"),
    BarsQueries.qPriceTransforms.sql.get -> Seq("midprice_10", "hl2", "hlc3", "ohlc4", "wcp"),
    BarsQueries.qVwap.sql.get -> Seq("vwap", "vwma_10"),
    BarsQueries.qAroon.sql.get -> Seq("aroon_u_10", "aroon_d_10"),
    BarsQueries.qTrendStats.sql.get -> Seq("chop_10", "vtxp_10", "vtxm_10", "qstick_10"),
    BarsQueries.qCandles.sql.get -> Seq("cdl_inside", "open_z_10", "high_z_10", "low_z_10", "close_z_10"),
    BarsQueries.qSignals.sql.get -> Seq("increasing_1", "decreasing_1"),
    Rec2Queries.qJma.sql.get -> Seq("jma_7"),
    CompositeQueries.qDm.sql.get -> Seq("dmp_14", "dmn_14"),
    CompositeQueries.qAdx.sql.get -> Seq("adx_14", "dip_14", "dim_14"),
    CompositeQueries.qKc.sql.get -> Seq("kcb_20", "kcl_20", "kcu_20"),
    CompositeQueries.qMassi.sql.get -> Seq("massi_9_25"),
    CompositeQueries.qRvi.sql.get -> Seq("rvi_14"),
    CompositeQueries.qThermo.sql.get -> Seq("thermo", "thermo_ma_20"),
    CompositeQueries.qAberration.sql.get -> Seq("abe_zg_5", "abe_sg_5", "abe_xg_5"),
    CompositeQueries.qCksp.sql.get -> Seq("cksp_long_10", "cksp_short_10"),
    CompositeQueries.qDpo.sql.get -> Seq("dpo_20"),
    CompositeQueries.qPvo.sql.get -> Seq("pvo_12_26", "pvos_12_26", "pvoh_12_26"),
    CompositeQueries.qBrar.sql.get -> Seq("ar_26", "br_26"),
    CompositeQueries.qAdosc.sql.get -> Seq("adosc_3_10"),
    CompositeQueries.qPgo.sql.get -> Seq("pgo_14"),
    CompositeQueries.qTtmTrend.sql.get -> Seq("ttm_trend_6"),
    CompositeQueries.qAmat.sql.get -> Seq("amat_lr_8", "amat_sr_8"),
    CompositeQueries.qKdj.sql.get -> Seq("kdj_k_9", "kdj_d_9", "kdj_j_9"),
    CompositeQueries.qTos.sql.get -> Seq("tos_line", "tos_u_2", "tos_l_2"),
    CompositeQueries.qCdlDoji.sql.get -> Seq("cdl_doji_10"),
    JoinQueries.qCdlPatterns.sql.get -> Seq(
      "cdl_engulfing_bull", "cdl_engulfing_bear", "cdl_hammer", "cdl_shooting_star",
      "cdl_harami_bull", "cdl_harami_bear", "cdl_marubozu", "cdl_spinning_top"
    ),
    JoinQueries.qCandleUtils.sql.get -> Seq("candle_color", "real_body", "high_low_range", "geomean_10"),
    MaQueries.qIchimoku.sql.get -> Seq("its_3", "iks_5", "isa_3", "isb_5", "ics_5"),
    MaQueries.qRvgi.sql.get -> Seq("rvgi_10", "rvgis_10"),
    MaQueries.qSmi.sql.get -> Seq("smi_10"),
    MaQueries.qSqueeze.sql.get -> Seq("sqz_on", "sqz_off", "sqz_mom"),
    MaQueries.qSqueezePro.sql.get -> Seq("sqzpro_on_wide", "sqzpro_on_normal", "sqzpro_on_narrow", "sqzpro_mom"),
    MaQueries.qStc.sql.get -> Seq("stc_5", "stc_macd_5"),
    MaQueries.qInertia.sql.get -> Seq("inertia_10"),
    MaQueries.qAobv.sql.get -> Seq("obv_fast_4", "obv_slow_12", "aobv_lr", "aobv_sr"),
    MaQueries.qKvo.sql.get -> Seq("kvo_10", "kvos_10"),
    RecQueries.qNvi.sql.get -> Seq("nvi"),
    RecQueries.qPvi.sql.get -> Seq("pvi"),
    RecQueries.qHa.sql.get -> Seq("ha_open", "ha_high", "ha_low", "ha_close"),
    RecQueries.qMcgd.sql.get -> Seq("mcgd_10"),
    RecQueries.qSsf.sql.get -> Seq("ssf_10"),
    RecQueries.qHwma.sql.get -> Seq("hwma"),
    RecQueries.qFisher.sql.get -> Seq("fisher_9", "fisher_signal_9"),
    RecQueries.qHilo.sql.get -> Seq("hilo", "hilo_long", "hilo_short"),
    RecQueries.qPsar.sql.get -> Seq("psar_long", "psar_short", "psar_af"),
    RecQueries.qSupertrend.sql.get -> Seq("supert_7", "supertl_7", "superts_7"),
    Rec2Queries.qQqe.sql.get -> Seq("qqe_6", "qqe_trend_6"),
    Rec2Queries.qRsx.sql.get -> Seq("rsx_10"),
    Rec2Queries.qTdSeq.sql.get -> Seq("td_seq_up", "td_seq_dn"),
    Rec2Queries.qEbsw.sql.get -> Seq("ebsw_20"),
    Rec2Queries.qHwc.sql.get -> Seq("hwc_mid", "hwc_upper", "hwc_lower")
  )

  val outs: Seq[String] = parts.flatMap(_._2)

  /** Third batch gate: ALL five multi-key candle waves (cdl_pattern_2..6,
    * 72 flag columns) as ONE compiled Strategy over the 15-user bars —
    * exercises the compiled single-level candle lowerings multi-key and
    * closes the last registry kinds not covered by a Strategy gate.
    * Oracle = join of the five already-green per-wave oracles. */
  val qCandles: Q = {
    val candleSpecs = Seq(
      IndicatorSpec("cdl_pattern_2", Map()),
      IndicatorSpec("cdl_pattern_3", Map()),
      IndicatorSpec("cdl_pattern_4", Map()),
      IndicatorSpec("cdl_pattern_5", Map()),
      IndicatorSpec("cdl_pattern_6", Map())
    )
    val candleParts: Seq[(String, Seq[String])] = Seq(
      JoinQueries.qCdlPatterns2.sql.get -> Seq(
        "cdl_piercing", "cdl_dark_cloud", "cdl_morning_star", "cdl_evening_star",
        "cdl_3_white_soldiers", "cdl_3_black_crows", "cdl_hanging_man",
        "cdl_inverted_hammer", "cdl_dragonfly_doji", "cdl_gravestone_doji",
        "cdl_long_legged_doji"
      ),
      JoinQueries.qCdlPatterns3.sql.get -> Seq(
        "cdl_3_inside_up", "cdl_3_inside_down", "cdl_3_outside_up", "cdl_3_outside_down",
        "cdl_belt_hold_bull", "cdl_belt_hold_bear", "cdl_doji_star_bull", "cdl_doji_star_bear",
        "cdl_kicking_bull", "cdl_kicking_bear"
      ),
      JoinQueries.qCdlPatterns4.sql.get -> Seq(
        "cdl_on_neck", "cdl_in_neck", "cdl_thrusting", "cdl_separating_lines_bull",
        "cdl_separating_lines_bear", "cdl_matching_low", "cdl_stick_sandwich", "cdl_homing_pigeon"
      ),
      JoinQueries.qCdlPatterns5.sql.get -> Seq(
        "cdl_tasuki_gap_up", "cdl_tasuki_gap_down", "cdl_rising_3_methods",
        "cdl_falling_3_methods", "cdl_2_crows", "cdl_upside_gap_2_crows",
        "cdl_tristar_bull", "cdl_tristar_bear", "cdl_abandoned_baby_bull",
        "cdl_abandoned_baby_bear", "cdl_counterattack_bull", "cdl_counterattack_bear",
        "cdl_rickshaw_man", "cdl_high_wave", "cdl_closing_marubozu"
      ),
      JoinQueries.qCdlPatterns6.sql.get -> Seq(
        "cdl_3_line_strike_bull", "cdl_3_line_strike_bear", "cdl_3_stars_in_south",
        "cdl_advance_block", "cdl_breakaway_bull", "cdl_breakaway_bear",
        "cdl_conceal_baby_swall", "cdl_morning_doji_star", "cdl_evening_doji_star",
        "cdl_gap_side_side_white_up", "cdl_gap_side_side_white_down",
        "cdl_harami_cross_bull", "cdl_harami_cross_bear", "cdl_hikkake_bull",
        "cdl_hikkake_bear", "cdl_identical_3_crows", "cdl_ladder_bottom",
        "cdl_long_line", "cdl_short_line", "cdl_mat_hold", "cdl_stalled_pattern",
        "cdl_takuri", "cdl_xside_gap_3_methods_up", "cdl_xside_gap_3_methods_down",
        "cdl_kicking_by_length_bull", "cdl_kicking_by_length_bear",
        "cdl_hikkake_mod_bull", "cdl_hikkake_mod_bear"
      )
    )
    val candleOuts = candleParts.flatMap(_._2)
    Q(
      "strategy_candles_batch",
      (s: SparkSession, dir: String) => {
        Graft.init(s)
        registry
          .strategy(Graft.userBars(s, dir), Strategy("candles_batch", candleSpecs))
          .select(col("series_id") +: col("ts") +: candleOuts.map(o => P.normd(col(o).cast("double")).as(o)): _*)
          .orderBy("series_id", "ts")
      },
      Some(composeJoin(candleParts))
    )
  }

  val q: Q = Q(
    "strategy_ohlcv_batch",
    (s: SparkSession, dir: String) => {
      Graft.init(s)
      registry
        .strategy(Graft.bars(s, dir), Strategy("ohlcv_batch", specs))
        .select(col("series_id") +: col("ts") +: outs.map(o => P.normd(col(o).cast("double")).as(o)): _*)
        .orderBy("series_id", "ts")
    },
    Some(composeJoin(parts))
  )
}
