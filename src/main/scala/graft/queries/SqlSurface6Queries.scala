package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Graft
import graft.ta.{prim => P}
import sqlgen._
import SeriesQueries.Cte

/** Oracle gates for SQL-surface PHASE 6 (round 10): the remaining
  * registry kinds driven through pure `spark.sql` text — lag-unrolled
  * rolling composites, linreg closed forms, shifted-frame kinds
  * (ichimoku spans, centered dpo), and the phase-6 folds. Oracles are
  * composeJoin's of the per-indicator oracle queries each kind already
  * passes (same fixture per query), plus small inline mirrors for the
  * three kinds without a standalone oracle (geomean, increasing /
  * decreasing on the series fixture).
  */
object SqlSurface6Queries {

  /** Phase 6a-series: close-only kinds over the per-user value series. */
  private val s9Outs = Seq(
    "cmo_10", "er_10", "psl_10", "vhf_10", "cg_10",
    "linreg_10_slope", "linreg_10_intercept", "linreg_10_tsf", "linreg_10_r",
    "cfo_10", "cti_10", "coppock_10_11_14", "decay_5",
    "geomean_10", "increasing_1", "decreasing_1"
  )

  val qSqlSurface9 = Q(
    "x_sql_surface9",
    (spark: SparkSession, dir: String) => {
      Graft.init(spark)
      Graft.userSeries(spark, dir).createOrReplaceTempView("graft_series9")
      spark
        .sql(
          """SELECT series_id, ts,
            |  graft_cmo(close, 10) AS cmo_10,
            |  graft_er(close, 10) AS er_10,
            |  graft_psl(close, 10) AS psl_10,
            |  graft_vhf(close, 10) AS vhf_10,
            |  graft_cg(close, 10) AS cg_10,
            |  lr.slope AS linreg_10_slope, lr.intercept AS linreg_10_intercept,
            |  lr.tsf AS linreg_10_tsf, lr.r AS linreg_10_r,
            |  graft_cfo(close, 10) AS cfo_10,
            |  graft_cti(close, 10) AS cti_10,
            |  graft_coppock(close, 10, 11, 14) AS coppock_10_11_14,
            |  graft_decay(close, 5) AS decay_5,
            |  graft_geomean(close, 10) AS geomean_10,
            |  graft_increasing(close, 1) AS increasing_1,
            |  graft_decreasing(close, 1) AS decreasing_1
            |FROM (SELECT *, graft_linreg(close, 10) AS lr FROM graft_series9)""".stripMargin
        )
        .select(
          col("series_id") +: col("ts") +: s9Outs.map(o => P.normd(col(o)).as(o)): _*
        )
        .orderBy("series_id", "ts")
    },
    Some {
      val inlinePart =
        s"WITH s AS ($seriesCte) SELECT series_id, ts, " +
          s"round(exp(${rmean("(CASE WHEN close > 0 THEN ln(close) END)", 10)}), 6) AS geomean_10, " +
          s"round(CASE WHEN close - lag(close, 1) $ov > 0 THEN 1e0 ELSE 0e0 END, 6) AS increasing_1, " +
          s"round(CASE WHEN close - lag(close, 1) $ov < 0 THEN 1e0 ELSE 0e0 END, 6) AS decreasing_1 " +
          s"FROM s$orderTail"
      composeJoin(Seq(
        MomentumQueries.qOscillators.sql.get -> Seq("cmo_10", "er_10", "psl_10", "vhf_10"),
        MomentumQueries.qLinreg.sql.get -> Seq(
          "linreg_10_slope", "linreg_10_intercept", "linreg_10_tsf", "linreg_10_r",
          "cfo_10", "cti_10", "cg_10"
        ),
        MomentumQueries.qCoppockKst.sql.get -> Seq("coppock_10_11_14"),
        RecQueries.qDecay.sql.get -> Seq("decay_5"),
        inlinePart -> Seq("geomean_10", "increasing_1", "decreasing_1")
      ))
    }
  )

  /** Phase 6a-bars: OHLCV kinds (lag-unrolled sums, shifted frames). */
  private val s10Outs = Seq(
    "vwap", "pvol", "pvr", "qstick_10", "pdist",
    "uo_7_14_28", "chop_10", "vtxp_10", "vtxm_10", "ui_10",
    "its_3", "iks_5", "isa_3", "isb_5", "ics_5",
    "ar_26", "br_26", "ttm_trend_6", "dpo_20"
  )

  val qSqlSurface10 = Q(
    "x_sql_surface10",
    (spark: SparkSession, dir: String) => {
      Graft.init(spark)
      Graft.bars(spark, dir).createOrReplaceTempView("graft_bars10")
      spark
        .sql(
          """SELECT series_id, ts,
            |  graft_vwap(high, low, close, volume) AS vwap,
            |  graft_pvol(close, volume) AS pvol,
            |  graft_pvr(close, volume) AS pvr,
            |  graft_qstick(open, close, 10) AS qstick_10,
            |  graft_pdist(open, high, low, close, 1) AS pdist,
            |  graft_uo(high, low, close, 7, 14, 28) AS uo_7_14_28,
            |  graft_chop(high, low, close, 10) AS chop_10,
            |  vx.vtxp AS vtxp_10, vx.vtxm AS vtxm_10,
            |  graft_ui(close, 10) AS ui_10,
            |  ic.its AS its_3, ic.iks AS iks_5, ic.isa AS isa_3,
            |  ic.isb AS isb_5, ic.ics AS ics_5,
            |  bb.ar AS ar_26, bb.br AS br_26,
            |  graft_ttm_trend(high, low, close, 6) AS ttm_trend_6,
            |  graft_dpo(close, 20, 1) AS dpo_20
            |FROM (
            |  SELECT *,
            |    graft_vortex(high, low, close, 10) AS vx,
            |    graft_ichimoku(high, low, close, 3, 5, 8, 5) AS ic,
            |    graft_brar(open, high, low, close, 26) AS bb
            |  FROM graft_bars10
            |)""".stripMargin
        )
        .select(
          col("series_id") +: col("ts") +: s10Outs.map(o => P.normd(col(o)).as(o)): _*
        )
        .orderBy("series_id", "ts")
    },
    Some(
      composeJoin(Seq(
        BarsQueries.qVwap.sql.get -> Seq("vwap"),
        BarsQueries.qVolCum.sql.get -> Seq("pvol", "pvr"),
        BarsQueries.qAoBopUo.sql.get -> Seq("uo_7_14_28"),
        BarsQueries.qTrendStats.sql.get -> Seq("chop_10", "vtxp_10", "vtxm_10", "qstick_10"),
        BarsQueries.qUiPdist.sql.get -> Seq("ui_10", "pdist"),
        MaQueries.qIchimoku.sql.get -> Seq("its_3", "iks_5", "isa_3", "isb_5", "ics_5"),
        CompositeQueries.qBrar.sql.get -> Seq("ar_26", "br_26"),
        CompositeQueries.qTtmTrend.sql.get -> Seq("ttm_trend_6"),
        CompositeQueries.qDpo.sql.get -> Seq("dpo_20")
      ))
    )
  )

  /** Phase 6b: the fold-backed kinds. */
  private val s11Outs = Seq(
    "dmp_14", "dmn_14", "nvi", "pvi", "adosc_3_10", "pgo_14", "t3_10",
    "abe_zg_5", "abe_sg_5", "abe_xg_5",
    "pvo_12_26", "pvos_12_26", "pvoh_12_26"
  )

  val qSqlSurface11 = Q(
    "x_sql_surface11",
    (spark: SparkSession, dir: String) => {
      Graft.init(spark)
      Graft.bars(spark, dir).createOrReplaceTempView("graft_bars11")
      spark
        .sql(
          """SELECT series_id, ts,
            |  dm.dmp AS dmp_14, dm.dmn AS dmn_14,
            |  graft_nvi(close, volume, 1000.0) AS nvi,
            |  graft_pvi(close, volume, 1000.0) AS pvi,
            |  graft_adosc(high, low, close, volume, 3, 10) AS adosc_3_10,
            |  graft_pgo(high, low, close, 14) AS pgo_14,
            |  graft_t3(close, 10, 0.7) AS t3_10,
            |  ab.zg AS abe_zg_5, ab.sg AS abe_sg_5, ab.xg AS abe_xg_5,
            |  pv.pvo AS pvo_12_26, pv.pvos AS pvos_12_26, pv.pvoh AS pvoh_12_26
            |FROM (
            |  SELECT *,
            |    graft_dm(high, low, 14) AS dm,
            |    graft_aberration(high, low, close, 5, 15) AS ab,
            |    graft_pvo(volume, 12, 26, 9) AS pv
            |  FROM graft_bars11
            |)""".stripMargin
        )
        .select(
          col("series_id") +: col("ts") +: s11Outs.map(o => P.normd(col(o)).as(o)): _*
        )
        .orderBy("series_id", "ts")
    },
    Some(
      composeJoin(Seq(
        CompositeQueries.qDm.sql.get -> Seq("dmp_14", "dmn_14"),
        RecQueries.qNvi.sql.get -> Seq("nvi"),
        RecQueries.qPvi.sql.get -> Seq("pvi"),
        CompositeQueries.qAdosc.sql.get -> Seq("adosc_3_10"),
        CompositeQueries.qPgo.sql.get -> Seq("pgo_14"),
        CompositeQueries.qT3.sql.get -> Seq("t3_10"),
        CompositeQueries.qAberration.sql.get -> Seq("abe_zg_5", "abe_sg_5", "abe_xg_5"),
        CompositeQueries.qPvo.sql.get -> Seq("pvo_12_26", "pvos_12_26", "pvoh_12_26")
      ))
    )
  )

  def all: Seq[Q] = Seq(qSqlSurface9, qSqlSurface10, qSqlSurface11)
}
