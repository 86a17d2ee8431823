package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ta.Ta._

/** Golden-vector checks (FIXTURES.md §3): indicator values at fixed row
  * indexes of the sf0.001 daily-bars fixture, computed with pandas 2.2.2
  * under the declared SURVEY §2.B formulas. Exact to 1e-6.
  */
class GoldenBarsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** name -> (t=9, t=14, t=19, t=29); None = expected null. */
  private val goldens: Map[String, Seq[Option[Double]]] = Map(
    "sma_10" -> Seq(Some(30.456000), Some(30.017000), Some(30.500000), Some(58.369000)),
    "ema_10" -> Seq(Some(30.456000), Some(24.338553), Some(33.041846), Some(41.424225)),
    "wma_10" -> Seq(Some(29.821818), Some(22.897818), Some(31.448545), Some(44.314545)),
    "rma_10" -> Seq(Some(30.273295), Some(27.399676), Some(31.166186), Some(43.433622)),
    "rsi_10" -> Seq(None, Some(39.545947), Some(53.193131), Some(44.376838)),
    "true_range" -> Seq(Some(124.910000), Some(147.750000), Some(197.400000), Some(145.380000)),
    "atr_10" -> Seq(None, Some(174.949153), Some(198.700164), Some(177.690174)),
    "stoch_k" -> Seq(None, Some(2.766488), Some(16.102312), Some(7.983357)),
    "willr_10" -> Seq(Some(-96.048892), Some(-99.236058), Some(-79.538413), Some(-93.697097)),
    "cci_10" -> Seq(Some(-131.828030), Some(-70.007576), Some(36.287172), Some(-96.526814)),
    "roc_10" -> Seq(None, Some(-94.844214), Some(345.193036), Some(-75.684407)),
    "mom_10" -> Seq(None, Some(-51.140000), Some(45.600000), Some(-44.510000)),
    "obv" -> Seq(Some(26.000000), Some(-24.000000), Some(90.000000), Some(22.000000)),
    "ad" -> Seq(Some(-226.281192), Some(-341.146871), Some(-464.387891), Some(-566.998998)),
    "cmf_10" -> Seq(Some(-0.657794), Some(-0.626608), Some(-0.672618), Some(-0.339772)),
    "vwap" -> Seq(Some(82.421318), Some(76.271026), Some(79.921576), Some(79.573503)),
    "vwma_10" -> Seq(Some(32.943227), Some(33.354817), Some(31.478559), Some(59.468808)),
    "mfi_10" -> Seq(Some(54.458500), Some(64.076283), Some(55.788997), Some(57.261563)),
    "close_z_10" -> Seq(Some(-0.683252), Some(-0.945825), Some(0.919475), Some(-1.032530)),
    "dcu_10" -> Seq(Some(327.530000), Some(327.530000), Some(287.300000), Some(220.190000)),
    "dcl_10" -> Seq(Some(0.280000), Some(0.280000), Some(0.030000), Some(0.450000)),
    "midprice_10" -> Seq(Some(163.905000), Some(163.905000), Some(143.665000), Some(110.320000)),
    "aroon_u_10" -> Seq(None, Some(40.000000), Some(70.000000), Some(10.000000)),
    "aroon_d_10" -> Seq(None, Some(10.000000), Some(80.000000), Some(0.000000)),
    "linreg_10_tsf" -> Seq(Some(28.553455), Some(8.659455), Some(33.345636), Some(16.205636)),
    "er_10" -> Seq(None, Some(0.187505), Some(0.120476), Some(0.140273)),
    "psl_10" -> Seq(Some(40.000000), Some(50.000000), Some(60.000000), Some(40.000000)),
    "bop" -> Seq(Some(-0.076375), Some(-0.010626), Some(0.039362), Some(0.019604)),
    "eom_14" -> Seq(None, Some(3572274527.035617), Some(4576786744.640332), Some(1017535716.443451)),
    "pvt" -> Seq(Some(238.130427), Some(410.895807), Some(1220.130500), Some(1438.834949)),
    "ui_10" -> Seq(None, None, Some(71.832463), Some(59.518360)),
    "bbl_5_2" -> Seq(Some(-33.015436), Some(-27.171210), Some(-39.348099), Some(-13.340970)),
    "bbu_5_2" -> Seq(Some(100.691436), Some(79.563210), Some(108.956099), Some(59.360970))
  )

  private lazy val rows: Array[org.apache.spark.sql.Row] = {
    val bars = Graft.bars(spark, TestSpark.sfDir)
    val out = bars.ta
      .sma(10)
      .ta.ema(10)
      .ta.wma(10)
      .ta.rma(10)
      .ta.rsi(10)
      .ta.atr(10)
      .ta.stoch(10, 3, 3)
      .ta.willr(10)
      .ta.cci(10)
      .ta.roc(10)
      .ta.mom(10)
      .ta.obv
      .ta.ad
      .ta.cmf(10)
      .ta.vwap
      .ta.vwma(10)
      .ta.mfi(10)
      .ta.cdlZ(10)
      .ta.donchian(10)
      .ta.midprice(10)
      .ta.aroon(10)
      .ta.linreg(10)
      .ta.er(10)
      .ta.psl(10)
      .ta.bop
      .ta.eom(14)
      .ta.pvt
      .ta.ui(10)
      .ta.bbands(5, 2.0)
    out.orderBy("ts").collect()
  }

  private val checkpoints = Seq(9, 14, 19, 29)

  goldens.foreach { case (name, expected) =>
    test(s"golden: $name") {
      checkpoints.zip(expected).foreach { case (t, exp) =>
        val row = rows(t)
        val idx = row.fieldIndex(name)
        val actual = if (row.isNullAt(idx)) None else Some(row.getDouble(idx))
        (exp, actual) match {
          case (None, None) => succeed
          case (Some(e), Some(a)) =>
            assert(math.abs(a - e) < 1.5e-6, s"$name at t=$t: expected $e got $a")
          case _ => fail(s"$name at t=$t: expected $exp got $actual")
        }
      }
    }
  }
}
