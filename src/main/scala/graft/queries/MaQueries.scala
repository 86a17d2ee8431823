package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Graft
import graft.ta.{prim => P}
import graft.ta.Ta._
import sqlgen._
import SeriesQueries.{Cte, emaSql}

/** Weighted-window MAs, ichimoku, and the second wave of momentum/volume
  * composites (rvgi, smi, squeeze, stc, inertia, aobv, kvo, signal utils).
  * Oracles mirror the Spark expressions term-for-term (weights emitted as
  * identical double literals).
  */
object MaQueries {

  private def bars = new Cte("bars", barsCte)

  private val trExpr =
    s"CASE WHEN lag(close, 1) $ov IS NULL THEN NULL ELSE " +
      s"greatest(high - low, abs(high - lag(close, 1) $ov), abs(low - lag(close, 1) $ov)) END"

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

  /** Normalized window-ordered weights → gated lag-unrolled dot (mirror of
    * Ta.wdotMa: reverse to lag order, divide by sum). */
  private def wdotSql(x: String, weights: Seq[Double]): String = {
    val s = weights.sum
    val lagW = weights.reverse.map(_ / s)
    gate(x, weights.size, wdot(x, lagW))
  }

  // ------------------------------------------------------ weighted MAs
  private def maQ(name: String, weights: Seq[Double])(build: DataFrame => DataFrame): Q = {
    val b = bars.addSel("m1", s"${wdotSql("close", weights)} AS $name")
    mk(name, Seq(name), fin(b, Seq(name)))(build)
  }

  val qAlma = {
    val n = 10; val sigma = 6.0; val offset = 0.85
    val m = offset * (n - 1); val s = n / sigma
    maQ("alma_10", (0 until n).map(i => math.exp(-(i - m) * (i - m) / (2 * s * s))))(_.ta.alma(n, sigma, offset))
  }
  val qFwma = {
    val fib = Iterator.iterate((1.0, 1.0)) { case (a, b) => (b, a + b) }.map(_._1).take(10).toSeq
    maQ("fwma_10", fib)(_.ta.fwma(10))
  }
  val qPwma = {
    val n = 10
    val row = (0 until n).scanLeft(1.0) { case (acc, k) => acc * (n - 1 - k) / (k + 1) }.take(n)
    maQ("pwma_10", row)(_.ta.pwma(10))
  }
  val qSwma = {
    val n = 10; val half = (n + 1) / 2
    val tri = ((1 to half) ++ (half to 1 by -1)).map(_.toDouble)
    maQ("swma_10", tri)(_.ta.swma(10))
  }
  val qSinwma = {
    val n = 10
    maQ("sinwma_10", (0 until n).map(i => math.sin((i + 1) * math.Pi / (n + 1))))(_.ta.sinwma(10))
  }
  val qTrima = {
    // sma(sma(x, ceil((n+1)/2)), floor(n/2)+1), n=10 → 6 then 6
    val b = bars
      .addSel("t1", s"${rmean("close", 6)} AS tt1")
      .addSel("t2", s"${rmean("tt1", 6)} AS trima2_10")
    mk("trima2_10", Seq("trima2_10"), fin(b, Seq("trima2_10"))) { df0 =>
      df0.ta.trima(10).withColumnRenamed("trima_10", "trima2_10")
    }
  }

  // ------------------------------------------------------ ichimoku (small params)
  val qIchimoku = {
    val (tn, kn, sn, sh) = (3, 5, 8, 5)
    def mid(n: Int) = s"(${rmax("high", n)} + ${rmin("low", n)}) / 2e0"
    val b = bars
      .addSel("i1", s"${mid(tn)} AS its_$tn, ${mid(kn)} AS iks_$kn, ${mid(sn)} AS isb0")
      .addSel(
        "i2",
        s"lag((its_$tn + iks_$kn) / 2e0, $sh) $ov AS isa_$tn, lag(isb0, $sh) $ov AS isb_$kn, " +
          s"lead(close, $sh) $ov AS ics_$kn"
      )
    val outs = Seq(s"its_$tn", s"iks_$kn", s"isa_$tn", s"isb_$kn", s"ics_$kn")
    mk("ichimoku", outs, fin(b, outs))(_.ta.ichimoku(tn, kn, sn, sh))
  }

  // ------------------------------------------------------ rvgi / smi
  val qRvgi = {
    val n = 10; val sw = 4
    val tri = Seq(1.0, 2.0, 2.0, 1.0)
    def swS(x: String) = {
      val s = tri.sum
      gate(x, sw, wdot(x, tri.reverse.map(_ / s)))
    }
    val b = bars
      .addSel("r1", s"${swS("(close - open)")} AS num, ${swS("(high - low)")} AS den")
      .addSel("r2", s"${sdiv(rsum("num", n), rsum("den", n))} AS rvgi_$n")
      .addSel("r3", s"${swS(s"rvgi_$n")} AS rvgis_$n")
    val outs = Seq(s"rvgi_$n", s"rvgis_$n")
    mk(s"rvgi_$n", outs, fin(b, outs))(_.ta.rvgi(n, sw))
  }

  val qSmi = {
    val (n, f, s0) = (10, 5, 3)
    val b0 = bars.addSel(
      "s0",
      s"close - (${rmax("high", n)} + ${rmin("low", n)}) / 2e0 AS m, ${rmax("high", n)} - ${rmin("low", n)} AS r"
    )
    val b1 = emaSql(b0, "m", "m1", f)
    val b2 = emaSql(b1, "m1", "m2", s0)
    val b3 = emaSql(b2, "r", "r1", f)
    val b = emaSql(b3, "r1", "r2", s0)
      .addSel("s5", s"100e0 * ${sdiv("m2", "(r2 / 2e0)")} AS smi_$n")
    mk(s"smi_$n", Seq(s"smi_$n"), fin(b, Seq(s"smi_$n")))(_.ta.smi(n, f, s0))
  }

  // ------------------------------------------------------ squeeze / stc / inertia
  val qSqueeze = {
    val (bbN, kcN, momN) = (10, 10, 6)
    val b0 = bars
      .addSel("q0", s"$trExpr AS true_range")
      .addSel("q1", s"${rmean("close", bbN)} AS mid, ${rstd("close", bbN)} * 2e0 AS dev")
    val b1 = emaSql(b0, "close", "basis", kcN)
    val b2 = emaSql(b1, "true_range", "band", kcN)
      .addSel(
        "q2",
        "CASE WHEN mid IS NULL OR basis IS NULL THEN NULL " +
          "WHEN (mid - dev) > (basis - 1.5e0 * band) AND (mid + dev) < (basis + 1.5e0 * band) THEN 1e0 ELSE 0e0 END AS sqz_on, " +
          "CASE WHEN mid IS NULL OR basis IS NULL THEN NULL " +
          "WHEN (mid - dev) < (basis - 1.5e0 * band) AND (mid + dev) > (basis + 1.5e0 * band) THEN 1e0 ELSE 0e0 END AS sqz_off, " +
          s"close - ((${rmax("high", momN)} + ${rmin("low", momN)}) / 2e0 + ${rmean("close", momN)}) / 2e0 AS delta"
      )
      .addSel("q3", linregStage("delta", momN))
    val (slope, rest) = linregCalc("sq", momN)
    val b = b2
      .addSel("q4", slope)
      .addSel("q5", rest)
      .addSel("q6", "sq_tsf AS sqz_mom")
    val outs = Seq("sqz_on", "sqz_off", "sqz_mom")
    mk("squeeze", outs, fin(b, outs))(_.ta.squeeze(bbN, kcN, momN))
  }

  val qSqueezePro = {
    val (bbN, kcN, momN) = (10, 10, 6)
    val b0 = bars
      .addSel("p0", s"$trExpr AS true_range")
      .addSel("p1", s"${rmean("close", bbN)} AS mid, ${rstd("close", bbN)} * 2e0 AS dev")
    val b1 = emaSql(b0, "close", "basis", kcN)
    def onFlag(mult: Double, out: String) =
      s"CASE WHEN mid IS NULL OR basis IS NULL THEN NULL " +
        s"WHEN (mid - dev) > (basis - ${d(mult)} * band) AND (mid + dev) < (basis + ${d(mult)} * band) THEN 1e0 ELSE 0e0 END AS $out"
    val b2 = emaSql(b1, "true_range", "band", kcN)
      .addSel(
        "p2",
        Seq(onFlag(2.0, "sqzpro_on_wide"), onFlag(1.5, "sqzpro_on_normal"), onFlag(1.0, "sqzpro_on_narrow")).mkString(", ") +
          s", close - ((${rmax("high", momN)} + ${rmin("low", momN)}) / 2e0 + ${rmean("close", momN)}) / 2e0 AS delta"
      )
      .addSel("p3", linregStage("delta", momN))
    val (slope, rest) = linregCalc("sp", momN)
    val b = b2.addSel("p4", slope).addSel("p5", rest).addSel("p6", "sp_tsf AS sqzpro_mom")
    val outs = Seq("sqzpro_on_wide", "sqzpro_on_normal", "sqzpro_on_narrow", "sqzpro_mom")
    mk("squeeze_pro", outs, fin(b, outs))(_.ta.squeezePro(bbN, kcN, momN))
  }

  val qStc = {
    val (tc, f, s0) = (5, 6, 10)
    val b0 = emaSql(bars, "close", "ef", f)
    val b1 = emaSql(b0, "close", "es", s0)
      .addSel("c1", "ef - es AS macd")
      .addSel(
        "c2",
        s"100e0 * ${sdiv(s"(macd - ${rmin("macd", tc)})", s"(${rmax("macd", tc)} - ${rmin("macd", tc)})")} AS st1"
      )
      .addSel("c3", s"${ewm("st1", 0.5)} AS dd1")
      .addSel(
        "c4",
        s"100e0 * ${sdiv(s"(dd1 - ${rmin("dd1", tc)})", s"(${rmax("dd1", tc)} - ${rmin("dd1", tc)})")} AS st2"
      )
      .addSel("c5", s"${ewm("st2", 0.5)} AS stc_$tc, macd AS stc_macd_$tc")
    val outs = Seq(s"stc_$tc", s"stc_macd_$tc")
    mk(s"stc_$tc", outs, fin(b1, outs))(_.ta.stc(tc, f, s0))
  }

  val qInertia = {
    val (n, rn) = (10, 7)
    val b0 = bars
      .addSel("i0", s"${rstd("close", rn)} AS sd, close - lag(close, 1) $ov AS dc")
      .addSel(
        "i1",
        "CASE WHEN dc IS NULL OR sd IS NULL THEN NULL WHEN dc > 0 THEN sd ELSE 0e0 END AS pos, " +
          "CASE WHEN dc IS NULL OR sd IS NULL THEN NULL WHEN dc < 0 THEN sd ELSE 0e0 END AS neg"
      )
      .addSel("i2", s"${rma("pos", rn)} AS p, ${rma("neg", rn)} AS q")
      .addSel("i3", s"100e0 * ${sdiv("p", "(p + q)")} AS rvi_$rn")
      .addSel("i4", linregStage(s"rvi_$rn", n))
    val (slope, rest) = linregCalc("il", n)
    val b = b0.addSel("i5", slope).addSel("i6", rest).addSel("i7", s"il_tsf AS inertia_$n")
    mk(s"inertia_$n", Seq(s"inertia_$n"), fin(b, Seq(s"inertia_$n")))(_.ta.inertia(n, rn))
  }

  // ------------------------------------------------------ aobv / kvo
  val qAobv = {
    val (f, s0) = (4, 12)
    val b0 = bars
      .addSel("ap", s"lag(close, 1) $ov AS pc0")
      .addSel(
        "a0",
        s"sum(CASE WHEN pc0 IS NULL THEN volume WHEN close - pc0 >= 0 THEN volume ELSE -volume END) $cum AS obv"
      )
    val b1 = emaSql(b0, "obv", s"obv_fast_$f", f)
    val b2 = emaSql(b1, "obv", s"obv_slow_$s0", s0)
      .addSel("a3", s"obv_fast_$f - lag(obv_fast_$f, 2) $ov AS df2, obv_slow_$s0 - lag(obv_slow_$s0, 2) $ov AS ds2")
      .addSel(
        "a4",
        "CASE WHEN (df2 > 0 AND ds2 < 0) OR (df2 > 0 AND ds2 > 0) THEN 1e0 ELSE 0e0 END AS aobv_lr, " +
          "CASE WHEN (df2 < 0 AND ds2 > 0) OR (df2 < 0 AND ds2 < 0) THEN 1e0 ELSE 0e0 END AS aobv_sr"
      )
    val outs = Seq("obv", s"obv_fast_$f", s"obv_slow_$s0", "aobv_lr", "aobv_sr")
    mk("aobv", outs, fin(b2, outs))(_.ta.aobv(f, s0, 2))
  }

  val qKvo = {
    val (f, s0, sig) = (10, 16, 5)
    val b = bars
      .addSel("k0", s"(high + low + close) / 3e0 AS tp")
      .addSel("k1", s"tp - lag(tp, 1) $ov AS dtp")
      .addSel(
        "k2",
        "CASE WHEN dtp > 0 THEN volume WHEN dtp < 0 THEN -volume WHEN dtp = 0 THEN 0e0 END AS sv"
      )
      .addSel("k3", s"${ewm("sv", 2.0 / (f + 1))} AS kf, ${ewm("sv", 2.0 / (s0 + 1))} AS ks")
      .addSel("k4", s"kf - ks AS kvo_$f")
      .addSel("k5", s"${ewm(s"kvo_$f", 2.0 / (sig + 1))} AS kvos_$f")
    val outs = Seq(s"kvo_$f", s"kvos_$f")
    mk(s"kvo_$f", outs, fin(b, outs))(_.ta.kvo(f, s0, sig))
  }

  // ------------------------------------------------------ signal utils
  val qSignals2 = {
    val b = bars
      .addSel("g0", s"${rmean("close", 10)} AS m10")
      .addSel(
        "g1",
        "CASE WHEN close <= m10 THEN 1e0 ELSE 0e0 END AS below_sma, " +
          "CASE WHEN close >= 50e0 THEN 1e0 ELSE 0e0 END AS above_50, " +
          "CASE WHEN close <= 20e0 THEN 1e0 ELSE 0e0 END AS below_20, " +
          s"CASE WHEN close < m10 AND lag(close, 1) $ov IS NOT NULL AND lag(m10, 1) $ov IS NOT NULL " +
          s"AND lag(close, 1) $ov >= lag(m10, 1) $ov THEN 1e0 ELSE 0e0 END AS xdn_sma, " +
          s"CASE WHEN close > 50e0 AND lag(close, 1) $ov IS NOT NULL AND lag(close, 1) $ov <= 50e0 THEN 1e0 ELSE 0e0 END AS xval_50"
      )
    val outs = Seq("below_sma", "above_50", "below_20", "xdn_sma", "xval_50")
    mk("signals2", outs, fin(b, outs)) { df0 =>
      df0.ta
        .sma(10)
        .ta.below("close", "sma_10", "below_sma")
        .ta.aboveValue("close", 50.0, "above_50")
        .ta.belowValue("close", 20.0, "below_20")
        .ta.crossBelow("close", "sma_10", "xdn_sma")
        .ta.crossValue("close", 50.0, "xval_50")
    }
  }

  val all: Seq[Q] = Seq(
    qAlma, qFwma, qPwma, qSwma, qSinwma, qTrima, qIchimoku, qRvgi, qSmi,
    qSqueeze, qSqueezePro, qStc, qInertia, qAobv, qKvo, qSignals2
  )
}
