package graft.ta

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import prim._

/** The user-facing accessor (reference: `df.ta.<indicator>(...)`,
  * pandas_ta/core.py AnalysisIndicators). `import graft.ta._` gives
  * `df.ta.rsi()` etc. Methods append canonical lowercase columns
  * (`sma_10`, `macd_12_26_9`, ...) and return the DataFrame, so calls
  * chain: `df.ta.sma(10).ta.rsi(14)`.
  *
  * Inputs follow the canonical schema: series_id, ts, open, high, low,
  * close, volume (close-only indicators need only series_id/ts/close).
  * Every method is a composition over prim/stage — one shared window
  * spec, so an N-indicator chain plans as one Exchange + one Sort.
  */
final class Ta(private val df: DataFrame) {

  private def c(name: String) = col(name)
  private val close = col("close")
  private val open = col("open")
  private val high = col("high")
  private val low = col("low")
  private val volume = col("volume")

  // ======================================================== overlap =====
  def sma(n: Int = 10, src: String = "close"): DataFrame =
    df.withColumn(s"sma_$n", rmean(c(src), n))

  def ema(n: Int = 10, src: String = "close"): DataFrame =
    stage.ema(df, src, s"ema_$n", n)

  def wma(n: Int = 10, src: String = "close"): DataFrame =
    df.withColumn(s"wma_$n", prim.wma(c(src), n))

  def rma(n: Int = 10, src: String = "close"): DataFrame =
    df.withColumn(s"rma_$n", rmaOf(c(src), n))

  def hl2: DataFrame = df.withColumn("hl2", (high + low) / 2.0)
  def hlc3: DataFrame = df.withColumn("hlc3", (high + low + close) / 3.0)
  def ohlc4: DataFrame = df.withColumn("ohlc4", (open + high + low + close) / 4.0)
  def wcp: DataFrame = df.withColumn("wcp", (high + low + lit(2.0) * close) / 4.0)

  def midpoint(n: Int = 10, src: String = "close"): DataFrame =
    df.withColumn(s"midpoint_$n", (rmax(c(src), n) + rmin(c(src), n)) / 2.0)

  def midprice(n: Int = 10): DataFrame =
    df.withColumn(s"midprice_$n", (rmax(high, n) + rmin(low, n)) / 2.0)

  /** Global-anchor VWAP over the series: Σ(hlc3·v)/Σv cumulative. */
  def vwap: DataFrame =
    df.withColumn("__tp", (high + low + close) / 3.0)
      .withColumn("vwap", sdiv(cumsum(col("__tp") * volume), cumsum(volume)))
      .drop("__tp")

  def vwma(n: Int = 10): DataFrame =
    df.withColumn(s"vwma_$n", sdiv(rmean(close * volume, n), rmean(volume, n)))

  def linreg(n: Int = 10, src: String = "close"): DataFrame =
    stage.linreg(df, src, s"linreg_$n", n)

  // ===================================================== volatility =====
  /** max(h−l, |h−pc|, |l−pc|); null on the first row (no prev close). */
  def trueRange: DataFrame = {
    val pc = shift(close, 1)
    df.withColumn(
      "true_range",
      when(pc.isNull, lit(null))
        .otherwise(greatest(high - low, abs(high - pc), abs(low - pc)))
    )
  }

  def atr(n: Int = 10): DataFrame =
    new Ta(trueRange)
      .rmaAs(s"atr_$n", "true_range", n)

  private def rmaAs(out: String, src: String, n: Int): DataFrame =
    df.withColumn(out, rmaOf(c(src), n))

  def natr(n: Int = 10): DataFrame = {
    val a = new Ta(df).atr(n)
    a.withColumn(s"natr_$n", lit(100.0) * sdiv(c(s"atr_$n"), close))
  }

  def bbands(n: Int = 5, k: Double = 2.0, src: String = "close"): DataFrame = {
    val mid = rmean(c(src), n)
    val dev = rstd(c(src), n) * k
    // integral k → "2" (dots in column names break unquoted identifiers)
    val ks = if (k == k.floor) k.toInt.toString else k.toString.replace('.', '_')
    df.withColumn(s"bbm_${n}_$ks", mid)
      .withColumn(s"bbl_${n}_$ks", mid - dev)
      .withColumn(s"bbu_${n}_$ks", mid + dev)
      .withColumn(s"bbb_${n}_$ks", lit(100.0) * sdiv(lit(2.0) * dev, mid))
      .withColumn(s"bbp_${n}_$ks", sdiv(c(src) - (mid - dev), lit(2.0) * dev))
  }

  def donchian(n: Int = 10): DataFrame =
    df.withColumn(s"dcl_$n", rmin(low, n))
      .withColumn(s"dcu_$n", rmax(high, n))
      .withColumn(s"dcm_$n", (c(s"dcl_$n") + c(s"dcu_$n")) / 2.0)

  def accbands(n: Int = 10): DataFrame = {
    val ratio = lit(4.0) * sdiv(high - low, high + low)
    df.withColumn("__au", high * (lit(1.0) + ratio))
      .withColumn("__al", low * (lit(1.0) - ratio))
      .withColumn(s"accbu_$n", rmean(col("__au"), n))
      .withColumn(s"accbl_$n", rmean(col("__al"), n))
      .withColumn(s"accbm_$n", rmean(close, n))
      .drop("__au", "__al")
  }

  /** Ulcer index: √(sma(D², n)), D = 100·(c − HH(c,n))/HH(c,n). */
  def ui(n: Int = 10): DataFrame = {
    val hh = rmax(close, n)
    df.withColumn("__d2", {
      val dpct = lit(100.0) * sdiv(close - hh, hh)
      dpct * dpct
    }).withColumn(s"ui_$n", {
        val m = rmean(col("__d2"), n)
        when(m >= 0.0, sqrt(m))
      })
      .drop("__d2")
  }

  def pdist(drift: Int = 1): DataFrame =
    df.withColumn(
      "pdist",
      lit(2.0) * (high - low) - abs(close - open) + abs(open - shift(close, drift))
    )

  // ======================================================== volume =====
  /** OBV: cumsum(sign(Δc)·v), first row counts +v. */
  def obv: DataFrame = {
    val dcl = diff(close)
    val sgn = when(rn === 1, 1.0)
      .otherwise(when(dcl > 0, 1.0).when(dcl < 0, -1.0).otherwise(0.0))
    df.withColumn("__s", sgn * volume).withColumn("obv", cumsum(col("__s"))).drop("__s")
  }

  /** CLV·v accumulation; CLV = ((c−l)−(h−c))/(h−l), 0 when h=l. */
  def ad: DataFrame =
    df.withColumn("__clvv", clv * volume).withColumn("ad", cumsum(col("__clvv"))).drop("__clvv")

  private def clv: Column =
    when(high =!= low, ((close - low) - (high - close)) / (high - low)).otherwise(0.0)

  def cmf(n: Int = 10): DataFrame =
    df.withColumn("__clvv", clv * volume)
      .withColumn(s"cmf_$n", sdiv(rsum(col("__clvv"), n), rsum(volume, n)))
      .drop("__clvv")

  /** Elder force index: ema(Δc·v, n) (sma-seeded ema per declared spec). */
  def efi(n: Int = 10): DataFrame = {
    val tmp = df.withColumn("__f", diff(close) * volume)
    stage.ema(tmp, "__f", s"efi_$n", n).drop("__f")
  }

  def eom(n: Int = 14, divisor: Double = 1e8): DataFrame =
    df.withColumn("__hl2", (high + low) / 2.0)
      .withColumn("__raw", lit(divisor) * diff(col("__hl2")) * sdiv(high - low, volume))
      .withColumn(s"eom_$n", rmean(col("__raw"), n))
      .drop("__hl2", "__raw")

  /** MFI: null tp-diff (row 0) contributes 0 to both flows (FIXTURES §3). */
  def mfi(n: Int = 10): DataFrame = {
    val tp = (high + low + close) / 3.0
    df.withColumn("__tp", tp)
      .withColumn("__dtp", diff(col("__tp")))
      .withColumn("__pos", when(col("__dtp") > 0, col("__tp") * volume).otherwise(0.0))
      .withColumn("__neg", when(col("__dtp") < 0, col("__tp") * volume).otherwise(0.0))
      .withColumn(
        s"mfi_$n",
        lit(100.0) * sdiv(rsum(col("__pos"), n), rsum(col("__pos"), n) + rsum(col("__neg"), n))
      )
      .drop("__tp", "__dtp", "__pos", "__neg")
  }

  def pvol: DataFrame = df.withColumn("pvol", volume * close)

  /** Price-volume rank 1..4 by signs of (Δc, Δv); null until both diffs exist. */
  def pvr: DataFrame = {
    val dc = diff(close); val dv = diff(volume)
    df.withColumn(
      "pvr",
      when(dc.isNull || dv.isNull, lit(null))
        .when(dc >= 0 && dv >= 0, 1.0)
        .when(dc >= 0 && dv < 0, 2.0)
        .when(dc < 0 && dv >= 0, 3.0)
        .otherwise(4.0)
    )
  }

  /** PVT: cumsum(1-period fractional return · v); row 0 contributes 0. */
  def pvt: DataFrame =
    df.withColumn("__r", coalesce(pctChange(close, 1) * volume, lit(0.0)))
      .withColumn("pvt", cumsum(col("__r")))
      .drop("__r")

  // ====================================================== momentum =====
  def stoch(n: Int = 10, smoothK: Int = 3, dN: Int = 3): DataFrame = {
    val ll = rmin(low, n); val hh = rmax(high, n)
    df.withColumn("__fastk", lit(100.0) * sdiv(close - ll, hh - ll))
      .withColumn(s"stoch_k", rmean(col("__fastk"), smoothK))
      .withColumn(s"stoch_d", rmean(col(s"stoch_k"), dN))
      .drop("__fastk")
  }

  def willr(n: Int = 10): DataFrame = {
    val ll = rmin(low, n); val hh = rmax(high, n)
    df.withColumn(s"willr_$n", lit(100.0) * sdiv(close - hh, hh - ll))
  }

  def cci(n: Int = 10, scalar: Double = 0.015): DataFrame = {
    val tmp = df.withColumn("__tp", (high + low + close) / 3.0)
    stage
      .mad(tmp, "__tp", "__mad", n)
      .withColumn(s"cci_$n", sdiv(col("__tp") - rmean(col("__tp"), n), lit(scalar) * col("__mad")))
      .drop("__tp", "__mad")
  }

  def ao(fast: Int = 5, slow: Int = 20): DataFrame =
    df.withColumn("__hl2", (high + low) / 2.0)
      .withColumn(s"ao_${fast}_$slow", rmean(col("__hl2"), fast) - rmean(col("__hl2"), slow))
      .drop("__hl2")

  def bop: DataFrame = df.withColumn("bop", sdiv(close - open, high - low))

  /** Ultimate oscillator; null-propagating min/max vs prev close. */
  def uo(f: Int = 7, m: Int = 14, s: Int = 28): DataFrame = {
    val pc = shift(close, 1)
    val bp = when(pc.isNull, lit(null)).otherwise(close - least(low, pc))
    val tr = when(pc.isNull, lit(null)).otherwise(greatest(high, pc) - least(low, pc))
    def avgN(n: Int) = sdiv(rsum(col("__bp"), n), rsum(col("__tr"), n))
    df.withColumn("__bp", bp)
      .withColumn("__tr", tr)
      .withColumn(
        s"uo_${f}_${m}_$s",
        lit(100.0) * (lit(4.0) * avgN(f) + lit(2.0) * avgN(m) + avgN(s)) / 7.0
      )
      .drop("__bp", "__tr")
  }

  /** Elder-ray: bull = high − ema(n), bear = low − ema(n). */
  def eri(n: Int = 10): DataFrame = {
    val withE = stage.ema(df, "close", "__e", n)
    withE
      .withColumn(s"bull_$n", high - col("__e"))
      .withColumn(s"bear_$n", low - col("__e"))
      .drop("__e")
  }

  def mom(n: Int = 10, src: String = "close"): DataFrame =
    df.withColumn(s"mom_$n", diff(c(src), n))

  def roc(n: Int = 10, src: String = "close"): DataFrame =
    df.withColumn(s"roc_$n", lit(100.0) * pctChange(c(src), n))

  /** Chande momentum: 100·(ΣU−ΣD)/(ΣU+ΣD), rolling-sum mode (declared). */
  def cmo(n: Int = 10, src: String = "close"): DataFrame = {
    val x = c(src)
    val dd = diff(x)
    df.withColumn("__up", when(dd.isNull, lit(null)).when(dd > 0, dd).otherwise(lit(0.0)))
      .withColumn("__dn", when(dd.isNull, lit(null)).when(dd < 0, -dd).otherwise(lit(0.0)))
      .withColumn(
        s"cmo_$n",
        lit(100.0) * sdiv(
          rsum(col("__up"), n) - rsum(col("__dn"), n),
          rsum(col("__up"), n) + rsum(col("__dn"), n)
        )
      )
      .drop("__up", "__dn")
  }

  /** Absolute price oscillator, declared mamode=sma. */
  def apo(fast: Int = 12, slow: Int = 26, src: String = "close"): DataFrame =
    df.withColumn(s"apo_${fast}_$slow", rmean(c(src), fast) - rmean(c(src), slow))

  /** Percentage price oscillator, pandas-ta default mamode=sma. */
  def ppo(fast: Int = 12, slow: Int = 26, src: String = "close"): DataFrame =
    df.withColumn(
      s"ppo_${fast}_$slow",
      lit(100.0) * sdiv(rmean(c(src), fast) - rmean(c(src), slow), rmean(c(src), slow))
    )

  def bias(n: Int = 26, src: String = "close"): DataFrame =
    df.withColumn(s"bias_$n", lit(100.0) * (sdiv(c(src), rmean(c(src), n)) - 1.0))

  /** Kaufman efficiency ratio: |Δₙc| / Σ|Δc| over n. */
  def er(n: Int = 10, src: String = "close"): DataFrame = {
    val x = c(src)
    df.withColumn("__ad", abs(diff(x)))
      .withColumn(s"er_$n", sdiv(abs(x - shift(x, n)), rsum(col("__ad"), n)))
      .drop("__ad")
  }

  /** Psychological line: 100·count(Δc>0 over n)/n. */
  def psl(n: Int = 12, src: String = "close"): DataFrame = {
    val dd = diff(c(src))
    df.withColumn("__gt", when(dd.isNull, lit(null)).when(dd > 0, 1.0).otherwise(0.0))
      .withColumn(s"psl_$n", lit(100.0) * rsum(col("__gt"), n) / n.toDouble)
      .drop("__gt")
  }

  /** Center of gravity: −Σ(i+1)·x_{t−i} / Σx over n (i=0 newest). */
  def cg(n: Int = 10, src: String = "close"): DataFrame = {
    val x = c(src)
    val num = wdot(x, (1 to n).map(_.toDouble))
    df.withColumn(s"cg_$n", -sdiv(when(count(x).over(f(n)) >= n, num), rsum(x, n)))
  }

  /** Chande forecast oscillator: 100·(c − linreg_tsf(c,n))/c. */
  def cfo(n: Int = 10, src: String = "close"): DataFrame =
    stage
      .linreg(df, src, s"__lr", n)
      .withColumn(s"cfo_$n", lit(100.0) * sdiv(c(src) - col("__lr_tsf"), c(src)))
      .drop("__lr_slope", "__lr_intercept", "__lr_tsf", "__lr_r")

  /** Correlation trend indicator: rolling Pearson r of src vs 0..n−1. */
  def cti(n: Int = 12, src: String = "close"): DataFrame =
    stage
      .linreg(df, src, s"__lr", n)
      .withColumn(s"cti_$n", col("__lr_r"))
      .drop("__lr_slope", "__lr_intercept", "__lr_tsf", "__lr_r")

  /** Coppock curve: wma(roc(fast) + roc(slow), n). */
  def coppock(n: Int = 10, fast: Int = 11, slow: Int = 14, src: String = "close"): DataFrame = {
    val x = c(src)
    df.withColumn(
        "__rsum2",
        lit(100.0) * pctChange(x, fast) + lit(100.0) * pctChange(x, slow)
      )
      .withColumn(s"coppock_${n}_${fast}_$slow", prim.wma(col("__rsum2"), n))
      .drop("__rsum2")
  }

  /** Know-sure-thing: Σᵢ i·sma(roc(rᵢ), sᵢ), signal = sma(kst, sig). */
  def kst(
      r: Seq[Int] = Seq(10, 15, 20, 30),
      s: Seq[Int] = Seq(10, 10, 10, 15),
      sig: Int = 9,
      src: String = "close"
  ): DataFrame = {
    val x = c(src)
    val terms = r.zip(s).zipWithIndex.map { case ((ri, si), i) =>
      lit((i + 1).toDouble) * rmean(lit(100.0) * pctChange(x, ri), si)
    }
    df.withColumn("kst", terms.reduce(_ + _))
      .withColumn(s"kst_signal", rmean(col("kst"), sig))
  }

  /** Trix: 100·pct_change of triple sma-seeded ema. */
  def trix(n: Int = 10, src: String = "close"): DataFrame = {
    val d1 = stage.ema(df, src, "__te1", n)
    val d2 = stage.ema(d1, "__te1", "__te2", n)
    val d3 = stage.ema(d2, "__te2", "__te3", n)
    d3.withColumn(s"trix_$n", lit(100.0) * pctChange(col("__te3"), 1))
      .drop("__te1", "__te2", "__te3")
  }

  /** True strength index: 100·ema(ema(Δc,slow),fast)/ema(ema(|Δc|,slow),fast)
    * (sma-seeded ema chains per the declared spec). */
  def tsi(fast: Int = 13, slow: Int = 25, src: String = "close"): DataFrame = {
    val tmp = df
      .withColumn("__d", diff(c(src)))
      .withColumn("__ad", abs(diff(c(src))))
    val e1 = stage.ema(stage.ema(tmp, "__d", "__ds", slow), "__ds", "__dss", fast)
    val e2 = stage.ema(stage.ema(e1, "__ad", "__as", slow), "__as", "__ass", fast)
    e2.withColumn(s"tsi_${fast}_$slow", lit(100.0) * sdiv(col("__dss"), col("__ass")))
      .drop("__d", "__ad", "__ds", "__dss", "__as", "__ass")
  }

  /** StochRSI: stoch range position of rsi(n), smoothed k and d. */
  def stochrsi(n: Int = 10, k: Int = 3, d: Int = 3, src: String = "close"): DataFrame = {
    val withRsi = rsiAs(df, src, "__rsi", n)
    val lo = rmin(col("__rsi"), n); val hi = rmax(col("__rsi"), n)
    withRsi
      .withColumn("__srsi", lit(100.0) * sdiv(col("__rsi") - lo, hi - lo))
      .withColumn(s"stochrsi_k", rmean(col("__srsi"), k))
      .withColumn(s"stochrsi_d", rmean(col(s"stochrsi_k"), d))
      .drop("__rsi", "__srsi")
  }

  def rsi(n: Int = 10, src: String = "close"): DataFrame =
    rsiAs(df, src, s"rsi_$n", n)

  private def rsiAs(d0: DataFrame, src: String, out: String, n: Int): DataFrame = {
    val dd = diff(c(src))
    d0.withColumn("__rup", when(dd.isNull, lit(null)).when(dd > 0, dd).otherwise(lit(0.0)))
      .withColumn("__rdn", when(dd.isNull, lit(null)).when(dd < 0, -dd).otherwise(lit(0.0)))
      .withColumn(
        out,
        lit(100.0) * sdiv(rmaOf(col("__rup"), n), rmaOf(col("__rup"), n) + rmaOf(col("__rdn"), n))
      )
      .drop("__rup", "__rdn")
  }

  // ========================================================= trend =====
  /** Aroon: 100·(n − bars-since-extreme)/n over n+1 rows; ties → most
    * recent occurrence (reference reverses then argmax). */
  def aroon(n: Int = 10): DataFrame =
    df.withColumn("__hs", collect_list(high).over(f(n + 1)))
      .withColumn("__ls", collect_list(low).over(f(n + 1)))
      .withColumn(
        s"aroon_u_$n",
        when(
          size(col("__hs")) === n + 1,
          lit(100.0) * (lit(n.toDouble) -
            (expr("array_position(reverse(__hs), array_max(__hs))") - 1.0)) / n.toDouble
        )
      )
      .withColumn(
        s"aroon_d_$n",
        when(
          size(col("__ls")) === n + 1,
          lit(100.0) * (lit(n.toDouble) -
            (expr("array_position(reverse(__ls), array_min(__ls))") - 1.0)) / n.toDouble
        )
      )
      .drop("__hs", "__ls")

  /** Choppiness: 100·log10(Σtr(n)/(HH−LL))/log10(n) = 100·ln(r)/ln(n). */
  def chop(n: Int = 10): DataFrame = new Ta(trueRange).chopInner(n)

  private def chopInner(n: Int): DataFrame = {
    val rangeHL = rmax(high, n) - rmin(low, n)
    val ratio = sdiv(rsum(c("true_range"), n), rangeHL)
    df.withColumn(s"chop_$n", lit(100.0) * sln(ratio) / lit(math.log(n.toDouble)))
  }

  def vortex(n: Int = 10): DataFrame = {
    val pl = shift(low, 1); val ph = shift(high, 1)
    val base = new Ta(df).trueRange
    base
      .withColumn("__vmp", when(pl.isNull, lit(null)).otherwise(abs(high - pl)))
      .withColumn("__vmm", when(ph.isNull, lit(null)).otherwise(abs(low - ph)))
      .withColumn(s"vtxp_$n", sdiv(rsum(col("__vmp"), n), rsum(col("true_range"), n)))
      .withColumn(s"vtxm_$n", sdiv(rsum(col("__vmm"), n), rsum(col("true_range"), n)))
      .drop("__vmp", "__vmm")
  }

  def qstick(n: Int = 10): DataFrame =
    df.withColumn(s"qstick_$n", rmean(close - open, n))

  /** Vertical horizontal filter: |HH(c,n)−LL(c,n)| / Σ|Δc| over n. */
  def vhf(n: Int = 10, src: String = "close"): DataFrame = {
    val x = c(src)
    df.withColumn("__ad", abs(diff(x)))
      .withColumn(s"vhf_$n", sdiv(abs(rmax(x, n) - rmin(x, n)), rsum(col("__ad"), n)))
      .drop("__ad")
  }

  def increasing(n: Int = 1, src: String = "close"): DataFrame =
    df.withColumn(s"increasing_$n", when(diff(c(src), n) > 0, 1.0).otherwise(0.0))

  def decreasing(n: Int = 1, src: String = "close"): DataFrame =
    df.withColumn(s"decreasing_$n", when(diff(c(src), n) < 0, 1.0).otherwise(0.0))

  /** Trend signals (reference trend/tsignals.py): entries/exits/active
    * from an int trend column. Row 0 with trend=1 is an entry. */
  def tsignals(trendCol: String): DataFrame = {
    val t = c(trendCol); val pt = coalesce(shift(t, 1), lit(0.0))
    df.withColumn("ts_trends", t)
      .withColumn("ts_entries", when(t === 1.0 && pt === 0.0, 1.0).otherwise(0.0))
      .withColumn("ts_exits", when(t === 0.0 && pt === 1.0, 1.0).otherwise(0.0))
  }

  /** cross-above signal: a>b now, a≤b on the previous row. */
  def crossAbove(a: String, b: String, out: String): DataFrame = {
    val pa = shift(c(a), 1); val pb = shift(c(b), 1)
    df.withColumn(
      out,
      when(c(a) > c(b) && pa.isNotNull && pb.isNotNull && pa <= pb, 1.0).otherwise(0.0)
    )
  }

  def above(a: String, b: String, out: String): DataFrame =
    df.withColumn(out, when(c(a) >= c(b), 1.0).otherwise(0.0))

  // ======================================================= candles =====
  def cdlInside: DataFrame = {
    val ph = shift(high, 1); val pl = shift(low, 1)
    df.withColumn(
      "cdl_inside",
      when(ph.isNotNull && high < ph && low > pl, 1.0).otherwise(0.0)
    )
  }

  /** Z-score of each OHLC component over n. */
  def cdlZ(n: Int = 10): DataFrame =
    Seq("open", "high", "low", "close").foldLeft(df) { (d, s) =>
      d.withColumn(s"${s}_z_$n", sdiv(c(s) - rmean(c(s), n), rstd(c(s), n)))
    }
}

object Ta {
  implicit class RichTaDf(val df: DataFrame) extends AnyVal {
    def ta: Ta = new Ta(df)
  }
}
