package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Graft
import graft.ta.{prim => P}
import graft.ta.Ta._
import sqlgen._
import SeriesQueries.{Cte, emaSql}

/** Composed indicators (window-expression chains, SURVEY.md §2.B rows not
  * yet covered by Series/Bars/Momentum queries): MA variants, ADX family,
  * volatility channels, volume oscillators, trend flags. Oracles mirror
  * the Spark expression tree stage-for-stage over the bars CTE.
  */
object CompositeQueries {

  private def bars = new Cte("bars", barsCte)

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

  // --------------------------------------------------------- t3 / zlma
  val qT3 = {
    val n = 10; val a = 0.7
    val c1 = -a * a * a
    val c2 = 3.0 * a * a + 3.0 * a * a * a
    val c3 = -6.0 * a * a - 3.0 * a - 3.0 * a * a * a
    val c4 = 1.0 + 3.0 * a + a * a * a + 3.0 * a * a
    var b = bars
    for (i <- 1 to 6) b = emaSql(b, if (i == 1) "close" else s"e${i - 1}", s"e$i", n)
    b = b.addSel("tf", s"(${d(c1)})*e6 + (${d(c2)})*e5 + (${d(c3)})*e4 + (${d(c4)})*e3 AS t3_$n")
    mk(s"t3_$n", Seq(s"t3_$n"), fin(b, Seq(s"t3_$n")))(_.ta.t3(n, a))
  }

  val qZlma = {
    val n = 10; val lagN = (n - 1) / 2
    val b0 = bars.addSel("z1", s"2e0 * close - lag(close, $lagN) $ov AS zl")
    val b = emaSql(b0, "zl", s"zlma_$n", n)
    mk(s"zlma_$n", Seq(s"zlma_$n"), fin(b, Seq(s"zlma_$n")))(_.ta.zlma(n))
  }

  // --------------------------------------------------------- dm / adx
  private def dmStage(b: Cte, n: Int): Cte =
    b.addSel("d1", s"high - lag(high, 1) $ov AS up, lag(low, 1) $ov - low AS dn")
      .addSel(
        "d2",
        "CASE WHEN up IS NULL OR dn IS NULL THEN NULL WHEN up > dn AND up > 0 THEN up ELSE 0e0 END AS pdm, " +
          "CASE WHEN up IS NULL OR dn IS NULL THEN NULL WHEN dn > up AND dn > 0 THEN dn ELSE 0e0 END AS mdm"
      )
      .addSel("d3", s"${rma("pdm", n)} AS dmp_$n, ${rma("mdm", n)} AS dmn_$n")

  val qDm = {
    val n = 14
    val b = dmStage(bars, n)
    mk(s"dm_$n", Seq(s"dmp_$n", s"dmn_$n"), fin(b, Seq(s"dmp_$n", s"dmn_$n")))(_.ta.dm(n))
  }

  val qAdx = {
    val n = 14
    val b = dmStage(bars, n)
      .addSel("a1", s"$trSql AS true_range")
      .addSel("a2", s"${rma("true_range", n)} AS xatr")
      .addSel(
        "a3",
        s"100e0 * ${sdiv(s"dmp_$n", "xatr")} AS dip_$n, 100e0 * ${sdiv(s"dmn_$n", "xatr")} AS dim_$n"
      )
      .addSel("a4", s"100e0 * ${sdiv(s"abs(dip_$n - dim_$n)", s"(dip_$n + dim_$n)")} AS dx")
      .addSel("a5", s"${rma("dx", n)} AS adx_$n")
    val outs = Seq(s"adx_$n", s"dip_$n", s"dim_$n")
    mk(s"adx_$n", outs, fin(b, outs))(_.ta.adx(n, n))
  }

  // --------------------------------------------------------- kc / massi / rvi / thermo
  val qKc = {
    val n = 20; val k = 2.0
    val b0 = bars.addSel("k0", s"$trSql AS true_range")
    val b1 = emaSql(b0, "close", "basis", n)
    val b = emaSql(b1, "true_range", "band", n)
      .addSel(
        "k3",
        s"basis AS kcb_$n, basis - ${d(k)} * band AS kcl_$n, basis + ${d(k)} * band AS kcu_$n"
      )
    val outs = Seq(s"kcb_$n", s"kcl_$n", s"kcu_$n")
    mk(s"kc_$n", outs, fin(b, outs))(_.ta.kc(n, k))
  }

  val qMassi = {
    val (f, s0) = (9, 25)
    val b0 = bars.addSel("m0", "high - low AS hr")
    val b1 = emaSql(b0, "hr", "e1", f)
    val b = emaSql(b1, "e1", "e2", f)
      .addSel("m3", s"${rsum(s"(${sdiv("e1", "e2")})", s0)} AS massi_${f}_$s0")
    mk(s"massi_${f}_$s0", Seq(s"massi_${f}_$s0"), fin(b, Seq(s"massi_${f}_$s0")))(_.ta.massi(f, s0))
  }

  val qRvi = {
    val n = 14
    val b = bars
      .addSel("r1", s"${rstd("close", n)} AS sd, close - lag(close, 1) $ov AS dc")
      .addSel(
        "r2",
        "CASE WHEN dc IS NULL OR sd IS NULL THEN NULL WHEN dc > 0 THEN sd ELSE 0e0 END AS pos, " +
          "CASE WHEN dc IS NULL OR sd IS NULL THEN NULL WHEN dc < 0 THEN sd ELSE 0e0 END AS neg"
      )
      .addSel("r3", s"${rma("pos", n)} AS p, ${rma("neg", n)} AS q")
      .addSel("r4", s"100e0 * ${sdiv("p", "(p + q)")} AS rvi_$n")
    mk(s"rvi_$n", Seq(s"rvi_$n"), fin(b, Seq(s"rvi_$n")))(_.ta.rvi(n))
  }

  val qThermo = {
    val n = 20
    val b0 = bars.addSel(
      "th0",
      s"greatest(abs(high - lag(high, 1) $ov), abs(low - lag(low, 1) $ov)) AS thermo"
    )
    val b = emaSql(b0, "thermo", s"thermo_ma_$n", n)
    mk("thermo_20", Seq("thermo", s"thermo_ma_$n"), fin(b, Seq("thermo", s"thermo_ma_$n")))(
      _.ta.thermo(n)
    )
  }

  // --------------------------------------------------------- aberration / cksp / dpo
  val qAberration = {
    val (n, an) = (5, 15)
    val b = bars
      .addSel("ab0", s"$trSql AS true_range")
      .addSel("ab1", s"${rma("true_range", an)} AS xatr, ${rmean("((high + low + close) / 3e0)", n)} AS zg")
      .addSel("ab2", s"zg AS abe_zg_$n, zg + xatr AS abe_sg_$n, zg - xatr AS abe_xg_$n")
    val outs = Seq(s"abe_zg_$n", s"abe_sg_$n", s"abe_xg_$n")
    mk(s"aberration_$n", outs, fin(b, outs))(_.ta.aberration(n, an))
  }

  val qCksp = {
    val (p, x, q) = (10, 1.0, 9)
    val b = bars
      .addSel("c0", s"$trSql AS true_range")
      .addSel("c1", s"${rma("true_range", p)} AS xatr")
      .addSel("c2", s"${rmax("high", p)} - ${d(x)} * xatr AS ls0, ${rmin("low", p)} + ${d(x)} * xatr AS ss0")
      .addSel("c3", s"${rmax("ls0", q)} AS cksp_long_$p, ${rmin("ss0", q)} AS cksp_short_$p")
    val outs = Seq(s"cksp_long_$p", s"cksp_short_$p")
    mk(s"cksp_$p", outs, fin(b, outs))(_.ta.cksp(p, x, q))
  }

  val qDpo = {
    val n = 20; val t = n / 2 + 1
    val b = bars
      .addSel("p0", s"${rmean("close", n)} AS smaN")
      .addSel("p1", s"close - lead(smaN, $t) $ov AS dpo_$n")
    mk(s"dpo_$n", Seq(s"dpo_$n"), fin(b, Seq(s"dpo_$n")))(_.ta.dpo(n))
  }

  // --------------------------------------------------------- pvo / brar / adosc / pgo
  val qPvo = {
    val (f, s0, sig) = (12, 26, 9)
    val b0 = emaSql(bars, "volume", "vf", f)
    val b1 = emaSql(b0, "volume", "vs", s0)
    val b2 = b1.addSel("v2", s"100e0 * ${sdiv("(vf - vs)", "vs")} AS pvo_${f}_$s0")
    val b = emaSql(b2, s"pvo_${f}_$s0", s"pvos_${f}_$s0", sig)
      .addSel("v3", s"pvo_${f}_$s0 - pvos_${f}_$s0 AS pvoh_${f}_$s0")
    val outs = Seq(s"pvo_${f}_$s0", s"pvos_${f}_$s0", s"pvoh_${f}_$s0")
    mk("pvo", outs, fin(b, outs))(_.ta.pvo(f, s0, sig))
  }

  val qBrar = {
    val n = 26
    val b = bars
      .addSel("b0", s"lag(close, 1) $ov AS pc")
      .addSel(
        "b1",
        "CASE WHEN pc IS NULL THEN NULL ELSE greatest(0e0, high - pc) END AS hcy, " +
          "CASE WHEN pc IS NULL THEN NULL ELSE greatest(0e0, pc - low) END AS cyl"
      )
      .addSel(
        "b2",
        s"100e0 * ${sdiv(rsum("(high - open)", n), rsum("(open - low)", n))} AS ar_$n, " +
          s"100e0 * ${sdiv(rsum("hcy", n), rsum("cyl", n))} AS br_$n"
      )
    mk(s"brar_$n", Seq(s"ar_$n", s"br_$n"), fin(b, Seq(s"ar_$n", s"br_$n")))(_.ta.brar(n))
  }

  val qAdosc = {
    val (f, s0) = (3, 10)
    val clv = s"CASE WHEN high = low THEN 0e0 ELSE ((close - low) - (high - close)) / (high - low) END"
    val b0 = bars.addSel("ad0", s"sum($clv * volume) $cum AS ad")
    val b1 = emaSql(b0, "ad", "af", f)
    val b = emaSql(b1, "ad", "asl", s0)
      .addSel("ad3", s"af - asl AS adosc_${f}_$s0")
    mk(s"adosc_${f}_$s0", Seq(s"adosc_${f}_$s0"), fin(b, Seq(s"adosc_${f}_$s0")))(_.ta.adosc(f, s0))
  }

  val qPgo = {
    val n = 14
    val b0 = bars.addSel("g0", s"$trSql AS true_range")
    val b = emaSql(b0, "true_range", "etr", n)
      .addSel("g1", s"${sdiv(s"(close - ${rmean("close", n)})", "etr")} AS pgo_$n")
    mk(s"pgo_$n", Seq(s"pgo_$n"), fin(b, Seq(s"pgo_$n")))(_.ta.pgo(n))
  }

  // --------------------------------------------------------- flags & misc
  val qTtmTrend = {
    val n = 6
    val avgHl2 = rmean("((high + low) / 2e0)", n)
    val b = bars.addSel(
      "t0",
      s"CASE WHEN $avgHl2 IS NULL THEN NULL WHEN close > $avgHl2 THEN 1e0 ELSE -1e0 END AS ttm_trend_$n"
    )
    mk(s"ttm_trend_$n", Seq(s"ttm_trend_$n"), fin(b, Seq(s"ttm_trend_$n")))(_.ta.ttmTrend(n))
  }

  val qAmat = {
    val (f, s0, n) = (8, 21, 2)
    val b0 = emaSql(bars, "close", "maf", f)
    val b = emaSql(b0, "close", "mas", s0)
      .addSel(
        "am1",
        s"maf - lag(maf, $n) $ov AS df, mas - lag(mas, $n) $ov AS ds"
      )
      .addSel(
        "am2",
        s"CASE WHEN (df > 0 AND ds < 0) OR (df > 0 AND ds > 0) THEN 1e0 ELSE 0e0 END AS amat_lr_$f, " +
          s"CASE WHEN (df < 0 AND ds > 0) OR (df < 0 AND ds < 0) THEN 1e0 ELSE 0e0 END AS amat_sr_$f"
      )
    val outs = Seq(s"amat_lr_$f", s"amat_sr_$f")
    mk("amat", outs, fin(b, outs))(_.ta.amat(f, s0, n))
  }

  val qXsignals = {
    // cross of close over sma(10)
    val b = bars
      .addSel("x0", s"${rmean("close", 10)} AS m10")
      .addSel(
        "x1",
        s"CASE WHEN close > m10 AND lag(close, 1) $ov IS NOT NULL AND lag(m10, 1) $ov IS NOT NULL " +
          s"AND lag(close, 1) $ov <= lag(m10, 1) $ov THEN 1e0 ELSE 0e0 END AS xup, " +
          s"CASE WHEN close < m10 AND lag(close, 1) $ov IS NOT NULL AND lag(m10, 1) $ov IS NOT NULL " +
          s"AND lag(close, 1) $ov >= lag(m10, 1) $ov THEN 1e0 ELSE 0e0 END AS xdn"
      )
      .addSel("x2", "CASE WHEN xup = 1e0 THEN 1e0 WHEN xdn = 1e0 THEN 0e0 END AS ev")
      .addSel(
        "x3",
        s"coalesce(last_value(ev IGNORE NULLS) OVER ($W ROWS UNBOUNDED PRECEDING), 0e0) AS ts_trends"
      )
      .addSel(
        "x4",
        s"CASE WHEN ts_trends = 1e0 AND coalesce(lag(ts_trends, 1) $ov, 0e0) = 0e0 THEN 1e0 ELSE 0e0 END AS ts_entries, " +
          s"CASE WHEN ts_trends = 0e0 AND coalesce(lag(ts_trends, 1) $ov, 0e0) = 1e0 THEN 1e0 ELSE 0e0 END AS ts_exits"
      )
    val outs = Seq("ts_trends", "ts_entries", "ts_exits")
    mk("xsignals", outs, fin(b, outs)) { df0 =>
      val d1 = df0.ta.sma(10)
      d1.ta.xsignals("close", "sma_10")
    }
  }

  val qCdlDoji = {
    val n = 10; val fac = 0.1
    val b = bars.addSel(
      "cd0",
      s"CASE WHEN ${rmean("(high - low)", n)} IS NULL THEN NULL " +
        s"WHEN abs(close - open) < ${d(fac)} * ${rmean("(high - low)", n)} THEN 1e0 ELSE 0e0 END AS cdl_doji_$n"
    )
    mk(s"cdl_doji_$n", Seq(s"cdl_doji_$n"), fin(b, Seq(s"cdl_doji_$n")))(_.ta.cdlDoji(n, fac))
  }

  val qKdj = {
    val (n, sig) = (9, 3)
    val alpha = 1.0 / sig
    val b = bars
      .addSel("kj0", s"${rmin("low", n)} AS ll, ${rmax("high", n)} AS hh")
      .addSel("kj1", s"100e0 * ${sdiv("(close - ll)", "(hh - ll)")} AS rsv")
      .addSel("kj2", s"${ewm("rsv", alpha)} AS kdj_k_$n")
      .addSel("kj3", s"${ewm(s"kdj_k_$n", alpha)} AS kdj_d_$n")
      .addSel("kj4", s"3e0 * kdj_k_$n - 2e0 * kdj_d_$n AS kdj_j_$n")
    val outs = Seq(s"kdj_k_$n", s"kdj_d_$n", s"kdj_j_$n")
    mk(s"kdj_$n", outs, fin(b, outs))(_.ta.kdj(n, sig))
  }

  val qTos = {
    val fullW = s"OVER (PARTITION BY series_id ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"
    val b = bars
      .addSel("s0", s"CAST(row_number() OVER ($W) AS DOUBLE) - 1e0 AS i")
      .addSel(
        "s1",
        s"CAST(count(close) $fullW AS DOUBLE) AS nn, sum(i) $fullW AS si, sum(i * i) $fullW AS sii, " +
          s"sum(close) $fullW AS sy, sum(i * close) $fullW AS siy, stddev_samp(close) $fullW AS sd"
      )
      .addSel("s2", s"${sdiv("(nn * siy - si * sy)", "(nn * sii - si * si)")} AS slope")
      .addSel("s3", "(sy - slope * si) / nn AS a")
      .addSel("s4", "a + slope * i AS tos_line")
      .addSel("s5", "tos_line + 2e0 * sd AS tos_u_2, tos_line - 2e0 * sd AS tos_l_2")
    val outs = Seq("tos_line", "tos_u_2", "tos_l_2")
    mk("tos_stdevall", outs, fin(b, outs))(_.ta.tosStdevall(Seq(2)))
  }

  val all: Seq[Q] = Seq(
    qT3, qZlma, qDm, qAdx, qKc, qMassi, qRvi, qThermo, qAberration, qCksp,
    qDpo, qPvo, qBrar, qAdosc, qPgo, qTtmTrend, qAmat, qXsignals, qCdlDoji,
    qKdj, qTos
  )
}
