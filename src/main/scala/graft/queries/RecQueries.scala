package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Graft
import graft.ta.{prim => P}
import graft.ta.Ta._
import sqlgen._

/** REC-class (state machine) indicators with DuckDB oracles expressed as
  * WITH RECURSIVE per-series folds over row_number — the oracle steps
  * through the exact same recurrence, so hashes match bit-for-bit at 6 dp.
  *
  * OHLCV state machines run on the daily bars (30 rows/sf); adaptive MAs
  * (kama/vidya) run on the 15-key user series so the LinRecur window
  * function is exercised across many partitions.
  */
object RecQueries {

  private def mkBars(name: String, outs: Seq[String], sql: String)(
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

  private def mkSeries(name: String, outs: Seq[String], sql: String)(
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

  /** Recursive scaffold over the bars CTE: `init` = SELECT list for rn=1
    * (state + outputs), `step` = SELECT list of the same columns computed
    * from z (the joined b·r subquery aliases: b columns plain, prev-state
    * as r.<col>). `extraB` appends window-computed columns to the base. */
  private def recSql(
      cols: Seq[String],
      init: String,
      step: String,
      fin: String,
      extraB: String = "",
      base: String = "bars",
      baseCte: String = barsCte
  ): String =
    s"WITH RECURSIVE $base AS ($baseCte), " +
      s"b AS (SELECT *$extraB, row_number() OVER ($W) AS rn FROM $base), " +
      s"r AS (SELECT series_id, ts, rn, $init FROM b WHERE rn = 1 " +
      s"UNION ALL SELECT z.series_id, z.ts, z.rn, ${cols.map("z." + _).mkString(", ")} FROM " +
      s"(SELECT b.series_id, b.ts, b.rn, $step " +
      "FROM b JOIN r ON b.series_id = r.series_id AND b.rn = r.rn + 1) z) " +
      s"$fin"

  // ------------------------------------------------------------- ha
  val qHa = {
    val cols = Seq("high", "low", "ha_open", "ha_close")
    mkBars(
      "ha",
      Seq("ha_open", "ha_high", "ha_low", "ha_close"),
      recSql(
        cols,
        init = "high, low, (open + close) / 2e0 AS ha_open, (open + high + low + close) / 4e0 AS ha_close",
        step = "b.high, b.low, (r.ha_open + r.ha_close) / 2e0 AS ha_open, " +
          "(b.open + b.high + b.low + b.close) / 4e0 AS ha_close",
        fin = "SELECT series_id, ts, round(ha_open, 6) AS ha_open, " +
          "round(greatest(high, ha_open, ha_close), 6) AS ha_high, " +
          "round(least(low, ha_open, ha_close), 6) AS ha_low, " +
          "round(ha_close, 6) AS ha_close FROM r" + orderTail
      )
    )(_.ta.ha)
  }

  // ------------------------------------------------------------- mcgd
  val qMcgd = {
    val n = 10
    mkBars(
      s"mcgd_$n",
      Seq(s"mcgd_$n"),
      recSql(
        Seq("y"),
        init = "close AS y",
        step = s"CASE WHEN r.y = 0e0 THEN r.y ELSE r.y + (b.close - r.y) / ($n * pow(b.close / r.y, 4e0)) END AS y",
        fin = s"SELECT series_id, ts, round(y, 6) AS mcgd_$n FROM r" + orderTail
      )
    )(_.ta.mcgd(n))
  }

  // ------------------------------------------------------------- ssf
  val qSsf = {
    val n = 10
    val a = math.exp(-math.sqrt(2.0) * math.Pi / n)
    val b0 = 2.0 * a * math.cos(math.sqrt(2.0) * math.Pi / n)
    val c2 = b0; val c3 = -a * a; val c1 = 1.0 - c2 - c3
    mkBars(
      s"ssf_$n",
      Seq(s"ssf_$n"),
      recSql(
        Seq("y1", "y2"),
        init = "close AS y1, close AS y2",
        step = s"CASE WHEN b.rn <= 2 THEN b.close ELSE (${d(c1)}) * b.close + (${d(c2)}) * r.y1 + (${d(c3)}) * r.y2 END AS y1, " +
          "r.y1 AS y2",
        fin = s"SELECT series_id, ts, round(y1, 6) AS ssf_$n FROM r" + orderTail
      )
    )(_.ta.ssf(n))
  }

  // ------------------------------------------------------------- hwma
  val qHwma = {
    val (na, nb, nc) = (0.2, 0.1, 0.1)
    val fN = s"((${d(1 - na)}) * (r.f + r.v + 0.5e0 * r.a) + (${d(na)}) * b.close)"
    val vN = s"((${d(1 - nb)}) * (r.v + r.a) + (${d(nb)}) * ($fN - r.f))"
    val aN = s"((${d(1 - nc)}) * r.a + (${d(nc)}) * ($vN - r.v))"
    mkBars(
      "hwma",
      Seq("hwma"),
      recSql(
        Seq("f", "v", "a"),
        init = "close AS f, 0e0 AS v, 0e0 AS a",
        step = s"$fN AS f, $vN AS v, $aN AS a",
        fin = "SELECT series_id, ts, round(f + v + 0.5e0 * a, 6) AS hwma FROM r" + orderTail
      )
    )(_.ta.hwma())
  }

  // ------------------------------------------------------------- fisher
  val qFisher = {
    val n = 9
    // __pos staged in b via gated rolling max/min of hl2
    val m = "((high + low) / 2e0)"
    val hh = s"CASE WHEN count($m) ${fr(n)} >= $n THEN max($m) ${fr(n)} END"
    val ll = s"CASE WHEN count($m) ${fr(n)} >= $n THEN min($m) ${fr(n)} END"
    val pos = s"2e0 * (($m - $ll) / nullif($hh - $ll, 0) - 0.5e0)"
    val nvRaw = "0.66e0 * b.pos + 0.67e0 * r.v"
    val nv = s"least(greatest($nvRaw, -0.999e0), 0.999e0)"
    mkBars(
      s"fisher_$n",
      Seq(s"fisher_$n", s"fisher_signal_$n"),
      recSql(
        Seq("v", "fish", "started", "out_f", "out_s"),
        init = "CASE WHEN pos IS NULL THEN 0e0 ELSE least(greatest(0.66e0 * pos, -0.999e0), 0.999e0) END AS v, " +
          "CASE WHEN pos IS NULL THEN 0e0 ELSE 0.5e0 * ln((1e0 + least(greatest(0.66e0 * pos, -0.999e0), 0.999e0)) / (1e0 - least(greatest(0.66e0 * pos, -0.999e0), 0.999e0))) END AS fish, " +
          "pos IS NOT NULL AS started, " +
          "CASE WHEN pos IS NULL THEN NULL ELSE 0.5e0 * ln((1e0 + least(greatest(0.66e0 * pos, -0.999e0), 0.999e0)) / (1e0 - least(greatest(0.66e0 * pos, -0.999e0), 0.999e0))) END AS out_f, " +
          "CAST(NULL AS DOUBLE) AS out_s",
        step = s"CASE WHEN b.pos IS NULL THEN r.v ELSE $nv END AS v, " +
          s"CASE WHEN b.pos IS NULL THEN r.fish ELSE 0.5e0 * ln((1e0 + $nv) / (1e0 - $nv)) + 0.5e0 * r.fish END AS fish, " +
          "r.started OR b.pos IS NOT NULL AS started, " +
          s"CASE WHEN b.pos IS NULL THEN NULL ELSE 0.5e0 * ln((1e0 + $nv) / (1e0 - $nv)) + 0.5e0 * r.fish END AS out_f, " +
          "CASE WHEN b.pos IS NULL THEN NULL WHEN r.started THEN r.fish END AS out_s",
        fin = s"SELECT series_id, ts, round(out_f, 6) AS fisher_$n, round(out_s, 6) AS fisher_signal_$n FROM r" + orderTail,
        extraB = s", $pos AS pos"
      )
    )(_.ta.fisher(n))
  }

  // ------------------------------------------------------------- hilo
  val qHilo = {
    val (hn, ln) = (13, 21)
    val mh = s"CASE WHEN count(high) ${fr(hn)} >= $hn THEN avg(high) ${fr(hn)} END"
    val ml = s"CASE WHEN count(low) ${fr(ln)} >= $ln THEN avg(low) ${fr(ln)} END"
    mkBars(
      "hilo",
      Seq("hilo", "hilo_long", "hilo_short"),
      recSql(
        Seq("trend", "pmh", "pml", "out_h", "out_l", "out_s"),
        init = "0 AS trend, mh AS pmh, ml AS pml, " +
          "CAST(NULL AS DOUBLE) AS out_h, CAST(NULL AS DOUBLE) AS out_l, CAST(NULL AS DOUBLE) AS out_s",
        step = "CASE WHEN r.pmh IS NULL OR r.pml IS NULL THEN r.trend " +
          "WHEN b.close > r.pmh THEN 1 WHEN b.close < r.pml THEN -1 ELSE r.trend END AS trend, " +
          "b.mh AS pmh, b.ml AS pml, " +
          "CASE WHEN r.pmh IS NULL OR r.pml IS NULL THEN NULL " +
          "WHEN (CASE WHEN b.close > r.pmh THEN 1 WHEN b.close < r.pml THEN -1 ELSE r.trend END) = 1 THEN b.ml " +
          "WHEN (CASE WHEN b.close > r.pmh THEN 1 WHEN b.close < r.pml THEN -1 ELSE r.trend END) = -1 THEN b.mh END AS out_h, " +
          "CASE WHEN r.pmh IS NULL OR r.pml IS NULL THEN NULL " +
          "WHEN (CASE WHEN b.close > r.pmh THEN 1 WHEN b.close < r.pml THEN -1 ELSE r.trend END) = 1 THEN b.ml END AS out_l, " +
          "CASE WHEN r.pmh IS NULL OR r.pml IS NULL THEN NULL " +
          "WHEN (CASE WHEN b.close > r.pmh THEN 1 WHEN b.close < r.pml THEN -1 ELSE r.trend END) = -1 THEN b.mh END AS out_s",
        fin = "SELECT series_id, ts, round(out_h, 6) AS hilo, round(out_l, 6) AS hilo_long, " +
          "round(out_s, 6) AS hilo_short FROM r" + orderTail,
        extraB = s", $mh AS mh, $ml AS ml"
      )
    )(_.ta.hilo(hn, ln))
  }

  // ------------------------------------------------------------- psar
  val qPsar = {
    val (af0, st, mx) = (0.02, 0.02, 0.2)
    // rn=2 init vs rn>=3 update, then the shared reversal stage.
    val rising2 = s"CASE WHEN z0.rn = 2 THEN z0.close >= r.c0 ELSE r.rising END"
    val sarA = s"CASE WHEN z0.rn = 2 THEN (CASE WHEN z0.close >= r.c0 THEN r.l0 ELSE r.h0 END) " +
      s"WHEN r.rising THEN least(r.sar + r.af * (r.ep - r.sar), least(r.pl1, r.pl2)) " +
      s"ELSE greatest(r.sar + r.af * (r.ep - r.sar), greatest(r.ph1, r.ph2)) END"
    val epA = s"CASE WHEN z0.rn = 2 THEN (CASE WHEN z0.close >= r.c0 THEN greatest(r.h0, z0.high) ELSE least(r.l0, z0.low) END) " +
      s"WHEN r.rising THEN (CASE WHEN z0.high > r.ep THEN z0.high ELSE r.ep END) " +
      s"ELSE (CASE WHEN z0.low < r.ep THEN z0.low ELSE r.ep END) END"
    val afA = s"CASE WHEN z0.rn = 2 THEN ${d(af0)} " +
      s"WHEN r.rising THEN (CASE WHEN z0.high > r.ep THEN least(r.af + ${d(st)}, ${d(mx)}) ELSE r.af END) " +
      s"ELSE (CASE WHEN z0.low < r.ep THEN least(r.af + ${d(st)}, ${d(mx)}) ELSE r.af END) END"
    val rev = s"CASE WHEN z1.rising2 THEN z1.low < z1.sar_a ELSE z1.high > z1.sar_a END"
    mkBars(
      "psar",
      Seq("psar_long", "psar_short", "psar_af"),
      "WITH RECURSIVE bars AS (" + barsCte + "), " +
        s"b AS (SELECT *, row_number() OVER ($W) AS rn FROM bars), " +
        "r AS (SELECT series_id, ts, rn, high AS ph1, high AS ph2, low AS pl1, low AS pl2, " +
        "high AS h0, low AS l0, close AS c0, TRUE AS rising, 0e0 AS sar, 0e0 AS ep, 0e0 AS af, " +
        "CAST(NULL AS DOUBLE) AS out_l, CAST(NULL AS DOUBLE) AS out_s, CAST(NULL AS DOUBLE) AS out_af " +
        "FROM b WHERE rn = 1 " +
        "UNION ALL " +
        "SELECT z2.series_id, z2.ts, z2.rn, z2.ph1, z2.ph2, z2.pl1, z2.pl2, z2.h0, z2.l0, z2.c0, " +
        "z2.rising, z2.sar, z2.ep, z2.af, z2.out_l, z2.out_s, z2.out_af FROM (" +
        "SELECT z1.series_id, z1.ts, z1.rn, z1.high AS ph1, z1.ph1_old AS ph2, z1.low AS pl1, z1.pl1_old AS pl2, " +
        "z1.h0, z1.l0, z1.c0, " +
        s"CASE WHEN $rev THEN NOT z1.rising2 ELSE z1.rising2 END AS rising, " +
        s"CASE WHEN $rev THEN z1.ep_a ELSE z1.sar_a END AS sar, " +
        s"CASE WHEN $rev THEN (CASE WHEN z1.rising2 THEN z1.low ELSE z1.high END) ELSE z1.ep_a END AS ep, " +
        s"CASE WHEN $rev THEN ${d(af0)} ELSE z1.af_a END AS af, " +
        s"CASE WHEN (CASE WHEN $rev THEN NOT z1.rising2 ELSE z1.rising2 END) " +
        s"THEN (CASE WHEN $rev THEN z1.ep_a ELSE z1.sar_a END) END AS out_l, " +
        s"CASE WHEN NOT (CASE WHEN $rev THEN NOT z1.rising2 ELSE z1.rising2 END) " +
        s"THEN (CASE WHEN $rev THEN z1.ep_a ELSE z1.sar_a END) END AS out_s, " +
        s"CASE WHEN $rev THEN ${d(af0)} ELSE z1.af_a END AS out_af " +
        "FROM (" +
        "SELECT z0.series_id, z0.ts, z0.rn, z0.high, z0.low, r.ph1 AS ph1_old, r.pl1 AS pl1_old, " +
        "r.h0, r.l0, r.c0, " +
        s"$rising2 AS rising2, $sarA AS sar_a, $epA AS ep_a, $afA AS af_a " +
        "FROM b z0 JOIN r ON z0.series_id = r.series_id AND z0.rn = r.rn + 1" +
        ") z1) z2) " +
        "SELECT series_id, ts, round(out_l, 6) AS psar_long, round(out_s, 6) AS psar_short, " +
        "round(out_af, 6) AS psar_af FROM r" + orderTail
    )(_.ta.psar().drop("psar_reversal"))
  }

  // ------------------------------------------------------------- supertrend
  val qSupertrend = {
    val (n, m) = (7, 3.0)
    val tr = "greatest(z0.high - z0.low, abs(z0.high - r.pc), abs(z0.low - r.pc))"
    val atrN = s"CASE WHEN z0.rn = 2 THEN $tr ELSE (${d(1.0 - 1.0 / n)}) * r.atr + $tr / $n END"
    val hl2 = "((z1.high + z1.low) / 2e0)"
    val nub0 = s"($hl2 + ${d(m)} * z1.atr_n)"
    val nlb0 = s"($hl2 - ${d(m)} * z1.atr_n)"
    mkBars(
      s"supertrend_$n",
      Seq(s"supert_$n", s"supertl_$n", s"superts_$n"),
      "WITH RECURSIVE bars AS (" + barsCte + "), " +
        s"b AS (SELECT *, row_number() OVER ($W) AS rn FROM bars), " +
        "r AS (SELECT series_id, ts, rn, close AS pc, 0e0 AS atr, 0e0 AS ub, 0e0 AS lb, 1 AS dir, " +
        "CAST(NULL AS DOUBLE) AS out_st, CAST(NULL AS DOUBLE) AS out_l, CAST(NULL AS DOUBLE) AS out_s " +
        "FROM b WHERE rn = 1 " +
        "UNION ALL " +
        "SELECT z2.series_id, z2.ts, z2.rn, z2.pc, z2.atr, z2.ub, z2.lb, z2.dir, z2.out_st, z2.out_l, z2.out_s FROM (" +
        "SELECT z1.series_id, z1.ts, z1.rn, z1.high, z1.low, z1.close AS pc, z1.atr_n AS atr, " +
        // bands defined from rn = n+1
        s"CASE WHEN z1.rn < ${n + 1} THEN 0e0 WHEN z1.rn = ${n + 1} THEN $nub0 " +
        s"WHEN $nub0 > z1.ub AND z1.pc_old < z1.ub THEN z1.ub ELSE $nub0 END AS ub, " +
        s"CASE WHEN z1.rn < ${n + 1} THEN 0e0 WHEN z1.rn = ${n + 1} THEN $nlb0 " +
        s"WHEN $nlb0 < z1.lb AND z1.pc_old > z1.lb THEN z1.lb ELSE $nlb0 END AS lb, " +
        s"CASE WHEN z1.rn <= ${n + 1} THEN 1 WHEN z1.close > z1.ub THEN 1 WHEN z1.close < z1.lb THEN -1 ELSE z1.dir END AS dir, " +
        "CAST(NULL AS DOUBLE) AS out_st, CAST(NULL AS DOUBLE) AS out_l, CAST(NULL AS DOUBLE) AS out_s " +
        "FROM (" +
        s"SELECT z0.series_id, z0.ts, z0.rn, z0.high, z0.low, z0.close, r.pc AS pc_old, r.ub, r.lb, r.dir, $atrN AS atr_n " +
        "FROM b z0 JOIN r ON z0.series_id = r.series_id AND z0.rn = r.rn + 1" +
        ") z1) z2) " +
        s"SELECT series_id, ts, " +
        s"round(CASE WHEN rn >= ${n + 1} THEN (CASE WHEN dir = 1 THEN lb ELSE ub END) END, 6) AS supert_$n, " +
        s"round(CASE WHEN rn >= ${n + 1} AND dir = 1 THEN lb END, 6) AS supertl_$n, " +
        s"round(CASE WHEN rn >= ${n + 1} AND dir = -1 THEN ub END, 6) AS superts_$n " +
        "FROM r" + orderTail
    )(_.ta.supertrend(n, m).drop(s"supertd_$n"))
  }

  // ------------------------------------------------------------- kama / vidya
  private def linrecSeriesSql(stage1: String, scExpr: String, out: String): String =
    s"WITH RECURSIVE s AS ($seriesCte), " +
      s"s1 AS (SELECT *, $stage1 FROM s), " +
      s"b AS (SELECT *, $scExpr AS sc, row_number() OVER ($W) AS rn FROM s1), " +
      "r AS (SELECT series_id, ts, rn, CASE WHEN sc IS NOT NULL THEN close END AS y FROM b WHERE rn = 1 " +
      "UNION ALL SELECT b.series_id, b.ts, b.rn, " +
      "CASE WHEN b.sc IS NULL THEN r.y WHEN r.y IS NULL THEN b.close " +
      "ELSE (1e0 - b.sc) * r.y + b.sc * b.close END AS y " +
      "FROM b JOIN r ON b.series_id = r.series_id AND b.rn = r.rn + 1) " +
      s"SELECT series_id, ts, round(y, 6) AS $out FROM r" + orderTail

  val qKama = {
    val (n, f, s0) = (10, 2, 30)
    val fsc = 2.0 / (f + 1); val ssc = 2.0 / (s0 + 1)
    val stage1 = s"abs(close - lag(close, 1) $ov) AS dabs, lag(close, $n) $ov AS lagn"
    val sumd = s"CASE WHEN count(dabs) ${fr(n)} >= $n THEN sum(dabs) ${fr(n)} END"
    val er = s"(abs(close - lagn) / nullif($sumd, 0))"
    val sc = s"pow($er * (${d(fsc - ssc)}) + (${d(ssc)}), 2e0)"
    mkSeries(s"kama_$n", Seq(s"kama_$n"), linrecSeriesSql(stage1, sc, s"kama_$n"))(_.ta.kama(n, f, s0))
  }

  val qVidya = {
    val n = 10
    val stage1 = s"(close - lag(close, 1) $ov) AS d1"
    val up = "CASE WHEN d1 > 0 THEN d1 ELSE 0e0 END"
    val dn = "CASE WHEN d1 < 0 THEN -d1 ELSE 0e0 END"
    val su = s"CASE WHEN count($up) ${fr(n)} >= $n THEN sum($up) ${fr(n)} END"
    val sd = s"CASE WHEN count($dn) ${fr(n)} >= $n THEN sum($dn) ${fr(n)} END"
    val cmoAbs = s"(abs($su - $sd) / nullif($su + $sd, 0))"
    val alpha = s"($cmoAbs * ${d(2.0 / (n + 1))})"
    mkSeries(s"vidya_$n", Seq(s"vidya_$n"), linrecSeriesSql(stage1, alpha, s"vidya_$n"))(_.ta.vidya(n))
  }

  // ------------------------------------------------------------- decay / nvi / pvi
  val qDecay = {
    val n = 5
    mkSeries(
      s"decay_$n",
      Seq(s"decay_$n"),
      s"WITH s AS ($seriesCte), b AS (SELECT *, CAST(row_number() OVER ($W) AS DOUBLE) AS rn FROM s) " +
        s"SELECT series_id, ts, round(greatest(max(close + rn / $n) OVER ($W ROWS UNBOUNDED PRECEDING) - rn / $n, 0e0), 6) AS decay_$n " +
        s"FROM b$orderTail"
    )(_.ta.decay(n))
  }

  private def nviPviSql(cmp: String, out: String): String =
    s"WITH bars AS ($barsCte), b AS (SELECT *, close / nullif(lag(close, 1) $ov, 0) - 1e0 AS ret, " +
      s"volume - lag(volume, 1) $ov AS dv FROM bars) " +
      s"SELECT series_id, ts, round(1000e0 * exp(sum(CASE WHEN dv $cmp 0 AND ret IS NOT NULL THEN ln(1e0 + ret) ELSE 0e0 END) " +
      s"OVER ($W ROWS UNBOUNDED PRECEDING)), 6) AS $out FROM b$orderTail"

  val qNvi = mkBars("nvi", Seq("nvi"), nviPviSql("<", "nvi"))(_.ta.nvi())
  val qPvi = mkBars("pvi", Seq("pvi"), nviPviSql(">", "pvi"))(_.ta.pvi())

  // ------------------------------------- multi-key kernel variants
  /** The same psar/supertrend state machines over the PER-USER bars
    * (15 series × 30 rows): exercises kernel key-boundary resets and the
    * oracle's per-series recursion under real partitioning. SQL = the
    * single-series oracle with the bars CTE swapped. */
  private def mkUserBars(name: String, outs: Seq[String], sql: Option[String])(
      build: DataFrame => DataFrame
  ): Q =
    Q(
      name,
      (spark: SparkSession, dir: String) => {
        Graft.init(spark)
        build(Graft.userBars(spark, dir))
          .select(col("series_id") +: col("ts") +: outs.map(o => P.normd(col(o)).as(o)): _*)
          .orderBy("series_id", "ts")
      },
      sql
    )

  val qPsarMulti = mkUserBars(
    "psar_multi",
    Seq("psar_long", "psar_short", "psar_af"),
    qPsar.sql.map(_.replace(barsCte, userBarsCte))
  )(_.ta.psar().drop("psar_reversal"))

  val qSupertrendMulti = mkUserBars(
    "supertrend_multi",
    Seq("supert_7", "supertl_7", "superts_7"),
    qSupertrend.sql.map(_.replace(barsCte, userBarsCte))
  )(_.ta.supertrend(7, 3.0).drop("supertd_7"))

  val all: Seq[Q] = Seq(
    qHa, qMcgd, qSsf, qHwma, qFisher, qHilo, qPsar, qSupertrend,
    qKama, qVidya, qDecay, qNvi, qPvi, qPsarMulti, qSupertrendMulti
  )
}
