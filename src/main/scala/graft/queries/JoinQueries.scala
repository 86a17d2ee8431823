package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Graft
import graft.operators.AsofJoin
import graft.ta.{prim => P}
import graft.ta.Ta._
import sqlgen._
import SeriesQueries.Cte

/** As-of join + native candle patterns. The as-of oracle uses DuckDB's
  * built-in ASOF JOIN (inclusive ≤ match) — semantics our union+last-value
  * window implementation reproduces exactly.
  */
object JoinQueries {

  /** Each event enriched with the most recent completed per-user daily
    * aggregate (day's last event ts + mean value). */
  val qAsof = Q(
    "asof_daily",
    (s: SparkSession, dir: String) => {
      val ev = Graft.userSeries(s, dir) // series_id, ts (micros), close
      val daily = ev
        .groupBy(col("series_id"), expr("CAST(to_date(timestamp_micros(ts)) AS DATE)").as("day"))
        .agg(max("ts").as("ts"), avg("close").as("day_avg"))
        .drop("day")
      AsofJoin
        .asof(ev, daily, "series_id", "ts", Seq("day_avg"), prefix = "asof_")
        .select(col("series_id"), col("ts"), P.normd(col("asof_day_avg")).as("asof_day_avg"))
        .orderBy("series_id", "ts")
    },
    Some(
      s"WITH s AS ($seriesCte), " +
        "d AS (SELECT series_id, CAST(date_trunc('day', to_timestamp(ts // 1000000)) AS DATE) AS day, " +
        "max(ts) AS ts, avg(close) AS day_avg FROM s GROUP BY 1, 2) " +
        "SELECT s.series_id, s.ts, round(d.day_avg, 6) AS asof_day_avg " +
        "FROM s ASOF LEFT JOIN d ON s.series_id = d.series_id AND s.ts >= d.ts " +
        "ORDER BY s.series_id, s.ts"
    )
  )

  /** merge_asof directions + tolerance (pandas merge_asof API surface):
    * backward with a 6-hour tolerance, forward, and nearest (ties →
    * backward), all against the per-user daily aggregate. Oracle = DuckDB
    * ASOF joins in both directions + the same CASE arithmetic. */
  val qAsofVariants = Q(
    "asof_variants",
    (s: SparkSession, dir: String) => {
      val ev = Graft.userSeries(s, dir)
      val daily = ev
        .groupBy(col("series_id"), expr("CAST(to_date(timestamp_micros(ts)) AS DATE)").as("day"))
        .agg(max("ts").as("ts"), avg("close").as("day_avg"))
        .drop("day")
      val tol = 21600000000L // 6h in micros
      val b = AsofJoin.asof(ev, daily, "series_id", "ts", Seq("day_avg"), "tol_", "backward", tol)
      val f = AsofJoin.asof(b, daily, "series_id", "ts", Seq("day_avg"), "fwd_", "forward")
      val n = AsofJoin.asof(f, daily, "series_id", "ts", Seq("day_avg"), "near_", "nearest")
      n.select(
        col("series_id"),
        col("ts"),
        P.normd(col("tol_day_avg")).as("asof_tol"),
        P.normd(col("fwd_day_avg")).as("asof_fwd"),
        P.normd(col("near_day_avg")).as("asof_near")
      ).orderBy("series_id", "ts")
    },
    Some(
      s"WITH s AS ($seriesCte), " +
        "d AS (SELECT series_id, max(ts) AS ts, avg(close) AS day_avg FROM " +
        "(SELECT *, CAST(date_trunc('day', to_timestamp(ts // 1000000)) AS DATE) AS day FROM s) " +
        "GROUP BY series_id, day), " +
        "b AS (SELECT s.series_id, s.ts, d.ts AS bts, d.day_avg AS bavg " +
        "FROM s ASOF LEFT JOIN d ON s.series_id = d.series_id AND s.ts >= d.ts), " +
        "f AS (SELECT s.series_id, s.ts, d.ts AS fts, d.day_avg AS favg " +
        "FROM s ASOF LEFT JOIN d ON s.series_id = d.series_id AND s.ts <= d.ts), " +
        "j AS (SELECT b.series_id, b.ts, b.bts, b.bavg, f.fts, f.favg FROM b JOIN f USING (series_id, ts)) " +
        "SELECT series_id, ts, " +
        "round(CASE WHEN ts - bts <= 21600000000 THEN bavg END, 6) AS asof_tol, " +
        "round(favg, 6) AS asof_fwd, " +
        "round(CASE WHEN bavg IS NULL THEN favg WHEN favg IS NULL THEN bavg " +
        "WHEN ts - bts <= fts - ts THEN bavg ELSE favg END, 6) AS asof_near " +
        "FROM j ORDER BY series_id, ts"
    )
  )

  /** Range join (binned equi-join, operators/RangeJoin.scala): per event,
    * count and mean of the same user's events in the strictly-preceding
    * 5 minutes. A raw inequality join would plan BroadcastNestedLoop;
    * the bin discretization keeps it a hash join on (key, bin). Inner
    * semantics: events with no prior-5-minute neighbor are absent on
    * both sides. */
  val qRangeJoin = Q(
    "range_join_5m",
    (s: SparkSession, dir: String) => {
      val ev = Graft.userSeries(s, dir)
      graft.operators.RangeJoin
        .within(ev, ev, "series_id", "ts", lower = 300000000L, upper = -1L)
        .groupBy("series_id", "ts")
        .agg(count(lit(1)).as("n_prev_5m"), P.normd(avg("r_close")).as("avg_prev_5m"))
        .orderBy("series_id", "ts")
    },
    Some(
      s"WITH s AS ($seriesCte) " +
        "SELECT l.series_id, l.ts, count(*) AS n_prev_5m, round(avg(r.close), 6) AS avg_prev_5m " +
        "FROM s l JOIN s r ON l.series_id = r.series_id " +
        "AND r.ts >= l.ts - 300000000 AND r.ts < l.ts " +
        "GROUP BY 1, 2 ORDER BY 1, 2"
    )
  )

  /** Native candle-pattern flags over the daily bars. */
  val qCdlPatterns = {
    val bars = new Cte("bars", barsCte)
    val outs = Seq(
      "cdl_engulfing_bull", "cdl_engulfing_bear", "cdl_hammer", "cdl_shooting_star",
      "cdl_harami_bull", "cdl_harami_bear", "cdl_marubozu", "cdl_spinning_top"
    )
    val b = bars
      .addSel(
        "c0",
        s"abs(close - open) AS body, high - low AS rng, lag(open, 1) $ov AS po, lag(close, 1) $ov AS pc, " +
          "high - greatest(open, close) AS ush, least(open, close) - low AS dsh"
      )
      .addSel(
        "c1",
        "CASE WHEN pc IS NULL THEN NULL WHEN close > open AND pc < po AND open <= pc AND close >= po THEN 1e0 ELSE 0e0 END AS cdl_engulfing_bull, " +
          "CASE WHEN pc IS NULL THEN NULL WHEN close < open AND pc > po AND open >= pc AND close <= po THEN 1e0 ELSE 0e0 END AS cdl_engulfing_bear, " +
          "CASE WHEN dsh >= 2e0 * body AND ush <= body AND body > 0 THEN 1e0 ELSE 0e0 END AS cdl_hammer, " +
          "CASE WHEN ush >= 2e0 * body AND dsh <= body AND body > 0 THEN 1e0 ELSE 0e0 END AS cdl_shooting_star, " +
          "CASE WHEN pc IS NULL THEN NULL WHEN close > open AND pc < po AND open >= pc AND close <= po THEN 1e0 ELSE 0e0 END AS cdl_harami_bull, " +
          "CASE WHEN pc IS NULL THEN NULL WHEN close < open AND pc > po AND open <= pc AND close >= po THEN 1e0 ELSE 0e0 END AS cdl_harami_bear, " +
          "CASE WHEN rng > 0 AND body >= 0.95e0 * rng THEN 1e0 ELSE 0e0 END AS cdl_marubozu, " +
          "CASE WHEN rng > 0 AND body <= 0.3e0 * rng AND ush > body AND dsh > body THEN 1e0 ELSE 0e0 END AS cdl_spinning_top"
      )
    Q(
      "cdl_patterns",
      (s: SparkSession, dir: String) => {
        Graft.init(s)
        Graft
          .bars(s, dir)
          .ta.cdlPatterns
          .select(col("series_id") +: col("ts") +: outs.map(o => P.normd(col(o)).as(o)): _*)
          .orderBy("series_id", "ts")
      },
      Some(
        b.result(
          s"SELECT series_id, ts, ${outs.map(o => s"${normd(o)} AS $o").mkString(", ")} FROM ${b.top}$orderTail"
        )
      )
    )
  }

  /** Second-wave candle patterns over the PER-USER bars (multi-key, 15
    * series — exercises the per-key lag semantics the single-series bars
    * cannot). Oracle mirrors Ta.cdlPatterns2 term-for-term. */
  val qCdlPatterns2 = {
    val bars = new Cte("bars", userBarsCte)
    val outs = Seq(
      "cdl_piercing", "cdl_dark_cloud", "cdl_morning_star", "cdl_evening_star",
      "cdl_3_white_soldiers", "cdl_3_black_crows", "cdl_hanging_man",
      "cdl_inverted_hammer", "cdl_dragonfly_doji", "cdl_gravestone_doji",
      "cdl_long_legged_doji"
    )
    val b = bars
      .addSel(
        "c0",
        s"abs(close - open) AS body, high - low AS rng, " +
          s"lag(open, 1) $ov AS po, lag(close, 1) $ov AS pc, " +
          s"lag(open, 2) $ov AS po2, lag(close, 2) $ov AS pc2, " +
          "high - greatest(open, close) AS ush, least(open, close) - low AS dsh"
      )
      .addSel(
        "c1",
        "abs(pc - po) AS pbody, abs(pc2 - po2) AS p2body, " +
          "close > open AS bull, close < open AS bear, " +
          "pc > po AS pbull, pc < po AS pbear, pc2 > po2 AS p2bull, pc2 < po2 AS p2bear"
      )
      .addSel(
        "c2",
        "CASE WHEN pc IS NULL THEN NULL WHEN pbear AND bull AND open <= pc AND close > (po + pc) / 2e0 AND close < po THEN 1e0 ELSE 0e0 END AS cdl_piercing, " +
          "CASE WHEN pc IS NULL THEN NULL WHEN pbull AND bear AND open >= pc AND close < (po + pc) / 2e0 AND close > po THEN 1e0 ELSE 0e0 END AS cdl_dark_cloud, " +
          "CASE WHEN pc2 IS NULL THEN NULL WHEN p2bear AND pbody <= 0.3e0 * p2body AND bull AND close > (po2 + pc2) / 2e0 THEN 1e0 ELSE 0e0 END AS cdl_morning_star, " +
          "CASE WHEN pc2 IS NULL THEN NULL WHEN p2bull AND pbody <= 0.3e0 * p2body AND bear AND close < (po2 + pc2) / 2e0 THEN 1e0 ELSE 0e0 END AS cdl_evening_star, " +
          "CASE WHEN pc2 IS NULL THEN NULL WHEN bull AND pbull AND p2bull AND close > pc AND pc > pc2 AND open > po AND open < pc AND po > po2 AND po < pc2 THEN 1e0 ELSE 0e0 END AS cdl_3_white_soldiers, " +
          "CASE WHEN pc2 IS NULL THEN NULL WHEN bear AND pbear AND p2bear AND close < pc AND pc < pc2 AND open < po AND open > pc AND po < po2 AND po > pc2 THEN 1e0 ELSE 0e0 END AS cdl_3_black_crows, " +
          "CASE WHEN pc IS NULL THEN NULL WHEN dsh >= 2e0 * body AND ush <= body AND body > 0 AND pbull THEN 1e0 ELSE 0e0 END AS cdl_hanging_man, " +
          "CASE WHEN pc IS NULL THEN NULL WHEN ush >= 2e0 * body AND dsh <= body AND body > 0 AND pbear THEN 1e0 ELSE 0e0 END AS cdl_inverted_hammer, " +
          "CASE WHEN rng > 0 AND body <= 0.1e0 * rng AND ush <= 0.1e0 * rng THEN 1e0 ELSE 0e0 END AS cdl_dragonfly_doji, " +
          "CASE WHEN rng > 0 AND body <= 0.1e0 * rng AND dsh <= 0.1e0 * rng THEN 1e0 ELSE 0e0 END AS cdl_gravestone_doji, " +
          "CASE WHEN rng > 0 AND body <= 0.1e0 * rng AND ush >= 0.3e0 * rng AND dsh >= 0.3e0 * rng THEN 1e0 ELSE 0e0 END AS cdl_long_legged_doji"
      )
    Q(
      "cdl_patterns2",
      (s: SparkSession, dir: String) => {
        Graft.init(s)
        Graft
          .userBars(s, dir)
          .ta.cdlPatterns2
          .select(col("series_id") +: col("ts") +: outs.map(o => P.normd(col(o)).as(o)): _*)
          .orderBy("series_id", "ts")
      },
      Some(
        b.result(
          s"SELECT series_id, ts, ${outs.map(o => s"${normd(o)} AS $o").mkString(", ")} FROM ${b.top}$orderTail"
        )
      )
    )
  }

  /** Third-wave candle patterns over the per-user bars (multi-key).
    * Oracle mirrors Ta.cdlPatterns3 term-for-term. */
  val qCdlPatterns3 = {
    val bars = new Cte("bars", userBarsCte)
    val outs = Seq(
      "cdl_3_inside_up", "cdl_3_inside_down", "cdl_3_outside_up", "cdl_3_outside_down",
      "cdl_belt_hold_bull", "cdl_belt_hold_bear", "cdl_doji_star_bull", "cdl_doji_star_bear",
      "cdl_kicking_bull", "cdl_kicking_bear"
    )
    val b = bars
      .addSel(
        "c0",
        s"abs(close - open) AS body, high - low AS rng, " +
          s"lag(open, 1) $ov AS po, lag(close, 1) $ov AS pc, " +
          s"lag(high, 1) $ov AS ph, lag(low, 1) $ov AS pl, " +
          s"lag(open, 2) $ov AS po2, lag(close, 2) $ov AS pc2, " +
          "high - greatest(open, close) AS ush, least(open, close) - low AS dsh"
      )
      .addSel(
        "c1",
        "abs(pc - po) AS pbody, ph - pl AS prng, " +
          "close > open AS bull, close < open AS bear, " +
          "pc > po AS pbull, pc < po AS pbear, pc2 > po2 AS p2bull, pc2 < po2 AS p2bear"
      )
      .addSel(
        "c2",
        "CASE WHEN pc2 IS NULL THEN NULL WHEN p2bear AND pbull AND po >= pc2 AND pc <= po2 AND bull AND close > po2 THEN 1e0 ELSE 0e0 END AS cdl_3_inside_up, " +
          "CASE WHEN pc2 IS NULL THEN NULL WHEN p2bull AND pbear AND po <= pc2 AND pc >= po2 AND bear AND close < po2 THEN 1e0 ELSE 0e0 END AS cdl_3_inside_down, " +
          "CASE WHEN pc2 IS NULL THEN NULL WHEN p2bear AND pbull AND po <= pc2 AND pc >= po2 AND bull AND close > pc THEN 1e0 ELSE 0e0 END AS cdl_3_outside_up, " +
          "CASE WHEN pc2 IS NULL THEN NULL WHEN p2bull AND pbear AND po >= pc2 AND pc <= po2 AND bear AND close < pc THEN 1e0 ELSE 0e0 END AS cdl_3_outside_down, " +
          "CASE WHEN bull AND rng > 0 AND body >= 0.7e0 * rng AND dsh <= 0.05e0 * rng THEN 1e0 ELSE 0e0 END AS cdl_belt_hold_bull, " +
          "CASE WHEN bear AND rng > 0 AND body >= 0.7e0 * rng AND ush <= 0.05e0 * rng THEN 1e0 ELSE 0e0 END AS cdl_belt_hold_bear, " +
          "CASE WHEN pc IS NULL THEN NULL WHEN pbear AND rng > 0 AND body <= 0.1e0 * rng AND greatest(open, close) < pc THEN 1e0 ELSE 0e0 END AS cdl_doji_star_bull, " +
          "CASE WHEN pc IS NULL THEN NULL WHEN pbull AND rng > 0 AND body <= 0.1e0 * rng AND least(open, close) > pc THEN 1e0 ELSE 0e0 END AS cdl_doji_star_bear, " +
          "CASE WHEN pc IS NULL THEN NULL WHEN pbear AND prng > 0 AND pbody >= 0.95e0 * prng AND bull AND rng > 0 AND body >= 0.95e0 * rng AND open > ph THEN 1e0 ELSE 0e0 END AS cdl_kicking_bull, " +
          "CASE WHEN pc IS NULL THEN NULL WHEN pbull AND prng > 0 AND pbody >= 0.95e0 * prng AND bear AND rng > 0 AND body >= 0.95e0 * rng AND open < pl THEN 1e0 ELSE 0e0 END AS cdl_kicking_bear"
      )
    Q(
      "cdl_patterns3",
      (s: SparkSession, dir: String) => {
        Graft.init(s)
        Graft
          .userBars(s, dir)
          .ta.cdlPatterns3
          .select(col("series_id") +: col("ts") +: outs.map(o => P.normd(col(o)).as(o)): _*)
          .orderBy("series_id", "ts")
      },
      Some(
        b.result(
          s"SELECT series_id, ts, ${outs.map(o => s"${normd(o)} AS $o").mkString(", ")} FROM ${b.top}$orderTail"
        )
      )
    )
  }

  /** Fourth-wave (equal-price family) candle patterns over the per-user
    * bars. nearEq tolerance = 0.05 · sma(h−l, 10), mirrored exactly. */
  val qCdlPatterns4 = {
    val bars = new Cte("bars", userBarsCte)
    val outs = Seq(
      "cdl_on_neck", "cdl_in_neck", "cdl_thrusting", "cdl_separating_lines_bull",
      "cdl_separating_lines_bear", "cdl_matching_low", "cdl_stick_sandwich", "cdl_homing_pigeon"
    )
    val b = bars
      .addSel(
        "c0",
        s"${rmean("(high - low)", 10)} AS avgrng, " +
          s"lag(open, 1) $ov AS po, lag(close, 1) $ov AS pc, lag(low, 1) $ov AS pl, " +
          s"lag(open, 2) $ov AS po2, lag(close, 2) $ov AS pc2"
      )
      .addSel(
        "c1",
        "close > open AS bull, close < open AS bear, " +
          "pc > po AS pbull, pc < po AS pbear, pc2 < po2 AS p2bear"
      )
      .addSel(
        "c2",
        "CASE WHEN pc IS NULL OR avgrng IS NULL THEN NULL WHEN pbear AND bull AND open < pl AND abs(close - pl) <= 0.05e0 * avgrng THEN 1e0 ELSE 0e0 END AS cdl_on_neck, " +
          "CASE WHEN pc IS NULL OR avgrng IS NULL THEN NULL WHEN pbear AND bull AND open < pl AND close >= pc AND close - pc <= 0.05e0 * avgrng THEN 1e0 ELSE 0e0 END AS cdl_in_neck, " +
          "CASE WHEN pc IS NULL OR avgrng IS NULL THEN NULL WHEN pbear AND bull AND open < pl AND close > pc AND close < (po + pc) / 2e0 THEN 1e0 ELSE 0e0 END AS cdl_thrusting, " +
          "CASE WHEN pc IS NULL OR avgrng IS NULL THEN NULL WHEN pbear AND bull AND abs(open - po) <= 0.05e0 * avgrng THEN 1e0 ELSE 0e0 END AS cdl_separating_lines_bull, " +
          "CASE WHEN pc IS NULL OR avgrng IS NULL THEN NULL WHEN pbull AND bear AND abs(open - po) <= 0.05e0 * avgrng THEN 1e0 ELSE 0e0 END AS cdl_separating_lines_bear, " +
          "CASE WHEN pc IS NULL OR avgrng IS NULL THEN NULL WHEN pbear AND bear AND abs(close - pc) <= 0.05e0 * avgrng THEN 1e0 ELSE 0e0 END AS cdl_matching_low, " +
          "CASE WHEN pc2 IS NULL OR avgrng IS NULL THEN NULL WHEN p2bear AND pbull AND bear AND abs(close - pc2) <= 0.05e0 * avgrng THEN 1e0 ELSE 0e0 END AS cdl_stick_sandwich, " +
          "CASE WHEN pc IS NULL OR avgrng IS NULL THEN NULL WHEN pbear AND bear AND open < po AND close > pc THEN 1e0 ELSE 0e0 END AS cdl_homing_pigeon"
      )
    Q(
      "cdl_patterns4",
      (s: SparkSession, dir: String) => {
        Graft.init(s)
        Graft
          .userBars(s, dir)
          .ta.cdlPatterns4
          .select(col("series_id") +: col("ts") +: outs.map(o => P.normd(col(o)).as(o)): _*)
          .orderBy("series_id", "ts")
      },
      Some(
        b.result(
          s"SELECT series_id, ts, ${outs.map(o => s"${normd(o)} AS $o").mkString(", ")} FROM ${b.top}$orderTail"
        )
      )
    )
  }

  /** Fifth-wave candle patterns over the per-user bars (multi-key).
    * Oracle mirrors Ta.cdlPatterns5 term-for-term: real-body gap =
    * disjoint [min,max](o,c), doji = body ≤ 0.1·range, Equal = 0.05·
    * sma(h−l,10). */
  val qCdlPatterns5 = {
    val bars = new Cte("bars", userBarsCte)
    val outs = Seq(
      "cdl_tasuki_gap_up", "cdl_tasuki_gap_down", "cdl_rising_3_methods",
      "cdl_falling_3_methods", "cdl_2_crows", "cdl_upside_gap_2_crows",
      "cdl_tristar_bull", "cdl_tristar_bear", "cdl_abandoned_baby_bull",
      "cdl_abandoned_baby_bear", "cdl_counterattack_bull", "cdl_counterattack_bear",
      "cdl_rickshaw_man", "cdl_high_wave", "cdl_closing_marubozu"
    )
    val b = bars
      .addSel(
        "c0",
        s"abs(close - open) AS body, high - low AS rng, " +
          "high - greatest(open, close) AS ush, least(open, close) - low AS dsh, " +
          s"${rmean("(high - low)", 10)} AS avgrng, " +
          s"lag(open, 1) $ov AS po, lag(close, 1) $ov AS pc, lag(high, 1) $ov AS ph, lag(low, 1) $ov AS pl, " +
          s"lag(open, 2) $ov AS po2, lag(close, 2) $ov AS pc2, lag(high, 2) $ov AS ph2, lag(low, 2) $ov AS pl2, " +
          s"lag(open, 3) $ov AS po3, lag(close, 3) $ov AS pc3, lag(high, 3) $ov AS ph3, lag(low, 3) $ov AS pl3, " +
          s"lag(open, 4) $ov AS po4, lag(close, 4) $ov AS pc4, lag(high, 4) $ov AS ph4, lag(low, 4) $ov AS pl4"
      )
      .addSel(
        "c1",
        "close > open AS bull, close < open AS bear, " +
          "pc > po AS pbull, pc < po AS pbear, pc2 > po2 AS p2bull, pc2 < po2 AS p2bear, " +
          "pc4 > po4 AS bull4, pc4 < po4 AS bear4, " +
          "abs(pc - po) AS pbody, ph - pl AS prng, abs(pc2 - po2) AS p2body, ph2 - pl2 AS p2rng, " +
          "abs(pc4 - po4) AS body4, " +
          "least(po, pc) > greatest(po2, pc2) AS gapup12, greatest(po, pc) < least(po2, pc2) AS gapdn12, " +
          "rng > 0 AND body <= 0.1e0 * rng AS doji0"
      )
      .addSel(
        "c2",
        "prng > 0 AND pbody <= 0.1e0 * prng AS doji1, p2rng > 0 AND p2body <= 0.1e0 * p2rng AS doji2, " +
          "abs(pc3 - po3) < body4 AND ph3 <= ph4 AND pl3 >= pl4 AS small3, " +
          "abs(pc2 - po2) < body4 AND ph2 <= ph4 AND pl2 >= pl4 AS small2, " +
          "abs(pc - po) < body4 AND ph <= ph4 AND pl >= pl4 AS small1"
      )
      .addSel(
        "c3",
        "CASE WHEN pc2 IS NULL THEN NULL WHEN p2bull AND pbull AND gapup12 AND bear AND open > po AND open < pc AND close < po AND close > greatest(po2, pc2) THEN 1e0 ELSE 0e0 END AS cdl_tasuki_gap_up, " +
          "CASE WHEN pc2 IS NULL THEN NULL WHEN p2bear AND pbear AND gapdn12 AND bull AND open < po AND open > pc AND close > po AND close < least(po2, pc2) THEN 1e0 ELSE 0e0 END AS cdl_tasuki_gap_down, " +
          "CASE WHEN pc4 IS NULL THEN NULL WHEN bull4 AND small3 AND small2 AND small1 AND bull AND open > pc AND close > pc4 THEN 1e0 ELSE 0e0 END AS cdl_rising_3_methods, " +
          "CASE WHEN pc4 IS NULL THEN NULL WHEN bear4 AND small3 AND small2 AND small1 AND bear AND open < pc AND close < pc4 THEN 1e0 ELSE 0e0 END AS cdl_falling_3_methods, " +
          "CASE WHEN pc2 IS NULL THEN NULL WHEN p2bull AND pbear AND gapup12 AND bear AND open < po AND open > pc AND close < pc2 AND close > po2 THEN 1e0 ELSE 0e0 END AS cdl_2_crows, " +
          "CASE WHEN pc2 IS NULL THEN NULL WHEN p2bull AND pbear AND gapup12 AND bear AND open > po AND close < pc AND close > pc2 THEN 1e0 ELSE 0e0 END AS cdl_upside_gap_2_crows, " +
          "CASE WHEN pc2 IS NULL THEN NULL WHEN doji2 AND doji1 AND doji0 AND greatest(po, pc) < least(po2, pc2) AND greatest(po, pc) < least(open, close) THEN 1e0 ELSE 0e0 END AS cdl_tristar_bull, " +
          "CASE WHEN pc2 IS NULL THEN NULL WHEN doji2 AND doji1 AND doji0 AND least(po, pc) > greatest(po2, pc2) AND least(po, pc) > greatest(open, close) THEN 1e0 ELSE 0e0 END AS cdl_tristar_bear, " +
          "CASE WHEN pc2 IS NULL THEN NULL WHEN p2bear AND doji1 AND ph < pl2 AND bull AND low > ph THEN 1e0 ELSE 0e0 END AS cdl_abandoned_baby_bull, " +
          "CASE WHEN pc2 IS NULL THEN NULL WHEN p2bull AND doji1 AND pl > ph2 AND bear AND high < pl THEN 1e0 ELSE 0e0 END AS cdl_abandoned_baby_bear, " +
          "CASE WHEN pc IS NULL OR avgrng IS NULL THEN NULL WHEN pbear AND bull AND abs(close - pc) <= 0.05e0 * avgrng THEN 1e0 ELSE 0e0 END AS cdl_counterattack_bull, " +
          "CASE WHEN pc IS NULL OR avgrng IS NULL THEN NULL WHEN pbull AND bear AND abs(close - pc) <= 0.05e0 * avgrng THEN 1e0 ELSE 0e0 END AS cdl_counterattack_bear, " +
          "CASE WHEN doji0 AND ush >= 0.3e0 * rng AND dsh >= 0.3e0 * rng AND abs((open + close) / 2e0 - (high + low) / 2e0) <= 0.1e0 * rng THEN 1e0 ELSE 0e0 END AS cdl_rickshaw_man, " +
          "CASE WHEN rng > 0 AND body <= 0.15e0 * rng AND ush >= 0.35e0 * rng AND dsh >= 0.35e0 * rng THEN 1e0 ELSE 0e0 END AS cdl_high_wave, " +
          "CASE WHEN rng > 0 AND body >= 0.7e0 * rng AND ((bull AND ush <= 0.05e0 * rng) OR (bear AND dsh <= 0.05e0 * rng)) THEN 1e0 ELSE 0e0 END AS cdl_closing_marubozu"
      )
    Q(
      "cdl_patterns5",
      (s: SparkSession, dir: String) => {
        Graft.init(s)
        Graft
          .userBars(s, dir)
          .ta.cdlPatterns5
          .select(col("series_id") +: col("ts") +: outs.map(o => P.normd(col(o)).as(o)): _*)
          .orderBy("series_id", "ts")
      },
      Some(
        b.result(
          s"SELECT series_id, ts, ${outs.map(o => s"${normd(o)} AS $o").mkString(", ")} FROM ${b.top}$orderTail"
        )
      )
    )
  }

  /** Sixth-wave candle patterns over the per-user bars (multi-key) —
    * completes the TA-Lib cdl set. Oracle mirrors Ta.cdlPatterns6
    * term-for-term. */
  val qCdlPatterns6 = {
    val bars = new Cte("bars", userBarsCte)
    val outs = Seq(
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
    val b = bars
      .addSel(
        "c0",
        s"abs(close - open) AS body, high - low AS rng, " +
          "high - greatest(open, close) AS ush, least(open, close) - low AS dsh, " +
          s"${rmean("(high - low)", 10)} AS avgrng, " +
          s"${rmean("abs(close - open)", 10)} AS avgbody, " +
          s"lag(open, 1) $ov AS po, lag(close, 1) $ov AS pc, lag(high, 1) $ov AS ph, lag(low, 1) $ov AS pl, " +
          s"lag(open, 2) $ov AS po2, lag(close, 2) $ov AS pc2, lag(high, 2) $ov AS ph2, lag(low, 2) $ov AS pl2, " +
          s"lag(open, 3) $ov AS po3, lag(close, 3) $ov AS pc3, lag(high, 3) $ov AS ph3, lag(low, 3) $ov AS pl3, " +
          s"lag(open, 4) $ov AS po4, lag(close, 4) $ov AS pc4, lag(high, 4) $ov AS ph4, lag(low, 4) $ov AS pl4"
      )
      .addSel(
        "c1",
        "close > open AS bull, close < open AS bear, " +
          "pc > po AS pbull, pc < po AS pbear, pc2 > po2 AS p2bull, pc2 < po2 AS p2bear, " +
          "pc3 > po3 AS p3bull, pc3 < po3 AS p3bear, pc4 > po4 AS bull4, pc4 < po4 AS bear4, " +
          "abs(pc - po) AS pbody, ph - pl AS prng, abs(pc2 - po2) AS p2body, ph2 - pl2 AS p2rng, " +
          "abs(pc3 - po3) AS p3body, ph3 - pl3 AS p3rng, abs(pc4 - po4) AS body4, " +
          "ph - greatest(po, pc) AS push, ph2 - greatest(po2, pc2) AS p2ush, " +
          "least(po, pc) > greatest(po2, pc2) AS gapup12, greatest(po, pc) < least(po2, pc2) AS gapdn12, " +
          "rng > 0 AND body <= 0.1e0 * rng AS doji0"
      )
      .addSel(
        "c2",
        "prng > 0 AND pbody <= 0.1e0 * prng AS doji1, " +
          "pbear AND prng > 0 AND pbody >= 0.95e0 * prng AND bull AND rng > 0 AND body >= 0.95e0 * rng AND open > ph AS kickup, " +
          "pbull AND prng > 0 AND pbody >= 0.95e0 * prng AND bear AND rng > 0 AND body >= 0.95e0 * rng AND open < pl AS kickdn"
      )
      .addSel(
        "c3",
        "CASE WHEN pc3 IS NULL THEN NULL WHEN p3bull AND p2bull AND pbull AND pc2 > pc3 AND pc > pc2 AND bear AND open > pc AND close < po3 THEN 1e0 ELSE 0e0 END AS cdl_3_line_strike_bull, " +
          "CASE WHEN pc3 IS NULL THEN NULL WHEN p3bear AND p2bear AND pbear AND pc2 < pc3 AND pc < pc2 AND bull AND open < pc AND close > po3 THEN 1e0 ELSE 0e0 END AS cdl_3_line_strike_bear, " +
          "CASE WHEN pc2 IS NULL THEN NULL WHEN p2bear AND p2rng > 0 AND (least(po2, pc2) - pl2) >= p2body AND pbear AND ph < ph2 AND pl > pl2 AND bear AND rng > 0 AND body >= 0.9e0 * rng AND high <= ph AND low >= pl THEN 1e0 ELSE 0e0 END AS cdl_3_stars_in_south, " +
          "CASE WHEN pc2 IS NULL THEN NULL WHEN p2bull AND pbull AND bull AND pc > pc2 AND close > pc AND open > po AND open < pc AND po > po2 AND po < pc2 AND pbody < p2body AND body < pbody AND ush > p2ush THEN 1e0 ELSE 0e0 END AS cdl_advance_block, " +
          "CASE WHEN pc4 IS NULL THEN NULL WHEN bear4 AND p3bear AND greatest(po3, pc3) < least(po4, pc4) AND pc2 < pc3 AND pc < pc2 AND bull AND close > greatest(po3, pc3) AND close < least(po4, pc4) THEN 1e0 ELSE 0e0 END AS cdl_breakaway_bull, " +
          "CASE WHEN pc4 IS NULL THEN NULL WHEN bull4 AND p3bull AND least(po3, pc3) > greatest(po4, pc4) AND pc2 > pc3 AND pc > pc2 AND bear AND close < least(po3, pc3) AND close > greatest(po4, pc4) THEN 1e0 ELSE 0e0 END AS cdl_breakaway_bear, " +
          "CASE WHEN pc3 IS NULL THEN NULL WHEN p3bear AND p3rng > 0 AND p3body >= 0.95e0 * p3rng AND p2bear AND p2rng > 0 AND p2body >= 0.95e0 * p2rng AND pbear AND greatest(po, pc) < pc2 AND ph > pc2 AND bear AND open >= ph AND close <= pl THEN 1e0 ELSE 0e0 END AS cdl_conceal_baby_swall, " +
          "CASE WHEN pc2 IS NULL THEN NULL WHEN p2bear AND doji1 AND bull AND close > (po2 + pc2) / 2e0 THEN 1e0 ELSE 0e0 END AS cdl_morning_doji_star, " +
          "CASE WHEN pc2 IS NULL THEN NULL WHEN p2bull AND doji1 AND bear AND close < (po2 + pc2) / 2e0 THEN 1e0 ELSE 0e0 END AS cdl_evening_doji_star, " +
          "CASE WHEN pc2 IS NULL OR avgrng IS NULL THEN NULL WHEN pbull AND bull AND gapup12 AND least(open, close) > greatest(po2, pc2) AND abs(open - po) <= 0.05e0 * avgrng AND abs(body - pbody) <= 0.05e0 * avgrng THEN 1e0 ELSE 0e0 END AS cdl_gap_side_side_white_up, " +
          "CASE WHEN pc2 IS NULL OR avgrng IS NULL THEN NULL WHEN pbull AND bull AND greatest(po, pc) < least(po2, pc2) AND greatest(open, close) < least(po2, pc2) AND abs(open - po) <= 0.05e0 * avgrng AND abs(body - pbody) <= 0.05e0 * avgrng THEN 1e0 ELSE 0e0 END AS cdl_gap_side_side_white_down, " +
          "CASE WHEN pc2 IS NULL THEN NULL WHEN pbear AND doji0 AND greatest(open, close) <= po AND least(open, close) >= pc THEN 1e0 ELSE 0e0 END AS cdl_harami_cross_bull, " +
          "CASE WHEN pc2 IS NULL THEN NULL WHEN pbull AND doji0 AND greatest(open, close) <= pc AND least(open, close) >= po THEN 1e0 ELSE 0e0 END AS cdl_harami_cross_bear, " +
          "CASE WHEN pc2 IS NULL THEN NULL WHEN ph < ph2 AND pl > pl2 AND high < ph AND low < pl THEN 1e0 ELSE 0e0 END AS cdl_hikkake_bull, " +
          "CASE WHEN pc2 IS NULL THEN NULL WHEN ph < ph2 AND pl > pl2 AND high > ph AND low > pl THEN 1e0 ELSE 0e0 END AS cdl_hikkake_bear, " +
          "CASE WHEN pc2 IS NULL OR avgrng IS NULL THEN NULL WHEN p2bear AND pbear AND bear AND abs(po - pc2) <= 0.05e0 * avgrng AND abs(open - pc) <= 0.05e0 * avgrng AND pc < pc2 AND close < pc THEN 1e0 ELSE 0e0 END AS cdl_identical_3_crows, " +
          "CASE WHEN pc4 IS NULL THEN NULL WHEN bear4 AND p3bear AND p2bear AND pbear AND pc3 < pc4 AND pc2 < pc3 AND pc < pc2 AND prng > 0 AND (ph - po) >= 0.1e0 * prng AND bull AND open > po AND close > ph THEN 1e0 ELSE 0e0 END AS cdl_ladder_bottom, " +
          "CASE WHEN avgrng IS NULL THEN NULL WHEN avgbody IS NOT NULL AND rng > 0 AND body >= 1.3e0 * avgbody AND body >= 0.6e0 * rng THEN 1e0 ELSE 0e0 END AS cdl_long_line, " +
          "CASE WHEN avgrng IS NULL THEN NULL WHEN avgbody IS NOT NULL AND body <= 0.5e0 * avgbody AND rng <= 0.5e0 * avgrng THEN 1e0 ELSE 0e0 END AS cdl_short_line, " +
          "CASE WHEN pc4 IS NULL THEN NULL WHEN bull4 AND p3bear AND least(po3, pc3) > pc4 AND p3body < body4 AND p2body < body4 AND pbody < body4 AND least(pl3, least(pl2, pl)) > pl4 AND bull AND close > greatest(ph3, greatest(ph2, ph)) THEN 1e0 ELSE 0e0 END AS cdl_mat_hold, " +
          "CASE WHEN pc2 IS NULL OR avgrng IS NULL THEN NULL WHEN p2bull AND pbull AND bull AND pc > pc2 AND close > pc AND body <= 0.5e0 * pbody AND open > po AND open <= pc + 0.05e0 * avgrng THEN 1e0 ELSE 0e0 END AS cdl_stalled_pattern, " +
          "CASE WHEN rng > 0 AND body <= 0.1e0 * rng AND ush <= 0.1e0 * rng AND dsh >= 0.7e0 * rng THEN 1e0 ELSE 0e0 END AS cdl_takuri, " +
          "CASE WHEN pc2 IS NULL THEN NULL WHEN p2bull AND pbull AND gapup12 AND bear AND open > po AND open < pc AND close <= greatest(po2, pc2) THEN 1e0 ELSE 0e0 END AS cdl_xside_gap_3_methods_up, " +
          "CASE WHEN pc2 IS NULL THEN NULL WHEN p2bear AND pbear AND gapdn12 AND bull AND open < po AND open > pc AND close >= least(po2, pc2) THEN 1e0 ELSE 0e0 END AS cdl_xside_gap_3_methods_down, " +
          "CASE WHEN pc IS NULL THEN NULL WHEN (kickup AND body >= pbody) OR (kickdn AND pbody > body) THEN 1e0 ELSE 0e0 END AS cdl_kicking_by_length_bull, " +
          "CASE WHEN pc IS NULL THEN NULL WHEN (kickup AND body < pbody) OR (kickdn AND pbody <= body) THEN 1e0 ELSE 0e0 END AS cdl_kicking_by_length_bear, " +
          "CASE WHEN pc2 IS NULL OR avgrng IS NULL THEN NULL WHEN ph < ph2 AND pl > pl2 AND (pc - pl) <= 0.2e0 * avgrng AND high < ph AND low < pl THEN 1e0 ELSE 0e0 END AS cdl_hikkake_mod_bull, " +
          "CASE WHEN pc2 IS NULL OR avgrng IS NULL THEN NULL WHEN ph < ph2 AND pl > pl2 AND (ph - pc) <= 0.2e0 * avgrng AND high > ph AND low > pl THEN 1e0 ELSE 0e0 END AS cdl_hikkake_mod_bear"
      )
    Q(
      "cdl_patterns6",
      (s: SparkSession, dir: String) => {
        Graft.init(s)
        Graft
          .userBars(s, dir)
          .ta.cdlPatterns6
          .select(col("series_id") +: col("ts") +: outs.map(o => P.normd(col(o)).as(o)): _*)
          .orderBy("series_id", "ts")
      },
      Some(
        b.result(
          s"SELECT series_id, ts, ${outs.map(o => s"${normd(o)} AS $o").mkString(", ")} FROM ${b.top}$orderTail"
        )
      )
    )
  }

  /** Candle utils + rolling geometric mean over the bars. */
  val qCandleUtils = {
    val bars = new Cte("bars", barsCte)
    val lnx = "CASE WHEN close > 0 THEN ln(close) END"
    val b = bars.addSel(
      "u0",
      "CASE WHEN close >= open THEN 1e0 ELSE -1e0 END AS candle_color, " +
        "abs(close - open) AS real_body, high - low AS high_low_range, " +
        s"exp(CASE WHEN count($lnx) ${fr(10)} >= 10 THEN avg($lnx) ${fr(10)} END) AS geomean_10"
    )
    val outs = Seq("candle_color", "real_body", "high_low_range", "geomean_10")
    Q(
      "candle_utils",
      (s: SparkSession, dir: String) => {
        Graft.init(s)
        Graft
          .bars(s, dir)
          .ta.candleUtils
          .ta.geometricMean(10)
          .select(col("series_id") +: col("ts") +: outs.map(o => P.normd(col(o)).as(o)): _*)
          .orderBy("series_id", "ts")
      },
      Some(
        b.result(
          s"SELECT series_id, ts, ${outs.map(o => s"${normd(o)} AS $o").mkString(", ")} FROM ${b.top}$orderTail"
        )
      )
    )
  }

  /** Multi-timeframe indicator (the pandas-ta MTF workflow: compute on a
    * higher timeframe, align back to the lower one): SMA(5) of the
    * per-user DAILY closes, as-of joined back onto every raw event — each
    * event sees the most recent completed daily-SMA value. Composition of
    * bars → window batch → as-of; the daily side is key-sized, so the
    * as-of union sort is dominated by the raw side (one shuffle). */
  val qMtfSma = Q(
    "x_mtf_sma",
    (s: SparkSession, dir: String) => {
      val ev = Graft.userSeries(s, dir)
      val daily = ev
        .groupBy(col("series_id"), expr("CAST(to_date(timestamp_micros(ts)) AS DATE)").as("day"))
        .agg(max("ts").as("ts"), expr("max_by(close, ts)").as("close"))
        .drop("day")
      val sma = daily.ta.sma(5).select(col("series_id"), col("ts"), col("sma_5"))
      AsofJoin
        .asof(ev, sma, "series_id", "ts", Seq("sma_5"), prefix = "mtf_")
        .select(col("series_id"), col("ts"), P.normd(col("mtf_sma_5")).as("mtf_sma_5"))
        .orderBy("series_id", "ts")
    },
    Some(
      s"WITH s AS ($seriesCte), " +
        "d AS (SELECT series_id, max(ts) AS ts, arg_max(close, ts) AS close FROM " +
        "(SELECT *, CAST(date_trunc('day', to_timestamp(ts // 1000000)) AS DATE) AS day FROM s) " +
        "GROUP BY series_id, day), " +
        s"m AS (SELECT series_id, ts, ${rmean("close", 5)} AS sma_5 FROM d) " +
        "SELECT s.series_id, s.ts, round(m.sma_5, 6) AS mtf_sma_5 " +
        "FROM s ASOF LEFT JOIN m ON s.series_id = m.series_id AND s.ts >= m.ts " +
        "ORDER BY s.series_id, s.ts"
    )
  )

  val all: Seq[Q] = Seq(qAsof, qAsofVariants, qRangeJoin, qCdlPatterns, qCdlPatterns2, qCdlPatterns3, qCdlPatterns4, qCdlPatterns5, qCdlPatterns6, qCandleUtils, qMtfSma)
}
