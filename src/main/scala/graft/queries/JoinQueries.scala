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

  val all: Seq[Q] = Seq(qAsof, qCdlPatterns, qCandleUtils)
}
