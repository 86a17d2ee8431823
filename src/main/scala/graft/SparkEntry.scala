package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All paired (spark, oracle) queries. */
  def allQ: Seq[Q] = Seq(
    Q(
      "q01_bars",
      (s: SparkSession, dir: String) =>
        Graft
          .bars(s, dir)
          .select(
            col("series_id"),
            col("ts"),
            graft.ta.prim.normd(col("open")).as("open"),
            graft.ta.prim.normd(col("high")).as("high"),
            graft.ta.prim.normd(col("low")).as("low"),
            graft.ta.prim.normd(col("close")).as("close"),
            graft.ta.prim.normd(col("volume")).as("volume")
          )
          .orderBy("series_id", "ts"),
      Some(
        s"WITH bars AS (${sqlgen.barsCte}) SELECT series_id, ts, round(open, 6) AS open, " +
          "round(high, 6) AS high, round(low, 6) AS low, round(close, 6) AS close, " +
          "round(volume, 6) AS volume FROM bars ORDER BY series_id, ts"
      )
    )
  ) ++ SeriesQueries.all ++ BarsQueries.all ++ MomentumQueries.all ++
    ExtensionQueries.all ++ RelationalQueries.all ++ RecQueries.all ++
    CompositeQueries.all ++ MaQueries.all ++ JoinQueries.all ++ Rec2Queries.all ++
    HaloQueries.all ++ SketchQueries.all ++ SqlSurface6Queries.all ++
    Seq(Strategy50Queries.q, StrategyOhlcvQueries.q, StrategyOhlcvQueries.qCandles, StrategyDupQueries.q)

  /** Flagship query on sf=0.001; driver smoke-checks rows>0: the Strategy
    * batch compiler running a multi-indicator set over the daily bars —
    * one compiled plan, one shuffle for the whole window batch. */
  def entry(spark: SparkSession): DataFrame = {
    Graft.init(spark)
    val dir = "/root/testdata/sf0.001"
    import graft.ta.{IndicatorSpec, Strategy, registry}
    val flagship = Strategy(
      "flagship",
      Seq(
        IndicatorSpec("sma", Map("length" -> 10)),
        IndicatorSpec("ema", Map("length" -> 10)),
        IndicatorSpec("rsi", Map("length" -> 14)),
        IndicatorSpec("macd", Map()),
        IndicatorSpec("bbands", Map("length" -> 5)),
        IndicatorSpec("atr", Map("length" -> 10)),
        IndicatorSpec("obv", Map()),
        IndicatorSpec("log_return", Map())
      )
    )
    registry.strategy(Graft.bars(spark, dir), flagship)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQ.map(q => q.name -> q.spark).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQ.flatMap(q => q.sql.map(q.name -> _)).toMap
}
