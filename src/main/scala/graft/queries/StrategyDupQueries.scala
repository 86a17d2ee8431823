package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Graft
import graft.ta.{prim => P, IndicatorSpec, Strategy, registry}
import sqlgen._
import SeriesQueries.{Cte, madSql, emaSql}

/** Fourth Strategy gate entry (`strategy_dup_batch`): SAME-KIND /
  * DIFFERENT-PARAM specs in one batch — the composition path where the
  * compiler's leveled merge must NOT share param-independent temp names
  * (`__eri_e`, `__cci_mad`, `__kc_basis`, `__pgo_etr`) across variants.
  *
  * The first spec of each kind claims its temp names and batches; the
  * second collides with a different expression and is routed to the
  * builder fold (Strategy.strategyBuild collision routing). This oracle
  * locks the CONTRACT — outputs identical to folding `apply` spec by
  * spec — against DuckDB, so a future lowering that reintroduces a
  * silent temp collision fails the driver gate, not just a unit test.
  */
object StrategyDupQueries {

  val specs: Seq[IndicatorSpec] = Seq(
    IndicatorSpec("eri", Map("length" -> 10)),
    IndicatorSpec("eri", Map("length" -> 20)),
    IndicatorSpec("cci", Map("length" -> 10)),
    IndicatorSpec("cci", Map("length" -> 14)),
    IndicatorSpec("kc", Map("length" -> 20)),
    IndicatorSpec("kc", Map("length" -> 10)),
    IndicatorSpec("pgo", Map("length" -> 14)),
    IndicatorSpec("pgo", Map("length" -> 5))
  )

  val outs: Seq[String] = Seq(
    "bull_10", "bear_10", "bull_20", "bear_20",
    "cci_10", "cci_14",
    "kcb_20", "kcl_20", "kcu_20", "kcb_10", "kcl_10", "kcu_10",
    "pgo_14", "pgo_5"
  )

  private val oracle: String = {
    val trSql =
      s"CASE WHEN lag(close, 1) $ov IS NULL THEN NULL ELSE " +
        s"greatest(high - low, abs(high - lag(close, 1) $ov), abs(low - lag(close, 1) $ov)) END"
    var b: Cte = BarsQueries.bars
      .addSel("d0", s"$trSql AS true_range, (high + low + close) / 3e0 AS tp")
    b = emaSql(b, "close", "eline10", 10)
    b = emaSql(b, "close", "eline20", 20)
    b = b.addSel(
      "d1",
      "high - eline10 AS bull_10, low - eline10 AS bear_10, " +
        "high - eline20 AS bull_20, low - eline20 AS bear_20"
    )
    b = madSql(b, "tp", "tpmad10", 10)
    b = madSql(b, "tp", "tpmad14", 14)
    b = b.addSel(
      "d2",
      s"${sdiv(s"(tp - ${rmean("tp", 10)})", "(0.015e0 * tpmad10)")} AS cci_10, " +
        s"${sdiv(s"(tp - ${rmean("tp", 14)})", "(0.015e0 * tpmad14)")} AS cci_14"
    )
    b = emaSql(b, "close", "basis20", 20)
    b = emaSql(b, "true_range", "band20", 20)
    b = emaSql(b, "close", "basis10", 10)
    b = emaSql(b, "true_range", "band10", 10)
    b = b.addSel(
      "d3",
      "basis20 AS kcb_20, basis20 - 2e0 * band20 AS kcl_20, basis20 + 2e0 * band20 AS kcu_20, " +
        "basis10 AS kcb_10, basis10 - 2e0 * band10 AS kcl_10, basis10 + 2e0 * band10 AS kcu_10"
    )
    b = emaSql(b, "true_range", "etr14", 14)
    b = emaSql(b, "true_range", "etr5", 5)
    b = b.addSel(
      "d4",
      s"${sdiv(s"(close - ${rmean("close", 14)})", "etr14")} AS pgo_14, " +
        s"${sdiv(s"(close - ${rmean("close", 5)})", "etr5")} AS pgo_5"
    )
    b.result(
      s"SELECT series_id, ts, ${outs.map(o => s"${normd(o)} AS $o").mkString(", ")} FROM ${b.top}$orderTail"
    )
  }

  val q: Q = Q(
    "strategy_dup_batch",
    (s: SparkSession, dir: String) => {
      Graft.init(s)
      registry
        .strategy(Graft.bars(s, dir), Strategy("dup_batch", specs))
        .select(col("series_id") +: col("ts") +: outs.map(o => P.normd(col(o)).as(o)): _*)
        .orderBy("series_id", "ts")
    },
    Some(oracle)
  )
}
