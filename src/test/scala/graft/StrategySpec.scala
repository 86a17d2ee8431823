package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import graft.ta.{registry, IndicatorSpec, Strategy}
import graft.ta.Ta._

/** Reference core.py surface: Strategy compilation, registry, kwargs. */
class StrategySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def bars = Graft.bars(spark, TestSpark.sfDir)

  test("registry lists categories and indicators") {
    assert(registry.categories == Seq("candles", "cycles", "momentum", "overlap", "performance", "statistics", "trend", "volatility", "volume"))
    assert(registry.indicators.size >= 90, s"only ${registry.indicators.size} indicators registered")
    assert(registry.byCategory("overlap").contains("kama"))
  }

  test("Common strategy compiles to one plan with expected columns") {
    val out = bars.taStrategy(Strategy.Common)
    val cols = out.columns.toSet
    assert(Set("sma_10", "sma_20", "sma_50", "macd", "macds", "macdh", "rsi_10").subsetOf(cols))
    assert(out.count() == 30)
  }

  test("strategy of window indicators keeps a single shuffle") {
    val specs = Seq("sma", "ema", "wma", "rsi", "atr", "bbands", "willr", "cci", "mfi", "obv")
      .map(k => IndicatorSpec(k))
    val out = registry.strategy(bars.repartition(col("series_id")), Strategy("w", specs))
    out.collect()
    val exchanges = out.queryExecution.executedPlan.collect { case e: ShuffleExchangeExec => e }
    // one for the bars groupBy + the explicit repartition; no window may add more
    assert(exchanges.size <= 2, s"window strategy added shuffles: ${exchanges.size}")
  }

  test("compiled lowering equals the builder for every lowerable kind") {
    val lowered = registry.indicators.map(IndicatorSpec(_)).filter(registry.hasLowering)
    assert(lowered.size >= 70, s"only ${lowered.size} kinds have lowerings")
    lowered.foreach { spec =>
      val viaStrategy = registry.strategy(bars, Strategy("one", Seq(spec)))
      val viaBuilder = registry(bars, spec)
      assert(
        viaStrategy.columns.sorted.sameElements(viaBuilder.columns.sorted),
        s"${spec.kind}: columns ${viaStrategy.columns.sorted.toSeq} vs ${viaBuilder.columns.sorted.toSeq}"
      )
      val cols = viaBuilder.columns.sorted.toSeq
      val a = viaStrategy.select(cols.map(col): _*).orderBy("ts").collect()
      val b = viaBuilder.select(cols.map(col): _*).orderBy("ts").collect()
      assert(a.sameElements(b), s"${spec.kind}: values differ")
    }
  }

  test("same-kind different-param specs equal the builder fold") {
    // eri/cci/kc lowerings use param-independent temp names (__eri_e,
    // __cci_mad, ...) — batching two variants of one kind must not compute
    // the first spec's outputs from the second spec's intermediates
    val specs = Seq(
      IndicatorSpec("eri", Map("length" -> 10)),
      IndicatorSpec("eri", Map("length" -> 20)),
      IndicatorSpec("cci", Map("length" -> 10)),
      IndicatorSpec("cci", Map("length" -> 14)),
      IndicatorSpec("kc", Map("length" -> 20)),
      IndicatorSpec("kc", Map("length" -> 10))
    )
    val viaStrategy = registry.strategy(bars, Strategy("dup", specs))
    val viaFold = specs.foldLeft(bars)((d, s) => registry(d, s))
    assert(viaStrategy.columns.sorted.sameElements(viaFold.columns.sorted))
    val cols = viaFold.columns.sorted.toSeq
    val a = viaStrategy.select(cols.map(col): _*).orderBy("ts").collect()
    val b = viaFold.select(cols.map(col): _*).orderBy("ts").collect()
    assert(a.sameElements(b), "same-kind batch diverged from the builder fold")
  }

  test("colliding output names keep last-wins fold order") {
    // macd emits param-independent output names; the LAST spec's params
    // must win, exactly as folding apply would
    val specs = Seq(
      IndicatorSpec("macd", Map("fast" -> 12, "slow" -> 26)),
      IndicatorSpec("macd", Map("fast" -> 5, "slow" -> 35))
    )
    val viaStrategy = registry.strategy(bars, Strategy("mm", specs))
    val viaFold = specs.foldLeft(bars)((d, s) => registry(d, s))
    val cols = viaFold.columns.sorted.toSeq
    val a = viaStrategy.select(cols.map(col): _*).orderBy("ts").collect()
    val b = viaFold.select(cols.map(col): _*).orderBy("ts").collect()
    assert(a.sameElements(b), "output-name collision diverged from fold order")
  }

  test("reserved __ prefix on input columns is rejected") {
    val bad = bars.withColumn("__rn", lit(1))
    val e = intercept[IllegalArgumentException](
      registry.strategy(bad, Strategy("r", Seq(IndicatorSpec("sma"))))
    )
    assert(e.getMessage.contains("__"))
  }

  test("offset kwarg shifts appended output only") {
    val plain = bars.ta.sma(10).orderBy("ts").collect().map(r => Option(r.getAs[Any]("sma_10")))
    val shifted = bars
      .taIndicator("sma", Map("length" -> 10, "offset" -> 2))
      .orderBy("ts")
      .collect()
      .map(r => Option(r.getAs[Any]("sma_10")))
    assert(shifted(11) == plain(9) && shifted(12) == plain(10))
    assert(shifted(0).isEmpty && shifted(1).isEmpty)
  }

  test("fillna and prefix/suffix kwargs") {
    val out = bars.taIndicator("sma", Map("length" -> 10, "fillna" -> 0.0, "prefix" -> "P", "suffix" -> "S"))
    assert(out.columns.contains("P_sma_10_S"))
    assert(out.where(col("P_sma_10_S").isNull).count() == 0)
  }

  test("unknown indicator raises with the available list") {
    val e = intercept[IllegalArgumentException](bars.taIndicator("nope"))
    assert(e.getMessage.contains("unknown indicator"))
  }
}
