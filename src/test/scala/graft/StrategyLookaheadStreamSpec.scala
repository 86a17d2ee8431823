package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.StreamingTa
import graft.ta.{registry, IndicatorSpec, Strategy}

/** Round-12 verdict item #4: a strategy mixing causal and LOOKAHEAD specs
  * (ichimoku, centered dpo) streams through ONE entry point —
  * strategyStream switches the whole strategy to emit-with-latency-Kmax
  * instead of demanding a second stream + user join. Emitted rows equal
  * the batch strategy row-for-row on the emitted prefix (all rows with
  * ≥ Kmax successors); the pending ring survives micro-batch boundaries
  * (kryo) and replayed ticks drop under the standard in-order contract
  * without corrupting pending rows. */
class StrategyLookaheadStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val st = Strategy("mixed-lookahead", Seq(
    IndicatorSpec("sma", Map("length" -> 10)),
    IndicatorSpec("ichimoku", Map("tenkan" -> 3, "kijun" -> 5, "senkou" -> 8, "shift" -> 5)),
    IndicatorSpec("ema", Map("length" -> 10)),
    IndicatorSpec("dpo", Map("length" -> 20))
  ))
  private val kmax = 20 / 2 + 1 // dpo's K=11 > ichimoku's shift=5
  private val outCols = Seq(
    "sma_10", "its_3", "iks_5", "isa_3", "isb_5", "ics_5", "ema_10", "dpo_20")

  private def norm(v: Any): Any = v match {
    case null => null
    case d: Double => math.rint(d * 1e6) / 1e6
    case other => other
  }

  test("mixed strategy streams at latency Kmax with batch parity; replays drop without corrupting pending rows") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val bars = Graft
      .bars(spark, TestSpark.sfDir)
      .select(
        col("series_id").cast("string").as("series_id"),
        unix_date(col("ts")).cast("long").as("ts"),
        col("open"), col("high"), col("low"), col("close"), col("volume")
      )
    val ticks = bars.as[StreamingTa.BarTick].collect().sortBy(_.ts)
    assert(ticks.length > kmax + 5, "need rows past the emit latency")

    // micro-batches of 7; from batch 2 on, replay 1 tick from two batches
    // back — cross-batch late arrivals hitting a live pending ring
    val clean = ticks.grouped(7).toSeq
    val batches = clean.zipWithIndex.map { case (b, i) =>
      if (i >= 2) b.toSeq :+ clean(i - 2).head else b.toSeq
    }
    val nLate = batches.length - 2

    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[StreamingTa.BarTick]
    val acc = spark.sparkContext.longAccumulator("lookahead_late")
    val q = StreamingTa
      .strategyStream(ms.toDS(), st, latePolicy = "drop", lateCounter = Some(acc))
      .writeStream.format("memory").queryName("lookahead_strat").outputMode("append").start()
    batches.foreach { b => ms.addData(b); q.processAllAvailable() }
    q.stop()

    val streamed = spark.table("lookahead_strat").collect()
      .map(r => r.getAs[Long]("ts") -> r).toMap
    assert(acc.value == nLate.toLong, s"expected $nLate late drops, got ${acc.value}")
    // emit-with-latency-Kmax: every row with >= Kmax successors, exactly once
    assert(streamed.size == ticks.length - kmax,
      s"expected ${ticks.length - kmax} emitted rows, got ${streamed.size}")

    // column order follows strategy order (series_id, ts, then spec cols)
    val names = spark.table("lookahead_strat").schema.fieldNames.toSeq
    assert(names == Seq("series_id", "ts") ++ outCols)

    // batch parity on the emitted prefix — including null lookahead cells
    // during warm-up and the CAUSAL columns of rows near the emitted edge
    val batchRef = registry.strategy(bars, st).orderBy("ts").collect()
    val emittedTs = streamed.keySet
    batchRef.filter(r => emittedTs(r.getAs[Long]("ts"))).foreach { br =>
      val sr = streamed(br.getAs[Long]("ts"))
      outCols.foreach { c =>
        assert(
          norm(sr.getAs[Any](c)) == norm(br.getAs[Any](c)),
          s"$c mismatch at ts=${br.getAs[Long]("ts")}")
      }
    }
    // and the emitted prefix is exactly the first n-Kmax ticks
    val expectTs = ticks.dropRight(kmax).map(_.ts).toSet
    assert(emittedTs == expectTs)
  }

  test("warm-mixed ≡ full replay row-for-row after the history/live boundary (round 13)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val bars = Graft
      .bars(spark, TestSpark.sfDir)
      .select(
        col("series_id").cast("string").as("series_id"),
        unix_date(col("ts")).cast("long").as("ts"),
        col("open"), col("high"), col("low"), col("close"), col("volume")
      )
    val ticks = bars.as[StreamingTa.BarTick].collect().sortBy(_.ts)
    // live = kmax+1 ticks: enough to flush the whole primed pending tail
    // AND emit the first live-complete row; history well past the latency
    val h = ticks.length - (kmax + 1)
    assert(h > kmax + 5, "need history well past the emit latency")
    val (hist, live) = ticks.splitAt(h)

    // full cold replay: every tick through the stream
    val msAll = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[StreamingTa.BarTick]
    val qAll = StreamingTa
      .strategyStream(msAll.toDS(), st)
      .writeStream.format("memory").queryName("mixed_replay_all").outputMode("append").start()
    ticks.grouped(7).foreach { b => msAll.addData(b.toSeq); qAll.processAllAvailable() }
    qAll.stop()
    val replay = spark.table("mixed_replay_all").collect()
      .map(r => r.getAs[Long]("ts") -> r).toMap

    // warm: history folds at batch speed, ONLY live ticks stream
    val msLive = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[StreamingTa.BarTick]
    val qWarm = StreamingTa
      .strategyStreamWarm(msLive.toDS(), st, spark.createDataset(hist.toSeq))
      .writeStream.format("memory").queryName("mixed_warm").outputMode("append").start()
    live.grouped(7).foreach { b => msLive.addData(b.toSeq); qWarm.processAllAvailable() }
    qWarm.stop()
    val warm = spark.table("mixed_warm").collect()
      .map(r => r.getAs[Long]("ts") -> r).toMap

    // the warm stream emits exactly the rows the full replay emits after
    // the boundary: the primed pending tail (last kmax history rows,
    // backfilled by the first live ticks) plus the live rows with >= kmax
    // successors — one row per tick position h-kmax .. n-1-kmax
    val expectTs = ticks.slice(h - kmax, ticks.length - kmax).map(_.ts).toSet
    assert(warm.keySet == expectTs,
      s"warm emitted ${warm.size} rows, expected ${expectTs.size} (pending tail + live prefix)")
    // row-for-row equality with the full replay — every column, including
    // lookahead cells that straddle the boundary in BOTH directions
    // (history rows completed by live ticks, live rows completed later)
    warm.foreach { case (ts, wr) =>
      val rr = replay(ts)
      outCols.foreach { c =>
        assert(norm(wr.getAs[Any](c)) == norm(rr.getAs[Any](c)),
          s"$c mismatch at ts=$ts (warm vs full replay)")
      }
    }
  }

  test("mixed output equals the dedicated latency-K streams column-for-column") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val bars = Graft
      .bars(spark, TestSpark.sfDir)
      .select(
        col("series_id").cast("string").as("series_id"),
        unix_date(col("ts")).cast("long").as("ts"),
        col("open"), col("high"), col("low"), col("close"), col("volume")
      )
    val ticks = bars.as[StreamingTa.BarTick].collect().sortBy(_.ts)

    val ms1 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[StreamingTa.BarTick]
    val q1 = StreamingTa
      .ichimokuStream(ms1.toDS(), 3, 5, 8, 5)
      .writeStream.format("memory").queryName("dedicated_ichi").outputMode("append").start()
    ms1.addData(ticks.toSeq); q1.processAllAvailable(); q1.stop()

    val ms2 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[StreamingTa.BarTick]
    val q2 = StreamingTa
      .strategyStream(ms2.toDS(), Strategy("ichi-only", Seq(
        IndicatorSpec("ichimoku", Map("tenkan" -> 3, "kijun" -> 5, "senkou" -> 8, "shift" -> 5)))))
      .writeStream.format("memory").queryName("mixed_ichi").outputMode("append").start()
    ms2.addData(ticks.toSeq); q2.processAllAvailable(); q2.stop()

    val ded = spark.table("dedicated_ichi").collect().map(r => r.getAs[Long]("ts") -> r).toMap
    val mix = spark.table("mixed_ichi").collect().map(r => r.getAs[Long]("ts") -> r).toMap
    assert(mix.keySet == ded.keySet)
    mix.foreach { case (ts, mr) =>
      Seq("its_3", "iks_5", "isa_3", "isb_5", "ics_5").foreach { c =>
        assert(norm(mr.getAs[Any](c)) == norm(ded(ts).getAs[Any](c)), s"$c @ts=$ts")
      }
    }
  }
}
