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

  test("warm-start refuses lookahead specs with a pointer to the cold path") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[StreamingTa.BarTick]
    val hist = spark.createDataset(Seq(StreamingTa.BarTick("A", 1L, 1, 1, 1, 1, 1)))
    val ex = intercept[IllegalArgumentException] {
      StreamingTa.strategyStreamWarm(ms.toDS(), st, hist)
    }
    assert(ex.getMessage.contains("strategyStream"))
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
