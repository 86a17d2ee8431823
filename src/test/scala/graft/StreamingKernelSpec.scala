package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.StreamingTa
import graft.ta.Ta._
import java.nio.file.Files

/** Streaming REC kernels must equal the batch mapPartitions pass. */
class StreamingKernelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streamed psar kernel equals batch psar") {
    import spark.implicits._
    val bars = Graft
      .bars(spark, TestSpark.sfDir)
      .select(
        col("series_id").cast("string").as("series_id"),
        unix_date(col("ts")).cast("long").as("ts"),
        col("open"), col("high"), col("low"), col("close"), col("volume")
      )
    val ticks = bars.as[StreamingTa.BarTick].collect().sortBy(_.ts)

    val srcDir = Files.createTempDirectory("graft_kstream").toFile
    ticks.grouped(10).zipWithIndex.foreach { case (chunk, i) =>
      spark.createDataset(chunk.toSeq).coalesce(1).write.parquet(s"$srcDir/c$i")
      val f = new java.io.File(s"$srcDir/c$i").listFiles().filter(_.getName.endsWith(".parquet")).head
      Files.copy(f.toPath, new java.io.File(srcDir, f"k$i%03d.parquet").toPath)
      Thread.sleep(20)
    }

    val stream = spark.readStream
      .schema("series_id STRING, ts BIGINT, open DOUBLE, high DOUBLE, low DOUBLE, close DOUBLE, volume DOUBLE")
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir.getAbsolutePath)
      .as[StreamingTa.BarTick]

    val q = StreamingTa
      .kernelStream(stream, () => new graft.ta.rec.Psar())
      .writeStream
      .format("memory")
      .queryName("psar_stream")
      .outputMode("append")
      .start()
    q.processAllAvailable()
    q.stop()

    def r6(v: Option[Double]) = v.map(x => math.rint(x * 1e6) / 1e6)
    val streamed = spark
      .table("psar_stream")
      .as[StreamingTa.KernelOut]
      .collect()
      .map(k => k.ts -> k.values.take(3).map(r6))
      .toMap

    val batch = bars.ta.psar().orderBy("ts").collect()
    assert(streamed.size == batch.length)
    batch.foreach { r =>
      val exp = Seq("psar_long", "psar_short", "psar_af").map { c0 =>
        r6(Option(r.getAs[Any](c0)).map(_.asInstanceOf[Double]))
      }
      assert(streamed(r.getAs[Long]("ts")) == exp, s"mismatch at ts=${r.getAs[Long]("ts")}")
    }
  }

  test("batched kernel stream equals batch for ALL REC kernels (14 + fixed-ref cusum), typed") {
    import spark.implicits._
    import graft.ta.{registry, IndicatorSpec}
    val bars = Graft
      .bars(spark, TestSpark.sfDir)
      .select(
        col("series_id").cast("string").as("series_id"),
        unix_date(col("ts")).cast("long").as("ts"),
        col("open"), col("high"), col("low"), col("close"), col("volume")
      )
    val ticks = bars.as[StreamingTa.BarTick].collect().sortBy(_.ts)

    val srcDir = Files.createTempDirectory("graft_k14stream").toFile
    ticks.grouped(10).zipWithIndex.foreach { case (chunk, i) =>
      spark.createDataset(chunk.toSeq).coalesce(1).write.parquet(s"$srcDir/c$i")
      val f = new java.io.File(s"$srcDir/c$i").listFiles().filter(_.getName.endsWith(".parquet")).head
      Files.copy(f.toPath, new java.io.File(srcDir, f"k$i%03d.parquet").toPath)
      Thread.sleep(20)
    }

    val stream = spark.readStream
      .schema("series_id STRING, ts BIGINT, open DOUBLE, high DOUBLE, low DOUBLE, close DOUBLE, volume DOUBLE")
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir.getAbsolutePath)
      .as[StreamingTa.BarTick]

    // the strategy_ohlcv_batch param set — every REC kind, incl. the four
    // with window-derived staging (fisher, hilo, td_seq, qqe)
    val specs14 = Seq(
      IndicatorSpec("psar"),
      IndicatorSpec("supertrend", Map("length" -> 7)),
      IndicatorSpec("ha"),
      IndicatorSpec("mcgd", Map("length" -> 10)),
      IndicatorSpec("ssf", Map("length" -> 10)),
      IndicatorSpec("hwma"),
      IndicatorSpec("fisher", Map("length" -> 9)),
      IndicatorSpec("hilo"),
      IndicatorSpec("qqe", Map("length" -> 6, "smooth" -> 3)),
      IndicatorSpec("rsx", Map("length" -> 10)),
      IndicatorSpec("td_seq"),
      IndicatorSpec("ebsw", Map("length" -> 20, "bars" -> 10)),
      IndicatorSpec("hwc"),
      IndicatorSpec("jma", Map("length" -> 7)),
      IndicatorSpec("kalman", Map("q" -> 0.05, "r" -> 1.0)),
      // fixed-reference CUSUM — the causal, streamable mode (trained μ/σ
      // ride as literals in both the batch lowering and the stream stage)
      IndicatorSpec("cusum", Map("mu" -> 100.0, "sd" -> 10.0, "k" -> 0.25, "h" -> 3.0))
    )
    val sks = specs14.map(s => StreamingTa.recStream(s).getOrElse(fail(s"no recStream for ${s.kind}")))

    val q = StreamingTa
      .kernelBatchStream(stream, sks)
      .writeStream
      .format("memory")
      .queryName("k14_stream")
      .outputMode("append")
      .start()
    q.processAllAvailable()
    q.stop()

    // typed value compare: doubles at 6 dp, integral types exact
    def norm(v: Any): Any = v match {
      case null => null
      case d: Double => math.rint(d * 1e6) / 1e6
      case other => other
    }
    val streamed = spark.table("k14_stream").collect().map(r => r.getAs[Long]("ts") -> r).toMap
    assert(streamed.size == ticks.length)

    specs14.foreach { spec =>
      val (stagefn, outs, make) = registry.recKernel(spec).get
      val batch = graft.ta.rec.perSeries(stagefn(bars), outs)(make).orderBy("ts").collect()
      batch.foreach { br =>
        val sr = streamed(br.getAs[Long]("ts"))
        outs.foreach { f =>
          // schema parity too: the streamed column keeps the declared type
          assert(sr.schema(f.name).dataType == f.dataType, s"${spec.kind}/${f.name} type")
          assert(
            norm(sr.getAs[Any](f.name)) == norm(br.getAs[Any](f.name)),
            s"${spec.kind}/${f.name} mismatch at ts=${br.getAs[Long]("ts")}"
          )
        }
      }
    }
  }

  test("W-class + EW-fold window stream equals batch for the top rolling kinds") {
    // round-5 coverage: sma/wma/stdev/zscore/mom/roc/midpoint/midprice/
    // willr/linreg through the SAME kernelBatchStream pass (ring-buffer
    // WStage + pass-through kernel), alongside a REC kernel to prove the
    // two families compose in one stateful pass. Round 9 adds ema/rsi
    // (EwStage — the streaming twins of the SeededComposites fold
    // kernels EmaSeeded/RsiSeeded): the batch reference below builds
    // them through the registry, i.e. the FOLD accessor path, so
    // fold ≡ stream is asserted DIRECTLY here, not transitively
    // through the staged spellings (round-8 verdict item).
    import spark.implicits._
    import graft.ta.{registry, IndicatorSpec}
    val bars = Graft
      .bars(spark, TestSpark.sfDir)
      .select(
        col("series_id").cast("string").as("series_id"),
        unix_date(col("ts")).cast("long").as("ts"),
        col("open"), col("high"), col("low"), col("close"), col("volume")
      )
    val ticks = bars.as[StreamingTa.BarTick].collect().sortBy(_.ts)

    val srcDir = Files.createTempDirectory("graft_wstream").toFile
    ticks.grouped(10).zipWithIndex.foreach { case (chunk, i) =>
      spark.createDataset(chunk.toSeq).coalesce(1).write.parquet(s"$srcDir/c$i")
      val f = new java.io.File(s"$srcDir/c$i").listFiles().filter(_.getName.endsWith(".parquet")).head
      Files.copy(f.toPath, new java.io.File(srcDir, f"w$i%03d.parquet").toPath)
      Thread.sleep(20)
    }
    val stream = spark.readStream
      .schema("series_id STRING, ts BIGINT, open DOUBLE, high DOUBLE, low DOUBLE, close DOUBLE, volume DOUBLE")
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir.getAbsolutePath)
      .as[StreamingTa.BarTick]

    val wSpecs = Seq(
      IndicatorSpec("sma", Map("length" -> 10)),
      IndicatorSpec("wma", Map("length" -> 10)),
      IndicatorSpec("stdev", Map("length" -> 10)),
      IndicatorSpec("zscore", Map("length" -> 10)),
      IndicatorSpec("mom", Map("length" -> 10)),
      IndicatorSpec("roc", Map("length" -> 10)),
      IndicatorSpec("midpoint", Map("length" -> 10)),
      IndicatorSpec("midprice", Map("length" -> 10)),
      IndicatorSpec("willr", Map("length" -> 10)),
      IndicatorSpec("linreg", Map("length" -> 10)),
      IndicatorSpec("ema", Map("length" -> 10)),
      IndicatorSpec("rsi", Map("length" -> 10)),
      IndicatorSpec("dema", Map("length" -> 10)),
      IndicatorSpec("tema", Map("length" -> 10)),
      IndicatorSpec("macd", Map("fast" -> 12, "slow" -> 26, "signal" -> 9)),
      // round-10 Wilder-composite twins — batch reference goes through
      // registry → the SeededComposites folds, so fold ≡ stream is
      // asserted DIRECTLY for every Wilder composite
      IndicatorSpec("atr", Map("length" -> 10)),
      IndicatorSpec("natr", Map("length" -> 10)),
      IndicatorSpec("trix", Map("length" -> 10)),
      IndicatorSpec("tsi", Map("fast" -> 13, "slow" -> 25)),
      IndicatorSpec("adx", Map("length" -> 14, "lensig" -> 14)),
      IndicatorSpec("stoch", Map("k" -> 10, "smooth_k" -> 3, "d" -> 3)),
      IndicatorSpec("bbands", Map("length" -> 5, "std" -> 2.0)),
      IndicatorSpec("kc", Map("length" -> 20, "scalar" -> 2.0))
    )
    val sks = wSpecs.map(s => StreamingTa.windowStream(s).getOrElse(fail(s"no windowStream for ${s.kind}"))) :+
      StreamingTa.recStream(IndicatorSpec("ssf", Map("length" -> 10))).get

    val q = StreamingTa
      .kernelBatchStream(stream, sks)
      .writeStream
      .format("memory")
      .queryName("w10_stream")
      .outputMode("append")
      .start()
    q.processAllAvailable()
    q.stop()

    def norm(v: Any): Any = v match {
      case null => null
      case d: Double => math.rint(d * 1e6) / 1e6
      case other => other
    }
    val streamed = spark.table("w10_stream").collect().map(r => r.getAs[Long]("ts") -> r).toMap
    assert(streamed.size == ticks.length)

    // batch reference: the df.ta.* builder per kind (+ the ssf kernel)
    val batch = wSpecs
      .foldLeft(bars)((d, s) => registry(d, s))
      .orderBy("ts")
      .collect()
    val outCols = Seq(
      "sma_10", "wma_10", "stdev_10", "zscore_10", "mom_10", "roc_10",
      "midpoint_10", "midprice_10", "willr_10",
      "linreg_10_slope", "linreg_10_intercept", "linreg_10_tsf", "linreg_10_r",
      "ema_10", "rsi_10", "dema_10", "tema_10", "macd", "macds", "macdh",
      "atr_10", "natr_10", "trix_10", "tsi_13_25",
      "dmp_14", "dmn_14", "dip_14", "dim_14", "adx_14",
      "stoch_k", "stoch_d",
      "bbm_5_2", "bbl_5_2", "bbu_5_2", "bbb_5_2", "bbp_5_2",
      "kcb_20", "kcl_20", "kcu_20"
    )
    batch.foreach { br =>
      val sr = streamed(br.getAs[Long]("ts"))
      outCols.foreach { c0 =>
        assert(
          norm(sr.getAs[Any](c0)) == norm(br.getAs[Any](c0)),
          s"$c0 mismatch at ts=${br.getAs[Long]("ts")}"
        )
      }
    }
  }
}
