package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.StreamingTa
import graft.ta.{registry, IndicatorSpec, Strategy}
import java.nio.file.Files

/** Round-11: WARM-START — strategyStreamWarm bootstraps per-series state
  * from batch history (one shuffle + sorted per-series fold through the
  * same kernels) instead of replaying the history through micro-batches.
  * Gate: streaming ONLY the second half of the ticks, warm-started from
  * the first half, must equal the full batch run on the second half
  * row-for-row — i.e. the bootstrapped state is exactly the state a full
  * replay would have produced. */
class StreamingBootstrapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("strategyStreamWarm from batch history equals the full-replay state") {
    import spark.implicits._
    val bars = Graft
      .bars(spark, TestSpark.sfDir)
      .select(
        col("series_id").cast("string").as("series_id"),
        unix_date(col("ts")).cast("long").as("ts"),
        col("open"), col("high"), col("low"), col("close"), col("volume")
      )
    val ticks = bars.as[StreamingTa.BarTick].collect().sortBy(_.ts)
    val (hist, live) = ticks.splitAt(ticks.length / 2)

    // mid-warm-up split: state carries seed sums, Wilder accumulators, a
    // REC kernel, rings — all must cross the bootstrap boundary intact
    val st = Strategy("warm5", Seq(
      IndicatorSpec("ema", Map("length" -> 10)),
      IndicatorSpec("rsi", Map("length" -> 10)),
      IndicatorSpec("atr", Map("length" -> 10)),
      IndicatorSpec("sma", Map("length" -> 10)),
      IndicatorSpec("psar")
    ))

    val srcDir = Files.createTempDirectory("graft_warmstream").toFile
    live.grouped(5).zipWithIndex.foreach { case (chunk, i) =>
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

    val history = spark.createDataset(hist.toSeq)
    val q = StreamingTa
      .strategyStreamWarm(stream, st, history)
      .writeStream.format("memory").queryName("warm_stream").outputMode("append").start()
    q.processAllAvailable()
    q.stop()

    def norm(v: Any): Any = v match {
      case null => null
      case d: Double => math.rint(d * 1e6) / 1e6
      case other => other
    }
    val streamed = spark.table("warm_stream").collect().map(r => r.getAs[Long]("ts") -> r).toMap
    // only the live ticks emit — the history was folded, not replayed
    assert(streamed.size == live.length)

    val liveTs = live.map(_.ts).toSet
    val batch = registry.strategy(bars, st).orderBy("ts").collect()
      .filter(r => liveTs(r.getAs[Long]("ts")))
    val outCols = streamed.values.head.schema.fieldNames.filterNot(Set("series_id", "ts"))
    assert(batch.length == live.length)
    batch.foreach { br =>
      val sr = streamed(br.getAs[Long]("ts"))
      outCols.foreach { c0 =>
        assert(
          norm(sr.getAs[Any](c0)) == norm(br.getAs[Any](c0)),
          s"$c0 mismatch at ts=${br.getAs[Long]("ts")} — bootstrapped state diverges from full replay")
      }
    }
  }
}
