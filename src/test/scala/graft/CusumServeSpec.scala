package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.StreamingTa
import graft.ta.Ta._
import java.nio.file.Files

/** Round-11: the trained-stats CUSUM mode streams as TRAIN-THEN-SERVE —
  * per-series μ/σ trained on batch history, recursion warm-started through
  * it, live ticks served against the fixed trained stats. Two synthetic
  * series with different μ/σ prove the per-series treatment; the reference
  * is the batch fixed-ref cusum (mu/sd pinned to each series' trained
  * values) over history+live, compared on the live rows. */
class CusumServeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("cusumTrainedStream equals batch fixed-ref cusum continued across the training cut") {
    import spark.implicits._
    // two series, different scales, a level shift inside the live half
    val ticks = (0 until 100).flatMap { i =>
      Seq(
        StreamingTa.BarTick("A", i.toLong, 0, 0, 0, 100.0 + 5.0 * math.sin(i / 3.0) + (if (i > 80) 25.0 else 0.0), 0),
        StreamingTa.BarTick("B", i.toLong, 0, 0, 0, 10.0 + 0.5 * math.cos(i / 5.0) + (if (i > 85) -4.0 else 0.0), 0)
      )
    }.toArray
    val (hist, live) = (ticks.filter(_.ts < 60), ticks.filter(_.ts >= 60))
    val history = spark.createDataset(hist.toSeq)

    val srcDir = Files.createTempDirectory("graft_cusumserve").toFile
    live.grouped(16).zipWithIndex.foreach { case (chunk, i) =>
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

    val (k, h) = (0.25, 3.0)
    val q = StreamingTa
      .cusumTrainedStream(stream, history, k, h)
      .writeStream.format("memory").queryName("cusum_serve").outputMode("append").start()
    q.processAllAvailable()
    q.stop()

    def norm(v: Any): Any = v match {
      case null => null
      case d: Double => math.rint(d * 1e6) / 1e6
      case other => other
    }
    val streamed = spark.table("cusum_serve").collect()
      .map(r => (r.getString(0), r.getAs[Long]("ts")) -> r).toMap
    assert(streamed.size == live.length)
    // the live shift must actually fire alarms, else the test is vacuous
    assert(streamed.values.count(_.getAs[Any]("cusum_alarm") == 1L) > 0, "no alarms fired")

    // reference per series: trained stats on history (the exact trained-mode
    // aggregate), then batch fixed-ref cusum over history+live
    Seq("A", "B").foreach { sid =>
      val histS = history.where(col("series_id") === sid)
      val st = histS.agg(
        round(avg(col("close")), 6), round(stddev_samp(col("close")), 6)).head()
      val (mu, sd) = (st.getDouble(0), st.getDouble(1))
      val full = spark.createDataset(ticks.filter(_.series_id == sid).toSeq).toDF()
      val batch = full.ta.cusum(k, h, "close", Some(mu), Some(sd))
        .where(col("ts") >= 60).orderBy("ts").collect()
      batch.foreach { br =>
        val sr = streamed((sid, br.getAs[Long]("ts")))
        Seq("cusum_pos", "cusum_neg", "cusum_alarm").foreach { c0 =>
          assert(
            norm(sr.getAs[Any](c0)) == norm(br.getAs[Any](c0)),
            s"$sid/$c0 @ts=${br.getAs[Long]("ts")}")
        }
      }
    }
  }

  test("maxSeries broadcast guard fires at the boundary, before the collect") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val hist = spark.createDataset(
      Seq("A", "B", "C").flatMap(sid =>
        (0 until 5).map(i => StreamingTa.BarTick(sid, i.toLong, 0, 0, 0, i.toDouble, 0))))
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[StreamingTa.BarTick]
    // 3 series > maxSeries=2: rejected at plan time (the count runs before
    // the collect, so the driver never materializes the over-limit map)
    val ex = intercept[IllegalArgumentException] {
      StreamingTa.cusumTrainedStream(ms.toDS(), hist, maxSeries = 2L)
    }
    assert(ex.getMessage.contains("maxSeries=2"))
    // exactly at the ceiling: accepted
    StreamingTa.cusumTrainedStream(ms.toDS(), hist, maxSeries = 3L)
  }
}
