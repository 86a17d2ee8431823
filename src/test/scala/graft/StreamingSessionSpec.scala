package graft

import java.nio.file.Files
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingTa

/** Streaming sessionization ≡ batch Q50 session splits, session-for-
  * session. The replay is global event-time order chunked into files
  * (the ingestion contract); a far-future sentinel user in the last
  * chunk pushes the watermark so every open session's event-time
  * timeout fires and the tail sessions flush. */
class StreamingSessionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val gapUs = 30L * 60L * 1000000L

  test("streaming sessions equal the batch lag/sum-window sessionization") {
    import spark.implicits._
    val events = Graft
      .events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("ts_us"))
      .as[StreamingTa.SessEvent]
      .collect()
      .sortBy(_.ts_us)

    // batch reference: per-session rows via the q50 split logic
    val w = Window.partitionBy("user_id").orderBy("ts_us")
    val expected = Graft
      .events(spark, "/root/testdata/sf0.001")
      .withColumn(
        "new_s",
        when(col("ts_us") - lag("ts_us", 1).over(w) > gapUs, 1L).otherwise(lit(0L))
      )
      .withColumn("sid", sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid")
      .agg(min("ts_us").as("start_us"), max("ts_us").as("end_us"), count(lit(1)).as("n_events"))
      .select("user_id", "start_us", "end_us", "n_events")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

    val sentinel = StreamingTa.SessEvent(-1L, events.last.ts_us + 10L * gapUs)
    val chunks: Seq[Seq[StreamingTa.SessEvent]] =
      events.grouped(math.ceil(events.length / 3.0).toInt).map(_.toSeq).toSeq :+ Seq(sentinel)

    val srcDir = Files.createTempDirectory("graft_sess_src").toFile
    chunks.zipWithIndex.foreach { case (chunk, i) =>
      val tmp = Files.createTempDirectory("graft_sess_c").toFile
      spark.createDataset(chunk).coalesce(1).write.parquet(s"$tmp/p")
      val f = new java.io.File(s"$tmp/p").listFiles().filter(_.getName.endsWith(".parquet")).head
      Files.copy(f.toPath, new java.io.File(srcDir, f"chunk$i%03d.parquet").toPath)
      Thread.sleep(20) // distinct mod times → deterministic file order
    }

    val stream = spark.readStream
      .schema("user_id BIGINT, ts_us BIGINT")
      .option("maxFilesPerTrigger", "1")
      .option("latestFirst", "false")
      .parquet(srcDir.getAbsolutePath)
      .as[StreamingTa.SessEvent]

    val q = StreamingTa
      .sessionsStream(stream, gapUs)
      .writeStream
      .format("memory")
      .queryName("sess_parity")
      .outputMode("append")
      .start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark
      .table("sess_parity")
      .where(col("user_id") >= 0)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

    assert(
      streamed == expected,
      s"missing=${(expected -- streamed).take(5)} spurious=${(streamed -- expected).take(5)}"
    )
    assert(expected.size > events.map(_.user_id).distinct.length, "every user in one session; gap split vacuous")
  }

  test("stream-static as-of enrichment equals batch AsofJoin backward") {
    import spark.implicits._
    val ser = Graft
      .userSeries(spark, TestSpark.sfDir)
      .select(
        col("series_id").cast("string").as("series_id"),
        col("ts").cast("long").as("ts"),
        col("close").cast("double").as("close")
      )
    // dimension side: every 10th row per series plays the quote table
    val dim = ser.where(pmod(col("ts"), lit(10L)) === 0 || col("ts") % 7 === 0)
      .select(col("series_id"), col("ts"), col("close").as("quote"))
    val batch = graft.operators.AsofJoin
      .asof(ser, dim, "series_id", "ts", Seq("quote"), prefix = "r_")
      .select("series_id", "ts", "r_quote")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> Option(r.get(2)).map(_.asInstanceOf[Double]))
      .toMap

    // the streaming twin maps tick-by-tick over the broadcast dim
    val ticks = ser.as[StreamingTa.Tick]
    val streamed = StreamingTa
      .asofEnrichStream(ticks, dim, "series_id", "ts", "quote", "r_quote")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> Option(r.get(3)).map(_.asInstanceOf[Double]))
      .toMap
    assert(streamed.size == batch.size)
    assert(streamed == batch)
    assert(batch.values.exists(_.isEmpty) || dim.count() > 0, "vacuous")

    // the dimension assumption is enforced: an over-ceiling right side
    // must fail loudly BEFORE the driver collect, pointing at the batch
    // path — not OOM mid-collect
    val oversized = intercept[IllegalArgumentException] {
      StreamingTa.asofEnrichStream(ticks, dim, "series_id", "ts", "quote", "r_quote", maxDimRows = 1L)
    }
    assert(oversized.getMessage.contains("AsofJoin"), s"guard message unhelpful: ${oversized.getMessage}")
  }
}
