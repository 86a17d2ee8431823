package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.StreamingTa
import graft.ta.Ta._
import java.nio.file.Files

/** Round-11: the two LOOKAHEAD kinds stream under an explicit
  * emit-with-latency-K contract — row t emits COMPLETE (chikou / centered
  * sma included) once tick t+K lands. Parity: every emitted row equals the
  * batch computation at that ts, and exactly the stream head's last K rows
  * are pending (never emitted on a finite replay). */
class IchimokuStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def streamOf(ticks: Array[StreamingTa.BarTick], prefix: String) = {
    import spark.implicits._
    val srcDir = Files.createTempDirectory(prefix).toFile
    ticks.grouped(7).zipWithIndex.foreach { case (chunk, i) =>
      spark.createDataset(chunk.toSeq).coalesce(1).write.parquet(s"$srcDir/c$i")
      val f = new java.io.File(s"$srcDir/c$i").listFiles().filter(_.getName.endsWith(".parquet")).head
      Files.copy(f.toPath, new java.io.File(srcDir, f"k$i%03d.parquet").toPath)
      Thread.sleep(20)
    }
    spark.readStream
      .schema("series_id STRING, ts BIGINT, open DOUBLE, high DOUBLE, low DOUBLE, close DOUBLE, volume DOUBLE")
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir.getAbsolutePath)
      .as[StreamingTa.BarTick]
  }

  private def norm(v: Any): Any = v match {
    case null => null
    case d: Double => math.rint(d * 1e6) / 1e6
    case other => other
  }

  test("ichimokuStream emits each row complete at t+shiftN and equals batch ichimoku") {
    import spark.implicits._
    val bars = Graft
      .bars(spark, TestSpark.sfDir)
      .select(
        col("series_id").cast("string").as("series_id"),
        unix_date(col("ts")).cast("long").as("ts"),
        col("open"), col("high"), col("low"), col("close"), col("volume")
      )
    val ticks = bars.as[StreamingTa.BarTick].collect().sortBy(_.ts)
    // short spans so the 30-row fixture exercises the gates AND emits rows
    val (tn, kn, sn, sh) = (3, 5, 8, 5)

    val q = StreamingTa
      .ichimokuStream(streamOf(ticks, "graft_ichistream"), tn, kn, sn, sh)
      .writeStream.format("memory").queryName("ichi_stream").outputMode("append").start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("ichi_stream").collect().map(r => r.getAs[Long]("ts") -> r).toMap
    // exactly the last `sh` rows are pending
    assert(streamed.size == ticks.length - sh, s"expected ${ticks.length - sh} emitted rows")

    val batch = bars.ta.ichimoku(tn, kn, sn, sh).orderBy("ts").collect()
    val cols = Seq(s"its_$tn", s"iks_$kn", s"isa_$tn", s"isb_$kn", s"ics_$kn")
    batch.dropRight(sh).foreach { br =>
      val sr = streamed(br.getAs[Long]("ts"))
      cols.foreach { c0 =>
        assert(
          norm(sr.getAs[Any](c0)) == norm(br.getAs[Any](c0)),
          s"$c0 mismatch at ts=${br.getAs[Long]("ts")}")
      }
    }
  }

  test("dpoCenteredStream emits each row complete at t+K and equals batch centered dpo") {
    import spark.implicits._
    val bars = Graft
      .bars(spark, TestSpark.sfDir)
      .select(
        col("series_id").cast("string").as("series_id"),
        unix_date(col("ts")).cast("long").as("ts"),
        col("open"), col("high"), col("low"), col("close"), col("volume")
      )
    val ticks = bars.as[StreamingTa.BarTick].collect().sortBy(_.ts)
    val n = 10; val k = n / 2 + 1

    val q = StreamingTa
      .dpoCenteredStream(streamOf(ticks, "graft_dpostream"), n)
      .writeStream.format("memory").queryName("dpo_stream").outputMode("append").start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("dpo_stream").collect().map(r => r.getAs[Long]("ts") -> r).toMap
    assert(streamed.size == ticks.length - k)

    val batch = bars.ta.dpo(n, centered = true).orderBy("ts").collect()
    batch.dropRight(k).foreach { br =>
      val sr = streamed(br.getAs[Long]("ts"))
      assert(
        norm(sr.getAs[Any](s"dpo_$n")) == norm(br.getAs[Any](s"dpo_$n")),
        s"dpo_$n mismatch at ts=${br.getAs[Long]("ts")}")
    }
  }
}
