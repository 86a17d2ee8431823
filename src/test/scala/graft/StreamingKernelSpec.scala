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
}
