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

  test("batched kernel stream (psar + ha + mcgd) equals the batch perSeriesBatch pass") {
    import spark.implicits._
    val bars = Graft
      .bars(spark, TestSpark.sfDir)
      .select(
        col("series_id").cast("string").as("series_id"),
        unix_date(col("ts")).cast("long").as("ts"),
        col("open"), col("high"), col("low"), col("close"), col("volume")
      )
    val ticks = bars.as[StreamingTa.BarTick].collect().sortBy(_.ts)

    val srcDir = Files.createTempDirectory("graft_kbstream").toFile
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

    val makes: Seq[() => graft.ta.rec.Kernel] =
      Seq(() => new graft.ta.rec.Psar(), () => new graft.ta.rec.HeikinAshi, () => new graft.ta.rec.Mcgd(10, "close"))
    val q = StreamingTa
      .kernelBatchStream(stream, makes)
      .writeStream
      .format("memory")
      .queryName("kbatch_stream")
      .outputMode("append")
      .start()
    q.processAllAvailable()
    q.stop()

    def r6(v: Option[Double]) = v.map(x => math.rint(x * 1e6) / 1e6)
    val streamed = spark
      .table("kbatch_stream")
      .as[StreamingTa.KernelOut]
      .collect()
      .map(k => k.ts -> k.values.map(r6))
      .toMap

    import org.apache.spark.sql.types.{DoubleType, IntegerType, StructField}
    val outs = Seq(
      StructField("psar_long", DoubleType, nullable = true),
      StructField("psar_short", DoubleType, nullable = true),
      StructField("psar_af", DoubleType, nullable = true),
      StructField("psar_reversal", IntegerType, nullable = true),
      StructField("ha_open", DoubleType, nullable = true),
      StructField("ha_high", DoubleType, nullable = true),
      StructField("ha_low", DoubleType, nullable = true),
      StructField("ha_close", DoubleType, nullable = true),
      StructField("mcgd_10", DoubleType, nullable = true)
    )
    val batch = graft.ta.rec
      .perSeriesBatch(bars, makes.zipWithIndex.map { case (mk, i) =>
        (if (i == 0) outs.take(4) else if (i == 1) outs.slice(4, 8) else outs.drop(8)) -> mk
      }.map(p => (p._1, p._2)))
      .orderBy("ts")
      .collect()
    assert(streamed.size == batch.length)
    batch.foreach { r =>
      val exp = outs.map { f =>
        r6(Option(r.getAs[Any](f.name)).map {
          case d: Double => d
          case i: Int => i.toDouble
        })
      }
      assert(streamed(r.getAs[Long]("ts")) == exp, s"mismatch at ts=${r.getAs[Long]("ts")}")
    }
  }
}
