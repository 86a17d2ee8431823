package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.StreamingTa
import graft.ta.{registry, IndicatorSpec, Strategy}
import java.nio.file.Files

/** Round-11 verdict item #2 (restart half): strategyStream state survives a
  * query KILL + RESUME from the checkpoint. The state store round-trips the
  * kryo-encoded kernel array across the restart; the resumed query must
  * continue every indicator exactly where the killed one stopped — output
  * over both runs equals the one-shot batch run row-for-row.
  *
  * RESTART CONTRACT (documented here and in SCALING.md): resume requires
  * the SAME kernel/stage classes — the state encoding (kryo, like the
  * javaSerialization it replaced) is class-coupled, so a code change to any
  * kernel class between runs invalidates the checkpoint; drain (stop at a
  * batch boundary, land output, restart fresh with a warm-up replay) is the
  * upgrade path. */
class StreamingRestartSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("strategyStream kill + resume from checkpoint equals the one-shot batch run") {
    import spark.implicits._
    val bars = Graft
      .bars(spark, TestSpark.sfDir)
      .select(
        col("series_id").cast("string").as("series_id"),
        unix_date(col("ts")).cast("long").as("ts"),
        col("open"), col("high"), col("low"), col("close"), col("volume")
      )
    val ticks = bars.as[StreamingTa.BarTick].collect().sortBy(_.ts)
    val srcDir = Files.createTempDirectory("graft_restart_src").toFile
    val ckpt = Files.createTempDirectory("graft_restart_ckpt").toFile
    val outDir = Files.createTempDirectory("graft_restart_out").toFile

    def writeChunk(chunk: Seq[StreamingTa.BarTick], name: String): Unit = {
      spark.createDataset(chunk).coalesce(1).write.parquet(s"$srcDir/$name-tmp")
      val f = new java.io.File(s"$srcDir/$name-tmp").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(f.toPath, new java.io.File(srcDir, s"$name.parquet").toPath)
      Thread.sleep(20)
    }

    val st = Strategy("restart4", Seq(
      IndicatorSpec("ema", Map("length" -> 10)),
      IndicatorSpec("rsi", Map("length" -> 10)),
      IndicatorSpec("atr", Map("length" -> 10)),
      IndicatorSpec("psar")
    ))

    def startQuery() = {
      val stream = spark.readStream
        .schema("series_id STRING, ts BIGINT, open DOUBLE, high DOUBLE, low DOUBLE, close DOUBLE, volume DOUBLE")
        .option("maxFilesPerTrigger", "1")
        .parquet(srcDir.getAbsolutePath)
      StreamingTa
        .strategyStream(stream.as[StreamingTa.BarTick], st)
        .writeStream
        .format("parquet")
        .option("path", outDir.getAbsolutePath)
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .outputMode("append")
        .start()
    }

    // run 1: first half of the ticks, mid-warmup for every indicator
    val (firstHalf, secondHalf) = ticks.splitAt(ticks.length / 2)
    firstHalf.grouped(5).zipWithIndex.foreach { case (c, i) => writeChunk(c.toSeq, f"a$i%03d") }
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop() // KILL mid-stream — state lives only in the checkpoint now

    // run 2: a brand-new query object resumes from the checkpoint
    secondHalf.grouped(5).zipWithIndex.foreach { case (c, i) => writeChunk(c.toSeq, f"b$i%03d") }
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()

    def norm(v: Any): Any = v match {
      case null => null
      case d: Double => math.rint(d * 1e6) / 1e6
      case other => other
    }
    val streamed = spark.read.parquet(outDir.getAbsolutePath).collect()
      .map(r => r.getAs[Long]("ts") -> r).toMap
    assert(streamed.size == ticks.length, "resumed run must emit exactly the remaining ticks once")

    val batch = registry.strategy(bars, st).orderBy("ts").collect()
    val outCols = streamed.values.head.schema.fieldNames.filterNot(Set("series_id", "ts"))
    assert(batch.length == ticks.length)
    batch.foreach { br =>
      val sr = streamed(br.getAs[Long]("ts"))
      outCols.foreach { c0 =>
        assert(
          norm(sr.getAs[Any](c0)) == norm(br.getAs[Any](c0)),
          s"$c0 mismatch at ts=${br.getAs[Long]("ts")} — state did not survive the restart")
      }
    }
  }
}
