package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.StreamingTa
import graft.ta.{registry, IndicatorSpec, Strategy}
import java.nio.file.Files

/** Round-11 production validation: at 100k+ series the default
  * HDFSBackedStateStoreProvider keeps every series' state on the executor
  * HEAP (and full-snapshot checkpoints); the production choice is the
  * RocksDB provider (off-heap, incremental changelog checkpoints). This
  * spec proves the engine's kryo-encoded kernel state round-trips through
  * RocksDB identically — strategyStream parity re-asserted under
  * `spark.sql.streaming.stateStore.providerClass = RocksDBStateStoreProvider`.
  * README documents the recommendation. */
class StreamingRocksDbSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("strategyStream on the RocksDB state store equals batch (kryo state round-trips)") {
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(
      key, "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val bars = Graft
        .bars(spark, TestSpark.sfDir)
        .select(
          col("series_id").cast("string").as("series_id"),
          unix_date(col("ts")).cast("long").as("ts"),
          col("open"), col("high"), col("low"), col("close"), col("volume")
        )
      val ticks = bars.as[StreamingTa.BarTick].collect().sortBy(_.ts)
      val srcDir = Files.createTempDirectory("graft_rocksdb").toFile
      ticks.grouped(6).zipWithIndex.foreach { case (chunk, i) =>
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

      // mixed families: fold twins, a ring stage, a REC kernel, a candle wave
      val st = Strategy("rocks5", Seq(
        IndicatorSpec("ema", Map("length" -> 10)),
        IndicatorSpec("atr", Map("length" -> 10)),
        IndicatorSpec("sma", Map("length" -> 10)),
        IndicatorSpec("psar"),
        IndicatorSpec("cdl_pattern")
      ))
      val q = StreamingTa
        .strategyStream(stream, st)
        .writeStream.format("memory").queryName("rocksdb_stream").outputMode("append").start()
      q.processAllAvailable()
      q.stop()

      def norm(v: Any): Any = v match {
        case null => null
        case d: Double => math.rint(d * 1e6) / 1e6
        case other => other
      }
      val streamed = spark.table("rocksdb_stream").collect().map(r => r.getAs[Long]("ts") -> r).toMap
      assert(streamed.size == ticks.length)
      val batch = registry.strategy(bars, st).orderBy("ts").collect()
      val outCols = streamed.values.head.schema.fieldNames.filterNot(Set("series_id", "ts"))
      batch.foreach { br =>
        val sr = streamed(br.getAs[Long]("ts"))
        outCols.foreach { c0 =>
          assert(
            norm(sr.getAs[Any](c0)) == norm(br.getAs[Any](c0)),
            s"$c0 mismatch at ts=${br.getAs[Long]("ts")} under RocksDB state store")
        }
      }
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
