package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.StreamingTa
import java.nio.file.Files

/** SURVEY §5.2(5): streaming output must equal batch output for
  * non-lookahead indicators. Events are replayed as 3 in-order file
  * micro-batches (maxFilesPerTrigger=1) into flatMapGroupsWithState.
  */
class StreamingParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def round6(v: Option[Double]): Option[Double] =
    v.map(x => math.rint(x * 1e6) / 1e6).filterNot(d => d.isNaN || d.isInfinite)

  test("streaming ema/rma/rsi equals the batch pipeline") {
    import spark.implicits._
    val ser = Graft
      .userSeries(spark, TestSpark.sfDir)
      .select(col("series_id").cast("string").as("series_id"), col("ts").cast("long").as("ts"), col("close").cast("double").as("close"))
      .orderBy("ts")
    val ticks = ser
      .as[StreamingTa.Tick]
      .collect()
      .sortBy(t => (t.ts))

    // 3 chunk files in global ts order → per-key order holds too
    val dir = Files.createTempDirectory("graft_stream").toFile
    val chunks = ticks.grouped(math.ceil(ticks.length / 3.0).toInt).toSeq
    chunks.zipWithIndex.foreach { case (chunk, i) =>
      spark.createDataset(chunk).coalesce(1).write.parquet(s"$dir/c$i")
      Thread.sleep(20) // distinct mod times → deterministic file order
    }
    // move chunk files into one dir for the file source
    val srcDir = Files.createTempDirectory("graft_stream_src").toFile
    chunks.indices.foreach { i =>
      val f = new java.io.File(s"$dir/c$i").listFiles().filter(_.getName.endsWith(".parquet")).head
      Files.copy(f.toPath, new java.io.File(srcDir, f"chunk$i%03d.parquet").toPath)
      Thread.sleep(20)
    }

    val stream = spark.readStream
      .schema("series_id STRING, ts BIGINT, close DOUBLE")
      .option("maxFilesPerTrigger", "1")
      .option("latestFirst", "false")
      .parquet(srcDir.getAbsolutePath)
      .as[StreamingTa.Tick]

    val q = StreamingTa
      .indicators(stream, 10)
      .writeStream
      .format("memory")
      .queryName("ind_parity")
      .outputMode("append")
      .start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark
      .table("ind_parity")
      .collect()
      .map(r =>
        (r.getString(0), r.getLong(1)) -> (
          round6(Option(r.get(3)).map(_.asInstanceOf[Double])),
          round6(Option(r.get(4)).map(_.asInstanceOf[Double])),
          round6(Option(r.get(5)).map(_.asInstanceOf[Double]))
        )
      )
      .toMap

    // batch reference: stage.ema + rmaOf + rsi over the same series
    val batch = {
      val d0 = graft.ta.stage.ema(ser, "close", "ema_10", 10)
      val d1 = d0.withColumn("rma_10", graft.ta.prim.rmaOf(col("close"), 10))
      new graft.ta.Ta(d1).rsi(10)
    }.select("series_id", "ts", "ema_10", "rma_10", "rsi_10").collect()

    assert(streamed.size == batch.length, s"row counts differ: ${streamed.size} vs ${batch.length}")
    batch.foreach { r =>
      val key = (r.getString(0), r.getLong(1))
      val exp = (
        round6(Option(r.get(2)).map(_.asInstanceOf[Double])),
        round6(Option(r.get(3)).map(_.asInstanceOf[Double])),
        round6(Option(r.get(4)).map(_.asInstanceOf[Double]))
      )
      assert(streamed(key) == exp, s"mismatch at $key: stream=${streamed(key)} batch=$exp")
    }
  }

  test("streaming exact dedup keeps one row per text hash") {
    val srcDir = Files.createTempDirectory("graft_dedup_src").toFile
    Graft
      .table(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"), col("text"), current_timestamp().as("etime"))
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(srcDir.getAbsolutePath)

    val stream = spark.readStream
      .schema("doc_id BIGINT, text STRING, etime TIMESTAMP")
      .parquet(srcDir.getAbsolutePath)
    val q = graft.streaming.StreamingTa
      .dedupStream(stream, "etime")
      .writeStream
      .format("memory")
      .queryName("dedup_stream")
      .outputMode("append")
      .start()
    q.processAllAvailable()
    q.stop()

    val kept = spark.table("dedup_stream").count()
    val distinct = Graft.table(spark, TestSpark.sfDir, "documents").select("text").distinct().count()
    assert(kept == distinct)
  }

  test("streaming MinHash-LSH candidates equal the batch bucket self-join") {
    import spark.implicits._
    import graft.extensions.TextOps
    val (k, bands, rowsPerBand) = (3, 8, 4)
    val docs = Graft
      .table(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))

    // batch candidate set: same banding expressions, bucket self-join with
    // arrival order = doc_id order
    val banded = docs
      .select(col("doc_id"), TextOps.minhashSig(col("text"), k).as("sig"))
      .where(col("sig").isNotNull)
      .select(
        col("doc_id"),
        explode(
          array((0 until bands).map { b =>
            concat(
              lit(s"$b:"),
              concat_ws(",", slice(col("sig"), b * rowsPerBand + 1, rowsPerBand).cast("array<string>"))
            )
          }: _*)
        ).as("bucket")
      )
    val batchPairs = banded
      .as("x")
      .join(banded.as("y"), "bucket")
      .where(col("x.doc_id") < col("y.doc_id"))
      .select(col("bucket"), col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet

    // replay the docs as 3 in-doc_id-order micro-batches
    val rows = docs.orderBy("doc_id").collect()
    val srcDir = Files.createTempDirectory("graft_lsh_stream").toFile
    rows.grouped((rows.length + 2) / 3).zipWithIndex.foreach { case (chunk, i) =>
      spark
        .createDataFrame(java.util.Arrays.asList(chunk: _*), docs.schema)
        .coalesce(1)
        .write
        .parquet(s"$srcDir/c$i")
      val f = new java.io.File(s"$srcDir/c$i").listFiles().filter(_.getName.endsWith(".parquet")).head
      Files.copy(f.toPath, new java.io.File(srcDir, f"l$i%03d.parquet").toPath)
      Thread.sleep(20)
    }
    val stream = spark.readStream
      .schema("doc_id BIGINT, text STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir.getAbsolutePath)

    val q = StreamingTa
      .neardupCandidatesStream(stream, k, bands, rowsPerBand, maxBucket = 100000)
      .writeStream
      .format("memory")
      .queryName("lsh_stream")
      .outputMode("append")
      .start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark
      .table("lsh_stream")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(streamed == batchPairs, s"streamed ${streamed.size} vs batch ${batchPairs.size}")
    assert(batchPairs.nonEmpty, "vacuous: batch candidate set is empty")
  }

  test("streaming contamination equals the batch posting-join operator") {
    val docs = Graft.table(spark, TestSpark.sfDir, "documents")
    val train = docs.where(col("doc_id") % 20 =!= 3)
    val eval = docs.where(col("doc_id") % 20 === 3)
    val batch = graft.extensions.Dedup
      .contamination(train, eval, k = 5)
      .select(col("doc_id"), col("n_hits"), col("n_grams").cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet

    // replay the TRAIN docs as 3 micro-batches; eval stays static
    val rows = train.select("doc_id", "text").orderBy("doc_id").collect()
    val srcDir = Files.createTempDirectory("graft_contam_stream").toFile
    rows.grouped((rows.length + 2) / 3).zipWithIndex.foreach { case (chunk, i) =>
      spark
        .createDataFrame(
          java.util.Arrays.asList(chunk: _*),
          train.select("doc_id", "text").schema
        )
        .coalesce(1)
        .write
        .parquet(s"$srcDir/c$i")
      val f = new java.io.File(s"$srcDir/c$i").listFiles().filter(_.getName.endsWith(".parquet")).head
      Files.copy(f.toPath, new java.io.File(srcDir, f"d$i%03d.parquet").toPath)
      Thread.sleep(20)
    }
    val stream = spark.readStream
      .schema("doc_id BIGINT, text STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir.getAbsolutePath)

    val q = StreamingTa
      .contaminationStream(stream, eval, k = 5)
      .writeStream
      .format("memory")
      .queryName("contam_stream")
      .outputMode("append")
      .start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark
      .table("contam_stream")
      .select("doc_id", "n_hits", "n_grams")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(streamed == batch, s"streamed ${streamed.size} vs batch ${batch.size}")
    assert(batch.nonEmpty, "vacuous: no contaminated docs in fixture")
  }

  test("streaming bar construction equals batch bars") {
    val srcDir = Files.createTempDirectory("graft_bars_src").toFile
    Graft
      .events(spark, TestSpark.sfDir)
      .select("ts_us", "tstamp", "value")
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(srcDir.getAbsolutePath)

    val stream = spark.readStream
      .schema("ts_us BIGINT, tstamp TIMESTAMP, value DOUBLE")
      .parquet(srcDir.getAbsolutePath)

    // complete mode: a finite replay never advances the watermark past the
    // last day, so append would withhold the final bar(s); production use
    // with a live source runs append + watermark (StreamingTa.barsStream).
    val q = StreamingTa
      .barsStream(stream)
      .writeStream
      .format("memory")
      .queryName("bars_parity")
      .outputMode("complete")
      .start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("bars_parity").orderBy("ts")
      .select("ts", "open", "high", "low", "close", "volume").collect().toSeq
    val batch = Graft.bars(spark, TestSpark.sfDir).orderBy("ts")
      .select("ts", "open", "high", "low", "close", "volume").collect().toSeq
    assert(streamed == batch)
  }

  test("streaming quality-classifier scoring equals the batch path") {
    val docs = Graft.table(spark, TestSpark.sfDir, "documents")
    val w = graft.extensions.Classify.logRegTrain(docs, col("source") === "src0", lr = 0.5, iters = 8)
    // gate at the score range's midpoint: the src0 prior is small, so a
    // fixed 0.5 would pass every doc and make the keep-flag check vacuous
    val scores = graft.extensions.Classify.score(docs, w).select("score").collect().map(_.getDouble(0))
    val keepAbove = (scores.min + scores.max) / 2
    val batch = StreamingTa
      .qualityScoreStream(docs, w, keepAbove)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2), r.getLong(3)))
      .toSet

    val rows = docs.select("doc_id", "text").orderBy("doc_id").collect()
    val srcDir = Files.createTempDirectory("graft_qlr_stream").toFile
    rows.grouped((rows.length + 2) / 3).zipWithIndex.foreach { case (chunk, i) =>
      spark
        .createDataFrame(java.util.Arrays.asList(chunk: _*), docs.select("doc_id", "text").schema)
        .coalesce(1)
        .write
        .parquet(s"$srcDir/c$i")
      val f = new java.io.File(s"$srcDir/c$i").listFiles().filter(_.getName.endsWith(".parquet")).head
      Files.copy(f.toPath, new java.io.File(srcDir, f"d$i%03d.parquet").toPath)
      Thread.sleep(20)
    }
    val stream = spark.readStream
      .schema("doc_id BIGINT, text STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir.getAbsolutePath)

    val q = StreamingTa
      .qualityScoreStream(stream, w, keepAbove)
      .writeStream
      .format("memory")
      .queryName("qlr_stream")
      .outputMode("append")
      .start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark
      .table("qlr_stream")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2), r.getLong(3)))
      .toSet
    assert(streamed == batch, s"streamed ${streamed.size} vs batch ${batch.size}")
    assert(batch.exists(_._3) && batch.exists(!_._3), "vacuous: gate never splits the fixture")
  }

  test("streaming TracIn influence scoring equals the batch path") {
    val docs = Graft.table(spark, TestSpark.sfDir, "documents")
    val isTarget = col("source") === "src0"
    val w = graft.extensions.Classify.logRegTrain(docs, isTarget, lr = 0.5, iters = 4)
    val g = graft.extensions.Classify.valGradient(docs, isTarget, w)
    val batch = graft.extensions.Classify
      .tracinInfluence(docs, isTarget, lr = 0.5, iters = 4)
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getDouble(2)))
      .toSet

    val rows = docs.select("doc_id", "text", "source").orderBy("doc_id").collect()
    val srcDir = Files.createTempDirectory("graft_infl_stream").toFile
    rows.grouped((rows.length + 2) / 3).zipWithIndex.foreach { case (chunk, i) =>
      spark
        .createDataFrame(java.util.Arrays.asList(chunk: _*), docs.select("doc_id", "text", "source").schema)
        .coalesce(1)
        .write
        .parquet(s"$srcDir/c$i")
      val f = new java.io.File(s"$srcDir/c$i").listFiles().filter(_.getName.endsWith(".parquet")).head
      Files.copy(f.toPath, new java.io.File(srcDir, f"d$i%03d.parquet").toPath)
      Thread.sleep(20)
    }
    val stream = spark.readStream
      .schema("doc_id BIGINT, text STRING, source STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir.getAbsolutePath)
    val q = StreamingTa
      .influenceStream(stream, isTarget, w, g)
      .writeStream
      .format("memory")
      .queryName("infl_stream")
      .outputMode("append")
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark
      .table("infl_stream")
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getDouble(2)))
      .toSet
    assert(streamed == batch, s"streamed ${streamed.size} vs batch ${batch.size}")
    assert(batch.exists(_._3 > 0) && batch.exists(_._3 < 0), "vacuous: influence never splits the fixture")
  }

  test("streaming BPE token counting equals the batch encode totals") {
    val docs = Graft.table(spark, TestSpark.sfDir, "documents")
    Graft.init(spark)
    val ms = graft.extensions.Bpe.train(docs, 6).toSeq
    val batch = graft.extensions.Bpe
      .encode(docs, ms)
      .select("doc_id", "n_words", "n_chars", "n_bpe")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

    val rows = docs.select("doc_id", "text").orderBy("doc_id").collect()
    val srcDir = Files.createTempDirectory("graft_bpe_stream").toFile
    rows.grouped((rows.length + 2) / 3).zipWithIndex.foreach { case (chunk, i) =>
      spark
        .createDataFrame(java.util.Arrays.asList(chunk: _*), docs.select("doc_id", "text").schema)
        .coalesce(1)
        .write
        .parquet(s"$srcDir/c$i")
      val f = new java.io.File(s"$srcDir/c$i").listFiles().filter(_.getName.endsWith(".parquet")).head
      Files.copy(f.toPath, new java.io.File(srcDir, f"d$i%03d.parquet").toPath)
      Thread.sleep(20)
    }
    val stream = spark.readStream
      .schema("doc_id BIGINT, text STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir.getAbsolutePath)
    val q = StreamingTa
      .bpeCountStream(stream, ms)
      .writeStream
      .format("memory")
      .queryName("bpe_stream")
      .outputMode("append")
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark
      .table("bpe_stream")
      .where(col("n_words") > 0) // batch encode's dict join drops zero-word docs
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(streamed == batch, s"streamed ${streamed.size} vs batch ${batch.size}")
    assert(batch.exists { case (_, _, c, b) => b < c }, "vacuous: no doc actually compressed")
  }

  test("streaming PII scan equals the batch x_pii projection") {
    val docs = Graft.table(spark, TestSpark.sfDir, "documents")
    val batch = StreamingTa
      .piiScanStream(docs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5), r.getLong(6)))
      .toSet

    val rows = docs.select("doc_id", "text").orderBy("doc_id").collect()
    val srcDir = Files.createTempDirectory("graft_pii_stream").toFile
    rows.grouped((rows.length + 2) / 3).zipWithIndex.foreach { case (chunk, i) =>
      spark
        .createDataFrame(java.util.Arrays.asList(chunk: _*), docs.select("doc_id", "text").schema)
        .coalesce(1)
        .write
        .parquet(s"$srcDir/c$i")
      val f = new java.io.File(s"$srcDir/c$i").listFiles().filter(_.getName.endsWith(".parquet")).head
      Files.copy(f.toPath, new java.io.File(srcDir, f"d$i%03d.parquet").toPath)
      Thread.sleep(20)
    }
    val stream = spark.readStream
      .schema("doc_id BIGINT, text STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir.getAbsolutePath)
    val q = StreamingTa
      .piiScanStream(stream)
      .writeStream
      .format("memory")
      .queryName("pii_stream")
      .outputMode("append")
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark
      .table("pii_stream")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5), r.getLong(6)))
      .toSet
    assert(streamed == batch, s"streamed ${streamed.size} vs batch ${batch.size}")
  }

  test("streaming IVF cell assignment equals the batch ivfAppend side") {
    import graft.extensions.Similarity
    val e = Graft.table(spark, TestSpark.sfDir, "embeddings")
    val base = e.where(col("vec_id") % 10 =!= 0).select(col("vec_id"), col("embedding"))
    val batchV = e.where(col("vec_id") % 10 === 0).select(col("vec_id"), col("embedding"))
    val batch = Similarity
      .ivfAppend(base, batchV, 16)
      .where(col("is_new"))
      .select("vec_id", "cell")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val cents = Similarity
      .kmeansCentroids(base, 16)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq))
      .toSeq
    // static-frame application of the stream projection (stateless map —
    // micro-batching cannot change a per-row result; the parquet-chunk
    // harness above covers the plumbing for this op class)
    val streamed = StreamingTa
      .cellAssignStream(batchV, cents)
      .select("vec_id", "cell")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(streamed == batch, s"streamed ${streamed.size} vs batch ${batch.size}")
    assert(batch.nonEmpty)
  }

  test("stream-stream interval join (attribution) equals the batch RangeJoin") {
    val ev = Graft.events(spark, TestSpark.sfDir).select("user_id", "event_type", "ts_us", "tstamp")
    // batch ground truth: purchases × prior-hour views, RangeJoin bins
    val views = ev.where(col("event_type") === "view").select(col("user_id"), col("ts_us"))
    val purchases = ev.where(col("event_type") === "purchase").select(col("user_id"), col("ts_us"))
    val batch = graft.operators.RangeJoin
      .within(purchases, views, "user_id", "ts_us", lower = 3600000000L, upper = -1L)
      .select(col("user_id"), col("ts_us"), col("r_ts_us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet

    // replay in 3 chunks + a far-future sentinel view (inert user) in the
    // final file so the watermark passes every real event and the join
    // state fully flushes — a finite replay otherwise withholds the tail
    val rows = ev.select("user_id", "event_type", "tstamp").orderBy("tstamp").collect()
    val srcDir = Files.createTempDirectory("graft_attr_stream").toFile
    val schema = ev.select("user_id", "event_type", "tstamp").schema
    val maxTs = rows.last.getTimestamp(2)
    val sentinel = org.apache.spark.sql.Row(
      -1L, "view", new java.sql.Timestamp(maxTs.getTime + 30L * 86400 * 1000)
    )
    val chunks = rows.grouped((rows.length + 2) / 3).toSeq
    (chunks :+ Array(sentinel)).zipWithIndex.foreach { case (chunk, i) =>
      spark
        .createDataFrame(java.util.Arrays.asList(chunk.toSeq: _*), schema)
        .coalesce(1)
        .write
        .parquet(s"$srcDir/c$i")
      val f = new java.io.File(s"$srcDir/c$i").listFiles().filter(_.getName.endsWith(".parquet")).head
      Files.copy(f.toPath, new java.io.File(srcDir, f"a$i%03d.parquet").toPath)
      Thread.sleep(20)
    }
    val stream = spark.readStream
      .schema("user_id BIGINT, event_type STRING, tstamp TIMESTAMP")
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir.getAbsolutePath)
    val q = StreamingTa
      .attributionStream(stream, horizonSec = 3600L, watermark = "1 hour")
      .writeStream
      .format("memory")
      .queryName("attr_stream")
      .outputMode("append")
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark
      .table("attr_stream")
      .collect()
      .map { r =>
        def us(t: java.sql.Timestamp): Long = t.getTime / 1000 * 1000000L + t.getNanos / 1000
        (r.getLong(0), us(r.getTimestamp(1)), us(r.getTimestamp(2)))
      }
      .toSet
    assert(batch.nonEmpty, "vacuous: no purchase has a prior-hour view")
    assert(streamed == batch, s"streamed ${streamed.size} vs batch ${batch.size}")
  }

  test("streaming windowed PSI drift monitor equals the batch computation") {
    val ev = Graft.events(spark, TestSpark.sfDir).select("tstamp", "value")
    // train the reference offline: value deciles + overall bucket shares
    val edges = ev
      .agg(
        org.apache.spark.sql.functions
          .percentile_approx(col("value"), typedLit((1 to 9).map(_ / 10.0)), lit(10000))
      )
      .head()
      .getSeq[Double](0)
    val nTot = ev.count().toDouble
    val bucketOf = edges.map(e => when(col("value") > lit(e), 1).otherwise(0)).reduce(_ + _)
    val refShares = ev
      .groupBy(bucketOf.as("b"))
      .count()
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .toMap
    val ref = (0 until 10).map(i => refShares.getOrElse(i, 0L) / nTot)

    def r6(d: Double) = math.rint(d * 1e6) / 1e6
    val batch = StreamingTa
      .psiStream(ev, "value", "tstamp", edges, ref, windowDur = "1 day")
      .collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r6(r.getDouble(2)), r.getBoolean(3)))
      .toSet

    val srcDir = Files.createTempDirectory("graft_psi_stream").toFile
    ev.coalesce(1).write.mode("overwrite").parquet(srcDir.getAbsolutePath)
    val stream = spark.readStream
      .schema("tstamp TIMESTAMP, value DOUBLE")
      .parquet(srcDir.getAbsolutePath)
    // complete mode for the finite replay (same rationale as the bars test)
    val q = StreamingTa
      .psiStream(stream, "value", "tstamp", edges, ref, windowDur = "1 day")
      .writeStream
      .format("memory")
      .queryName("psi_stream")
      .outputMode("complete")
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark
      .table("psi_stream")
      .collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r6(r.getDouble(2)), r.getBoolean(3)))
      .toSet
    assert(streamed == batch, s"streamed ${streamed.size} vs batch ${batch.size}")
    assert(batch.nonEmpty)
    // daily windows of the same corpus the reference was trained on,
    // each well above the minN gate: a calibrated score must not alert
    // on its own training distribution in most windows
    assert(batch.count(_._4) < batch.size / 2, "reference-matched stream mostly alerting")
  }
}
