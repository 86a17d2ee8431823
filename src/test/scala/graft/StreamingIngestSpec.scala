package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.extensions.{Media, Retrieval}
import java.nio.file.Files

/** Round-7 streaming-ingest gates: the BM25 retrieval gate and the real
  * media decoders run STATELESSLY on a document stream and must equal
  * their batch twins row-for-row (same expressions, snapshot-literal
  * stats — the qualityScoreStream/piiScanStream contract).
  */
class StreamingIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs = Graft.table(spark, TestSpark.sfDir, "documents")

  /** Replay (doc_id, text) as 3 in-order file micro-batches. */
  private def docStream(): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val rows = docs.select(col("doc_id"), col("text")).as[(Long, String)].collect().sortBy(_._1)
    val stage = Files.createTempDirectory("graft_ingest_stage").toFile
    val src = Files.createTempDirectory("graft_ingest_src").toFile
    rows.grouped(math.ceil(rows.length / 3.0).toInt).zipWithIndex.foreach { case (chunk, i) =>
      spark.createDataset(chunk.toSeq).toDF("doc_id", "text").coalesce(1).write.parquet(s"$stage/c$i")
      val f = new java.io.File(s"$stage/c$i").listFiles().filter(_.getName.endsWith(".parquet")).head
      Files.copy(f.toPath, new java.io.File(src, f"chunk$i%03d.parquet").toPath)
      Thread.sleep(20)
    }
    spark.readStream
      .schema("doc_id BIGINT, text STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(src.getAbsolutePath)
  }

  test("streaming BM25 gate with snapshot stats reproduces the batch ranking row-for-row") {
    val terms = Seq("table", "scan", "fast", "window")
    val (n, avgdl, dfs) = Retrieval.bm25Stats(docs, terms)
    assert(dfs.nonEmpty && n > 0)

    val q = Retrieval
      .bm25ScoreStream(docStream(), terms, n, avgdl, dfs)
      .writeStream
      .format("memory")
      .queryName("bm25_gate")
      .outputMode("append")
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark
      .table("bm25_gate")
      .collect()
      .map(r => r.getLong(0) -> ((math.rint(r.getDouble(1) * 1e6) / 1e6, r.getLong(2))))
      .toMap

    // batch twin #1: the same stateless expressions over the static frame
    val static = Retrieval
      .bm25ScoreStream(docs, terms, n, avgdl, dfs)
      .collect()
      .map(r => r.getLong(0) -> ((math.rint(r.getDouble(1) * 1e6) / 1e6, r.getLong(2))))
      .toMap
    assert(streamed == static, "stream diverged from the same expressions on a static frame")

    // batch twin #2: full bm25 over the corpus the stats were snapshot
    // from — its top-10 scores must be found verbatim in the gate output
    val top = Retrieval
      .bm25(docs, terms)
      .collect()
      .map(r => (r.getLong(0), math.rint(r.getDouble(1) * 1e6) / 1e6, r.getLong(2)))
    assert(top.nonEmpty)
    top.foreach { case (id, score, nt) =>
      assert(streamed.get(id).contains((score, nt)), s"doc $id: ${streamed.get(id)} vs ($score, $nt)")
    }
  }

  test("streaming RM3: offline-trained expansion scores a stream identically to batch rm3Expand") {
    val terms = Seq("table", "scan")
    val (fbDocs, fbTerms, topK) = (3, 5, 10)
    // offline training on the corpus snapshot: expansion terms + stats
    // over the EXPANDED set (the second-pass vocabulary)
    val exp = Retrieval.rm3ExpansionTerms(docs, terms, fbDocs, fbTerms)
    assert(exp.nonEmpty && exp.size <= fbTerms)
    val (n, avgdl, dfs) = Retrieval.bm25Stats(docs, terms ++ exp)

    val q = Retrieval
      .rm3ScoreStream(docStream(), terms, exp, n, avgdl, dfs)
      .writeStream
      .format("memory")
      .queryName("rm3_gate")
      .outputMode("append")
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark
      .table("rm3_gate")
      .collect()
      .map(r => (r.getLong(0), math.rint(r.getDouble(1) * 1e6) / 1e6, r.getLong(2), r.getString(3)))

    // batch twin: rm3Expand's full pipeline (expansion + second BM25
    // pass + topK cut). Its rows must appear VERBATIM in the streamed
    // scores under the same (score desc, doc_id asc) order.
    val batch = Retrieval
      .rm3Expand(docs, terms, fbDocs, fbTerms, topK = topK)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), math.rint(r.getDouble(2) * 1e6) / 1e6, r.getLong(3), r.getString(4)))
    assert(batch.nonEmpty)
    val streamTop = streamed
      .sortBy { case (id, s, _, _) => (-s, id) }
      .take(topK)
      .zipWithIndex
      .map { case ((id, s, nt, e), i) => (i + 1L, id, s, nt, e) }
    assert(
      streamTop.toSeq == batch.toSeq,
      s"streamed top-$topK ${streamTop.toSeq} != batch rm3 ${batch.toSeq}"
    )

    // round 16: the expansion list is a session memo (trained-artifact
    // contract) — memo'd result must equal a fresh uncached training run
    val fresh = Retrieval.rm3ExpansionTermsUncached(docs, terms, fbDocs, fbTerms, 1.2, 0.75)
    assert(exp == fresh, s"memo'd expansion $exp != fresh $fresh")
  }

  test("magic-byte dispatcher runs on a stream: mixed-format decode equals batch per doc") {
    import spark.implicits._
    def toMixed(df: org.apache.spark.sql.DataFrame) = df
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, t) =>
        val payload = (id % 3) match {
          case 0 => Media.synthWav(t)
          case 1 => Media.synthBmp(t)
          case _ => t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        }
        (id, payload)
      })
      .toDF("doc_id", "payload")
    val q = Media
      .decodeMixedRows(spark, toMixed(docStream()))
      .toDF()
      .writeStream
      .format("memory")
      .queryName("mixed_stream")
      .outputMode("append")
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark
      .table("mixed_stream")
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    val batch = Media
      .decodeMixedRows(spark, toMixed(docs.select(col("doc_id"), col("text"))))
      .collect()
      .map(r => r.doc_id -> ((r.format, r.f1, r.f2)))
      .toMap
    assert(streamed.nonEmpty && streamed.size == batch.size)
    assert(streamed == batch, "streamed mixed decode diverged from batch")
    assert(Set("wav", "bmp", "bin").subsetOf(streamed.values.map(_._1).toSet))
  }

  test("real media decoders run on a stream: WAV decode equals batch per doc") {
    import spark.implicits._
    val wavStream = docStream()
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, t) => (id, Media.synthWav(t)) })
      .toDF("doc_id", "payload")
    val q = Media
      .decodeWavRows(spark, wavStream)
      .toDF()
      .writeStream
      .format("memory")
      .queryName("wav_stream")
      .outputMode("append")
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark
      .table("wav_stream")
      .collect()
      .map(r => r.getLong(0) -> r.toSeq.tail)
      .toMap
    val batch = docs
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .collect()
      .map { case (id, t) =>
        val w = Media.decodeWav(Media.synthWav(t))
        id -> Seq[Any](w.sample_rate.toLong, w.n_channels.toLong, w.n_samples, w.duration_ms, w.abs_sum, w.n_windows, w.max_win_sum)
      }
      .toMap
    assert(streamed.size == batch.size)
    assert(streamed == batch)
  }
}
