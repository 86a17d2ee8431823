package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.extensions.Similarity
import graft.streaming.StreamingTa
import java.nio.file.Files

/** Streaming top-k IVF serving (StreamingTa.topkIvfStream): query vectors
  * replayed as in-order micro-batches against the PERSISTED index must
  * reproduce the batch prober row-for-row — the serving half of the
  * online ANN loop (cellAssignStream being the ingestion half).
  */
class StreamingTopkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("chunked query replay over the persisted index equals batch topkIvfWithCents") {
    import spark.implicits._
    val (k, nCells, nprobe) = (5, 16, 4)
    val e = Graft.table(spark, TestSpark.sfDir, "embeddings")

    // build + persist the index WITH its trained centroids, then reload —
    // the cross-session serving shape (no corpus retrain on the serving side)
    val idxDir = Files.createTempDirectory("graft_ivf_serve").toString
    Similarity.saveIvfIndex(Similarity.ivfIndex(e, nCells), idxDir, nCells)
    val index = Similarity.loadIvfIndex(spark, idxDir)
    val centsDf = Similarity.loadIvfCentroids(spark, idxDir)
    val cents: Seq[(Long, Seq[Double])] = centsDf
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toIndexedSeq)
      .toIndexedSeq

    val queries = e.where(col("vec_id") < 10).select(col("vec_id"), col("embedding"))

    // batch reference over the SAME loaded index + centroids
    val batch = Similarity
      .topkIvfWithCents(index, centsDf, queries, k, nprobe)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), math.rint(r.getDouble(3) * 1e6) / 1e6))
      .toSet

    // replay the queries as 3 in-order file micro-batches
    val qRows = queries.as[(Long, Array[Float])].collect().sortBy(_._1)
    val srcDir = Files.createTempDirectory("graft_topk_stream_src").toFile
    val stage = Files.createTempDirectory("graft_topk_stream_stage").toFile
    qRows.grouped(math.ceil(qRows.length / 3.0).toInt).zipWithIndex.foreach { case (chunk, i) =>
      spark.createDataset(chunk.toSeq).toDF("vec_id", "embedding").coalesce(1).write.parquet(s"$stage/c$i")
      val f = new java.io.File(s"$stage/c$i").listFiles().filter(_.getName.endsWith(".parquet")).head
      Files.copy(f.toPath, new java.io.File(srcDir, f"chunk$i%03d.parquet").toPath)
      Thread.sleep(20) // distinct mod times → deterministic file order
    }
    val stream = spark.readStream
      .schema("vec_id BIGINT, embedding ARRAY<FLOAT>")
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir.getAbsolutePath)

    val q = StreamingTa
      .topkIvfStream(stream, index, cents, k, nprobe)
      .writeStream
      .format("memory")
      .queryName("topk_serve")
      .outputMode("append")
      .start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark
      .table("topk_serve")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), math.rint(r.getDouble(3) * 1e6) / 1e6))
      .toSet

    assert(streamed.nonEmpty)
    assert(
      streamed == batch,
      s"missing=${(batch -- streamed).take(5)} spurious=${(streamed -- batch).take(5)}"
    )
    // every query produced a full top-k (no query starved by chunking)
    assert(streamed.groupBy(_._1).forall(_._2.size == k))

    // TTL-flag path (dedupTtlMs > 0 → ProcessingTimeTimeout +
    // setTimeoutDuration) must be output-identical. Batch execution never
    // fires timeouts, but it does run the TTL branch of the state
    // function — a wrong timeout setup would throw here, and the results
    // must not change. (The TTL default stays 0 because processing-time
    // timeouts schedule future batches, which blocks the deterministic
    // processAllAvailable replay above.)
    val ttlRows = StreamingTa
      .topkIvfStream(queries, index, cents, k, nprobe, dedupTtlMs = 60000L)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), math.rint(r.getDouble(3) * 1e6) / 1e6))
      .toSet
    assert(ttlRows == batch, "TTL-flagged state path diverged from batch prober")
  }
}
