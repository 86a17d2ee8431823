package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.extensions.Similarity

/** adjust=True EWM golden (FIXTURES §3 primitive vectors) + heap top-k
  * equivalence with the window-rank brute force. */
class EwmTopkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("ewm adjust=True matches the pandas golden vector") {
    Graft.init(spark)
    import spark.implicits._
    val xs = Seq(10.0, 12.0, 11.0, 13.0, 15.0, 14.0, 16.0, 18.0, 17.0, 19.0)
    val df = xs.zipWithIndex.map { case (v, i) => ("A", i.toLong, v) }.toDF("series_id", "ts", "close")
    val out = df
      .withColumn("e", graft.ta.prim.ewmAdjust(col("close"), 0.25))
      .orderBy("ts")
      .collect()
      .map(_.getAs[Double]("e"))
    assert(math.abs(out.last - 16.517271) < 1e-6, s"got ${out.last}")
    assert(out.head == 10.0)
  }

  test("heap top-k equals window-rank brute force") {
    val e = Graft.table(spark, TestSpark.sfDir, "embeddings")
    val q = e.where(col("vec_id") < 10)
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select(col("q_id"), col("rk"), col("nbr_id"), round(col("sim"), 9).as("sim"))
        .orderBy("q_id", "rk")
        .collect()
        .toSeq
        .map(_.toSeq)
    val brute = norm(
      Similarity.topkBrute(e, q, 5).select(col("q_id"), col("rk").cast("long").as("rk"), col("nbr_id"), col("sim"))
    )
    val heap = norm(Similarity.topkHeap(e, q, 5))
    assert(heap == brute)
  }
}
