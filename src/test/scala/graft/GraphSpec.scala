package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.extensions.Graphs

/** PageRank semantics: edge extraction against hand-computed transitions,
  * conservation of rank mass, an independently-computed reference rank on
  * a crafted graph, and repartition stability (the sf0.01 oracle is the
  * DuckDB unroll; these pin the algorithm itself). */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("transitionEdges: per-user consecutive (ts, event_id) pairs, weighted") {
    import spark.implicits._
    // user 1: 7 -> 8 -> 7 -> 8 ; user 2: 8 -> 9 (interleaved timestamps)
    val ev = Seq(
      (1L, 10L, 1L, """{"k": 7}"""),
      (2L, 11L, 1L, """{"k": 8}"""),
      (3L, 12L, 2L, """{"k": 8}"""),
      (4L, 13L, 1L, """{"k": 7}"""),
      (5L, 14L, 2L, """{"k": 9}"""),
      (6L, 15L, 1L, """{"k": 8}""")
    ).toDF("event_id", "ts_us", "user_id", "props")
    val got = Graphs
      .transitionEdges(ev)
      .orderBy("src", "dst")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toList
    assert(got == List((7L, 8L, 2L), (8L, 7L, 1L), (8L, 9L, 1L)))
  }

  test("pagerank: mass conservation + reference values on a crafted graph") {
    import spark.implicits._
    // 1 -> 2, 1 -> 3, 2 -> 3; 3 dangling
    val edges = Seq((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 1L)).toDF("src", "dst", "w")
    val iters = 20
    val got = Graphs
      .pagerank(edges, 0.85, iters)
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
      .toMap
    // independent scalar reference of the same fixed-iteration scheme
    var r = Map(1L -> 1.0 / 3, 2L -> 1.0 / 3, 3L -> 1.0 / 3)
    for (_ <- 1 to iters) {
      val dm = r(3L) // node 3 has no out-edges
      def upd(cin: Double) = 0.15 / 3 + 0.85 * (cin + dm / 3)
      r = Map(
        1L -> upd(0.0),
        2L -> upd(r(1L) / 2),
        3L -> upd(r(1L) / 2 + r(2L))
      )
    }
    assert(got.keySet == r.keySet)
    r.foreach { case (n, v) => assert(math.abs(got(n) - v) < 1e-12, s"node $n") }
    assert(math.abs(got.values.sum - 1.0) < 1e-9, "rank mass must be conserved")
  }

  test("pagerank is repartition-stable bit-for-bit") {
    val ev = Graft.events(spark, TestSpark.sfDir)
    val e1 = Graphs.transitionEdges(ev)
    val a = Graphs.pagerank(e1, 0.85, 5).orderBy("node").collect().map(r => (r.getLong(0), r.getDouble(1)))
    val b = Graphs
      .pagerank(Graphs.transitionEdges(ev.repartition(7)), 0.85, 5)
      .orderBy("node")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(a.sameElements(b))
  }
}
