package graft.extensions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph centrality for corpus curation (SURVEY §2.F): weighted PageRank
  * (Page et al., 1999) over the item-transition graph mined from the
  * events stream — the web-graph quality-rank shape every crawl-derived
  * pretraining corpus runs (CCNet/RefinedWeb filter pages by link
  * centrality before any text heuristic sees them).
  *
  * Spark-first shape (and the 100 TB story):
  *  - Edge extraction is ONE window pass over events (lead() per user by
  *    (ts, event_id) — a total order, so the edge multiset is exact) and
  *    ONE hash-aggregate to (src, dst, w). Corpus-sized work ends here.
  *  - Each power iteration is one shuffle join (edges ⋈ ranks on src) +
  *    one per-dst aggregate — the Pregel/GraphX step expressed in pure
  *    DataFrame ops. Ranks stay DISTRIBUTED (a DataFrame keyed by node),
  *    never collected: at web scale the rank vector is itself data-sized
  *    and the driver holds only the scalar dangling mass.
  *  - AQE picks broadcast vs shuffle join per iteration from the actual
  *    rank-table size; each iteration is persisted (previous released)
  *    and costs exactly one job — the dangling-mass scalar rides the
  *    materializing action to the driver.
  *
  * Determinism contract (oracle-replayable, partitioning-independent):
  * per-dst contributions fold in src order, the dangling-mass scalar
  * folds ranks in node order (both [[Similarity.orderedSum]]), edge
  * weights and out-degrees are exact longs, and the update spells
  * `(1-d)/N + d*(cin + dm/N)` verbatim in both engines.
  */
object Graphs {

  /** Directed item-transition edges from the events stream: per user,
    * order by (ts_us, event_id) — a total order (event_id unique) — and
    * emit props.k → next props.k, then aggregate multiplicity.
    * Self-loops kept (PageRank is defined on them; the oracle keeps them
    * too). Input must be Graft.events (carries the ts_us long). */
  def transitionEdges(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    events
      .select(
        col("user_id"),
        col("ts_us"),
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item")
      )
      .where(col("item").isNotNull)
      .select(col("item").as("src"), lead(col("item"), 1).over(w).as("dst"))
      .where(col("dst").isNotNull)
      .groupBy("src", "dst")
      .agg(count(lit(1)).as("w"))
  }

  /** Weighted PageRank over a (src, dst, w) edge list. Returns (node,
    * rank) for every node that appears in an edge. `iters` fixed rounds
    * (no convergence test — the oracle unrolls the same count). */
  def pagerank(edges: DataFrame, damping: Double = 0.85, iters: Int = 10): DataFrame = {
    val spark = edges.sparkSession
    val e = edges.persist()
    try {
      val outd = e.groupBy("src").agg(sum(col("w")).as("outw")) // exact long
      val nodes = e
        .select(col("src").as("node"))
        .union(e.select(col("dst").as("node")))
        .distinct()
        .persist()
      val n = nodes.count()
      if (n == 0) {
        import spark.implicits._
        Seq.empty[(Long, Double)].toDF("node", "rank")
      } else {
        val nD = n.toDouble
        // edges with per-edge transition probability factors, reused each round
        val ew = e
          .join(outd, "src")
          .select(col("src"), col("dst"), (col("w").cast("double") / col("outw").cast("double")).as("p"))
          .persist()
        ew.count()
        // node table with a static has-out flag: the dangling set never
        // changes, so it's joined ONCE, not per round
        val srcSet = outd.select(col("src").as("node"), lit(true).as("__has_out"))
        val nodesF = nodes
          .join(srcSet, Seq("node"), "left")
          .select(col("node"), coalesce(col("__has_out"), lit(false)).as("has_out"))
          .persist()
        // Dangling-mass scalar for a materialized round: ranks of no-out
        // nodes folded in node order. Fetching ONE double to the driver
        // (the pcaPower "driver holds the model scalars" contract) lets
        // the next round embed it as a literal — vs the broadcast-subtree
        // spelling, which cost two extra jobs per round (dm broadcast +
        // checkpoint; measured 1.1 s/round at sf0.1 where data is tiny).
        // This head() is also what materializes the round's persist, so
        // each iteration is exactly ONE job.
        def danglingMass(r: DataFrame): Double = r
          .where(!col("has_out"))
          .agg(coalesce(Similarity.orderedSum(col("node"), col("rank")), lit(0.0)))
          .head()
          .getDouble(0)
        var ranks =
          nodesF.select(col("node"), lit(1.0 / nD).as("rank"), col("has_out")).localCheckpoint(false)
        var dm = danglingMass(ranks)
        // dm is a driver literal, so each round references the previous
        // ranks once; LAZY localCheckpoint truncates lineage to a
        // LogicalRDD — the danglingMass action scans every partition, so
        // it both materializes the checkpoint and returns the scalar in
        // the round's single job. (persist alone kept the full nested
        // plan: every execution re-rendered it into the listener's plan
        // description, O(rounds²) string work — measured 118 s/run at
        // sf0.1 where the actual data work is milliseconds.)
        // The rank table is node-sized: up to ~10M nodes it broadcasts
        // (explicit hint skips AQE's per-round probe stage); beyond that
        // the plain join shuffle-co-partitions ranks with the cached
        // edges — the web-scale Pregel shape.
        val hintRanks: DataFrame => DataFrame =
          if (n <= 10000000L) broadcast(_) else identity
        for (_ <- 1 to iters) {
          val cin = ew
            .join(hintRanks(ranks.select(col("node").as("src"), col("rank"))), "src")
            .select(col("src"), col("dst"), (col("rank") * col("p")).as("c"))
            .groupBy(col("dst").as("node"))
            .agg(Similarity.orderedSum(col("src"), col("c")).as("cin"))
          val next = nodesF
            .join(cin, Seq("node"), "left")
            .select(
              col("node"),
              (lit((1.0 - damping) / nD) +
                lit(damping) * (coalesce(col("cin"), lit(0.0)) + lit(dm) / lit(nD))).as("rank"),
              col("has_out")
            )
            .localCheckpoint(false)
          dm = danglingMass(next)
          ranks.unpersist(blocking = false)
          ranks = next
        }
        nodes.unpersist(blocking = false)
        nodesF.unpersist(blocking = false)
        ew.unpersist(blocking = false)
        ranks.select(col("node"), col("rank"))
      }
    } finally {
      e.unpersist(blocking = false)
    }
  }
}
