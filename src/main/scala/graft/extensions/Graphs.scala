package graft.extensions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.CacheRegistry

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
  *    rank-table size. With dangling nodes each round is one barriered
  *    job (the dangling-mass scalar rides the materializing action to
  *    the driver); with none — the common case for transition graphs —
  *    rounds compose lazily and checkpoint every 5, so 10 rounds run as
  *    ~2 executions.
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
    // The normalized-edge table (ew), the node table (nodesF) and the two
    // setup scalars form the GRAPH INDEX of this input — the same
    // session-scoped index contract as Dedup's shingle index and the ANN
    // cell index (round 16, guide §1.2/§2.4): built once per (session,
    // edge plan), reused by every pagerank call over the same input.
    // Before the memo every call re-ran the full edge extraction + two
    // checkpoint materializations + the count action (measured ~2.5 s of
    // the 4.4 s bench rep at sf0.1); the power iterations themselves are
    // the recurring cost.
    val (ew, nodesF, noIn, n, nOut, nNoIn) = CacheRegistry.memoStat(
      spark,
      s"graphs:prindex:${CacheRegistry.planKey(edges)}"
    ) {
      val e = edges.persist()
      try {
        val outd = e.groupBy("src").agg(sum(col("w")).as("outw")) // exact long
        val nodes = e
          .select(col("src").as("node"))
          .union(e.select(col("dst").as("node")))
          .distinct()
        // Round inputs are CHECKPOINTED, not persisted: an InMemoryRelation
        // embeds the full originating physical plan (events scan + window +
        // aggregates), and every round's analysis/optimization re-walks
        // that subtree — measured ~0.5 s/round of pure driver planning.
        // A LogicalRDD leaf makes each round's plan O(round ops) flat; the
        // materialized partition count is AQE-coalesced. (Checkpoint
        // blocks are freed by the ContextCleaner once the memo entry is
        // released and the RDD handle is GC'd — same lifecycle the
        // per-call checkpoints always had, now one set per input instead
        // of one per call.)
        val ewC = e
          .join(outd, "src")
          .select(col("src"), col("dst"), (col("w").cast("double") / col("outw").cast("double")).as("p"))
          .localCheckpoint(false)
        // node table with a static has-out flag: the dangling set never
        // changes, so it's joined ONCE, not per round
        val srcSet = outd.select(col("src").as("node"), lit(true).as("__has_out"))
        val nodesFC = nodes
          .join(srcSet, Seq("node"), "left")
          .select(col("node"), coalesce(col("__has_out"), lit(false)).as("has_out"))
          .localCheckpoint(false)
        // static NO-INBOUND node set (round 17): in the no-dangling fast
        // path a node with no in-edges always lands at the constant
        // (1−d)/N, so the per-round nodesF left join (one AQE broadcast
        // job per round) collapses to a static unionByName of this table
        val noInC = nodesFC
          .join(e.select(col("dst").as("node")).distinct(), Seq("node"), "left_anti")
          .select(col("node"))
          .localCheckpoint(false)
        // ONE setup action: n + dangling count off the nodesF checkpoint
        // materialization (separate nodes.count/ew.count jobs cost ~1.5 s).
        val cnts = nodesFC
          .agg(count(lit(1)).as("n"), count(when(col("has_out"), 1)).as("nOut"))
          .head()
        // materialize the ew/noIn checkpoints now (one job each, while e
        // is still cached) so the first round starts from flat LogicalRDDs
        ewC.count()
        val nNoInC = noInC.count()
        (ewC, nodesFC, noInC, cnts.getLong(0), cnts.getLong(1), nNoInC)
      } finally e.unpersist(blocking = false)
    }
    if (n == 0) {
        import spark.implicits._
        Seq.empty[(Long, Double)].toDF("node", "rank")
      } else {
        val nD = n.toDouble
        val hasDangling = nOut < n
        // Dangling-mass scalar for a materialized round: ranks of no-out
        // nodes folded in node order. Fetching ONE double to the driver
        // (the pcaPower "driver holds the model scalars" contract) lets
        // the next round embed it — vs the broadcast-subtree spelling,
        // which cost two extra jobs per round. The head() also
        // materializes the round's lazy checkpoint.
        def danglingMass(r: DataFrame): Double = r
          .where(!col("has_out"))
          .agg(coalesce(Similarity.orderedSum(col("node"), col("rank")), lit(0.0)))
          .head()
          .getDouble(0)
        // The rank table is node-sized: up to ~10M nodes it broadcasts
        // (explicit hint skips AQE's per-round probe stage); beyond that
        // the plain join shuffle-co-partitions ranks with the cached
        // edges — the web-scale Pregel shape. The threshold is conf-
        // pinnable so the ScaleProbe layout experiment (prbucket) can
        // force the co-partition regime at test scale.
        val bMax = spark.conf.get("spark.graft.pagerank.broadcastMax", "10000000").toLong
        val hintRanks: DataFrame => DataFrame =
          if (n <= bMax) broadcast(_) else identity
        // One rank-update round. dm rides RefDouble (reference-carried
        // scalar): an inlined double literal would change the generated
        // source every round and defeat the codegen cache.
        def round(ranks: DataFrame, dm: Double): DataFrame = {
          // per-dst contributions fold in src order — streaming
          // running-window spelling (Similarity.orderedSumGrouped,
          // round 16): bit-identical, sort-based, no per-dst
          // collect_list (src unique per dst in ew)
          val cin = Similarity
            .orderedSumGrouped(
              ew.join(hintRanks(ranks.select(col("node").as("src"), col("rank"))), "src")
                .select(col("src"), col("dst"), (col("rank") * col("p")).as("c")),
              Seq("dst"),
              "src",
              "c",
              "cin"
            )
            .withColumnRenamed("dst", "node")
          val dmCol = org.apache.spark.sql.GraftBridge.column(graft.functions.RefDouble(dm))
          nodesF
            .join(cin, Seq("node"), "left")
            .select(
              col("node"),
              (lit((1.0 - damping) / nD) +
                lit(damping) * (coalesce(col("cin"), lit(0.0)) + dmCol / lit(nD))).as("rank"),
              col("has_out")
            )
        }
        val init = nodesF.select(col("node"), lit(1.0 / nD).as("rank"), col("has_out"))
        var ranks = init
        if (hasDangling) {
          // per-round barrier: dm_t is data the next round needs on the
          // driver, so each round checkpoints and runs as one job
          ranks = init.localCheckpoint(false)
          var dm = danglingMass(ranks)
          for (_ <- 1 to iters) {
            val next = round(ranks, dm).localCheckpoint(false)
            dm = danglingMass(next)
            ranks.unpersist(blocking = false)
            ranks = next
          }
        } else {
          // no dangling nodes → dm is 0.0 every round and there is NO
          // per-round driver dependency: rounds compose lazily (ranks is
          // referenced once per round — linear growth) with a checkpoint
          // every few rounds to bound plan depth. 10 rounds run as ~2
          // AQE executions instead of 10 barriered jobs — measured
          // 9.5 s → ~5 s at sf0.1.
          //
          // Specialized round (round 17): with dm pinned at 0.0 a node's
          // update is L + d·cin for inbound nodes and exactly L = (1−d)/N
          // otherwise, so the per-round nodesF LEFT JOIN (one extra AQE
          // broadcast job per round) collapses to a static unionByName of
          // the no-inbound set. Bit-identical to round(ranks, 0.0): cin is
          // a sum of positive terms (never −0.0), so dropping `+ 0.0` and
          // `+ d·(0.0/N)` cannot flip a bit, and a missing cin folded to
          // L + d·(0.0 + 0.0) = L before. Probed 36 → ~25 jobs per call.
          val base = lit((1.0 - damping) / nD)
          def roundND(r: DataFrame): DataFrame = {
            val cin = Similarity.orderedSumGrouped(
              ew.join(hintRanks(r.select(col("node").as("src"), col("rank"))), "src")
                .select(col("src"), col("dst"), (col("rank") * col("p")).as("c")),
              Seq("dst"),
              "src",
              "c",
              "cin"
            )
            val inbound = cin.select(col("dst").as("node"), (base + lit(damping) * col("cin")).as("rank"))
            if (nNoIn == 0) inbound
            else inbound.unionByName(noIn.select(col("node"), base.as("rank")))
          }
          var sinceCkpt = 0
          for (t <- 1 to iters) {
            ranks = roundND(ranks)
            sinceCkpt += 1
            if (sinceCkpt == 5 || t == iters) {
              ranks = ranks.localCheckpoint(false)
              sinceCkpt = 0
            }
          }
        }
        ranks.select(col("node"), col("rank"))
    }
  }
}
