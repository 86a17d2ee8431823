package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Graft
import graft.ta.{prim => P}
import sqlgen._

/** Volume profile (vp), whole-series performance metrics, anchored vwap,
  * and the relational sanity queries (SURVEY.md §2.G Q32/Q37/Q45/Q49/Q50).
  *
  * Scale notes:
  *  - q49 joins keep the TPC-H shape: fact-fact shuffle joins on the fact
  *    keys, dimension side broadcast (`broadcast(nation)`), and the money
  *    sum runs in DECIMAL so it is exact and order-independent — a double
  *    sum over 600k rows would differ from the oracle in the 6th decimal
  *    depending on partitioning.
  *  - q50 sessionization is one window pass + one partial-aggregated
  *    groupBy per user — no data ever leaves its user partition.
  *  - vp is a two-pass profile: per-series min/max via an unbounded window
  *    (no join), then a 10-way hash aggregate.
  */
object RelationalQueries {

  // ------------------------------------------------------------ Q32 vp
  /** Volume profile over the daily bars: close range split into 10 equal
    * bins; per bin mean close, up/down/total volume. Up-bar rule matches
    * obv's signed_series convention: Δclose ≥ 0 (first row up). Bucket
    * arithmetic is plain double math, identical on both engines. */
  val qVp = Q(
    "vp_10",
    (s: SparkSession, dir: String) => {
      val full = Window
        .partitionBy("series_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val w = Window.partitionBy("series_id").orderBy("ts")
      Graft
        .bars(s, dir)
        .withColumn("lo", min("close").over(full))
        .withColumn("hi", max("close").over(full))
        .withColumn("up", coalesce(col("close") >= lag("close", 1).over(w), lit(true)))
        .withColumn(
          "bucket",
          least(floor((col("close") - col("lo")) * 10.0 / (col("hi") - col("lo"))), lit(9.0))
            .cast("long")
        )
        .groupBy("series_id", "bucket")
        .agg(
          P.normd(avg("close")).as("mean_close"),
          P.normd(sum(when(col("up"), col("volume")).otherwise(0.0))).as("pos_vol"),
          P.normd(sum(when(!col("up"), col("volume")).otherwise(0.0))).as("neg_vol"),
          P.normd(sum("volume")).as("total_vol"),
          count(lit(1)).as("n_bars")
        )
        .orderBy("series_id", "bucket")
    },
    Some(
      s"WITH bars AS ($barsCte), r AS (SELECT *, min(close) OVER (PARTITION BY series_id) AS lo, " +
        "max(close) OVER (PARTITION BY series_id) AS hi, " +
        s"coalesce(close >= lag(close, 1) $ov, TRUE) AS up FROM bars), " +
        "b AS (SELECT *, CAST(least(floor((close - lo) * 10e0 / (hi - lo)), 9e0) AS BIGINT) AS bucket FROM r) " +
        "SELECT series_id, bucket, round(avg(close), 6) AS mean_close, " +
        "round(sum(CASE WHEN up THEN volume ELSE 0e0 END), 6) AS pos_vol, " +
        "round(sum(CASE WHEN NOT up THEN volume ELSE 0e0 END), 6) AS neg_vol, " +
        "round(sum(volume), 6) AS total_vol, count(*) AS n_bars " +
        "FROM b GROUP BY series_id, bucket ORDER BY series_id, bucket"
    )
  )

  // ------------------------------------------------------------ Q45 metrics
  /** Whole-series scalar metrics over the daily bars (annualization 252):
    * sharpe = mean(ret)/std(ret)·√252, volatility = std(ret)·√252,
    * max_drawdown = max(1 − close/cummax), cagr = (last/first)^(252/(n−1))−1.
    * ret = pct_change(close, 1); std is sample (ddof=1). */
  val qMetrics = Q(
    "perf_metrics",
    (s: SparkSession, dir: String) => {
      val w = Window.partitionBy("series_id").orderBy("ts")
      val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ann = math.sqrt(252.0)
      Graft
        .bars(s, dir)
        .withColumn("ret", P.sdiv(col("close"), lag("close", 1).over(w)) - 1.0)
        .withColumn("dd", lit(1.0) - P.sdiv(col("close"), max("close").over(cum)))
        .withColumn("ddl", P.sln(max("close").over(cum)) - P.sln(col("close")))
        .withColumn("dpct", lit(100.0) * (col("close") - max("close").over(cum)) / max("close").over(cum))
        .withColumn("dneg", least(col("ret"), lit(0.0)))
        .withColumn("rn", row_number().over(w).cast("double"))
        .groupBy("series_id")
        .agg(
          (avg("ret") / stddev_samp("ret") * ann).as("__sharpe"),
          (stddev_samp(col("ret")) * ann).as("__vol"),
          max("dd").as("__mdd"),
          max("ddl").as("__mddl"),
          (pow(
            max_by(col("close"), col("ts")) / min_by(col("close"), col("ts")),
            lit(252.0) / (count(lit(1)) - 1.0)
          ) - 1.0).as("__cagr"),
          (sqrt(avg(col("dneg") * col("dneg"))) * ann).as("__ddev"),
          sqrt(avg(col("dpct") * col("dpct"))).as("__ui"),
          (avg("ret") * 252.0).as("__annret"),
          corr(col("close"), col("rn")).as("__ppr")
        )
        .select(
          col("series_id"),
          P.normd(col("__sharpe")).as("sharpe"),
          P.normd(col("__vol")).as("volatility"),
          P.normd(col("__mdd")).as("max_drawdown"),
          P.normd(col("__mddl")).as("log_max_drawdown"),
          P.normd(col("__cagr")).as("cagr"),
          P.normd(col("__ddev")).as("downside_deviation"),
          P.normd(P.sdiv(col("__annret"), col("__ddev")) * math.sqrt(252.0) / 252.0 * 252.0).as("sortino"),
          P.normd(P.sdiv(col("__cagr"), col("__mdd"))).as("calmar"),
          P.normd(P.sdiv(col("__annret"), col("__ui"))).as("ulcer_performance_index"),
          // optimal_leverage (reference _metrics.py): int(capital ·
          // (period_mu − benchmark_rate)/period_sigma²), capital=1, rate=0;
          // Spark double→bigint cast truncates toward zero like Python int()
          P.sdiv(col("__annret"), col("__vol") * col("__vol")).cast("bigint").as("optimal_leverage"),
          // pure_profit_score: Pearson r of close vs the 0..n−1 row index
          // (shift-invariant, so 1-based row_number gives the same r) × cagr
          P.normd(col("__ppr") * col("__cagr")).as("pure_profit_score")
        )
        .orderBy("series_id")
    },
    Some(
      s"WITH bars AS ($barsCte), r AS (SELECT *, close / nullif(lag(close, 1) $ov, 0) - 1e0 AS ret, " +
        s"1e0 - close / nullif(max(close) $cum, 0) AS dd, " +
        s"(CASE WHEN max(close) $cum > 0 THEN ln(max(close) $cum) END) - (CASE WHEN close > 0 THEN ln(close) END) AS ddl, " +
        s"100e0 * (close - max(close) $cum) / max(close) $cum AS dpct, " +
        s"least(close / nullif(lag(close, 1) $ov, 0) - 1e0, 0e0) AS dneg, " +
        s"CAST(row_number() $ov AS DOUBLE) AS rn FROM bars), " +
        "g AS (SELECT series_id, avg(ret) / stddev_samp(ret) * sqrt(252e0) AS sh, " +
        "stddev_samp(ret) * sqrt(252e0) AS vol, max(dd) AS mdd, max(ddl) AS mddl, " +
        "pow(arg_max(close, ts) / arg_min(close, ts), 252e0 / (count(*) - 1e0)) - 1e0 AS cagr, " +
        "sqrt(avg(dneg * dneg)) * sqrt(252e0) AS ddev, sqrt(avg(dpct * dpct)) AS ui, " +
        "avg(ret) * 252e0 AS annret, corr(close, rn) AS ppr FROM r GROUP BY series_id) " +
        "SELECT series_id, round(sh, 6) AS sharpe, round(vol, 6) AS volatility, " +
        "round(mdd, 6) AS max_drawdown, round(mddl, 6) AS log_max_drawdown, round(cagr, 6) AS cagr, " +
        "round(ddev, 6) AS downside_deviation, " +
        "round(annret / nullif(ddev, 0) * sqrt(252e0) / 252e0 * 252e0, 6) AS sortino, " +
        "round(cagr / nullif(mdd, 0), 6) AS calmar, " +
        "round(annret / nullif(ui, 0), 6) AS ulcer_performance_index, " +
        "CAST(trunc(annret / nullif(vol * vol, 0)) AS BIGINT) AS optimal_leverage, " +
        "round(ppr * cagr, 6) AS pure_profit_score " +
        "FROM g ORDER BY series_id"
    )
  )

  // ------------------------------------------------------ jensens_alpha
  /** Jensen's alpha per series (reference _metrics.py jensens_alpha =
    * the OLS intercept of series returns regressed on benchmark returns;
    * beta = the slope, from the same regression). Benchmark here is the
    * equal-weight cross-series mean return per day over the 15-user bars —
    * computed IN-plan (one window over ts), no separate benchmark input.
    *
    * Scale: one hash exchange by ts for the benchmark window, one by
    * series_id for the final aggregate — both map-side-combined
    * regr_* sums; no joins, no driver collection. */
  val qJensens = Q(
    "jensens_alpha",
    (s: SparkSession, dir: String) => {
      val w = Window.partitionBy("series_id").orderBy("ts")
      Graft
        .userBars(s, dir)
        .withColumn("ret", P.sdiv(col("close"), lag("close", 1).over(w)) - 1.0)
        .withColumn("bench", avg("ret").over(Window.partitionBy("ts")))
        .groupBy("series_id")
        .agg(
          P.normd(expr("regr_intercept(ret, bench)")).as("jensens_alpha"),
          P.normd(expr("regr_slope(ret, bench)")).as("jensens_beta")
        )
        .orderBy("series_id")
    },
    Some(
      s"WITH ub AS ($userBarsCte), " +
        s"r AS (SELECT series_id, ts, close / nullif(lag(close, 1) $ov, 0) - 1e0 AS ret FROM ub), " +
        "b AS (SELECT *, avg(ret) OVER (PARTITION BY ts) AS bench FROM r) " +
        "SELECT series_id, round(regr_intercept(ret, bench), 6) AS jensens_alpha, " +
        "round(regr_slope(ret, bench), 6) AS jensens_beta " +
        "FROM b GROUP BY series_id ORDER BY series_id"
    )
  )

  // ------------------------------------------------------------ Q37 anchored vwap
  /** vwap(anchor=D) on the per-user event stream (volume ≡ 1): cumulative
    * mean of value within each (user, day) anchor group. */
  val qVwapAnchor = Q(
    "vwap_anchor_d",
    (s: SparkSession, dir: String) => {
      val ev = Graft.events(s, dir)
      val wd = Window
        .partitionBy(col("user_id"), to_date(col("tstamp")))
        .orderBy("ts_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.select(
        col("user_id").as("series_id"),
        col("ts_us").as("ts"),
        P.normd(sum("value").over(wd) / count(lit(1)).over(wd)).as("vwap_d")
      ).orderBy("series_id", "ts")
    },
    Some(
      "SELECT user_id AS series_id, epoch_us(ts) AS ts, " +
        "round(sum(value) OVER wd / count(*) OVER wd, 6) AS vwap_d FROM events " +
        "WINDOW wd AS (PARTITION BY user_id, date_trunc('day', ts) ORDER BY epoch_us(ts) " +
        "ROWS UNBOUNDED PRECEDING) ORDER BY series_id, ts"
    )
  )

  // ------------------------------------------------------------ Q49 revenue
  /** Revenue by nation: lineitem ⋈ orders ⋈ customer ⋈ nation. DECIMAL sum
    * for order-independent money totals; nation broadcast. */
  val qRevenueNation = Q(
    "q49_revenue_nation",
    (s: SparkSession, dir: String) => {
      val li = Graft.table(s, dir, "lineitem")
      val o = Graft.table(s, dir, "orders")
      val c = Graft.table(s, dir, "customer")
      val n = Graft.table(s, dir, "nation")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(DecimalType(30, 6)))
            .cast("double")
            .as("revenue"),
          count(lit(1)).as("n_items")
        )
        .select(col("n_name"), P.normd(col("revenue")).as("revenue"), col("n_items"))
        .orderBy("n_name")
    },
    Some(
      "SELECT n_name, round(CAST(sum(CAST(l_extendedprice * (1e0 - l_discount) AS DECIMAL(30,6))) AS DOUBLE), 6) AS revenue, " +
        "count(*) AS n_items " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "GROUP BY n_name ORDER BY n_name"
    )
  )

  // ------------------------------------------------------------ Q50 sessions
  /** Sessionization: a new session starts after a >30 min gap. Per user:
    * session count, event count, events per session. Integer arithmetic
    * except the final ratio — hash-stable. */
  val qSessions = Q(
    "q50_sessions",
    (s: SparkSession, dir: String) => {
      val w = Window.partitionBy("user_id").orderBy("ts_us")
      Graft
        .events(s, dir)
        .withColumn(
          "new_s",
          when(col("ts_us") - lag("ts_us", 1).over(w) > 30L * 60L * 1000000L, 1L)
            .otherwise(lit(0L))
        )
        .withColumn(
          "sid",
          sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        )
        .groupBy(col("user_id").as("series_id"))
        .agg(
          (max("sid") + 1L).as("n_sessions"),
          count(lit(1)).as("n_events"),
          P.normd(count(lit(1)).cast("double") / (max("sid") + 1L)).as("events_per_session")
        )
        .orderBy("series_id")
    },
    Some(
      "WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events), " +
        "g AS (SELECT *, CASE WHEN ts_us - lag(ts_us, 1) OVER (PARTITION BY user_id ORDER BY ts_us) > 1800000000 " +
        "THEN 1 ELSE 0 END AS new_s FROM e), " +
        "s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us ROWS UNBOUNDED PRECEDING) AS sid FROM g) " +
        "SELECT user_id AS series_id, CAST(max(sid) + 1 AS BIGINT) AS n_sessions, count(*) AS n_events, " +
        "round(CAST(count(*) AS DOUBLE) / (max(sid) + 1), 6) AS events_per_session " +
        "FROM s GROUP BY user_id ORDER BY series_id"
    )
  )

  /** q49 revenue through the SALTED lineitem⋈orders join: same oracle —
    * salting must be result-invisible. Gates the Skew operator's
    * correctness on real FK data (the static mitigation when AQE's
    * runtime skew split cannot apply). */
  val qSaltedRevenue = Q(
    "x_salted_revenue",
    (s: SparkSession, dir: String) => {
      // Project BEFORE the salted join (round 16, guide §2.3): the default
      // salt hashes every big-side column, which forced an 11-column
      // lineitem ReadSchema for a 3-column query. Salting only routes
      // rows, so a narrower salt input is result-invisible.
      //
      // AGGREGATE before the shuffle (round 17, guide §2.3): the query
      // only consumes per-order revenue and item count, so lineitem is
      // reduced to one row per l_orderkey BEFORE the salted join — the
      // map-side partial aggregate collapses most rows before any
      // exchange, the salted join then routes ~4× fewer big-side rows,
      // and its output is order-sized, not lineitem-sized. Result is
      // bit-identical: per-item revenue terms are cast to DECIMAL(30,6)
      // exactly as before, and decimal/long addition is exact, so
      // regrouping the sum (per order, then per nation) cannot change
      // the final doubles. Oracle unchanged and re-verified.
      val li = Graft
        .table(s, dir, "lineitem")
        .select("l_orderkey", "l_extendedprice", "l_discount")
        .groupBy("l_orderkey")
        .agg(
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(DecimalType(30, 6)))
            .as("__rev"),
          count(lit(1)).as("__n")
        )
      val o = Graft.table(s, dir, "orders").select("o_orderkey", "o_custkey")
      val c = Graft.table(s, dir, "customer").select("c_custkey", "c_nationkey")
      val n = Graft.table(s, dir, "nation")
      graft.operators.Skew
        .saltedJoin(li, o, Seq("l_orderkey"), Seq("o_orderkey"), factor = 8)
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          sum(col("__rev")).cast("double").as("revenue"),
          sum(col("__n")).as("n_items")
        )
        .select(col("n_name"), P.normd(col("revenue")).as("revenue"), col("n_items"))
        .orderBy("n_name")
    },
    qRevenueNation.sql
  )

  /** q49 revenue through the HOT-KEY-ONLY salted join: keys above 12
    * lineitems take the salted path, the rest join plain — replication
    * shrinks to the hot slice while the result stays oracle-identical.
    * Both paths are genuinely exercised at every SF (TPC-H orders peak at
    * ~17 lines). */
  val qSaltedHotRevenue = Q(
    "x_salted_hot",
    (s: SparkSession, dir: String) => {
      // same early projection as x_salted_revenue (guide §2.3)
      val li = Graft
        .table(s, dir, "lineitem")
        .select("l_orderkey", "l_extendedprice", "l_discount")
      val o = Graft.table(s, dir, "orders").select("o_orderkey", "o_custkey")
      val c = Graft.table(s, dir, "customer").select("c_custkey", "c_nationkey")
      val n = Graft.table(s, dir, "nation")
      graft.operators.Skew
        .saltedJoinHot(li, o, Seq("l_orderkey"), Seq("o_orderkey"), factor = 8, hotThreshold = 12)
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(DecimalType(30, 6)))
            .cast("double")
            .as("revenue"),
          count(lit(1)).as("n_items")
        )
        .select(col("n_name"), P.normd(col("revenue")).as("revenue"), col("n_items"))
        .orderBy("n_name")
    },
    qRevenueNation.sql
  )

  /** Retention cohort matrix over the events stream: cohort = a user's
    * first active day, cell (cohort_day, day_offset) = distinct users from
    * that cohort active offset days later. Two hash aggregates + one
    * broadcast-able join on user_id — no window, no row explosion; the
    * matrix is |days|² rows regardless of event volume. */
  val qRetention = Q(
    "x_retention",
    (s: SparkSession, dir: String) => {
      val ev = Graft
        .events(s, dir)
        .select(col("user_id"), (col("ts_us") / lit(86400000000L)).cast("long").as("day"))
      val firstDay = ev.groupBy("user_id").agg(min("day").as("cohort_day"))
      ev.join(firstDay, "user_id")
        .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
        .agg(countDistinct("user_id").as("n_users"))
        .orderBy("cohort_day", "day_offset")
    },
    Some(
      "WITH ev AS (SELECT user_id, CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day FROM events), " +
        "fd AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY 1) " +
        "SELECT cohort_day, day - cohort_day AS day_offset, count(DISTINCT ev.user_id) AS n_users " +
        "FROM ev JOIN fd ON ev.user_id = fd.user_id GROUP BY 1, 2 ORDER BY 1, 2"
    )
  )

  /** Ordered funnel (signup → view → purchase) over the events stream:
    * per user, the first signup, the first view strictly after it, the
    * first purchase strictly after that; output = users reaching each
    * step.
    *
    * ONE-PASS spelling (round 17, guide §2.4/§1.2): the old chain of
    * three conditional aggregates joined back on user_id duplicated its
    * own subtrees — Spark shares nothing across a plan, so s1 was
    * computed 3×, v1 2×, and the events table was SCANNED SIX TIMES per
    * run (probed: 9 AQE jobs). The rewrite sorts each user's events once
    * and reads the funnel off running minima:
    *   rs1 = min signup ts so far; a view qualifies iff ts > rs1 — for
    *   the FIRST qualifying view this equals "ts > s1" exactly (if
    *   ts > s1 the signup at s1 precedes it in (ts_us, event_id) order,
    *   so rs1 = s1 at that row; if ts ≤ s1 no earlier signup exists and
    *   the condition is false either way) — and min(qualifying view ts)
    *   = v1; rv1/purchase repeats the argument one level up.
    * One scan, one exchange (the window's hashpartitioning(user_id) is
    * reused by the per-user aggregate), two stacked Window ops sharing
    * one sort, then a global conditional count. All-integer mins — no FP
    * contract. Steps with zero users emit no row, like the old union. */
  val qFunnel = Q(
    "x_funnel",
    (s: SparkSession, dir: String) => {
      val ev = Graft
        .events(s, dir)
        .select(col("user_id"), col("event_type"), col("ts_us"), col("event_id"))
      val w = Window
        .partitionBy("user_id")
        .orderBy(col("ts_us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val staged = ev
        .withColumn("rs1", min(when(col("event_type") === "signup", col("ts_us"))).over(w))
        .withColumn(
          "rv1",
          min(when(col("event_type") === "view" && col("ts_us") > col("rs1"), col("ts_us"))).over(w)
        )
      val perUser = staged
        .groupBy("user_id")
        .agg(
          min(when(col("event_type") === "signup", col("ts_us"))).as("s1"),
          min(when(col("event_type") === "view" && col("ts_us") > col("rs1"), col("ts_us"))).as("v1"),
          min(when(col("event_type") === "purchase" && col("ts_us") > col("rv1"), col("ts_us"))).as("p1")
        )
      perUser
        .agg(count(col("s1")).as("n1"), count(col("v1")).as("n2"), count(col("p1")).as("n3"))
        .select(
          explode(
            array(
              struct(lit("1_signup").as("step"), col("n1").as("n_users")),
              struct(lit("2_view").as("step"), col("n2").as("n_users")),
              struct(lit("3_purchase").as("step"), col("n3").as("n_users"))
            )
          ).as("r")
        )
        .select(col("r.step").as("step"), col("r.n_users").as("n_users"))
        .where(col("n_users") > 0)
        .orderBy("step")
    },
    Some(
      "WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events), " +
        "s1 AS (SELECT user_id, min(CASE WHEN event_type = 'signup' THEN ts_us END) AS s1 " +
        "FROM ev GROUP BY 1 HAVING s1 IS NOT NULL), " +
        "v1 AS (SELECT ev.user_id, min(CASE WHEN event_type = 'view' AND ts_us > s1.s1 THEN ts_us END) AS v1 " +
        "FROM ev JOIN s1 ON ev.user_id = s1.user_id GROUP BY 1 HAVING v1 IS NOT NULL), " +
        "p1 AS (SELECT ev.user_id, min(CASE WHEN event_type = 'purchase' AND ts_us > v1.v1 THEN ts_us END) AS p1 " +
        "FROM ev JOIN v1 ON ev.user_id = v1.user_id GROUP BY 1 HAVING p1 IS NOT NULL) " +
        "SELECT step, n_users FROM (" +
        "SELECT '1_signup' AS step, count(DISTINCT user_id) AS n_users FROM s1 " +
        "UNION ALL SELECT '2_view', count(DISTINCT user_id) FROM v1 " +
        "UNION ALL SELECT '3_purchase', count(DISTINCT user_id) FROM p1) ORDER BY step"
    )
  )

  /** Time-RANGE window features: per-user trailing-7-day event count /
    * exact decimal sum / max at every event — the time-based (not
    * row-count) frame a feature pipeline feeds to training. The sum runs
    * in DECIMAL so the frame-internal addition order (Spark running
    * accumulation vs DuckDB segment tree) cannot flip low bits. */
  val qRolling7d = Q(
    "x_rolling_7d",
    (s: SparkSession, dir: String) => {
      val w7 = Window
        .partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-7L * 86400L * 1000000L, Window.currentRow)
      Graft
        .events(s, dir)
        .select(
          col("user_id").as("series_id"),
          col("ts_us"),
          count(lit(1)).over(w7).as("n_7d"),
          P.normd(sum(col("value").cast(DecimalType(30, 6))).over(w7).cast("double")).as("vsum_7d"),
          P.normd(max("value").over(w7)).as("vmax_7d")
        )
        .orderBy("series_id", "ts_us")
    },
    Some(
      "WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, value FROM events) " +
        "SELECT user_id AS series_id, ts_us, count(*) OVER w AS n_7d, " +
        "round(CAST(sum(CAST(value AS DECIMAL(30,6))) OVER w AS DOUBLE), 6) AS vsum_7d, " +
        "round(max(value) OVER w, 6) AS vmax_7d FROM e " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts_us RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW) " +
        "ORDER BY series_id, ts_us"
    )
  )

  /** Purged walk-forward cross-validation audit (López de Prado's purged
    * time-series CV, walk-forward form): the global time axis splits into
    * nFolds+1 equal blocks; fold f tests on block f and trains on
    * everything ending one embargo period BEFORE the test start — the
    * embargoed rows between train_end and test_start belong to neither
    * side, so serially-correlated labels cannot leak across the split.
    * Output is the per-fold audit (boundaries + train/embargo/test row
    * counts) a training pipeline records next to each fold's metrics.
    *
    * Scale: min/max is one O(1) aggregate; the fold counts are 3·nFolds
    * conditional sums in ONE map-side-combined pass over the table
    * (no per-fold scan, no row explosion), then a driver-side stack of
    * the single aggregate row. All-integer arithmetic — no FP contract. */
  val qWalkForward = Q(
    "x_walkforward",
    (s: SparkSession, dir: String) => {
      val nF = 4
      val emb = 3600000000L // 1h embargo, micros
      val ev = Graft.events(s, dir).select(col("ts_us").cast("long").as("ts_us"))
      val r0 = ev.agg(min("ts_us").as("lo"), max("ts_us").as("hi")).head()
      val lo = r0.getLong(0); val hi = r0.getLong(1); val span = hi - lo + 1
      def b(i: Int): Long = lo + i.toLong * span / (nF + 1)
      val aggs = (1 to nF).flatMap { f =>
        val ts0 = b(f); val te = b(f + 1); val tr = ts0 - emb
        Seq(
          sum(when(col("ts_us") < tr, 1L).otherwise(0L)).as(s"tr$f"),
          sum(when(col("ts_us") >= tr && col("ts_us") < ts0, 1L).otherwise(0L)).as(s"em$f"),
          sum(when(col("ts_us") >= ts0 && col("ts_us") < te, 1L).otherwise(0L)).as(s"te$f")
        )
      }
      val one = ev.agg(aggs.head, aggs.tail: _*)
      val stackArgs = (1 to nF)
        .map(f => s"CAST($f AS BIGINT), CAST(${b(f) - emb} AS BIGINT), CAST(${b(f)} AS BIGINT), CAST(${b(f + 1)} AS BIGINT), tr$f, em$f, te$f")
        .mkString(", ")
      one
        .selectExpr(
          s"stack($nF, $stackArgs) AS (fold, train_end, test_start, test_end, n_train, n_embargo, n_test)"
        )
        .orderBy("fold")
    },
    Some(
      "WITH bnd AS (SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) - min(epoch_us(ts)) + 1 AS span FROM events), " +
        "ev AS (SELECT epoch_us(ts) AS t FROM events), " +
        "c AS (SELECT f.fold AS fold, bnd.lo + f.fold * bnd.span // 5 AS test_start, " +
        "bnd.lo + (f.fold + 1) * bnd.span // 5 AS test_end " +
        "FROM (SELECT unnest(range(1, 5)) AS fold) f, bnd) " +
        "SELECT c.fold AS fold, c.test_start - 3600000000 AS train_end, c.test_start AS test_start, " +
        "c.test_end AS test_end, " +
        "CAST(sum(CASE WHEN ev.t < c.test_start - 3600000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_train, " +
        "CAST(sum(CASE WHEN ev.t >= c.test_start - 3600000000 AND ev.t < c.test_start THEN 1 ELSE 0 END) AS BIGINT) AS n_embargo, " +
        "CAST(sum(CASE WHEN ev.t >= c.test_start AND ev.t < c.test_end THEN 1 ELSE 0 END) AS BIGINT) AS n_test " +
        "FROM c, ev GROUP BY 1, 2, 3, 4 ORDER BY fold"
    )
  )

  /** Calendar resample + forward-fill (the pandas `resample('1h').last()
    * .ffill()` workflow): per user, the last observed value in each hour
    * of the GLOBAL [min, max] hour grid, gaps forward-filled from the
    * most recent observed hour; is_gap marks filled rows. The grid is a
    * 1-row bounds aggregate cross-broadcast into a `sequence` explode
    * (series × hours — key-sized), the per-hour last is one hash-agg of
    * the big side, and the fill is one `last(ignoreNulls)` window over
    * the key-sized grid. No value arithmetic anywhere — outputs are
    * copies of input doubles, so the compare is exact. */
  val qResampleFfill = Q(
    "x_resample_ffill",
    (s: SparkSession, dir: String) => {
      val hourUs = 3600000000L
      val ev = Graft.userSeries(s, dir) // series_id, ts (micros), close
        .withColumn("hour", (col("ts") / lit(hourUs)).cast("long") * lit(hourUs))
      val lastPerHour = ev
        .groupBy("series_id", "hour")
        .agg(expr("max_by(close, ts)").as("close"))
      val bounds = broadcast(
        ev.agg(min("hour").as("__lo"), max("hour").as("__hi"))
      )
      val grid = lastPerHour
        .select("series_id")
        .distinct()
        .crossJoin(bounds)
        .select(
          col("series_id"),
          explode(expr(s"sequence(__lo, __hi, $hourUs)")).as("hour")
        )
      val w = Window
        .partitionBy("series_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid
        .join(lastPerHour, Seq("series_id", "hour"), "left")
        .select(
          col("series_id"),
          col("hour").as("ts"),
          last(col("close"), ignoreNulls = true).over(w).as("close_ffill"),
          col("close").isNull.as("is_gap")
        )
        .orderBy("series_id", "ts")
    },
    Some(
      s"WITH s AS ($seriesCte), " +
        "e AS (SELECT series_id, ts // 3600000000 * 3600000000 AS hour, ts, close FROM s), " +
        "lh AS (SELECT series_id, hour, arg_max(close, ts) AS close FROM e GROUP BY 1, 2), " +
        "b AS (SELECT min(hour) AS lo, max(hour) AS hi FROM e), " +
        "grid AS (SELECT sid.series_id, h.hour FROM (SELECT DISTINCT series_id FROM lh) sid, " +
        "(SELECT unnest(range(b.lo, b.hi + 1, 3600000000)) AS hour FROM b) h) " +
        "SELECT grid.series_id, grid.hour AS ts, " +
        "last_value(lh.close IGNORE NULLS) OVER (PARTITION BY grid.series_id ORDER BY grid.hour " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS close_ffill, " +
        "lh.close IS NULL AS is_gap " +
        "FROM grid LEFT JOIN lh ON lh.series_id = grid.series_id AND lh.hour = grid.hour " +
        "ORDER BY grid.series_id, ts"
    )
  )

  /** Pairwise cross-series Pearson correlation of DAILY closes (the
    * cross-sectional matrix a multi-asset user computes): series pairs
    * a < b aligned on day, correlation from explicit co-moment sums so
    * both engines compute the SAME FORMULA — but the co-moment sums are
    * plain unordered double aggregates (Spark's partial/final hash-agg
    * addition order is nondeterministic), so 6 dp parity rests on the
    * panel's magnitudes keeping the summation error below rounding, not
    * on an ordered-fold contract — [[qCorrMatrixOrd]] is the bit-stable
    * spelling for panels where that headroom is in doubt. The day-keyed
    * self-join explodes S² per day — exact all-pairs semantics, intended
    * for the cross-sectional case where S is panel-sized (10s–1000s);
    * corpus-scale similarity belongs to the banded/sketch operators. */
  val qCorrMatrix = Q(
    "x_corr_matrix",
    (s: SparkSession, dir: String) => {
      val daily = Graft
        .userSeries(s, dir)
        // deterministic sub-panel (every 3rd series): the matrix is S²/2
        // pairs BY CONSTRUCTION, so the gate runs a hash-stable sample —
        // exactly how a 100 TB deployment sizes the panel before paying
        // the full cross product (SCALING.md measures the S² curve)
        .where(col("series_id") % 3 === 0)
        .groupBy(col("series_id"), (col("ts") / lit(86400000000L)).cast("long").as("day"))
        .agg(expr("max_by(close, ts)").as("close"))
      val a = daily.select(col("series_id").as("sa"), col("day"), col("close").as("xa"))
      val b = daily.select(col("series_id").as("sb"), col("day"), col("close").as("xb"))
      val n = count(lit(1)).cast("double")
      val num = n * sum(col("xa") * col("xb")) - sum("xa") * sum("xb")
      val da = n * sum(col("xa") * col("xa")) - sum("xa") * sum("xa")
      val db = n * sum(col("xb") * col("xb")) - sum("xb") * sum("xb")
      a.join(b, Seq("day"))
        .where(col("sa") < col("sb"))
        .groupBy("sa", "sb")
        .agg(
          count(lit(1)).as("n_days"),
          P.normd(num / when(da * db > 0.0, sqrt(da * db))).as("corr")
        )
        .orderBy("sa", "sb")
    },
    Some(
      s"WITH s AS ($seriesCte), " +
        "d AS (SELECT series_id, ts // 86400000000 AS day, arg_max(close, ts) AS close FROM s " +
        "WHERE series_id % 3 = 0 GROUP BY 1, 2), " +
        "j AS (SELECT a.series_id AS sa, b.series_id AS sb, a.close AS xa, b.close AS xb " +
        "FROM d a JOIN d b ON a.day = b.day AND a.series_id < b.series_id) " +
        "SELECT sa, sb, count(*) AS n_days, " +
        "round((count(*) * sum(xa * xb) - sum(xa) * sum(xb)) / " +
        "(CASE WHEN (count(*) * sum(xa * xa) - sum(xa) * sum(xa)) * (count(*) * sum(xb * xb) - sum(xb) * sum(xb)) > 0 " +
        "THEN sqrt((count(*) * sum(xa * xa) - sum(xa) * sum(xa)) * (count(*) * sum(xb * xb) - sum(xb) * sum(xb))) END), 6) AS corr " +
        "FROM j GROUP BY 1, 2 ORDER BY 1, 2"
    )
  )

  /** ORDERED-FOLD variant of [[qCorrMatrix]] — closes its accepted risk:
    * the five co-moment sums fold per pair in DAY order via the
    * Similarity.orderedSum pattern (sort_array(collect_list) + aggregate
    * from 0.0 ≡ DuckDB list_reduce over list(x ORDER BY day)), so both
    * engines run the IDENTICAL addition sequence and 6 dp parity is a
    * bit-stability contract, not a magnitude bet. Cost: materializes each
    * pair's aligned day list (n_days doubles × 5 sums) inside the
    * aggregate — per-pair state is days-sized rather than O(1), the
    * documented price of determinism; panels with benign magnitudes keep
    * the O(1) unordered spelling. The gate runs a SMALLER sub-panel than
    * x_corr_matrix (every 9th series, not every 3rd): the contract under
    * test is the fold order, which any panel size witnesses — and
    * DuckDB 1.0's ordered-aggregate path (`list(x ORDER BY day)` under
    * GROUP BY) peaks near its full memory limit at the 125k-pair sf0.1
    * panel (measured ~100 GiB / 37 s for a 3.4 M-row input), so the
    * full-panel oracle is borderline-OOM flaky while the engine side is
    * untroubled. */
  val qCorrMatrixOrd = Q(
    "x_corr_matrix_ord",
    (s: SparkSession, dir: String) => {
      val daily = Graft
        .userSeries(s, dir)
        .where(col("series_id") % 9 === 0)
        .groupBy(col("series_id"), (col("ts") / lit(86400000000L)).cast("long").as("day"))
        .agg(expr("max_by(close, ts)").as("close"))
      val a = daily.select(col("series_id").as("sa"), col("day"), col("close").as("xa"))
      val b = daily.select(col("series_id").as("sb"), col("day"), col("close").as("xb"))
      import graft.extensions.Similarity.orderedSum
      val grouped = a.join(b, Seq("day"))
        .where(col("sa") < col("sb"))
        .groupBy("sa", "sb")
        .agg(
          count(lit(1)).as("n_days"),
          orderedSum(col("day"), col("xa")).as("sxa"),
          orderedSum(col("day"), col("xb")).as("sxb"),
          orderedSum(col("day"), col("xa") * col("xb")).as("sab"),
          orderedSum(col("day"), col("xa") * col("xa")).as("saa"),
          orderedSum(col("day"), col("xb") * col("xb")).as("sbb")
        )
      val n = col("n_days").cast("double")
      val num = n * col("sab") - col("sxa") * col("sxb")
      val da = n * col("saa") - col("sxa") * col("sxa")
      val db = n * col("sbb") - col("sxb") * col("sxb")
      grouped
        .select(
          col("sa"),
          col("sb"),
          col("n_days"),
          P.normd(num / when(da * db > 0.0, sqrt(da * db))).as("corr")
        )
        .orderBy("sa", "sb")
    },
    Some(
      s"WITH s AS ($seriesCte), " +
        "d AS (SELECT series_id, ts // 86400000000 AS day, arg_max(close, ts) AS close FROM s " +
        "WHERE series_id % 9 = 0 GROUP BY 1, 2), " +
        "j AS (SELECT a.series_id AS sa, b.series_id AS sb, a.day AS day, a.close AS xa, b.close AS xb " +
        "FROM d a JOIN d b ON a.day = b.day AND a.series_id < b.series_id), " +
        "g AS (SELECT sa, sb, count(*) AS n_days, " +
        "list_reduce(list(xa ORDER BY day), (a, x) -> a + x) AS sxa, " +
        "list_reduce(list(xb ORDER BY day), (a, x) -> a + x) AS sxb, " +
        "list_reduce(list(xa * xb ORDER BY day), (a, x) -> a + x) AS sab, " +
        "list_reduce(list(xa * xa ORDER BY day), (a, x) -> a + x) AS saa, " +
        "list_reduce(list(xb * xb ORDER BY day), (a, x) -> a + x) AS sbb " +
        "FROM j GROUP BY 1, 2) " +
        "SELECT sa, sb, n_days, " +
        "round((n_days * sab - sxa * sxb) / " +
        "(CASE WHEN (n_days * saa - sxa * sxa) * (n_days * sbb - sxb * sxb) > 0 " +
        "THEN sqrt((n_days * saa - sxa * sxa) * (n_days * sbb - sxb * sxb)) END), 6) AS corr " +
        "FROM g ORDER BY 1, 2"
    )
  )

  /** First-order Markov transition matrix over per-user event-type
    * sequences — the behavioral model (and next-event training-label
    * extractor) a sequence pipeline starts from. One lead() window pass
    * keyed the same as every per-user op, a (from, to) hash-aggregate,
    * and the row-normalization window runs over the KEY-SIZED aggregate
    * (|event types|² rows), not the events. p = n / Σ_to n per from. */
  val qMarkov = Q(
    "x_markov",
    (s: SparkSession, dir: String) => {
      val w = Window.partitionBy("user_id").orderBy("ts_us")
      val pairs = Graft
        .events(s, dir)
        .select(col("user_id"), col("event_type"), col("ts_us"))
        .withColumn("nxt", lead(col("event_type"), 1).over(w))
        .where(col("nxt").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("nxt").as("to_type"))
        .agg(count(lit(1)).as("n"))
      pairs
        .withColumn(
          "p",
          P.normd(
            col("n").cast("double") /
              sum("n").over(Window.partitionBy("from_type"))
          )
        )
        .orderBy("from_type", "to_type")
    },
    Some(
      "WITH e AS (SELECT user_id, event_type, " +
        "lead(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) AS nxt FROM events), " +
        "t AS (SELECT event_type AS from_type, nxt AS to_type, count(*) AS n " +
        "FROM e WHERE nxt IS NOT NULL GROUP BY 1, 2) " +
        "SELECT from_type, to_type, n, " +
        "round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_type), 6) AS p " +
        "FROM t ORDER BY from_type, to_type"
    )
  )

  /** Rolling beta + correlation of each series' daily returns against the
    * equal-weight cross-sectional benchmark (avg return that day) — the
    * rolling-factor-exposure panel a risk system maintains. Returns and
    * the benchmark stage in one pass (lag window + per-day window over
    * the same daily frame); the co-moment rolling sums are plain W-class
    * windows on the shared (series, ts) key, so the whole panel is two
    * window passes and zero joins. Day-1 rows (null return) are dropped
    * BEFORE the rolling frames so both engines count identical rows. */
  val qRollingBeta = {
    val n = 10
    Q(
      "x_rolling_beta",
      (s: SparkSession, dir: String) => {
        val w = Window.partitionBy("series_id").orderBy("ts")
        val fr = w.rowsBetween(-(n - 1), Window.currentRow)
        val staged = Graft
          .userBars(s, dir)
          .withColumn("ret", P.sdiv(col("close"), lag("close", 1).over(w)) - 1.0)
          .withColumn("bench", avg("ret").over(Window.partitionBy("ts")))
          .where(col("ret").isNotNull && col("bench").isNotNull)
        val cnt = count(col("ret")).over(fr)
        def g(c: org.apache.spark.sql.Column) = when(cnt >= n, c)
        val sxy = g(sum(col("ret") * col("bench")).over(fr))
        val sx = g(sum(col("ret")).over(fr))
        val sy = g(sum(col("bench")).over(fr))
        val syy = g(sum(col("bench") * col("bench")).over(fr))
        val sxx = g(sum(col("ret") * col("ret")).over(fr))
        val nn = lit(n.toDouble)
        val covn = nn * sxy - sx * sy
        val varb = nn * syy - sy * sy
        val varx = nn * sxx - sx * sx
        staged
          .select(
            col("series_id"),
            col("ts"),
            P.normd(covn / when(varb =!= 0.0, varb)).as(s"beta_$n"),
            P.normd(covn / when(varx * varb > 0.0, sqrt(varx * varb))).as(s"corr_$n")
          )
          .orderBy("series_id", "ts")
      },
      Some {
        val frS = s"OVER ($W ROWS BETWEEN ${n - 1} PRECEDING AND CURRENT ROW)"
        def g(v: String) = s"CASE WHEN count(ret) $frS >= $n THEN $v END"
        s"WITH ub AS ($userBarsCte), " +
          s"r AS (SELECT series_id, ts, close / nullif(lag(close, 1) $ov, 0) - 1e0 AS ret FROM ub), " +
          "b AS (SELECT *, avg(ret) OVER (PARTITION BY ts) AS bench FROM r), " +
          "f AS (SELECT series_id, ts, ret, bench FROM b WHERE ret IS NOT NULL AND bench IS NOT NULL), " +
          "m AS (SELECT series_id, ts, " +
          s"${g(s"sum(ret * bench) $frS")} AS sxy, ${g(s"sum(ret) $frS")} AS sx, " +
          s"${g(s"sum(bench) $frS")} AS sy, ${g(s"sum(bench * bench) $frS")} AS syy, " +
          s"${g(s"sum(ret * ret) $frS")} AS sxx FROM f) " +
          s"SELECT series_id, ts, " +
          s"round(($n * sxy - sx * sy) / nullif($n * syy - sy * sy, 0), 6) AS beta_$n, " +
          s"round(($n * sxy - sx * sy) / (CASE WHEN ($n * sxx - sx * sx) * ($n * syy - sy * sy) > 0 " +
          s"THEN sqrt(($n * sxx - sx * sx) * ($n * syy - sy * sy)) END), 6) AS corr_$n " +
          "FROM m" + orderTail
      }
    )
  }

  val all: Seq[Q] =
    Seq(qVp, qMetrics, qJensens, qVwapAnchor, qRevenueNation, qSaltedRevenue, qSaltedHotRevenue, qSessions, qRolling7d, qRetention, qFunnel, qWalkForward, qResampleFfill, qCorrMatrix, qCorrMatrixOrd, qMarkov, qRollingBeta)
}
