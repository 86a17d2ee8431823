package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.SortExec
import graft.sources.Layout
import graft.ta.Ta._

/** SURVEY §4.2: a bucketed+sorted layout must let window pipelines run
  * with ZERO exchanges (the scan satisfies the required distribution). */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed layout removes the window shuffle entirely") {
    val ser = Graft.userSeries(spark, TestSpark.sfDir)
      .select(col("series_id").cast("string").as("series_id"), col("ts"), col("close"))
    spark.sql("DROP TABLE IF EXISTS graft_series_bucketed")
    // the in-memory catalog forgets tables between JVMs but the warehouse
    // directory persists — clear it or CREATE TABLE refuses the location
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
      "graft_series_bucketed"
    )
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    if (loc.exists()) rm(loc)
    ser
      .write
      .mode("overwrite")
      .bucketBy(8, "series_id")
      .sortBy("series_id", "ts")
      .format("parquet")
      .saveAsTable("graft_series_bucketed")

    val out = spark.table("graft_series_bucketed").ta.sma(10).ta.rsi(10)
    out.collect()
    val plan = out.queryExecution.executedPlan
    val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.isEmpty, s"bucketed scan still shuffles:\n$plan")

    // values must equal the plain-layout computation
    val bucketed = out.select("series_id", "ts", "sma_10", "rsi_10")
      .orderBy("series_id", "ts").collect().toSeq
    val plain = ser.ta.sma(10).ta.rsi(10).select("series_id", "ts", "sma_10", "rsi_10")
      .orderBy("series_id", "ts").collect().toSeq
    assert(bucketed == plain)
  }

  test("co-bucketed tables join with zero exchanges (co-located star join)") {
    val dropAnd = Seq("graft_orders_b", "graft_lineitem_b")
    dropAnd.foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
        t
      )
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      if (loc.exists()) rm(loc)
    }
    val orders = Graft.table(spark, TestSpark.sfDir, "orders")
    val lineitem = Graft.table(spark, TestSpark.sfDir, "lineitem")
    Layout.writeBucketedBy(orders, "graft_orders_b", "o_orderkey", buckets = 8)
    Layout.writeBucketedBy(
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
      "graft_lineitem_b",
      "o_orderkey",
      buckets = 8
    )
    // broadcast pinned off so the plan must choose SMJ/shuffled-hash — the
    // co-location claim is about avoiding the EXCHANGE, not the join algo
    val thr0 = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark
        .table("graft_lineitem_b")
        .join(spark.table("graft_orders_b"), "o_orderkey")
        .groupBy("o_orderpriority")
        .agg(sum(col("l_quantity")).as("qty"))
      j.collect()
      val exchanges = j.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      // ONE exchange is allowed: the final small groupBy on priority.
      // The join itself must not shuffle either 32-bucket scan.
      assert(
        exchanges.size <= 1,
        s"co-bucketed join still shuffles its inputs:\n${j.queryExecution.executedPlan}"
      )
      // and the values equal the plain-layout join
      val bucketed =
        j.orderBy("o_orderpriority").collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
      val plain = lineitem
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(sum(col("l_quantity")).as("qty"))
        .orderBy("o_orderpriority")
        .collect()
        .map(r => (r.getString(0), r.getDouble(1)))
        .toSeq
      assert(bucketed == plain)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr0)
  }

  test("csv/json ingestion resolves case-insensitive OHLCV like the reference") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_src").toFile
    Seq(("A", 1L, 1.0, 2.0, 0.5, 1.5, 10.0))
      .toDF("Series_ID", "TS", "Open", "HIGH", "low", "Close", "Volume")
      .write.option("header", "true").mode("overwrite").csv(s"$dir/csv")
    val c = Layout.readCsv(spark, s"$dir/csv")
    assert(c.columns.toSeq == Layout.canonical)
    assert(c.collect().head.getDouble(3) == 2.0) // high

    Seq(("B", 2L, 1.0, 2.0, 0.5, 1.5))
      .toDF("series_id", "ts", "open", "high", "low", "close")
      .write.mode("overwrite").json(s"$dir/json")
    val j = Layout.readJson(spark, s"$dir/json")
    assert(j.collect().head.getDouble(6) == 0.0) // defaulted volume
  }

  test("z-ordered layout keeps per-file key ranges narrow (multi-dim skipping)") {
    import graft.sources.Layout
    val ev = Graft
      .events(spark, TestSpark.sfDir)
      .select(col("user_id"), (col("ts_us") / 86400000000L).cast("long").as("day"), col("value"))
    val dir = java.nio.file.Files.createTempDirectory("graft_z").toFile.getAbsolutePath
    // baseline: the natural time-sorted layout
    ev.orderBy("day").coalesce(1).repartitionByRange(16, col("day"))
      .sortWithinPartitions("day")
      .write.mode("overwrite").parquet(s"$dir/bytime")
    Layout.writeZOrdered(ev, s"$dir/zorder", "user_id", "day", files = 16, bits = 16)

    // per-FILE user_id span: how many files would a user_id predicate touch?
    def filesCovering(path: String, target: Long): Int = {
      val files = new java.io.File(path).listFiles().filter(_.getName.endsWith(".parquet"))
      files.count { f =>
        val mm = spark.read.parquet(f.getAbsolutePath)
          .agg(min("user_id"), max("user_id")).collect()(0)
        mm.getLong(0) <= target && target <= mm.getLong(1)
      }
    }
    val probe = 77L
    val t = filesCovering(s"$dir/bytime", probe)
    val z = filesCovering(s"$dir/zorder", probe)
    // time-sorted files each span nearly all users; the z-curve confines
    // the probe user to a small file subset
    assert(z * 2 <= t, s"z-order files=$z not better than time layout files=$t")
    // z-order result is still the same data
    assert(spark.read.parquet(s"$dir/zorder").count() == ev.count())
  }

  test("3-column z-order confines the gate box to under half the time-layout files") {
    // the x_zorder_scan gate's layout: writeZOrderedN on (user_id, ts_us,
    // value); the gate's conjunctive box (narrow in every clustered dim)
    // must touch < 50% of the files a time-sorted layout makes a
    // footer-pruning reader touch
    val ev = Graft
      .events(spark, TestSpark.sfDir)
      .select(col("event_id"), col("user_id"), col("ts_us"), col("value"))
    val dir = java.nio.file.Files.createTempDirectory("graft_zn").toFile.getAbsolutePath
    ev.repartitionByRange(16, col("ts_us"))
      .sortWithinPartitions("ts_us")
      .write.mode("overwrite").parquet(s"$dir/bytime")
    // j-order: later columns own the higher bit per interleave level —
    // most-selective predicate column (user_id) last
    Layout.writeZOrderedN(ev, s"$dir/zorder", Seq("value", "ts_us", "user_id"), files = 16, bits = 8)

    val (loU, hiU) = (1L, 3L)
    val hiT = 1705276800000000L
    val hiV = 20.0
    def filesIntersecting(path: String): Int = {
      val files = new java.io.File(path).listFiles().filter(_.getName.endsWith(".parquet"))
      files.count { f =>
        val mm = spark.read.parquet(f.getAbsolutePath)
          .agg(min("user_id"), max("user_id"), min("ts_us"), min("value")).collect()(0)
        mm.getLong(0) <= hiU && loU <= mm.getLong(1) &&
        mm.getLong(2) < hiT && mm.getDouble(3) < hiV
      }
    }
    val t = filesIntersecting(s"$dir/bytime")
    val z = filesIntersecting(s"$dir/zorder")
    assert(z * 2 <= t, s"z-order files=$z not < 50% of time layout files=$t")

    // layout must not change answers: both reads return identical rows
    def rows(path: String) = spark.read.parquet(path)
      .where(col("user_id").between(loU, hiU) && col("ts_us") < hiT && col("value") < hiV)
      .orderBy("event_id").collect().toSeq
    assert(rows(s"$dir/zorder") == rows(s"$dir/bytime"))
    assert(rows(s"$dir/zorder").nonEmpty, "empty box; test is vacuous")
  }

  test("time-partitioned write prunes partitions on ts filters") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tp").toFile.getAbsolutePath
    Layout.writeTimePartitioned(Graft.bars(spark, TestSpark.sfDir), s"$dir/bars")
    val rd = spark.read.parquet(s"$dir/bars").where(col("ts_month") === "2024-01")
    assert(rd.count() == 30)
    val scans = rd.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.head.metadata("PartitionFilters").contains("ts_month"))
  }
}
