package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Storage layout & ingestion surface (SURVEY §2.E scans/sources, §4.2
  * partition pruning).
  *
  * At 100 TB the winning layout for the canonical series table is
  * BUCKETED by series_id and sorted by (series_id, ts): every window
  * indicator's required distribution is then satisfied by the scan itself
  * — zero Exchange, zero Sort at query time (asserted in LayoutSpec).
  * Time-partitioning (`ts_month=`) on top gives partition pruning for
  * time-ranged queries.
  */
object Layout {

  /** Canonical columns every source must land on. */
  val canonical = Seq("series_id", "ts", "open", "high", "low", "close", "volume")

  /** Write a series table bucketed by key, sorted within buckets — the
    * shuffle-free layout for window pipelines. `buckets` scales with
    * cluster width (one task per bucket per window stage). */
  def writeBucketed(df: DataFrame, table: String, buckets: Int = 32): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, "series_id")
      .sortBy("series_id", "ts")
      .format("parquet")
      .saveAsTable(table)

  /** Write any table bucketed (and sorted) by an arbitrary join key —
    * the co-located-join layout: two tables bucketed on the same key with
    * the same bucket count sort-merge-join with ZERO exchanges (scan
    * output distribution already satisfies the join requirement), the
    * standard way a 100 TB star join avoids re-shuffling its fact table
    * per query. LayoutSpec asserts the exchange-free plan. */
  def writeBucketedBy(df: DataFrame, table: String, key: String, buckets: Int = 32): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Write time-partitioned parquet (partition pruning for ts ranges);
    * directory layout <path>/ts_month=YYYY-MM/... */
  def writeTimePartitioned(df: DataFrame, path: String): Unit =
    df.withColumn("ts_month", date_format(col("ts").cast("timestamp"), "yyyy-MM"))
      .write
      .mode(SaveMode.Overwrite)
      .partitionBy("ts_month")
      .parquet(path)

  /** Morton code interleaving the low `bits` bits of two non-negative
    * long columns — bit i of `a` lands at position 2i, bit i of `b` at
    * 2i+1. The shift/mask pairs are plan-time constants, so the whole
    * code unrolls into one codegen'd expression. Callers rank/bucket
    * their domains into [0, 2^bits) first. */
  def zValue(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column, bits: Int = 16): org.apache.spark.sql.Column =
    (0 until bits)
      .map { i =>
        (shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i) +
          shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1)).cast("long")
      }
      .reduce(_ + _)

  /** Write parquet clustered on the Z-curve of two columns: range-
    * partition by z-value into `files` files, sort within each. Parquet
    * footer min/max on BOTH columns then stay tight per file, so a
    * predicate on EITHER column prunes most files at the scan — the
    * multi-dimensional data-skipping layout a single-column sort cannot
    * give (sorting by time leaves every file covering every user; the
    * Z-curve keeps both ranges narrow). LayoutSpec measures the skip. */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      a: String,
      b: String,
      files: Int = 16,
      bits: Int = 16
  ): Unit =
    df.withColumn("__z", zValue(col(a), col(b), bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write
      .mode(SaveMode.Overwrite)
      .parquet(path)

  /** n-column Morton code: bit i of column j lands at position n·i + j
    * (the 2-column [[zValue]] layout generalized). Inputs must already be
    * non-negative codes in [0, 2^bits); n·bits must fit a long. */
  def zValueN(codes: Seq[org.apache.spark.sql.Column], bits: Int): org.apache.spark.sql.Column = {
    val n = codes.size
    require(n >= 2 && n * bits <= 62, s"zValueN: need 2+ columns and n*bits <= 62, got $n*$bits")
    codes.zipWithIndex
      .flatMap { case (c, j) =>
        (0 until bits).map(i => shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), n * i + j).cast("long"))
      }
      .reduce(_ + _)
  }

  /** Write parquet clustered on the Z-curve of ANY number of numeric
    * columns (round-5 generalization of [[writeZOrdered]]). Each column
    * is bucketed into [0, 2^bits) by ORDER-PRESERVING min/max linear
    * scaling (one aggregate pass — no global sort, no driver data), so
    * range predicates on any clustered column still map to narrow
    * z-ranges; the interleaved code then range-partitions into `files`
    * files. Per-file parquet footer min/max stays tight on EVERY
    * clustered column — a conjunctive filter prunes to the files whose
    * hyper-rectangle intersects the query box. Constant columns code
    * to 0. */
  def writeZOrderedN(
      df: DataFrame,
      path: String,
      cols: Seq[String],
      files: Int = 16,
      bits: Int = 8
  ): Unit = {
    val maxCode = (1L << bits) - 1
    val aggs = cols.flatMap(c => Seq(min(col(c).cast("double")), max(col(c).cast("double"))))
    val stats = df.agg(aggs.head, aggs.tail: _*).head()
    // empty input: min/max are NULL — nothing to cluster, write as-is
    // instead of NPEing on getDouble
    if (stats.isNullAt(0)) {
      df.write.mode(SaveMode.Overwrite).parquet(path)
      return
    }
    val codes = cols.zipWithIndex.map { case (c, i) =>
      val mn = stats.getDouble(2 * i); val mx = stats.getDouble(2 * i + 1)
      if (mx == mn) lit(0L)
      else
        least(
          lit(maxCode),
          floor((col(c).cast("double") - lit(mn)) * lit((maxCode + 1).toDouble / (mx - mn))).cast("long")
        )
    }
    df.withColumn("__z", zValueN(codes, bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write
      .mode(SaveMode.Overwrite)
      .parquet(path)
  }

  /** CSV ingestion onto the canonical schema (header, case-insensitive
    * OHLCV resolution like the reference's _get_column). */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    toCanonical(
      spark.read
        .option("header", "true")
        .option("inferSchema", "true")
        .csv(path)
    )

  /** JSON-lines ingestion onto the canonical schema. */
  def readJson(spark: SparkSession, path: String): DataFrame =
    toCanonical(spark.read.json(path))

  /** Case-insensitive column resolution + double coercion (reference
    * core.py::_get_column semantics). Missing volume → 0. */
  def toCanonical(df: DataFrame): DataFrame = {
    val byLower = df.columns.map(c => c.toLowerCase -> c).toMap
    def pick(name: String, dflt: Option[Any] = None) =
      byLower.get(name) match {
        case Some(actual) =>
          if (name == "series_id") col(actual).cast("string").as(name)
          else if (name == "ts") col(actual).as(name)
          else col(actual).cast("double").as(name)
        case None =>
          dflt match {
            case Some(v) => lit(v).cast("double").as(name)
            case None => throw new IllegalArgumentException(s"missing required column '$name'")
          }
      }
    df.select(
      pick("series_id"),
      pick("ts"),
      pick("open"),
      pick("high"),
      pick("low"),
      pick("close"),
      pick("volume", Some(0.0))
    )
  }
}
