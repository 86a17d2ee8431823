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

  /** Write time-partitioned parquet (partition pruning for ts ranges);
    * directory layout <path>/ts_month=YYYY-MM/... */
  def writeTimePartitioned(df: DataFrame, path: String): Unit =
    df.withColumn("ts_month", date_format(col("ts").cast("timestamp"), "yyyy-MM"))
      .write
      .mode(SaveMode.Overwrite)
      .partitionBy("ts_month")
      .parquet(path)

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
