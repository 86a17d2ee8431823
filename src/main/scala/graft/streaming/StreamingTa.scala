package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY §2.E / §7 phase 6).
  *
  * The reference is batch-only; this extension makes every non-lookahead
  * indicator streamable:
  *  - bar construction = tumbling event-time window + watermark;
  *  - EW/REC indicators = `flatMapGroupsWithState` keyed by series_id,
  *    carrying exactly the O(1) recurrence state the batch kernels use, so
  *    streaming output ≡ batch output row-for-row (StreamingParitySpec);
  *  - exact dedup = `dropDuplicates` on the content hash with watermark.
  *
  * Lookahead ops (ichimoku forward spans, centered dpo, negative offset)
  * are excluded — they need future rows by definition.
  *
  * Scale notes: state is bytes per key (not per row); watermark bounds the
  * bar-window state; shuffle is one hash exchange per stateful stage — the
  * same key layout as batch, so a 1000-executor cluster partitions
  * identically.
  */
object StreamingTa {

  /** Event row after ingestion (ts = epoch micros). */
  case class Tick(series_id: String, ts: Long, close: Double)

  /** Streaming OHLCV bars from an event stream with event-time tstamp.
    * Append-mode compatible: bars emit once the watermark passes the day.
    * open/close = value at min/max event ts (unique-ts contract Q01). */
  def barsStream(events: DataFrame, watermark: String = "1 day"): DataFrame =
    events
      .withWatermark("tstamp", watermark)
      .groupBy(window(col("tstamp"), "1 day").as("w"))
      .agg(
        min_by(col("value"), col("ts_us")).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), col("ts_us")).as("close"),
        count(lit(1)).cast("double").as("volume")
      )
      .select(
        lit("ALL").as("series_id"),
        col("w.start").cast("date").as("ts"),
        col("open"), col("high"), col("low"), col("close"), col("volume")
      )

  /** Per-key recurrence state for the streaming indicator kernel: exactly
    * the batch semantics of stage.ema (sma-seeded ema), prim.rmaOf
    * (Wilder), and rsi (rma of up/down moves). */
  case class IndState(
      n: Long, // rows seen
      seedSum: Double, // running sum of first `len` closes (ema seed)
      ema: Double, hasEma: Boolean,
      rma: Double, rmaCount: Long,
      prevClose: Double, hasPrev: Boolean,
      upRma: Double, dnRma: Double, moveCount: Long
  )

  case class IndOut(
      series_id: String, ts: Long, close: Double,
      ema_10: Option[Double], rma_10: Option[Double], rsi_10: Option[Double]
  )

  /** Streaming ema/rma/rsi(len) over ticks. REQUIRES per-key event-time
    * order across micro-batches (in-order source or replayed log; within a
    * batch rows are sorted here). This is the streaming twin of the batch
    * window pipeline — parity is asserted in StreamingParitySpec. */
  def indicators(ticks: Dataset[Tick], len: Int = 10): Dataset[IndOut] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    val alpha = 2.0 / (len + 1)
    val wAlpha = 1.0 / len

    def step(key: String, rows: Iterator[Tick], gs: GroupState[IndState]): Iterator[IndOut] = {
      var st = gs.getOption.getOrElse(IndState(0L, 0.0, 0.0, false, 0.0, 0L, 0.0, false, 0.0, 0.0, 0L))
      val out = rows.toSeq.sortBy(_.ts).map { t =>
        val n1 = st.n + 1
        // --- sma-seeded ema (stage.ema): rows 1..len-1 null; row len seeds
        val seedSum = if (st.n < len) st.seedSum + t.close else st.seedSum
        var ema = st.ema; var hasEma = st.hasEma
        if (n1 == len) { ema = seedSum / len; hasEma = true }
        else if (n1 > len) { ema = (1.0 - alpha) * ema + alpha * t.close }
        // --- Wilder rma (prim.rmaOf): seed first value, mask till len obs
        val rma = if (st.rmaCount == 0L) t.close else (1.0 - wAlpha) * st.rma + wAlpha * t.close
        val rmaCount = st.rmaCount + 1
        // --- rsi: rma of up/down moves, first diff at row 2
        var upR = st.upRma; var dnR = st.dnRma; var mc = st.moveCount
        if (st.hasPrev) {
          val d = t.close - st.prevClose
          val up = math.max(d, 0.0); val dn = math.max(-d, 0.0)
          if (mc == 0L) { upR = up; dnR = dn } else {
            upR = (1.0 - wAlpha) * upR + wAlpha * up
            dnR = (1.0 - wAlpha) * dnR + wAlpha * dn
          }
          mc += 1
        }
        st = IndState(n1, seedSum, ema, hasEma, rma, rmaCount, t.close, true, upR, dnR, mc)
        IndOut(
          key, t.ts, t.close,
          if (hasEma) Some(ema) else None,
          if (rmaCount >= len) Some(rma) else None,
          if (mc >= len) {
            val s = upR + dnR
            if (s == 0.0) None else Some(100.0 * upR / s)
          } else None
        )
      }
      gs.update(st)
      out.iterator
    }

    ticks
      .groupByKey(_.series_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(step)
  }

  /** OHLCV tick for kernel streaming. */
  case class BarTick(
      series_id: String, ts: Long,
      open: Double, high: Double, low: Double, close: Double, volume: Double
  )

  case class KernelOut(series_id: String, ts: Long, values: Seq[Option[Double]])

  private val barSchema = org.apache.spark.sql.types.StructType(
    Seq(
      org.apache.spark.sql.types.StructField("series_id", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("open", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("high", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("low", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("close", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("volume", org.apache.spark.sql.types.DoubleType)
    )
  )

  /** Stream ANY batch REC kernel (graft.ta.rec.Kernel — psar, supertrend,
    * ha, mcgd, …) over an OHLCV tick stream: the kernel object itself IS
    * the per-key state (java-serialized between micro-batches), so
    * streaming output ≡ the batch mapPartitions pass row-for-row.
    * Same per-key in-order requirement as `indicators`. */
  def kernelStream(
      ticks: Dataset[BarTick],
      make: () => graft.ta.rec.Kernel
  ): Dataset[KernelOut] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    implicit val kernelEnc: org.apache.spark.sql.Encoder[graft.ta.rec.Kernel] =
      org.apache.spark.sql.Encoders.javaSerialization[graft.ta.rec.Kernel]

    def step(
        key: String,
        rows: Iterator[BarTick],
        gs: GroupState[graft.ta.rec.Kernel]
    ): Iterator[KernelOut] = {
      val kernel = gs.getOption.getOrElse {
        val k = make()
        k.init(barSchema)
        k.reset()
        k
      }
      val out = rows.toSeq.sortBy(_.ts).map { t =>
        val row = new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
          Array[Any](t.series_id, t.ts, t.open, t.high, t.low, t.close, t.volume),
          barSchema
        )
        val vals = kernel.update(row).map {
          case null => None
          case d: Double => Some(d)
          case i: Int => Some(i.toDouble)
          case l: Long => Some(l.toDouble)
          case other => Some(other.toString.toDouble)
        }
        KernelOut(key, t.ts, vals.toSeq)
      }
      gs.update(kernel)
      out.iterator
    }

    ticks
      .groupByKey(_.series_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(step)
  }

  /** Stream SEVERAL REC kernels over one tick stream in a single
    * stateful pass — the streaming counterpart of rec.perSeriesBatch:
    * one groupByKey/state entry per series carries ALL kernels, and each
    * tick emits the concatenated outputs. Output ≡ running the batch
    * perSeriesBatch over the same rows, row-for-row. */
  def kernelBatchStream(
      ticks: Dataset[BarTick],
      makes: Seq[() => graft.ta.rec.Kernel]
  ): Dataset[KernelOut] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    implicit val stateEnc: org.apache.spark.sql.Encoder[Array[graft.ta.rec.Kernel]] =
      org.apache.spark.sql.Encoders.javaSerialization[Array[graft.ta.rec.Kernel]]

    def step(
        key: String,
        rows: Iterator[BarTick],
        gs: GroupState[Array[graft.ta.rec.Kernel]]
    ): Iterator[KernelOut] = {
      val kernels = gs.getOption.getOrElse {
        makes.map { mk =>
          val k = mk(); k.init(barSchema); k.reset(); k
        }.toArray
      }
      val out = rows.toSeq.sortBy(_.ts).map { t =>
        val row = new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
          Array[Any](t.series_id, t.ts, t.open, t.high, t.low, t.close, t.volume),
          barSchema
        )
        val vals = kernels.flatMap(_.update(row)).map {
          case null => None
          case d: Double => Some(d)
          case i: Int => Some(i.toDouble)
          case l: Long => Some(l.toDouble)
          case other => Some(other.toString.toDouble)
        }
        KernelOut(key, t.ts, vals.toSeq)
      }
      gs.update(kernels)
      out.iterator
    }

    ticks
      .groupByKey(_.series_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(step)
  }

  /** Streaming exact dedup: keep the first occurrence of each text hash.
    * Watermark bounds the state for late data at scale. */
  def dedupStream(docs: DataFrame, eventTimeCol: String, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("text_hash", sha2(col("text"), 256))
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicates("text_hash")
}
