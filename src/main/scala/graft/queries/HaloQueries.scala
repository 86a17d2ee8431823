package graft.queries

import org.apache.spark.sql.{SparkSession}
import org.apache.spark.sql.functions._
import graft.Graft
import graft.plans.Halo
import graft.ta.{prim => P}
import graft.ta.Ta._
import sqlgen._

/** Driver-gate entries for the §4.3 single-series parallelism machinery:
  * the halo-chunked window pass and the segmented-scan ewm produce
  * EXACTLY the global-window results, so they share the ordinary
  * oracles — the gate proves the chunked execution, not new semantics.
  * chunks=8 over the 10k-row fixture keeps every chunk ≫ window length
  * (the documented precondition). */
object HaloQueries {

  /** sma(10) computed via Halo.chunked — same oracle as sma_10. */
  val qHaloSma = Q(
    "halo_sma_10",
    (s: SparkSession, dir: String) => {
      Graft.init(s)
      Halo
        .chunked(Graft.userSeries(s, dir), 10, 8)(_.ta.sma(10))
        .select(col("series_id"), col("ts"), P.normd(col("sma_10")).as("sma_10"))
        .orderBy("series_id", "ts")
    },
    SeriesQueries.qSma.sql
  )

  /** Unseeded ewm(α=0.2) via the two-pass segmented scan. */
  val qHaloEwm = {
    val alpha = 0.2
    Q(
      "halo_ewm",
      (s: SparkSession, dir: String) => {
        Graft.init(s)
        Halo
          .chunkedEwm(Graft.userSeries(s, dir), "close", "ewm_c", alpha, 8)
          .select(col("series_id"), col("ts"), P.normd(col("ewm_c")).as("ewm_c"))
          .orderBy("series_id", "ts")
      },
      Some(
        s"WITH s AS ($seriesCte) SELECT series_id, ts, round(${ewm("close", alpha)}, 6) AS ewm_c " +
          s"FROM s$orderTail"
      )
    )
  }

  val all: Seq[Q] = Seq(qHaloSma, qHaloEwm)
}
