package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** As-of join (SURVEY §2.E "joins"): align each left row to the most
  * recent right row with right.ts ≤ left.ts, per key — the canonical
  * trades⋈quotes / events⋈bars alignment the reference does implicitly
  * with pandas' index alignment (and pandas.merge_asof does explicitly).
  *
  * Spark-first shape: UNION the two sides tagged by origin, ONE window
  * pass per key ordered by (ts, origin) carrying the right payload with
  * `last(_, ignoreNulls)`, then filter back to left rows. Cost = one
  * shuffle on the key + one sort — no range-join explosion, no skew
  * amplification: at 100 TB this is the same exchange every indicator
  * already needs, and Catalyst reuses it when composed.
  *
  * Right-side ties (same key, same ts): the LATEST right row in input
  * order wins (deterministic because the right side is sorted by a
  * final tiebreak on its row order within ts via monotonically increasing
  * id is avoided — instead callers must ensure unique (key, ts) on the
  * right, which holds for bar/quote tables by construction).
  */
object AsofJoin {

  /** Left rows enriched with the as-of right columns (null when nothing
    * matches). `rightCols` are renamed with `prefix`.
    *
    * @param direction "backward" (latest right with rts ≤ lts — default),
    *                  "forward" (earliest right with rts ≥ lts), or
    *                  "nearest" (closer of the two; ties → backward) —
    *                  pandas merge_asof's direction parameter.
    * @param tolerance max |lts − rts| for a match, in ts units; negative =
    *                  unbounded. tolerance and "nearest" require a numeric
    *                  ts column.
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      rightCols: Seq[String],
      prefix: String = "r_",
      direction: String = "backward",
      tolerance: Long = -1L
  ): DataFrame = {
    require(rightCols.nonEmpty, "asof: rightCols must be non-empty")
    require(
      Seq("backward", "forward", "nearest").contains(direction),
      s"asof: unknown direction '$direction'"
    )
    require(
      rightCols.forall(c => !left.columns.contains(s"$prefix$c")),
      s"asof: output name collision — left already has ${rightCols.map(prefix + _).filter(left.columns.contains).mkString(", ")}"
    )
    // collision-free internal names (a user column literally named "__side"
    // must survive the union/carry untouched)
    val taken = (left.columns ++ right.columns).toSet
    def fresh(base: String): String =
      Iterator.iterate(base)(_ + "_").dropWhile(taken.contains).next()
    val sideC = fresh("__side"); val pC = fresh("__p")
    val bC = fresh("__pb"); val fC = fresh("__pf"); val mC = fresh("__pm")
    val mtsC = fresh("__mts")
    val leftTagged = left.withColumn(sideC, lit(1))
    val rightTagged = right
      .select(col(keyCol) +: col(tsCol) +: rightCols.map(col): _*)
      .withColumn(sideC, lit(0))
    // align schemas: left keeps all its columns; right contributes its
    // payload as ONE struct so `last(ignoreNulls)` carries the whole latest
    // right ROW atomically — per-column carry would back-fill a NULL cell
    // from an older right row, mixing columns across rows (merge_asof
    // semantics are row-level, including genuine NULLs in the latest row).
    // The struct also carries the matched right ts (for tolerance/nearest).
    val payloadType = StructType(
      rightCols.map(c => StructField(c, right.schema(c).dataType)) :+
        StructField(mtsC, right.schema(tsCol).dataType)
    )
    val leftCols = left.columns
    val l2 = leftTagged.select(
      (leftCols.map(col) :+ col(sideC)) :+ lit(null).cast(payloadType).as(pC): _*
    )
    val r2 = rightTagged.select(
      (leftCols.map {
        case c0 if c0 == keyCol => col(keyCol)
        case c0 if c0 == tsCol => col(tsCol)
        case c0 => lit(null).cast(left.schema(c0).dataType).as(c0)
      }.toSeq :+ col(sideC)) :+ struct(rightCols.map(col) :+ col(tsCol).as(mtsC): _*).as(pC): _*
    )
    val unioned = l2.unionByName(r2.select(l2.columns.map(col): _*))
    // backward: right rows sort BEFORE left rows at equal ts (side 0 < 1) —
    // a bar stamped at ts is visible to an event at the same ts. forward:
    // ts desc with the same side order, so rts ≥ lts (inclusive) matches.
    val wB = Window
      .partitionBy(keyCol)
      .orderBy(col(tsCol).asc, col(sideC).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window
      .partitionBy(keyCol)
      .orderBy(col(tsCol).desc, col(sideC).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def gate(p: Column, dist: Column): Column =
      if (tolerance < 0) p else when(p.isNotNull && dist <= tolerance, p)
    val lts = col(tsCol)
    val withMatch = direction match {
      case "backward" =>
        unioned
          .withColumn(bC, last(col(pC), ignoreNulls = true).over(wB))
          .withColumn(mC, gate(col(bC), lts - col(bC).getField(mtsC)))
      case "forward" =>
        unioned
          .withColumn(fC, last(col(pC), ignoreNulls = true).over(wF))
          .withColumn(mC, gate(col(fC), col(fC).getField(mtsC) - lts))
      case "nearest" =>
        val db = lts - col(bC).getField(mtsC)
        val df0 = col(fC).getField(mtsC) - lts
        val back = gate(col(bC), db)
        val fwd = gate(col(fC), df0)
        unioned
          .withColumn(bC, last(col(pC), ignoreNulls = true).over(wB))
          .withColumn(fC, last(col(pC), ignoreNulls = true).over(wF))
          // closer side wins; equal distance → backward (pandas tiebreak)
          .withColumn(
            mC,
            when(back.isNull, fwd)
              .when(fwd.isNull, back)
              .when(db <= df0, back)
              .otherwise(fwd)
          )
    }
    withMatch
      .where(col(sideC) === 1)
      .select(
        leftCols.map(col) ++
          rightCols.map(c => col(mC).getField(c).as(s"$prefix$c")): _*
      )
  }
}
