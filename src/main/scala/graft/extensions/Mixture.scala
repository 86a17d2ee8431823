package graft.extensions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-mixture balancing (SURVEY §2.F): given a target per-source token
  * distribution, compute the per-source keep fractions a sampler needs —
  * the "data mixing" stage that turns a raw crawl into a recipe-weighted
  * training corpus.
  *
  * Semantics: the LARGEST corpus achievable at the target mixture without
  * upsampling any source. The binding source is the one with the smallest
  * tokens_s / target_s ratio; `scale = min_s tokens_s / target_s` is the
  * total token budget, each source contributes `take_s = scale · target_s`,
  * and `keep_frac_s = take_s / tokens_s` (the binding source keeps 1.0).
  * A pipeline pairs `keep_frac` with the deterministic content-hash
  * sampler (`x_strat_sample`'s bucket rule) so the selection stays
  * reproducible and append-stable.
  *
  * Scale: one partial-agg pass over the corpus (map-side combine), a
  * 1-row global min, broadcast back over the per-source rows — no
  * corpus-sized shuffle beyond the source aggregate.
  */
object Mixture {

  /** Per-source mixture weights.
    *
    * @param docs       corpus with a `source` column
    * @param tokenCount per-row token count expression
    * @param targetFrac per-source target fraction expression (must be
    *                   positive; evaluated against the aggregated row, so
    *                   it may reference `source` only)
    */
  def mixtureWeights(docs: DataFrame, tokenCount: Column, targetFrac: Column): DataFrame = {
    val per = docs
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(tokenCount).cast("double").as("n_tokens"))
      // enforce the documented positivity contract in-plan: a zero/negative
      // target would otherwise flow through as a silent null/negative
      // keep_frac for EVERY source (the global min picks it up)
      .withColumn(
        "target_frac",
        when(
          targetFrac > 0.0,
          targetFrac
        ).otherwise(raise_error(concat(lit("mixtureWeights: target_frac must be > 0 for source "), col("source"))))
      )
    val scale = per.agg(min(col("n_tokens") / col("target_frac")).as("__scale"))
    per
      .crossJoin(broadcast(scale))
      .select(
        col("source"),
        col("n_docs"),
        col("n_tokens"),
        col("target_frac"),
        (col("__scale") * col("target_frac")).as("take_tokens"),
        (col("__scale") * col("target_frac") / col("n_tokens")).as("keep_frac")
      )
  }
}
