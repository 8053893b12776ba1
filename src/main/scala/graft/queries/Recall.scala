package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared probe-bounded recall harness — the one code path behind the
  * index-quality audits (s09 LSH-ANN recall, s14 IVF-PQ recall, d11
  * MinHash-LSH recall), so the band/nprobe/codebook tuning dials all
  * read off identical semantics.
  *
  * Scale: both inputs are probe-bounded frames (per-probe top-k or a
  * probe sample's truth pairs), so the join + aggregate is bounded by
  * |probes| × k regardless of corpus size — the audit a production
  * pipeline runs on a sample before trusting its index parameters.
  */
object Recall {

  /** Per-probe integer recall of `retrieved` against the `exact`
    * truth pairs: LEFT join (zero-hit probes kept; probes with no
    * truth rows have no recall to measure and are absent by
    * construction), all-integer basis points so gates hash-compare
    * exactly.
    *
    * `fixedK = Some(k)` → recall@k, output (probe, hits, recall_bp);
    * `fixedK = None` → per-probe truth count as the denominator,
    * output (probe, n_true, hits, recall_bp). */
  def perProbe(
      exact: DataFrame,
      retrieved: DataFrame,
      probeCol: String,
      candCol: String,
      fixedK: Option[Int]): DataFrame = {
    val hits = retrieved.select(col(probeCol), col(candCol)).withColumn("hit", lit(1))
    val grouped = exact.select(col(probeCol), col(candCol))
      .join(hits, Seq(probeCol, candCol), "left")
      .groupBy(probeCol)
    fixedK match {
      case Some(k) =>
        grouped.agg(sum(coalesce(col("hit"), lit(0))).as("hits"))
          .selectExpr(probeCol, "hits", s"(hits * 10000) div $k as recall_bp")
      case None =>
        grouped.agg(count(lit(1)).as("n_true"),
            sum(coalesce(col("hit"), lit(0))).as("hits"))
          .selectExpr(probeCol, "n_true", "hits",
            "(hits * 10000) div n_true as recall_bp")
    }
  }
}
