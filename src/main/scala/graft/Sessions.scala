package graft

import org.apache.spark.sql.SparkSession

/** Shared join-planning discipline for every graft session.
  *
  * The sf100 scale step caught the static planner broadcasting
  * corpus-derived frames: Catalyst's pre-execution size ESTIMATE is
  * the compressed file size scaled through the plan, and a
  * duplication-heavy corpus compresses ~1000× — so a 20M-row banded
  * signature frame "fits" the 10 MB broadcast threshold on paper and
  * ships gigabytes at execution (d03/c01/c03 died on
  * spark.driver.maxResultSize at sf100; at cluster scale the same
  * mistake is a driver OOM).
  *
  * The rule this encodes: a broadcast must be either PROVEN (an
  * explicit `broadcast()` hint on a frame bounded by construction —
  * dimension tables, 1024-row sketches, 1-row scalar aggregates) or
  * MEASURED (AQE converting a shuffled join after reading the actual
  * stage size). Never guessed from estimates:
  *
  *   - `spark.sql.autoBroadcastJoinThreshold = -1` disables
  *     estimate-based static broadcasts (explicit hints are
  *     unaffected — they bypass the threshold by design);
  *   - `spark.sql.adaptive.autoBroadcastJoinThreshold = 10MB` keeps
  *     the runtime conversion at Spark's default static budget (it
  *     would otherwise inherit the -1 and never convert).
  *
  * Cost model: a join that static planning would have broadcast now
  * writes one shuffle of each side before AQE converts the small one
  * — bounded, local-read at runtime, and the price of never trusting
  * an estimate that compression can forge.
  */
object Sessions {
  def scaleDefensive(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "10MB")
      // Let AQE re-plan queries OVER cached relations (off by default):
      // without it, every consumer of a persisted frame inherits the
      // cache's static shuffle width — spark.sql.shuffle.partitions
      // tasks per scan regardless of the frame's measured size. The
      // persisted-intermediate tier (tf frames, LSH pair frames,
      // signature caches) is exactly where that hurts: at gate scale a
      // 31-row vocabulary fans out as 32 tasks of pure scheduling
      // overhead; at 100 TB AQE keeps the width the measured bytes
      // justify. Same measured-not-guessed rule as the broadcast
      // settings above. (Explicit-width repartitions — the pid-keyed
      // prefix-sum kernels — are REPARTITION_BY_NUM and never
      // coalesced, so their partition-id contract is unaffected.)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
}
