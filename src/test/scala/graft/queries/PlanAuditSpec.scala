package graft.queries

import scala.util.{Failure, Success, Try}

import graft.SparkEntry
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
import org.scalatest.funsuite.AnyFunSuite

/** Blanket physical-plan audit over EVERY registered query — the
  * breadth guard behind PlanShapeSpec's targeted assertions. At 100 TB
  * the three shapes that kill a job are a cartesian product, an
  * unpartitioned (single-reducer) window over an unbounded frame, and
  * an accidental nested-loop join; none may appear anywhere in the
  * registry without an explicit, justified whitelist entry. */
class PlanAuditSpec extends AnyFunSuite with graft.SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  /** Queries where a BroadcastNestedLoopJoin is the DESIGNED shape:
    * the broadcast side is a tiny bounded frame (10 probes / 16 IVF
    * centroids) and the non-equi condition (!=) admits no hash join —
    * a linear scan of the corpus against a constant-size build side. */
  private val bnljOk = Set(
    "s01_topk_cosine", "s08_topk_agg", "s09_ann_recall", // 10-probe scoredPairs
    "s05_ivf_topk", "s13_ivfpq", // 16-centroid assignment + probe cells
    "s12_pq_adc", // 10-probe ADC table crossJoin onto the code frame
    "s14_ivfpq_recall", // composes s13 + the 10-probe exact baseline
    "s15_nprobe_sweep", // same 10-probe exact baseline via bruteTopk
    "s17_mmr_rerank", // re-ranks s01's 10-probe bounded shortlist
    "s21_hard_negatives", // s01's scan with the label!=label non-equi predicate
    "s26_contrastive_triplets", // one 10-anchor broadcast scan feeding both heaps
    "s20_range_search", // 10-probe broadcast exact-evidence scan (index side is equi)
    "s23_matryoshka_recall", // one 10-probe broadcast scan feeding both rankings
    "s27_sq8_recall", // one 10-probe broadcast scan feeding both rankings
    "m14_color_hist", // 4-row fixture histogram frame, id< pair self-join
    "d11_lsh_recall", // 50-probe broadcast exact-baseline scan
    "c10_semantic_decontaminate", // broadcast EVAL-SET scan: bounded by the
      // eval-benchmark contract (production eval sets are fixed-size);
      // the gate fixture derives it by modulus, which is the knob, not
      // the machinery — documented at the query
    "s29_hybrid_rrf", // 1-row probe-vector broadcast onto the corpus scan
      // (the scalar-attach shape, but built from a Filter not an agg,
      // so the automatic scalar excusal cannot see it)
    "s30_rank_tau") // a_id < b_id concordance self-join of two POST-LIMIT
      // top-50 shortlists: both sides ≤50 rows at any corpus size

  /** Queries where an unpartitioned window runs over a PROVABLY tiny
    * frame (never the corpus). */
  private val globalWindowOk = Set(
    "s05_ivf_topk", // 16-row centroid selection via row_number over h
    "t17_vocab_coverage", // cumulative share over the top-50 AFTER the limit
    "t19_score_percentiles", // CDF cumsum over the value-distinct frame (≤10001 rows by domain)
    "t16_lm_buckets", // tercile cumsum over the avg_bp value histogram (≤10001 rows: avg_bp ∈ [0,10000] by construction — see the query's header)
    "p17_epoch_resume", // position stamp over the ≤100-row post-limit resume slice
    "d21_hist_quantiles", // cumulative counts over the ≤128-bucket histogram
    "t27_heaps_curve", // cumulative curve over the 10-row decile frame
    "p22_mixture_weights", // largest-remainder rank over the ≤|langs| weight frame
    "t29_zipf_rankfreq", // rank window over the top-100 AFTER TakeOrderedAndProject
    "p24_dsir_resample", // rank window over the top-100 AFTER TakeOrderedAndProject
    "stream28_dsir_maintain", // p24's finish over the maintained artifact — same post-limit rank window
    "s29_hybrid_rrf") // arm-rank + fused-rank windows, all over post-top-50
      // shortlists (≤100 rows) — the corpus prune is the TakeOrdered
      // below them, plan-guarded in PlanShapeSpec

  /** Walk ACROSS adaptive-execution boundaries: under AQE (on by
    * default) the root is AdaptiveSparkPlanExec — a leaf node whose
    * real plan hangs off `executedPlan` — so a naive
    * `plan.collect` inspects nothing and the audit silently passes
    * everything. Same for materialized query stages and reused
    * exchanges/subqueries. */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      p +: flatten(a.executedPlan)
    case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      p +: flatten(s.plan)
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
      p +: flatten(r.child)
    case other => other +: other.children.flatMap(flatten)
  }

  /** A BNLJ whose build side contains a global (empty-grouping)
    * aggregate is the scalar-attach pattern — crossJoin(broadcast(
    * one-row totals / extents / cutpoints)) — bounded by construction
    * at ANY corpus size, so it is excused automatically rather than
    * whitelisted per query. (A corpus-sized frame that merely
    * CONTAINS a scalar deeper in its pipeline would be excused
    * wrongly; none of the registered plans broadcasts such a frame,
    * and the explicit whitelist stays the mechanism for everything
    * else.) */
  private def scalarBuilt(j: BroadcastNestedLoopJoinExec): Boolean = {
    val build = j.buildSide match {
      case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
      case _ => j.right
    }
    flatten(build).exists {
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec =>
        a.groupingExpressions.isEmpty
      case _ => false
    }
  }

  private def offenders(p: SparkPlan): Seq[String] = {
    val nodes = flatten(p)
    // Non-vacuity meta-guard: the audit below is only meaningful if
    // the walk actually descended past the adaptive wrappers into real
    // operators. This spec was silently inspecting NOTHING from
    // whenever AQE became default until round 9 (the root is an
    // AdaptiveSparkPlanExec leaf, so `plan.collect` saw one node) —
    // make that failure mode structurally impossible: zero real
    // operators for any audited query is itself a failure, not a pass.
    val real = nodes.filterNot {
      case _: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => true
      case _: org.apache.spark.sql.execution.adaptive.QueryStageExec => true
      case _: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => true
      case _ => false
    }
    if (real.isEmpty) Seq("AUDIT-VACUOUS: plan walk yielded zero real operators")
    else nodes.collect {
      case _: CartesianProductExec => "CartesianProduct"
      case j: BroadcastNestedLoopJoinExec if !scalarBuilt(j) => "BroadcastNestedLoopJoin"
      case w: WindowExec if w.partitionSpec.isEmpty => "GlobalWindow"
      case w: WindowGroupLimitExec if w.partitionSpec.isEmpty => "GlobalWindowGroupLimit"
    }
  }

  // Note on eager builders: a few queries run a BOUNDED driver job at
  // plan-BUILD time (c04's eval-gram count + bloom sketch via
  // .count()/.head(), the IVF trainers' centroid collects, the serve
  // path's probe-row collect) because a codegen'd Literal probe
  // cannot be expressed lazily. The audit still walks their FINAL
  // plan; the eager pre-job is bounded by construction (sketch/
  // codebook-sized, never corpus-sized) and documented at each site.
  test("no registered query plans a cartesian product, stray nested loop, or global window") {
    val bad = SparkEntry.registry.toSeq.sortBy(_._1).flatMap { case (name, q) =>
      val found = Try {
        // full Verify isolation: the scope releases persists AND
        // checkpoint blocks eagerly-built fns create (clearCache
        // alone leaves checkpoint RDDs stranded for later suites)
        graft.CacheScope.scoped {
          val df = q.fn(spark, sf)
          val o = offenders(df.queryExecution.executedPlan)
          spark.catalog.clearCache()
          o
        }
      } match {
        case Success(o) => o
        case Failure(e) => Seq(s"PLAN-FAILED: ${e.getMessage.take(120)}")
      }
      val unexcused = found.filterNot {
        case "BroadcastNestedLoopJoin" => bnljOk(name)
        case "GlobalWindow" | "GlobalWindowGroupLimit" => globalWindowOk(name)
        case _ => false
      }
      if (unexcused.isEmpty) Nil else Seq(s"$name: ${unexcused.mkString(", ")}")
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }
}
