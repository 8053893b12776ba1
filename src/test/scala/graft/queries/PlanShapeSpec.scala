package graft.queries

import graft.SparkEntry
import org.scalatest.funsuite.AnyFunSuite

/** Guards the plan properties the 100 TB story depends on — if a
  * refactor reintroduces a cartesian product, drops a pushed filter,
  * or turns the top-k into a global sort, these fail before any
  * benchmark notices. */
class PlanShapeSpec extends AnyFunSuite with graft.SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def planOf(query: String): String = {
    val df = SparkEntry.queries(query)(spark, sf)
    val s = df.queryExecution.executedPlan.toString
    // Non-vacuity: a string-containment guard proves nothing if the
    // rendered plan is a bare wrapper. Every audited query reads data,
    // so its plan string must show at least one scan and one child
    // line — fail loudly if a Spark upgrade ever renders the adaptive
    // root without its tree (the PlanAuditSpec vacuity bug, string form).
    assert(s.contains("Scan") && s.linesIterator.size > 1,
      s"plan string for $query looks vacuous:\n$s")
    s
  }

  test("q01 pushes filters into the parquet scan and prunes columns") {
    val p = planOf("q01_filter_scan")
    // the PushedFilters list is truncated in toString; the leading
    // entries plus an absent unprojected column prove push + prune
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p)
    assert(!p.contains("l_tax"), p) // pruned from the scan
  }

  test("q02 star join broadcasts the dimensions, never cartesian") {
    val p = planOf("q02_star_join")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q13 top-k compiles to TakeOrderedAndProject, not a global sort") {
    val p = planOf("q13_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q06 aggregates partially below the exchange") {
    val p = planOf("q06_outer_join_agg")
    // partial HashAggregate must appear before (deeper than) the first Exchange
    val agg = p.indexOf("partial")
    assert(agg >= 0, p)
  }

  test("s11 k-means assignment is map-only: no join or window feeds the centroid aggregate") {
    val p = planOf("s11_kmeans_step")
    // centroids are a literal matrix — assignment must not join,
    // window, or exchange the corpus; the only join is the broadcast
    // of the 8-row counts frame onto the k×64 centroid rows
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("partial"), p) // (cluster, pos) partial agg below the exchange
  }

  test("c04 probes the bloom literal map-side; the corpus side is never broadcast") {
    val p = planOf("c04_decontaminate_bloom")
    assert(p.contains("might_contain"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("s05 IVF corpus assignment is MAP-ONLY against the trained literal centroids") {
    val p = planOf("s05_ivf_topk")
    // r9: the trained centroids ride along as a literal matrix and
    // each row takes argmax in-projection — the r8 max_by partial
    // aggregate (one exchanged row per vector) is gone entirely; the
    // only aggregates left are the final bounded-heap top-k pair
    assert(!p.contains("max_by"), p)
    assert(p.contains("array_position"), p)
    // ZERO windows: the 10-probe nprobe=2 cell selection is an
    // in-projection array sort since r14 (probeCells went map-only —
    // the rank window's exchange+sort over the probe frame is gone);
    // any window appearing would mean the assignment frame or the
    // candidate score frame is being exchanged+sorted again
    val windows = "Window\\s*\\[".r.findAllIn(p).size
    assert(windows == 0, s"expected 0 windows, got $windows\n$p")
    assert(p.toLowerCase.contains("partial_top_k_by_score"), p)
  }

  test("s01 exact top-k is a partial bounded-heap aggregate, no window over the score frame") {
    val p = planOf("s01_topk_cosine")
    // the r6-flagged scale defect: a row_number window here shuffles
    // and sorts ALL probe×corpus score rows on a 10-value key. The
    // heap aggregate ships k rows per probe map-side instead.
    assert(p.toLowerCase.contains("partial_top_k_by_score"), p)
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"), p)
    assert(!p.contains("Window"), p)
  }

  test("s09 recall harness: both exact baseline and ANN side are heap aggregates, no window") {
    val p = planOf("s09_ann_recall")
    assert(p.toLowerCase.contains("partial_top_k_by_score"), p)
    assert(!p.contains("Window"), p)
  }

  test("t07 prunes top-5 map-side and tokenizes once") {
    val p = planOf("t07_tfidf")
    // WindowGroupLimit keeps only rank<=5 candidates below the final
    // exchange; the persisted tf frame means one scan+explode pass
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("InMemoryTableScan"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("t10 per-source cap prunes beyond rank K map-side (WindowGroupLimit)") {
    val p = planOf("t10_domain_cap")
    // rank<=K must push a WindowGroupLimit below the exchange so the
    // shuffle carries at most K rows per source, not the whole corpus
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("d03 LSH candidate generation is an equi-join, never all-pairs") {
    val p = planOf("d03_lsh_pairs")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("d06 SimHash pairs band-join is an equi-join with the cap window, never all-pairs") {
    val p = planOf("d06_simhash_pairs")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the mega-bucket cap is computed once per (band, bits) via a
    // count window BEFORE the self-join
    assert(p.contains("Window"), p)
    // banding joins on the 16-bit window — the key expression mask is
    // 65535, not the old 255 (256-bucket keyspace = quadratic buckets)
    assert(p.contains("65535"), p)
    assert(!p.contains("& 255"), p)
  }

  test("p03 seq packing range-partitions at session parallelism, cumsums within partitions") {
    val p = planOf("p03_seq_pack")
    // the global prefix sum must NOT be a single-partition window
    assert(!p.contains("SinglePartition"), p)
    assert(p.contains("rangepartitioning"), p)
  }

  test("p05 shard shuffle range-partitions the rank, never a single-partition window") {
    val p = planOf("p05_shard_shuffle")
    assert(!p.contains("SinglePartition"), p)
    assert(p.contains("rangepartitioning"), p)
  }

  test("c02 decontamination broadcasts the eval grams AT RUNTIME; corpus text never shuffles") {
    // the eval-gram side is data-derived, so its broadcast is
    // AQE-elected from the measured size, never hinted (the sf100
    // fixture's corpus-proportional eval slice must NOT broadcast) —
    // assert the plan that actually RAN, not the static guess
    val df = graft.SparkEntry.queries("c02_decontaminate")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("isFinalPlan=true"), p.take(400))
    assert(p.contains("BroadcastHashJoin"), p)
    // text reaches only map-side projections: no exchange carries it
    val exchanges = p.split("Exchange").drop(1)
    assert(exchanges.nonEmpty && !exchanges.exists(_.split("\n").head.contains("text")), p)
  }

  test("s12 PQ: map-only encode, broadcast-NLJ code scan, heap top-k — no sort-merge, no window") {
    val p = planOf("s12_pq_adc")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    assert(!p.contains("Window["), p)
    assert(p.contains("BroadcastNestedLoopJoin"), p) // the 10-probe ADC scan, s01's shape
    assert(p.toLowerCase.contains("partial_top_k_by_score"), p)
  }

  test("s13 IVF-PQ: cell-bounded candidates, code-table scoring, heap top-k — no cartesian") {
    val p = planOf("s13_ivfpq")
    assert(!p.contains("CartesianProduct"), p)
    // the IVFADC+R refine must broadcast the bounded shortlist and
    // stream the vector side — a SortMergeJoin here means the corpus
    // (or the sidecar slice) is being shuffled for R×|probes| rows
    assert(!p.contains("SortMergeJoin"), p)
    // the only windows are the bounded probe-side frames (cent pick +
    // pcells), both keyed — never an unpartitioned corpus window
    assert(p.linesIterator.filter(_.contains("windowspecdefinition"))
      .forall(l => l.contains("probe_id") || l.contains("vec_id")), p)
    assert(p.toLowerCase.contains("partial_top_k_by_score"), p)
  }

  test("d10 dup-window count is a keyed equi-join over partial aggregates, no window, no cartesian") {
    val p = planOf("d10_window_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("Window["), p) // fractions fold in aggregates, never a sort
    assert(p.contains("partial"), p)  // both counts combine map-side
  }

  test("c06 chunk dedup anti-joins on the chunk key, never broadcasting the corpus side") {
    val p = planOf("c06_chunk_dedup")
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("partial"), p)  // distinct+count and reassembly aggs combine map-side
  }

  test("j01 as-of join is a single exchange + window, no join operator") {
    val p = planOf("j01_asof_join")
    assert(p.contains("Window"), p)
    assert(!p.contains("Join"), p)
  }

  test("j03 as-of plans through the custom sort-merge exec") {
    val p = planOf("j03_asof_plan")
    assert(p.contains("AsOfJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("t14/p06 are map-only: one codegen'd scan stage, no exchange at all") {
    for (q <- Seq("t14_gopher_filter", "p06_quality_resample")) {
      val p = planOf(q)
      assert(!p.contains("Exchange"), s"$q shuffles:\n$p")
      assert(p.contains("*(1)"), s"$q left whole-stage codegen:\n$p")
    }
  }

  test("m06 frame dedup aggregates partially below the exchange, no join of the payload") {
    val p = planOf("m06_frame_dedup")
    assert(p.contains("partial"), p)
    assert(!p.contains("Join"), p) // only (frame_md5, doc_id) pairs shuffle
  }

  test("q30 latest-per-key prunes to top-1 per key BELOW the exchange via WindowGroupLimit") {
    val p = planOf("q30_latest_per_key")
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("Partial"), p) // per-partition top-1 heap before the shuffle
  }

  test("q31 forall compiles to semi+anti hash joins with the violator filter pushed down") {
    val p = planOf("q31_forall_antijoin")
    assert(p.contains("LeftSemi") && p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // BOTH price predicates reach their parquet scans — only
    // qualifying/offending keys ever shuffle
    assert(p.contains("GreaterThan(o_totalprice,250000.0)"), p)
    assert(p.contains("LessThanOrEqual(o_totalprice,250000.0)"), p)
  }

  test("q29 unpivot is a map-only Expand: 4x output rows, zero exchange") {
    val p = planOf("q29_unpivot")
    assert(p.contains("Expand"), p)
    assert(!p.contains("Exchange"), s"unpivot must not shuffle:\n$p")
  }

  test("p07 pack segments: no global window, explode above the pid-keyed prefix sum") {
    val p = planOf("p07_pack_segments")
    // same contract as p03: the only window is partitioned by pid
    assert(!p.contains("Window [") ||
      p.linesIterator.filter(_.contains("windowspecdefinition")).forall(_.contains("pid")), p)
    assert(p.contains("Generate explode"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("j10 Allen census keeps j05's equi-join shape: never a cartesian theta join") {
    val p = planOf("j10_allen_relations")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin")
      || p.contains("ShuffledHashJoin"), p)
  }

  test("s29 hybrid RRF: both arms end in TakeOrderedAndProject, no corpus-sized sort or cartesian") {
    val p = planOf("s29_hybrid_rrf")
    // two corpus-pruning top-50s (lexical + vector) — global Sort
    // nodes may exist only above them, on the bounded shortlists
    assert(p.linesIterator.count(_.contains("TakeOrderedAndProject")) >= 2, p)
    assert(!p.contains("CartesianProduct"), p)
    // the only nested-loops are the two 1-row broadcast crosses: the
    // BM25 (N, avgdl) stats frame and the probe vector
    val bnl = p.linesIterator.filter(_.contains("BroadcastNestedLoopJoin")).toSeq
    assert(bnl.size <= 2 && bnl.forall(_.contains("BuildRight")), p)
  }

  test("p24 DSIR: broadcast λ-join on the bucket key, Gumbel top-k via TakeOrderedAndProject") {
    val p = planOf("p24_dsir_resample")
    // the 1024-row λ table joins the feature stream broadcast — the
    // corpus side must never sort-merge or shuffle for that join
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    // the resample is a bounded top-k, never a global sort of the corpus
    assert(p.contains("TakeOrderedAndProject"), p)
    // the only nested-loop is the 1-row totals scalar attach onto the
    // bounded bucket frame
    val bnl = p.linesIterator.filter(_.contains("BroadcastNestedLoopJoin")).toSeq
    assert(bnl.size <= 1, p)
  }

  test("t30 entropy is one tf pass + one doc-keyed partial agg: no join, no window") {
    val p = planOf("t30_token_entropy")
    assert(!p.contains("Join") && !p.contains("Window"), p)
    assert(p.contains("partial"), p)
  }
}
