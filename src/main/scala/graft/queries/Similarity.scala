package graft.queries

import graft.CacheScope.PersistScopedOps
import graft.{Q, Tables}
import graft.functions.Hashing
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over `embeddings` (64-dim float vectors) — the
  * LLM-pipeline ANN tier: brute-force cosine top-k as the exactness
  * baseline, random-hyperplane LSH signatures, LSH-bucketed ANN top-k,
  * and embedding-cosine near-dup pairs.
  *
  * Cross-engine determinism: dot products fold element products
  * (float→double promotion is exact, 24-bit×24-bit products are exact
  * in double) left-to-right in both engines — Spark `aggregate` and
  * DuckDB `list_sum` are both sequential double sums, so cosines are
  * bit-identical (verified empirically on 2000 pairs). Hyperplane
  * coefficients are md5-derived rationals n/2^31 − 1 ([[Hashing]]),
  * computed driver-side for Spark (literal matrix — no per-row
  * hashing) and in-SQL for the DuckDB oracle; both are exact doubles.
  *
  * Design for 100 TB:
  *   - Brute force (s01/s08) broadcasts the probe set — a
  *     BroadcastNestedLoopJoin that scans candidates once, linear in
  *     input splits; the per-probe top-k is the bounded-heap
  *     `top_k_by_score` aggregate ([[graft.functions.TopKByScore]]),
  *     so only k rows per probe cross the exchange. (The window
  *     formulation — row_number over a |probes|-key partition — would
  *     sort ALL probe×corpus score rows on a 10-value key: 10 reducer
  *     tasks each sorting ~N rows at 1 B vectors. It survives only as
  *     a spec-level cross-check, [[SimilarityKernels.windowTopk]].)
  *   - The LSH path (s03/s04) joins on (band, bits) buckets, so the
  *     candidate join is an equi-join with bounded fan-out — never a
  *     cross join. Bucket skew → AQE skew-join splitting.
  */
object Similarity {

  import SimilarityKernels._

  val all: Map[String, Q] = Map(
    // ── brute-force cosine top-5 per probe ──
    // Bounded-heap aggregate since r7: top_k_by_score is a
    // TypedImperativeAggregate whose partial k-element buffers are
    // built map-side, so only k rows per probe cross the exchange —
    // the old window formulation shuffled and sorted EVERY scored
    // pair on a |probes|-value key (10 reducers sorting ~N rows each
    // at 1 B vectors). PlanShapeSpec guards the shape.
    "s01_topk_cosine" -> Q(
      (s, d) => bruteTopk(s, d, 5),
      Some(topkOracle),
      bench = true),

    // ── the same top-5, kept as a second gate entry ──
    // Historically the aggregate twin of s01's window form; both now
    // share bruteTopk (one formulation, one truth — the window form
    // survives as the windowTopk spec cross-check).
    "s08_topk_agg" -> Q(
      (s, d) => bruteTopk(s, d, 5),
      Some(topkOracle),
      bench = true),

    // ── random-hyperplane LSH signature per vector ──
    "s02_lsh_sig" -> Q(
      (s, d) => signed(s, d).select("vec_id", "sig"),
      Some(s"""WITH sigs AS ($duckSigned)
               SELECT vec_id, sig FROM sigs""")),

    // ── LSH-bucketed ANN top-3: candidates share ≥1 of 4 signature bands ──
    "s03_ann_topk" -> Q(
      (s, d) => annTopk(s, d),
      Some(s"""WITH sigs AS ($duckSigned),
               $duckBanded,
               cand AS (SELECT DISTINCT p.vec_id AS probe_id, c.vec_id AS cand_id
                        FROM bk p JOIN bk c
                        ON p.band = c.band AND p.bits = c.bits AND c.vec_id != p.vec_id
                        WHERE p.vec_id < 10),
               sc AS (SELECT probe_id, cand_id,
                             ${duckDot("x.embedding", "y.embedding")} / (x.nrm * y.nrm) AS cosine
                      FROM cand JOIN sigs x ON x.vec_id = probe_id
                                JOIN sigs y ON y.vec_id = cand_id)
               SELECT probe_id, cand_id, rnk, cosine FROM
                 (SELECT *, CAST(row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, cand_id) AS INTEGER) AS rnk
                  FROM sc)
               WHERE rnk <= 3""")),

    // ── IVF ANN: TRAINED coarse quantizer (k=16, 2 Lloyd steps from
    // the md5-chosen seeds — [[lloydCents]]), nprobe=2 cells.
    // Training is the standard Lloyd loop: one corpus pass per step,
    // only the 16×64 centroid matrix crossing the driver; assignment
    // at query time is map-only against the trained literal matrix.
    // The oracle replays the identical training as a CTE chain
    // (decimal-exact means + float re-quantization in both engines).
    "s05_ivf_topk" -> Q(
      (s, d) => {
        Hashing.register(s)
        val e = Tables(s, d, "embeddings")
          .repartition(s.sparkContext.defaultParallelism)
          .selectExpr("vec_id", "embedding", s"$normE as nrm").persistScoped()
        ivfTopk(e, lloydCents(e, ivfSeeds(e), ivfIters), 2, 3)
      },
      Some(s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding, $duckNorm AS nrm FROM embeddings),
               ${duckTrainedCent(ivfIters)},
               $duckIvfCand,
               sc AS (SELECT probe_id, cand_id, ${duckDot("x.embedding", "y.embedding")}/(x.nrm*y.nrm) AS cosine
                      FROM cand JOIN e x ON x.vec_id = probe_id JOIN e y ON y.vec_id = cand_id)
               SELECT probe_id, cand_id, rnk, cosine FROM
                 (SELECT *, CAST(row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, cand_id) AS INTEGER) AS rnk FROM sc)
               WHERE rnk <= 3""")),

    // ── int8 embedding quantization (training-pipeline compaction) ──
    // floor(x·s + 0.5) instead of round(): identical half-up behavior
    // in both engines, no rounding-mode ambiguity.
    // Gate output joins qvec to a comma string — the driver's pandas
    // fingerprint cannot hash array cells (r03 harness error); the
    // join is lossless for int8-range values in both engines.
    "s06_quantize" -> Q(
      (s, d) => Tables(s, d, "embeddings").selectExpr(
        "vec_id",
        s"127.0 / array_max(transform(embedding, x -> abs(cast(x as double)))) as scale",
        s"""array_join(transform(embedding, x ->
              cast(cast(greatest(-127.0, least(127.0,
                floor(cast(x as double) * (127.0 / array_max(transform(embedding, x2 -> abs(cast(x2 as double))))) + 0.5))) as int) as string)), ',') as qvec"""),
      Some("""WITH e AS (SELECT vec_id, embedding,
                127.0 / list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS scale
              FROM embeddings)
              SELECT vec_id, scale,
                     array_to_string(list_transform(embedding, x ->
                       CAST(greatest(-127.0, least(127.0, floor(CAST(x AS DOUBLE) * scale + 0.5))) AS INTEGER)), ',') AS qvec
              FROM e""")),

    // ── per-label centroids: distributed element-wise array mean ──
    // posexplode → partial-aggregated shuffle on (label, pos) →
    // reassemble by sorted collect. The shuffle key space is
    // |labels| × dims regardless of row count — the scalable shape for
    // element-wise vector aggregation. Sums go through the decimal
    // cast (graft.Det rationale) so both engines add exactly.
    // The centroid array is assembled (sorted collect — the operator
    // under test), then re-exploded to scalar rows for the gate: the
    // driver's pandas fingerprint cannot hash array cells, and the
    // explode also verifies element order, which a joined string of
    // doubles could not do without a formatting contract.
    "s07_label_centroids" -> Q(
      (s, d) => {
        import graft.Det
        Tables(s, d, "embeddings")
          .selectExpr("label", "posexplode(embedding) as (pos, val)")
          .groupBy("label", "pos")
          .agg(Det.davg(col("val").cast("double"), 8).as("v"))
          .groupBy("label")
          .agg(expr("transform(sort_array(collect_list(struct(pos, v))), x -> x.v)").as("centroid"))
          .selectExpr("label", "posexplode(centroid) as (pos, v)")
      },
      Some(s"""WITH x AS (SELECT label, pos, CAST(embedding[pos+1] AS DOUBLE) AS val
                          FROM embeddings CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS pos) p)
               SELECT label, CAST(pos AS INTEGER) AS pos, ${graft.Det.sqlAvg("val", 8)} AS v
               FROM x GROUP BY label, pos""")),

    // ── embedding-cosine near-dup pairs (LSH candidates, cos ≥ 0.45) ──
    "s04_embed_dup" -> Q((s, d) => embedDupPairs(s, d), Some(s04Oracle)),

    // ── ANN quality harness: recall@3 of the LSH-bucketed ANN (s03)
    // against the exact brute-force top-3 (s01's baseline) — the
    // measurement a pipeline runs before trusting an index. Left join
    // keeps zero-hit probes; all-integer recall so the gate
    // hash-compares exactly. Scale: both inputs are the (tiny)
    // per-probe top-k frames, so the join+agg is probe-bounded
    // regardless of corpus size. ──
    "s09_ann_recall" -> Q(
      (s, d) => Recall.perProbe(
        bruteTopk(s, d, 3), annTopk(s, d), "probe_id", "cand_id", Some(3)),
      Some(s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding, $duckNorm AS nrm FROM embeddings),
               sc AS (SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
                             ${duckDot("p.embedding", "c.embedding")} / (p.nrm * c.nrm) AS cosine
                      FROM e p JOIN e c ON c.vec_id != p.vec_id WHERE p.vec_id < 10),
               exact AS (SELECT probe_id, cand_id FROM
                           (SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, cand_id) AS rnk
                            FROM sc)
                         WHERE rnk <= 3),
               sigs AS ($duckSigned),
               $duckBanded,
               cand AS (SELECT DISTINCT p.vec_id AS probe_id, c.vec_id AS cand_id
                        FROM bk p JOIN bk c
                        ON p.band = c.band AND p.bits = c.bits AND c.vec_id != p.vec_id
                        WHERE p.vec_id < 10),
               asc2 AS (SELECT probe_id, cand_id,
                               ${duckDot("x.embedding", "y.embedding")} / (x.nrm * y.nrm) AS cosine
                        FROM cand JOIN sigs x ON x.vec_id = probe_id
                                  JOIN sigs y ON y.vec_id = cand_id),
               ann AS (SELECT probe_id, cand_id FROM
                         (SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, cand_id) AS rnk
                          FROM asc2)
                       WHERE rnk <= 3)
               SELECT x.probe_id,
                      CAST(sum(CASE WHEN a.cand_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits,
                      (CAST(sum(CASE WHEN a.cand_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) * 10000) // 3 AS recall_bp
               FROM exact x LEFT JOIN ann a
                 ON a.probe_id = x.probe_id AND a.cand_id = x.cand_id
               GROUP BY x.probe_id""")),

    // ── nprobe recall sweep: recall@3 of the IVF cell pruning at
    // nprobe ∈ {1, 2, 4} against the exact cosine top-3 — the curve
    // an index operator actually reads when trading probe cost
    // against recall (each nprobe step scans proportionally more
    // cells; recall must be monotone in nprobe, which the spec pins).
    // One trained quantizer + ONE corpus assignment shared by all
    // three settings (only the 160-row probe-cell frames differ);
    // every sweep point goes through the shared [[Recall]] harness. ──
    "s15_nprobe_sweep" -> Q(
      (s, d) => {
        Hashing.register(s)
        val e = Tables(s, d, "embeddings")
          .repartition(s.sparkContext.defaultParallelism)
          .selectExpr("vec_id", "embedding", s"$normE as nrm").persistScoped()
        val cents = lloydCents(e, ivfSeeds(e), ivfIters)
        // persisted: the exact baseline and the corpus cell
        // assignment are nprobe-independent — without the caches each
        // of the three sweep points would re-run the brute-force
        // scoring scan and the full-corpus assignment
        val exact = bruteTopk(s, d, 3).persistScoped()
        val asg = ivfAssign(e, cents).persistScoped()
        Seq(1, 2, 4).map { np =>
          Recall.perProbe(exact, ivfTopk(e, cents, np, 3, Some(asg)),
              "probe_id", "cand_id", Some(3))
            .selectExpr(s"cast($np as int) as nprobe", "probe_id", "hits", "recall_bp")
        }.reduce(_.unionByName(_))
      },
      Some {
        val sweeps = Seq(1, 2, 4).map { np =>
          s"""${duckIvfProbe(np, s"_$np")},
              scn$np AS (SELECT c.probe_id, c.cand_id,
                                ${duckDot("x.embedding", "y.embedding")} / (x.nrm * y.nrm) AS cosine
                         FROM cand_$np c JOIN e x ON x.vec_id = c.probe_id
                                         JOIN e y ON y.vec_id = c.cand_id),
              ann$np AS (SELECT probe_id, cand_id FROM
                           (SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, cand_id) AS rnk FROM scn$np)
                         WHERE rnk <= 3)"""
        }
        val recs = Seq(1, 2, 4).map { np =>
          s"""SELECT $np AS nprobe, x.probe_id,
                     CAST(sum(CASE WHEN a.cand_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits,
                     (CAST(sum(CASE WHEN a.cand_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) * 10000) // 3 AS recall_bp
              FROM exact x LEFT JOIN ann$np a
                ON a.probe_id = x.probe_id AND a.cand_id = x.cand_id
              GROUP BY x.probe_id"""
        }
        s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding, $duckNorm AS nrm FROM embeddings),
            sc AS (SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
                          ${duckDot("p.embedding", "c.embedding")} / (p.nrm * c.nrm) AS cosine
                   FROM e p JOIN e c ON c.vec_id != p.vec_id WHERE p.vec_id < 10),
            exact AS (SELECT probe_id, cand_id FROM
                        (SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, cand_id) AS rnk
                         FROM sc)
                      WHERE rnk <= 3),
            ${duckTrainedCent(ivfIters)},
            $duckIvfAsg,
            ${sweeps.mkString(",\n")}
            ${recs.mkString("\nUNION ALL\n")}"""
      }),

    // ── SemDeDup-style semantic clusters: connected components over
    // the embedding near-dup pair graph (s04's edges through d08's
    // large-star/small-star machinery) — "keep one doc per embedding
    // cluster" is the semantic-dedup step after exact and lexical
    // dedup. Same recursive-closure oracle shape as d08. Runs the
    // d03-style REP topology ([[SimilarityKernels.embedClusters]],
    // with its output-equivalence proof): byte-identical copies
    // collapse before the pair graph and the CC rounds, so cost is
    // copy-count-independent — the raw member-level formulation
    // ground for 75+ min at sf10's 100-copy storm. ──
    "s10_embed_clusters" -> Q(
      (s, d) => SimilarityKernels.embedClusters(s, d),
      Some(s"""WITH RECURSIVE ${SimilarityKernels.s04OracleCtes},
               p AS MATERIALIZED (${SimilarityKernels.s04OracleSelect}),
               edges AS MATERIALIZED (SELECT v1 AS a, v2 AS b FROM p
                         UNION SELECT v2, v1 FROM p),
               reach AS (SELECT a, a AS b FROM (SELECT DISTINCT a FROM edges)
                         UNION
                         SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
               SELECT a AS vec_id, min(b) AS cluster FROM reach GROUP BY a""")),

    // ── one spherical-k-means Lloyd step (k=8, seeds = the first k
    // vectors): the workhorse of embedding-space corpus curation
    // (cluster-balanced sampling, SemDeDup prototypes, topic
    // bucketing). Assignment is MAP-ONLY: the centroids ride along as
    // a typed literal matrix (the hyperplane-literal pattern), each
    // row computes its k cosines and takes argmax in-projection — no
    // crossJoin, no shuffle, nothing per-row but arithmetic. The
    // update is a (cluster, pos)-keyed partial aggregate: only
    // k × 64 × partitions partial rows cross the exchange, never the
    // corpus. argmax = array_position of the max (first index wins =
    // min-cid tie-break, mirrored by the oracle's ORDER BY ccos DESC,
    // cid). [[kmeansFit]] iterates this step driver-side; the planted
    // convergence spec drives it. ──
    "s11_kmeans_step" -> Q(
      (s, d) => {
        Hashing.register(s)
        val e = Tables(s, d, "embeddings")
          .repartition(s.sparkContext.defaultParallelism)
          .selectExpr("vec_id", "embedding", s"$normE as nrm")
        kmeansStep(e, kmeansSeed(e, 8))
      },
      Some(s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding, $duckNorm AS nrm FROM embeddings),
               c AS (SELECT vec_id AS cid, embedding AS ce, nrm AS cn FROM e WHERE vec_id < 8),
               sc AS (SELECT e.vec_id, c.cid, ${duckDot("e.embedding", "c.ce")} / (e.nrm * c.cn) AS ccos
                      FROM e CROSS JOIN c),
               asg AS (SELECT vec_id, CAST(cid AS BIGINT) AS cluster FROM
                         (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn FROM sc)
                       WHERE rn = 1),
               cnt AS (SELECT cluster, count(*) AS n FROM asg GROUP BY cluster),
               x AS (SELECT a.cluster, pos, CAST(e.embedding[pos+1] AS DOUBLE) AS val
                     FROM asg a JOIN e ON e.vec_id = a.vec_id
                     CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS pos) p)
               SELECT x.cluster, cnt.n, CAST(pos AS INTEGER) AS pos, ${graft.Det.sqlAvg("val", 8)} AS v
               FROM x JOIN cnt USING (cluster) GROUP BY x.cluster, cnt.n, pos""")),

    // ── product-quantization ANN (PQ/ADC, the Jégou et al. 2011 memory
    // path): 8 subspaces × 8 dims, 16 codewords each — a vector
    // compresses 256 bytes → 8 code bytes, which is what lets a
    // 1 B-vector index live in executor memory at all. Codebooks here
    // are the seed subvectors of the 16 smallest vec_ids — s12 is
    // kept as the UNtrained ADC baseline; the production path
    // (s13/s14/stream09) trains them via [[pqCodebookTrained]]
    // through the same literal seam. Encoding is MAP-ONLY against the literal
    // codebook (the s11 pattern — argmin by array_position, first
    // index = min-j ties). ADC scoring is the PQ trick: each probe
    // precomputes its 8×16 subspace-distance table map-only, and the
    // candidate scan is a table LOOKUP-fold over the 8 code bytes —
    // broadcast-NLJ over the probe set like s01, but scanning codes,
    // not raw vectors. The fold runs in subspace order, so the double
    // sum is bit-identical to the oracle's ordered list_sum. Top-3 is
    // the bounded-heap aggregate (k rows per probe cross the
    // exchange). ──
    "s12_pq_adc" -> Q(
      (s, d) => {
        Hashing.register(s)
        val e = Tables(s, d, "embeddings")
          .repartition(s.sparkContext.defaultParallelism)
          .select(col("vec_id"), col("embedding"))
        val cb = pqCodebook(e)
        val codes = pqEncode(e, cb).select(col("vec_id").as("cand_id"), col("codes"))
        val probes = pqProbeTables(e.where("vec_id < 10"), cb)
        adcTopk(codes.crossJoin(broadcast(probes)).where("cand_id != probe_id"), 3)
      },
      Some {
        // dim = 8: sv/cv are PQ subvectors (SimilarityKernels' dd2 note)
        val dd2 = (a: String, b: String) =>
          s"(${duckDot(a, a, 8)} - 2 * ${duckDot(a, b, 8)} + ${duckDot(b, b, 8)})"
        s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
            sub AS MATERIALIZED (SELECT vec_id, s, embedding[s*8+1:s*8+8] AS sv
                    FROM e, LATERAL (SELECT unnest(generate_series(0, 7)) AS s) g),
            cb AS (SELECT s, vec_id AS j, sv AS cv FROM sub WHERE vec_id < 16),
            codes AS (SELECT vec_id AS cand_id, s, j AS code FROM (
                        SELECT sub.vec_id, sub.s, cb.j,
                               row_number() OVER (PARTITION BY sub.vec_id, sub.s
                                 ORDER BY ${dd2("sub.sv", "cb.cv")}, cb.j) AS rn
                        FROM sub JOIN cb ON cb.s = sub.s) WHERE rn = 1),
            ad AS (SELECT p.vec_id AS probe_id, co.cand_id,
                          list_sum(list(${dd2("p.sv", "cb.cv")} ORDER BY p.s)) AS adist
                   FROM sub p
                   JOIN codes co ON co.s = p.s
                   JOIN cb ON cb.s = co.s AND cb.j = co.code
                   WHERE p.vec_id < 10 AND co.cand_id != p.vec_id
                   GROUP BY 1, 2)
            SELECT probe_id, cand_id, rnk, adist FROM
              (SELECT *, CAST(row_number() OVER (PARTITION BY probe_id ORDER BY adist, cand_id) AS INTEGER) AS rnk FROM ad)
            WHERE rnk <= 3"""
      }),

    // ── IVF-PQ recall@3 harness (s09's shape for the two-stage
    // index): how much of the exact cosine top-3 survives BOTH the
    // coarse-cell pruning AND the 8-byte quantization? The number an
    // index tuner actually watches when trading nprobe/codebook size
    // against recall — and the gauge for the r9 codebook training
    // (trained-vs-seed recall is pinned by SimilaritySpec). Exact
    // baseline = the bounded-heap brute top-k; left join keeps
    // zero-hit probes; integer recall_bp. ──
    "s14_ivfpq_recall" -> Q(
      (s, d) => Recall.perProbe(
        bruteTopk(s, d, 3), all("s13_ivfpq").fn(s, d), "probe_id", "cand_id", Some(3)),
      Some(
        s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding, $duckNorm AS nrm FROM embeddings),
            sc AS (SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
                          ${duckDot("p.embedding", "c.embedding")} / (p.nrm * c.nrm) AS cosine
                   FROM e p JOIN e c ON c.vec_id != p.vec_id WHERE p.vec_id < 10),
            exact AS (SELECT probe_id, cand_id FROM
                        (SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, cand_id) AS rnk
                         FROM sc)
                      WHERE rnk <= 3),
            $duckIvfPqCore
            SELECT x.probe_id,
                   CAST(sum(CASE WHEN a.cand_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits,
                   (CAST(sum(CASE WHEN a.cand_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) * 10000) // 3 AS recall_bp
            FROM exact x LEFT JOIN ann a
              ON a.probe_id = x.probe_id AND a.cand_id = x.cand_id
            GROUP BY x.probe_id"""
      )),

    // ── two-stage IVF-PQ ANN (the FAISS IVFADC shape, s05 × s12): the
    // coarse quantizer prunes the corpus to the probes' nprobe=2
    // cells, and only those candidates are scored — by asymmetric
    // distance against their 8-byte PQ codes, NOT their raw vectors.
    // This is the composition a 1 B-vector index actually runs: the
    // cell join bounds the scan, the code lookup bounds the memory,
    // and nothing ever scores probe × full-corpus. BOTH stages are
    // TRAINED (r9): the coarse quantizer by [[lloydCents]] and the
    // per-subspace codebooks by [[pqCodebookTrained]] (2 Lloyd steps
    // each; the oracle replays the training as CTE chains). Since r10
    // the codebooks encode RESIDUALS x − cent[cell]
    // ([[residualFrame]], Jégou et al. 2011's IVFADC) rather than raw
    // vectors, and the query runs the paper's §VII refinement
    // (IVFADC+R): an ADC shortlist of R=10 per probe, then EXACT
    // re-ranking of that bounded shortlist against raw vectors →
    // top-3 (s14 gauges the recall gain: 8/30 raw-ADC → 11/30).
    // Residual ADC keys the probe tables by (probe, CELL): a
    // candidate's code is scored against the probe's residual in the
    // candidate's own cell ([[pqProbeTablesRes]] — bounded,
    // |probes|×nprobe broadcast rows). Candidates join probe cells to
    // postings on the cell equi-key; both the shortlist and the
    // re-rank are bounded-heap aggregates, and the re-rank touches
    // R×|probes| raw vectors — the refine sidecar read, never a
    // corpus scan. ──
    "s13_ivfpq" -> Q(
      (s, d) => {
        Hashing.register(s)
        val e = Tables(s, d, "embeddings")
          .repartition(s.sparkContext.defaultParallelism)
          .selectExpr("vec_id", "embedding", s"$normE as nrm").persistScoped()
        val cents = lloydCents(e, ivfSeeds(e), ivfIters)
        // one corpus pass: cell assignment + residual, feeding both
        // the codebook trainer and the encode
        val rf = residualFrame(e, cents).persistScoped()
        val cb = pqCodebookTrained(rf, pqIters)
        val codes = pqEncode(rf, cb, keep = Seq("cell"))
          .select(col("vec_id").as("cand_id"), col("cell"), col("codes"))
        val probes = e.where("vec_id < 10")
        val cand = broadcast(probeCells(probes, cents, 2))
          .join(codes, "cell") // candidate's OWN cell ∈ the probe's cells
          .where(col("cand_id") =!= col("probe_id"))
        val short = adcTopk(cand.join(
          broadcast(pqProbeTablesRes(probes, cents, cb, 2)), Seq("probe_id", "cell")), rerankR)
        rerankExact(short, probes, e, 3)
      },
      Some(duckIvfPqSql)),

    // ── index persistence roundtrip: the offline-build / online-serve
    // split every production ANN deployment runs. BUILD trains both
    // quantizers (s13's trainers) and writes the three index
    // artifacts as parquet: the centroid matrix (cell, pos, v), the
    // per-subspace PQ codebooks (s, j, pos, v), and the inverted
    // file (cell, cand_id, codes) — cell-partitionable postings
    // carrying 8-byte codes, the only corpus-sized artifact. SERVE
    // then answers s13's query from the artifacts alone: quantizer
    // matrices load driver-side (k×dim and 8×16×8 floats — the
    // bounded in-memory index head), probe cells fan out against the
    // loaded centroids, candidates come from the postings scan (at
    // scale, partition pruning on cell replaces reading the file),
    // and ADC scoring is s12's. The corpus table is touched only for
    // probe vectors — the serving tier's actual input. Must equal
    // s13 bit-for-bit (same oracle): persistence loses nothing
    // (floats roundtrip parquet exactly). ──
    "s16_index_roundtrip" -> Q(
      (s, d) => {
        Hashing.register(s)
        val e = Tables(s, d, "embeddings")
          .repartition(s.sparkContext.defaultParallelism)
          .selectExpr("vec_id", "embedding", s"$normE as nrm").persistScoped()
        ivfPqBuild(s, e)
        ivfPqServe(s, e.where("vec_id < 10"))
      },
      // the roundtrip must reproduce s13's answer exactly
      Some(duckIvfPqSql)),

    // ── SERVE-ONLY ANN latency (the number the s16 watch item was
    // missing): s16's wall time is train+search — 4 driver-iterated
    // Lloyd passes the oracle must replay — but production builds
    // ONCE and serves forever, so the latency that matters is the
    // serve path alone. The index builds lazily (marker-gated, keyed
    // by corpus dir so sf0.01 and sf0.1 never share artifacts) on
    // the FIRST invocation — in the bench that is the untimed
    // per-query warmup — and every later run is pure serve: load the
    // bounded quantizer heads, resolve probe cells driver-side, read
    // postings + refine sidecar with the static `cell isin` filter
    // (FileSourceScan lists only the probed cells' partitions —
    // IndexPruneSpec's property, now with a tracked number), ADC
    // shortlist, exact re-rank. Must still equal s13/s16 bit-for-bit
    // (same oracle). ──
    "s28_serve_only" -> Q(
      (s, d) => {
        Hashing.register(s)
        val ix = java.nio.file.Paths.get(
          System.getProperty("java.io.tmpdir"), "graft-index",
          s"serve-${d.replaceAll("[^A-Za-z0-9]", "_")}").toString
        // corpus-fingerprinted, atomically-published build marker
        // (graft.Staged): regenerated testdata forces a rebuild
        // instead of silently serving a stale index
        graft.Staged.ensure(ix,
          graft.Staged.fingerprint(s"$d/embeddings.parquet")) {
          graft.CacheScope.scoped {
            val e = Tables(s, d, "embeddings")
              .repartition(s.sparkContext.defaultParallelism)
              .selectExpr("vec_id", "embedding", s"$normE as nrm").persistScoped()
            ivfPqBuild(s, e, ix)
          }
        }
        // no persist: the serve path collects the probe rows once and
        // plans every probe-side use against the local relation, so
        // the corpus parquet is scanned exactly once for the probes —
        // and the table's base frame is session-cached (a server does
        // not re-read the footer per query)
        ivfPqServe(s, servedEmbeddings(s, d).where("vec_id < 10")
          .selectExpr("vec_id", "embedding", s"$normE as nrm"), ix)
      },
      Some(duckIvfPqSql), bench = true),

    // ── metadata-FILTERED ANN (the production "similar docs WHERE
    // lang='en'" shape): IVF top-3 by exact cosine among candidates
    // satisfying a label predicate, with the filter applied to the
    // INVERTED LISTS before any scoring — pre-filtering, not the
    // lossy post-filter of an unfiltered top-k (which returns fewer
    // than k survivors whenever the unfiltered top-k is predicate-
    // poor; FilteredAnnSpec demonstrates the divergence). Scale
    // shape: the label rides in the postings row, so at 1 B vectors
    // the predicate is a pushed parquet filter on the postings scan
    // (the s16 artifact layout), the candidate join stays the bounded
    // cell equi-join, and scoring touches only surviving candidates.
    // Probes are NOT filtered — the query vector may be anything. ──
    "s18_filtered_ann" -> Q(
      (s, d) => {
        Hashing.register(s)
        val e = Tables(s, d, "embeddings")
          .repartition(s.sparkContext.defaultParallelism)
          .selectExpr("vec_id", "embedding", s"$normE as nrm", "label").persistScoped()
        val cents = lloydCents(e, ivfSeeds(e), ivfIters)
        // pre-filter: only even-label vectors enter the inverted lists
        val cand = broadcast(probeCells(e.where("vec_id < 10"), cents, 2))
          .join(ivfAssign(e.where("label % 2 = 0"), cents), "cell")
          .where(col("vec_id") =!= col("probe_id"))
          .select(col("probe_id"), col("vec_id").as("cand_id")).distinct()
        heapTopk(cand
          .join(e.select(col("vec_id").as("probe_id"), col("embedding").as("pe"), col("nrm").as("pn")), "probe_id")
          .join(e.select(col("vec_id").as("cand_id"), col("embedding").as("ce2"), col("nrm").as("cn2")), "cand_id")
          .selectExpr("probe_id", "cand_id", s"${dot("pe", "ce2")} / (pn * cn2) as cosine"), 3)
      },
      Some(s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding, $duckNorm AS nrm, label FROM embeddings),
               ${duckTrainedCent(ivfIters)},
               $duckIvfAsg,
               ${duckIvfProbe(2)},
               candf AS (SELECT DISTINCT p.probe_id, a.vec_id AS cand_id
                         FROM pcells p JOIN asg a ON a.cell = p.cell AND a.vec_id != p.probe_id
                         JOIN e ce ON ce.vec_id = a.vec_id
                         WHERE ce.label % 2 = 0),
               sc AS (SELECT probe_id, cand_id, ${duckDot("x.embedding", "y.embedding")}/(x.nrm*y.nrm) AS cosine
                      FROM candf JOIN e x ON x.vec_id = probe_id JOIN e y ON y.vec_id = cand_id)
               SELECT probe_id, cand_id, rnk, cosine FROM
                 (SELECT *, CAST(row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, cand_id) AS INTEGER) AS rnk FROM sc)
               WHERE rnk <= 3""")),

    // ── index DELETE maintenance: tombstoned serving. Production ANN
    // indexes take deletes (GDPR erasure, re-crawl invalidation)
    // without retraining or rebuilding: the deleted ids become a
    // TOMBSTONE set anti-joined against the postings at serve time —
    // quantizers stay as trained on the full corpus (retraining per
    // delete would be absurd), so the contract is serve-minus-deleted
    // under the SAME index, which the oracle mirrors by filtering the
    // candidate CTE only. At 100 TB the tombstone set is a broadcast
    // anti-join (or a bloom) riding the pruned postings scan until
    // the next compaction rewrites the affected cell partitions.
    // A deterministic ~10% of vectors is deleted; IndexDeleteSpec
    // pins that no deleted id survives and that the deletion
    // genuinely changes some answer (backfill from rank > 3). ──
    "s19_index_delete" -> Q(
      (s, d) => {
        Hashing.register(s)
        val e = Tables(s, d, "embeddings")
          .repartition(s.sparkContext.defaultParallelism)
          .selectExpr("vec_id", "embedding", s"$normE as nrm").persistScoped()
        val cents = lloydCents(e, ivfSeeds(e), ivfIters)
        val rf = residualFrame(e, cents).persistScoped()
        val cb = pqCodebookTrained(rf, pqIters)
        val tombstones = e.selectExpr("vec_id as cand_id")
          .where(s"${Hashing.h32Sql("concat('del:', cand_id)")} % 10 = 0")
        val codes = pqEncode(rf, cb, keep = Seq("cell"))
          .select(col("vec_id").as("cand_id"), col("cell"), col("codes"))
          .join(broadcast(tombstones), Seq("cand_id"), "left_anti")
        val probes = e.where("vec_id < 10")
        val cand = broadcast(probeCells(probes, cents, 2))
          .join(codes, "cell")
          .where(col("cand_id") =!= col("probe_id"))
        val short = adcTopk(cand.join(
          broadcast(pqProbeTablesRes(probes, cents, cb, 2)), Seq("probe_id", "cell")), rerankR)
        rerankExact(short, probes, e, 3)
      },
      Some(s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding, $duckNorm AS nrm FROM embeddings),
               ${duckIvfPqCoreWhere(
                 s"NOT (${Hashing.duck32("'del:' || a.vec_id")} % 10 = 0)")}
               SELECT probe_id, cand_id, rnk, cosine FROM ann""")),

    // ── s22: index INSERT without retraining — s19's twin, closing
    // the index lifecycle (build → serve → delete → insert →
    // stream). The quantizer heads are FROZEN (trained once); a
    // newly arriving vector shard encodes against them in its own
    // pass and its postings UNION into the inverted file — legal
    // because cell assignment and residual encoding are pure per-row
    // functions of the frozen heads, so postings-of-union ≡
    // union-of-postings (the d15/stream16 merge≡rebuild algebra,
    // here with set union as the merge). The gate serves the
    // incrementally-built index and must reproduce the from-scratch
    // s13 answer bit-for-bit (same oracle); the spec additionally
    // pins artifact-level equality of the two build routes. At 1 B
    // vectors this is the nightly ingest: the new shard's encode is
    // one map-only pass over the SHARD, the union is an append to
    // the cell-partitioned postings — the base index is never
    // touched, no retrain, no rebuild. ──
    "s22_index_insert" -> Q(
      (s, d) => {
        Hashing.register(s)
        val e = Tables(s, d, "embeddings")
          .repartition(s.sparkContext.defaultParallelism)
          .selectExpr("vec_id", "embedding", s"$normE as nrm").persistScoped()
        val cents = lloydCents(e, ivfSeeds(e), ivfIters)
        val cb = pqCodebookTrained(residualFrame(e, cents).persistScoped(), pqIters)
        def shardCodes(part: DataFrame) =
          pqEncode(residualFrame(part, cents), cb, keep = Seq("cell"))
            .select(col("vec_id").as("cand_id"), col("cell"), col("codes"))
        val codes = shardCodes(e.where("vec_id < 400"))
          .unionByName(shardCodes(e.where("vec_id >= 400")))
        val probes = e.where("vec_id < 10")
        val cand = broadcast(probeCells(probes, cents, 2))
          .join(codes, "cell")
          .where(col("cand_id") =!= col("probe_id"))
        val short = adcTopk(cand.join(
          broadcast(pqProbeTablesRes(probes, cents, cb, 2)), Seq("probe_id", "cell")), rerankR)
        rerankExact(short, probes, e, 3)
      },
      Some(duckIvfPqSql)),

    // ── MMR diversity re-rank: Maximal Marginal Relevance
    // (Carbonell & Goldstein 1998) over the exact top-10 shortlist —
    // retrieval that penalizes redundancy, the standard fix when the
    // plain top-k returns five near-copies of one document. Greedy:
    // each step selects argmax of 0.7·relevance − 0.3·(max cosine to
    // anything already selected), expressed with integer coefficients
    // (7x−3y)/10 so both engines parse identical double literals.
    // ── SemDeDup (Abbas et al. 2023): embedding-space SEMANTIC dedup.
    // Registered in the dedup tier (d-prefix key) but lives here for
    // the trained-quantizer machinery. All-pairs cosine over a corpus
    // is quadratic; SemDeDup bounds it by clustering first and
    // comparing only WITHIN cells: assignment is map-only against the
    // trained literal centroids (the s05/s13 coarse quantizer,
    // replayed CTE-for-CTE by the oracle), and the pairwise stage is
    // an equi-join on the cell id — cost Σ|cell|², dialed by k
    // (production sizes k ≈ corpus/10k so cells stay ~10k rows; a
    // skewed cell splits under AQE skew-join). Keep rule,
    // deterministic in both engines off the bit-identical dotf
    // cosine: a vector is a semantic duplicate iff a SMALLER-id
    // vector in the same cell has cosine ≥ 0.4 with it (greedy
    // keep-first — the paper keeps one representative per similarity
    // group; smallest-id is the deterministic choice of it). Output
    // keeps every vector with its verdict, so downstream filters
    // compose: (vec_id, cell, dup_of = smallest in-cell near-neighbor
    // or −1, keep). ──
    "d17_semdedup" -> Q(
      (s, d) => {
        Hashing.register(s)
        val e = Tables(s, d, "embeddings")
          .repartition(s.sparkContext.defaultParallelism)
          .selectExpr("vec_id", "embedding", s"$normE as nrm").persistScoped()
        val wc = ivfAssign(e, lloydCents(e, ivfSeeds(e), ivfIters))
          .join(e, "vec_id").persistScoped()
        val dups = wc.select(col("cell"), col("vec_id").as("a"),
            col("embedding").as("ea"), col("nrm").as("na"))
          .join(wc.select(col("cell"), col("vec_id").as("b"),
            col("embedding").as("eb"), col("nrm").as("nb")), "cell")
          .where(col("b") < col("a"))
          .selectExpr("a", "b", s"${dot("ea", "eb")} / (na * nb) as cos")
          .where("cos >= 0.4")
          .groupBy("a").agg(min("b").as("dup_of"))
        wc.select("vec_id", "cell")
          .join(dups.withColumnRenamed("a", "vec_id"), Seq("vec_id"), "left")
          .selectExpr("vec_id", "cell",
            "coalesce(dup_of, cast(-1 as bigint)) as dup_of",
            "dup_of is null as keep")
      },
      Some(s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding, $duckNorm AS nrm FROM embeddings),
               ${duckTrainedCent(ivfIters)},
               $duckIvfAsg,
               wc AS MATERIALIZED (SELECT a.vec_id, a.cell, e.embedding, e.nrm
                      FROM asg a JOIN e ON e.vec_id = a.vec_id),
               prs AS (SELECT x.vec_id AS a, y.vec_id AS b,
                              ${duckDot("x.embedding", "y.embedding")} / (x.nrm * y.nrm) AS cos
                       FROM wc x JOIN wc y ON y.cell = x.cell AND y.vec_id < x.vec_id),
               dups AS (SELECT a AS vec_id, min(b) AS dup_of
                        FROM prs WHERE cos >= 0.4 GROUP BY a)
               SELECT w.vec_id, w.cell, COALESCE(d.dup_of, -1) AS dup_of,
                      d.dup_of IS NULL AS keep
               FROM wc w LEFT JOIN dups d ON d.vec_id = w.vec_id""")),

    // ── s20: RANGE search — all neighbors within a cosine RADIUS
    // (τ = 0.3), the other half of the similarity API surface
    // (top-k answers "the best k", range answers "everything this
    // close": dedup candidates, retrieval recall pools, positive
    // mining all cut on a threshold, not a count). Served from the
    // same 4-band LSH bucket index as s03 — the candidate set is the
    // bucket-share EQUI-join, so the scan is bounded by bucket
    // occupancy, never probe×corpus — with the exact broadcast-scan
    // side computed once off the same persisted signature frame as
    // the per-probe evidence denominator (index hits ⊆ exact hits by
    // construction, so recall_bp ≤ 10000 — the spec pins it). Unlike
    // top-k, output size is data-dependent; the per-probe COUNT
    // grain keeps the gate output bounded while still pinning both
    // sides' exact cardinalities. At 100 TB the exact side drops and
    // the index side IS the query — same plan, minus one branch. ──
    "s20_range_search" -> Q(
      (s, d) => {
        val sigs = signed(s, d).persistScoped()
        val bk = banded(sigs)
        val cand = broadcast(bk.where("vec_id < 10")
            .select(col("vec_id").as("probe_id"), col("band"), col("bits")))
          .join(bk.select(col("vec_id").as("cand_id"), col("band").as("b2"), col("bits").as("k2")),
            col("band") === col("b2") && col("bits") === col("k2") && col("probe_id") =!= col("cand_id"))
          .select("probe_id", "cand_id").distinct()
        val e = sigs.select("vec_id", "embedding", "nrm")
        val idx = cand
          .join(e.select(col("vec_id").as("probe_id"), col("embedding").as("pe"), col("nrm").as("pn")), "probe_id")
          .join(e.select(col("vec_id").as("cand_id"), col("embedding").as("ce"), col("nrm").as("cn")), "cand_id")
          .selectExpr("probe_id", "cand_id", s"${dot("pe", "ce")} / (pn * cn) as cosine")
          .where("cosine >= 0.3")
          .groupBy("probe_id").agg(count(lit(1)).as("n_index"))
        val p = e.where("vec_id < 10")
          .select(col("vec_id").as("probe_id"), col("embedding").as("pe"), col("nrm").as("pn"))
        val exact = e.select(col("vec_id").as("cand_id"), col("embedding").as("ce"), col("nrm").as("cn"))
          .join(broadcast(p), col("cand_id") =!= col("probe_id"))
          .selectExpr("probe_id", s"${dot("pe", "ce")} / (pn * cn) as cosine")
          .where("cosine >= 0.3")
          .groupBy("probe_id").agg(count(lit(1)).as("n_exact"))
        e.where("vec_id < 10").select(col("vec_id").as("probe_id"))
          .join(exact, Seq("probe_id"), "left")
          .join(idx, Seq("probe_id"), "left")
          .selectExpr("probe_id",
            "coalesce(n_exact, cast(0 as bigint)) as n_exact",
            "coalesce(n_index, cast(0 as bigint)) as n_index",
            "coalesce(n_index, cast(0 as bigint)) * 10000" +
              " div greatest(coalesce(n_exact, cast(0 as bigint)), 1) as recall_bp")
      },
      Some(s"""WITH sigs AS ($duckSigned),
               $duckBanded,
               cand AS (SELECT DISTINCT p.vec_id AS probe_id, c.vec_id AS cand_id
                        FROM bk p JOIN bk c
                        ON p.band = c.band AND p.bits = c.bits AND c.vec_id != p.vec_id
                        WHERE p.vec_id < 10),
               idx AS (SELECT probe_id, count(*) AS n_index FROM
                         (SELECT probe_id,
                                 ${duckDot("x.embedding", "y.embedding")} / (x.nrm * y.nrm) AS cosine
                          FROM cand JOIN sigs x ON x.vec_id = probe_id
                                    JOIN sigs y ON y.vec_id = cand_id)
                       WHERE cosine >= 0.3 GROUP BY 1),
               ex AS (SELECT p.vec_id AS probe_id, count(*) AS n_exact
                      FROM sigs p JOIN sigs c ON c.vec_id != p.vec_id
                      WHERE p.vec_id < 10
                        AND ${duckDot("p.embedding", "c.embedding")} / (p.nrm * c.nrm) >= 0.3
                      GROUP BY 1)
               SELECT s.vec_id AS probe_id,
                      coalesce(n_exact, 0) AS n_exact,
                      coalesce(n_index, 0) AS n_index,
                      CAST(coalesce(n_index, 0) * 10000 //
                           greatest(coalesce(n_exact, 0), 1) AS BIGINT) AS recall_bp
               FROM (SELECT vec_id FROM sigs WHERE vec_id < 10) s
               LEFT JOIN ex ON ex.probe_id = s.vec_id
               LEFT JOIN idx ON idx.probe_id = s.vec_id""")),

    // ── s23: MATRYOSHKA truncation audit (Kusupati et al. 2022) —
    // how much top-3 recall survives keeping only the first 16 of 64
    // dims? The dial every embedding-storage budget turns (4× less
    // vector memory, 4× less ADC work) measured the same way every
    // index dial here is: the shared probe-bounded Recall harness
    // (s09/s14/d11's code path) with the truncated ranking as
    // `retrieved` and the full-dim ranking as truth. One persisted
    // broadcast probe scan feeds BOTH rankings (full and truncated
    // cosines off the same pair rows — the truncation costs a slice,
    // not a second corpus pass); both top-3s are bounded-heap
    // aggregates. Verdicts stay gate-exact: cosines are the same
    // sequential-fold doubles, recall is integer bp. ──
    "s23_matryoshka_recall" -> Q(
      (s, d) => {
        Hashing.register(s)
        val e = Tables(s, d, "embeddings")
          .repartition(s.sparkContext.defaultParallelism)
          .selectExpr("vec_id", "embedding", s"$normE as nrm",
            "slice(embedding, 1, 16) as emb16")
          .selectExpr("vec_id", "embedding", "nrm", "emb16", "vnorm(emb16) as nrm16")
        val p = e.where("vec_id < 10").select(col("vec_id").as("probe_id"),
          col("embedding").as("pe"), col("nrm").as("pn"),
          col("emb16").as("pe16"), col("nrm16").as("pn16"))
        val c = e.select(col("vec_id").as("cand_id"), col("embedding").as("ce"),
          col("nrm").as("cn"), col("emb16").as("ce16"), col("nrm16").as("cn16"))
        val pairs = c.join(broadcast(p), col("cand_id") =!= col("probe_id"))
          .selectExpr("probe_id", "cand_id",
            s"${dot("pe", "ce")} / (pn * cn) as cf",
            s"${dot("pe16", "ce16")} / (pn16 * cn16) as ct")
          .persistScoped()
        Recall.perProbe(
          heapTopk(pairs.selectExpr("probe_id", "cand_id", "cf as cosine"), 3),
          heapTopk(pairs.selectExpr("probe_id", "cand_id", "ct as cosine"), 3),
          "probe_id", "cand_id", Some(3))
      },
      Some(s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding, $duckNorm AS nrm,
                                 embedding[1:16] AS emb16,
                                 sqrt(list_sum(list_transform(embedding[1:16],
                                   x -> CAST(x AS DOUBLE) * x))) AS nrm16
                          FROM embeddings),
               sc AS (SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
                             ${duckDot("p.embedding", "c.embedding")} / (p.nrm * c.nrm) AS cf,
                             ${duckDot("p.emb16", "c.emb16", 16)} / (p.nrm16 * c.nrm16) AS ct
                      FROM e p JOIN e c ON c.vec_id != p.vec_id
                      WHERE p.vec_id < 10),
               f3 AS (SELECT probe_id, cand_id FROM
                        (SELECT *, row_number() OVER (PARTITION BY probe_id
                           ORDER BY cf DESC, cand_id) AS rnk FROM sc)
                      WHERE rnk <= 3),
               t3 AS (SELECT probe_id, cand_id FROM
                        (SELECT *, row_number() OVER (PARTITION BY probe_id
                           ORDER BY ct DESC, cand_id) AS rnk FROM sc)
                      WHERE rnk <= 3)
               SELECT f.probe_id,
                      CAST(sum(CASE WHEN t.cand_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits,
                      (CAST(sum(CASE WHEN t.cand_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) * 10000) // 3 AS recall_bp
               FROM f3 f LEFT JOIN t3 t
                 ON t.probe_id = f.probe_id AND t.cand_id = f.cand_id
               GROUP BY f.probe_id""")),

    // ── s27: SCALAR-QUANTIZATION (int8) recall audit — the OTHER
    // standard compression dial next to s23's dimension truncation
    // and s12's product quantization: each vector rescales to 8-bit
    // codes by its own max-abs (q_i = floor(x_i·127/‖x‖∞) — floor,
    // not round, so no rounding-rule parity bet), and the audit
    // measures how much exact-top-3 recall the int8 ranking keeps.
    // The quantized score is an INTEGER dot product (exact in both
    // engines — no float fold anywhere in the approximate ranking's
    // numerator) over the same persisted broadcast probe scan that
    // feeds the exact ranking; both top-3s are bounded-heap
    // aggregates through the shared Recall harness. At scale the
    // int8 codes are 4× smaller than float32 — the memory-bandwidth
    // dial — and the scan shape is unchanged from s01. ──
    "s27_sq8_recall" -> Q(
      (s, d) => {
        Hashing.register(s)
        val qExpr = "transform(embedding, x -> " +
          "cast(floor(cast(x as double) * 127.0 / ma) as bigint))"
        val e = Tables(s, d, "embeddings")
          .repartition(s.sparkContext.defaultParallelism)
          .selectExpr("vec_id", "embedding", s"$normE as nrm",
            "array_max(transform(embedding, x -> abs(cast(x as double)))) as ma")
          .selectExpr("vec_id", "embedding", "nrm", s"$qExpr as q")
          .selectExpr("vec_id", "embedding", "nrm", "q",
            "sqrt(cast(dotl(q, q) as double)) as qn")
        val p = e.where("vec_id < 10").select(col("vec_id").as("probe_id"),
          col("embedding").as("pe"), col("nrm").as("pn"),
          col("q").as("pq"), col("qn").as("pqn"))
        val c = e.select(col("vec_id").as("cand_id"), col("embedding").as("ce"),
          col("nrm").as("cn"), col("q").as("cq"), col("qn").as("cqn"))
        val pairs = c.join(broadcast(p), col("cand_id") =!= col("probe_id"))
          .selectExpr("probe_id", "cand_id",
            s"${dot("pe", "ce")} / (pn * cn) as cf",
            "cast(dotl(pq, cq) as double) / (pqn * cqn) as ca")
          .persistScoped()
        Recall.perProbe(
          heapTopk(pairs.selectExpr("probe_id", "cand_id", "cf as cosine"), 3),
          heapTopk(pairs.selectExpr("probe_id", "cand_id", "ca as cosine"), 3),
          "probe_id", "cand_id", Some(3))
      },
      Some(s"""WITH e0 AS (SELECT vec_id, embedding, $duckNorm AS nrm,
                                  list_max(list_transform(embedding,
                                    x -> abs(CAST(x AS DOUBLE)))) AS ma
                           FROM embeddings),
               e AS (SELECT vec_id, embedding, nrm,
                            list_transform(embedding, x ->
                              CAST(floor(CAST(x AS DOUBLE) * 127.0 / ma) AS BIGINT)) AS q
                     FROM e0),
               eq AS (SELECT vec_id, embedding, nrm, q,
                             sqrt(CAST(list_sum(list_transform(q, x -> x * x)) AS DOUBLE)) AS qn
                      FROM e),
               sc AS (SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
                             ${duckDot("p.embedding", "c.embedding")} / (p.nrm * c.nrm) AS cf,
                             CAST(list_sum(list_transform(list_zip(p.q, c.q),
                                    z -> z[1] * z[2])) AS DOUBLE) / (p.qn * c.qn) AS ca
                      FROM eq p JOIN eq c ON c.vec_id != p.vec_id
                      WHERE p.vec_id < 10),
               f3 AS (SELECT probe_id, cand_id FROM
                        (SELECT *, row_number() OVER (PARTITION BY probe_id
                           ORDER BY cf DESC, cand_id) AS rnk FROM sc)
                      WHERE rnk <= 3),
               t3 AS (SELECT probe_id, cand_id FROM
                        (SELECT *, row_number() OVER (PARTITION BY probe_id
                           ORDER BY ca DESC, cand_id) AS rnk FROM sc)
                      WHERE rnk <= 3)
               SELECT f.probe_id,
                      CAST(sum(CASE WHEN t.cand_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits,
                      (CAST(sum(CASE WHEN t.cand_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) * 10000) // 3 AS recall_bp
               FROM f3 f LEFT JOIN t3 t
                 ON t.probe_id = f.probe_id AND t.cand_id = f.cand_id
               GROUP BY f.probe_id""")),

    // Scale shape: the shortlist is s01's bounded-heap top-k (k rows
    // per probe cross the exchange); candidate-candidate sims are an
    // equi-join on probe_id with m²=90 rows per probe; the greedy
    // loop itself runs as a codegen'd higher-order SQL aggregate over
    // the per-probe rels/sims arrays — collect_list is bounded by
    // m=10 (m² pairs), every array consumer is order-independent, and
    // NOTHING grows with the corpus after the shortlist stage. The
    // oracle unrolls the same greedy selection as chained argmax CTEs. ──
    "s17_mmr_rerank" -> Q(
      // pure plan construction end to end → prepared per (session,
      // dir); see graft.PlanMemo for what is (and is not) cached
      (s, d) => graft.PlanMemo.of(s, s"s17:$d") {
        Hashing.register(s)
        val e = Tables(s, d, "embeddings")
          .repartition(s.sparkContext.defaultParallelism)
          .selectExpr("vec_id", "embedding", s"$normE as nrm")
        // persisted: the bounded |probes|×10 shortlist (with its
        // embeddings) feeds the pair self-join twice and the rels
        // aggregate — without the cache the whole shortlist scoring
        // pass (a corpus scan) would re-execute per consumer
        val te = bruteTopk(s, d, 10).select("probe_id", "cand_id", "cosine")
          .join(e.select(col("vec_id").as("cand_id"), col("embedding"), col("nrm")), "cand_id")
          .persistScoped()
        val pairs = te.alias("x").join(te.alias("y"),
            expr("x.probe_id = y.probe_id and x.cand_id != y.cand_id"))
          .selectExpr("x.probe_id as probe_id", "x.cand_id as a", "y.cand_id as b",
            s"${dot("x.embedding", "y.embedding")} / (x.nrm * y.nrm) as sim")
        val rels = te.groupBy("probe_id")
          .agg(collect_list(struct(col("cand_id").as("cand"), col("cosine").as("rel"))).as("rels"))
        val sims = pairs.groupBy("probe_id")
          .agg(collect_list(struct(col("a"), col("b"), col("sim"))).as("sims"))
        val mmr =
          """aggregate(
               sequence(1, 5),
               cast(array() as array<struct<cand: bigint, rnk: int, score: double>>),
               (acc, step) -> concat(acc, transform(
                 array(array_max(transform(
                   filter(rels, r -> !exists(acc, s -> s.cand = r.cand)),
                   r -> struct(
                     (7 * r.rel - 3 * coalesce(array_max(transform(
                        filter(sims, p -> p.a = r.cand and exists(acc, s -> s.cand = p.b)),
                        p -> p.sim)), cast(0 as double))) / 10 as score,
                     -r.cand as negid,
                     r.cand as cand)))),
                 b -> struct(b.cand as cand, cast(step as int) as rnk, b.score as score))))"""
        rels.join(sims, "probe_id")
          .selectExpr("probe_id", s"explode($mmr) as sel")
          .selectExpr("probe_id", "sel.cand as cand_id", "sel.rnk as rnk", "sel.score as mmr_score")
      },
      Some(duckMmrSql),
      bench = true),

    // ── s21: HARD-NEGATIVE mining for contrastive training — per
    // probe, the top-5 most-similar candidates with a DIFFERENT
    // label (the pairs that actually move an embedding model: near
    // the anchor in vector space, on the wrong side of the label).
    // Same topology as s01 — 10-probe broadcast, linear corpus scan,
    // bounded-heap top-k so only k rows per probe cross the exchange
    // — with the label-mismatch predicate fused into the broadcast
    // join (evaluated before any dot product is computed, so
    // same-label candidates cost a comparison, not 8 multiplies).
    // At 1 B vectors the probe side is the training batch (10³-ish):
    // still a broadcast, still one scan per batch. ──
    "s21_hard_negatives" -> Q(
      (s, d) => {
        Hashing.register(s)
        val e = Tables(s, d, "embeddings")
          .repartition(s.sparkContext.defaultParallelism)
          .selectExpr("vec_id", "embedding", s"$normE as nrm", "label")
        val p = e.where("vec_id < 10")
          .select(col("vec_id").as("probe_id"), col("embedding").as("pe"),
            col("nrm").as("pn"), col("label").as("pl"))
        val scored = e.select(col("vec_id").as("cand_id"), col("embedding").as("ce"),
            col("nrm").as("cn"), col("label").as("cl"))
          .join(broadcast(p),
            col("cand_id") =!= col("probe_id") && col("cl") =!= col("pl"))
          .selectExpr("probe_id", "cand_id", s"${dot("pe", "ce")} / (pn * cn) as cosine")
        heapTopk(scored, 5)
      },
      Some(s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding, $duckNorm AS nrm, label FROM embeddings),
               sc AS (SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
                             ${duckDot("p.embedding", "c.embedding")} / (p.nrm * c.nrm) AS cosine
                      FROM e p JOIN e c ON c.vec_id != p.vec_id AND c.label != p.label
                      WHERE p.vec_id < 10)
               SELECT probe_id, cand_id, rnk, cosine FROM
                 (SELECT *, CAST(row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, cand_id) AS INTEGER) AS rnk
                  FROM sc)
               WHERE rnk <= 5""")),

    // ── s24: IVF index HEALTH audit — the occupancy report every ANN
    // ops runbook reads before deciding to retrain: per-cell vector
    // count against the ideal n/k load, in integer basis points, with
    // empty cells reported explicitly (an empty or hot cell is the
    // rebalance/retrain trigger; FAISS calls this the imbalance
    // factor). Completes the index lifecycle tier: build (s16) →
    // serve (s13) → delete (s19) → insert (s22) → AUDIT (s24).
    // Scale shape: assignment is the shared map-only argmax against
    // the literal trained centroids (zero exchanges), the occupancy
    // is one cell-keyed partial agg to ≤k rows, and the scalar total
    // attaches via the audited crossJoin(broadcast(count)) shape —
    // the audit costs one corpus pass at any index size. Oracle
    // replays the identical trained quantizer CTE-for-CTE. ──
    "s24_cell_health" -> Q(
      (s, d) => {
        Hashing.register(s)
        val e = Tables(s, d, "embeddings")
          .repartition(s.sparkContext.defaultParallelism)
          .selectExpr("vec_id", "embedding", s"$normE as nrm").persistScoped()
        val occ = ivfAssign(e, lloydCents(e, ivfSeeds(e), ivfIters))
          .groupBy("cell").agg(count(lit(1)).as("n_vecs"))
        val tot = e.agg(count(lit(1)).as("n_total"))
        s.range(16).selectExpr("id as cell")
          .join(broadcast(occ), Seq("cell"), "left")
          .selectExpr("cell", "coalesce(n_vecs, 0L) as n_vecs")
          .crossJoin(broadcast(tot))
          .selectExpr("cell", "n_vecs",
            "n_vecs * 16 * 10000 div n_total as load_bp",
            "n_vecs * 16 * 10000 div n_total >= 20000 as hot")
      },
      Some(s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding, $duckNorm AS nrm FROM embeddings),
               ${duckTrainedCent(ivfIters)},
               $duckIvfAsg,
               occ AS (SELECT cell, count(*) AS n_vecs FROM asg GROUP BY cell),
               tot AS (SELECT count(*) AS n_total FROM e),
               cells AS (SELECT unnest(generate_series(0, 15)) AS cell)
               SELECT CAST(cells.cell AS BIGINT) AS cell,
                      CAST(coalesce(n_vecs, 0) AS BIGINT) AS n_vecs,
                      CAST(coalesce(n_vecs, 0) * 16 * 10000 // n_total AS BIGINT) AS load_bp,
                      coalesce(n_vecs, 0) * 16 * 10000 // n_total >= 20000 AS hot
               FROM cells LEFT JOIN occ ON occ.cell = cells.cell CROSS JOIN tot""")),

    // ── s25: index COMPACTION — the maintenance pass that closes
    // s19's delete story: tombstones are cheap at delete time
    // precisely because they defer work, and this is the deferred
    // work — [[compactIndex]] rewrites ONLY the cell partitions
    // containing a tombstoned id (postings + refine sidecar),
    // leaves every other cell's files byte-untouched (spec-pinned),
    // and the index then serves with NO tombstone anti-join in the
    // request path. Same tombstone set and oracle as s19: the gate
    // proves compacted-serve ≡ tombstone-filtered-serve bit-for-bit
    // — compaction changes the cost model, never the answer. At 1 B
    // vectors: quantizer heads untouched, rewrite bounded by
    // affected partitions, the nightly maintenance job next to
    // s22's insert. ──
    "s25_index_compact" -> Q(
      (s, d) => {
        Hashing.register(s)
        val e = Tables(s, d, "embeddings")
          .repartition(s.sparkContext.defaultParallelism)
          .selectExpr("vec_id", "embedding", s"$normE as nrm").persistScoped()
        ivfPqBuild(s, e)
        compactIndex(s, e.selectExpr("vec_id as cand_id")
          .where(s"${Hashing.h32Sql("concat('del:', cand_id)")} % 10 = 0"))
        ivfPqServe(s, e.where("vec_id < 10"))
      },
      Some(s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding, $duckNorm AS nrm FROM embeddings),
               ${duckIvfPqCoreWhere(
                 s"NOT (${Hashing.duck32("'del:' || a.vec_id")} % 10 = 0)")}
               SELECT probe_id, cand_id, rnk, cosine FROM ann""")),

    // ── s26: CONTRASTIVE TRIPLET mining — the query that produces
    // actual training data from the similarity tier: per anchor, the
    // nearest SAME-label neighbor (the positive) and the nearest
    // CROSS-label neighbor (the hard negative, s21's top-1), plus
    // whether the pair is margin-consistent (pos_cos > neg_cos —
    // anchors violating it are the hard examples a contrastive run
    // upweights). One corpus scan scores every candidate against the
    // broadcast anchors; the label predicate splits the stream and
    // two bounded heaps keep ONE row per anchor per side — k rows
    // cross the exchange map-side, never a per-anchor sort. The
    // margin flag is a join of two 1-row-per-anchor frames. ──
    "s26_contrastive_triplets" -> Q(
      (s, d) => {
        Hashing.register(s)
        val e = Tables(s, d, "embeddings")
          .repartition(s.sparkContext.defaultParallelism)
          .selectExpr("vec_id", "embedding", s"$normE as nrm", "label")
        val p = e.where("vec_id < 10")
          .select(col("vec_id").as("probe_id"), col("embedding").as("pe"),
            col("nrm").as("pn"), col("label").as("pl"))
        val scored = e.select(col("vec_id").as("cand_id"), col("embedding").as("ce"),
            col("nrm").as("cn"), col("label").as("cl"))
          .join(broadcast(p), col("cand_id") =!= col("probe_id"))
          .selectExpr("probe_id", "cand_id", "cl = pl as same_label",
            s"${dot("pe", "ce")} / (pn * cn) as cosine")
          .persistScoped()
        val pos = heapTopk(scored.where("same_label"), 1)
          .selectExpr("probe_id", "cand_id as pos_id", "cosine as pos_cos")
        val neg = heapTopk(scored.where("not same_label"), 1)
          .selectExpr("probe_id", "cand_id as neg_id", "cosine as neg_cos")
        pos.join(neg, "probe_id")
          .selectExpr("probe_id as anchor_id", "pos_id", "neg_id",
            "pos_cos", "neg_cos", "pos_cos > neg_cos as margin_ok")
      },
      Some(s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding, $duckNorm AS nrm, label FROM embeddings),
               sc AS (SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
                             c.label = p.label AS same_label,
                             ${duckDot("p.embedding", "c.embedding")} / (p.nrm * c.nrm) AS cosine
                      FROM e p JOIN e c ON c.vec_id != p.vec_id
                      WHERE p.vec_id < 10),
               pos AS (SELECT probe_id, cand_id AS pos_id, cosine AS pos_cos FROM
                         (SELECT *, row_number() OVER (PARTITION BY probe_id
                            ORDER BY cosine DESC, cand_id) AS rn
                          FROM sc WHERE same_label) WHERE rn = 1),
               neg AS (SELECT probe_id, cand_id AS neg_id, cosine AS neg_cos FROM
                         (SELECT *, row_number() OVER (PARTITION BY probe_id
                            ORDER BY cosine DESC, cand_id) AS rn
                          FROM sc WHERE NOT same_label) WHERE rn = 1)
               SELECT pos.probe_id AS anchor_id, pos_id, neg_id,
                      pos_cos, neg_cos, pos_cos > neg_cos AS margin_ok
               FROM pos JOIN neg ON neg.probe_id = pos.probe_id""")),

    // ── c10: SEMANTIC decontamination — the fourth member of the
    // decontamination quartet (c02 exact n-gram, c04 bloom-prefilter,
    // c07 near-dup LSH): training vectors whose embedding cosine
    // against ANY eval-set vector clears the threshold are flagged
    // with their hit count and worst offender score — the check that
    // catches PARAPHRASED eval leakage no lexical matcher can see
    // (Yang et al. 2023, "Rethinking Benchmark and Contamination").
    // Threshold 0.38 is calibrated to this synthetic corpus (max
    // cross-split cosine ≈0.44; real deployments use ~0.95 on real
    // embeddings — the knob, not the machinery). Scale shape: the
    // eval set is small by definition → broadcast nested-loop against
    // it, map-side only (no exchange before the flag filter), cosines
    // via the codegen'd dotf/vnorm kernels, and only flagged rows
    // (≪ corpus) reach the final vec-keyed agg. ──
    "c10_semantic_decontaminate" -> Q(
      (s, d) => {
        Hashing.register(s)
        val e = Tables(s, d, "embeddings")
          .selectExpr("vec_id", "embedding", s"$normE as nrm")
        val ev = e.where("vec_id % 101 = 0")
          .selectExpr("vec_id as ev_id", "embedding as ev_emb", "nrm as ev_nrm")
        e.where("vec_id % 101 != 0")
          .repartition(s.sparkContext.defaultParallelism)
          .crossJoin(broadcast(ev))
          .selectExpr("vec_id",
            s"${dot("embedding", "ev_emb")} / (nrm * ev_nrm) as cosine")
          .where("cosine >= 0.38")
          .groupBy("vec_id")
          .agg(count(lit(1)).as("n_eval_hits"), max("cosine").as("max_cosine"))
      },
      Some(s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding, $duckNorm AS nrm
                          FROM embeddings),
               ev AS (SELECT vec_id AS ev_id, embedding AS ev_emb, nrm AS ev_nrm
                      FROM e WHERE vec_id % 101 = 0),
               sc AS (SELECT t.vec_id,
                             ${duckDot("t.embedding", "ev_emb")} / (t.nrm * ev_nrm) AS cosine
                      FROM e t CROSS JOIN ev WHERE t.vec_id % 101 != 0)
               SELECT vec_id, count(*) AS n_eval_hits, max(cosine) AS max_cosine
               FROM sc WHERE cosine >= 0.38 GROUP BY 1""")),

    // ── s29: HYBRID RETRIEVAL via Reciprocal-Rank Fusion — the
    // modern RAG / curation shape: one query (document 0, query-by-
    // example), TWO independent rankers — BM25 over its distinct
    // tokens (t08's exact formula) and embedding cosine against its
    // vector — fused by RRF: score = Σ 1/(60 + rank), top-20
    // (Cormack et al., SIGIR'09). Scale shape: each arm ends in a
    // TakeOrderedAndProject top-50 (never a global sort of the
    // corpus); the fusion full-outer join, rank windows, and final
    // top-20 all run on the bounded ≤100-row shortlist union.
    // Cross-engine determinism: lexical scores are floor-scaled to
    // exact BIGINT basis points BEFORE the per-doc sum (a double sum
    // over terms would be aggregation-order-sensitive); cosines are
    // bit-identical by this module's sequential-fold contract; the
    // RRF double is a fixed two-term sum of 1/(60+rank) with ranks
    // exact — so %.6f strings and rank order agree exactly. ──
    "s29_hybrid_rrf" -> Q(
      (s, d) => lexTop50(s, d).join(vecTop50(s, d), Seq("doc_id"), "full_outer")
          // cast(1.0 as double): DuckDB parses a bare 1.0 as DECIMAL
          // and would divide in decimal arithmetic — the explicit
          // cast (same text both engines) pins the division to
          // IEEE double everywhere
          .selectExpr("doc_id", "lex_rnk", "vec_rnk",
            "coalesce(cast(1.0 as double)/(60 + lex_rnk), cast(0.0 as double))" +
              " + coalesce(cast(1.0 as double)/(60 + vec_rnk), cast(0.0 as double)) as rrf")
          .withColumn("fused_rnk", row_number().over(
            Window.orderBy(col("rrf").desc, col("doc_id"))))
          .where("fused_rnk <= 20")
          .selectExpr("doc_id", "lex_rnk", "vec_rnk", "fused_rnk",
            "format_string('%.6f', rrf) as rrf"),
      Some(s"""WITH $duckLexTop,
               $duckVecTop,
               f AS (SELECT doc_id, lex_rnk, vec_rnk,
                            coalesce(cast(1.0 as double)/(60 + lex_rnk), cast(0.0 as double))
                              + coalesce(cast(1.0 as double)/(60 + vec_rnk), cast(0.0 as double)) AS rrf
                     FROM lt FULL JOIN vt USING (doc_id))
               SELECT doc_id, lex_rnk, vec_rnk, fused_rnk, printf('%.6f', rrf) AS rrf FROM
                 (SELECT *, CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS INTEGER) AS fused_rnk
                  FROM f)
               WHERE fused_rnk <= 20""")),

    // ── s30: RANKING AGREEMENT — Kendall's τ between s29's two arms
    // over their common shortlist (the retrieval-eval diagnostic:
    // "do lexical and semantic search even agree on this corpus?" —
    // low τ is the empirical justification for running hybrid fusion
    // at all, high τ means one arm is redundant). Ranks are distinct
    // integers (row_number), so plain τ = (C − D) / (n(n−1)/2) with
    // no tie correction; reported in exact integer basis points.
    // Scale shape: both arms are corpus-pruned top-50s, so the
    // concordance self-join is a broadcast over a ≤50-row frame —
    // ≤1225 pairs at ANY corpus size; nothing corpus-sized reaches
    // the pair stage. ──
    "s30_rank_tau" -> Q(
      (s, d) => {
        val both = lexTop50(s, d).join(vecTop50(s, d), "doc_id").persistScoped()
        val a = both.selectExpr("doc_id as a_id", "lex_rnk as a_l", "vec_rnk as a_v")
        val b = both.selectExpr("doc_id as b_id", "lex_rnk as b_l", "vec_rnk as b_v")
        a.join(broadcast(b), col("a_id") < col("b_id"))
          .selectExpr(
            "case when (a_l - b_l) * (a_v - b_v) > 0 then 1L else 0L end as c",
            "case when (a_l - b_l) * (a_v - b_v) < 0 then 1L else 0L end as dd")
          .agg(count(lit(1)).as("n_pairs"), sum("c").as("concordant"),
            sum("dd").as("discordant"))
          // τ may be negative; engines disagree on how integral
          // division rounds negative numerators, so compute it as a
          // difference of two NON-NEGATIVE divisions — well-defined
          // and identical everywhere
          .selectExpr("n_pairs", "concordant", "discordant",
            "case when n_pairs > 0 then concordant * 10000 div n_pairs" +
              " - discordant * 10000 div n_pairs end as tau_bp")
      },
      Some(s"""WITH $duckLexTop,
               $duckVecTop,
               both_t AS (SELECT lt.doc_id, lex_rnk, vec_rnk FROM lt JOIN vt USING (doc_id)),
               pr AS (SELECT CASE WHEN (a.lex_rnk - b.lex_rnk) * (a.vec_rnk - b.vec_rnk) > 0
                                  THEN 1 ELSE 0 END AS c,
                             CASE WHEN (a.lex_rnk - b.lex_rnk) * (a.vec_rnk - b.vec_rnk) < 0
                                  THEN 1 ELSE 0 END AS dd
                      FROM both_t a JOIN both_t b ON a.doc_id < b.doc_id)
               SELECT CAST(count(*) AS BIGINT) AS n_pairs,
                      CAST(sum(c) AS BIGINT) AS concordant,
                      CAST(sum(dd) AS BIGINT) AS discordant,
                      CASE WHEN count(*) > 0
                           THEN CAST(sum(c) * 10000 // count(*)
                                  - sum(dd) * 10000 // count(*) AS BIGINT) END AS tau_bp
               FROM pr"""))
  )

}
