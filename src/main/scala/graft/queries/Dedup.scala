package graft.queries

import graft.CacheScope.PersistScopedOps
import graft.{Q, Tables}
import graft.functions.Hashing
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` — the LLM-pipeline tier:
  * exact dup (hash groupBy), MinHash signatures, MinHash+LSH banded
  * near-dup pairs, SimHash, and char-n-gram Jaccard near-dup.
  *
  * Design for 100 TB (the reference's DuckDB tier has no equivalent;
  * capability mandated by the driver north star):
  *   - Exact dedup is a single hash-aggregate: partial agg map-side,
  *     one shuffle on md5(text).
  *   - Near-dup NEVER does an all-pairs join. Candidates come from an
  *     equi-join on (band, bucket) — the classic MinHash-LSH banding —
  *     so the shuffle is keyed by bucket and each bucket's fan-out is
  *     |bucket|², not |table|². Skewed buckets (a shingle shared by
  *     millions of docs) are handled by AQE skew-join splitting.
  *   - Verification (exact Jaccard) runs only on candidate pairs.
  *   - All hashing is md5-derived ([[Hashing.h32]]) so the DuckDB
  *     oracle mirrors bit-for-bit; everything stays in whole-stage
  *     codegen (builtin higher-order functions, no UDFs).
  *
  * Testdata note: sf0.01 has 25 planted near-dup pairs (all word-level
  * 3-gram Jaccard ≥ 0.9); 16-perm/4-band MinHash-LSH recovers 25/25.
  */
object Dedup {

  import DedupKernels._

  import DedupKernels._

  lazy val all: Map[String, Q] =
    entries + DedupKernels.bbitEntry + DedupKernels.cdcEntry

  private lazy val entries: Map[String, Q] = Map(
    // ── exact duplicate groups: one hash-aggregate over md5(text) ──
    "d01_exact_dup" -> Q(
      (s, d) => Tables(s, d, "documents")
        .groupBy(md5(col("text")).as("h"))
        .agg(count(lit(1)).as("n_docs"), min("doc_id").as("canon")),
      Some("""SELECT md5(text) AS h, count(*) AS n_docs, min(doc_id) AS canon
              FROM documents GROUP BY 1""")),

    // ── 16-perm MinHash signature per document ──
    // Gate output is the comma-joined signature string: the driver's
    // pandas fingerprint cannot hash array cells (r03 harness error),
    // and the join is lossless for int64 values in both engines.
    "d02_minhash_sigs" -> Q(
      (s, d) => hashedDocs(s, d)
        .selectExpr("doc_id",
          "array_join(transform(affine_minhash(hv, 16), x -> cast(x as string)), ',') as sig"),
      Some(s"""$duckShingles
               SELECT doc_id, array_to_string(${duckSig(16)}, ',') AS sig FROM hs""")),

    // ── MinHash-LSH near-dup pairs: band → bucket join → Jaccard verify ──
    "d03_lsh_pairs" -> Q((s, d) => lshPairs(s, d), Some(d03Oracle),
      bench = true),

    // ── MinHash MERGEABILITY: sig(A ∪ B) = elementwise min(sig(A),
    // sig(B)) — the algebra that makes MinHash an incrementally
    // maintainable index sketch (a new shard's signatures fold into
    // the corpus sketch with a min; nothing is ever recomputed over
    // the union). The ENGINE side computes each source's signature
    // through the MERGE path only — per-doc 16-value sigs, then a
    // (source, perm)-keyed min aggregate; the source's pooled shingle
    // set is never materialized (at 100 TB a source's union is
    // unbounded, per-doc sigs are 16 int64s). The ORACLE rebuilds
    // every source signature FROM SCRATCH over the pooled distinct
    // shingle hashes — so the gate's hash compare IS the proof that
    // merge ≡ rebuild, permutation by permutation. ──
    "d15_sig_merge" -> Q(
      (s, d) => {
        val src = Tables(s, d, "documents").select("doc_id", "source")
        hashedDocs(s, d).join(src, "doc_id")
          .selectExpr("source", "posexplode(affine_minhash(hv, 16)) as (perm, v)")
          .groupBy("source", "perm").agg(min("v").as("v"))
      },
      Some {
        val a = duckLits(graft.functions.MinHash.coefA(16).toSeq)
        val b = duckLits(graft.functions.MinHash.coefB(16).toSeq)
        s"""$duckShingles,
            src AS (SELECT doc_id, source FROM documents),
            pool AS (SELECT DISTINCT source, unnest(hv) AS h
                     FROM hs JOIN src USING (doc_id))
            SELECT source, CAST(j AS INTEGER) AS perm,
                   min(($a[j+1] * h + $b[j+1]) % $P) AS v
            FROM pool, (SELECT unnest(generate_series(0, 15)) AS j)
            GROUP BY 1, 2"""
      }),

    // ── NEAR-dup decontamination: eval-set leakage removal by
    // MinHash-LSH — the complement of c02/c04's exact 13-gram
    // overlap. Exact n-grams miss paraphrased/reformatted eval
    // leakage; here every TRAIN doc that is a verified near-dup
    // (Jaccard ≥ 0.7 on word-3-gram shingles) of ANY eval doc is
    // flagged. The candidate join is train-buckets × eval-buckets on
    // (band, bucket) — bounded by the EVAL side (10% split here; a
    // benchmark suite in production), never train×train — and the
    // shared eval split predicate is c02's, so the two
    // decontamination tiers compose on the same split. Output keeps
    // every train doc (leaked, n_eval_matches, best_eval_match) so
    // downstream filters compose. ──
    "c07_neardup_decontaminate" -> Q(
      (s, d) => {
        val (hs, bk) = lshFrames(s, d)
        val evalPred = graft.queries.PipelineKernels.evalPredSql
        val evalIds = Tables(s, d, "documents")
          .where(evalPred).select("doc_id").persistScoped()
        val cand = bk.join(evalIds, Seq("doc_id"), "left_anti")
          .select(col("doc_id").as("td"), col("band"), col("bucket"))
          .join(bk.join(evalIds, Seq("doc_id"), "left_semi")
            .select(col("doc_id").as("ed"), col("band").as("b2"), col("bucket").as("k2")),
            col("band") === col("b2") && col("bucket") === col("k2"))
          .select("td", "ed").distinct()
        val matches = cand
          .join(hs.select(col("doc_id").as("td"), col("hv").as("hv1")), "td")
          .join(hs.select(col("doc_id").as("ed"), col("hv").as("hv2")), "ed")
          .selectExpr("td", "ed", jaccardExpr)
          .where("jac >= 0.7")
          .groupBy("td")
          .agg(count(lit(1)).as("n_eval_matches"), min("ed").as("best_eval_match"))
          .withColumnRenamed("td", "doc_id")
        Tables(s, d, "documents").where(s"not ($evalPred)").select("doc_id")
          .join(matches, Seq("doc_id"), "left")
          .selectExpr("doc_id",
            "coalesce(n_eval_matches, cast(0 as bigint)) > 0 as leaked",
            "coalesce(n_eval_matches, cast(0 as bigint)) as n_eval_matches",
            "coalesce(best_eval_match, cast(-1 as bigint)) as best_eval_match")
      },
      Some {
        val ev = s"(${Hashing.duck32("'split:' || ('eval:' || doc_id)")} % 100 < 10)"
        s"""$duckShingles,
            csig AS (SELECT doc_id, ${duckSig(16)} AS sig FROM hs),
            cb AS (SELECT doc_id, unnest(generate_series(0, 3)) AS band, sig FROM csig),
            cbk AS MATERIALIZED (SELECT doc_id, band,
                      ${Hashing.duck32("band || ':' || array_to_string(sig[band*4+1:band*4+4], ',')")} AS bucket
                    FROM cb),
            ev AS MATERIALIZED (SELECT doc_id FROM documents WHERE $ev),
            cand AS (SELECT DISTINCT t.doc_id AS td, e.doc_id AS ed
                     FROM cbk t JOIN cbk e ON t.band = e.band AND t.bucket = e.bucket
                     JOIN ev ON ev.doc_id = e.doc_id
                     WHERE t.doc_id NOT IN (SELECT doc_id FROM ev)),
            ver AS (SELECT td, ed FROM
                      (SELECT td, ed,
                              CAST(len(list_intersect(x.hv, y.hv)) AS DOUBLE)
                                / len(list_distinct(x.hv || y.hv)) AS jac
                       FROM cand JOIN hs x ON x.doc_id = td JOIN hs y ON y.doc_id = ed)
                    WHERE jac >= 0.7),
            agg AS (SELECT td, count(*) AS n_eval_matches, min(ed) AS best_eval_match
                    FROM ver GROUP BY td)
            SELECT d.doc_id, COALESCE(a.n_eval_matches, 0) > 0 AS leaked,
                   COALESCE(a.n_eval_matches, 0) AS n_eval_matches,
                   COALESCE(a.best_eval_match, -1) AS best_eval_match
            FROM documents d LEFT JOIN agg a ON a.td = d.doc_id
            WHERE NOT $ev"""
      }),

    // ── incremental shard-vs-corpus NEAR-dup: d14's sibling for the
    // edited-revision case. d14's exact fingerprints catch only
    // verbatim re-crawls; here each shard doc probes the corpus's
    // MAINTAINED MinHash-LSH index — the (band, bucket) table d03
    // already builds, which at 100 TB is a persisted artifact like
    // stream12's bloom, updated per shard, never rebuilt — and every
    // bucket-sharing candidate is exact-Jaccard-verified at ≥ 0.7.
    // The probe is an equi-join of the SHARD's buckets (20% of a
    // shard's docs × 4 bands) against the index, so the scan is
    // bounded by the shard, not the corpus, and there is no
    // corpus-vs-corpus self-join at all. Output keeps every shard
    // doc: n_matches = verified near-dup sources in the corpus
    // (0 for genuinely new content AND for sub-shingle shorts),
    // best_match = smallest matching corpus id, −1 if none. ──
    "d16_shard_neardup" -> Q(
      (s, d) => {
        val (chs, cbk) = lshFrames(s, d) // the maintained corpus index
        val shard = shardDocs(Tables(s, d, "documents")).persistScoped()
        val shs = hashedDocsOf(
          shard.repartition(s.sparkContext.defaultParallelism)).persistScoped()
        val cand = bandBuckets(shs)
          .select(col("doc_id").as("sd"), col("band"), col("bucket"))
          .join(cbk.select(col("doc_id").as("cd"), col("band").as("b2"), col("bucket").as("k2")),
            col("band") === col("b2") && col("bucket") === col("k2"))
          .select("sd", "cd").distinct()
        val matches = cand
          .join(shs.select(col("doc_id").as("sd"), col("hv").as("hv1")), "sd")
          .join(chs.select(col("doc_id").as("cd"), col("hv").as("hv2")), "cd")
          .selectExpr("sd", "cd", jaccardExpr)
          .where("jac >= 0.7")
          .groupBy("sd")
          .agg(count(lit(1)).as("n_matches"), min("cd").as("best_match"))
          .withColumnRenamed("sd", "doc_id")
        shard.select("doc_id")
          .join(matches, Seq("doc_id"), "left")
          .selectExpr("doc_id",
            "coalesce(n_matches, cast(0 as bigint)) as n_matches",
            "coalesce(best_match, cast(-1 as bigint)) as best_match")
      },
      Some {
        val pct = s"${Hashing.duck32("'shard:' || doc_id")} % 100"
        s"""$duckShingles,
            csig AS (SELECT doc_id, ${duckSig(16)} AS sig FROM hs),
            cb AS (SELECT doc_id, unnest(generate_series(0, 3)) AS band, sig FROM csig),
            cbk AS MATERIALIZED (SELECT doc_id, band,
                      ${Hashing.duck32("band || ':' || array_to_string(sig[band*4+1:band*4+4], ',')")} AS bucket
                    FROM cb),
            sdoc AS MATERIALIZED (SELECT doc_id + 1000000 AS doc_id,
                            CASE WHEN $pct < 10 THEN text ELSE text || ' v2' END AS text
                     FROM documents WHERE $pct < 20),
            st AS (SELECT doc_id, string_split(text,' ') AS t FROM sdoc
                   WHERE len(string_split(text,' ')) >= 3),
            ssh AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, len(t)-2),
                      i -> array_to_string(t[i:i+2], ' '))) AS sh FROM st),
            shs AS MATERIALIZED (SELECT doc_id, list_transform(sh,
                      s -> (('0x' || substr(md5(s), 1, 8))::BIGINT) % 2147483647) AS hv FROM ssh),
            ssig AS (SELECT doc_id, ${duckSig(16)} AS sig FROM shs),
            sb AS (SELECT doc_id, unnest(generate_series(0, 3)) AS band, sig FROM ssig),
            sbk AS (SELECT doc_id, band,
                      ${Hashing.duck32("band || ':' || array_to_string(sig[band*4+1:band*4+4], ',')")} AS bucket
                    FROM sb),
            cand AS (SELECT DISTINCT s.doc_id AS sdid, c.doc_id AS cd
                     FROM sbk s JOIN cbk c ON s.band = c.band AND s.bucket = c.bucket),
            ver AS (SELECT sdid, cd FROM
                      (SELECT sdid, cd,
                              CAST(len(list_intersect(x.hv, y.hv)) AS DOUBLE)
                                / len(list_distinct(x.hv || y.hv)) AS jac
                       FROM cand JOIN shs x ON x.doc_id = sdid JOIN hs y ON y.doc_id = cd)
                    WHERE jac >= 0.7),
            agg AS (SELECT sdid, count(*) AS n_matches, min(cd) AS best_match
                    FROM ver GROUP BY sdid)
            SELECT s.doc_id, COALESCE(a.n_matches, 0) AS n_matches,
                   COALESCE(a.best_match, -1) AS best_match
            FROM sdoc s LEFT JOIN agg a ON a.sdid = s.doc_id"""
      }),

    // ── MinHash Jaccard ESTIMATOR audit: for every LSH candidate
    // pair, the signature-agreement estimate (matching perms / 16)
    // against the exact verified Jaccard, with the signed error — the
    // measurement that tells a pipeline when it can SKIP the exact
    // verification join entirely and trust the k-perm estimate (at
    // 100 TB the verify join reads both shingle sets per candidate;
    // the estimator reads only 2×16 longs already shuffled for
    // banding). All-integer basis points; candidates and signatures
    // ride the same persisted lshFrames caches as d03. ──
    "d13_jaccard_estimate" -> Q(
      (s, d) => {
        val (hs, bk) = lshFrames(s, d)
        val sigs = hs.selectExpr("doc_id", "affine_minhash(hv, 16) as sig")
        scoredCandidates(hs, bk,
            "cast(size(array_intersect(hv1, hv2)) * 10000 as bigint) div size(array_union(hv1, hv2)) as jac_bp")
          .join(sigs.selectExpr("doc_id as d1", "sig as g1"), "d1")
          .join(sigs.selectExpr("doc_id as d2", "sig as g2"), "d2")
          .selectExpr("d1", "d2", "jac_bp",
            "cast(aggregate(sequence(0, 15), 0, (acc, j) -> acc + if(g1[j] = g2[j], 1, 0)) * 10000 as bigint) div 16 as est_bp")
          .selectExpr("d1", "d2", "jac_bp", "est_bp", "est_bp - jac_bp as err_bp")
      },
      Some(s"""$duckShingles,
               sigs AS MATERIALIZED (SELECT doc_id, ${duckSig(16)} AS sig FROM hs),
               b AS (SELECT doc_id, unnest(generate_series(0, 3)) AS band, sig FROM sigs),
               bk AS MATERIALIZED (SELECT doc_id, band,
                        ${Hashing.duck32("band || ':' || array_to_string(sig[band*4+1:band*4+4], ',')")} AS bucket
                      FROM b),
               cand AS (SELECT DISTINCT a.doc_id AS d1, c.doc_id AS d2
                        FROM bk a JOIN bk c
                        ON a.band = c.band AND a.bucket = c.bucket AND a.doc_id < c.doc_id),
               scored AS (SELECT d1, d2,
                                 (CAST(len(list_intersect(x.hv, y.hv)) * 10000 AS BIGINT))
                                   // len(list_distinct(x.hv || y.hv)) AS jac_bp,
                                 (CAST(len(list_filter(generate_series(1, 16),
                                    j -> sx.sig[j] = sy.sig[j])) * 10000 AS BIGINT)) // 16 AS est_bp
                          FROM cand JOIN hs x ON x.doc_id = d1
                                    JOIN hs y ON y.doc_id = d2
                                    JOIN sigs sx ON sx.doc_id = d1
                                    JOIN sigs sy ON sy.doc_id = d2)
               SELECT d1, d2, jac_bp, est_bp, est_bp - jac_bp AS err_bp FROM scored""")),

    // ── incremental shard-vs-corpus dedup: the topology a GROWING
    // corpus needs — a new crawl shard checked against the existing
    // corpus WITHOUT re-deduping the corpus against itself. The gate
    // shard simulates a re-crawl: 20% of docs (deterministic hash
    // split) re-fetched under new ids, half verbatim (the unchanged
    // pages an incremental crawler must drop) and half content-edited
    // (the genuinely new revisions it must keep). This is c04's bloom
    // shape inverted: there the small eval side is sketched and the
    // big corpus probes it; here the BIG side is folded into the
    // constant-size mergeable bloom (one partial-agg'd binary
    // regardless of corpus size) and the small increment probes it
    // map-side. Survivors of the ≈fpp prefilter are exact-verified
    // by a fingerprint-only semi join — 16-byte md5s cross the
    // exchange, never text — so the answer equals the exact anti-join
    // bit-for-bit and the oracle is the plain LEFT JOIN. At 100 TB the
    // corpus fingerprint table is a maintained index artifact (the s16
    // pattern), not a per-run scan; the per-shard cost is then
    // O(|shard|) probe + O(survivors) join. ──
    "d14_shard_dedup" -> Q(
      (s, d) => {
        Hashing.register(s)
        val docs = Tables(s, d, "documents")
        val shard = shardFps(docs)
        val corpus = corpusFps(docs)
        // One bounded row to the driver (the sketch itself), probed as
        // a codegen'd Literal — the c04 pattern.
        val bloomRow = corpus
          .agg(expr(s"bloom_agg(fp, $bloomItems, $bloomBits)").as("bf"))
          .head()
        val mightHit: org.apache.spark.sql.Column =
          if (bloomRow.isNullAt(0)) lit(false) // empty corpus: everything is new
          else bloomMight(bloomRow.getAs[Array[Byte]](0), col("fp"))
        val seen = shard.where(mightHit)
          .join(corpus, Seq("fp"), "left_semi")
          .select("doc_id").withColumn("seen", lit(true))
        shard.select("doc_id")
          .join(seen, Seq("doc_id"), "left")
          .selectExpr("doc_id", "coalesce(seen, false) as seen")
      },
      Some(d14Oracle)),

    // ── near-dup CLUSTERS: connected components over the d03 pair
    // graph by min-label propagation — the step a dedup pipeline
    // actually keeps (pick min doc_id per component as canonical,
    // drop the rest). Oracle computes the same components via a
    // recursive transitive closure over the same pairs. ──
    "d08_dup_clusters" -> Q(
      (s, d) => connectedComponents(
        lshPairs(s, d).select(col("d1").as("a"), col("d2").as("b"))),
      Some(s"""$duckClusters
               SELECT doc_id, cluster FROM cl""")),

    // ── capped-bucket LSH pairs: the 100 TB skew path ──
    // Identical to d03 except buckets with more than CAP members are
    // dropped before the self-join. A near-universal bucket (a shingle
    // set shared by millions of docs — boilerplate, templates) emits
    // |bucket|² candidate pairs; capping bounds every bucket's fan-out
    // at CAP² and turns the worst-case quadratic blowup into a tunable
    // constant, at the cost of recall inside mega-clusters (their
    // members are usually exact dups, which d01 already catches).
    "d07_capped_lsh" -> Q(
      (s, d) => {
        val (hs, bk) = lshFrames(s, d)
        scoredCandidates(hs, bk, jaccardExpr, cap = Some(8))
          .where("jac >= 0.7")
          .select("d1", "d2", "jac")
      },
      Some(s"""$duckShingles,
               sigs AS MATERIALIZED (SELECT doc_id, ${duckSig(16)} AS sig FROM hs),
               b AS (SELECT doc_id, unnest(generate_series(0, 3)) AS band, sig FROM sigs),
               bk AS MATERIALIZED (SELECT doc_id, band,
                        ${Hashing.duck32("band || ':' || array_to_string(sig[band*4+1:band*4+4], ',')")} AS bucket
                      FROM b),
               capped AS MATERIALIZED (SELECT * FROM
                            (SELECT doc_id, band, bucket,
                                    count(*) OVER (PARTITION BY band, bucket) AS bsz FROM bk)
                          WHERE bsz <= 8),
               cand AS (SELECT DISTINCT a.doc_id AS d1, c.doc_id AS d2
                        FROM capped a JOIN capped c
                        ON a.band = c.band AND a.bucket = c.bucket AND a.doc_id < c.doc_id)
               SELECT d1, d2, jac FROM
                 (SELECT d1, d2,
                         CAST(len(list_intersect(x.hv, y.hv)) AS DOUBLE)
                           / len(list_distinct(x.hv || y.hv)) AS jac
                  FROM cand JOIN hs x ON x.doc_id = d1 JOIN hs y ON y.doc_id = d2)
               WHERE jac >= 0.7""")),

    // ── 32-bit SimHash per document (term-frequency weighted) ──
    "d04_simhash" -> Q(
      (s, d) => simhashed(s, d)
        .selectExpr("doc_id", "simhash", "shiftright(simhash, 48) & 65535 as bucket"),
      Some(s"""$duckSimhash
               SELECT doc_id, simhash, (simhash >> 48) & 65535 AS bucket FROM sh""")),

    // ── SimHash near-dup pairs: 4×16-bit banding + hamming verify ──
    // Pigeonhole: hamming <= 3 flips bits in at most 3 of the 4 bands,
    // so at least one 16-bit band matches exactly — recall is EXACT
    // for the advertised hamming <= 3 contract. 65,536 buckets per
    // band (vs 256 with the old 32-bit/8-bit-band scheme, whose
    // N/256-sized buckets made the self-join quadratic by
    // construction at corpus scale); the d07 bucket cap (64)
    // backstops residual skew, mirrored in both engines.
    "d06_simhash_pairs" -> Q(
      (s, d) => simhashPairs(simhashed(s, d).persistScoped()),
      Some(s"""$duckSimhash,
              $duckBandPairs""")),

    // ── asymmetric CONTAINMENT near-dup: |A∩B| / min(|A|,|B|) over
    // the same LSH candidates as d03. Catches a short document quoted
    // verbatim inside a long one — Jaccard punishes the size gap
    // (|A∩B|/|A∪B| stays low) while containment hits 1.0; the
    // training-data failure mode is memorized boilerplate embedded in
    // larger pages. Shares d03's cached hashed-set + bucket frames, so
    // at scale this is one extra candidate join over the same
    // machinery, not a second pipeline. ──
    "d09_containment" -> Q(
      (s, d) => {
        val (hs, bk) = lshFrames(s, d)
        scoredCandidates(hs, bk,
          "cast(size(array_intersect(hv1, hv2)) as double) / least(size(hv1), size(hv2)) as cont")
          .where("cont >= 0.9")
          .select("d1", "d2", "cont")
      },
      Some(s"""$duckShingles,
               sigs AS MATERIALIZED (SELECT doc_id, ${duckSig(16)} AS sig FROM hs),
               b AS (SELECT doc_id, unnest(generate_series(0, 3)) AS band, sig FROM sigs),
               bk AS MATERIALIZED (SELECT doc_id, band,
                        ${Hashing.duck32("band || ':' || array_to_string(sig[band*4+1:band*4+4], ',')")} AS bucket
                      FROM b),
               cand AS (SELECT DISTINCT a.doc_id AS d1, c.doc_id AS d2
                        FROM bk a JOIN bk c
                        ON a.band = c.band AND a.bucket = c.bucket AND a.doc_id < c.doc_id)
               SELECT d1, d2, cont FROM
                 (SELECT d1, d2,
                         CAST(len(list_intersect(x.hv, y.hv)) AS DOUBLE)
                           / least(len(x.hv), len(y.hv)) AS cont
                  FROM cand JOIN hs x ON x.doc_id = d1 JOIN hs y ON y.doc_id = d2)
               WHERE cont >= 0.9"""),
      bench = false),

    // ── char-4-gram Jaccard near-dup (8-perm MinHash, 2 bands of 4) ──
    // Char-gram buckets are hotter than shingle buckets (short docs
    // share 4-gram sets far more often than 3-token shingles — the
    // uncapped banding admitted 119k candidate pairs at sf0.1), so
    // this path carries the d07 bucket cap from the start: a bucket
    // with more than 64 members is dropped before the self-join,
    // bounding every bucket's fan-out at 64² (mega-bucket members are
    // boilerplate near-identicals that d01 already groups).
    "d05_ngram_jaccard" -> Q(
      (s, d) => {
        Hashing.register(s)
        graft.plans.JaccardRewrite.install(s)
        // hashed char-4-gram sets, native kernel, cached once
        val hg = Tables(s, d, "documents")
          .repartition(s.sparkContext.defaultParallelism)
          .where("length(text) >= 4")
          .selectExpr("doc_id", "hashed_chargrams(text, 4) as hv")
          .persistScoped()
        val sigs = hg.selectExpr("doc_id", "affine_minhash(hv, 8) as sig")
        val bk = sigs
          .selectExpr("doc_id", "explode(sequence(0, 1)) as band", "sig")
          .selectExpr("doc_id", "band",
            s"${Hashing.h32Sql("concat(band, ':', concat_ws(',', slice(sig, band*4+1, 4)))")} as bucket")
          .persistScoped()
        scoredCandidates(hg, bk, jaccardExpr, cap = Some(64))
          .where("jac >= 0.6")
          .select("d1", "d2", "jac")
      },
      Some(s"""WITH g AS (SELECT doc_id,
                 list_distinct(list_transform(generate_series(1, length(text)-3),
                   i -> substr(text, i, 4))) AS g
               FROM documents WHERE length(text) >= 4),
               hg AS MATERIALIZED (SELECT doc_id, g,
                 list_transform(g, x -> (('0x' || substr(md5(x), 1, 8))::BIGINT) % $P) AS hv
               FROM g),
               sigs AS (SELECT doc_id, ${duckSig(8)} AS sig FROM hg),
               b AS (SELECT doc_id, unnest(generate_series(0, 1)) AS band, sig FROM sigs),
               bk AS MATERIALIZED (SELECT doc_id, band,
                        ${Hashing.duck32("band || ':' || array_to_string(sig[band*4+1:band*4+4], ',')")} AS bucket
                      FROM b),
               capped AS MATERIALIZED (SELECT * FROM
                            (SELECT doc_id, band, bucket,
                                    count(*) OVER (PARTITION BY band, bucket) AS bsz FROM bk)
                          WHERE bsz <= 64),
               cand AS (SELECT DISTINCT a.doc_id AS d1, c.doc_id AS d2
                        FROM capped a JOIN capped c
                        ON a.band = c.band AND a.bucket = c.bucket AND a.doc_id < c.doc_id)
               SELECT d1, d2, jac FROM
                 (SELECT d1, d2,
                         CAST(len(list_intersect(x.hv, y.hv)) AS DOUBLE)
                           / len(list_distinct(x.hv || y.hv)) AS jac
                  FROM cand JOIN hg x ON x.doc_id = d1 JOIN hg y ON y.doc_id = d2)
               WHERE jac >= 0.6""")),

    // ── duplicated-window fraction (Lee et al. 2022 shape) ──
    // "Deduplicating Training Data Makes Language Models Better"
    // flags documents by how much of their text is covered by token
    // windows that also occur elsewhere in the corpus. Here: the
    // fraction of a document's distinct 8-token windows (hashed by
    // the native [[graft.functions.HashedShingles]] kernel — the
    // rolling-window machinery is the same as shingling, wider n)
    // that appear in ≥2 documents, in integer basis points.
    //
    // Scale shape: explode once (persisted — it feeds two consumers),
    // one partial-agg'd shuffle keyed by window hash counts cross-doc
    // occurrences, an equi-join on the same key carries the flag back
    // (the counted side arrives already hash-partitioned on `wh`, so
    // only the probe side re-exchanges), and the per-doc fraction is
    // a second partial agg. No all-pairs join anywhere; a boilerplate
    // window shared by millions of docs only widens one count row,
    // and AQE splits the skewed join side.
    // ── soft dedup: DOWN-WEIGHT near-duplicate documents instead of
    // dropping them (training weight = 1/cluster-size, in basis
    // points) — the SoftDeDup alternative to c05's hard keep-one,
    // preserving coverage while neutralizing the duplicated mass.
    // Rides d08's clusters; singleton docs never enter the pair
    // graph and keep full weight. Two small joins against the
    // bounded cluster frame — the corpus never re-shuffles. ──
    "d12_softdedup_weights" -> Q(
      (s, d) => {
        val clusters = all("d08_dup_clusters").fn(s, d)
        val sizes = clusters.groupBy("cluster").agg(count(lit(1)).as("csz"))
        Tables(s, d, "documents").select("doc_id")
          .join(clusters, Seq("doc_id"), "left")
          .join(sizes, Seq("cluster"), "left")
          .selectExpr("doc_id",
            "coalesce(csz, 1L) as cluster_size",
            "10000 div coalesce(csz, 1L) as weight_bp")
      },
      Some(s"""$duckClusters,
               sz AS (SELECT cluster, count(*) AS csz FROM cl GROUP BY cluster)
               SELECT d.doc_id,
                      COALESCE(sz.csz, 1) AS cluster_size,
                      10000 // COALESCE(sz.csz, 1) AS weight_bp
               FROM documents d
               LEFT JOIN cl ON cl.doc_id = d.doc_id
               LEFT JOIN sz ON sz.cluster = cl.cluster""")),

    // ── LSH recall audit (s09's harness in the dedup tier): does the
    // banded MinHash candidate generation FIND the true near-dups?
    // Exact baseline = brute verified-Jaccard scan of the corpus
    // against a BROADCAST 10% probe sample (the audit a production
    // dedup runs on a sample before trusting its band parameters —
    // bounded: |sample| × corpus, linear in splits); retrieved =
    // d03's pairs (the persisted four-consumer frame). Per-probe
    // integer recall through the shared [[Recall]] harness (one code
    // path with s09/s14, so the band/nprobe dials read off identical
    // semantics); probes with no true near-dup have no recall to
    // measure and are absent by construction. ──
    "d11_lsh_recall" -> Q(
      (s, d) => {
        val (hs, _) = lshFrames(s, d)
        val probes = broadcast(hs.where("doc_id < 50")
          .select(col("doc_id").as("p_id"), col("hv").as("pv")))
        val exact = hs.join(probes, col("doc_id") =!= col("p_id"))
          .selectExpr("p_id", "doc_id as c_id",
            "cast(size(array_intersect(pv, hv)) as double) / size(array_union(pv, hv)) as jac")
          .where("jac >= 0.7")
          .select("p_id", "c_id")
        val pairs = lshPairs(s, d)
        val retr = pairs.selectExpr("d1 as p_id", "d2 as c_id")
          .union(pairs.selectExpr("d2 as p_id", "d1 as c_id"))
          .where("p_id < 50")
        Recall.perProbe(exact, retr, "p_id", "c_id", None)
      },
      Some(s"""$duckShingles,
               sigs AS MATERIALIZED (SELECT doc_id, ${duckSig(16)} AS sig FROM hs),
               b AS (SELECT doc_id, unnest(generate_series(0, 3)) AS band, sig FROM sigs),
               bk AS MATERIALIZED (SELECT doc_id, band,
                        ${Hashing.duck32("band || ':' || array_to_string(sig[band*4+1:band*4+4], ',')")} AS bucket
                      FROM b),
               cand AS (SELECT DISTINCT a.doc_id AS d1, c.doc_id AS d2
                        FROM bk a JOIN bk c
                        ON a.band = c.band AND a.bucket = c.bucket AND a.doc_id < c.doc_id),
               pr AS MATERIALIZED (SELECT d1, d2 FROM
                        (SELECT d1, d2,
                                CAST(len(list_intersect(x.hv, y.hv)) AS DOUBLE)
                                  / len(list_distinct(x.hv || y.hv)) AS jac
                         FROM cand JOIN hs x ON x.doc_id = d1 JOIN hs y ON y.doc_id = d2)
                      WHERE jac >= 0.7),
               p AS (SELECT doc_id AS p_id, hv AS pv FROM hs WHERE doc_id < 50),
               ex AS (SELECT p_id, s.doc_id AS c_id FROM p JOIN hs s ON s.doc_id != p.p_id
                      WHERE CAST(len(list_intersect(pv, s.hv)) AS DOUBLE)
                              / len(list_distinct(pv || s.hv)) >= 0.7),
               r AS (SELECT d1 AS p_id, d2 AS c_id FROM pr
                     UNION ALL SELECT d2, d1 FROM pr)
               SELECT e.p_id, count(*) AS n_true,
                      CAST(sum(CASE WHEN r.c_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits,
                      (CAST(sum(CASE WHEN r.c_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) * 10000)
                        // count(*) AS recall_bp
               FROM ex e LEFT JOIN r ON r.p_id = e.p_id AND r.c_id = e.c_id
               GROUP BY e.p_id""")),

    "d10_window_dedup" -> Q(
      (s, d) => {
        Hashing.register(s)
        val wins = Tables(s, d, "documents")
          .repartition(s.sparkContext.defaultParallelism)
          .where(s"size($toks) >= 8")
          .selectExpr("doc_id", s"explode(hashed_shingles($toks, 8)) as wh")
          .persistScoped()
        val counts = wins.groupBy("wh").agg(count(lit(1)).as("n_docs"))
        wins.join(counts, "wh")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_win"),
            sum(when(col("n_docs") >= 2, 1L).otherwise(0L)).as("n_dup"))
          .selectExpr("doc_id", "n_win", "n_dup",
            "(n_dup * 10000) div n_win as dup_bp")
      },
      Some(s"""WITH t AS (SELECT doc_id, string_split(text,' ') AS t FROM documents
                          WHERE len(string_split(text,' ')) >= 8),
               w AS (SELECT doc_id, list_transform(
                       list_distinct(list_transform(generate_series(1, len(t)-7),
                         i -> array_to_string(t[i:i+7], ' '))),
                       x -> (('0x' || substr(md5(x), 1, 8))::BIGINT) % $P) AS hv FROM t),
               e AS (SELECT doc_id, unnest(hv) AS wh FROM w),
               c AS (SELECT wh, count(*) AS n_docs FROM e GROUP BY wh)
               SELECT doc_id, count(*) AS n_win,
                      CAST(sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
                      CAST((sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) * 10000) // count(*) AS BIGINT) AS dup_bp
               FROM e JOIN c USING (wh) GROUP BY doc_id""")),

    // ── exact substring-SPAN dedup (the Lee et al. 2022 "Deduplicating
    // Training Data Makes Language Models Better" method): every token
    // position whose 8-gram window occurs MORE THAN ONCE in the corpus
    // (within- or cross-document, the paper's criterion) is marked
    // duplicated; overlapping/adjacent marked windows merge into
    // maximal spans, and each doc reports its span count and
    // covered-token fraction — the spans a span-level dedup would cut,
    // where d10 only counts windows. A repeated substring of m ≥ 8
    // tokens surfaces as m-7 consecutive duplicated window starts
    // whose merged island covers exactly its m tokens, so with the
    // window length as the paper's minimum match length the
    // shingle-position formulation IS the suffix-array answer —
    // re-expressed as one fp-keyed partial-agg shuffle, one fp-keyed
    // equi-join (AQE splits hot fps), and a PER-DOC window (bounded by
    // doc length, never corpus-global) — the shapes that scale on a
    // cluster where the paper's in-memory suffix array does not.
    "d18_span_dedup" -> Q(
      (s, d) => {
        dupSpans(s, d).groupBy("doc_id", "n_tokens")
          .agg(count(lit(1)).as("n_spans"),
            sum(col("e1") - col("s0") + 1).as("dup_tokens"))
          .selectExpr("doc_id", "n_spans", "dup_tokens", "n_tokens",
            "(dup_tokens * 10000) div n_tokens as dup_bp")
      },
      Some(s"""WITH $duckSpanIslands
               SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
                      CAST(sum(e1 - s0 + 1) AS BIGINT) AS dup_tokens, n_tokens,
                      CAST((sum(e1 - s0 + 1) * 10000) // n_tokens AS BIGINT) AS dup_bp
               FROM i GROUP BY doc_id, n_tokens""")),

    // ── d19: HyperLogLog cardinality (Flajolet et al. 2007) with an
    // EXACT cross-engine oracle — the mergeable sketch every 100 TB
    // profiler runs ("how many distinct shingles per source?")
    // without a countDistinct shuffle of the full key set. The whole
    // sketch is builtin-expression arithmetic on the shared md5-h32
    // hash: bucket = top 10 bits, rho = 1 + leading zeros of the
    // remaining 22 bits (via length(bin(w)) — identical semantics in
    // both engines), per-(source,bucket) max, and the harmonic mean
    // in DYADIC-RATIONAL integer arithmetic: Σ 2^-rho is summed as
    // integer terms 2^(32-rho) over a common 2^32 denominator — no
    // float sum order, no transcendental, so the gate's hash compare
    // is exact. est = α·m²·2^32 // S with α·m² = 755541 (m = 1024,
    // α = 0.7213/(1+1.079/m), floored once as a shared literal; the
    // standard small-range correction needs ln() and is deliberately
    // omitted — bias is part of the pinned contract, and the output
    // carries the true |err| in basis points against the exact
    // count). Scale shape: one (source,bucket)-keyed partial agg —
    // ≤1024 rows per source survive the map side, the classic
    // sketch-shuffle bound; the exact side is gate evidence only. ──
    "d19_hll_cardinality" -> Q(
      (s, d) => {
        Hashing.register(s)
        val items = hllItems(Tables(s, d, "documents")
          .repartition(s.sparkContext.defaultParallelism))
          .persistScoped()
        val exact = items.groupBy("source")
          .agg(countDistinct("h").as("exact_distinct"))
        hllFinish(hllRegisters(items), exact)
      },
      Some(d19Oracle)),

    // ── d20: EXACT similarity join via prefix filtering (AllPairs /
    // PPJoin, Bayardo et al. 2007 / Xiao et al. 2008) — the
    // zero-false-negative complement to d03's MinHash-LSH: same
    // shingle sets, same τ=0.7 Jaccard, but candidates come from an
    // exact-by-theorem filter instead of a probabilistic one. Order
    // the universe by global rarity (df asc, hash asc); a doc of set
    // size n indexes only its first n − ⌈0.7n⌉ + 1 rarest elements —
    // any pair with J ≥ 0.7 MUST collide inside these prefixes, so
    // the prefix-token equi-join loses nothing and joins only on
    // RARE elements (tiny posting lists — the skew profile is the
    // inverse of a full inverted-index join; a hot prefix token
    // splits under AQE). Verify is the d03 integer-exact cut
    // 10·inter ≥ 7·union. Scale: one vocabulary-keyed df agg, one
    // per-doc bounded sort window, an equi-join on prefix elements,
    // exact verify on candidates only. The oracle is the NAIVE
    // all-shared-element join — the gate equality IS the
    // completeness theorem, checked on real data; the spec adds
    // LSH ⊆ exact against d03. ──
    "d20_prefix_join" -> Q(
      (s, d) => {
        val hs = hashedDocs(s, d)
          .selectExpr("doc_id", "array_distinct(hv) as hv")
          .selectExpr("doc_id", "hv", "size(hv) as sz").persistScoped()
        val df = hs.selectExpr("explode(hv) as g")
          .groupBy("g").agg(count(lit(1)).as("df"))
        val pref = hs.selectExpr("doc_id", "sz", "explode(hv) as g")
          .join(df, "g")
          .groupBy("doc_id", "sz")
          .agg(expr("transform(array_sort(collect_list(struct(df, g))), x -> x.g)").as("sorted"))
          .selectExpr("doc_id",
            "explode(slice(sorted, 1, sz - ((7 * sz + 9) div 10) + 1)) as g")
        val cand = pref.select(col("doc_id").as("d1"), col("g"))
          .join(pref.select(col("doc_id").as("d2"), col("g").as("g2")),
            col("g") === col("g2") && col("d1") < col("d2"))
          .select("d1", "d2").distinct()
        cand
          .join(hs.select(col("doc_id").as("d1"), col("hv").as("hv1"), col("sz").as("s1")), "d1")
          .join(hs.select(col("doc_id").as("d2"), col("hv").as("hv2"), col("sz").as("s2")), "d2")
          .selectExpr("d1", "d2",
            "cast(size(array_intersect(hv1, hv2)) as bigint) as inter",
            "cast(s1 + s2 as bigint) as ssum")
          .selectExpr("d1", "d2", "inter", "ssum - inter as n_union")
          .where("10 * inter >= 7 * n_union")
          .selectExpr("d1", "d2", "inter", "n_union",
            "inter * 10000 div n_union as jac_bp")
      },
      Some(s"""$duckShingles,
               ds AS MATERIALIZED (SELECT doc_id, list_distinct(hv) AS hv FROM hs),
               e AS (SELECT doc_id, unnest(hv) AS g FROM ds),
               p AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
                     FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id
                     GROUP BY 1, 2),
               sz AS MATERIALIZED (SELECT doc_id, len(hv) AS sz FROM ds)
               SELECT d1, d2, CAST(inter AS BIGINT) AS inter,
                      CAST(s1.sz + s2.sz - inter AS BIGINT) AS n_union,
                      CAST(inter * 10000 // (s1.sz + s2.sz - inter) AS BIGINT) AS jac_bp
               FROM p JOIN sz s1 ON s1.doc_id = d1 JOIN sz s2 ON s2.doc_id = d2
               WHERE 10 * inter >= 7 * (s1.sz + s2.sz - inter)""")),

    // ── d21: mergeable histogram QUANTILE sketch — the distribution
    // profiler next to d19's cardinality and t23's frequency: "what
    // are the p50/p90/p99 document lengths?" answered from a
    // 128-bucket integer histogram instead of a global sort. Two
    // cheap passes (the production shape when the domain is unknown:
    // an extents partial-agg, then a bucket-keyed partial agg — ≤128
    // rows survive the map side at ANY corpus size), and the sketch
    // carries the fourth instance of the merge≡rebuild algebra:
    // extents merge by min/max, bucket counts by +, so per-shard
    // histograms fold into the corpus histogram with no re-scan
    // (DedupSpec proves the 3-chop fold equals the one-shot sketch).
    // Estimate contract, identical in both engines and fully
    // integer: width w = (hi-lo) div 128 + 1, bucket b(x) =
    // (x-lo) div w, est(q) = upper value of the first bucket whose
    // cumulative count reaches rank ⌈qN/100⌉ — so the true rank-q
    // value lives in that bucket and 0 ≤ est − exact ≤ w−1 by
    // construction (spec-pinned). The exact side is gate evidence in
    // the d19/t23 discipline (TakeOrdered rank statistics, never a
    // global sort; a production profiler publishes est alone), and
    // the output carries the realized err_bp. The cumulative pass
    // runs over the ≤128-row histogram — the t17-class provably-tiny
    // global window, whitelisted in PlanAuditSpec. ──
    "d21_hist_quantiles" -> Q(
      (s, d) => {
        val x = Tables(s, d, "documents").select(col("n_chars")).persistScoped()
        val rng = x.agg(min("n_chars").as("lo"), max("n_chars").as("hi"),
          count(lit(1)).as("n"))
        val cum = histBuckets(x, rng)
          .withColumn("cum", sum("cnt").over(org.apache.spark.sql.expressions.Window
            .orderBy("b").rowsBetween(Long.MinValue, 0)))
        val qs = s.range(1).selectExpr("explode(array(25, 50, 75, 90, 99)) as q")
        val est = qs.crossJoin(broadcast(cum))
          .where("cum >= (q * n + 99) div 100")
          .groupBy("q").agg(min("b").as("b"), min("lo").as("lo"),
            min("w").as("w"), min("n").as("n_total"))
        val n = x.count()
        val exact = Seq(25, 50, 75, 90, 99).map { q =>
          val k = (q * n + 99) / 100
          // exact rank-k is Int-bounded (t16's guard): past that a
          // production profiler publishes the sketch estimate alone
          require(k <= Int.MaxValue,
            s"corpus too large for exact rank-$k evidence; publish est alone")
          x.orderBy(col("n_chars").asc).limit(k.toInt)
            .agg(max("n_chars").as("exact"))
            .selectExpr(s"cast($q as int) as q", "exact")
        }.reduce(_.union(_))
        est.join(exact, "q")
          .selectExpr("q", "n_total", "w as width", "b as bucket",
            "lo + b * w + (w - 1) as est", "exact",
            "(lo + b * w + (w - 1) - exact) * 10000 div exact as err_bp")
      },
      Some("""WITH x AS (SELECT n_chars FROM documents),
              r AS (SELECT min(n_chars) AS lo, max(n_chars) AS hi, count(*) AS n FROM x),
              hw AS (SELECT lo, n, (hi - lo) // 128 + 1 AS w FROM r),
              h AS (SELECT (n_chars - lo) // w AS b, count(*) AS cnt
                    FROM x CROSS JOIN hw GROUP BY 1),
              c AS (SELECT b, sum(cnt) OVER (ORDER BY b
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM h),
              qs AS (SELECT unnest([25, 50, 75, 90, 99]) AS q),
              est AS (SELECT q, min(b) AS b FROM qs CROSS JOIN c CROSS JOIN hw
                      WHERE cum >= (q * n + 99) // 100 GROUP BY q),
              rk AS (SELECT n_chars, row_number() OVER (ORDER BY n_chars) AS rn FROM x),
              ex AS (SELECT q, max(CASE WHEN rn <= (q * n + 99) // 100
                                        THEN n_chars END) AS exact
                     FROM qs CROSS JOIN hw CROSS JOIN rk GROUP BY q)
              SELECT CAST(est.q AS INTEGER) AS q, CAST(n AS BIGINT) AS n_total,
                     CAST(w AS BIGINT) AS width, CAST(est.b AS BIGINT) AS bucket,
                     CAST(lo + est.b * w + (w - 1) AS BIGINT) AS est,
                     CAST(exact AS BIGINT) AS exact,
                     CAST((lo + est.b * w + (w - 1) - exact) * 10000
                          // exact AS BIGINT) AS err_bp
              FROM est JOIN ex ON ex.q = est.q CROSS JOIN hw""")),

    // ── c09: span STRIP — the rewrite step on d18's duplicated-span
    // report: d18 says where the corpus repeats itself, c09 produces
    // the cleaned corpus a pipeline actually trains on, excising
    // every token covered by a corpus-repeated 8-gram span (the
    // boilerplate-removal semantics of C4's line dedup and the
    // cut-all-occurrences variant of Lee et al. 2022 — over-frequent
    // content like license headers and nav chrome is removed
    // EVERYWHERE, not kept once). Per doc: new_text (survivors
    // rejoined in order), n_kept, n_removed; short (<8-token) and
    // span-free docs pass through unchanged, a fully-covered doc
    // emits an empty string. Scale shape: the spans are d18's shared
    // machinery (fp-keyed partial agg + equi-join + per-doc window);
    // the strip itself is a per-doc left join against the
    // islands-per-doc frame (rows = docs WITH spans ≪ corpus) and a
    // map-side filter of each doc's positions against its own
    // bounded island list — text shuffles once, on doc_id. ──
    "c09_span_strip" -> Q(
      (s, d) => {
        val cover = dupSpans(s, d)
          .groupBy("doc_id")
          .agg(expr("sort_array(collect_list(struct(s0, e1)))").as("iv"),
            sum(col("e1") - col("s0") + 1).as("n_rm"))
        Tables(s, d, "documents")
          .selectExpr("doc_id", s"$toks as t")
          .join(cover, Seq("doc_id"), "left")
          .selectExpr("doc_id",
            """case when iv is null then t
                    else transform(
                      filter(transform(sequence(1, size(t)),
                               i -> struct(i as i, element_at(t, i) as tok)),
                             p -> !exists(iv, v -> p.i >= v.s0 and p.i <= v.e1)),
                      x -> x.tok) end as kept""",
            "coalesce(n_rm, 0L) as n_removed")
          .selectExpr("doc_id", "concat_ws(' ', kept) as new_text",
            "cast(size(kept) as bigint) as n_kept", "n_removed")
      },
      Some(s"""WITH $duckSpanIslands,
               t0 AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
               posx AS (SELECT doc_id, ix, t[ix] AS tok FROM
                          (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS ix
                           FROM t0)),
               rem AS (SELECT DISTINCT p.doc_id, p.ix FROM posx p
                       JOIN i ON i.doc_id = p.doc_id AND p.ix BETWEEN i.s0 AND i.e1),
               kept AS (SELECT p.doc_id,
                               string_agg(p.tok, ' ' ORDER BY p.ix) AS new_text,
                               count(*) AS n_kept
                        FROM posx p LEFT JOIN rem
                          ON rem.doc_id = p.doc_id AND rem.ix = p.ix
                        WHERE rem.ix IS NULL GROUP BY p.doc_id),
               rm AS (SELECT doc_id, sum(e1 - s0 + 1) AS n_removed FROM i GROUP BY doc_id)
               SELECT d.doc_id,
                      coalesce(k.new_text, '') AS new_text,
                      CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
                      CAST(coalesce(rm.n_removed, 0) AS BIGINT) AS n_removed
               FROM documents d
               LEFT JOIN kept k ON k.doc_id = d.doc_id
               LEFT JOIN rm ON rm.doc_id = d.doc_id""")),

    // ── d24: HLL SET ALGEBRA — pairwise source-overlap estimates
    // from the d19 register sketches ALONE: est|A∩B| = est(A) +
    // est(B) − est(A∪B) (inclusion–exclusion), where the union's
    // registers are the bucket-wise MAX of the pair's registers — no
    // corpus re-scan, which is the entire point of sketch algebra
    // (a 100 TB overlap matrix from KB-sized artifacts). Same d19
    // exactness discipline: dyadic-rational integer estimator, so
    // both engines agree bit-for-bit; the exact intersection is gate
    // evidence only (a production profiler publishes the estimate).
    // Restricted to a 5-source slice (10 pairs) — the pair grid is
    // quadratic by nature and the slice is the audit's dial. Scale:
    // registers are ≤1024 rows/source; everything downstream is
    // pair×bucket-bounded, corpus-size-independent. Honest accuracy
    // note, pinned by spec: inclusion–exclusion error scales with
    // the UNION (each estimate's σ ≈ 3.25% of its set), so a small
    // true intersection under big sets reads a large RELATIVE error
    // while |est−exact| stays a few percent of the union — the
    // documented reason theta sketches exist for intersection-heavy
    // workloads; err_bp publishes the realized relative error. ──
    "d24_hll_setops" -> Q(
      (s, d) => {
        Hashing.register(s)
        val five = Seq("src0", "src1", "src2", "src3", "src4")
        val items = hllItems(Tables(s, d, "documents")
            .where(col("source").isin(five: _*))
            .repartition(s.sparkContext.defaultParallelism))
          .persistScoped()
        val regs = hllRegisters(items).persistScoped()
        // the audited slice is a literal, so the pair grid is too —
        // no self-join materializes it (an UNBOUNDED source list
        // would build pairs from a keyed distinct+join instead)
        import s.implicits._
        val pairs = (for (a <- five; b <- five if a < b) yield (a, b))
          .toDF("sa", "sb")
        val estS = hllEst(regs, Seq("source"))
        val ru = pairs.join(regs, col("source") === col("sa"))
          .select("sa", "sb", "bucket", "m_rho")
          .union(pairs.join(regs, col("source") === col("sb"))
            .select("sa", "sb", "bucket", "m_rho"))
          .groupBy("sa", "sb", "bucket").agg(max("m_rho").as("m_rho"))
        val estU = hllEst(ru, Seq("sa", "sb"))
          .withColumnRenamed("est", "est_union")
        val dh = items.distinct()
        val exact = dh.select(col("source").as("sa"), col("h"))
          .join(dh.select(col("source").as("sb"), col("h")), Seq("h"))
          .where(col("sa") < col("sb"))
          .groupBy("sa", "sb").agg(count(lit(1)).as("exact_inter"))
        pairs
          .join(estS.select(col("source").as("sa"), col("est").as("est_a")), "sa")
          .join(estS.select(col("source").as("sb"), col("est").as("est_b")), "sb")
          .join(estU, Seq("sa", "sb"))
          .join(exact, Seq("sa", "sb"), "left")
          .selectExpr("sa", "sb", "est_a", "est_b", "est_union",
            "est_a + est_b - est_union as est_inter",
            "coalesce(exact_inter, 0L) as exact_inter",
            """abs(est_a + est_b - est_union - coalesce(exact_inter, 0L)) * 10000
               div greatest(coalesce(exact_inter, 0L), cast(1 as bigint)) as err_bp""")
      },
      Some(s"""WITH t AS (SELECT source, string_split(text,' ') AS t FROM documents
                          WHERE source IN ('src0','src1','src2','src3','src4')
                            AND len(string_split(text,' ')) >= 3),
               it AS MATERIALIZED (SELECT source, unnest(list_transform(generate_series(1, len(t)-2),
                        i -> ${Hashing.duck32("array_to_string(t[i:i+2], ' ')")})) AS h
                      FROM t),
               br AS (SELECT source, h // 4194304 AS bucket,
                             CASE WHEN h % 4194304 = 0 THEN 23
                                  ELSE 23 - length(bin(h % 4194304)) END AS rho
                      FROM it),
               mx AS (SELECT source, bucket, max(rho) AS m_rho FROM br GROUP BY 1, 2),
               srcs AS (SELECT DISTINCT source FROM mx),
               pr AS (SELECT a.source AS sa, b.source AS sb
                      FROM srcs a JOIN srcs b ON a.source < b.source),
               allb AS (SELECT source, unnest(generate_series(0, 1023)) AS bucket FROM srcs),
               sm AS (SELECT a.source, sum(1::BIGINT << (32 - coalesce(m_rho, 0))) AS s_sum
                      FROM allb a LEFT JOIN mx USING (source, bucket) GROUP BY 1),
               es AS (SELECT source, CAST((755541 * 4294967296) // s_sum AS BIGINT) AS est
                      FROM sm),
               ru AS (SELECT sa, sb, bucket, max(m_rho) AS m_rho FROM (
                        SELECT pr.sa, pr.sb, mx.bucket, mx.m_rho
                        FROM pr JOIN mx ON mx.source = pr.sa
                        UNION ALL
                        SELECT pr.sa, pr.sb, mx.bucket, mx.m_rho
                        FROM pr JOIN mx ON mx.source = pr.sb)
                      GROUP BY 1, 2, 3),
               allbu AS (SELECT sa, sb, unnest(generate_series(0, 1023)) AS bucket FROM pr),
               smu AS (SELECT a.sa, a.sb,
                              sum(1::BIGINT << (32 - coalesce(m_rho, 0))) AS s_sum
                       FROM allbu a LEFT JOIN ru USING (sa, sb, bucket) GROUP BY 1, 2),
               esu AS (SELECT sa, sb,
                              CAST((755541 * 4294967296) // s_sum AS BIGINT) AS est_union
                       FROM smu),
               dh AS (SELECT DISTINCT source, h FROM it),
               ex AS (SELECT a.source AS sa, b.source AS sb, count(*) AS exact_inter
                      FROM dh a JOIN dh b ON a.h = b.h AND a.source < b.source
                      GROUP BY 1, 2)
               SELECT pr.sa, pr.sb, ea.est AS est_a, eb.est AS est_b, est_union,
                      ea.est + eb.est - est_union AS est_inter,
                      CAST(coalesce(exact_inter, 0) AS BIGINT) AS exact_inter,
                      CAST(abs(ea.est + eb.est - est_union - coalesce(exact_inter, 0))
                           * 10000 // greatest(coalesce(exact_inter, 0), 1) AS BIGINT) AS err_bp
               FROM pr
               JOIN es ea ON ea.source = pr.sa
               JOIN es eb ON eb.source = pr.sb
               JOIN esu ON esu.sa = pr.sa AND esu.sb = pr.sb
               LEFT JOIN ex ON ex.sa = pr.sa AND ex.sb = pr.sb""")),

    // ── d23: TYPO join — exact edit-distance-≤1 pairs over the
    // corpus vocabulary via DELETION NEIGHBORHOODS (the SymSpell
    // method): each word emits itself plus its |w| one-character-
    // deletion variants; two words within edit distance 1 MUST share
    // a variant (w1=w2 del, w2=w1 del, or same-length substitution →
    // both delete the differing position to the same string), so the
    // variant equi-join is complete BY THEOREM and candidates are
    // verified with the built-in levenshtein — never the |V|²
    // all-pairs scan (the oracle runs exactly that naive join, so
    // gate equality IS the completeness proof on real data). The
    // fuzzy-match primitive behind query/title dedup and typo
    // normalization. Scale: the explode is Σ|w| variants (≈ corpus
    // vocab bytes), one variant-keyed equi-join bounded by
    // neighborhood collisions, verify on candidates only. ──
    "d23_typo_join" -> Q(
      (s, d) => {
        import s.implicits._
        val vocab = Tables(s, d, "documents").select("text")
          .union(typoDocs.toDF("text"))
          .selectExpr(s"explode($toks) as w")
          .where("length(w) >= 3")
          .groupBy("w").agg(count(lit(1)).as("freq"))
          .persistScoped()
        val variants = vocab.selectExpr("w",
          """explode(concat(array(w),
               transform(sequence(1, length(w)),
                 i -> concat(substring(w, 1, i - 1), substring(w, i + 1))))) as v""")
        val cand = variants.select(col("w").as("w1"), col("v"))
          .join(variants.select(col("w").as("w2"), col("v")), Seq("v"))
          .where(col("w1") < col("w2"))
          .select("w1", "w2").distinct()
        cand.where(levenshtein(col("w1"), col("w2")) <= 1)
          .join(vocab.select(col("w").as("w1"), col("freq").as("f1")), "w1")
          .join(vocab.select(col("w").as("w2"), col("freq").as("f2")), "w2")
          .select("w1", "w2", "f1", "f2")
      },
      Some {
        val vals = typoDocs.map(t => s"('$t')").mkString(", ")
        s"""WITH corpus AS (SELECT text FROM documents
                            UNION ALL SELECT * FROM (VALUES $vals) p(text)),
            v AS (SELECT w, count(*) AS freq FROM
                    (SELECT unnest(string_split(text, ' ')) AS w FROM corpus)
                  WHERE length(w) >= 3 GROUP BY w)
            SELECT a.w AS w1, b.w AS w2, a.freq AS f1, b.freq AS f2
            FROM v a JOIN v b ON a.w < b.w AND levenshtein(a.w, b.w) <= 1"""
      }),

    // ── d22: LSH PARAMETER SWEEP — the tune-your-index query for
    // the dedup tier, s15's nprobe sweep transplanted to MinHash
    // banding: the same 16-perm signatures cut as (16 bands × 1
    // row) … (2 × 8), each config's banded candidates scored for
    // PRECISION (what fraction of the verify join's input is real —
    // the cost dial) and RECALL (what fraction of the true ≥0.7
    // pairs the banding surfaces — the quality dial) against d20's
    // exact prefix-join ground truth (zero false negatives by
    // theorem, so the denominator is the real pair population).
    // More rows per band → fewer, cleaner candidates: the
    // precision/recall trade the S-curve predicts, measured on real
    // data. Scale shape: ONE signature pass shared by all configs
    // (the sweep re-bands 16 ints per doc, not the corpus), each
    // config one (band,bucket) equi-self-join bounded by bucket
    // occupancy, tp by an id-pair join against the bounded truth
    // frame; output is 4 rows. ──
    "d22_lsh_param_sweep" -> Q(
      (s, d) => {
        Hashing.register(s)
        val sigs = hashedDocs(s, d)
          .selectExpr("doc_id", "affine_minhash(hv, 16) as sig").persistScoped()
        val truth = all("d20_prefix_join").fn(s, d)
          .select("d1", "d2").persistScoped()
        val nTrue = truth.agg(count(lit(1)).as("n_true"))
        Seq((16, 1), (8, 2), (4, 4), (2, 8)).map { case (b, r) =>
          val bk = sigs
            .selectExpr("doc_id", s"explode(sequence(0, ${b - 1})) as band", "sig")
            .selectExpr("doc_id", "band",
              s"${Hashing.h32Sql(s"concat(band, ':', concat_ws(',', slice(sig, band*$r+1, $r)))")} as bucket")
          val cand = bk.select(col("doc_id").as("d1"), col("band"), col("bucket"))
            .join(bk.select(col("doc_id").as("d2"), col("band"), col("bucket")),
              Seq("band", "bucket"))
            .where(col("d1") < col("d2"))
            .select("d1", "d2").distinct()
          cand.join(truth.withColumn("is_tp", lit(true)), Seq("d1", "d2"), "left")
            .agg(count(lit(1)).as("n_cand"),
              sum(when(col("is_tp"), 1L).otherwise(0L)).as("tp"))
            .crossJoin(broadcast(nTrue))
            .selectExpr(s"$b as bands", s"$r as rows_per_band",
              "n_cand", "tp", "n_true",
              "tp * 10000 div greatest(n_cand, cast(1 as bigint)) as precision_bp",
              "tp * 10000 div greatest(n_true, cast(1 as bigint)) as recall_bp")
        }.reduce(_.union(_))
      },
      Some {
        val configs = Seq((16, 1), (8, 2), (4, 4), (2, 8))
        val perCfg = configs.map { case (b, r) =>
          s"""bk${b}_$r AS MATERIALIZED (SELECT doc_id, band,
                ${Hashing.duck32(s"band || ':' || array_to_string(sig[band*$r+1:band*$r+$r], ',')")} AS bucket
              FROM (SELECT doc_id, unnest(generate_series(0, ${b - 1})) AS band, sig
                    FROM sigs)),
              cd${b}_$r AS (SELECT DISTINCT a.doc_id AS d1, c.doc_id AS d2
                FROM bk${b}_$r a JOIN bk${b}_$r c
                ON a.band = c.band AND a.bucket = c.bucket AND a.doc_id < c.doc_id),
              st${b}_$r AS (SELECT count(*) AS n_cand,
                       CAST(sum(CASE WHEN t.d1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS tp
                FROM cd${b}_$r c LEFT JOIN truth t ON t.d1 = c.d1 AND t.d2 = c.d2)"""
        }.mkString(",\n")
        val sel = configs.map { case (b, r) =>
          s"""SELECT $b AS bands, $r AS rows_per_band,
                CAST(n_cand AS BIGINT) AS n_cand, tp, CAST(n_true AS BIGINT) AS n_true,
                CAST(tp * 10000 // greatest(n_cand, 1) AS BIGINT) AS precision_bp,
                CAST(tp * 10000 // greatest(n_true, 1) AS BIGINT) AS recall_bp
              FROM st${b}_$r CROSS JOIN nt"""
        }.mkString("\nUNION ALL ")
        // MATERIALIZED on every multiply-referenced CTE: without it
        // DuckDB inlines the shingle-self-join truth pipeline into
        // each of the four config branches — 4x the work and >50 GB
        // of stacked spill at sf1 (the checker died on disk, not the
        // engine; same cure as g06's oracle)
        s"""$duckShingles,
            sigs AS MATERIALIZED (SELECT doc_id, ${duckSig(16)} AS sig FROM hs),
            ds AS MATERIALIZED (SELECT doc_id, list_distinct(hv) AS hv FROM hs),
            sz AS MATERIALIZED (SELECT doc_id, len(hv) AS sz FROM ds),
            e AS MATERIALIZED (SELECT doc_id, unnest(hv) AS g FROM ds),
            p AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
                  FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id
                  GROUP BY 1, 2),
            truth AS MATERIALIZED (SELECT d1, d2 FROM p
                      JOIN sz s1 ON s1.doc_id = d1 JOIN sz s2 ON s2.doc_id = d2
                      WHERE 10 * inter >= 7 * (s1.sz + s2.sz - inter)),
            nt AS MATERIALIZED (SELECT count(*) AS n_true FROM truth),
            $perCfg
            $sel"""
      }),
  )
}
