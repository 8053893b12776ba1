package graft.queries

import graft.CacheScope.PersistScopedOps
import graft.{Det, Q, Tables}
import org.apache.spark.sql.functions._

/** The pipeline tier's KERNELS below [[Pipeline.all]]'s registry:
  * the drift-monitor histogram machinery (p15 + stream twins), the
  * maintained exact-k sample fold, and the planted canary/leak
  * fixtures. Split from `Pipeline.scala` (same registry-boundary
  * split as Similarity/Dedup) — no member changed. */
private[graft] object PipelineKernels {
  // ── drift machinery shared by p19 (one-shot batch) and stream21
  // (maintained shard-histogram artifact + streaming fold) ──

  /** Clamped 128-bucket length histogram against FROZEN baseline
    * constants (lo, w) — (b, cnt), ≤128 rows at any input size.
    * Works on batch and streaming frames (stateless projection +
    * keyed partial agg). */
  private[graft] def lenHist(x: org.apache.spark.sql.DataFrame,
      lo: Long, w: Long): org.apache.spark.sql.DataFrame =
    x.selectExpr(s"least(127L, greatest(0L, (n_chars - $lo) div $w)) as b")
      .groupBy("b").agg(count(lit(1)).as("cnt"))

  /** p19's finish over two bucket-count frames: per-bucket shares,
    * deltas, and the integer total-variation distance + alarm. */
  private[graft] def driftFinish(baseH: org.apache.spark.sql.DataFrame,
      shardH: org.apache.spark.sql.DataFrame, nb: Long,
      ns: Long): org.apache.spark.sql.DataFrame = {
    val grid = baseH.selectExpr("b", s"cnt * 10000 div $nb as base_bp")
      .join(shardH.selectExpr("b", s"cnt * 10000 div $ns as shard_bp"),
        Seq("b"), "full_outer")
      .selectExpr("b", "coalesce(base_bp, 0L) as base_bp",
        "coalesce(shard_bp, 0L) as shard_bp")
      .withColumn("delta_bp", abs(col("base_bp") - col("shard_bp")))
    val tv = grid.agg((sum("delta_bp") / 2).cast("long").as("tv_bp"))
    grid.crossJoin(broadcast(tv))
      .selectExpr("b", "base_bp", "shard_bp", "delta_bp", "tv_bp",
        "tv_bp >= 1000 as drifted")
  }

  /** stream21: fold each arriving micro-batch's shard histogram into
    * the persisted (b, cnt) artifact by counter-wise ADD — counts of
    * a disjoint union are the sum of counts (the d21 merge algebra
    * in streaming form, the same template as stream16/17), so the
    * maintained histogram equals the batch rebuild regardless of
    * batch boundaries. Artifact ≤128 rows at any corpus size; swap
    * is write-tmp + rename. */
  private[graft] def histArtifactDir: String = java.nio.file.Paths.get(
    System.getProperty("java.io.tmpdir"), "graft-drift-hist").toString

  private[graft] def histStream(s: org.apache.spark.sql.SparkSession,
      lens: org.apache.spark.sql.DataFrame, lo: Long,
      w: Long): org.apache.spark.sql.DataFrame = {
    graft.streaming.ArtifactFold.fold(s, lens, histArtifactDir,
        "hist") { (batch, prior) =>
      val bh = lenHist(batch, lo, w)
      prior.fold(bh)(bh.unionByName(_)
        .groupBy("b").agg(sum("cnt").as("cnt")))
    }
  }

  // ── DSIR machinery shared by p24 (one-shot batch) and stream28
  // (maintained bucket-count artifact + streaming fold) ──

  private[graft] val dsirK = 100

  /** One row per (doc, distinct uni/bigram), bucketed to 1024 —
    * DSIR's hashed n-gram feature stream. Works on batch and
    * streaming frames (stateless explode + codegen'd hash kernel).
    * Caller must have run [[graft.functions.Hashing.register]]. */
  private[graft] def dsirFeats(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    docs.selectExpr("doc_id", "lang",
        "explode(concat(hashed_shingles(split(text, ' '), 1), " +
          "hashed_shingles(split(text, ' '), 2))) as g")
      .selectExpr("doc_id", "lang", "g % 1024 as b")

  /** The 1024-row bucket sketch: both sides of the target/raw ratio
    * in ONE bucket-keyed partial agg (raw_n counts all features,
    * tgt_n the target slice). Mergeable by counter-wise ADD. */
  private[graft] def dsirBuckets(feats: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    feats.groupBy("b").agg(
      count(lit(1)).as("raw_n"),
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("tgt_n"))

  /** Estimator finish shared by p24 and stream28: λ from the bucket
    * sketch (broadcast — 1024 rows at any corpus size), per-doc
    * weights via the order-independent decimal sum, md5-derived
    * Gumbel keys, DECIMAL(38,6) resample key, TakeOrderedAndProject
    * top-k. */
  private[graft] def dsirFinish(buckets: org.apache.spark.sql.DataFrame,
      feats: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val tots = buckets.agg(sum("raw_n").as("raw_tot"), sum("tgt_n").as("tgt_tot"))
    val lam = buckets.crossJoin(broadcast(tots))
      .selectExpr("b",
        """ln((tgt_n + 1.0) / (tgt_tot + 1024.0))
           - ln((raw_n + 1.0) / (raw_tot + 1024.0)) as lam""")
    val wt = feats.join(broadcast(lam), "b")
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n_feats"), graft.Det.dsum(col("lam"), 6).as("w"))
    wt.selectExpr("doc_id", "lang", "n_feats",
        """cast(w + (-ln(-ln((h32(concat('dsir:', cast(doc_id as string))) + 0.5)
                           / 4294967296.0)))
           as decimal(38,6)) as skey""")
      .orderBy(col("skey").desc, col("doc_id")).limit(dsirK)
      .withColumn("rank", row_number().over(org.apache.spark.sql.expressions
        .Window.orderBy(col("skey").desc, col("doc_id"))).cast("long"))
      .selectExpr("rank", "doc_id", "lang", "n_feats",
        "printf('%.6f', cast(skey as double)) as score")
  }

  private[graft] def dsirArtifactDir: String = java.nio.file.Paths.get(
    System.getProperty("java.io.tmpdir"), "graft-dsir-buckets").toString

  /** stream28: fold each arriving micro-batch's bucket counts into
    * the persisted (b, raw_n, tgt_n) artifact by counter-wise ADD —
    * counts of a disjoint union are the sum of counts (stream17's
    * merge≡rebuild algebra), so the maintained sketch equals the
    * batch rebuild regardless of batch boundaries and the resample
    * answered FROM THE ARTIFACT reproduces p24 exactly. Artifact
    * ≤1024 rows at any corpus size; swap is write-tmp + rename. */
  private[graft] def dsirStream(s: org.apache.spark.sql.SparkSession,
      feats: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    graft.streaming.ArtifactFold.fold(s, feats, dsirArtifactDir,
        "buckets") { (batch, prior) =>
      graft.functions.Hashing.register(batch.sparkSession)
      val bb = dsirBuckets(batch)
      prior.fold(bb)(bb.unionByName(_).groupBy("b")
        .agg(sum("raw_n").as("raw_n"), sum("tgt_n").as("tgt_n")))
    }

  /** stream22: fold each arriving micro-batch into the maintained
    * BOTTOM-K SAMPLE artifact — bottom-k of a union is the bottom-k
    * of per-part bottom-k's (p14's mergeable order-statistics
    * algebra, the stream16/17 artifact template's fifth instance):
    * per batch, take the batch's own bottom-100 by the deterministic
    * tag, union the persisted sample, and keep the 100 smallest —
    * so the maintained sample is ALWAYS a uniform exact-100 sample
    * of everything that has arrived, at ≤100 rows of state and
    * O(batch) fold cost regardless of corpus size. The swap is
    * write-tmp + rename, one small PUT per batch. */
  private[graft] def sampleArtifactDir: String = java.nio.file.Paths.get(
    System.getProperty("java.io.tmpdir"), "graft-bottomk-sample").toString

  private[graft] def sampleStream(s: org.apache.spark.sql.SparkSession,
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    graft.functions.Hashing.register(s)
    val tagged = docs.selectExpr("doc_id", "lang", "source",
      s"${graft.functions.Hashing.h32Sql("concat('smp:', doc_id)")} as tag")
    graft.streaming.ArtifactFold.fold(s, tagged, sampleArtifactDir,
        "sample") { (batch, prior) =>
      val bk = batch.orderBy(col("tag"), col("doc_id")).limit(100)
      prior.fold(bk)(bk.unionByName(_)
        .orderBy(col("tag"), col("doc_id")).limit(100))
    }
  }

  /** p19's oracle, shared verbatim by stream21: the artifact-served
    * streaming drift report must reproduce the batch answer. */
  private[graft] lazy val driftOracle: String =
    s"""WITH base AS (SELECT length(text) AS n_chars FROM documents),
        r AS (SELECT min(n_chars) AS lo, max(n_chars) AS hi, count(*) AS n FROM base),
        hw AS (SELECT lo, n, (hi - lo) // 128 + 1 AS w FROM r),
        shard AS (SELECT length(CASE WHEN ${graft.functions.Hashing.duck32("'shard:' || doc_id")} % 100 < 10
                                     THEN text ELSE text || ' v2' END) AS n_chars
                  FROM documents
                  WHERE ${graft.functions.Hashing.duck32("'shard:' || doc_id")} % 100 < 20),
        nb AS (SELECT count(*) AS nb FROM base),
        ns AS (SELECT count(*) AS ns FROM shard),
        hb AS (SELECT least(127, greatest(0, (n_chars - lo) // w)) AS b,
                      count(*) AS cnt
               FROM base CROSS JOIN hw GROUP BY 1),
        hs AS (SELECT least(127, greatest(0, (n_chars - lo) // w)) AS b,
                      count(*) AS cnt
               FROM shard CROSS JOIN hw GROUP BY 1),
        g AS (SELECT coalesce(hb.b, hs.b) AS b,
                     coalesce(hb.cnt * 10000 // nb, 0) AS base_bp,
                     coalesce(hs.cnt * 10000 // ns, 0) AS shard_bp
              FROM hb FULL OUTER JOIN hs ON hs.b = hb.b
              CROSS JOIN nb CROSS JOIN ns),
        tv AS (SELECT CAST(sum(abs(base_bp - shard_bp)) / 2 AS BIGINT) AS tv_bp FROM g)
        SELECT CAST(b AS BIGINT) AS b, CAST(base_bp AS BIGINT) AS base_bp,
               CAST(shard_bp AS BIGINT) AS shard_bp,
               CAST(abs(base_bp - shard_bp) AS BIGINT) AS delta_bp,
               tv_bp, tv_bp >= 1000 AS drifted
        FROM g CROSS JOIN tv"""

  /** c08's canary registry: (suite, canary GUID). Deterministic
    * literals standing in for the GUIDs real eval suites embed. */
  private[graft] lazy val canarySuites = Seq(
    ("mmlu_stub", "canary-3f8a1c2e-77d2-4f6b-9b1a-bench-mmlu"),
    ("gsm_stub", "canary-9d41b7aa-0c3e-4e55-8f20-bench-gsm"),
    ("held_out", "canary-5e2c90fd-6a11-4b77-a3dd-bench-heldout"))

  /** c08's planted leaked docs (ids clear of the corpus and the d14
    * shard range): two mmlu leaks at different positions, one gsm
    * leak; held_out stays clean by design. */
  private[graft] lazy val plantedLeaks = Seq(
    (2000001L, s"prefix text ${canarySuites(0)._2} suffix text"),
    (2000002L, s"${canarySuites(0)._2} at document start"),
    (2000003L, s"document ending with ${canarySuites(1)._2}"))

  /** DSIR — Data Selection via Importance Resampling (Xie et al.,
    * NeurIPS 2023): pick raw-corpus documents that look like a target
    * domain by importance weights over HASHED N-GRAM buckets, then
    * Gumbel-top-k resample ∝ exp(weight). Registered as
    * [[dsirEntry]] below; the target here is the `lang='en'`
    * slice standing in for the paper's high-quality target corpus.
    *
    * Cross-engine determinism: bucket log-ratios are single `ln`
    * calls over exact integer ratios (Java and DuckDB agree far
    * inside 1e-6); the per-doc sum crosses through Det's
    * order-independent decimal aggregate; the Gumbel noise is
    * md5-derived (u = (h32('dsir:'||id)+0.5)/2^32, g = -ln(-ln u)) —
    * a pure function of the doc id, not an RNG; and the resampling
    * key is rounded to DECIMAL(38,6) before the top-k order so both
    * engines rank identical values.
    *
    * Scale shape: the feature explode is map-side; ONE (bucket)-keyed
    * partial agg builds the 1024-row bucket table (both sides of the
    * ratio in one pass — raw_n counts all, tgt_n counts the target
    * slice); totals fold out of that bounded frame; λ joins back
    * BROADCAST (1024 rows at any corpus size); the per-doc weight is
    * one doc-keyed agg; the resample is a TakeOrderedAndProject
    * top-k, never a global sort. Nothing corpus-global ever leaves
    * the executors except the 1024-row sketch. */
  private[graft] val dsirEntry: (String, Q) =
    "p24_dsir_resample" -> Q(
      (s, d) => {
        graft.functions.Hashing.register(s)
        // one row per (doc, distinct uni/bigram), bucketed to 1024;
        // the bucket sketch, finish, and streaming fold live in
        // PipelineKernels (shared with stream28's maintained artifact)
        val feats = dsirFeats(Tables(s, d, "documents")).persistScoped()
        dsirFinish(dsirBuckets(feats).persistScoped(), feats)
      },
      Some(dsirOracle))

  private[graft] lazy val dsirOracle: String =
    s"""WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS t
                          FROM documents),
               fx AS (SELECT doc_id, lang, unnest(
                        list_transform(list_distinct(t),
                          x -> ${graft.functions.Hashing.duck32("x")} % 2147483647)
                        || list_transform(
                             list_distinct(list_transform(generate_series(1, len(t) - 1),
                               i -> t[i] || ' ' || t[i + 1])),
                             x -> ${graft.functions.Hashing.duck32("x")} % 2147483647)) AS g
                      FROM t),
               f AS (SELECT doc_id, lang, g % 1024 AS b FROM fx),
               bk AS (SELECT b, count(*) AS raw_n,
                             sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS tgt_n
                      FROM f GROUP BY b),
               tots AS (SELECT sum(raw_n) AS raw_tot, sum(tgt_n) AS tgt_tot FROM bk),
               lam AS (SELECT b, ln((tgt_n + 1.0) / (tgt_tot + 1024.0))
                               - ln((raw_n + 1.0) / (raw_tot + 1024.0)) AS lam
                       FROM bk, tots),
               wt AS (SELECT doc_id, lang, count(*) AS n_feats,
                             ${Det.sqlSum("lam", 6)} AS w
                      FROM f JOIN lam USING (b) GROUP BY doc_id, lang),
               k AS (SELECT doc_id, lang, n_feats,
                            CAST(w + (-ln(-ln((${graft.functions.Hashing.duck32("'dsir:' || doc_id")} + 0.5)
                                              / 4294967296.0)))
                                 AS DECIMAL(38,6)) AS skey
                     FROM wt),
               top AS (SELECT * FROM k ORDER BY skey DESC, doc_id LIMIT $dsirK)
               SELECT CAST(row_number() OVER (ORDER BY skey DESC, doc_id) AS BIGINT) AS rank,
                      doc_id, lang, CAST(n_feats AS BIGINT) AS n_feats,
                      printf('%.6f', CAST(skey AS DOUBLE)) AS score
               FROM top"""
}
