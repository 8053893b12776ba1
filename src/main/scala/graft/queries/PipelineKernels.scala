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

  private[queries] val toks = "split(text, ' ')"

  /** md5-derived percentile bucket of a doc id ∈ [0, 100) — the
    * deterministic, engine-portable alternative to Bernoulli sampling:
    * membership is a pure function of the id, so splits are stable
    * across runs, engines, and repartitioning ([[graft.functions.Hashing]]). */
  private[queries] def pctSql(idExpr: String): String =
    s"${graft.functions.Hashing.h32Sql(s"concat('split:', $idExpr)")} % 100"
  private[queries] def duckPct(idExpr: String): String =
    s"(${graft.functions.Hashing.duck32(s"'split:' || $idExpr")} % 100)"

  /** Deterministic eval-split membership (10% of the corpus), shared
    * by the decontamination formulations (c02/c04/stream06) and c03. */
  val evalPredSql: String = s"${pctSql("'eval:' || doc_id")} < 10"

  /** (doc_id, is_eval, g) — every 13-gram of every document, the
    * decontamination candidate universe shared by c02, c04 and the
    * stream06 streaming twin. Works on any (doc_id, text) frame —
    * batch table or stream (the projection is map-only). */
  def decontGrams(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs
      .selectExpr("doc_id", s"$evalPredSql as is_eval",
        s"""case when size($toks) >= 13
              then transform(sequence(1, size($toks) - 12), i -> array_join(slice($toks, i, 13), ' '))
              else array() end as gs""")
      .select(col("doc_id"), col("is_eval"), explode(col("gs")).as("g"))

  private[queries] def decontGrams(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    decontGrams(Tables(s, d, "documents"))

  /** One oracle for both decontamination formulations — c04's bloom
    * prefilter is exact after its verify join, so c02 and c04 share
    * this SQL verbatim. */
  private[queries] val decontOracle: String = {
    val duckEval = s"(${duckPct("'eval:' || doc_id")} < 10)"
    s"""WITH toks AS (SELECT doc_id, $duckEval AS is_eval,
                             string_split(text, ' ') AS t FROM documents),
        grams AS (SELECT doc_id, is_eval, array_to_string(t[i:i+12], ' ') AS g
                  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 12)) AS i)
                  WHERE len(t) >= 13),
        ev AS (SELECT DISTINCT g FROM grams WHERE is_eval),
        hits AS (SELECT DISTINCT doc_id FROM grams
                 WHERE NOT is_eval AND g IN (SELECT g FROM ev))
        SELECT d.doc_id, (h.doc_id IS NOT NULL) AS contaminated
        FROM documents d LEFT JOIN hits h USING (doc_id)
        WHERE NOT $duckEval"""
  }

  /** Two-phase global prefix sum behind p03. A single-partition window
    * is a non-starter at 100 TB, so this runs the canonical form —
    * range partition by doc_id, cumsum within each partition, then add
    * driver-prefix-summed per-partition offsets (one row PER PARTITION
    * crosses the driver, thousands at most, regardless of data size).
    * Range partitioning keeps the global doc_id order across
    * partitions, so the result equals the single-window formulation
    * the oracle uses — for ANY `width` (the per-partition offsets
    * compose): the query entry passes `defaultParallelism` so task
    * size shrinks as executors are added, and [[PipelineSpec]] asserts
    * width-invariance of the output. */
  def seqPack(s: org.apache.spark.sql.SparkSession, d: String,
      width: Int): org.apache.spark.sql.DataFrame =
    packCum(s, d, width).selectExpr("doc_id", "n", "(cum - n) div 256 as seq_id")

  /** (doc_id, n, cum): each document's token count and the EXCLUSIVE
    * global prefix sum's end (cum = tokens up to and including this
    * doc, in doc_id order) — the two-phase prefix sum shared by p03
    * and p07. Range-partitioned at `width`; one row per partition
    * crosses the driver. */
  private[queries] def packCum(s: org.apache.spark.sql.SparkSession, d: String,
      width: Int): org.apache.spark.sql.DataFrame = {
    val parts = Tables(s, d, "documents")
      .selectExpr("doc_id", s"size($toks) as n")
      .repartitionByRange(width, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .withColumn("pid", spark_partition_id())
      .persistScoped()
    val offsets = parts.groupBy("pid").agg(sum("n").as("tot"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
      .scanLeft((0, 0L)) { case ((_, acc), (pid, tot)) => (pid, acc + tot) }
      .sliding(2).collect { case Array((_, off), (pid, _)) => (pid, off) }.toSeq
    import s.implicits._
    val offDf = broadcast(offsets.toDF("pid", "off"))
    parts.join(offDf, "pid")
      .withColumn("cum", col("off") + sum("n").over(
        org.apache.spark.sql.expressions.Window.partitionBy("pid")
          .orderBy("doc_id").rowsBetween(Long.MinValue, 0)))
      .select("doc_id", "n", "cum")
  }

  /** Deterministic global shuffle + round-robin sharding of an id
    * frame (see p05): md5 shuffle key, two-phase global rank (range
    * partition at `width`, one count row per partition to the driver,
    * offset + within-partition row_number — never a single-partition
    * window), shard = rank % nShards, pos = rank div nShards. */
  def shardShuffle(df: org.apache.spark.sql.DataFrame, nShards: Int,
      width: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = df.sparkSession
    graft.functions.Hashing.register(s)
    val keyed = df
      .selectExpr("doc_id", s"${graft.functions.Hashing.h32Sql("concat('shuf:', doc_id)")} as k")
      .repartitionByRange(width, col("k"), col("doc_id"))
      .sortWithinPartitions("k", "doc_id")
      .withColumn("pid", spark_partition_id())
      .persistScoped()
    val offsets = keyed.groupBy("pid").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
      .scanLeft((0, 0L)) { case ((_, acc), (pid, n)) => (pid, acc + n) }
      .sliding(2).collect { case Array((_, off), (pid, _)) => (pid, off) }.toSeq
    import s.implicits._
    keyed.join(broadcast(offsets.toDF("pid", "off")), "pid")
      .withColumn("rn",
        col("off") + row_number().over(Window.partitionBy("pid").orderBy("k", "doc_id")) - 1)
      .selectExpr("doc_id", s"rn % $nShards as shard", s"rn div $nShards as pos")
  }

  // p24 lives with its kernels in PipelineKernels (one semantics,
  // two execution tiers with stream28)
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
  private[graft] def histArtifactDir: String =
    graft.RunScratch.path("drift-hist")

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

  private[graft] def dsirArtifactDir: String =
    graft.RunScratch.path("dsir-buckets")

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
  private[graft] def sampleArtifactDir: String =
    graft.RunScratch.path("bottomk-sample")

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
