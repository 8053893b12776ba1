package graft.queries

import graft.CacheScope.PersistScopedOps
import graft.{Det, Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** End-to-end corpus-cleaning composition — the job a training-data
  * pipeline actually runs at 100 TB, assembled from the tier
  * operators: near-dup removal (MinHash-LSH pairs from d03, keep the
  * smallest doc_id of each dup cluster edge), quality floor (t02's
  * score), and language allowlist. One pass over the corpus plus the
  * LSH candidate machinery; the dup-id set is a broadcast-able
  * left-anti join side (dup pairs ≪ corpus by construction).
  */
object Pipeline {

  import PipelineKernels._

  lazy val all: Map[String, Q] = entries + PipelineKernels.dsirEntry

  private def entries: Map[String, Q] = Map(
    // ── deterministic train/val/test split (80/10/10 by hash bucket) ──
    "p01_split_assign" -> Q(
      (s, d) => {
        graft.functions.Hashing.register(s)
        Tables(s, d, "documents").selectExpr(
          "doc_id",
          s"""case when ${pctSql("doc_id")} < 80 then 'train'
                   when ${pctSql("doc_id")} < 90 then 'val'
                   else 'test' end as split""")
      },
      Some(s"""SELECT doc_id,
                      CASE WHEN ${duckPct("doc_id")} < 80 THEN 'train'
                           WHEN ${duckPct("doc_id")} < 90 THEN 'val'
                           ELSE 'test' END AS split
               FROM documents""")),

    // ── deterministic stratified sample: per-language rates ──
    "p02_stratified_sample" -> Q(
      (s, d) => {
        graft.functions.Hashing.register(s)
        Tables(s, d, "documents")
          .selectExpr("doc_id", "lang", s"${pctSql("doc_id")} as pct")
          .where("""pct < (case lang when 'en' then 20 when 'es' then 10 else 5 end)""")
          .select("doc_id", "lang")
      },
      Some(s"""SELECT doc_id, lang FROM
                 (SELECT doc_id, lang, ${duckPct("doc_id")} AS pct FROM documents)
               WHERE pct < (CASE lang WHEN 'en' THEN 20 WHEN 'es' THEN 10 ELSE 5 END)""")),
    // ── sequence packing: concat-then-chunk documents (doc_id order)
    // into fixed 256-token training sequences. seq_id = which chunk
    // the doc's FIRST token lands in. See [[seqPack]]. ──
    "p03_seq_pack" -> Q(
      (s, d) => seqPack(s, d, s.sparkContext.defaultParallelism),
      Some("""SELECT doc_id, n, CAST((cum - n) // 256 AS BIGINT) AS seq_id FROM
                (SELECT doc_id, n,
                        CAST(sum(n) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
                 FROM (SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents))""")),

    // ── packed-sequence boundary map: for every 256-token training
    // sequence, the ordered (doc_id, seg_start, seg_len) segments
    // that fill it — the attention-mask/loss-boundary metadata a
    // packer must emit alongside p03's assignment (a doc spanning a
    // chunk boundary contributes a segment to EACH sequence it
    // crosses). Same two-phase prefix sum as p03 (no single-partition
    // window), then a map-only explode over the seq range each doc
    // covers — a doc adds ceil(n/256)+1 rows at most, so the fan-out
    // is bounded by total tokens / 256, linear at 100 TB. ──
    "p07_pack_segments" -> Q(
      (s, d) => packCum(s, d, s.sparkContext.defaultParallelism)
        .selectExpr("doc_id", "cum - n as st", "cum as en")
        .selectExpr("doc_id", "st", "en",
          "explode(sequence(st div 256, (en - 1) div 256)) as seq_id")
        .selectExpr("seq_id", "doc_id",
          "greatest(st, seq_id * 256) - seq_id * 256 as seg_start",
          "least(en, (seq_id + 1) * 256) - greatest(st, seq_id * 256) as seg_len"),
      Some("""WITH c AS (SELECT doc_id, n,
                     CAST(sum(n) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
                   FROM (SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents)),
              e AS (SELECT doc_id, cum - n AS st, cum AS en,
                           unnest(generate_series((cum - n) // 256, (cum - 1) // 256)) AS seq_id
                    FROM c)
              SELECT seq_id, doc_id,
                     CAST(greatest(st, seq_id * 256) - seq_id * 256 AS BIGINT) AS seg_start,
                     CAST(least(en, (seq_id + 1) * 256) - greatest(st, seq_id * 256) AS BIGINT) AS seg_len
              FROM e""")),

    // ── deterministic source mixing: sample each source so the output
    // matches target RELATIVE weights without oversampling any source.
    // The feasible total T = min_s floor(n_s·S/w_s) (the limiting
    // source is taken whole); take_s = floor(T·w_s/S); membership is
    // the doc-id hash — all integer arithmetic, floor points mirrored
    // in the oracle so both engines agree bit-for-bit. Scale shape:
    // one partial-agg'd count per source (tiny frame), two 1-row
    // scalar reductions broadcast back, then a map-side hash filter —
    // the corpus is never shuffled. The gate mixture weights sources
    // 2:3:4:5 by source number mod 4. ──
    "p04_source_mix" -> Q(
      (s, d) => {
        graft.functions.Hashing.register(s)
        val docs = Tables(s, d, "documents")
        // persisted: this few-row frame feeds FOUR subtrees (s_tot,
        // t_out twice via the crossJoin, and the rates build) — without
        // the persist each one re-runs the full corpus count scan
        val n = docs.groupBy("source").agg(count(lit(1)).as("n_s"))
          .selectExpr("source", "n_s",
            "cast(1000 + 500 * (cast(substring(source, 4) as int) % 4) as bigint) as w")
          .persistScoped()
        val sTot = broadcast(n.agg(sum("w").as("s_tot")))
        val n2 = n.crossJoin(sTot)
        val tOut = broadcast(n2.agg(min(expr("n_s * s_tot div w")).as("t_out")))
        val rates = n2.crossJoin(tOut)
          .selectExpr("source",
            "least(10000L, ((t_out * w div s_tot) * 10000) div n_s) as rate_bp")
        docs.join(broadcast(rates), "source")
          .where(s"${graft.functions.Hashing.h32Sql("concat('mix:', doc_id)")} % 10000 < rate_bp")
          .select("doc_id", "source")
      },
      Some(s"""WITH n AS (SELECT source, count(*) AS n_s,
                        CAST(1000 + 500 * (CAST(substr(source, 4) AS INT) % 4) AS BIGINT) AS w
                 FROM documents GROUP BY source),
               s AS (SELECT CAST(sum(w) AS BIGINT) AS s_tot FROM n),
               t AS (SELECT min(n_s * s_tot // w) AS t_out FROM n, s),
               r AS (SELECT source, least(10000, ((t_out * w // s_tot) * 10000) // n_s) AS rate_bp
                     FROM n, s, t)
               SELECT d.doc_id, d.source FROM documents d JOIN r USING (source)
               WHERE ${graft.functions.Hashing.duck32("'mix:' || doc_id")} % 10000 < rate_bp""")),

    // ── temperature-scaled language balancing: the multilingual
    // sampling step (p(L) ∝ |L|^α, α = 0.5 here) that keeps low-
    // resource languages from drowning — acceptance rate per language
    // is (n_min/n_L)^(1-α) = sqrt(n_min/n_L), so post-sample counts go
    // as sqrt(n_L) instead of n_L, with the smallest language taken
    // whole. Differs from p04 (explicit target weights) in that the
    // weights COME FROM the corpus statistics themselves. Determinism
    // across engines: the rate is computed as floor(sqrt(v)) over the
    // exact integer v = 10^8·n_min div n_L — integer division first,
    // then ONE correctly-rounded IEEE sqrt whose floor is exact for
    // v < 2^52 — and membership is the doc-id hash, not an RNG. Scale
    // shape: a partial-agg'd per-language count (|langs| rows), a
    // 1-row min broadcast back, then a map-side broadcast-join +
    // hash filter — the corpus never shuffles. ──
    "p10_temperature_mix" -> Q(
      (s, d) => {
        graft.functions.Hashing.register(s)
        val docs = Tables(s, d, "documents")
        val n = docs.groupBy("lang").agg(count(lit(1)).as("n_l"))
        val nMin = broadcast(n.agg(min("n_l").as("n_min")))
        val rates = n.crossJoin(nMin)
          .selectExpr("lang",
            "cast(floor(sqrt((100000000L * n_min) div n_l)) as bigint) as rate_bp")
        docs.join(broadcast(rates), "lang")
          .where(s"${graft.functions.Hashing.h32Sql("concat('temp:', doc_id)")} % 10000 < rate_bp")
          .select("doc_id", "lang", "rate_bp")
      },
      Some(s"""WITH n AS (SELECT lang, count(*) AS n_l FROM documents GROUP BY lang),
               m AS (SELECT min(n_l) AS n_min FROM n),
               r AS (SELECT lang, CAST(floor(sqrt((100000000 * n_min) // n_l)) AS BIGINT) AS rate_bp
                     FROM n, m)
               SELECT d.doc_id, d.lang, r.rate_bp FROM documents d JOIN r USING (lang)
               WHERE ${graft.functions.Hashing.duck32("'temp:' || doc_id")} % 10000 < rate_bp""")),

    // ── deterministic global shuffle + round-robin sharding: the
    // training-output step after cleaning. Every doc gets a stable
    // md5-derived shuffle key; global rank over (key, doc_id) is the
    // shuffled order; shard = rank % 8 deals docs out round-robin
    // (perfectly balanced by construction), pos = rank div 8 is the
    // within-shard write order. The global rank uses the same
    // two-phase prefix-sum shape as [[seqPack]] — range partition on
    // the key at defaultParallelism width, count per partition, one
    // row PER PARTITION to the driver, offset + within-partition
    // row_number — never a single-partition global window. ──
    "p05_shard_shuffle" -> Q(
      (s, d) => shardShuffle(Tables(s, d, "documents"), 8,
        s.sparkContext.defaultParallelism),
      Some(s"""SELECT doc_id,
                      CAST((rn - 1) % 8 AS BIGINT) AS shard,
                      CAST((rn - 1) // 8 AS BIGINT) AS pos
               FROM (SELECT doc_id, row_number() OVER (ORDER BY k, doc_id) AS rn
                     FROM (SELECT doc_id,
                                  ${graft.functions.Hashing.duck32("'shuf:' || doc_id")} AS k
                           FROM documents))"""),
      bench = true),

    // ── benchmark decontamination: drop (flag) training docs sharing
    // any 13-gram with the eval split — the GPT-3-style n-gram
    // overlap rule, the step a training pipeline runs against every
    // benchmark before training. Eval membership is the same
    // deterministic hash-percentile as p01 (10% of the corpus — a
    // real benchmark suite is a visible slice, and the gate needs
    // both verdict classes populated). Scale
    // shape: the eval side's distinct grams are small WHEN the
    // benchmark suite is (the production case) — but they are
    // data-derived, not bounded by construction, so the broadcast is
    // AQE-ELECTED from the measured runtime size, never hinted (the
    // sf100 fixture's 10%-of-corpus eval slice is ~95M grams: the
    // old explicit hint shipped a ~7 GB broadcast there); the corpus
    // side joins its exploded grams against it — the TEXT never
    // shuffles; only (doc_id, hit) pairs reach the id-keyed
    // aggregation and the final id join. ──
    "c02_decontaminate" -> Q(
      // pure plan construction end to end → prepared per (session,
      // dir); see graft.PlanMemo for what is (and is not) cached
      (s, d) => graft.PlanMemo.of(s, s"c02:$d") {
        graft.functions.Hashing.register(s)
        val docs = Tables(s, d, "documents")
        val grams = decontGrams(s, d)
        val evalGrams = grams.where("is_eval").select("g").distinct()
        val hits = grams.where("not is_eval")
          .join(evalGrams, "g")
          .select("doc_id").distinct()
          .withColumn("contaminated", lit(true))
        docs.where(s"not ($evalPredSql)")
          .select("doc_id")
          .join(hits, Seq("doc_id"), "left")
          .selectExpr("doc_id", "coalesce(contaminated, false) as contaminated")
      },
      Some(decontOracle),
      bench = true),

    // ── decontamination at benchmark-SUITE scale: same contract and
    // oracle as c02, different candidate topology. c02's broadcast of
    // the exact eval-gram set is right while the benchmark suite is
    // small; when the eval side is itself huge (every public
    // benchmark plus held-out suites — billions of grams), the
    // broadcast no longer fits an executor. The scale answer is a
    // EVAL-SIZED bloom prefilter + exact verify: fold the eval
    // grams into Spark's mergeable BloomFilter sketch (bloom_agg —
    // a partial-agg'd binary sized ~10 bits per EVAL gram, so it
    // grows with the benchmark suite but never with the corpus —
    // the sf10 step caught the fixed-2^23-bit version saturating:
    // fpp → 1 at 100× eval size turned the "prefilter" into a
    // pass-through and the verify join into a full corpus-gram
    // shuffle, 33 s where 3 belonged), probe every corpus gram
    // MAP-SIDE with the codegen'd bloom_might over that literal,
    // and equi-join only the surviving ≈fpp fraction against the
    // eval grams for exactness —
    // false positives die in the verify join, so the result equals
    // c02 bit-for-bit and one oracle covers both formulations
    // (the j01/j03 and s01/s08 pattern). Corpus text never
    // broadcasts and never shuffles; the verify join carries only
    // bloom-surviving grams. ──
    "c04_decontaminate_bloom" -> Q(
      (s, d) => {
        graft.functions.Hashing.register(s)
        val docs = Tables(s, d, "documents")
        val grams = decontGrams(s, d)
        // persisted: the eval-gram set feeds the count, the bloom
        // build, AND the exact-verify join
        val evalGrams = grams.where("is_eval").select("g").distinct()
          .persistScoped()
        // size the sketch to the EVAL side: ~10 bits/gram (fpp ≈ 1%),
        // power-of-two, floor 2^23 (the old constant), cap 2^27
        // (16 MB literal — at that point the benchmark suite itself
        // is ~100 M grams and a partitioned-probe design is due)
        val nEval = math.max(1L, evalGrams.count())
        val bits = {
          var b = 8L << 20
          while (b < nEval * 10 && b < (1L << 27)) b <<= 1
          b
        }
        // One bounded row to the driver (the sketch itself), then a
        // Literal probe: BloomFilterMightContain requires a constant
        // or scalar-subquery filter side, and a Literal keeps the
        // probe inside whole-stage codegen.
        val bloomRow = evalGrams
          .agg(expr(s"bloom_agg(g, $nEval, $bits)").as("bf"))
          .head()
        val mightHit: Column =
          if (bloomRow.isNullAt(0)) lit(false) // no eval grams at all
          else org.apache.spark.sql.GraftSqlShims.column(
            org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
              org.apache.spark.sql.catalyst.expressions.Literal(
                bloomRow.getAs[Array[Byte]](0),
                org.apache.spark.sql.types.BinaryType),
              new org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(
                org.apache.spark.sql.GraftSqlShims.expression(col("g"))))))
        val hits = grams.where("not is_eval")
          .where(mightHit)
          .join(evalGrams, Seq("g"), "left_semi")
          .select("doc_id").distinct()
          .withColumn("contaminated", lit(true))
        docs.where(s"not ($evalPredSql)")
          .select("doc_id")
          .join(hits, Seq("doc_id"), "left")
          .selectExpr("doc_id", "coalesce(contaminated, false) as contaminated")
      },
      Some(decontOracle),
      bench = true),

    // ── keep-the-BEST-copy dedup: real pipelines don't keep the
    // smallest doc_id of a near-dup cluster, they keep the highest
    // QUALITY member. Composes d08's connected-component clusters
    // with t12's classifier score: per cluster, argmax score (tie →
    // min doc_id, the max_by lexicographic-struct pattern);
    // unclustered docs are kept by definition. Scale shape: the
    // cluster frame is dup-pairs-sized (≪ corpus), so the argmax is
    // a partial agg over a small frame; the corpus-wide verdict is a
    // left join on ids — text never moves. ──
    "c05_keep_best" -> Q(
      (s, d) => {
        graft.functions.Hashing.register(s)
        val clusters = Dedup.all("d08_dup_clusters").fn(s, d)
        val score = TextOps.all("t12_classifier_score").fn(s, d)
          .select("doc_id", "score_bp")
        val best = clusters.join(score, "doc_id")
          .groupBy("cluster")
          .agg(max_by(col("doc_id"), struct(col("score_bp"), negate(col("doc_id")))).as("keep_id"))
        Tables(s, d, "documents").select("doc_id")
          .join(score, "doc_id")
          .join(clusters, Seq("doc_id"), "left")
          .join(best, Seq("cluster"), "left") // cluster count is data-dependent: AQE elects the broadcast
          .selectExpr("doc_id", "cluster", "score_bp",
            "cluster is null or keep_id = doc_id as kept")
      },
      Some {
        val d08Sql = Dedup.all("d08_dup_clusters").oracle.get
        val t12Sql = TextOps.all("t12_classifier_score").oracle.get
        s"""WITH cl AS MATERIALIZED ($d08Sql),
            sc AS MATERIALIZED (SELECT doc_id, score_bp FROM ($t12Sql)),
            best AS (SELECT cluster, doc_id AS keep_id FROM
                       (SELECT cl.cluster, cl.doc_id,
                               row_number() OVER (PARTITION BY cl.cluster
                                 ORDER BY sc.score_bp DESC, cl.doc_id) AS rn
                        FROM cl JOIN sc USING (doc_id))
                     WHERE rn = 1)
            SELECT d.doc_id, cl.cluster, sc.score_bp,
                   (cl.cluster IS NULL OR best.keep_id = d.doc_id) AS kept
            FROM documents d
            JOIN sc ON sc.doc_id = d.doc_id
            LEFT JOIN cl ON cl.doc_id = d.doc_id
            LEFT JOIN best ON best.cluster = cl.cluster"""
      }),

    // ── the FLAGSHIP composition: the full training-data job, every
    // stage a tier operator — exact dedup (keep smallest doc_id per
    // identical text), near-dup removal (d03's verified LSH pairs,
    // persisted frame shared with d03/c01/d08/d09), map-only quality
    // floor (t11 repetition + t12 classifier score), eval exclusion +
    // 13-gram decontamination (c02), then the deterministic global
    // shuffle + round-robin sharding (p05) over the survivors. Scale
    // shape is the union of its parts: text crosses exactly TWO
    // exchanges (the md5 exact-dedup aggregate and d03's banded LSH),
    // everything else moves ids — quality is map-only, eval grams
    // broadcast, the final rank is the two-phase range-partition
    // prefix. One oracle covers the whole composition. ──
    "c03_train_pipeline" -> Q(
      (s, d) => {
        // everything up to the survivor id set is pure plan
        // construction (the dedup/quality/decontamination stages —
        // all lazy) → prepared once per (session, dir); the final
        // shardShuffle stays rebuilt per invocation (its two-phase
        // rank collects per-partition offsets — data-derived)
        val cleaned = graft.PlanMemo.of(s, s"c03cleaned:$d") { c03Cleaned(s, d) }
        shardShuffle(cleaned, 8, s.sparkContext.defaultParallelism)
      },
      Some {
        val dupSql = Dedup.all("d03_lsh_pairs").oracle.get
        val duckEval = s"(${duckPct("'eval:' || doc_id")} < 10)"
        val d32 = graft.functions.Hashing.duck32 _
        s"""WITH nd AS (SELECT DISTINCT d2 AS doc_id FROM ($dupSql)),
            ke AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
            tk AS (SELECT doc_id, string_split(text, ' ') AS t, $duckEval AS is_eval FROM documents),
            gq AS (SELECT doc_id, is_eval, t,
                     CASE WHEN len(t) >= 2
                       THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
                       ELSE [] END AS g2 FROM tk),
            q AS (SELECT doc_id FROM (
                    SELECT doc_id, is_eval,
                           CAST(10000 - (len(list_distinct(t)) * 10000) // len(t) AS BIGINT) AS dup_tok_bp,
                           CAST(CASE WHEN len(g2) > 0
                             THEN 10000 - (len(list_distinct(g2)) * 10000) // len(g2)
                             ELSE 0 END AS BIGINT) AS dup2_bp,
                           CAST(list_sum(list_transform(t, x -> (${d32("'w:' || x")} % 2001 - 1000))) AS BIGINT)
                             // len(t) AS score_bp
                    FROM gq)
                  WHERE NOT is_eval AND dup2_bp <= 800 AND dup_tok_bp <= 7000 AND score_bp > 0),
            grams AS (SELECT doc_id, is_eval, array_to_string(t[i:i+12], ' ') AS g
                      FROM tk, LATERAL (SELECT unnest(generate_series(1, len(t) - 12)) AS i)
                      WHERE len(t) >= 13),
            ev AS (SELECT DISTINCT g FROM grams WHERE is_eval),
            hits AS (SELECT DISTINCT doc_id FROM grams WHERE NOT is_eval AND g IN (SELECT g FROM ev)),
            cleaned AS (SELECT doc_id FROM q
                        WHERE doc_id IN (SELECT doc_id FROM ke)
                          AND doc_id NOT IN (SELECT doc_id FROM nd)
                          AND doc_id NOT IN (SELECT doc_id FROM hits))
            SELECT doc_id, CAST((rn - 1) % 8 AS BIGINT) AS shard, CAST((rn - 1) // 8 AS BIGINT) AS pos
            FROM (SELECT doc_id, row_number() OVER (ORDER BY k, doc_id) AS rn
                  FROM (SELECT doc_id, ${d32("'shuf:' || doc_id")} AS k FROM cleaned))"""
      },
      bench = true),

    // ── chunk-level dedup with document reassembly (RefinedWeb shape) ──
    // RefinedWeb/CCNet drop duplicated LINES from otherwise-unique
    // documents (boilerplate headers, navigation, license blocks)
    // rather than whole documents. The testdata corpus has no
    // newlines, so the unit is a fixed 10-token chunk — the delimiter
    // is a parameter of the shape, not of the algorithm: posexplode
    // chunks, count distinct documents per chunk, remove chunks seen
    // in ≥2 documents, and reassemble each document's surviving
    // chunks in original order (docs losing every chunk drop out).
    //
    // Scale shape: the chunk universe shuffles once for the
    // distinct+count (both partial-agg'd on the same key), the
    // common-chunk set is a vanishing fraction of the corpus so the
    // anti-join broadcasts under AQE, and reassembly is one per-doc
    // partial agg whose collect_list is bounded by document length —
    // never by corpus size. The corpus text crosses an exchange only
    // inside the per-doc reassembly agg.
    "c06_chunk_dedup" -> Q(
      (s, d) => {
        val chunks = Tables(s, d, "documents")
          .repartition(s.sparkContext.defaultParallelism)
          .select(col("doc_id"), posexplode(expr(
            s"""transform(sequence(0, (size($toks) - 1) div 10),
                          i -> array_join(slice($toks, i * 10 + 1, 10), ' '))""")))
          .toDF("doc_id", "pos", "chunk")
          .persistScoped()
        val common = chunks.select("doc_id", "chunk").distinct()
          .groupBy("chunk").agg(count(lit(1)).as("nd")).where("nd >= 2")
          .select("chunk")
        chunks.join(common, Seq("chunk"), "left_anti")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_kept"),
            array_join(
              transform(array_sort(collect_list(struct(col("pos"), col("chunk")))),
                x => x.getField("chunk")), " ").as("clean_text"))
          .select("doc_id", "n_kept", "clean_text")
      },
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
              ch AS (SELECT doc_id, i AS pos, array_to_string(t[i*10+1:i*10+10], ' ') AS chunk
                     FROM t, LATERAL (SELECT unnest(generate_series(0, (len(t)-1)//10)) AS i) g),
              common AS (SELECT chunk
                         FROM (SELECT chunk, count(DISTINCT doc_id) AS nd FROM ch GROUP BY chunk)
                         WHERE nd >= 2)
              SELECT doc_id, count(*) AS n_kept,
                     string_agg(chunk, ' ' ORDER BY pos) AS clean_text
              FROM ch WHERE chunk NOT IN (SELECT chunk FROM common)
              GROUP BY doc_id""")),

    // ── token-budget corpus assembly: per source, take documents in
    // quality order until the source's token budget is spent (the
    // budget-constrained selection step of corpus assembly — every
    // domain gets its allotment, best data first). One keyed
    // cumulative-sum window PER SOURCE: at 100 TB the source key is
    // domain-granular (millions of partitions), so the window
    // parallelizes naturally — never a global sort. ROWS frame +
    // total (quality, doc_id) tie-break make the prefix exact and
    // engine-independent. ──
    "p09_token_budget" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        Tables(s, d, "documents")
          .selectExpr("doc_id", "source",
            s"size($toks) as n_tokens",
            s"(size(array_distinct($toks)) * 10000) div size($toks) as uniq_bp")
          .selectExpr("doc_id", "source", "n_tokens",
            "(uniq_bp + (case when n_tokens >= 15 then 10000 else 0 end)) div 2 as quality_bp")
          .withColumn("cum", sum("n_tokens").over(
            Window.partitionBy("source")
              .orderBy(col("quality_bp").desc, col("doc_id"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .where("cum <= 800")
          .select("doc_id", "source", "n_tokens", "quality_bp", "cum")
      },
      Some("""WITH q AS (
                SELECT doc_id, source, len(string_split(text,' ')) AS n_tokens,
                       ((len(list_distinct(string_split(text,' '))) * 10000)
                          // len(string_split(text,' '))
                        + (CASE WHEN len(string_split(text,' ')) >= 15 THEN 10000 ELSE 0 END)) // 2
                         AS quality_bp
                FROM documents),
              c AS (SELECT doc_id, source, n_tokens, quality_bp,
                           CAST(sum(n_tokens) OVER (PARTITION BY source
                             ORDER BY quality_bp DESC, doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
                    FROM q)
              SELECT doc_id, source, n_tokens, quality_bp, cum
              FROM c WHERE cum <= 800""")),

    // ── epoch repeat-budget expansion (the data-constrained-scaling
    // schedule: repeat the best data up to N epochs instead of
    // training on junk once): quality tier → epoch count, map-only
    // explode into (doc_id, epoch) with a deterministic per-epoch
    // shuffle key so every epoch re-shuffles the corpus differently
    // but reproducibly. Fan-out ≤3× input rows, no exchange — the
    // shuffle key is CONSUMED by a downstream p05-style sharder. ──
    "p08_epoch_schedule" -> Q(
      (s, d) => {
        graft.functions.Hashing.register(s)
        Tables(s, d, "documents")
          .selectExpr("doc_id",
            s"(size(array_distinct($toks)) * 10000) div size($toks) as uniq_bp",
            s"size($toks) as n_tokens")
          .selectExpr("doc_id",
            "(uniq_bp + (case when n_tokens >= 15 then 10000 else 0 end)) div 2 as quality_bp")
          .selectExpr("doc_id", "quality_bp",
            "case when quality_bp >= 7600 then 3 when quality_bp >= 7000 then 2 else 1 end as n_epochs")
          .selectExpr("doc_id", "quality_bp", "n_epochs",
            "explode(sequence(1, n_epochs)) as epoch")
          .selectExpr("doc_id", "quality_bp", "n_epochs", "epoch",
            s"${graft.functions.Hashing.h32Sql("concat('ep:', epoch, ':', doc_id)")} as shuffle_key")
      },
      Some(s"""WITH q AS (
                 SELECT doc_id,
                        ((len(list_distinct(string_split(text,' '))) * 10000)
                           // len(string_split(text,' '))
                         + (CASE WHEN len(string_split(text,' ')) >= 15 THEN 10000 ELSE 0 END)) // 2
                          AS quality_bp
                 FROM documents),
               t AS (SELECT doc_id, quality_bp,
                            CASE WHEN quality_bp >= 7600 THEN 3
                                 WHEN quality_bp >= 7000 THEN 2 ELSE 1 END AS n_epochs
                     FROM q),
               e AS (SELECT doc_id, quality_bp, n_epochs,
                            unnest(generate_series(1, n_epochs)) AS epoch
                     FROM t)
               SELECT doc_id, quality_bp, n_epochs, epoch,
                      ${graft.functions.Hashing.duck32("'ep:' || epoch || ':' || doc_id")} AS shuffle_key
               FROM e""")),

    // ── quality-weighted resampling: keep each document with
    // probability proportional to its quality score (the DoReMi /
    // importance-resampling shape — up-weight good data WITHOUT a
    // hard cutoff). Acceptance is the deterministic doc-id hash
    // against the score itself: u(doc_id) ∈ [0,10000) < quality_bp,
    // so expected acceptance = quality_bp/10000 exactly, every engine
    // and every rerun agrees on the kept set, and the plan is one
    // map-only codegen'd projection+filter — no RNG, no shuffle,
    // linear at 100 TB. ──
    "p06_quality_resample" -> Q(
      (s, d) => {
        graft.functions.Hashing.register(s)
        Tables(s, d, "documents")
          .selectExpr("doc_id",
            s"(size(array_distinct($toks)) * 10000) div size($toks) as uniq_bp",
            s"size($toks) as n_tokens")
          .selectExpr("doc_id", "n_tokens",
            "(uniq_bp + (case when n_tokens >= 15 then 10000 else 0 end)) div 2 as quality_bp")
          .selectExpr("doc_id", "n_tokens", "quality_bp",
            s"${graft.functions.Hashing.h32Sql("concat('resample:', doc_id)")} % 10000 as u")
          .where("u < quality_bp")
          .select("doc_id", "n_tokens", "quality_bp")
      },
      Some(s"""WITH q AS (
                 SELECT doc_id, len(string_split(text,' ')) AS n_tokens,
                        ((len(list_distinct(string_split(text,' '))) * 10000)
                           // len(string_split(text,' '))
                         + (CASE WHEN len(string_split(text,' ')) >= 15 THEN 10000 ELSE 0 END)) // 2
                          AS quality_bp
                 FROM documents)
               SELECT doc_id, n_tokens, quality_bp FROM q
               WHERE (${graft.functions.Hashing.duck32("'resample:' || doc_id")} % 10000) < quality_bp""")),

    "c01_clean_corpus" -> Q(
      // pure plan construction end to end → prepared per (session,
      // dir); see graft.PlanMemo for what is (and is not) cached
      (s, d) => graft.PlanMemo.of(s, s"c01:$d") {
        // doc_ids to drop: the larger end of every verified dup pair —
        // computed storm-proof (exact pass + rep-LSH, same set; see
        // DedupKernels.dupDrops' equivalence proof)
        val drops = DedupKernels.dupDrops(s, d)
        val quality = Tables(s, d, "documents")
          .selectExpr("doc_id", "text", "lang",
            s"(size(array_distinct($toks)) * 10000) div size($toks) as uniq_bp",
            s"size($toks) as n_tokens")
          .selectExpr("doc_id", "lang", "n_tokens",
            "(uniq_bp + (case when n_tokens >= 15 then 10000 else 0 end)) div 2 as quality_bp")
        quality
          .where("lang in ('en', 'es') and quality_bp >= 4000")
          .join(drops, Seq("doc_id"), "left_anti")
          .select("doc_id", "lang", "n_tokens", "quality_bp")
      },
      Some {
        val dupSql = Dedup.all("d03_lsh_pairs").oracle.get
        s"""WITH drops AS (SELECT DISTINCT d2 AS doc_id FROM ($dupSql)),
            quality AS (
              SELECT doc_id, lang, len(string_split(text,' ')) AS n_tokens,
                     ((len(list_distinct(string_split(text,' '))) * 10000)
                        // len(string_split(text,' '))
                      + (CASE WHEN len(string_split(text,' ')) >= 15 THEN 10000 ELSE 0 END)) // 2
                       AS quality_bp
              FROM documents)
            SELECT doc_id, lang, n_tokens, quality_bp
            FROM quality
            WHERE lang IN ('en', 'es') AND quality_bp >= 4000
              AND doc_id NOT IN (SELECT doc_id FROM drops)"""
      },
      bench = true),

    // ── quality-annealed curriculum (p11): the end-of-pretraining
    // annealing schedule — phase 1 trains on everything, later phases
    // progressively restrict to higher-quality slices (phase 2 = top
    // two-thirds, phase 3 = top third). The phase thresholds are
    // EXACT rank statistics over the quality score, computed the t16
    // way: orderBy+limit+agg compiles to TakeOrderedAndProject
    // (per-partition top-k heads merged on the driver — never a
    // global sort or an unpartitioned window), each cut riding as a
    // broadcast 1-row frame. Membership is by VALUE against the cut
    // (ties straddling a cut all land in the later phase —
    // deterministic in both engines); the phase fan-out is a map-only
    // explode+filter, ≤3× rows, no exchange. One driver-side count()
    // sizes the ranks (O(1) result). ──
    "p11_quality_anneal" -> Q(
      (s, d) => {
        val q = Tables(s, d, "documents")
          .selectExpr("doc_id",
            s"(size(array_distinct($toks)) * 10000) div size($toks) as uniq_bp",
            s"size($toks) as n_tokens")
          .selectExpr("doc_id",
            "(uniq_bp + (case when n_tokens >= 15 then 10000 else 0 end)) div 2 as quality_bp")
          .persistScoped()
        val n = q.count()
        def cutAt(k: Long, name: String) = {
          require(k <= Int.MaxValue,
            s"corpus too large for exact phase cutpoints (k=$k); " +
              "compute cuts on a deterministic sample instead")
          q.orderBy(col("quality_bp").desc, col("doc_id"))
            .limit(k.toInt).agg(min("quality_bp").as(name))
        }
        val cut1 = cutAt((2 * n + 2) / 3, "cut1") // phase-2 floor (top 2/3)
        val cut2 = cutAt((n + 2) / 3, "cut2") // phase-3 floor (top 1/3)
        q.crossJoin(broadcast(cut1)).crossJoin(broadcast(cut2))
          .selectExpr("doc_id", "quality_bp", "explode(sequence(1, 3)) as phase",
            "cut1", "cut2")
          .where("phase = 1 or (phase = 2 and quality_bp >= cut1) or (phase = 3 and quality_bp >= cut2)")
          .select("doc_id", "phase", "quality_bp")
      },
      Some(s"""WITH q AS (
                 SELECT doc_id,
                        ((len(list_distinct(string_split(text,' '))) * 10000)
                           // len(string_split(text,' '))
                         + (CASE WHEN len(string_split(text,' ')) >= 15 THEN 10000 ELSE 0 END)) // 2
                          AS quality_bp
                 FROM documents),
               ranked AS (SELECT quality_bp,
                                 row_number() OVER (ORDER BY quality_bp DESC, doc_id) AS rn,
                                 count(*) OVER () AS n
                          FROM q),
               cuts AS (SELECT min(CASE WHEN rn <= (2 * n + 2) // 3 THEN quality_bp END) AS cut1,
                               min(CASE WHEN rn <= (n + 2) // 3 THEN quality_bp END) AS cut2
                        FROM ranked)
               SELECT doc_id, phase, quality_bp
               FROM q, cuts, (SELECT unnest(generate_series(1, 3)) AS phase)
               WHERE phase = 1 OR (phase = 2 AND quality_bp >= cut1)
                  OR (phase = 3 AND quality_bp >= cut2)""")),

    // ── the dataset card: the per-language release summary a corpus
    // ships with (what HF dataset cards / Dolma reports tabulate) —
    // doc and source counts, size totals, and the exact-duplicate
    // rate, one row per language. Two shuffles total at any corpus
    // size: a fingerprint-keyed partial agg to find duplicated
    // content (|distinct fps| rows cross, counts only — text never
    // shuffles twice), and the |langs|-keyed summary agg; the dup
    // verdict joins back fingerprint-keyed before the summary. Output
    // is |langs| rows — the card itself is driver-safe at 100 TB. ──
    "p12_dataset_card" -> Q(
      (s, d) => {
        val docs = Tables(s, d, "documents")
          .selectExpr("doc_id", "lang", "source", "n_chars",
            s"size($toks) as n_tokens", "md5(text) as fp")
          .persistScoped()
        val dupFps = docs.groupBy("fp").agg(count(lit(1)).as("n_copies"))
          .where("n_copies > 1")
        docs.join(dupFps, Seq("fp"), "left")
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            countDistinct("source").as("n_sources"),
            sum("n_chars").as("total_chars"),
            sum("n_tokens").as("total_tokens"),
            count(col("n_copies")).as("n_exact_dup"))
      },
      Some("""WITH f AS (SELECT doc_id, lang, source, n_chars,
                                len(string_split(text, ' ')) AS n_tokens,
                                md5(text) AS fp
                         FROM documents),
              dup AS (SELECT fp, count(*) AS n_copies FROM f
                      GROUP BY fp HAVING count(*) > 1)
              SELECT lang, count(*) AS n_docs,
                     count(DISTINCT source) AS n_sources,
                     CAST(sum(n_chars) AS BIGINT) AS total_chars,
                     CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
                     count(d.n_copies) AS n_exact_dup
              FROM f LEFT JOIN dup d ON d.fp = f.fp
              GROUP BY lang""")),

    // ── p13: DoReMi-flavored domain reweighting (Xie et al. 2023) —
    // one exponentiated-gradient step, linearized into exact integer
    // arithmetic: per-source mean "loss" (10000 − t12's classifier
    // score, so hard domains score high), excess over the corpus
    // mean, multiplicative update raw = max(10000 + excess, 100)
    // (the floor is DoReMi's uniform smoothing — no domain starves),
    // normalized to basis points. exp() is deliberately linearized:
    // IEEE exp differs across engines in the last ulp and the gate's
    // hash compare needs EXACT arithmetic — integer add/div is the
    // cross-engine-deterministic EG surrogate, same direction per
    // step. Topology: the corpus shuffles ONCE (source-keyed partial
    // agg riding t12's scoring pass); the two corpus-level scalars
    // attach via crossJoin(broadcast(empty-grouping agg)) — the
    // audited bounded scalar-attach shape — and everything after the
    // first agg is |sources|-sized. ──
    "p13_domain_reweight" -> Q(
      (s, d) => {
        val score = TextOps.all("t12_classifier_score").fn(s, d)
          .select("doc_id", "score_bp")
        val per = Tables(s, d, "documents").select("doc_id", "source")
          .join(score, "doc_id")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(expr("10000 - score_bp")).as("sum_loss"))
          .persistScoped()
        val tot = per.agg(sum("n_docs").as("n_tot"),
          sum("sum_loss").as("loss_tot"))
        val ex = per.crossJoin(broadcast(tot))
          .selectExpr("source", "n_docs",
            "sum_loss div n_docs as loss_bp",
            "sum_loss div n_docs - loss_tot div n_tot as excess_bp")
          .selectExpr("source", "n_docs", "loss_bp", "excess_bp",
            "greatest(10000 + excess_bp, 100L) as raw")
          .persistScoped()
        val norm = ex.agg(sum("raw").as("raw_tot"))
        ex.crossJoin(broadcast(norm))
          .selectExpr("source", "n_docs", "loss_bp", "excess_bp",
            "(raw * 10000) div raw_tot as weight_bp")
      },
      Some {
        val t12 = TextOps.all("t12_classifier_score").oracle.get
        s"""WITH sc AS (SELECT doc_id, score_bp FROM ($t12)),
            per AS (SELECT source, count(*) AS n_docs,
                           sum(10000 - score_bp) AS sum_loss
                    FROM documents d JOIN sc USING (doc_id)
                    GROUP BY source),
            tot AS (SELECT sum(n_docs) AS n_tot, sum(sum_loss) AS loss_tot
                    FROM per),
            ex AS (SELECT source, n_docs,
                          sum_loss // n_docs AS loss_bp,
                          sum_loss // n_docs - loss_tot // n_tot AS excess_bp,
                          greatest(10000 + (sum_loss // n_docs - loss_tot // n_tot),
                                   100) AS raw
                   FROM per, tot),
            nm AS (SELECT sum(raw) AS raw_tot FROM ex)
            SELECT source, n_docs, CAST(loss_bp AS BIGINT) AS loss_bp,
                   CAST(excess_bp AS BIGINT) AS excess_bp,
                   CAST((raw * 10000) // raw_tot AS BIGINT) AS weight_bp
            FROM ex, nm"""
      }),

    // ── p14: exact-k uniform sample via the BOTTOM-K-HASH sketch —
    // the one-pass, mergeable, without-replacement corpus sample
    // (tag every doc with a deterministic hash, keep the k smallest
    // tags; the tags are exchangeable, so the kept set is a uniform
    // k-subset, and re-running is reproducible bit-for-bit). The
    // ENGINE side computes it HIERARCHICALLY — per-shard bottom-k
    // (a shard-partitioned window, every shard in parallel, ≤k rows
    // survive per shard) then a global bottom-k over the ≤4k
    // survivors — which is exactly how a maintained per-shard sample
    // index serves at 100 TB (each shard keeps its own k-sketch; a
    // corpus sample is the merge of sketches, never a corpus scan).
    // The ORACLE rebuilds the sample FLAT (one global ORDER BY tag
    // LIMIT k), so the gate's hash compare IS the proof that
    // merge ≡ rebuild: bottom-k of a union = bottom-k of the
    // per-part bottom-k's. ──
    "p14_bottomk_sample" -> Q(
      (s, d) => {
        graft.functions.Hashing.register(s)
        val tagged = Tables(s, d, "documents")
          .repartition(s.sparkContext.defaultParallelism)
          .selectExpr("doc_id", "lang", "source",
            s"${graft.functions.Hashing.h32Sql("concat('smp:', doc_id)")} as tag",
            s"${graft.functions.Hashing.h32Sql("concat('shard:', doc_id)")} % 4 as shard")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("shard").orderBy(col("tag"), col("doc_id"))
        tagged.withColumn("rn", row_number().over(w))
          .where("rn <= 100")
          .orderBy("tag", "doc_id").limit(100)
          .select("doc_id", "lang", "source", "tag")
      },
      Some(s"""SELECT doc_id, lang, source,
                      ${graft.functions.Hashing.duck32("'smp:' || doc_id")} AS tag
               FROM documents
               ORDER BY tag, doc_id LIMIT 100""")),

    // ── p15: WEIGHTED sample without replacement — priority sampling
    // (sequential-Poisson/Ohlsson): each doc draws priority u/w and
    // the k smallest win, so inclusion odds scale with weight while
    // the draw stays one-pass, mergeable and reproducible (same
    // bottom-k algebra as p14, same TakeOrderedAndProject shape).
    // The textbook priority is -ln(u)/w — transcendental, and IEEE
    // ln differs across engines in the last ulp — so the priority is
    // the INTEGER surrogate (u * 10000) div w_bp over the md5 tag:
    // same ordering statistics family, exact in both engines, no
    // parity bet. Weights are t12's classifier score shifted
    // positive — the "sample what the quality model likes, but keep
    // tail mass" resampling a curriculum builder runs. ──
    "p15_weighted_sample" -> Q(
      (s, d) => {
        graft.functions.Hashing.register(s)
        val score = TextOps.all("t12_classifier_score").fn(s, d)
          .select("doc_id", "score_bp")
        Tables(s, d, "documents").select("doc_id", "lang", "source")
          .join(score, "doc_id")
          .selectExpr("doc_id", "lang", "source", "score_bp + 1001 as w_bp",
            s"${graft.functions.Hashing.h32Sql("concat('wsmp:', doc_id)")} as u")
          .selectExpr("doc_id", "lang", "source", "w_bp",
            "(u * 10000) div w_bp as tag")
          .orderBy("tag", "doc_id").limit(100)
          .select("doc_id", "lang", "source", "w_bp", "tag")
      },
      Some {
        val t12 = TextOps.all("t12_classifier_score").oracle.get
        s"""WITH sc AS (SELECT doc_id, score_bp FROM ($t12)),
            x AS (SELECT d.doc_id, lang, source, score_bp + 1001 AS w_bp,
                         ${graft.functions.Hashing.duck32("'wsmp:' || doc_id")} AS u
                  FROM documents d JOIN sc USING (doc_id))
            SELECT doc_id, lang, source, w_bp, (u * 10000) // w_bp AS tag
            FROM x ORDER BY tag, doc_id LIMIT 100"""
      }),

    // ── p16: LEAKAGE-FREE train/eval split. p01's id-keyed split has
    // a failure mode every eval number inherits: two near-duplicate
    // documents hash to different sides, and the eval set silently
    // contains the training set's paraphrases (Lee et al. 2022
    // measure the inflation). The unit of assignment must be the
    // near-dup COMPONENT, not the document: group = d08's connected
    // component over the verified MinHash-LSH pair graph (singletons
    // = the doc itself), side = hash of the GROUP id — membership is
    // a pure function of the component, so a group structurally
    // cannot straddle the cut. Scale shape: d08's component labels
    // (large-star/small-star, checkpoint-cut) plus ONE left join of
    // the corpus against the bounded cluster frame and a map-only
    // hash — no new corpus shuffle beyond the labeling it reuses;
    // the spec demonstrates the id-keyed counterfactual would have
    // split a real dup group. ──
    "p16_leakfree_split" -> Q(
      (s, d) => {
        graft.functions.Hashing.register(s)
        val clusters = Dedup.all("d08_dup_clusters").fn(s, d)
        Tables(s, d, "documents").select("doc_id")
          .join(clusters, Seq("doc_id"), "left")
          .selectExpr("doc_id", "coalesce(cluster, doc_id) as grp")
          .selectExpr("doc_id", "grp",
            s"""case when ${graft.functions.Hashing.h32Sql(
              "concat('gsplit:', cast(grp as string))")} % 100 < 90
                  then 'train' else 'eval' end as split""")
      },
      Some(s"""${DedupKernels.duckClusters}
               SELECT d.doc_id,
                      coalesce(cl.cluster, d.doc_id) AS grp,
                      CASE WHEN ${graft.functions.Hashing.duck32(
                        "'gsplit:' || coalesce(cl.cluster, d.doc_id)")} % 100 < 90
                           THEN 'train' ELSE 'eval' END AS split
               FROM documents d LEFT JOIN cl ON cl.doc_id = d.doc_id""")),

    // ── p17: deterministic mid-epoch RESUME — the property that makes
    // a 10k-GPU run restartable: the epoch order is a pure function
    // (p08's md5 shuffle key), so "continue after checkpoint cursor
    // K" is a FILTER + bounded top-k on (shuffle_key, doc_id) — one
    // scan, per-partition heap heads merged on the driver
    // (TakeOrderedAndProject) — never a global sort of the epoch and
    // never a replay of consumed examples. The cursor here is the
    // keyspace midpoint (a checkpoint stores the last consumed
    // (shuffle_key, doc_id) pair; the literal stands in for it);
    // the post-limit position stamp is a ≤100-row window —
    // calendar-bounded, whitelisted like t17's. ──
    "p17_epoch_resume" -> Q(
      (s, d) => {
        graft.functions.Hashing.register(s)
        val ep2 = all("p08_epoch_schedule").fn(s, d)
          .where("epoch = 2").select("doc_id", "shuffle_key")
        ep2.where("shuffle_key >= 2147483648")
          .orderBy(col("shuffle_key"), col("doc_id")).limit(100)
          .withColumn("pos", row_number().over(
            org.apache.spark.sql.expressions.Window
              .orderBy(col("shuffle_key"), col("doc_id"))))
          .select("pos", "doc_id", "shuffle_key")
      },
      Some(s"""WITH q AS (
                 SELECT doc_id,
                        ((len(list_distinct(string_split(text,' '))) * 10000)
                           // len(string_split(text,' '))
                         + (CASE WHEN len(string_split(text,' ')) >= 15 THEN 10000 ELSE 0 END)) // 2
                          AS quality_bp
                 FROM documents),
               t AS (SELECT doc_id,
                            CASE WHEN quality_bp >= 7600 THEN 3
                                 WHEN quality_bp >= 7000 THEN 2 ELSE 1 END AS n_epochs
                     FROM q),
               e2 AS (SELECT doc_id,
                             ${graft.functions.Hashing.duck32("'ep:2:' || doc_id")} AS shuffle_key
                      FROM t WHERE n_epochs >= 2),
               nxt AS (SELECT doc_id, shuffle_key FROM e2
                       WHERE shuffle_key >= 2147483648
                       ORDER BY shuffle_key, doc_id LIMIT 100)
               SELECT CAST(row_number() OVER (ORDER BY shuffle_key, doc_id) AS INTEGER) AS pos,
                      doc_id, shuffle_key
               FROM nxt""")),

    // ── p19: DRIFT monitor — the ingest-time distribution-shift
    // alarm every continuously-fed corpus needs (a crawler that
    // silently starts returning truncated pages shifts the length
    // distribution long before any per-doc filter fires): the
    // d14 re-crawl shard's document-length histogram compared
    // against the corpus baseline on the SAME bucket grid (d21's
    // integer histogram, baseline extents frozen; shard values
    // outside the baseline range clamp to the edge buckets — the
    // out-of-range mass is exactly what drift looks like), per
    // bucket the share delta, and the total-variation distance in
    // basis points as the alarm dial (TV = Σ|Δshare| / 2 — fully
    // integer, no ln(), so the cross-engine compare is exact where
    // a PSI's logarithm could never be). Scale: two bucket-keyed
    // partial aggs (corpus + shard) to ≤128 rows each, everything
    // downstream bucket-bounded; the baseline histogram is the d21
    // artifact a production monitor reads, not recomputes. ──
    "p19_drift_monitor" -> Q(
      (s, d) => {
        graft.functions.Hashing.register(s)
        val docs = Tables(s, d, "documents")
        val base = docs.selectExpr("length(text) as n_chars")
        val (lo, hi, nb) = {
          val r = base.agg(min("n_chars").as("lo"), max("n_chars").as("hi"),
            count(lit(1)).as("n")).head
          (r.getInt(0).toLong, r.getInt(1).toLong, r.getLong(2))
        }
        val w = (hi - lo) / 128 + 1
        val shard = graft.queries.DedupKernels.shardDocs(docs)
          .selectExpr("length(text) as n_chars")
        driftFinish(lenHist(base, lo, w), lenHist(shard, lo, w), nb, shard.count())
      },
      Some(driftOracle)),

    // ── p18: CURRICULUM ordering — the easiest→hardest global
    // training order (curriculum learning's data schedule): every
    // doc ranked by the shared corpus quality signal (p06/p09's
    // uniq-ratio + length floor), contiguously and deterministically,
    // and cut into warmup/main/hard phase terciles by RANK (exact,
    // not score quantiles — phases are equal-sized by construction).
    // The global rank is the p03/p05 two-phase prefix sum: range
    // partition on (−quality, doc_id), one count row per partition
    // to the driver, offset + within-partition row_number — never a
    // single-partition window, at any corpus size. ──
    "p18_curriculum_order" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val width = s.sparkContext.defaultParallelism
        val scored = Tables(s, d, "documents")
          .selectExpr("doc_id",
            s"size($toks) as n_tokens",
            s"(size(array_distinct($toks)) * 10000) div size($toks) as uniq_bp")
          .selectExpr("doc_id",
            "(uniq_bp + (case when n_tokens >= 15 then 10000 else 0 end)) div 2 as q")
          .selectExpr("doc_id", "q", "-q as nq")
          .repartitionByRange(width, col("nq"), col("doc_id"))
          .sortWithinPartitions("nq", "doc_id")
          .withColumn("pid", spark_partition_id())
          .persistScoped()
        val counts = scored.groupBy("pid").count()
          .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
        val total = counts.map(_._2).sum
        val offsets = counts
          .scanLeft((0, 0L)) { case ((_, acc), (pid, n)) => (pid, acc + n) }
          .sliding(2).collect { case Array((_, off), (pid, _)) => (pid, off) }.toSeq
        import s.implicits._
        scored.join(broadcast(offsets.toDF("pid", "off")), "pid")
          .withColumn("rank", col("off") + row_number().over(
            Window.partitionBy("pid").orderBy("nq", "doc_id")) - 1)
          .selectExpr("doc_id", "q as quality_bp", "rank",
            s"""case when rank * 3 < $total then 'warmup'
                     when rank * 3 < 2 * $total then 'main'
                     else 'hard' end as phase""")
      },
      Some("""WITH q AS (
                SELECT doc_id,
                       ((len(list_distinct(string_split(text,' '))) * 10000)
                          // len(string_split(text,' '))
                        + (CASE WHEN len(string_split(text,' ')) >= 15 THEN 10000 ELSE 0 END)) // 2
                         AS quality_bp
                FROM documents),
              r AS (SELECT doc_id, quality_bp,
                           row_number() OVER (ORDER BY quality_bp DESC, doc_id) - 1 AS rank,
                           count(*) OVER () AS n
                    FROM q)
              SELECT doc_id, quality_bp, CAST(rank AS BIGINT) AS rank,
                     CASE WHEN rank * 3 < n THEN 'warmup'
                          WHEN rank * 3 < 2 * n THEN 'main'
                          ELSE 'hard' END AS phase
              FROM r""")),

    // ── c08: CANARY-string scan — the benchmark-leakage tripwire
    // next to c02/c04's n-gram overlap and c07's near-dup sweep:
    // eval suites embed unique canary GUIDs (the BIG-bench practice)
    // precisely so a training pipeline can detect verbatim benchmark
    // ingestion with an exact substring scan, no gram machinery.
    // The whole scan is ONE codegen'd map pass through the native
    // multi_find Aho-Corasick kernel — each row's text is walked ONCE
    // regardless of how many canaries are registered (O(|text|+hits),
    // vs the O(|text|·k) per-pattern contains() walk this replaced),
    // no join, no shuffle until the |suites|-sized hit agg; corpus
    // text never moves, and the automaton is a plan-time constant
    // cached per pattern set. Leaked docs are PLANTED via a
    // bounded literal union (the t21 planting pattern: the gate must
    // exercise both verdict classes; the synthetic corpus cannot
    // contain a GUID by chance), including a suite with zero leaks —
    // the all-clear row a real scan report must still publish. ──
    "c08_canary_scan" -> Q(
      (s, d) => {
        import s.implicits._
        graft.functions.Hashing.register(s)
        val pats = canarySuites.map { case (_, c) => s"'$c'" }.mkString(", ")
        val suiteArr = canarySuites.map { case (su, _) => s"'$su'" }
          .mkString("array(", ", ", ")")
        val corpus = Tables(s, d, "documents").select("doc_id", "text")
          .union(plantedLeaks.toDF("doc_id", "text"))
        val hits = corpus
          .selectExpr("doc_id", s"explode(multi_find(text, $pats)) as pidx")
          .selectExpr("doc_id", s"element_at($suiteArr, pidx + 1) as suite")
          .groupBy("suite")
          .agg(count(lit(1)).as("n_hits"), min("doc_id").as("first_doc"))
        canarySuites.toDF("suite", "canary")
          .join(broadcast(hits), Seq("suite"), "left")
          .selectExpr("suite", "canary",
            "coalesce(n_hits, 0L) as n_hits",
            "coalesce(first_doc, -1L) as first_doc")
      },
      Some {
        val vals = plantedLeaks.map { case (id, t) =>
          s"(CAST($id AS BIGINT), '$t')"
        }.mkString(", ")
        val cans = canarySuites.map { case (su, c) => s"('$su', '$c')" }
          .mkString(", ")
        s"""WITH corpus AS (SELECT doc_id, text FROM documents
                            UNION ALL
                            SELECT * FROM (VALUES $vals) p(doc_id, text)),
            can AS (SELECT * FROM (VALUES $cans) c(suite, canary)),
            h AS (SELECT suite, count(*) AS n_hits, min(doc_id) AS first_doc
                  FROM corpus JOIN can ON contains(text, canary)
                  GROUP BY suite)
            SELECT suite, canary,
                   CAST(coalesce(n_hits, 0) AS BIGINT) AS n_hits,
                   CAST(coalesce(first_doc, -1) AS BIGINT) AS first_doc
            FROM can LEFT JOIN h USING (suite)"""
      }),

    // ── p20: PREFERENCE-PAIR mining — the DPO/RLHF dataset builder
    // that needs no human labels: inside each near-dup cluster the
    // members are the same content in different states of decay
    // (boilerplate-injected, truncated, re-encoded), so (best, worst)
    // by the quality classifier is a meaningful (chosen, rejected)
    // pair with a real margin — the weak-supervision trick of
    // mining preference structure from redundancy the crawl already
    // paid for. Composition: d08's connected components (the verified
    // near-dup groups) ⋈ t12's classifier scores, then ONE
    // cluster-keyed agg whose (score, id) struct-extremes pick both
    // poles tie-deterministically; zero-margin clusters are dropped
    // (no learning signal). Scale shape: the cluster frame is
    // pair-graph-bounded (a vanishing fraction of the corpus), the
    // join is cluster-member-sized, and the agg holds two structs per
    // cluster — nothing corpus-global beyond the labeling d08
    // already computed. ──
    "p20_preference_pairs" -> Q(
      (s, d) => {
        val clusters = Dedup.all("d08_dup_clusters").fn(s, d)
        val scores = TextOps.all("t12_classifier_score").fn(s, d)
          .select("doc_id", "score_bp")
        clusters.join(scores, "doc_id")
          .groupBy("cluster")
          .agg(count(lit(1)).as("n_members"),
            max(struct(col("score_bp"), col("doc_id"))).as("hi"),
            min(struct(col("score_bp"), col("doc_id"))).as("lo"))
          .where("hi.score_bp > lo.score_bp")
          .selectExpr("cluster", "n_members",
            "hi.doc_id as chosen_id", "lo.doc_id as rejected_id",
            "hi.score_bp - lo.score_bp as margin_bp")
      },
      Some {
        val t12 = TextOps.all("t12_classifier_score").oracle.get
        s"""${DedupKernels.duckClusters},
            sc AS (SELECT doc_id, score_bp FROM ($t12)),
            j AS (SELECT cluster, c.doc_id, score_bp
                  FROM cl c JOIN sc USING (doc_id)),
            g AS (SELECT cluster, count(*) AS n_members,
                         (max(struct_pack(s := score_bp, id := doc_id))).id AS chosen_id,
                         (max(struct_pack(s := score_bp, id := doc_id))).s AS hi_s,
                         (min(struct_pack(s := score_bp, id := doc_id))).id AS rejected_id,
                         (min(struct_pack(s := score_bp, id := doc_id))).s AS lo_s
                  FROM j GROUP BY cluster)
            SELECT cluster, CAST(n_members AS BIGINT) AS n_members,
                   chosen_id, rejected_id,
                   CAST(hi_s - lo_s AS BIGINT) AS margin_bp
            FROM g WHERE hi_s > lo_s"""
      }),

    // ── p21: SHARD-BALANCE audit — the skew alarm a training run
    // reads before trusting p05's layout (a hot shard is a straggling
    // data-loader worker for the whole job): per shard, row count and
    // total text bytes, each with its deviation from the mean in
    // basis points, plus the max-over-mean imbalance verdict. All
    // integer (byte sums, bp via div); one |shards|-sized agg over
    // p05's assignment plus the audited crossJoin(broadcast(1-row
    // totals)) scalar attach — nothing corpus-sized leaves the first
    // partial agg at any scale. Round-robin sharding is balanced BY
    // CONSTRUCTION on counts (spec pins ±1 row), so the byte
    // imbalance isolates the DOCUMENT-LENGTH skew — the thing
    // sequence packing actually cares about. ──
    // ── p22: TEMPERED MIXTURE WEIGHTS — the data-mixing step before
    // any multilingual/multi-source training run (mT5's α-tempered
    // language sampling): raw per-language counts are α=0.5-tempered
    // (w ∝ n^α boosts the tail without letting the head starve it),
    // normalized to integer basis points, and a 100k-sample budget is
    // allocated integer-EXACTLY by largest-remainder (Hamilton)
    // apportionment — base = B·w div W, then the leftover units go
    // one each to the largest remainders (lang asc on ties), so
    // Σ n_samples == B always, the invariant a sampler downstream
    // asserts. Cross-engine exactness: the only float op is sqrt,
    // which IEEE 754 requires correctly rounded — identical doubles
    // in both engines — immediately floored to BIGINT (×10^6 scale
    // keeps 3 tempered digits); everything after is integer. Scale:
    // one lang-keyed partial agg over the corpus; every later frame
    // is |langs| rows (windows included) + the audited
    // crossJoin(broadcast(1-row)) scalar attach. ──
    "p22_mixture_weights" -> Q(
      (s, d) => {
        val budget = 100000L
        // |langs|-row frame persisted: tot/leftover/final all derive
        // from it, so the corpus is scanned once, not per consumer
        val per = Tables(s, d, "documents")
          .groupBy("lang").agg(count(lit(1)).as("n_docs"))
          .withColumn("w", expr("cast(floor(sqrt(n_docs * 1000000)) as bigint)"))
          .persistScoped()
        val tot = per.agg(sum("w").as("w_tot"))
        val based = per.crossJoin(broadcast(tot))
          .withColumn("mix_bp", expr("w * 10000 div w_tot"))
          .withColumn("base", expr(s"w * $budget div w_tot"))
          .withColumn("rem", expr(s"w * $budget - base * w_tot"))
        val leftover = based.agg(sum("base").as("b_sum"))
          .selectExpr(s"$budget - b_sum as leftover")
        based.crossJoin(broadcast(leftover))
          .withColumn("rk", row_number().over(org.apache.spark.sql.expressions
            .Window.orderBy(col("rem").desc, col("lang").asc)))
          .selectExpr("lang", "n_docs", "w", "mix_bp",
            "base + cast(rk <= leftover as bigint) as n_samples")
      },
      Some("""WITH per AS (SELECT lang, count(*) AS n_docs,
                                  CAST(floor(sqrt(n_docs * 1000000)) AS BIGINT) AS w
                           FROM documents GROUP BY lang),
              tot AS (SELECT sum(w) AS w_tot FROM per),
              based AS (SELECT lang, n_docs, w,
                               w * 10000 // w_tot AS mix_bp,
                               w * 100000 // w_tot AS base,
                               w * 100000 - (w * 100000 // w_tot) * w_tot AS rem
                        FROM per CROSS JOIN tot),
              lf AS (SELECT 100000 - sum(base) AS leftover FROM based)
              SELECT lang, CAST(n_docs AS BIGINT) AS n_docs, w,
                     CAST(mix_bp AS BIGINT) AS mix_bp,
                     CAST(base + CAST(row_number() OVER (ORDER BY rem DESC, lang ASC)
                                      <= leftover AS BIGINT) AS BIGINT) AS n_samples
              FROM based CROSS JOIN lf""")),

    "p21_shard_balance" -> Q(
      (s, d) => {
        graft.functions.Hashing.register(s)
        val docs = Tables(s, d, "documents")
        val assigned = shardShuffle(docs, 8, s.sparkContext.defaultParallelism)
          // octet_length, not length: the audit is BYTE skew (what a
          // data-loader actually reads), and char counts understate
          // non-ASCII shards; DuckDB's strlen is the same byte count
          .join(docs.selectExpr("doc_id", "octet_length(text) as n_bytes"), "doc_id")
        val per = assigned.groupBy("shard")
          .agg(count(lit(1)).as("n_docs"), sum("n_bytes").as("n_bytes"))
        val tot = per.agg(count(lit(1)).as("n_shards"),
          sum("n_docs").as("d_tot"), sum("n_bytes").as("b_tot"))
        per.crossJoin(broadcast(tot))
          .selectExpr("shard", "n_docs", "n_bytes",
            "(n_docs * n_shards * 10000) div d_tot - 10000 as doc_dev_bp",
            "(n_bytes * n_shards * 10000) div b_tot - 10000 as byte_dev_bp")
      },
      Some(s"""WITH a AS (SELECT doc_id,
                      CAST((rn - 1) % 8 AS BIGINT) AS shard
                    FROM (SELECT doc_id, row_number() OVER (ORDER BY k, doc_id) AS rn
                          FROM (SELECT doc_id,
                                  ${graft.functions.Hashing.duck32("'shuf:' || doc_id")} AS k
                                FROM documents))),
              per AS (SELECT shard, count(*) AS n_docs,
                             sum(strlen(text)) AS n_bytes
                      FROM a JOIN documents USING (doc_id) GROUP BY shard),
              tot AS (SELECT count(*) AS n_shards, sum(n_docs) AS d_tot,
                             sum(n_bytes) AS b_tot FROM per)
              SELECT shard, CAST(n_docs AS BIGINT) AS n_docs,
                     CAST(n_bytes AS BIGINT) AS n_bytes,
                     CAST((n_docs * n_shards * 10000) // d_tot - 10000 AS BIGINT)
                       AS doc_dev_bp,
                     CAST((n_bytes * n_shards * 10000) // b_tot - 10000 AS BIGINT)
                       AS byte_dev_bp
              FROM per, tot""")),

    // ── p23: CORPUS SNAPSHOT DIFF — the data-versioning primitive
    // (what changed between dataset v1 and v2?) every reproducible
    // training run needs before it trusts a refresh: the manifest of
    // added / removed / CONTENT-changed documents, where "changed"
    // means the fingerprint moved, not merely that the id exists in
    // both. v2 is a deterministic perturbation of v1 (drops %17,
    // edits %13, adds new %29-derived ids) so the gate exercises all
    // three statuses against the oracle. Scale shape: each side is
    // projected to (doc_id, 8-byte h32 fingerprint) BEFORE the join —
    // document text never crosses an exchange — and the diff is one
    // id-keyed full-outer join; unchanged rows (the overwhelming
    // majority at 100 TB) are filtered before anything is returned. ──
    "p23_snapshot_diff" -> Q(
      (s, d) => {
        graft.functions.Hashing.register(s)
        val v1 = Tables(s, d, "documents").selectExpr("doc_id", "h32(text) as fp1")
        val v2 = Tables(s, d, "documents")
          .where("doc_id % 17 != 0")
          .selectExpr("doc_id",
            """case when doc_id % 13 = 0 then h32(concat(text, ' EDITED'))
                    else h32(text) end as fp2""")
          .unionByName(Tables(s, d, "documents").where("doc_id % 29 = 0")
            .selectExpr("doc_id + 10000000 as doc_id",
              "h32(concat('NEW ', text)) as fp2"))
        v1.join(v2, Seq("doc_id"), "full_outer")
          .selectExpr("doc_id",
            """case when fp2 is null then 'removed'
                    when fp1 is null then 'added'
                    when fp1 != fp2 then 'changed'
                    else 'unchanged' end as status""")
          .where("status != 'unchanged'")
      },
      Some(s"""WITH v1 AS (SELECT doc_id,
                                  ${graft.functions.Hashing.duck32("text")} AS fp1
                           FROM documents),
               v2 AS (SELECT doc_id,
                             CASE WHEN doc_id % 13 = 0
                               THEN ${graft.functions.Hashing.duck32("text || ' EDITED'")}
                               ELSE ${graft.functions.Hashing.duck32("text")} END AS fp2
                      FROM documents WHERE doc_id % 17 != 0
                      UNION ALL
                      SELECT doc_id + 10000000,
                             ${graft.functions.Hashing.duck32("'NEW ' || text")}
                      FROM documents WHERE doc_id % 29 = 0)
               SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
                      CASE WHEN fp2 IS NULL THEN 'removed'
                           WHEN fp1 IS NULL THEN 'added'
                           WHEN fp1 != fp2 THEN 'changed'
                           ELSE 'unchanged' END AS status
               FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
               WHERE (CASE WHEN fp2 IS NULL THEN 'removed'
                           WHEN fp1 IS NULL THEN 'added'
                           WHEN fp1 != fp2 THEN 'changed'
                           ELSE 'unchanged' END) != 'unchanged'""")),

    // ── p25: K-ANONYMITY / L-DIVERSITY AUDIT (Sweeney 2002;
    // Machanavajjhala et al. 2007) — the privacy-risk gate a corpus
    // release runs over its structured side tables: under the
    // quasi-identifier generalization (nation, segment, $1000
    // balance band), which equivalence classes are re-identifiable
    // (size < k) or homogeneous (fewer than l distinct sensitive
    // values — the background-knowledge attack k alone misses)?
    // Published as the violating classes with their size, sensitive
    // diversity, and which rule(s) failed. All-integer: balances
    // band and compare in exact cents, so both engines agree
    // bit-for-bit. Scale shape: ONE quasi-id-keyed aggregate with
    // map-side partials (the distinct-sensitive count partial-aggs
    // per class before the exchange); output is bounded by the
    // violating classes, never the table. ──
    "p25_kanon_audit" -> Q(
      (s, d) => {
        val (k, l) = (5, 2)
        Tables(s, d, "customer")
          .selectExpr("c_nationkey", "c_mktsegment",
            "cast(round(c_acctbal * 100) as bigint) div 100000 as bal_band",
            "cast(round(c_acctbal * 100) as bigint) as bal_c")
          .groupBy("c_nationkey", "c_mktsegment", "bal_band")
          .agg(count(lit(1)).as("n"), countDistinct("bal_c").as("l_sens"))
          .where(s"n < $k or l_sens < $l")
          .selectExpr("c_nationkey", "c_mktsegment", "bal_band", "n", "l_sens",
            s"""case when n < $k and l_sens < $l then 'kl'
                     when n < $k then 'k' else 'l' end as viol""")
      },
      Some("""WITH g AS (SELECT c_nationkey, c_mktsegment,
                                CAST(round(c_acctbal * 100) AS BIGINT) // 100000 AS bal_band,
                                CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
                         FROM customer),
              cls AS (SELECT c_nationkey, c_mktsegment, bal_band,
                             count(*) AS n,
                             CAST(count(DISTINCT bal_c) AS BIGINT) AS l_sens
                      FROM g GROUP BY 1, 2, 3)
              SELECT c_nationkey, c_mktsegment, bal_band, n, l_sens,
                     CASE WHEN n < 5 AND l_sens < 2 THEN 'kl'
                          WHEN n < 5 THEN 'k' ELSE 'l' END AS viol
              FROM cls WHERE n < 5 OR l_sens < 2"""))
  )

  /** c03's pure-plan prefix — exact dedup + near-dup removal +
    * quality floor + 13-gram decontamination, down to the survivor id
    * set. Memoized per (session, dir) via [[graft.PlanMemo]] (it is
    * pure construction: every stage is lazy, the only persists are
    * dupDrops' scope-recorded frames); the data-dependent
    * shardShuffle tail stays in the query fn. */
  private def c03Cleaned(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    graft.functions.Hashing.register(s)
    val docs = Tables(s, d, "documents")
    val keepExact = docs.groupBy(md5(col("text")).as("h"))
      .agg(min("doc_id").as("doc_id")).select("doc_id")
    // full-corpus pair drops ≡ Dedup.dupDrops (exact pass +
    // rep-LSH — see its equivalence proof); the swap makes the
    // near-dup stage storm-proof while keepExact keeps covering
    // the sub-3-token docs LSH never sees
    val nearDrops = DedupKernels.dupDrops(s, d)
    val evalPred = s"${pctSql("'eval:' || doc_id")} < 10"
    val quality = docs
      .selectExpr("doc_id", s"$toks as t", s"$evalPred as is_eval")
      .selectExpr("doc_id", "is_eval", "t",
        """case when size(t) >= 2
             then transform(sequence(1, size(t) - 1), i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))
             else array() end as g2""")
      .selectExpr("doc_id", "is_eval",
        "10000 - (size(array_distinct(t)) * 10000) div size(t) as dup_tok_bp",
        """case when size(g2) > 0
             then 10000 - (size(array_distinct(g2)) * 10000) div size(g2)
             else 0L end as dup2_bp""",
        s"""aggregate(transform(t, x -> ${graft.functions.Hashing.h32Sql("concat('w:', x)")} % 2001 - 1000),
                      0L, (a, x) -> a + x) div size(t) as score_bp""")
      .where("not is_eval and dup2_bp <= 800 and dup_tok_bp <= 7000 and score_bp > 0")
      .select("doc_id")
    val grams = docs
      .selectExpr("doc_id", s"$evalPred as is_eval",
        s"""case when size($toks) >= 13
              then transform(sequence(1, size($toks) - 12), i -> array_join(slice($toks, i, 13), ' '))
              else array() end as gs""")
      .select(col("doc_id"), col("is_eval"), explode(col("gs")).as("g"))
    val evalGrams = grams.where("is_eval").select("g").distinct()
    val contaminated = grams.where("not is_eval")
      .join(evalGrams, "g").select("doc_id").distinct()
    quality
      .join(keepExact, Seq("doc_id"), "left_semi")
      .join(nearDrops, Seq("doc_id"), "left_anti")
      .join(contaminated, Seq("doc_id"), "left_anti")
  }
}
