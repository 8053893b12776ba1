package graft.queries

import graft.{Q, Tables}
import graft.CacheScope.PersistScopedOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-forensics signals beyond the t01–t31 registry in
  * `TextOps.scala` (which sits at the 1500-line registry cap —
  * same boundary split as Similarity/Dedup/Pipeline): detectors a
  * training-data pipeline runs to keep SYNTHETIC text out of the
  * corpus. No reference counterpart (the reference has no text
  * surface); published algorithms re-expressed Spark-first.
  */
object TextSignals {

  /** The planted watermark chain: greedy green-list sampling
    * (Kirchenbauer et al. 2023, "A Watermark for Large Language
    * Models") run ONCE on the driver — from `wm0`, each step picks
    * the first of 8 candidate tokens whose pair-hash with the
    * previous token lands in the γ=1/4 green list (falling back to
    * the last candidate when none does, as a real sampler falls back
    * to the red list under low entropy). A pure function of the hash
    * kernel — both engines see the SAME literal, and the detector
    * must separate planted from clean text by re-hashing, not by the
    * plant rule. */
  private[queries] lazy val wmChain: Seq[String] = {
    var prev = "wm0"
    val out = Seq.newBuilder[String]
    out += prev
    for (i <- 1 to 16) {
      val cands = (0 until 8).map(j => s"w$i${('a' + j).toChar}")
      val pick = cands.find(c =>
        graft.functions.Hashing.jvm32(s"wm:$prev:$c") % 4 == 0)
        .getOrElse(cands.last)
      out += pick
      prev = pick
    }
    out.result()
  }

  /** Per-doc green-pair counts over the contaminated composite —
    * t32's detector body, factored so stream29's maintained monitor
    * folds the SAME kernel per micro-batch. Input needs (doc_id,
    * lang, text); output one row per doc: (doc_id, lang, feed,
    * n_pairs, n_green), `feed` naming the source the plant rule
    * models (docs with doc_id % 5 = 0 arrive from the watermarked
    * feed, repeated to ~half the doc). MAP-ONLY: the pair count is a
    * higher-order aggregate over the token array (the t31 fold
    * pattern; h32 is the native kernel — no explode, no shuffle).
    * Caller must have run [[graft.functions.Hashing.register]]. */
  private[graft] def wmDocCounts(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val wm = wmChain.mkString(" ")
    val h = graft.functions.Hashing.h32Sql(
      "concat('wm:', element_at(t, i - 1), ':', element_at(t, i))")
    docs
      .selectExpr("doc_id", "lang", "text", "size(split(text, ' ')) as n0")
      .selectExpr("doc_id", "lang",
        s"""case when doc_id % 5 = 0
             then concat(text, repeat(concat(' ', '$wm'),
                                      cast(1 + (n0 - 1) div 17 as int)))
             else text end as raw""",
        "case when doc_id % 5 = 0 then 'feed_wm' else 'feed_clean' end as feed")
      .selectExpr("doc_id", "lang", "feed", "split(raw, ' ') as t")
      .selectExpr("doc_id", "lang", "feed",
        "cast(size(t) - 1 as bigint) as n_pairs",
        s"""case when size(t) < 2 then 0L else
              aggregate(sequence(2, size(t)), 0L, (acc, i) ->
                acc + if($h % 4 = 0, 1L, 0L)) end as n_green""")
  }

  /** The z-statistic and 4σ flag over (n_pairs, n_green) columns —
    * shared by t32 (per doc) and stream29 (per feed cell). */
  private[graft] val zCols = Seq(
    "printf('%.4f', (4.0 * n_green - n_pairs) / sqrt(3.0 * n_pairs)) as z",
    """cast((4.0 * n_green - n_pairs) / sqrt(3.0 * n_pairs) > 4.0
         as bigint) as flagged""")

  val all: Map[String, Q] = Map(

    // ── t32: WATERMARK DETECTION (Kirchenbauer et al. 2023) — the
    // z-test a pipeline runs to keep watermarked LLM output out of
    // training data: with the green list a pseudorandom γ=1/4
    // partition of the vocabulary SEEDED BY THE PREVIOUS TOKEN,
    // natural text lands ~γ of its adjacent pairs green while
    // watermarked text is biased far above it; per doc,
    // z = (g − γT)/√(Tγ(1−γ)) = (4g − T)/√(3T) and z > 4 flags.
    // Docs with doc_id % 5 = 0 carry the planted chain repeated to
    // ~half the doc (watermark density is what detection power
    // scales with). Scale shape: MAP-ONLY — the pair count is one
    // higher-order aggregate over the token array per row (the t31
    // fold pattern; h32 is the native kernel, no explode, no
    // shuffle, nothing corpus-global). ──
    "t32_watermark_detect" -> Q(
      (s, d) => {
        graft.functions.Hashing.register(s)
        wmDocCounts(Tables(s, d, "documents"))
          .selectExpr(Seq("doc_id",
            "cast(feed = 'feed_wm' as bigint) as planted",
            "n_pairs", "n_green") ++ zCols: _*)
          .where("n_pairs >= 1")
      },
      Some {
        val wm = wmChain.mkString(" ")
        val h = graft.functions.Hashing.duck32(
          "'wm:' || t[i - 1] || ':' || t[i]")
        s"""WITH c AS (SELECT doc_id,
                 CASE WHEN doc_id % 5 = 0
                      THEN text || repeat(' ' || '$wm',
                             1 + (len(string_split(text, ' ')) - 1) // 17)
                      ELSE text END AS raw,
                 CAST(doc_id % 5 = 0 AS BIGINT) AS planted
               FROM documents),
             t AS (SELECT doc_id, planted, string_split(raw, ' ') AS t FROM c),
             g AS (SELECT doc_id, planted,
                          CAST(len(t) - 1 AS BIGINT) AS n_pairs,
                          CAST(coalesce(list_sum(list_transform(
                                 generate_series(2, len(t)), i ->
                                 CASE WHEN $h % 4 = 0 THEN 1 ELSE 0 END)), 0)
                               AS BIGINT) AS n_green
                   FROM t)
             SELECT doc_id, planted, n_pairs, n_green,
                    printf('%.4f', (4.0 * n_green - n_pairs)
                                   / sqrt(3.0 * n_pairs)) AS z,
                    CAST((4.0 * n_green - n_pairs) / sqrt(3.0 * n_pairs) > 4.0
                         AS BIGINT) AS flagged
             FROM g WHERE n_pairs >= 1"""
      })
  )

  /** t16's scoring stage, shared with t18's calibration diagram:
    * every document scored against the bigram LM trained on the
    * in-domain (lang = 'en') slice only. Returns
    * (doc_id, lang, n_bigrams, avg_bp) with avg_bp null for
    * bigram-less documents. Persisted — each consumer aggregates it
    * more than once, and [[graft.CacheScope]] releases it when the
    * query result is consumed. */
  private[queries] def lmPerDoc(s: SparkSession, d: String): DataFrame = {
    val docs = Tables(s, d, "documents")
    val bg = docs
      .selectExpr("doc_id", "lang", s"${TextOpsKernels.toks} as t")
      .where("size(t) >= 2")
      .selectExpr("doc_id", "lang",
        """explode(transform(sequence(1, size(t) - 1),
             i -> struct(element_at(t, i) as w1,
                         concat(element_at(t, i), ' ', element_at(t, i + 1)) as g))) as b""")
      .select(col("doc_id"), col("lang"), col("b.w1").as("w1"), col("b.g").as("g"))
      .persistScoped()
    val en = bg.where("lang = 'en'")
    // ONE lookup side instead of two: per first word, the summed
    // continuation count (= the old c1's n1 — n1(w1) ≡ Σ_g n2(g,w1))
    // plus a g→n2 map holding the old c2. Collapses the two
    // data-derived probes (c2 on g, c1 on w1) into a single left
    // join, so the exploded bigram frame shuffle-writes ONCE before
    // AQE's broadcast election, not once per probe — under the
    // never-trust-estimates broadcast discipline
    // ([[graft.Sessions.scaleDefensive]]) that halves the r16 t16
    // regression's shuffle tax. Semantics are unchanged: an
    // out-of-domain bigram with an in-domain first word still finds
    // n1 and misses gmap[g], exactly the old two-join outcome. Map
    // size per word is bounded by that word's distinct continuations;
    // the whole lm frame is O(distinct en bigrams) — the same bytes
    // the old c2 carried. At 100 TB the w1 join inherits hub-word
    // skew; AQE's skew split covers it (the old g-key join skewed on
    // hub bigrams the same way).
    val lm = en.groupBy("g", "w1").agg(count(lit(1)).as("n2"))
      .groupBy("w1").agg(sum("n2").as("n1"),
        map_from_entries(collect_list(struct(col("g"), col("n2")))).as("gmap"))
    val v = docs.where("lang = 'en'")
      .selectExpr(s"explode(${TextOpsKernels.toks}) as tok")
      .agg(count_distinct(col("tok")).as("v"))
    // lang rides THROUGH the scoring aggregate (doc_id determines
    // lang, so grouping by both is the same cardinality), and the
    // bigram-less docs come back via a UNION with a second pruned
    // scan of documents — not the old docs⋈scored left join, which
    // shuffled both corpus-sized sides under the broadcast
    // discipline. A column-pruned parquet re-scan is strictly
    // cheaper than a corpus-wide shuffle at any scale.
    val scored = bg
      .join(lm, Seq("w1"), "left")
      .crossJoin(broadcast(v))
      .selectExpr("doc_id", "lang",
        "((coalesce(gmap[g], 0L) + 1) * 10000) div (coalesce(n1, 0L) + v) as s_bp")
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n_bigrams"), sum("s_bp").as("sum_bp"))
      .selectExpr("doc_id", "lang", "n_bigrams",
        "sum_bp div n_bigrams as avg_bp")
    val unscored = docs
      .selectExpr("doc_id", "lang", s"size(${TextOpsKernels.toks}) as nt")
      .where("nt < 2")
      .selectExpr("doc_id", "lang", "cast(0 as bigint) as n_bigrams",
        "cast(null as bigint) as avg_bp")
    scored.unionByName(unscored).persistScoped()
  }

  /** DuckDB mirror of [[lmPerDoc]] — a CTE chain ending in `perdoc`
    * (doc_id, lang, n_bigrams, avg_bp), spliced into t16/t18 oracles. */
  private[queries] val duckLmPerDoc: String =
    """tk AS (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
       bg AS MATERIALIZED (SELECT doc_id, lang, t[i] AS w1, t[i] || ' ' || t[i+1] AS g
              FROM tk, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i)
              WHERE len(t) >= 2),
       c2 AS (SELECT g, count(*) AS n2 FROM bg WHERE lang = 'en' GROUP BY g),
       c1 AS (SELECT w1, count(*) AS n1 FROM bg WHERE lang = 'en' GROUP BY w1),
       v AS (SELECT count(DISTINCT tok) AS v FROM
               (SELECT unnest(t) AS tok FROM tk WHERE lang = 'en')),
       sc AS (SELECT doc_id,
                     ((COALESCE(n2, 0) + 1) * 10000) // (COALESCE(n1, 0) + v) AS s_bp
              FROM bg LEFT JOIN c2 USING (g) LEFT JOIN c1 USING (w1), v),
       agg AS (SELECT doc_id, count(*) AS n_bigrams,
                      CAST(sum(s_bp) AS BIGINT) // count(*) AS avg_bp
               FROM sc GROUP BY doc_id),
       perdoc AS (SELECT d.doc_id, d.lang, COALESCE(a.n_bigrams, 0) AS n_bigrams, a.avg_bp
                  FROM documents d LEFT JOIN agg a USING (doc_id))"""
}
