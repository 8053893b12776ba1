package graft.queries

import graft.CacheScope.PersistScopedOps
import graft.{Q, Tables}
import graft.functions.Hashing
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The dedup tier's KERNELS and ORACLE BUILDERS below
  * [[Dedup.all]]'s registry: the span-dedup island machinery (d18),
  * the distributed HyperLogLog build/serve (d19/stream-twin), and
  * the shard-vs-corpus incremental index (d14/d16's bloom + staged
  * fingerprints). Split from `Dedup.scala` so a reviewer can diff
  * the query plans without paging through the kernels; `Dedup`
  * imports this object wholesale — no member changed. */
private[graft] object DedupKernels {
  private[queries] val toks = "split(text, ' ')"

  /** doc_id + distinct hashed word 3-gram shingle set (docs with ≥3
    * tokens), via the native [[graft.functions.HashedShingles]] kernel
    * — one incremental md5 per shingle in straight JVM code instead of
    * an interpreted SQL-lambda per element (~10× on the LSH hot path).
    *
    * `repartition` first: the testdata table is one small parquet file
    * → one input split, which would serialize the hash work onto a
    * single core. At 100 TB the scan has thousands of natural splits
    * and the repartition collapses into a cheap round-robin. */
  private[queries] def hashedDocs(s: SparkSession, d: String): DataFrame = {
    Hashing.register(s)
    graft.plans.JaccardRewrite.install(s)
    hashedDocsOf(Tables(s, d, "documents")
      .repartition(s.sparkContext.defaultParallelism))
  }

  /** The shingle-hash projection over an arbitrary (doc_id, text)
    * frame — shared by the corpus path above and d16's shard side.
    * Requires [[Hashing.register]] on the session. */
  private[queries] def hashedDocsOf(docs: DataFrame): DataFrame =
    docs.where(s"size($toks) >= 3")
      .selectExpr("doc_id", s"hashed_shingles($toks, 3) as hv")

  /** MinHash via one base hash per shingle + k affine permutations
    * h_j(x) = (a_j·h(x) + b_j) mod p over the 31-bit field (Mersenne
    * prime keeps a_j·h < 2^62, safe in int64 for both engines). One
    * md5 per shingle instead of k — ~k× less hash work, identical
    * recall (validated: the same 25/25 planted pairs at sf0.01). The
    * coefficients are md5-derived driver-side ([[Hashing.jvm32]]) and
    * inlined as literals in both the Spark plan and the oracle. */
  /** doc_id + 64-bit SimHash (term-frequency weighted), via the
    * native [[graft.functions.SimHash64]] kernel — one md5 per token,
    * bit-fold in straight JVM code, inside whole-stage codegen (the
    * SQL-lambda formulation the oracle uses runs interpreted and
    * digests every token twice). 64 bits come from BOTH 32-bit md5
    * words per token (h32 = hex 1-8, h32b = hex 9-16) — bit b reads
    * word b/32, bit b%32. 32-bit SimHash gave banding only 256
    * buckets per 8-bit band: bucket size N/256 BY CONSTRUCTION, a
    * guaranteed quadratic self-join at corpus scale; 64 bits buys
    * 4×16-bit bands (65,536 buckets/band) with the same pigeonhole
    * hamming≤3 recall contract. Bit 63 is the sign bit — the oracle's
    * HUGEINT fold lands on the same two's-complement value. */
  private[queries] def simhashed(s: SparkSession, d: String): DataFrame = {
    Hashing.register(s)
    Tables(s, d, "documents")
      .repartition(s.sparkContext.defaultParallelism)
      .selectExpr("doc_id", s"simhash64($toks) as simhash")
  }

  /** 4×16-bit LSH banding + hamming verify over a (doc_id, simhash)
    * frame. Pigeonhole: at most 3 flipped bits touch at most 3 of the
    * 4 bands, so at least one band matches exactly — recall is EXACT
    * for the hamming <= 3 contract AMONG pairs outside capped
    * buckets. The cap is a deliberate precision/recall trade: a true
    * hamming≤3 pair whose only exactly-matching bands all fall in
    * over-cap buckets is dropped, the price of bounding every
    * bucket's self-join fan-out at cap² (a >cap band-identical
    * cluster is boilerplate that d01's exact dedup already groups;
    * the oracle mirrors the cap, so the gate pins the same trade).
    * 65,536 buckets per band keeps expected bucket size at N/2^16,
    * so capping should only ever fire on degenerate content. Exposed
    * (not inlined in the query map) so the recall proof is testable
    * on planted distances. */
  def simhashPairs(sh: DataFrame, cap: Int = 64): DataFrame = {
    val bk0 = sh.selectExpr("doc_id", "simhash", "explode(sequence(0, 3)) as band")
      .selectExpr("doc_id", "simhash", "band", "shiftright(simhash, band*16) & 65535 as bits")
    val bk = bk0.withColumn("bsz",
        count(lit(1)).over(Window.partitionBy("band", "bits")))
      .where(s"bsz <= $cap")
    bk.select(col("doc_id").as("d1"), col("simhash").as("s1"), col("band"), col("bits"))
      .join(bk.select(col("doc_id").as("d2"), col("simhash").as("s2"),
        col("band").as("b2"), col("bits").as("k2")),
        col("band") === col("b2") && col("bits") === col("k2") && col("d1") < col("d2"))
      .select("d1", "d2", "s1", "s2").distinct()
      .selectExpr("d1", "d2", "cast(bit_count(s1 ^ s2) as int) as hamming")
      .where("hamming <= 3")
  }

  /** Persisted (hashed-shingle-set, banded-bucket) frames shared by the
    * LSH queries (d03/d07 and c01 through d03): hv is the HASHED set
    * (array<long> — an order of magnitude cheaper to cache than the
    * string arrays, measured: caching both string frames cost 7.6s at
    * sf0.1); every later stage — signatures, both self-join sides, the
    * verification joins — reads this one cache. Jaccard over hashed
    * sets equals Jaccard over the shingle strings (the hash is a
    * bijection up to md5 collisions, identical in the oracle). The
    * bucket frame (3 scalar columns — near-free cache) keeps the
    * self-join's two sides from recomputing signatures; identical
    * logical plans across queries dedupe in the cache manager. */
  private[queries] def lshFrames(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val hs = hashedDocs(s, d).persistScoped()
    val bk = bandBuckets(hs).persistScoped()
    (hs, bk)
  }

  /** MinHash signatures → 4 bands of 4 rows each: bucket = hash(band,
    * 4 consecutive sig values). Shared by the corpus index and d16's
    * shard probe — SAME banding, or the probe misses the index. */
  private[queries] def bandBuckets(hs: DataFrame): DataFrame =
    hs.selectExpr("doc_id", "affine_minhash(hv, 16) as sig")
      .selectExpr("doc_id", "explode(sequence(0, 3)) as band", "sig")
      .selectExpr("doc_id", "band",
        s"${Hashing.h32Sql("concat(band, ':', concat_ws(',', slice(sig, band*4+1, 4)))")} as bucket")

  /** The ONE candidate topology every LSH query shares: banded
    * (band, bucket) self-join — optionally bucket-capped for skew —
    * then the two hashed-set joins, scored by `scoreExpr` (references
    * hv1/hv2 and aliases its output). Verification joins carry no
    * hints: banding bounds |cand|, so AQE broadcasts the candidate
    * side and streams the (cached) hash sets — never a broadcast of
    * the whole corpus, which an explicit broadcast(hs) hint would
    * force (fine at gate scale, an OOM at 100 TB). Factored so d03,
    * d05, d07, and d09 cannot drift apart in candidate semantics. */
  private[queries] def scoredCandidates(hs: DataFrame, bk: DataFrame,
      scoreExpr: String, cap: Option[Int] = None): DataFrame = {
    val side = cap match {
      case Some(c) => bk.withColumn("bsz",
          count(lit(1)).over(Window.partitionBy("band", "bucket"))).where(s"bsz <= $c")
      case None => bk
    }
    val cand = side.select(col("doc_id").as("d1"), col("band"), col("bucket"))
      .join(side.select(col("doc_id").as("d2"), col("band").as("b2"), col("bucket").as("k2")),
        col("band") === col("b2") && col("bucket") === col("k2") && col("d1") < col("d2"))
      .select("d1", "d2").distinct()
    cand
      .join(hs.select(col("doc_id").as("d1"), col("hv").as("hv1")), "d1")
      .join(hs.select(col("doc_id").as("d2"), col("hv").as("hv2")), "d2")
      .selectExpr("d1", "d2", scoreExpr)
  }

  private[queries] val jaccardExpr =
    "cast(size(array_intersect(hv1, hv2)) as double) / size(array_union(hv1, hv2)) as jac"

  /** d03's verified near-dup pairs (consumed by d03's own gate output
    * and d08's cluster edges), computed DUP-STORM-PROOF while keeping
    * the full-pair contract: exact-group the corpus first (one linear
    * md5 window), run the LSH candidate join + Jaccard verify over
    * group REPRESENTATIVES only, then EXPAND rep pairs back to member
    * pairs. The expansion rows carry ids + a precomputed jac — never
    * the hv arrays — so a 1000-identical-copies storm (sf100) streams
    * its inherent C(copies,2)-per-group output through cheap
    * rep-keyed joins instead of shipping terabytes of hv through a
    * quadratic candidate shuffle (the r16 sf100 finding; same
    * topology as [[DedupKernels.dupDrops]]).
    *
    * Output-equivalence proof (same discipline as dupDrops, extended
    * to the PAIR LIST — d03 is uncapped, which is what makes this
    * exact):
    *  - identical texts ⇒ identical shingle sets ⇒ identical sigs
    *    and hv;
    *  - SAME group (x < y): identical sigs collide in every band ⇒
    *    always a candidate; jac = 1.0 ≥ 0.7 ⇒ the full-corpus join
    *    emits (x, y, 1.0) — the `within` branch emits exactly that;
    *  - DIFFERENT groups (x ∈ G1, y ∈ G2, reps r1 < r2): sig(x) =
    *    sig(r1), sig(y) = sig(r2), so (x, y) is a candidate iff
    *    (r1, r2) is (no bucket cap ⇒ candidacy is content-determined)
    *    and jac(x, y) = jac(r1, r2) — the `cross` branch emits every
    *    member combination once with that jac, (least, greatest)
    *    matching the full join's d1 < d2 orientation;
    *  - conversely every emitted pair exists in the full join.
    * The persists cover the SMALL frames (membership, rep hv/bucket,
    * rep pairs); the expanded list is deliberately NOT persisted —
    * under a storm it is quadratic in copies by contract, so it
    * streams to its consumer instead of being cached.
    *
    * Cache lifetime (applies to every persist in this tier): frames
    * register with the per-query [[graft.CacheScope]] — the harness
    * consumes each query inside `CacheScope.scoped`, which releases
    * the query's own persists at consumption, so a long-lived session
    * running gate queries back-to-back accumulates nothing
    * (CacheScopeSpec pins this). Outside a scope the persist is
    * plain and the embedding caller owns the lifecycle. */
  private[queries] def lshPairs(s: SparkSession, d: String): DataFrame =
    graft.PlanMemo.of(s, s"lshPairs:$d") { lshPairsBuild(s, d) }

  private def lshPairsBuild(s: SparkSession, d: String): DataFrame = {
    Hashing.register(s)
    graft.plans.JaccardRewrite.install(s)
    val eligible = Tables(s, d, "documents").where(s"size($toks) >= 3")
    val groups = eligible
      .select(md5(col("text")).as("h"), col("doc_id"))
      .withColumn("rep", min("doc_id").over(Window.partitionBy("h")))
      .select("doc_id", "rep")
      .persistScoped()
    val hs = hashedDocsOf(
      eligible.join(groups.where("doc_id = rep").select("doc_id"),
          Seq("doc_id"), "left_semi")
        .repartition(s.sparkContext.defaultParallelism)).persistScoped()
    val bk = bandBuckets(hs).persistScoped()
    val repPairs = scoredCandidates(hs, bk, jaccardExpr)
      .where("jac >= 0.7")
      .select("d1", "d2", "jac")
      .persistScoped()
    val cross = repPairs
      .join(groups.select(col("rep").as("d1"), col("doc_id").as("x")), "d1")
      .join(groups.select(col("rep").as("d2"), col("doc_id").as("y")), "d2")
      .selectExpr("least(x, y) as d1", "greatest(x, y) as d2", "jac")
    val within = groups.select(col("rep"), col("doc_id").as("x"))
      .join(groups.select(col("rep"), col("doc_id").as("y")), "rep")
      .where("x < y")
      .selectExpr("x as d1", "y as d2", "cast(1.0 as double) as jac")
    cross.unionByName(within)
  }

  /** Connected components over an undirected edge list (columns `a`,
    * `b`): every vertex labeled with the smallest vertex id reachable
    * from it. Alternating large-star / small-star rounds (Kiveris et
    * al., "Connected Components in MapReduce and Beyond", SoCC'14 —
    * public algorithm): large-star hangs every neighbor larger than u
    * off min(Γ⁺(u)); small-star re-hangs the smaller ones. Both
    * preserve connectivity, and the edge set converges to per-
    * component stars rooted at the component minimum in O(log² n)
    * rounds WORST CASE (vs rounds = graph diameter for plain
    * min-label propagation — an adversarial 64-node chain converges
    * in ~6 rounds here, 63 there). Each round is two partial-agg'd
    * keyed shuffles; nothing is ever broadcast or collected beyond a
    * 2-long checksum row.
    *
    * Lineage is truncated every round: with a configured
    * `spark.sparkContext.setCheckpointDir` the cut is a RELIABLE
    * checkpoint (survives executor loss — required for a multi-hour
    * 100 TB job); otherwise `localCheckpoint` (executor-local blocks,
    * fine for gate scale / tests). Convergence = stable
    * (count, xxhash64-xor) edge checksum — exact at a fixpoint, and a
    * false-stop needs a 64-bit hash-xor collision on a changed set.
    * Only vertices that appear in an edge are labeled — singleton
    * docs are their own trivial cluster and never enter the graph.
    *
    * Resource lifetime: on the reliable path the returned frame is
    * BACKED by the final round's parquet under
    * `<checkpointDir>/graft-cc-<uuid>` — it must outlive consumption,
    * so it is not self-deleting. A long-lived driver should point the
    * checkpoint dir at scratch storage and reclaim `graft-cc-*`
    * entries after materializing (or writing out) the labels; repeated
    * invocations otherwise accumulate one final-round directory each. */
  def connectedComponents(edgesIn: DataFrame): DataFrame =
    ccWithRounds(edgesIn)._1

  /** [[connectedComponents]] + the number of star rounds it took —
    * exposed so the convergence-budget spec can assert the O(log² n)
    * bound on adversarial chains. `reliableDir` overrides the
    * context's checkpoint dir (tests inject a scratch dir without
    * mutating the shared session).
    *
    * Reliable lineage cuts are explicit parquet rounds under
    * `<dir>/graft-cc-<uuid>` rather than `Dataset.checkpoint`:
    * checkpoint files are never reclaimed before application exit
    * (`cleanCheckpoints` defaults off, and `unpersist()` does not
    * touch ReliableCheckpointRDD files), which at 100 TB accumulates
    * O(rounds × |edges|) dead data — here round N−1 is deleted the
    * moment round N is materialized, keeping disk at O(|edges|) (the
    * final round's files back the returned frame and live until the
    * caller is done with the directory). */
  private[queries] def ccWithRounds(edgesIn: DataFrame,
      reliableDir: Option[String] = None): (DataFrame, Int) = {
    val s = edgesIn.sparkSession
    val base = reliableDir.orElse(s.sparkContext.getCheckpointDir)
      .map(d => new org.apache.hadoop.fs.Path(d, s"graft-cc-${java.util.UUID.randomUUID}"))
    val hconf = s.sparkContext.hadoopConfiguration
    var prevRound: Option[org.apache.hadoop.fs.Path] = None
    var roundNo = 0
    def cp(df: DataFrame): DataFrame = base match {
      case Some(b) =>
        val p = new org.apache.hadoop.fs.Path(b, s"round-$roundNo")
        roundNo += 1
        df.write.mode("overwrite").parquet(p.toString)
        val back = s.read.parquet(p.toString)
        // only after the new round is fully materialized
        prevRound.foreach(old => old.getFileSystem(hconf).delete(old, true))
        prevRound = Some(p)
        back
      case None => df.localCheckpointScoped()
    }
    // bit_xor, not sum: order-independent, and immune to ANSI int64
    // overflow no matter how many edges
    def checksum(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)),
        coalesce(expr("bit_xor(xxhash64(a, b))"), lit(0L))).head
      (r.getLong(0), r.getLong(1))
    }
    var edges = cp(edgesIn.selectExpr("a", "b").where("a <> b").distinct())
    var prev = (-1L, 0L)
    var cur = checksum(edges)
    var rounds = 0
    while (cur != prev) {
      require(rounds < 200, s"connectedComponents failed to converge in $rounds rounds")
      // large-star: v > u attaches to m = min(Γ(u) ∪ {u})
      val nbr = edges.union(edges.select(col("b").as("a"), col("a").as("b")))
      val mins = nbr.groupBy("a").agg(min("b").as("mn"))
        .select(col("a"), least(col("mn"), col("a")).as("m"))
      val large = nbr.join(mins, "a").where("b > a")
        .select(col("b").as("a"), col("m").as("b"))
        .where("a <> b").distinct()
      // small-star over the now downward-pointing edges (b < a):
      // every child re-hangs on the group min, and u keeps its hook
      val mins2 = large.groupBy("a").agg(min("b").as("m"))
      val small = large.join(mins2, "a")
        .select(col("b").as("a"), col("m").as("b"))
        .union(mins2.select(col("a"), col("m").as("b")))
        .where("a <> b").distinct()
      val next = cp(small) // eager: materialized before the old
      edges.unpersist()    // generation's blocks are released
      edges = next
      prev = cur
      cur = checksum(edges)
      rounds += 1
    }
    // fixpoint = stars (v, root): non-roots read their edge, roots
    // label themselves
    val labels = edges.select(col("a").as("doc_id"), col("b").as("cluster"))
      .union(edges.select(col("b").as("doc_id"), col("b").as("cluster")))
      .distinct()
    (labels, rounds)
  }

  private[queries] val P = graft.functions.MinHash.P
  private[queries] def duckLits(xs: Seq[Long]): String = xs.mkString("[", ",", "]")

  /** DuckDB mirror of [[simhashed]] (CTEs `th`, `sh`). Bit 63 can't be
    * written `1::BIGINT << 63` (DuckDB raises Out of Range on left
    * shift overflow) — it is the MIN_VALUE literal instead; list_sum
    * runs in HUGEINT so the mixed-sign sum is exact, and the final
    * BIGINT cast lands on the same two's-complement value Spark's
    * int64 fold produces. */
  /** The 64-bit simhash bit-fold as a CTE over a `th(doc_id, th)`
    * frame already in scope (th = list of [h32, h32b] pairs per
    * gram). Shared by the text oracles here and m07's byte-gram
    * oracle — ONE copy of the HUGEINT fold and the bit-63
    * two's-complement trick. */
  private[queries] val duckSimhashFold: String =
    """sh AS (SELECT doc_id, CAST(list_sum(list_transform(generate_series(0, 63),
                b -> CASE WHEN 2 * len(list_filter(th, h -> (h[CASE WHEN b < 32 THEN 1 ELSE 2 END] // (1::BIGINT << (b % 32))) % 2 = 1)) >= len(th)
                          THEN (CASE WHEN b = 63 THEN (-9223372036854775808)::BIGINT ELSE (1::BIGINT << b) END)
                          ELSE 0::BIGINT END)) AS BIGINT) AS simhash
             FROM th)"""

  /** [[simhashPairs]]'s oracle mirror over an `sh(doc_id, simhash)`
    * CTE: 4×16-bit banding, the 64-entry bucket cap, and the
    * hamming≤3 verify — shared with m07. Ends in a SELECT. */
  private[queries] val duckBandPairs: String =
    """b AS (SELECT doc_id, simhash, unnest(generate_series(0, 3)) AS band FROM sh),
       bk AS (SELECT doc_id, simhash, band, (simhash >> (band*16)) & 65535 AS bits FROM b),
       capped AS MATERIALIZED (SELECT * FROM
                    (SELECT doc_id, simhash, band, bits,
                            count(*) OVER (PARTITION BY band, bits) AS bsz FROM bk)
                  WHERE bsz <= 64),
       cand AS (SELECT DISTINCT a.doc_id AS d1, c.doc_id AS d2, a.simhash AS s1, c.simhash AS s2
                FROM capped a JOIN capped c ON a.band = c.band AND a.bits = c.bits AND a.doc_id < c.doc_id)
       SELECT d1, d2, CAST(bit_count(xor(s1, s2)) AS INTEGER) AS hamming
       FROM cand WHERE bit_count(xor(s1, s2)) <= 3"""


  /** The d08 component chain — recursive transitive closure over
    * d03's verified pairs — as a reusable CTE prefix ending in
    * `cl(doc_id, cluster)`. Shared by the d08/d12 oracles and by
    * p16's leakage-free split (group = near-dup component). */
  private[queries] lazy val duckClusters: String =
    s"""WITH RECURSIVE p AS MATERIALIZED ($d03Oracle),
       edges AS MATERIALIZED (SELECT d1 AS a, d2 AS b FROM p
                 UNION SELECT d2, d1 FROM p),
       reach AS (SELECT a, a AS b FROM (SELECT DISTINCT a FROM edges)
                 UNION
                 SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
       cl AS MATERIALIZED (SELECT a AS doc_id, min(b) AS cluster FROM reach GROUP BY a)"""




  // d25/d26 live with their kernels in DedupKernels (registry line cap)


  /** d23's planted typo docs — the synthetic vocabulary has no
    * natural edit-distance-1 neighbors, so the gate plants one
    * deletion ("tble"~table), one insertion ("scann"~scan), and one
    * substitution ("windoq"~window), exercising all three edit kinds
    * the deletion-neighborhood theorem covers. */
  private[graft] lazy val typoDocs = Seq(
    "tble scan filter row",
    "scann the windoq value")

  /** d18/c09's shared span machinery: the maximal duplicated-span
    * islands of Lee et al. 2022 — (doc_id, n_tokens, grp, s0, e1),
    * one row per maximal span of token positions covered by an
    * 8-gram occurring ≥2× corpus-wide. One fp-keyed partial-agg
    * shuffle, one fp equi-join, and a per-DOC window (bounded by
    * document length, never corpus-global). */
  private[graft] def dupSpans(s: SparkSession, d: String): DataFrame = {
    Hashing.register(s)
    val pos = Tables(s, d, "documents")
      .repartition(s.sparkContext.defaultParallelism)
      .where(s"size($toks) >= 8")
      .selectExpr("doc_id", s"size($toks) as n_tokens",
        s"explode(transform(sequence(1, size($toks) - 7), i -> " +
          s"struct(i as s, h32(concat_ws(' ', slice($toks, i, 8))) as fp))) as w")
      .selectExpr("doc_id", "n_tokens", "w.s as s", "w.fp as fp")
      .persistScoped()
    val dupFp = pos.groupBy("fp").agg(count(lit(1)).as("n_occ"))
      .where("n_occ >= 2").select("fp")
    val byDoc = Window.partitionBy("doc_id").orderBy("s")
    pos.join(dupFp, "fp")
      .withColumn("e", col("s") + lit(7))
      .withColumn("pe",
        max("e").over(byDoc.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("fl",
        when(col("pe").isNull || col("s") > col("pe") + 1, 1L).otherwise(0L))
      .withColumn("grp",
        sum("fl").over(byDoc.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("doc_id", "n_tokens", "grp")
      .agg(min("s").as("s0"), max("e").as("e1"))
  }

  /** DuckDB mirror of [[dupSpans]] — CTE chain ending in
    * `i(doc_id, n_tokens, grp, s0, e1)`; shared by d18 and c09. */
  private[queries] lazy val duckSpanIslands: String =
    s"""t AS (SELECT doc_id, string_split(text,' ') AS t FROM documents
              WHERE len(string_split(text,' ')) >= 8),
        q AS (SELECT doc_id, len(t) AS n_tokens,
                     unnest(generate_series(1, len(t)-7)) AS s,
                     unnest(list_transform(generate_series(1, len(t)-7),
                       i -> ${Hashing.duck32("array_to_string(t[i:i+7], ' ')")})) AS fp
              FROM t),
        c AS (SELECT fp FROM q GROUP BY fp HAVING count(*) >= 2),
        m AS (SELECT q.doc_id, q.n_tokens, q.s, q.s + 7 AS e
              FROM q JOIN c USING (fp)),
        w AS (SELECT doc_id, n_tokens, s, e,
                     max(e) OVER (PARTITION BY doc_id ORDER BY s
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe
              FROM m),
        g AS (SELECT doc_id, n_tokens, s, e,
                     sum(CASE WHEN pe IS NULL OR s > pe + 1 THEN 1 ELSE 0 END)
                       OVER (PARTITION BY doc_id ORDER BY s
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
              FROM w),
        i AS (SELECT doc_id, n_tokens, grp, min(s) AS s0, max(e) AS e1
              FROM g GROUP BY 1, 2, 3)"""

  /** d21's bucketing pass: count `x` (a 1-column n_chars frame) into
    * 128 equal-width integer buckets against the extents frame
    * `rng(lo, hi, n)`. Carries the sketch constants (lo, w, n) on
    * every surviving row; ≤128 rows leave the partial agg at any
    * corpus size. The extents attach is the audited scalar
    * crossJoin(broadcast(empty-grouping agg)) shape. Counts merge
    * across shards by +, extents by min/max — [[graft.queries]]'
    * fourth merge≡rebuild algebra instance (DedupSpec). */
  private[graft] def histBuckets(x: DataFrame, rng: DataFrame): DataFrame =
    x.crossJoin(broadcast(rng))
      .selectExpr("lo", "n", "(hi - lo) div 128 + 1 as w", "n_chars")
      .selectExpr("lo", "n", "w", "(n_chars - lo) div w as b")
      .groupBy("lo", "n", "w", "b").agg(count(lit(1)).as("cnt"))

  // ── HLL machinery shared by d19 (one-shot batch) and stream16
  // (maintained register artifact + streaming fold) ──

  /** (source, h): every 3-gram shingle occurrence hashed — the HLL
    * input (no per-doc dedup needed: register max is idempotent, so
    * the sketch of a multiset is the sketch of its set). */
  private[graft] def hllItems(docs: DataFrame): DataFrame =
    docs.where(s"size($toks) >= 3")
      .selectExpr("source",
        s"explode(transform(sequence(1, size($toks) - 2), " +
          s"i -> h32(concat_ws(' ', slice($toks, i, 3))))) as h")

  /** The HLL register state: per (source, bucket = top 10 hash bits)
    * max rank, rank = 1 + leading zeros of the remaining 22 bits. */
  private[graft] def hllRegisters(items: DataFrame): DataFrame =
    items
      .selectExpr("source", "h div 4194304 as bucket", "h % 4194304 as w")
      .selectExpr("source", "bucket",
        "case when w = 0 then 23 else 23 - length(bin(w)) end as rho")
      .groupBy("source", "bucket").agg(max("rho").as("m_rho"))

  /** Estimator finish over register state (dyadic-rational integer
    * harmonic mean — see the d19 entry comment), joined with the
    * exact side for the gate's error evidence. */
  private[graft] def hllFinish(registers: DataFrame, exact: DataFrame): DataFrame = {
    val allBuckets = registers.select("source").distinct()
      .selectExpr("source", "explode(sequence(0, 1023)) as bucket")
    val sums = allBuckets.join(registers, Seq("source", "bucket"), "left")
      .selectExpr("source", "shiftleft(1L, 32 - coalesce(m_rho, 0)) as term")
      .groupBy("source").agg(sum("term").as("s_sum"))
    sums.join(exact, "source")
      .selectExpr("source",
        "(755541L * 4294967296L) div s_sum as est_distinct",
        "exact_distinct")
      .selectExpr("source", "est_distinct", "exact_distinct",
        "abs(est_distinct - exact_distinct) * 10000 div exact_distinct as err_bp")
  }

  /** Generalized HLL estimator over a register frame keyed by
    * `keys` (d19 uses the (source) grain via [[hllFinish]]; d24 the
    * (sa, sb) union grain): fill the 1024-bucket grid per key,
    * dyadic-rational integer harmonic mean, est column out. */
  private[graft] def hllEst(regs: DataFrame, keys: Seq[String]): DataFrame = {
    val allB = regs.select(keys.map(col): _*).distinct()
      .selectExpr(keys :+ "explode(sequence(0, 1023)) as bucket": _*)
    allB.join(regs, keys :+ "bucket", "left")
      .selectExpr(keys :+ "shiftleft(1L, 32 - coalesce(m_rho, 0)) as term": _*)
      .groupBy(keys.map(col): _*).agg(sum("term").as("s_sum"))
      .selectExpr(keys :+ "(755541L * 4294967296L) div s_sum as est": _*)
  }

  /** stream16: fold each arriving micro-batch's registers into the
    * persisted (source, bucket, m_rho) artifact by elementwise max —
    * registers of a union ARE the max of registers (the same
    * merge≡rebuild algebra d15 proves for MinHash), so arrival order
    * and batch boundaries cannot change the final sketch. The
    * artifact is ≤ |sources|×1024 rows at ANY corpus size (the
    * sketch's entire point); the swap is write-tmp + rename — one
    * small PUT per batch, object-store-safe. */
  private[graft] def hllRegistersDir: String =
    graft.RunScratch.path("hll-registers")

  private[graft] def hllStream(s: SparkSession, docs: DataFrame): DataFrame = {
    graft.streaming.ArtifactFold.fold(s, hllItems(docs), hllRegistersDir,
        "registers") { (batch, prior) =>
      val br = hllRegisters(batch)
      prior.fold(br)(br.unionByName(_)
        .groupBy("source", "bucket").agg(max("m_rho").as("m_rho")))
    }
  }

  /** d19's oracle, shared verbatim by stream16: the artifact-served
    * streaming profile must reproduce the batch answer exactly. */
  private[graft] lazy val d19Oracle: String =
    s"""WITH t AS (SELECT source, string_split(text,' ') AS t FROM documents
                          WHERE len(string_split(text,' ')) >= 3),
               it AS MATERIALIZED (SELECT source, unnest(list_transform(generate_series(1, len(t)-2),
                        i -> ${Hashing.duck32("array_to_string(t[i:i+2], ' ')")})) AS h
                      FROM t),
               br AS (SELECT source, h // 4194304 AS bucket,
                             CASE WHEN h % 4194304 = 0 THEN 23
                                  ELSE 23 - length(bin(h % 4194304)) END AS rho
                      FROM it),
               mx AS (SELECT source, bucket, max(rho) AS m_rho FROM br GROUP BY 1, 2),
               allb AS (SELECT source, unnest(generate_series(0, 1023)) AS bucket
                        FROM (SELECT DISTINCT source FROM it)),
               sm AS (SELECT a.source,
                             sum(1::BIGINT << (32 - coalesce(m_rho, 0))) AS s_sum
                      FROM allb a LEFT JOIN mx USING (source, bucket) GROUP BY 1),
               ex AS (SELECT source, count(DISTINCT h) AS exact_distinct FROM it GROUP BY 1),
               es AS (SELECT source, CAST((755541 * 4294967296) // s_sum AS BIGINT) AS est_distinct
                      FROM sm)
               SELECT es.source, est_distinct, exact_distinct,
                      CAST(abs(est_distinct - exact_distinct) * 10000
                           // exact_distinct AS BIGINT) AS err_bp
               FROM es JOIN ex ON ex.source = es.source"""

  // ── shard-vs-corpus dedup machinery shared by d14 (one-shot batch)
  // and stream12 (maintained index + streaming serve) ──

  /** Bloom sizing for the corpus fingerprint sketch (constant-size
    * regardless of corpus cardinality; ≈fpp 3% at 1M items). */
  private[queries] val bloomItems = 1 << 20
  private[queries] val bloomBits = 8 << 20

  /** The simulated re-crawl shard (same deterministic split in both
    * engines): 20% of docs under new ids, half verbatim, half
    * content-edited. Stateless projections only, so it runs unchanged
    * on a streaming frame. Shared by d14/stream12 (exact fps) and
    * d16 (near-dup shingles). */
  private[graft] def shardDocs(docs: DataFrame): DataFrame = {
    val pct = s"${Hashing.h32Sql("concat('shard:', doc_id)")} % 100"
    docs.where(s"$pct < 20")
      .selectExpr("doc_id + 1000000 as doc_id",
        s"case when $pct < 10 then text else concat(text, ' v2') end as text")
  }

  /** The shard reduced to exact fingerprints (doc_id, fp = md5(text)). */
  private[graft] def shardFps(docs: DataFrame): DataFrame =
    shardDocs(docs).select(col("doc_id"), md5(col("text")).as("fp"))

  /** Distinct corpus fingerprints — the exact side of the index. */
  private[graft] def corpusFps(docs: DataFrame): DataFrame =
    docs.select(md5(col("text")).as("fp")).distinct()

  /** Map-side probe of a serialized bloom literal (the c04/d14
    * codegen'd-Literal pattern). */
  private[queries] def bloomMight(bytes: Array[Byte],
      c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftSqlShims.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal(
          bytes, org.apache.spark.sql.types.BinaryType),
        new org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(
          org.apache.spark.sql.GraftSqlShims.expression(c)))))

  /** d14's oracle, shared verbatim by stream12: `seen` is always
    * membership in the CORPUS index — exact-join semantics, which the
    * bloom merely prefilters — so the answer is arrival-order- and
    * batch-boundary-independent (and the corpus has no duplicate
    * texts, so intra-shard arrivals cannot flip it either). */
  private[graft] lazy val d14Oracle: String =
    s"""WITH shard AS (SELECT doc_id + 1000000 AS doc_id,
            md5(CASE WHEN ${Hashing.duck32("'shard:' || doc_id")} % 100 < 10
                     THEN text ELSE text || ' v2' END) AS fp
            FROM documents
            WHERE ${Hashing.duck32("'shard:' || doc_id")} % 100 < 20),
        corpus AS (SELECT DISTINCT md5(text) AS fp FROM documents)
        SELECT s.doc_id, (c.fp IS NOT NULL) AS seen
        FROM shard s LEFT JOIN corpus c USING (fp)"""

  /** stream12's maintained-index root (the s16 artifact pattern:
    * fixed scratch path, pre-cleaned at build). */
  private[graft] def shardIndexDir: String =
    graft.RunScratch.path("index/sharddedup")

  private[queries] def bloomPath = java.nio.file.Paths.get(shardIndexDir, "bloom", "bloom.bin")

  /** BUILD: write the corpus fingerprint index — the base fps parquet
    * (exact side) and the serialized mergeable bloom (probe side).
    * The bloom is ONE bounded binary whatever the corpus size; the
    * fps table is the corpus-sized artifact, the d14 comment's
    * "maintained index, not a per-run scan". */
  private[graft] def shardIndexBuild(s: SparkSession, corpus: DataFrame): Unit = {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(new java.io.File(shardIndexDir))
    val c = corpus.persist()
    c.write.mode("overwrite").parquet(s"$shardIndexDir/fps/base")
    val row = c.agg(expr(s"bloom_agg(fp, $bloomItems, $bloomBits)").as("bf")).head()
    c.unpersist()
    val bytes =
      if (row.isNullAt(0)) Array.emptyByteArray else row.getAs[Array[Byte]](0)
    java.nio.file.Files.createDirectories(bloomPath.getParent)
    java.nio.file.Files.write(bloomPath, bytes)
  }

  /** The index's current exact side: base fps plus every batch's
    * appended novelties. */
  private[queries] def indexFps(s: SparkSession): DataFrame = {
    val inc = new java.io.File(s"$shardIndexDir/fps/incoming")
    val base = s.read.parquet(s"$shardIndexDir/fps/base")
    if (inc.exists()) base.unionByName(s.read.parquet(inc.toString)) else base
  }

  /** stream12 SERVE + MAINTAIN — d14's streaming twin over a
    * maintained index. Per micro-batch of arriving shard docs:
    * (1) probe the bloom artifact map-side (a codegen'd Literal —
    * no join, no shuffle for the overwhelming not-in-corpus
    * majority), (2) exact-verify survivors with a fingerprint-only
    * semi join against the index fps, (3) emit (doc_id, seen) to the
    * results sink, and (4) fold the batch's NOVEL fingerprints back
    * into the index: parquet append + bloom merge (same-parameter
    * blooms OR together — `BloomFilter.mergeInPlace` — so the update
    * never rescans the corpus; the artifact swap is an atomic
    * rename). This is the CDC-ingest dedup loop a training pipeline
    * runs continuously; re-streaming a shard against the updated
    * index reports every previously-novel fp as seen
    * (StreamShardDedupSpec). Returns the drained results frame. */
  private[graft] def shardDedupStream(s: SparkSession, docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.{Dataset, Row}
    val outDir = s"$shardIndexDir/results"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(new java.io.File(outDir)) // the query owns its results sink
    val q = shardFps(docs).writeStream
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val sb = batch.sparkSession
        val b = batch.persist()
        try {
          val bytes = java.nio.file.Files.readAllBytes(bloomPath)
          val cur = indexFps(sb).persist()
          val mightHit =
            if (bytes.isEmpty) lit(false) else bloomMight(bytes, col("fp"))
          val seen = b.where(mightHit).join(cur, Seq("fp"), "left_semi")
            .select("doc_id").withColumn("seen", lit(true))
          b.select("doc_id").join(seen, Seq("doc_id"), "left")
            .selectExpr("doc_id", "coalesce(seen, false) as seen")
            .write.mode("append").parquet(outDir)
          val fresh = b.select("fp").distinct()
            .join(cur, Seq("fp"), "left_anti").persist()
          val freshRow =
            fresh.agg(expr(s"bloom_agg(fp, $bloomItems, $bloomBits)").as("bf")).head()
          if (!freshRow.isNullAt(0)) {
            fresh.write.mode("append").parquet(s"$shardIndexDir/fps/incoming")
            import org.apache.spark.util.sketch.BloomFilter
            def read(x: Array[Byte]) =
              BloomFilter.readFrom(new java.io.ByteArrayInputStream(x))
            val add = read(freshRow.getAs[Array[Byte]](0))
            val merged =
              if (bytes.isEmpty) add
              else { val m = read(bytes); m.mergeInPlace(add); m }
            val bo = new java.io.ByteArrayOutputStream()
            merged.writeTo(bo)
            val tmp = bloomPath.resolveSibling("bloom.bin.tmp")
            java.nio.file.Files.write(tmp, bo.toByteArray)
            java.nio.file.Files.move(tmp, bloomPath,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          }
          fresh.unpersist()
          cur.unpersist()
          () // foreachBatch wants Unit; unpersist returns the frame
        } finally b.unpersist()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    if (!q.awaitTermination(300000)) {
      q.stop()
      throw new IllegalStateException("stream12 did not drain within 300s")
    }
    s.read.parquet(outDir)
  }

  // lazy: read during Dedup.all's construction — if an external
  // caller touches DedupKernels first, these must not be observed
  // mid-init as null
  private[queries] lazy val duckSimhash: String =
    s"""WITH th AS (SELECT doc_id,
         list_transform(string_split(text,' '),
           tok -> [${Hashing.duck32("tok")}, ${Hashing.duck32b("tok")}]) AS th
       FROM documents),
       $duckSimhashFold"""
  /** d03's oracle SQL — also the `p` CTE of d08's cluster oracle. */
  private[queries] lazy val d03Oracle: String =
    s"""$duckShingles,
       sigs AS (SELECT doc_id, ${duckSig(16)} AS sig FROM hs),
       b AS (SELECT doc_id, unnest(generate_series(0, 3)) AS band, sig FROM sigs),
       bk AS MATERIALIZED (SELECT doc_id, band,
                ${Hashing.duck32("band || ':' || array_to_string(sig[band*4+1:band*4+4], ',')")} AS bucket
              FROM b),
       cand AS (SELECT DISTINCT a.doc_id AS d1, c.doc_id AS d2
                FROM bk a JOIN bk c
                ON a.band = c.band AND a.bucket = c.bucket AND a.doc_id < c.doc_id)
       SELECT d1, d2, jac FROM
         (SELECT d1, d2,
                 CAST(len(list_intersect(x.hv, y.hv)) AS DOUBLE)
                   / len(list_distinct(x.hv || y.hv)) AS jac
          FROM cand JOIN hs x ON x.doc_id = d1 JOIN hs y ON y.doc_id = d2)
       WHERE jac >= 0.7"""
  private[queries] lazy val duckShingles =
    """WITH t AS (SELECT doc_id, string_split(text,' ') AS t FROM documents
                  WHERE len(string_split(text,' ')) >= 3),
       sh AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, len(t)-2),
                       i -> array_to_string(t[i:i+2], ' '))) AS sh FROM t),
       hs AS MATERIALIZED (SELECT doc_id, sh, list_transform(sh, s -> (('0x' || substr(md5(s), 1, 8))::BIGINT) % 2147483647) AS hv FROM sh)"""
  private[queries] def duckSig(k: Int): String = {
    // UNROLLED per permutation, not `list_transform(generate_series(0,
    // k-1), j -> list_min(...))`: DuckDB executes a nested lambda that
    // captures an outer column (hv) row-at-a-time — measured 239 s for
    // 50 k docs at sf10-textgrow, the entire reason the d/c-family
    // oracles blew the 420–900 s checker budget. k independent flat
    // `list_min(list_transform(hv, …))` terms stay vectorized: 2.3 s
    // on the same sample (104×), bit-identical output (same a·h+b mod P
    // arithmetic, same element order).
    val a = graft.functions.MinHash.coefA(k)
    val b = graft.functions.MinHash.coefB(k)
    (0 until k).map { j =>
      s"list_min(list_transform(hv, h -> (${a(j)} * h + ${b(j)}) % $P))"
    }.mkString("[", ",\n            ", "]")
  }

  /** The dedup stage's DROP SET (consumed by c01/c03): exact dups —
    * every non-minimum doc_id of an identical-text group, one linear
    * md5 hash-groupBy — unioned with the near-dup rule (drop the
    * larger end of every verified jac ≥ 0.7 pair) run over the
    * exact-group REPRESENTATIVES only.
    *
    * Provably the same set as running the pair join over the full
    * corpus: identical texts have identical shingle sets, so
    * jac(rep(s), d) = jac(s, d) for any member s of rep(s)'s group —
    * a doc dropped by a full-corpus pair (s, d) is dropped here
    * either as a non-rep (exact stage) or via the pair
    * (rep(s) ≤ s < d, same verdict); conversely every rep-pair also
    * exists in the full-corpus join. What changes is the COST under
    * dup storms: the sf100 fixture (1000 identical copies per doc)
    * makes the full-corpus candidate join quadratic in copies —
    * ~2.5 B pairs whose hv-carrying verify would ship terabytes —
    * while the rep topology collapses the storm in the linear exact
    * pass and hands LSH one doc per distinct text. This is the
    * production ordering (exact pass first, near-dup on survivors);
    * d03 itself still lists full-corpus pairs — that is its
    * contract as the pair-monitoring query. */
  private[queries] def dupDrops(s: SparkSession, d: String): DataFrame =
    graft.PlanMemo.of(s, s"dupDrops:$d") { dupDropsBuild(s, d) }

  private def dupDropsBuild(s: SparkSession, d: String): DataFrame = {
    Hashing.register(s)
    graft.plans.JaccardRewrite.install(s)
    // only LSH-ELIGIBLE docs (≥3 tokens — hashedDocsOf's domain) can
    // appear in pairs, so only they may be dropped: a short doc's
    // exact twin survives the pair join and must survive here too
    val eligible = Tables(s, d, "documents").where(s"size($toks) >= 3")
    val reps = eligible.groupBy(md5(col("text")).as("h"))
      .agg(min("doc_id").as("doc_id"))
      .select("doc_id")
      .persistScoped()
    val exactDrops = eligible.select("doc_id").join(reps, Seq("doc_id"), "left_anti")
    val hs = hashedDocsOf(eligible.join(reps, Seq("doc_id"), "left_semi")
      .repartition(s.sparkContext.defaultParallelism)).persistScoped()
    val bk = bandBuckets(hs).persistScoped()
    val nearDrops = scoredCandidates(hs, bk, jaccardExpr)
      .where("jac >= 0.7").select(col("d2").as("doc_id"))
    exactDrops.unionByName(nearDrops).distinct()
  }

  /** b-bit minhash (Li & Konig, WWW 2010) — the storage-collapsed
    * estimator next to d13's full-signature one: keep only the
    * lowest b = 2 bits of each of the 16 minhash values (4 bytes per
    * doc instead of 128 — the paper's point: at 1 B docs the
    * signature store drops from ~128 GB to 4 GB), and correct the
    * matched fraction for the 1/2^b accidental-collision floor:
    * E[match] = C + (1 - C)J with C = 1/4, so J = (4*match - 1)/3.
    * Exactness discipline: all-integer basis points with floor
    * division, clamped at 0 (a below-floor match rate estimates 0,
    * not negative) — bit-identical cross-engine. Same banded
    * candidate topology as every LSH query (bounded, never
    * all-pairs); the estimate rides next to the exact Jaccard so the
    * gate pins the estimator's bias on real pairs. */
  private[queries] val bbitEntry: (String, Q) =
    "d26_bbit_minhash" -> Q(
      (s, d) => {
        val (hs, bk) = lshFrames(s, d)
        val sigs = hs.selectExpr("doc_id",
          "transform(affine_minhash(hv, 16), v -> v % 4) as bb")
        scoredCandidates(hs, bk,
            "cast(size(array_intersect(hv1, hv2)) * 10000 as bigint) div size(array_union(hv1, hv2)) as jac_bp")
          .join(sigs.selectExpr("doc_id as d1", "bb as b1"), "d1")
          .join(sigs.selectExpr("doc_id as d2", "bb as b2"), "d2")
          .selectExpr("d1", "d2", "jac_bp",
            "cast(aggregate(sequence(0, 15), 0, (acc, j) -> acc + if(b1[j] = b2[j], 1, 0)) * 10000 as bigint) div 16 as match_bp")
          .selectExpr("d1", "d2", "jac_bp", "match_bp",
            "greatest(0L, (4 * match_bp - 10000) div 3) as est_bp")
      },
      Some(s"""$duckShingles,
               sigs AS MATERIALIZED (SELECT doc_id,
                          list_transform(${duckSig(16)}, v -> v % 4) AS bb
                        FROM hs),
               b AS (SELECT doc_id, unnest(generate_series(0, 3)) AS band,
                            ${duckSig(16)} AS sig FROM hs),
               bk AS MATERIALIZED (SELECT doc_id, band,
                        ${graft.functions.Hashing.duck32("band || ':' || array_to_string(sig[band*4+1:band*4+4], ',')")} AS bucket
                      FROM b),
               cand AS (SELECT DISTINCT a.doc_id AS d1, c.doc_id AS d2
                        FROM bk a JOIN bk c
                        ON a.band = c.band AND a.bucket = c.bucket AND a.doc_id < c.doc_id),
               scored AS (SELECT d1, d2,
                                 (CAST(len(list_intersect(x.hv, y.hv)) * 10000 AS BIGINT))
                                   // len(list_distinct(x.hv || y.hv)) AS jac_bp,
                                 (CAST(len(list_filter(generate_series(1, 16),
                                    j -> sx.bb[j] = sy.bb[j])) * 10000 AS BIGINT)) // 16 AS match_bp
                          FROM cand JOIN hs x ON x.doc_id = d1
                                    JOIN hs y ON y.doc_id = d2
                                    JOIN sigs sx ON sx.doc_id = d1
                                    JOIN sigs sy ON sy.doc_id = d2)
               SELECT d1, d2, jac_bp, match_bp,
                      greatest(0, (4 * match_bp - 10000) // 3) AS est_bp
               FROM scored"""))

    // ── d25: CONTENT-DEFINED CHUNKING dedup — the rsync/FastCDC idea
    // at token granularity: a chunk boundary falls AFTER every token
    // whose hash ≡ 0 (mod 8), so boundaries are a function of CONTENT,
    // not position — prepend a paragraph and every downstream chunk is
    // unchanged (the property fixed-size c06 lacks: one inserted token
    // shifts every later window). Expected chunk length is the modulus
    // (≈8 tokens), length is variable. Scale shape: the chunker is ONE
    // map-side array fold per document (no token-level exchange —
    // contrast the oracle's window formulation, which DuckDB can
    // afford single-node); only (doc_id, 8-byte chunk fingerprint)
    // rows cross the shuffle, and the shared-chunk count is a
    // fingerprint-keyed partial agg. Fingerprints are h32, replayed
    // exactly by the DuckDB mirror. ──
  private[queries] val cdcEntry: (String, Q) =
    "d25_cdc_chunks" -> Q(
      (s, d) => {
        Hashing.register(s)
        val chunks = Tables(s, d, "documents")
          .repartition(s.sparkContext.defaultParallelism)
          .selectExpr("doc_id",
            s"""aggregate(
                  $toks,
                  named_struct('done', cast(array() as array<string>), 'cur', ''),
                  (acc, t) -> case when h32(t) % 8 = 0
                    then named_struct(
                      'done', array_append(acc.done,
                        case when acc.cur = '' then t
                             else concat(acc.cur, ' ', t) end),
                      'cur', '')
                    else named_struct(
                      'done', acc.done,
                      'cur', case when acc.cur = '' then t
                                  else concat(acc.cur, ' ', t) end) end,
                  acc -> case when acc.cur = '' then acc.done
                              else array_append(acc.done, acc.cur) end) as chunks""")
          .select(col("doc_id"), explode(col("chunks")).as("chunk"))
          .selectExpr("doc_id", "h32(chunk) as fp")
          .persistScoped()
        val shared = chunks.select("doc_id", "fp").distinct()
          .groupBy("fp").agg(count(lit(1)).as("nd")).where("nd >= 2")
          .select("fp")
        chunks.join(shared.withColumn("is_shared", lit(1L)), Seq("fp"), "left")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_chunks"),
            sum(coalesce(col("is_shared"), lit(0L))).as("n_shared"))
          .selectExpr("doc_id", "n_chunks", "n_shared",
            "n_shared * 10000 div n_chunks as shared_bp")
      },
      Some(s"""WITH dcs AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
               tok AS (SELECT doc_id, i AS pos, t[i] AS tok,
                              CASE WHEN ${Hashing.duck32("t[i]")} % 8 = 0
                                   THEN 1 ELSE 0 END AS brk
                       FROM dcs, LATERAL (SELECT unnest(generate_series(1, len(t))) AS i) g),
               cid AS (SELECT doc_id, pos, tok,
                              coalesce(sum(brk) OVER (
                                PARTITION BY doc_id ORDER BY pos
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                                0) AS chunk
                       FROM tok),
               ch AS (SELECT doc_id, chunk,
                             ${Hashing.duck32("string_agg(tok, ' ' ORDER BY pos)")} AS fp
                      FROM cid GROUP BY 1, 2),
               shared AS (SELECT fp FROM
                            (SELECT fp, count(DISTINCT doc_id) AS nd
                             FROM ch GROUP BY 1)
                          WHERE nd >= 2)
               SELECT doc_id, count(*) AS n_chunks,
                      CAST(sum(CASE WHEN fp IN (SELECT fp FROM shared)
                                    THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
                      CAST(sum(CASE WHEN fp IN (SELECT fp FROM shared)
                                    THEN 1 ELSE 0 END) * 10000
                           // count(*) AS BIGINT) AS shared_bp
               FROM ch GROUP BY 1"""))
}
