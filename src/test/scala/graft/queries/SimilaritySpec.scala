package graft.queries

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Similarity-tier invariants on the sf0.001 testdata. */
class SimilaritySpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("s09 recall harness: one row per probe, integer recall in range, hits bounded by k") {
    val rows = Similarity.all("s09_ann_recall").fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).distinct.length === rows.length)
    assert(rows.nonEmpty)
    rows.foreach { case (probe, hits, bp) =>
      assert(hits >= 0 && hits <= 3, s"probe $probe hits $hits")
      assert(bp === hits * 10000 / 3, s"probe $probe recall_bp $bp")
    }
  }

  test("s21 hard negatives: cross-label only, cosine-desc, dominated by the unconstrained top-1") {
    val labels = graft.Tables(spark, sf, "embeddings")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val neg = Similarity.all("s21_hard_negatives").fn(spark, sf).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("cand_id"),
        r.getAs[Int]("rnk"), r.getAs[Double]("cosine")))
    assert(neg.nonEmpty)
    neg.foreach { case (p, c, _, _) =>
      assert(labels(p) != labels(c), s"same-label pair ($p, $c) in negatives") }
    // ranks are cosine-desc within probe
    neg.groupBy(_._1).values.foreach { rs =>
      val sorted = rs.sortBy(_._3).toList
      sorted.zip(sorted.drop(1)).foreach {
        case (a, b) => assert(a._4 >= b._4)
      }
    }
    // the label constraint can only LOWER the best attainable cosine
    val top1 = Similarity.all("s01_topk_cosine").fn(spark, sf).collect()
      .filter(_.getAs[Int]("rnk") == 1)
      .map(r => r.getAs[Long]("probe_id") -> r.getAs[Double]("cosine")).toMap
    neg.filter(_._3 == 1).foreach { case (p, _, _, cos) =>
      assert(cos <= top1(p) + 1e-12, s"probe $p: constrained top-1 beats unconstrained") }
    // and the constraint genuinely bit somewhere: at least one probe's
    // unconstrained nearest neighbour is same-label (else the test is vacuous)
    val s01 = Similarity.all("s01_topk_cosine").fn(spark, sf).collect()
      .filter(_.getAs[Int]("rnk") == 1)
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("cand_id")))
    assert(s01.exists { case (p, c) => labels(p) == labels(c) },
      "testdata has no same-label nearest neighbour; constraint untested")
  }

  test("s01 heap-aggregate top-k equals the window formulation on real embeddings") {
    // the window form (row_number over probe_id) is the semantic
    // reference; the shipped bounded-heap aggregate must agree row for
    // row — ordering, ties (cosine desc, cand_id asc) and all
    val agg = Similarity.all("s01_topk_cosine").fn(spark, sf)
      .collect().map(_.toSeq).toSet
    val win = SimilarityKernels.windowTopk(spark, sf, 5)
      .collect().map(_.toSeq).toSet
    assert(agg === win)
    assert(agg.size === 50) // 10 probes x 5
  }

  test("s17 MMR equals a serial greedy recompute and genuinely diversifies") {
    // serial reference: greedy argmax of (7·rel − 3·maxSimToSelected)/10
    // over the exact top-10 shortlist, ties to the smaller cand_id
    val emb = graft.Tables(spark, sf, "embeddings")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i); i += 1 }
      s
    }
    def cos(a: Long, b: Long): Double =
      dot(emb(a), emb(b)) / (math.sqrt(dot(emb(a), emb(a))) * math.sqrt(dot(emb(b), emb(b))))
    val short = SimilarityKernels.windowTopk(spark, sf, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
      .groupBy(_._1)
    val expected = short.flatMap { case (probe, rows) =>
      var rem = rows.map(r => r._2 -> r._3).toMap
      var sel = Vector.empty[(Long, Int, Double)]
      for (step <- 1 to 5) {
        val (cand, score) = rem.map { case (c, rel) =>
          val pen = if (sel.isEmpty) 0.0 else sel.map(s => cos(c, s._1)).max
          c -> ((7 * rel - 3 * pen) / 10)
        }.toSeq.maxBy { case (c, sc) => (sc, -c) }
        sel :+= ((cand, step, score)); rem -= cand
      }
      sel.map { case (c, rk, sc) => (probe, c, rk, sc) }
    }.toSet
    val got = Similarity.all("s17_mmr_rerank").fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(got.map(t => (t._1, t._2, t._3)) === expected.map(t => (t._1, t._2, t._3)))
    got.foreach { case (p, c, rk, sc) =>
      val ref = expected.find(e => e._1 == p && e._3 == rk).get._4
      assert(math.abs(sc - ref) < 1e-12, s"probe $p rank $rk score $sc vs $ref")
    }
    // diversity must have an effect: some probe's MMR five differs
    // from its plain relevance five
    val top5 = short.map { case (p, rows) =>
      p -> rows.sortBy(r => (-r._3, r._2)).take(5).map(_._2).toSet
    }
    val mmr5 = got.groupBy(_._1).map { case (p, rs) => p -> rs.map(_._2) }
    assert(mmr5.exists { case (p, s) => s != top5(p) },
      "MMR never diverged from plain top-5 — the penalty term is dead")
  }

  test("k-means fit recovers planted clusters and reaches a fixed point") {
    graft.functions.Hashing.register(spark)
    import spark.implicits._
    // 3 planted clusters on near-orthogonal directions; vec_ids 0,1,2
    // (the seeds) land in distinct clusters by construction
    val pts = (0 until 60).map { i =>
      val base = Array.fill(64)(0.0f)
      base(i % 3) = 1.0f
      base(10 + (i % 5)) = 0.05f // deterministic jitter
      (i.toLong, base.toSeq)
    }
    val e = pts.toDF("vec_id", "embedding")
      .selectExpr("vec_id", "embedding", "vnorm(embedding) as nrm")
    val fit2 = SimilarityKernels.kmeansFit(e, 3, 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fit3 = SimilarityKernels.kmeansFit(e, 3, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fit3 === fit2, "assignments must be a fixed point")
    (0 until 60).foreach { i =>
      assert(fit3(i.toLong) === (i % 3).toLong, s"vec $i misassigned")
    }
  }

  test("k-means step drops emptied clusters and sizes sum to the corpus") {
    graft.functions.Hashing.register(spark)
    val emb = graft.Tables(spark, sf, "embeddings")
      .selectExpr("vec_id", "embedding", "vnorm(embedding) as nrm")
    val step = SimilarityKernels.kmeansStep(emb, SimilarityKernels.kmeansSeed(emb, 8))
      .collect()
    val n = graft.Tables(spark, sf, "embeddings").count()
    val bySize = step.map(r => r.getLong(0) -> r.getLong(1)).distinct
    assert(bySize.map(_._2).sum === n, "cluster sizes must partition the corpus")
    assert(step.length === bySize.length * 64, "64 positions per surviving cluster")
  }

  test("pq encoding: seeds self-encode, codes are in range, ADC favors the planted twin") {
    graft.functions.Hashing.register(spark)
    val e = graft.Tables(spark, sf, "embeddings").select("vec_id", "embedding")
    val cb = SimilarityKernels.pqCodebook(e)
    assert(cb.length === 8 && cb.forall(s => s.length === 16 && s.forall(_.length === 8)))
    val codes = SimilarityKernels.pqEncode(e, cb).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    codes.values.foreach(cs => assert(cs.length === 8 && cs.forall(c => c >= 0 && c < 16)))
    // a codebook seed's subvectors are its own codewords: d2 = 0 exactly
    (0L until 16L).foreach(id => assert(codes(id) === Seq.fill(8)(id), s"seed $id"))
    // identical embeddings always share identical codes
    val byVec = e.collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
      .groupBy(_._2).values.filter(_.length >= 2)
    byVec.foreach(g => assert(g.map(v => codes(v._1)).distinct.length === 1))
  }

  test("r9 trained PQ codebook strictly reduces quantization error vs the seed codebook") {
    graft.functions.Hashing.register(spark)
    val e = graft.Tables(spark, sf, "embeddings").select("vec_id", "embedding")
    val seedErr = SimilarityKernels.pqQuantError(e, SimilarityKernels.pqCodebook(e))
    val trainedErr = SimilarityKernels.pqQuantError(e, SimilarityKernels.trainedPqCodebook(e))
    assert(trainedErr < seedErr,
      s"Lloyd training must descend the quantization objective: $trainedErr !< $seedErr")
  }

  test("r9 trained coarse quantizer tightens cells (mean best-centroid cosine rises)") {
    graft.functions.Hashing.register(spark)
    val e = graft.Tables(spark, sf, "embeddings")
      .selectExpr("vec_id", "embedding", "vnorm(embedding) as nrm")
    val (seeds, trained) = SimilarityKernels.coarseCents(e)
    val before = SimilarityKernels.coarseObjective(e, seeds)
    val after = SimilarityKernels.coarseObjective(e, trained)
    assert(after > before,
      s"coarse training must tighten cells: $after !> $before")
  }

  test("s15 sweep: recall is monotone non-decreasing in nprobe, per probe") {
    // scanning more cells can only grow the candidate pool, and any
    // candidate that displaces an exact-top-3 hit from the ANN top-3
    // must itself rank above it in the exact order — so per-probe
    // hits can never drop as nprobe rises
    val rows = Similarity.all("s15_nprobe_sweep").fn(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val probes = rows.keys.map(_._2).toSet
    assert(probes.size === 10)
    probes.foreach { p =>
      assert(rows((1, p)) <= rows((2, p)), s"probe $p: nprobe 1->2 dropped")
      assert(rows((2, p)) <= rows((4, p)), s"probe $p: nprobe 2->4 dropped")
    }
    // and the sweep must actually move somewhere, or the dial is fake
    assert(rows.collect { case ((4, p), h) => h - rows((1, p)) }.sum > 0,
      "nprobe 4 found nothing beyond nprobe 1 on any probe")
  }

  test("s10 semantic clusters: labels are component minima over the s04 pair graph") {
    val pairs = Similarity.all("s04_embed_dup").fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val clusters = Similarity.all("s10_embed_clusters").fn(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every edge endpoint is labeled, both ends share a label, and
    // the label is never larger than the member
    pairs.foreach { case (a, b) =>
      assert(clusters.contains(a) && clusters.contains(b), s"($a,$b) unlabeled")
      assert(clusters(a) === clusters(b), s"($a,$b) split across clusters")
      assert(clusters(a) <= math.min(a, b))
    }
    // only vertices that appear in an edge are labeled
    val vertices = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    assert(clusters.keySet === vertices)
  }

  test("s13 IVF-PQ+R: ranks contiguous, cosine descending, candidates confined to probed cells") {
    val rows = Similarity.all("s13_ivfpq").fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    for ((probe, g) <- rows.groupBy(_._1)) {
      val sorted = g.sortBy(_._3)
      assert(sorted.map(_._3).toSeq === (1 to g.length), s"probe $probe ranks")
      // re-ranked output orders by EXACT cosine, descending
      assert(sorted.map(_._4).toSeq === sorted.map(_._4).sorted.reverse.toSeq,
        s"probe $probe cosine order")
      assert(g.length <= 3 && g.forall(_._2 != probe), s"probe $probe k/self")
    }
    // two-stage pruning really prunes: some probe must see fewer than
    // 3 candidates OR the candidate union must be well under corpus
    val corpus = graft.Tables(spark, sf, "embeddings").count()
    assert(rows.map(_._2).distinct.length < corpus, "no pruning happened")
  }

  test("s16 index roundtrip: serve-from-artifacts equals the direct s13 answer; artifacts complete") {
    val direct = Similarity.all("s13_ivfpq").fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    val served = Similarity.all("s16_index_roundtrip").fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(served === direct, "persistence roundtrip changed the answer")
    // the artifacts on disk are a complete index: every corpus vector
    // appears exactly once in the postings with an 8-byte code, and
    // the quantizer heads have full shape
    val ix = SimilarityKernels.ivfPqIndexDir
    val corpus = graft.Tables(spark, sf, "embeddings").count()
    val post = spark.read.parquet(s"$ix/postings")
    assert(post.count() === corpus)
    assert(post.select("cand_id").distinct().count() === corpus)
    assert(post.selectExpr("max(size(codes))", "min(size(codes))")
      .collect().head.toSeq === Seq(8, 8))
    assert(spark.read.parquet(s"$ix/centroids").count() === 16L * 64)
    assert(spark.read.parquet(s"$ix/codebooks").count() === 8L * 16 * 8)
    // the refine sidecar covers the corpus: one raw vector per id,
    // partitioned by the same cell key as the postings
    val side = spark.read.parquet(s"$ix/vectors")
    assert(side.count() === corpus)
    assert(side.select("vec_id").distinct().count() === corpus)
    assert(side.columns.contains("cell"))
  }

  test("s18 filtered ANN: hits satisfy the predicate; pre-filter finds what post-filtering loses") {
    val rows = Similarity.all("s18_filtered_ann").fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val labels = graft.Tables(spark, sf, "embeddings")
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    rows.foreach { case (_, c, _, _) =>
      assert(labels(c) % 2 == 0, s"candidate $c violates the predicate") }
    for ((probe, g) <- rows.groupBy(_._1)) {
      val sorted = g.sortBy(_._3)
      assert(sorted.map(_._3).toSeq === (1 to g.length), s"probe $probe ranks")
      assert(sorted.map(_._4).toSeq === sorted.map(_._4).sorted.reverse.toSeq,
        s"probe $probe cosine order")
    }
    // the production pitfall this operator exists to avoid: filtering
    // the UNFILTERED top-3 afterwards returns fewer hits whenever the
    // unfiltered top-3 is predicate-poor — the pre-filtered search
    // must beat the post-filter on at least one probe
    val post = Similarity.all("s05_ivf_topk").fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (_, c) => labels(c) % 2 == 0 }
      .groupBy(_._1).view.mapValues(_.length).toMap
    val pre = rows.groupBy(_._1).view.mapValues(_.length).toMap
    assert(pre.exists { case (p, n) => n > post.getOrElse(p, 0) },
      "pre-filter never beat post-filter — the demo predicate is too weak")
  }

  test("s14 IVFADC+R: exact re-rank lifts recall@3 above the raw ADC shortlist floor") {
    graft.functions.Hashing.register(spark)
    import org.apache.spark.sql.functions.{broadcast, col}
    val Sim = SimilarityKernels
    val e = graft.Tables(spark, sf, "embeddings")
      .selectExpr("vec_id", "embedding", "vnorm(embedding) as nrm").cache()
    val exact = SimilarityKernels.windowTopk(spark, sf, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the ADC stage alone (s13 minus the re-rank), top-3
    val cents = Sim.lloydCents(e, Sim.ivfSeeds(e), SimilarityKernels.ivfIters)
    val rf = Sim.residualFrame(e, cents)
    val cb = Sim.pqCodebookTrained(rf, SimilarityKernels.pqIters)
    val codes = Sim.pqEncode(rf, cb, keep = Seq("cell"))
      .select(col("vec_id").as("cand_id"), col("cell"), col("codes"))
    val probes = e.where("vec_id < 10")
    val cand = broadcast(Sim.probeCells(probes, cents, 2))
      .join(codes, "cell")
      .where(col("cand_id") =!= col("probe_id"))
    val adc3 = Sim.adcTopk(cand.join(
      broadcast(Sim.pqProbeTablesRes(probes, cents, cb, 2)), Seq("probe_id", "cell")), 3)
    def hits(df: org.apache.spark.sql.DataFrame): Int =
      df.select("probe_id", "cand_id").collect()
        .count(r => exact((r.getLong(0), r.getLong(1))))
    val adcHits = hits(adc3)
    val rerankHits = Similarity.all("s14_ivfpq_recall").fn(spark, sf)
      .collect().map(_.getLong(1)).sum.toInt
    e.unpersist()
    assert(rerankHits >= adcHits,
      s"re-ranking a superset shortlist cannot lose recall: $rerankHits !>= $adcHits")
    assert(rerankHits > adcHits,
      s"the R=${SimilarityKernels.rerankR} refine must lift recall on this corpus: $rerankHits !> $adcHits")
  }

  test("s19 index delete: no tombstoned id survives, deletion genuinely backfills answers") {
    graft.functions.Hashing.register(spark)
    def deleted(id: Long): Boolean = {
      // mirror of the tombstone predicate (md5-derived h32 % 10 == 0)
      val rows = spark.sql(
        s"SELECT ${graft.functions.Hashing.h32Sql(s"concat('del:', ${id}L)")} % 10 = 0").collect()
      rows.head.getBoolean(0)
    }
    val got = Similarity.all("s19_index_delete").fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val base = Similarity.all("s13_ivfpq").fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.nonEmpty && got.map(_._1).toSet === base.map(_._1).toSet)
    // no deleted id in any answer
    val citedIds = got.map(_._2).distinct
    citedIds.foreach(id => assert(!deleted(id), s"tombstoned $id served"))
    // ranks stay contiguous top-3 per probe
    got.groupBy(_._1).foreach { case (p, rs) =>
      assert(rs.map(_._3).sorted === (1 to rs.length), s"probe $p ranks ${rs.map(_._3)}")
    }
    // the deletion must genuinely change some answer (a deleted id
    // held a top-3 slot in s13 and a survivor backfilled it) — if the
    // ~10% tombstone set never hit the top-3, the spec proved nothing
    assert(base.exists { case (_, id, _) => deleted(id) },
      "no s13 answer was deleted - tombstone set too lucky to test backfill")
    assert(got.toSet != base.toSet, "deletion changed nothing")
  }

  test("d17 SemDeDup: verdicts sound against raw cosines, complete within cells") {
    graft.functions.Hashing.register(spark)
    val out = Similarity.all("d17_semdedup").fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val emb = graft.Tables(spark, sf, "embeddings")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Long, b: Long): Double = {
      val (x, y) = (emb(a), emb(b))
      var d = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < x.length) {
        d += x(i).toDouble * y(i); nx += x(i).toDouble * x(i)
        ny += y(i).toDouble * y(i); i += 1
      }
      d / (math.sqrt(nx) * math.sqrt(ny))
    }
    assert(out.map(_._1).toSet === emb.keySet) // every vector gets a verdict
    val cellOf = out.map(t => t._1 -> t._2).toMap
    out.foreach { case (id, cell, dupOf, keep) =>
      assert(keep === (dupOf == -1L), s"$id: keep/dup_of disagree")
      if (dupOf != -1L) {
        // soundness: the cited duplicate source is a real in-cell
        // smaller-id neighbor above the threshold
        assert(dupOf < id, s"$id cites non-smaller $dupOf")
        assert(cellOf(dupOf) === cell, s"$id cites out-of-cell $dupOf")
        assert(cos(id, dupOf) >= 0.4, s"$id-$dupOf cos ${cos(id, dupOf)} < 0.4")
      }
    }
    // completeness within the reported cells: any in-cell pair with
    // cosine >= threshold must mark the larger id a duplicate of an
    // id no larger than the smaller one
    for {
      (a, cellA, _, _) <- out; (b, cellB, dupB, _) <- out
      if a < b && cellA == cellB && cos(a, b) >= 0.4
    } assert(dupB != -1L && dupB <= a,
      s"in-cell pair ($a,$b) cos ${cos(a, b)} missed: dup_of=$dupB")
    // the operator must actually fire on this corpus
    assert(out.exists(!_._4), "no semantic duplicate found at all")
  }

  test("s20 range search: exact side equals the serial radius count, index side never exceeds it") {
    val e = graft.Tables(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Long, b: Long): Double = {
      // the kernels' sequential-fold double sum, replayed serially
      val (x, y) = (e(a), e(b))
      var dp = 0.0; var nx = 0.0; var ny = 0.0
      for (i <- x.indices) {
        dp += x(i).toDouble * y(i).toDouble
        nx += x(i).toDouble * x(i).toDouble
        ny += y(i).toDouble * y(i).toDouble
      }
      dp / (math.sqrt(nx) * math.sqrt(ny))
    }
    val expected = e.keys.filter(_ < 10).map { p =>
      p -> e.keys.count(c => c != p && cos(p, c) >= 0.3).toLong
    }.toMap
    val out = Similarity.all("s20_range_search").fn(spark, sf).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("n_exact"),
        r.getAs[Long]("n_index"), r.getAs[Long]("recall_bp")))
    assert(out.map(_._1).toSet === expected.keySet, "one row per probe")
    out.foreach { case (p, nExact, nIndex, bp) =>
      assert(nExact === expected(p), s"probe $p exact radius count")
      assert(nIndex <= nExact, s"probe $p: index found $nIndex > exact $nExact " +
        "— index hits must be a subset of the radius set")
      assert(bp === nIndex * 10000 / math.max(nExact, 1L), s"probe $p recall_bp")
    }
    // the radius cut and the index must both fire on real data
    assert(out.exists(_._2 > 0), "no probe has any exact radius neighbor")
    assert(out.exists(_._3 > 0), "the bucket index found nothing anywhere")
  }

  test("s22 insert: shard-encoded postings equal the one-shot encode; answer equals s13 verbatim") {
    graft.functions.Hashing.register(spark)
    val e = graft.Tables(spark, sf, "embeddings")
      .selectExpr("vec_id", "embedding", "vnorm(embedding) as nrm").cache()
    val cents = SimilarityKernels.lloydCents(e, SimilarityKernels.ivfSeeds(e), SimilarityKernels.ivfIters)
    val rf = SimilarityKernels.residualFrame(e, cents)
    val cb = SimilarityKernels.pqCodebookTrained(rf, SimilarityKernels.pqIters)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).toSet
    val oneShot = rows(SimilarityKernels.pqEncode(rf, cb, keep = Seq("cell"))
      .select("vec_id", "cell", "codes"))
    val incremental = rows(
      SimilarityKernels.pqEncode(SimilarityKernels.residualFrame(e.where("vec_id < 400"), cents), cb, keep = Seq("cell"))
        .select("vec_id", "cell", "codes")
        .unionByName(SimilarityKernels.pqEncode(
          SimilarityKernels.residualFrame(e.where("vec_id >= 400"), cents), cb, keep = Seq("cell"))
          .select("vec_id", "cell", "codes")))
    assert(incremental === oneShot,
      "per-shard encode against frozen heads diverged from the one-shot index")
    assert(e.where("vec_id >= 400").count() > 0, "arriving shard empty - vacuous")
    // and the served answer is exactly s13's
    val a = Similarity.all("s22_index_insert").fn(spark, sf).collect().map(_.toString).sorted
    val b = Similarity.all("s13_ivfpq").fn(spark, sf).collect().map(_.toString).sorted
    assert(a.sameElements(b))
    e.unpersist()
  }

  test("s23 matryoshka: per-probe recall well-formed; truncation measurably imperfect but nonzero") {
    val rows = Similarity.all("s23_matryoshka_recall").fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSet === (0L until 10L).toSet, "one row per probe")
    rows.foreach { case (p, hits, bp) =>
      assert(hits >= 0 && hits <= 3, s"probe $p hits $hits")
      assert(bp === hits * 10000 / 3, s"probe $p recall_bp")
    }
    // the audit must MEASURE something: 16 of 64 dims keeps some but
    // not all of the top-3 on this corpus (all-0 or all-10000 would
    // mean the dial reads nothing)
    assert(rows.exists(_._2 > 0), "truncated ranking lost everything - suspicious")
    assert(rows.exists(_._2 < 3), "truncated ranking lost nothing - audit is vacuous here")
  }

  test("s24 cell health: occupancy partitions the corpus; load/hot are consistent; imbalance is real") {
    val sf01 = "/root/testdata/sf0.01"
    val rows = Similarity.all("s24_cell_health").fn(spark, sf01).collect()
      .map(r => (r.getAs[Long]("cell"), r.getAs[Long]("n_vecs"),
        r.getAs[Long]("load_bp"), r.getAs[Boolean]("hot")))
    assert(rows.map(_._1).sorted.toSeq === (0L until 16L), "one row per cell, empties included")
    val total = graft.Tables(spark, sf01, "embeddings").count()
    assert(rows.map(_._2).sum === total, "cell counts must partition the corpus exactly")
    rows.foreach { case (c, n, bp, hot) =>
      assert(bp === n * 16 * 10000 / total, s"cell $c load_bp")
      assert(hot === (bp >= 20000), s"cell $c hot flag")
    }
    // the audit must measure real imbalance on this corpus: a trained
    // quantizer never yields perfectly uniform cells
    assert(rows.exists(_._3 > 10000) && rows.exists(_._3 < 10000),
      "all cells at exactly ideal load - audit reads nothing")
  }

  test("s25 compaction: tombstoned ids gone, untouched cells byte-frozen, affected set minimal") {
    import spark.implicits._
    graft.functions.Hashing.register(spark)
    val sf01 = "/root/testdata/sf0.01"
    val e = graft.Tables(spark, sf01, "embeddings")
      .selectExpr("vec_id", "embedding", "vnorm(embedding) as nrm").cache()
    SimilarityKernels.ivfPqBuild(spark, e)
    val ix = SimilarityKernels.ivfPqIndexDir
    val before = spark.read.parquet(s"$ix/postings")
      .select("cand_id", "cell").collect()
      .map(r => r.getLong(0) -> r.get(1).asInstanceOf[Number].longValue).toMap
    // a TINY tombstone set so most cells stay untouched
    val victims = Seq(before.keys.min, before.keys.max)
    val victimCells = victims.map(before).distinct.sorted
    def snapshot(): Map[String, (Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      (walk(new java.io.File(s"$ix/postings")) ++ walk(new java.io.File(s"$ix/vectors")))
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getAbsolutePath -> ((f.length, f.lastModified))).toMap
    }
    val snapBefore = snapshot()
    val affected = SimilarityKernels.compactIndex(spark, victims.toDF("cand_id"))
    assert(affected === victimCells, "compaction touched cells the tombstones don't live in")
    // untouched cells' files are byte-frozen
    val snapAfter = snapshot()
    val frozen = snapBefore.keys.filterNot(p =>
      victimCells.exists(c => p.contains(s"cell=$c")))
    frozen.foreach { p =>
      assert(snapAfter.get(p).contains(snapBefore(p)), s"untouched file changed: $p")
    }
    // tombstoned ids are gone from BOTH artifacts; survivors intact
    val postsAfter = spark.read.parquet(s"$ix/postings")
      .select("cand_id").collect().map(_.getLong(0)).toSet
    assert(victims.forall(!postsAfter.contains(_)), "a tombstoned id survived compaction")
    assert(postsAfter.size === before.size - victims.size)
    val vecsAfter = spark.read.parquet(s"$ix/vectors")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(victims.forall(!vecsAfter.contains(_)), "a tombstoned vector survived in the sidecar")
    e.unpersist()
  }

  test("s26 triplets: one per anchor, sides obey the label split, margin flags are honest") {
    val sf01 = "/root/testdata/sf0.01"
    val got = Similarity.all("s26_contrastive_triplets").fn(spark, sf01).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getBoolean(5)))).toMap
    assert(got.keySet === (0L until 10L).toSet, "one triplet per anchor")
    val labels = graft.Tables(spark, sf01, "embeddings")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    got.foreach { case (a, (pos, neg, pc, nc, ok)) =>
      assert(pos != a && neg != a, s"anchor $a self-paired")
      assert(labels(pos) === labels(a), s"anchor $a positive crosses labels")
      assert(labels(neg) !== labels(a), s"anchor $a negative shares the label")
      assert(ok === (pc > nc), s"anchor $a margin flag")
    }
    // serial argmax replay: each side's pick is the true nearest
    // under the (cosine desc, cand_id asc) order
    val vecs = graft.Tables(spark, sf01, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dp = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dp += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dp / (math.sqrt(na) * math.sqrt(nb))
    }
    (0L until 10L).foreach { a =>
      val cands = vecs.keys.filter(_ != a).toSeq
      def best(pred: Long => Boolean) =
        cands.filter(pred).map(c => (c, cos(vecs(a), vecs(c))))
          .minBy { case (c, s) => (-s, c) }._1
      val (pos, neg, _, _, _) = got(a)
      assert(pos === best(c => labels(c) == labels(a)), s"anchor $a positive not the argmax")
      assert(neg === best(c => labels(c) != labels(a)), s"anchor $a negative not the argmax")
    }
  }

  test("s27 sq8 recall equals the serial int8 replay and stays high-fidelity") {
    val sf = "/root/testdata/sf0.001"
    val vecs = graft.Tables(spark, sf, "embeddings")
      .selectExpr("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def q8(v: Array[Float]): Array[Long] = {
      val ma = v.map(x => math.abs(x.toDouble)).max
      v.map(x => math.floor(x.toDouble * 127.0 / ma).toLong)
    }
    def top3(score: (Long, Long) => Double, p: Long): Set[Long] =
      vecs.keys.filter(_ != p).toSeq
        .map(c => (c, score(p, c))).sortBy { case (c, s) => (-s, c) }
        .take(3).map(_._1).toSet
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i)
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val q = vecs.map { case (id, v) => id -> q8(v) }
    def qcos(a: Array[Long], b: Array[Long]): Double = {
      val d = a.indices.map(i => a(i) * b(i)).sum
      d / (math.sqrt(a.map(x => x * x).sum.toDouble)
        * math.sqrt(b.map(x => x * x).sum.toDouble))
    }
    val expected = (0L until 10L).map { p =>
      val exact = top3((x, y) => cos(vecs(x), vecs(y)), p)
      val approx = top3((x, y) => qcos(q(x), q(y)), p)
      p -> (exact & approx).size.toLong
    }.toMap
    val got = graft.SparkEntry.queries("s27_sq8_recall")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
    // int8 against float32 should be near-lossless at top-3: strictly
    // better than half the hits overall on this corpus
    assert(got.values.sum * 2 > 30, s"sq8 recall implausibly low: $got")
  }

  test("c10 semantic decontamination: equals the serial brute force; eval side never flagged") {
    val sf = "/root/testdata/sf0.01"
    val vecs = graft.Tables(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def nrm(a: Array[Float]): Double = math.sqrt(dot(a, a))
    val ev = vecs.filter(_._1 % 101 == 0)
    val expect = vecs.filter(_._1 % 101 != 0).flatMap { case (id, v) =>
      val hits = ev.map { case (_, e) => dot(v, e) / (nrm(v) * nrm(e)) }
        .filter(_ >= 0.38)
      if (hits.isEmpty) None else Some(id -> (hits.length.toLong, hits.max))
    }.toMap
    val got = graft.SparkEntry.queries("c10_semantic_decontaminate")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got === expect)
    assert(got.nonEmpty, "no training vector flagged - threshold not exercised")
    assert(got.keys.forall(_ % 101 != 0), "an eval vector leaked into the flag set")
  }

  test("s29 hybrid RRF: score recomputes from the arm ranks; order and bounds hold") {
    val rows = graft.SparkEntry.queries("s29_hybrid_rrf")(spark, sf).collect().map { r =>
      (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getInt(1)),
        if (r.isNullAt(2)) None else Some(r.getInt(2)),
        r.getInt(3), r.getString(4))
    }
    assert(rows.length === 20)
    assert(rows.map(_._4).sorted.toSeq === (1 to 20), "fused_rnk is not 1..20")
    // the published score IS the RRF of the published ranks
    def arm(r: Option[Int]) = r.map(x => 1.0 / (60 + x)).getOrElse(0.0)
    rows.foreach { case (id, lr, vr, _, s) =>
      assert(s === f"${arm(lr) + arm(vr)}%.6f", s"doc $id score mismatch")
      assert(lr.isDefined || vr.isDefined, s"doc $id in neither shortlist")
      lr.foreach(x => assert(x >= 1 && x <= 50)); vr.foreach(x => assert(x >= 1 && x <= 50))
    }
    // fused order is non-increasing in recomputed score, doc_id tie-break
    val scored = rows.sortBy(_._4).map(t => (arm(t._2) + arm(t._3), t._1))
    scored.sliding(2).foreach { case Array((s1, d1), (s2, d2)) =>
      assert(s1 > s2 || (s1 == s2 && d1 < d2), s"order violated at $d1 -> $d2")
    }
    // the doc appearing in BOTH arms at better combined rank leads; a
    // doc present in both shortlists must out-rank one absent from both
    assert(rows.count(t => t._2.isDefined && t._3.isDefined) >= 1,
      "no document survived in both arms - fusion is vacuous")
  }

  test("s30 rank tau: equals the serial BM25-vs-cosine Kendall derivation") {
    // serial lexical arm — t08's BM25 over doc 0's distinct tokens
    val docs = graft.Tables(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq).toMap
    val q = docs(0L).toSet
    val corpus = docs.filter(_._1 > 0)
    val n = corpus.size.toDouble
    val avgdl = corpus.values.map(_.size.toLong).sum.toDouble / corpus.size
    val dfm = q.map(t => t -> corpus.values.count(_.contains(t)).toLong).toMap
    val lexBp = corpus.map { case (id, toks) =>
      val bp = toks.groupBy(identity).collect { case (t, o) if q(t) && dfm(t) > 0 =>
        val tf = o.size.toLong; val df = dfm(t); val dl = toks.size.toLong
        math.floor(math.log(1 + (n - df + 0.5) / (df + 0.5)) * (tf * 2.2)
          / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)) * 1000000).toLong
      }.sum
      id -> bp
    }.filter { case (id, bp) => docs(id).exists(q) }
    val lt = lexBp.toSeq.sortBy { case (id, bp) => (-bp, id) }.take(50)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }.toMap
    // serial vector arm — sequential-fold cosine vs embedding 0
    val vecs = graft.Tables(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val p0 = vecs(0L); val p0n = math.sqrt(dot(p0, p0))
    val vt = vecs.filter(_._1 > 0).map { case (id, v) =>
        id -> dot(p0, v) / (p0n * math.sqrt(dot(v, v))) }
      .toSeq.sortBy { case (id, c) => (-c, id) }.take(50)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }.toMap
    // serial tau over the common shortlist
    val common = lt.keySet.intersect(vt.keySet).toSeq.sorted
    val pairs = for { i <- common.indices; j <- i + 1 until common.size }
      yield (common(i), common(j))
    val c = pairs.count { case (a, b) => (lt(a) - lt(b)).sign * (vt(a) - vt(b)).sign > 0 }
    val dcount = pairs.count { case (a, b) => (lt(a) - lt(b)).sign * (vt(a) - vt(b)).sign < 0 }
    val row = graft.SparkEntry.queries("s30_rank_tau")(spark, sf).collect()
    assert(row.length === 1)
    val r = row(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((pairs.size.toLong, c.toLong, dcount.toLong)))
    assert(r.getLong(3) === c.toLong * 10000 / pairs.size - dcount.toLong * 10000 / pairs.size)
    assert(pairs.nonEmpty, "no common shortlist docs - tau is vacuous")
  }
}
