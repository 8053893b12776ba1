package graft.queries

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Dedup-tier semantics on the sf0.001 testdata (fast) plus planted
  * invariants that hold at any scale. */
class DedupSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("d03 LSH pairs are symmetric-free, above threshold, and verified") {
    val rows = Dedup.all("d03_lsh_pairs").fn(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("d1") < r.getAs[Long]("d2")) // canonical order
      assert(r.getAs[Double]("jac") >= 0.7)             // verified, not just bucketed
    }
  }

  test("exact-dup groups partition the table") {
    val df = Dedup.all("d01_exact_dup").fn(spark, sf)
    val total = df.selectExpr("sum(n_docs)").head.getLong(0)
    val docs = graft.Tables(spark, sf, "documents").count()
    assert(total === docs)
  }

  test("d06 banding recovers EVERY pair at hamming <= 3 (pigeonhole recall proof)") {
    import spark.implicits._
    // planted distances: flips placed to defeat any single band where
    // possible — id 4 differs from id 1 in all four 16-bit bands.
    // base has the sign bit set: the negative-simhash band math must
    // agree with the oracle's arithmetic-shift + mask.
    val base = 0x8123456789ABCDEFL
    val sh = Seq(
      1L -> base,
      2L -> (base ^ 3L),                                   // h=2, both flips in band 0
      3L -> (base ^ (1L | (1L << 16) | (1L << 32))),       // h=3, bands 0..2 flipped
      4L -> (base ^ (1L | (1L << 16) | (1L << 32) | (1L << 48))) // h=4, ALL bands flipped
    ).toDF("doc_id", "simhash")
    val pairs = DedupKernels.simhashPairs(sh)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // every hamming<=3 pair is present; (1,4) and (2,4) at hamming 4
    // share no band and are correctly absent
    assert(pairs === Set((1L, 2L, 2), (1L, 3L, 3), (2L, 3L, 3), (3L, 4L, 1)))
  }

  test("d06 bands each read a full, distinct 16-bit window (2^16 key space)") {
    import spark.implicits._
    // the banding expression used by simhashPairs, probed directly:
    // all-ones hits the max key in every band; a single bit at the top
    // of window k lights only band k — so no band has < 2^16 key space
    // and no two bands overlap. (The old 8-bit scheme capped the key
    // space at 256 per band — quadratic buckets by construction.)
    val probes = Seq(-1L) ++ (0 to 3).map(k => 1L << (16 * k + 15))
    val df = probes.toDF("simhash")
      .selectExpr("simhash",
        "transform(sequence(0, 3), band -> shiftright(simhash, band*16) & 65535) as bands")
    val got = df.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    assert(got(-1L) === Vector(65535L, 65535L, 65535L, 65535L))
    for (k <- 0 to 3) {
      val expect = Vector.tabulate(4)(b => if (b == k) 32768L else 0L)
      assert(got(1L << (16 * k + 15)) === expect, s"band window $k")
    }
  }

  test("d06 bucket cap drops mega-buckets (the d07 skew backstop)") {
    import spark.implicits._
    // 100 identical simhashes = a 100-member bucket in every band:
    // over the cap -> zero candidate pairs (its members are d01's
    // business); raising the cap re-admits them
    val sh = (1L to 100L).map(_ -> 42L).toDF("doc_id", "simhash")
    assert(DedupKernels.simhashPairs(sh).count() === 0L)
    assert(DedupKernels.simhashPairs(sh, cap = 200).count() === 100L * 99 / 2)
  }

  test("connected components: star rounds over planted chains") {
    import spark.implicits._
    // 1-2-3-4 is a diameter-3 chain (multiple rounds);
    // 10-11 is a separate component
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("a", "b")
    val got = DedupKernels.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("connected components: adversarial 64-node chain converges within the star-round budget") {
    import spark.implicits._
    // a path graph is the worst case for min-label propagation
    // (rounds = diameter = 63); large-star/small-star must land it
    // well inside the O(log^2 n) budget
    val edges = (1L until 64L).map(i => (i, i + 1)).toDF("a", "b")
    val (labels, rounds) = DedupKernels.ccWithRounds(edges)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === (1L to 64L).map(_ -> 1L).toMap)
    assert(rounds <= 14, s"took $rounds star rounds for a 64-chain")
  }

  test("connected components use a RELIABLE checkpoint when a dir is configured") {
    import spark.implicits._
    // injected dir — the shared session's checkpoint config is NOT
    // mutated (that would silently switch every later CC call in the
    // JVM onto this path)
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt")
    val edges = Seq((5L, 3L), (3L, 9L), (20L, 21L)).toDF("a", "b")
    val (labels, rounds) = DedupKernels.ccWithRounds(edges, Some(dir.toString))
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(3L -> 3L, 5L -> 3L, 9L -> 3L, 20L -> 20L, 21L -> 20L))
    assert(rounds > 1)
    // the reliable path wrote rounds AND cleaned up behind itself:
    // only the final round's parquet remains
    val ccBase = java.nio.file.Files.list(dir).toArray.map(_.toString)
    assert(ccBase.length === 1 && ccBase.head.contains("graft-cc-"), ccBase.toSeq)
    val roundDirs = java.nio.file.Files.list(java.nio.file.Paths.get(ccBase.head))
      .toArray.map(_.toString)
    assert(roundDirs.length === 1, s"stale round dirs not deleted: ${roundDirs.toSeq}")
  }

  test("d09 containment dominates Jaccard on shared candidates") {
    // containment >= jaccard for any pair (min <= union), and both
    // run over the same LSH candidates — so every d03 pair at
    // jac >= 0.9 MUST reappear in d09
    val sf01 = "/root/testdata/sf0.01"
    val cont = Dedup.all("d09_containment").fn(spark, sf01)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(cont.nonEmpty)
    cont.foreach { case (d1, d2, c) => assert(d1 < d2 && c >= 0.9) }
    val contPairs = cont.map(t => (t._1, t._2)).toSet
    val strongJac = Dedup.all("d03_lsh_pairs").fn(spark, sf01)
      .where("jac >= 0.9")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(strongJac.subsetOf(contPairs))
  }

  test("d10 dup-window fraction equals the serial sliding-window recompute") {
    val sf01 = "/root/testdata/sf0.01" // sf0.001 has no cross-doc window dups
    val out = Dedup.all("d10_window_dedup").fn(spark, sf01).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_win"), r.getAs[Long]("n_dup"), r.getAs[Long]("dup_bp"))).toMap
    // serial model: distinct 8-token windows per doc; a window is
    // duplicated iff it occurs in >= 2 documents
    val wins = graft.Tables(spark, sf01, "documents")
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(' ').toSeq))
      .collect { case (id, t) if t.length >= 8 =>
        id -> t.sliding(8).map(_.mkString(" ")).toSet }
    val docsPerWin = wins.flatMap { case (id, ws) => ws.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.length).toMap
    val expected = wins.map { case (id, ws) =>
      val nDup = ws.count(w => docsPerWin(w) >= 2).toLong
      id -> (ws.size.toLong, nDup, nDup * 10000 / ws.size)
    }.toMap
    assert(out === expected)
    assert(expected.values.exists(_._2 > 0), "no duplicated windows in testdata")
    assert(expected.values.exists(_._2 == 0), "no clean docs in testdata")
  }

  test("d18 span dedup equals the serial interval-merge recompute") {
    val sf01 = "/root/testdata/sf0.01" // sf0.001 has no cross-doc window dups
    val out = Dedup.all("d18_span_dedup").fn(spark, sf01).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_spans"), r.getAs[Long]("dup_tokens"),
          r.getAs[Int]("n_tokens"), r.getAs[Long]("dup_bp"))).toMap
    // serial model: a window start is duplicated iff its 8-gram occurs
    // >= 2 times in the corpus (within- or cross-doc); merge
    // overlapping/adjacent [s, s+7] intervals per doc
    val docs = graft.Tables(spark, sf01, "documents")
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(' ').toSeq))
      .filter(_._2.length >= 8)
    val occ = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    for ((_, t) <- docs; w <- t.sliding(8)) occ(w.mkString(" ")) += 1
    val expected = docs.flatMap { case (id, t) =>
      val starts = t.sliding(8).zipWithIndex.collect {
        case (w, j) if occ(w.mkString(" ")) >= 2 => j + 1 }.toList
      val spans = starts.foldLeft(List.empty[(Int, Int)]) {
        case ((s0, e1) :: rest, s) if s <= e1 + 1 =>
          (s0, math.max(e1, s + 7)) :: rest
        case (acc, s) => (s, s + 7) :: acc
      }.reverse
      if (spans.isEmpty) None
      else {
        val dupTok = spans.map { case (s0, e1) => e1 - s0 + 1 }.sum.toLong
        Some(id -> (spans.size.toLong, dupTok, t.length,
          dupTok * 10000 / t.length))
      }
    }.toMap
    assert(out === expected)
    assert(expected.nonEmpty, "no duplicated spans in testdata")
    assert(expected.values.exists(_._2 < 30),
      "want a doc that is only partially covered (span merge is real)")
  }

  test("d19 HLL: engine sketch equals the serial recompute, error inside the envelope") {
    val sf01 = "/root/testdata/sf0.01"
    val out = Dedup.all("d19_hll_cardinality").fn(spark, sf01).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("est_distinct"), r.getAs[Long]("exact_distinct"),
          r.getAs[Long]("err_bp"))).toMap
    // serial model: same md5-h32 hash, 10-bit buckets, rho over the
    // remaining 22 bits, dyadic-integer harmonic mean
    val docs = graft.Tables(spark, sf01, "documents")
      .selectExpr("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(' ').toSeq))
      .filter(_._2.length >= 3)
    val bySrc = docs.groupBy(_._1).view.mapValues(_.flatMap(_._2.sliding(3))
      .map(w => graft.functions.Hashing.jvm32(w.mkString(" ")))).toMap
    val expected = bySrc.map { case (src, hs) =>
      val regs = Array.fill(1024)(0)
      hs.foreach { h =>
        val b = (h / 4194304L).toInt
        val w = h % 4194304L
        val rho = if (w == 0) 23 else 23 - java.lang.Long.toBinaryString(w).length
        regs(b) = math.max(regs(b), rho)
      }
      val sSum = regs.map(r => 1L << (32 - r)).sum
      val est = 755541L * 4294967296L / sSum
      val exact = hs.distinct.size.toLong
      src -> (est, exact, (est - exact).abs * 10000 / exact)
    }
    assert(out === expected)
    // HLL m=1024 → σ ≈ 3.25%; the small-range correction is omitted by
    // contract, so allow bias + noise but fail on a broken sketch
    out.values.foreach { case (_, _, err) => assert(err < 3000, s"err_bp=$err") }
    assert(out.nonEmpty)
  }

  test("d20 exact prefix join: LSH pairs are a subset; thresholds agree pair-by-pair") {
    val sf01 = "/root/testdata/sf0.01"
    val exact = Dedup.all("d20_prefix_join").fn(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(4)).toMap
    assert(exact.nonEmpty, "no exact pair at τ=0.7 - vacuous")
    // zero false negatives is the prefix filter's theorem; LSH can only
    // miss, never find more — every d03 pair must be in the exact set
    val lsh = Dedup.all("d03_lsh_pairs").fn(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.nonEmpty)
    val missed = lsh -- exact.keySet
    assert(missed.isEmpty, s"d03 'found' pairs the exact join disproves: $missed")
    // jac_bp is a genuine ratio: within (7000, 10000]
    exact.values.foreach(bp => assert(bp >= 7000 && bp <= 10000, s"jac_bp $bp"))
  }

  test("d12 soft-dedup weights: one row per doc, weight = 10000 div cluster size") {
    val sf01 = "/root/testdata/sf0.01" // sf0.001 has no near-dup pairs
    val rows = Dedup.all("d12_softdedup_weights").fn(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nDocs = graft.Tables(spark, sf01, "documents").count()
    assert(rows.length.toLong === nDocs, "one weight per document")
    rows.foreach { case (id, csz, w) =>
      assert(csz >= 1 && w === 10000L / csz, s"doc $id weight")
    }
    // cluster members must agree with d08's sizes
    val clusters = Dedup.all("d08_dup_clusters").fn(spark, sf01).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val sizes = clusters.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val byDoc = clusters.map { case (doc, cl) => doc -> sizes(cl) }.toMap
    rows.foreach { case (id, csz, _) =>
      assert(csz === byDoc.getOrElse(id, 1L), s"doc $id cluster size")
    }
    assert(rows.exists(_._2 > 1) && rows.exists(_._2 == 1), "both classes")
  }

  test("d13 estimator: est/jac in range, errors inside the k=16 binomial envelope") {
    val rows = Dedup.all("d13_jaccard_estimate").fn(spark, sf).collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4))) // (jac, est, err)
    assert(rows.nonEmpty)
    rows.foreach { case (jac, est, err) =>
      assert(jac >= 0 && jac <= 10000 && est >= 0 && est <= 10000)
      assert(err === est - jac)
      // 16 perms quantize to 625-bp steps; a |err| beyond 4 steps on
      // high-jac LSH candidates would mean the affine permutations
      // are not behaving like independent min-hashes
      assert(math.abs(err) <= 2500, s"(jac=$jac est=$est)")
    }
    // the estimate must carry signal, not rubber-stamp one value
    assert(rows.map(_._2).distinct.length > 1)
  }

  test("d14 shard dedup: bloom-prefiltered answer equals the exact serial recompute") {
    val got = Dedup.all("d14_shard_dedup").fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
    // serial recompute: same split, same mutation, plain set lookup
    def h32(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString, 16)
    val docs = graft.Tables(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val corpus = docs.map(_._2).toSet
    val expected = docs.collect { case (id, text) if h32(s"shard:$id") % 100 < 20 =>
      val t = if (h32(s"shard:$id") % 100 < 10) text else text + " v2"
      (id + 1000000L) -> corpus.contains(t)
    }.toMap
    assert(got === expected)
    // non-degenerate by construction: the verbatim half is seen, the
    // edited half is new
    assert(got.values.exists(identity) && got.values.exists(!_))
  }

  test("simhash of identical token multisets is identical") {
    val df = Dedup.all("d04_simhash").fn(spark, sf)
    // deterministic: same input -> same simhash on repeated run
    val a = df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = Dedup.all("d04_simhash").fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a === b)
    // genuinely 64-bit: some document sets a bit above the low word
    assert(a.values.exists(h => h < 0 || h >= (1L << 32)))
    // bucket = top 16-bit band
    val buckets = df.collect().map(_.getLong(2))
    assert(buckets.forall(bkt => bkt >= 0 && bkt <= 65535))
  }

  test("d15 mergeability: min of split-half signatures equals the whole-set signature") {
    graft.functions.Hashing.register(spark)
    import spark.implicits._
    // plant one hashed set and split it arbitrarily: the kernel over
    // the whole must equal the elementwise min of the halves' sigs —
    // the algebra the d15 gate exercises end-to-end on real sources
    val hv = (1L to 1000L).map(h => h * 2654435761L % 2147483647L)
    val (h1, h2) = (hv.take(370), hv.drop(370))
    def sig(xs: Seq[Long]): Seq[Long] = Seq(Tuple1(xs)).toDF("hv")
      .selectExpr("affine_minhash(hv, 16) as s").collect()(0).getSeq[Long](0)
    val merged = sig(h1).zip(sig(h2)).map { case (x, y) => math.min(x, y) }
    assert(sig(hv) === merged)
    // and the merge genuinely acted: each half alone differs from
    // the whole, so the min combined information from BOTH sides
    assert(sig(h1) != sig(hv) && sig(h2) != sig(hv))
  }

  test("c07 near-dup decontamination: sound vs brute force, and real leaks are caught") {
    graft.functions.Hashing.register(spark)
    val got = Dedup.all("c07_neardup_decontaminate").fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    def shingles(t: String): Set[String] = {
      val w = t.split(" ")
      if (w.length < 3) Set.empty else w.sliding(3).map(_.mkString(" ")).toSet
    }
    val all = graft.Tables(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> shingles(r.getString(1))).toMap
    // the split as the OPERATOR classified it: output rows ARE train
    val train = got.map(_._1).toSet
    val eval = all.keySet -- train
    assert(eval.nonEmpty && train.size > eval.size)
    def jac(a: Set[String], b: Set[String]): Double =
      if (a.isEmpty || b.isEmpty) 0.0
      else a.intersect(b).size.toDouble / a.union(b).size
    val truth = train.map { t =>
      t -> eval.filter(e => jac(all(t), all(e)) >= 0.7)
    }.toMap
    got.foreach { case (id, leaked, n, best) =>
      assert(leaked === (n > 0), s"$id: leaked/n disagree")
      // soundness: banded candidates + exact verify never OVER-report
      assert(n <= truth(id).size, s"$id: $n > ${truth(id).size} true leaks")
      if (best != -1L) assert(truth(id).contains(best), s"$id: best $best not a true leak")
      // recall guarantee: an identical shingle set always collides in
      // every band, so exact-copy leakage cannot be missed
      if (all(id).nonEmpty && eval.exists(e => all(e) == all(id)))
        assert(leaked, s"exact-copy leak $id missed")
    }
    // the operator must catch real leakage on this corpus, or the
    // spec proved nothing
    assert(truth.values.exists(_.nonEmpty), "no true cross-split near-dup - vacuous")
    assert(got.exists(_._2), "no leak flagged despite true leaks existing")
  }

  test("d16 shard near-dup: sound vs a brute-force recompute; exact dups guaranteed found") {
    graft.functions.Hashing.register(spark)
    val got = Dedup.all("d16_shard_neardup").fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    // independent recompute: word-3-gram shingle sets in plain Scala,
    // exact Jaccard over ALL shard x corpus pairs (no LSH)
    def shingles(t: String): Set[String] = {
      val w = t.split(" ")
      if (w.length < 3) Set.empty else w.sliding(3).map(_.mkString(" ")).toSet
    }
    val corpus = graft.Tables(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> shingles(r.getString(1))).toMap
    val shard = DedupKernels.shardDocs(graft.Tables(spark, sf, "documents"))
      .collect().map(r => r.getLong(0) -> shingles(r.getString(1))).toMap
    def jac(a: Set[String], b: Set[String]): Double =
      if (a.isEmpty || b.isEmpty) 0.0
      else a.intersect(b).size.toDouble / a.union(b).size
    val brute = shard.map { case (sid, sh) =>
      sid -> corpus.filter { case (_, ch) => sh.nonEmpty && jac(sh, ch) >= 0.7 }.keySet
    }
    assert(got.map(_._1).toSet === shard.keySet)
    got.foreach { case (sid, n, best) =>
      val truth = brute(sid)
      // soundness: LSH candidates are a subset of all pairs, and the
      // verify join re-checks the threshold — never MORE matches than
      // brute force, and the reported best really is a >=0.7 match
      assert(n <= truth.size, s"doc $sid reported $n > ${truth.size} true matches")
      if (best != -1L) assert(truth.contains(best), s"doc $sid best_match $best not a true match")
      // exact-dup guarantee: a verbatim re-crawl has the IDENTICAL
      // shingle set -> identical signature -> all four bands collide,
      // so the candidate cannot be missed
      if (shard(sid).nonEmpty && corpus.get(sid - 1000000).contains(shard(sid)))
        assert(n >= 1, s"verbatim re-crawl $sid missed")
      // sub-shingle docs can match nothing
      if (shard(sid).isEmpty) assert(n === 0L && best === -1L, s"short doc $sid matched")
    }
    // the operator must catch EDITED revisions too (the reason it
    // exists beyond d14): some matched shard doc is not verbatim
    assert(got.exists { case (sid, n, _) =>
      n >= 1 && !corpus.get(sid - 1000000).contains(shard(sid)) },
      "no edited revision was caught - d16 degenerates to d14")
  }

  test("d21 histogram quantiles: error inside one bucket width, monotone, merge == rebuild") {
    import org.apache.spark.sql.functions._
    val sf01 = "/root/testdata/sf0.01"
    val out = Dedup.all("d21_hist_quantiles").fn(spark, sf01).collect()
      .map(r => r.getAs[Int]("q") ->
        (r.getAs[Long]("width"), r.getAs[Long]("est"), r.getAs[Long]("exact")))
      .toMap
    assert(out.keySet === Set(25, 50, 75, 90, 99))
    // est = upper value of the bucket holding the true rank-q value,
    // so 0 <= est - exact <= w - 1 by construction
    out.foreach { case (q, (w, est, exact)) =>
      assert(est >= exact && est - exact <= w - 1,
        s"q=$q est=$est exact=$exact w=$w outside the pinned envelope")
    }
    // quantile estimates are monotone in q (cum is monotone in b)
    val byQ = out.toSeq.sortBy(_._1).map(_._2._2)
    assert(byQ === byQ.sorted, s"non-monotone estimates: $byQ")

    // merge == rebuild: shard histograms fold into the corpus
    // histogram with no re-scan — extents merge by min/max, bucket
    // counts by + (the fourth merge≡rebuild algebra instance)
    val x = graft.Tables(spark, sf01, "documents").select("doc_id", "n_chars")
    val chopExtents = (0 until 3).map { c =>
      x.where(s"doc_id % 3 = $c")
        .agg(min("n_chars").as("lo"), max("n_chars").as("hi"),
          count(lit(1)).as("n")).head
    }
    val mergedRng = spark.sql(
      s"""SELECT ${chopExtents.map(_.getLong(0)).min}L as lo,
                 ${chopExtents.map(_.getLong(1)).max}L as hi,
                 ${chopExtents.map(_.getLong(2)).sum}L as n""")
    val oneShotRng = x.agg(min("n_chars").as("lo"), max("n_chars").as("hi"),
      count(lit(1)).as("n"))
    assert(mergedRng.head === oneShotRng.head, "extents merge != rebuild")
    val oneShot = DedupKernels.histBuckets(x.select("n_chars"), oneShotRng)
      .collect().map(r => r.getAs[Long]("b") -> r.getAs[Long]("cnt")).toMap
    val folded = (0 until 3)
      .map(c => DedupKernels.histBuckets(
        x.where(s"doc_id % 3 = $c").select("n_chars"), mergedRng)
        .collect().map(r => r.getAs[Long]("b") -> r.getAs[Long]("cnt")).toMap)
      .reduce((a, b) => (a.keySet ++ b.keySet)
        .map(k => k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap)
    assert(folded === oneShot, "3-chop histogram fold != one-shot histogram")
  }

  test("c09 span strip: equals the serial strip; counts complement; pass-through intact") {
    val sf01 = "/root/testdata/sf0.01"
    val got = Dedup.all("c09_span_strip").fn(spark, sf01).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("new_text"), r.getAs[Long]("n_kept"),
          r.getAs[Long]("n_removed"))).toMap
    // serial model: count 8-gram occurrences corpus-wide, mark every
    // covered position, strip marked tokens — independent of the
    // engine's fp/window machinery (plain strings, no hashing)
    val docs = graft.Tables(spark, sf01, "documents")
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(' ').toSeq).toMap
    val gramCounts = docs.values.toSeq
      .flatMap(t => if (t.length >= 8) t.sliding(8).map(_.mkString(" ")).toSeq else Nil)
      .groupBy(identity).view.mapValues(_.size).toMap
    val expected = docs.map { case (id, t) =>
      val covered = Array.fill(t.length)(false)
      if (t.length >= 8)
        for (i <- 0 to t.length - 8
             if gramCounts(t.slice(i, i + 8).mkString(" ")) >= 2;
             j <- i until i + 8) covered(j) = true
      val kept = t.indices.filterNot(covered).map(t)
      id -> ((kept.mkString(" "), kept.size.toLong, covered.count(identity).toLong))
    }
    assert(got === expected)
    // every doc: kept + removed partition the token count
    docs.foreach { case (id, t) =>
      val (_, k, rm) = got(id)
      assert(k + rm === t.length.toLong, s"doc $id kept+removed != n_tokens")
    }
    // non-vacuous both ways: some doc stripped, some doc untouched
    assert(got.values.exists(_._3 > 0), "nothing stripped - testdata has no repeated spans?")
    assert(got.exists { case (id, (nt, _, rm)) =>
      rm === 0L && nt === docs(id).mkString(" ") },
      "no pass-through doc survived verbatim")
  }

  test("d22 LSH sweep: candidates shrink and precision rises with rows per band; trade is real") {
    val sf01 = "/root/testdata/sf0.01"
    val rows = Dedup.all("d22_lsh_param_sweep").fn(spark, sf01).collect()
      .map(r => (r.getAs[Int]("rows_per_band"),
        (r.getAs[Long]("n_cand"), r.getAs[Long]("tp"), r.getAs[Long]("n_true"),
          r.getAs[Long]("precision_bp"), r.getAs[Long]("recall_bp"))))
      .sortBy(_._1)
    assert(rows.map(_._1) === Seq(1, 2, 4, 8))
    val nTrue = rows.head._2._3
    assert(nTrue > 0, "no true pairs at tau=0.7 - sweep is vacuous")
    // more rows per band -> fewer candidates (monotone cost dial)
    // and never a recall gain (candidate sets only shrink)
    rows.sliding(2).foreach { case Array((_, a), (_, b)) =>
      assert(b._1 <= a._1, "candidate count rose with rows per band")
      assert(b._5 <= a._5, "recall rose as bands got stricter")
    }
    // the trade must be measured, not degenerate: the loosest config
    // over-generates (precision < 100%) and some config is clean
    assert(rows.head._2._4 < 10000, "1-row bands did not over-generate - suspicious")
    assert(rows.exists(_._2._4 === 10000L), "no config reached full precision on this corpus")
    // tp never exceeds either denominator
    rows.foreach { case (_, (nc, tp, nt, _, _)) =>
      assert(tp <= nc && tp <= nt)
    }
  }

  test("d23 typo join: neighborhood theorem holds for every edit kind; planted pairs found exactly") {
    // the prefix of the proof the gate can't see: for ANY word and
    // ANY single edit, the deletion neighborhoods intersect
    def neigh(w: String): Set[String] =
      Set(w) ++ (1 to w.length).map(i => w.substring(0, i - 1) + w.substring(i))
    val w = "abcdef"
    val edits =
      (1 to w.length).map(i => w.substring(0, i - 1) + w.substring(i)) ++ // deletions
      (0 to w.length).map(i => w.substring(0, i) + "z" + w.substring(i)) ++ // insertions
      (1 to w.length).map(i => w.substring(0, i - 1) + "z" + w.substring(i)) // substitutions
    edits.foreach { e =>
      assert(neigh(w).intersect(neigh(e)).nonEmpty, s"neighborhoods miss edit $e")
    }
    // the engine finds exactly the planted pairs on the corpus
    val sf01 = "/root/testdata/sf0.01"
    val got = Dedup.all("d23_typo_join").fn(spark, sf01).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(("scan", "scann"), ("table", "tble"), ("windoq", "window")))
  }

  test("d24 HLL set algebra: union merge equals rebuild; intersection error bounded by the union") {
    val sf01 = "/root/testdata/sf0.01"
    val rows = Dedup.all("d24_hll_setops").fn(spark, sf01).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(rows.size === 10, "5-source slice must yield 10 pairs")
    // merge == rebuild for the union estimate: max-merged registers
    // must give the same estimate as sketching the pooled slice
    graft.functions.Hashing.register(spark)
    val five = Seq("src0", "src1")
    import org.apache.spark.sql.functions._
    val pooled = DedupKernels.hllEst(
      DedupKernels.hllRegisters(DedupKernels.hllItems(
        graft.Tables(spark, sf01, "documents")
          .where(col("source").isin(five: _*))
          .withColumn("source", lit("pool")))),
      Seq("source")).collect()(0).getLong(1)
    assert(rows(("src0", "src1"))._3 === pooled,
      "register-max union estimate != pooled rebuild - the algebra is broken")
    // bounds: union >= each side's estimate; the intersection's
    // ABSOLUTE error stays within 20% of the union — three combined
    // 3.25%-sigma estimates plus the pinned-contract bias of the
    // omitted small-range correction; the honest inclusion-exclusion
    // envelope, whatever the relative error reads
    rows.foreach { case ((a, b), (ea, eb, eu, ei, exact)) =>
      assert(eu >= math.max(ea, eb), s"pair $a/$b union below a side")
      assert(math.abs(ei - exact) <= eu * 20 / 100,
        s"pair $a/$b |est_inter-exact|=${math.abs(ei - exact)} vs union $eu")
    }
  }

  test("d25 CDC chunks: equals the serial chunker; boundaries survive a prefix insertion") {
    val sf = "/root/testdata/sf0.001"
    def h32(t: String): Long =
      graft.functions.Hashing.h32Bytes(
        org.apache.spark.unsafe.types.UTF8String.fromString(t))
    // serial content-defined chunker: boundary AFTER tokens with h32 % 8 == 0
    def chunk(text: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer[String]()
      var cur = scala.collection.mutable.ArrayBuffer[String]()
      for (t <- text.split(" ", -1)) {
        cur += t
        if (h32(t) % 8 == 0) { out += cur.mkString(" "); cur.clear() }
      }
      if (cur.nonEmpty) out += cur.mkString(" ")
      out.toSeq
    }
    val docs = graft.Tables(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // expected per-doc stats from the serial chunker
    val perDoc = docs.map { case (id, txt) => id -> chunk(txt) }
    val docsPerFp = perDoc.toSeq
      .flatMap { case (id, cs) => cs.map(c => (h32(c), id)) }
      .distinct.groupBy(_._1).map { case (fp, v) => fp -> v.size }
    val expect = perDoc.map { case (id, cs) =>
      val shared = cs.count(c => docsPerFp(h32(c)) >= 2).toLong
      id -> (cs.size.toLong, shared, shared * 10000 / cs.size)
    }
    val got = graft.SparkEntry.queries("d25_cdc_chunks")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got === expect)
    // the CDC property: prepend a token to the longest doc — every
    // chunk after the first boundary is IDENTICAL (fixed-size windows
    // would shift all of them)
    val (id0, txt) = docs.maxBy(_._2.length)
    val orig = chunk(txt)
    val shifted = chunk("INSERTED " + txt)
    assert(orig.size > 2, s"doc $id0 too short to exercise the property")
    assert(orig.toSet.diff(shifted.toSet).size <= 1,
      "content-defined boundaries did not survive a prefix insertion")
    // non-vacuous: some chunk really is shared across docs
    assert(expect.values.exists(_._2 > 0), "no shared chunk anywhere in the corpus")
  }
}
