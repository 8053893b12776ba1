package graft.queries

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Text-tier semantics beyond the oracle gate: serial cross-checks of
  * the array-builtin formulations. */
class TextOpsSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("t11 repetition fractions equal the serial computation; verdict splits the corpus") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables(spark, sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val expected = docs.map { case (id, t) =>
      val dupTok = 10000 - (t.distinct.length * 10000L) / t.length
      val g2 = if (t.length >= 2) t.sliding(2).map(_.mkString(" ")).toSeq else Seq.empty
      val dup2 = if (g2.nonEmpty) 10000 - (g2.distinct.length * 10000L) / g2.length else 0L
      id -> ((dupTok, dup2, dup2 <= 800 && dupTok <= 7000))
    }
    val got = TextOps.all("t11_repetition").fn(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got === expected)
    // the verdict must discriminate on real data, not rubber-stamp
    assert(got.values.exists(_._3) && got.values.exists(!_._3))
  }

  test("t17 vocab coverage equals the serial cumulative share and is monotone") {
    import org.apache.spark.sql.functions._
    val toks = graft.Tables(spark, sf, "documents")
      .select(split(col("text"), " ").as("t")).collect()
      .flatMap(_.getSeq[String](0))
    val total = toks.length.toLong
    val top = toks.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (tok, n) => (-n, tok) }.take(50)
    val expected = top.zipWithIndex.map { case ((tok, n), i) =>
      (i + 1, tok, n, top.take(i + 1).map(_._2).sum * 10000L / total)
    }
    val got = TextOps.all("t17_vocab_coverage").fn(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === expected)
    // the curve must be a genuine coverage curve: monotone, capped
    assert(got.map(_._4).toSeq == got.map(_._4).toSeq.sorted, "monotone coverage")
    assert(got.last._4 <= 10000)
  }

  test("t18 calibration: bins cover every scored doc, means rise with bin, curve discriminates") {
    import org.apache.spark.sql.functions._
    val scoredN = graft.Tables(spark, sf, "documents")
      .where(size(split(col("text"), " ")) >= 2).count()
    val rows = TextOps.all("t18_calibration").fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.map(_._2).sum === scoredN, "bins must partition the scored corpus")
    assert(rows.forall { case (b, _, _, rate) => b >= 0 && b <= 9 && rate >= 0 && rate <= 10000 })
    // equal-width value bins ⇒ per-bin mean scores are strictly ordered
    assert(rows.map(_._3).toSeq == rows.map(_._3).toSeq.sorted.distinct, "bin means must rise")
    // the diagram must show genuine calibration signal: docs in the
    // upper half of the score range are overwhelmingly en, the lower
    // half overwhelmingly not (weighted by bin population)
    def wrate(rs: Array[(Long, Long, Long, Long)]) =
      if (rs.isEmpty) 0L else rs.map(r => r._2 * r._4).sum / rs.map(_._2).sum
    val lowRate = wrate(rows.filter(_._1 <= 3))
    val highRate = wrate(rows.filter(_._1 >= 6))
    assert(highRate > 7000 && lowRate < 1500,
      s"curve does not discriminate: low=$lowRate high=$highRate")
  }

  test("t22 novelty equals the serial first-seer replay; novelty decays with doc_id") {
    val sf01 = "/root/testdata/sf0.01"
    val out = TextOps.all("t22_ngram_novelty").fn(spark, sf01).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_novel"),
          r.getAs[Long]("novel_bp"))).toMap
    val docs = graft.Tables(spark, sf01, "documents")
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(' ').toSeq))
      .filter(_._2.length >= 8)
    val firstSeer = scala.collection.mutable.Map.empty[String, Long]
    docs.sortBy(_._1).foreach { case (id, t) =>
      t.sliding(8).map(_.mkString(" ")).toSet
        .foreach { g: String => if (!firstSeer.contains(g)) firstSeer(g) = id }
    }
    val expected = docs.map { case (id, t) =>
      val gs = t.sliding(8).map(_.mkString(" ")).toSet
      val novel = gs.count(firstSeer(_) == id).toLong
      id -> (gs.size.toLong, novel, novel * 10000 / gs.size)
    }.toMap
    assert(out === expected)
    // early docs skew novel, late docs skew seen (the curve is real)
    val ids = out.keys.toSeq.sorted
    val early = ids.take(ids.size / 4).map(out(_)._3)
    val late = ids.takeRight(ids.size / 4).map(out(_)._3)
    assert(early.sum / early.size > late.sum / late.size,
      "novelty did not decay with ingestion order")
  }

  test("t19 percentiles equal the serial empirical CDF; ties share one percentile") {
    import org.apache.spark.sql.functions._
    val quality = graft.Tables(spark, sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t")).collect()
      .map { r =>
        val t = r.getSeq[String](1)
        val uniq = t.distinct.length * 10000L / t.length
        r.getLong(0) -> (uniq + (if (t.length >= 15) 10000L else 0L)) / 2
      }.toMap
    val n = quality.size
    val expected = quality.map { case (id, q) =>
      (id, q, quality.values.count(_ < q) * 10000L / n)
    }.toSet
    val got = TextOps.all("t19_score_percentiles").fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
    // ties must share one percentile; the extremes bound the range
    val byScore = got.groupBy(_._2).view.mapValues(_.map(_._3)).toMap
    assert(byScore.values.forall(_.size == 1), "ties split across percentiles")
    assert(got.map(_._3).min === 0L && got.map(_._3).max < 10000L)
  }

  test("t15 confusion matrix: cells partition the corpus and label shares sum to ~10000") {
    val docsN = graft.Tables(spark, sf, "documents").count()
    val rows = TextOps.all("t15_langid_confusion").fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._3).sum === docsN, "cells must partition the corpus")
    rows.groupBy(_._1).foreach { case (label, cells) =>
      val shares = cells.map(_._4)
      assert(shares.forall(s => s >= 0 && s <= 10000), s"$label share range")
      // integer division loses < 1 bp per cell
      assert(shares.sum <= 10000 && shares.sum > 10000 - cells.length - 1,
        s"$label shares sum to ${shares.sum}")
    }
    // the eval must expose the heuristic's real behavior, not echo
    // the label column: at least one off-diagonal cell exists
    assert(rows.exists { case (l, p, _, _) => l != p })
  }

  test("t16 LM buckets: value-ordered terciles that discriminate the training domain") {
    val docsN = graft.Tables(spark, sf, "documents").count()
    val lang = graft.Tables(spark, sf, "documents").select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = TextOps.all("t16_lm_buckets").fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getString(3)))
    assert(rows.length === docsN, "one row per document")
    // unscored exactly when the doc has no bigrams
    rows.foreach { case (id, nBg, avg, bucket) =>
      assert((bucket == "unscored") === (nBg == 0L), s"doc $id unscored contract")
      if (nBg > 0) assert(avg.isDefined, s"doc $id scored docs carry a score")
    }
    // buckets are value-ordered with no interleaving: every head score
    // strictly above every middle score above every tail score is too
    // strong (ties land in the upper bucket), but min(upper) >= max(lower)
    // must hold — the cutpoints are order statistics
    def scores(b: String) = rows.collect { case (_, _, Some(s), `b`) => s }
    val (h, m, t) = (scores("head"), scores("middle"), scores("tail"))
    assert(h.nonEmpty && m.nonEmpty && t.nonEmpty, "all three buckets populated")
    assert(h.min >= m.max && m.min >= t.max, "tercile value ordering")
    // tercile sizing: ties spill upward, so head ≥ ceil(n/3) and
    // head+middle ≥ ceil(2n/3); nothing is lost
    val n = h.length + m.length + t.length
    assert(h.length >= (n + 2) / 3 && h.length + m.length >= (2 * n + 2) / 3)
    // the filter must discriminate: in-domain (en) docs concentrate in
    // head, out-of-domain in tail (CCNet's whole point)
    def enShareBp(b: String) = {
      val ids = rows.collect { case (id, _, _, `b`) => id }
      ids.count(lang(_) == "en") * 10000L / ids.length
    }
    assert(enShareBp("head") > enShareBp("tail") + 2000,
      s"en share head=${enShareBp("head")}bp vs tail=${enShareBp("tail")}bp")
  }

  test("t13 bigram LM: every doc scored, n_bigrams = n_tokens - 1, scores in range") {
    val nTokens = TextOps.all("t01_token_stats").fn(spark, sf)
      .select("doc_id", "n_tokens").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val lm = TextOps.all("t13_bigram_lm").fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    assert(lm.length === nTokens.size, "one row per document")
    lm.foreach { case (id, nBg, sum, avg) =>
      assert(nBg === math.max(nTokens(id) - 1, 0).toLong, s"doc $id bigram count")
      if (nBg == 0) assert(sum === 0L && avg.isEmpty, s"doc $id empty contract")
      else {
        assert(avg.contains(sum / nBg), s"doc $id avg")
        // add-one smoothing bounds: 0 ≤ P_bp ≤ 10000
        assert(avg.get >= 0L && avg.get <= 10000L, s"doc $id range")
      }
    }
    // the score must discriminate: not all docs identical
    assert(lm.flatMap(_._4).distinct.length > 1)
  }

  test("t14 gopher filter: fail_mask equals the serial rules; verdict splits the corpus") {
    import org.apache.spark.sql.functions._
    val stops = Set("the", "a", "of", "and", "to", "in")
    val docs = graft.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = docs.map { case (id, text) =>
      val t = text.split(" ", -1).toSeq
      val mwl = t.map(_.length.toLong).sum * 10000 / t.length
      // mirror the kernel's ASCII code-point semantics (see KernelProps):
      // Char.isLower/isDigit are Unicode-aware and String.length counts
      // UTF-16 units, both of which diverge on non-ASCII text
      val cps = text.codePoints().toArray
      val sym = cps.count(cp => !((cp >= 'a' && cp <= 'z') ||
        (cp >= '0' && cp <= '9') || cp == ' ')).toLong * 10000 / cps.length
      val stopHits = t.distinct.count(stops)
      val dupTok = 10000 - t.distinct.length.toLong * 10000 / t.length
      val mask = (if (t.length >= 20 && t.length <= 80) 0 else 1) +
        (if (mwl >= 40000 && mwl <= 52000) 0 else 2) +
        (if (sym <= 1000) 0 else 4) +
        (if (stopHits >= 2) 0 else 8) +
        (if (dupTok <= 6000) 0 else 16)
      id -> ((mask.toLong, mask == 0))
    }
    val got = TextOps.all("t14_gopher_filter").fn(spark, sf)
      .select("doc_id", "fail_mask", "keep").collect()
      .map(r => r.getLong(0) -> ((r.getAs[Number](1).longValue, r.getBoolean(2)))).toMap
    assert(got === expected)
    assert(got.values.exists(_._2) && got.values.exists(!_._2),
      "the filter must discriminate on real data, not rubber-stamp")
  }

  test("t23 CMS estimates equal the serial sketch, never underestimate, and the φ cut is exact") {
    import org.apache.spark.sql.functions._
    val toks = graft.Tables(spark, sf, "documents")
      .select(split(col("text"), " ").as("t")).collect()
      .flatMap(_.getSeq[String](0))
    val exact = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // serial CMS with the query's exact parameters and hash
    def cell(r: Int, tok: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"cms:$r:$tok".getBytes("UTF-8"))
      val h = ((md(0) & 0xffL) << 24) | ((md(1) & 0xffL) << 16) |
        ((md(2) & 0xffL) << 8) | (md(3) & 0xffL)
      h % 1024
    }
    val counters = toks.flatMap(t => (0 until 4).map(r => (r, cell(r, t))))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = toks.length.toLong
    val expected = exact.collect { case (t, c) if c * 1000 >= total =>
      t -> ((c, (0 until 4).map(r => counters((r, cell(r, t)))).min))
    }
    val got = TextOps.all("t23_heavy_hitters").fn(spark, sf)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === expected)
    assert(got.nonEmpty, "the φ cut must select something on real data")
    assert(got.values.forall { case (ex, est) => est >= ex },
      "Count-Min is conservative: an estimate below the true count is a broken sketch")
  }

  test("t24 RAKE equals the serial recompute; multi-word phrases surface") {
    import org.apache.spark.sql.functions._
    val stops = Set("the", "a", "of", "and", "to", "in")
    val docs = graft.Tables(spark, sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1))
    // phrases: maximal stop-free runs, keyed by (doc, running stop count)
    val phrases = docs.flatMap { case (id, toks) =>
      var grp = 0L
      val buf = scala.collection.mutable.Map.empty[Long, Vector[String]]
      toks.foreach { w =>
        if (stops(w)) grp += 1
        else buf(grp) = buf.getOrElse(grp, Vector.empty) :+ w
      }
      buf.map { case (g, ws) => (id, g, ws) }
    }
    val occ = phrases.flatMap { case (_, _, ws) => ws.map(_ -> ws.length.toLong) }
    val wScore = occ.groupBy(_._1).map { case (w, xs) =>
      w -> xs.map(_._2).sum * 10000 / xs.length
    }
    val expected = phrases.groupBy(_._1).toSeq.flatMap { case (id, phs) =>
      phs.toSeq.map { case (_, g, ws) => (g, ws.mkString(" "), ws.map(wScore).sum) }
        .sortBy { case (g, p, sc) => (-sc, p, g) }.take(3).zipWithIndex
        .map { case ((_, p, sc), i) => (id, i + 1) -> ((p, sc)) }
    }.toMap
    val got = TextOps.all("t24_rake_keyphrases").fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> ((r.getString(2), r.getLong(3)))).toMap
    assert(got === expected)
    // degree/frequency must reward collocation: multi-word phrases win somewhere
    assert(got.values.exists(_._1.contains(" ")), "no multi-word keyphrase ranked")
  }

  test("t25 BPE: three merges equal the serial trainer (overlap stats, leftmost-greedy apply)") {
    import org.apache.spark.sql.functions._
    val words = graft.Tables(spark, sf, "documents")
      .select(split(col("text"), " ").as("t")).collect()
      .flatMap(_.getSeq[String](0)).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    var syms: Map[Vector[String], Long] =
      words.map { case (w, f) => w.map(_.toString).toVector -> f }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val expected = (1 to 3).map { i =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      syms.foreach { case (ss, f) =>
        ss.zip(ss.drop(1)).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + f
        }
      }
      val ((a, b), c) = counts.minBy { case ((x, y), n) => (-n, x, y) }
      syms = syms.toSeq.map { case (ss, f) =>
        val out = ss.foldLeft(Vector.empty[String]) { (acc, x) =>
          if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ (a + b)
          else acc :+ x
        }
        out -> f
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      (i, a, b, a + b, c)
    }
    val got = TextOps.all("t25_bpe_train").fn(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .sortBy(_._1).toSeq
    assert(got === expected)
    assert(got.forall(_._5 > 0))
  }

  test("t26 BPE apply: per-doc fertility equals the serial tokenize; merges genuinely compress") {
    import org.apache.spark.sql.functions._
    // serial trainer tracking each word TYPE's segmentation (the
    // third independent implementation, next to the engine and the
    // oracle's CTE chain)
    val docs = graft.Tables(spark, sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).filter(_.nonEmpty))
    val freq = docs.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    var seg: Map[String, Vector[String]] =
      freq.keys.map(w => w -> w.map(_.toString).toVector).toMap
    for (_ <- 1 to 3) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      seg.foreach { case (w, ss) =>
        ss.zip(ss.drop(1)).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + freq(w)
        }
      }
      val ((a, b), _) = counts.minBy { case ((x, y), n) => (-n, x, y) }
      seg = seg.view.mapValues(_.foldLeft(Vector.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ (a + b)
        else acc :+ x
      }).toMap
    }
    val expected = docs.map { case (id, t) =>
      val nw = t.size.toLong
      val ns = t.map(w => seg(w).size.toLong).sum
      id -> ((nw, ns, ns * 10000 / nw))
    }.toMap
    val got = TextOps.all("t26_bpe_apply").fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === expected)
    // the learned merges must compress somewhere: some doc's subtoken
    // count is strictly below its character count
    val chars = docs.map { case (id, t) => id -> t.map(_.length.toLong).sum }.toMap
    assert(got.exists { case (id, (_, ns, _)) => ns < chars(id) },
      "no document compressed below character-level - merges applied nowhere")
  }

  test("t28 dup triage equals the serial prefix/suffix scan; bounds hold") {
    val sf = "/root/testdata/sf0.01"
    val texts = graft.Tables(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq).toMap
    val pairs = Dedup.all("d03_lsh_pairs").fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def runLen(a: Seq[String], b: Seq[String]): Int =
      a.zip(b).takeWhile { case (x, y) => x == y }.size
    val expected = pairs.map { case (d1, d2) =>
      val (ta, tb) = (texts(d1), texts(d2))
      val n = math.min(ta.length, tb.length)
      val lcp = runLen(ta, tb)
      val lcs = math.min(runLen(ta.reverse, tb.reverse), n - lcp)
      (d1, d2) -> ((lcp.toLong, lcs.toLong,
        (ta.length - lcp - lcs).toLong, (tb.length - lcp - lcs).toLong))
    }.toMap
    val got = graft.SparkEntry.queries("t28_dup_explain")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got === expected)
    // structure: middles never negative, and the near-dup pairs
    // genuinely share a common frame somewhere
    assert(got.values.forall { case (_, _, am, bm) => am >= 0 && bm >= 0 })
    assert(got.values.exists { case (lcp, lcs, _, _) => lcp + lcs > 0 },
      "no pair shares any prefix or suffix - triage vacuous on this corpus")
  }

  test("t27 heaps curve equals the serial replay and is monotone-flattening") {
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
    val lo = docs.map(_._1).min
    val hi = docs.map(_._1).max
    def bucket(id: Long) = ((id - lo) * 10) / (hi - lo + 1)
    // serial: walk buckets in order, grow the vocabulary set
    val seen = scala.collection.mutable.Set[String]()
    var (nd, nt) = (0L, 0L)
    val expected = (0L to 9L).map { b =>
      val in = docs.filter(d => bucket(d._1) == b)
      nd += in.length; nt += in.map(_._2.length.toLong).sum
      in.foreach(_._2.foreach(seen += _))
      b -> ((nd, nt, seen.size.toLong, seen.size.toLong * 10000 / nt))
    }.toMap
    val got = graft.SparkEntry.queries("t27_heaps_curve")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === expected)
    // Heaps: vocabulary grows every decile but the type-token ratio
    // falls (novelty per token shrinks as the corpus accumulates)
    val curve = (0L to 9L).map(got)
    assert(curve.map(_._3) === curve.map(_._3).sorted)
    assert(curve.head._4 > curve.last._4,
      "type-token ratio did not fall across the corpus - no flattening")
  }

  test("t29 zipf: equals the serial top-100; rank-1 ratio is exactly 10000; freq monotone") {
    val sf = "/root/testdata/sf0.001"
    val counts = graft.Tables(spark, sf, "documents")
      .select("text").collect().iterator
      .flatMap(_.getString(0).split(" ", -1))
      .foldLeft(Map.empty[String, Long]) { (m, t) => m.updated(t, m.getOrElse(t, 0L) + 1) }
    val serial = counts.toSeq.sortBy { case (t, f) => (-f, t) }.take(100)
      .zipWithIndex.map { case ((t, f), i) => (i + 1L, t, f) }
    val f1 = serial.head._3
    val expect = serial.map { case (r, t, f) => (r, t, f, f1 * 10000 / (r * f)) }
    val got = graft.SparkEntry.queries("t29_zipf_rankfreq")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(got === expect)
    assert(got.head._4 === 10000L, "rank-1 ratio must be exactly 10000 by construction")
    val freqs = got.map(_._3)
    assert(freqs === freqs.sorted.reverse, "frequency not monotone in rank")
  }
}
