package graft.queries

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Graph-tier semantics: the distributed formulations must equal a
  * serial single-threaded replay on the sf0.001 graph, bit-for-bit
  * (integer arithmetic — no tolerance anywhere). */
class GraphSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("g01 pagerank equals the serial integer Pregel replay") {
    val edges = Graph.tradeEdges(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val deg = edges.groupBy(_._1).map { case (n, es) => n -> es.length.toLong }
    var rank: Map[Long, Long] = deg.map { case (n, _) => n -> 1000000L }.toMap
    for (_ <- 1 to 5) {
      val sums = new scala.collection.mutable.HashMap[Long, Long]()
      edges.foreach { case (src, dst) =>
        sums(dst) = sums.getOrElse(dst, 0L) + rank(src) / deg(src)
      }
      rank = deg.map { case (n, _) =>
        n -> (150000L + (85L * sums.getOrElse(n, 0L)) / 100L)
      }.toMap
    }
    val got = graft.SparkEntry.queries("g01_pagerank")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got.keySet === rank.keySet)
    got.foreach { case (n, r) => assert(r === rank(n), s"node $n") }
    // sanity on the result itself: kind split is genuine and damped
    // ranks stay above the teleport floor
    assert(got.keys.exists(_ % 2 == 0) && got.keys.exists(_ % 2 == 1))
    assert(got.values.forall(_ >= 150000L))
  }

  test("g02 triangles equal the serial count; orientation covers each edge once") {
    val e = Graph.copurchaseEdges(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // serial: adjacency sets, count each unordered triangle once
    val adj = new scala.collection.mutable.HashMap[Long, Set[Long]]()
      .withDefaultValue(Set.empty)
    e.foreach { case (a, b) => adj(a) += b; adj(b) += a }
    val perNode = new scala.collection.mutable.HashMap[Long, Long]()
      .withDefaultValue(0L)
    e.foreach { case (a, b) =>
      (adj(a) & adj(b)).foreach { c =>
        if (c > b) { // a<b<c by id — each triangle once
          perNode(a) += 1; perNode(b) += 1; perNode(c) += 1
        }
      }
    }
    // e has p1<p2, so requiring c>b above needs a<b too: guaranteed.
    val got = graft.SparkEntry.queries("g02_triangles")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === perNode.toMap)

    // the degree-orientation emits exactly one directed edge per
    // undirected edge, and never both directions
    val o = Graph.orient(Graph.copurchaseEdges(spark, sf))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(o.length === e.length)
    val undirected = o.map { case (s, d) => if (s < d) (s, d) else (d, s) }
    assert(undirected.toSet === e.toSet)
  }

  test("g03 link prediction equals the serial jaccard replay") {
    val edges = graft.Tables(spark, sf, "orders")
      .select("o_orderkey", "o_custkey")
      .join(graft.Tables(spark, sf, "lineitem").select("l_orderkey", "l_suppkey"),
        org.apache.spark.sql.functions.expr("o_orderkey = l_orderkey"))
      .selectExpr("o_custkey as c", "l_suppkey as sp").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val bySupp = edges.groupBy(_._2).map { case (sp, es) =>
      sp -> es.map(_._1).toSet
    }
    val pairs = for {
      s1 <- bySupp.keys.toSeq; s2 <- bySupp.keys.toSeq if s1 < s2
      cn = (bySupp(s1) & bySupp(s2)).size if cn > 0
    } yield (s1, s2, cn.toLong,
      cn.toLong * 10000 / (bySupp(s1).size + bySupp(s2).size - cn))
    val expected = pairs
      .sortBy { case (s1, s2, _, j) => (-j, s1, s2) }.take(50)
      .map { case (s1, s2, cn, j) => (s1, s2, cn, j) }
    val got = graft.SparkEntry.queries("g03_link_predict")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(5)))
      .toSeq
    assert(got === expected)
    assert(got.nonEmpty && got.forall(_._4 > 0))
  }

  test("g03 hub-cap contract: an over-cap center contributes no wedges") {
    import spark.implicits._
    // 3 suppliers fully shared by a hub customer with deg 4 (> cap 3)
    // plus two honest centers; only the honest wedges survive
    val e = Seq(
      (100L, 1L), (100L, 2L), (100L, 3L), (100L, 4L), // hub, deg 4
      (200L, 1L), (200L, 2L),                          // honest center
      (300L, 2L), (300L, 3L)                           // honest center
    ).toDF("c", "sp")
    val got = Graph.linkPredictFrom(e, cap = 3, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // degrees INCLUDE the hub's edges (degree is a property of the
    // graph; the cap bounds wedge enumeration only)
    assert(got === Set((1L, 2L, 1L), (2L, 3L, 1L)))
  }

  test("g04 kcore equals the serial peel and has converged by round 8") {
    val e = Graph.copurchaseEdges(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val deg0 = new scala.collection.mutable.HashMap[Long, Long]()
      .withDefaultValue(0L)
    e.foreach { case (a, b) => deg0(a) += 1; deg0(b) += 1 }
    val n = deg0.size
    val ds = deg0.values.toSeq.sorted
    val k = ds((n + 1) / 2 - 1) * 7 / 10
    var surv = deg0.keySet.toSet
    var prev = Set.empty[Long]
    var degs = Map.empty[Long, Long]
    for (_ <- 1 to 8) {
      prev = surv
      val dd = new scala.collection.mutable.HashMap[Long, Long]()
        .withDefaultValue(0L)
      e.foreach { case (a, b) =>
        if (surv(a) && surv(b)) { dd(a) += 1; dd(b) += 1 }
      }
      surv = surv.filter(x => dd(x) >= k)
      degs = dd.toMap
    }
    // fixpoint reached: round 8 changed nothing, so this IS the k-core
    assert(surv === prev, "peel did not converge within 8 rounds")
    assert(surv.nonEmpty && surv.size < n, "core trivial - peel vacuous")
    val expected = surv.map(x => x -> degs(x)).toMap
    val got = graft.SparkEntry.queries("g04_kcore")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
    // the defining property: every member keeps >= k in-core neighbors
    assert(got.values.forall(_ >= k))
  }

  test("g05 seed distance equals the serial BFS; layers are genuine") {
    val edges = Graph.tradeEdges(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = edges.groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    val seeds = adj.keySet.filter(n => n % 2 == 1 && ((n - 1) / 2) % 7 == 0)
    val dist = scala.collection.mutable.HashMap[Long, Long]()
    seeds.foreach(dist(_) = 0L)
    var frontier = seeds
    for (i <- 1 to 4) {
      val nxt = frontier.flatMap(adj).diff(dist.keySet)
      nxt.foreach(dist(_) = i.toLong)
      frontier = nxt
    }
    val got = graft.SparkEntry.queries("g05_seed_distance")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got === dist.toMap)
    // the BFS genuinely layers: seeds at 0 and at least two more hops
    val layers = got.values.toSeq.distinct.sorted
    assert(layers.head === 0L && layers.length >= 3, s"degenerate layers $layers")
  }

  test("g06 label propagation equals the serial synchronous replay") {
    val pairs = Relational.all("q41_spatial_grid_join").fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nodes = graft.Tables(spark, sf, "customer")
      .select("c_custkey").collect().map(_.getLong(0))
    val adj = new scala.collection.mutable.HashMap[Long, List[Long]]()
      .withDefaultValue(Nil)
    pairs.foreach { case (a, b) => adj(a) ::= b; adj(b) ::= a }
    var lbl: Map[Long, Long] = nodes.map(n => n -> n).toMap
    for (_ <- 1 to 3) {
      lbl = nodes.map { n =>
        val ns = adj(n)
        if (ns.isEmpty) n -> lbl(n)
        else {
          val cnt = ns.groupBy(lbl).map { case (l, xs) => l -> xs.size }
          n -> cnt.minBy { case (l, c) => (-c, l) }._1
        }
      }.toMap
    }
    val got = graft.SparkEntry.queries("g06_label_prop")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === lbl)
    // community structure is genuine: fewer labels than nodes, more than one
    val k = got.values.toSet.size
    assert(k > 1 && k < nodes.length, s"degenerate community count $k")
  }

  test("g08 trustrank equals the serial replay; trust decays away from seeds") {
    val edges = Graph.tradeEdges(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val deg = edges.groupBy(_._1).map { case (n, es) => n -> es.length.toLong }
    val seeds = deg.keySet.filter(n => n % 2 == 1 && ((n - 1) / 2) % 7 == 0)
    val tele = 150000L * deg.size / seeds.size
    var rank: Map[Long, Long] = deg.map { case (n, _) => n -> 1000000L }.toMap
    for (_ <- 1 to 5) {
      val sums = new scala.collection.mutable.HashMap[Long, Long]()
      edges.foreach { case (src, dst) =>
        sums(dst) = sums.getOrElse(dst, 0L) + rank(src) / deg(src)
      }
      rank = deg.map { case (n, _) =>
        n -> ((if (seeds(n)) tele else 0L) + (85L * sums.getOrElse(n, 0L)) / 100L)
      }.toMap
    }
    val got = graft.SparkEntry.queries("g08_trustrank")(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap
    assert(got.view.mapValues(_._2).toMap === rank)
    assert(got.forall { case (n, (isSeed, _)) => isSeed === seeds(n) })
    // trust concentrates: seeds' mean rank beats non-seeds' mean
    val (sv, nv) = (seeds.toSeq.map(rank), (deg.keySet -- seeds).toSeq.map(rank))
    assert(sv.sum / sv.size > nv.sum / nv.size,
      "seed teleport did not concentrate trust")
  }

  test("g10 ppr equals the serial replay; fields are genuinely personalized") {
    val edges = Graph.tradeEdges(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val deg = edges.groupBy(_._1).map { case (n, es) => n -> es.length.toLong }
    val seeds = edges.map(_._1).filter(_ % 2 == 0).distinct.sorted.take(4)
    // serial replay per seed: all mass at the seed, teleport to the
    // seed only, 3 integer rounds — the distributed K-in-one-frame
    // formulation must equal K independent serial walks
    def walk(seed: Long): Map[Long, Long] = {
      var rank: Map[Long, Long] =
        deg.map { case (n, _) => n -> (if (n == seed) 1000000L else 0L) }.toMap
      for (_ <- 1 to 3) {
        val sums = new scala.collection.mutable.HashMap[Long, Long]()
        edges.foreach { case (src, dst) =>
          sums(dst) = sums.getOrElse(dst, 0L) + rank(src) / deg(src)
        }
        rank = deg.map { case (n, _) =>
          n -> ((if (n == seed) 150000L else 0L) +
            (85L * sums.getOrElse(n, 0L)) / 100L)
        }.toMap
      }
      rank
    }
    val expected = seeds.flatMap { s =>
      walk(s).filter(_._2 > 0).toSeq
        .sortBy { case (n, r) => (-r, n) }.take(10).zipWithIndex
        .map { case ((n, r), i) => (s, n) -> ((r, (i + 1).toLong)) }
    }.toMap
    val got = graft.SparkEntry.queries("g10_ppr")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === expected)
    // personalization: at least two seeds rank a DIFFERENT node 2nd
    // (1st is each seed itself — check that too: relevance fields
    // are seed-centric, not one global ordering rebroadcast 4 times)
    val firsts = got.collect { case ((s, n), (_, 1L)) => s -> n }
    assert(firsts.forall { case (s, n) => s == n },
      s"each seed must top its own field: $firsts")
    val seconds = got.collect { case ((_, n), (_, 2L)) => n }.toSet
    assert(seconds.size >= 2, s"fields collapsed to one ordering: $seconds")
  }

  test("g07 graph stats: consistent with g02 and the serial wedge count") {
    val e = Graph.copurchaseEdges(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val deg = new scala.collection.mutable.HashMap[Long, Long]()
      .withDefaultValue(0L)
    e.foreach { case (a, b) => deg(a) += 1; deg(b) += 1 }
    val wedges = deg.values.map(d => d * (d - 1) / 2).sum
    // triangle total from g02's per-node counts (each triangle
    // credited to 3 corners)
    val triSum = graft.SparkEntry.queries("g02_triangles")(spark, sf)
      .selectExpr("sum(n_triangles)").head.getLong(0)
    val r = graft.SparkEntry.queries("g07_graph_stats")(spark, sf).head
    assert(r.getLong(0) === deg.size.toLong)
    assert(r.getLong(1) === e.length.toLong)
    assert(r.getLong(2) === wedges)
    assert(r.getLong(3) === triSum / 3)
    assert(r.getLong(4) === 3 * r.getLong(3) * 10000 / wedges)
    // sane range: a clustering coefficient is a fraction
    assert(r.getLong(4) > 0 && r.getLong(4) <= 10000)
  }
}
