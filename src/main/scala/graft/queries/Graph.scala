package graft.queries

import graft.{Q, Tables}
import graft.CacheScope._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over relation-derived graphs — the iterative
  * BSP/Pregel shapes (PageRank) and the multi-way self-join shapes
  * (triangle counting) a link-quality pipeline runs over a crawl's
  * domain graph. No reference counterpart (the reference has no graph
  * surface); these are the engine-tier operators a 100 TB curation
  * stack needs for link-based quality signals (domain PageRank à la
  * CommonCrawl ranking, clustering-coefficient spam signals).
  *
  * Graphs are derived deterministically from the TPC-H-ish testdata:
  *  - the TRADE graph: customer↔supplier edges via orders⋈lineitem
  *    (bipartite, symmetric — every node has degree ≥ 1);
  *  - the CO-PURCHASE graph: part—part edges when two parts appear in
  *    the same order (the "bought together" graph).
  *
  * Cross-engine exactness discipline (same as d19/t23): all rank
  * arithmetic is INTEGER (micro-units, floor division) — no float
  * sums, no convergence epsilon — so Spark and the unrolled-CTE
  * DuckDB oracle agree bit-for-bit after a fixed 5 iterations.
  */
object Graph {

  private val Iters = 5

  /** Symmetric customer↔supplier edge list: node ids are disjoint by
    * parity (customer c → 2c, supplier s → 2s+1). */
  private[queries] def tradeEdges(s: SparkSession, d: String): DataFrame = {
    val e0 = Tables.orders(s, d).select("o_orderkey", "o_custkey")
      .join(Tables.lineitem(s, d).select("l_orderkey", "l_suppkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
  }

  /** PageRank in integer micro-units after exactly [[Iters]] rounds.
    *
    * Per round (the Pregel superstep, as two exchanges):
    * each node sends rank div degree along every out-edge (one
    * src-keyed join against the persisted edge list), contributions
    * partial-aggregate by dst BELOW the exchange, and the new rank is
    * 150000 + (85 · Σcontrib) div 100 — the d=0.85 damped update with
    * the teleport term as a constant (symmetric edges ⇒ no dangling
    * mass). Scale shape: state is one (node, deg, rank) row per node,
    * each round is join + partial agg on the edge partitioning, the
    * edge list is persisted once and reused all rounds, and ranks are
    * persisted per round so no round recomputes its predecessor. At
    * 1000 executors this is exactly GraphX's PageRank plan without
    * the RDD detour.
    */
  private def pagerank(s: SparkSession, d: String): DataFrame = {
    val edges = tradeEdges(s, d).persistScoped()
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      .select(col("src").as("node"), col("deg"))
    var rank = deg.withColumn("rank", lit(1000000L)).persistScoped()
    for (_ <- 1 to Iters) {
      val sums = edges.join(rank, edges("src") === rank("node"))
        .select(col("dst"), expr("rank div deg").as("c"))
        .groupBy("dst").agg(sum("c").as("csum"))
      rank = deg.join(sums, deg("node") === sums("dst"), "left")
        .select(deg("node"), deg("deg"),
          expr("150000L + (85L * coalesce(csum, 0L)) div 100L").as("rank"))
        .persistScoped()
    }
    rank.select(col("node"),
      expr("case when node % 2 = 0 then 'customer' else 'supplier' end")
        .as("kind"),
      col("rank").as("rank_micro"))
  }

  /** The oracle unrolls the same integer update as [[Iters]] chained
    * CTEs — DuckDB's `//` and Spark's `div` agree on positive longs. */
  private def pagerankSql: String = {
    val rounds = (1 to Iters).map { i =>
      s"""r$i AS (SELECT d.node, d.deg,
         |  CAST(150000 + (85 * COALESCE(SUM(r.rank // r.deg), 0)) // 100 AS BIGINT) AS rank
         |  FROM deg d LEFT JOIN e ON e.dst = d.node
         |             LEFT JOIN r${i - 1} r ON r.node = e.src
         |  GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS (SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
       |            FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
       |e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
       |deg AS (SELECT src AS node, COUNT(*) AS deg FROM e GROUP BY 1),
       |r0 AS (SELECT node, deg, CAST(1000000 AS BIGINT) AS rank FROM deg),
       |$rounds
       |SELECT node,
       |       CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
       |       rank AS rank_micro
       |FROM r$Iters""".stripMargin
  }

  /** Distinct co-purchase edges (p1 < p2 canonical). */
  private[queries] def copurchaseEdges(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select("l_orderkey", "l_partkey")
    li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("p1"), col("b.l_partkey").as("p2"))
      .distinct()
  }

  /** Degree-ordered orientation: each undirected edge becomes ONE
    * directed edge from the (deg, id)-smaller endpoint. Ties (equal
    * degree) fall back to id order, and p1 < p2 by construction, so
    * `deg(p1) <= deg(p2)` is the complete orientation predicate. */
  private[queries] def orient(e: DataFrame): DataFrame = {
    val deg = e.select(col("p1").as("node"))
      .union(e.select(col("p2").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    e.join(deg.as("d1"), col("p1") === col("d1.node"))
      .join(deg.as("d2"), col("p2") === col("d2.node"))
      .select(
        when(col("d1.deg") <= col("d2.deg"), col("p1")).otherwise(col("p2"))
          .as("src"),
        when(col("d1.deg") <= col("d2.deg"), col("p2")).otherwise(col("p1"))
          .as("dst"))
  }

  /** Per-node triangle participation on the co-purchase graph.
    *
    * Node-iterator triangle counting with the degree-ordered
    * orientation (Cohen 2009 / the standard MapReduce formulation):
    * orienting every edge low-degree → high-degree bounds each node's
    * out-degree by O(√E), so the wedge join's fan-out is O(E^1.5)
    * worst-case instead of Σdeg² — the difference between a plan that
    * survives a power-law degree distribution (one hub part in
    * millions of orders) and one that doesn't. The plan is two
    * equi-joins on the oriented edge list (wedge build e1.dst=e2.src,
    * then closure probe on (src, dst)) — all shuffle-partitioned
    * equi-joins AQE can split on skew, never a theta join. Each
    * triangle is found exactly once (as its oriented a→b→c, a→c
    * form), then credited to all three corners by a 3-way union +
    * count — output is |nodes|-bounded.
    */
  private def triangles(s: SparkSession, d: String): DataFrame = {
    val o = orient(copurchaseEdges(s, d)).persistScoped()
    val tri = o.as("e1")
      .join(o.as("e2"), col("e1.dst") === col("e2.src"))
      .join(o.as("e3"),
        col("e3.src") === col("e1.src") && col("e3.dst") === col("e2.dst"))
      .select(col("e1.src").as("a"), col("e1.dst").as("b"),
        col("e2.dst").as("c"))
      .persistScoped()
    tri.select(col("a").as("node"))
      .union(tri.select(col("b").as("node")))
      .union(tri.select(col("c").as("node")))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }

  private val trianglesSql =
    """WITH e AS (SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
      |           FROM lineitem a
      |           JOIN lineitem b ON a.l_orderkey = b.l_orderkey
      |                          AND a.l_partkey < b.l_partkey),
      |deg AS (SELECT node, COUNT(*) AS deg
      |        FROM (SELECT p1 AS node FROM e UNION ALL SELECT p2 AS node FROM e) u
      |        GROUP BY 1),
      |o AS (SELECT CASE WHEN d1.deg <= d2.deg THEN e.p1 ELSE e.p2 END AS src,
      |             CASE WHEN d1.deg <= d2.deg THEN e.p2 ELSE e.p1 END AS dst
      |      FROM e JOIN deg d1 ON d1.node = e.p1
      |             JOIN deg d2 ON d2.node = e.p2),
      |tri AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
      |        FROM o e1 JOIN o e2 ON e2.src = e1.dst
      |                  JOIN o e3 ON e3.src = e1.src AND e3.dst = e2.dst)
      |SELECT node, COUNT(*) AS n_triangles
      |FROM (SELECT a AS node FROM tri
      |      UNION ALL SELECT b FROM tri
      |      UNION ALL SELECT c FROM tri) u
      |GROUP BY 1""".stripMargin

  /** Link prediction by common-neighbor/Jaccard similarity: which
    * suppliers serve the most-overlapping customer sets? (The "users
    * who bought X also bought Y" primitive, and the domain-similarity
    * signal a crawl curator reads off the link graph.)
    *
    * Wedge enumeration at the CUSTOMER center: one self-join of the
    * (customer, supplier) edge list on the customer key (s1 < s2
    * canonical), one pair-keyed partial agg to common-neighbor
    * counts, degrees attached from a |suppliers|-sized frame, and the
    * exact-Jaccard top-50 via TakeOrderedAndProject — per-partition
    * heaps, never a global sort. Scale: wedge fan-out is Σ deg(c)²
    * over CENTERS — bounded by the low-degree side of the bipartite
    * graph (customers hold tens of suppliers while suppliers hold
    * thousands of customers; centering on customers is the cheap
    * orientation, the g02 argument in bipartite form) — and a hub
    * center (one customer buying from everyone) gets the d07
    * deterministic cap treatment: the `deg_c <= 256` predicate is
    * replayed verbatim in the oracle, so the bound is part of the
    * operator's contract, not a silent truncation. Jaccard is exact
    * integer basis points — |A∩B| and |A|+|B|-|A∩B| are counts. */
  private def linkPredict(s: SparkSession, d: String): DataFrame =
    linkPredictFrom(
      Tables.orders(s, d).select("o_orderkey", "o_custkey")
        .join(Tables.lineitem(s, d).select("l_orderkey", "l_suppkey"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), col("l_suppkey").as("sp"))
        .distinct().persistScoped())

  /** Core of g03 over an arbitrary (c, sp) bipartite edge frame —
    * split out so the hub-cap contract is testable on planted
    * graphs. */
  private[queries] def linkPredictFrom(e: DataFrame, cap: Int = 256,
      k: Int = 50): DataFrame = {
    val degC = e.groupBy("c").agg(count(lit(1)).as("deg_c"))
    val degS = e.groupBy("sp").agg(count(lit(1)).as("deg"))
    val centered = e.join(degC, "c").where(s"deg_c <= $cap")
    val cn = centered.as("a").join(centered.as("b"),
        col("a.c") === col("b.c") && col("a.sp") < col("b.sp"))
      .select(col("a.sp").as("s1"), col("b.sp").as("s2"))
      .groupBy("s1", "s2").agg(count(lit(1)).as("cn"))
    cn.join(degS.select(col("sp").as("s1"), col("deg").as("deg1")), "s1")
      .join(degS.select(col("sp").as("s2"), col("deg").as("deg2")), "s2")
      .selectExpr("s1", "s2", "cn", "deg1", "deg2",
        "cn * 10000 div (deg1 + deg2 - cn) as jaccard_bp")
      .orderBy(col("jaccard_bp").desc, col("s1"), col("s2"))
      .limit(k)
  }

  private val linkPredictSql =
    """WITH e AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS sp
      |           FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      |degc AS (SELECT c, COUNT(*) AS deg_c FROM e GROUP BY 1),
      |degs AS (SELECT sp, COUNT(*) AS deg FROM e GROUP BY 1),
      |ctr AS (SELECT e.c, e.sp FROM e JOIN degc USING (c) WHERE deg_c <= 256),
      |cn AS (SELECT a.sp AS s1, b.sp AS s2, COUNT(*) AS cn
      |       FROM ctr a JOIN ctr b ON a.c = b.c AND a.sp < b.sp
      |       GROUP BY 1, 2)
      |SELECT s1, s2, CAST(cn AS BIGINT) AS cn,
      |       d1.deg AS deg1, d2.deg AS deg2,
      |       CAST(cn * 10000 // (d1.deg + d2.deg - cn) AS BIGINT) AS jaccard_bp
      |FROM cn JOIN degs d1 ON d1.sp = cn.s1
      |        JOIN degs d2 ON d2.sp = cn.s2
      |ORDER BY jaccard_bp DESC, s1, s2
      |LIMIT 50""".stripMargin

  val all: Map[String, Q] = Map(
    "g01_pagerank" -> Q(pagerank, Some(pagerankSql)),
    "g02_triangles" -> Q(triangles, Some(trianglesSql)),
    "g03_link_predict" -> Q(linkPredict, Some(linkPredictSql))
  )
}
