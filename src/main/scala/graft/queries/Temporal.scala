package graft.queries

import graft.Q
import graft.CacheScope.PersistScopedOps
import graft.operators.TemporalJoins
import org.apache.spark.sql.functions._

/** Temporal join queries over `events` (driver north-star operators —
  * as-of join and windowed range join; no reference counterpart).
  * Oracles are portable join+window SQL, NOT DuckDB's ASOF JOIN
  * syntax, so they run on any oracle DuckDB version.
  */
object Temporal {

  /** Shared oracle for the two as-of formulations (j01 composed
    * union+window, j03 custom Catalyst operator) — identical
    * semantics, one source of truth. */
  private val asofOracle =
    """WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value FROM events),
       p AS (SELECT event_id, ts, user_id FROM e WHERE event_type = 'purchase'),
       q AS (SELECT event_id, ts, user_id, value FROM e WHERE event_type = 'click'),
       j AS (SELECT p.event_id AS purchase_id, p.user_id,
                    q.event_id AS click_id, q.value AS click_value,
                    epoch_us(p.ts) - epoch_us(q.ts) AS lag_us,
                    row_number() OVER (PARTITION BY p.event_id
                      ORDER BY q.ts DESC NULLS LAST, q.event_id DESC NULLS LAST) AS rn
             FROM p LEFT JOIN q ON q.user_id = p.user_id AND q.ts <= p.ts)
       SELECT purchase_id, user_id, click_id, click_value, lag_us
       FROM j WHERE rn = 1"""

  /** Same-supplier shipment-interval pairs that OVERLAP — the shared
    * candidate frame of j05 (overlap length) and j10 (Allen-relation
    * classification). One semantics, one truth: the bucketized
    * equi-join, the full-row-key dedup, and the exact overlap
    * predicate live here.
    *
    * ROW IDENTITY: (orderkey, linenumber) is NOT unique in this
    * corpus (q39's red pk rule) — two same-numbered lines of one
    * order can both overlap the same partner with the same overlap,
    * and the oracle's bag semantics keeps both rows. The bucket dedup
    * must therefore run on the FULL row key (partkey included) and
    * only then project it away, or the distinct over-collapses those
    * honest duplicates (found by the sf0.1 sweep: one pair in 641k).
    */
  private def overlapPairs(s: org.apache.spark.sql.SparkSession, d: String) = {
    val li = graft.Tables(s, d, "lineitem").selectExpr(
      "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
      "cast(unix_date(cast(l_shipdate as date)) as bigint) as sd",
      "cast(unix_date(cast(l_shipdate as date)) + (cast(l_quantity as int) % 7 + 1) as bigint) as rd")
    def side(p: String) = li.selectExpr(
      s"l_orderkey as ${p}_orderkey", s"l_linenumber as ${p}_linenumber",
      s"l_partkey as ${p}_partkey",
      "l_suppkey", s"sd as ${p}_sd", s"rd as ${p}_rd")
      .selectExpr("*", s"explode(sequence(${p}_sd div 8, ${p}_rd div 8)) as bk")
    side("a").join(side("b"), Seq("l_suppkey", "bk"))
      .where("""(a_orderkey < b_orderkey
                 or (a_orderkey = b_orderkey and a_linenumber < b_linenumber))
                and a_sd <= b_rd and b_sd <= a_rd""")
      .select("a_orderkey", "a_linenumber", "a_partkey", "a_sd", "a_rd",
        "b_orderkey", "b_linenumber", "b_partkey", "b_sd", "b_rd",
        "l_suppkey")
      .distinct()
  }

  /** DuckDB mirror of [[overlapPairs]]'s interval source — shared by
    * the j05 and j10 oracles. */
  private val duckLi =
    """li AS (SELECT l_orderkey, l_linenumber, l_suppkey,
              datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS sd,
              datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
                + (CAST(l_quantity AS INT) % 7 + 1) AS rd
       FROM lineitem)"""

  /** The Allen-relation CASE over an overlapping pair (a, b) — a/b
    * ordered by ROW KEY, so every inverse relation occurs. Intervals
    * are CLOSED day ranges, so the continuous-time `meets` (end =
    * start) appears here as a one-day-shared-boundary overlap and is
    * classified before the general `overlaps` arm. `precedes` /
    * `preceded_by` (disjoint pairs) are excluded BY DESIGN: the
    * candidate frame is overlap-bucketed precisely so the quadratic
    * disjoint-pair space is never enumerated. Identical text in both
    * engines. */
  private[graft] val allenCase =
    """case when a_sd = b_sd and a_rd = b_rd then 'equals'
            when a_sd = b_sd and a_rd < b_rd then 'starts'
            when a_sd = b_sd then 'started_by'
            when a_rd = b_rd and a_sd < b_sd then 'finished_by'
            when a_rd = b_rd then 'finishes'
            when a_sd < b_sd and a_rd > b_rd then 'contains'
            when a_sd > b_sd and a_rd < b_rd then 'during'
            when a_sd < b_sd and a_rd = b_sd then 'meets'
            when a_sd > b_sd and b_rd = a_sd then 'met_by'
            when a_sd < b_sd then 'overlaps'
            else 'overlapped_by' end"""

  val all: Map[String, Q] = Map(
    // ── as-of join: each purchase picks up the user's latest click at
    //    or before it (union+tag single-sort plan — see TemporalJoins) ──
    "j01_asof_join" -> Q(
      (s, d) => {
        val e = Relational.events(s, d)
          .select("event_id", "ts", "user_id", "event_type", "value")
        val probes = e.where("event_type = 'purchase'")
          .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
        val quotes = e.where("event_type = 'click'")
        TemporalJoins.asOf(probes, quotes, key = "user_id", ts = "ts",
            quoteTieBreak = "event_id",
            payload = Seq("event_id" -> "click_id", "value" -> "click_value",
              "ts" -> "click_ts"))
          .withColumn("lag_us",
            expr("unix_micros(ts) - unix_micros(click_ts)"))
          .select("purchase_id", "user_id", "click_id", "click_value", "lag_us")
      },
      Some(asofOracle),
      bench = true),

    // ── as-of join with a tolerance bound (pandas merge_asof's
    //    `tolerance`): the latest click at most 24h before the
    //    purchase, else NULL. Because the base as-of already picks
    //    the LATEST quote ≤ ts, a post-filter on the lag is exact —
    //    no closer match can exist — so tolerance costs one codegen'd
    //    CASE on top of j01's single-exchange plan. ──
    "j04_asof_tolerance" -> Q(
      (s, d) => {
        val e = Relational.events(s, d)
          .select("event_id", "ts", "user_id", "event_type", "value")
        val probes = e.where("event_type = 'purchase'")
          .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
        val quotes = e.where("event_type = 'click'")
        TemporalJoins.asOf(probes, quotes, key = "user_id", ts = "ts",
            quoteTieBreak = "event_id",
            payload = Seq("event_id" -> "click_id", "value" -> "click_value",
              "ts" -> "click_ts"))
          .withColumn("lag_us",
            expr("unix_micros(ts) - unix_micros(click_ts)"))
          .selectExpr("purchase_id", "user_id",
            "case when lag_us <= 86400000000 then click_id end as click_id",
            "case when lag_us <= 86400000000 then click_value end as click_value",
            "case when lag_us <= 86400000000 then lag_us end as lag_us")
      },
      Some("""WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value FROM events),
              p AS (SELECT event_id, ts, user_id FROM e WHERE event_type = 'purchase'),
              q AS (SELECT event_id, ts, user_id, value FROM e WHERE event_type = 'click'),
              j AS (SELECT p.event_id AS purchase_id, p.user_id,
                           q.event_id AS click_id, q.value AS click_value,
                           epoch_us(p.ts) - epoch_us(q.ts) AS lag_us,
                           row_number() OVER (PARTITION BY p.event_id
                             ORDER BY q.ts DESC NULLS LAST, q.event_id DESC NULLS LAST) AS rn
                    FROM p LEFT JOIN q ON q.user_id = p.user_id AND q.ts <= p.ts)
              SELECT purchase_id, user_id,
                     CASE WHEN lag_us <= 86400000000 THEN click_id END AS click_id,
                     CASE WHEN lag_us <= 86400000000 THEN click_value END AS click_value,
                     CASE WHEN lag_us <= 86400000000 THEN lag_us END AS lag_us
              FROM j WHERE rn = 1""")),

    // ── the same as-of join through the custom Catalyst operator
    //    (AsOfJoin LogicalPlan → AsOfJoinStrategy → AsOfJoinExec
    //    sort-merge; shares j01's oracle — two formulations, one
    //    source of truth for the semantics) ──
    "j03_asof_plan" -> Q(
      (s, d) => {
        val e = Relational.events(s, d)
          .select("event_id", "ts", "user_id", "event_type", "value")
        val probes = e.where("event_type = 'purchase'")
          .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
        val quotes = e.where("event_type = 'click'")
        graft.plans.AsOfJoinPlan.asOf(probes, quotes,
            key = "user_id", ts = "ts", quoteTieBreak = "event_id",
            payload = Seq("event_id" -> "click_id", "value" -> "click_value",
              "ts" -> "click_ts"))
          .withColumn("lag_us",
            expr("unix_micros(ts) - unix_micros(click_ts)"))
          .select("purchase_id", "user_id", "click_id", "click_value", "lag_us")
      },
      Some(asofOracle),
      bench = true),

    // ── windowed range join: (purchase, error) pairs of the same user
    //    with the error at most 6h before the purchase (bucketed
    //    equi-join — never a theta join; 6h ≈ the testdata's per-user
    //    event spacing, so the result set is non-trivial) ──
    "j02_range_join" -> Q(
      (s, d) => {
        val e = Relational.events(s, d)
          .select("event_id", "ts", "user_id", "event_type")
        val probes = e.where("event_type = 'purchase'")
          .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("p_ts"))
        val others = e.where("event_type = 'error'")
          .select(col("user_id"), col("event_id").as("error_id"), col("ts").as("x_ts"))
        TemporalJoins.recentPairs(probes, "p_ts", others, "x_ts",
            key = "user_id", windowUs = 21600000000L)
          .selectExpr("purchase_id", "error_id", "user_id",
            "unix_micros(p_ts) - unix_micros(x_ts) as gap_us")
      },
      Some("""WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type FROM events),
              p AS (SELECT event_id, ts, user_id FROM e WHERE event_type = 'purchase'),
              x AS (SELECT event_id, ts, user_id FROM e WHERE event_type = 'error')
              SELECT p.event_id AS purchase_id, x.event_id AS error_id, p.user_id,
                     epoch_us(p.ts) - epoch_us(x.ts) AS gap_us
              FROM p JOIN x ON x.user_id = p.user_id
                AND x.ts <= p.ts
                AND epoch_us(p.ts) - epoch_us(x.ts) <= 21600000000"""),
      bench = false),

    // ── interval×interval OVERLAP join (the genomics / uptime /
    //    temporal-conflict shape): same-supplier shipment pairs whose
    //    transit intervals overlap, with the overlap length. The
    //    naive plan is a per-key theta join (per-supplier cartesian —
    //    |supplier's rows|² comparisons); the scale formulation here
    //    BUCKETIZES time: each interval explodes to the 8-day buckets
    //    it touches (intervals are ≤8 days, so ≤2 buckets — the
    //    width-equals-max-length rule that caps fan-out at 2×), the
    //    join is an equi-join on (supplier, bucket), a distinct
    //    collapses pairs that meet in both buckets, and the exact
    //    overlap predicate verifies survivors. Candidates are pairs
    //    within one bucket-width — near misses, not a cartesian; skew
    //    (a hot supplier-week) splits under AQE like any equi-join.
    //    Transit end = ship + (quantity mod 7 + 1) days — synthesized
    //    deterministically (the testdata carries no receipt date),
    //    identical in both engines. ──
    "j05_interval_overlap" -> Q(
      (s, d) => overlapPairs(s, d)
        .selectExpr("a_orderkey", "a_linenumber", "b_orderkey", "b_linenumber",
          "l_suppkey",
          "least(a_rd, b_rd) - greatest(a_sd, b_sd) + 1 as overlap_days"),
      Some(s"""WITH $duckLi
              SELECT a.l_orderkey AS a_orderkey, a.l_linenumber AS a_linenumber,
                     b.l_orderkey AS b_orderkey, b.l_linenumber AS b_linenumber,
                     a.l_suppkey,
                     LEAST(a.rd, b.rd) - GREATEST(a.sd, b.sd) + 1 AS overlap_days
              FROM li a JOIN li b ON a.l_suppkey = b.l_suppkey
               AND (a.l_orderkey < b.l_orderkey
                    OR (a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber))
               AND a.sd <= b.rd AND b.sd <= a.rd""")),

    // ── j08: interval COALESCE (Teradata NORMALIZE / SQL:2011
    // temporal packing): per supplier, overlapping-or-adjacent
    // transit intervals merge into maximal busy spans — the other
    // half of j05's overlap join (j05 finds pairwise conflicts; j08
    // produces the packed timeline capacity planning and SLA
    // reporting read). Same gaps-and-islands sweep as d18's span
    // merge, here over j05's interval source: per-KEY window ordered
    // by (start, end), island break where start > running-max-end+1,
    // one keyed partial agg per island. State is one running max per
    // supplier — never a collected interval list; the span partition
    // is order-robust (ties on (start, end) cannot split an island).
    // ──
    "j08_interval_coalesce" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        // The island flag and the running group sum are two window
        // evaluations; ordering by (sd, rd) alone is not TOTAL (tied
        // intervals exist), and an engine may permute ties
        // differently between the two sorts — the flag then rides the
        // wrong row and an island splits (found by the sf0.1 sweep).
        // The full row key makes both sorts identical everywhere.
        val li = graft.Tables(s, d, "lineitem").selectExpr(
          "l_suppkey", "l_orderkey", "l_linenumber", "l_partkey",
          "cast(unix_date(cast(l_shipdate as date)) as bigint) as sd",
          "cast(unix_date(cast(l_shipdate as date)) + (cast(l_quantity as int) % 7 + 1) as bigint) as rd")
        val bySupp = Window.partitionBy("l_suppkey")
          .orderBy("sd", "rd", "l_orderkey", "l_linenumber", "l_partkey")
        li.withColumn("pe",
            max("rd").over(bySupp.rowsBetween(Window.unboundedPreceding, -1)))
          .withColumn("fl",
            when(col("pe").isNull || col("sd") > col("pe") + 1, 1L).otherwise(0L))
          .withColumn("grp", sum("fl").over(bySupp.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy("l_suppkey", "grp")
          .agg(min("sd").as("span_start"), max("rd").as("span_end"),
            count(lit(1)).as("n_intervals"))
          .selectExpr("l_suppkey", "span_start", "span_end", "n_intervals",
            "span_end - span_start + 1 as busy_days")
      },
      Some("""WITH li AS (SELECT l_suppkey, l_orderkey, l_linenumber, l_partkey,
                       datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS sd,
                       datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
                         + (CAST(l_quantity AS INT) % 7 + 1) AS rd
                     FROM lineitem),
              w AS (SELECT l_suppkey, l_orderkey, l_linenumber, l_partkey, sd, rd,
                           max(rd) OVER (PARTITION BY l_suppkey
                             ORDER BY sd, rd, l_orderkey, l_linenumber, l_partkey
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe
                    FROM li),
              g AS (SELECT l_suppkey, sd, rd,
                           sum(CASE WHEN pe IS NULL OR sd > pe + 1 THEN 1 ELSE 0 END)
                             OVER (PARTITION BY l_suppkey
                               ORDER BY sd, rd, l_orderkey, l_linenumber, l_partkey
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
                    FROM w)
              SELECT l_suppkey, CAST(min(sd) AS BIGINT) AS span_start,
                     CAST(max(rd) AS BIGINT) AS span_end,
                     count(*) AS n_intervals,
                     CAST(max(rd) - min(sd) + 1 AS BIGINT) AS busy_days
              FROM g GROUP BY l_suppkey, grp""")),

    // ── j06: NEAREST as-of join (pandas merge_asof
    // direction='nearest'): each purchase pairs with the temporally
    // closest same-user click in EITHER direction — the feature-join
    // sensor fusion and label attribution actually want when "at or
    // before" is too strict. Composed from the single-exchange asOf
    // primitive run twice: once backward (latest click ≤ t, ties →
    // greatest event_id), once FORWARD by negating the time axis
    // (latest −t quote ≤ −t probe ⇔ earliest click ≥ t; tie-break on
    // −event_id so equal-ts forward ties resolve to the SMALLEST id)
    // — then a purchase-keyed equi-join of the two 1-row-per-probe
    // sides and a codegen'd CASE picks the smaller |Δ|, backward
    // winning exact ties. Cost: exactly two of j01's plans plus a
    // bounded join — still linear in |probes|+|quotes|, no
    // probe×quote blowup, no per-user history collected. The oracle
    // is the naive all-pairs window rank with the identical
    // (|Δ|, direction, id) ordering. ──
    "j06_nearest_join" -> Q(
      (s, d) => {
        val e = Relational.events(s, d)
          .select("event_id", "ts", "user_id", "event_type", "value")
        val probes = e.where("event_type = 'purchase'")
          .selectExpr("user_id", "unix_micros(ts) as us", "event_id as purchase_id")
        val quotes = e.where("event_type = 'click'")
          .selectExpr("user_id", "unix_micros(ts) as us", "event_id", "value")
        val back = TemporalJoins.asOf(probes, quotes,
          key = "user_id", ts = "us", quoteTieBreak = "event_id",
          payload = Seq("event_id" -> "b_id", "value" -> "b_value", "us" -> "b_us"))
        val fwd = TemporalJoins.asOf(
            probes.selectExpr("user_id", "-us as nus", "purchase_id"),
            quotes.selectExpr("user_id", "-us as nus", "-event_id as neg_id",
              "event_id", "value", "us"),
            key = "user_id", ts = "nus", quoteTieBreak = "neg_id",
            payload = Seq("event_id" -> "f_id", "value" -> "f_value", "us" -> "f_us"))
          .select("purchase_id", "f_id", "f_value", "f_us")
        back.join(fwd, "purchase_id")
          .selectExpr("purchase_id", "user_id",
            """case when f_id is null then b_id
                    when b_id is null then f_id
                    when us - b_us <= f_us - us then b_id else f_id end as click_id""",
            """case when f_id is null then b_value
                    when b_id is null then f_value
                    when us - b_us <= f_us - us then b_value else f_value end as click_value""",
            """case when f_id is null then us - b_us
                    when b_id is null then us - f_us
                    when us - b_us <= f_us - us then us - b_us else us - f_us end as delta_us""")
      },
      Some("""WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value FROM events),
              p AS (SELECT event_id, ts, user_id FROM e WHERE event_type = 'purchase'),
              q AS (SELECT event_id, ts, user_id, value FROM e WHERE event_type = 'click'),
              j AS (SELECT p.event_id AS purchase_id, p.user_id,
                           q.event_id AS click_id, q.value AS click_value,
                           epoch_us(p.ts) - epoch_us(q.ts) AS delta_us,
                           row_number() OVER (PARTITION BY p.event_id
                             ORDER BY abs(epoch_us(p.ts) - epoch_us(q.ts)) ASC NULLS LAST,
                                      (CASE WHEN q.ts <= p.ts THEN 0 ELSE 1 END) ASC,
                                      (CASE WHEN q.ts <= p.ts THEN -q.event_id
                                            ELSE q.event_id END) ASC) AS rn
                    FROM p LEFT JOIN q ON q.user_id = p.user_id)
              SELECT purchase_id, user_id, click_id, click_value, delta_us
              FROM j WHERE rn = 1""")),

    // ── j07: POINT-IN-TIME join (the feature-store operator): each
    // fact row attaches its key's latest STRICTLY-EARLIER version —
    // "features as they were at prediction time", the strictness
    // being the whole point (an at-or-before join leaks the label
    // row itself into its own features; merge_asof
    // allow_exact_matches=False). Here every order attaches its
    // customer's latest prior order (key, price, staleness in days)
    // — the prior-state snapshot a training-set builder joins.
    // Strict < on DAILY grain reduces to ≤ on (day − 1), so the
    // whole query IS the single-exchange asOf primitive — one
    // union+sort per key, linear state, while the oracle pays the
    // per-key history blowup join. Same-day earlier versions are
    // excluded (they are not strictly earlier); ties among
    // same-PRIOR-day versions resolve to the greatest key (the asOf
    // contract). ──
    "j07_pit_join" -> Q(
      (s, d) => {
        val o = graft.Tables(s, d, "orders")
        val probes = o.selectExpr("o_custkey as ck",
          "cast(unix_date(cast(o_orderdate as date)) - 1 as bigint) as pd",
          "o_orderkey as fact_key",
          "cast(unix_date(cast(o_orderdate as date)) as bigint) as fact_day")
        val quotes = o.selectExpr("o_custkey as ck",
          "cast(unix_date(cast(o_orderdate as date)) as bigint) as pd",
          "o_orderkey", "o_totalprice")
        TemporalJoins.asOf(probes, quotes, key = "ck", ts = "pd",
            quoteTieBreak = "o_orderkey",
            payload = Seq("o_orderkey" -> "prior_key",
              "o_totalprice" -> "prior_price", "pd" -> "prior_day"))
          .selectExpr("fact_key", "ck as o_custkey", "prior_key", "prior_price",
            "fact_day - prior_day as staleness_days")
      },
      Some("""WITH o AS (SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS d,
                                o_totalprice FROM orders),
              j AS (SELECT f.o_orderkey AS fact_key, f.o_custkey,
                           p.o_orderkey AS prior_key, p.o_totalprice AS prior_price,
                           datediff('day', p.d, f.d) AS staleness_days,
                           row_number() OVER (PARTITION BY f.o_orderkey
                             ORDER BY p.d DESC NULLS LAST, p.o_orderkey DESC NULLS LAST) AS rn
                    FROM o f LEFT JOIN o p ON p.o_custkey = f.o_custkey AND p.d < f.d)
              SELECT fact_key, o_custkey, prior_key, prior_price, staleness_days
              FROM j WHERE rn = 1""")),

    // ── j09: SWEEP-LINE peak concurrency — "what was the maximum
    // number of simultaneously-open orders per nation, and when was
    // it first reached?" (capacity planning / staffing / connection-
    // pool sizing — the interval-stabbing max no join formulation
    // answers). Each order is an interval [orderdate, orderdate+30d);
    // the sweep is +1/-1 events under ONE nation-keyed sort-window
    // running sum — state per key is a single counter, never the
    // interval set. End events sort BEFORE start events at the same
    // date (delta asc: back-to-back intervals do not overlap), with
    // the orderkey as the final tiebreak so the running values are
    // deterministic row-for-row in both engines. The peak and its
    // first date come from a per-nation agg + a 25-row broadcast-back
    // join — never a second global pass. ──
    "j09_max_concurrent" -> Q(
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("nk").orderBy("day", "delta", "okey")
          .rowsBetween(Long.MinValue, 0)
        val o = graft.Tables(s, d, "orders")
          .join(graft.Tables(s, d, "customer"),
            col("o_custkey") === col("c_custkey"))
          .selectExpr("c_nationkey as nk", "o_orderkey as okey",
            "cast(o_orderdate as date) as d0",
            "date_add(cast(o_orderdate as date), 30) as d1")
        val run = o.selectExpr("nk", "okey", "d0 as day", "1 as delta")
          .unionByName(o.selectExpr("nk", "okey", "d1 as day", "-1 as delta"))
          .withColumn("run", sum("delta").over(w))
          .persistScoped()
        val peaks = run.groupBy("nk").agg(max("run").as("peak"))
        run.join(broadcast(peaks), Seq("nk"))
          .where(col("run") === col("peak"))
          .groupBy("nk", "peak")
          .agg(min("day").as("first_peak_day"))
          .selectExpr("nk", "cast(peak as bigint) as peak", "first_peak_day")
      },
      Some("""WITH o AS (SELECT c_nationkey AS nk, o_orderkey AS okey,
                                CAST(o_orderdate AS DATE) AS d0,
                                CAST(o_orderdate AS DATE) + 30 AS d1
                         FROM orders JOIN customer ON o_custkey = c_custkey),
              ev AS (SELECT nk, okey, d0 AS day, 1 AS delta FROM o
                     UNION ALL
                     SELECT nk, okey, d1, -1 FROM o),
              r AS (SELECT nk, day, sum(delta) OVER (
                      PARTITION BY nk ORDER BY day, delta, okey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
                    FROM ev),
              pk AS (SELECT nk, max(run) AS peak FROM r GROUP BY nk)
              SELECT r.nk, CAST(pk.peak AS BIGINT) AS peak,
                     min(day) AS first_peak_day
              FROM r JOIN pk ON r.nk = pk.nk AND r.run = pk.peak
              GROUP BY r.nk, pk.peak""")),

    // ── j10: ALLEN INTERVAL-ALGEBRA relation census — classify every
    // overlapping same-supplier shipment pair (j05's verified
    // candidate frame) into Allen's relations and count each
    // (temporal-reasoning dataset labeling / schedule-conflict
    // taxonomy: "how many conflicts are full containments vs partial
    // overlaps?"). 11 of the 13 relations are reachable — the two
    // disjoint ones are excluded by the bucketized candidate frame's
    // design (see [[allenCase]]). Scale shape: the classification is
    // a codegen'd CASE over j05's bounded bucket join, and the census
    // is one ≤11-group partial agg — nothing new crosses an exchange
    // beyond j05's own plan. ──
    "j10_allen_relations" -> Q(
      (s, d) => overlapPairs(s, d)
        .selectExpr(s"$allenCase as relation")
        .groupBy("relation").agg(count(lit(1)).as("n_pairs")),
      Some(s"""WITH $duckLi,
              pr AS (SELECT a.sd AS a_sd, a.rd AS a_rd, b.sd AS b_sd, b.rd AS b_rd
                     FROM li a JOIN li b ON a.l_suppkey = b.l_suppkey
                      AND (a.l_orderkey < b.l_orderkey
                           OR (a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber))
                      AND a.sd <= b.rd AND b.sd <= a.rd)
              SELECT $allenCase AS relation, count(*) AS n_pairs
              FROM pr GROUP BY 1"""))
  )
}
