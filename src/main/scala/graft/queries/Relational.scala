package graft.queries

import graft.CacheScope.PersistScopedOps
import graft.{Det, Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational operator tier over the driver testdata (SURVEY.md §2.2,
  * §2.3, §2.5): filters, multi-way joins, semi/anti/outer joins,
  * aggregations, rollup, window functions, top-k, set ops, event-time
  * windows, and the scalar-function suite (coalesce, regex split,
  * set-dedup join, JSON struct, bbox→WKT, date math).
  *
  * Every query has a DuckDB oracle; aggregates of doubles go through
  * [[graft.Det]] so both engines produce bit-identical results.
  *
  * Scale notes: dimension joins carry explicit `broadcast()` hints
  * (region/nation/customer/supplier are orders of magnitude smaller
  * than lineitem at any SF); fact-fact joins (orders⋈lineitem) are
  * left to sort-merge + AQE. Window queries partition by a key with
  * bounded group size (nation, customer), so state stays per-executor.
  */
object Relational {

  /** Events table with `ts` normalized to a Spark TIMESTAMP.
    * The driver parquet stores timestamp[ns]; Spark reads nanos as
    * LONG (spark.sql.legacy.parquet.nanosAsLong) or as timestamp
    * depending on version — normalize either way to micros. */
  def events(s: SparkSession, dir: String): DataFrame = {
    val df = Tables(s, dir, "events")
    df.schema("ts").dataType.typeName match {
      case "long" => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _      => df.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  /** q40's allocation core, shared by stream23's per-batch fold: each
    * purchase's integer cents split cents-div-n across the user's
    * clicks in the prior 6 h, remainder cents one each to the most
    * recent touches — so every purchase's allocation sums to its
    * total exactly. Inputs are event-shaped frames (event_id, ts,
    * user_id, value); output is the per-click ledger. */
  private[graft] def attributionCredits(purchases: DataFrame,
      clicks: DataFrame): DataFrame = {
    val p = purchases.selectExpr("event_id as pid", "user_id",
      "unix_micros(ts) as pus", "cast(floor(value * 100) as bigint) as cents")
    val c = clicks.selectExpr("event_id as cid", "user_id as cuid",
      "unix_micros(ts) as cus")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("pid")
    val wr = w.orderBy(col("cus").desc, col("cid").desc)
    p.join(c, col("user_id") === col("cuid")
        && col("cus") <= col("pus")
        && col("cus") > col("pus") - lit(21600000000L))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("rn", row_number().over(wr))
      .selectExpr("cid", "user_id",
        // sign-correct remainder: for a refund (cents < 0) div
        // truncates toward zero, the remainder is <= 0, and the most
        // recent |rem| touches each absorb one NEGATIVE cent — the
        // conservation invariant holds for both signs
        "cents div n + case when rn <= abs(cents % n) then" +
          " (case when cents < 0 then -1L else 1L end) else 0L end as credit")
      .groupBy("cid", "user_id")
      .agg(count(lit(1)).as("n_credits"),
        sum("credit").as("attributed_cents"))
  }

  val all: Map[String, Q] = Map(
    // ── P4: filter + pruned projection (pushes to the parquet scan) ──
    "q01_filter_scan" -> Q(
      (s, d) => Tables(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
          && col("l_returnflag") === "R" && col("l_quantity") < 10)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1997-01-01'
                AND l_returnflag = 'R' AND l_quantity < 10"""),
      bench = true),

    // ── J1/P1: 5-way star join, dims broadcast ──
    "q02_star_join" -> Q(
      (s, d) => {
        val li = Tables(s, d, "lineitem")
        val o = Tables(s, d, "orders")
        val c = broadcast(Tables(s, d, "customer"))
        val n = broadcast(Tables(s, d, "nation"))
        val r = broadcast(Tables(s, d, "region"))
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(n, col("c_nationkey") === col("n_nationkey"))
          .join(r, col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name") === "ASIA" && col("l_quantity") > 45)
          .select(col("l_orderkey"), col("l_linenumber"),
            col("o_orderstatus"), col("c_name"), col("n_name"))
      },
      Some("""SELECT l_orderkey, l_linenumber, o_orderstatus, c_name, n_name
              FROM lineitem
              JOIN orders   ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation   ON c_nationkey = n_nationkey
              JOIN region   ON n_regionkey = r_regionkey
              WHERE r_name = 'ASIA' AND l_quantity > 45"""),
      bench = true),

    // ── P2: computed-column projection with alias (the `fid` shape) ──
    "q03_computed_proj" -> Q(
      (s, d) => Tables(s, d, "orders")
        .select(col("o_orderkey").as("fid"),
          concat_ws("#", col("o_orderstatus"), col("o_orderpriority")).as("tag"),
          (col("o_orderkey") % 7).as("bucket"),
          upper(substring(col("o_orderpriority"), 1, 3)).as("pri")),
      Some("""SELECT o_orderkey AS fid,
                     concat_ws('#', o_orderstatus, o_orderpriority) AS tag,
                     o_orderkey % 7 AS bucket,
                     upper(substring(o_orderpriority, 1, 3)) AS pri
              FROM orders""")),

    // ── J3: left-semi ──
    "q04_semi_join" -> Q(
      (s, d) => {
        val c = Tables(s, d, "customer")
        val o = Tables(s, d, "orders").filter(col("o_totalprice") > 400)
        c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
          .select("c_custkey", "c_name")
      },
      Some("""SELECT c_custkey, c_name FROM customer
              WHERE EXISTS (SELECT 1 FROM orders
                            WHERE o_custkey = c_custkey AND o_totalprice > 400)""")),

    // ── J3: left-anti ──
    "q05_anti_join" -> Q(
      (s, d) => {
        val c = Tables(s, d, "customer")
        val o = Tables(s, d, "orders")
        c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_mktsegment")
      },
      Some("""SELECT c_custkey, c_mktsegment FROM customer
              WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""")),

    // ── J3 + A1: left-outer join preserving unmatched, count with zeros ──
    "q06_outer_join_agg" -> Q(
      (s, d) => {
        val o = Tables(s, d, "orders")
        val li = Tables(s, d, "lineitem")
        o.join(li, col("l_orderkey") === col("o_orderkey"), "left_outer")
          .groupBy(col("o_orderkey"))
          .agg(count(col("l_orderkey")).as("n_items"),
            Det.dsum(col("l_quantity")).as("sum_qty"))
      },
      Some(s"""SELECT o_orderkey, count(l_orderkey) AS n_items,
                      ${Det.sqlSum("l_quantity")} AS sum_qty
               FROM orders LEFT JOIN lineitem ON l_orderkey = o_orderkey
               GROUP BY o_orderkey"""),
      bench = true),

    // ── F1: coalesce (null-injected via nullif for data without nulls) ──
    "q07_coalesce" -> Q(
      (s, d) => Tables(s, d, "customer")
        .select(col("c_custkey"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("(redacted)"))
            .as("seg"),
          coalesce(when(col("c_acctbal") < 0, lit(null)).otherwise(col("c_acctbal")),
            lit(0.0)).as("bal_nonneg")),
      Some("""SELECT c_custkey,
                     coalesce(nullif(c_mktsegment, 'BUILDING'), '(redacted)') AS seg,
                     coalesce(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END, 0.0)
                       AS bal_nonneg
              FROM customer""")),

    // ── A1: TPC-H Q1-shaped grouped aggregation (order-independent sums) ──
    "q08_agg_pricing" -> Q(
      (s, d) => Tables(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          Det.dsum(col("l_quantity")).as("sum_qty"),
          Det.dsum(col("l_extendedprice")).as("sum_base"),
          sum(col("l_extendedprice").cast("decimal(18,2)")
            * (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(4,2)")))
            .cast("double").as("sum_disc_price"),
          Det.davg(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("n")),
      Some(s"""SELECT l_returnflag, l_linestatus,
                      ${Det.sqlSum("l_quantity")} AS sum_qty,
                      ${Det.sqlSum("l_extendedprice")} AS sum_base,
                      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                               * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(4,2))))
                           AS DOUBLE) AS sum_disc_price,
                      ${Det.sqlAvg("l_quantity")} AS avg_qty,
                      count(*) AS n
               FROM lineitem
               WHERE l_shipdate <= TIMESTAMP '1998-09-01'
               GROUP BY l_returnflag, l_linestatus"""),
      bench = true),

    // ── A1: exact distinct counts per group ──
    "q09_distinct_agg" -> Q(
      (s, d) => Tables(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("nd_part"),
          countDistinct(col("l_suppkey")).as("nd_supp"),
          count(lit(1)).as("n")),
      Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS nd_part,
                     count(DISTINCT l_suppkey) AS nd_supp, count(*) AS n
              FROM lineitem GROUP BY l_returnflag""")),

    // ── A1: rollup with null-key normalization ──
    "q10_rollup" -> Q(
      (s, d) => Tables(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), Det.dsum(col("l_quantity")).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("(all)")).as("rf"),
          coalesce(col("l_linestatus"), lit("(all)")).as("ls"),
          col("n"), col("sum_qty")),
      Some(s"""SELECT coalesce(l_returnflag, '(all)') AS rf,
                      coalesce(l_linestatus, '(all)') AS ls,
                      count(*) AS n, ${Det.sqlSum("l_quantity")} AS sum_qty
               FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""")),

    // ── A2: ranking window, deterministic tiebreak, top-3 per nation ──
    "q11_window_rank" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("c_nationkey"))
          .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
        Tables(s, d, "customer")
          .withColumn("rnk", rank().over(w))
          .filter(col("rnk") <= 3)
          .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"), col("rnk"))
      },
      Some("""SELECT c_nationkey, c_custkey, c_acctbal, rnk FROM (
                SELECT c_nationkey, c_custkey, c_acctbal,
                       rank() OVER (PARTITION BY c_nationkey
                                    ORDER BY c_acctbal DESC, c_custkey ASC) AS rnk
                FROM customer) WHERE rnk <= 3""")),

    // ── A2: running (cumulative) sum per customer over time ──
    "q12_window_running" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables(s, d, "orders")
          .select(col("o_custkey"), col("o_orderkey"),
            sum(col("o_totalprice").cast("decimal(18,2)")).over(w)
              .cast("double").as("run_total"))
      },
      Some("""SELECT o_custkey, o_orderkey,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                          OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate ASC, o_orderkey ASC
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                          AS DOUBLE) AS run_total
              FROM orders""")),

    // ── A3: global top-k with deterministic tiebreak ──
    "q13_topk" -> Q(
      (s, d) => Tables(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select("o_orderkey", "o_totalprice"),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
              ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""")),

    // ── A4: union / intersect / except with set semantics ──
    "q14_setops" -> Q(
      (s, d) => {
        val c = Tables(s, d, "customer")
        val building = c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
        val rich = c.filter(col("c_acctbal") > 5000).select("c_custkey")
        val withOrders = Tables(s, d, "orders").select(col("o_custkey").as("c_custkey"))
        building.union(rich).distinct()
          .intersect(withOrders.distinct())
          .except(c.filter(col("c_acctbal") < 0).select("c_custkey"))
      },
      Some("""(SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
               UNION
               SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
              INTERSECT
              SELECT DISTINCT o_custkey AS c_custkey FROM orders
              EXCEPT
              SELECT c_custkey FROM customer WHERE c_acctbal < 0""")),

    // ── A5: event-time tumbling window aggregation ──
    "q15_event_tumbling" -> Q(
      (s, d) => events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("val_sum"))
        .select(unix_timestamp(col("window.start")).as("win_start"),
          col("event_type"), col("n"), col("val_sum")),
      // CAST(ts AS TIMESTAMP) truncates to µs so a future TIMESTAMP_NS
      // testdata buckets identically to Spark's µs timestamps.
      Some(s"""SELECT CAST(epoch(time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP))) AS BIGINT) AS win_start,
                      event_type, count(*) AS n, ${Det.sqlSum("value")} AS val_sum
               FROM events GROUP BY 1, 2""")),

    // ── A5: hopping (overlapping) event-time windows, 1h every 30m ──
    // Each event lands in exactly windowDuration/slideDuration = 2
    // windows; Spark's window() expands rows map-side before the
    // grouping exchange — the same partial-agg-below-exchange shape
    // as tumbling, with a bounded 2× row expansion.
    // ── salted skew join through the gate: [[graft.operators.Skew
    // .saltedJoin]] spreads each hot key over 8 salt shards on the
    // big side and replicates the dimension 8× — the plan-level
    // answer when one join key dwarfs the rest and AQE's runtime
    // split can't save a broadcast-ineligible join. Semantics are
    // IDENTICAL to the plain 1:N equi-join, which is exactly what the
    // oracle asserts (same aggregate over a plain join). ──
    "q27_salted_join" -> Q(
      (s, d) => {
        val li = Tables(s, d, "lineitem").select(col("l_suppkey"), col("l_quantity"))
        val sup = Tables(s, d, "supplier")
          .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
        graft.operators.Skew.saltedJoin(li, sup, "l_suppkey", 8)
          .groupBy("s_nationkey")
          .agg(count(lit(1)).as("n"), Det.dsum(col("l_quantity")).as("qty_sum"))
      },
      Some(s"""SELECT s_nationkey, count(*) AS n, ${Det.sqlSum("l_quantity")} AS qty_sum
               FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
               GROUP BY s_nationkey""")),

    "q26_hopping_window" -> Q(
      (s, d) => events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("val_sum"))
        .select(unix_timestamp(col("window.start")).as("win_start"),
          col("event_type"), col("n"), col("val_sum")),
      Some(s"""WITH e AS (SELECT event_type, value,
                      time_bucket(INTERVAL 30 MINUTE, CAST(ts AS TIMESTAMP)) AS b FROM events),
               w AS (SELECT event_type, value, unnest([b, b - INTERVAL 30 MINUTE]) AS w_start FROM e)
               SELECT CAST(epoch(w_start) AS BIGINT) AS win_start,
                      event_type, count(*) AS n, ${Det.sqlSum("value")} AS val_sum
               FROM w GROUP BY 1, 2""")),

    // ── A5: session windows (30-minute gap) per user ──
    "q16_session_window" -> Q(
      (s, d) => events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("val_sum"))
        .select(col("user_id"),
          unix_millis(col("session_window.start")).as("session_start_ms"),
          col("n"), col("val_sum")),
      Some(s"""WITH e AS (
                 SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
               ), marks AS (
                 SELECT user_id, ts, value,
                        CASE WHEN lag(ts) OVER w IS NULL
                                  OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                             THEN 1 ELSE 0 END AS new_s
                 FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
               ), sess AS (
                 SELECT user_id, ts, value,
                        sum(new_s) OVER (PARTITION BY user_id ORDER BY ts) AS sid
                 FROM marks)
               SELECT user_id, epoch_ms(min(ts))::BIGINT AS session_start_ms,
                      count(*) AS n, ${Det.sqlSum("value")} AS val_sum
               FROM sess GROUP BY user_id, sid"""),
      bench = true),

    // ── F4: regex string split ──
    "q17_regex_split" -> Q(
      (s, d) => Tables(s, d, "documents")
        .select(col("doc_id"), size(split(col("text"), " +")).as("n_tokens"),
          element_at(split(col("text"), " +"), 1).as("first_tok"),
          element_at(split(col("text"), " +"), -1).as("last_tok")),
      Some("""SELECT doc_id, len(regexp_split_to_array(text, ' +')) AS n_tokens,
                     regexp_split_to_array(text, ' +')[1] AS first_tok,
                     regexp_split_to_array(text, ' +')[-1] AS last_tok
              FROM documents""")),

    // ── F5: set-dedup + delimiter join (csw.py:91,98 shape) ──
    "q18_set_dedup_join" -> Q(
      (s, d) => Tables(s, d, "documents")
        .select(col("doc_id"),
          array_join(array_sort(array_distinct(split(col("text"), " "))), ", ")
            .as("toks"),
          size(array_distinct(split(col("text"), " "))).as("n_uniq")),
      Some("""SELECT doc_id,
                     array_to_string(list_sort(list_distinct(string_split(text, ' '))), ', ')
                       AS toks,
                     len(list_distinct(string_split(text, ' '))) AS n_uniq
              FROM documents""")),

    // ── F6: JSON serialization of a struct ──
    "q19_json_struct" -> Q(
      (s, d) => Tables(s, d, "orders")
        .select(col("o_orderkey"),
          to_json(struct(col("o_orderkey"), col("o_orderstatus"),
            col("o_orderpriority"))).as("js")),
      Some("""SELECT o_orderkey,
                     to_json(struct_pack(o_orderkey := o_orderkey,
                                         o_orderstatus := o_orderstatus,
                                         o_orderpriority := o_orderpriority)) AS js
              FROM orders""")),

    // ── F8: bbox → WKT polygon (integer corners; csw.py:51,88 shape) ──
    "q20_bbox_wkt" -> Q(
      (s, d) => Tables(s, d, "part")
        .select(col("p_partkey"),
          format_string("POLYGON((%d %d, %d %d, %d %d, %d %d, %d %d))",
            col("p_size"), col("p_size"),
            (col("p_size") + 10), col("p_size"),
            (col("p_size") + 10), (col("p_size") + 5),
            col("p_size"), (col("p_size") + 5),
            col("p_size"), col("p_size")).as("wkt")),
      Some("""SELECT p_partkey,
                     printf('POLYGON((%d %d, %d %d, %d %d, %d %d, %d %d))',
                            p_size, p_size, p_size + 10, p_size,
                            p_size + 10, p_size + 5, p_size, p_size + 5,
                            p_size, p_size) AS wkt
              FROM part""")),

    // ── F9: date math suite ──
    "q21_datemath" -> Q(
      (s, d) => Tables(s, d, "orders")
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("dom"),
          date_format(date_trunc("quarter", col("o_orderdate")), "yyyy-MM-dd")
            .as("q_start"),
          datediff(lit("2002-01-01").cast("date"), col("o_orderdate").cast("date"))
            .as("days_to_2002")),
      Some("""SELECT o_orderkey,
                     year(o_orderdate)::INT AS y, month(o_orderdate)::INT AS m,
                     day(o_orderdate)::INT AS dom,
                     strftime(date_trunc('quarter', o_orderdate), '%Y-%m-%d') AS q_start,
                     datediff('day', o_orderdate::DATE, DATE '2002-01-01')::INT
                       AS days_to_2002
              FROM orders""")),

    // ── A1+: exact interpolated percentiles per group ──
    // Spark's `percentile` and DuckDB's `quantile_cont` both sort and
    // linearly interpolate at pos = p·(n−1); doubles are compared
    // bit-for-bit by the gate, so this row is also a regression check
    // that the interpolation really is the same arithmetic.
    "q22_percentiles" -> Q(
      (s, d) => Tables(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          expr("percentile(l_extendedprice, 0.25)").as("p25"),
          expr("percentile(l_extendedprice, 0.5)").as("p50"),
          expr("percentile(l_extendedprice, 0.9)").as("p90")),
      Some("""SELECT l_returnflag,
                     quantile_cont(l_extendedprice, 0.25) AS p25,
                     quantile_cont(l_extendedprice, 0.5) AS p50,
                     quantile_cont(l_extendedprice, 0.9) AS p90
              FROM lineitem GROUP BY l_returnflag""")),

    // ── A1+: CUBE with grouping_id (all 4 grouping-set combinations) ──
    "q23_cube" -> Q(
      (s, d) => Tables(s, d, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
          Det.dsum(col("l_quantity")).as("qty")),
      Some("""SELECT l_returnflag, l_linestatus,
                     GROUPING(l_returnflag, l_linestatus)::BIGINT AS gid,
                     count(*) AS n,
                     CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS qty
              FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""")),

    // ── A1+: explicit grouping sets (the general form rollup/cube
    // specialize): per-flag and per-status marginals in ONE pass —
    // the expand+partial-agg plan, one shuffle, no per-set rescan. ──
    "q28_grouping_sets" -> Q(
      (s, d) => {
        val li = Tables(s, d, "lineitem")
        li.createOrReplaceTempView("graft_q28_lineitem")
        s.sql("""SELECT l_returnflag, l_linestatus,
                        grouping_id() AS gid, count(1) AS n
                 FROM graft_q28_lineitem
                 GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""")
      },
      Some("""SELECT l_returnflag, l_linestatus,
                     GROUPING(l_returnflag, l_linestatus)::BIGINT AS gid,
                     count(*) AS n
              FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""")),

    // ── A1+: pivot (wide conditional aggregation) ──
    // Explicit value list → deterministic output columns; sum (not
    // count) so absent combinations are NULL in both engines.
    "q24_pivot" -> Q(
      (s, d) => Tables(s, d, "orders")
        .groupBy("o_orderstatus")
        .pivot("o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .agg(Det.dsum(col("o_totalprice")).as("total")),
      Some {
        def f(p: String, alias: String) =
          s"""CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) FILTER (WHERE o_orderpriority = '$p') AS DOUBLE) AS "$alias""""
        s"""SELECT o_orderstatus,
               ${f("1-URGENT", "1-URGENT")},
               ${f("2-HIGH", "2-HIGH")},
               ${f("3-MEDIUM", "3-MEDIUM")},
               ${f("4-NOT SPECIFIED", "4-NOT SPECIFIED")},
               ${f("5-LOW", "5-LOW")}
            FROM orders GROUP BY o_orderstatus"""
      }),

    // ── A2+: trailing time-RANGE window frame ──
    // Per event: count of the same user's events in the trailing hour
    // — the no-self-join formulation of sliding-time aggregates (one
    // exchange on user_id, sorted range frame; a range join would
    // shuffle |events|×|window| rows). Numeric micros ordering keeps
    // the frame bounds portable across engines.
    "q25_time_range_frame" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy(col("ts_us"))
          .rangeBetween(-3600000000L, 0)
        events(s, d)
          .selectExpr("event_id", "user_id", "unix_micros(ts) as ts_us")
          .withColumn("n_last_hour", count(lit(1)).over(w))
          .select("event_id", "user_id", "n_last_hour")
      },
      Some("""SELECT event_id, user_id,
                     count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
                       RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS n_last_hour
              FROM events""")),

    // ── P5: unpivot / melt (wide→long), the inverse of q24's pivot ──
    // The four lineitem measures become (measure, value) rows keyed by
    // (l_orderkey, l_linenumber). Plan: one map-only Expand — 4×
    // output rows but ZERO exchange, so it composes with a downstream
    // groupBy("measure") into a single-shuffle long-form aggregation.
    // The oracle is the dialect-neutral UNION ALL spelling of the same
    // relation (DuckDB's UNPIVOT keyword reorders rows, which the
    // harness sort absorbs, but UNION ALL pins the semantics in ANSI).
    "q29_unpivot" -> Q(
      (s, d) => Tables(s, d, "lineitem")
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          "measure", "value"),
      Some("""SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value FROM lineitem
              UNION ALL
              SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
              UNION ALL
              SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
              UNION ALL
              SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem""")),

    // ── latest-record-per-key: the changelog→snapshot compaction
    // every CDC-fed or multi-crawl corpus needs (keep only the newest
    // crawl of each URL / latest order per customer). rank()=1 over
    // (key, recency) — Spark's optimizer rewrites the filtered window
    // into WindowGroupLimit, which keeps a per-key top-1 heap BELOW
    // the exchange: only one row per key per partition shuffles, not
    // the history. The tie-break on o_orderkey makes the winner
    // deterministic in both engines. PlanShapeSpec pins the
    // WindowGroupLimit so a refactor can't silently regress this to a
    // full-history shuffle + filter. ──
    "q30_latest_per_key" -> Q(
      (s, d) => Tables(s, d, "orders")
        .withColumn("rn", row_number().over(
          Window.partitionBy("o_custkey")
            .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)))
        .where("rn = 1")
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"),
      Some("""SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
              FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
                    FROM orders)
              WHERE rn = 1""")),

    // ── universal quantification: customers ALL of whose orders are
    // high-value ("for all" = NOT EXISTS a violating row). Spark has
    // no FORALL join; the scale shape is the anti-join against the
    // VIOLATORS (o_totalprice <= threshold) intersected by semi-join
    // with order owners — both hash equi-joins on the customer key,
    // violator side filtered BEFORE the shuffle so only offending
    // keys travel. The correlated-subquery SQL spelling in the oracle
    // is what Catalyst would rewrite to the same two joins. ──
    "q31_forall_antijoin" -> Q(
      (s, d) => {
        val c = Tables(s, d, "customer")
        val o = Tables(s, d, "orders")
        c.join(o.where("o_totalprice > 250000"), col("c_custkey") === col("o_custkey"), "left_semi")
          .join(o.where("o_totalprice <= 250000").select(col("o_custkey").as("v_custkey")),
            col("c_custkey") === col("v_custkey"), "left_anti")
          .select("c_custkey", "c_name")
      },
      Some("""SELECT c_custkey, c_name FROM customer
              WHERE EXISTS (SELECT 1 FROM orders
                            WHERE o_custkey = c_custkey AND o_totalprice > 250000)
                AND NOT EXISTS (SELECT 1 FROM orders
                                WHERE o_custkey = c_custkey AND o_totalprice <= 250000)""")),

    // ── SCD2 interval building: a change log becomes versioned
    // history rows (valid_from, valid_to, is_current) — the slowly-
    // changing-dimension type-2 shape every warehouse dimension and
    // every point-in-time training-data snapshot needs. One lead()
    // over (key, change-time): each record's validity closes at the
    // NEXT record's effective date, the newest stays open
    // (valid_to NULL, is_current). Same scale class as q30: one
    // exchange on the key, per-key window state bounded by that key's
    // history, never a self-join on the change table. The
    // (o_orderdate, o_orderkey) compound order makes same-day
    // changes deterministic in both engines. ──
    "q32_scd2" -> Q(
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        Tables(s, d, "orders")
          .withColumn("valid_to", lead(col("o_orderdate"), 1).over(w))
          .selectExpr("o_custkey", "o_orderkey", "o_orderdate as valid_from",
            "valid_to", "valid_to is null as is_current")
      },
      Some("""SELECT o_custkey, o_orderkey, o_orderdate AS valid_from,
                     lead(o_orderdate) OVER w AS valid_to,
                     (lead(o_orderdate) OVER w) IS NULL AS is_current
              FROM orders
              WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""")),

    // ── q33: ordered conversion FUNNEL (view → click within 6h →
    // purchase within 6h of the click, strictly increasing
    // timestamps) — the product-analytics staple. Sequential-
    // dependency aggregation WITHOUT collecting per-user event lists
    // (a collect_list fold holds a user's whole history in one
    // buffer — unbounded for a hot user at 100 TB): each stage is a
    // partial-aggregated min keyed on user_id, joined to the
    // previous stage's watermark, filtered BEFORE aggregating.
    // Three user-keyed exchanges, each carrying one row per
    // qualifying user, state bounded by one timestamp per user per
    // stage. AQE reuses the user_id partitioning across the chain. ──
    "q33_funnel" -> Q(
      (s, d) => {
        val e = events(s, d).selectExpr("user_id", "ts", "event_type")
        val v = e.where("event_type = 'view'")
          .groupBy("user_id").agg(min("ts").as("t1"))
        val c = e.where("event_type = 'click'").join(v, "user_id")
          .where("ts > t1 and ts <= t1 + interval 6 hour")
          .groupBy("user_id").agg(min("ts").as("t2"))
        val p = e.where("event_type = 'purchase'").join(c, "user_id")
          .where("ts > t2 and ts <= t2 + interval 6 hour")
          .groupBy("user_id").agg(min("ts").as("t3"))
        v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
          .selectExpr("user_id",
            "unix_millis(t1) as t_view_ms",
            "unix_millis(t2) as t_click_ms",
            "unix_millis(t3) as t_purchase_ms",
            "cast(1 + if(t2 is not null, 1, 0) + if(t3 is not null, 1, 0) as int) as stage")
      },
      Some("""WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
                         FROM events),
              v AS (SELECT user_id, min(ts) AS t1 FROM e
                    WHERE event_type = 'view' GROUP BY 1),
              c AS (SELECT e.user_id, min(ts) AS t2 FROM e JOIN v USING (user_id)
                    WHERE event_type = 'click' AND ts > t1
                      AND ts <= t1 + INTERVAL 6 HOUR GROUP BY 1),
              p AS (SELECT e.user_id, min(ts) AS t3 FROM e JOIN c USING (user_id)
                    WHERE event_type = 'purchase' AND ts > t2
                      AND ts <= t2 + INTERVAL 6 HOUR GROUP BY 1)
              SELECT v.user_id, epoch_ms(t1)::BIGINT AS t_view_ms,
                     epoch_ms(t2)::BIGINT AS t_click_ms,
                     epoch_ms(t3)::BIGINT AS t_purchase_ms,
                     CAST(1 + (t2 IS NOT NULL)::INT + (t3 IS NOT NULL)::INT AS INTEGER) AS stage
              FROM v LEFT JOIN c ON c.user_id = v.user_id
                     LEFT JOIN p ON p.user_id = v.user_id""")),

    // ── q34: cohort retention matrix — the other staple of product
    // analytics next to q33's funnel: cohort = a user's first-seen
    // DAY, and for each (cohort, day-offset k) the share of the
    // cohort active k days later. Scale shape: one user-keyed min
    // (partial-agg'd) for cohort assignment, one distinct over
    // (user, day) — NEVER the raw event grain past the first
    // exchange — then a user-keyed equi-join (co-partitioned with
    // the min's shuffle) and a cohort-keyed two-phase distinct
    // count. Output is |days|² at most — bounded by the calendar,
    // not the corpus; retention in integer basis points so the
    // compare is exact. No per-user event history is ever
    // collected: a hot user costs one extra row per active day. ──
    "q34_cohort_retention" -> Q(
      (s, d) => {
        val ev = events(s, d).selectExpr("user_id", "to_date(ts) as day").distinct()
        val first = ev.groupBy("user_id").agg(min("day").as("cohort_day"))
        val sizes = first.groupBy("cohort_day").agg(count(lit(1)).as("cohort_size"))
        ev.join(first, "user_id")
          .selectExpr("cohort_day",
            "cast(datediff(day, cohort_day) as bigint) as k", "user_id")
          .groupBy("cohort_day", "k")
          .agg(countDistinct("user_id").as("n_active"))
          .join(sizes, "cohort_day")
          .selectExpr("cohort_day", "k", "n_active", "cohort_size",
            "n_active * 10000 div cohort_size as retention_bp")
      },
      Some("""WITH ev AS (SELECT DISTINCT user_id,
                                 CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events),
              f AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY 1),
              sz AS (SELECT cohort_day, count(*) AS cohort_size FROM f GROUP BY 1),
              mat AS (SELECT cohort_day, CAST(day - cohort_day AS BIGINT) AS k,
                             count(DISTINCT ev.user_id) AS n_active
                      FROM ev JOIN f USING (user_id) GROUP BY 1, 2)
              SELECT m.cohort_day, k, n_active, cohort_size,
                     CAST(n_active * 10000 // cohort_size AS BIGINT) AS retention_bp
              FROM mat m JOIN sz USING (cohort_day)""")),

    // ── q35: event-type TRANSITION matrix (first-order Markov counts
    // over session-linked steps) — the "what do users do next"
    // navigation profile. A step links consecutive same-user events
    // ≤6h apart (the testdata's per-user spacing, as in j02); counts
    // aggregate per (from_type, to_type) with the share in basis
    // points. Scale shape: ONE user-keyed window for the lag (state
    // = one previous row per user — Spark's running window frame,
    // never a collected history), then a |types|²-bounded partial
    // agg; the total attaches via the audited
    // crossJoin(broadcast(scalar)) shape. A hot user costs a wider
    // sort partition in the lag exchange, splittable by AQE. ──
    "q35_event_transitions" -> Q(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val tr = events(s, d)
          .select("user_id", "ts", "event_id", "event_type")
          .withColumn("from_type", lag("event_type", 1).over(w))
          .withColumn("gap_us",
            expr("unix_micros(ts) - unix_micros(lag(ts, 1) over " +
              "(partition by user_id order by ts, event_id))"))
          .where("from_type is not null and gap_us <= 21600000000")
          .selectExpr("from_type", "event_type as to_type")
          .groupBy("from_type", "to_type")
          .agg(count(lit(1)).as("n"))
        tr.crossJoin(broadcast(tr.agg(sum("n").as("n_tot"))))
          .selectExpr("from_type", "to_type", "n",
            "n * 10000 div n_tot as share_bp")
      },
      Some("""WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type FROM events),
              t AS (SELECT user_id, event_type,
                           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS from_type,
                           epoch_us(ts) - lag(epoch_us(ts)) OVER
                             (PARTITION BY user_id ORDER BY ts, event_id) AS gap
                    FROM e),
              c AS (SELECT from_type, event_type AS to_type, count(*) AS n FROM t
                    WHERE from_type IS NOT NULL AND gap <= 21600000000 GROUP BY 1, 2),
              tot AS (SELECT sum(n) AS n_tot FROM c)
              SELECT from_type, to_type, n,
                     CAST(n * 10000 // n_tot AS BIGINT) AS share_bp
              FROM c, tot""")),

    // ── q38: ROBUST outlier detection via median absolute deviation
    // — the anomaly cut that survives what mean±kσ cannot (one whale
    // drags a mean; the median and MAD ignore it): corpus median of
    // integer-cent values, MAD = median of |v − med|, outliers at
    // dev > 3·MAD, published as counts and share. Pinned rank
    // contract (value at rank ⌈N/2⌉ ascending — NOT the midpoint
    // average, which DuckDB's median() would compute differently),
    // both rank statistics via TakeOrderedAndProject (per-partition
    // heap heads, driver merge, never a global sort; the t16 Int
    // guard names the sketch fallback past 2³¹), the scalar attaches
    // via the audited crossJoin(broadcast(1-row agg)) shape, and the
    // flags fold map-side into one summary row. ──
    "q38_robust_outliers" -> Q(
      (s, d) => {
        val v = events(s, d)
          .selectExpr("cast(floor(value * 100) as bigint) as v").persistScoped()
        val n = v.count()
        val kL = (n + 1) / 2
        require(kL <= Int.MaxValue,
          s"corpus too large for exact rank-$kL; use the d21 sketch estimate")
        val k = kL.toInt
        val med = v.orderBy(col("v").asc).limit(k).agg(max("v").as("med"))
        val dev = v.crossJoin(broadcast(med))
          .selectExpr("abs(v - med) as dev", "med").persistScoped()
        val mad = dev.orderBy(col("dev").asc).limit(k).agg(max("dev").as("mad"))
        dev.crossJoin(broadcast(mad))
          .selectExpr("med", "mad",
            "case when dev > 3 * mad then 1L else 0L end as o")
          .agg(count(lit(1)).as("n_total"), min("med").as("median_c"),
            min("mad").as("mad_c"), sum("o").as("n_outliers"))
          .selectExpr("n_total", "median_c", "mad_c", "n_outliers",
            "n_outliers * 10000 div n_total as outlier_bp")
      },
      Some("""WITH c AS (SELECT CAST(floor(value * 100) AS BIGINT) AS v FROM events),
              nn AS (SELECT count(*) AS n FROM c),
              rk AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM c),
              m AS (SELECT max(CASE WHEN rn <= (n + 1) // 2 THEN v END) AS med
                    FROM rk CROSS JOIN nn),
              dv AS (SELECT abs(v - med) AS dev, med FROM c CROSS JOIN m),
              rkd AS (SELECT dev, row_number() OVER (ORDER BY dev) AS rn FROM dv),
              md AS (SELECT max(CASE WHEN rn <= (n + 1) // 2 THEN dev END) AS mad
                     FROM rkd CROSS JOIN nn)
              SELECT CAST(n AS BIGINT) AS n_total, CAST(med AS BIGINT) AS median_c,
                     CAST(mad AS BIGINT) AS mad_c,
                     CAST(sum(CASE WHEN dev > 3 * mad THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_outliers,
                     CAST(sum(CASE WHEN dev > 3 * mad THEN 1 ELSE 0 END) * 10000 // n
                          AS BIGINT) AS outlier_bp
              FROM dv CROSS JOIN md CROSS JOIN nn
              GROUP BY n, med, mad""")),

    // ── q37: rolling DISTINCT-user reach — DAU/WAU and the
    // stickiness ratio (the product-analytics vital sign next to
    // q34's retention): for every day in the event range, the
    // distinct users active that day and in the trailing 7 days.
    // Sliding DISTINCT cannot ride a window frame (distinct doesn't
    // decompose over frames), so the exact shape is membership
    // expansion: the event grain dies at the FIRST exchange
    // (distinct (user, day)), each user-day then fans out map-side
    // into the ≤7 window-ends it can serve (bounded ×7, the q26
    // hopping expansion), and one day-keyed distinct-agg finishes —
    // state per day is its distinct user set, never the event
    // stream. Days beyond the observed range are clipped so every
    // output day is a real day. ──
    "q37_rolling_reach" -> Q(
      (s, d) => {
        val ud = events(s, d)
          .selectExpr("user_id", "cast(unix_date(cast(ts as date)) as bigint) as day")
          .distinct().persistScoped()
        val ext = ud.agg(max("day").as("dmax"))
        val dau = ud.groupBy("day").agg(countDistinct("user_id").as("dau"))
        val wau = ud.crossJoin(broadcast(ext))
          .selectExpr("user_id", "explode(sequence(day, least(day + 6, dmax))) as wday")
          .groupBy("wday").agg(countDistinct("user_id").as("wau"))
          .selectExpr("wday as day", "wau")
        dau.join(wau, "day")
          .selectExpr("day", "dau", "wau", "dau * 10000 div wau as stickiness_bp")
      },
      Some("""WITH ud AS (SELECT DISTINCT user_id,
                            datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day
                          FROM events),
              ext AS (SELECT max(day) AS dmax FROM ud),
              dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM ud GROUP BY day),
              wau AS (SELECT wday AS day, count(DISTINCT user_id) AS wau FROM
                        (SELECT user_id,
                                unnest(generate_series(day, least(day + 6, dmax))) AS wday
                         FROM ud CROSS JOIN ext)
                      GROUP BY wday)
              SELECT day, CAST(dau AS BIGINT) AS dau, CAST(wau AS BIGINT) AS wau,
                     CAST(dau * 10000 // wau AS BIGINT) AS stickiness_bp
              FROM dau JOIN wau USING (day)"""))
      ,

    // ── q36: time-series RESAMPLE + forward fill — the pandas
    // `resample('D').ffill()` primitive as a distributed query: per
    // user a daily grid spanning their observed range, each grid day
    // carrying the LAST observed value at or before its end (basis-
    // point integer so the compare is exact) and that day's
    // observation count — the gap-free regular series feature
    // pipelines and dashboards consume where raw events are sparse
    // and irregular. Scale shape: one user-keyed partial agg to a
    // (user, day) grain, the grid explode is bounded by each user's
    // own day span (never the global calendar × users), and the fill
    // is a user-partitioned last-non-null window — one previous value
    // of state per user, the q30/stream11 class. The last-of-day pick
    // is the lexicographic struct-max (ts, event_id, v) argmax, tie-
    // deterministic in both engines. ──
    "q36_resample_ffill" -> Q(
      (s, d) => {
        val e = events(s, d).selectExpr("user_id", "ts", "event_id",
          "cast(floor(value * 10000) as bigint) as v_bp")
        val daily = e
          .groupBy(col("user_id"), date_trunc("DAY", col("ts")).as("day"))
          .agg(count(lit(1)).as("n_obs"),
            max(struct(col("ts"), col("event_id"), col("v_bp"))).as("m"))
          .selectExpr("user_id", "day", "n_obs", "m.v_bp as v_last")
        val grid = e.groupBy("user_id")
          .agg(min(date_trunc("DAY", col("ts"))).as("d0"),
            max(date_trunc("DAY", col("ts"))).as("d1"))
          .selectExpr("user_id", "explode(sequence(d0, d1, interval 1 day)) as day")
        grid.join(daily, Seq("user_id", "day"), "left")
          .withColumn("v_ffill", last("v_last", ignoreNulls = true).over(
            org.apache.spark.sql.expressions.Window.partitionBy("user_id")
              .orderBy("day").rowsBetween(Long.MinValue, 0)))
          .selectExpr("user_id", "day", "coalesce(n_obs, 0L) as n_obs", "v_ffill")
      },
      Some("""WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
                                CAST(floor(value * 10000) AS BIGINT) AS v_bp
                         FROM events),
              daily AS (SELECT user_id, date_trunc('day', ts) AS day,
                               count(*) AS n_obs,
                               (max(struct_pack(ts := ts, eid := event_id,
                                                v := v_bp))).v AS v_last
                        FROM e GROUP BY 1, 2),
              ext AS (SELECT user_id, min(date_trunc('day', ts)) AS d0,
                             max(date_trunc('day', ts)) AS d1
                      FROM e GROUP BY 1),
              grid AS (SELECT user_id,
                              unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
                       FROM ext),
              j AS (SELECT g.user_id, g.day,
                           CAST(coalesce(n_obs, 0) AS BIGINT) AS n_obs, v_last
                    FROM grid g LEFT JOIN daily dd
                      ON dd.user_id = g.user_id AND dd.day = g.day),
              -- ffill via the grouped-max gap-fill idiom, NOT
              -- last_value(... IGNORE NULLS): DuckDB's IGNORE NULLS
              -- window allocates ~77KB/row of frame state (measured:
              -- 2.3GB for 30k rows), a guaranteed checker OOM at sf10's
              -- 4.5M grid rows. The cumulative count ticks on each
              -- observation, so each grp holds exactly one non-null
              -- v_last — max() recovers it; all-NULL prefixes stay NULL.
              grp AS (SELECT *, count(v_last) OVER (
                        PARTITION BY user_id ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
                      FROM j)
              SELECT user_id, day, n_obs,
                     max(v_last) OVER (PARTITION BY user_id, g) AS v_ffill
              FROM grp""")),

    // ── q39: data-quality CONSTRAINT AUDIT (the Deequ shape) — the
    // pre-ingest contract check every production pipeline runs before
    // a table is allowed downstream: primary-key uniqueness,
    // completeness, domain membership, numeric ranges, and
    // referential integrity, each published as an integer metric plus
    // a pass/fail verdict. Scale shape: ONE scan of the fact table
    // computes every row-local metric in a single partial-aggregate
    // (Deequ's core trick — k constraints never cost k scans), the
    // referential check is a left-anti count against the projected
    // key column of the dimension (a broadcast at dim «fact, a
    // shuffle join past that), and the constraint rows are unpivoted
    // from the ONE aggregated row driver-free via stack(). The
    // qty_max_le_30 rule fails by design, and pk_unique genuinely
    // fails on this corpus (the generator densifies line numbers) — the audit's job is to
    // SURFACE violations, and a suite that cannot show a red row is
    // the vacuity pattern PlanAuditSpec exists to kill. ──
    "q39_constraint_audit" -> Q(
      (s, d) => {
        val li = Tables(s, d, "lineitem")
        val core = li.agg(
          count(lit(1)).as("n"),
          countDistinct(col("l_orderkey"), col("l_linenumber")).as("n_pk"),
          countDistinct(col("l_orderkey"), col("l_linenumber"),
            col("l_partkey"), col("l_suppkey")).as("n_key"),
          count(col("l_shipdate")).as("n_ship"),
          expr("cast(round(min(l_quantity) * 100) as bigint)").as("qmin_c"),
          expr("cast(round(max(l_quantity) * 100) as bigint)").as("qmax_c"),
          expr("cast(round(min(l_discount) * 10000) as bigint)").as("dmin_bp"),
          expr("cast(round(max(l_discount) * 10000) as bigint)").as("dmax_bp"),
          sum(expr("case when l_returnflag in ('R','A','N') then 0L else 1L end"))
            .as("bad_flag"))
        val orphans = li.select("l_orderkey")
          .join(Tables(s, d, "orders").select("o_orderkey"),
            col("l_orderkey") === col("o_orderkey"), "left_anti")
          .agg(count(lit(1)).as("n_orphan"))
        core.crossJoin(broadcast(orphans)).selectExpr(
          """stack(7,
               'pk_unique',         n_pk * 10000 div n,    n_pk = n,
               'line_key_unique',   n_key * 10000 div n,   n_key = n,
               'shipdate_complete', n_ship * 10000 div n,  n_ship = n,
               'qty_min_ge_1',      qmin_c,                qmin_c >= 100,
               'qty_max_le_30',     qmax_c,                qmax_c <= 3000,
               'discount_in_0_10pct',
                 case when dmin_bp < 0 then dmin_bp else dmax_bp end,
                 dmin_bp >= 0 and dmax_bp <= 1000,
               'returnflag_domain', bad_flag, bad_flag = 0
             ) as (rule, metric, passed)""")
          .unionAll(orphans.selectExpr("'orders_referential' as rule",
            "n_orphan as metric", "n_orphan = 0 as passed"))
      },
      Some("""WITH core AS (
                SELECT count(*) AS n,
                       count(DISTINCT (l_orderkey, l_linenumber)) AS n_pk,
                       count(DISTINCT (l_orderkey, l_linenumber,
                                       l_partkey, l_suppkey)) AS n_key,
                       count(l_shipdate) AS n_ship,
                       CAST(round(min(l_quantity) * 100) AS BIGINT) AS qmin_c,
                       CAST(round(max(l_quantity) * 100) AS BIGINT) AS qmax_c,
                       CAST(round(min(l_discount) * 10000) AS BIGINT) AS dmin_bp,
                       CAST(round(max(l_discount) * 10000) AS BIGINT) AS dmax_bp,
                       sum(CASE WHEN l_returnflag IN ('R','A','N')
                                THEN 0 ELSE 1 END) AS bad_flag
                FROM lineitem),
              orph AS (SELECT count(*) AS n_orphan FROM lineitem
                       WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
              SELECT rule, CAST(metric AS BIGINT) AS metric, passed FROM (
                SELECT 'pk_unique' AS rule, n_pk * 10000 // n AS metric,
                       n_pk = n AS passed FROM core
                UNION ALL SELECT 'line_key_unique', n_key * 10000 // n,
                       n_key = n FROM core
                UNION ALL SELECT 'shipdate_complete', n_ship * 10000 // n,
                       n_ship = n FROM core
                UNION ALL SELECT 'qty_min_ge_1', qmin_c, qmin_c >= 100 FROM core
                UNION ALL SELECT 'qty_max_le_30', qmax_c, qmax_c <= 3000 FROM core
                UNION ALL SELECT 'discount_in_0_10pct',
                       CASE WHEN dmin_bp < 0 THEN dmin_bp ELSE dmax_bp END,
                       dmin_bp >= 0 AND dmax_bp <= 1000 FROM core
                UNION ALL SELECT 'returnflag_domain', bad_flag, bad_flag = 0
                       FROM core
                UNION ALL SELECT 'orders_referential', n_orphan, n_orphan = 0
                       FROM orph)""")),

    // ── q40: MULTI-TOUCH revenue attribution — the marketing-
    // analytics allocator (linear model): each purchase's value, in
    // integer cents, splits EQUALLY across the user's clicks in the
    // prior 6 hours, exactly — cents div n to every credit, the
    // remainder cents mod n distributed one cent each to the MOST
    // RECENT clicks (rank by recency, tie on event_id), so the
    // allocation sums to the purchase total to the cent, always —
    // the invariant an accounting pipeline is audited on, and why
    // float shares are not an option. Scale shape: the touch join is
    // a user-keyed equi-join with the 6 h lag as a residual predicate
    // (fan-out bounded by a user's clicks-per-window), the recency
    // rank is a purchase-partitioned window (state = one purchase's
    // touches), and the final click-keyed partial agg folds credits
    // across purchases. Unattributed purchases (no prior click) are
    // excluded by the inner join — q33's funnel counts those. ──
    "q40_attribution" -> Q(
      (s, d) => {
        val e = events(s, d).persistScoped()
        attributionCredits(
          e.where("event_type = 'purchase'"),
          e.where("event_type = 'click'"))
      },
      Some("""WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
                                event_type, value FROM events),
              p AS (SELECT event_id AS pid, user_id, epoch_us(ts) AS pus,
                           CAST(floor(value * 100) AS BIGINT) AS cents
                    FROM e WHERE event_type = 'purchase'),
              c AS (SELECT event_id AS cid, user_id AS cuid, epoch_us(ts) AS cus
                    FROM e WHERE event_type = 'click'),
              j AS (SELECT pid, user_id, cents, cid, cus,
                           count(*) OVER (PARTITION BY pid) AS n,
                           row_number() OVER (PARTITION BY pid
                             ORDER BY cus DESC, cid DESC) AS rn
                    FROM p JOIN c ON cuid = user_id
                                 AND cus <= pus
                                 AND cus > pus - 21600000000)
              SELECT cid, user_id, count(*) AS n_credits,
                     CAST(sum(cents // n + CASE WHEN rn <= abs(cents % n)
                                                THEN (CASE WHEN cents < 0
                                                      THEN -1 ELSE 1 END)
                                                ELSE 0 END) AS BIGINT)
                       AS attributed_cents
              FROM j GROUP BY cid, user_id""")),

    // ── q41: SPATIAL distance self-join via grid bucketing — the
    // distributed spatial-join shape (GeoSpark/Sedona's core plan,
    // j05's interval trick in 2D): find all point pairs within
    // distance 2.0° without the O(n²) cross join. Deterministic
    // integer point set (coordinates in TENTHS of a degree, spread by
    // multiplicative hashing so the predicate is exact integer
    // arithmetic — dist² ≤ 400 tenths²); each point lands in its
    // 2°×2° grid cell (cell width = radius, the 3×3 correctness
    // precondition), ONE side explodes to its 3×3 cell
    // neighborhood (bounded ×9, the q26/q37 expansion), the join is
    // a plain (cx, cy) equi-join — shuffle-partitioned, AQE-
    // splittable where a city-dense cell skews — and the exact
    // predicate verifies survivors. Nothing is ever compared outside
    // a 3×3 neighborhood, which is the entire scale argument; a
    // hub cell gets the d07/g03 cap treatment in production. ──
    "q41_spatial_grid_join" -> Q(
      (s, d) => {
        // Constant-density grid (sf10 sweep catch): the original fixed
        // 600×300 hash space made pair density — and the pair-list
        // OUTPUT — quadratic in sf (89 M rows at sf1, ~8.9 B and a
        // >60 GB shuffle crash at sf10). The space now scales with the
        // corpus so cell population and per-point neighborhoods stay at
        // the gate fixture's density (~11 neighbors/pt, output ∝ n) at
        // every decade — which is also how a real spatial pipeline
        // picks its grid: from data density, not a constant. k is an
        // exact integer in both engines (ceil of a float sqrt; the
        // oracle computes the identical expression), and at sf0.01
        // k = 1 reproduces the historical gate results bit-for-bit.
        // The one count() is a bounded driver scalar of the
        // centroids/offsets class.
        val n = Tables(s, d, "customer").count()
        val k = math.max(1L, math.ceil(math.sqrt(n / 1500.0)).toLong)
        val pts = Tables(s, d, "customer")
          .selectExpr("c_custkey as id",
            s"(c_custkey * 2654435761L) % ${600 * k} as x10",
            s"(c_custkey * 40503L) % ${300 * k} as y10")
          .persistScoped()
        val probe = pts.selectExpr("id", "x10", "y10",
          "x10 div 20 as cx", "y10 div 20 as cy")
        val build = pts
          .selectExpr("id", "x10", "y10",
            "explode(sequence(x10 div 20 - 1, x10 div 20 + 1)) as cx",
            "y10 div 20 as cy0")
          .selectExpr("id", "x10", "y10", "cx",
            "explode(sequence(cy0 - 1, cy0 + 1)) as cy")
        probe.as("a").join(build.as("b"),
            col("a.cx") === col("b.cx") && col("a.cy") === col("b.cy")
              && col("a.id") < col("b.id"))
          .selectExpr("a.id as id_a", "b.id as id_b",
            "(a.x10 - b.x10) * (a.x10 - b.x10)" +
              " + (a.y10 - b.y10) * (a.y10 - b.y10) as d2")
          .where("d2 <= 400")
      },
      Some("""WITH kk AS (SELECT greatest(1, CAST(ceil(sqrt(count(*) / 1500.0)) AS BIGINT)) AS k
                          FROM customer),
              pts AS (SELECT c_custkey AS id,
                             (c_custkey * 2654435761) % (600 * k) AS x10,
                             (c_custkey * 40503) % (300 * k) AS y10
                      FROM customer, kk),
              probe AS (SELECT id, x10, y10,
                               x10 // 20 AS cx, y10 // 20 AS cy FROM pts),
              build AS (SELECT id, x10, y10, cx, cy FROM
                          (SELECT id, x10, y10,
                                  unnest(generate_series(x10 // 20 - 1,
                                                         x10 // 20 + 1)) AS cx,
                                  y10 // 20 AS cy0
                           FROM pts),
                          LATERAL (SELECT unnest(generate_series(cy0 - 1,
                                                                 cy0 + 1)) AS cy))
              SELECT a.id AS id_a, b.id AS id_b,
                     CAST((a.x10 - b.x10) * (a.x10 - b.x10)
                          + (a.y10 - b.y10) * (a.y10 - b.y10) AS BIGINT) AS d2
              FROM probe a JOIN build b
                ON a.cx = b.cx AND a.cy = b.cy AND a.id < b.id
              WHERE (a.x10 - b.x10) * (a.x10 - b.x10)
                    + (a.y10 - b.y10) * (a.y10 - b.y10) <= 400""")),

    // ── q42: GAPS-AND-ISLANDS sessionization of a purchase history —
    // the classic "merge consecutive activity into bursts" operator
    // (subscription churn, buying sprees, machine up-intervals):
    // per customer, orders ≤ 30 days apart coalesce into one island;
    // each island reports its order count, span, and spend. Scale
    // shape: ONE customer-keyed sort-window computes the break flags
    // and the running island id (state = one previous date per
    // customer, the q30/q36 class), and the island rollup is a keyed
    // partial agg on (custkey, island) — a strict refinement of the
    // window's partitioning, so AQE coalesces the second exchange's
    // already-clustered input; nothing is ever driver-side. Spend is
    // integer cents and the island id an integer running sum, so both
    // engines agree bit-for-bit; ties (same-day orders) break on
    // o_orderkey in the window order, and a 0-day gap never splits. ──
    "q42_gaps_islands" -> Q(
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy("o_orderdate", "o_orderkey")
        Tables(s, d, "orders")
          .selectExpr("o_custkey", "o_orderkey",
            "cast(o_orderdate as date) as o_orderdate",
            "cast(round(o_totalprice * 100) as bigint) as price_c")
          .withColumn("gap",
            datediff(col("o_orderdate"), lag("o_orderdate", 1).over(w)))
          .withColumn("brk",
            when(col("gap").isNull || col("gap") > 30, 1L).otherwise(0L))
          .withColumn("island",
            sum("brk").over(w.rowsBetween(Long.MinValue, 0)))
          .groupBy("o_custkey", "island")
          .agg(count(lit(1)).as("n_orders"),
            min("o_orderdate").as("first_day"),
            max("o_orderdate").as("last_day"),
            sum("price_c").as("sum_price_c"))
          .selectExpr("o_custkey", "island", "n_orders",
            "first_day", "last_day",
            "cast(datediff(last_day, first_day) as bigint) as span_days",
            "sum_price_c")
      },
      Some("""WITH o AS (SELECT o_custkey, o_orderkey,
                                CAST(o_orderdate AS DATE) AS d,
                                CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
                         FROM orders),
              f AS (SELECT *, CASE WHEN lag(d) OVER w IS NULL
                                     OR datediff('day', lag(d) OVER w, d) > 30
                                   THEN 1 ELSE 0 END AS brk
                    FROM o WINDOW w AS (PARTITION BY o_custkey
                                        ORDER BY d, o_orderkey)),
              i AS (SELECT *, sum(brk) OVER (
                      PARTITION BY o_custkey ORDER BY d, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
                    FROM f)
              SELECT o_custkey, CAST(island AS BIGINT) AS island,
                     count(*) AS n_orders,
                     min(d) AS first_day, max(d) AS last_day,
                     CAST(datediff('day', min(d), max(d)) AS BIGINT) AS span_days,
                     CAST(sum(price_c) AS BIGINT) AS sum_price_c
              FROM i GROUP BY 1, 2""")),

    // ── q43: SEMI-STRUCTURED schema-on-read — the events table's
    // `props` column is a JSON string (the telemetry / API-payload
    // shape); extract the typed field at QUERY time with from_json
    // and aggregate on it. The extraction is a map-side native
    // expression ahead of one keyed partial agg — the JSON never
    // crosses an exchange, only the extracted int does, and a
    // malformed document degrades to NULL (counted separately)
    // instead of failing the job — the property a 100 TB crawl
    // ingest needs. Oracle: DuckDB's json_extract_string, CAST
    // pinned to INTEGER in both engines. ──
    "q43_json_extract" -> Q(
      (s, d) => Tables(s, d, "events")
        .selectExpr("event_type",
          "cast(from_json(props, 'k INT').k as int) as k")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          count("k").as("n_parsed"),
          sum("k").as("sum_k"),
          min("k").as("min_k"), max("k").as("max_k"),
          sum(when(col("k") >= 50, 1L).otherwise(0L)).as("n_ge50"))
        .selectExpr("event_type", "n", "n_parsed",
          "cast(sum_k as bigint) as sum_k",
          "cast(min_k as bigint) as min_k", "cast(max_k as bigint) as max_k",
          "n_ge50"),
      Some("""WITH e AS (SELECT event_type,
                                CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
                         FROM events)
              SELECT event_type, count(*) AS n, count(k) AS n_parsed,
                     CAST(sum(k) AS BIGINT) AS sum_k,
                     CAST(min(k) AS BIGINT) AS min_k,
                     CAST(max(k) AS BIGINT) AS max_k,
                     CAST(sum(CASE WHEN k >= 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_ge50
              FROM e GROUP BY 1"""))
  )
}
