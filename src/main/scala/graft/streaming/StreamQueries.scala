package graft.streaming

import graft.Q
import graft.CacheScope.PersistScopedOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.countDistinct
import org.apache.spark.sql.streaming.Trigger

/** Streaming tier in the correctness gate: each entry runs a bounded
  * Structured Streaming query (`availableNow` over the static events
  * directory, memory sink) and is checked against the SAME DuckDB
  * oracle as its batch twin — the batch-parity promise enforced by the
  * driver, not just ScalaTest.
  *
  * Complete output mode: the gate compares full results, so windows
  * the watermark has not closed when the bounded stream drains must
  * still be emitted. Production incremental jobs use append mode and
  * emit on watermark close; the aggregation plan is identical.
  */
object StreamQueries {

  /** Run a bounded stream to a memory sink and return the table. The
    * sink table is driver-local — fine for gate-sized results; the
    * production path writes the same stream to a parquet/kafka sink. */
  private def drain(s: SparkSession, df: DataFrame, name: String,
      mode: String = "complete"): DataFrame = {
    val q = df.writeStream
      .format("memory").queryName(name).outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
    // a partially-drained table must fail loudly, not hash-mismatch
    // confusingly downstream; stop the straggler before throwing
    if (!q.awaitTermination(300000)) {
      q.stop()
      throw new IllegalStateException(s"stream $name did not drain within 300s")
    }
    s.table(name)
  }

  /** Executor-staged ORDERED arrival feed — the scale-correct
    * replacement for collect()-into-MemoryStream arrival simulation
    * (VERDICT r17 item 3): each batch frame is written as ONE parquet
    * file (a distributed write job — table data never crosses the
    * driver; the driver only renames part files), then the files are
    * moved into the watched dir ONE AT A TIME with
    * `processAllAvailable()` between moves, so each file is exactly
    * one micro-batch in order.
    *
    * The incremental moves are load-bearing, not a convenience:
    * Spark ≥3.4 filters LATE events with the PREVIOUS batch's
    * watermark (`watermarkForLateEvents`) while evicting with the
    * current one, and a pre-staged backlog drains data batch after
    * data batch with no no-data batch between — so the late filter
    * would lag one batch behind the oracle's "max event time over
    * batches < k" model (measured: stream13 kept all 10000 rows vs
    * the oracle's 9485). Arrival-per-drain interleaves the
    * watermark-advancing no-data batch after each file, which is
    * exactly the schedule `ms.addData + processAllAvailable` had —
    * and what a production kafka feed's trigger cadence gives.
    * The trailing `processAllAvailable` also runs the final no-data
    * batch, so no explicit empty batch is needed. */
  private def stagedArrivalTable(s: SparkSession, name: String,
      batches: Seq[DataFrame], build: DataFrame => DataFrame): DataFrame = {
    val hold = graft.RunScratch.freshDir(s"stream-stage/$name-hold")
    val dir = graft.RunScratch.freshDir(s"stream-stage/$name")
    val tmp = graft.RunScratch.path(s"stream-stage/$name-tmp")
    val schema = batches.head.schema
    val files = batches.zipWithIndex.map { case (b, k) =>
      b.repartition(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(f => f.getName.startsWith("part-") && !f.getName.endsWith(".crc"))
      require(part.length == 1, s"expected one part file, got ${part.length}")
      val dst = new java.io.File(hold, f"batch-$k%05d.parquet")
      require(part.head.renameTo(dst), s"rename ${part.head} -> $dst failed")
      dst
    }
    val src = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val q = build(src).writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try files.foreach { f =>
      // rename is atomic on one filesystem — the source sees either
      // nothing or the whole file
      require(f.renameTo(new java.io.File(dir, f.getName)), s"arrival move $f")
      q.processAllAvailable()
    } finally q.stop()
    s.table(name)
  }

  // oracle SQL mirrors q15/q16 exactly (same shape, same Det-summed
  // val_sum) — one semantics, two execution tiers
  def all: Map[String, Q] = Map(
    "stream01_tumbling" -> Q(
      (s, d) => drain(s,
        EventStreams.tumblingCounts(EventStreams.eventsStream(s, d)), "g_stream01"),
      Some(s"""SELECT CAST(epoch(time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP))) AS BIGINT) AS win_start,
                      event_type, count(*) AS n, ${graft.Det.sqlSum("value")} AS val_sum
               FROM events GROUP BY 1, 2""")),

    // append mode: dropDuplicatesWithinWatermark emits each id's
    // first arrival; project the key only, so the gate compares the
    // deduped ID SET (which payload row survives is
    // arrival-order-dependent, the id set is not)
    "stream03_dedup" -> Q(
      (s, d) => drain(s,
        EventStreams.dedupStream(EventStreams.eventsStream(s, d)).select("event_id"),
        "g_stream03", mode = "append"),
      Some("SELECT DISTINCT event_id FROM events")),

    // stream-stream inner join (append): watermarked both sides +
    // event-time range predicate = bounded state; inner matches emit
    // immediately, so the bounded run equals the batch join
    "stream04_stream_join" -> Q(
      (s, d) => drain(s,
        EventStreams.clickAttribution(EventStreams.eventsStream(s, d)),
        "g_stream04", mode = "append"),
      Some("""WITH e AS (SELECT event_id, user_id, event_type,
                                CAST(ts AS TIMESTAMP) AS ts FROM events)
              SELECT a.event_id AS click_id, b.event_id AS purchase_id, a.user_id
              FROM e a JOIN e b ON a.user_id = b.user_id
              WHERE a.event_type = 'click' AND b.event_type = 'purchase'
                AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE""")),

    // stream-static enrichment (append): stateless broadcast left
    // join against the customer dimension, re-resolved per
    // micro-batch — equals the batch left join on any drain
    "stream05_enrich" -> Q(
      (s, d) => drain(s,
        EventStreams.enrichedStream(
          EventStreams.eventsStream(s, d),
          graft.Tables(s, d, "customer").select("c_custkey", "c_name", "c_acctbal")),
        "g_stream05", mode = "append"),
      Some("""SELECT e.event_id, e.user_id, e.event_type, c.c_name, c.c_acctbal
              FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey""")),

    // streaming decontamination (complete): arriving docs explode
    // their 13-grams map-only and probe the broadcast eval-gram set;
    // only contaminated docs hold state. Same gram universe and eval
    // split as c02 — one semantics, two tiers.
    "stream06_decontaminate" -> Q(
      (s, d) => {
        graft.functions.Hashing.register(s)
        val evalGrams = graft.queries.PipelineKernels
          .decontGrams(graft.Tables(s, d, "documents"))
          .where("is_eval").select("g").distinct()
        drain(s,
          EventStreams.decontaminationStream(
            graft.queries.PipelineKernels.decontGrams(EventStreams.docsStream(s, d)),
            evalGrams),
          "g_stream06")
      },
      Some(s"""WITH toks AS (SELECT doc_id,
                      (${graft.functions.Hashing.duck32("'split:' || ('eval:' || doc_id)")} % 100 < 10) AS is_eval,
                      string_split(text, ' ') AS t FROM documents),
               grams AS (SELECT doc_id, is_eval, array_to_string(t[i:i+12], ' ') AS g
                         FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 12)) AS i)
                         WHERE len(t) >= 13),
               ev AS (SELECT DISTINCT g FROM grams WHERE is_eval)
               SELECT doc_id, count(*) AS n_hits FROM grams
               WHERE NOT is_eval AND g IN (SELECT g FROM ev)
               GROUP BY doc_id""")),

    // hopping windows (complete): q26's overlapping 1h/30m windows as
    // an incremental stream — same oracle as the batch twin
    "stream07_hopping" -> Q(
      (s, d) => drain(s,
        EventStreams.hoppingCounts(EventStreams.eventsStream(s, d)), "g_stream07"),
      Some(s"""WITH e AS (SELECT event_type, value,
                      time_bucket(INTERVAL 30 MINUTE, CAST(ts AS TIMESTAMP)) AS b FROM events),
               w AS (SELECT event_type, value, unnest([b, b - INTERVAL 30 MINUTE]) AS w_start FROM e)
               SELECT CAST(epoch(w_start) AS BIGINT) AS win_start,
                      event_type, count(*) AS n, ${graft.Det.sqlSum("value")} AS val_sum
               FROM w GROUP BY 1, 2""")),

    // streaming quality gate (append): t14's Gopher rules evaluated
    // map-only on arriving docs — stateless, the native text_features
    // kernel runs inside the streaming plan unchanged. Same oracle as
    // the batch twin: one semantics, two tiers.
    "stream08_quality_gate" -> Q(
      (s, d) => {
        graft.functions.Hashing.register(s)
        drain(s,
          graft.queries.TextOpsKernels.gopherVerdict(EventStreams.docsStream(s, d)),
          "g_stream08", mode = "append")
      },
      graft.queries.TextOps.all("t14_gopher_filter").oracle),

    // streaming PQ index ingestion (append): arriving vectors encode
    // map-only against the literal codebook TRAINED offline on the
    // batch corpus ([[graft.queries.SimilarityKernels.trainedPqCodebook]],
    // the s13 trainer — one semantics, two tiers); stateless, 8 code
    // bytes per vector leave the stream. Codes cross the gate as a
    // comma string (driver fingerprint cannot hash array cells).
    "stream09_pq_encode" -> Q(
      (s, d) => {
        graft.functions.Hashing.register(s)
        val cb = graft.queries.SimilarityKernels.trainedPqCodebook(
          graft.Tables(s, d, "embeddings").select("vec_id", "embedding"))
        drain(s,
          graft.queries.SimilarityKernels.pqEncode(EventStreams.embeddingsStream(s, d), cb)
            .selectExpr("vec_id",
              "array_join(transform(codes, x -> cast(x as string)), ',') as codes"),
          "g_stream09", mode = "append")
      },
      Some {
        val duckDotL = (a: String, b: String) =>
          s"list_sum(list_transform(list_zip($a, $b), p -> CAST(p[1] AS DOUBLE) * p[2]))"
        val dd2 = (a: String, b: String) =>
          s"(${duckDotL(a, a)} - 2 * ${duckDotL(a, b)} + ${duckDotL(b, b)})"
        s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
            sub AS (SELECT vec_id, s, embedding[s*8+1:s*8+8] AS sv
                    FROM e, LATERAL (SELECT unnest(generate_series(0, 7)) AS s) g),
            ${graft.queries.SimilarityKernels.duckTrainedCbSql},
            codes AS (SELECT vec_id, s, j AS code FROM (
                        SELECT sub.vec_id, sub.s, cb.j,
                               row_number() OVER (PARTITION BY sub.vec_id, sub.s
                                 ORDER BY ${dd2("sub.sv", "cb.cv")}, cb.j) AS rn
                        FROM sub JOIN cbl cb ON cb.s = sub.s) WHERE rn = 1)
            SELECT vec_id, array_to_string(list(code ORDER BY s), ',') AS codes
            FROM codes GROUP BY vec_id"""
      }),

    // streaming ANN SEARCH (complete): arriving query vectors answered
    // against the STATIC trained IVFADC index — the serving-side
    // complement of stream09's ingestion. Pinned EXPLICITLY to the
    // ADC stage (oracle = duckIvfAdcSql): s13's IVFADC+R exact
    // re-rank is a second aggregation over the shortlist, and two
    // chained aggregations in one streaming query are unsupported —
    // a production deployment re-ranks in the request path against
    // the refine sidecar (ivfPqServe's batch shape).
    // Everything probe-side is stateless and MAP-ONLY
    // on the stream: cell scoring against the literal centroids, the
    // top-nprobe cell pick (an in-projection array sort — a rank
    // window would be unsupported here, which is why
    // pqProbeTablesRes avoids one), and the per-(probe, cell)
    // residual ADC tables. The stream-static equi-join on cell prunes
    // the candidate scan to the probed cells' postings (8-byte
    // residual codes, never raw vectors) per micro-batch; the
    // per-probe top-3 is the bounded-heap aggregate, whose partial
    // buffers are what the state store carries — k rows per probe,
    // not the score frame.
    "stream10_ann_search" -> Q(
      (s, d) => {
        import org.apache.spark.sql.functions.col
        graft.functions.Hashing.register(s)
        val Sim = graft.queries.SimilarityKernels
        val batch = graft.Tables(s, d, "embeddings")
          .selectExpr("vec_id", "embedding", "vnorm(embedding) as nrm")
        val cents = Sim.lloydCents(batch, Sim.ivfSeeds(batch), graft.queries.SimilarityKernels.ivfIters)
        val rf = Sim.residualFrame(batch, cents)
        val cb = Sim.pqCodebookTrained(rf, graft.queries.SimilarityKernels.pqIters)
        val codes = Sim.pqEncode(rf, cb, keep = Seq("cell"))
          .select(col("vec_id").as("cand_id"), col("cell"), col("codes"))
        val probes = Sim.pqProbeTablesRes(
          EventStreams.embeddingsStream(s, d).where("vec_id < 10")
            .selectExpr("vec_id", "embedding", "vnorm(embedding) as nrm"),
          cents, cb, 2)
        drain(s,
          Sim.adcTopk(
            probes.join(codes, "cell")
              .where(org.apache.spark.sql.functions.expr("cand_id != probe_id")), 3),
          "g_stream10", mode = "complete")
      },
      // the streaming serve must reproduce the batch ADC stage's answer
      Some(graft.queries.SimilarityKernels.duckIvfAdcSql)),

    // incremental shard dedup against the MAINTAINED bloom index —
    // d14's streaming twin (same oracle: `seen` is corpus-membership,
    // batch-boundary-independent). BUILD writes the fps parquet +
    // mergeable bloom artifacts once; each arriving micro-batch
    // probes the bloom map-side, exact-verifies survivors, and folds
    // its novel fingerprints back into the index (parquet append +
    // bloom OR-merge, atomic swap) — the CDC-ingest dedup loop a
    // training pipeline runs continuously.
    "stream12_shard_dedup" -> Q(
      (s, d) => {
        graft.functions.Hashing.register(s)
        val Dd = graft.queries.Dedup
        graft.queries.DedupKernels.shardIndexBuild(s, graft.queries.DedupKernels.corpusFps(graft.Tables(s, d, "documents")))
        graft.queries.DedupKernels.shardDedupStream(s, EventStreams.docsStream(s, d))
      },
      Some(graft.queries.DedupKernels.d14Oracle)),

    // ── APPEND-mode watermark semantics, pinned exactly: late-data
    // DROP and watermark-close emission — the part of Structured
    // Streaming every other stream* entry sidesteps by running
    // complete mode or stateless append. A tumbling 1h count runs
    // over a deterministic 4-batch arrival schedule (time-terciles
    // with a hashed 5% of rows DELAYED one batch — the out-of-order
    // arrivals real ingest has), watermark 10 minutes. Spark's
    // contract, replayed by the oracle CTE-for-CTE: the watermark in
    // force during batch k is max(event-time ms over batches < k) −
    // delay (a running max, ratcheting only); an arriving row is
    // DROPPED iff its window END ≤ that watermark (its state is
    // already evicted — rows merely older than the watermark whose
    // window is still open DO count); a window EMITS once the
    // watermark passes its end. A far-future sentinel row in the
    // final batch pushes the closing watermark past every real
    // window (its own window stays open and never emits), so
    // emitted = exactly the windows built from non-dropped rows.
    // Arrival order is SIMULATED by the executor-staged file feed
    // ([[stagedBatchStream]]): each batch is a distributed write —
    // table data never crosses the driver (the old formulation
    // collect()ed the full events table into a MemoryStream, an
    // O(table) driver stage that capped the gate at toy scale; the
    // only collect left is the 1-row extents agg for the sentinel
    // timestamp). Production is the same plan over a kafka source,
    // where state per key is one (count, decimal-sum) pair and
    // eviction keeps the store at O(open windows), not O(history).
    // StreamingSpec pins the boundary behavior (exact window-end
    // tie) and batch-boundary dependence explicitly. ──
    "stream13_watermark" -> Q(
      (s, d) => {
        import org.apache.spark.sql.functions._
        graft.functions.Hashing.register(s)
        graft.CacheScope.scoped {
          val ev = graft.queries.Relational.events(s, d)
            .selectExpr("event_id", "ts", "value")
          val ext = ev.agg(min(unix_micros(col("ts"))).as("t0"),
            max(unix_micros(col("ts"))).as("t1"))
          val staged = ev.crossJoin(broadcast(ext))
            .selectExpr("event_id", "ts", "value",
              s"""least(2, (3 * (unix_micros(ts) - t0)) div (t1 - t0 + 1))
                  + (case when ${graft.functions.Hashing.h32Sql("concat('late:', event_id)")} % 20 = 0
                     then 1 else 0 end) as batch""")
            .persistScoped()
          val t1 = ext.collect()(0).getAs[Long]("t1") // 1 row
          val batches = (0 to 3).map(k =>
            staged.where(s"batch = $k").drop("batch"))
          // sentinel: event-time 10h past the corpus max — closes every
          // real window, its own window never closes (never emitted)
          import s.implicits._
          val sentinel = Seq((-1L, new java.sql.Timestamp((t1 + 36000000000L) / 1000), 0.0))
            .toDF("event_id", "ts", "value")
          stagedArrivalTable(s, "g_stream13", batches :+ sentinel, src => src
            .withWatermark("ts", "10 minutes")
            .groupBy(window(col("ts"), "1 hour"))
            .agg(count(lit(1)).as("n"), graft.Det.dsum(col("value")).as("val_sum"))
            .selectExpr("unix_seconds(window.start) as win_start", "n", "val_sum"))
        }
      },
      Some {
        val h = graft.functions.Hashing.duck32("'late:' || event_id")
        s"""WITH e AS (SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tu, value FROM events),
            ext AS (SELECT min(tu) AS t0, max(tu) AS t1 FROM e),
            b AS (SELECT e.*, LEAST(2, (3 * (tu - t0)) // (t1 - t0 + 1))
                         + (CASE WHEN ($h) % 20 = 0 THEN 1 ELSE 0 END) AS batch
                  FROM e CROSS JOIN ext),
            mx AS (SELECT batch, max(tu) AS mt FROM b GROUP BY batch),
            wm AS (SELECT batch, (max(mt) OVER (ORDER BY batch
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) // 1000 - 600000) * 1000 AS wm_us
                   FROM mx),
            keep AS (SELECT b.tu, b.value FROM b JOIN wm ON wm.batch = b.batch
                     WHERE wm.wm_us IS NULL
                        OR ((b.tu // 3600000000) + 1) * 3600000000 > wm.wm_us)
            SELECT (tu // 3600000000) * 3600 AS win_start, count(*) AS n,
                   ${graft.Det.sqlSum("value")} AS val_sum
            FROM keep GROUP BY 1"""
      }),

    // ── the custom-state sessionizer AS A GATE QUERY: the
    // flatMapGroupsWithState path (per-session custom accumulators,
    // emit-on-close — what session_window can't express) answered
    // against the same sessionization SQL as q16/stream02. Determinism
    // is engineered at the seams the operator itself leaves open:
    //   - values fold as WHOLE-NUMBER basis points (floor(v·10⁴), an
    //     exact double product both engines floor identically), so the
    //     double sum is order-independent at any arrival order;
    //   - timestamps truncate to ms BEFORE the feed (the operator
    //     compares Timestamp.getTime ms; the oracle sessions over
    //     epoch_ms), so no µs-vs-ms gap-boundary divergence;
    //   - a per-user far-future sentinel batch closes every real
    //     session through the NORMAL emit-on-close path (an interval
    //     with a later interval behind it emits; the sentinel's own
    //     session stays open and is never emitted) — no reliance on
    //     timeout/no-data-batch timing.
    // State per user is ONE in-flight interval; emission is
    // output-proportional. ──
    "stream14_custom_session" -> Q(
      (s, d) => {
        import org.apache.spark.sql.functions._
        import s.implicits._
        graft.CacheScope.scoped {
          // executor-staged feed (see stream13): the real batch and the
          // per-user sentinel batch are distributed writes — no O(table)
          // collect; only the 1-row tmax agg reaches the driver
          val ev = graft.queries.Relational.events(s, d)
            // ms-truncate and bp-floor BEFORE the feed (determinism
            // seams documented above), then back to the operator's
            // (user_id, ts, value) shape
            .selectExpr("user_id", "unix_millis(ts) as tms",
              "cast(floor(value * 10000) as bigint) as vbp")
            .persistScoped()
          val tmax = ev.agg(max("tms")).collect()(0).getLong(0) // 1 row
          val real = ev.selectExpr("user_id",
            "timestamp_millis(tms) as ts", "cast(vbp as double) as value")
          val sentinels = ev.select("user_id").distinct()
            .selectExpr("user_id", s"timestamp_millis(${tmax + 36000000L}) as ts",
              "cast(0.0 as double) as value")
          stagedArrivalTable(s, "g_stream14", Seq(real, sentinels),
            src => EventStreams.sessionizeCustom(
              src.as[EventStreams.Event], gapMs = 1800000L).toDF())
            .selectExpr("user_id", "session_start_ms", "n",
              "cast(val_sum as bigint) as val_bp")
        }
      },
      Some("""WITH e AS (SELECT user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS tms,
                                CAST(floor(value * 10000) AS BIGINT) AS vbp
                         FROM events),
              marks AS (SELECT user_id, tms, vbp,
                               CASE WHEN lag(tms) OVER w IS NULL
                                         OR tms - lag(tms) OVER w >= 1800000
                                    THEN 1 ELSE 0 END AS new_s
                        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tms)),
              sess AS (SELECT user_id, tms, vbp,
                              sum(new_s) OVER (PARTITION BY user_id ORDER BY tms) AS sid
                       FROM marks)
              SELECT user_id, min(tms) AS session_start_ms, count(*) AS n,
                     CAST(sum(vbp) AS BIGINT) AS val_bp
              FROM sess GROUP BY user_id, sid""")),

    // ── watermarked LEFT OUTER stream-stream join: conversion
    // tracking that keeps the unconverted clicks. Inner matches emit
    // eagerly; an unmatched click emits its (click, NULL) row only
    // when the watermark proves no in-window purchase can still
    // arrive — null emission rides state EXPIRY, the append-mode
    // machinery stream04's inner join never exercises. Determinism by
    // schedule: ALL real events arrive in one batch (so no real match
    // is ever lost to cross-batch eviction and the answer must equal
    // the batch left join exactly — one oracle, two tiers), then one
    // far-future sentinel per side (distinct users, so they cannot
    // match each other) ratchets both watermarks past every real
    // click's window, and the closing empty batch runs the expiry
    // that emits the null rows. The sentinels themselves stay in
    // live state — the oracle contains no sentinel row, so any leak
    // is a hash mismatch, not a silent pass. ──
    "stream15_outer_join" -> Q(
      (s, d) => {
        import org.apache.spark.sql.functions._
        import s.implicits._
        graft.CacheScope.scoped {
          // executor-staged feed (see stream13): the one real batch is
          // a distributed write; only the 1-row tmax agg and the two
          // literal sentinel rows touch the driver
          val ev = graft.queries.Relational.events(s, d)
            .where("event_type in ('click', 'purchase')")
            .selectExpr("event_id", "user_id", "event_type", "ts")
            .persistScoped()
          val tmax = ev.agg(max(unix_millis(col("ts"))))
            .collect()(0).getLong(0) // 1 row
          val far = new java.sql.Timestamp(tmax + 36000000L)
          val sentinels = Seq((-1L, -101L, "click", far), (-2L, -102L, "purchase", far))
            .toDF("event_id", "user_id", "event_type", "ts")
          stagedArrivalTable(s, "g_stream15", Seq(ev, sentinels),
            src => EventStreams.clickAttributionOuter(src))
        }
      },
      Some("""WITH e AS (SELECT event_id, user_id, event_type,
                                CAST(ts AS TIMESTAMP) AS ts FROM events)
              SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id
              FROM (SELECT * FROM e WHERE event_type = 'click') c
              LEFT JOIN (SELECT * FROM e WHERE event_type = 'purchase') p
                ON p.user_id = c.user_id
               AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE""")),

    // complete mode: the gate reads the full snapshot; a production
    // deployment runs the same plan in update mode and upserts the
    // changed keys into the serving store per micro-batch
    "stream11_latest_per_key" -> Q(
      (s, d) => drain(s,
        EventStreams.latestPerUser(EventStreams.eventsStream(s, d)), "g_stream11"),
      Some("""SELECT user_id, event_id AS last_event_id,
                     epoch_ms(CAST(ts AS TIMESTAMP))::BIGINT AS last_ts_ms,
                     event_type AS last_type
              FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                      ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
                    FROM events)
              WHERE rn = 1""")),

    "stream02_session" -> Q(
      (s, d) => drain(s,
        EventStreams.sessionCounts(EventStreams.eventsStream(s, d)), "g_stream02"),
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
                 FROM marks
               )
               SELECT user_id, epoch_ms(min(ts))::BIGINT AS session_start_ms,
                      count(*) AS n, ${graft.Det.sqlSum("value")} AS val_sum
               FROM sess GROUP BY user_id, sid""")),

    // ── stream16: streaming HLL profile maintenance — d19's sketch
    // as a MAINTAINED artifact: each arriving micro-batch's registers
    // fold into the persisted (source, bucket, m_rho) state by
    // elementwise max (registers of a union = max of registers, the
    // merge≡rebuild algebra), and the final profile is answered FROM
    // THE ARTIFACT, pinned to d19's oracle verbatim — streaming
    // arrival loses nothing. Per-batch cost and state are bounded by
    // |sources|×1024 register rows at any corpus size. The exact
    // side is computed post-drain from the (now static) table — gate
    // error evidence, not maintained state. StreamingSpec proves
    // multi-batch arrival-order invariance via a 3-file chop. ──
    "stream16_hll_profile" -> Q(
      (s, d) => {
        graft.functions.Hashing.register(s)
        val Dd = graft.queries.Dedup
        val reg = graft.queries.DedupKernels.hllStream(s, EventStreams.docsStream(s, d))
        val exact = graft.queries.DedupKernels.hllItems(graft.Tables(s, d, "documents"))
          .groupBy("source")
          .agg(countDistinct("h").as("exact_distinct"))
        graft.queries.DedupKernels.hllFinish(reg, exact)
      },
      Some(graft.queries.DedupKernels.d19Oracle)),

    // ── stream17: streaming Count-Min maintenance — t23's sketch as
    // a MAINTAINED artifact: each micro-batch's 4×1024 counters fold
    // into the persisted (r, cell, cnt) state by counter-wise ADD
    // (counts of a disjoint union = sum of counts — stream16's
    // merge≡rebuild algebra with + in place of max), and the heavy-
    // hitter profile is answered FROM THE ARTIFACT, pinned to t23's
    // oracle verbatim. Per-batch cost and state are counter-bounded
    // (≤4096 rows) at any corpus size; the exact/φ side is computed
    // post-drain from the static table — gate evidence, not
    // maintained state. StreamingSpec proves batch-boundary
    // invariance via the 3-chop fold. ──
    "stream17_cms_profile" -> Q(
      (s, d) => {
        graft.functions.Hashing.register(s)
        val T = graft.queries.TextOpsKernels
        val counters = T.cmsStream(s, EventStreams.docsStream(s, d))
        T.cmsFinish(counters,
          T.cmsItems(graft.Tables(s, d, "documents")).persistScoped())
      },
      Some(graft.queries.TextOpsKernels.t23Oracle)),

    // ── stream18: EXACTLY-ONCE streaming ingest into the manifest
    // table — the bridge between the streaming tier and the sink12
    // snapshot contract (what Delta's transaction log does for
    // writeStream): each micro-batch appends its rows as new data
    // files and commits manifest v<batch+1> = the cumulative file
    // set, so every batch boundary becomes a READABLE SNAPSHOT with
    // time travel across the ingest history, and a re-delivered
    // batch re-commits the same version idempotently instead of
    // double-appending blind. The gate reads the LATEST version —
    // equal to the full input regardless of how the file source
    // chopped it — and StreamingSpec pins the per-version contract:
    // one snapshot per batch, manifests strictly grow, each version
    // stays exactly readable after later commits. Per-batch cost:
    // the batch's own write + one O(live files) manifest PUT —
    // nothing rescans the table. ──
    "stream18_manifest_ingest" -> Q(
      (s, d) => {
        val out = graft.sinks.SinkQueries.streamIngest(s, d)
        val latest = graft.sinks.Sinks.manifestVersions(s, out).max
        graft.sinks.Sinks.readAtVersion(s, out, latest)
          .select("o_orderkey", "o_custkey", "o_totalprice")
      },
      Some("SELECT o_orderkey, o_custkey, o_totalprice FROM orders")),

    // ── stream19: AUDITED streaming ingest — stream18's manifest
    // commit with sink16's write-audit-publish gate in the path:
    // every micro-batch stages, audits the staged snapshot, and
    // publishes only on pass, so a poisoned batch (one staged file
    // carries NULL custkeys) is REJECTED at the commit boundary and
    // no reader-visible snapshot ever contains it — the quality
    // gate a production streaming ingest runs between "the source
    // delivered bytes" and "the table advanced". The rejected
    // batch's version number is skipped (an honest hole, not a bad
    // snapshot) and later batches stage from the last GOOD head.
    // The gate reads the latest published version = input minus the
    // poisoned slice, content-deterministic regardless of file
    // arrival order; StreamingSpec pins one-rejection, no-null at
    // every published version, and orphans-exactly-the-poison. ──
    "stream19_audited_ingest" -> Q(
      (s, d) => {
        val out = graft.sinks.SinkQueries.auditedStreamIngest(s, d)
        val latest = graft.sinks.Sinks.manifestVersions(s, out).max
        graft.sinks.Sinks.readAtVersion(s, out, latest)
          .select("o_orderkey", "o_custkey", "o_totalprice")
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
              WHERE o_orderkey % 4 != 0""")),

    // ── stream20: streaming POINT-IN-TIME enrichment — the request-
    // path half of j07's feature-store join: each arriving event
    // attaches the dimension version IN FORCE AT ITS EVENT TIME
    // (stream05 enriches against a snapshot — correct only until the
    // dim changes; stream20 joins the SCD2-style validity intervals,
    // so late events get the version that was true THEN, not now).
    // The versioned dim is a deterministic weekly-tier table (one
    // row per user-week with [valid_from, valid_to)); the join is
    // stateless stream-static per micro-batch with the dim
    // broadcast: equi-join on the key, the interval containment as
    // the residual filter — versions partition time, so exactly one
    // version survives per event. At scale the dim is the broadcast-
    // able current SCD2 table (or a bucketed join when it outgrows
    // one); no stream-stream state is ever held. ──
    "stream20_pit_enrich" -> Q(
      (s, d) => {
        import org.apache.spark.sql.functions.{broadcast, col}
        val dim = graft.Tables(s, d, "events").select("user_id").distinct()
          .selectExpr("user_id as dk", "explode(sequence(0, 4)) as k")
          .selectExpr("dk",
            "cast(date_add(date'2024-01-01', k * 7) as timestamp) as valid_from",
            "cast(date_add(date'2024-01-01', (k + 1) * 7) as timestamp) as valid_to",
            "(dk * 7 + k * 13) % 5 as tier")
        drain(s,
          EventStreams.eventsStream(s, d)
            .join(broadcast(dim), col("user_id") === col("dk")
              && col("ts") >= col("valid_from") && col("ts") < col("valid_to"))
            .selectExpr("event_id", "user_id",
              "cast(unix_timestamp(valid_from) as bigint) as vf", "tier"),
          "g_stream20", mode = "append")
      },
      Some("""WITH u AS (SELECT DISTINCT user_id FROM events),
              dim AS (SELECT user_id, k,
                             (DATE '2024-01-01' + CAST(k * 7 AS INTEGER))::TIMESTAMP AS vf_ts,
                             (DATE '2024-01-01' + CAST((k + 1) * 7 AS INTEGER))::TIMESTAMP AS vt_ts,
                             (user_id * 7 + k * 13) % 5 AS tier
                      FROM u CROSS JOIN (SELECT unnest(generate_series(0, 4)) AS k))
              SELECT e.event_id, e.user_id,
                     CAST(epoch(vf_ts) AS BIGINT) AS vf,
                     CAST(tier AS BIGINT) AS tier
              FROM events e JOIN dim
                ON dim.user_id = e.user_id
               AND CAST(e.ts AS TIMESTAMP) >= vf_ts
               AND CAST(e.ts AS TIMESTAMP) < vt_ts""")),

    // ── stream21: streaming DRIFT monitor — p19's alarm maintained
    // over an arriving shard: each micro-batch's clamped length
    // histogram folds into the persisted (b, cnt) artifact by
    // counter-wise ADD (the d21 merge algebra in streaming form —
    // the stream16/17 template's fourth instance), and the drift
    // report is answered FROM the artifact against the FROZEN
    // baseline grid, pinned to p19's oracle verbatim: batch
    // boundaries cannot change the alarm. Per-batch cost and state
    // are ≤128 counter rows at any corpus size. ──
    "stream21_drift_monitor" -> Q(
      (s, d) => {
        import org.apache.spark.sql.functions.{count, lit, max, min}
        graft.functions.Hashing.register(s)
        val P = graft.queries.PipelineKernels
        val base = graft.Tables(s, d, "documents")
          .selectExpr("length(text) as n_chars")
        val r = base.agg(min("n_chars").as("lo"), max("n_chars").as("hi"),
          count(lit(1)).as("n")).head
        val (lo, nb) = (r.getInt(0).toLong, r.getLong(2))
        val w = (r.getInt(1).toLong - lo) / 128 + 1
        val shardH = P.histStream(s,
          graft.queries.DedupKernels.shardDocs(EventStreams.docsStream(s, d))
            .selectExpr("length(text) as n_chars"), lo, w)
        val ns = shardH.agg(org.apache.spark.sql.functions.sum("cnt")).head.getLong(0)
        P.driftFinish(P.lenHist(base, lo, w), shardH, nb, ns)
      },
      Some(graft.queries.PipelineKernels.driftOracle)),

    // ── stream22: streaming SAMPLE maintenance — p14's exact-100
    // bottom-k-hash sample as a MAINTAINED artifact: each arriving
    // micro-batch's bottom-100 folds into the persisted sample by
    // union + re-cut (bottom-k of a union = bottom-k of the merges —
    // the order-statistics twin of stream16's max and stream17's
    // add), and the sample is answered FROM the artifact, pinned to
    // p14's flat-rebuild oracle verbatim: at every moment of a
    // 100 TB/day ingest the artifact IS a uniform exact-k sample of
    // everything seen so far, at ≤100 rows of state. StreamingSpec
    // proves the 3-chop fold equals the one-shot batch sample. ──
    "stream22_sample_maintain" -> Q(
      (s, d) => graft.queries.PipelineKernels
        .sampleStream(s, EventStreams.docsStream(s, d))
        .select("doc_id", "lang", "source", "tag"),
      graft.queries.Pipeline.all("p14_bottomk_sample").oracle),

    // ── stream23: streaming ATTRIBUTION-LEDGER maintenance — q40's
    // per-click revenue ledger as a MAINTAINED artifact: purchases
    // ARRIVE (the conversion stream), clicks are the static touch
    // history, and each micro-batch's exact allocations fold into the
    // persisted (cid, user_id, n_credits, cents) ledger by
    // counter-wise ADD — each purchase is allocated exactly once and
    // ledger entries are sums over purchases, so batch boundaries
    // cannot change a cent (the stream16/17 fold algebra carrying an
    // ACCOUNTING invariant: the maintained ledger's total equals the
    // arrived purchases' cent total, always). Answered FROM the
    // artifact against q40's batch oracle verbatim. Per-batch cost is
    // the batch's own touch join; state is one row per credited
    // click. ──
    "stream23_attribution_ledger" -> Q(
      (s, d) => {
        val clicks = graft.queries.Relational.events(s, d)
          .where("event_type = 'click'").persistScoped()
        val pstream = EventStreams.eventsStream(s, d)
          .where("event_type = 'purchase'")
        ledgerStream(s, pstream, clicks)
          .select("cid", "user_id", "n_credits", "attributed_cents")
      },
      graft.queries.Relational.all("q40_attribution").oracle),

    // ── stream24: STREAMING incremental view maintenance — sink20's
    // rollup maintained CONTINUOUSLY under an arriving CDC changelog:
    // each micro-batch's delta rows (updates as before/after-image
    // cent differences, inserts as their cents and +1 — sink20's
    // exact-delta discipline) fold into the persisted (yr, dn, dc)
    // artifact by counter-wise ADD, and the view is answered as
    // base-aggregate + artifact, pinned to sink20's full-recompute
    // oracle verbatim: at every batch boundary the maintained rollup
    // IS the recompute, at O(batch + groups) per batch and |groups|
    // rows of state — the Materialize/Delta-IVM contract in the
    // stream16/17 fold template. ──
    "stream24_ivm" -> Q(
      (s, d) => {
        val stage = graft.RunScratch.path("ivm-changelog")
        graft.sinks.SinkQueries.cdcDeltaRows(s, d)
          .write.mode("overwrite").parquet(stage)
        val schema = s.read.parquet(stage).schema
        val artifact = deltaStream(s,
          s.readStream.schema(schema).parquet(stage))
        graft.sinks.SinkQueries.maintainedRollup(s, d, artifact)
      },
      graft.sinks.SinkQueries.all("sink20_agg_maintain").oracle),

    // ── stream25: streaming SPATIAL probe — q41's grid join in the
    // d14/d16 shard-vs-corpus shape: newly-arriving sites (a
    // deterministic 20% re-registration shard under new ids, their
    // coordinates nudged) probe the STATIC corpus grid for
    // within-2° neighbors. Per micro-batch the probe is stateless:
    // arriving points explode to their 3×3 cell neighborhoods
    // map-side and equi-join the static cell-keyed frame (broadcast
    // at gate scale; cell-bucketed at 100 TB), the exact integer
    // dist² predicate verifies, matches append — nothing ever
    // compares outside a 3×3 neighborhood and no probe-probe state
    // exists. The oracle replays the shard derivation and the
    // neighborhood join relationally; batch boundaries cannot
    // change a stateless join's output. ──
    // ── stream26: FILE-ARRIVAL ingestion — the same maintained-
    // sample fold as stream22, but driven by files ARRIVING in a
    // monitored directory (3 parquet files, maxFilesPerTrigger=1 →
    // 3 real micro-batches), so the FileStreamSource's own surface —
    // directory discovery, file ordering, schema application,
    // per-file batch planning, exactly-once file tracking — is
    // exercised inside the GATE, not only in the spec tier. The
    // staging write is gate-scale fixture simulation (production
    // feeds are directories already — a crawler drops shards, this
    // source picks them up); the fold algebra is split-invariant, so
    // the answer is pinned to p14's flat-rebuild oracle verbatim
    // whatever the uncontrolled doc→file assignment. ──
    "stream26_file_arrival" -> Q(
      (s, d) => {
        graft.functions.Hashing.register(s)
        // staging keyed by dataset dir AND run (RunScratch): two runs
        // against different SFs — or concurrent harness processes —
        // must never overwrite each other's staged files while a
        // file-stream is reading them
        val stage = graft.RunScratch.path(
          s"stream26-arrivals-${d.replaceAll("[^A-Za-z0-9]", "_")}")
        graft.Tables(s, d, "documents")
          .repartition(3).write.mode("overwrite").parquet(stage)
        val schema = s.read.parquet(stage).schema
        val arriving = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(stage)
        graft.queries.PipelineKernels.sampleStream(s, arriving)
          .select("doc_id", "lang", "source", "tag")
      },
      graft.queries.Pipeline.all("p14_bottomk_sample").oracle),

    // ── stream27: ARCHIVE arrival — the reference's RQ job queue
    // (`resources.py:46-75`, workers scaled by `docker-compose.yml:
    // 28-30`) as a Structured Streaming file source: catalog entries
    // (resource_id, version, url) land one file per micro-batch, and
    // every arrival runs the FULL conversion body (fetch → convert →
    // versioned+latest zstd write → GeoParquet footer) through the
    // same ConvertJob.run the batch fleet uses. The checkpointed
    // file-source seen-set turns RQ's at-least-once delivery into
    // exactly-once conversion end to end (StreamingSpec pins restart
    // + incremental-arrival semantics); the gate replays dwca11's
    // per-archive oracles — intake tier must be invisible to
    // results. ──
    "stream27_archive_arrival" -> Q(
      (s, _) => {
        val F = graft.dwca.FleetFixture
        val cat = F.stageCatalog(s, "catalog-gate")
        val outBase = F.freshOutBase("out-stream27")
        val res = graft.dwca.ConvertJob.runArrivals(s, cat, s"$cat-ckpt", outBase)
        require(res.values.forall(_ == "ran"), s"arrival statuses: $res")
        graft.dwca.DwcaQueries.fleetUnion(s, outBase)
      },
      Some(graft.dwca.DwcaQueries.fleetOracle)),

    "stream25_geo_probe" -> Q(
      (s, d) => geoProbeStream(s, d, EventStreams.customersStream(s, d),
        "g_stream25"),
      Some("""WITH corpus AS (SELECT c_custkey AS site_id,
                                     (c_custkey * 2654435761) % 600 AS x10,
                                     (c_custkey * 40503) % 300 AS y10
                              FROM customer),
              probes AS (SELECT c_custkey + 9000000 AS probe_id,
                                ((c_custkey * 2654435761) + 7) % 600 AS px,
                                ((c_custkey * 40503) + 3) % 300 AS py
                         FROM customer
                         WHERE c_custkey % 5 = 0 AND c_custkey <= 1000)
              SELECT probe_id, site_id,
                     CAST((px - x10) * (px - x10)
                          + (py - y10) * (py - y10) AS BIGINT) AS d2
              FROM probes JOIN corpus
                ON abs(px // 20 - x10 // 20) <= 1
               AND abs(py // 20 - y10 // 20) <= 1
              WHERE (px - x10) * (px - x10)
                    + (py - y10) * (py - y10) <= 400""")),

    // ── stream28: streaming DSIR maintenance — p24's bucket sketch
    // as a MAINTAINED artifact: each arriving micro-batch's hashed
    // n-gram bucket counts fold into the persisted (b, raw_n, tgt_n)
    // state by counter-wise ADD (counts of a disjoint union = sum of
    // counts, stream17's merge≡rebuild algebra), and the importance
    // resample is answered FROM THE ARTIFACT, pinned to p24's oracle
    // verbatim — the target-domain selector stays current as the
    // crawl arrives, with per-batch cost and state bounded by the
    // 1024-row sketch at any corpus size. The scoring pass runs
    // post-drain over the static table (the serve side — a
    // production deployment scores shards against the maintained λ
    // as they arrive). ──
    "stream28_dsir_maintain" -> Q(
      (s, d) => {
        graft.functions.Hashing.register(s)
        val PK = graft.queries.PipelineKernels
        val buckets = PK.dsirStream(s,
          PK.dsirFeats(EventStreams.docsStream(s, d)))
        val feats = PK.dsirFeats(graft.Tables(s, d, "documents")).persistScoped()
        PK.dsirFinish(buckets, feats)
      },
      Some(graft.queries.PipelineKernels.dsirOracle)),

    // ── stream29: streaming WATERMARK MONITOR — t32's green-list
    // z-test as a MAINTAINED per-feed ledger (the stream16/17
    // counter-fold template, eighth instance): each arriving
    // micro-batch's per-doc green-pair counts (the t32 kernel,
    // map-only) aggregate to (lang, feed) cells and ADD into the
    // persisted artifact — counts of a disjoint union are the sum of
    // counts, so the maintained ledger equals the batch rebuild at
    // any chop. The alarm is answered FROM THE ARTIFACT: the
    // watermarked feed's z blows past 4σ while the clean feed stays
    // at the null — the monitor a pipeline runs to catch synthetic
    // text entering by source, with state bounded by
    // |langs|·|feeds| rows at any corpus size. ──
    "stream29_wm_monitor" -> Q(
      (s, d) => {
        graft.functions.Hashing.register(s)
        wmLedgerStream(s, EventStreams.docsStream(s, d))
          .selectExpr(Seq("lang", "feed", "n_pairs", "n_green") ++
            graft.queries.TextSignals.zCols.map(_.replace(
              "as flagged", "as alarm")): _*)
          .where("n_pairs >= 1")
      },
      Some {
        val inner = graft.queries.TextSignals
          .all("t32_watermark_detect").oracle.get
        // fold t32's per-doc oracle frame to the (lang, feed) ledger;
        // lang rides in through a join back to documents (the per-doc
        // oracle publishes the planted bit, which IS the feed)
        s"""WITH perdoc AS ($inner)
            SELECT d.lang,
                   CASE WHEN p.planted = 1 THEN 'feed_wm'
                        ELSE 'feed_clean' END AS feed,
                   CAST(sum(p.n_pairs) AS BIGINT) AS n_pairs,
                   CAST(sum(p.n_green) AS BIGINT) AS n_green,
                   printf('%.4f', (4.0 * sum(p.n_green) - sum(p.n_pairs))
                                  / sqrt(3.0 * sum(p.n_pairs))) AS z,
                   CAST((4.0 * sum(p.n_green) - sum(p.n_pairs))
                        / sqrt(3.0 * sum(p.n_pairs)) > 4.0 AS BIGINT) AS alarm
            FROM perdoc p JOIN documents d USING (doc_id)
            GROUP BY 1, 2
            HAVING sum(p.n_pairs) >= 1"""
      })
  )

  /** stream29's fold: per batch, the t32 kernel's per-doc green-pair
    * counts aggregate to (lang, feed) and ADD into the persisted
    * ledger (write-tmp + rename, the artifact template). */
  private def wmLedgerDir: String = graft.RunScratch.path("wm-ledger")

  private[graft] def wmLedgerStream(s: SparkSession,
      docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.sum
    ArtifactFold.fold(s, docs, wmLedgerDir, "wm") { (batch, prior) =>
      val counts = graft.queries.TextSignals.wmDocCounts(batch)
        .groupBy("lang", "feed")
        .agg(sum("n_pairs").as("n_pairs"), sum("n_green").as("n_green"))
      prior.fold(counts)(counts.unionByName(_)
        .groupBy("lang", "feed")
        .agg(sum("n_pairs").as("n_pairs"), sum("n_green").as("n_green")))
    }
  }

  /** stream25's probe path over any customer-shaped stream (the
    * registered query feeds the table stream; StreamingSpec feeds a
    * 3-file chopped readStream to prove batch-boundary invariance):
    * build the static cell-keyed corpus grid, derive the 20%
    * re-registration shard from arriving rows, explode each probe to
    * its 3×3 cell neighborhood map-side, equi-join the grid
    * (broadcast at gate scale; cell-bucketed at 100 TB), verify the
    * exact integer dist² predicate, append matches. */
  private[graft] def geoProbeStream(s: SparkSession, d: String,
      custStream: DataFrame, table: String): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val corpus = graft.Tables(s, d, "customer")
      .selectExpr("c_custkey as site_id",
        "(c_custkey * 2654435761L) % 600 as x10",
        "(c_custkey * 40503L) % 300 as y10")
      .selectExpr("site_id", "x10", "y10",
        "x10 div 20 as cx", "y10 div 20 as cy")
      .persistScoped()
    // probe shard bounded by an ABSOLUTE key cut, not a modulus: the
    // arriving batch is a fixed-size registration wave at every SF,
    // so the match set grows linearly with corpus density — the r13
    // sf1 sweep caught the modulus-only variant returning an
    // SF²-sized match set (fixed 600×300 coordinate space ⇒ density
    // ∝ SF, probes ∝ SF) that no sink should have to absorb
    val probes = custStream
      .where("c_custkey % 5 = 0 and c_custkey <= 1000")
      .selectExpr("c_custkey + 9000000 as probe_id",
        "((c_custkey * 2654435761L) + 7) % 600 as x10",
        "((c_custkey * 40503L) + 3) % 300 as y10")
    val exploded = probes
      .selectExpr("probe_id", "x10", "y10",
        "explode(sequence(x10 div 20 - 1, x10 div 20 + 1)) as cx",
        "y10 div 20 as cy0")
      .selectExpr("probe_id", "x10 as px", "y10 as py", "cx",
        "explode(sequence(cy0 - 1, cy0 + 1)) as cy")
    drain(s,
      exploded.join(broadcast(corpus), Seq("cx", "cy"))
        .selectExpr("probe_id", "site_id",
          "(px - x10) * (px - x10) + (py - y10) * (py - y10) as d2")
        .where("d2 <= 400"),
      table, mode = "append")
  }

  /** stream24's fold: per batch, sum the arriving delta rows by year
    * and ADD into the persisted (yr, dn, dc) artifact. */
  private def ivmDir: String = graft.RunScratch.path("ivm-artifact")

  private[graft] def deltaStream(s: org.apache.spark.sql.SparkSession,
      deltas: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.sum
    ArtifactFold.fold(s, deltas, ivmDir, "agg") { (batch, prior) =>
      val bd = batch.groupBy("yr")
        .agg(sum("dn").as("dn"), sum("dc").as("dc"))
      prior.fold(bd)(bd.unionByName(_)
        .groupBy("yr").agg(sum("dn").as("dn"), sum("dc").as("dc")))
    }
  }

  /** stream23's fold: per batch, q40's exact allocation of the
    * batch's purchases against the static click history, added into
    * the persisted ledger (write-tmp + rename, the artifact
    * template). */
  private def ledgerDir: String = graft.RunScratch.path("attr-ledger")

  private[graft] def ledgerStream(s: org.apache.spark.sql.SparkSession,
      purchases: org.apache.spark.sql.DataFrame,
      clicks: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.sum
    ArtifactFold.fold(s, purchases, ledgerDir, "ledger") { (batch, prior) =>
      val credits = graft.queries.Relational.attributionCredits(batch, clicks)
      prior.fold(credits)(credits.unionByName(_)
        .groupBy("cid", "user_id")
        .agg(sum("n_credits").as("n_credits"),
          sum("attributed_cents").as("attributed_cents")))
    }
  }
}
