package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming tier. The reference is batch-only (its RQ
  * queue is job orchestration, SURVEY §2.6), so this tier is part of
  * the driver's north star, not reference parity: the same event
  * analytics the batch tier runs (q15 tumbling, q16 sessions) as
  * incremental streams, plus a custom-state sessionizer on
  * `flatMapGroupsWithState`.
  *
  * Design: sources are `readStream` over a directory of parquet (the
  * file-source keeps exactly-once semantics via file tracking);
  * event-time correctness comes from watermarks, which also bound
  * state: a 1-hour watermark means in-flight windows/sessions for at
  * most 1 hour of event time per key are held per partition —
  * independent of total input size, which is what makes these run
  * unmodified against an unbounded 100 TB/day feed.
  *
  * Parity contract (tested in StreamingSpec): with `availableNow` over
  * a static directory, each stream must produce exactly the batch
  * result of its batch twin.
  */
object EventStreams {

  /** Streaming source over an events parquet directory, ts normalized
    * to TIMESTAMP (same normalization as the batch tier). The file
    * source monitors a directory; the testdata ships a single file, so
    * a symlink staging dir adapts it (production feeds are
    * directories already). */
  /** A testdata table as a bounded file stream: the parquet file is
    * symlinked into a per-path scratch dir (the file-stream source
    * wants a directory it can list). */
  private def tableStream(spark: SparkSession, dir: String,
      table: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    val src = Paths.get(s"$dir/$table.parquet")
    val streamDir =
      if (Files.isDirectory(src)) src
      else {
        val d = Paths.get(System.getProperty("java.io.tmpdir"),
          s"graft-stream-${src.toAbsolutePath.toString.hashCode.toHexString}")
        Files.createDirectories(d)
        val link = d.resolve(s"$table.parquet")
        if (!Files.exists(link)) Files.createSymbolicLink(link, src.toAbsolutePath)
        d
      }
    val schema = spark.read.parquet(s"$dir/$table.parquet").schema
    spark.readStream.schema(schema).parquet(streamDir.toString)
  }

  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    val raw = tableStream(spark, dir, "events")
    if (raw.schema("ts").dataType.typeName == "long")
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else raw.withColumn("ts", col("ts").cast("timestamp"))
  }

  /** The documents table as a bounded stream — the corpus-ingest shape
    * (documents arrive continuously from a crawler; each micro-batch
    * is decontaminated / scored on the way in). */
  def docsStream(spark: SparkSession, dir: String): DataFrame =
    tableStream(spark, dir, "documents")

  /** The customer table as a bounded stream — the site-registration
    * shape (new locations arrive continuously; each micro-batch is
    * geo-probed against the static corpus on the way in). */
  def customersStream(spark: SparkSession, dir: String): DataFrame =
    tableStream(spark, dir, "customer")

  /** The embeddings table as a bounded stream — the ANN-index-ingest
    * shape (vectors arrive continuously; each micro-batch is encoded
    * against the offline-trained codebook on the way in). */
  def embeddingsStream(spark: SparkSession, dir: String): DataFrame =
    tableStream(spark, dir, "embeddings")

  /** Streaming decontamination (stream06): the stream side explodes
    * each arriving doc's 13-grams MAP-ONLY, the static eval-gram set
    * is broadcast per micro-batch (stateless stream-static join), and
    * the per-doc hit count aggregates only MATCHED grams — state is
    * one row per CONTAMINATED doc, a vanishing fraction of the
    * corpus. Production appends on an ingest-time watermark; the gate
    * drains complete for batch parity (stream01's contract). */
  def decontaminationStream(docGrams: DataFrame,
      evalGrams: DataFrame): DataFrame =
    docGrams.where("not is_eval")
      .join(org.apache.spark.sql.functions.broadcast(evalGrams), "g")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"))

  /** q15's tumbling counts as an incremental stream: watermarked
    * 1-hour windows, partial aggregation before the stateful exchange.
    * Same output shape as batch q15 (Det-summed val_sum) so both tiers
    * share one oracle. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), graft.Det.dsum(col("value")).as("val_sum"))
      .select(unix_timestamp(col("window.start")).as("win_start"),
        col("event_type"), col("n"), col("val_sum"))

  /** q26's hopping windows as a stream: overlapping 1-hour windows
    * every 30 minutes. State per key is bounded by the watermark plus
    * windowDuration/slideDuration = 2 concurrently-open windows per
    * (slide, event_type) — the overlap multiplies open-window count,
    * not per-window state. Output shape matches batch q26 — one
    * oracle for both tiers. */
  def hoppingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), graft.Det.dsum(col("value")).as("val_sum"))
      .select(unix_timestamp(col("window.start")).as("win_start"),
        col("event_type"), col("n"), col("val_sum"))

  /** q16's session windows as a stream: built-in session_window with a
    * 30-minute gap; watermark closes sessions and evicts their state.
    * Output shape matches batch q16 — one oracle for both tiers. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"), graft.Det.dsum(col("value")).as("val_sum"))
      .select(col("user_id"),
        unix_millis(col("session_window.start")).as("session_start_ms"),
        col("n"), col("val_sum"))

  /** Streaming exact dedup: drop events whose `event_id` was already
    * seen within the watermark horizon. State holds one entry per key
    * for at most the watermark interval — bounded regardless of
    * stream length (the streaming face of d01's batch hash-dedup). */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** CDC keep-latest: the newest event per user as an INCREMENTAL
    * streaming aggregation — `max_by` over the (ts, event_id) recency
    * struct, q30's changelog→snapshot semantics in streaming form.
    * Per-key state is ONE row (the current winner), never history:
    * each micro-batch folds its rows into the running max map-side
    * before the state-store update — the streaming face of q30's
    * WindowGroupLimit. The event_id tie-break makes the winner
    * deterministic under any arrival order. */
  def latestPerUser(events: DataFrame): DataFrame =
    events.groupBy("user_id")
      .agg(expr("""max_by(named_struct('event_id', event_id,
                                       'ts', ts,
                                       'event_type', event_type),
                          struct(ts, event_id))""").as("last"))
      .selectExpr("user_id", "last.event_id as last_event_id",
        "unix_millis(last.ts) as last_ts_ms", "last.event_type as last_type")

  /** Stream-static enrichment: the event stream left-joined to a
    * static dimension on user_id. Stateless — no watermark state; the
    * broadcast static side is refreshed per micro-batch, so dimension
    * updates between batches are picked up (the streaming face of the
    * q02 star join's dim broadcast). */
  def enrichedStream(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), col("user_id") === col("c_custkey"), "left")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("c_name"), col("c_acctbal"))

  /** Stream-stream inner join: purchases attributed to a click by the
    * same user within 30 minutes. Both sides are watermarked and the
    * join carries an event-time range predicate — that pair is what
    * lets Spark BOUND each side's buffered state to the watermark
    * horizon (without a time constraint a stream-stream join buffers
    * both streams forever). Inner matches emit as soon as both rows
    * arrive, so a SINGLE-micro-batch availableNow drain (the gate's
    * shape: one file) equals the batch join exactly — one oracle for
    * both tiers. Across multiple micro-batches the standard streaming
    * caveat applies: once the watermark lets the join EVICT a click's
    * state (eviction runs at end-of-batch, one batch behind the
    * watermark), a purchase arriving later can no longer match — the
    * result is a subset of the batch join, with late-data loss bounded
    * by the 1 h delay: the price of bounded state on an unbounded
    * feed. StreamingSpec pins both bounds (on-time pairs present,
    * post-eviction pair lost, nothing fabricated). */
  def clickAttribution(events: DataFrame): DataFrame = {
    val clicks = events.where("event_type = 'click'")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val purchases = events.where("event_type = 'purchase'")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "1 hour")
    clicks.join(purchases,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"))
      .select("click_id", "purchase_id", "user_id")
  }

  /** [[clickAttribution]]'s LEFT OUTER variant — conversion tracking
    * that keeps the unconverted clicks. The semantics append mode has
    * to earn: the inner matches emit eagerly, but an UNMATCHED click
    * can only emit (with a null purchase) once the watermark proves no
    * in-window purchase can still arrive — null emission rides state
    * EXPIRY, which is why the outer side requires both watermarks and
    * the event-time range bound. */
  def clickAttributionOuter(events: DataFrame): DataFrame = {
    val clicks = events.where("event_type = 'click'")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val purchases = events.where("event_type = 'purchase'")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "1 hour")
    clicks.join(purchases,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"),
      "left_outer")
      .select("click_id", "purchase_id", "user_id")
  }

  final case class Event(user_id: Long, ts: Timestamp, value: Double)
  final case class SessionState(start: Long, last: Long, n: Long, sum: Double)
  final case class SessionOut(user_id: Long, session_start_ms: Long, n: Long, val_sum: Double)

  /** Custom-state sessionizer on `flatMapGroupsWithState` — the shape
    * Spark's built-in session_window can't express (per-session custom
    * accumulators, emit-on-close). Event-time timeout keyed to the
    * watermark evicts idle sessions, so state per user is one
    * in-flight session regardless of history length.
    *
    * Memory bound: events fold ONE AT A TIME into a set of disjoint
    * candidate session intervals (a TreeMap keyed by session start) —
    * an out-of-order event extends the interval it is gap-adjacent to
    * and bridges neighbouring intervals that come within the gap.
    * Executor memory per key per batch is O(distinct sessions in the
    * batch), which is proportional to the OUTPUT, never O(events):
    * a hot key with millions of events in one session holds exactly
    * one interval. (The previous `it.toSeq.sortBy` materialized the
    * whole group.) The interval merge computes the same connected
    * components as a sort-then-fold, so session boundaries, starts,
    * and counts are order-independent within a batch; the double
    * `sum` accumulates in arrival order and can differ in final ulps
    * across orders — the same caveat as any distributed double sum
    * (Spark's own `sum()` included).
    */
  def sessionizeCustom(events: Dataset[Event], gapMs: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(userId, s.start, s.n, s.sum))
          } else {
            val iv = new java.util.TreeMap[Long, SessionState]()
            state.getOption.foreach(s => iv.put(s.start, s))
            it.foreach { e =>
              val t = e.ts.getTime
              // extend the latest interval starting at-or-before t if
              // gap-adjacent (t inside it also lands here), else open
              // a new candidate session
              val floor = iv.floorEntry(t)
              var cur =
                if (floor != null && t - floor.getValue.last < gapMs) {
                  val s = floor.getValue
                  iv.remove(floor.getKey)
                  SessionState(s.start, math.max(s.last, t), s.n + 1, s.sum + e.value)
                } else SessionState(t, t, 1, e.value)
              // bridge: absorb following intervals now within the gap
              var ceil = iv.higherEntry(cur.start)
              while (ceil != null && ceil.getValue.start - cur.last < gapMs) {
                val s2 = ceil.getValue
                iv.remove(ceil.getKey)
                cur = SessionState(cur.start, math.max(cur.last, s2.last),
                  cur.n + s2.n, cur.sum + s2.sum)
                ceil = iv.higherEntry(cur.start)
              }
              iv.put(cur.start, cur)
            }
            if (iv.isEmpty) Iterator.empty
            else {
              // every interval except the latest is closed (a later
              // event >= gap after it exists); the latest stays open
              // on the watermark timeout
              val open = iv.pollLastEntry().getValue
              state.update(open)
              state.setTimeoutTimestamp(open.last + gapMs)
              val closed = List.newBuilder[SessionOut]
              iv.values.forEach(s => closed += SessionOut(userId, s.start, s.n, s.sum))
              closed.result().iterator
            }
          }
        })
  }
}
