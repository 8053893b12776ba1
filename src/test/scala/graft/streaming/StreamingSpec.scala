package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Streaming/batch parity: each stream over the static sf0.001 events
  * directory (availableNow trigger, memory sink) must equal its batch
  * twin exactly. */
class StreamingSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def runToMemory(df: org.apache.spark.sql.DataFrame, name: String,
      mode: String = "append"): org.apache.spark.sql.DataFrame = {
    val q = df.writeStream
      .format("memory").queryName(name).outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
    // a timed-out drain must fail loudly here, not as a confusing
    // partial-table mismatch downstream (same contract as
    // StreamQueries.drain)
    if (!q.awaitTermination(120000)) {
      q.stop()
      throw new IllegalStateException(s"stream $name did not drain within 120s")
    }
    spark.table(name)
  }

  test("tumbling window stream equals the batch aggregation") {
    val stream = EventStreams.tumblingCounts(EventStreams.eventsStream(spark, sf))
    // complete mode: emit every window, including those the watermark
    // has not yet closed when the bounded stream ends
    val got = runToMemory(stream, "t_tumbling", mode = "complete")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
    val want = graft.queries.Relational.events(spark, sf)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("win_start"),
        col("event_type"), col("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
    assert(got === want)
  }

  test("hopping window stream equals the batch aggregation") {
    val stream = EventStreams.hoppingCounts(EventStreams.eventsStream(spark, sf))
    val got = runToMemory(stream, "t_hopping", mode = "complete")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
    val want = graft.queries.Relational.events(spark, sf)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("win_start"),
        col("event_type"), col("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
    assert(got === want)
    // overlap factor: total per-window memberships = 2 × event count
    val events = graft.queries.Relational.events(spark, sf).count()
    assert(want.map(_._3).sum === 2 * events)
  }

  test("session window stream equals the batch sessionization") {
    val stream = EventStreams.sessionCounts(EventStreams.eventsStream(spark, sf))
    val got = runToMemory(stream, "t_sessions", mode = "complete")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val want = graft.queries.Relational.events(spark, sf)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"),
        unix_millis(col("session_window.start")).as("session_start_ms"), col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(got === want)
  }

  test("append-mode tumbling stream emits exactly the watermark-closed windows") {
    // the production incremental path: append mode emits a window only
    // once the watermark (max event time - 1h) passes its end; the
    // open tail is withheld until more data closes it
    val events = graft.queries.Relational.events(spark, sf)
    val wmMs = events.agg(max(unix_millis(col("ts")))).head.getLong(0) - 3600L * 1000
    val got = runToMemory(
      EventStreams.tumblingCounts(EventStreams.eventsStream(spark, sf)),
      "t_tumbling_append", mode = "append")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
    def batch(closedOnly: Boolean) = {
      val agg = events.groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      (if (closedOnly) agg.where(unix_millis(col("window.end")) <= wmMs) else agg)
        .select(unix_timestamp(col("window.start")).as("win_start"),
          col("event_type"), col("n"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
    }
    assert(got === batch(closedOnly = true))
    assert(got.nonEmpty)
    // the withheld open tail is real: complete-mode has strictly more
    assert(got.length < batch(closedOnly = false).length)
  }

  test("append-mode session stream emits exactly the watermark-closed sessions") {
    val events = graft.queries.Relational.events(spark, sf)
    val wmMs = events.agg(max(unix_millis(col("ts")))).head.getLong(0) - 3600L * 1000
    val got = runToMemory(
      EventStreams.sessionCounts(EventStreams.eventsStream(spark, sf)),
      "t_sessions_append", mode = "append")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    def batch(closedOnly: Boolean) = {
      val agg = events.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"))
      (if (closedOnly) agg.where(unix_millis(col("session_window.end")) <= wmMs) else agg)
        .select(col("user_id"),
          unix_millis(col("session_window.start")).as("session_start_ms"), col("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    }
    assert(got === batch(closedOnly = true))
    assert(got.nonEmpty)
    assert(got.length < batch(closedOnly = false).length)
  }

  test("stream-static enrichment equals the batch join") {
    val dim = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey", "c_name", "c_acctbal")
    val stream = EventStreams.enrichedStream(EventStreams.eventsStream(spark, sf), dim)
    val got = runToMemory(stream, "t_enrich")
      .collect().map(_.toSeq).toSet
    val batch = graft.queries.Relational.events(spark, sf)
      .join(broadcast(dim), col("user_id") === col("c_custkey"), "left")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("c_name"), col("c_acctbal"))
      .collect().map(_.toSeq).toSet
    assert(got === batch)
    assert(got.nonEmpty)
    // the join is genuinely left: some users enrich, some do not
    assert(got.exists(_(3) != null))
  }

  test("stream-stream click attribution equals the batch range join") {
    val got = runToMemory(
      EventStreams.clickAttribution(EventStreams.eventsStream(spark, sf)),
      "t_ssjoin")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val e = graft.queries.Relational.events(spark, sf)
    val want = e.where("event_type = 'click'")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
      .join(e.where("event_type = 'purchase'")
        .select(col("event_id").as("purchase_id"), col("user_id").as("p_user_id"),
          col("ts").as("purchase_ts")),
        col("user_id") === col("p_user_id") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"))
      .select("click_id", "purchase_id", "user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("stream-stream join across micro-batches: on-time subset bound, never fabrication") {
    // The gate's availableNow drain is single-batch, where equality
    // with the batch join is exact. This pins the MULTI-batch
    // contract instead: once the watermark has EVICTED a row's
    // partner state (eviction runs at end-of-batch, one batch behind
    // the watermark), a late arrival can no longer match — the loss
    // bounded state trades for — and nothing is ever fabricated.
    // Timeline:
    //   batch 1: all clicks + the latest purchase → watermark after
    //            it = min(maxClick, maxPurchase) - 1h = t0+32400
    //   batch 2: an unrelated purchase; at ITS end, clicks with
    //            click_ts + 30min < t0+32400 are evicted (click 1)
    //   batch 3: purchase 11 (t0+600) arrives for evicted click 1 →
    //            pair lost; purchase 13 (t0+35900) pairs with the
    //            still-buffered click 3
    // (synthetic events: sf0.001's natural clicks/purchases yield only
    // 2 pairs, none late — too sparse to exercise the eviction path)
    val dir = java.nio.file.Files.createTempDirectory("graft-ssmb").toString
    val t0 = 1700000000L // seconds
    def ev(id: Long, user: Long, typ: String, offsetS: Long) =
      (id, user, typ, new java.sql.Timestamp((t0 + offsetS) * 1000))
    import spark.implicits._
    def write(rows: Seq[(Long, Long, String, java.sql.Timestamp)]): Unit =
      rows.toDF("event_id", "user_id", "event_type", "ts")
        .coalesce(1).write.mode("append").parquet(dir)
    val clicks = Seq(
      ev(1, 100, "click", 0), // partner arrives after eviction → lost
      ev(2, 200, "click", 36000),
      ev(3, 300, "click", 35000)) // partner late but click survives
    val latestPurchase = ev(12, 200, "purchase", 36300)
    val fillerPurchase = ev(14, 999, "purchase", 36400) // no click partner
    val latePurchases = Seq(
      ev(11, 100, "purchase", 600),
      ev(13, 300, "purchase", 35900))
    write(clicks :+ latestPurchase)
    Thread.sleep(1100) // file-source orders batches by mtime
    write(Seq(fillerPurchase))
    Thread.sleep(1100)
    write(latePurchases)
    val all = (clicks ++ Seq(latestPurchase, fillerPurchase) ++ latePurchases)
      .toDF("event_id", "user_id", "event_type", "ts")

    val src = spark.readStream
      .schema(all.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    val got = runToMemory(EventStreams.clickAttribution(src), "t_ssjoin_mb")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val wantAll = pairs(EventStreams.clickAttribution(all)) // batch twin
    assert(wantAll === Set((1L, 11L, 100L), (2L, 12L, 200L), (3L, 13L, 300L)))
    // nothing fabricated...
    assert(got.subsetOf(wantAll), s"fabricated pairs: ${got.diff(wantAll)}")
    // ...on-time pairs all present, and click 1's pair IS lost — the
    // bounded-state price the EventStreams doc promises; full equality
    // here would mean the spec never exercised the eviction path
    assert(got === Set((2L, 12L, 200L), (3L, 13L, 300L)), s"got $got")
  }

  test("streaming decontamination across micro-batches equals the batch verdict") {
    // complete-mode agg over a stateless stream-static join: batch
    // boundaries must not matter. Docs arrive in two micro-batches;
    // the eval-gram set is static. Ids are picked by evaluating the
    // engine's own eval predicate, so the spec never hardcodes hashes.
    graft.functions.Hashing.register(spark)
    import spark.implicits._
    val ids = (0L until 100L).toDF("doc_id")
      .selectExpr("doc_id", s"${graft.queries.PipelineKernels.evalPredSql} as is_eval")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val evalId = ids.collectFirst { case (id, true) => id }.get
    val Seq(cleanId, dirtyId, dirtyId2) =
      ids.collect { case (id, false) => id }.toSeq.sorted.take(3)
    val evalText = (1 to 13).map(i => s"ev$i").mkString(" ")
    val docs = Seq(
      (evalId, evalText),
      (dirtyId, s"prefix $evalText suffix"), // 1 shared 13-gram... and more
      (dirtyId2, s"$evalText tail1 tail2"),
      (cleanId, (1 to 20).map(i => s"cl$i").mkString(" ")))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-dcmb").toString
    docs.where(col("doc_id") =!= dirtyId2).coalesce(1)
      .write.mode("append").parquet(dir)
    Thread.sleep(1100) // file-source orders batches by mtime
    docs.where(col("doc_id") === dirtyId2).coalesce(1)
      .write.mode("append").parquet(dir)
    val src = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val evalGrams = graft.queries.PipelineKernels.decontGrams(docs)
      .where("is_eval").select("g").distinct()
    val got = runToMemory(
      EventStreams.decontaminationStream(
        graft.queries.PipelineKernels.decontGrams(src), evalGrams),
      "t_decont_mb", mode = "complete")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // batch twin over the union — and the verdicts by hand: the eval
    // doc has exactly ONE 13-gram, so each dirty doc (which embeds
    // the eval text once) matches exactly once; shifted windows
    // contain prefix/suffix tokens and match nothing
    val want = EventStreams.decontaminationStream(
        graft.queries.PipelineKernels.decontGrams(docs), evalGrams)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want, "micro-batching changed the verdict")
    assert(got.keySet === Set(dirtyId, dirtyId2), got)
    assert(got(dirtyId) === 1L && got(dirtyId2) === 1L, got)
    assert(!got.contains(cleanId) && !got.contains(evalId))
  }

  test("streaming quality gate across micro-batches equals the batch t14 verdict") {
    // stateless append: each arriving doc gets its verdict in its own
    // micro-batch, so batch boundaries cannot change the output set.
    graft.functions.Hashing.register(spark)
    import spark.implicits._
    val docs = Seq(
      // 33 distinct tokens, mean length in band, stops present → keep
      (1L, (1 to 30).map(i => f"tok$i%02d").mkString(" ") + " the a of"),
      (2L, "short doc"),                    // fails token-count band
      (3L, ("dup " * 50).trim + " the a")) // fails dup-token + length rules
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-qgmb").toString
    docs.where("doc_id < 3").coalesce(1).write.mode("append").parquet(dir)
    Thread.sleep(1100) // file-source orders batches by mtime
    docs.where("doc_id = 3").coalesce(1).write.mode("append").parquet(dir)
    val src = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val got = runToMemory(graft.queries.TextOpsKernels.gopherVerdict(src),
        "t_qgate_mb", mode = "append")
      .select("doc_id", "fail_mask", "keep").collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue, r.getBoolean(2))).toSet
    val want = graft.queries.TextOpsKernels.gopherVerdict(docs)
      .select("doc_id", "fail_mask", "keep").collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue, r.getBoolean(2))).toSet
    assert(got === want, "micro-batching changed the verdict")
    assert(got.exists(_._3) && got.exists(!_._3), "both verdict classes")
  }

  test("streaming ANN search across micro-batches equals the batch ADC top-3") {
    // probes arriving in separate micro-batches must converge to the
    // same per-probe top-3 as one batch pass: the heap aggregate's
    // state carries k-row partial buffers per probe and complete
    // mode re-emits the merged result
    graft.functions.Hashing.register(spark)
    val e = graft.Tables(spark, sf, "embeddings").select("vec_id", "embedding")
    val cb = graft.queries.SimilarityKernels.trainedPqCodebook(e)
    val codes = graft.queries.SimilarityKernels.pqEncode(e, cb)
      .selectExpr("vec_id as cand_id", "codes")
    val probesB = e.where("vec_id < 6")
    val dir = java.nio.file.Files.createTempDirectory("graft-annmb").toString
    probesB.where("vec_id < 3").coalesce(1).write.mode("append").parquet(dir)
    Thread.sleep(1100) // file-source orders batches by mtime
    probesB.where("vec_id >= 3").coalesce(1).write.mode("append").parquet(dir)
    val src = spark.readStream.schema(probesB.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    def rowsOf(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val got = rowsOf(runToMemory(
      graft.queries.SimilarityKernels.adcTopk(
        graft.queries.SimilarityKernels.pqProbeTables(src, cb)
          .join(codes, org.apache.spark.sql.functions.expr("cand_id != probe_id")), 3),
      "t_ann_mb", mode = "complete"))
    val want = rowsOf(graft.queries.SimilarityKernels.adcTopk(
      graft.queries.SimilarityKernels.pqProbeTables(probesB, cb)
        .join(codes, org.apache.spark.sql.functions.expr("cand_id != probe_id")), 3))
    assert(got === want, "micro-batching changed the search results")
    assert(got.size === 18, "6 probes x top-3")
  }

  test("streaming PQ encode across micro-batches equals the batch encoding") {
    // stateless append against a literal codebook: batch boundaries
    // cannot change any vector's codes
    graft.functions.Hashing.register(spark)
    val e = graft.Tables(spark, sf, "embeddings").select("vec_id", "embedding")
    val cb = graft.queries.SimilarityKernels.pqCodebook(e)
    val dir = java.nio.file.Files.createTempDirectory("graft-pqmb").toString
    e.where("vec_id % 2 = 0").coalesce(1).write.mode("append").parquet(dir)
    Thread.sleep(1100) // file-source orders batches by mtime
    e.where("vec_id % 2 = 1").coalesce(1).write.mode("append").parquet(dir)
    val src = spark.readStream.schema(e.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    def codesOf(df: org.apache.spark.sql.DataFrame) = df
      .selectExpr("vec_id", "array_join(transform(codes, x -> cast(x as string)), ',') as c")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = {
      val out = graft.queries.SimilarityKernels.pqEncode(src, cb)
      val q = out.writeStream.format("memory").queryName("t_pq_mb")
        .outputMode("append").trigger(
          org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      // a partially-drained table must fail loudly, not set-mismatch
      // confusingly below; stop the straggler before throwing
      if (!q.awaitTermination(120000)) {
        q.stop()
        throw new IllegalStateException("t_pq_mb did not drain within 120s")
      }
      codesOf(spark.table("t_pq_mb"))
    }
    val want = codesOf(graft.queries.SimilarityKernels.pqEncode(e, cb))
    assert(got === want, "micro-batching changed the encoding")
    assert(got.nonEmpty)
  }

  test("streaming keep-latest across micro-batches: arrival order never changes the winner") {
    import spark.implicits._
    // user 1's LATEST event arrives in batch 1 and an OLDER one in
    // batch 2 (out-of-order arrival); user 2's winner arrives last;
    // user 3's ts tie resolves to the larger event_id
    val rows = Seq(
      (10L, 1L, "click", "2024-01-01 10:00:00"),
      (11L, 2L, "view", "2024-01-01 09:00:00"),
      (12L, 3L, "view", "2024-01-01 08:00:00"),
      (13L, 1L, "view", "2024-01-01 09:30:00"),
      (14L, 2L, "purchase", "2024-01-01 11:00:00"),
      (15L, 3L, "click", "2024-01-01 08:00:00"))
      .toDF("event_id", "user_id", "event_type", "ts0")
      .selectExpr("event_id", "user_id", "event_type", "cast(ts0 as timestamp) as ts")
    val dir = java.nio.file.Files.createTempDirectory("graft-lpk").toString
    rows.where("event_id <= 12").coalesce(1).write.mode("append").parquet(dir)
    Thread.sleep(1100) // file-source orders batches by mtime
    rows.where("event_id >= 13").coalesce(1).write.mode("append").parquet(dir)
    val src = spark.readStream.schema(rows.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val got = runToMemory(EventStreams.latestPerUser(src), "t_lpk_mb", mode = "complete")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3))).toSet
    assert(got === Set((1L, 10L, "click"), (2L, 14L, "purchase"), (3L, 15L, "click")))
  }

  test("streaming dedup drops duplicate event ids within the watermark") {
    val stream = EventStreams.dedupStream(
      EventStreams.eventsStream(spark, sf).select("event_id", "ts", "user_id"))
    val got = runToMemory(stream, "t_dedup").count()
    val want = graft.queries.Relational.events(spark, sf)
      .select("event_id").distinct().count()
    assert(got === want)
  }

  test("file sink + checkpoint is exactly-once across restarts") {
    val base = java.nio.file.Files.createTempDirectory("graft-eo").toString
    def runOnce(): Unit = {
      val q = EventStreams.eventsStream(spark, sf)
        .select("event_id", "ts", "user_id")
        .writeStream.format("parquet")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    runOnce()
    val first = spark.read.parquet(s"$base/out").count()
    // restart with the same checkpoint: the source offsets are already
    // committed, so nothing is re-emitted and nothing is duplicated
    runOnce()
    val second = spark.read.parquet(s"$base/out").count()
    assert(first === second)
    assert(first === graft.queries.Relational.events(spark, sf).count())
  }

  test("sessionizer folds a 100k-event out-of-order hot-key batch into one interval") {
    // one user floods a single micro-batch: state while folding must be
    // O(sessions), not O(events) — the permuted 1s-apart run merges
    // incrementally into ONE candidate interval, and the result is
    // identical to a sort-then-fold
    val dir = java.nio.file.Files.createTempDirectory("graft-hotkey").toString
    val t0 = 1700000000L // seconds
    spark.range(100000).selectExpr("1L as user_id",
        s"timestamp_seconds($t0 + (id * 7) % 100000) as ts", "cast(1.0 as double) as value")
      .coalesce(1).write.mode("append").parquet(dir)
    Thread.sleep(1100) // second file must sort after the first by mtime
    // a much-later lone event advances the watermark past the hot
    // session's timeout in the second micro-batch
    spark.range(1).selectExpr("2L as user_id",
        s"timestamp_seconds($t0 + 200000) as ts", "cast(1.0 as double) as value")
      .coalesce(1).write.mode("append").parquet(dir)
    import spark.implicits._
    val src = spark.readStream
      .schema("user_id LONG, ts TIMESTAMP, value DOUBLE")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir).as[EventStreams.Event]
    val out = runToMemory(
      EventStreams.sessionizeCustom(src, gapMs = 30 * 60 * 1000).toDF(), "t_hotkey")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq((1L, t0 * 1000, 100000L, 100000.0)))
  }

  test("flatMapGroupsWithState sessionizer matches session_window on closed sessions") {
    import spark.implicits._
    val events = EventStreams.eventsStream(spark, sf)
      .select(col("user_id"), col("ts"), col("value"))
      .as[EventStreams.Event]
    val out = runToMemory(
      EventStreams.sessionizeCustom(events, gapMs = 30 * 60 * 1000).toDF(), "t_custom")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    // batch twin: only sessions the watermark could close are emitted
    // by the stream; compare on the intersection key (user, start)
    val batch = graft.queries.Relational.events(spark, sf)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"), graft.Det.dsum(col("value")).as("val_sum"))
      .select(col("user_id"), unix_millis(col("session_window.start")).as("s"), col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    assert(out.nonEmpty)
    // every emitted custom session must be a real batch session
    assert(out.subsetOf(batch),
      s"custom sessions not in batch: ${out.diff(batch).take(5)}")
  }

  test("stream15 outer join: null rows emit only on watermark expiry, inner rows eagerly") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val staged = graft.queries.Relational.events(spark, sf)
      .where("event_type in ('click', 'purchase')")
      .selectExpr("event_id", "user_id", "event_type", "ts").collect()
    val tmax = staged.map(_.getTimestamp(3).getTime).max
    val real = staged.toSeq.map(r =>
      (r.getLong(0), r.getLong(1), r.getString(2), r.getTimestamp(3)))
    val far = new java.sql.Timestamp(tmax + 36000000L)
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, String, java.sql.Timestamp)]
    val q = EventStreams.clickAttributionOuter(
        ms.toDF().toDF("event_id", "user_id", "event_type", "ts"))
      .writeStream.format("memory").queryName("t_stream15")
      .outputMode("append").start()
    try {
      ms.addData(real); q.processAllAvailable()
      // after batch 0, its own data has ratcheted the watermark to
      // tmax − 1h (the trailing no-data batch runs the expiry), so
      // null rows exist EXACTLY for the unmatched clicks whose 30-min
      // window closed under that watermark — and for no click inside
      // the horizon (those could still convert)
      val wm0 = tmax - 3600000L
      val clickTs = real.filter(_._3 == "click").map(r => r._1 -> r._4.getTime).toMap
      val matched = spark.table("t_stream15").collect()
        .filter(!_.isNullAt(1)).map(_.getLong(0)).toSet
      val midNulls = spark.table("t_stream15").collect()
        .filter(_.isNullAt(1)).map(_.getLong(0)).toSet
      val wantMidNulls = clickTs.collect {
        case (id, t) if t + 1800000L <= wm0 && !matched(id) => id
      }.toSet
      // sound direction, exactly: NO null may emit for a click whose
      // window the watermark has not closed (it could still convert).
      // The flush side is asserted as near-complete rather than exact:
      // the engine may leave a straggler for the next trigger (the
      // final-equality check below proves nothing is ever lost).
      assert((midNulls -- wantMidNulls).isEmpty,
        s"null emitted before expiry: ${(midNulls -- wantMidNulls).take(3)}")
      assert(midNulls.nonEmpty && midNulls.size >= wantMidNulls.size - 2,
        s"expiry flush too lazy: ${midNulls.size} of ${wantMidNulls.size}")
      ms.addData(Seq((-1L, -101L, "click", far), (-2L, -102L, "purchase", far)))
      q.processAllAvailable()
      ms.addData(Seq.empty); q.processAllAvailable()
    } finally q.stop()
    val fin = spark.table("t_stream15").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    // expiry emitted every unconverted click exactly once; total
    // equals the batch left join
    val want = graft.queries.Relational.events(spark, sf).as("c")
      .where("c.event_type = 'click'")
      .join(graft.queries.Relational.events(spark, sf).as("p")
          .where("p.event_type = 'purchase'"),
        expr("p.user_id = c.user_id and p.ts >= c.ts and p.ts <= c.ts + interval 30 minutes"),
        "left_outer")
      .selectExpr("c.event_id", "coalesce(p.event_id, -1)")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fin === want)
    assert(fin.exists(_._2 == -1L), "no unconverted click in the fixture - vacuous")
    assert(fin.exists(_._2 != -1L), "no conversion in the fixture - vacuous")
  }

  test("stream14 custom sessionizer: time-chunked batch split never changes the emitted sessions") {
    // The sessionizer emits non-latest intervals eagerly at batch end
    // (its documented bounded-state trade: a batch delivering events
    // BEFORE an already-emitted session would split it — the same
    // class of loss the stream-stream-join spec pins). The invariance
    // it DOES promise: under time-chunked batch delivery — what a
    // watermarked source actually provides — with arbitrary DISORDER
    // inside each batch, the emitted sessions are identical to the
    // single-batch run, including the sums (whole-number value
    // staging makes the double fold exact in any order).
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def run(split: Int): Set[(Long, Long, Long, Long)] = {
      val staged = graft.queries.Relational.events(spark, sf)
        .selectExpr("user_id", "unix_millis(ts) as tms",
          "cast(floor(value * 10000) as bigint) as vbp", "event_id").collect()
      val tmax = staged.map(_.getAs[Long]("tms")).max
      val real = staged.toSeq
        .sortBy(r => (r.getLong(1), r.getLong(3))) // global time order...
        .map(r => (r.getLong(3),
          EventStreams.Event(r.getLong(0), new java.sql.Timestamp(r.getLong(1)),
            r.getLong(2).toDouble)))
      val batches = real.grouped((real.size + split - 1) / split).toSeq
        // ...then scrambled WITHIN each chunk by event-id hash
        .map(_.sortBy(_._1.##).map(_._2))
      val sentinels = staged.map(_.getLong(0)).distinct.toSeq
        .map(u => EventStreams.Event(u, new java.sql.Timestamp(tmax + 36000000L), 0.0))
      val ms = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[EventStreams.Event]
      val q = EventStreams.sessionizeCustom(ms.toDS(), gapMs = 1800000L)
        .toDF().writeStream.format("memory")
        .queryName(s"t_stream14_$split").outputMode("append").start()
      try (batches :+ sentinels).foreach { b => ms.addData(b); q.processAllAvailable() }
      finally q.stop()
      spark.table(s"t_stream14_$split")
        .selectExpr("user_id", "session_start_ms", "n", "cast(val_sum as bigint)")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    }
    val one = run(1)
    assert(one.nonEmpty)
    assert(run(3) === one, "3-way time-chunked split changed the emitted sessions")
  }

  test("stream13 watermark contract: open-window stragglers count, closed windows drop, exact tie drops") {
    // Discriminates three hypotheses about the append-mode late filter
    // with hand-placed event times (hour0 is an exact UTC hour):
    //   window-END based (Spark's actual rule, what stream13's oracle
    //   replays): a row drops iff its window end <= the watermark in
    //   force — so a straggler OLDER than the watermark still counts
    //   while its window is open;
    //   ts-based filtering would drop the straggler (w3 would be 1);
    //   a strict < on the tie would keep the end==wm row (w3 would be 3).
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val hour0 = 1699999200L // 2023-11-14 22:00:00 UTC
    def t(offS: Long) = new java.sql.Timestamp((hour0 + offS) * 1000)
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, java.sql.Timestamp, Double)]
    val agg = ms.toDF().toDF("event_id", "ts", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .selectExpr("unix_seconds(window.start) as win_start", "n")
    val q = agg.writeStream.format("memory").queryName("t_stream13_tie")
      .outputMode("append").start()
    try {
      val batches = Seq(
        // b0: w1 row + the max-setter in w3 → wm after b0 = hour0+7800 (mid-w3)
        Seq((1L, t(1800), 1.0), (2L, t(8400), 1.0)),
        // b1 under wm 7800: straggler ts 7500 < wm but w3 open → COUNTS;
        // w2 row (end 7200 <= wm) → DROPPED; max-setter 11400 (w4) → wm 10800
        Seq((3L, t(7500), 1.0), (4L, t(3700), 1.0), (5L, t(11400), 1.0)),
        // b2 under wm 10800: exact tie — w3 end == wm → DROPPED; w4 row counts
        Seq((6L, t(9000), 1.0), (7L, t(11000), 1.0)),
        // b3: far-future sentinel closes every real window; its own never emits
        Seq((-1L, t(200000), 0.0)),
        Seq.empty)
      batches.foreach { b => ms.addData(b); q.processAllAvailable() }
    } finally q.stop()
    val got = spark.table("t_stream13_tie")
      .collect().map(r => r.getLong(0) - hour0 -> r.getLong(1)).toMap
    assert(got === Map(0L -> 1L, 7200L -> 2L, 10800L -> 2L),
      s"watermark contract violated: $got")
  }

  test("stream16: chopped multi-batch register fold equals the one-shot sketch; finish matches d19") {
    graft.functions.Hashing.register(spark)
    val Dd = graft.queries.Dedup
    val sf01 = "/root/testdata/sf0.01"
    val docs = graft.Tables(spark, sf01, "documents")
    // stage as 3 files; maxFilesPerTrigger=1 → 3 micro-batches with
    // an uncontrolled doc→batch split (arrival-order invariance)
    val stage = java.nio.file.Files.createTempDirectory("graft-stream16-").toString
    docs.repartition(3).write.mode("overwrite").parquet(stage)
    val schema = spark.read.parquet(stage).schema
    val chopped = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(stage)
    def regSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("bucket"),
        r.getAs[Int]("m_rho"))).toSet
    val streamed = graft.queries.DedupKernels.hllStream(spark, chopped)
    val streamedSet = regSet(streamed)
    assert(streamedSet === regSet(graft.queries.DedupKernels.hllRegisters(graft.queries.DedupKernels.hllItems(docs))),
      "3-batch folded registers diverged from the one-shot sketch")
    assert(streamedSet.nonEmpty)
    // and the artifact-served finish equals d19's batch answer
    val exact = graft.queries.DedupKernels.hllItems(docs).groupBy("source")
      .agg(countDistinct("h").as("exact_distinct"))
    val fromArtifact = graft.queries.DedupKernels.hllFinish(streamed, exact)
      .collect().map(_.toString).sorted
    val batch = Dd.all("d19_hll_cardinality").fn(spark, sf01)
      .collect().map(_.toString).sorted
    assert(fromArtifact === batch)
  }

  test("stream28: chopped multi-batch bucket fold equals the one-shot sketch; resample matches p24") {
    graft.functions.Hashing.register(spark)
    val PK = graft.queries.PipelineKernels
    val sf01 = "/root/testdata/sf0.01"
    val docs = graft.Tables(spark, sf01, "documents")
    // 3 files, one per micro-batch: ADD-folded bucket counts must
    // equal the one-shot sketch whatever the doc->batch split
    val stage = java.nio.file.Files.createTempDirectory("graft-stream28-").toString
    docs.repartition(3).write.mode("overwrite").parquet(stage)
    val schema = spark.read.parquet(stage).schema
    val chopped = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(stage)
    val streamed = PK.dsirStream(spark, PK.dsirFeats(chopped))
    def sketch(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("b"), r.getAs[Long]("raw_n"), r.getAs[Long]("tgt_n"))).toSet
    val streamedSet = sketch(streamed)
    assert(streamedSet === sketch(PK.dsirBuckets(PK.dsirFeats(docs))),
      "3-batch folded bucket counts diverged from the one-shot sketch")
    assert(streamedSet.nonEmpty)
    // and the artifact-served resample equals p24's batch answer
    val fromArtifact = PK.dsirFinish(streamed, PK.dsirFeats(docs))
      .collect().map(_.toString).sorted
    val batch = graft.queries.Pipeline.all("p24_dsir_resample").fn(spark, sf01)
      .collect().map(_.toString).sorted
    assert(fromArtifact === batch)
  }

  test("stream29: chopped multi-batch ledger fold equals the batch monitor; wm feed alarms, clean feed does not") {
    graft.functions.Hashing.register(spark)
    val sf01 = "/root/testdata/sf0.01"
    val docs = graft.Tables(spark, sf01, "documents")
    // 3 files, one per micro-batch: ADD-folded (lang, feed) counters
    // must equal the one-shot ledger whatever the doc->batch split
    val stage = java.nio.file.Files.createTempDirectory("graft-stream29-").toString
    docs.repartition(3).write.mode("overwrite").parquet(stage)
    val schema = spark.read.parquet(stage).schema
    val chopped = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(stage)
    val streamed = graft.streaming.StreamQueries.wmLedgerStream(spark, chopped)
      .collect().map(_.toString).sorted
    import org.apache.spark.sql.functions.sum
    val oneShot = graft.queries.TextSignals.wmDocCounts(docs)
      .groupBy("lang", "feed")
      .agg(sum("n_pairs").as("n_pairs"), sum("n_green").as("n_green"))
      .collect().map(_.toString).sorted
    assert(streamed.nonEmpty)
    assert(streamed === oneShot,
      "3-batch folded wm ledger diverged from the one-shot monitor")
    // the artifact-served alarm separates the feeds
    val alarms = graft.streaming.StreamQueries.all("stream29_wm_monitor")
      .fn(spark, sf01).collect()
      .map(r => (r.getString(1), r.getLong(5))).groupBy(_._1)
    assert(alarms("feed_wm").forall(_._2 == 1L), "watermarked feed did not alarm")
    assert(alarms("feed_clean").forall(_._2 == 0L), "clean feed false-alarmed")
  }

  test("stream22: chopped multi-batch sample fold equals the one-shot bottom-k sample") {
    graft.functions.Hashing.register(spark)
    val sf01 = "/root/testdata/sf0.01"
    val docs = graft.Tables(spark, sf01, "documents")
    // 3 files, one per micro-batch: bottom-k of the union must equal
    // the fold of per-batch bottom-k's whatever the doc->batch split
    val stage = java.nio.file.Files.createTempDirectory("graft-stream22-").toString
    docs.repartition(3).write.mode("overwrite").parquet(stage)
    val schema = spark.read.parquet(stage).schema
    val chopped = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(stage)
    val streamed = graft.queries.PipelineKernels.sampleStream(spark, chopped)
      .select("doc_id", "lang", "source", "tag")
      .collect().map(_.toString).sorted
    val batch = graft.queries.Pipeline.all("p14_bottomk_sample").fn(spark, sf01)
      .collect().map(_.toString).sorted
    assert(streamed.length === 100)
    assert(streamed === batch,
      "3-batch folded sample diverged from the one-shot bottom-k")
  }

  test("stream23: chopped purchase arrival folds to q40's exact ledger, cents conserved") {
    val sf01 = "/root/testdata/sf0.01"
    val clicks = graft.queries.Relational.events(spark, sf01)
      .where("event_type = 'click'")
    val purchases = graft.queries.Relational.events(spark, sf01)
      .where("event_type = 'purchase'")
    // 3 files, one per micro-batch: purchases split arbitrarily
    val stage = java.nio.file.Files.createTempDirectory("graft-stream23-").toString
    purchases.repartition(3).write.mode("overwrite").parquet(stage)
    val schema = spark.read.parquet(stage).schema
    val chopped = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(stage)
    val streamed = graft.streaming.StreamQueries
      .ledgerStream(spark, chopped, clicks)
      .collect().map(r => (r.getAs[Long]("cid"), r.getAs[Long]("user_id")) ->
        ((r.getAs[Long]("n_credits"), r.getAs[Long]("attributed_cents")))).toMap
    val batch = graft.queries.Relational.all("q40_attribution").fn(spark, sf01)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(streamed === batch,
      "3-batch folded ledger diverged from the one-shot allocation")
    assert(streamed.nonEmpty)
  }

  test("stream25: chopped site arrival probes equal the batch spatial join") {
    val sf01 = "/root/testdata/sf0.01"
    // the PROBES arrive in 3 separate micro-batches
    // (maxFilesPerTrigger=1 over 3 staged files) and the stateless
    // probe/explode/grid-join path must produce the same match set
    // as the one-shot drain (no probe-probe state exists to be
    // order-sensitive)
    val probes = graft.Tables(spark, sf01, "customer")
      .where("c_custkey % 5 = 0")
    val stage = java.nio.file.Files.createTempDirectory("graft-stream25-").toString
    probes.repartition(3).write.mode("overwrite").parquet(stage)
    val schema = spark.read.parquet(stage).schema
    val chopped = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(stage)
    val streamed = graft.streaming.StreamQueries
      .geoProbeStream(spark, sf01, chopped, "g_stream25_chop")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = graft.SparkEntry.queries("stream25_geo_probe")(spark, sf01)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(batch.nonEmpty)
    assert(streamed === batch,
      "3-batch chopped probe arrival diverged from the one-shot drain")
    // every probe id is from the shard range and every match is
    // within the radius
    assert(batch.forall { case (p, _, d2) => p >= 9000000L && d2 <= 400L })
  }

  test("stream24: chopped changelog arrival maintains exactly sink20's rollup") {
    val sf01 = "/root/testdata/sf0.01"
    val deltas = graft.sinks.SinkQueries.cdcDeltaRows(spark, sf01)
    val stage = java.nio.file.Files.createTempDirectory("graft-stream24-").toString
    deltas.repartition(3).write.mode("overwrite").parquet(stage)
    val schema = spark.read.parquet(stage).schema
    val chopped = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(stage)
    val artifact = graft.streaming.StreamQueries.deltaStream(spark, chopped)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // the folded artifact equals the one-shot delta aggregation
    val oneShot = deltas.groupBy("yr")
      .agg(org.apache.spark.sql.functions.sum("dn").as("dn"),
        org.apache.spark.sql.functions.sum("dc").as("dc"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(artifact === oneShot,
      "3-batch folded deltas diverged from the one-shot aggregation")
    assert(artifact.nonEmpty && artifact.keys.forall(_ >= 1996))
  }

  test("stream17: chopped multi-batch counter fold equals the one-shot CMS; finish matches t23") {
    graft.functions.Hashing.register(spark)
    val T = graft.queries.TextOpsKernels
    val sf01 = "/root/testdata/sf0.01"
    val docs = graft.Tables(spark, sf01, "documents")
    // 3 files, one per micro-batch: the counter-wise ADD fold must be
    // invariant to the uncontrolled doc→batch split
    val stage = java.nio.file.Files.createTempDirectory("graft-stream17-").toString
    docs.repartition(3).write.mode("overwrite").parquet(stage)
    val schema = spark.read.parquet(stage).schema
    val chopped = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(stage)
    def cSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Number]("r").longValue, r.getAs[Number]("cell").longValue,
        r.getAs[Number]("cnt").longValue)).toSet
    val streamed = T.cmsStream(spark, chopped)
    val streamedSet = cSet(streamed)
    assert(streamedSet === cSet(T.cmsCounters(T.cmsItems(docs))),
      "3-batch summed counters diverged from the one-shot sketch")
    assert(streamedSet.nonEmpty)
    // and the artifact-served profile equals t23's batch answer
    val fromArtifact = T.cmsFinish(streamed, T.cmsItems(docs))
      .collect().map(_.toString).sorted
    val batch = graft.queries.TextOps.all("t23_heavy_hitters").fn(spark, sf01)
      .collect().map(_.toString).sorted
    assert(fromArtifact === batch)
  }

  test("stream18: one snapshot per batch, versions nest, history stays readable after the drain") {
    val Sk = graft.sinks.Sinks
    val sf01 = "/root/testdata/sf0.01"
    val out = graft.sinks.SinkQueries.streamIngest(spark, sf01)
    val versions = Sk.manifestVersions(spark, out)
    assert(versions === Seq(1, 2, 3), s"expected one snapshot per staged file: $versions")
    // manifests strictly grow: every version's file set nests in the next
    val sets = versions.map(v => v -> Sk.readManifest(spark, out, v).toSet).toMap
    versions.sliding(2).foreach { case Seq(a, b) =>
      assert(sets(a).subsetOf(sets(b)) && sets(a) != sets(b),
        s"v$a does not nest strictly in v$b")
    }
    // each version is exactly its cumulative rows — counts ascend to the
    // full table, and row multisets nest (earlier snapshots untouched by
    // later commits)
    def keys(v: Int) = Sk.readAtVersion(spark, out, v)
      .select("o_orderkey").collect().map(_.getLong(0)).toSeq.sorted
    val k1 = keys(1); val k2 = keys(2); val k3 = keys(3)
    assert(k1.nonEmpty && k1.size < k2.size && k2.size < k3.size)
    assert(k3.size === graft.Tables(spark, sf01, "orders").count())
    def isSubMultiset(a: Seq[Long], b: Seq[Long]) = {
      val cb = b.groupBy(identity).view.mapValues(_.size)
      a.groupBy(identity).forall { case (k, v) => cb.getOrElse(k, 0) >= v.size }
    }
    assert(isSubMultiset(k1, k2) && isSubMultiset(k2, k3))
  }

  test("stream19: poisoned batch rejected at the commit boundary, no published snapshot sees it") {
    val Sk = graft.sinks.Sinks
    val sf01 = "/root/testdata/sf0.01"
    val out = graft.sinks.SinkQueries.auditedStreamIngest(spark, sf01)
    val versions = Sk.manifestVersions(spark, out)
    // 4 staged files, exactly one rejected: 3 published versions
    // (the rejected batch's number is a hole unless it was last)
    assert(versions.size === 3, s"expected 3 published versions: $versions")
    assert(versions.toSet.subsetOf(Set(1, 2, 3, 4)))
    // NO published snapshot contains a poisoned row
    versions.foreach { v =>
      assert(Sk.readAtVersion(spark, out, v)
        .where("o_custkey is null").count() === 0L,
        s"published v$v leaked a poisoned row")
    }
    // the latest snapshot is exactly the good slice
    val latest = Sk.readAtVersion(spark, out, versions.max)
      .select("o_orderkey").collect().map(_.getLong(0)).sorted
    val expected = graft.Tables(spark, sf01, "orders")
      .where("o_orderkey % 4 != 0")
      .select("o_orderkey").collect().map(_.getLong(0)).sorted
    assert(latest.toSeq === expected.toSeq)
    // orphans are exactly the poisoned batch's files, and vacuuming
    // the published history removes them without touching a snapshot
    val referenced = versions.flatMap(v => Sk.readManifest(spark, out, v)).toSet
    val orphans = Sk.dataFiles(spark, out).filterNot(referenced)
    assert(orphans.nonEmpty, "reject path produced no orphans - vacuous")
    val latestCount = Sk.readAtVersion(spark, out, versions.max).count()
    assert(Sk.vacuum(spark, out, versions) === orphans.size)
    assert(Sk.readAtVersion(spark, out, versions.max).count() === latestCount)
  }

  test("stream20: every event enriched with the version in force at ITS time, exactly once") {
    val sf01 = "/root/testdata/sf0.01"
    val got = StreamQueries.all("stream20_pit_enrich").fn(spark, sf01).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
    // exactly one enrichment per event (versions partition time)
    assert(got.length === got.map(_._1).distinct.length, "an event matched two versions")
    val events = graft.queries.Relational.events(spark, sf01)
      .selectExpr("event_id", "user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime))
    assert(got.length === events.length, "an event was dropped by the enrichment")
    // serial model: week k of an event = floor(days since 2024-01-01 / 7),
    // tier = (user*7 + k*13) % 5, valid_from = epoch of week start
    val t0 = java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli
    val gotMap = got.toMap
    events.foreach { case (eid, u, ts) =>
      val k = (ts - t0) / (7L * 86400000L)
      val (gu, vf, tier) = gotMap(eid)
      assert(gu === u)
      assert(vf === (t0 + k * 7L * 86400000L) / 1000L, s"event $eid version window")
      assert(tier === (u * 7 + k * 13) % 5, s"event $eid tier")
    }
    // the dim must genuinely be versioned: some user's tier changes
    val tiersByUser = got.groupBy(_._2._1).view.mapValues(_.map(_._2._3).distinct.size)
    assert(tiersByUser.values.exists(_ > 1), "no user changed tier - PIT join is vacuous")
  }

  test("stream21: histogram fold equals the one-shot build; streamed drift equals batch p19") {
    val sf01 = "/root/testdata/sf0.01"
    // the full streaming answer equals the batch twin row-for-row
    val streamed = StreamQueries.all("stream21_drift_monitor").fn(spark, sf01)
      .collect().map(_.toString).sorted.toSeq
    val batch = graft.queries.Pipeline.all("p19_drift_monitor").fn(spark, sf01)
      .collect().map(_.toString).sorted.toSeq
    assert(streamed === batch, "artifact-served drift diverged from the batch answer")
    // the + fold is batch-boundary-invariant: a 3-chop fold of the
    // shard equals the one-shot histogram (the merge algebra itself)
    import org.apache.spark.sql.functions.sum
    graft.functions.Hashing.register(spark)
    val P = graft.queries.PipelineKernels
    val shard = graft.queries.DedupKernels.shardDocs(graft.Tables(spark, sf01, "documents"))
      .selectExpr("doc_id", "length(text) as n_chars").cache()
    val oneShot = P.lenHist(shard, 40, 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val folded = (0 until 3)
      .map(c => P.lenHist(shard.where(s"doc_id % 3 = $c"), 40, 5).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap)
      .reduce((a, b) => (a.keySet ++ b.keySet)
        .map(k => k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap)
    assert(folded === oneShot, "3-chop histogram fold != one-shot")
    shard.unpersist()
  }
}
