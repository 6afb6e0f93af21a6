package graft.streaming

import graft.sources.avro
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import org.apache.spark.sql.types._

/** Structured-Streaming surface: the Spark-native replacement for the
  * reference's incremental Camus-style pull loop
  * (KafkaInputFormat.java offset tracking + KafkaRecordReader.java).
  * Where the reference re-runs a Hadoop job from persisted offsets,
  * Structured Streaming owns offsets/checkpoints natively; the same
  * message-log schema flows through `readStream`.
  *
  * Every transform here is streaming-legal (watermark + windowed/
  * session aggregation, flatMapGroupsWithState) and is also run in
  * batch mode by the driver's correctness gate — Spark guarantees the
  * semantics agree.
  */
object Streaming {

  /** Kafka-source schema (same as MessageLog batch builder) —
    * field-for-field the public spark-sql-kafka source layout,
    * including `timestampType` (Kafka TimestampType id: 0 =
    * CreateTime). Pinned by MessageLogSpec's wire-compat test. */
  val logSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** Tail a broker-segment directory as a stream (file source stands in
    * for format("kafka") in this container). */
  def readLogStream(spark: SparkSession, path: String): DataFrame =
    spark.readStream.schema(logSchema).parquet(path)

  /** Decode an events message-log (batch or stream) to typed columns
    * with an event-time `ts` at millisecond precision. */
  def decodeEvents(log: DataFrame): DataFrame =
    log.select(avro.from_topic(col("value"), "events").as("v"))
      .select(col("v.event_id").as("event_id"),
        timestamp_millis(col("v.ts_ms")).as("ts"),
        col("v.event_type").as("event_type"),
        col("v.user_id").as("user_id"),
        col("v.value").as("value"))

  /** Event-time windowed aggregation (tumbling when `slide` is None).
    * Watermark bounds state; in batch it is a documented no-op. */
  def windowedCounts(events: DataFrame, windowDur: String,
      slide: Option[String] = None, watermark: String = "2 hours"): DataFrame = {
    val win = slide.map(s => window(col("ts"), windowDur, s))
      .getOrElse(window(col("ts"), windowDur))
    events.withWatermark("ts", watermark)
      .groupBy(win.as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .select(unix_millis(col("w.start")).as("ws_ms"), col("event_type"),
        col("n"), col("sum_value"))
  }

  /** Gap-based session aggregation via the native session_window
    * (streaming-capable with watermark). */
  def sessionWindows(events: DataFrame, gap: String,
      watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), unix_millis(col("sw.start")).as("session_start_ms"),
        col("n_events"))

  /** Stream-stream interval join: clicks matched to same-user errors
    * within `lookback` before the error. Both sides carry watermarks
    * and the join condition bounds event time on both, so Structured
    * Streaming can expire join state — the Append-mode-legal shape.
    * State per key is O(events within watermark), not the stream
    * history; in batch the same plan is a plain equi+range join.
    */
  def correlatedClicks(events: DataFrame, lookback: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame = {
    val errors = events.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("ts").as("e_ts"))
      .withWatermark("e_ts", watermark)
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", watermark)
    clicks.join(errors,
        col("c_user") === col("e_user") &&
          col("c_ts") >= col("e_ts") - expr(s"INTERVAL $lookback") &&
          col("c_ts") <= col("e_ts"))
      .select(col("e_user").as("user_id"),
        unix_millis(col("e_ts")).as("error_ts_ms"),
        unix_millis(col("c_ts")).as("click_ts_ms"))
  }

  /** Streaming rate-spike alerting: hourly counts per event_type
    * (event-time window, watermark-bounded state) scored against a
    * STATIC threshold table (median + 3·MAD per type, refreshed
    * offline — the production split: heavy robust statistics run
    * batch-side, the stream pays one windowed count plus a broadcast
    * join). Batch: identical plan, drives the driver row against
    * q_spike's own oracle. */
  def rateAlerts(events: DataFrame, thresholds: DataFrame,
      watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("event_type"),
        expr("unix_millis(w.start) div 3600000").as("bucket"), col("n"))
      .join(broadcast(thresholds), Seq("event_type"))
      .withColumn("is_spike", col("n") > col("med") + lit(3) * col("mad"))
      .select(col("event_type"), col("bucket"), col("n"), col("med"),
        col("mad"), col("is_spike"))

  /** LEFT OUTER leg of the interval correlation: every error paired
    * with each click in its lookback, or emitted once with NULL
    * click_ts_ms when none arrived — "errors with no preceding
    * interaction", the alerting shape. Streaming-legal for outer
    * interval joins: both sides watermarked + both event times
    * bounded by the condition, so the engine can emit the unmatched
    * left row once the watermark passes its window (batch: a plain
    * left outer equi+range join, which is what the oracle replays). */
  def unansweredErrors(events: DataFrame, lookback: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame = {
    val errors = events.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("ts").as("e_ts"))
      .withWatermark("e_ts", watermark)
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", watermark)
    errors.join(clicks,
        col("c_user") === col("e_user") &&
          col("c_ts") >= col("e_ts") - expr(s"INTERVAL $lookback") &&
          col("c_ts") <= col("e_ts"),
        "left_outer")
      .select(col("e_user").as("user_id"),
        unix_millis(col("e_ts")).as("error_ts_ms"),
        unix_millis(col("c_ts")).as("click_ts_ms"),
        col("c_ts").isNull.as("unanswered"))
  }

  /** Decode a documents message-log (batch or stream) to typed columns
    * with an event-time `ts` — the ingest half of the streaming
    * training-data pipeline. */
  def decodeDocuments(log: DataFrame): DataFrame =
    log.select(avro.from_topic(col("value"), "documents").as("v"))
      .select(col("v.doc_id").as("doc_id"),
        timestamp_millis(col("v.ts_ms")).as("ts"),
        col("v.text").as("text"),
        col("v.source").as("source"))

  /** Stage 1 of streaming ingest dedup: EXACT dedup by content hash.
    * Streaming: `dropDuplicatesWithinWatermark` — an at-least-once
    * topic redelivers messages and mirrored documents recur across
    * sources; state is bounded by the watermark horizon (a content
    * hash older than the watermark can no longer collide with
    * in-flight data). Batch: keep-FIRST by (ts, doc_id) — a window,
    * not `dropDuplicates`, because dropDuplicates' survivor is
    * partition-order-dependent and a nondeterministic representative
    * row breaks run-to-run and batch-vs-stream comparisons whenever
    * duplicate texts differ in metadata (the mirrored-document case).
    * The surviving hash SET is identical either way; streaming's
    * representative is the first row processed, which equals the
    * batch choice when delivery follows event time. */
  def dedupedDocs(docs: DataFrame, watermark: String = "2 hours"): DataFrame = {
    val hashed = docs.withColumn("content_hash", md5(col("text")))
    if (hashed.isStreaming)
      hashed.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark("content_hash")
    else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("content_hash")).orderBy(col("ts"), col("doc_id"))
      hashed.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1).drop("_rn")
    }
  }

  /** Stage 2: NEAR-dup flagging of the incoming stream against a
    * static reference corpus (the already-curated training set) — the
    * streaming-legal shape of MinHash dedup. A stream-stream self-join
    * over band buckets is not what ingest needs; what it needs is "is
    * this new document a near-copy of anything we already kept?", and
    * that is a stream-STATIC equi-join on MinHash band keys (the
    * static band index is built once; at scale it is the bucketed/
    * pre-partitioned side), followed by the same codegen'd
    * exact-Jaccard verification the batch path runs
    * ([[graft.operators.Dedup.minhashPairs]] — same kernels, same
    * S-curve). Emits one verified `(doc_id, ref_id, jaccard)` pair per
    * colliding band set; duplicates across bands collapse via
    * within-watermark dedup on the pair key (batch: plain distinct).
    *
    * `numHashes`/`bands` default to AUTO (-1), sized from the
    * REFERENCE side ([[graft.operators.Dedup.autoMinhashRows]] /
    * `autoMinhashBands` — per incoming doc the background-collision
    * candidate count grows linearly with the reference at any fixed
    * shape, and it is the reference whose size the curve must answer;
    * the legacy 64/16 is recovered up to ~126k reference docs). AUTO
    * costs one count() of the (static, batch-side) reference UNLESS
    * `refCountHint` (> 0) supplies it — a long-running ingest job
    * knows its reference count. Pass numHashes AND bands together to
    * pin a shape; half-pinned shapes are rejected like the batch
    * operators'. */
  def nearDupAgainstReference(docs: DataFrame, reference: DataFrame,
      shingleK: Int = 3, numHashes: Int = -1, bands: Int = -1,
      threshold: Double = 0.5, seed: Long = 42L,
      watermark: String = "2 hours", refCountHint: Long = -1L): DataFrame = {
    import graft.operators.Dedup
    import graft.plans.{HashedWordShingles, JaccardLong, MinHashBandKeys}
    import org.apache.spark.sql.graft.Bridge
    val (bandsN, rowsN) = Dedup.resolveMinhashShape(
      numHashes, bands, refCountHint, reference.count())
    def banded(df: DataFrame, idOut: String, shOut: String, keep: Seq[Column]) = {
      val sh = Bridge.column(HashedWordShingles(
        Bridge.expression(col("text")), shingleK))
      df.select((keep :+ col("doc_id").as(idOut) :+ sh.as(shOut)): _*)
        .withColumn("bkey", explode(Bridge.column(MinHashBandKeys(
          Bridge.expression(col(shOut)), bandsN, rowsN, seed))))
    }
    val s = banded(docs, "doc_id", "sh_s", Seq(col("ts")))
    val r = banded(reference, "ref_id", "sh_r", Seq.empty)
      .select(col("ref_id"), col("sh_r"), col("bkey"))
    val verified = s.join(r, Seq("bkey"))
      .filter(col("doc_id") =!= col("ref_id"))
      .select(col("ts"), col("doc_id"), col("ref_id"),
        round(Bridge.column(JaccardLong(
          Bridge.expression(col("sh_s")), Bridge.expression(col("sh_r")))), 4)
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
    if (verified.isStreaming) {
      // chained stateful stages must define the event-time watermark
      // exactly ONCE per stream: if the caller (e.g. [[dedupedDocs]])
      // already set one it propagates through the join, and redefining
      // it here would be rejected by the multiple-stateful-operator
      // checker — only a bare stream gets one applied. The existing
      // watermark must cover the `ts` column this stage's
      // dropDuplicatesWithinWatermark keys on: a watermark on some
      // OTHER event-time column would make us skip ours and leave the
      // pair-dedup state unbounded (or rejected), so fail fast instead.
      val wmCols = docs.queryExecution.analyzed.collect {
        case e: org.apache.spark.sql.catalyst.plans.logical.EventTimeWatermark =>
          e.eventTime.name
      }
      require(wmCols.isEmpty || wmCols.contains("ts"),
        s"input stream is watermarked on [${wmCols.mkString(", ")}] but " +
          "nearDupAgainstReference's pair dedup needs the event-time " +
          "watermark on `ts`; watermark the stream on `ts` or pass it in " +
          "unwatermarked")
      val wm = if (wmCols.contains("ts")) verified
               else verified.withWatermark("ts", watermark)
      wm.dropDuplicatesWithinWatermark("doc_id", "ref_id").drop("ts")
    } else verified.drop("ts").distinct()
  }

  /** [[nearDupAgainstReference]] against a PERSISTED
    * [[graft.operators.Dedup.signatureStore]]: the ingest stream
    * probes the accumulated corpus's materialized signatures — the
    * reference text is never re-read and never re-hashed, and the
    * banding shape is whatever the store was built with (read from
    * its column metadata; a bare store is rejected loudly, exactly
    * like the batch probe path). This is the steady-state ingest
    * topology at 100 TB: a nightly batch job appends new signatures
    * to the store; the streaming job only ever sees (ref_id, sh,
    * bkeys) rows. Stream-static equi-join on the exploded band keys,
    * inline exact-Jaccard verify, pair-dedup bounded by the
    * watermark; batch input takes the same plan with a plain
    * DISTINCT (and equals [[graft.operators.Dedup
    * .crossCorpusPairsStored]] by construction — the driver row's
    * oracle checks exactly that). */
  def nearDupAgainstStore(docs: DataFrame, store: DataFrame,
      threshold: Double = 0.5,
      watermark: String = "2 hours"): DataFrame = {
    import graft.operators.Dedup
    import graft.plans.{HashedWordShingles, JaccardLong, MinHashBandKeys}
    import org.apache.spark.sql.graft.Bridge
    val (shingleK, b, r, seed) = Dedup.storeShape(store)
    val s = docs.select(col("ts"), col("doc_id"),
      Bridge.column(HashedWordShingles(
        Bridge.expression(col("text")), shingleK)).as("sh_s"))
      .withColumn("bkey", explode(Bridge.column(MinHashBandKeys(
        Bridge.expression(col("sh_s")), b, r, seed))))
    val ref = store.select(col("ref_id"), col("sh").as("sh_r"),
      explode(col("bkeys")).as("bkey"))
    val verified = s.join(ref, Seq("bkey"))
      .filter(col("doc_id") =!= col("ref_id"))
      .select(col("ts"), col("doc_id"), col("ref_id"),
        round(Bridge.column(JaccardLong(
          Bridge.expression(col("sh_s")), Bridge.expression(col("sh_r")))), 4)
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
    if (verified.isStreaming) {
      val wmCols = docs.queryExecution.analyzed.collect {
        case e: org.apache.spark.sql.catalyst.plans.logical.EventTimeWatermark =>
          e.eventTime.name
      }
      require(wmCols.isEmpty || wmCols.contains("ts"),
        s"input stream is watermarked on [${wmCols.mkString(", ")}] but " +
          "nearDupAgainstStore's pair dedup needs the event-time " +
          "watermark on `ts`; watermark the stream on `ts` or pass it in " +
          "unwatermarked")
      val wm = if (wmCols.contains("ts")) verified
               else verified.withWatermark("ts", watermark)
      wm.dropDuplicatesWithinWatermark("doc_id", "ref_id").drop("ts")
    } else verified.drop("ts").distinct()
  }

  /** At-least-once-delivery dedup: keep one row per `event_id`,
    * with state bounded by the watermark (an id re-delivered within
    * the watermark horizon is dropped; state for older ids expires —
    * the standard exactly-once-ingest building block over a Kafka
    * source). Batch rejects the within-watermark variant outright, so
    * it takes its documented batch equivalent, plain dropDuplicates. */
  def dedupedEvents(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark("event_id")
    else events.dropDuplicates("event_id")

  // ---- custom state: transformWithState (state API v2) ----

  case class UserEvent(user_id: Long, value: Double)
  case class UserTotals(user_id: Long, n_events: Long, total_value: Double)

  /** Per-key running totals on the Spark 4 arbitrary-state API: typed
    * `ValueState` in the state store (RocksDB-backed under streaming),
    * updated per micro-batch, current totals re-emitted on every batch
    * that touches the key. The v2 replacement for the
    * [[sessionizeWithState]]-style flatMapGroupsWithState path —
    * explicit state variables with per-variable TTL instead of one
    * opaque state object. */
  class RunningTotalsProcessor
      extends StatefulProcessor[Long, UserEvent, UserTotals] {
    @transient private var totals: ValueState[(Long, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[(Long, Double)]("totals",
        org.apache.spark.sql.Encoders.product[(Long, Double)], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[UserEvent],
        timers: TimerValues): Iterator[UserTotals] = {
      var (n, sum) = if (totals.exists()) totals.get() else (0L, 0.0)
      rows.foreach { e => n += 1; sum += e.value }
      totals.update((n, sum))
      Iterator(UserTotals(key, n, sum))
    }
  }

  /** Shared preflight for every transformWithState entry point. The v2
    * state API requires the RocksDB provider even in batch —
    * GraftSession sets it session-wide (mutating it here would silently
    * switch the provider for every later query in the session); fail
    * fast with the remedy if a custom session didn't. Batch also skips
    * the streaming path that would have registered the driver's
    * state-store coordinator endpoint, so register it here. */
  private def prepareStateV2(session: org.apache.spark.sql.SparkSession): Unit = {
    val provider = session.conf
      .get("spark.sql.streaming.stateStore.providerClass", "")
    require(provider.contains("RocksDBStateStoreProvider"),
      "transformWithState requires the RocksDB state-store provider; " +
        "build the session via GraftSession or set " +
        "spark.sql.streaming.stateStore.providerClass to RocksDBStateStoreProvider")
    org.apache.spark.sql.graft.Bridge.ensureStateStoreCoordinator(session)
  }

  /** Apply [[RunningTotalsProcessor]] to a decoded events frame. */
  def runningTotals(events: DataFrame): Dataset[UserTotals] = {
    import events.sparkSession.implicits._
    prepareStateV2(events.sparkSession)
    events.select(col("user_id"), col("value")).as[UserEvent]
      .groupByKey(_.user_id)
      .transformWithState(new RunningTotalsProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  case class UserEventCents(user_id: Long, cents: Long)
  case class UserTotalsCents(user_id: Long, n_events: Long, total_cents: Long)

  /** [[RunningTotalsProcessor]] in exact integer cents — the
    * driver-checkable variant: a per-key Double accumulation is
    * summation-order-dependent and can't be hash-compared across
    * engines, a Long one can. */
  class RunningCentsProcessor
      extends StatefulProcessor[Long, UserEventCents, UserTotalsCents] {
    @transient private var totals: ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[(Long, Long)]("totals",
        org.apache.spark.sql.Encoders.product[(Long, Long)], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[UserEventCents],
        timers: TimerValues): Iterator[UserTotalsCents] = {
      var (n, sum) = if (totals.exists()) totals.get() else (0L, 0L)
      rows.foreach { e => n += 1; sum += e.cents }
      totals.update((n, sum))
      Iterator(UserTotalsCents(key, n, sum))
    }
  }

  /** Per-user event totals through [[RunningCentsProcessor]]. Batch and
    * streaming share the processor: the driver's batch gate checks the
    * arithmetic, StreamingSpec checks cross-micro-batch state. */
  def runningCents(events: DataFrame): Dataset[UserTotalsCents] = {
    import events.sparkSession.implicits._
    prepareStateV2(events.sparkSession)
    events.select(col("user_id"),
        round(col("value") * 100).cast("long").as("cents")).as[UserEventCents]
      .groupByKey(_.user_id)
      .transformWithState(new RunningCentsProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  // ---- custom state: streaming last-touch attribution ----

  case class TouchEvent(user_id: Long, event_id: Long, ts_ms: Long,
      event_type: String)
  case class AttributedPurchase(user_id: Long, purchase_id: Long,
      ts_ms: Long, channel: String)

  /** Per-user last-touch attribution as a streaming state machine: the
    * candidate touch (ts, channel code) is the ONLY state — O(1) per
    * user regardless of history length — and every purchase is
    * attributed at arrival, the online mirror of q_attribution's
    * batch window. Rows within one call sort by (ts_ms, event_id),
    * the batch oracle's frame order; across micro-batches the premise
    * is the same offset-follows-event-time contract the streaming
    * SCD-2 replay documents (a cross-batch late touch would need the
    * hold machinery to absorb). */
  class LastTouchProcessor(lookbackMs: Long = 1800000L)
      extends StatefulProcessor[Long, TouchEvent, AttributedPurchase] {
    @transient private var lastTouch: ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      lastTouch = getHandle.getValueState[(Long, Long)]("last_touch",
        org.apache.spark.sql.Encoders.product[(Long, Long)], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[TouchEvent],
        timers: TimerValues): Iterator[AttributedPurchase] = {
      val buf = rows.toArray.sortBy(e => (e.ts_ms, e.event_id))
      var lt: Option[(Long, Long)] =
        if (lastTouch.exists()) Some(lastTouch.get()) else None
      val out = scala.collection.mutable.ArrayBuffer.empty[AttributedPurchase]
      buf.foreach { e =>
        e.event_type match {
          case "click" => lt = Some((e.ts_ms, 1L))
          case "view"  => lt = Some((e.ts_ms, 2L))
          case "purchase" =>
            val ch = lt match {
              case Some((t, c)) if e.ts_ms - t <= lookbackMs =>
                if (c == 1L) "click" else "view"
              case _ => "direct"
            }
            out += AttributedPurchase(key, e.event_id, e.ts_ms, ch)
          case _ => ()
        }
      }
      lt.foreach(lastTouch.update)
      out.iterator
    }
  }

  /** Apply [[LastTouchProcessor]] to a decoded events frame (batch or
    * stream). */
  def lastTouch(events: DataFrame): Dataset[AttributedPurchase] = {
    import events.sparkSession.implicits._
    prepareStateV2(events.sparkSession)
    events.select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("ts_ms"), col("event_type"))
      .as[TouchEvent]
      .groupByKey(_.user_id)
      .transformWithState(new LastTouchProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  case class Transition(user_id: Long, from_type: String, to_type: String,
      ts_ms: Long, event_id: Long)

  /** Per-user event-flow transitions as a streaming state machine: the
    * ONLY state is the last event's type — O(1) per user — and every
    * arriving event emits one (from → to) edge of the transition
    * matrix at arrival, a user's first event transitioning from the
    * 'start' pseudo-state. The online mirror of q_transitions' batch
    * lag window: rows within one call sort by (ts_ms, event_id), the
    * batch frame order; across micro-batches the premise is the same
    * offset-follows-event-time contract the streaming SCD-2 replay
    * documents. */
  class TransitionProcessor
      extends StatefulProcessor[Long, TouchEvent, Transition] {
    @transient private var lastType: ValueState[String] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      lastType = getHandle.getValueState[String]("last_type",
        org.apache.spark.sql.Encoders.STRING, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[TouchEvent],
        timers: TimerValues): Iterator[Transition] = {
      val buf = rows.toArray.sortBy(e => (e.ts_ms, e.event_id))
      var prev = if (lastType.exists()) lastType.get() else "start"
      val out = buf.map { e =>
        val tr = Transition(key, prev, e.event_type, e.ts_ms, e.event_id)
        prev = e.event_type
        tr
      }
      lastType.update(prev)
      out.iterator
    }
  }

  /** Apply [[TransitionProcessor]] to a decoded events frame (batch or
    * stream). */
  def transitions(events: DataFrame): Dataset[Transition] = {
    import events.sparkSession.implicits._
    prepareStateV2(events.sparkSession)
    events.select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("ts_ms"), col("event_type"))
      .as[TouchEvent]
      .groupByKey(_.user_id)
      .transformWithState(new TransitionProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  case class StageReach(user_id: Long, stage: Long, event_type: String,
      ts_ms: Long)

  /** Per-user streaming FUNNEL state machine: the state is the
    * first-reach timestamp triple (t_view, t_click, t_purchase) —
    * O(1) per user — and a stage emits exactly once, the moment its
    * first qualifying event arrives (click strictly after the first
    * view, purchase strictly after that click — [[graft.operators
    * .Relational.qFunnel]]'s semantics verbatim, so the aggregated
    * counts share its oracle). In event-time order the first
    * qualifying event IS the min-ts event the batch plan selects;
    * across micro-batches the premise is the offset-follows-event-time
    * contract the streaming SCD-2 replay documents. */
  class FunnelProcessor
      extends StatefulProcessor[Long, TouchEvent, StageReach] {
    @transient private var stages: ValueState[(Long, Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      stages = getHandle.getValueState[(Long, Long, Long)]("funnel_stages",
        org.apache.spark.sql.Encoders.product[(Long, Long, Long)],
        TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[TouchEvent],
        timers: TimerValues): Iterator[StageReach] = {
      val buf = rows.toArray.sortBy(e => (e.ts_ms, e.event_id))
      var (t1, t2, t3) =
        if (stages.exists()) stages.get() else (-1L, -1L, -1L)
      val out = scala.collection.mutable.ArrayBuffer.empty[StageReach]
      buf.foreach { e =>
        e.event_type match {
          case "view" if t1 < 0 =>
            t1 = e.ts_ms; out += StageReach(key, 1L, "view", e.ts_ms)
          case "click" if t1 >= 0 && t2 < 0 && e.ts_ms > t1 =>
            t2 = e.ts_ms; out += StageReach(key, 2L, "click", e.ts_ms)
          case "purchase" if t2 >= 0 && t3 < 0 && e.ts_ms > t2 =>
            t3 = e.ts_ms; out += StageReach(key, 3L, "purchase", e.ts_ms)
          case _ => ()
        }
      }
      stages.update((t1, t2, t3))
      out.iterator
    }
  }

  /** Apply [[FunnelProcessor]] to a decoded events frame (batch or
    * stream). */
  def funnelStages(events: DataFrame): Dataset[StageReach] = {
    import events.sparkSession.implicits._
    prepareStateV2(events.sparkSession)
    events.select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("ts_ms"), col("event_type"))
      .as[TouchEvent]
      .groupByKey(_.user_id)
      .transformWithState(new FunnelProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  case class TopKEntry(event_type: String, user_id: Long, est: Long,
      err: Long, rnk: Long)

  /** SpaceSaving streaming HEAVY HITTERS (Metwally, Agrawal, El Abbadi
    * 2005): per event type, a BOUNDED table of `capacity` counters is
    * the entire state — an arriving user increments its counter,
    * a new user beyond capacity REPLACES the minimum counter,
    * inheriting its count + 1 with the inherited part recorded as
    * `err`. The table is O(capacity) regardless of stream length and
    * carries the paper's three guarantees, all pinned by the oracled
    * contract row: est ≥ true count (never undercounts), est − err ≤
    * true count, and any user whose true count exceeds the minimum
    * counter IS in the table (coverage — an evicted user's true count
    * never exceeds the minimum). Fully deterministic: arrivals
    * process in (ts, event_id) order and the victim is min by
    * (count, user_id). Emits the top-`k` per type by (est desc,
    * user_id) at each batch close. */
  class SpaceSavingProcessor(capacity: Int, k: Int)
      extends StatefulProcessor[String, TouchEvent, TopKEntry] {
    @transient private var counters: ListState[(Long, Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counters = getHandle.getListState[(Long, Long, Long)]("ss_counters",
        org.apache.spark.sql.Encoders.product[(Long, Long, Long)],
        TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[TouchEvent],
        timers: TimerValues): Iterator[TopKEntry] = {
      val m = scala.collection.mutable.Map.empty[Long, (Long, Long)]
      counters.get().foreach { case (u, c, e) => m(u) = (c, e) }
      rows.toArray.sortBy(e => (e.ts_ms, e.event_id)).foreach { ev =>
        m.get(ev.user_id) match {
          case Some((c, e)) => m(ev.user_id) = (c + 1, e)
          case None if m.size < capacity => m(ev.user_id) = (1L, 0L)
          case None =>
            val (vu, (vc, _)) = m.minBy { case (u, (c, _)) => (c, u) }
            m.remove(vu)
            m(ev.user_id) = (vc + 1, vc)
        }
      }
      counters.put(m.toArray.sortBy(_._1)
        .map { case (u, (c, e)) => (u, c, e) })
      m.toSeq.sortBy { case (u, (c, _)) => (-c, u) }.take(k)
        .zipWithIndex.map { case ((u, (c, e)), i) =>
          TopKEntry(key, u, c, e, i + 1L)
        }.iterator
    }
  }

  /** Apply [[SpaceSavingProcessor]] to a decoded events frame (batch
    * or stream), keyed by event type. */
  def spaceSavingTopK(events: DataFrame, capacity: Int = 64,
      k: Int = 10): Dataset[TopKEntry] = {
    import events.sparkSession.implicits._
    prepareStateV2(events.sparkSession)
    events.select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("ts_ms"), col("event_type"))
      .as[TouchEvent]
      .groupByKey(_.event_type)
      .transformWithState(new SpaceSavingProcessor(capacity, k),
        TimeMode.None(), OutputMode.Append())
  }

  case class DayCount(event_type: String, day: Long, n: Long)

  case class CusumPoint(event_type: String, day: Long, n: Long,
      cusum: Long, is_shift: Boolean)

  /** Per-type streaming CUSUM (Page 1954) drift monitor: state is ONE
    * integer — the running upper-CUSUM s = max(0, s + m·n − total) —
    * per event type, with the reference rate (total, m) supplied as a
    * CALIBRATION ARTIFACT at construction (the standard CUSUM
    * deployment: the reference mean comes from a prior calibration
    * window, not from the stream itself — a stream cannot know its
    * own future mean). Input rows are CLOSED day counts (the output
    * of an upstream watermark-closed daily aggregation, the
    * offset-follows-event-time premise the other processors
    * document); alarm at s > total/2, [[graft.operators.Relational
    * .qCusum]]'s exact integer algebra, so the aggregated output
    * shares its oracle. */
  class CusumProcessor(ref: Map[String, (Long, Long)])
      extends StatefulProcessor[String, DayCount, CusumPoint] {
    @transient private var sState: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sState = getHandle.getValueState[Long]("cusum_s",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[DayCount],
        timers: TimerValues): Iterator[CusumPoint] = {
      val (total, m) = ref(key)
      var s = if (sState.exists()) sState.get() else 0L
      val out = rows.toArray.sortBy(_.day).map { r =>
        s = math.max(0L, s + m * r.n - total)
        CusumPoint(key, r.day, r.n, s, s > total / 2)
      }
      sState.update(s)
      out.iterator
    }
  }

  /** Apply [[CusumProcessor]] to a (event_type, day, n) day-count
    * frame (batch or stream), keyed by type. */
  def cusumPoints(dayCounts: DataFrame,
      ref: Map[String, (Long, Long)]): Dataset[CusumPoint] = {
    import dayCounts.sparkSession.implicits._
    prepareStateV2(dayCounts.sparkSession)
    dayCounts.select(col("event_type"), col("day"), col("n"))
      .as[DayCount]
      .groupByKey(_.event_type)
      .transformWithState(new CusumProcessor(ref),
        TimeMode.None(), OutputMode.Append())
  }

  // ---- custom state: streaming SCD-2 interval maintenance ----

  case class TypedEvent(user_id: Long, event_id: Long, ts_ms: Long,
      event_type: String)
  case class ClosedInterval(user_id: Long, event_type: String,
      valid_from_ms: Long, valid_to_ms: Long, n_events: Long)
  // (type, from_ms, n, last-accepted ts) of the island still open for
  // the key — last_ms is the out-of-order detector: any later-arriving
  // event with ts_ms < last_ms would have changed already-emitted
  // history. NOTE: adding last_ms changed the ValueState schema — a
  // streaming query checkpointed under the 3-field shape fails state
  // restore on upgrade and must replay from a fresh checkpoint (no
  // migration; the topic replay rebuilds open islands deterministically)
  case class OpenIsland(event_type: String, from_ms: Long, n: Long,
      last_ms: Long)

  /** Streaming SCD-2: maintains each user's CURRENT event_type island
    * in a typed ValueState and emits an interval the moment the type
    * CHANGES — the incremental build of [[graft.operators.Relational
    * .qScd2]]'s gaps-and-islands table, i.e. streaming CDC into a
    * slowly-changing dimension. Only CLOSED intervals are emitted
    * (valid_to = the succeeding island's start, exactly the batch
    * lead()); the open island stays in state until a later event — or
    * in batch, end-of-input — closes it, so stream and batch emit the
    * identical closed set when delivery follows event time
    * (StreamingSpec-asserted over a replayed topic). Rows inside one
    * handleInputRows call sort by (ts_ms, event_id) — the same total
    * order the batch window uses.
    *
    * Event-time order ACROSS micro-batches is a premise the processor
    * cannot restore (an interval already emitted is history) — so it
    * is now CHECKED, not assumed: an event older than the open
    * island's last accepted ts either fails the query loudly (default;
    * the corrupt-dimension alternative was negative-length or
    * overlapping intervals, silently) or — with `dropLate = true` —
    * is skipped and counted in `lateCounter`, the explicit
    * late-drop-accounting contract. Ties (ts_ms equal to the island's
    * last ts) stay accepted: cross-batch tie ORDER is unknowable at
    * the processor, matching the batch window's event_id tie-break
    * only when ties arrive together — the same caveat as any
    * at-least-once CDC consumer. For a topic with BOUNDED disorder,
    * [[Scd2HoldProcessor]] is the third policy: it holds events until
    * the event-time watermark passes them (TimeMode.EventTime +
    * timers), absorbing any reorder inside the watermark delay at the
    * cost of emission latency; loud-or-counted remains the right
    * contract for an offset-ordered source (the reference delivers in
    * offset order, and event time diverges from offset order in real
    * topics — which is exactly when this detector fires). */
  class Scd2Processor(dropLate: Boolean = false,
      lateCounter: Option[org.apache.spark.util.LongAccumulator] = None)
      extends StatefulProcessor[Long, TypedEvent, ClosedInterval] {
    @transient private var open: ValueState[OpenIsland] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[OpenIsland]("open",
        org.apache.spark.sql.Encoders.product[OpenIsland], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[TypedEvent],
        timers: TimerValues): Iterator[ClosedInterval] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts_ms, e.event_id))
      val (cur, closed) = foldIslands(key,
        if (open.exists()) Option(open.get()) else None, sorted,
        // late cross-batch event: accepting it would rewrite emitted
        // history (within a batch, sorting makes this unreachable)
        (e, s) => {
          if (!dropLate) throw new IllegalStateException(
            s"graft: out-of-order delivery for user $key: event " +
              s"${e.event_id} at ts_ms=${e.ts_ms} arrived after the open " +
              s"island had advanced to ${s.last_ms} — deliver in " +
              "event-time order or run with dropLate = true")
          lateCounter.foreach(_.add(1L))
        })
      cur.foreach(open.update)
      closed.iterator
    }
  }

  /** The island state machine both SCD-2 processors fold events
    * through — ONE implementation so the hold processor's flush and
    * the direct processor's batch can never diverge: extend the open
    * island on same-type, close-and-reopen on type change, `onLate`
    * (then skip) for an event behind the island's last accepted ts.
    * `sorted` must be (ts_ms, event_id)-ascending. */
  private def foldIslands(key: Long, start: Option[OpenIsland],
      sorted: Seq[TypedEvent], onLate: (TypedEvent, OpenIsland) => Unit)
      : (Option[OpenIsland], Seq[ClosedInterval]) = {
    val out = Seq.newBuilder[ClosedInterval]
    var cur = start
    sorted.foreach { e =>
      cur match {
        case Some(s) if e.ts_ms < s.last_ms => onLate(e, s)
        case Some(s) if s.event_type == e.event_type =>
          cur = Some(s.copy(n = s.n + 1, last_ms = e.ts_ms))
        case Some(s) =>
          out += ClosedInterval(key, s.event_type, s.from_ms, e.ts_ms, s.n)
          cur = Some(OpenIsland(e.event_type, e.ts_ms, 1, e.ts_ms))
        case None =>
          cur = Some(OpenIsland(e.event_type, e.ts_ms, 1, e.ts_ms))
      }
    }
    (cur, out.result())
  }

  /** SCD-2 input row for the watermark-hold processor: keeps the
    * event-time TIMESTAMP column (the watermark rides the column's
    * event-time attribute, which `unix_millis` projection would strip
    * before transformWithState's EventTime-mode validation sees it). */
  case class HeldEvent(user_id: Long, event_id: Long, ts: java.sql.Timestamp,
      event_type: String)

  /** Max-gauge accumulator (AccumulatorV2 semantics: add keeps the
    * maximum, merge takes the larger side) — the vehicle for
    * operator-level latency gauges the engine's progress metrics
    * don't carry. `value` is Long.MinValue until first recorded. */
  class MaxAccumulator extends org.apache.spark.util.AccumulatorV2[Long, Long] {
    private var _v: Long = Long.MinValue
    override def isZero: Boolean = _v == Long.MinValue
    override def copy(): MaxAccumulator = {
      val c = new MaxAccumulator; c._v = _v; c
    }
    override def reset(): Unit = _v = Long.MinValue
    override def add(v: Long): Unit = if (v > _v) _v = v
    override def merge(other: org.apache.spark.util.AccumulatorV2[Long, Long]): Unit =
      add(other.value)
    override def value: Long = _v
  }

  /** The reorder-TOLERANT streaming SCD-2 policy ([[Scd2Processor]]'s
    * scaladoc third mode, now code): events buffer in a per-key
    * ListState until the event-time watermark passes them, then flush
    * through the SAME island state machine ([[foldIslands]]) in
    * (ts, event_id) order — so any disorder INSIDE the watermark delay
    * is absorbed and the emitted closed set equals the in-order
    * replay's, delayed by the watermark lag. An event whose ts is
    * already behind the watermark when it arrives (disorder the delay
    * was too small for) is filtered BEFORE the operator by the
    * engine's late-row filter and counted in the standard
    * `numRowsDroppedByWatermark` state-operator metric
    * (StreamingSpec proves the operator never sees such rows) —
    * monitor that, exactly as for any watermarked aggregation.
    *
    * Mechanics: one timer per key at the earliest buffered event time
    * (kept in `nextTs` so input batches never re-read the buffer);
    * when the watermark passes it, the expired-timer callback
    * partitions the buffer at the CURRENT watermark, folds the ready
    * prefix into [[OpenIsland]], records the flush boundary in
    * `flushedTo`, and re-arms the timer at the earliest remaining
    * event. Per-key state is O(events inside the watermark horizon) —
    * the same bound as any event-time stateful operator.
    *
    * The input side buffers EVERYTHING the engine admits, gated only
    * by the key's own `flushedTo` boundary — deliberately NOT by
    * `TimerValues.getCurrentWatermarkInMs()`: that value is the
    * EVICTION watermark, which can run one batch AHEAD of the
    * late-row filter's watermark under back-to-back data batches
    * (Spark's two-watermark plumbing), and a guard on it would
    * silently discard an admitted event in the gap — uncounted by the
    * engine metric AND absent from history. Any admitted event with
    * ts >= flushedTo folds correctly (the next flush sorts it in);
    * ts < flushedTo would rewrite emitted history and is dropped as
    * defense in depth (unreachable under the engine's filter
    * invariant: admitted rows are never behind the last flush
    * boundary, because flushes never pass the late-filter
    * watermark). */
  class Scd2HoldProcessor(lagMetric: Option[MaxAccumulator] = None)
      extends StatefulProcessor[Long, HeldEvent, ClosedInterval] {
    @transient private var open: ValueState[OpenIsland] = _
    @transient private var buf: ListState[TypedEvent] = _
    @transient private var nextTs: ValueState[Long] = _
    @transient private var flushedTo: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      open = getHandle.getValueState[OpenIsland]("open",
        org.apache.spark.sql.Encoders.product[OpenIsland], TTLConfig.NONE)
      buf = getHandle.getListState[TypedEvent]("buf",
        org.apache.spark.sql.Encoders.product[TypedEvent], TTLConfig.NONE)
      nextTs = getHandle.getValueState[Long]("nextTs",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
      flushedTo = getHandle.getValueState[Long]("flushedTo",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[HeldEvent],
        timers: TimerValues): Iterator[ClosedInterval] = {
      val floor = if (flushedTo.exists()) flushedTo.get() else Long.MinValue
      val fresh = rows.flatMap { h =>
        val e = TypedEvent(h.user_id, h.event_id, h.ts.getTime, h.event_type)
        // see scaladoc: gate on the key's flush boundary, not the
        // (eviction) watermark — ts < floor is defensively unreachable
        if (e.ts_ms < floor) None else Some(e)
      }.toArray
      if (fresh.nonEmpty) {
        buf.appendList(fresh)
        val mn = fresh.map(_.ts_ms).min
        val cur = if (nextTs.exists()) nextTs.get() else Long.MaxValue
        if (mn < cur) {
          if (cur != Long.MaxValue) getHandle.deleteTimer(cur)
          nextTs.update(mn)
          getHandle.registerTimer(mn)
        }
      }
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timers: TimerValues,
        expired: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[ClosedInterval] = {
      val wm = timers.getCurrentWatermarkInMs()
      // ts == wm stays buffered: the watermark only promises no MORE
      // data strictly below it
      val (ready, rest) = buf.get().toArray.partition(_.ts_ms < wm)
      buf.clear()
      if (rest.isEmpty) nextTs.clear()
      else {
        buf.put(rest)
        val mn = rest.map(_.ts_ms).min
        nextTs.update(mn)
        getHandle.registerTimer(mn)
      }
      if (ready.isEmpty) Iterator.empty
      else {
        // emission-latency gauge: the hold policy delays every flush
        // until the watermark passes it, so wm - oldest flushed ts IS
        // the realized event-time hold — numRowsDroppedByWatermark
        // makes the loss observable, this makes the latency observable
        lagMetric.foreach(_.add(wm - ready.iterator.map(_.ts_ms).min))
        flushedTo.update(wm)
        val (cur, closed) = foldIslands(key,
          if (open.exists()) Option(open.get()) else None,
          ready.sortBy(e => (e.ts_ms, e.event_id)).toSeq,
          // unreachable: arrivals behind the flush boundary were
          // dropped at input, and flushes are watermark-monotonic
          (e, s) => throw new IllegalStateException(
            s"graft: watermark-hold invariant broken for user $key at " +
              s"event ${e.event_id} (ts_ms=${e.ts_ms} < open island " +
              s"last_ms=${s.last_ms})"))
        cur.foreach(open.update)
        closed.iterator
      }
    }
  }

  /** Closed SCD-2 intervals from a decoded events frame (batch or
    * stream — same processor, same state semantics). `dropLate` /
    * `lateCounter` configure the out-of-order policy (see
    * [[Scd2Processor]]): default is fail-loud on late cross-batch
    * events; pass `dropLate = true` plus an accumulator to skip-and-
    * count them instead. */
  def scd2Intervals(events: DataFrame, dropLate: Boolean = false,
      lateCounter: Option[org.apache.spark.util.LongAccumulator] = None)
      : Dataset[ClosedInterval] = {
    import events.sparkSession.implicits._
    prepareStateV2(events.sparkSession)
    events.select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("ts_ms"), col("event_type")).as[TypedEvent]
      .groupByKey(_.user_id)
      .transformWithState(new Scd2Processor(dropLate, lateCounter),
        TimeMode.None(), OutputMode.Update())
  }

  /** Closed SCD-2 intervals under the watermark-hold policy (see
    * [[Scd2HoldProcessor]]): disorder inside `delay` is absorbed, every
    * close is delayed by the watermark lag, and post-watermark
    * stragglers are dropped by the engine's watermark filter and
    * counted in the standard `numRowsDroppedByWatermark` progress
    * metric. Streaming-only by construction — batch input has no
    * watermark to hold against, so nothing would ever flush; use
    * [[scd2Intervals]] for batch (the two agree on any topic whose
    * disorder stays inside `delay`).
    *
    * `lagMetric` (a registered [[MaxAccumulator]]) makes the policy's
    * deliberate delay OBSERVABLE: at every flush it records
    * watermark - oldest-flushed-ts, the realized event-time hold. On a
    * steadily-ticking topic this reads ~delay + one batch cadence; a
    * sparse key can read much higher (its events wait for the GLOBAL
    * watermark) — exactly the deployment signal that says whether the
    * delay budget or the topic's key sparsity dominates close
    * latency. */
  def scd2IntervalsHeld(events: DataFrame, delay: String = "10 minutes",
      lagMetric: Option[MaxAccumulator] = None)
      : Dataset[ClosedInterval] = {
    import events.sparkSession.implicits._
    require(events.isStreaming,
      "scd2IntervalsHeld is streaming-only (the hold policy flushes on the " +
        "event-time watermark, which batch execution never advances); use " +
        "scd2Intervals for batch input")
    prepareStateV2(events.sparkSession)
    events.select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withWatermark("ts", delay)
      .as[HeldEvent]
      .groupByKey(_.user_id)
      .transformWithState(new Scd2HoldProcessor(lagMetric),
        TimeMode.EventTime(), OutputMode.Update())
  }

  /** Stream decontamination against a STATIC benchmark set — the
    * ingest-time form of [[graft.operators.Pipeline.tContamination]]:
    * the bounded benchmark side folds into a driver bloom ONCE
    * (train-once, like the quantizer artifacts), every incoming
    * document is screened by one codegen'd pass over its gram-hash
    * array ([[graft.plans.BloomCountContained]] — no explode, no
    * shuffle, no state for the clean majority), and only SUSPECT
    * documents explode their grams into the broadcast exact-verify
    * join. Output: one row per suspect document with verified hits
    * (doc_id, n_bench_hits, n_gram_hits, contaminated) — a document
    * absent from the output is clean, the natural streaming contract
    * (alerts, not a table); the batch driver row left-joins the corpus
    * back for the full flags table. Bloom errors are one-sided and
    * false positives cannot FLAG a document — they only route it
    * through the verify join, which scores exact matches; a
    * false-positive-only suspect produces no output row. Streaming:
    * stream-static broadcast join + per-doc aggregation (update mode).
    * n_bench_hits uses size(collect_set(...)) rather than
    * countDistinct — identical result, and legal in a streaming
    * aggregation where distinct aggregates are not; the per-doc set is
    * bounded by the benchmark's document count. */
  def contaminationHits(docs: DataFrame, bench: DataFrame, gramK: Int = 8,
      expectedGrams: Long = 1L << 22, fpp: Double = 0.01): DataFrame = {
    import graft.plans.{BloomCountContained, BloomMightContain}
    import org.apache.spark.sql.graft.Bridge
    import graft.functions.MinHash
    require(!bench.isStreaming,
      "graft: contaminationHits needs a STATIC benchmark side (the bloom " +
        "and verify join are built once from it)")
    val benchGrams = bench.select(col("doc_id").as("bench_id"),
      explode(MinHash.hashedWordShingles(col("text"), gramK)).as("g"))
    val bloom = docs.sparkSession.sparkContext.broadcast(
      benchGrams.stat.bloomFilter("g", expectedGrams, fpp))
    val grams = MinHash.hashedWordShingles(col("text"), gramK)
    docs
      .withColumn("_cand", Bridge.column(BloomCountContained(
        Bridge.expression(grams), bloom)))
      .filter(col("_cand") > 0)
      .select(col("doc_id"), explode(grams).as("g"))
      .filter(Bridge.column(BloomMightContain(Bridge.expression(col("g")), bloom)))
      .join(broadcast(benchGrams), Seq("g"))
      .filter(col("doc_id") =!= col("bench_id"))
      .groupBy(col("doc_id"))
      .agg(size(collect_set(col("bench_id"))).cast("long").as("n_bench_hits"),
        count(lit(1)).as("n_gram_hits"))
      .withColumn("contaminated", col("n_bench_hits") > 0)
  }

  // ---- custom state: explicit sessionization ----

  case class SessionEvent(user_id: Long, ts_ms: Long)
  case class SessionOut(user_id: Long, session_start_ms: Long,
      session_end_ms: Long, n_events: Long)
  case class OpenSession(start: Long, last: Long, n: Long)

  /** flatMapGroupsWithState sessionization — the custom-state path for
    * session logic session_window can't express (per-event payloads,
    * custom close rules). Batch: each key's full history arrives in one
    * call. Streaming: the open session persists in GroupState and
    * closes via event-time timeout.
    */
  def sessionizeWithState(events: Dataset[SessionEvent], gapMs: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[SessionEvent], state: GroupState[OpenSession]) =>
          val sorted = it.toSeq.sortBy(e => (e.ts_ms))
          val out = Seq.newBuilder[SessionOut]
          var open = state.getOption
          sorted.foreach { e =>
            open match {
              case Some(s) if e.ts_ms - s.last < gapMs =>
                open = Some(OpenSession(s.start, e.ts_ms, s.n + 1))
              case Some(s) =>
                out += SessionOut(user, s.start, s.last + gapMs, s.n)
                open = Some(OpenSession(e.ts_ms, e.ts_ms, 1))
              case None =>
                open = Some(OpenSession(e.ts_ms, e.ts_ms, 1))
            }
          }
          // batch semantics: end of input closes the open session. A
          // streaming deployment instead keeps `open` in GroupState with
          // an EventTimeTimeout of `gapMs` past the watermark and emits
          // on timeout — same outputs, incremental arrival.
          open.foreach(s => out += SessionOut(user, s.start, s.last + gapMs, s.n))
          state.remove()
          out.result().iterator
      }
  }
}
