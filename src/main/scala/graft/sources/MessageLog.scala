package graft.sources

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The Kafka-model message log: graft's canonical representation of a
  * topic, schema-identical to the public spark-sql-kafka source
  * (`key binary, value binary, topic string, partition int,
  * offset long, timestamp timestamp, timestampType int`) — so a
  * deployment against a real Kafka cluster swaps this builder for
  * `spark.read.format("kafka")` and every downstream operator is
  * unchanged. The parity is TESTED, not asserted: MessageLogSpec pins
  * the schema field-for-field against the documented Kafka source
  * layout. `timestampType` carries Kafka's TimestampType id — 0 =
  * CreateTime, matching this producer model (event time, not broker
  * append time).
  *
  * Mirrors the reference's scan model (KafkaInputFormat.java: one split
  * per topic-partition bounded by [beginOffset, lastOffset);
  * camus/KafkaKey.java: topic/partition/offset/time metadata).
  *
  * Test-data model: the driver's `events`/`documents` tables stand in
  * for topics, with a deterministic producer model — messages keyed by
  * entity id, partition = id % numPartitions, offset = arrival order
  * within partition, value = binary Avro of the payload. On a real
  * cluster partition/offset come from the broker and no shuffle exists;
  * here the offset assignment is one window shuffle at source-build
  * time only.
  */
object MessageLog {

  val numPartitions = 8

  /** Canonical payload type of the `events` topic (all-nullable, as
    * parquet scans produce). Timestamps travel as epoch millis longs —
    * Avro-friendly and oracle-exact (floor(ns/1e6) == floor(us/1e3)).
    */
  val eventPayloadType: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts_ms", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val documentPayloadType: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("ts_ms", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  def eventSchemaJson: String =
    AvroCodec.avroSchemaFor(eventPayloadType, "Event").toString

  def documentSchemaJson: String =
    AvroCodec.avroSchemaFor(documentPayloadType, "Document").toString

  // register in the in-memory registry at class load (MemorySchemaRegistry model)
  SchemaRegistry.register("events", eventSchemaJson)
  SchemaRegistry.register("documents", documentSchemaJson)

  /** Topic-partition count for [[eventsTopic]] (and
    * [[documentsTopic]]) — ALSO the per-partition admission slack
    * bound the pull-budget oracles pin: the proportional budget split
    * rounds each non-empty partition up to one extra record, so a
    * trigger may admit up to `eventsPartitions` rows over its record
    * budget. The oracles derive their slack from THIS constant so a
    * repartitioned topic moves the pin with it instead of failing
    * spuriously on a stale magic number. */
  val eventsPartitions: Int = 8

  /** `events` as a topic. `ts` arrives as long nanos (nanosAsLong). */
  def eventsTopic(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    val withPart = ev
      .withColumn("partition",
        expr(s"cast(user_id % $eventsPartitions as int)"))
    val w = Window.partitionBy(col("partition")).orderBy(col("ts"), col("event_id"))
    withPart
      .withColumn("offset", (row_number().over(w) - 1).cast("long"))
      .select(
        col("user_id").cast("string").cast("binary").as("key"),
        avro.to_avro(
          struct(col("event_id"), expr("ts div 1000000").as("ts_ms"), col("user_id"),
            col("event_type"), col("value"), col("props")).cast(eventPayloadType),
          "Event").as("value"),
        lit("events").as("topic"),
        col("partition"),
        col("offset"),
        timestamp_micros(expr("ts div 1000")).as("timestamp"),
        lit(0).as("timestampType"))
  }

  /** `documents` as a topic (synthetic arrival time: 60 s cadence). */
  def documentsTopic(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val withPart = docs.withColumn("partition", expr("cast(doc_id % 8 as int)"))
    val w = Window.partitionBy(col("partition")).orderBy(col("doc_id"))
    withPart
      .withColumn("offset", (row_number().over(w) - 1).cast("long"))
      .withColumn("ts_ms", (lit(1704067200L) + col("doc_id") * 60L) * 1000L)
      .select(
        col("doc_id").cast("string").cast("binary").as("key"),
        avro.to_avro(
          struct(col("doc_id"), col("ts_ms"), col("text"), col("lang"),
            col("source"), col("n_chars")).cast(documentPayloadType),
          "Document").as("value"),
        lit("documents").as("topic"),
        col("partition"),
        col("offset"),
        timestamp_millis(col("ts_ms")).as("timestamp"),
        lit(0).as("timestampType"))
  }

  /** Every topic this log knows how to materialize. */
  val knownTopics: Seq[String] = Seq("documents", "events")

  /** Whitelist resolution (kafka.whitelist.topics): topics by name. */
  def topics(spark: SparkSession, sfDir: String, names: Seq[String]): DataFrame =
    names.map {
      case "events" => eventsTopic(spark, sfDir)
      case "documents" => documentsTopic(spark, sfDir)
      case other => throw new NoSuchElementException(s"graft: unknown topic '$other'")
    }.reduce(_ unionByName _)

  /** Whitelist minus blacklist (kafka.blacklist.topics,
    * KafkaInputFormat.java:52 with the filter at :254-263). An empty
    * whitelist means "all known topics", as the reference treats an
    * unset kafka.whitelist.topics.
    */
  def topics(spark: SparkSession, sfDir: String,
      whitelist: Seq[String], blacklist: Seq[String]): DataFrame = {
    val base = if (whitelist.isEmpty) knownTopics else whitelist
    val sel = base.filterNot(blacklist.toSet)
    require(sel.nonEmpty, s"graft: no topics left after blacklist $blacklist")
    topics(spark, sfDir, sel)
  }

  /** Consumption plan under kafka.move.to.last.offset.list
    * (KafkaInputFormat.java:55): per topic-partition, the start offset
    * is forced to the tail (last offset + 1 — skip the whole backlog)
    * for listed topics and the log head otherwise, with the backlog
    * that remains from that start. Aggregate-only — never shuffles the
    * message payloads, so it scales as a metadata query.
    */
  def consumptionPlan(log: DataFrame, moveToLast: Seq[String]): DataFrame =
    log.groupBy(col("topic"), col("partition"))
      .agg(max(col("offset")).as("last_offset"), count(lit(1)).as("n_total"))
      .withColumn("start_offset",
        when(col("topic").isin(moveToLast: _*), col("last_offset") + 1L)
          .otherwise(lit(0L)))
      .withColumn("backlog", col("n_total") - col("start_offset"))
      .drop("n_total")

  /** `events` topic decoded and flattened: payload columns + metadata.
    * The `select *` surface of a Kafka-backed table.
    */
  def eventsScan(spark: SparkSession, sfDir: String): DataFrame =
    eventsTopic(spark, sfDir)
      .withColumn("v", avro.from_topic(col("value"), "events"))
      .select(col("v.*"), col("topic"), col("partition"), col("offset"))

  /** Sink path (KafkaOutputFormat.java equivalent): persist a message
    * log laid out like broker segments — one directory per
    * topic/partition — and return the path. Downstream re-reads are
    * partition-pruned by the `topic`/`partition` dirs.
    */
  def writeLog(df: DataFrame, path: String): String = {
    df.write.mode("overwrite").partitionBy("topic", "partition").parquet(path)
    path
  }

  def readLog(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
