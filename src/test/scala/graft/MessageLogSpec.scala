package graft

import graft.sources.{avro, LogSegments, MessageLog}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class MessageLogSpec extends SparkSpec {

  /** The public spark-sql-kafka source schema, verbatim from the Kafka
    * connector docs ("Each row in the source has the following
    * schema"): key/value binary, topic string, partition int, offset
    * long, timestamp timestamp, timestampType int. Hard-coded here —
    * NOT derived from graft code — so the test fails if anyone drifts
    * the graft side. The connector's optional 8th column (`headers`
    * array<struct<key string, value binary>>) only appears under
    * `includeHeaders=true`; graft's model carries no headers, which
    * matches the connector's DEFAULT surface exactly. */
  private val kafkaSourceSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  test("wire compat: every graft log schema is field-for-field the Kafka source schema") {
    // the one-line-swap claim (SURVEY §3): swapping this builder for
    // spark.read.format("kafka") must change NOTHING downstream, so
    // names, types, and order must match exactly...
    val frames = Seq(
      "MessageLog.eventsTopic" -> MessageLog.eventsTopic(spark, sf).schema,
      "MessageLog.documentsTopic" -> MessageLog.documentsTopic(spark, sf).schema,
      "Streaming.logSchema" -> streaming.Streaming.logSchema,
      "LogSegmentSource.schema" -> sources.LogSegmentSource.schema)
    for ((name, got) <- frames) {
      assert(got.fields.length === kafkaSourceSchema.fields.length, name)
      got.fields.zip(kafkaSourceSchema.fields).foreach { case (g, k) =>
        assert(g.name === k.name, s"$name: field name drift")
        assert(g.dataType === k.dataType, s"$name.${k.name}: type drift")
        // ...and nullability must be write-compatible: the Kafka source
        // declares every field nullable, so graft may be equal or
        // STRICTER (non-null), never more nullable than Kafka
        assert(!g.nullable || k.nullable,
          s"$name.${k.name}: more nullable than the Kafka source")
      }
    }
    // and the actually-produced rows carry CreateTime (Kafka
    // TimestampType id 0) — the producer-event-time contract
    val tt = MessageLog.eventsTopic(spark, sf)
      .select(col("timestampType")).distinct().collect()
    assert(tt.map(_.getInt(0)).toSeq === Seq(0))
  }

  /** The other half of the one-line-swap claim: a user moving to a
    * real cluster rewrites OPTIONS, not queries. This pins the option
    * compatibility map and executes the two semantics that could
    * silently differ. Provenance for the kafka side: the public Spark
    * "Structured Streaming + Kafka Integration Guide" (kafka source
    * options table) — `startingOffsets` per-partition json is
    * INCLUSIVE, `endingOffsets` is EXCLUSIVE, `maxOffsetsPerTrigger`
    * rate-limits a micro-batch. The spark-sql-kafka jar itself is not
    * resolvable in this offline sandbox (zero egress; /opt/spark/jars
    * carries no kafka connector), so the contract is pinned against
    * the documented public surface rather than the connector's schema
    * constant — same discipline as [[kafkaSourceSchema]] above. */
  test("swap map: graft-log options carry the kafka connector's semantics") {
    // the documented swap table (graft-log -> format("kafka")):
    //   load(path)              -> kafka.bootstrap.servers + subscribe
    //   pushed topic= filter    -> subscribe topic list
    //   pushed offset >= s      -> startingOffsets {"t":{"p": s}}   (inclusive)
    //   pushed offset <= e-1    -> endingOffsets   {"t":{"p": e}}   (exclusive)
    //   maxRecordsPerTrigger    -> maxOffsetsPerTrigger
    //   decodeTopic / avroSchemaFile -> from_avro over value (schema registry)
    //   checkpointed SegmentOffsets  -> the connector's own offset checkpoints
    val path = java.nio.file.Files.createTempDirectory("graft_swap").toString
    try {
      LogSegments.write(MessageLog.eventsTopic(spark, sf), path)
      val log = spark.read.format("graft-log").load(path)
      // startingOffsets-inclusive / endingOffsets-exclusive parity:
      // reading [3, 7) through offset pushdown must produce offsets
      // 3,4,5,6 on every partition that has them — the exact rows a
      // kafka batch read with startingOffsets=3, endingOffsets=7 gets
      val window = log.filter(col("offset") >= 3 && col("offset") < 7)
        .groupBy(col("partition"))
        .agg(min(col("offset")).as("lo"), max(col("offset")).as("hi"),
          count(lit(1)).as("n"))
        .collect()
      assert(window.nonEmpty)
      window.foreach { r =>
        assert(r.getLong(1) === 3L, "startingOffsets is inclusive")
        assert(r.getLong(2) === 6L, "endingOffsets is exclusive")
        assert(r.getLong(3) === 4L)
      }
      // maxRecordsPerTrigger routes through the same option channel the
      // kafka connector uses for maxOffsetsPerTrigger (a per-trigger
      // row budget; LogSegmentSourceSpec proves the catch-up behavior)
      val budget = sources.PullBudget.fromOptions(
        new org.apache.spark.sql.util.CaseInsensitiveStringMap(
          java.util.Map.of("maxRecordsPerTrigger", "123")))
      assert(budget.maxRows === Some(123L))
    } finally deleteRecursively(new java.io.File(path))
  }

  test("segment metadata covers the KafkaKey fields of the scan model") {
    // camus/KafkaKey.java:25-33 carries (leaderId, partition,
    // beginOffset, offset, checksum, topic, time, server, service).
    // The broker-scan-relevant fields map onto the segment format:
    //   topic/partition -> directory layout (topic=<t>/partition=<p>)
    //   offset, time    -> per-record fields
    //   checksum        -> per-record CRC32 (format v2), read-validated
    //   beginOffset     -> the split's offsetLo (SegmentPartition)
    //   leaderId/server/service -> broker-deployment identity; no
    //     analogue exists in a brokerless file log BY DESIGN (the real
    //     swap target format("kafka") owns leader routing)
    val path = java.nio.file.Files.createTempDirectory("graft_kk").toString
    try {
      LogSegments.write(MessageLog.eventsTopic(spark, sf)
        .filter(col("partition") === 0 && col("offset") < 5), path)
      val dir = new java.io.File(s"$path/topic=events/partition=0")
      assert(dir.isDirectory, "topic/partition directory layout (KafkaKey topic+partition)")
      val seg = dir.listFiles().filter(_.getName.endsWith(".gseg")).head
      val it = LogSegments.readFile(seg) // throws CorruptRecordException on bad crc
      try {
        val recs = it.toList
        assert(recs.map(_._3) === (0L until 5L).toList, "per-record offset")
        assert(recs.forall(_._4 > 0L), "per-record time (tsMillis)")
        // crc presence: flipping one payload byte must fail validation.
        // Byte 8 is the first KEY byte of record 0 (4B magic + 4B
        // keyLen) — flipping content, not a length field, so the parse
        // stays sane and only the crc check can catch it
        val bytes = java.nio.file.Files.readAllBytes(seg.toPath)
        bytes(8) = (bytes(8) ^ 0x1).toByte
        val bad = new java.io.File(dir, "corrupt.gseg")
        java.nio.file.Files.write(bad.toPath, bytes)
        // corrupt record #0 is found by the eager first advance (which
        // closes the stream) and raises from the first next() in toList;
        // close the iterator too for the no-throw path
        intercept[LogSegments.CorruptRecordException] {
          val badIt = LogSegments.readFile(bad)
          try badIt.toList finally badIt.close()
        }
      } finally it.close()
    } finally deleteRecursively(new java.io.File(path))
  }

  test("offsets are dense per partition, starting at zero") {
    val log = MessageLog.eventsTopic(spark, sf)
    val per = log.groupBy("partition")
      .agg(min("offset").as("mn"), max("offset").as("mx"), count(lit(1)).as("n"))
      .collect()
    assert(per.length === MessageLog.numPartitions)
    per.foreach { r =>
      assert(r.getLong(1) === 0L)
      assert(r.getLong(2) === r.getLong(3) - 1)
    }
  }

  test("key bytes decode back to the producer key (user_id)") {
    val got = MessageLog.eventsTopic(spark, sf)
      .select(col("key").cast("string").cast("long").as("k"),
        avro.from_topic(col("value"), "events").getField("user_id").as("u"))
      .filter(col("k") =!= col("u"))
    assert(got.count() === 0)
  }

  test("offset within a partition is monotone in event time") {
    val v = MessageLog.eventsTopic(spark, sf)
      .select(col("partition"), col("offset"),
        avro.from_topic(col("value"), "events").getField("ts_ms").as("ts_ms"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("partition").orderBy("offset")
    val bad = v.withColumn("prev", lag("ts_ms", 1).over(w))
      .filter(col("prev").isNotNull && col("prev") > col("ts_ms"))
    assert(bad.count() === 0)
  }

  test("sink writes broker-style segments and roundtrips") {
    val path = java.nio.file.Files.createTempDirectory("graft_log").toString
    MessageLog.writeLog(MessageLog.documentsTopic(spark, sf), path)
    val back = MessageLog.readLog(spark, path)
    assert(back.count() === Tables.load(spark, sf, "documents").count())
    assert(back.columns.sorted ===
      Array("key", "offset", "partition", "timestamp", "timestampType", "topic", "value"))
    // partition dirs exist (partition pruning works on re-read)
    val pruned = back.filter(col("partition") === 0)
    assert(pruned.count() > 0)
    // encoded payload bytes survive the persist byte-identically (the
    // non-SQL quantity k_sink_log's oracle can't cover): same total
    // size and same per-record decode as the in-memory topic
    val bytesBack = back.agg(sum(length(col("value")))).head().getLong(0)
    val bytesSrc = MessageLog.documentsTopic(spark, sf)
      .agg(sum(length(col("value")))).head().getLong(0)
    assert(bytesBack === bytesSrc && bytesBack > 0)
  }
}
