package graft

import graft.sources.{avro, AvroCodec, SchemaRegistry}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class AvroSpec extends SparkSpec {

  test("roundtrip: nested struct, array, map, nulls") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("score", DoubleType),
      StructField("tags", ArrayType(StringType)),
      StructField("attrs", MapType(StringType, IntegerType)),
      StructField("inner", StructType(Seq(
        StructField("a", IntegerType), StructField("b", StringType))))))
    val rows = Seq(
      Row(1L, "x", 1.5, Seq("t1", "t2"), Map("k" -> 1), Row(7, "u")),
      Row(2L, null, null, Seq("only"), Map.empty[String, Int], null),
      Row(3L, "z", -0.25, null, null, Row(9, null)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)

    val schemaJson = AvroCodec.avroSchemaFor(schema, "T").toString
    val back = df
      .select(avro.to_avro(struct(schema.fieldNames.map(col): _*).cast(schema), "T").as("v"))
      .select(avro.from_avro(col("v"), schemaJson).as("r"))
      .select("r.*")

    assert(back.collect().toSet === df.collect().toSet)
  }

  test("schema evolution: v1 bytes decode under v2 reader with defaults") {
    import spark.implicits._
    val v1Type = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType)))
    // v2 reorders, drops `name`, adds a nullable (null-default) field
    val v2Type = StructType(Seq(
      StructField("rating", DoubleType),
      StructField("id", LongType, nullable = false)))
    val v1Json = AvroCodec.avroSchemaFor(v1Type, "Evo").toString
    val v2Json = AvroCodec.avroSchemaFor(v2Type, "Evo").toString

    val topic = "evo_topic_" + System.nanoTime()
    val v1 = SchemaRegistry.register(topic, v1Json)
    SchemaRegistry.register(topic, v2Json)
    assert(v1 === 1)
    assert(SchemaRegistry.schemaFor(topic) === v2Json)
    assert(SchemaRegistry.schemaFor(topic, 1) === v1Json)

    val got = Seq((5L, "five"), (6L, "six")).toDF("id", "name")
      .select(avro.to_avro(
        struct(col("id"), col("name")).cast(v1Type), "Evo").as("v"))
      .select(avro.from_topic(col("v"), topic, writerVersion = 1).as("r"))
      .select("r.*")
      .orderBy("id")
      .collect()
      .map(r => (Option(r.get(0)), r.getLong(1)))
    assert(got.toSeq === Seq((None, 5L), (None, 6L)))
  }

  test("permissive decode: garbage bytes survive as flagged nulls") {
    import spark.implicits._
    val pt = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType)))
    val json = AvroCodec.avroSchemaFor(pt, "P").toString
    val good = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .select(avro.to_avro(struct(col("id"), col("name")).cast(pt), "P").as("v"))
    val garbage = Seq(
      Array[Byte](),                       // empty
      Array[Byte](-1, -1, -1, -1, -1, -1), // varint runs off the end
      null).toDF("v")                      // null payload stays null
    // strict mode dies on the same input; permissive survives
    intercept[Exception] { // raw EOFException locally, SparkException on a cluster
      good.unionByName(garbage)
        .select(avro.from_avro(col("v"), json).as("r")).collect()
    }
    val rows = good.unionByName(garbage)
      .select(avro.from_avro_permissive(col("v"), json).as("r"))
      .select(col("r.id"), col("r.name"), col("r._corrupt"))
      .collect()
    def corrupt(r: Row) = !r.isNullAt(2) && r.getBoolean(2)
    assert(rows.count(corrupt) === 2)
    assert(rows.filter(corrupt).forall(r => r.isNullAt(0) && r.isNullAt(1)))
    assert(rows.filter(r => !r.isNullAt(0)).map(r => (r.getLong(0), r.getString(1))).toSet
      === Set((1L, "a"), (2L, "b")))
    // null input row: whole struct null, not counted corrupt
    assert(rows.length === 5)
  }

  test("permissive decode: trailing garbage after a clean parse is corrupt") {
    import spark.implicits._
    val pt = StructType(Seq(StructField("id", LongType, nullable = false)))
    val json = AvroCodec.avroSchemaFor(pt, "T").toString
    val withTail = Seq(Tuple1(7L)).toDF("id")
      .select(concat(
        avro.to_avro(struct(col("id")).cast(pt), "T"),
        lit(Array[Byte](9, 9, 9))).as("v"))
    val r = withTail.select(avro.from_avro_permissive(col("v"), json).as("r"))
      .select(col("r._corrupt")).head()
    assert(r.getBoolean(0))
  }

  test("generated schema: date/timestamp/decimal round-trip with logical types") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("d", DateType),
      StructField("t", TimestampType),
      StructField("amount", DecimalType(12, 2))))
    val df = spark.sql("""
      SELECT * FROM VALUES
        (1L, DATE'2024-02-29', TIMESTAMP'2024-02-29 12:34:56.789', CAST(12345.67 AS DECIMAL(12,2))),
        (2L, DATE'1969-12-31', TIMESTAMP'1969-12-31 23:59:59.999999', CAST(-0.01 AS DECIMAL(12,2))),
        (3L, CAST(NULL AS DATE), CAST(NULL AS TIMESTAMP), CAST(NULL AS DECIMAL(12,2)))
        AS t(id, d, t, amount)""")

    // the generated schema is standard-consumer-readable: logicalType
    // annotations present, not bare ints/longs
    val json = AvroCodec.avroSchemaFor(schema, "L").toString
    assert(json.contains("\"logicalType\":\"date\""), json)
    assert(json.contains("\"logicalType\":\"timestamp-micros\""), json)
    assert(json.contains("\"logicalType\":\"decimal\""), json)

    val back = df
      .select(avro.to_avro(struct(schema.fieldNames.map(col): _*).cast(schema), "L").as("v"))
      .select(avro.from_avro(col("v"), json).as("r"))
      .select("r.*")
    assert(back.schema("d").dataType === DateType)
    assert(back.schema("t").dataType === TimestampType)
    assert(back.schema("amount").dataType === DecimalType(12, 2))
    assert(back.collect().toSet === df.collect().toSet)
  }

  test("registry derives the schema from a Spark type (no hand-authored avsc)") {
    import spark.implicits._
    val pt = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType)))
    val topic = "derived_topic_" + System.nanoTime()
    assert(SchemaRegistry.register(topic, pt, "Derived") === 1)
    val got = Seq((1L, "a"), (2L, null)).toDF("id", "name")
      .select(avro.to_avro(struct(col("id"), col("name")).cast(pt), "Derived").as("v"))
      .select(avro.from_topic(col("v"), topic).as("r"))
      .select("r.*").orderBy("id").collect()
      .map(r => (r.getLong(0), Option(r.getString(1))))
    assert(got.toSeq === Seq((1L, Some("a")), (2L, None)))
  }

  test("cached registry: versions cache forever, latest honors TTL + invalidation") {
    import graft.sources.{CachedSchemaBackend, SchemaBackend}
    var now = 0L
    var versionCalls = 0
    var latestCalls = 0
    val remote = new SchemaBackend {
      val mem = scala.collection.mutable.Map.empty[String, Vector[String]]
      override def register(topic: String, json: String): Int = {
        mem(topic) = mem.getOrElse(topic, Vector.empty) :+ json
        mem(topic).length
      }
      override def schemaFor(topic: String, version: Int): String = {
        versionCalls += 1; mem(topic)(version - 1)
      }
      override def schemaFor(topic: String): String = {
        latestCalls += 1; mem(topic).last
      }
    }
    val cached = new CachedSchemaBackend(remote, ttlMs = 100L, clock = () => now)
    cached.register("t", "v1")
    // immutable (topic, version): exactly one underlying fetch ever
    assert(cached.schemaFor("t", 1) === "v1")
    assert(cached.schemaFor("t", 1) === "v1")
    assert(versionCalls === 1)
    // latest: cached within the TTL window...
    assert(cached.schemaFor("t") === "v1")
    now = 50L
    assert(cached.schemaFor("t") === "v1")
    assert(latestCalls === 1)
    // ...refreshed after it
    now = 150L
    assert(cached.schemaFor("t") === "v1")
    assert(latestCalls === 2)
    // a register through the decorator invalidates latest immediately,
    // even inside the TTL window
    cached.register("t", "v2")
    assert(cached.schemaFor("t") === "v2")
    assert(latestCalls === 3)
  }

  test("registry: file + memory registration resolve, unknown topic throws") {
    val p = java.nio.file.Files.createTempFile("graft", ".avsc")
    val json = AvroCodec.avroSchemaFor(
      StructType(Seq(StructField("x", LongType))), "F").toString
    java.nio.file.Files.writeString(p, json)
    SchemaRegistry.registerFile("file_topic", p.toString)
    assert(SchemaRegistry.schemaFor("file_topic") === json)
    assert(SchemaRegistry.schemaFor("events").contains("event_id"))
    intercept[NoSuchElementException](SchemaRegistry.schemaFor("nope"))
  }
}
