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
