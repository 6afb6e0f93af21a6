package graft

import graft.sources.{avro, AvroDecode, MessageLog}
import org.apache.spark.sql.functions._

/** The AvroProjectionPruning optimizer rule: a projection over a
  * decoded payload decodes only the fields it reads. */
class AvroPruningSpec extends SparkSpec {

  private def decodesIn(df: org.apache.spark.sql.DataFrame): Seq[AvroDecode] =
    df.queryExecution.optimizedPlan.collect {
      case p => p.expressions.flatMap(_.collect { case d: AvroDecode => d })
    }.flatten

  test("projected decode is pruned to the used fields") {
    val projected = MessageLog.eventsScan(spark, sf)
      .select(col("event_id"), col("event_type"))
    val decodes = decodesIn(projected)
    assert(decodes.nonEmpty)
    decodes.foreach { d =>
      val fields = new org.apache.avro.Schema.Parser().parse(d.schemaJson)
        .getFields.asScala.map(_.name()).toSet
      assert(fields === Set("event_id", "event_type"), fields)
      assert(d.writerSchemaJson.isDefined, "full schema must remain the writer")
    }
  }

  test("pruned decode output equals parquet ground truth; whole-struct use untouched") {
    val got = MessageLog.eventsScan(spark, sf)
      .select(col("event_id"), col("event_type"), col("value"))
      .orderBy(col("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val truth = Tables.load(spark, sf, "events")
      .select(col("event_id"), col("event_type"), col("value"))
      .orderBy(col("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq === truth.toSeq)
    assert(got.nonEmpty)

    // whole-struct consumption keeps the full decode
    val whole = MessageLog.eventsTopic(spark, sf)
      .select(avro.from_topic(col("value"), "events").as("v"))
      .select(col("v"))
    assert(decodesIn(whole).nonEmpty)
    assert(decodesIn(whole).forall(d =>
      new org.apache.avro.Schema.Parser().parse(d.schemaJson).getFields.size() === 6))
  }

  test("permissive decode prunes payload fields and keeps the _corrupt flag") {
    val df = MessageLog.eventsTopic(spark, sf)
      .select(avro.from_topic_permissive(col("value"), "events").as("v"))
      .select(col("v.event_type"), col("v._corrupt"))
    val decodes = decodesIn(df)
    assert(decodes.nonEmpty)
    decodes.foreach { d =>
      assert(d.permissive, "pruning must not drop the permissive flag")
      val fields = new org.apache.avro.Schema.Parser().parse(d.schemaJson)
        .getFields.asScala.map(_.name()).toSet
      assert(fields === Set("event_type"), fields)
    }
    // and the pruned plan still evaluates: all records clean here
    val rows = df.collect()
    assert(rows.nonEmpty && rows.forall(r => !r.getBoolean(1) && r.getString(0) != null))
  }

  private implicit class JavaListOps[A](l: java.util.List[A]) {
    def asScala: scala.collection.mutable.Buffer[A] =
      scala.jdk.CollectionConverters.ListHasAsScala(l).asScala
  }
}
