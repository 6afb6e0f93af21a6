package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericFixed, GenericRecord}
import org.apache.avro.io.{BinaryDecoder, BinaryEncoder, DecoderFactory, EncoderFactory}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Binary-Avro <-> Catalyst serde built directly on avro-core.
  *
  * The Spark-native equivalent of the reference's message decode path
  * (camus/KafkaAvroMessageDecoder.java, KafkaSerDe.java): a Kafka
  * message's `value: binary` column decodes to a typed struct via a
  * schema obtained from a file or registry, and the producer path
  * encodes typed rows back to Avro binary
  * (demoproducer/BaseProducer.java).
  *
  * Implemented as Catalyst `Expression`s (not UDFs) so null handling,
  * serialization and per-task instance isolation follow engine rules;
  * the per-instance reused encoder/decoder buffers mirror how Spark's
  * own avro expressions avoid per-row allocation.
  */
object AvroCodec {

  /** Spark StructType -> Avro record schema (nullable field = union[null, T]) —
    * the reference's `AvroSchemaGenerator.java` (derive the wire schema
    * from the table's column types) for Spark schemas. Temporal and
    * decimal columns carry Avro logicalType annotations (`date`,
    * `timestamp-micros`, `local-timestamp-micros`, `decimal`) over the
    * matching physical type, so generated schemas are readable by any
    * standard Avro consumer and [[avroToCatalyst]] round-trips them to
    * the same Spark types.
    */
  def avroSchemaFor(dt: StructType, recordName: String): Schema =
    toAvro(dt, nullable = false, recordName)

  private def toAvro(dt: DataType, nullable: Boolean, name: String): Schema = {
    import org.apache.avro.LogicalTypes
    val base = dt match {
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case ByteType | ShortType | IntegerType => Schema.create(Schema.Type.INT)
      case LongType => Schema.create(Schema.Type.LONG)
      case TimestampType =>
        LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
      case TimestampNTZType =>
        LogicalTypes.localTimestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
      case FloatType => Schema.create(Schema.Type.FLOAT)
      case DoubleType => Schema.create(Schema.Type.DOUBLE)
      case StringType => Schema.create(Schema.Type.STRING)
      case BinaryType => Schema.create(Schema.Type.BYTES)
      case DateType =>
        LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
      case d: DecimalType =>
        LogicalTypes.decimal(d.precision, d.scale)
          .addToSchema(Schema.create(Schema.Type.BYTES))
      case st: StructType =>
        val fields = st.fields.zipWithIndex.map { case (f, i) =>
          new Schema.Field(f.name, toAvro(f.dataType, f.nullable, s"${name}_${f.name}"),
            null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
        }.toList.asJava
        Schema.createRecord(name, null, "graft", false, fields)
      case ArrayType(et, containsNull) =>
        Schema.createArray(toAvro(et, containsNull, s"${name}_item"))
      case MapType(StringType, vt, vcn) =>
        Schema.createMap(toAvro(vt, vcn, s"${name}_value"))
      case other =>
        throw new IllegalArgumentException(s"graft avro: unsupported type $other")
    }
    if (nullable) Schema.createUnion(Schema.create(Schema.Type.NULL), base) else base
  }

  /** Catalyst internal value -> Avro datum, driven by the Spark type. */
  private[sources] def catalystToAvro(dt: DataType, schema: Schema): Any => Any = {
    val s = if (schema.getType == Schema.Type.UNION) schema.getTypes.get(1) else schema
    dt match {
      case StringType => v => v.toString
      case BinaryType => v => ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case _: DecimalType => // unscaled big-endian bytes, per the Avro spec
        v => ByteBuffer.wrap(v.asInstanceOf[org.apache.spark.sql.types.Decimal]
          .toJavaBigDecimal.unscaledValue().toByteArray)
      case st: StructType =>
        val convs = st.fields.zipWithIndex.map { case (f, i) =>
          (i, f.dataType, catalystToAvro(f.dataType, s.getFields.get(i).schema()))
        }
        v => {
          val row = v.asInstanceOf[InternalRow]
          val rec = new GenericData.Record(s)
          convs.foreach { case (i, fdt, c) =>
            rec.put(i, if (row.isNullAt(i)) null else c(row.get(i, fdt)))
          }
          rec
        }
      case ArrayType(et, _) =>
        val c = catalystToAvro(et, s.getElementType)
        v => {
          val ad = v.asInstanceOf[ArrayData]
          val out = new java.util.ArrayList[Any](ad.numElements())
          var i = 0
          while (i < ad.numElements()) {
            out.add(if (ad.isNullAt(i)) null else c(ad.get(i, et)))
            i += 1
          }
          out
        }
      case MapType(StringType, vt, _) =>
        val c = catalystToAvro(vt, s.getValueType)
        v => {
          val md = v.asInstanceOf[MapData]
          val out = new java.util.HashMap[String, Any](md.numElements())
          val keys = md.keyArray()
          val vals = md.valueArray()
          var i = 0
          while (i < md.numElements()) {
            out.put(keys.getUTF8String(i).toString,
              if (vals.isNullAt(i)) null else c(vals.get(i, vt)))
            i += 1
          }
          out
        }
      case _ => identity // primitives: Catalyst boxing matches Avro's
    }
  }

  /** Avro schema -> (Spark type, Avro datum -> Catalyst internal value). */
  private[sources] def avroToCatalyst(schema: Schema): (DataType, Any => Any) =
    schema.getType match {
      case Schema.Type.UNION =>
        val branches = schema.getTypes.asScala
        require(branches.size == 2 && branches.head.getType == Schema.Type.NULL,
          s"graft avro: only union[null, T] supported, got $schema")
        val (dt, c) = avroToCatalyst(branches(1))
        (dt, v => if (v == null) null else c(v))
      case Schema.Type.BOOLEAN => (BooleanType, identity)
      case Schema.Type.INT =>
        // date logical type: Avro days-since-epoch == Catalyst DateType
        if (schema.getLogicalType.isInstanceOf[org.apache.avro.LogicalTypes.Date])
          (DateType, identity)
        else (IntegerType, identity)
      case Schema.Type.LONG => schema.getLogicalType match {
        // micros-since-epoch == Catalyst's internal timestamp encoding
        case _: org.apache.avro.LogicalTypes.TimestampMicros => (TimestampType, identity)
        case _: org.apache.avro.LogicalTypes.LocalTimestampMicros => (TimestampNTZType, identity)
        case _ => (LongType, identity)
      }
      case Schema.Type.FLOAT => (FloatType, identity)
      case Schema.Type.DOUBLE => (DoubleType, identity)
      case Schema.Type.STRING | Schema.Type.ENUM =>
        (StringType, v => UTF8String.fromString(v.toString))
      case Schema.Type.BYTES => schema.getLogicalType match {
        case d: org.apache.avro.LogicalTypes.Decimal =>
          (DecimalType(d.getPrecision, d.getScale), v => {
            val bb = v.asInstanceOf[ByteBuffer].duplicate()
            val arr = new Array[Byte](bb.remaining())
            bb.get(arr)
            Decimal(new java.math.BigDecimal(
              new java.math.BigInteger(arr), d.getScale))
          })
        case _ =>
          (BinaryType, v => {
            val bb = v.asInstanceOf[ByteBuffer].duplicate()
            val arr = new Array[Byte](bb.remaining())
            bb.get(arr)
            arr
          })
      }
      case Schema.Type.FIXED =>
        (BinaryType, v => v.asInstanceOf[GenericFixed].bytes().clone())
      case Schema.Type.RECORD =>
        val fcs = schema.getFields.asScala.map(f => (f.name(), avroToCatalyst(f.schema()))).toArray
        val st = StructType(fcs.map { case (n, (dt, _)) => StructField(n, dt, nullable = true) })
        (st, v => {
          val rec = v.asInstanceOf[GenericRecord]
          val vals = new Array[Any](fcs.length)
          var i = 0
          while (i < fcs.length) {
            val raw = rec.get(i)
            vals(i) = if (raw == null) null else fcs(i)._2._2(raw)
            i += 1
          }
          new GenericInternalRow(vals)
        })
      case Schema.Type.ARRAY =>
        val (et, c) = avroToCatalyst(schema.getElementType)
        (ArrayType(et, containsNull = true), v => {
          val col = v.asInstanceOf[java.util.Collection[Any]]
          val out = new Array[Any](col.size())
          val it = col.iterator()
          var i = 0
          while (it.hasNext) {
            val e = it.next()
            out(i) = if (e == null) null else c(e)
            i += 1
          }
          new GenericArrayData(out)
        })
      case Schema.Type.MAP =>
        val (vt, c) = avroToCatalyst(schema.getValueType)
        (MapType(StringType, vt, valueContainsNull = true), v => {
          val m = v.asInstanceOf[java.util.Map[Any, Any]].asScala
          val keys = new Array[Any](m.size)
          val vals = new Array[Any](m.size)
          var i = 0
          m.foreach { case (k, mv) =>
            keys(i) = UTF8String.fromString(k.toString)
            vals(i) = if (mv == null) null else c(mv)
            i += 1
          }
          ArrayBasedMapData(keys, vals)
        })
      case other =>
        throw new IllegalArgumentException(s"graft avro: unsupported avro type $other")
    }
}

/** struct -> binary Avro (producer/serialize path). */
case class AvroEncode(child: Expression, recordName: String)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_to_avro"

  @transient private lazy val structType = child.dataType.asInstanceOf[StructType]
  @transient private lazy val schema = AvroCodec.avroSchemaFor(structType, recordName)
  @transient private lazy val conv = AvroCodec.catalystToAvro(structType, schema)
  @transient private lazy val writer = new GenericDatumWriter[Any](schema)
  @transient private lazy val baos = new ByteArrayOutputStream(256)
  @transient private var encoder: BinaryEncoder = _

  override protected def nullSafeEval(input: Any): Any = {
    baos.reset()
    encoder = EncoderFactory.get().directBinaryEncoder(baos, encoder)
    writer.write(conv(input), encoder)
    encoder.flush()
    baos.toByteArray
  }
  override protected def withNewChildInternal(c: Expression): AvroEncode = copy(child = c)
}

/** binary Avro -> struct (consumer/deserialize path).
  *
  * `writerSchemaJson` (when set) enables Avro schema resolution: bytes
  * written under the old writer schema decode under the new reader
  * `schemaJson` — added fields take their defaults, removed fields are
  * skipped, field order is matched by name. This is the evolution
  * contract a versioned schema registry provides.
  *
  * `permissive` mirrors the reference's corrupt-message tolerance
  * (camus/ExceptionWritable.java, MessageDecoderException.java, and the
  * skip counters in KafkaRecordReader.java): instead of one malformed
  * payload killing the whole scan, the decoded struct gains a trailing
  * `_corrupt: boolean` field; undecodable records yield all-null payload
  * fields with `_corrupt = true` and the job survives. Requires a
  * top-level record schema. Permissive mode also rejects records whose
  * bytes parse but leave trailing garbage (a partial/overlaid write).
  */
case class AvroDecode(child: Expression, schemaJson: String,
    writerSchemaJson: Option[String] = None, permissive: Boolean = false)
    extends UnaryExpression with CodegenFallback {
  @transient private lazy val schema = new Schema.Parser().parse(schemaJson)
  @transient private lazy val typeAndConv = AvroCodec.avroToCatalyst(schema)
  @transient private lazy val payloadType = typeAndConv._1.asInstanceOf[StructType]
  override def dataType: DataType =
    if (permissive) StructType(payloadType.fields :+
      StructField("_corrupt", BooleanType, nullable = false))
    else typeAndConv._1
  override def prettyName: String = "graft_from_avro"

  @transient private lazy val reader = writerSchemaJson match {
    case Some(w) => new GenericDatumReader[Any](new Schema.Parser().parse(w), schema)
    case None => new GenericDatumReader[Any](schema)
  }
  @transient private var decoder: BinaryDecoder = _
  @transient private var reuse: Any = _

  private def withFlag(row: InternalRow, corrupt: Boolean): InternalRow = {
    val n = payloadType.length
    val out = new Array[Any](n + 1)
    if (row != null) {
      var i = 0
      while (i < n) { out(i) = row.get(i, payloadType(i).dataType); i += 1 }
    }
    out(n) = corrupt
    new GenericInternalRow(out)
  }

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    if (!permissive) {
      decoder = DecoderFactory.get().binaryDecoder(bytes, 0, bytes.length, decoder)
      reuse = reader.read(reuse, decoder)
      typeAndConv._2(reuse)
    } else {
      try {
        decoder = DecoderFactory.get().binaryDecoder(bytes, 0, bytes.length, decoder)
        reuse = reader.read(reuse, decoder)
        if (!decoder.isEnd) withFlag(null, corrupt = true)
        else withFlag(typeAndConv._2(reuse).asInstanceOf[InternalRow], corrupt = false)
      } catch {
        case scala.util.control.NonFatal(_) =>
          // a failed partial read may leave the reused datum and the
          // decoder in an undefined state — drop both
          reuse = null
          decoder = null
          withFlag(null, corrupt = true)
      }
    }
  }
  override protected def withNewChildInternal(c: Expression): AvroDecode = copy(child = c)
}

/** Pluggable registry backend — what a REMOTE schema registry client
  * implements; [[SchemaRegistry]] is the built-in in-memory one
  * (camus/MemorySchemaRegistry.java parity). */
trait SchemaBackend {
  /** Register the next version of a topic's schema; returns the id. */
  def register(topic: String, schemaJson: String): Int
  /** getSchemaByID equivalent. */
  def schemaFor(topic: String, version: Int): String
  /** getLatestSchemaByTopic equivalent. */
  def schemaFor(topic: String): String
}

/** Caching decorator over any [[SchemaBackend]] —
  * camus/CachedSchemaRegistry.java parity, for fronting a remote
  * registry so executors don't re-fetch per task. Two cache policies,
  * by mutability:
  *
  *  - (topic, version) -> schema is IMMUTABLE in every registry
  *    protocol, so entries cache forever (the reference does the same
  *    via its cachedById map).
  *  - "latest schema for topic" is a MUTABLE pointer — a producer can
  *    register v(n+1) at any moment — so entries expire after
  *    `ttlMs` and a local `register` through this decorator
  *    invalidates immediately. (The reference caches latest but then
  *    re-fetches on every call anyway — CachedSchemaRegistry.java:34-40
  *    returns `registry.getLatestSchemaByTopic` after populating the
  *    cache; the TTL here is that intent, made to actually work.)
  *
  * `clock` is injectable for deterministic TTL tests. */
class CachedSchemaBackend(underlying: SchemaBackend, ttlMs: Long = 60000L,
    clock: () => Long = () => System.currentTimeMillis()) extends SchemaBackend {
  private val byVersion = TrieMap.empty[(String, Int), String]
  private val latest = TrieMap.empty[String, (Long, String)]

  override def register(topic: String, schemaJson: String): Int = {
    val id = underlying.register(topic, schemaJson)
    latest.remove(topic)
    id
  }

  override def schemaFor(topic: String, version: Int): String =
    byVersion.getOrElseUpdate((topic, version),
      underlying.schemaFor(topic, version))

  override def schemaFor(topic: String): String = {
    val now = clock()
    latest.get(topic) match {
      case Some((at, s)) if now - at < ttlMs => s
      case _ =>
        val s = underlying.schemaFor(topic)
        latest.put(topic, (now, s))
        s
    }
  }
}

/** Topic -> schema registry; the in-memory/cached/file trio of the
  * reference (camus/MemorySchemaRegistry.java, CachedSchemaRegistry.java,
  * kafka.avro.schema.file in KafkaBackedTableProperties.java:37).
  */
object SchemaRegistry extends SchemaBackend {
  private val byTopic = TrieMap.empty[String, scala.collection.immutable.TreeMap[Int, String]]

  // force MessageLog's built-in topic registrations before any lookup
  private lazy val bootstrap: Unit = { MessageLog.eventSchemaJson; () }

  /** Register the next version of a topic's schema; returns the id. */
  def register(topic: String, schemaJson: String): Int = synchronized {
    val versions = byTopic.getOrElse(topic, scala.collection.immutable.TreeMap.empty[Int, String])
    val id = versions.lastOption.map(_._1 + 1).getOrElse(1)
    byTopic.put(topic, versions + (id -> schemaJson))
    id
  }

  /** getSchemaByID equivalent. */
  def schemaFor(topic: String, version: Int): String = {
    bootstrap
    byTopic.get(topic).flatMap(_.get(version)).getOrElse(
      throw new NoSuchElementException(
        s"graft: no schema v$version registered for topic '$topic'"))
  }

  /** Derive-and-register (`AvroSchemaGenerator.java` parity): the
    * producer hands over its Spark schema and the registry generates
    * the Avro schema — no hand-authored .avsc anywhere on the sink
    * path. Returns the registered version id. */
  def register(topic: String, sparkType: StructType, recordName: String): Int =
    register(topic, AvroCodec.avroSchemaFor(sparkType, recordName).toString)

  /** `kafka.avro.schema.file` equivalent: load an .avsc from disk. */
  def registerFile(topic: String, avscPath: String): Unit =
    register(topic, new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(avscPath)), java.nio.charset.StandardCharsets.UTF_8))

  /** getLatestSchemaByTopic equivalent. */
  def schemaFor(topic: String): String = {
    bootstrap
    byTopic.get(topic).flatMap(_.lastOption).map(_._2).getOrElse(
      throw new NoSuchElementException(
        s"graft: no schema registered for topic '$topic'"))
  }
}

/** Column-level API. */
object avro {
  def to_avro(c: Column, recordName: String = "record"): Column =
    Bridge.column(AvroEncode(Bridge.expression(c), recordName))

  def from_avro(c: Column, schemaJson: String): Column =
    Bridge.column(AvroDecode(Bridge.expression(c), schemaJson))

  /** Schema-resolving decode: bytes written under `writerSchemaJson`
    * read under `readerSchemaJson` (evolution path). */
  def from_avro(c: Column, readerSchemaJson: String, writerSchemaJson: String): Column =
    Bridge.column(AvroDecode(Bridge.expression(c), readerSchemaJson, Some(writerSchemaJson)))

  /** Corrupt-tolerant decode: payload fields + `_corrupt` flag; bad
    * bytes yield a flagged all-null row instead of failing the scan. */
  def from_avro_permissive(c: Column, schemaJson: String): Column =
    Bridge.column(AvroDecode(Bridge.expression(c), schemaJson, None, permissive = true))

  /** Decode using the latest schema registered for `topic`. */
  def from_topic(c: Column, topic: String): Column =
    from_avro(c, SchemaRegistry.schemaFor(topic))

  /** Corrupt-tolerant [[from_topic]]. */
  def from_topic_permissive(c: Column, topic: String): Column =
    from_avro_permissive(c, SchemaRegistry.schemaFor(topic))

  /** Decode messages written under schema `writerVersion` of `topic`
    * with the topic's latest schema. */
  def from_topic(c: Column, topic: String, writerVersion: Int): Column =
    from_avro(c, SchemaRegistry.schemaFor(topic),
      SchemaRegistry.schemaFor(topic, writerVersion))
}
