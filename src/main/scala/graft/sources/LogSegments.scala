package graft.sources

import java.io.{BufferedOutputStream, DataInputStream, DataOutputStream, EOFException, FileInputStream, FileOutputStream}
import java.io.File

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Broker-style binary segment files: the on-disk analogue of a Kafka
  * partition log, written one directory per topic-partition
  * (`topic=<t>/partition=<p>/part-*.gseg`), records offset-ordered.
  *
  * Record layout (DataOutputStream big-endian):
  * `[keyLen int][key][valLen int][value][offset long][tsMillis long]`
  * with keyLen/valLen = -1 encoding null. The format exists so
  * [[LogSegmentSource]] can demonstrate the reference's scan model
  * (KafkaInputFormat.java: one split per topic-partition bounded by
  * offsets) as a native DataSourceV2 connector.
  */
object LogSegments {

  val Magic: Int = 0x47534547 // "GSEG"

  /** Write a message-log DataFrame (spark-sql-kafka schema) as segment
    * dirs. One shuffle: co-locate each topic-partition, offset-sorted. */
  def write(log: DataFrame, path: String): String = {
    val spark = log.sparkSession
    import spark.implicits._
    log.select(col("key"), col("value"), col("topic"),
        col("partition"), col("offset"), unix_millis(col("timestamp")).as("ts_ms"))
      .as[(Array[Byte], Array[Byte], String, Int, Long, Long)]
      .repartition(col("topic"), col("partition"))
      .sortWithinPartitions(col("topic"), col("partition"), col("offset"))
      .foreachPartition { it: Iterator[(Array[Byte], Array[Byte], String, Int, Long, Long)] =>
        // write to .tmp, rename on close: concurrent readers (a live
        // micro-batch stream) must never see a half-written segment
        var out: DataOutputStream = null
        var tmp: File = null
        def sealSegment(): Unit = if (out != null) {
          out.close()
          val fin = new File(tmp.getPath.stripSuffix(".tmp"))
          if (!tmp.renameTo(fin)) throw new java.io.IOException(
            s"graft: could not publish segment $fin")
          out = null; tmp = null
        }
        var current: (String, Int) = null
        for ((k, v, topic, part, offset, tsMs) <- it) {
          if (current != (topic, part)) {
            sealSegment()
            val dir = new File(s"$path/topic=$topic/partition=$part")
            dir.mkdirs()
            // unique per write so appended batches never clobber files
            val taskId = org.apache.spark.TaskContext.getPartitionId()
            val unique = java.util.UUID.randomUUID().toString.take(8)
            tmp = new File(dir, f"part-$taskId%05d-$unique.gseg.tmp")
            out = new DataOutputStream(new BufferedOutputStream(
              new FileOutputStream(tmp)))
            out.writeInt(Magic)
            current = (topic, part)
          }
          def bytes(b: Array[Byte]): Unit =
            if (b == null) out.writeInt(-1)
            else { out.writeInt(b.length); out.write(b) }
          bytes(k); bytes(v)
          out.writeLong(offset); out.writeLong(tsMs)
        }
        sealSegment()
      }
    path
  }

  /** A segment-record iterator that can be closed mid-stream (a scan
    * under a limit stops early; the input must not leak). */
  trait RecordIterator extends Iterator[(Array[Byte], Array[Byte], Long, Long)]
      with AutoCloseable

  /** Iterate one segment file's records. Closes itself at EOF. */
  def readFile(f: File): RecordIterator = {
    val in = new DataInputStream(new java.io.BufferedInputStream(new FileInputStream(f)))
    require(in.readInt() == Magic, s"graft: ${f.getPath} is not a segment file")
    new RecordIterator {
      private var nextRec: (Array[Byte], Array[Byte], Long, Long) = _
      private var done = false
      private def advance(): Unit =
        try {
          def bytes(): Array[Byte] = {
            val n = in.readInt()
            if (n < 0) null
            else { val b = new Array[Byte](n); in.readFully(b); b }
          }
          val k = bytes(); val v = bytes()
          nextRec = (k, v, in.readLong(), in.readLong())
        } catch { case _: EOFException => done = true; in.close() }
      advance()
      override def hasNext: Boolean = !done
      override def next(): (Array[Byte], Array[Byte], Long, Long) = {
        val r = nextRec; advance(); r
      }
      override def close(): Unit = if (!done) { done = true; in.close() }
    }
  }
}
