package graft.sources

import java.io.{BufferedOutputStream, DataInputStream, DataOutputStream, EOFException, FileInputStream, FileOutputStream}
import java.io.File

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Broker-style binary segment files: the on-disk analogue of a Kafka
  * partition log, written one directory per topic-partition
  * (`topic=<t>/partition=<p>/part-*.gseg`), records offset-ordered.
  *
  * Record layout (DataOutputStream big-endian, format v2):
  * `[keyLen int][key][valLen int][value][offset long][tsMillis long][crc int]`
  * with keyLen/valLen = -1 encoding null and `crc` the CRC32 of all
  * preceding record bytes — the per-message checksum the reference
  * carries in its metadata key (camus/KafkaKey.java:29,64) and
  * validates on read (camus/KafkaReader.java:124). Without it, segment
  * corruption only surfaces when a length field happens to go wild;
  * with it, any flipped byte is detected at the exact record. v1 files
  * (magic "GSEG", no crc) still read.
  *
  * The format exists so [[LogSegmentSource]] can demonstrate the
  * reference's scan model (KafkaInputFormat.java: one split per
  * topic-partition bounded by offsets) as a native DataSourceV2
  * connector.
  */
object LogSegments {

  val Magic: Int = 0x47534547 // "GSEG" — v1, records carry no checksum
  val Magic2: Int = 0x47534732 // "GSG2" — v2, per-record CRC32

  /** A record whose stored CRC32 disagrees with its bytes. */
  final class CorruptRecordException(path: String, recordIndex: Long,
      stored: Int, computed: Int)
    extends java.io.IOException(
      s"graft: corrupt segment record #$recordIndex in $path " +
        f"(stored crc 0x$stored%08x, computed 0x$computed%08x)")

  /** A v2 segment that ends mid-record. Every whole v2 record ends in
    * its CRC, so a file exhausted after a record has started is
    * detectable truncation (crash-torn tail, partial copy), not a
    * clean end-of-log — it raises like a CRC mismatch does. */
  final class TruncatedRecordException(path: String, recordIndex: Long)
    extends java.io.IOException(
      s"graft: truncated segment record #$recordIndex in $path " +
        "(file ends mid-record)")

  /** Incremental CRC32 over the exact on-disk record encoding.
    * One instance per segment file — allocation-free per record. */
  private final class RecordCrc {
    private val crc = new java.util.zip.CRC32()
    private val buf = new Array[Byte](8)
    private def addInt(i: Int): Unit = {
      buf(0) = (i >>> 24).toByte; buf(1) = (i >>> 16).toByte
      buf(2) = (i >>> 8).toByte; buf(3) = i.toByte
      crc.update(buf, 0, 4)
    }
    private def addLong(l: Long): Unit = {
      addInt((l >>> 32).toInt); addInt(l.toInt)
    }
    def of(k: Array[Byte], v: Array[Byte], offset: Long, tsMs: Long): Int = {
      crc.reset()
      if (k == null) addInt(-1) else { addInt(k.length); crc.update(k) }
      if (v == null) addInt(-1) else { addInt(v.length); crc.update(v) }
      addLong(offset); addLong(tsMs)
      crc.getValue.toInt
    }
  }

  /** Streams records into ONE v2 segment file at `tmpFile` (callers
    * name it `*.gseg.tmp`). Publication is by rename, in one of two
    * disciplines: [[seal]] (close + rename now — the batch-write path,
    * where the task owns publication) or plain [[close]] with the
    * rename deferred to a coordinator ([[publish]] — the DSv2 commit
    * protocol, where the DRIVER renames after every task reported, so
    * a failed epoch leaves only `.tmp` litter and never a half-visible
    * segment). */
  private[sources] final class SegmentFileWriter(val tmpFile: File) {
    tmpFile.getParentFile.mkdirs()
    private val out = new DataOutputStream(new BufferedOutputStream(
      new FileOutputStream(tmpFile)))
    out.writeInt(Magic2)
    private val crc = new RecordCrc
    def append(k: Array[Byte], v: Array[Byte], offset: Long, tsMs: Long): Unit = {
      def bytes(b: Array[Byte]): Unit =
        if (b == null) out.writeInt(-1)
        else { out.writeInt(b.length); out.write(b) }
      bytes(k); bytes(v)
      out.writeLong(offset); out.writeLong(tsMs)
      out.writeInt(crc.of(k, v, offset, tsMs))
    }
    def close(): Unit = out.close()
    def seal(): File = { close(); publish(tmpFile.getPath) }
  }

  /** Rename a finished `.tmp` segment into place. Idempotent under
    * coordinator retry: a missing tmp whose final file exists is a
    * previously-completed publish, not an error (REPLACE_EXISTING
    * keeps a same-name re-publish an overwrite, never a duplicate). */
  private[sources] def publish(tmpPath: String): File = {
    val tmp = new File(tmpPath)
    val fin = new File(tmpPath.stripSuffix(".tmp"))
    if (tmp.exists())
      java.nio.file.Files.move(tmp.toPath, fin.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    else if (!fin.exists())
      throw new java.io.IOException(
        s"graft: segment $tmpPath vanished before publication")
    fin
  }

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
        var w: SegmentFileWriter = null
        def sealSegment(): Unit = if (w != null) { w.seal(); w = null }
        var current: (String, Int) = null
        for ((k, v, topic, part, offset, tsMs) <- it) {
          if (current != (topic, part)) {
            sealSegment()
            // unique per write so appended batches never clobber files
            val taskId = org.apache.spark.TaskContext.getPartitionId()
            val unique = java.util.UUID.randomUUID().toString.take(8)
            w = new SegmentFileWriter(new File(
              s"$path/topic=$topic/partition=$part",
              f"part-$taskId%05d-$unique.gseg.tmp"))
            current = (topic, part)
          }
          w.append(k, v, offset, tsMs)
        }
        sealSegment()
      }
    path
  }

  /** A segment-record iterator that can be closed mid-stream (a scan
    * under a limit stops early; the input must not leak). */
  trait RecordIterator extends Iterator[(Array[Byte], Array[Byte], Long, Long)]
      with AutoCloseable

  /** Iterate one segment file's records, validating per-record CRCs on
    * v2 files ([[CorruptRecordException]] pinpoints the bad record).
    * Closes itself at EOF. */
  def readFile(f: File): RecordIterator = {
    val in = new DataInputStream(new java.io.BufferedInputStream(new FileInputStream(f)))
    // a bad-magic failure must close the stream itself — the caller
    // never gets a handle to close. (A corrupt record #0 found by the
    // eager first advance also closes the stream itself, then raises
    // from the first next() via the pending-error slot below.)
    // close failures are swallowed on these error paths: the original
    // exception (bad magic, corrupt record) names file/record/CRCs and
    // must reach the caller, not be masked by a failing close() on the
    // same broken device
    def closeQuietly(): Unit =
      try in.close() catch { case scala.util.control.NonFatal(_) => () }
    val checked =
      try {
        val magic = in.readInt()
        require(magic == Magic || magic == Magic2,
          s"graft: ${f.getPath} is not a segment file")
        magic == Magic2
      } catch { case e: Throwable => closeQuietly(); throw e }
    new RecordIterator {
      private val crc = new RecordCrc
      private var recordIndex = -1L
      private var nextRec: (Array[Byte], Array[Byte], Long, Long) = _
      private var done = false
      // a decode error found while PRE-fetching record i+1 is parked
      // here and raised only after record i has been handed out — the
      // eager advance must not cost the caller the last healthy record
      private var pendingError: Throwable = null
      private def advance(): Unit = {
        // the record's first byte separates a clean end-of-log (stream
        // exhausted exactly at a record boundary → read() returns -1)
        // from a record that started and was cut off mid-way
        val first =
          try in.read()
          catch { case scala.util.control.NonFatal(e) =>
            done = true; closeQuietly(); pendingError = e; return }
        if (first < 0) { done = true; closeQuietly(); return }
        val idx = recordIndex + 1
        try {
          def bytes(n: Int): Array[Byte] =
            if (n < 0) null
            else { val b = new Array[Byte](n); in.readFully(b); b }
          val kLen = (first << 24) | (in.readUnsignedByte() << 16) |
            (in.readUnsignedByte() << 8) | in.readUnsignedByte()
          val k = bytes(kLen); val v = bytes(in.readInt())
          val offset = in.readLong(); val tsMs = in.readLong()
          recordIndex = idx
          if (checked) {
            val stored = in.readInt()
            val computed = crc.of(k, v, offset, tsMs)
            if (stored != computed)
              throw new CorruptRecordException(f.getPath, idx, stored, computed)
          }
          nextRec = (k, v, offset, tsMs)
        } catch {
          // v1 has no checksum, so a partial trailing record cannot be
          // told apart from writer-crash garbage — keep the legacy
          // tolerance and drop it silently; a close() failure here must
          // not throw out of next() and lose the final decoded record
          case _: EOFException if !checked => done = true; closeQuietly()
          // v2: the record provably started (first byte read), so EOF
          // here is detectable truncation — raise, like a CRC mismatch
          case _: EOFException =>
            done = true; closeQuietly()
            pendingError = new TruncatedRecordException(f.getPath, idx)
          case scala.util.control.NonFatal(e) =>
            done = true; closeQuietly(); pendingError = e
        }
      }
      advance()
      override def hasNext: Boolean = !done || pendingError != null
      override def next(): (Array[Byte], Array[Byte], Long, Long) = {
        if (done) {
          if (pendingError != null) {
            val e = pendingError; pendingError = null; throw e
          }
          throw new NoSuchElementException("next on exhausted segment iterator")
        }
        val r = nextRec; advance(); r
      }
      override def close(): Unit = {
        pendingError = null // caller chose to stop; don't raise later
        if (!done) { done = true; in.close() }
      }
    }
  }
}
