package graft

import graft.operators.{Multimodal, PngCodec}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("payloads are real PNGs; decode recovers true geometry and pixels") {
    val media = Multimodal.fakeMediaTable(spark, sf)
    assert(media.schema("media").dataType.typeName === "binary")
    val decoded = Multimodal.decodeMedia(spark, media)
    val rows = decoded.collect()
    assert(rows.length === 500)
    rows.foreach { m =>
      // geometry comes from ImageIO's decode of the payload — must
      // match the render formula exactly
      assert(m.width === 64 + (m.doc_id % 192).toInt)
      assert(m.height === 64 + ((m.doc_id * 7) % 128).toInt)
      assert(m.n_bytes > 100, "a real PNG is never this small")
      assert(m.mean_luma > 0 && m.mean_luma < 255)
    }
    // luminance must equal an independent re-render + re-decode of the
    // same pattern (full codec round trip, off-Spark)
    rows.take(5).foreach { m =>
      val img = PngCodec.decode(PngCodec.render(m.doc_id, m.width, m.height))
      assert(m.mean_luma === PngCodec.meanLuma(img))
    }
  }

  test("media payloads carry the PNG magic bytes") {
    import graft.sources.avro
    val first = Multimodal.fakeMediaTable(spark, sf)
      .select(avro.from_avro(col("media"), Multimodal.containerSchemaJson).as("c"))
      .select(col("c.data")).head().getAs[Array[Byte]](0)
    assert(first.take(8).toSeq ===
      Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
  }

  test("resize stage bounds geometry via a real bilinear scale") {
    val media = Multimodal.fakeMediaTable(spark, sf)
    val rows = Multimodal.resizeMedia(spark, media, maxSide = 64).collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      assert(math.max(r.out_width, r.out_height) <= 64)
      assert(r.out_width >= 1 && r.out_height >= 1)
      // aspect preserved within integer truncation
      val inAspect = r.width.toDouble / r.height
      val outAspect = r.out_width.toDouble / r.out_height
      assert(math.abs(inAspect - outAspect) / inAspect < 0.25)
      // the resized payload is itself a decodable PNG of the new size
      assert(r.n_bytes > 100)
      // a smooth pattern resampled bilinearly keeps its mean close
      assert(r.mean_luma > 0 && r.mean_luma < 255)
    }
  }

  test("frame sampling decodes the strip and keeps every stride-th frame") {
    val media = Multimodal.fakeMediaTable(spark, sf)
    val rows = Multimodal.sampleFrames(spark, media, frameRows = 16, stride = 4)
      .collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      val h = 64 + ((r.doc_id * 7) % 128).toInt
      assert(r.n_frames === h / 16, s"doc ${r.doc_id}: frames from decoded height")
      assert(r.sampled === (r.n_frames + 3) / 4)
      val w = 64 + (r.doc_id % 192).toInt
      assert(r.frame_bytes === w * 16 * 3)
      assert(r.mean_luma > 0 && r.mean_luma < 255)
    }
  }

  test("audio decode matches a hand-computed clip") {
    import graft.operators.Multimodal
    val out = Multimodal.decodeAudioExact(spark,
        Multimodal.fakeAudioTable(spark, sf))
      .filter(col("doc_id") === 3L).collect()(0)
    // closed form replayed in Scala for doc_id = 3
    val id = 3L
    val n = 1600 + (id % 800).toInt
    var sumAbs = 0L; var peak = 0L; var zc = 0L; var prev = 0
    (0 until n).foreach { t =>
      val v = (((id * 31 + 17L * t) % 4096) - 2048).toInt
      sumAbs += math.abs(v); peak = math.max(peak, math.abs(v))
      if (t > 0 && prev * v < 0) zc += 1
      prev = v
    }
    assert(out.getAs[Long]("n_samples") === n.toLong)
    assert(out.getAs[Long]("duration_ms") === n.toLong * 1000 / 16000)
    assert(out.getAs[Long]("sum_abs") === sumAbs)
    assert(out.getAs[Long]("peak_abs") === peak)
    assert(out.getAs[Long]("zero_crossings") === zc)
  }

  test("vad matches a hand-replayed frame energy gate") {
    import graft.operators.Multimodal
    val out = Multimodal.vadExact(spark,
        Multimodal.fakeAudioTable(spark, sf))
      .filter(col("doc_id").isin(3L, 11L)).orderBy("doc_id").collect()
    for (row <- out) {
      val id = row.getAs[Long]("doc_id")
      val n = 1600 + (id % 800).toInt
      val nf = n / 160
      val en = (0 until nf).map { f =>
        (f * 160 until (f + 1) * 160).map { t =>
          math.abs((((id * 31 + 17L * t) % 4096) - 2048).toInt).toLong
        }.sum
      }
      val sumE = en.sum
      val voiced = en.map(_ * nf > sumE)
      val runs = voiced.foldLeft(List.empty[Int]) {
        case (acc, true) if acc.nonEmpty && acc.head > 0 => (acc.head + 1) :: acc.tail
        case (acc, true) => 1 :: acc
        case (acc, false) => 0 :: acc
      }.filter(_ > 0)
      assert(row.getAs[Long]("n_frames") === nf.toLong)
      assert(row.getAs[Long]("n_voiced") === voiced.count(identity).toLong)
      assert(row.getAs[Long]("n_segments") === runs.length.toLong)
      assert(row.getAs[Long]("longest_run") ===
        (if (runs.isEmpty) 0L else runs.max.toLong))
    }
  }

  test("augment: flip+crop luma equals the closed form and differs from an unflipped crop") {
    import graft.operators.Multimodal
    val out = Multimodal.augmentExact(spark,
        Multimodal.fakeMediaTable(spark, sf))
      .filter(col("doc_id").isin(3L, 7L)).orderBy("doc_id").collect()
    var flipObserved = false
    for (r <- out) {
      val id = r.getLong(0)
      val w = (64 + id % 192).toInt
      val h = (64 + (id * 7) % 128).toInt
      val (cw, ch) = (w / 2, h / 2)
      def regionSum(xlo: Int, xhi: Int): Long =
        (for (x <- xlo until xhi; y <- 0 until ch)
          yield ((id * 31 + x * 7 + y * 13) % 256) * 1000L).sum
      val flipped = regionSum(w - cw, w)
      val unflipped = regionSum(0, cw)
      assert(r.getInt(3) === cw && r.getInt(4) === ch)
      assert(r.getLong(5) === flipped)
      if (flipped != unflipped) flipObserved = true
    }
    assert(flipObserved, "flip not observable on either test doc")
  }

  test("phashPairs: banded set equals brute hamming<=3 exactly; radius guard fires") {
    val h = Multimodal.phashMedia(spark,
      Multimodal.phashMediaTable(spark, sf))
      .select(col("doc_id"), col("phash_bits"))
    val banded = Multimodal.phashPairs(
        Multimodal.phashMedia(spark, Multimodal.phashMediaTable(spark, sf)))
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        r.get(2).asInstanceOf[Number].longValue)).toMap
    // brute cross-check: pigeonhole banding must be EXACT, both
    // directions (nothing missing, nothing extra), distances equal
    val brute = h.as("a").join(h.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        expr("bit_count(a.phash_bits ^ b.phash_bits)").cast("long").as("d"))
      .filter(col("d") <= 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(banded === brute,
      s"banded=${banded.size} brute=${brute.size} — pigeonhole exactness violated")
    assert(brute.nonEmpty, "corpus must contain r<=3 pairs for the test to bite")
    val e = intercept[IllegalArgumentException] {
      Multimodal.phashPairs(
        Multimodal.phashMedia(spark, Multimodal.phashMediaTable(spark, sf)),
        maxHamming = 4)
    }
    assert(e.getMessage.contains("pigeonhole"))
  }

  test("scene detection: hand strip recovered exactly; a sub-majority change is not a cut") {
    import java.awt.image.BufferedImage
    // hand strip: 6 frames of 16 rows, scenes of 2 -> 3 scenes
    val png = PngCodec.renderScenes(42L, 64, 6, 2)
    val img = PngCodec.decode(png)
    var cuts = 0
    for (f <- 1 until 6) {
      val ch = PngCodec.changedPixels(img, (f - 1) * 16, f * 16, 16)
      assert(ch === 0L || ch === 1024L,
        s"planted strip must change all or nothing, got $ch at $f")
      if (ch * 2 > 1024) cuts += 1
    }
    assert(cuts === 2)
    // sub-majority change: flip under half of one frame's pixels —
    // changedPixels counts them but the majority gate must not fire
    val m = new BufferedImage(64, 32, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 64) m.setRGB(x, y, 0x101010)
    for (y <- 16 until 24; x <- 0 until 64) m.setRGB(x, y, 0x202020) // 512 px
    val ch = PngCodec.changedPixels(m, 0, 16, 16)
    assert(ch === 512L && ch * 2 <= 1024L, s"sub-majority must not cut: $ch")
    // full-query row agreement on real shelf rows
    val out = graft.operators.Pipeline.mModalScenes.fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    out.foreach { case (id, nf, ns, ls, dp) =>
      assert(nf === 8 + id % 5)
      assert(ls === 2 + id % 3)
      assert(ns === (nf - 1) / ls + 1)
      assert(dp === (ns - 1) * 1024)
    }
  }

  test("audio fingerprint: shifted clips' frame hashes are a subsequence of the base's; planted pairs fully recovered") {
    val eb = Multimodal.audioBandEnergies(spark,
      Multimodal.fakeFpAudioTable(spark, sf))
    // recompute the per-frame Haitsma-Kalker hash exactly as the query
    val byDoc = eb.collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getLong(3)))
      .toMap
    def frameHash(d: Long, f: Long): Long =
      (1L to 7L).map { b =>
        val dd = (byDoc((d, f, b)) - byDoc((d, f, b - 1))) -
          (byDoc((d, f - 1, b)) - byDoc((d, f - 1, b - 1)))
        if (dd > 0) 1L << (b - 1) else 0L
      }.sum
    val nFrames = eb.groupBy(col("doc_id"))
      .agg((max(col("f")) + 1).as("nf")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // member k of a group is the base shifted by k whole frames:
    // hash(member, f) == hash(base, f + k) wherever both are defined
    val someDocs = nFrames.keys.filter(_ < 50)
    for (d <- someDocs; k = d % 5; base = d - k if k > 0) {
      for (f <- 1L until nFrames(d) if f + k < nFrames(base)) {
        assert(frameHash(d, f) === frameHash(base, f + k),
          s"doc $d frame $f must equal base $base frame ${f + k}")
      }
    }
    // the query recovers every planted within-group pair
    val pairs = graft.operators.Pipeline.mDedupAudio.fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val within = pairs.filter { case (a, b) => a / 5 == b / 5 }
    val docs = Tables.load(spark, sf, "documents").count()
    val expected = (docs / 5) * 10 + (docs % 5) * (docs % 5 - 1) / 2
    assert(within.length.toLong === expected,
      s"within-group pairs ${within.length} != planted $expected")
    // cross-group survivors are rare honest collisions, never a flood
    assert(pairs.length - within.length <= 5,
      s"cross-group collisions: ${pairs.length - within.length}")
  }
}
