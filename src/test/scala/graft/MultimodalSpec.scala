package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  test("sniffFormat: real magic bytes classify, WAVE needs the byte-8 tag, junk is unknown") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.{col, unhex}
    val cases = Seq(
      ("ffd8ffe000104a46", "jpeg"),
      ("89504e470d0a1a0a", "png"),
      ("524946461234567857415645", "wav"),  // RIFF....WAVE
      ("524946461234567841564920", "unknown"), // RIFF....AVI_ — not WAVE
      ("474946383961", "gif"),
      ("0001020304", "unknown"))
    val got = cases.map(_._1).toDF("hx")
      .select(Multimodal.sniffFormat(unhex(col("hx"))).as("f"))
      .as[String].collect()
    got.zip(cases).foreach { case (g, (hx, want)) =>
      assert(g == want, s"sniff($hx)") }
  }

  test("stub decode: checksum/byte-length arithmetic on known payload") {
    val s = spark
    import s.implicits._
    val docs = Seq((0L, "abc")).toDF("doc_id", "text")
    val r = Multimodal.extractFeatures(spark, Multimodal.withPayload(docs)).collect()(0)
    assert(r.getAs[String]("media_kind") == "image") // doc_id % 3 == 0
    assert(r.getAs[Long]("n_bytes") == 3L)
    // fold: ((0*31+97)*31+98)*31+99 = 97*31+98 = 3105; 3105*31+99 = 96354
    assert(r.getAs[Long]("checksum") == 96354L)
    assert(r.getSeq[Float](r.fieldIndex("features")).length == 8)
  }

  test("feature stats cover all media kinds and every row") {
    val out = Multimodal.featureStats(spark, Tables.documents(spark, sf0001)).collect()
    assert(out.map(_.getAs[String]("media_kind")).toSet == Set("image", "audio", "video"))
    assert(out.map(_.getAs[Long]("cnt")).sum == 500L)
  }

  test("frame sample: index arithmetic, stride, and one row per sampled frame") {
    val s = spark
    import s.implicits._
    // doc_id % 3 == 2 -> video; n_chars=100 -> n_frames = 100*2 DIV 5 = 40
    // stride 8 -> frames 0,8,16,24,32 (5 samples, last 32)
    val docs = Seq((2L, "x", 100L), (3L, "y", 100L)) // doc 3 is not video
      .toDF("doc_id", "text", "n_chars")
    val frames = Multimodal.frameSample(docs, stride = 8).collect()
    assert(frames.forall(_.getAs[Long]("doc_id") == 2L))
    assert(frames.map(_.getAs[Long]("frame_idx")).sorted.toSeq ==
      Seq(0L, 8L, 16L, 24L, 32L))
    val sum = Multimodal.frameSampleSummary(docs, stride = 8).collect()
    assert(sum.length == 1)
    assert(sum(0).getAs[Long]("n_sampled") == 5L)
    assert(sum(0).getAs[Long]("last_frame") == 32L)
    // checksum: sum over f in {0,8,16,24,32} of (2*131 + f*7919) % 1e9+7
    val expect = Seq(0L, 8L, 16L, 24L, 32L)
      .map(f => (2L * 131 + f * 7919) % 1000000007L).sum
    assert(sum(0).getAs[Long]("sum_checksum") == expect)
  }

  test("frame sample: tiny docs still yield at least one frame") {
    val s = spark
    import s.implicits._
    val docs = Seq((2L, "x", 1L)).toDF("doc_id", "text", "n_chars")
    val sum = Multimodal.frameSampleSummary(docs).collect()
    assert(sum.length == 1 && sum(0).getAs[Long]("n_sampled") == 1L)
  }

  test("image decode: PNG round trip recovers the exact pixel formula") {
    val s = spark
    import s.implicits._
    val docs = Seq(5L, 12L).toDF("doc_id")
    val out = Multimodal.imageDecodeReport(spark, docs).collect()
    assert(out.length == 2)
    val r = out(0) // doc_id 5: w = 16 + 5 = 21, h = 16 + 5 = 21
    assert(r.getAs[Int]("width") == 21 && r.getAs[Int]("height") == 21)
    assert(r.getAs[Int]("n_bands") == 3)
    // closed-form sums straight from the pixel formula
    def expect(id: Long, w: Int, h: Int, c: Int): Long =
      (for (x <- 0 until w; y <- 0 until h)
        yield (id * 31 + x * 7 + y * 13 + c * 101) % 256).sum
    assert(r.getAs[Long]("sum_r") == expect(5, 21, 21, 0))
    assert(r.getAs[Long]("sum_g") == expect(5, 21, 21, 1))
    assert(r.getAs[Long]("sum_b") == expect(5, 21, 21, 2))
    assert(r.getAs[Double]("mean_r") == expect(5, 21, 21, 0).toDouble / (21 * 21))
  }

  test("image decode: unreadable payload becomes a NULL-stats row, not an exception") {
    val s = spark
    import s.implicits._
    val bad = Seq((7L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload")
    val out = Multimodal.imageDecodeStats(spark, bad).collect()(0)
    assert(out.getAs[Long]("doc_id") == 7L)
    assert(out.isNullAt(out.fieldIndex("width")))
    assert(out.isNullAt(out.fieldIndex("mean_r")))
  }

  test("audio decode: WAV round trip recovers the exact sample formula") {
    val s = spark
    import s.implicits._
    val docs = Seq(3L, 250L).toDF("doc_id")
    val out = Multimodal.audioDecodeReport(spark, docs).collect()
    assert(out.length == 2)
    def samples(id: Long): Seq[Long] = {
      val n = (200 + id % 200).toInt
      (0 until n).map(i => (id * 31 + i.toLong * 17) % 65536 - 32768)
    }
    for ((r, id) <- out.zip(Seq(3L, 250L))) {
      val ss = samples(id)
      assert(r.getAs[Int]("sample_rate") == 8000)
      assert(r.getAs[Int]("n_channels") == 1)
      assert(r.getAs[Long]("n_samples") == ss.length.toLong)
      assert(r.getAs[Long]("sum_amp") == ss.sum)
      assert(r.getAs[Long]("sum_sq") == ss.map(x => x * x).sum)
      assert(r.getAs[Int]("min_amp") == ss.min.toInt)
      assert(r.getAs[Int]("max_amp") == ss.max.toInt)
      assert(r.getAs[Long]("n_zero_cross") ==
        ss.sliding(2).count(p => (p(0) < 0) != (p(1) < 0)).toLong)
      assert(r.getAs[Double]("rms") ==
        math.sqrt(ss.map(x => x * x).sum.toDouble / ss.length))
    }
  }

  test("image resize: NN thumbnail sums match the sampled-pixel formula exactly") {
    val s = spark
    import s.implicits._
    val docs = Seq(5L, 23L).toDF("doc_id")
    val out = Multimodal.imageResizeReport(spark, docs).collect()
    assert(out.length == 2)
    for ((r, id) <- out.zip(Seq(5L, 23L))) {
      val w = (16 + id % 16).toInt
      val h = (16 + id % 8).toInt
      def px(x: Int, y: Int, c: Int) = (id * 31 + x * 7 + y * 13 + c * 101) % 256
      val sums = (for { dy <- 0 until 8; dx <- 0 until 8 } yield {
        val (sx, sy) = (dx * w / 8, dy * h / 8)
        (px(sx, sy, 0), px(sx, sy, 1), px(sx, sy, 2))
      })
      assert(r.getAs[Int]("src_w") == w && r.getAs[Int]("src_h") == h)
      assert(r.getAs[Long]("sum_r") == sums.map(_._1).sum)
      assert(r.getAs[Long]("sum_g") == sums.map(_._2).sum)
      assert(r.getAs[Long]("sum_b") == sums.map(_._3).sum)
      assert(r.getAs[Double]("mean_r") == sums.map(_._1).sum.toDouble / 64)
    }
  }

  test("image decode: truncated PNG (recognized header, corrupt body) is a NULL row, not a task kill") {
    val s = spark
    import s.implicits._
    // a real PNG cut in half: ImageIO RECOGNIZES it and throws from the
    // reader (read() only returns null for unrecognized bytes) — the
    // fenced decode must turn that into an error row
    val full = Multimodal.withImagePayload(spark, Seq(7L).toDF("doc_id"))
      .collect()(0).getAs[Array[Byte]]("payload")
    val broken = Seq((7L, full.take(full.length / 2))).toDF("doc_id", "payload")
    val out = Multimodal.imageDecodeStats(spark, broken).collect()(0)
    assert(out.isNullAt(out.fieldIndex("width")))
    val rz = Multimodal.imageResizeStats(spark, broken).collect()(0)
    assert(rz.isNullAt(rz.fieldIndex("src_w")))
  }

  test("image decode: grayscale (fewer than 3 bands) is a NULL row, not an OOB band access") {
    val s = spark
    import s.implicits._
    val img = new java.awt.image.BufferedImage(
      4, 4, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val gray = Seq((3L, bos.toByteArray)).toDF("doc_id", "payload")
    val out = Multimodal.imageDecodeStats(spark, gray).collect()(0)
    assert(out.isNullAt(out.fieldIndex("sum_r")))
    val rz = Multimodal.imageResizeStats(spark, gray).collect()(0)
    assert(rz.isNullAt(rz.fieldIndex("sum_r")))
  }

  test("image resize: unreadable payload becomes a NULL-stats row") {
    val s = spark
    import s.implicits._
    val bad = Seq((4L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload")
    val out = Multimodal.imageResizeStats(spark, bad).collect()(0)
    assert(out.getAs[Long]("doc_id") == 4L)
    assert(out.isNullAt(out.fieldIndex("src_w")))
    assert(out.isNullAt(out.fieldIndex("sum_r")))
  }

  test("audio decode: unreadable payload becomes a NULL-stats row, not an exception") {
    val s = spark
    import s.implicits._
    val bad = Seq((9L, Array[Byte](82, 73, 70))).toDF("doc_id", "payload")
    val out = Multimodal.audioDecodeStats(spark, bad).collect()(0)
    assert(out.getAs[Long]("doc_id") == 9L)
    assert(out.isNullAt(out.fieldIndex("n_samples")))
    assert(out.isNullAt(out.fieldIndex("rms")))
  }

  test("imageNearDupPairs: brightness-shift variants recovered through a REAL decode, cross-group images stay apart") {
    val s = spark
    import s.implicits._
    val docs = (0L until 44L).toDF("doc_id")
    val pairs = Multimodal.imageNearDupPairs(s, docs, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    // hand-simulated group 1 (ids 4..7): five of six variant pairs sit at
    // Hamming <= 3 (the 4-7 pair drifts to 4 via mod-256 wraps) — pinned
    assert(pairs((4L, 5L)) == 2 && pairs((4L, 6L)) == 2 && pairs((5L, 6L)) == 0)
    assert(pairs((5L, 7L)) == 2 && pairs((6L, 7L)) == 2)
    assert(!pairs.contains((4L, 7L)))
    // group 0's zero-distance variant pairs
    assert(pairs((0L, 1L)) == 0 && pairs((2L, 3L)) == 0)
    // distinct gradients keep distinct groups far apart (sim: d(0,40)=27)
    assert(!pairs.contains((0L, 40L)))
    assert(pairs.forall(_._2 <= 3))
  }

  test("imageAHash: unreadable payloads drop from the fingerprint stream") {
    val s = spark
    import s.implicits._
    val payloads = Seq(
      (1L, Array[Byte](1, 2, 3)),               // not an image
      (2L, "89504e47deadbeef".grouped(2).map(Integer.parseInt(_, 16).toByte).toArray))
      .toDF("doc_id", "payload")                // recognized PNG header, corrupt body
    assert(Multimodal.imageAHash(s, payloads).count() == 0L)
  }

  test("audioNearDupPairs: amplitude-scaled variants recovered through a REAL WAV decode, groups stay apart") {
    val s = spark
    import s.implicits._
    val docs = (0L until 48L).toDF("doc_id") // 12 groups of 4 variants
    val pairs = Multimodal.audioNearDupPairs(s, docs, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    // every within-group variant pair recovered (gain-invariant delta
    // signs; simulation shows Hamming <= 1 on all planted pairs)
    for (g <- 0L until 12L; a <- 0 until 4; b <- a + 1 until 4) {
      val k = (g * 4 + a, g * 4 + b)
      assert(pairs.contains(k), s"missing planted pair $k")
      assert(pairs(k) <= 1)
    }
    // nothing across groups (simulated inter-group Hamming >= 17)
    assert(pairs.size == 12 * 6)
  }

  test("audioEnergyHash: gain-rescaled signal keeps its fingerprint; unreadable/short payloads drop") {
    val s = spark
    import s.implicits._
    def wav(samples: Array[Int]): Array[Byte] = {
      val pcm = new Array[Byte](samples.length * 2)
      samples.indices.foreach { i =>
        pcm(2 * i) = (samples(i) & 0xff).toByte
        pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val base = (0 until 256).map(i => Multimodal.audioBase(7L, i.toLong)).toArray
    val halved = base.map(v => v / 2)
    val fps = Multimodal.audioEnergyHash(s, Seq(
        (1L, wav(base)), (2L, wav(halved)),
        (3L, Array[Byte](1, 2, 3)),          // not a WAV
        (4L, wav(Array.fill(10)(100))))      // shorter than 64 frames
      .toDF("doc_id", "payload"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(fps.keySet == Set(1L, 2L)) // unreadable + too-short dropped
    // a uniform gain change preserves every energy comparison exactly
    // (|v/2| sums halve, give or take truncation that never flips these)
    assert(fps(1L) == fps(2L))
  }

  test("imageAHash: grayscale and palette rasters fingerprint — and match their RGB twin") {
    val s = spark
    import s.implicits._
    import java.awt.image.BufferedImage
    def png(img: BufferedImage): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    // same 16x16 gray gradient rendered three ways: 3-band RGB (r=g=b),
    // 1-band TYPE_BYTE_GRAY, and an indexed/palette raster — readable
    // single-band images are common in real corpora and must NOT escape
    // the fingerprint stream
    def fill(img: BufferedImage): BufferedImage = {
      for (y <- 0 until 16; x <- 0 until 16) {
        val g = (x * 16 + y * 3) % 256
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      img
    }
    val rgb = fill(new BufferedImage(16, 16, BufferedImage.TYPE_INT_RGB))
    val gray = fill(new BufferedImage(16, 16, BufferedImage.TYPE_BYTE_GRAY))
    val indexed = fill(new BufferedImage(16, 16, BufferedImage.TYPE_BYTE_INDEXED))
    val fps = Multimodal.imageAHash(s,
        Seq((1L, png(rgb)), (2L, png(gray)), (3L, png(indexed)))
          .toDF("doc_id", "payload"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(fps.keySet == Set(1L, 2L, 3L)) // none dropped
    // gray g decodes to r=g=b: identical per-cell 3g sums => identical hash
    assert(fps(2L) == fps(1L))
    // the 216-color palette quantizes but preserves the gradient's
    // above/below-mean structure: the indexed twin stays near the RGB hash
    val (hi, lo) = fps(1L); val (hi3, lo3) = fps(3L)
    assert(java.lang.Long.bitCount(hi ^ hi3) + java.lang.Long.bitCount(lo ^ lo3) <= 3)
  }

  // --- RiffWav: the hand-rolled lock-free WAV codec that replaced the
  // javax.sound.sampled provider (JVM-global lock). Interop is the
  // certification: each direction decodes the other's bytes sample-exact.

  private def pcmBytes(samples: Array[Int]): Array[Byte] = {
    val pcm = new Array[Byte](samples.length * 2)
    samples.indices.foreach { i =>
      pcm(2 * i) = (samples(i) & 0xff).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
    }
    pcm
  }

  test("RiffWav encode: javax.sound decodes our bytes sample-exact (and the header is canonical)") {
    import graft.operators.RiffWav
    val samples = Array.tabulate(333)(i => ((i * 7919 + 13) % 65536) - 32768)
    val bytes = RiffWav.encode(pcmBytes(samples), 8000)
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val fmt = ais.getFormat
    assert(fmt.getSampleRate == 8000f && fmt.getSampleSizeInBits == 16)
    assert(fmt.getChannels == 1 && !fmt.isBigEndian)
    assert(fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
    assert(java.util.Arrays.equals(ais.readAllBytes(), pcmBytes(samples)))
    // and our own decoder round-trips bit-exact
    val Some((f2, s2)) = RiffWav.decodeInt16Mono(bytes)
    assert(f2 == RiffWav.Format(8000, 16, 1) && s2.sameElements(samples))
  }

  test("RiffWav decode: javax.sound-written bytes parse sample-exact") {
    import graft.operators.RiffWav
    val samples = Array.tabulate(257)(i => ((i * 31 + 7) % 65536) - 32768)
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcmBytes(samples)), fmt, samples.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    val Some((f, s)) = RiffWav.decodeInt16Mono(out.toByteArray)
    assert(f == RiffWav.Format(8000, 16, 1))
    assert(s.sameElements(samples))
  }

  test("RiffWav decode: chunk walk skips unknown odd-sized chunks (pad-byte aware); malformed/non-PCM is None") {
    import graft.operators.RiffWav
    val samples = Array.tabulate(64)(i => i * 100 - 3200)
    val plain = RiffWav.encode(pcmBytes(samples), 8000)
    // splice an odd-sized LIST chunk (5 bytes + 1 pad) between fmt and data
    val listChunk = Array[Byte]('L', 'I', 'S', 'T', 5, 0, 0, 0,
      'I', 'N', 'F', 'O', 'x', 0 /* pad */)
    val spliced = plain.take(36) ++ listChunk ++ plain.drop(36)
    // patch the RIFF size field (u32le at offset 4) for the added bytes
    val newSize = plain.length - 8 + listChunk.length
    spliced(4) = (newSize & 0xff).toByte
    spliced(5) = ((newSize >>> 8) & 0xff).toByte
    spliced(6) = ((newSize >>> 16) & 0xff).toByte
    spliced(7) = ((newSize >>> 24) & 0xff).toByte
    val Some((f, s)) = RiffWav.decodeInt16Mono(spliced)
    assert(f == RiffWav.Format(8000, 16, 1) && s.sameElements(samples))
    // malformed shapes -> None, never throw
    assert(RiffWav.decode(Array[Byte](1, 2, 3)).isEmpty)            // junk
    assert(RiffWav.decode(plain.take(40)).isEmpty)                  // truncated data
    val floatFmt = plain.clone(); floatFmt(20) = 3                  // IEEE-float PCM
    assert(RiffWav.decode(floatFmt).isEmpty)
    val stereo = plain.clone(); stereo(22) = 2                      // channels=2
    assert(RiffWav.decodeInt16Mono(stereo).isEmpty)                 // mono gate
    val notWave = plain.clone(); notWave(8) = 'A'                   // RIFF, not WAVE
    assert(RiffWav.decode(notWave).isEmpty)
  }
}
