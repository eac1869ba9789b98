package graft

import org.apache.spark.sql.functions._

import graft.ops.Multimodal
import graft.ops.Multimodal.{MediaMeta, MediaRow}

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def media(id: Long, n: Int, kind: String = "image"): MediaRow =
    MediaRow(id, Array.tabulate(n)(i => ((i * 7 + id) % 256).toByte),
      MediaMeta(kind, 64, 64, 0, 0L))

  test("decodeFeatures: batched mapPartitions, deterministic features, " +
      "metadata preserved") {
    val ds = Seq(media(1, 1000), media(2, 500, "audio"), media(3, 0))
      .toDS().repartition(2)
    val feats = Multimodal.decodeFeatures(ds).collect().sortBy(_.media_id)
    assert(feats.map(f => (f.media_id, f.kind, f.n_bytes)).toSeq ==
      Seq((1L, "image", 1000L), (2L, "audio", 500L), (3L, "image", 0L)))
    assert(feats.forall(_.features.length == 16))
    // determinism across partitionings
    val feats1 = Multimodal.decodeFeatures(ds.repartition(3)).collect()
      .sortBy(_.media_id)
    assert(feats.map(_.features.toSeq).toSeq == feats1.map(_.features.toSeq).toSeq)
    assert(feats(2).features.forall(_ == 0.0), "empty payload -> zero features")
  }

  test("decoded features feed the ANN stack: nearest media by payload") {
    // id=2 is a near-copy of id=1 (one byte differs); id=3..6 unrelated
    val m1 = media(1, 800)
    val m2bytes = m1.media.clone(); m2bytes(100) = (m2bytes(100) ^ 0x7).toByte
    val ds = (Multimodal.MediaRow(2, m2bytes, m1.meta) +: m1 +:
      (3L to 6L).map(i => media(i, 800 + i.toInt * 13))).toDS()
    val feats = Multimodal.decodeFeatures(ds).toDF()
    val nearest = graft.ops.Similarity.bruteForceTopK(
      feats, feats.filter(col("media_id") === 1), k = 1,
      idCol = "media_id", vecCol = "features")
    val top = nearest.head()
    assert(top.getAs[Long]("neighbor_id") == 2L,
      "near-identical payload must be the nearest by decoded features")
    assert(top.getAs[Double]("cosine") > 0.99)
  }

  test("frameSample: offset-stride slicing, bounded frames, metadata rides") {
    val df = Seq(media(1, 100), media(2, 25), media(3, 5)).toDS().toDF()
    val frames = Multimodal.frameSample(df, frameSize = 10, stride = 20,
      maxFrames = 4)
    val byId = frames.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // id=1: bytes 100 -> starts 0,20,40,60,80 but capped at 4 frames
    // id=2: bytes 25 -> frames at 0 (10b) and 20 (5b remaining -> short? substring gives 5 bytes)
    // id=3: bytes 5 -> one short frame at 0? (5-0-10+20)/20 = 0 -> zero frames
    assert(byId(1L) == 4)
    assert(byId(2L) == 1)
    assert(!byId.contains(3L))
    val f1 = frames.filter(col("media_id") === 1 && col("frame_idx") === 1).head()
    assert(f1.getAs[Int]("frame_start") == 20)
    assert(f1.getAs[Array[Byte]]("frame").length == 10)
    assert(f1.getAs[org.apache.spark.sql.Row]("meta").getAs[String]("kind") == "image")
    // frame bytes match the original payload slice
    val orig = media(1, 100).media.slice(20, 30).toSeq
    assert(f1.getAs[Array[Byte]]("frame").toSeq == orig)
  }

  test("balanceByBytes bounds per-task payload at target + one row") {
    val rng = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      // heavy-tailed payloads: a few rows dwarf the rest
      val n = if (i % 23 == 0) 40000 + rng.nextInt(20000) else 500 + rng.nextInt(2000)
      (i.toLong, Array.fill(n)(i.toByte))
    }
    val df = rows.toDF("media_id", "media")
    val target = 100000L
    val balanced = graft.ops.Multimodal.balanceByBytes(df, target, lanes = 4)
    val perPart = balanced.rdd.mapPartitions { it =>
      Iterator.single(it.map(_.getAs[Array[Byte]]("media").length.toLong).sum)
    }.collect().filter(_ > 0)
    val maxRow = rows.map(_._2.length).max
    assert(perPart.forall(_ <= target + maxRow),
      s"partition over budget: ${perPart.sorted.reverse.take(3).mkString(",")}")
    assert(balanced.count() == 200)
    // all payload bytes survive the rebalance
    assert(perPart.sum == rows.map(_._2.length.toLong).sum)
  }

  test("NativeCodecDecoder stays an explicit stub: decode throws " +
      "NotImplementedError with a deployment-pointed message") {
    val ex = intercept[NotImplementedError] {
      new graft.ops.Multimodal.NativeCodecDecoder()
        .decode(Array[Byte](1, 2, 3),
          graft.ops.Multimodal.MediaMeta("image", 2, 2, 0, 0L))
    }
    assert(ex.getMessage.contains("deployment stub"),
      s"stub must fail loud and attributable, got: ${ex.getMessage}")
  }

  test("perceptualHash + phashNearDup: stable fingerprints, banding " +
      "equals the all-pairs Hamming join exactly, near-copy found") {
    // id=2 is a near-copy of id=1 (3 bytes perturbed); 3..12 unrelated
    val m1 = media(1, 800)
    val m2bytes = m1.media.clone()
    for (p <- Seq(50, 300, 700)) m2bytes(p) = (m2bytes(p) ^ 0x3).toByte
    val ds = (MediaRow(2, m2bytes, m1.meta) +: m1 +:
      (3L to 12L).map(i => media(i, 600 + i.toInt * 37))).toDS()
    val hashed = Multimodal.perceptualHash(ds)
    // fingerprints are partitioning-independent
    val h1 = hashed.collect().map(r => r.media_id -> r.phash).toMap
    val h2 = Multimodal.perceptualHash(ds.repartition(5)).collect()
      .map(r => r.media_id -> r.phash).toMap
    assert(h1 == h2, "phash depends on partitioning")
    // identical payloads hash identically; the near-copy is close
    assert(Multimodal.perceptualHash(Seq(m1, MediaRow(99L, m1.media, m1.meta))
        .toDS()).collect().map(_.phash).distinct.length == 1)
    val pairs = Multimodal.phashNearDup(hashed.toDF())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L),
      s"near-copy pair missed: ${pairs.mkString(",")}")
    // banding is an optimization, not an approximation: exact parity
    // with the direct quadratic Hamming join at the same threshold
    val hs = h1.toSeq
    val direct = (for {
      (ia, ha) <- hs; (ib, hb) <- hs if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 7
    } yield (ia, ib, d.toLong)).toSet
    assert(pairs.toSet == direct,
      s"banding diverged from all-pairs: got ${pairs.toSet}, want $direct")
  }

  test("ByteCellDecoder: cells ARE the payload bytes (aHash arithmetic), " +
      "fingerprint = bits above the exact /64 mean, partition-stable") {
    // 64-byte payload, two intensity levels — mean sits strictly between
    val bytes = Array.tabulate(64)(i => if (i % 3 == 0) 200.toByte else 60.toByte)
    val ds = Seq(MediaRow(1L, bytes, MediaMeta("synthetic", 8, 8, 0, 0L))).toDS()
    val dec = new Multimodal.ByteCellDecoder(64)
    val cells = dec.decode(bytes, MediaMeta("synthetic", 8, 8, 0, 0L))
    assert(cells.toSeq == bytes.toSeq.map(b => (b & 0xff).toDouble))
    val got = Multimodal.perceptualHash(ds, dec).head().phash
    // direct replay: bit i set iff byte_i >= mean — integer-exact
    val mean = bytes.map(_ & 0xff).sum / 64.0
    var want = 0L
    for (i <- 0 until 64) if ((bytes(i) & 0xff) >= mean) want |= (1L << i)
    assert(got == want, f"phash $got%x != direct $want%x")
    // uniform payload: every cell equals the mean → all 64 bits set
    val uni = Array.fill(64)(60.toByte)
    val gotUni = Multimodal.perceptualHash(
      Seq(MediaRow(2L, uni, MediaMeta("synthetic", 8, 8, 0, 0L))).toDS(),
      dec).head().phash
    assert(gotUni == -1L, f"uniform payload: $gotUni%x")
  }

  // ---- probeHeader (round 5: the NOT-stubbed part) --------------------

  test("probeHeader parses real PNG/JPEG/GIF/WAV headers and refuses " +
      "garbage without throwing") {
    import graft.ops.Multimodal.{probeHeader, ProbedMeta}
    def png(w: Int, h: Int): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(24)
      out.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
        .map(_.toByte))
      out.putInt(13).put("IHDR".getBytes("US-ASCII"))
      out.putInt(w).putInt(h)
      out.array()
    }
    assert(probeHeader(png(640, 480)) ==
      ProbedMeta("png", 640, 480, 0, 0, ok = true))

    def jpeg(w: Int, h: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(64)
      bb.put(Array(0xff, 0xd8).map(_.toByte))           // SOI
      bb.put(Array(0xff, 0xe0).map(_.toByte))           // APP0
      bb.putShort(16).put(new Array[Byte](14))          // 16-byte segment
      bb.put(Array(0xff, 0xc0).map(_.toByte))           // SOF0
      bb.putShort(17).put(8.toByte)                     // len, precision
      bb.putShort(h.toShort).putShort(w.toShort)
      bb.array()
    }
    assert(probeHeader(jpeg(1024, 768)) ==
      ProbedMeta("jpeg", 1024, 768, 0, 0, ok = true))

    def gif(w: Int, h: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(16)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("GIF89a".getBytes("US-ASCII"))
      bb.putShort(w.toShort).putShort(h.toShort)
      bb.array()
    }
    assert(probeHeader(gif(320, 200)) ==
      ProbedMeta("gif", 320, 200, 0, 0, ok = true))

    def wav(rate: Int, ch: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(44)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36)
      bb.put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      bb.putShort(1).putShort(ch.toShort).putInt(rate)
      bb.array()
    }
    assert(probeHeader(wav(44100, 2)) ==
      ProbedMeta("wav", 0, 0, 44100, 2, ok = true))

    // garbage, truncation, and a JPEG with a corrupt segment length
    // all probe as unknown instead of throwing
    assert(!probeHeader("not media at all".getBytes).ok)
    assert(!probeHeader(png(1, 1).take(10)).ok)
    assert(!probeHeader(null).ok)
    val corrupt = jpeg(9, 9); corrupt(4) = 0; corrupt(5) = 0 // APP0 len=0
    assert(!probeHeader(corrupt).ok)
  }

  test("probeHeader parses ISO-BMFF (MP4): ftyp brand sniff, mvhd " +
      "duration, tkhd dimensions; corrupt box sizes refuse cleanly") {
    import graft.ops.Multimodal.probeHeader
    def box(ty: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length).put(ty.getBytes("US-ASCII"))
      bb.put(payload)
      bb.array()
    }
    val ftyp = box("ftyp", "isom0000isom".getBytes("US-ASCII"))
    // mvhd v0: ver+flags(4) ctime(4) mtime(4) timescale(4) duration(4)
    val mvhd = {
      val bb = java.nio.ByteBuffer.allocate(100)
      bb.putInt(0).putInt(0).putInt(0)
      bb.putInt(600)          // timescale
      bb.putInt(3000)         // duration → 5000 ms
      bb.array()
    }
    // tkhd v0: ver+flags(4) ctime mtime trackid reserved duration ...
    // width/height as 16.16 at offsets 76/80
    val tkhd = {
      val bb = java.nio.ByteBuffer.allocate(84)
      bb.position(76)
      bb.putShort(1920.toShort).putShort(0)
      bb.putShort(1080.toShort).putShort(0)
      bb.array()
    }
    val moov = box("moov", box("mvhd", mvhd) ++ box("trak", box("tkhd", tkhd)))
    val mp4 = ftyp ++ moov
    val got = probeHeader(mp4)
    assert(got.kind == "mp4" && got.ok)
    assert(got.durationMs == 5000L)
    assert(got.width == 1920 && got.height == 1080)
    // ftyp alone (no moov) still sniffs as mp4 — headers stream first
    assert(probeHeader(ftyp).kind == "mp4")
    // corrupt: first box claims a size beyond the buffer
    val bad = mp4.clone(); bad(0) = 0x7f.toByte
    assert(!probeHeader(bad).ok)
  }

  test("headerProbe over a corpus: typed struct column, garbage rows " +
      "flagged not dropped") {
    import spark.implicits._
    import graft.ops.Multimodal
    val rows = Seq(
      (1L, Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0d, 0x0a, 0x1a,
        0x0a, 0, 0, 0, 13, 'I'.toInt, 'H'.toInt, 'D'.toInt, 'R'.toInt,
        0, 0, 0, 64, 0, 0, 0, 32).map(_.toByte)),
      (2L, "garbage".getBytes))
    val df = rows.toDF("media_id", "media")
    val out = Multimodal.headerProbe(df)
      .select("media_id", "probed.kind", "probed.width", "probed.height",
        "probed.ok")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getInt(3), r.getBoolean(4))).toSet
    assert(out == Set((1L, "png", 64, 32, true),
      (2L, "unknown", 0, 0, false)), s"got $out")
  }

  test("pcmFrameEnergy: chunk walk skips a padded pre-data chunk, LE16 " +
      "decode sign-extends, truncation clamps to complete frames, " +
      "garbage yields no rows") {
    import spark.implicits._
    import graft.ops.Multimodal
    // hand-built WAV: RIFF/WAVE, then an ODD-sized junk chunk (walker
    // must honor RIFF's pad byte), then data with 8 samples:
    // [1, -1, 2, -2, 100, -100, 0, 0] → frames of 4:
    //   f0 energy 6 peak 2, f1 energy 200 peak 100
    def le16(v: Int) = Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = le16(v & 0xffff) ++ le16((v >> 16) & 0xffff)
    val samples = Seq(1, -1, 2, -2, 100, -100, 0, 0)
    val wav = ("RIFF".getBytes("US-ASCII").toSeq ++ le32(0) ++
      "WAVE".getBytes("US-ASCII").toSeq ++
      "junk".getBytes("US-ASCII").toSeq ++ le32(3) ++
      Seq[Byte](9, 9, 9, 0) ++ // 3 payload bytes + 1 RIFF pad
      "data".getBytes("US-ASCII").toSeq ++ le32(16) ++
      samples.flatMap(le16)).toArray
    def rowsOf(b: Array[Byte]) = Seq(Multimodal.MediaRow(1L, b,
      Multimodal.MediaMeta("synthetic", 0, 0, 0, 0L))).toDS()
    val got = Multimodal.pcmFrameEnergy(rowsOf(wav), frameSamples = 4)
      .collect().map(f => (f.frame_idx, f.energy, f.peak, f.silence)).toSet
    assert(got == Set((0, 6L, 2, false), (1, 200L, 100, false)), s"got $got")
    // truncate mid-frame-1: only frame 0 survives
    val cut = Multimodal.pcmFrameEnergy(rowsOf(wav.dropRight(6)),
      frameSamples = 4).collect()
    assert(cut.map(_.frame_idx).toSeq == Seq(0))
    // all-zero samples flag silence
    val quiet = wav.clone()
    for (i <- (wav.length - 16) until wav.length) quiet(i) = 0
    assert(Multimodal.pcmFrameEnergy(rowsOf(quiet), frameSamples = 4)
      .collect().forall(_.silence))
    // garbage: no RIFF, no rows — never a throw
    assert(Multimodal.pcmFrameEnergy(rowsOf("not audio at all".getBytes),
      frameSamples = 4).collect().isEmpty)
  }

  test("pcmFrameEnergy: corrupt declared chunk sizes terminate the walk " +
      "(negative size would otherwise loop forever; huge positive would " +
      "overflow the offset)") {
    import spark.implicits._
    import graft.ops.Multimodal
    def le16(v: Int) = Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = le16(v & 0xffff) ++ le16((v >> 16) & 0xffff)
    def rowsOf(b: Array[Byte]) = Seq(Multimodal.MediaRow(1L, b,
      Multimodal.MediaMeta("synthetic", 0, 0, 0, 0L))).toDS()
    val head = "RIFF".getBytes("US-ASCII").toSeq ++ le32(0) ++
      "WAVE".getBytes("US-ASCII").toSeq
    // sz = -8 (0xFFFFFFF8): step 8 + sz + (sz & 1) would advance by 0
    val loopy = (head ++ "junk".getBytes("US-ASCII").toSeq ++
      le32(0xFFFFFFF8) ++ Seq.fill(24)(0x41.toByte)).toArray
    assert(Multimodal.pcmFrameEnergy(rowsOf(loopy), frameSamples = 4)
      .collect().isEmpty)
    // sz = -9: step would advance by 0 via the odd-pad byte
    val loopy2 = (head ++ "junk".getBytes("US-ASCII").toSeq ++
      le32(0xFFFFFFF7) ++ Seq.fill(24)(0x41.toByte)).toArray
    assert(Multimodal.pcmFrameEnergy(rowsOf(loopy2), frameSamples = 4)
      .collect().isEmpty)
    // sz = Int.MaxValue: an Int walk would overflow `off` negative and
    // the id read would throw; the Long walk just runs off the end
    val huge = (head ++ "junk".getBytes("US-ASCII").toSeq ++
      le32(Int.MaxValue) ++ Seq.fill(24)(0x41.toByte)).toArray
    assert(Multimodal.pcmFrameEnergy(rowsOf(huge), frameSamples = 4)
      .collect().isEmpty)
    // a corrupt chunk BEFORE a valid data chunk stops the walk (corrupt
    // size means the remaining byte positions aren't trustworthy)
    val corruptThenData = (head ++ "junk".getBytes("US-ASCII").toSeq ++
      le32(0xFFFFFFF8) ++
      "data".getBytes("US-ASCII").toSeq ++ le32(8) ++
      Seq(1, -1, 2, -2).flatMap(le16)).toArray
    assert(Multimodal.pcmFrameEnergy(rowsOf(corruptThenData),
      frameSamples = 4).collect().isEmpty)
  }
}
