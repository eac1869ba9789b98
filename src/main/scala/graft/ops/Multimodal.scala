package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) columns for training-data pipelines.
  *
  * Media are opaque `binary` columns plus a typed metadata struct —
  * the lakehouse-native layout: bytes travel with their row, partition
  * pruning and predicate pushdown work on the metadata, and decode-heavy
  * stages run as `mapPartitions` batches so per-partition setup (decoder
  * init, model load) amortizes across rows — the Scala analog of a
  * Pandas-UDF `mapInPandas` stage.
  *
  * The actual codec work is STUBBED by design: real image/audio codecs
  * are not available in this environment, so [[Decoder]] is a trait and
  * the default [[DeterministicFakeDecoder]] derives features from the
  * bytes deterministically. The Spark-side plumbing — schema, batch
  * shape, partitioning, metadata propagation — is real and tested; a
  * deployment swaps in a JNI/javacpp decoder without touching the plan.
  */
object Multimodal {

  /** Typed media metadata (the `meta` struct column). */
  case class MediaMeta(kind: String, width: Int, height: Int,
      sampleRate: Int, durationMs: Long)

  case class MediaRow(media_id: Long, media: Array[Byte], meta: MediaMeta)

  case class FeatureRow(media_id: Long, kind: String, n_bytes: Long,
      features: Array[Double])

  /** Per-partition decoder contract. `open()` runs once per partition
    * (amortized setup), `decode` once per row. */
  trait Decoder extends Serializable {
    def open(): Unit = ()
    def decode(bytes: Array[Byte], meta: MediaMeta): Array[Double]
    def close(): Unit = ()
  }

  /** Deterministic stand-in for a real codec: features are a fixed-size
    * signature of the payload bytes (moments of byte windows). Stable
    * across runs/partitionings, so specs can assert exact values. */
  class DeterministicFakeDecoder(dim: Int = 16) extends Decoder {
    override def decode(bytes: Array[Byte], meta: MediaMeta): Array[Double] = {
      val out = new Array[Double](dim)
      if (bytes.isEmpty) return out
      var i = 0
      while (i < bytes.length) {
        out(i % dim) += (bytes(i) & 0xff).toDouble / 255.0
        i += 1
      }
      var d = 0
      while (d < dim) { out(d) = math.rint(out(d) * 1e6) / 1e6; d += 1 }
      out
    }
  }

  /** aHash-parity cell source: treats the payload bytes AS the 8×8
    * grayscale cell intensities (0..255) a real image decoder's
    * downsample would produce — decode = the first `dim` unsigned byte
    * values as doubles. Classic average-hash compares integer pixel
    * intensities to their mean, and this decoder preserves exactly that
    * arithmetic: every cell is an integer-valued double and the mean is
    * an exact /64 division, so the 64-bit fingerprint is replayable
    * bit-for-bit by an external integer-arithmetic oracle (the
    * mm_phash_pairs gate) — no float rounding anywhere. */
  class ByteCellDecoder(dim: Int = 64) extends Decoder {
    override def decode(bytes: Array[Byte], meta: MediaMeta): Array[Double] = {
      val n = math.min(dim, bytes.length)
      val out = new Array[Double](n)
      var i = 0
      while (i < n) { out(i) = (bytes(i) & 0xff).toDouble; i += 1 }
      out
    }
  }

  /** Real-codec stub: the deployment point for an actual decoder.
    * Deliberately unimplemented in this environment (equivalent to `???`
    * but with a pointed message, so a misconfigured pipeline fails loud
    * and attributable — never silently decodes garbage). */
  class NativeCodecDecoder extends Decoder {
    override def decode(bytes: Array[Byte], meta: MediaMeta): Array[Double] =
      throw new NotImplementedError(
        "NativeCodecDecoder is a deployment stub: link a real image/audio " +
        "codec at this extension point (none is available in-container); " +
        "tests use DeterministicFakeDecoder")
  }

  /** Decode/feature-extract as a batched mapPartitions stage. The
    * decoder opens once per partition; rows stream through without
    * collecting the partition in memory. */
  def decodeFeatures(media: Dataset[MediaRow],
      decoder: Decoder = new DeterministicFakeDecoder()): Dataset[FeatureRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      decoder.open()
      // close exactly once at TASK completion — a downstream limit()
      // can abandon the iterator mid-partition (close would never fire
      // if keyed to exhaustion), and Spark's iterator plumbing may call
      // hasNext again after exhaustion (close must not double-fire on a
      // non-idempotent native decoder)
      var closed = false
      def closeOnce(): Unit = if (!closed) { closed = true; decoder.close() }
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => closeOnce()))
      rows.map { r =>
        FeatureRow(r.media_id, r.meta.kind, r.media.length.toLong,
          decoder.decode(r.media, r.meta))
      }
    }
  }

  /** Spill-aware rebalance for fat binary rows: route rows into packs
    * whose TOTAL payload stays under `targetBytes`, then range-route one
    * pack per task — a decode stage's working set is bounded by the
    * budget (+ one row), not by however many 100 MB videos the upstream
    * shuffle happened to co-locate. Same lane-prefix-sum shape as
    * [[graft.sources.Layout.planBins]] / `Splits.packSequences`: lanes
    * bound the window partitions, so the cumulative sum parallelizes; a
    * row larger than the budget gets a pack of its own. */
  def balanceByBytes(df: DataFrame, targetBytes: Long, lanes: Int = 32,
      idCol: String = "media_id", mediaCol: String = "media"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val lane = pmod(xxhash64(col(idCol)), lit(lanes))
    val w = Window.partitionBy("__lane").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    // the pack assignment needs only (id, payload length) — compute and
    // persist it SLIM (two longs per row), so the count action and the
    // range sampler replay the tiny map, and the fat payload column
    // flows through exactly one job (the final routing). Range
    // boundaries come from sampling, so two ADJACENT packs can land in
    // one task occasionally — the working-set bound is ≤ 2× budget
    // worst-case, budget + one row typically.
    val packMap = df
      .select(col(idCol), length(col(mediaCol)).cast("long").as("__bytes"))
      .withColumn("__lane", lane)
      .withColumn("__start", coalesce(sum(col("__bytes")).over(w), lit(0L)))
      .withColumn("__pack",
        col("__lane") * lit(1000000L) + (col("__start") / lit(targetBytes)).cast("long"))
      .select(col(idCol), col("__pack"))
      .persist(MEMORY_AND_DISK)
    val nPacks = packMap.agg(countDistinct(col("__pack"))).head().getLong(0)
    df.join(packMap, idCol)
      .repartitionByRange(nPacks.toInt.max(1), col("__pack"))
      .drop("__pack")
  }

  case class HashedRow(media_id: Long, kind: String, n_bytes: Long,
      phash: Long)

  /** 64-bit perceptual fingerprint (average-hash): bit i is set iff the
    * decoder's cell-i intensity is ≥ the mean over all cells. Runs in
    * the same once-per-partition decoder batch as [[decodeFeatures]];
    * with a real image decoder the cells are the classic 8×8
    * downsampled grayscale, with the deterministic fake they are its
    * byte-window means — either way the fingerprint is stable across
    * runs/partitionings, which is what the dedup contract needs. */
  def perceptualHash(media: Dataset[MediaRow],
      decoder: Decoder = new DeterministicFakeDecoder(64)): Dataset[HashedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      decoder.open()
      var closed = false
      def closeOnce(): Unit = if (!closed) { closed = true; decoder.close() }
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => closeOnce()))
      rows.map { r =>
        val cells = decoder.decode(r.media, r.meta)
        var sum = 0.0
        var i = 0
        while (i < cells.length) { sum += cells(i); i += 1 }
        val mean = if (cells.isEmpty) 0.0 else sum / cells.length
        var h = 0L
        i = 0
        while (i < cells.length && i < 64) {
          if (cells(i) >= mean) h |= (1L << i)
          i += 1
        }
        HashedRow(r.media_id, r.meta.kind, r.media.length.toLong, h)
      }
    }
  }

  /** Near-duplicate media pairs within Hamming distance `maxHamming` of
    * their perceptual hashes — the multimodal twin of text SimHash
    * dedup, sharing its banding argument: 8 bands of 8 bits mean any
    * pair within Hamming ≤ 7 agrees on at least one full band
    * (pigeonhole), so band-bucket candidates + an in-join Hamming
    * verify return EXACTLY the pairs a quadratic all-pairs Hamming scan
    * would. The verify runs inside the join (before the distinct) so a
    * hot band value's C(k,2) false-positive candidates are filtered as
    * the buckets stream, never shuffled. */
  def phashNearDup(hashed: DataFrame, maxHamming: Int = 7): DataFrame = {
    require(maxHamming <= 7, "8x8-bit banding guarantees recall only to Hamming 7")
    val banded = hashed
      .select(col("media_id"), col("phash"),
        explode(sequence(lit(0), lit(7))).as("band"))
      .withColumn("bval", expr("(phash >> (8 * band)) & 255"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
          col("a.media_id") < col("b.media_id") &&
          expr("bit_count(a.phash ^ b.phash)") <= maxHamming)
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
        expr("CAST(bit_count(a.phash ^ b.phash) AS BIGINT)").as("hamming"))
      .distinct()
      .orderBy("id_a", "id_b")
  }

  /** Deterministic frame/chunk sampling over a binary payload: slice
    * `frameSize`-byte frames starting at `offset`, stepping `stride`
    * bytes, at most `maxFrames` per row; metadata rides along. Pure
    * column operations (codegen, no UDF): one output row per frame. */
  def frameSample(df: DataFrame, frameSize: Int, stride: Int,
      maxFrames: Int = 8, offset: Int = 0,
      mediaCol: String = "media"): DataFrame = {
    require(frameSize > 0 && stride > 0 && maxFrames > 0)
    val nAvail = greatest(lit(0),
      (length(col(mediaCol)) - offset - frameSize + stride) / stride)
    val nFrames = least(lit(maxFrames), nAvail).cast("int")
    df
      .withColumn("frame_idx",
        explode(when(nFrames > 0, sequence(lit(0), nFrames - 1))
          .otherwise(array().cast("array<int>"))))
      .withColumn("frame_start", lit(offset) + col("frame_idx") * stride)
      .withColumn("frame",
        expr(s"substring($mediaCol, frame_start + 1, $frameSize)"))
      .drop(mediaCol)
  }

  /** Probed container metadata — see [[probeHeader]]. `durationMs` is
    * filled only by containers that declare one (MP4 mvhd). */
  case class ProbedMeta(kind: String, width: Int, height: Int,
      sampleRate: Int, channels: Int, durationMs: Long = 0L, ok: Boolean)

  /** REAL container-header parsing (no codec needed — this is the part
    * of the multimodal lane that is NOT stubbed): sniff the magic bytes
    * and read dimensions/audio shape straight from the container
    * header. Supports PNG (IHDR), JPEG (SOF scan across C0–CF frame
    * markers), GIF (logical screen, little-endian), and WAV
    * (RIFF/fmt chunk walk). Anything else — or a truncated/corrupt
    * header — probes as `("unknown", ok = false)` rather than
    * throwing: a 100 TB media crawl ALWAYS contains garbage rows, and
    * a probe that kills the task on one of them kills the job.
    * Validation-at-ingest pairs with [[Quality]]: route `!ok` rows to a
    * quarantine sink, never silently drop. */
  def probeHeader(b: Array[Byte]): ProbedMeta = {
    def u8(i: Int) = b(i) & 0xff
    def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int) = (u8(i).toLong << 24 | u8(i + 1) << 16 |
      u8(i + 2) << 8 | u8(i + 3)).toInt
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int) = (u8(i).toLong | u8(i + 1).toLong << 8 |
      u8(i + 2).toLong << 16 | u8(i + 3).toLong << 24).toInt
    def ascii(i: Int, n: Int) = new String(b, i, n, "US-ASCII")
    val bad = ProbedMeta("unknown", 0, 0, 0, 0, ok = false)
    if (b == null || b.length < 12) return bad
    try {
      if (u8(0) == 0x89 && ascii(1, 3) == "PNG" && b.length >= 24 &&
          ascii(12, 4) == "IHDR")
        ProbedMeta("png", be32(16), be32(20), 0, 0, ok = true)
      else if (u8(0) == 0xff && u8(1) == 0xd8) {
        // walk JPEG segments: FF mm len(2, incl itself); SOFn holds
        // precision(1) height(2) width(2)
        var i = 2
        var out = bad
        while (out.kind == "unknown" && i + 3 < b.length && u8(i) == 0xff) {
          val m = u8(i + 1)
          if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) i += 2
          else {
            val len = be16(i + 2)
            val isSof = m >= 0xc0 && m <= 0xcf &&
              m != 0xc4 && m != 0xc8 && m != 0xcc
            if (isSof && i + 9 < b.length)
              out = ProbedMeta("jpeg", be16(i + 7), be16(i + 5), 0, 0, ok = true)
            else if (len < 2) i = b.length // corrupt length: stop
            else i += 2 + len
          }
        }
        out
      }
      else if (ascii(0, 3) == "GIF" &&
          (ascii(3, 3) == "87a" || ascii(3, 3) == "89a"))
        ProbedMeta("gif", le16(6), le16(8), 0, 0, ok = true)
      else if (ascii(0, 4) == "RIFF" && b.length >= 36 &&
          ascii(8, 4) == "WAVE") {
        // chunk walk to "fmt ": id(4) size(4 LE) payload
        var i = 12
        var out = bad
        while (out.kind == "unknown" && i + 8 <= b.length) {
          val id = ascii(i, 4)
          val sz = le32(i + 4)
          if (id == "fmt " && sz >= 16 && i + 8 + 16 <= b.length)
            out = ProbedMeta("wav", 0, 0, le32(i + 8 + 4), le16(i + 8 + 2),
              ok = true)
          else if (sz < 0) i = b.length
          else i += 8 + sz + (sz & 1) // RIFF chunks are word-aligned
        }
        out
      }
      else if (b.length >= 12 && ascii(4, 4) == "ftyp") {
        // ISO BMFF (MP4/MOV/M4A): sibling box walk [size u32 BE][type];
        // size==1 → 64-bit largesize, size==0 → box runs to EOF. Video
        // dims come from moov/trak/tkhd (16.16 fixed point), duration
        // from moov/mvhd (v0: u32 at +12/+16; v1: u64 at +20/+24).
        def be64(i: Int): Long = (0 until 8)
          .foldLeft(0L)((a, j) => (a << 8) | u8(i + j))
        def walk(from: Int, to: Int): Seq[(String, Int, Int)] = {
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(String, Int, Int)]
          var i = from
          var sane = true
          while (sane && i + 8 <= to) {
            val sz = be32(i).toLong & 0xffffffffL
            val ty = ascii(i + 4, 4)
            val (p0, end) =
              if (sz == 1 && i + 16 <= to) (i + 16, i + be64(i + 8))
              else if (sz == 0) (i + 8, to.toLong)
              else (i + 8, i + sz)
            if (end <= i || end > to || p0 > end) sane = false
            else { out += ((ty, p0, end.toInt)); i = end.toInt }
          }
          out.toSeq
        }
        val top = walk(0, b.length)
        val moov = top.find(_._1 == "moov")
        var dur = 0L; var w = 0; var h = 0
        for ((_, m0, m1) <- moov; (ty, p, pEnd) <- walk(m0, m1)) ty match {
          case "mvhd" if p < pEnd =>
            val v = u8(p)
            if (v == 1 && p + 32 <= pEnd) {
              val ts = be32(p + 20).toLong & 0xffffffffL
              if (ts > 0) dur = be64(p + 24) * 1000L / ts
            } else if (v == 0 && p + 20 <= pEnd) {
              val ts = be32(p + 12).toLong & 0xffffffffL
              if (ts > 0) dur = (be32(p + 16).toLong & 0xffffffffL) * 1000L / ts
            }
          case "trak" if w == 0 =>
            for ((tty, tp, te) <- walk(p, pEnd)
                 if tty == "tkhd" && w == 0) {
              val v = u8(tp)
              val (wi, hi) = if (v == 1) (tp + 88, tp + 92) else (tp + 76, tp + 80)
              if (hi + 4 <= te) { w = be16(wi); h = be16(hi) } // 16.16 int part
            }
          case _ => ()
        }
        if (moov.isDefined || top.exists(_._1 == "ftyp"))
          ProbedMeta("mp4", w, h, 0, 0, durationMs = dur, ok = true)
        else bad
      }
      else bad
    } catch { case _: IndexOutOfBoundsException => bad }
  }

  /** [[probeHeader]] over a corpus: adds a `probed` struct column.
    * Narrow per-row work (no shuffle); the struct supports metadata
    * audits (declared vs probed dimension mismatch = corrupt or
    * mislabeled media) and partition-pruning-friendly writes keyed on
    * `probed.kind`. */
  def headerProbe(df: DataFrame, binCol: String = "media"): DataFrame = {
    val probe = udf((b: Array[Byte]) => probeHeader(b))
    df.withColumn("probed", probe(col(binCol)))
  }

  /** One fixed-length PCM frame's integer summary — see
    * [[pcmFrameEnergy]]. */
  case class PcmFrame(media_id: Long, frame_idx: Int, n_samples: Int,
      energy: Long, peak: Int, silence: Boolean)

  /** REAL PCM16 audio analysis (codec-free — like [[probeHeader]],
    * this is raw container+sample parsing, not a stubbed codec): walk
    * the RIFF chunk list to the `data` chunk, decode little-endian
    * signed 16-bit mono samples, and reduce each non-overlapping
    * `frameSamples`-sample frame to integer sum-of-|amplitude| energy
    * and peak — the silence-trim / voice-activity primitives an audio
    * curation pipeline gates on (energy 0 ⇒ `silence`). All integer,
    * so the whole lane is oracle-exact.
    *
    * Garbage tolerance, the 100 TB crawl contract shared with the
    * probe: a truncated payload yields only the COMPLETE frames its
    * bytes actually contain (declared chunk size is clamped to the
    * bytes present); a payload with no parseable RIFF/data chunk
    * yields no rows rather than throwing. Runs as a `mapPartitions`
    * batch like the decode family — per-partition cost is the bytes
    * scanned, no shuffle at all until the caller aggregates. */
  def pcmFrameEnergy(media: Dataset[MediaRow],
      frameSamples: Int = 16): Dataset[PcmFrame] = {
    require(frameSamples > 0)
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { row =>
        val b = row.media
        def u8(i: Int) = b(i) & 0xff
        def le32(i: Int) = (u8(i).toLong | u8(i + 1).toLong << 8 |
          u8(i + 2).toLong << 16 | u8(i + 3).toLong << 24).toInt
        def ascii(i: Int, n: Int) = new String(b, i, n, "US-ASCII")
        if (b == null || b.length < 12 || ascii(0, 4) != "RIFF" ||
            ascii(8, 4) != "WAVE") Iterator.empty
        else try {
          // chunk walk: [id 4][size LE32][payload size] from offset 12.
          // Corrupt declared sizes are part of the crawl contract (the
          // probeHeader walk above guards the same two failure modes):
          // sz < 0 would make the step advance by <= 0 (infinite loop
          // pinning the executor), and a huge positive sz can overflow
          // `off` negative so ascii(off, 4) throws. Walk in Long and
          // treat any non-advancing or out-of-range step as end-of-file.
          var off = 12L
          var dataOff = -1
          var dataLen = 0
          while (dataOff < 0 && off + 8 <= b.length) {
            val id = ascii(off.toInt, 4)
            val sz = le32(off.toInt + 4)
            if (id == "data") {
              dataOff = off.toInt + 8
              // clamp to the bytes present — truncated crawl payloads
              dataLen = math.max(0, math.min(sz, b.length - dataOff))
            } else if (sz < 0) off = b.length.toLong // corrupt: stop
            else off += 8L + sz.toLong + (sz & 1) // RIFF pads odd chunks
          }
          if (dataOff < 0) Iterator.empty
          else {
            val nSamples = dataLen / 2
            val nFrames = nSamples / frameSamples
            (0 until nFrames).iterator.map { fi =>
              var energy = 0L
              var peak = 0
              var j = fi * frameSamples
              val end = j + frameSamples
              while (j < end) {
                val lo = u8(dataOff + 2 * j)
                val hi = b(dataOff + 2 * j + 1).toInt // sign-extends
                val a = math.abs((hi << 8) | lo)
                energy += a
                if (a > peak) peak = a
                j += 1
              }
              PcmFrame(row.media_id, fi, frameSamples, energy, peak,
                silence = energy == 0L)
            }
          }
        } catch {
          // belt-and-braces for untrusted payloads: a parse failure on
          // one row must never kill the task (same contract as the
          // probe's catch). Frame emission itself is index-safe by the
          // dataLen clamp, so only the walk can land here.
          case _: RuntimeException => Iterator.empty
        }
      }
    }
  }
}
