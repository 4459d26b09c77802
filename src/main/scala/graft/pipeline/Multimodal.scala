package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: media payloads
  * travel as opaque `binary` columns with a typed metadata struct; decode /
  * feature-extract / frame-sample run per-partition so codec state is
  * constructed once per partition (the Spark-side shape that matters —
  * schema, partitioning, batch iteration).
  *
  * Two decode paths:
  *  - [[decodeImages]] is a REAL codec path: PNG bytes decoded with
  *    `javax.imageio` (ships in the JDK — no external library needed),
  *    emitting true dims + an exact position-weighted pixel fold. PNG is
  *    lossless, so the fold is bit-reproducible from the generator's
  *    pixel formula — which is how the DuckDB oracle checks it without
  *    ever seeing a PNG.
  *  - [[decodeAudio]] is the same for audio: WAV payloads decoded with
  *    `javax.sound.sampled` (the JDK's WAVE parser), emitting true
  *    rate/length plus an exact position-weighted amplitude fold.
  *  - [[decodeVideo]] covers video at the CONTAINER level: AVI/RIFF
  *    parsed structurally (chunk walk, avih/strh/strf headers,
  *    bottom-up 4-byte-aligned DIB frame rows) with uncompressed
  *    BI_RGB frames — the JDK ships no video API, so the parser is
  *    spec-derived rather than library-backed.
  *  - [[decodeMjpegVideo]] extends the AVI walk to a COMPRESSED
  *    intra-frame codec: `MJPG` streams whose `00dc` chunks are real
  *    baseline JPEGs, decoded frame-by-frame with `javax.imageio`.
  *  - [[decodeStub]] remains the marked boundary for what that leaves:
  *    INTER-frame video codecs (H.264 etc., whose frames reference each
  *    other and need a real decoder library) — deterministic
  *    pseudo-features from the raw bytes.
  */
object Multimodal {

  /** One media row: payload + typed metadata (mime + declared dims). */
  case class MediaRow(media_id: Long, payload: Array[Byte], mime: String,
      declared_w: Int, declared_h: Int)

  /** Extracted features; `decoded` would be the pixel/sample tensor. */
  case class MediaFeatures(media_id: Long, n_bytes: Long, checksum: Long,
      n_frames: Long, mime: String)

  /** Deterministic stand-in for a real decoder. The marked line is where
    * an image/audio library call goes (one codec instance per partition). */
  def decodeStub(ds: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      // val codec = RealCodec.open()   // per-partition init goes here
      rows.map { r =>
        // REAL DECODE STUBBED: pixels = codec.decode(r.payload)
        val checksum = r.payload.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) % 1000000007L)
        MediaFeatures(r.media_id, r.payload.length.toLong, checksum,
          n_frames = ((r.payload.length + 255) / 256).toLong, r.mime)
      }
    }
  }

  /** Frame sampling: deterministic every-k-th slice of the payload —
    * the partition/batch shape of real video frame extraction. */
  def frameSample(ds: Dataset[MediaRow], frameBytes: Int, everyK: Int)
      : DataFrame = {
    import ds.sparkSession.implicits._
    ds.flatMap { r =>
      r.payload.grouped(frameBytes).zipWithIndex.collect {
        case (chunk, i) if i % everyK == 0 => (r.media_id, i, chunk.length)
      }
    }.toDF("media_id", "frame_idx", "frame_bytes")
  }

  /** Builds a media table from the documents text (utf-8 payloads) — the
    * stand-in corpus for the binary-column pipeline. */
  def fromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id").as("media_id"),
        encode(col("text"), "UTF-8").as("payload"),
        lit("text/plain").as("mime"),
        lit(0).as("declared_w"), lit(0).as("declared_h"))
      .as[MediaRow]
  }

  // ----------------------------------------------------- real PNG codec path

  /** Decoded image features: true dims from the codec plus an exact
    * position-weighted fold over the 24-bit pixels in raster order —
    * sum((x + w*y + 1) * packedRGB). Order-independent (a plain sum), so
    * any engine that knows the pixel values can reproduce it, yet
    * position-sensitive, so a transposed or shifted decode fails. */
  case class DecodedImage(media_id: Long, width: Int, height: Int,
      pixel_sum: Long)

  /** Deterministic synthetic PNG: dims and every pixel are closed-form in
    * `id`, so an oracle can recompute [[DecodedImage]] without a codec.
    *   w = 8 + id % 5, h = 6 + id % 7
    *   r = (7x + 13y + id) % 256, g = (3x + 5y + 2id) % 256,
    *   b = (x + y + 3id) % 256
    * Encoded with the JDK's ImageIO PNG writer (lossless by spec). */
  def synthPng(id: Long): Array[Byte] = {
    val w = 8 + (id % 5).toInt
    val h = 6 + (id % 7).toInt
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((x * 7 + y * 13 + id) % 256).toInt
        val g = ((x * 3 + y * 5 + 2 * id) % 256).toInt
        val b = ((x + y + 3 * id) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Media table of real PNG payloads, one per id in `ids` (a one-column
    * DataFrame of longs); synthesis runs per-partition on executors — the
    * same distribution shape real media ingestion has. */
  def synthImageTable(spark: SparkSession, ids: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    ids.select(col(ids.columns.head).cast("long").as("id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          MediaRow(id, synthPng(id), "image/png",
            declared_w = 8 + (id % 5).toInt, declared_h = 6 + (id % 7).toInt)
        }
      }
  }

  // ----------------------------------------------------- real WAV codec path

  /** Decoded audio features: header-derived rate + true sample count plus
    * an exact position-weighted amplitude fold sum((i + 1) * s(i)) over
    * the decoded 16-bit samples — order-sensitive, so a byte-order or
    * header-offset mistake in the decode fails the oracle. `duration_us`
    * is integer-derived (n * 1_000_000 div rate) to stay bit-exact. */
  case class DecodedAudio(media_id: Long, sample_rate: Long, n_samples: Long,
      duration_us: Long, amp_sum: Long)

  /** Deterministic synthetic WAV: rate, length, and every 16-bit sample
    * are closed-form in `id`, so an oracle can recompute [[DecodedAudio]]
    * without a codec.
    *   rate = 8000 + (id % 4) * 4000, n = 400 + id % 100
    *   s(i) = ((31 i^2 + 7 i + 13 id) % 65536) - 32768
    * Encoded as PCM_SIGNED 16-bit mono little-endian with the JDK's
    * `AudioSystem` WAVE writer (lossless by spec). */
  def synthWav(id: Long): Array[Byte] = synthWavPert(id, 0L, 0L)

  /** [[synthWav]] with two extensions for the near-dup corpus, both
    * closed-form for the oracle: `pert = 1` gives sample 5 a +1 INSIDE
    * the % 65536 wrap (the audio analogue of the image table's
    * single-pixel retouch — no clamp case), and `crossK` adds a
    * crossK·e·i term so different ids differ in waveform SHAPE, not just
    * a constant offset (the base formula's 13·e term shifts every sample
    * equally, which leaves adjacent-frame energy ORDER nearly
    * id-independent — a fingerprint over it matches half the corpus;
    * measured 14,922 Hamming-≤1 pairs at sf0.01 before the cross term,
    * ~150 after). `pert = crossK = 0` is byte-identical to the original
    * generator, so the roundtrip oracle is untouched. */
  private[graft] def synthWavPert(e: Long, pert: Long,
      crossK: Long): Array[Byte] = {
    val rate = (8000 + (e % 4) * 4000).toInt
    val n = (400 + e % 100).toInt
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val d = if (pert == 1L && i == 5) 1L else 0L
      val s = (((31L * i * i + 7L * i + 13L * e + crossK * e * i + d)
        % 65536L) - 32768L).toInt
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      rate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Media table of real WAV payloads, one per id; synthesis runs
    * per-partition on executors (declared dims carry rate and length the
    * way a real ingest's metadata columns would). */
  def synthAudioTable(spark: SparkSession, ids: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    ids.select(col(ids.columns.head).cast("long").as("id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          MediaRow(id, synthWav(id), "audio/wav",
            declared_w = (8000 + (id % 4) * 4000).toInt,
            declared_h = (400 + id % 100).toInt)
        }
      }
  }

  /** Near-dup WAV corpus: ids with `id % 10 == 9` re-synthesize their
    * BASE `e = id div 10` (same rate, same length, same samples) with
    * the one-sample perturbation — a genuinely near-duplicate recording
    * a byte-exact dedup misses. Synthesis runs per-partition on
    * executors, like every media table here. */
  def synthNearDupAudioTable(spark: SparkSession,
      ids: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    ids.select(col(ids.columns.head).cast("long").as("id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val e = if (id % 10 == 9) id / 10 else id
          val pert = if (id % 10 == 9) 1L else 0L
          MediaRow(id, synthWavPert(e, pert, 97L), "audio/wav",
            declared_w = (8000 + (e % 4) * 4000).toInt,
            declared_h = (400 + e % 100).toInt)
        }
      }
  }

  /** Energy-delta audio fingerprint (Shazam-lite, the audio member of
    * the perceptual-dedup family): REAL decode → 8-sample frame energies
    * (exact Longs — ≤ 8·32768² per frame) → one bit per adjacent-frame
    * comparison (E_{f+1} > E_f; gain-invariant — a uniform gain scales
    * every energy but flips no comparison), giving 49–61 bits for this
    * corpus's 400–499-sample clips, packed into FOUR 16-bit BAND words
    * (the dedup_phash_images shape: a Hamming-≤3 pair cannot differ in
    * all 4 bands, so a (band, frame-count, word) equi-join is PROVABLY
    * complete at Hamming ≤ 3 among equal-length fingerprints, and the
    * 2¹⁶ band space keeps bucket occupancy ~n/2¹⁶ — scale-safe where a
    * short word would saturate). */
  case class AudioFp(media_id: Long, fc: Long, w0: Long, w1: Long,
      w2: Long, w3: Long)

  def audioFingerprint(ds: Dataset[MediaRow]): Dataset[AudioFp] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.map { r =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.payload))
        val fmt = ais.getFormat
        val pcm = ais.readAllBytes()
        ais.close()
        val n = pcm.length / 2
        val lo = if (fmt.isBigEndian) 1 else 0
        val fc = n / 8
        val en = new Array[Long](fc)
        var f = 0
        while (f < fc) {
          var e = 0L
          var i = 8 * f
          while (i < 8 * (f + 1)) {
            val s = ((pcm(2 * i + lo) & 0xff) |
              (pcm(2 * i + 1 - lo).toInt << 8)).toShort.toLong
            e += s * s
            i += 1
          }
          en(f) = e
          f += 1
        }
        val w = new Array[Long](4)
        var b = 0
        while (b < fc - 1 && b < 64) {
          if (en(b + 1) > en(b)) w(b / 16) |= (1L << (b % 16))
          b += 1
        }
        AudioFp(r.media_id, fc.toLong, w(0), w(1), w(2), w(3))
      }
    }
  }

  /** REAL per-partition audio decode via `javax.sound.sampled` (the JDK
    * ships the WAV/AIFF/AU parsers): payload bytes -> AudioInputStream ->
    * header format + PCM frames -> exact amplitude fold. Narrows
    * [[decodeStub]]'s boundary to video-only codecs. */
  def decodeAudio(ds: Dataset[MediaRow]): Dataset[DecodedAudio] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.map { r =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.payload))
        val fmt = ais.getFormat
        require(fmt.getChannels == 1 && fmt.getSampleSizeInBits == 16,
          s"unexpected WAV shape for media ${r.media_id}")
        val pcm = ais.readAllBytes()
        ais.close()
        val n = pcm.length / 2
        val lo = if (fmt.isBigEndian) 1 else 0 // WAV PCM is little-endian
        var sum = 0L
        var i = 0
        while (i < n) {
          val s = ((pcm(2 * i + lo) & 0xff) |
            (pcm(2 * i + 1 - lo).toInt << 8)).toShort
          sum += (i + 1L) * s
          i += 1
        }
        val rate = fmt.getSampleRate.toLong
        DecodedAudio(r.media_id, rate, n.toLong, n * 1000000L / rate, sum)
      }
    }
  }

  // ----------------------------------------------- real AVI container path

  /** Decoded video features: container-header dims/frame-count/timing
    * plus an exact position-weighted fold over all frames' 24-bit pixels
    * in (frame, raster) order — sum(((f*h + y)*w + x + 1) * packedRGB).
    * Order-sensitive across frames AND within each frame, so a frame
    * mis-ordering, a stride mistake, or an un-flipped bottom-up row
    * order fails the oracle. */
  case class DecodedVideo(media_id: Long, width: Int, height: Int,
      n_frames: Long, usec_per_frame: Long, pix_sum: Long)

  /** Deterministic synthetic AVI: dims, frame count, rate, and every
    * pixel of every frame are closed-form in `id`, so an oracle can
    * recompute [[DecodedVideo]] without touching a container.
    *   w = 8 + id % 5, h = 6 + id % 7, frames = 3 + id % 4,
    *   fps = 10 + id % 5
    *   r = (x + y + f + 3id) % 256, g = (2x + 3y + 7f + 2id) % 256,
    *   b = (5x + 11y + 17f + id) % 256
    * Written as a spec-conformant RIFF 'AVI ' container (hdrl with
    * avih + one 'vids'/'DIB ' stream, movi with one '00db' chunk per
    * frame) holding uncompressed BI_RGB frames in DIB layout: BGR byte
    * order, BOTTOM-UP rows, each row padded to a 4-byte stride — the
    * spec details [[decodeVideo]] must honor to reproduce the top-down
    * fold. */
  // RIFF building blocks shared by the AVI synthesizers (little-endian
  // sizes, word-aligned chunks — the container spec's framing rules).
  private def u32(vs: Long*): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 * vs.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    vs.foreach(v => bb.putInt(v.toInt))
    bb.array()
  }
  private def fourcc(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
  private def chunk(fcc: String, body: Array[Byte]): Array[Byte] =
    fourcc(fcc) ++ u32(body.length.toLong) ++ body ++
      (if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
  private def list(listType: String, children: Array[Byte]): Array[Byte] =
    chunk("LIST", fourcc(listType) ++ children)

  def synthAvi(id: Long): Array[Byte] =
    buildAvi(8 + (id % 5).toInt, 6 + (id % 7).toInt, 3 + (id % 4).toInt,
      10 + (id % 5).toInt,
      // (f, x, y) -> (blue, green, red): the original linear gradient
      (f, x, y) => (((5 * x + 11 * y + 17 * f + id) % 256).toInt,
        ((2 * x + 3 * y + 7 * f + 2 * id) % 256).toInt,
        ((x + y + f + 3 * id) % 256).toInt))

  /** Near-dup AVI for base clip `e`: identical container, pixels one LCG
    * step each — `v = (1103515245·(x + 16y + 256f + 4096e) + 12345) mod
    * 2³¹` — because an aHash over [[synthAvi]]'s linear gradient is the
    * same mask for every clip (the synthPngNear lesson); `perturb` adds
    * 128 (mod 256) to frame 0's (0,0) blue channel — the one-pixel
    * retouch of a single keyframe. */
  private[graft] def synthAviNear(e: Long, perturb: Boolean): Array[Byte] =
    buildAvi(8 + (e % 5).toInt, 6 + (e % 7).toInt, 3 + (e % 4).toInt,
      10 + (e % 5).toInt,
      (f, x, y) => {
        val v = (1103515245L * (x + 16L * y + 256L * f + 4096L * e) +
          12345L) % 2147483648L
        val b0 = (v % 256L).toInt
        val blu =
          if (perturb && f == 0 && x == 0 && y == 0) (b0 + 128) % 256
          else b0
        (blu, ((v / 256L) % 256L).toInt, ((v / 65536L) % 256L).toInt)
      })

  private def buildAvi(w: Int, h: Int, nFrames: Int, fps: Int,
      px: (Int, Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val stride = (w * 3 + 3) & ~3
    val frameBytes = stride * h

    def frame(f: Int): Array[Byte] = {
      val a = new Array[Byte](frameBytes)
      var y = 0
      while (y < h) {
        val off = (h - 1 - y) * stride // DIB: image row y stored bottom-up
        var x = 0
        while (x < w) {
          val (blu, grn, red) = px(f, x, y)
          a(off + 3 * x) = blu.toByte
          a(off + 3 * x + 1) = grn.toByte
          a(off + 3 * x + 2) = red.toByte
          x += 1
        }
        y += 1
      }
      a
    }

    val avih = chunk("avih", u32(
      1000000L / fps, frameBytes.toLong * fps, 0L, 0L, nFrames.toLong, 0L,
      1L, frameBytes.toLong, w.toLong, h.toLong, 0L, 0L, 0L, 0L))
    val strh = chunk("strh", fourcc("vids") ++ fourcc("DIB ") ++ u32(
      0L, 0L, 0L, 1L, fps.toLong, 0L, nFrames.toLong, frameBytes.toLong,
      0L, 0L) ++ {
      val rc = java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      rc.putShort(0); rc.putShort(0)
      rc.putShort(w.toShort); rc.putShort(h.toShort)
      rc.array()
    })
    val strf = chunk("strf", u32(40L, w.toLong, h.toLong) ++ {
      val pb = java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      pb.putShort(1); pb.putShort(24) // biPlanes, biBitCount
      pb.array()
    } ++ u32(0L /* BI_RGB */, frameBytes.toLong, 0L, 0L, 0L, 0L))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val movi = list("movi",
      (0 until nFrames).toArray.flatMap(f => chunk("00db", frame(f))))
    chunk("RIFF", fourcc("AVI ") ++ hdrl ++ movi)
  }

  /** Media table of real AVI payloads, one per id; synthesis runs
    * per-partition on executors. */
  def synthVideoTable(spark: SparkSession, ids: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    ids.select(col(ids.columns.head).cast("long").as("id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          MediaRow(id, synthAvi(id), "video/x-msvideo",
            declared_w = 8 + (id % 5).toInt, declared_h = 6 + (id % 7).toInt)
        }
      }
  }

  /** REAL per-partition AVI container decode — a strict RIFF walk (no
    * JDK video API exists, so the parser is written to the public spec):
    * validates the RIFF/'AVI ' signature, reads timing and frame count
    * from `avih`, requires an uncompressed 24-bit `vids`/`DIB ` stream
    * from `strh`/`strf` (BITMAPINFOHEADER), then folds every `00db`
    * frame chunk's DIB pixels (bottom-up rows, 4-byte stride) into the
    * top-down position-weighted sum. Narrows [[decodeStub]]'s boundary
    * to compressed codecs. */
  /** Near-dup AVI corpus: ids with `id % 10 == 9` re-render their BASE
    * `e = id div 10` (same dims, frames, fps, pixels) with the one-pixel
    * frame-0 retouch — the lightly-edited re-upload a byte-exact video
    * dedup misses. */
  def synthNearDupVideoTable(spark: SparkSession,
      ids: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    ids.select(col(ids.columns.head).cast("long").as("id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val dup = id % 10 == 9
          val e = if (dup) id / 10 else id
          MediaRow(id, synthAviNear(e, dup), "video/avi",
            declared_w = 8 + (e % 5).toInt, declared_h = 6 + (e % 7).toInt)
        }
      }
  }

  /** Per-KEYFRAME perceptual hash over the REAL container decode: one
    * row per frame with a 16-bit aHash of the 4×4 NN-resampled luma grid
    * (sx = tx·w div 4, the [[resizeImages]] convention; integer luma
    * 299r+587g+114b; mean threshold multiplied through — bit p set iff
    * gray_p·16 ≥ Σ gray). The frame index is the LSH band downstream:
    * clips share ≥ 3 frames, so a ≤ 2-bit total difference cannot touch
    * every frame's hash. Same spec-derived RIFF walk as [[decodeVideo]]
    * (bottom-up DIB rows, 4-byte stride, BGR). */
  case class VideoFpRow(media_id: Long, w: Int, h: Int, nf: Long, f: Long,
      hash16: Long)

  def videoFingerprint(ds: Dataset[MediaRow]): Dataset[VideoFpRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.flatMap { r =>
        val bb = java.nio.ByteBuffer.wrap(r.payload)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        def fcc(): String = {
          val a = new Array[Byte](4); bb.get(a)
          new String(a, java.nio.charset.StandardCharsets.US_ASCII)
        }
        require(fcc() == "RIFF" && { bb.getInt; fcc() == "AVI " },
          s"not a RIFF AVI for media ${r.media_id}")
        var w = 0; var h = 0; var stride = 0
        var isDib = false; var framesSeen = 0L
        val out = scala.collection.mutable.ArrayBuffer.empty[VideoFpRow]
        while (bb.remaining >= 8) {
          val id = fcc(); val sz = bb.getInt
          if (id == "LIST") fcc()
          else {
            val start = bb.position()
            id match {
              case "strh" =>
                val (t, hd) = (fcc(), fcc())
                require(t == "vids" && hd == "DIB ",
                  s"unexpected stream $t/$hd for media ${r.media_id}")
                isDib = true
              case "strf" =>
                bb.position(start + 4); w = bb.getInt(); h = bb.getInt()
                bb.position(start + 14)
                val bits = bb.getShort(); val compression = bb.getInt()
                require(bits == 24 && compression == 0,
                  s"not uncompressed BI_RGB for media ${r.media_id}")
                stride = (w * 3 + 3) & ~3
              case "00db" =>
                require(isDib && stride > 0 && sz == stride * h,
                  s"malformed frame for media ${r.media_id}")
                val gray = new Array[Long](16)
                var total = 0L
                var ty = 0
                while (ty < 4) {
                  val sy = ty * h / 4
                  val off = start + (h - 1 - sy) * stride
                  var tx = 0
                  while (tx < 4) {
                    val sx = tx * w / 4
                    val blu = r.payload(off + 3 * sx) & 0xff
                    val grn = r.payload(off + 3 * sx + 1) & 0xff
                    val red = r.payload(off + 3 * sx + 2) & 0xff
                    val g = 299L * red + 587L * grn + 114L * blu
                    gray(4 * ty + tx) = g
                    total += g
                    tx += 1
                  }
                  ty += 1
                }
                var hash = 0L
                var p = 0
                while (p < 16) {
                  if (gray(p) * 16L >= total) hash |= (1L << p)
                  p += 1
                }
                out += VideoFpRow(r.media_id, w, h, 0L, framesSeen, hash)
                framesSeen += 1
              case _ => ()
            }
            bb.position(start + sz + (sz & 1))
          }
        }
        out.map(v => v.copy(nf = framesSeen))
      }
    }
  }

  def decodeVideo(ds: Dataset[MediaRow]): Dataset[DecodedVideo] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.map { r =>
        val bb = java.nio.ByteBuffer.wrap(r.payload)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        def fcc(): String = {
          val a = new Array[Byte](4); bb.get(a)
          new String(a, java.nio.charset.StandardCharsets.US_ASCII)
        }
        require(fcc() == "RIFF" && { bb.getInt; fcc() == "AVI " },
          s"not a RIFF AVI for media ${r.media_id}")
        var usecPerFrame = 0L; var headerFrames = 0L
        var w = 0; var h = 0; var stride = 0
        var isDib = false; var framesSeen = 0L; var pixSum = 0L
        while (bb.remaining >= 8) {
          val id = fcc(); val sz = bb.getInt
          if (id == "LIST") fcc() // descend: children are chunks too
          else {
            val start = bb.position()
            id match {
              case "avih" =>
                usecPerFrame = bb.getInt().toLong & 0xffffffffL
                bb.position(start + 16)
                headerFrames = bb.getInt().toLong & 0xffffffffL
              case "strh" =>
                val (t, hd) = (fcc(), fcc())
                require(t == "vids" && hd == "DIB ",
                  s"unexpected stream $t/$hd for media ${r.media_id}")
                isDib = true
              case "strf" =>
                bb.position(start + 4); w = bb.getInt()
                h = bb.getInt()
                bb.position(start + 14)
                val bits = bb.getShort()
                val compression = bb.getInt()
                require(bits == 24 && compression == 0,
                  s"not uncompressed BI_RGB for media ${r.media_id}")
                stride = (w * 3 + 3) & ~3
              case "00db" =>
                require(isDib && stride > 0 && sz == stride * h,
                  s"malformed frame for media ${r.media_id}")
                val f = framesSeen
                var y = 0
                while (y < h) {
                  val off = start + (h - 1 - y) * stride
                  var x = 0
                  while (x < w) {
                    val blu = r.payload(off + 3 * x) & 0xff
                    val grn = r.payload(off + 3 * x + 1) & 0xff
                    val red = r.payload(off + 3 * x + 2) & 0xff
                    pixSum += ((f * h + y) * w.toLong + x + 1) *
                      ((red << 16) | (grn << 8) | blu)
                    x += 1
                  }
                  y += 1
                }
                framesSeen += 1
              case _ => ()
            }
            bb.position(start + sz + (sz & 1))
          }
        }
        require(framesSeen == headerFrames,
          s"frame count mismatch for media ${r.media_id}")
        DecodedVideo(r.media_id, w, h, framesSeen, usecPerFrame, pixSum)
      }
    }
  }

  /** REAL per-partition image decode via `javax.imageio` (the JDK ships
    * PNG/JPEG/BMP/GIF readers): payload bytes -> BufferedImage -> true
    * dims + exact pixel fold. This is the working form of the decode
    * boundary `decodeStub` marks for non-JDK codecs. */
  def decodeImages(ds: Dataset[MediaRow]): Dataset[DecodedImage] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      // ImageIO reader lookup is per-call; disk caching off keeps the
      // decode purely in-memory on executors
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.payload))
        require(img != null, s"undecodable payload for media ${r.media_id}")
        val w = img.getWidth
        val h = img.getHeight
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            sum += (x + w.toLong * y + 1L) * (img.getRGB(x, y) & 0xffffff)
            x += 1
          }
          y += 1
        }
        DecodedImage(r.media_id, w, h, sum)
      }
    }
  }

  // ------------------------------------- perceptual-hash (aHash) dedup path
  /** Near-duplicate synthetic image corpus: every 10th id RE-RENDERS an
    * earlier image (base e = id div 10 — same dims, same pixel formula)
    * with ONE perturbed pixel (red of (0,0) shifted by +128 mod 256), so
    * the corpus carries TRUE near-duplicate pairs whose average-hash
    * differs in a few bits — the shape a perceptual-hash dedup exists to
    * catch (byte-identical dedup misses them; the md5 checksum differs). */
  def synthNearDupImageTable(spark: SparkSession, ids: DataFrame)
      : Dataset[MediaRow] = {
    import spark.implicits._
    ids.select(col(ids.columns.head).cast("long").as("id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val dup = id % 10 == 9
          val e = if (dup) id / 10 else id
          MediaRow(id, synthPngNear(e, dup), "image/png",
            declared_w = 8 + (e % 5).toInt, declared_h = 6 + (e % 7).toInt)
        }
      }
  }

  /** Near-dup corpus pixel formula for base id `e`, optionally with the
    * (0,0) red-channel perturbation. NOT [[synthPng]]'s linear gradient —
    * an aHash of a gradient is the same half-plane mask for every image
    * (measured: 11k cross-corpus pairs at Hamming ≤ 3), which would make
    * the near-dup query vacuous. One LCG step per pixel
    * (v = (1103515245·(x + 16y + 256e) + 12345) mod 2³¹) decorrelates
    * the rasters (unrelated hashes ~32 bits apart, true near-dups 0-3)
    * while staying a closed form the oracle re-derives in BIGINT. */
  def synthPngNear(e: Long, perturb: Boolean): Array[Byte] = {
    val w = 8 + (e % 5).toInt
    val h = 6 + (e % 7).toInt
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = (1103515245L * (x + 16L * y + 256L * e) + 12345L) %
          2147483648L
        val r0 = (v % 256L).toInt
        val r = if (perturb && x == 0 && y == 0) (r0 + 128) % 256 else r0
        val g = ((v / 256L) % 256L).toInt
        val b = ((v / 65536L) % 256L).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** 64-bit average hash carried as FOUR 16-bit band words (b0..b3) —
    * never one 64-bit integer, because (a) the 16-bit bands ARE the
    * Hamming-LSH join keys downstream and (b) bit 63 is unreachable in
    * DuckDB's checked shift (the sketch_bitmap lesson). */
  case class PhashRow(media_id: Long, width: Int, height: Int,
      b0: Long, b1: Long, b2: Long, b3: Long)

  /** REAL perceptual-hash stage: decode (javax.imageio), nearest-neighbor
    * sample an 8×8 grid (sx = tx·w div 8 — the same zero-phase NN
    * convention as [[resizeImages]]), integer luma gray = 299r+587g+114b,
    * aHash bit p = (gray_p · 64 >= Σ gray) — the mean threshold
    * multiplied through so no division happens at all. Bit p lands in
    * band p div 16 at position p mod 16. Per-partition; no shuffle. */
  def phashImages(ds: Dataset[MediaRow]): Dataset[PhashRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.payload))
        require(img != null, s"undecodable payload for media ${r.media_id}")
        val w = img.getWidth
        val h = img.getHeight
        val gray = new Array[Long](64)
        var total = 0L
        var ty = 0
        while (ty < 8) {
          val sy = ty * h / 8
          var tx = 0
          while (tx < 8) {
            val sx = tx * w / 8
            val rgb = img.getRGB(sx, sy)
            val g = 299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
              114L * (rgb & 0xff)
            gray(ty * 8 + tx) = g
            total += g
            tx += 1
          }
          ty += 1
        }
        val bands = new Array[Long](4)
        var p = 0
        while (p < 64) {
          if (gray(p) * 64L >= total)
            bands(p / 16) |= 1L << (p % 16)
          p += 1
        }
        PhashRow(r.media_id, w, h, bands(0), bands(1), bands(2), bands(3))
      }
    }
  }

  /** One thumbnail row: source dims + the position-weighted fold of the
    * nearest-neighbor-resampled target raster. */
  case class ResizedImage(media_id: Long, src_width: Int, src_height: Int,
      thumb_sum: Long)

  /** REAL resize/feature-extract stage: decode (javax.imageio) then
    * nearest-neighbor resample to a fixed tw×th thumbnail — the
    * normalize-before-embed step every vision pipeline runs. Source
    * pixel for target (tx, ty) is (tx·w div tw, ty·h div th), the
    * zero-phase NN convention, so the oracle can recompute the thumbnail
    * fold CLOSED-FORM from the generator's pixel formula: the check
    * fails unless decode, sample-position arithmetic, and raster order
    * are all exactly right. Per-partition like every codec stage; no
    * shuffle. */
  def resizeImages(ds: Dataset[MediaRow], tw: Int, th: Int): Dataset[ResizedImage] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.payload))
        require(img != null, s"undecodable payload for media ${r.media_id}")
        val w = img.getWidth
        val h = img.getHeight
        var sum = 0L
        var ty = 0
        while (ty < th) {
          val sy = ty * h / th
          var tx = 0
          while (tx < tw) {
            val sx = tx * w / tw
            sum += (tx + tw.toLong * ty + 1L) * (img.getRGB(sx, sy) & 0xffffff)
            tx += 1
          }
          ty += 1
        }
        ResizedImage(r.media_id, w, h, sum)
      }
    }
  }

  // ------------------------------------------------ real MJPEG codec path

  /** Deterministic MJPEG AVI (round-7, retiring [[decodeStub]] for
    * intra-frame codecs): same RIFF framing as [[synthAvi]], but the
    * stream is `vids`/`MJPG` (biCompression = 'MJPG') and each `00dc`
    * chunk is a REAL baseline JPEG, encoded with the JDK's ImageIO JPEG
    * writer. JPEG is lossy in general, so the frames are built to
    * roundtrip BIT-EXACTLY: every pixel is gray (r = g = b, so chroma is
    * the constant 128 and survives any subsampling) and constant within
    * each 8x8 JPEG block (the DCT is DC-only, which quality 1.0's
    * all-ones quantization tables and libjpeg's DC-shortcut IDCT
    * reproduce exactly — verified over every (w, h, f) shape this
    * generator emits). That keeps the decoded pixel fold closed-form for
    * the oracle while the codec path stays a genuine encode -> decode:
    *   w = 10 + id % 9, h = 9 + id % 8 (2-3 blocks per axis),
    *   nFrames = 2 + id % 3, fps = 10 + id % 5,
    *   gray(bx, by, f) = (7*bx + 13*by + 17*f + 29*id) % 256
    * with bx = x / 8, by = y / 8 — block-position weighting keeps the
    * geometry (raster order, frame order, dims) fully checked. */
  def synthMjpegAvi(id: Long): Array[Byte] = {
    val w = 10 + (id % 9).toInt
    val h = 9 + (id % 8).toInt
    val nFrames = 2 + (id % 3).toInt
    val fps = 10 + (id % 5).toInt

    def jpegFrame(f: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val c = ((7 * (x / 8) + 13 * (y / 8) + 17 * f + 29 * id) % 256).toInt
          img.setRGB(x, y, (c << 16) | (c << 8) | c)
          x += 1
        }
        y += 1
      }
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("jpeg").next()
      val p = writer.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(1.0f)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
      writer.dispose()
      ios.close()
      bos.toByteArray
    }

    val frames = (0 until nFrames).map(jpegFrame)
    val maxBytes = frames.map(_.length).max.toLong
    val avih = chunk("avih", u32(
      1000000L / fps, maxBytes * fps, 0L, 0L, nFrames.toLong, 0L,
      1L, maxBytes, w.toLong, h.toLong, 0L, 0L, 0L, 0L))
    val strh = chunk("strh", fourcc("vids") ++ fourcc("MJPG") ++ u32(
      0L, 0L, 0L, 1L, fps.toLong, 0L, nFrames.toLong, maxBytes,
      0L, 0L) ++ {
      val rc = java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      rc.putShort(0); rc.putShort(0)
      rc.putShort(w.toShort); rc.putShort(h.toShort)
      rc.array()
    })
    val strf = chunk("strf", u32(40L, w.toLong, h.toLong) ++ {
      val pb = java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      pb.putShort(1); pb.putShort(24) // biPlanes, biBitCount
      pb.array()
    } ++ fourcc("MJPG") /* biCompression */ ++
      u32(maxBytes, 0L, 0L, 0L, 0L))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val movi = list("movi",
      frames.toArray.flatMap(fb => chunk("00dc", fb)))
    chunk("RIFF", fourcc("AVI ") ++ hdrl ++ movi)
  }

  /** Media table of real MJPEG AVI payloads, one per id; JPEG encoding
    * runs per-partition on executors. */
  def synthMjpegTable(spark: SparkSession, ids: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    ids.select(col(ids.columns.head).cast("long").as("id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          MediaRow(id, synthMjpegAvi(id), "video/x-msvideo",
            declared_w = 10 + (id % 9).toInt, declared_h = 9 + (id % 8).toInt)
        }
      }
  }

  /** REAL per-partition MJPEG AVI decode: the same strict RIFF walk as
    * [[decodeVideo]], but the stream must be `vids`/`MJPG`
    * (biCompression = 'MJPG') and every `00dc` chunk is handed to the
    * JDK's ImageIO JPEG reader — a genuine compressed-codec decode, the
    * boundary [[decodeStub]] used to mark. MJPEG frames are self-
    * contained top-down JPEGs (no DIB row flip — that distinction is
    * part of the spec this walk honors), folded with the same
    * (frame, raster)-ordered position weighting as the DIB path.
    * Narrows [[decodeStub]] to INTER-frame codecs (H.264 etc.). */
  def decodeMjpegVideo(ds: Dataset[MediaRow]): Dataset[DecodedVideo] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val bb = java.nio.ByteBuffer.wrap(r.payload)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        def fcc(): String = {
          val a = new Array[Byte](4); bb.get(a)
          new String(a, java.nio.charset.StandardCharsets.US_ASCII)
        }
        require(fcc() == "RIFF" && { bb.getInt; fcc() == "AVI " },
          s"not a RIFF AVI for media ${r.media_id}")
        var usecPerFrame = 0L; var headerFrames = 0L
        var w = 0; var h = 0
        var isMjpg = false; var framesSeen = 0L; var pixSum = 0L
        while (bb.remaining >= 8) {
          val id = fcc(); val sz = bb.getInt
          if (id == "LIST") fcc() // descend: children are chunks too
          else {
            val start = bb.position()
            id match {
              case "avih" =>
                usecPerFrame = bb.getInt().toLong & 0xffffffffL
                bb.position(start + 16)
                headerFrames = bb.getInt().toLong & 0xffffffffL
              case "strh" =>
                val (t, hd) = (fcc(), fcc())
                require(t == "vids" && hd == "MJPG",
                  s"unexpected stream $t/$hd for media ${r.media_id}")
                isMjpg = true
              case "strf" =>
                bb.position(start + 4); w = bb.getInt()
                h = bb.getInt()
                bb.position(start + 14)
                val bits = bb.getShort()
                val compBytes = new Array[Byte](4); bb.get(compBytes)
                require(bits == 24 && new String(compBytes,
                    java.nio.charset.StandardCharsets.US_ASCII) == "MJPG",
                  s"not an MJPG stream format for media ${r.media_id}")
              case "00dc" =>
                require(isMjpg && w > 0,
                  s"frame before headers for media ${r.media_id}")
                val img = javax.imageio.ImageIO.read(
                  new java.io.ByteArrayInputStream(r.payload, start, sz))
                require(img != null && img.getWidth == w && img.getHeight == h,
                  s"undecodable/mis-sized JPEG frame for media ${r.media_id}")
                val f = framesSeen
                var y = 0
                while (y < h) {
                  var x = 0
                  while (x < w) {
                    pixSum += ((f * h + y) * w.toLong + x + 1) *
                      (img.getRGB(x, y) & 0xffffff)
                    x += 1
                  }
                  y += 1
                }
                framesSeen += 1
              case _ => ()
            }
            bb.position(start + sz + (sz & 1))
          }
        }
        require(framesSeen == headerFrames,
          s"frame count mismatch for media ${r.media_id}")
        DecodedVideo(r.media_id, w, h, framesSeen, usecPerFrame, pixSum)
      }
    }
  }
}
