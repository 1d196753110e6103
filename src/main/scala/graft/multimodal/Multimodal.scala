package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video travel as opaque
  * `binary` payloads with typed metadata, and per-batch feature
  * extraction runs inside `mapPartitions` so each task amortizes decoder
  * setup over its whole partition (the JVM analogue of a batched
  * Arrow-UDF pipeline).
  *
  * Decode: for `kind = "image"` the (width, height) metadata is parsed
  * FOR REAL from the payload's container header — PNG IHDR or JPEG SOF
  * frame, pure JVM byte-walking, no codec libraries
  * ([[MediaDecoder.imageDims]]). Full pixel decode and the audio/video
  * paths remain STUBBED behind [[MediaDecoder.decodeStub]], a
  * deterministic fake keyed on payload bytes (this container ships no
  * codec libraries). Everything around the stub is real and tested:
  * schema, binary handling, partition-batched execution, feature-vector
  * output shape.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      width: Int,
      height: Int,
      features: Array[Float])

  val FeatureDim = 8

  object MediaDecoder {

    private def be32(b: Array[Byte], off: Int): Int =
      ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
        ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

    private def be16(b: Array[Byte], off: Int): Int =
      ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

    /** REAL image-dimension parse from container header bytes — no codec
      * library needed, just the published container layouts:
      *   - PNG [public: RFC 2083 §4.1.1]: 8-byte signature, then the IHDR
      *     chunk is mandatory-first, so width/height are the big-endian
      *     int32s at byte offsets 16 and 20.
      *   - JPEG [public: ITU T.81 §B.2.2]: FFD8 SOI, then marker segments
      *     `FF <marker> <len16> <payload>`; the first SOFn frame header
      *     (C0-CF minus C4/C8/CC) carries height at +5, width at +7.
      * Returns None for anything that isn't a well-formed PNG/JPEG prefix,
      * including headers declaring non-positive dimensions — a corrupt or
      * hostile PNG can claim width 0 or >= 2^31 (be32 wraps negative), and
      * letting that through would poison downstream fit math with zero or
      * negative output dims. Such payloads fall back to the stub like any
      * other unparseable bytes.
      */
    def imageDims(payload: Array[Byte]): Option[(Int, Int)] = {
      val isPng = payload.length >= 24 &&
        (payload(0) & 0xff) == 0x89 && payload(1) == 'P' &&
        payload(2) == 'N' && payload(3) == 'G' &&
        (payload(4) & 0xff) == 0x0d && (payload(5) & 0xff) == 0x0a &&
        (payload(6) & 0xff) == 0x1a && (payload(7) & 0xff) == 0x0a
      val parsed: Option[(Int, Int)] =
        if (isPng) Some((be32(payload, 16), be32(payload, 20)))
        else if (payload.length >= 4 &&
            (payload(0) & 0xff) == 0xff && (payload(1) & 0xff) == 0xd8) {
          var i = 2
          var found: Option[(Int, Int)] = None
          while (found.isEmpty && i + 8 < payload.length &&
              (payload(i) & 0xff) == 0xff) {
            val marker = payload(i + 1) & 0xff
            if (marker >= 0xc0 && marker <= 0xcf &&
                marker != 0xc4 && marker != 0xc8 && marker != 0xcc)
              found = Some((be16(payload, i + 7), be16(payload, i + 5)))
            else {
              val len = be16(payload, i + 2)
              if (len < 2) i = payload.length // malformed segment: bail
              else i += 2 + len
            }
          }
          found
        } else None
      parsed.filter { case (w, h) => w > 0 && h > 0 }
    }

    /** REAL audio-metadata parse from WAV container bytes — published
      * layout only [public: RIFF/WAVE, Microsoft multimedia file format]:
      * `RIFF <size> WAVE`, then chunks `<id> <size32le> <payload>`; the
      * mandatory `fmt ` chunk carries channels at +2 (le16), sample rate
      * at +4 (le32), bits/sample at +14 (le16). Returns None for
      * non-WAV bytes or nonsense values (zero/negative rate or channels),
      * mirroring imageDims' hostile-header posture.
      */
    def audioInfo(payload: Array[Byte]): Option[(Int, Int, Int)] = {
      def le16(off: Int): Int =
        (payload(off) & 0xff) | ((payload(off + 1) & 0xff) << 8)
      def le32(off: Int): Int =
        le16(off) | (le16(off + 2) << 16)
      def tag(off: Int, s: String): Boolean =
        payload.length >= off + 4 &&
          s.getBytes("US-ASCII").zipWithIndex.forall { case (b, i) => payload(off + i) == b }
      if (!(payload.length >= 12 && tag(0, "RIFF") && tag(8, "WAVE"))) None
      else {
        // Offsets are tracked as Long: the chunk size is attacker-controlled
        // le32 data, and Int arithmetic on a size near 2^31 wraps `i`
        // negative while `i + 8 <= length` still passes — indexing the
        // array at a negative offset instead of returning None.
        var i = 12L
        var found: Option[(Int, Int, Int)] = None
        while (found.isEmpty && i + 8 <= payload.length) {
          val off = i.toInt // safe: i + 8 <= length <= Int.MaxValue
          val size = le32(off + 4) & 0xffffffffL // unsigned on the wire
          if (tag(off, "fmt ") && size >= 16 && i + 8 + 16 <= payload.length) {
            val channels = le16(off + 8 + 2)
            val rate = le32(off + 8 + 4)
            val bits = le16(off + 8 + 14)
            found = Some((rate, channels, bits))
          } else i += 8L + size + (size & 1L) // word-aligned; oversize jumps past EOF -> None
        }
        found.filter { case (r, c, b) => r > 0 && c > 0 && b > 0 }
      }
    }

    /** REAL PCM sample decode for WAV payloads — the audio counterpart
      * of the netpbm pixel path: locates the `data` chunk with the same
      * hostile-header chunk walk as [[audioInfo]] and decodes 8-bit
      * unsigned / 16-bit signed-LE PCM (the two layouts the original
      * RIFF/WAVE spec defines) of the FIRST channel to doubles in
      * [-1, 1]. Truncated data chunks decode the bytes that exist;
      * anything else malformed returns None and falls back to the stub
      * like every other decoder here. Returns (sampleRate, channels,
      * firstChannelSamples).
      */
    def pcmSamples(payload: Array[Byte]): Option[(Int, Int, Array[Double])] =
      audioInfo(payload).flatMap { case (rate, channels, bits) =>
        if (bits != 8 && bits != 16) None
        else {
          def le16(off: Int): Int =
            (payload(off) & 0xff) | ((payload(off + 1) & 0xff) << 8)
          def le32(off: Int): Int = le16(off) | (le16(off + 2) << 16)
          def tag(off: Int, s: String): Boolean =
            payload.length >= off + 4 &&
              s.getBytes("US-ASCII").zipWithIndex.forall { case (b, i) =>
                payload(off + i) == b
              }
          var i = 12L
          var res: Option[(Int, Int, Array[Double])] = None
          while (res.isEmpty && i + 8 <= payload.length) {
            val off = i.toInt
            val size = le32(off + 4) & 0xffffffffL
            if (tag(off, "data")) {
              val avail = math.min(size, (payload.length - off - 8).toLong)
              val step = channels * (bits / 8)
              val n = (avail / step).toInt
              val out = new Array[Double](n)
              var k = 0
              while (k < n) {
                val p = off + 8 + k * step
                out(k) =
                  if (bits == 8) ((payload(p) & 0xff) - 128) / 128.0
                  else le16(p).toShort / 32768.0
                k += 1
              }
              res = Some((rate, channels, out))
            } else i += 8L + size + (size & 1L)
          }
          res
        }
      }

    /** REAL full-pixel decode for binary netpbm [public: netpbm formats,
      * pgm(5)/ppm(5) man pages]: magic `P5` (grayscale) / `P6` (RGB),
      * then ASCII decimal width, height, maxval separated by whitespace
      * (with `#`-to-newline comments), ONE whitespace byte, then
      * width*height*(1|3) raw 8-bit samples. The one image family
      * decodable with zero codec dependencies, which makes it the
      * end-to-end REAL pixel path — PNG/JPEG stop at the header parse.
      * 8-bit only (maxval < 256); anything malformed (bad magic,
      * non-positive dims, overflowing sizes, truncated pixel data)
      * returns None and falls back like any other opaque payload.
      */
    def pnmDecode(payload: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
      if (payload.length < 2 || payload(0) != 'P' ||
          (payload(1) != '5' && payload(1) != '6')) None
      else {
        val channels = if (payload(1) == '6') 3 else 1
        var i = 2
        def skipWs(): Unit = {
          var go = true
          while (go && i < payload.length) {
            val c = payload(i) & 0xff
            if (c == '#') { while (i < payload.length && payload(i) != '\n') i += 1 }
            else if (c == ' ' || c == '\t' || c == '\r' || c == '\n') i += 1
            else go = false
          }
        }
        def readInt(): Int = { // -1 = malformed
          skipWs()
          var v = 0L
          var any = false
          while (i < payload.length && payload(i) >= '0' && payload(i) <= '9' &&
              v <= Int.MaxValue) {
            v = v * 10 + (payload(i) - '0'); any = true; i += 1
          }
          if (any && v <= Int.MaxValue) v.toInt else -1
        }
        val w = readInt()
        val h = readInt()
        val maxv = readInt()
        // exactly ONE whitespace byte after maxval, then raw samples — and
        // it must actually BE whitespace, else the header is malformed and
        // pixel data would silently shift by one byte
        val delimOk = i < payload.length && {
          val c = payload(i) & 0xff
          c == ' ' || c == '\t' || c == '\r' || c == '\n'
        }
        i += 1
        val n = if (w > 0 && h > 0) w.toLong * h * channels else -1L
        if (!delimOk || w <= 0 || h <= 0 || maxv <= 0 || maxv >= 256 ||
            n > payload.length - i) None
        else Some((w, h, channels,
          java.util.Arrays.copyOfRange(payload, i, i + n.toInt)))
      }
    }

    /** 8-bin LUMINANCE histogram over real decoded pixels (integer-mean
      * luma for RGB — deterministic, no float rounding surface).
      */
    def pixelHistogram(pixels: Array[Byte], channels: Int): Array[Float] = {
      // integer bin counts: a Float accumulator stops incrementing once a
      // bin passes 2^24 pixels (a ~4096x4096 uniform image), silently
      // corrupting the histogram — Long counts are exact at any size
      val hist = new Array[Long](FeatureDim)
      val nPix = pixels.length / channels
      var p = 0
      while (p < nPix) {
        var lum = 0
        var c = 0
        while (c < channels) { lum += pixels(p * channels + c) & 0xff; c += 1 }
        hist((lum / channels) * FeatureDim / 256) += 1L
        p += 1
      }
      val n = math.max(1, nPix).toFloat
      hist.map(_ / n)
    }

    /** Binary netpbm encode — the inverse of [[pnmDecode]], used by the
      * real resample path.
      */
    def pnmEncode(w: Int, h: Int, channels: Int, pixels: Array[Byte]): Array[Byte] = {
      val header = s"P${if (channels == 3) '6' else '5'}\n$w $h\n255\n"
        .getBytes("US-ASCII")
      val out = new Array[Byte](header.length + pixels.length)
      System.arraycopy(header, 0, out, 0, header.length)
      System.arraycopy(pixels, 0, out, header.length, pixels.length)
      out
    }

    /** REAL nearest-neighbor pixel resample for netpbm payloads: each
      * output pixel reads source (x*w/ow, y*h/oh) — exact integer
      * arithmetic, deterministic across JVMs.
      */
    def pnmResize(w: Int, h: Int, channels: Int, pixels: Array[Byte],
        ow: Int, oh: Int): Array[Byte] = {
      val out = new Array[Byte](ow * oh * channels)
      var y = 0
      while (y < oh) {
        val sy = (y.toLong * h / oh).toInt
        var x = 0
        while (x < ow) {
          val sx = (x.toLong * w / ow).toInt
          var c = 0
          while (c < channels) {
            out((y * ow + x) * channels + c) = pixels((sy * w + sx) * channels + c)
            c += 1
          }
          x += 1
        }
        y += 1
      }
      pnmEncode(ow, oh, channels, out)
    }

    /** STUB decode: a real implementation would hand `payload` to an image
      * or audio codec here. The fake derives (width, height) and an
      * 8-bin byte histogram deterministically from the bytes, so plumbing
      * tests have stable golden values.
      */
    def decodeStub(payload: Array[Byte]): (Int, Int, Array[Float]) = {
      val w = 16 + (if (payload.isEmpty) 0 else (payload(0) & 0x3f))
      val h = 16 + (if (payload.length < 2) 0 else (payload(1) & 0x3f))
      (w, h, byteHistogram(payload))
    }

    private def byteHistogram(payload: Array[Byte]): Array[Float] = {
      val hist = new Array[Float](FeatureDim)
      payload.foreach(b => hist((b & 0xff) % FeatureDim) += 1f)
      val n = math.max(1, payload.length).toFloat
      hist.map(_ / n)
    }

    /** Per-kind dispatch: images get the real netpbm FULL decode (real
      * pixels -> real luminance features) when the payload is P5/P6, else
      * the real PNG/JPEG header parse (real dims, byte-level features),
      * else the stub (the fixture payloads are utf-8 text); audio/video
      * stay on the stub until real codecs exist.
      */
    def decode(kind: String, payload: Array[Byte]): (Int, Int, Array[Float]) =
      if (kind == "image")
        pnmDecode(payload) match {
          case Some((w, h, ch, pix)) => (w, h, pixelHistogram(pix, ch))
          case None =>
            imageDims(payload) match {
              case Some((w, h)) => (w, h, byteHistogram(payload))
              case None => decodeStub(payload)
            }
        }
      else decodeStub(payload)
  }

  /** Wrap any table with a string column as a media table (fixture stand-in
    * for real binary ingestion: payload = utf-8 bytes). Kind cycles
    * deterministically to exercise per-kind dispatch.
    */
  def asMediaTable(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol).cast("long"), lit(3)) + 1).cast("int")).as("kind"),
      col(payloadCol).cast("binary").as("payload"))

  final case class ResizedMedia(
      media_id: Long,
      kind: String,
      width: Int,
      height: Int,
      out_width: Int,
      out_height: Int,
      payload: Array[Byte])

  /** Aspect-preserving resize: computes each image's output dimensions
    * for a bounding box (parsed source dims via the real decoders, stub
    * dims otherwise; fit math is exact integer arithmetic, never
    * upscaling). For netpbm payloads the pixel resample actually RUNS
    * ([[MediaDecoder.pnmResize]], nearest-neighbor) and the emitted
    * payload is the resized image; for other formats the resample would
    * need a codec, so the payload passes through unchanged (documented
    * stub). Output is the (metadata, payload) shape a batched GPU/codec
    * stage consumes.
    */
  def resizeToFit(media: DataFrame, maxW: Int, maxH: Int): Dataset[ResizedMedia] = {
    require(maxW >= 1 && maxH >= 1)
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("kind"), col("payload")).as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val (w, h, _) = MediaDecoder.decode(r.kind, r.payload)
          val (ow, oh) =
            if (w <= maxW && h <= maxH) (w, h) // never upscale
            else {
              // scale by the tighter axis, floor, keep >= 1px
              val byW = (maxW.toLong, math.max(1L, h.toLong * maxW / math.max(1, w)))
              val byH = (math.max(1L, w.toLong * maxH / math.max(1, h)), maxH.toLong)
              val fit = if (byW._2 <= maxH) byW else byH
              (fit._1.toInt, fit._2.toInt)
            }
          val outPayload =
            if (r.kind == "image" && (ow != w || oh != h))
              MediaDecoder.pnmDecode(r.payload) match {
                case Some((pw, ph, ch, pix)) =>
                  MediaDecoder.pnmResize(pw, ph, ch, pix, ow, oh)
                case None => r.payload // non-netpbm: resample needs a codec
              }
            else r.payload
          ResizedMedia(r.media_id, r.kind, w, h, ow, oh, outPayload)
        }
      }
  }

  final case class MediaHash(media_id: Long, dhash: Long)

  /** dHash perceptual fingerprint [public: the classic
    * aHash/dHash/pHash difference-hash family, e.g. Krawetz 2013 "Kind
    * of Like That"]: real netpbm decode → integer-mean luminance →
    * nearest-neighbor resample onto a 9×8 luma grid (the exact
    * [[MediaDecoder.pnmResize]] index map, source (y·h/8, x·w/9)) → 64
    * horizontal-gradient bits, bit y·8+x = 1 iff luma(y,x) < luma(y,
    * x+1). Gradients survive brightness/contrast shifts and resampling
    * noise, so near-identical images land within a few Hamming bits —
    * feed the output to [[graft.operators.Dedup.hammingPairs]] for
    * banded near-dup candidates. Integer-exact end to end (byte luma,
    * floor index map, strict compare): no float surface, so the whole
    * hash replays in SQL. Non-netpbm payloads emit no row (a real
    * deployment decodes them through a codec into this same path); one
    * row in, ≤ one 16-byte row out, embarrassingly parallel.
    */
  def dHash(media: DataFrame): Dataset[MediaHash] = {
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("kind"), col("payload")).as[MediaRow]
      .flatMap { r =>
        MediaDecoder.pnmDecode(r.payload).map { case (w, h, ch, pix) =>
          var hash = 0L
          var y = 0
          while (y < 8) {
            val sy = (y.toLong * h / 8).toInt
            var x = 0
            var prev = 0
            while (x < 9) {
              val sx = (x.toLong * w / 9).toInt
              var lum = 0
              var c = 0
              while (c < ch) { lum += pix((sy * w + sx) * ch + c) & 0xff; c += 1 }
              lum /= ch
              if (x > 0 && prev < lum) hash |= 1L << (y * 8 + (x - 1))
              prev = lum
              x += 1
            }
            y += 1
          }
          MediaHash(r.media_id, hash)
        }
      }
  }

  final case class AudioFp(media_id: Long, afp: Long)

  /** Audio fingerprint for WAV payloads — the time-axis analog of
    * [[dHash]] [public: the energy-difference family behind
    * Haitsma–Kalker (2002) / Chromaprint, reduced to its
    * codec-free core]: real PCM decode ([[MediaDecoder.pcmSamples]]),
    * the first 65·16 = 1040 first-channel samples restored to exact
    * int16 (the decode's /32768 is a dyadic scale, so round(s·32768)
    * is lossless), 65 frame energies e_i = Σ|sample| (exact integer
    * sums), and 64 energy-gradient bits — bit i = 1 iff e_i < e_{i+1}.
    * Gradients are invariant under uniform gain (a volume change
    * scales every energy by the same factor), the perceptual-dup
    * transformation a byte hash misses; small additive noise flips
    * only bits whose adjacent energies nearly tie. Integer-exact end
    * to end, so the hash replays in SQL. Payloads that are not WAV,
    * not 8/16-bit PCM, or shorter than 1040 samples emit no row; one
    * row in, ≤ one 16-byte row out. Pair with
    * [[graft.operators.Dedup.hammingPairs]] for banded near-dup
    * candidates.
    */
  def audioFingerprint(media: DataFrame, frames: Int = 65,
      frameLen: Int = 16): Dataset[AudioFp] = {
    require(frames >= 2 && frames <= 65 && frameLen >= 1,
      "audioFingerprint: need 2..65 frames (frames-1 <= 64 bits)")
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("kind"), col("payload")).as[MediaRow]
      .flatMap { r =>
        MediaDecoder.pcmSamples(r.payload).collect {
          case (_, _, s) if s.length >= frames * frameLen =>
            val e = new Array[Long](frames)
            var i = 0
            while (i < frames) {
              var acc = 0L
              var k = 0
              while (k < frameLen) {
                acc += math.abs(math.round(s(i * frameLen + k) * 32768.0))
                k += 1
              }
              e(i) = acc
              i += 1
            }
            var hash = 0L
            var f = 0
            while (f < frames - 1) {
              if (e(f) < e(f + 1)) hash |= 1L << f
              f += 1
            }
            AudioFp(r.media_id, hash)
        }
      }
  }

  final case class FrameSample(
      media_id: Long,
      frame_idx: Int,
      offset: Int,
      frame: Array[Byte])

  /** Deterministic frame sampling for video payloads: `nFrames`
    * fixed-size byte windows at evenly spaced offsets — the
    * container-agnostic stand-in for keyframe extraction (a real
    * implementation would seek the codec's keyframe index here; the
    * offsets/slicing/fan-out plumbing is what Spark owns either way).
    * Emits one row per (media, frame) — the long shape a per-frame
    * embedding or captioning stage consumes; non-video rows contribute a
    * single frame 0 over the payload head so downstream stages see a
    * uniform schema. Fan-out is nFrames x rows with small fixed-size
    * frames: partition counts carry over from the input, so repartition
    * upstream by media_id for even decode batches at scale.
    */
  def sampleFrames(media: DataFrame, nFrames: Int = 4, frameBytes: Int = 64)
      : Dataset[FrameSample] = {
    require(nFrames >= 1 && frameBytes >= 1)
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("kind"), col("payload")).as[MediaRow]
      .flatMap { r =>
        val n = if (r.kind == "video") nFrames else 1
        val len = r.payload.length
        (0 until n).iterator.map { i =>
          val off =
            if (n <= 1 || len <= frameBytes) 0
            else ((len - frameBytes).toLong * i / (n - 1)).toInt
          val from = math.min(off, len)
          val until = math.min(off + frameBytes, len)
          FrameSample(r.media_id, i, off,
            java.util.Arrays.copyOfRange(r.payload, from, until))
        }
      }
  }

  final case class AudioMeta(
      media_id: Long,
      sample_rate: Int,
      n_channels: Int,
      bits_per_sample: Int,
      parsed: Boolean)

  /** Audio-metadata extraction: REAL RIFF/WAV header parse
    * ([[MediaDecoder.audioInfo]]) where the payload is a recognizable WAV,
    * deterministic stub metadata otherwise (the fixture payloads are text
    * bytes), with `parsed` flagging which path ran. Same partition-batched
    * shape as [[extractFeatures]].
    */
  def audioMetadata(media: DataFrame): Dataset[AudioMeta] = {
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("kind"), col("payload")).as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          MediaDecoder.audioInfo(r.payload) match {
            case Some((rate, ch, bits)) =>
              AudioMeta(r.media_id, rate, ch, bits, parsed = true)
            case None =>
              val (w, h, _) = MediaDecoder.decodeStub(r.payload)
              AudioMeta(r.media_id, 8000 + w * 100, 1 + (h % 2), 16, parsed = false)
          }
        }
      }
  }

  final case class AudioFeatures(
      media_id: Long,
      parsed: Boolean,
      n_samples: Long,
      duration_ms: Long,
      rms: Double,
      zcr: Double)

  /** Audio feature extraction: REAL DSP (RMS level + zero-crossing rate
    * over decoded first-channel PCM, [[MediaDecoder.pcmSamples]]) where
    * the payload is a decodable WAV; a deterministic byte-statistics
    * stub otherwise (fixture payloads are text bytes), `parsed` flagging
    * which path ran — the netpbm-pixel precedent applied to audio. Same
    * partition-batched shape as [[extractFeatures]].
    */
  def audioFeatureStats(media: DataFrame): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("kind"), col("payload")).as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          MediaDecoder.pcmSamples(r.payload) match {
            case Some((rate, _, xs)) if xs.nonEmpty =>
              var sq = 0.0
              var crossings = 0
              var k = 0
              while (k < xs.length) {
                sq += xs(k) * xs(k)
                if (k > 0 && (xs(k) >= 0) != (xs(k - 1) >= 0)) crossings += 1
                k += 1
              }
              AudioFeatures(r.media_id, parsed = true, xs.length.toLong,
                xs.length.toLong * 1000 / rate,
                math.sqrt(sq / xs.length),
                if (xs.length > 1) crossings.toDouble / (xs.length - 1) else 0.0)
            case _ =>
              // deterministic fake from raw byte statistics (documented
              // stub: no codec libs in the container)
              val n = r.payload.length
              var sq = 0.0
              var flips = 0
              var k = 0
              while (k < n) {
                val v = ((r.payload(k) & 0xff) - 128) / 128.0
                sq += v * v
                if (k > 0 && ((r.payload(k) & 0xff) >= 128) !=
                  ((r.payload(k - 1) & 0xff) >= 128)) flips += 1
                k += 1
              }
              AudioFeatures(r.media_id, parsed = false, n.toLong,
                n.toLong * 1000 / 8000,
                if (n > 0) math.sqrt(sq / n) else 0.0,
                if (n > 1) flips.toDouble / (n - 1) else 0.0)
          }
        }
      }
  }

  /** Batched feature extraction: one decoder instantiation per partition,
    * streamed row-by-row (no per-partition materialization). Partition
    * count governs decode parallelism — repartition upstream by media_id
    * for even batches at scale.
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("kind"), col("payload")).as[MediaRow]
      .mapPartitions { rows =>
        // per-partition decoder setup would happen here (codec contexts,
        // model weights, ...) — amortized across the whole batch
        rows.map { r =>
          val (w, h, feats) = MediaDecoder.decode(r.kind, r.payload)
          MediaFeatures(r.media_id, r.kind, r.payload.length, w, h, feats)
        }
      }
  }
}
