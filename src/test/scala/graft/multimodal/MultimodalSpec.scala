package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Fixtures

class MultimodalSpec extends SparkSpec {

  private lazy val media =
    Multimodal.asMediaTable(Fixtures.table(spark, sf0001, "documents"), "doc_id", "text")

  test("media table schema: long id, kind enum, binary payload") {
    val s = media.schema
    assert(s("media_id").dataType.typeName == "long")
    assert(s("payload").dataType.typeName == "binary")
    val kinds = media.select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("feature extraction: dim, byte counts, deterministic across runs") {
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(f1.length == media.count())
    assert(f1.forall(_.features.length == Multimodal.FeatureDim))
    // histogram is normalized by byte count -> sums to ~1
    assert(f1.forall(f => math.abs(f.features.sum - 1f) < 1e-3))
    assert(f1.zip(f2).forall { case (a, b) =>
      a.media_id == b.media_id && a.features.sameElements(b.features) &&
        a.width == b.width && a.height == b.height
    })
  }

  test("decode stub golden values") {
    val (w, h, feats) = Multimodal.MediaDecoder.decodeStub("ab".getBytes("UTF-8"))
    assert(w == 16 + ('a' & 0x3f) && h == 16 + ('b' & 0x3f))
    assert(feats.sum == 1.0f)
  }

  test("netpbm FULL pixel decode: P5/P6 golden images, comments, luminance features") {
    import Multimodal.MediaDecoder
    // P5 4x2 grayscale ramp: one pixel per luminance bin
    val p5 = "P5\n4 2\n255\n".getBytes("US-ASCII") ++
      Array(0, 32, 64, 96, 128, 160, 192, 224).map(_.toByte)
    val (w, h, feats) = MediaDecoder.decode("image", p5)
    assert((w, h) == (4, 2), "real header dims")
    assert(feats.toSeq == Seq.fill(8)(0.125f), s"one pixel per bin: ${feats.toSeq}")
    // P6 RGB, with a header comment: integer-mean luma buckets
    val p6 = "P6\n# golden\n2 2\n255\n".getBytes("US-ASCII") ++
      Array(10, 20, 30, 100, 110, 120, 200, 210, 220, 250, 250, 250).map(_.toByte)
    val (w6, h6, f6) = MediaDecoder.decode("image", p6)
    assert((w6, h6) == (2, 2))
    assert(f6(0) == 0.25f && f6(3) == 0.25f && f6(6) == 0.25f && f6(7) == 0.25f, f6.toSeq)
    // truncated pixel data must NOT decode (falls through to the stub)
    val truncated = "P5\n4 2\n255\n".getBytes("US-ASCII") ++ Array[Byte](1, 2, 3)
    assert(MediaDecoder.pnmDecode(truncated).isEmpty)
    // 16-bit maxval is out of scope and must be rejected, not misread
    val deep = "P5\n1 1\n65535\n".getBytes("US-ASCII") ++ Array[Byte](0, 0)
    assert(MediaDecoder.pnmDecode(deep).isEmpty)
    // a non-whitespace byte after maxval is a malformed header, NOT a
    // one-byte pixel shift: must be rejected outright
    val badDelim = "P5\n2 1\n255X".getBytes("US-ASCII") ++ Array[Byte](1, 2, 3)
    assert(MediaDecoder.pnmDecode(badDelim).isEmpty)
  }

  test("netpbm real resample: nearest-neighbor bytes, payload re-encoded") {
    import Multimodal.MediaDecoder
    val p5 = "P5\n4 2\n255\n".getBytes("US-ASCII") ++
      Array(0, 32, 64, 96, 128, 160, 192, 224).map(_.toByte)
    import spark.implicits._
    val media = Seq((1L, "image", p5)).toDF("media_id", "kind", "payload")
    val out = Multimodal.resizeToFit(media, 2, 1).collect().head
    assert((out.width, out.height) == (4, 2) && (out.out_width, out.out_height) == (2, 1))
    // nearest-neighbor: rows sample sy = y*h/oh = 0, cols sx = x*w/ow -> 0, 2
    val expected = "P5\n2 1\n255\n".getBytes("US-ASCII") ++ Array(0, 64).map(_.toByte)
    assert(out.payload.toSeq == expected.toSeq,
      s"resampled payload ${out.payload.toSeq} vs $expected")
    // round-trip: the resized payload decodes again (it IS a valid P5)
    assert(MediaDecoder.pnmDecode(out.payload).map(d => (d._1, d._2)) == Some((2, 1)))
  }

  // golden 640x480 PNG prefix: signature + IHDR chunk header + dims
  private val pngHeader: Array[Byte] = (
    Seq(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0d, 0x0a, 0x1a, 0x0a) ++ // signature
      Seq(0x00, 0x00, 0x00, 0x0d) ++                                      // IHDR length 13
      "IHDR".getBytes("US-ASCII").map(_.toInt) ++
      Seq(0x00, 0x00, 0x02, 0x80) ++                                      // width 640
      Seq(0x00, 0x00, 0x01, 0xe0) ++                                      // height 480
      Seq(0x08, 0x06, 0x00, 0x00, 0x00)                                   // depth/color/etc
    ).map(_.toByte).toArray

  // golden 320x200 JPEG prefix: SOI, APP0 (to prove segment walking), SOF0
  private val jpegHeader: Array[Byte] = (
    Seq(0xff, 0xd8) ++                                    // SOI
      Seq(0xff, 0xe0, 0x00, 0x04, 0x4a, 0x46) ++         // APP0, len 4
      Seq(0xff, 0xc0, 0x00, 0x11, 0x08) ++               // SOF0, len 17, precision 8
      Seq(0x00, 0xc8) ++                                  // height 200
      Seq(0x01, 0x40) ++                                  // width 320
      Seq(0x03, 0x01, 0x22, 0x00)                         // components...
    ).map(_.toByte).toArray

  test("real image header parse: PNG IHDR and JPEG SOF0 dims, not the stub") {
    assert(Multimodal.MediaDecoder.imageDims(pngHeader).contains((640, 480)))
    assert(Multimodal.MediaDecoder.imageDims(jpegHeader).contains((320, 200)))
    // non-image bytes fall back to None -> stub
    assert(Multimodal.MediaDecoder.imageDims("plain text".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.MediaDecoder.imageDims(Array.empty[Byte]).isEmpty)
    // truncated PNG signature must not parse
    assert(Multimodal.MediaDecoder.imageDims(pngHeader.take(12)).isEmpty)
    // hostile headers declaring zero / negative (be32-wrapped) dims fall
    // back to the stub instead of poisoning downstream fit math
    val zeroW = pngHeader.clone()
    zeroW(16) = 0; zeroW(17) = 0; zeroW(18) = 0; zeroW(19) = 0 // width 0
    assert(Multimodal.MediaDecoder.imageDims(zeroW).isEmpty)
    val negH = pngHeader.clone()
    negH(20) = 0xff.toByte // height >= 2^31 -> wraps negative
    assert(Multimodal.MediaDecoder.imageDims(negH).isEmpty)
    // dispatch: image kind uses the header; audio kind ignores it
    val (wi, hi, _) = Multimodal.MediaDecoder.decode("image", pngHeader)
    assert((wi, hi) == (640, 480))
    val (wa, ha, _) = Multimodal.MediaDecoder.decode("audio", pngHeader)
    assert((wa, ha) == (16 + (0x89 & 0x3f), 16 + ('P' & 0x3f)))
  }

  // golden 44100 Hz stereo 16-bit WAV prefix: RIFF/WAVE, a junk chunk
  // FIRST (to prove chunk walking), then fmt
  private val wavHeader: Array[Byte] = {
    def le16(v: Int) = Seq(v & 0xff, (v >> 8) & 0xff)
    def le32(v: Int) = le16(v & 0xffff) ++ le16((v >> 16) & 0xffff)
    ("RIFF".getBytes("US-ASCII").map(_.toInt).toSeq ++ le32(100) ++
      "WAVE".getBytes("US-ASCII").map(_.toInt).toSeq ++
      "JUNK".getBytes("US-ASCII").map(_.toInt).toSeq ++ le32(4) ++ Seq(0, 0, 0, 0) ++
      "fmt ".getBytes("US-ASCII").map(_.toInt).toSeq ++ le32(16) ++
      le16(1) ++ le16(2) ++ le32(44100) ++ le32(176400) ++ le16(4) ++ le16(16)
    ).map(_.toByte).toArray
  }

  test("real audio header parse: WAV fmt chunk found past a junk chunk") {
    assert(Multimodal.MediaDecoder.audioInfo(wavHeader).contains((44100, 2, 16)))
    // non-WAV bytes and truncated prefixes fall back
    assert(Multimodal.MediaDecoder.audioInfo("plain text".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.MediaDecoder.audioInfo(wavHeader.take(10)).isEmpty)
    // hostile header: zero sample rate must not parse
    val zeroRate = wavHeader.clone()
    val fmtOff = wavHeader.length - 16 // fmt payload start
    (0 until 4).foreach(i => zeroRate(fmtOff + 4 + i) = 0)
    assert(Multimodal.MediaDecoder.audioInfo(zeroRate).isEmpty)
  }

  test("audioMetadata: real parse flagged, stub fallback deterministic") {
    import spark.implicits._
    val media = Seq(
      (1L, "audio", wavHeader),
      (2L, "audio", "not a wav".getBytes("UTF-8"))
    ).toDF("media_id", "kind", "payload")
    val out = Multimodal.audioMetadata(media).collect().sortBy(_.media_id)
    assert(out(0) == Multimodal.AudioMeta(1L, 44100, 2, 16, parsed = true))
    assert(!out(1).parsed && out(1).sample_rate > 0 && out(1).n_channels > 0)
    // stub is deterministic across runs
    val again = Multimodal.audioMetadata(media).collect().sortBy(_.media_id)
    assert(out.toSeq == again.toSeq)
  }

  // golden MONO 16-bit 8000 Hz WAV with a real data chunk: a square wave
  // of period 8 at half amplitude — rms exactly 0.5, one sign flip every
  // 4 samples
  private def monoWav(nSamples: Int): Array[Byte] = {
    def le16(v: Int) = Seq(v & 0xff, (v >> 8) & 0xff)
    def le32(v: Int) = le16(v & 0xffff) ++ le16((v >> 16) & 0xffff)
    val samples = (0 until nSamples).flatMap { i =>
      le16(if ((i / 4) % 2 == 0) 16384 else -16384 & 0xffff)
    }
    ("RIFF".getBytes("US-ASCII").map(_.toInt).toSeq ++ le32(36 + nSamples * 2) ++
      "WAVE".getBytes("US-ASCII").map(_.toInt).toSeq ++
      "fmt ".getBytes("US-ASCII").map(_.toInt).toSeq ++ le32(16) ++
      le16(1) ++ le16(1) ++ le32(8000) ++ le32(16000) ++ le16(2) ++ le16(16) ++
      "data".getBytes("US-ASCII").map(_.toInt).toSeq ++ le32(nSamples * 2) ++
      samples).map(_.toByte).toArray
  }

  test("real PCM decode + audio features: square-wave rms/zcr exact, truncation clamps") {
    import Multimodal.MediaDecoder
    val wav = monoWav(64)
    val Some((rate, ch, xs)) = MediaDecoder.pcmSamples(wav)
    assert((rate, ch, xs.length) == (8000, 1, 64))
    assert(xs.forall(x => math.abs(math.abs(x) - 0.5) < 1e-9), "half-amplitude square")
    // features through the Spark path
    import spark.implicits._
    val media = Seq(
      (1L, "audio", wav),
      (2L, "audio", "not a wav".getBytes("UTF-8"))).toDF("media_id", "kind", "payload")
    val out = Multimodal.audioFeatureStats(media).collect().sortBy(_.media_id)
    assert(out(0).parsed && out(0).n_samples == 64 && out(0).duration_ms == 8)
    assert(math.abs(out(0).rms - 0.5) < 1e-9, s"rms ${out(0).rms}")
    // sign flips at every multiple of 4 except 0 -> 15 crossings / 63 gaps
    assert(math.abs(out(0).zcr - 15.0 / 63) < 1e-9, s"zcr ${out(0).zcr}")
    assert(!out(1).parsed && out(1).n_samples == 9)
    // truncated data chunk: decode what exists, never throw
    val cut = wav.take(wav.length - 7)
    val Some((_, _, cutXs)) = MediaDecoder.pcmSamples(cut)
    assert(cutXs.length == 60, s"61 samples declared, ${cutXs.length} decodable")
    // stereo header from the shared prefix has no data chunk -> None
    assert(MediaDecoder.pcmSamples(wavHeader).isEmpty)
  }

  test("extractFeatures carries real header dims through the Spark path") {
    import spark.implicits._
    val df = Seq(
      (1L, "image", pngHeader),
      (2L, "image", jpegHeader),
      (3L, "image", "not an image".getBytes("UTF-8")),
      (4L, "video", pngHeader)
    ).toDF("media_id", "kind", "payload")
    val out = Multimodal.extractFeatures(df).collect().map(f => f.media_id -> f).toMap
    assert((out(1L).width, out(1L).height) == (640, 480))
    assert((out(2L).width, out(2L).height) == (320, 200))
    assert(out(3L).width == 16 + ('n' & 0x3f)) // stub fallback
    assert(out(4L).width == 16 + (0x89 & 0x3f)) // non-image kind stays stubbed
  }

  test("frame sampling: nFrames per video, 1 per other kinds, spaced offsets, bounded slices") {
    import spark.implicits._
    val payload = Array.tabulate(1000)(_.toByte)
    val df = Seq(
      (1L, "video", payload),
      (2L, "image", payload),
      (3L, "video", Array.empty[Byte]),
      (4L, "video", payload.take(10)) // shorter than one frame window
    ).toDF("media_id", "kind", "payload")
    val frames = Multimodal.sampleFrames(df, nFrames = 4, frameBytes = 64)
      .collect().groupBy(_.media_id)
    assert(frames(1L).length == 4 && frames(2L).length == 1)
    assert(frames(3L).length == 4 && frames(3L).forall(_.frame.isEmpty))
    // evenly spaced over (len - frameBytes): 0, 312, 624, 936
    assert(frames(1L).sortBy(_.frame_idx).map(_.offset).toSeq == Seq(0, 312, 624, 936))
    assert(frames(1L).forall(_.frame.length == 64))
    assert(frames(4L).forall(f => f.offset == 0 && f.frame.length == 10))
    // frame content is the actual payload slice at the offset
    val f2 = frames(1L).find(_.frame_idx == 1).get
    assert(f2.frame.toSeq == payload.slice(312, 312 + 64).toSeq)
    // deterministic across runs
    val again = Multimodal.sampleFrames(df, nFrames = 4, frameBytes = 64)
      .collect().groupBy(_.media_id)
    assert(again(1L).sortBy(_.frame_idx).map(_.offset).toSeq ==
      frames(1L).sortBy(_.frame_idx).map(_.offset).toSeq)
  }

  test("resizeToFit: aspect-preserving, never upscales, real header dims used") {
    import spark.implicits._
    val df = Seq(
      (1L, "image", pngHeader),                       // 640x480 real dims
      (2L, "image", "small".getBytes("UTF-8")),       // stub dims (~16-79)
      (3L, "audio", pngHeader)                        // non-image: stub dims
    ).toDF("media_id", "kind", "payload")
    val out = Multimodal.resizeToFit(df, maxW = 320, maxH = 320)
      .collect().map(r => r.media_id -> r).toMap
    // 640x480 -> fit 320 wide -> 320x240 (aspect 4:3 preserved exactly)
    assert((out(1L).width, out(1L).height) == (640, 480))
    assert((out(1L).out_width, out(1L).out_height) == (320, 240))
    // small stub dims are under the box: untouched (no upscale)
    assert(out(2L).out_width == out(2L).width && out(2L).out_height == out(2L).height)
    assert(out(2L).width <= 320)
    // payload passes through the stubbed pixel path unchanged
    assert(out(1L).payload.toSeq == pngHeader.toSeq)
    // extreme aspect: 640x480 into a 100x10 box -> height-bound 13x10
    val tall = Multimodal.resizeToFit(
      Seq((9L, "image", pngHeader)).toDF("media_id", "kind", "payload"), 100, 10)
      .head()
    assert((tall.out_width, tall.out_height) == (13, 10))
    assert(tall.out_width <= 100 && tall.out_height <= 10)
  }

  test("dHash golden values: gradient/flat/brightness/resample/RGB-luma/non-netpbm") {
    import spark.implicits._
    def p5(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] =
      Multimodal.MediaDecoder.pnmEncode(w, h, 1,
        Array.tabulate(w * h)(p => f(p / w, p % w).toByte))
    // RGB: lum = integer channel mean = x*10 + 4, strictly increasing
    val p6 = Multimodal.MediaDecoder.pnmEncode(9, 8, 3,
      Array.tabulate(9 * 8 * 3) { i =>
        val x = (i / 3) % 9; val c = i % 3; (x * 10 + c * 4).toByte
      })
    val rows = Seq(
      (1L, "image", p5(9, 8, (_, x) => x * 10 + 5)), // increasing rows
      (2L, "image", p5(9, 8, (_, _) => 77)), // flat
      (3L, "image", p5(9, 8, (_, x) => x * 10 + 12)), // #1 brightness-shifted
      (4L, "image", p5(18, 16, (_, x) => (x / 2) * 10 + 5)), // #1 2x upscaled
      (5L, "image", p6),
      (6L, "audio", "not an image".getBytes("US-ASCII"))) // non-netpbm
    val out = Multimodal.dHash(rows.toDF("media_id", "kind", "payload"))
      .collect().map(m => m.media_id -> m.dhash).toMap
    // strictly increasing luma along every row: all 64 gradient bits set
    assert(out(1L) == -1L)
    assert(out(2L) == 0L, "flat image has no gradients")
    assert(out(3L) == out(1L), "uniform brightness shift preserves the hash")
    assert(out(4L) == out(1L),
      "nearest-neighbor resample of the 2x image recovers the same grid")
    assert(out(5L) == -1L, "RGB integer-mean luma sees the same gradient")
    assert(!out.contains(6L), "non-netpbm payloads emit no fingerprint")
  }

  test("dedup_image_phash: brightness variants pair at Hamming 0; noise tail excluded") {
    val pairs = graft.queries.DataQueries.dedupImagePhash(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.nonEmpty)
    val bright = pairs.filter { case (a, b, _) =>
      a < 1000000L && b == a + 1000000L }
    assert(bright.nonEmpty, "expected (doc, brightness-variant) pairs")
    assert(bright.forall(_._3 == 0),
      "a uniform +10 shift preserves every gradient bit")
    assert(pairs.forall(_._3 <= 3))
    // noise variants: some found within tau, a deterministic tail excluded
    val noiseFound = pairs.count { case (a, b, _) =>
      a < 1000000L && b == a + 2000000L }
    val noiseAll = graft.sources.Fixtures.table(spark, sf0001, "documents")
      .filter(col("doc_id") % 7 === 3 && length(col("text")) >= 1).count()
    assert(noiseFound > 0 && noiseFound < noiseAll,
      s"jitter should split into found ($noiseFound) and excluded " +
        s"(${noiseAll - noiseFound}) — both non-empty")
  }

  test("audioFingerprint golden values: ramp/flat/gain-invariance/short/non-wav") {
    import spark.implicits._
    def wav(samples: Array[Int]): Array[Byte] = {
      val dataLen = samples.length * 2
      val b = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
      b.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(8000).putInt(16000)
        .putShort(2).putShort(16)
      b.put("data".getBytes("US-ASCII")).putInt(dataLen)
      samples.foreach(s => b.putShort(s.toShort))
      b.array()
    }
    val n = 65 * 16
    val ramp = Array.tabulate(n)(k => (k / 16 + 1) * 100) // energy grows per frame
    val rows = Seq(
      (1L, "audio", wav(ramp)),
      (2L, "audio", wav(Array.fill(n)(777))), // flat: no gradients
      (3L, "audio", wav(ramp.map(_ / 2))), // half volume: same gradients
      (4L, "audio", wav(Array.fill(100)(5))), // too short: no row
      (5L, "audio", "not a wav".getBytes("US-ASCII"))) // non-RIFF: no row
    val out = Multimodal.audioFingerprint(rows.toDF("media_id", "kind", "payload"))
      .collect().map(a => a.media_id -> a.afp).toMap
    assert(out(1L) == -1L, "strictly growing frame energies set all 64 bits")
    assert(out(2L) == 0L, "flat signal has no energy gradients")
    assert(out(3L) == out(1L), "uniform gain change preserves the fingerprint")
    assert(!out.contains(4L) && !out.contains(5L))
  }

  test("dedup_audio_fingerprint: gain variants at Hamming 0; noise within tau; no cross-doc pairs") {
    val pairs = graft.queries.DataQueries.dedupAudioFingerprint(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.nonEmpty && pairs.forall(_._3 <= 3))
    val gain = pairs.filter { case (a, b, _) => a < 1000000L && b == a + 3000000L }
    assert(gain.nonEmpty && gain.forall(_._3 == 0),
      "half-volume variants must fingerprint identically")
    assert(pairs.exists { case (a, b, _) => a < 1000000L && b == a + 4000000L },
      "expected (doc, noise-variant) pairs")
    // min cross-document hamming is > tau on this corpus: every pair ties
    // a document to its own planted variants (ids congruent mod 1e6)
    assert(pairs.forall { case (a, b, _) => (b - a) % 1000000L == 0 },
      "no accidental cross-document pairs at tau = 3")
  }

  test("dedup_image_clusters: variant components collapse to the original's id") {
    val rows = graft.queries.DataQueries.dedupImageClusters(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // cluster_id is the min member; every cluster seen at sf0.001 is
    // anchored by an original image and contains exactly one
    rows.foreach { case (cid, members, originals) =>
      assert(members >= 2, "CC emits only clustered media")
      assert(cid < 1000000L, s"cluster $cid not anchored by an original")
      assert(originals >= 1 && originals <= members)
    }
    // a doc with BOTH variants forms one 3-member cluster, not two pairs
    assert(rows.exists(_._2 >= 3), "expected at least one >= 3-member component")
  }

  test("dedup_video_frames: re-encode variants share exactly the unbroken frames") {
    val pairs = graft.queries.DataQueries.dedupVideoFrames(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.nonEmpty)
    // every pair ties a video to its own re-encoded variant: a one-byte
    // header change corrupts only frame 0, so exactly frames 1..3 match
    pairs.foreach { case (a, b, n) =>
      assert(b == a + 5000000L, s"unexpected cross-document pair ($a, $b)")
      assert(n == 3L, s"pair ($a, $b): expected 3 shared frames, got $n")
    }
  }

  test("partition-batched path survives repartitioning (plumbing, not plan)") {
    val out = Multimodal.extractFeatures(media.repartition(8, col("media_id")))
      .collect().sortBy(_.media_id).map(_.n_bytes).toSeq
    val base = Multimodal.extractFeatures(media)
      .collect().sortBy(_.media_id).map(_.n_bytes).toSeq
    assert(out == base)
  }
}
