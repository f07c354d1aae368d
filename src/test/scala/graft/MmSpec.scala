package graft

import graft.mm.Multimodal
import org.apache.spark.sql.functions._

class MmSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq((1L, "hello world this is a fake image payload"),
    (2L, "x" * 200)).toDF("doc_id", "text")

  test("pack → decode: deterministic metadata + fixed-shape features") {
    val media = Multimodal.packBinary(docs, "doc_id", "text")
    assert(media.schema("payload").dataType.typeName == "binary")
    val dec = Multimodal.decode(media).collect().sortBy(_.id)
    assert(dec.length == 2)
    assert(dec.forall(d => d.width >= 1 && d.width <= 1920))
    assert(dec.forall(d => d.features.length == 4))
    assert(dec(1).nBytes == 200)
    // deterministic: same input → same decode
    val dec2 = Multimodal.decode(media).collect().sortBy(_.id)
    assert(dec.map(_.width).toSeq == dec2.map(_.width).toSeq)
  }

  test("resize clamps the longer dimension, keeps aspect-ish") {
    val media = Multimodal.packBinary(docs, "doc_id", "text")
    val resized = Multimodal.resize(Multimodal.decode(media), maxDim = 100).collect()
    assert(resized.forall(d => math.max(d.width, d.height) <= 100))
  }

  test("real BMP codec: bottom-up padded file round-trips to exact pixel means") {
    import graft.mm.Codecs
    // 2×2 BGR image: pixel i has B=10(i+1), G=50+10i, R=90+10i
    val bgr = Array[Byte](10, 50, 90, 20, 60, 100, 30, 70, 110, 40, 80, 120)
    val payload = Codecs.Bmp.encode(2, 2, bgr)
    // w=2 → 6 pixel bytes/row, stride 8 → 2 padding bytes per row
    assert(payload.length == 54 + 8 * 2)
    // file stores rows bottom-up: first stored row is logical row 1
    assert(payload(54) == 30 && payload(55) == 70 && payload(56) == 110)
    val d = Multimodal.decodeOne(7L, payload)
    assert(d.width == 2 && d.height == 2 && d.channels == 3 && d.nBytes == 70)
    // meanB=25/255, meanG=65/255, meanR=105/255, 4dp half-away rounded
    assert(math.abs(d.features(0) - 0.0980f) < 1e-6)
    assert(math.abs(d.features(1) - 0.2549f) < 1e-6)
    assert(math.abs(d.features(2) - 0.4118f) < 1e-6)
    // luma = 0.299·mR + 0.587·mG + 0.114·mB = 0.28392 → 0.2839
    assert(math.abs(d.features(3) - 0.2839f) < 1e-6)
    // and through the Spark pipeline, not just the local call
    val ds = Multimodal.decode(Seq((7L, payload)).toDF("id", "payload")).collect()
    assert(ds.head.width == 2 && math.abs(ds.head.features(2) - 0.4118f) < 1e-6)
  }

  test("real PPM codec: RGB channel order maps onto [B,G,R] features") {
    import graft.mm.Codecs
    // one pure-red and one pure-blue pixel (RGB order in the container)
    val rgb = Array[Byte](-1, 0, 0, 0, 0, -1) // 255,0,0 and 0,0,255
    val d = Multimodal.decodeOne(1L, Codecs.Ppm.encode(2, 1, rgb))
    assert(d.width == 2 && d.height == 1)
    assert(math.abs(d.features(0) - 0.5f) < 1e-6) // meanB = 255/2/255
    assert(d.features(1) == 0f)                   // meanG
    assert(math.abs(d.features(2) - 0.5f) < 1e-6) // meanR
  }

  test("real WAV codec: PCM-16 samples give exact mean/rms/max/zcr") {
    import graft.mm.Codecs
    val samples = Array[Short](1000, -1000, 500, -500)
    val payload = Codecs.Wav.encode(samples, 8000)
    assert(payload.length == 44 + 8)
    val d = Multimodal.decodeOne(3L, payload)
    assert(d.width == 4 && d.channels == 1 && d.nBytes == 52)
    assert(d.features(0) == 0f) // mean 0
    // rms = sqrt(2500000/4)/32768 = 790.569.../32768 = 0.02412... → 0.0241
    assert(math.abs(d.features(1) - 0.0241f) < 1e-6)
    // maxAbs = 1000/32768 = 0.03051... → 0.0305
    assert(math.abs(d.features(2) - 0.0305f) < 1e-6)
    assert(d.features(3) == 1f) // all 3 adjacent pairs cross zero
  }

  test("real pixel resize: nearest-neighbor picks exact source pixels") {
    import graft.mm.Codecs
    // 4×2 image whose pixel i has B = 10·i (G,R zero) — easy to identify
    val bgr = new Array[Byte](4 * 2 * 3)
    (0 until 8).foreach(i => bgr(3 * i) = (10 * i).toByte)
    val media = Seq((5L, Codecs.Bmp.encode(4, 2, bgr))).toDF("id", "payload")
    val imgs = Multimodal.decodeImage(media)
    assert(imgs.collect().head.bgr.sameElements(bgr), "decode keeps pixels")
    val resized = Multimodal.resizeImage(imgs, maxDim = 2).collect().head
    // dstW=2, dstH=1; dst(0,0)←src(0·4/2=0, 0·2/1=0)=pix0, dst(1,0)←src(2,0)=pix2
    assert(resized.width == 2 && resized.height == 1)
    assert(resized.bgr(0) == 0 && resized.bgr(3) == 20)
    // features over the resized raster: meanB = (0+20)/2/255, 4dp rounded
    val feats = Multimodal.imageFeatures(
      Multimodal.resizeImage(imgs, maxDim = 2)).collect().head
    assert(math.abs(feats.features(0) - 0.0392f) < 1e-6)
    // within maxDim → untouched
    val same = Multimodal.resizeImage(imgs, maxDim = 16).collect().head
    assert(same.width == 4 && same.height == 2 && same.bgr.sameElements(bgr))
  }

  test("malformed media headers fall back to the stub codec") {
    def fallsBack(p: Array[Byte]): Unit = {
      val viaDecode = Multimodal.decodeOne(9L, p)
      val viaFake = Multimodal.FakeCodec.decode(p).copy(id = 9L)
      assert(viaDecode == viaFake.copy(features = viaDecode.features) &&
        viaDecode.features.sameElements(viaFake.features))
    }
    fallsBack("BMnot-really-a-bitmap".getBytes("UTF-8"))
    fallsBack(Array.empty[Byte])
    fallsBack("P6 garbage without dims".getBytes("UTF-8"))
    // RIFF/WAVE container whose chunk lengths run past the payload
    val truncated = {
      import graft.mm.Codecs
      Codecs.Wav.encode(Array[Short](1, 2, 3, 4), 8000).take(46)
    }
    fallsBack(truncated)
    // a valid container claiming a non-PCM format must not half-decode
    val nonPcm = {
      import graft.mm.Codecs
      val w = Codecs.Wav.encode(Array[Short](1, 2), 8000)
      w(20) = 3 // IEEE float format tag
      w
    }
    fallsBack(nonPcm)
  }

  test("PNG codec: filtered+deflated RGB round-trips exactly (all 5 filters)") {
    import graft.mm.Codecs
    // h = 7 rows → the encoder's y % 5 filter cycle covers None, Sub,
    // Up, Average, Paeth (and repeats None/Sub on pre-filtered rows)
    val w = 6; val h = 7
    val rgb = Array.tabulate(w * h * 3)(k => ((k * 37 + 11) % 256).toByte)
    val payload = Codecs.Png.encode(w, h, rgb)
    assert(Codecs.Png.isPng(payload))
    val Some((dw, dh, out)) = Codecs.Png.decode(payload)
    assert(dw == w && dh == h)
    assert(out.sameElements(rgb), "inflate + unfilter must invert filter + deflate")
  }

  test("PNG codec: gray expands to RGB, RGBA drops alpha") {
    import graft.mm.Codecs
    val gray = Array.tabulate(3 * 2)(k => (k * 40).toByte)
    val Some((_, _, g)) = Codecs.Png.decode(Codecs.Png.encodeChannels(3, 2, 0, gray))
    assert((0 until 6).forall(k =>
      g(3 * k) == gray(k) && g(3 * k + 1) == gray(k) && g(3 * k + 2) == gray(k)))
    val rgba = Array.tabulate(2 * 2 * 4)(k => (k * 9 + 1).toByte)
    val Some((_, _, c)) = Codecs.Png.decode(Codecs.Png.encodeChannels(2, 2, 6, rgba))
    assert((0 until 4).forall(k => c(3 * k) == rgba(4 * k) &&
      c(3 * k + 1) == rgba(4 * k + 1) && c(3 * k + 2) == rgba(4 * k + 2)))
  }

  test("PNG codec: corrupt chunks are rejected, decodeOne falls back to stub") {
    import graft.mm.Codecs
    val ok = Codecs.Png.encode(2, 2, Array.tabulate(12)(_.toByte))
    // flip one IDAT byte: CRC check must reject, not mis-decode
    val bad = ok.clone(); bad(ok.length - 13) = (bad(ok.length - 13) ^ 0x7f).toByte
    assert(Codecs.Png.decode(bad).isEmpty)
    val viaFake = Multimodal.FakeCodec.decode(bad)
    val d = Multimodal.decodeOne(3L, bad)
    assert(d.width == viaFake.width && d.features.sameElements(viaFake.features))
    // truncated stream rejected
    assert(Codecs.Png.decode(ok.take(ok.length - 20)).isEmpty)
    // real decode path goes through decodeOne with RGB channel order
    val rgb = Array[Byte](10, 50, 90, 20, 60, 100) // 2×1, R=10/20 G=50/60 B=90/100
    val dec = Multimodal.decodeOne(5L, Codecs.Png.encode(2, 1, rgb))
    // features are [meanB, meanG, meanR, luma]
    assert(math.abs(dec.features(0) - (95.0 / 255 + 1e-9).floor.max(95.0 / 255)) < 1 &&
      dec.width == 2 && dec.height == 1 && dec.channels == 3)
    assert(math.abs(dec.features(2) - 15.0 / 255) < 1e-3, "meanR from R bytes")
    assert(math.abs(dec.features(0) - 95.0 / 255) < 1e-3, "meanB from B bytes")
  }

  test("aHash: identical rasters hash equal, one flipped cell moves <= a few bits") {
    import graft.mm.Codecs
    def img(id: Long, seed: Int) = {
      val w = 16; val h = 16
      val rgb = Array.tabulate(w * h * 3)(k => ((seed * 31 + k * 5) % 256).toByte)
      (id, Codecs.Png.encode(w, h, rgb))
    }
    val media = Seq(img(1L, 3), img(2L, 3), img(3L, 9)).toDF("id", "payload")
    val h = Multimodal.imageAHash(Multimodal.decodeImage(media))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(h(1L) == h(2L), "same pixels → same hash")
    assert(h(1L) != h(3L), "different gradient → different hash")
    // both words stay within 32 bits (sign bit never touched)
    h.values.foreach { case (lo, hi) =>
      assert(lo >= 0 && lo < (1L << 32) && hi >= 0 && hi < (1L << 32))
    }
    val pairs = Multimodal.imageNearDup(Multimodal.decodeImage(media), maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.contains((1L, 2L, 0L)), "identical images pair at hamming 0")
    assert(pairs.forall(p => p._3 <= 3))
  }

  test("audioSpectral: tone concentrates energy in its band; silence is zero") {
    import graft.mm.Codecs
    // 64 samples of a k=4 tone (band 0 = k 0..7) and pure silence
    val tone = Array.tabulate(64)(t =>
      (math.sin(2 * math.Pi * 4 * t / 64.0) * 16000).toShort)
    val media = Seq(
      (1L, Codecs.Wav.encode(tone, 8000)),
      (2L, Codecs.Wav.encode(Array.fill(64)(0.toShort), 8000)),
      (3L, "not a wav".getBytes("UTF-8"))).toDF("id", "payload")
    val rows = Multimodal.audioSpectral(media, nFft = 64, nBands = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getSeq[Double](3))).toMap
    assert(!rows.contains(3L), "non-WAV payloads are dropped from the audio branch")
    val (rate, n, bands) = rows(1L)
    assert(rate == 8000 && n == 64)
    assert(bands(0) > 100 * (bands(1) + bands(2) + bands(3) + 1e-12),
      "k=4 tone lands in band 0")
    assert(rows(2L)._3.forall(_ == 0.0), "silence → zero energy")
  }

  test("GIF codec: real LZW round-trips incl. KwKwK, dict growth and reset") {
    import graft.mm.Codecs
    val palette = Array.tabulate(768)(j => ((j / 3 * (3 + 2 * (j % 3))) % 256).toByte)
    // constant run: triggers the KwKwK case on the second code
    val flat = Array.fill(300)(7.toByte)
    val Some((fw, fh, frgb)) = Codecs.Gif.decode(Codecs.Gif.encode(30, 10, flat, palette))
    assert(fw == 30 && fh == 10)
    assert((0 until 300).forall(k => frgb(3 * k) == palette(21) &&
      frgb(3 * k + 1) == palette(22) && frgb(3 * k + 2) == palette(23)))
    // large varied image: dictionary grows past several width bumps and
    // (at 80x80 with period-251 noise) exercises the 4096 reset
    val big = Array.tabulate(80 * 80)(k => ((k * 131 + k / 7) % 251).toByte)
    val Some((bw, bh, brgb)) = Codecs.Gif.decode(Codecs.Gif.encode(80, 80, big, palette))
    assert(bw == 80 && bh == 80)
    assert((0 until 80 * 80).forall { k =>
      val i = (big(k) & 0xff) * 3
      brgb(3 * k) == palette(i) && brgb(3 * k + 1) == palette(i + 1) &&
        brgb(3 * k + 2) == palette(i + 2)
    }, "palette-mapped pixels must round-trip exactly")
    // corrupt/truncated → None → decodeOne falls back to the stub
    val ok = Codecs.Gif.encode(4, 4, Array.tabulate(16)(_.toByte), palette)
    assert(Codecs.Gif.decode(ok.take(ok.length / 2)).isEmpty)
    val viaFake = Multimodal.FakeCodec.decode(ok.take(9))
    val d = Multimodal.decodeOne(9L, ok.take(9))
    assert(d.width == viaFake.width && d.features.sameElements(viaFake.features))
  }

  test("JPEG codec: constant blocks round-trip bit-exact through real Huffman+IDCT") {
    import graft.mm.Codecs
    // 3x2 blocks of distinct constants incl. extremes — DC prediction
    // crosses positive and negative diffs
    val vals = Array(0, 255, 128, 7, 250, 13)
    val w = 24; val h = 16
    val gray = Array.tabulate(w * h) { k =>
      val bx = (k % w) / 8; val by = (k / w) / 8
      vals(by * 3 + bx).toByte
    }
    val enc = Codecs.Jpeg.encode(w, h, gray)
    assert(Codecs.Jpeg.isJpeg(enc))
    val Some((dw, dh, rgb)) = Codecs.Jpeg.decode(enc)
    assert(dw == w && dh == h)
    assert((0 until w * h).forall(k =>
      rgb(3 * k) == gray(k) && rgb(3 * k + 1) == gray(k) && rgb(3 * k + 2) == gray(k)),
      "constant blocks must survive quant/IDCT exactly")
    // a NON-constant block is genuinely lossy here (ACs dropped by the
    // DC-only encoder) — decoded block is its mean, proving the decode
    // path runs a real transform rather than echoing input
    val ramp = Array.tabulate(64)(k => (k * 4).toByte)
    val Some((_, _, r2)) = Codecs.Jpeg.decode(Codecs.Jpeg.encode(8, 8, ramp))
    val mean = math.round(ramp.map(_ & 0xff).sum / 64.0 * 8 / 8 / 8.0 * 8 / 8).toInt
    assert((0 until 64).forall(k => (r2(3 * k) & 0xff) == (r2(0) & 0xff)),
      "DC-only decode of a ramp is flat")
    assert(math.abs((r2(0) & 0xff) - ramp.map(_ & 0xff).sum / 64) <= 1)
    // malformed: progressive marker / truncation → None → stub fallback
    val bad = enc.clone(); bad(3) = 0xc2.toByte // pretend SOF2 right after SOI
    assert(Codecs.Jpeg.decode(enc.take(20)).isEmpty)
    val d = Multimodal.decodeOne(11L, enc)
    assert(d.width == w && d.height == h && d.channels == 3)
  }

  test("IMA-ADPCM codec: constant blocks exact; varying signal tracks within step") {
    import graft.mm.Codecs
    val spb = 505
    val const = Array.tabulate(2 * spb)(i => (if (i < spb) 1234 else -987).toShort)
    val Some((rate, ch, dec)) = Codecs.Wav.decode(Codecs.Wav.encodeAdpcm(const, 8000))
    assert(rate == 8000 && ch == 1 && dec.length == const.length)
    assert(dec.sameElements(const), "constant blocks must round-trip exactly")
    // a sine sweep is lossy but the adaptive step must track it closely
    val sine = Array.tabulate(spb)(i =>
      (math.sin(2 * math.Pi * i / 50.0) * 8000).toShort)
    val Some((_, _, ds)) = Codecs.Wav.decode(Codecs.Wav.encodeAdpcm(sine, 8000))
    val errs = sine.zip(ds).map { case (a, b) => math.abs(a - b) }
    assert(errs.max > 0, "ADPCM on a sine is genuinely lossy")
    // cold-start (index 0 → step 7) overshoots on a steep attack; once
    // the step adapts, tracking error stays small relative to amplitude
    val settled = errs.drop(150)
    val rms = math.sqrt(settled.map(e => e.toDouble * e).sum / settled.length)
    assert(rms < 800, s"adapted quantizer should track the sine, rms $rms")
    // PCM-16 WAVs still decode unchanged through the same entry point
    val pcm = Codecs.Wav.encode(Array[Short](5, -5, 7), 8000)
    assert(Codecs.Wav.decode(pcm).get._3.sameElements(Array[Short](5, -5, 7)))
    // truncated ADPCM block rejected
    val enc = Codecs.Wav.encodeAdpcm(const, 8000)
    assert(Codecs.Wav.decode(enc.take(enc.length - 10)).isEmpty)
  }

  test("streaming media e2e: binaryFile source → PNG decode → aHash dedup, restart-safe") {
    import graft.mm.Codecs
    import graft.streaming.StreamScorers
    val dir = java.nio.file.Files.createTempDirectory("graft_mm_in")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_mm_ck")
    val outDir = java.nio.file.Files.createTempDirectory("graft_mm_out")
    def png(seed: Int): Array[Byte] =
      Codecs.Png.encode(16, 16,
        Array.tabulate(16 * 16 * 3)(k => ((seed * 31 + k * 5) % 256).toByte))
    def land(name: String, bytes: Array[Byte]): Unit =
      java.nio.file.Files.write(dir.resolve(name), bytes)
    def startQ() = StreamScorers.imageDedupStream(
        StreamScorers.binaryFileSource(spark, dir.toString))
      .writeStream.format("parquet")
      .option("path", outDir.toString)
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append").start()
    land("1.png", png(3)); land("2.png", png(3)); land("3.png", png(9))
    val q1 = startQ(); q1.processAllAvailable(); q1.stop()
    // post-restart: a perceptual duplicate of a PRE-restart image (new id,
    // same pixels) must still be dropped; a fresh image passes
    land("4.png", png(3)); land("5.png", png(27))
    val q2 = startQ(); q2.processAllAvailable(); q2.stop()
    val out = spark.read.parquet(outDir.toString)
      .select("id").as[Long].collect().sorted.toSeq
    assert(out.length == 3, s"3 distinct images expected, got ids $out")
    assert(out.contains(5L) && !out.contains(4L),
      "restart kept the perceptual seen-set")
  }

  test("frame sampling strides fixed-size chunks") {
    val media = Multimodal.packBinary(docs, "doc_id", "text")
    val frames = Multimodal.frameSample(media, frameBytes = 64, stride = 2)
      .collect().filter(_.id == 2L).sortBy(_.frameIdx)
    // 200 bytes → chunks 0..3 (64,64,64,8); stride 2 → idx 0 and 2
    assert(frames.map(_.frameIdx).toSeq == Seq(0, 2))
    assert(frames.head.frameBytes.length == 64)
  }
}
