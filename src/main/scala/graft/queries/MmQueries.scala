package graft.queries

import graft.core._
import graft.mm.{Codecs, Multimodal}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal queries: binary pack → decode → features, and frame
  * sampling. Since round 7 the decode stage runs a REAL pure-JVM codec
  * for uncompressed containers (24-bit BMP / P6 PPM / PCM-16 WAV —
  * [[graft.mm.Codecs]]); the driver queries synthesize deterministic
  * BMP/WAV payloads from the documents table (gradient pixels / sample
  * ramps keyed by doc_id), so header parsing, row padding, bottom-up row
  * order and channel order are all exercised on real bytes AND exactly
  * SQL-replayable. Compressed formats still route to the documented
  * FakeCodec stub. */
object MmQueries {

  /** Deterministic 24-bit BMP per document: w = n_chars%16+1,
    * h = doc_id%8+1, logical pixel byte k (top-down BGR raster order)
    * = (doc_id*7 + k) % 256. The encoder lays the file out bottom-up
    * with 4-byte row padding; the decoder must undo exactly that to
    * reproduce the oracle's padding-free channel means. */
  private def bmpMedia(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "documents")
      .select(col("doc_id").cast("long").as("id"), col("n_chars").cast("int").as("nc"))
      .as[(Long, Int)]
      .map { case (id, nc) =>
        val w = (nc % 16) + 1
        val h = (id % 8).toInt + 1
        val pix = Array.tabulate(w * h * 3)(k => ((id * 7 + k) % 256).toByte)
        (id, Codecs.Bmp.encode(w, h, pix))
      }.toDF("id", "payload")
  }

  /** Deterministic P6 PPM per document: w = n_chars%12+1, h = doc_id%6+2,
    * logical pixel byte k (top-down RGB raster order) =
    * (doc_id*13 + k*5) % 256. */
  private def ppmMedia(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "documents")
      .select(col("doc_id").cast("long").as("id"), col("n_chars").cast("int").as("nc"))
      .as[(Long, Int)]
      .map { case (id, nc) =>
        val w = (nc % 12) + 1
        val h = (id % 6).toInt + 2
        val pix = Array.tabulate(w * h * 3)(k => ((id * 13 + k * 5) % 256).toByte)
        (id, Codecs.Ppm.encode(w, h, pix))
      }.toDF("id", "payload")
  }

  /** Deterministic 8-bit RGB PNG per document: w = n_chars%14+1,
    * h = doc_id%7+2, logical pixel byte k (top-down RGB raster order)
    * = (doc_id*11 + k*3) % 256. The encoder deflates the scanlines and
    * cycles the row filter as y % 5, so the decode replays real zlib
    * inflation plus every PNG unfilter branch; a bug in any of the five
    * breaks the oracle's padding-free channel means. (nBytes is NOT part
    * of the PNG query outputs: the deflated payload length is stable but
    * not SQL-computable.) */
  private def pngMedia(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "documents")
      .select(col("doc_id").cast("long").as("id"), col("n_chars").cast("int").as("nc"))
      .as[(Long, Int)]
      .map { case (id, nc) =>
        val w = (nc % 14) + 1
        val h = (id % 7).toInt + 2
        val pix = Array.tabulate(w * h * 3)(k => ((id * 11 + k * 3) % 256).toByte)
        (id, Codecs.Png.encode(w, h, pix))
      }.toDF("id", "payload")
  }

  /** PNG fixture engineered for perceptual-hash dedup: pixel content
    * depends on doc_id only through doc_id % 23, so documents agreeing on
    * (doc_id%23, doc_id%4, n_chars%6) carry IDENTICAL images (hamming 0
    * clusters for [[q258]]) while the rest scatter. w = n_chars%6+8 and
    * h = doc_id%4+8 keep both dims ≥ the 8×8 aHash grid. Pixel byte k =
    * ((doc_id%23)*31 + k*5) % 256. */
  private[queries] def ahashMedia(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "documents")
      .select(col("doc_id").cast("long").as("id"), col("n_chars").cast("int").as("nc"))
      .as[(Long, Int)]
      .map { case (id, nc) =>
        val w = (nc % 6) + 8
        val h = (id % 4).toInt + 8
        val pix = Array.tabulate(w * h * 3)(k => (((id % 23) * 31 + k * 5) % 256).toByte)
        (id, Codecs.Png.encode(w, h, pix))
      }.toDF("id", "payload")
  }

  /** Deterministic GIF87a per document: w = n_chars%10+2, h = doc_id%5+2,
    * palette entry i = ((i*3)%256, (i*5)%256, (i*7)%256), pixel index at
    * raster position k = (doc_id*13 + k*11) % 256. The encoder is a real
    * LZW compressor, so decode exercises variable-width code reads,
    * dictionary growth and the KwKwK case on real bytes. */
  private def gifMedia(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val palette = Array.tabulate(768) { j =>
      val i = j / 3
      (j % 3 match {
        case 0 => (i * 3) % 256
        case 1 => (i * 5) % 256
        case 2 => (i * 7) % 256
      }).toByte
    }
    table(s, dir, "documents")
      .select(col("doc_id").cast("long").as("id"), col("n_chars").cast("int").as("nc"))
      .as[(Long, Int)]
      .map { case (id, nc) =>
        val w = (nc % 10) + 2
        val h = (id % 5).toInt + 2
        val idx = Array.tabulate(w * h)(k => ((id * 13 + k * 11) % 256).toByte)
        (id, Codecs.Gif.encode(w, h, idx, palette))
      }.toDF("id", "payload")
  }

  /** Deterministic baseline JPEG per document, built so decode is
    * BIT-EXACT: every 8×8 block is CONSTANT (value = (doc_id*17 +
    * blockIdx*29) % 256), so the DCT is DC-only and the flat Q=8 table
    * quantizes it without error — the stream still exercises real
    * Huffman coding, DC prediction, byte unstuffing, dequant and the
    * full IDCT. w = 8·(n_chars%3+1), h = 8·(doc_id%2+1). */
  private def jpegMedia(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "documents")
      .select(col("doc_id").cast("long").as("id"), col("n_chars").cast("int").as("nc"))
      .as[(Long, Int)]
      .map { case (id, nc) =>
        val w = 8 * ((nc % 3) + 1)
        val h = 8 * ((id % 2).toInt + 1)
        val bw = w / 8
        val gray = Array.tabulate(w * h) { k =>
          val bx = (k % w) / 8; val by = (k / w) / 8
          ((id * 17 + (by * bw + bx) * 29) % 256).toByte
        }
        (id, Codecs.Jpeg.encode(w, h, gray))
      }.toDF("id", "payload")
  }

  /** Deterministic IMA-ADPCM WAV per document, bit-exact by the same
    * device as JPEG's constant blocks: each 256-byte ADPCM block carries
    * a CONSTANT signal (value = (doc_id*37 + block*101) % 4096 − 2048),
    * and with the encoder's step state a zero delta encodes as nibble 0
    * whose decode adds step>>3 = 0 once the index floor is reached — the
    * header stores the exact predictor, so constant blocks survive the
    * real nibble/state-machine path exactly. nBlocks = doc_id%3+1,
    * 505 samples per block. */
  private def adpcmMedia(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "documents")
      .select(col("doc_id").cast("long").as("id"))
      .as[Long]
      .map { id =>
        val nBlocks = (id % 3).toInt + 1
        val spb = 505
        val samples = Array.tabulate(nBlocks * spb) { i =>
          (((id * 37 + (i / spb) * 101) % 4096) - 2048).toShort
        }
        (id, Codecs.Wav.encodeAdpcm(samples, 8000, blockAlign = 256))
      }.toDF("id", "payload")
  }

  /** Deterministic mono PCM-16 WAV per document: n = n_chars%200+50
    * samples, sample i = (doc_id*31 + i*17) % 4096 − 2048, 8 kHz. */
  private def wavMedia(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "documents")
      .select(col("doc_id").cast("long").as("id"), col("n_chars").cast("int").as("nc"))
      .as[(Long, Int)]
      .map { case (id, nc) =>
        val n = (nc % 200) + 50
        val samples = Array.tabulate(n)(i => (((id * 31 + i * 17) % 4096) - 2048).toShort)
        (id, Codecs.Wav.encode(samples, 8000))
      }.toDF("id", "payload")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // real BMP decode: dims from the parsed header, features = exact
    // integer channel sums over the de-padded logical pixel array
    "q62_mm_decode" -> ((s, dir) => {
      val dec = Multimodal.decode(bmpMedia(s, dir)).toDF()
      canon(dec.select(col("id"), col("width"), col("height"), col("channels"),
        col("nBytes"),
        element_at(col("features"), 1).cast("double").as("f0"),
        element_at(col("features"), 2).cast("double").as("f1"),
        element_at(col("features"), 3).cast("double").as("f2"),
        element_at(col("features"), 4).cast("double").as("f3")))
    }),
    // frame sampling over the same real binary payloads (length = BMP
    // header + padded rows, so the chunk math sees real file sizes)
    "q63_mm_frames" -> ((s, dir) =>
      Multimodal.frameSample(bmpMedia(s, dir), frameBytes = 64, stride = 2).toDF()
        .select(col("id"), col("frameIdx"), length(col("frameBytes")).as("frameLen"))),
    // real PPM decode: ASCII header parse + RGB→BGR normalization; a
    // different gradient from q62 so a channel-order bug cannot cancel
    "q147_mm_ppm" -> ((s, dir) => {
      val dec = Multimodal.decode(ppmMedia(s, dir)).toDF()
      canon(dec.select(col("id"), col("width"), col("height"), col("channels"),
        col("nBytes"),
        element_at(col("features"), 1).cast("double").as("f0"),
        element_at(col("features"), 2).cast("double").as("f1"),
        element_at(col("features"), 3).cast("double").as("f2"),
        element_at(col("features"), 4).cast("double").as("f3")))
    }),
    // real nearest-neighbor pixel resize (decode → resample → features):
    // all-integer source-index math, so the resampled channel means
    // replay exactly in SQL
    "q148_mm_resize" -> ((s, dir) => {
      val imgs = Multimodal.decodeImage(bmpMedia(s, dir))
      val resized = Multimodal.resizeImage(imgs, maxDim = 5)
      canon(Multimodal.imageFeatures(resized).toDF()
        .select(col("id"), col("width"), col("height"),
          element_at(col("features"), 1).cast("double").as("f0"),
          element_at(col("features"), 2).cast("double").as("f1"),
          element_at(col("features"), 3).cast("double").as("f2"),
          element_at(col("features"), 4).cast("double").as("f3")))
    }),
    // real PNG decode (first compressed codec): inflate + unfilter all
    // five row-filter types, then the same exact-integer channel means
    "q251_mm_png" -> ((s, dir) => {
      val dec = Multimodal.decode(pngMedia(s, dir)).toDF()
      canon(dec.select(col("id"), col("width"), col("height"), col("channels"),
        element_at(col("features"), 1).cast("double").as("f0"),
        element_at(col("features"), 2).cast("double").as("f1"),
        element_at(col("features"), 3).cast("double").as("f2"),
        element_at(col("features"), 4).cast("double").as("f3")))
    }),
    // full chain over real PNG bytes: decode (inflate+unfilter) →
    // nearest-neighbor resize → features, the r7 north-star ask
    "q252_mm_png_resize" -> ((s, dir) => {
      val imgs = Multimodal.decodeImage(pngMedia(s, dir))
      val resized = Multimodal.resizeImage(imgs, maxDim = 5)
      canon(Multimodal.imageFeatures(resized).toDF()
        .select(col("id"), col("width"), col("height"),
          element_at(col("features"), 1).cast("double").as("f0"),
          element_at(col("features"), 2).cast("double").as("f1"),
          element_at(col("features"), 3).cast("double").as("f2"),
          element_at(col("features"), 4).cast("double").as("f3")))
    }),
    // 8×8 average-hash over decoded PNG rasters — every step integer-
    // exact (resample index math, B+G+R gray, 64·g > Σg threshold)
    "q257_mm_ahash" -> ((s, dir) =>
      Multimodal.imageAHash(Multimodal.decodeImage(ahashMedia(s, dir)))),
    // perceptual near-dup pairs: 4×16-bit band candidates (pigeonhole-
    // exact for hamming ≤ 3) + exact popcount filter
    "q258_mm_image_neardup" -> ((s, dir) =>
      Multimodal.imageNearDup(Multimodal.decodeImage(ahashMedia(s, dir)),
        maxDist = 3)),
    // DFT band energies over real WAV payloads: zero-padded 64-point
    // naive DFT per row, positive half-spectrum power in 4 bands
    "q259_mm_audio_spectral" -> ((s, dir) => {
      val sp = Multimodal.audioSpectral(wavMedia(s, dir), nFft = 64, nBands = 4)
      canon(sp.select(col("id"), col("sample_rate"), col("n_samples"),
        element_at(col("band_energy"), 1).as("e0"),
        element_at(col("band_energy"), 2).as("e1"),
        element_at(col("band_energy"), 3).as("e2"),
        element_at(col("band_energy"), 4).as("e3")))
    }),
    // MFCC over real WAV payloads: 64-pt power spectrum → 8-filter mel
    // bank → log → DCT-II, first 4 coefficients; the filterbank weights
    // are embedded in the oracle as literals (model data, like ESD's λ)
    "q310_mm_mfcc" -> ((s, dir) => {
      val mf = Multimodal.audioMfcc(wavMedia(s, dir), nFft = 64,
        nMels = 8, nCoef = 4)
      canon(mf.select(col("id"), col("sample_rate"), col("n_samples"),
        element_at(col("mfcc"), 1).as("c0"),
        element_at(col("mfcc"), 2).as("c1"),
        element_at(col("mfcc"), 3).as("c2"),
        element_at(col("mfcc"), 4).as("c3")))
    }),
    // real GIF decode (second compressed codec): LZW inflate + palette
    // mapping; channel means replay from the index/palette formulas
    "q272_mm_gif" -> ((s, dir) => {
      val dec = Multimodal.decode(gifMedia(s, dir)).toDF()
      canon(dec.select(col("id"), col("width"), col("height"), col("channels"),
        element_at(col("features"), 1).cast("double").as("f0"),
        element_at(col("features"), 2).cast("double").as("f1"),
        element_at(col("features"), 3).cast("double").as("f2"),
        element_at(col("features"), 4).cast("double").as("f3")))
    }),
    // real baseline JPEG decode (third compressed codec): Huffman + DC
    // prediction + dequant + IDCT; constant blocks make it bit-exact
    "q273_mm_jpeg" -> ((s, dir) => {
      val dec = Multimodal.decode(jpegMedia(s, dir)).toDF()
      canon(dec.select(col("id"), col("width"), col("height"), col("channels"),
        element_at(col("features"), 1).cast("double").as("f0"),
        element_at(col("features"), 2).cast("double").as("f1"),
        element_at(col("features"), 3).cast("double").as("f2"),
        element_at(col("features"), 4).cast("double").as("f3")))
    }),
    // MJPEG scene detection: concatenated constant-block JPEG frames →
    // SOI split → per-frame real decode → luma-jump cuts
    "q275_mm_mjpeg_scenes" -> ((s, dir) => {
      import s.implicits._
      val media = table(s, dir, "documents")
        .select(col("doc_id").cast("long").as("id"), col("n_chars").cast("int").as("nc"))
        .as[(Long, Int)]
        .map { case (id, nc) =>
          val w = 8 * ((nc % 2) + 1); val h = 8
          val nFrames = (id % 4).toInt + 2
          val out = new java.io.ByteArrayOutputStream()
          (0 until nFrames).foreach { f =>
            val v = ((id * 23 + f * 61) % 256).toByte
            out.write(Codecs.Jpeg.encode(w, h, Array.fill(w * h)(v)))
          }
          (id, out.toByteArray)
        }.toDF("id", "payload")
      canon(Multimodal.sceneCuts(Multimodal.mjpegFrames(media), threshold = 0.15)
        .select(col("id"), col("frameIdx"), col("width"), col("height"),
          col("luma"), col("lumaDelta"), col("isCut")))
    }),
    // short-time spectrogram: hopped DFT frames over real WAV payloads
    "q276_mm_spectrogram" -> ((s, dir) => {
      val sp = Multimodal.audioSpectrogram(wavMedia(s, dir), nFft = 64,
        hop = 32, nBands = 4)
      canon(sp.select(col("id"), col("frameIdx"),
        element_at(col("band_energy"), 1).as("e0"),
        element_at(col("band_energy"), 2).as("e1"),
        element_at(col("band_energy"), 3).as("e2"),
        element_at(col("band_energy"), 4).as("e3")))
    }),
    // 8-bin gray histogram + Shannon entropy over decoded PNG rasters
    "q277_mm_image_entropy" -> ((s, dir) =>
      canon(Multimodal.imageEntropy(
        Multimodal.decodeImage(ahashMedia(s, dir))))),
    // real IMA-ADPCM decode (compressed AUDIO): nibble state machine +
    // block headers, transparently surfaced as PCM samples
    "q274_mm_adpcm" -> ((s, dir) => {
      val dec = Multimodal.decode(adpcmMedia(s, dir)).toDF()
      canon(dec.select(col("id"), col("width").as("n_samples"), col("channels"),
        element_at(col("features"), 1).cast("double").as("f0"),
        element_at(col("features"), 2).cast("double").as("f1"),
        element_at(col("features"), 3).cast("double").as("f2"),
        element_at(col("features"), 4).cast("double").as("f3")))
    }),
    // real WAV decode: PCM-16 chunk walk, features = mean/rms/maxAbs/
    // zero-cross-rate from exact integer sums
    "q146_mm_wav" -> ((s, dir) => {
      val dec = Multimodal.decode(wavMedia(s, dir)).toDF()
      canon(dec.select(col("id"), col("width").as("n_samples"), col("channels"),
        col("nBytes"),
        element_at(col("features"), 1).cast("double").as("f0"),
        element_at(col("features"), 2).cast("double").as("f1"),
        element_at(col("features"), 3).cast("double").as("f2"),
        element_at(col("features"), 4).cast("double").as("f3")))
    }),
  )

  /** Shared aHash replay (q257/q258): the [[ahashMedia]] gradient pushed
    * through 8×8 nearest-neighbor resample, B+G+R gray, 64·g > Σg bits
    * packed into two 32-bit words. `tail` continues after the `a` CTE. */
  private[queries] def ahashOracle(tail: String, recursive: Boolean = false): String = {
    // src pixel base byte for grid cell i: (((i//8)*h)//8*w + ((i%8)*w)//8)*3
    val base = "((((i//8)*h//8)*w + (i%8)*w//8)*3)"
    def v(off: String) = s"((id % 23) * 31 + ($base + $off) * 5) % 256"
    val gray = s"${v("0")} + ${v("1")} + ${v("2")}"
    s"""WITH ${if (recursive) "RECURSIVE " else ""}d AS (SELECT doc_id AS id, (n_chars % 6) + 8 AS w,
       |  (doc_id % 4) + 8 AS h FROM documents),
       |g AS (SELECT id, list_transform(range(64), i -> $gray) AS gs FROM d),
       |t AS (SELECT id, gs, list_sum(gs) AS tot FROM g),
       |a AS (SELECT id,
       |  list_sum(list_transform(range(32), i ->
       |    CASE WHEN 64*gs[i+1] > tot THEN (1::BIGINT << i) ELSE 0 END))::BIGINT AS ahash_lo,
       |  list_sum(list_transform(range(32), i ->
       |    CASE WHEN 64*gs[i+33] > tot THEN (1::BIGINT << i) ELSE 0 END))::BIGINT AS ahash_hi
       | FROM t)
       |$tail""".stripMargin.replace("\n", " ")
  }

  val oracleSql: Map[String, String] = Map(
    // channel means over the logical (padding-free) pixel bytes; the
    // ::FLOAT::DOUBLE hop mirrors the Float32 feature storage exactly
    "q62_mm_decode" ->
      """WITH d AS (SELECT doc_id AS id, (n_chars % 16) + 1 AS w,
        |  (doc_id % 8) + 1 AS h FROM documents),
        |sums AS (SELECT id, w, h,
        |  list_sum(list_transform(range(w*h), i -> (id*7 + 3*i) % 256)) AS sB,
        |  list_sum(list_transform(range(w*h), i -> (id*7 + 3*i + 1) % 256)) AS sG,
        |  list_sum(list_transform(range(w*h), i -> (id*7 + 3*i + 2) % 256)) AS sR
        | FROM d),
        |m AS (SELECT id, w, h,
        |  sB::DOUBLE / (w*h) / 255.0 AS mB,
        |  sG::DOUBLE / (w*h) / 255.0 AS mG,
        |  sR::DOUBLE / (w*h) / 255.0 AS mR
        | FROM sums)
        |SELECT id, w::INT AS width, h::INT AS height, 3 AS channels,
        | (54 + ((3*w + 3) // 4 * 4) * h)::BIGINT AS nBytes,
        | round((round(mB, 4)::FLOAT)::DOUBLE, 4) AS f0,
        | round((round(mG, 4)::FLOAT)::DOUBLE, 4) AS f1,
        | round((round(mR, 4)::FLOAT)::DOUBLE, 4) AS f2,
        | round((round(0.299*mR + 0.587*mG + 0.114*mB, 4)::FLOAT)::DOUBLE, 4) AS f3
        |FROM m""".stripMargin.replace("\n", " "),
    // payload length = 54-byte header + stride(w)*h padded pixel rows
    "q63_mm_frames" ->
      """WITH d AS (SELECT doc_id AS id,
        |  54 + ((3*((n_chars % 16) + 1) + 3) // 4 * 4) * ((doc_id % 8) + 1) AS nb
        | FROM documents),
        |f AS (SELECT id, nb, unnest(range(0, ceil(nb/64.0)::INT)) AS frameIdx FROM d)
        |SELECT id, frameIdx::INT AS frameIdx,
        | least(64, nb - frameIdx*64)::INT AS frameLen
        |FROM f WHERE frameIdx % 2 = 0""".stripMargin.replace("\n", " "),
    // PPM: RGB container order — R at logical byte 3i, B at 3i+2; header
    // is ASCII so nBytes depends on the dim digit widths
    "q147_mm_ppm" ->
      """WITH d AS (SELECT doc_id AS id, (n_chars % 12) + 1 AS w,
        |  (doc_id % 6) + 2 AS h FROM documents),
        |m AS (SELECT id, w, h,
        |  list_sum(list_transform(range(w*h), i -> (id*13 + 5*(3*i+2)) % 256))::DOUBLE / (w*h) / 255.0 AS mB,
        |  list_sum(list_transform(range(w*h), i -> (id*13 + 5*(3*i+1)) % 256))::DOUBLE / (w*h) / 255.0 AS mG,
        |  list_sum(list_transform(range(w*h), i -> (id*13 + 5*(3*i)) % 256))::DOUBLE / (w*h) / 255.0 AS mR
        | FROM d)
        |SELECT id, w::INT AS width, h::INT AS height, 3 AS channels,
        | (9 + strlen(w::VARCHAR) + strlen(h::VARCHAR) + 3*w*h)::BIGINT AS nBytes,
        | round((round(mB, 4)::FLOAT)::DOUBLE, 4) AS f0,
        | round((round(mG, 4)::FLOAT)::DOUBLE, 4) AS f1,
        | round((round(mR, 4)::FLOAT)::DOUBLE, 4) AS f2,
        | round((round(0.299*mR + 0.587*mG + 0.114*mB, 4)::FLOAT)::DOUBLE, 4) AS f3
        |FROM m""".stripMargin.replace("\n", " "),
    // nearest-neighbor resample: dst pixel (x,y) reads source
    // (x·w//dstW, y·h//dstH) of the q62 gradient — all-integer index math
    "q148_mm_resize" ->
      """WITH d AS (SELECT doc_id AS id, (n_chars % 16) + 1 AS w,
        |  (doc_id % 8) + 1 AS h FROM documents),
        |r AS (SELECT id, w, h,
        |  CASE WHEN greatest(w,h) <= 5 THEN w
        |    ELSE greatest(1, w*5 // greatest(w,h)) END AS dw,
        |  CASE WHEN greatest(w,h) <= 5 THEN h
        |    ELSE greatest(1, h*5 // greatest(w,h)) END AS dh
        | FROM d),
        |px AS (SELECT id, dw, dh,
        |  list_transform(range(dw*dh), i ->
        |    ((i % dw) * w // dw + (i // dw) * h // dh * w) * 3) AS base
        | FROM r),
        |m AS (SELECT id, dw, dh,
        |  list_sum(list_transform(base, b -> (id*7 + b) % 256))::DOUBLE / (dw*dh) / 255.0 AS mB,
        |  list_sum(list_transform(base, b -> (id*7 + b + 1) % 256))::DOUBLE / (dw*dh) / 255.0 AS mG,
        |  list_sum(list_transform(base, b -> (id*7 + b + 2) % 256))::DOUBLE / (dw*dh) / 255.0 AS mR
        | FROM px)
        |SELECT id, dw::INT AS width, dh::INT AS height,
        | round((round(mB, 4)::FLOAT)::DOUBLE, 4) AS f0,
        | round((round(mG, 4)::FLOAT)::DOUBLE, 4) AS f1,
        | round((round(mR, 4)::FLOAT)::DOUBLE, 4) AS f2,
        | round((round(0.299*mR + 0.587*mG + 0.114*mB, 4)::FLOAT)::DOUBLE, 4) AS f3
        |FROM m""".stripMargin.replace("\n", " "),
    // PNG: RGB container order like PPM — R at logical byte 3i, B at
    // 3i+2; the oracle never touches the deflated bytes, it replays the
    // pre-compression pixel construction (the decode must invert deflate
    // + per-row filtering exactly to reproduce these means)
    "q251_mm_png" ->
      """WITH d AS (SELECT doc_id AS id, (n_chars % 14) + 1 AS w,
        |  (doc_id % 7) + 2 AS h FROM documents),
        |m AS (SELECT id, w, h,
        |  list_sum(list_transform(range(w*h), i -> (id*11 + 3*(3*i+2)) % 256))::DOUBLE / (w*h) / 255.0 AS mB,
        |  list_sum(list_transform(range(w*h), i -> (id*11 + 3*(3*i+1)) % 256))::DOUBLE / (w*h) / 255.0 AS mG,
        |  list_sum(list_transform(range(w*h), i -> (id*11 + 3*(3*i)) % 256))::DOUBLE / (w*h) / 255.0 AS mR
        | FROM d)
        |SELECT id, w::INT AS width, h::INT AS height, 3 AS channels,
        | round((round(mB, 4)::FLOAT)::DOUBLE, 4) AS f0,
        | round((round(mG, 4)::FLOAT)::DOUBLE, 4) AS f1,
        | round((round(mR, 4)::FLOAT)::DOUBLE, 4) AS f2,
        | round((round(0.299*mR + 0.587*mG + 0.114*mB, 4)::FLOAT)::DOUBLE, 4) AS f3
        |FROM m""".stripMargin.replace("\n", " "),
    // decode → resize → features over the PNG gradient: dst pixel (x,y)
    // reads source (x·w//dw, y·h//dh); base = 3·srcPixelIndex, channel
    // bytes base(R)/base+1(G)/base+2(B) with value (id*11 + 3k) % 256
    "q252_mm_png_resize" ->
      """WITH d AS (SELECT doc_id AS id, (n_chars % 14) + 1 AS w,
        |  (doc_id % 7) + 2 AS h FROM documents),
        |r AS (SELECT id, w, h,
        |  CASE WHEN greatest(w,h) <= 5 THEN w
        |    ELSE greatest(1, w*5 // greatest(w,h)) END AS dw,
        |  CASE WHEN greatest(w,h) <= 5 THEN h
        |    ELSE greatest(1, h*5 // greatest(w,h)) END AS dh
        | FROM d),
        |px AS (SELECT id, dw, dh,
        |  list_transform(range(dw*dh), i ->
        |    ((i % dw) * w // dw + (i // dw) * h // dh * w) * 3) AS base
        | FROM r),
        |m AS (SELECT id, dw, dh,
        |  list_sum(list_transform(base, b -> (id*11 + 3*(b+2)) % 256))::DOUBLE / (dw*dh) / 255.0 AS mB,
        |  list_sum(list_transform(base, b -> (id*11 + 3*(b+1)) % 256))::DOUBLE / (dw*dh) / 255.0 AS mG,
        |  list_sum(list_transform(base, b -> (id*11 + 3*b) % 256))::DOUBLE / (dw*dh) / 255.0 AS mR
        | FROM px)
        |SELECT id, dw::INT AS width, dh::INT AS height,
        | round((round(mB, 4)::FLOAT)::DOUBLE, 4) AS f0,
        | round((round(mG, 4)::FLOAT)::DOUBLE, 4) AS f1,
        | round((round(mR, 4)::FLOAT)::DOUBLE, 4) AS f2,
        | round((round(0.299*mR + 0.587*mG + 0.114*mB, 4)::FLOAT)::DOUBLE, 4) AS f3
        |FROM m""".stripMargin.replace("\n", " "),
    // aHash: replay resample index math + gray sums + strict threshold;
    // the two 32-bit words keep every intermediate positive
    "q257_mm_ahash" -> ahashOracle(
      "SELECT id, ahash_lo, ahash_hi FROM a"),
    // near-dup pairs: band-bucket candidates + exact popcount, identical
    // to the operator's plan (pigeonhole-exact at maxDist 3)
    "q258_mm_image_neardup" -> ahashOracle(
      """, bands AS (SELECT id, ahash_lo, ahash_hi,
        |  unnest([ahash_lo & 65535, (ahash_lo >> 16) & 65535,
        |          ahash_hi & 65535, (ahash_hi >> 16) & 65535]) AS bucket,
        |  unnest([0, 1, 2, 3]) AS band FROM a),
        |cand AS (SELECT DISTINCT l.id AS a, r.id AS b
        | FROM bands l JOIN bands r ON l.band = r.band AND l.bucket = r.bucket
        | WHERE l.id < r.id),
        |p AS (SELECT c.a, c.b,
        |  (bit_count(xor(x.ahash_lo, y.ahash_lo)) +
        |   bit_count(xor(x.ahash_hi, y.ahash_hi)))::BIGINT AS hamming
        | FROM cand c JOIN a x ON x.id = c.a JOIN a y ON y.id = c.b)
        |SELECT a, b, hamming FROM p WHERE hamming <= 3"""
        .stripMargin.replace("\n", " ")),
    // 64-point DFT band energies: list replays keep t-ascending then
    // k-ascending accumulation — term-for-term the operator's loops
    "q259_mm_audio_spectral" ->
      """WITH d AS (SELECT doc_id AS id, (n_chars % 200) + 50 AS n FROM documents),
        |s AS (SELECT id, n, list_transform(range(64), i ->
        |  CASE WHEN i < n THEN ((id*31 + i*17) % 4096 - 2048) / 32768.0
        |   ELSE 0.0 END) AS v FROM d),
        |dk AS (SELECT id, n, list_transform(range(32), k -> {
        |  're': list_sum(list_transform(range(64), t -> v[t+1] * cos(-2*pi()*(k*t)/64))),
        |  'im': list_sum(list_transform(range(64), t -> v[t+1] * sin(-2*pi()*(k*t)/64)))
        | }) AS f FROM s),
        |e AS (SELECT id, n, list_transform(range(4), b ->
        |  list_sum(list_transform(range(8), j ->
        |    f[b*8+j+1].re * f[b*8+j+1].re + f[b*8+j+1].im * f[b*8+j+1].im))) AS be
        | FROM dk)
        |SELECT id, 8000 AS sample_rate, n::INT AS n_samples,
        | round(be[1], 4) AS e0, round(be[2], 4) AS e1,
        | round(be[3], 4) AS e2, round(be[4], 4) AS e3
        |FROM e""".stripMargin.replace("\n", " "),
    "q310_mm_mfcc" -> {
      val fb = graft.mm.Multimodal.melFilterbank(8000, 64, 8)
      val wLit = fb.map(_.mkString("[", ", ", "]"))
        .mkString("[", ", ", "]")
      s"""WITH d AS (SELECT doc_id AS id, (n_chars % 200) + 50 AS n
         |  FROM documents),
         |sm AS (SELECT id, n, list_transform(range(64), i ->
         |  CASE WHEN i < n THEN ((id*31 + i*17) % 4096 - 2048) / 32768.0
         |   ELSE 0.0 END) AS v FROM d),
         |f AS (SELECT id, n, list_transform(range(32), k -> {
         |  're': list_sum(list_transform(range(64), t ->
         |    v[t+1] * cos(-2*pi()*(k*t)/64))),
         |  'im': list_sum(list_transform(range(64), t ->
         |    v[t+1] * sin(-2*pi()*(k*t)/64)))
         | }) AS f FROM sm),
         |pw AS (SELECT id, n, list_transform(range(32), k ->
         |  f[k+1].re * f[k+1].re + f[k+1].im * f[k+1].im) AS p FROM f),
         |le AS (SELECT id, n, list_transform(range(8), m ->
         |  ln(list_sum(list_transform(range(32), k ->
         |    ($wLit)[m+1][k+1] * p[k+1])) + 1e-10)) AS e FROM pw),
         |mf AS (SELECT id, n, list_transform(range(4), j ->
         |  list_sum(list_transform(range(8), m ->
         |    e[m+1] * cos(pi()*j*(m+0.5)/8)))) AS c FROM le)
         |SELECT id, 8000 AS sample_rate, n::INT AS n_samples,
         | round(c[1], 4) AS c0, round(c[2], 4) AS c1,
         | round(c[3], 4) AS c2, round(c[4], 4) AS c3
         |FROM mf""".stripMargin.replace("\n", " ")
    },
    // the oracle never touches LZW bytes — it replays index formula →
    // palette mapping → channel means; the decode must invert the real
    // compression to reproduce them
    "q272_mm_gif" ->
      """WITH d AS (SELECT doc_id AS id, (n_chars % 10) + 2 AS w,
        |  (doc_id % 5) + 2 AS h FROM documents),
        |m AS (SELECT id, w, h,
        |  list_sum(list_transform(range(w*h), k -> (((id*13 + k*11) % 256) * 7) % 256))::DOUBLE / (w*h) / 255.0 AS mB,
        |  list_sum(list_transform(range(w*h), k -> (((id*13 + k*11) % 256) * 5) % 256))::DOUBLE / (w*h) / 255.0 AS mG,
        |  list_sum(list_transform(range(w*h), k -> (((id*13 + k*11) % 256) * 3) % 256))::DOUBLE / (w*h) / 255.0 AS mR
        | FROM d)
        |SELECT id, w::INT AS width, h::INT AS height, 3 AS channels,
        | round((round(mB, 4)::FLOAT)::DOUBLE, 4) AS f0,
        | round((round(mG, 4)::FLOAT)::DOUBLE, 4) AS f1,
        | round((round(mR, 4)::FLOAT)::DOUBLE, 4) AS f2,
        | round((round(0.299*mR + 0.587*mG + 0.114*mB, 4)::FLOAT)::DOUBLE, 4) AS f3
        |FROM m""".stripMargin.replace("\n", " "),
    // pixel replay of the constant-block construction (per-PIXEL sum so
    // the float path mirrors the decoder's channel-mean arithmetic);
    // the oracle never sees the Huffman/DCT bytes
    "q273_mm_jpeg" ->
      """WITH d AS (SELECT doc_id AS id, 8*((n_chars % 3)+1) AS w,
        |  8*((doc_id % 2)+1) AS h FROM documents),
        |m AS (SELECT id, w, h,
        |  list_sum(list_transform(range(w*h), k ->
        |   (id*17 + (((k // w) // 8) * (w // 8) + (k % w) // 8) * 29) % 256
        |  ))::DOUBLE / (w*h) / 255.0 AS mg
        | FROM d)
        |SELECT id, w::INT AS width, h::INT AS height, 3 AS channels,
        | round((round(mg, 4)::FLOAT)::DOUBLE, 4) AS f0,
        | round((round(mg, 4)::FLOAT)::DOUBLE, 4) AS f1,
        | round((round(mg, 4)::FLOAT)::DOUBLE, 4) AS f2,
        | round((round(0.299*mg + 0.587*mg + 0.114*mg, 4)::FLOAT)::DOUBLE, 4) AS f3
        |FROM m""".stripMargin.replace("\n", " "),
    // frame luma replay: constant frame value / 255 (exact doubles);
    // delta/cut arithmetic mirrors the window expressions
    "q275_mm_mjpeg_scenes" ->
      """WITH d AS (SELECT doc_id AS id, 8*((n_chars % 2)+1) AS w,
        |  (doc_id % 4) + 2 AS nf FROM documents),
        |f AS (SELECT id, w, unnest(range(nf)) AS frameIdx FROM d),
        |l AS (SELECT id, frameIdx, w, 8 AS h,
        |  ((id*23 + frameIdx*61) % 256) / 255.0 AS luma FROM f),
        |x AS (SELECT id, frameIdx, w, h, luma,
        |  lag(luma) OVER (PARTITION BY id ORDER BY frameIdx) AS prevLuma
        | FROM l)
        |SELECT id, frameIdx::INT AS frameIdx, w::INT AS width, h::INT AS height,
        | round(luma, 4) AS luma,
        | round(CASE WHEN prevLuma IS NULL THEN 0.0
        |   ELSE abs(luma - prevLuma) END, 4) AS lumaDelta,
        | (CASE WHEN prevLuma IS NULL THEN 0.0
        |   ELSE abs(luma - prevLuma) END) > 0.15 AS isCut
        |FROM x""".stripMargin.replace("\n", " "),
    // per-frame DFT replay at sample offset f*hop (full windows only,
    // so no padding branch); same term order as q259
    "q276_mm_spectrogram" ->
      """WITH d AS (SELECT doc_id AS id, (n_chars % 200) + 50 AS n FROM documents),
        |fr AS (SELECT id, n, unnest(range(
        |  CASE WHEN n < 64 THEN 0 ELSE (n - 64) // 32 + 1 END)) AS f FROM d),
        |s AS (SELECT id, f, list_transform(range(64), t ->
        |  ((id*31 + (f*32 + t)*17) % 4096 - 2048) / 32768.0) AS v FROM fr),
        |dk AS (SELECT id, f, list_transform(range(32), k -> {
        |  're': list_sum(list_transform(range(64), t -> v[t+1] * cos(-2*pi()*(k*t)/64))),
        |  'im': list_sum(list_transform(range(64), t -> v[t+1] * sin(-2*pi()*(k*t)/64)))
        | }) AS fq FROM s),
        |e AS (SELECT id, f, list_transform(range(4), b ->
        |  list_sum(list_transform(range(8), j ->
        |    fq[b*8+j+1].re * fq[b*8+j+1].re + fq[b*8+j+1].im * fq[b*8+j+1].im))) AS be
        | FROM dk)
        |SELECT id, f::INT AS frameIdx,
        | round(be[1], 4) AS e0, round(be[2], 4) AS e1,
        | round(be[3], 4) AS e2, round(be[4], 4) AS e3
        |FROM e""".stripMargin.replace("\n", " "),
    // gray = sum of the 3 channel bytes of the ahash gradient; bin
    // counts are exact integers, entropy is the ln-parity expression
    "q277_mm_image_entropy" -> {
      val gray = "(((id % 23) * 31 + (i*3) * 5) % 256) + " +
        "(((id % 23) * 31 + (i*3 + 1) * 5) % 256) + " +
        "(((id % 23) * 31 + (i*3 + 2) * 5) % 256)"
      s"""WITH d AS (SELECT doc_id AS id, (n_chars % 6) + 8 AS w,
         |  (doc_id % 4) + 8 AS h FROM documents),
         |g AS (SELECT id, w*h AS n, list_transform(range(w*h),
         |  i -> $gray) AS gs FROM d),
         |b AS (SELECT id, n, list_transform(range(8), bb ->
         |  len(list_filter(gs, x -> least(7, x // 96) = bb))) AS bins FROM g)
         |SELECT id, n::BIGINT AS n_px,
         | bins[1]::BIGINT AS b0, bins[2]::BIGINT AS b1, bins[3]::BIGINT AS b2,
         | bins[4]::BIGINT AS b3, bins[5]::BIGINT AS b4, bins[6]::BIGINT AS b5,
         | bins[7]::BIGINT AS b6, bins[8]::BIGINT AS b7,
         | round(-list_sum(list_transform(bins, c ->
         |   CASE WHEN c > 0 THEN (c::DOUBLE / n) * ln(c::DOUBLE / n)
         |    ELSE 0.0 END)), 4) AS entropy
         |FROM b""".stripMargin.replace("\n", " ")
    },
    // sample replay of the constant-block construction (the oracle never
    // sees the nibble stream); features mirror the q146 shapes
    "q274_mm_adpcm" ->
      """WITH d AS (SELECT doc_id AS id, ((doc_id % 3) + 1) * 505 AS n FROM documents),
        |s AS (SELECT id, n, list_transform(range(n), i ->
        |  (id*37 + (i // 505)*101) % 4096 - 2048) AS v FROM d)
        |SELECT id, n::INT AS n_samples, 1 AS channels,
        | round((round(list_sum(v)::DOUBLE / n / 32768.0, 4)::FLOAT)::DOUBLE, 4) + 0 AS f0,
        | round((round(sqrt(list_sum(list_transform(v, x -> x*x))::DOUBLE / n) / 32768.0, 4)::FLOAT)::DOUBLE, 4) AS f1,
        | round((round(list_max(list_transform(v, x -> abs(x)))::DOUBLE / 32768.0, 4)::FLOAT)::DOUBLE, 4) AS f2,
        | round((round(length(list_filter(range(n - 1), i -> v[i+1] * v[i+2] < 0))::DOUBLE / (n - 1), 4)::FLOAT)::DOUBLE, 4) AS f3
        |FROM s""".stripMargin.replace("\n", " "),
    "q146_mm_wav" ->
      """WITH d AS (SELECT doc_id AS id, (n_chars % 200) + 50 AS n FROM documents),
        |s AS (SELECT id, n,
        |  list_transform(range(n), i -> (id*31 + i*17) % 4096 - 2048) AS v FROM d)
        |SELECT id, n::INT AS n_samples, 1 AS channels, (44 + 2*n)::BIGINT AS nBytes,
        | round((round(list_sum(v)::DOUBLE / n / 32768.0, 4)::FLOAT)::DOUBLE, 4) + 0 AS f0,
        | round((round(sqrt(list_sum(list_transform(v, x -> x*x))::DOUBLE / n) / 32768.0, 4)::FLOAT)::DOUBLE, 4) AS f1,
        | round((round(list_max(list_transform(v, x -> abs(x)))::DOUBLE / 32768.0, 4)::FLOAT)::DOUBLE, 4) AS f2,
        | round((round(length(list_filter(range(n - 1), i -> v[i+1] * v[i+2] < 0))::DOUBLE / (n - 1), 4)::FLOAT)::DOUBLE, 4) AS f3
        |FROM s""".stripMargin.replace("\n", " "),
  )
}
