package graft.mm

import scala.util.Try

/** Pure-JVM media codecs — 24-bit BMP, binary PPM (P6), PCM-16 WAV, and
  * 8-bit PNG (the one COMPRESSED format the JDK can handle without
  * external libraries: zlib via `java.util.zip` + the five PNG row
  * filters). The decode stage in [[Multimodal]] therefore exercises real
  * header parsing, real inflate, real unfiltering and real pixel/sample
  * bytes even in a container without image/audio libs. Remaining
  * compressed formats (JPEG/MP3/...) route to the documented
  * [[Multimodal.FakeCodec]] stub.
  *
  * Encoders exist so fixtures and tests can synthesize payloads
  * deterministically; decoders return None on any structural violation
  * (caller falls back to the stub rather than failing the pipeline).
  */
object Codecs {

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def putLe16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
  }
  private def putLe32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
    b(off + 2) = ((v >> 16) & 0xff).toByte
    b(off + 3) = ((v >> 24) & 0xff).toByte
  }

  /** Windows BMP, BITMAPINFOHEADER, 24 bpp, uncompressed (BI_RGB). Pixel
    * rows are stored bottom-up (positive height) padded to 4 bytes; the
    * logical pixel array exchanged with callers is top-down row-major
    * BGR triples. */
  object Bmp {
    val HeaderLen = 54

    def stride(w: Int): Int = (3 * w + 3) / 4 * 4

    /** `bgr` is logical top-down row-major BGR, length w*h*3. */
    def encode(w: Int, h: Int, bgr: Array[Byte]): Array[Byte] = {
      require(bgr.length == w * h * 3, "pixel array must be w*h*3 BGR bytes")
      val st = stride(w)
      val out = new Array[Byte](HeaderLen + st.toLong.toInt * h)
      out(0) = 'B'; out(1) = 'M'
      putLe32(out, 2, out.length)
      putLe32(out, 10, HeaderLen)  // pixel data offset
      putLe32(out, 14, 40)         // BITMAPINFOHEADER size
      putLe32(out, 18, w)
      putLe32(out, 22, h)          // positive => bottom-up
      putLe16(out, 26, 1)          // planes
      putLe16(out, 28, 24)         // bpp
      putLe32(out, 30, 0)          // BI_RGB
      putLe32(out, 34, st * h)     // image size
      putLe32(out, 38, 2835); putLe32(out, 42, 2835) // 72 dpi
      var y = 0
      while (y < h) {
        val fileRow = h - 1 - y   // bottom-up
        System.arraycopy(bgr, y * w * 3, out, HeaderLen + fileRow * st, w * 3)
        y += 1
      }
      out
    }

    /** Returns (width, height, logical top-down BGR bytes). */
    def decode(p: Array[Byte]): Option[(Int, Int, Array[Byte])] = Try {
      require(p.length >= HeaderLen && p(0) == 'B' && p(1) == 'M')
      val dataOff = le32(p, 10)
      require(le32(p, 14) >= 40)   // at least BITMAPINFOHEADER
      val w = le32(p, 18)
      val hRaw = le32(p, 22)
      val topDown = hRaw < 0
      val h = math.abs(hRaw)
      require(w > 0 && h > 0 && w <= (1 << 16) && h <= (1 << 16))
      require(le16(p, 28) == 24, "only 24 bpp")
      require(le32(p, 30) == 0, "only BI_RGB (uncompressed)")
      val st = stride(w)
      require(p.length.toLong >= dataOff.toLong + st.toLong * h)
      val bgr = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        val fileRow = if (topDown) y else h - 1 - y
        System.arraycopy(p, dataOff + fileRow * st, bgr, y * w * 3, w * 3)
        y += 1
      }
      (w, h, bgr)
    }.toOption
  }

  /** Binary PPM (P6), maxval 255; logical pixel array is top-down
    * row-major RGB triples. Header comments (#) are honored on decode. */
  object Ppm {
    /** `rgb` is logical top-down row-major RGB, length w*h*3. */
    def encode(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
      require(rgb.length == w * h * 3, "pixel array must be w*h*3 RGB bytes")
      val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
      val out = new Array[Byte](header.length + rgb.length)
      System.arraycopy(header, 0, out, 0, header.length)
      System.arraycopy(rgb, 0, out, header.length, rgb.length)
      out
    }

    /** Returns (width, height, top-down RGB bytes). */
    def decode(p: Array[Byte]): Option[(Int, Int, Array[Byte])] = Try {
      require(p.length > 2 && p(0) == 'P' && p(1) == '6')
      var i = 2
      def skipWsAndComments(): Unit = {
        var go = true
        while (go) {
          while (i < p.length && (p(i) == ' ' || p(i) == '\n' || p(i) == '\r' || p(i) == '\t')) i += 1
          if (i < p.length && p(i) == '#') { while (i < p.length && p(i) != '\n') i += 1 }
          else go = false
        }
      }
      def int(): Int = {
        skipWsAndComments()
        var v = 0
        require(i < p.length && p(i) >= '0' && p(i) <= '9')
        while (i < p.length && p(i) >= '0' && p(i) <= '9') { v = v * 10 + (p(i) - '0'); i += 1 }
        v
      }
      val w = int(); val h = int(); val maxval = int()
      require(w > 0 && h > 0 && maxval == 255)
      i += 1 // single whitespace after maxval
      require(p.length >= i + w * h * 3)
      (w, h, java.util.Arrays.copyOfRange(p, i, i + w * h * 3))
    }.toOption
  }

  /** RIFF/WAVE, PCM (format 1), 16-bit samples, any channel count
    * (samples returned interleaved). */
  object Wav {
    /** Mono PCM-16 encode. */
    def encode(samples: Array[Short], sampleRate: Int): Array[Byte] = {
      val dataLen = samples.length * 2
      val out = new Array[Byte](44 + dataLen)
      "RIFF".getBytes("US-ASCII").copyToArray(out, 0)
      putLe32(out, 4, 36 + dataLen)
      "WAVE".getBytes("US-ASCII").copyToArray(out, 8)
      "fmt ".getBytes("US-ASCII").copyToArray(out, 12)
      putLe32(out, 16, 16)              // fmt chunk size
      putLe16(out, 20, 1)               // PCM
      putLe16(out, 22, 1)               // mono
      putLe32(out, 24, sampleRate)
      putLe32(out, 28, sampleRate * 2)  // byte rate
      putLe16(out, 32, 2)               // block align
      putLe16(out, 34, 16)              // bits per sample
      "data".getBytes("US-ASCII").copyToArray(out, 36)
      putLe32(out, 40, dataLen)
      var i = 0
      while (i < samples.length) { putLe16(out, 44 + 2 * i, samples(i) & 0xffff); i += 1 }
      out
    }

    // IMA/DVI ADPCM tables (public spec; also RFC 3551 §4.5.1 lineage)
    private val imaStep = Array(
      7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
      41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
      190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
      724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
      2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
      6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
      16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)
    private val imaIndexAdj = Array(-1, -1, -1, -1, 2, 4, 6, 8)

    /** One IMA step shared by encode and decode (bit-identical state). */
    private def imaDecodeNibble(nib: Int, pred0: Int, idx0: Int): (Int, Int) = {
      val step = imaStep(idx0)
      var diff = step >> 3
      if ((nib & 1) != 0) diff += step >> 2
      if ((nib & 2) != 0) diff += step >> 1
      if ((nib & 4) != 0) diff += step
      val pred = math.max(-32768, math.min(32767,
        if ((nib & 8) != 0) pred0 - diff else pred0 + diff))
      val idx = math.max(0, math.min(88, idx0 + imaIndexAdj(nib & 7)))
      (pred, idx)
    }

    /** IMA-ADPCM (format 0x11) mono encode — the compressed-AUDIO codec:
      * per block, a 4-byte header (initial predictor int16 + step index)
      * then 4-bit nibbles, encoder state tracking the decoder's
      * reconstruction exactly. samplesPerBlock = 1 + (blockAlign-4)·2;
      * input length must be a whole number of blocks. */
    def encodeAdpcm(samples: Array[Short], sampleRate: Int,
        blockAlign: Int = 256): Array[Byte] = {
      val spb = 1 + (blockAlign - 4) * 2
      require(samples.nonEmpty && samples.length % spb == 0,
        s"need whole blocks of $spb samples")
      val nBlocks = samples.length / spb
      val dataLen = nBlocks * blockAlign
      // layout: RIFF(0) size(4) WAVE(8) | 'fmt '(12) len=20(16) body 20-39
      // (16 std + cbSize + samplesPerBlock) | 'data'(40) len(44) bytes(48+)
      val out = new Array[Byte](48 + dataLen)
      "RIFF".getBytes("US-ASCII").copyToArray(out, 0)
      putLe32(out, 4, 40 + dataLen)
      "WAVE".getBytes("US-ASCII").copyToArray(out, 8)
      "fmt ".getBytes("US-ASCII").copyToArray(out, 12)
      putLe32(out, 16, 20)               // fmt chunk size (16 + cbSize 2 + 2)
      putLe16(out, 20, 0x11)             // IMA ADPCM
      putLe16(out, 22, 1)                // mono
      putLe32(out, 24, sampleRate)
      putLe32(out, 28, sampleRate * blockAlign / spb) // approx byte rate
      putLe16(out, 32, blockAlign)
      putLe16(out, 34, 4)                // bits per (compressed) sample
      putLe16(out, 36, 2)                // cbSize
      putLe16(out, 38, spb)              // samplesPerBlock
      "data".getBytes("US-ASCII").copyToArray(out, 40)
      putLe32(out, 44, dataLen)
      var o = 48
      var idx = 0
      for (b <- 0 until nBlocks) {
        val base = b * spb
        var pred: Int = samples(base)
        putLe16(out, o, pred & 0xffff); out(o + 2) = idx.toByte; out(o + 3) = 0
        o += 4
        var nibLow = true; var cur = 0
        for (j <- 1 until spb) {
          val target = samples(base + j)
          val step = imaStep(idx)
          var delta = target - pred
          var nib = 0
          if (delta < 0) { nib = 8; delta = -delta }
          if (delta >= step) { nib |= 4; delta -= step }
          if (delta >= (step >> 1)) { nib |= 2; delta -= step >> 1 }
          if (delta >= (step >> 2)) { nib |= 1 }
          val (p2, i2) = imaDecodeNibble(nib, pred, idx)
          pred = p2; idx = i2
          if (nibLow) { cur = nib; nibLow = false }
          else { out(o) = (cur | (nib << 4)).toByte; o += 1; nibLow = true }
        }
        if (!nibLow) { out(o) = cur.toByte; o += 1; nibLow = true }
        // pad remaining block bytes with zero nibbles? block is exactly
        // full by construction: (spb-1) nibbles = (blockAlign-4)*2 ✓
      }
      out
    }

    /** Returns (sampleRate, channels, interleaved samples). Walks the
      * chunk list, so extra chunks (LIST/INFO/...) before data are fine.
      * PCM-16 (format 1) is returned as stored; IMA-ADPCM mono (format
      * 0x11) is DECODED — the compressed-audio path — so every consumer
      * (features, spectral analysis) sees plain samples. */
    def decode(p: Array[Byte]): Option[(Int, Int, Array[Short])] = Try {
      require(p.length >= 44)
      require(new String(p, 0, 4, "US-ASCII") == "RIFF")
      require(new String(p, 8, 4, "US-ASCII") == "WAVE")
      var i = 12
      var rate = -1; var channels = -1; var bits = -1; var fmt = -1
      var blockAlign = -1; var spb = -1
      var dataOff = -1; var dataLen = -1
      while (i + 8 <= p.length && (dataOff < 0 || rate < 0)) {
        val cid = new String(p, i, 4, "US-ASCII")
        val len = le32(p, i + 4)
        require(len >= 0 && i + 8 + len <= p.length)
        if (cid == "fmt ") {
          require(len >= 16)
          fmt = le16(p, i + 8)
          require(fmt == 1 || fmt == 0x11, "only PCM or IMA-ADPCM")
          channels = le16(p, i + 10)
          rate = le32(p, i + 12)
          blockAlign = le16(p, i + 20)
          bits = le16(p, i + 22)
          if (fmt == 1) require(bits == 16, "only 16-bit PCM")
          else {
            require(bits == 4 && channels == 1, "only 4-bit mono ADPCM")
            require(len >= 20, "ADPCM needs samplesPerBlock")
            spb = le16(p, i + 26)
            require(spb == 1 + (blockAlign - 4) * 2, "inconsistent block layout")
          }
        } else if (cid == "data") {
          dataOff = i + 8; dataLen = len
        }
        i += 8 + len + (len & 1) // chunks are word-aligned
      }
      require(rate > 0 && channels > 0 && dataOff >= 0)
      val samples: Array[Short] =
        if (fmt == 1) {
          val n = dataLen / 2
          val arr = new Array[Short](n)
          var j = 0
          while (j < n) { arr(j) = le16(p, dataOff + 2 * j).toShort; j += 1 }
          arr
        } else {
          require(dataLen % blockAlign == 0, "partial ADPCM block")
          val nBlocks = dataLen / blockAlign
          val arr = new Array[Short](nBlocks * spb)
          var b = 0
          while (b < nBlocks) {
            val base = dataOff + b * blockAlign
            var pred = le16(p, base).toShort.toInt
            var idx = p(base + 2) & 0xff
            require(idx <= 88, "step index out of range")
            arr(b * spb) = pred.toShort
            var j = 1
            while (j < spb) {
              val byteVal = p(base + 4 + (j - 1) / 2) & 0xff
              val nib = if ((j - 1) % 2 == 0) byteVal & 0x0f else byteVal >> 4
              val (p2, i2) = imaDecodeNibble(nib, pred, idx)
              pred = p2; idx = i2
              arr(b * spb + j) = pred.toShort
              j += 1
            }
            b += 1
          }
          arr
        }
      (rate, channels, samples)
    }.toOption
  }

  /** Baseline JPEG (ITU-T T.81, SOF0), grayscale — the third compressed
    * real codec, pure JVM: marker parsing (DQT/SOF0/DHT/SOS, APPn/COM
    * skipped), canonical Huffman decoding with 0xFF00 byte unstuffing,
    * DC prediction, dequantization, a full separable double-precision
    * IDCT, level shift + clamp. The encoder produces REAL baseline
    * streams with the public T.81 Annex K luminance Huffman tables.
    *
    * Exactness device for the oracle gate: JPEG is lossy in general,
    * but an 8×8 block of CONSTANT value v has a DC-only DCT (8·(v−128))
    * and, with the flat quant table Q=8 used here, quantizes with zero
    * error — so constant-block fixtures round-trip BIT-EXACTLY through
    * the real Huffman/quant/IDCT pipeline, and the q-gate oracle can
    * derive expected pixels from the block-value formula while staying
    * blind to the compressed bytes. Width/height must be multiples of 8
    * in the encoder; the decoder handles any size (edge blocks crop). */
  object Jpeg {
    def isJpeg(p: Array[Byte]): Boolean =
      p.length >= 3 && (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8 &&
        (p(2) & 0xff) == 0xff

    // T.81 Annex K.3.1 — typical luminance DC table: BITS + HUFFVAL
    private val dcBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
    private val dcVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
    // K.3.2 — typical luminance AC table
    private val acBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
    private val acVals = Array(
      0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
      0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
      0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
      0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
      0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
      0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
      0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
      0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
      0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
      0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
      0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
      0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
      0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
      0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

    /** Canonical codes from a BITS array: (code, length) per symbol in
      * HUFFVAL order. */
    private def canonical(bits: Array[Int]): Array[(Int, Int)] = {
      val out = collection.mutable.ArrayBuffer.empty[(Int, Int)]
      var code = 0
      for (len <- 1 to 16) {
        for (_ <- 0 until bits(len)) { out += ((code, len)); code += 1 }
        code <<= 1
      }
      out.toArray
    }

    private val zigzag: Array[Int] = Array(
      0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
      12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
      35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
      58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

    /** Flat quant table (all 8): makes constant blocks exactly
      * representable (DC = 8·(v−128) divides by 8 without error). */
    private val flatQ = 8

    /** Encode 8-bit grayscale, w and h multiples of 8, baseline SOF0. */
    def encode(w: Int, h: Int, gray: Array[Byte]): Array[Byte] = {
      require(w % 8 == 0 && h % 8 == 0, "encoder needs multiple-of-8 dims")
      require(gray.length == w * h, "pixel array must be w*h bytes")
      val out = new java.io.ByteArrayOutputStream()
      def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
      def seg(m: Int, body: Array[Byte]): Unit = {
        marker(m)
        out.write(((body.length + 2) >> 8) & 0xff); out.write((body.length + 2) & 0xff)
        out.write(body)
      }
      marker(0xd8) // SOI
      seg(0xdb, Array[Byte](0) ++ Array.fill(64)(flatQ.toByte)) // DQT id 0
      seg(0xc0, Array[Byte](8, // SOF0: precision
        ((h >> 8) & 0xff).toByte, (h & 0xff).toByte,
        ((w >> 8) & 0xff).toByte, (w & 0xff).toByte,
        1, 1, 0x11, 0)) // 1 component, id 1, 1x1 sampling, quant 0
      def dht(cls: Int, bits: Array[Int], vals: Array[Int]): Unit =
        seg(0xc4, Array((cls << 4).toByte) ++
          (1 to 16).map(l => bits(l).toByte).toArray ++ vals.map(_.toByte))
      dht(0, dcBits, dcVals)
      dht(1, acBits, acVals)
      seg(0xda, Array[Byte](1, 1, 0x00, 0, 63, 0)) // SOS: comp 1, DC 0 / AC 0
      // entropy-coded data
      val dcCodes = canonical(dcBits) // symbol = dcVals(i) = category i here
      val acCodes = canonical(acBits)
      val acEob = acCodes(acVals.indexOf(0x00))
      var acc = 0L; var nAcc = 0
      val body = new java.io.ByteArrayOutputStream()
      def putBits(code: Int, len: Int): Unit = { // MSB-first
        acc = (acc << len) | (code & ((1L << len) - 1)); nAcc += len
        while (nAcc >= 8) {
          val b = ((acc >> (nAcc - 8)) & 0xff).toInt
          body.write(b)
          if (b == 0xff) body.write(0x00) // byte stuffing
          nAcc -= 8
          acc &= (1L << nAcc) - 1 // drop written bits before the next shift
        }
      }
      var prevDc = 0
      val bw = w / 8; val bh = h / 8
      for (by <- 0 until bh; bx <- 0 until bw) {
        // constant-or-not: encode the true DCT DC of the block; ACs are
        // encoded as EOB only, so NON-constant blocks lose their ACs —
        // callers wanting exactness use constant blocks (doc above)
        var sum = 0
        var yy = 0
        while (yy < 8) {
          var xx = 0
          while (xx < 8) {
            sum += gray((by * 8 + yy) * w + bx * 8 + xx) & 0xff
            xx += 1
          }
          yy += 1
        }
        // DC coefficient 8*(mean-128) = (sum-64*128)/8; quantized by 8
        val dc = math.round((sum - 8192) / 64.0 * 8.0 / flatQ).toInt
        val diff = dc - prevDc
        prevDc = dc
        val cat = if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
        val (c, l) = dcCodes(cat)
        putBits(c, l)
        if (cat > 0) {
          val bitsVal = if (diff > 0) diff else diff + (1 << cat) - 1
          putBits(bitsVal, cat)
        }
        putBits(acEob._1, acEob._2)
      }
      if (nAcc > 0) { // pad with 1-bits
        val pad = 8 - nAcc
        putBits((1 << pad) - 1, pad)
      }
      out.write(body.toByteArray)
      marker(0xd9) // EOI
      out.toByteArray
    }

    /** Returns (width, height, RGB bytes — gray expanded). */
    def decode(p: Array[Byte]): Option[(Int, Int, Array[Byte])] = Try {
      require(isJpeg(p), "bad signature")
      var i = 2
      var w = -1; var h = -1
      val quant = collection.mutable.Map.empty[Int, Array[Int]]
      // huffman: (cls, id) -> map from (len, code) to symbol
      val huff = collection.mutable.Map.empty[(Int, Int), Map[(Int, Int), Int]]
      var compQuant = -1; var dcTable = -1; var acTable = -1
      var sosAt = -1
      while (sosAt < 0) {
        require(i + 4 <= p.length && (p(i) & 0xff) == 0xff, "marker expected")
        val m = p(i + 1) & 0xff
        require(m != 0xd9, "EOI before SOS")
        val len = ((p(i + 2) & 0xff) << 8) | (p(i + 3) & 0xff)
        val body = i + 4
        m match {
          case 0xdb => // DQT: one or more tables
            var j = body
            while (j < i + 2 + len) {
              val pq = (p(j) & 0xff) >> 4; val tq = p(j) & 0x0f
              require(pq == 0, "only 8-bit quant tables")
              quant(tq) = Array.tabulate(64)(k => p(j + 1 + k) & 0xff)
              j += 65
            }
          case 0xc0 => // SOF0 baseline
            require((p(body) & 0xff) == 8, "only 8-bit precision")
            h = ((p(body + 1) & 0xff) << 8) | (p(body + 2) & 0xff)
            w = ((p(body + 3) & 0xff) << 8) | (p(body + 4) & 0xff)
            require((p(body + 5) & 0xff) == 1, "only grayscale (1 component)")
            require((p(body + 7) & 0xff) == 0x11, "only 1x1 sampling")
            compQuant = p(body + 8) & 0xff
          case 0xc4 => // DHT: one or more tables
            var j = body
            while (j < i + 2 + len) {
              val cls = (p(j) & 0xff) >> 4; val id = p(j) & 0x0f
              val bits = Array.tabulate(17)(k => if (k == 0) 0 else p(j + k) & 0xff)
              val n = bits.sum
              val vals = Array.tabulate(n)(k => p(j + 17 + k) & 0xff)
              val codes = canonical(bits)
              huff((cls, id)) = codes.zip(vals).map { case ((c, l), v) =>
                (l, c) -> v
              }.toMap
              j += 17 + n
            }
          case 0xda => // SOS
            require((p(body) & 0xff) == 1, "one scan component")
            dcTable = (p(body + 2) & 0xff) >> 4
            acTable = p(body + 2) & 0x0f
            sosAt = i + 2 + len
          case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
               0xcd | 0xce | 0xcf =>
            throw new IllegalArgumentException("only baseline SOF0")
          case _ => () // APPn, COM, DRI(ignored: no RST support needed)
        }
        if (sosAt < 0) i += 2 + len
      }
      require(w > 0 && h > 0 && w <= (1 << 14) && h <= (1 << 14))
      val q = quant(compQuant)
      val dcH = huff((0, dcTable)); val acH = huff((1, acTable))
      // entropy-coded bit reader with 0xFF00 unstuffing
      var bi = sosAt; var acc = 0L; var nAcc = 0
      def readBit(): Int = {
        if (nAcc == 0) {
          require(bi < p.length, "entropy stream truncated")
          var b = p(bi) & 0xff; bi += 1
          if (b == 0xff) {
            val nxt = p(bi) & 0xff
            if (nxt == 0x00) bi += 1
            else b = 0xff // marker — let require below catch overruns
          }
          acc = b; nAcc = 8
        }
        nAcc -= 1
        ((acc >> nAcc) & 1).toInt
      }
      def readHuff(table: Map[(Int, Int), Int]): Int = {
        var code = 0; var len = 0
        while (len < 16) {
          code = (code << 1) | readBit(); len += 1
          table.get((len, code)) match {
            case Some(sym) => return sym
            case None => ()
          }
        }
        throw new IllegalArgumentException("invalid Huffman code")
      }
      def extend(v: Int, cat: Int): Int =
        if (cat == 0) 0
        else if (v < (1 << (cat - 1))) v - (1 << cat) + 1
        else v
      val bw = (w + 7) / 8; val bh = (h + 7) / 8
      val gray = new Array[Byte](w * h)
      val coef = new Array[Int](64)
      val tmp = new Array[Double](64)
      var prevDc = 0
      val c = Array.tabulate(8)(u => if (u == 0) 1.0 / math.sqrt(2) else 1.0)
      val cosT = Array.tabulate(8, 8)((x, u) => math.cos((2 * x + 1) * u * math.Pi / 16))
      for (by <- 0 until bh; bx <- 0 until bw) {
        java.util.Arrays.fill(coef, 0)
        val dcCat = readHuff(dcH)
        var v = 0
        for (_ <- 0 until dcCat) v = (v << 1) | readBit()
        prevDc += extend(v, dcCat)
        coef(0) = prevDc * q(0)
        var k = 1
        var eob = false
        while (k < 64 && !eob) {
          val rs = readHuff(acH)
          val run = rs >> 4; val cat = rs & 0x0f
          if (rs == 0x00) eob = true
          else if (rs == 0xf0) k += 16 // ZRL
          else {
            k += run
            require(k < 64, "AC run overflow")
            var av = 0
            for (_ <- 0 until cat) av = (av << 1) | readBit()
            coef(zigzag(k)) = extend(av, cat) * q(k)
            k += 1
          }
        }
        // separable IDCT: rows then columns
        var y0 = 0
        while (y0 < 8) {
          var x0 = 0
          while (x0 < 8) {
            var s = 0.0
            var u = 0
            while (u < 8) { s += c(u) * coef(y0 * 8 + u) * cosT(x0)(u); u += 1 }
            tmp(y0 * 8 + x0) = s / 2.0
            x0 += 1
          }
          y0 += 1
        }
        var x1 = 0
        while (x1 < 8) {
          var y1 = 0
          while (y1 < 8) {
            var s = 0.0
            var vv = 0
            while (vv < 8) { s += c(vv) * tmp(vv * 8 + x1) * cosT(y1)(vv); vv += 1 }
            val px = math.round(s / 2.0 + 128.0).toInt
            val yy = by * 8 + y1; val xx = bx * 8 + x1
            if (yy < h && xx < w)
              gray(yy * w + xx) = math.max(0, math.min(255, px)).toByte
            y1 += 1
          }
          x1 += 1
        }
      }
      val rgb = new Array[Byte](w * h * 3)
      var k2 = 0
      while (k2 < w * h) {
        rgb(3 * k2) = gray(k2); rgb(3 * k2 + 1) = gray(k2); rgb(3 * k2 + 2) = gray(k2)
        k2 += 1
      }
      (w, h, rgb)
    }.toOption
  }

  /** GIF87a — the second compressed real codec: a full variable-width
    * LZW implementation (the GIF flavor: LSB-first bit packing, clear/
    * end codes, dictionary growth to 12 bits with reset at 4096), pure
    * JVM. Decode parses the logical screen descriptor + global color
    * table, skips extension blocks, LZW-decodes the first image's index
    * stream and maps it through the palette to logical top-down RGB
    * triples. Interlaced images and local color tables return None (the
    * FakeCodec fallback path). The encoder is a REAL LZW compressor (not
    * the uncompressed-GIF trick), so round-trip fixtures exercise
    * dictionary growth, width bumps and the reset path. */
  object Gif {
    def isGif(p: Array[Byte]): Boolean =
      p.length >= 6 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8'

    /** Encode 8-bit indexed pixels with a 256-entry palette
      * (`palette` = 768 RGB bytes), non-interlaced GIF87a. */
    def encode(w: Int, h: Int, indices: Array[Byte],
        palette: Array[Byte]): Array[Byte] = {
      require(indices.length == w * h, "index array must be w*h bytes")
      require(palette.length == 768, "palette must be 256 RGB entries")
      val out = new java.io.ByteArrayOutputStream()
      out.write("GIF87a".getBytes("US-ASCII"))
      // logical screen descriptor: dims, GCT present, 256 entries
      out.write(w & 0xff); out.write((w >> 8) & 0xff)
      out.write(h & 0xff); out.write((h >> 8) & 0xff)
      out.write(0xf7) // GCT flag | color res 7 | size 7 (2^8 entries)
      out.write(0); out.write(0)
      out.write(palette)
      // image descriptor at (0,0), no local table, not interlaced
      out.write(0x2c)
      out.write(0); out.write(0); out.write(0); out.write(0)
      out.write(w & 0xff); out.write((w >> 8) & 0xff)
      out.write(h & 0xff); out.write((h >> 8) & 0xff)
      out.write(0)
      val minCode = 8
      out.write(minCode)
      // --- LZW encode ---
      val clear = 1 << minCode; val end = clear + 1
      val bits = new java.io.ByteArrayOutputStream()
      var acc = 0L; var nAcc = 0
      var width = minCode + 1
      def put(code: Int): Unit = {
        acc |= code.toLong << nAcc; nAcc += width
        while (nAcc >= 8) { bits.write((acc & 0xff).toInt); acc >>= 8; nAcc -= 8 }
      }
      var dict = collection.mutable.HashMap.empty[(Int, Byte), Int]
      var next = end + 1
      put(clear)
      var cur = indices(0) & 0xff
      var i = 1
      while (i < indices.length) {
        val c = indices(i)
        dict.get((cur, c)) match {
          case Some(code) => cur = code
          case None =>
            put(cur)
            dict((cur, c)) = next
            next += 1
            if (next - 1 == (1 << width) && width < 12) width += 1
            if (next == 4096) {
              put(clear)
              dict = collection.mutable.HashMap.empty
              next = end + 1
              width = minCode + 1
            }
            cur = c & 0xff
        }
        i += 1
      }
      put(cur); put(end)
      if (nAcc > 0) bits.write((acc & 0xff).toInt)
      // sub-blocks of <= 255 bytes
      val data = bits.toByteArray
      var off = 0
      while (off < data.length) {
        val len = math.min(255, data.length - off)
        out.write(len)
        out.write(data, off, len)
        off += len
      }
      out.write(0)    // block terminator
      out.write(0x3b) // trailer
      out.toByteArray
    }

    /** Returns (width, height, logical top-down RGB bytes). */
    def decode(p: Array[Byte]): Option[(Int, Int, Array[Byte])] = Try {
      require(isGif(p), "bad signature")
      var i = 6
      def u16(off: Int) = (p(off) & 0xff) | ((p(off + 1) & 0xff) << 8)
      i += 4 // screen dims (image descriptor carries the real ones)
      val packed = p(i) & 0xff; i += 3
      require((packed & 0x80) != 0, "global color table required")
      val gctSize = 3 * (2 << (packed & 7))
      val palette = java.util.Arrays.copyOfRange(p, i, i + gctSize)
      i += gctSize
      // walk blocks to the first image descriptor
      while ((p(i) & 0xff) == 0x21) { // extension: label + sub-blocks
        i += 2
        while (p(i) != 0) i += 1 + (p(i) & 0xff)
        i += 1
      }
      require((p(i) & 0xff) == 0x2c, "image descriptor expected")
      val w = u16(i + 5); val h = u16(i + 7)
      require(w > 0 && h > 0 && w <= (1 << 15) && h <= (1 << 15))
      val ipacked = p(i + 9) & 0xff
      require((ipacked & 0x80) == 0, "local color tables unsupported")
      require((ipacked & 0x40) == 0, "interlace unsupported")
      i += 10
      val minCode = p(i) & 0xff; i += 1
      require(minCode >= 2 && minCode <= 8)
      // concatenate sub-blocks
      val data = new java.io.ByteArrayOutputStream()
      while (p(i) != 0) {
        val len = p(i) & 0xff
        data.write(p, i + 1, len)
        i += 1 + len
      }
      val bytes = data.toByteArray
      // --- LZW decode ---
      val clear = 1 << minCode; val end = clear + 1
      val out = new Array[Byte](w * h)
      var produced = 0
      // dictionary: entries as (prefix code, appended byte); roots implicit
      val prefix = new Array[Int](4096)
      val append = new Array[Byte](4096)
      var next = end + 1
      var width = minCode + 1
      var acc = 0L; var nAcc = 0; var bi = 0
      def read(): Int = {
        while (nAcc < width) {
          require(bi < bytes.length, "LZW stream truncated")
          acc |= (bytes(bi) & 0xffL) << nAcc; bi += 1; nAcc += 8
        }
        val c = (acc & ((1L << width) - 1)).toInt
        acc >>= width; nAcc -= width
        c
      }
      def emit(code: Int): Byte = { // writes expansion, returns FIRST byte
        var stack = List.empty[Byte]
        var c = code
        while (c >= clear + 2) { stack = append(c) :: stack; c = prefix(c) }
        val first = c.toByte
        stack = first :: stack
        stack.foreach { b =>
          require(produced < out.length, "more pixels than w*h")
          out(produced) = b; produced += 1
        }
        first
      }
      var prev = -1
      var done = false
      while (!done) {
        val code = read()
        if (code == end) done = true
        else if (code == clear) { next = end + 1; width = minCode + 1; prev = -1 }
        else if (prev == -1) { emit(code); prev = code }
        else {
          val first =
            if (code < next) emit(code)
            else { // KwKwK case: expansion = prev's expansion + its first byte
              require(code == next, s"code $code beyond dictionary $next")
              var c = prev
              while (c >= clear + 2) c = prefix(c)
              val f = c.toByte
              var stack = List.empty[Byte]
              c = prev
              while (c >= clear + 2) { stack = append(c) :: stack; c = prefix(c) }
              stack = c.toByte :: stack
              (stack :+ f).foreach { b =>
                require(produced < out.length, "more pixels than w*h")
                out(produced) = b; produced += 1
              }
              f
            }
          if (next < 4096) {
            prefix(next) = prev; append(next) = first; next += 1
            if (next == (1 << width) && width < 12) width += 1
          }
          prev = code
        }
      }
      require(produced == w * h, s"decoded $produced of ${w * h} pixels")
      val rgb = new Array[Byte](w * h * 3)
      var k = 0
      while (k < w * h) {
        val idx = (out(k) & 0xff) * 3
        rgb(3 * k) = palette(idx)
        rgb(3 * k + 1) = palette(idx + 1)
        rgb(3 * k + 2) = palette(idx + 2)
        k += 1
      }
      (w, h, rgb)
    }.toOption
  }

  /** PNG (RFC 2083) — the first COMPRESSED real codec, still pure JVM:
    * `java.util.zip.Inflater/Deflater` for the zlib stream, `CRC32` for
    * chunk integrity, and the five PNG row filters (None/Sub/Up/Average/
    * Paeth) implemented directly. Decode supports 8-bit depth, color
    * types 0 (gray, expanded), 2 (RGB) and 6 (RGBA, alpha dropped),
    * non-interlaced, and returns logical top-down RGB triples; any other
    * shape (or a CRC/structure violation) returns None and the caller
    * falls back to the FakeCodec stub. The encoder writes color type 2
    * and cycles the row filter as y % 5, so round-trip fixtures exercise
    * every unfilter branch — a bug in any one of the five breaks the
    * oracle, not just a unit test. */
  object Png {
    private val Sig: Array[Byte] =
      Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    def isPng(p: Array[Byte]): Boolean =
      p.length >= 8 && (0 until 8).forall(i => p(i) == Sig(i))

    private def be32(b: Array[Byte], off: Int): Int =
      ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
        ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
    private def putBe32(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = ((v >>> 24) & 0xff).toByte
      b(off + 1) = ((v >>> 16) & 0xff).toByte
      b(off + 2) = ((v >>> 8) & 0xff).toByte
      b(off + 3) = (v & 0xff).toByte
    }

    private def chunk(out: java.io.ByteArrayOutputStream, typ: String,
        data: Array[Byte]): Unit = {
      val len = new Array[Byte](4); putBe32(len, 0, data.length)
      out.write(len)
      val t = typ.getBytes("US-ASCII")
      out.write(t); out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(t); crc.update(data)
      val c = new Array[Byte](4); putBe32(c, 0, crc.getValue.toInt)
      out.write(c)
    }

    private def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }

    /** Encode 8-bit RGB (color type 2), non-interlaced; row y is written
      * with filter y % 5. `rgb` is logical top-down row-major RGB. */
    def encode(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
      require(rgb.length == w * h * 3, "pixel array must be w*h*3 RGB bytes")
      encodeChannels(w, h, 2, rgb)
    }

    /** General 8-bit encoder for test fixtures of the other supported
      * color types (0 = gray 1 byte/px, 2 = RGB, 6 = RGBA). */
    private[graft] def encodeChannels(w: Int, h: Int, colorType: Int,
        px: Array[Byte]): Array[Byte] = {
      val bpp = colorType match { case 0 => 1; case 2 => 3; case 6 => 4 }
      require(px.length == w * h * bpp, s"pixel array must be w*h*$bpp bytes")
      val rgb = px
      val rowLen = w * bpp
      val raw = new Array[Byte](h * (1 + rowLen))
      var y = 0
      while (y < h) {
        val f = y % 5
        val off = y * (1 + rowLen)
        raw(off) = f.toByte
        var i = 0
        while (i < rowLen) {
          val cur = rgb(y * rowLen + i) & 0xff
          val left = if (i >= bpp) rgb(y * rowLen + i - bpp) & 0xff else 0
          val up = if (y > 0) rgb((y - 1) * rowLen + i) & 0xff else 0
          val ul = if (y > 0 && i >= bpp) rgb((y - 1) * rowLen + i - bpp) & 0xff else 0
          val pred = f match {
            case 0 => 0
            case 1 => left
            case 2 => up
            case 3 => (left + up) / 2
            case 4 => paeth(left, up, ul)
          }
          raw(off + 1 + i) = ((cur - pred) & 0xff).toByte
          i += 1
        }
        y += 1
      }
      val defl = new java.util.zip.Deflater()
      defl.setInput(raw); defl.finish()
      val zout = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!defl.finished()) zout.write(buf, 0, defl.deflate(buf))
      defl.end()
      val out = new java.io.ByteArrayOutputStream()
      out.write(Sig)
      val ihdr = new Array[Byte](13)
      putBe32(ihdr, 0, w); putBe32(ihdr, 4, h)
      ihdr(8) = 8    // bit depth
      ihdr(9) = colorType.toByte
      // 10..12 = compression 0, filter 0, interlace 0
      chunk(out, "IHDR", ihdr)
      chunk(out, "IDAT", zout.toByteArray)
      chunk(out, "IEND", Array.emptyByteArray)
      out.toByteArray
    }

    /** Returns (width, height, logical top-down RGB bytes). */
    def decode(p: Array[Byte]): Option[(Int, Int, Array[Byte])] = Try {
      require(isPng(p), "bad signature")
      var i = 8
      var w = -1; var h = -1; var colorType = -1
      val idat = new java.io.ByteArrayOutputStream()
      var done = false
      while (!done && i + 12 <= p.length) {
        val len = be32(p, i)
        require(len >= 0 && i + 12 + len <= p.length, "chunk overruns file")
        val typ = new String(p, i + 4, 4, "US-ASCII")
        val crc = new java.util.zip.CRC32()
        crc.update(p, i + 4, 4 + len)
        require(crc.getValue.toInt == be32(p, i + 8 + len), s"$typ CRC mismatch")
        typ match {
          case "IHDR" =>
            require(len == 13)
            w = be32(p, i + 8); h = be32(p, i + 12)
            require(w > 0 && h > 0 && w <= (1 << 16) && h <= (1 << 16))
            require(p(i + 16) == 8, "only 8-bit depth")
            colorType = p(i + 17) & 0xff
            require(colorType == 0 || colorType == 2 || colorType == 6,
              "only gray/RGB/RGBA")
            require(p(i + 18) == 0 && p(i + 19) == 0 && p(i + 20) == 0,
              "only deflate/adaptive/non-interlaced")
          case "IDAT" => idat.write(p, i + 8, len)
          case "IEND" => done = true
          case _ => () // ancillary chunks skipped
        }
        i += 12 + len
      }
      require(w > 0 && idat.size > 0, "missing IHDR/IDAT")
      val bpp = colorType match { case 0 => 1; case 2 => 3; case 6 => 4 }
      val rowLen = w * bpp
      val raw = new Array[Byte](h * (1 + rowLen))
      val infl = new java.util.zip.Inflater()
      infl.setInput(idat.toByteArray)
      var got = 0
      while (got < raw.length && !infl.finished()) {
        val n = infl.inflate(raw, got, raw.length - got)
        require(n > 0 || infl.finished(), "truncated zlib stream")
        got += n
      }
      infl.end()
      require(got == raw.length, s"inflated $got of ${raw.length} bytes")
      // unfilter in place into a packed pixel array
      val px = new Array[Byte](h * rowLen)
      var y = 0
      while (y < h) {
        val f = raw(y * (1 + rowLen)) & 0xff
        require(f <= 4, s"bad filter type $f")
        val off = y * (1 + rowLen) + 1
        var x = 0
        while (x < rowLen) {
          val v = raw(off + x) & 0xff
          val left = if (x >= bpp) px(y * rowLen + x - bpp) & 0xff else 0
          val up = if (y > 0) px((y - 1) * rowLen + x) & 0xff else 0
          val ul = if (y > 0 && x >= bpp) px((y - 1) * rowLen + x - bpp) & 0xff else 0
          val pred = f match {
            case 0 => 0
            case 1 => left
            case 2 => up
            case 3 => (left + up) / 2
            case 4 => paeth(left, up, ul)
          }
          px(y * rowLen + x) = ((v + pred) & 0xff).toByte
          x += 1
        }
        y += 1
      }
      // normalize to RGB triples
      val rgb = colorType match {
        case 2 => px
        case 0 =>
          val out = new Array[Byte](w * h * 3)
          var k = 0
          while (k < w * h) {
            out(3 * k) = px(k); out(3 * k + 1) = px(k); out(3 * k + 2) = px(k)
            k += 1
          }
          out
        case 6 =>
          val out = new Array[Byte](w * h * 3)
          var k = 0
          while (k < w * h) {
            out(3 * k) = px(4 * k); out(3 * k + 1) = px(4 * k + 1)
            out(3 * k + 2) = px(4 * k + 2)
            k += 1
          }
          out
      }
      (w, h, rgb)
    }.toOption
  }
}
