package graft.mm

import scala.util.Try

/** Pure-JVM codecs for UNCOMPRESSED media containers — 24-bit BMP, binary
  * PPM (P6), PCM-16 WAV. No external libraries, so the decode stage in
  * [[Multimodal]] exercises real header parsing and real pixel/sample
  * bytes even in a container without image/audio libs. Compressed formats
  * (JPEG/PNG/MP3/...) are NOT handled here and route to the documented
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

    /** Returns (sampleRate, channels, interleaved samples). Walks the
      * chunk list, so extra chunks (LIST/INFO/...) before data are fine. */
    def decode(p: Array[Byte]): Option[(Int, Int, Array[Short])] = Try {
      require(p.length >= 44)
      require(new String(p, 0, 4, "US-ASCII") == "RIFF")
      require(new String(p, 8, 4, "US-ASCII") == "WAVE")
      var i = 12
      var rate = -1; var channels = -1; var bits = -1
      var samples: Array[Short] = null
      while (i + 8 <= p.length && (samples == null || rate < 0)) {
        val cid = new String(p, i, 4, "US-ASCII")
        val len = le32(p, i + 4)
        require(len >= 0 && i + 8 + len <= p.length)
        if (cid == "fmt ") {
          require(len >= 16)
          require(le16(p, i + 8) == 1, "only PCM")
          channels = le16(p, i + 10)
          rate = le32(p, i + 12)
          bits = le16(p, i + 22)
          require(bits == 16, "only 16-bit")
        } else if (cid == "data") {
          val n = len / 2
          val arr = new Array[Short](n)
          var j = 0
          while (j < n) { arr(j) = le16(p, i + 8 + 2 * j).toShort; j += 1 }
          samples = arr
        }
        i += 8 + len + (len & 1) // chunks are word-aligned
      }
      require(rate > 0 && channels > 0 && samples != null)
      (rate, channels, samples)
    }.toOption
  }
}
