package graft.core

/** Real pure-JVM media codecs for the multimodal pipeline (round-5 verdict
  * item 4 — replaces ml.Multimodal's DecoderStub): one format per modality
  * that needs no external codec library, encoded by the fixture generator
  * and decoded by the pipeline, so the decoded width/height/duration/content
  * stats are REAL functions of the payload bytes:
  *
  *  - image → BMP (Windows bitmap, BITMAPINFOHEADER, 24-bit uncompressed,
  *    bottom-up rows padded to 4 bytes — the format every published spec
  *    describes byte-for-byte);
  *  - audio → WAV (canonical 44-byte RIFF header, PCM signed 16-bit LE
  *    mono);
  *  - video → Y4M (YUV4MPEG2 stream, `Cmono` colourspace: plain-text
  *    header + FRAME-delimited raw luma planes).
  *
  * Decoders degrade deterministically on corrupt/truncated payloads
  * (None, never a throw) — the same contract as the HTML parser kernels.
  */
object MediaCodecs {

  // ------------------------------------------------------------------ BMP

  final case class BmpInfo(
      width: Int, height: Int,
      /** mean integer luma (299r+587g+114b)/1000 over all pixels. */
      meanLuma: Double,
      /** mean luma of the nearest-neighbour thumbnail (≤32×32 box). */
      thumbW: Int, thumbH: Int, thumbMeanLuma: Double)

  private def putIntLE(a: Array[Byte], at: Int, v: Int): Unit = {
    a(at) = v.toByte; a(at + 1) = (v >> 8).toByte
    a(at + 2) = (v >> 16).toByte; a(at + 3) = (v >> 24).toByte
  }
  private def putShortLE(a: Array[Byte], at: Int, v: Int): Unit = {
    a(at) = v.toByte; a(at + 1) = (v >> 8).toByte
  }
  private def intLE(a: Array[Byte], at: Int): Int =
    (a(at) & 0xff) | ((a(at + 1) & 0xff) << 8) |
      ((a(at + 2) & 0xff) << 16) | ((a(at + 3) & 0xff) << 24)
  private def shortLE(a: Array[Byte], at: Int): Int =
    (a(at) & 0xff) | ((a(at + 1) & 0xff) << 8)

  /** Bytes of a 24-bpp padded row. */
  def bmpRowSize(w: Int): Int = ((3 * w + 3) / 4) * 4

  /** Total encoded size — mirrored by the q41 oracle's SQL arithmetic. */
  def bmpSize(w: Int, h: Int): Int = 54 + h * bmpRowSize(w)

  /** Encode a 24-bit BMP; `pix(x, y)` yields (r, g, b), y=0 is the TOP row
    * (the encoder writes rows bottom-up as the format requires). */
  def encodeBmp(w: Int, h: Int, pix: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(w > 0 && h > 0)
    val rowSize = bmpRowSize(w)
    val out = new Array[Byte](bmpSize(w, h))
    out(0) = 'B'; out(1) = 'M'
    putIntLE(out, 2, out.length) // file size
    putIntLE(out, 10, 54)        // pixel data offset
    putIntLE(out, 14, 40)        // BITMAPINFOHEADER size
    putIntLE(out, 18, w)
    putIntLE(out, 22, h)         // positive height = bottom-up
    putShortLE(out, 26, 1)       // planes
    putShortLE(out, 28, 24)      // bpp
    putIntLE(out, 34, h * rowSize) // image size
    var y = 0
    while (y < h) {
      val rowAt = 54 + (h - 1 - y) * rowSize // bottom-up
      var x = 0
      while (x < w) {
        val (r, g, b) = pix(x, y)
        out(rowAt + 3 * x) = b.toByte     // BGR order
        out(rowAt + 3 * x + 1) = g.toByte
        out(rowAt + 3 * x + 2) = r.toByte
        x += 1
      }
      y += 1
    }
    out
  }

  def decodeBmp(bytes: Array[Byte]): Option[BmpInfo] = {
    if (bytes == null || bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M')
      return None
    val offset = intLE(bytes, 10)
    val w = intLE(bytes, 18)
    val h = intLE(bytes, 22)
    val bpp = shortLE(bytes, 28)
    if (w <= 0 || h <= 0 || bpp != 24) return None
    val rowSize = bmpRowSize(w)
    if (offset < 54 || offset.toLong + h.toLong * rowSize > bytes.length) return None
    def lumaAt(x: Int, y: Int): Int = { // y = top-down
      val at = offset + (h - 1 - y) * rowSize + 3 * x
      val b = bytes(at) & 0xff; val g = bytes(at + 1) & 0xff; val r = bytes(at + 2) & 0xff
      (299 * r + 587 * g + 114 * b) / 1000
    }
    var sum = 0L
    var y = 0
    while (y < h) { var x = 0; while (x < w) { sum += lumaAt(x, y); x += 1 }; y += 1 }
    // real resize: nearest-neighbour downsample into a ≤32×32 box
    val scale = 32.0 / math.max(w, h)
    val (tw, th) =
      if (scale >= 1.0) (w, h)
      else (math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt))
    var tsum = 0L
    var ty = 0
    while (ty < th) {
      var tx = 0
      while (tx < tw) {
        tsum += lumaAt(tx * w / tw, ty * h / th)
        tx += 1
      }
      ty += 1
    }
    Some(BmpInfo(w, h, sum.toDouble / (w.toLong * h),
      tw, th, tsum.toDouble / (tw.toLong * th)))
  }

  // ------------------------------------------------------------------ WAV

  final case class WavInfo(
      sampleRate: Int, nSamples: Int, durationSec: Double,
      /** root-mean-square amplitude of the s16le samples. */
      rms: Double)

  /** Total encoded size (canonical 44-byte header + s16le mono data). */
  def wavSize(nSamples: Int): Int = 44 + 2 * nSamples

  def encodeWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0)
    val dataLen = 2 * samples.length
    val out = new Array[Byte](44 + dataLen)
    "RIFF".getBytes.copyToArray(out, 0)
    putIntLE(out, 4, 36 + dataLen)
    "WAVE".getBytes.copyToArray(out, 8)
    "fmt ".getBytes.copyToArray(out, 12)
    putIntLE(out, 16, 16)            // fmt chunk size
    putShortLE(out, 20, 1)           // PCM
    putShortLE(out, 22, 1)           // mono
    putIntLE(out, 24, sampleRate)
    putIntLE(out, 28, sampleRate * 2) // byte rate
    putShortLE(out, 32, 2)           // block align
    putShortLE(out, 34, 16)          // bits per sample
    "data".getBytes.copyToArray(out, 36)
    putIntLE(out, 40, dataLen)
    var i = 0
    while (i < samples.length) { putShortLE(out, 44 + 2 * i, samples(i) & 0xffff); i += 1 }
    out
  }

  def decodeWav(bytes: Array[Byte]): Option[WavInfo] = {
    if (bytes == null || bytes.length < 44) return None
    if (!(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
        bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E'))
      return None
    val fmt = shortLE(bytes, 20)
    val channels = shortLE(bytes, 22)
    val sampleRate = intLE(bytes, 24)
    val bits = shortLE(bytes, 34)
    val dataLen = intLE(bytes, 40)
    if (fmt != 1 || channels != 1 || bits != 16 || sampleRate <= 0) return None
    if (dataLen < 0 || 44L + dataLen > bytes.length) return None
    val n = dataLen / 2
    var sumSq = 0.0
    var i = 0
    while (i < n) {
      val s = shortLE(bytes, 44 + 2 * i).toShort.toDouble
      sumSq += s * s
      i += 1
    }
    Some(WavInfo(sampleRate, n, n.toDouble / sampleRate,
      if (n == 0) 0.0 else math.sqrt(sumSq / n)))
  }

  // ------------------------------------------------------------------ Y4M

  final case class Y4mInfo(
      width: Int, height: Int, nFrames: Int,
      /** frames actually read by the stride-`k` sampler. */
      nSampled: Int,
      /** mean luma over the sampled frames' planes. */
      sampledMeanLuma: Double)

  private val Y4mMagic = "YUV4MPEG2 "
  private val FrameMarker = "FRAME\n"

  def y4mHeader(w: Int, h: Int): String =
    s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 Cmono\n"

  /** Total encoded size — mirrored by the q41 oracle's SQL arithmetic. */
  def y4mSize(w: Int, h: Int, frames: Int): Int =
    y4mHeader(w, h).length + frames * (FrameMarker.length + w * h)

  /** Encode a Cmono (luma-only) Y4M stream; `luma(f, x, y)` per frame. */
  def encodeY4m(w: Int, h: Int, frames: Int,
      luma: (Int, Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0 && frames > 0)
    val header = y4mHeader(w, h).getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](y4mSize(w, h, frames))
    header.copyToArray(out, 0)
    var at = header.length
    var f = 0
    while (f < frames) {
      FrameMarker.getBytes(java.nio.charset.StandardCharsets.US_ASCII).copyToArray(out, at)
      at += FrameMarker.length
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { out(at) = luma(f, x, y).toByte; at += 1; x += 1 }
        y += 1
      }
      f += 1
    }
    out
  }

  /** Decode + frame-sample: read the header dims, count frames, and mean
    * the luma of every `stride`-th frame (the pipeline's frame sampler). */
  def decodeY4m(bytes: Array[Byte], stride: Int = 2): Option[Y4mInfo] = {
    if (bytes == null || bytes.length < Y4mMagic.length) return None
    val nlAt = bytes.indexOf('\n'.toByte)
    if (nlAt < 0) return None
    val header = new String(bytes, 0, nlAt + 1, java.nio.charset.StandardCharsets.US_ASCII)
    if (!header.startsWith(Y4mMagic)) return None
    val params = header.drop(Y4mMagic.length).trim.split(' ')
    def num(prefix: Char): Option[Int] = params
      .find(p => p.nonEmpty && p.head == prefix && p.tail.forall(_.isDigit))
      .map(_.tail.toInt).filter(_ > 0)
    (num('W'), num('H')) match {
      case (Some(w), Some(h)) =>
        val frameBytes = FrameMarker.length + w * h
        val body = bytes.length - header.length
        if (body < 0 || body % frameBytes != 0) return None
        val nFrames = body / frameBytes
        var sum = 0L
        var sampledPix = 0L
        var nSampled = 0
        var f = 0
        while (f < nFrames) {
          if (f % math.max(1, stride) == 0) {
            val at = header.length + f * frameBytes
            // verify the frame marker — corrupt streams degrade to None
            if (new String(bytes, at, FrameMarker.length,
                java.nio.charset.StandardCharsets.US_ASCII) != FrameMarker)
              return None
            var i = 0
            while (i < w * h) { sum += bytes(at + FrameMarker.length + i) & 0xff; i += 1 }
            nSampled += 1
            sampledPix += w.toLong * h
          }
          f += 1
        }
        Some(Y4mInfo(w, h, nFrames, nSampled,
          if (sampledPix == 0) 0.0 else sum.toDouble / sampledPix))
      case _ => None
    }
  }
}
