package graft.multimodal

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.{CRC32, Deflater, Inflater}

/** Real, dependency-free media codecs (pure JDK): a PNG encoder/decoder
  * (RGB8, all five scanline filters on decode; `java.util.zip` deflate +
  * CRC32), a WAV PCM encoder/decoder (RIFF chunk walk), a 24-bit BMP
  * encoder/decoder, and header sniffing for JPEG (SOF marker scan), GIF
  * and BMP. Baseline JPEG and GIF pixel decode live in the sibling
  * JpegCodec/GifCodec objects; Multimodal.decodeImage dispatches across
  * all four image formats. Modern compressed video remains out of scope
  * (no container/av libs here) and rides the documented stub path.
  *
  * Reference capability: Pinot stores opaque BYTES columns and computes
  * over them with transform functions (/root/reference/
  * configuration-reference/schema.md:24 BYTES field specs); a training
  * -data pipeline needs the decode to be real.
  */
object MediaCodec {

  // ------------------------------------------------------------------ PNG

  /** RGB8 image, 3 bytes per pixel, row-major. */
  final case class PngImage(width: Int, height: Int, rgb: Array[Byte])

  private val PngSig = Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')

  private def u32be(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def readU32be(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def chunk(tag: String, payload: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(u32be(payload.length.toLong))
    val tagBytes = tag.getBytes(StandardCharsets.US_ASCII)
    out.write(tagBytes)
    out.write(payload)
    val crc = new CRC32()
    crc.update(tagBytes)
    crc.update(payload)
    out.write(u32be(crc.getValue))
    out.toByteArray
  }

  /** Encode an RGB8 image as a real PNG (color type 2, bit depth 8, no
    * interlace). `filterFor(row)` selects the scanline filter (0..4) —
    * the default None filter is what an encoder would emit for synthetic
    * data; tests rotate filters to exercise every decode path.
    */
  def encodePng(img: PngImage, filterFor: Int => Int = _ => 0): Array[Byte] = {
    require(img.rgb.length == img.width * img.height * 3,
      s"rgb length ${img.rgb.length} != w*h*3 (${img.width}x${img.height})")
    val bpp = 3
    val stride = img.width * bpp
    val raw = new Array[Byte](img.height * (stride + 1))
    var y = 0
    while (y < img.height) {
      val f = filterFor(y)
      require(f >= 0 && f <= 4, s"filter $f out of range")
      raw(y * (stride + 1)) = f.toByte
      var x = 0
      while (x < stride) {
        val cur = img.rgb(y * stride + x) & 0xff
        val left = if (x >= bpp) img.rgb(y * stride + x - bpp) & 0xff else 0
        val up = if (y > 0) img.rgb((y - 1) * stride + x) & 0xff else 0
        val upLeft = if (y > 0 && x >= bpp) img.rgb((y - 1) * stride + x - bpp) & 0xff else 0
        val filtered = f match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case 4 => cur - paeth(left, up, upLeft)
        }
        raw(y * (stride + 1) + 1 + x) = (filtered & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val deflater = new Deflater(Deflater.BEST_SPEED)
    deflater.setInput(raw)
    deflater.finish()
    val buf = new Array[Byte](8192)
    val idat = new ByteArrayOutputStream()
    while (!deflater.finished()) idat.write(buf, 0, deflater.deflate(buf))
    deflater.end()

    val ihdr = new ByteArrayOutputStream()
    ihdr.write(u32be(img.width.toLong))
    ihdr.write(u32be(img.height.toLong))
    ihdr.write(Array[Byte](8, 2, 0, 0, 0)) // depth 8, color RGB, deflate, adaptive, no interlace
    val out = new ByteArrayOutputStream()
    out.write(PngSig)
    out.write(chunk("IHDR", ihdr.toByteArray))
    out.write(chunk("IDAT", idat.toByteArray))
    out.write(chunk("IEND", Array.empty[Byte]))
    out.toByteArray
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Decode an RGB8/no-interlace PNG produced by any conformant encoder
    * (all five scanline filters supported). Returns None for anything that
    * is not such a PNG — corrupt data never throws.
    */
  def decodePng(bytes: Array[Byte]): Option[PngImage] = {
    try {
      if (bytes == null || bytes.length < 8 + 25 || !PngSig.indices.forall(i => bytes(i) == PngSig(i)))
        return None
      var off = 8
      var width = -1; var height = -1; var depth = -1; var color = -1; var interlace = -1
      val idat = new ByteArrayOutputStream()
      while (off + 8 <= bytes.length) {
        val len = readU32be(bytes, off).toInt
        if (len < 0 || off + 12 + len > bytes.length) return None
        val tag = new String(bytes, off + 4, 4, StandardCharsets.US_ASCII)
        tag match {
          case "IHDR" =>
            width = readU32be(bytes, off + 8).toInt
            height = readU32be(bytes, off + 12).toInt
            depth = bytes(off + 16) & 0xff
            color = bytes(off + 17) & 0xff
            interlace = bytes(off + 20) & 0xff
          case "IDAT" => idat.write(bytes, off + 8, len)
          case _ => ()
        }
        off += 12 + len
      }
      if (width <= 0 || height <= 0 || depth != 8 || color != 2 || interlace != 0) return None
      val bpp = 3
      val stride = width * bpp
      val raw = new Array[Byte](height * (stride + 1))
      val inflater = new Inflater()
      inflater.setInput(idat.toByteArray)
      var filled = 0
      while (filled < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, filled, raw.length - filled)
        if (n == 0 && inflater.needsInput()) return None
        filled += n
      }
      inflater.end()
      if (filled != raw.length) return None
      val rgb = new Array[Byte](height * stride)
      var y = 0
      while (y < height) {
        val f = raw(y * (stride + 1)) & 0xff
        var x = 0
        while (x < stride) {
          val v = raw(y * (stride + 1) + 1 + x) & 0xff
          val left = if (x >= bpp) rgb(y * stride + x - bpp) & 0xff else 0
          val up = if (y > 0) rgb((y - 1) * stride + x) & 0xff else 0
          val upLeft = if (y > 0 && x >= bpp) rgb((y - 1) * stride + x - bpp) & 0xff else 0
          val recon = f match {
            case 0 => v
            case 1 => v + left
            case 2 => v + up
            case 3 => v + (left + up) / 2
            case 4 => v + paeth(left, up, upLeft)
            case _ => return None
          }
          rgb(y * stride + x) = (recon & 0xff).toByte
          x += 1
        }
        y += 1
      }
      Some(PngImage(width, height, rgb))
    } catch { case _: Exception => None }
  }

  // ------------------------------------------------------------------ WAV

  final case class WavAudio(sampleRate: Int, channels: Int, bitsPerSample: Int, data: Array[Byte]) {
    def nFrames: Long =
      if (channels <= 0 || bitsPerSample <= 0) 0L
      else data.length.toLong / (channels * (bitsPerSample / 8))
    def durationMs: Long = if (sampleRate <= 0) 0L else nFrames * 1000L / sampleRate
  }

  private def u16le(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def u32le(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def readU16le(b: Array[Byte], off: Int): Int = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def readU32le(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) | ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  /** Encode 16-bit PCM samples (interleaved when channels > 1) as RIFF/WAVE. */
  def encodeWavPcm16(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    val data = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      data(i * 2) = (samples(i) & 0xff).toByte
      data(i * 2 + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val blockAlign = channels * 2
    val out = new ByteArrayOutputStream()
    out.write("RIFF".getBytes(StandardCharsets.US_ASCII))
    out.write(u32le(36L + data.length))
    out.write("WAVE".getBytes(StandardCharsets.US_ASCII))
    out.write("fmt ".getBytes(StandardCharsets.US_ASCII))
    out.write(u32le(16L))
    out.write(u16le(1)) // PCM
    out.write(u16le(channels))
    out.write(u32le(sampleRate.toLong))
    out.write(u32le(sampleRate.toLong * blockAlign))
    out.write(u16le(blockAlign))
    out.write(u16le(16))
    out.write("data".getBytes(StandardCharsets.US_ASCII))
    out.write(u32le(data.length.toLong))
    out.write(data)
    out.toByteArray
  }

  /** Walk RIFF chunks for fmt + data; None for non-WAV/corrupt input. */
  def decodeWav(bytes: Array[Byte]): Option[WavAudio] = {
    try {
      if (bytes == null || bytes.length < 44) return None
      def tag(off: Int) = new String(bytes, off, 4, StandardCharsets.US_ASCII)
      if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
      var off = 12
      var rate = -1; var channels = -1; var bits = -1
      var data: Array[Byte] = null
      while (off + 8 <= bytes.length) {
        val id = tag(off)
        val len = readU32le(bytes, off + 4).toInt
        if (len < 0 || off + 8 + len > bytes.length) return None
        id match {
          case "fmt " if len >= 16 =>
            channels = readU16le(bytes, off + 10)
            rate = readU32le(bytes, off + 12).toInt
            bits = readU16le(bytes, off + 22)
          case "data" => data = java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + len)
          case _ => ()
        }
        off += 8 + len + (len & 1) // RIFF chunks are word-aligned
      }
      if (rate <= 0 || channels <= 0 || bits <= 0 || data == null) None
      else Some(WavAudio(rate, channels, bits, data))
    } catch { case _: Exception => None }
  }

  // ------------------------------------------------------------------ AVI

  /** Uncompressed RGB video: frames are RGB8 top-down row-major (same
    * layout as PngImage.rgb), one Array per frame.
    */
  final case class AviVideo(
      width: Int, height: Int, microSecPerFrame: Long, frames: Vector[Array[Byte]]) {
    def nFrames: Int = frames.length
    def durationMs: Long = nFrames * microSecPerFrame / 1000L
  }

  private def fourcc(s: String): Array[Byte] = s.getBytes(StandardCharsets.US_ASCII)

  /** Encode uncompressed 24-bit RGB frames as a RIFF AVI (public
    * Microsoft 'AVI ' form: LIST hdrl {avih, LIST strl {strh 'vids'/'DIB ',
    * strf BITMAPINFOHEADER BI_RGB}}, LIST movi {'00db' DIB frames}). Frame
    * pixel data is converted to the DIB wire layout: bottom-up rows, BGR,
    * each row padded to a 4-byte boundary.
    */
  def encodeAviRgb24(
      width: Int, height: Int, microSecPerFrame: Long,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0 && microSecPerFrame > 0)
    frames.foreach(f => require(f.length == width * height * 3,
      s"frame length ${f.length} != w*h*3 (${width}x$height)"))
    val rowBytes = width * 3
    val paddedRow = (rowBytes + 3) & ~3
    val dibSize = paddedRow * height

    def dibOf(rgb: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](dibSize)
      var y = 0
      while (y < height) {
        val srcRow = y * rowBytes
        val dstRow = (height - 1 - y) * paddedRow // bottom-up
        var x = 0
        while (x < width) {
          out(dstRow + x * 3) = rgb(srcRow + x * 3 + 2) // B
          out(dstRow + x * 3 + 1) = rgb(srcRow + x * 3 + 1) // G
          out(dstRow + x * 3 + 2) = rgb(srcRow + x * 3) // R
          x += 1
        }
        y += 1
      }
      out
    }

    def list(kind: String, body: Array[Byte]): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      out.write(fourcc("LIST")); out.write(u32le(4L + body.length))
      out.write(fourcc(kind)); out.write(body)
      out.toByteArray
    }
    def ck(id: String, body: Array[Byte]): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      out.write(fourcc(id)); out.write(u32le(body.length.toLong)); out.write(body)
      if ((body.length & 1) == 1) out.write(0) // RIFF word alignment
      out.toByteArray
    }

    // MainAVIHeader (56 bytes)
    val avih = new ByteArrayOutputStream()
    avih.write(u32le(microSecPerFrame))
    avih.write(u32le(dibSize.toLong * 1000000L / microSecPerFrame)) // maxBytesPerSec
    avih.write(u32le(0L)) // paddingGranularity
    avih.write(u32le(0x10L)) // AVIF_HASINDEX off; 0x10 = WASCAPTUREFILE-ish flags unused
    avih.write(u32le(frames.length.toLong)) // totalFrames
    avih.write(u32le(0L)) // initialFrames
    avih.write(u32le(1L)) // streams
    avih.write(u32le(dibSize.toLong)) // suggestedBufferSize
    avih.write(u32le(width.toLong))
    avih.write(u32le(height.toLong))
    (0 until 4).foreach(_ => avih.write(u32le(0L))) // reserved

    // AVIStreamHeader (56 bytes)
    val strh = new ByteArrayOutputStream()
    strh.write(fourcc("vids"))
    strh.write(fourcc("DIB "))
    strh.write(u32le(0L)) // flags
    strh.write(u16le(0)); strh.write(u16le(0)) // priority, language
    strh.write(u32le(0L)) // initialFrames
    strh.write(u32le(microSecPerFrame)) // scale
    strh.write(u32le(1000000L)) // rate => fps = rate/scale
    strh.write(u32le(0L)) // start
    strh.write(u32le(frames.length.toLong)) // length (in frames)
    strh.write(u32le(dibSize.toLong)) // suggestedBufferSize
    strh.write(u32le(0xffffffffL)) // quality
    strh.write(u32le(0L)) // sampleSize
    strh.write(u16le(0)); strh.write(u16le(0)) // rcFrame
    strh.write(u16le(width)); strh.write(u16le(height))

    // BITMAPINFOHEADER (40 bytes), biCompression = 0 (BI_RGB)
    val strf = new ByteArrayOutputStream()
    strf.write(u32le(40L))
    strf.write(u32le(width.toLong))
    strf.write(u32le(height.toLong)) // positive = bottom-up
    strf.write(u16le(1)) // planes
    strf.write(u16le(24)) // bitCount
    strf.write(u32le(0L)) // BI_RGB
    strf.write(u32le(dibSize.toLong))
    strf.write(u32le(0L)); strf.write(u32le(0L)) // pels/meter
    strf.write(u32le(0L)); strf.write(u32le(0L)) // clrUsed/Important

    val strl = list("strl",
      ck("strh", strh.toByteArray) ++ ck("strf", strf.toByteArray))
    val hdrl = list("hdrl", ck("avih", avih.toByteArray) ++ strl)
    val movi = list("movi",
      frames.toArray.flatMap(f => ck("00db", dibOf(f))))

    val body = new ByteArrayOutputStream()
    body.write(fourcc("AVI "))
    body.write(hdrl)
    body.write(movi)
    val bytes = body.toByteArray
    val out = new ByteArrayOutputStream()
    out.write(fourcc("RIFF")); out.write(u32le(bytes.length.toLong)); out.write(bytes)
    out.toByteArray
  }

  /** Decode an uncompressed-RGB24 AVI produced by any conformant writer
    * (BI_RGB '00db'/'00dc' frames, bottom-up or top-down DIB rows, 4-byte
    * row padding). Returns None — never throws — for anything else
    * (compressed codecs, non-AVI RIFF, corrupt/truncated bytes).
    */
  def decodeAvi(bytes: Array[Byte]): Option[AviVideo] = {
    try {
      if (bytes == null || bytes.length < 12) return None
      def tag(off: Int) = new String(bytes, off, 4, StandardCharsets.US_ASCII)
      if (tag(0) != "RIFF" || tag(8) != "AVI ") return None

      var width = -1; var height = -1; var microSec = -1L
      var bitCount = -1; var compression = -1L; var topDown = false
      val frames = Vector.newBuilder[Array[Byte]]

      // Walk chunks in [off, end); LISTs recurse into their body.
      def walk(off0: Int, end: Int): Boolean = { // false = structurally invalid
        var off = off0
        while (off + 8 <= end) {
          val id = tag(off)
          val len = readU32le(bytes, off + 4).toInt
          if (len < 0 || off + 8 + len > end) return false
          if (id == "LIST") {
            if (len < 4) return false
            if (!walk(off + 12, off + 8 + len)) return false
          } else id match {
            case "avih" if len >= 40 =>
              microSec = readU32le(bytes, off + 8)
              width = readU32le(bytes, off + 40).toInt
              height = readU32le(bytes, off + 44).toInt
            case "strf" if len >= 40 =>
              // BITMAPINFOHEADER; negative biHeight = top-down rows
              val bw = readU32le(bytes, off + 12).toInt
              val bh = readU32le(bytes, off + 16).toInt
              if (width <= 0) width = bw
              if (bh < 0) { topDown = true; if (height <= 0) height = -bh }
              else if (height <= 0) height = bh
              bitCount = readU16le(bytes, off + 22)
              compression = readU32le(bytes, off + 24)
            case f if f.endsWith("db") || f.endsWith("dc") => // '##db'/'##dc' frames
              frames += java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + len)
            case _ => ()
          }
          off += 8 + len + (len & 1) // RIFF chunks are word-aligned
        }
        true
      }
      if (!walk(12, bytes.length)) return None
      if (width <= 0 || height <= 0 || microSec <= 0) return None
      if (bitCount != 24 || compression != 0L) return None // only BI_RGB 24bpp

      val rowBytes = width * 3
      val paddedRow = (rowBytes + 3) & ~3
      val dibSize = paddedRow * height
      val rgbFrames = frames.result().map { dib =>
        if (dib.length != dibSize) return None
        val rgb = new Array[Byte](height * rowBytes)
        var y = 0
        while (y < height) {
          val srcRow = (if (topDown) y else height - 1 - y) * paddedRow
          val dstRow = y * rowBytes
          var x = 0
          while (x < width) {
            rgb(dstRow + x * 3) = dib(srcRow + x * 3 + 2) // R
            rgb(dstRow + x * 3 + 1) = dib(srcRow + x * 3 + 1) // G
            rgb(dstRow + x * 3 + 2) = dib(srcRow + x * 3) // B
            x += 1
          }
          y += 1
        }
        rgb
      }
      if (rgbFrames.isEmpty) return None
      Some(AviVideo(width, height, microSec, rgbFrames))
    } catch { case _: Exception => None }
  }

  // ------------------------------------------------------------------ BMP

  /** Encode RGB8 as a classic 24-bit uncompressed BMP (BITMAPINFOHEADER,
    * BI_RGB, bottom-up rows, BGR byte order, 4-byte row padding).
    */
  def encodeBmp(img: PngImage): Array[Byte] = {
    require(img.rgb.length == img.width * img.height * 3, "rgb length mismatch")
    val rowSize = (img.width * 3 + 3) & ~3
    val dataSize = rowSize * img.height
    val out = new ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def u32(v: Long): Unit = out.write(u32le(v))
    out.write('B'); out.write('M')
    u32(14 + 40 + dataSize) // file size
    u16(0); u16(0)
    u32(14 + 40) // pixel data offset
    u32(40) // BITMAPINFOHEADER
    u32(img.width.toLong); u32(img.height.toLong)
    u16(1); u16(24) // planes, bpp
    u32(0) // BI_RGB
    u32(dataSize.toLong)
    u32(2835); u32(2835); u32(0); u32(0) // 72 dpi, no palette
    val row = new Array[Byte](rowSize)
    var y = img.height - 1
    while (y >= 0) { // bottom-up
      java.util.Arrays.fill(row, 0.toByte)
      var x = 0
      while (x < img.width) {
        val p = (y * img.width + x) * 3
        row(x * 3) = img.rgb(p + 2) // B
        row(x * 3 + 1) = img.rgb(p + 1) // G
        row(x * 3 + 2) = img.rgb(p) // R
        x += 1
      }
      out.write(row, 0, rowSize)
      y -= 1
    }
    out.toByteArray
  }

  /** Decode a 24-bit uncompressed BMP (bottom-up or top-down). Other
    * depths/compressions → None.
    */
  def decodeBmp(bytes: Array[Byte]): Option[PngImage] = {
    try {
      if (bytes == null || bytes.length < 54 ||
        bytes(0) != 'B' || bytes(1) != 'M') return None
      val dataOff = readU32le(bytes, 10).toInt
      val headerSize = readU32le(bytes, 14).toInt
      if (headerSize < 40) return None
      val width = readU32le(bytes, 18).toInt
      val rawH = readU32le(bytes, 22).toInt
      val height = math.abs(rawH)
      val topDown = rawH < 0
      val bpp = readU16le(bytes, 28)
      val compression = readU32le(bytes, 30)
      if (width <= 0 || height <= 0 || bpp != 24 || compression != 0) return None
      val rowSize = (width * 3 + 3) & ~3
      if (dataOff + rowSize * height > bytes.length) return None
      val rgb = new Array[Byte](width * height * 3)
      var y = 0
      while (y < height) {
        val srcRow = if (topDown) y else height - 1 - y
        val src = dataOff + srcRow * rowSize
        var x = 0
        while (x < width) {
          val p = (y * width + x) * 3
          rgb(p) = bytes(src + x * 3 + 2) // R
          rgb(p + 1) = bytes(src + x * 3 + 1) // G
          rgb(p + 2) = bytes(src + x * 3) // B
          x += 1
        }
        y += 1
      }
      Some(PngImage(width, height, rgb))
    } catch { case _: Exception => None }
  }

  // ------------------------------------- header sniffing (jpeg/gif/bmp/…)

  /** (format, width, height) from the binary header alone, or None.
    * JPEG dimensions come from the first SOF0/1/2 marker; GIF from the
    * logical screen descriptor; BMP from BITMAPINFOHEADER (negative
    * height = top-down rows → abs). PNG/WAV delegate to the full parsers.
    */
  def sniffDims(bytes: Array[Byte]): Option[(String, Int, Int)] = {
    try {
      if (bytes == null || bytes.length < 12) return None
      if (PngSig.indices.forall(i => bytes(i) == PngSig(i))) {
        // header-only: IHDR is always first
        if (bytes.length < 24) return None
        return Some(("png", readU32be(bytes, 16).toInt, readU32be(bytes, 20).toInt))
      }
      if ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) {
        var off = 2
        while (off + 4 <= bytes.length) {
          if ((bytes(off) & 0xff) != 0xff) return None
          val marker = bytes(off + 1) & 0xff
          if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) { off += 2 }
          else {
            if (off + 4 > bytes.length) return None
            val len = ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)
            if (marker == 0xc0 || marker == 0xc1 || marker == 0xc2) {
              if (off + 9 > bytes.length) return None
              val h = ((bytes(off + 5) & 0xff) << 8) | (bytes(off + 6) & 0xff)
              val w = ((bytes(off + 7) & 0xff) << 8) | (bytes(off + 8) & 0xff)
              return Some(("jpeg", w, h))
            }
            if (marker == 0xd9 || marker == 0xda) return None // hit EOI/SOS without SOF
            off += 2 + len
          }
        }
        return None
      }
      if (bytes.length >= 10 && bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F')
        return Some(("gif", readU16le(bytes, 6), readU16le(bytes, 8)))
      if (bytes.length >= 26 && bytes(0) == 'B' && bytes(1) == 'M')
        return Some(("bmp", readU32le(bytes, 18).toInt, math.abs(readU32le(bytes, 22).toInt)))
      None
    } catch { case _: Exception => None }
  }
}
