package graft.multimodal

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.{CRC32, Deflater, Inflater}

/** Real, dependency-free media codecs (pure JDK): a PNG encoder/decoder
  * (RGB8, all five scanline filters on decode; `java.util.zip` deflate +
  * CRC32), a WAV PCM encoder/decoder (RIFF chunk walk), and header
  * sniffing for JPEG (SOF marker scan), GIF and BMP. This replaces the
  * round-1 "decode is a stub" compromise for the formats a JVM can decode
  * natively; video decode remains out of scope (no container/av libs
  * here) and still rides the documented stub path.
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
