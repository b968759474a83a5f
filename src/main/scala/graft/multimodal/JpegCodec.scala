package graft.multimodal

import java.io.ByteArrayOutputStream

/** Baseline JPEG codec, pure JDK, implemented directly from the public
  * ITU-T T.81 specification (the JPEG standard): a 4:4:4 baseline
  * sequential ENCODER (level shift → FDCT → quality-scaled Annex-K
  * quantization → zigzag → DC-difference + AC run-length Huffman with
  * the Annex-K typical tables) and a general baseline DECODER (DQT /
  * SOF0 / DHT / DRI / SOS marker parse, byte-stuffed Huffman bitstream,
  * restart markers, dequantize → IDCT → chroma upsampling for any
  * sampling factors up to 2×2 → YCbCr→RGB).
  *
  * The decoder handles the shapes a real crawl contains — 4:2:0 and
  * 4:2:2 subsampled baseline JFIFs (what every mainstream encoder
  * emits) — not just this encoder's own 4:4:4 output; progressive
  * (SOF2) and arithmetic-coded files are rejected with None, falling
  * back to the documented stub path. This closes the round-7 gap where
  * perceptual image dedup silently covered only PNG-backed rows
  * (reference capability: /root/reference/configuration-reference/
  * schema.md:24 — BYTES columns with real transform compute over them).
  */
object JpegCodec {

  // ------------------------------------------------------------ tables

  /** Zigzag order: zigzag(i) = natural index of the i-th coefficient. */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** T.81 Annex K.1 luminance / chrominance quantization tables
    * (natural order after the zigzag mapping below).
    */
  private val StdLumaQ: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  private val StdChromaQ: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  /** T.81 Annex K.3 typical Huffman tables: (bits[1..16], values). */
  private val DcLumaBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumaVals = (0 to 11).map(_.toByte).toArray
  private val DcChromaBits = Array(0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChromaVals = (0 to 11).map(_.toByte).toArray

  private val AcLumaBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumaVals: Array[Byte] = Array(
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
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa).map(_.toByte)

  private val AcChromaBits = Array(0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChromaVals: Array[Byte] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
    0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
    0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa).map(_.toByte)

  /** Quality 1..100 → table scale factor, the public IJG convention. */
  private def scaledTable(base: Array[Int], quality: Int): Array[Int] = {
    val q = quality.max(1).min(100)
    val scale = if (q < 50) 5000 / q else 200 - q * 2
    base.map(v => ((v * scale + 50) / 100).max(1).min(255))
  }

  // ---------------------------------------------------------- encoder

  private final class BitWriter(out: ByteArrayOutputStream) {
    private var acc = 0L
    private var nBits = 0
    def write(bits: Int, n: Int): Unit = {
      acc = (acc << n) | (bits & ((1L << n) - 1))
      nBits += n
      while (nBits >= 8) {
        val b = ((acc >> (nBits - 8)) & 0xff).toInt
        out.write(b)
        if (b == 0xff) out.write(0x00) // byte stuffing
        nBits -= 8
      }
    }
    def flush(): Unit = if (nBits > 0) write(0x7f, 8 - nBits) // 1-pad
  }

  /** (code, length) per symbol from a (bits, vals) table — T.81 C.2. */
  private def buildEncTable(bits: Array[Int], vals: Array[Byte]): Array[(Int, Int)] = {
    val table = new Array[(Int, Int)](256)
    var code = 0
    var k = 0
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < bits(len)) {
        table(vals(k) & 0xff) = (code, len)
        code += 1; k += 1; i += 1
      }
      code <<= 1
      len += 1
    }
    table
  }

  /** cos((2x+1)·u·π/16) indexed (x, u) — shared by FDCT and IDCT. A
    * per-coefficient math.cos would cost 8192 libm calls per block and
    * was measured 20× the whole dedup-image query; with the table and
    * the separable row/column factorization each block is 1k multiplies.
    */
  private val Cos: Array[Double] = Array.tabulate(64) { i =>
    math.cos((2 * (i / 8) + 1) * (i % 8) * math.Pi / 16)
  }
  private val Cu: Array[Double] =
    Array.tabulate(8)(u => if (u == 0) 1 / math.sqrt(2) else 1.0)

  private def fdct(block: Array[Double]): Array[Double] = {
    // t(x, v) = Σ_y f(x, y)·cos(y, v); out(u, v) = ¼ cu cv Σ_x t(x, v)·cos(x, u)
    val t = new Array[Double](64)
    var x = 0
    while (x < 8) {
      var v = 0
      while (v < 8) {
        var sum = 0.0
        var y = 0
        while (y < 8) { sum += block(x * 8 + y) * Cos(y * 8 + v); y += 1 }
        t(x * 8 + v) = sum
        v += 1
      }
      x += 1
    }
    val out = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var sum = 0.0
        var x2 = 0
        while (x2 < 8) { sum += t(x2 * 8 + v) * Cos(x2 * 8 + u); x2 += 1 }
        out(u * 8 + v) = 0.25 * Cu(u) * Cu(v) * sum
        v += 1
      }
      u += 1
    }
    out
  }

  private def magnitudeCategory(v: Int): Int = {
    var size = 0
    var a = math.abs(v)
    while (a != 0) { size += 1; a >>= 1 }
    size
  }

  /** Encode an RGB8 image as a baseline 4:4:4 JFIF. */
  def encodeJpeg(img: MediaCodec.PngImage, quality: Int = 90): Array[Byte] = {
    require(img.rgb.length == img.width * img.height * 3, "rgb length mismatch")
    val lumaQ = scaledTable(StdLumaQ, quality)
    val chromaQ = scaledTable(StdChromaQ, quality)
    val out = new ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def segment(m: Int, payload: Array[Byte]): Unit = {
      marker(m)
      val len = payload.length + 2
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
      out.write(payload, 0, payload.length)
    }
    marker(0xd8) // SOI
    segment(0xe0, Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    // DQT: table 0 (luma), table 1 (chroma), zigzag order
    def dqt(id: Int, q: Array[Int]): Array[Byte] =
      (id.toByte +: (0 until 64).map(i => q(Zigzag(i)).toByte)).toArray
    segment(0xdb, dqt(0, lumaQ))
    segment(0xdb, dqt(1, chromaQ))
    // SOF0: 3 components, all 1×1 sampling (4:4:4)
    segment(0xc0, Array[Byte](8,
      ((img.height >> 8) & 0xff).toByte, (img.height & 0xff).toByte,
      ((img.width >> 8) & 0xff).toByte, (img.width & 0xff).toByte,
      3,
      1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1))
    // DHT ×4
    def dht(cls: Int, id: Int, bits: Array[Int], vals: Array[Byte]): Array[Byte] =
      Array(((cls << 4) | id).toByte) ++ (1 to 16).map(i => bits(i).toByte) ++ vals
    segment(0xc4, dht(0, 0, DcLumaBits, DcLumaVals))
    segment(0xc4, dht(1, 0, AcLumaBits, AcLumaVals))
    segment(0xc4, dht(0, 1, DcChromaBits, DcChromaVals))
    segment(0xc4, dht(1, 1, AcChromaBits, AcChromaVals))
    // SOS
    segment(0xda, Array[Byte](3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0))

    val dcLuma = buildEncTable(DcLumaBits, DcLumaVals)
    val acLuma = buildEncTable(AcLumaBits, AcLumaVals)
    val dcChroma = buildEncTable(DcChromaBits, DcChromaVals)
    val acChroma = buildEncTable(AcChromaBits, AcChromaVals)
    val bw = new BitWriter(out)
    val lastDc = Array(0, 0, 0)

    def emitBlock(block: Array[Double], comp: Int): Unit = {
      val q = if (comp == 0) lumaQ else chromaQ
      val dcTab = if (comp == 0) dcLuma else dcChroma
      val acTab = if (comp == 0) acLuma else acChroma
      val coefs = fdct(block)
      val quant = new Array[Int](64)
      var i = 0
      while (i < 64) {
        val nat = Zigzag(i)
        quant(i) = math.round(coefs(nat) / q(nat)).toInt
        i += 1
      }
      // DC
      val diff = quant(0) - lastDc(comp)
      lastDc(comp) = quant(0)
      val dcSize = magnitudeCategory(diff)
      val (dcCode, dcLen) = dcTab(dcSize)
      bw.write(dcCode, dcLen)
      if (dcSize > 0)
        bw.write(if (diff >= 0) diff else diff + (1 << dcSize) - 1, dcSize)
      // AC
      var run = 0
      var k = 1
      while (k < 64) {
        val v = quant(k)
        if (v == 0) run += 1
        else {
          while (run >= 16) {
            val (zrl, zl) = acTab(0xf0); bw.write(zrl, zl); run -= 16
          }
          val size = magnitudeCategory(v)
          val (c, l) = acTab((run << 4) | size)
          bw.write(c, l)
          bw.write(if (v >= 0) v else v + (1 << size) - 1, size)
          run = 0
        }
        k += 1
      }
      if (run > 0) { val (eob, el) = acTab(0x00); bw.write(eob, el) }
    }

    val blocksX = (img.width + 7) / 8
    val blocksY = (img.height + 7) / 8
    val block = new Array[Double](64)
    var by = 0
    while (by < blocksY) {
      var bx = 0
      while (bx < blocksX) {
        var comp = 0
        while (comp < 3) {
          var yy = 0
          while (yy < 8) {
            var xx = 0
            while (xx < 8) {
              // clamp-to-edge sampling for partial boundary blocks
              val px = (bx * 8 + xx).min(img.width - 1)
              val py = (by * 8 + yy).min(img.height - 1)
              val p = (py * img.width + px) * 3
              val r = img.rgb(p) & 0xff
              val g = img.rgb(p + 1) & 0xff
              val b = img.rgb(p + 2) & 0xff
              val v = comp match {
                case 0 => 0.299 * r + 0.587 * g + 0.114 * b
                case 1 => -0.168736 * r - 0.331264 * g + 0.5 * b + 128
                case _ => 0.5 * r - 0.418688 * g - 0.081312 * b + 128
              }
              block(yy * 8 + xx) = v - 128
              xx += 1
            }
            yy += 1
          }
          emitBlock(block, comp)
          comp += 1
        }
        bx += 1
      }
      by += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  // ---------------------------------------------------------- decoder

  private final class HuffTable(bits: Array[Int], vals: Array[Byte]) {
    // minCode/maxCode/valPtr per length — T.81 F.2.2.3 DECODE procedure
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var len = 1
      while (len <= 16) {
        if (bits(len) == 0) { maxCode(len) = -1 }
        else {
          valPtr(len) = k
          minCode(len) = code
          code += bits(len); k += bits(len)
          maxCode(len) = code - 1
        }
        code <<= 1
        len += 1
      }
    }
    def value(len: Int, code: Int): Int =
      vals(valPtr(len) + code - minCode(len)) & 0xff
  }

  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nBits = 0
    var sawMarker = false

    def align(): Unit = { acc = 0; nBits = 0 }

    /** Next payload byte; 0xFF00 unstuffs to 0xFF; a real marker sets
      * sawMarker and yields synthetic zero bits (decoder stops at EOB /
      * restart boundaries before consuming them meaningfully).
      */
    private def nextByte(): Int = {
      if (pos >= data.length) { sawMarker = true; return 0 }
      val b = data(pos) & 0xff
      pos += 1
      if (b == 0xff) {
        val b2 = if (pos < data.length) data(pos) & 0xff else 0xd9
        if (b2 == 0x00) { pos += 1; 0xff }
        else { pos -= 1; sawMarker = true; 0 }
      } else b
    }

    def readBit(): Int = {
      if (nBits == 0) { acc = nextByte(); nBits = 8 }
      nBits -= 1
      (acc >> nBits) & 1
    }

    def readBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }

    def decodeHuff(t: HuffTable): Int = {
      var code = readBit()
      var len = 1
      while (len <= 16 && (t.maxCode(len) < 0 || code > t.maxCode(len))) {
        code = (code << 1) | readBit()
        len += 1
      }
      if (len > 16) throw new IllegalArgumentException("bad huffman code")
      t.value(len, code)
    }
  }

  private def extend(v: Int, size: Int): Int =
    if (size == 0) 0
    else if (v < (1 << (size - 1))) v - (1 << size) + 1
    else v

  private def idct(coefs: Array[Double]): Array[Double] = {
    // t(u, y) = Σ_v cv F(u, v)·cos(y, v); f(x, y) = ¼ Σ_u cu t(u, y)·cos(x, u)
    val t = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var y = 0
      while (y < 8) {
        var sum = 0.0
        var v = 0
        while (v < 8) { sum += Cu(v) * coefs(u * 8 + v) * Cos(y * 8 + v); v += 1 }
        t(u * 8 + y) = sum
        y += 1
      }
      u += 1
    }
    val out = new Array[Double](64)
    var x = 0
    while (x < 8) {
      var y = 0
      while (y < 8) {
        var sum = 0.0
        var u2 = 0
        while (u2 < 8) { sum += Cu(u2) * t(u2 * 8 + y) * Cos(x * 8 + u2); u2 += 1 }
        out(x * 8 + y) = sum * 0.25
        y += 1
      }
      x += 1
    }
    out
  }

  private final case class Component(
      id: Int, h: Int, v: Int, qId: Int,
      var dcTab: Int = 0, var acTab: Int = 0)

  /** Decode a baseline sequential JPEG to RGB8. Progressive /
    * arithmetic / unsupported shapes → None.
    */
  def decodeJpeg(bytes: Array[Byte]): Option[MediaCodec.PngImage] = {
    try {
      if (bytes == null || bytes.length < 4 ||
        (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8) return None
      val quant = new Array[Array[Int]](4)
      val dcTabs = new Array[HuffTable](4)
      val acTabs = new Array[HuffTable](4)
      var comps: Array[Component] = null
      var width = 0
      var height = 0
      var restartInterval = 0
      var pos = 2
      def u16(o: Int) = ((bytes(o) & 0xff) << 8) | (bytes(o + 1) & 0xff)

      var scanStart = -1
      while (scanStart < 0) {
        if (pos + 4 > bytes.length) return None
        if ((bytes(pos) & 0xff) != 0xff) return None
        val m = bytes(pos + 1) & 0xff
        if (m == 0xff) { pos += 1 } // fill byte before a marker
        else if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7)) { pos += 2 }
        else if (m == 0xd9) return None // EOI before SOS
        else {
          val len = u16(pos + 2)
          val seg = pos + 4
          m match {
            case 0xdb => // DQT: one or more tables
              var o = seg
              while (o < seg + len - 2) {
                val prec = (bytes(o) & 0xff) >> 4
                val id = bytes(o) & 0x0f
                o += 1
                val t = new Array[Int](64)
                var i = 0
                while (i < 64) {
                  t(Zigzag(i)) =
                    if (prec == 0) bytes(o + i) & 0xff
                    else u16(o + i * 2)
                  i += 1
                }
                o += (if (prec == 0) 64 else 128)
                quant(id) = t
              }
            case 0xc4 => // DHT: one or more tables
              var o = seg
              while (o < seg + len - 2) {
                val cls = (bytes(o) & 0xff) >> 4
                val id = bytes(o) & 0x0f
                val bits = new Array[Int](17)
                var total = 0
                var i = 1
                while (i <= 16) { bits(i) = bytes(o + i) & 0xff; total += bits(i); i += 1 }
                val vals = new Array[Byte](total)
                System.arraycopy(bytes, o + 17, vals, 0, total)
                val t = new HuffTable(bits, vals)
                if (cls == 0) dcTabs(id) = t else acTabs(id) = t
                o += 17 + total
              }
            case 0xc0 | 0xc1 => // baseline / extended sequential SOF
              height = u16(seg + 1)
              width = u16(seg + 3)
              val n = bytes(seg + 5) & 0xff
              comps = Array.tabulate(n) { i =>
                val o = seg + 6 + i * 3
                Component(bytes(o) & 0xff,
                  (bytes(o + 1) & 0xff) >> 4, bytes(o + 1) & 0x0f,
                  bytes(o + 2) & 0xff)
              }
            case 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
                 0xcd | 0xce | 0xcf =>
              return None // progressive / hierarchical / arithmetic
            case 0xdd =>
              restartInterval = u16(seg)
            case 0xda => // SOS
              val n = bytes(seg) & 0xff
              var i = 0
              while (i < n) {
                val cid = bytes(seg + 1 + i * 2) & 0xff
                val tabs = bytes(seg + 2 + i * 2) & 0xff
                comps.find(_.id == cid).foreach { c =>
                  c.dcTab = tabs >> 4; c.acTab = tabs & 0x0f
                }
                i += 1
              }
              scanStart = seg + 1 + n * 2 + 3
            case _ => () // APPn / COM / other: skip
          }
          if (scanStart < 0) pos += 2 + len
        }
      }
      if (comps == null || width <= 0 || height <= 0) return None
      if (comps.length != 3 && comps.length != 1) return None
      if (comps.exists(c => c.h < 1 || c.h > 2 || c.v < 1 || c.v > 2)) return None

      val hMax = comps.map(_.h).max
      val vMax = comps.map(_.v).max
      val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
      val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
      // per-component plane at its own resolution
      val planes = comps.map { c =>
        new Array[Double](mcusX * c.h * 8 * mcusY * c.v * 8)
      }
      val planeW = comps.map(c => mcusX * c.h * 8)

      val br = new BitReader(bytes, scanStart)
      val lastDc = new Array[Int](comps.length)
      val coefs = new Array[Double](64)
      var mcu = 0
      val nMcus = mcusX * mcusY
      while (mcu < nMcus) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          // byte-align and consume the RSTn marker
          br.align()
          var p = br.pos
          while (p + 1 < bytes.length &&
            !((bytes(p) & 0xff) == 0xff && (bytes(p + 1) & 0xf8) == 0xd0)) p += 1
          br.pos = p + 2
          br.sawMarker = false
          java.util.Arrays.fill(lastDc, 0)
        }
        val mx = mcu % mcusX
        val my = mcu / mcusX
        var ci = 0
        while (ci < comps.length) {
          val c = comps(ci)
          val q = quant(c.qId)
          if (q == null) return None
          var byi = 0
          while (byi < c.v) {
            var bxi = 0
            while (bxi < c.h) {
              java.util.Arrays.fill(coefs, 0.0)
              val dcTab = dcTabs(c.dcTab)
              val acTab = acTabs(c.acTab)
              if (dcTab == null || acTab == null) return None
              val s = br.decodeHuff(dcTab)
              val diff = extend(br.readBits(s), s)
              lastDc(ci) += diff
              coefs(0) = lastDc(ci).toDouble * q(0)
              var k = 1
              while (k < 64) {
                val rs = br.decodeHuff(acTab)
                val r = rs >> 4
                val sz = rs & 0x0f
                if (sz == 0) {
                  if (r == 15) k += 16 // ZRL
                  else k = 64 // EOB
                } else {
                  k += r
                  if (k > 63) throw new IllegalArgumentException("AC overflow")
                  val nat = Zigzag(k)
                  coefs(nat) = extend(br.readBits(sz), sz).toDouble * q(nat)
                  k += 1
                }
              }
              val px = idct(coefs)
              val plane = planes(ci)
              val pw = planeW(ci)
              val ox = (mx * c.h + bxi) * 8
              val oy = (my * c.v + byi) * 8
              var yy = 0
              while (yy < 8) {
                var xx = 0
                while (xx < 8) {
                  plane((oy + yy) * pw + ox + xx) = px(yy * 8 + xx) + 128
                  xx += 1
                }
                yy += 1
              }
              bxi += 1
            }
            byi += 1
          }
          ci += 1
        }
        mcu += 1
      }

      val rgb = new Array[Byte](width * height * 3)
      def clamp(v: Double): Byte = math.round(v).max(0).min(255).toByte
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          // Centered-siting triangle upsampling (what libjpeg calls
          // "fancy"): chroma sample i covers luma [2i, 2i+1], so output
          // pixel p interpolates at (p+0.5)/f − 0.5 with 3/4–1/4 weights
          // at a 2× factor. Nearest-neighbor here was measured 100/255
          // off libjpeg at sharp chroma edges; this agrees to ±few.
          def sample(ci: Int): Double = {
            val c = comps(ci)
            val fx = hMax / c.h
            val fy = vMax / c.v
            val pw = planeW(ci)
            val cw = (width + fx - 1) / fx // valid (non-pad) samples
            val ch = (height + fy - 1) / fy
            def axis(p: Int, f: Int, hi: Int): (Int, Int, Double) =
              if (f == 1) (p.min(hi), p.min(hi), 0.0)
              else {
                val pos = (p + 0.5) / f - 0.5
                val lo = math.floor(pos).toInt
                val frac = pos - lo
                (lo.max(0).min(hi), (lo + 1).max(0).min(hi), frac)
              }
            val (x0, x1, wx) = axis(x, fx, cw - 1)
            val (y0, y1, wy) = axis(y, fy, ch - 1)
            val plane = planes(ci)
            val top = plane(y0 * pw + x0) * (1 - wx) + plane(y0 * pw + x1) * wx
            val bot = plane(y1 * pw + x0) * (1 - wx) + plane(y1 * pw + x1) * wx
            top * (1 - wy) + bot * wy
          }
          val p = (y * width + x) * 3
          if (comps.length == 1) {
            val g = clamp(sample(0))
            rgb(p) = g; rgb(p + 1) = g; rgb(p + 2) = g
          } else {
            val yv = sample(0)
            val cb = sample(1) - 128
            val cr = sample(2) - 128
            rgb(p) = clamp(yv + 1.402 * cr)
            rgb(p + 1) = clamp(yv - 0.344136 * cb - 0.714136 * cr)
            rgb(p + 2) = clamp(yv + 1.772 * cb)
          }
          x += 1
        }
        y += 1
      }
      Some(MediaCodec.PngImage(width, height, rgb))
    } catch { case _: Exception => None }
  }
}
