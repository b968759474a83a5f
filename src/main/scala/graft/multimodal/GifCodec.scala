package graft.multimodal

import java.io.ByteArrayOutputStream

/** GIF codec, pure JDK, implemented from the public GIF89a
  * specification: a full LZW DECODER (variable-width codes, CLEAR/EOI,
  * dictionary growth to 12 bits, interlace de-weave, local color
  * tables, first frame of an animation) and a deterministic ENCODER
  * (global palette built from the image's distinct colors, ≤256
  * required; LZW written in the classic constant-width form that issues
  * a CLEAR before the dictionary would force a width change — smaller
  * encoders exist, but byte-identical output for identical pixels is
  * what corpus fingerprints need).
  *
  * GIF is lossless, so decode(encode(img)) must round-trip pixels
  * EXACTLY — asserted in MediaCodecFormatsSpec together with
  * cross-decoder agreement against the JDK's own ImageIO reader.
  */
object GifCodec {

  // ---------------------------------------------------------- encoder

  /** Encode RGB8 as a single-frame GIF89a. Fails (None) above 256
    * distinct colors — the format's hard palette limit; a corpus
    * pipeline quantizes before calling this.
    */
  def encodeGif(img: MediaCodec.PngImage): Option[Array[Byte]] = {
    val n = img.width * img.height
    require(img.rgb.length == n * 3, "rgb length mismatch")
    // palette in first-appearance order → deterministic bytes
    val colorIndex = scala.collection.mutable.LinkedHashMap.empty[Int, Int]
    val indices = new Array[Int](n)
    var i = 0
    while (i < n) {
      val c = ((img.rgb(i * 3) & 0xff) << 16) |
        ((img.rgb(i * 3 + 1) & 0xff) << 8) | (img.rgb(i * 3 + 2) & 0xff)
      indices(i) = colorIndex.getOrElseUpdate(c, colorIndex.size)
      i += 1
    }
    if (colorIndex.size > 256) return None
    // palette size must be a power of two ≥ 2
    var palBits = 1
    while ((1 << palBits) < colorIndex.size) palBits += 1
    val palSize = 1 << palBits

    val out = new ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes("US-ASCII"))
    u16(img.width); u16(img.height)
    out.write(0x80 | ((palBits - 1) << 4) | (palBits - 1)) // GCT flag + sizes
    out.write(0) // background color index
    out.write(0) // aspect
    val colors = colorIndex.keys.toArray
    i = 0
    while (i < palSize) {
      val c = if (i < colors.length) colors(i) else 0
      out.write((c >> 16) & 0xff); out.write((c >> 8) & 0xff); out.write(c & 0xff)
      i += 1
    }
    // image descriptor, no local table, no interlace
    out.write(0x2c); u16(0); u16(0); u16(img.width); u16(img.height); out.write(0)

    // LZW: constant-width codes (minCodeSize+1 bits), CLEAR re-issued
    // before the dictionary would grow past that width
    val minCodeSize = palBits.max(2)
    out.write(minCodeSize)
    val clearCode = 1 << minCodeSize
    val eoiCode = clearCode + 1
    val codeWidth = minCodeSize + 1
    val data = new ByteArrayOutputStream()
    var acc = 0L
    var nBits = 0
    def put(code: Int): Unit = {
      acc |= code.toLong << nBits
      nBits += codeWidth
      while (nBits >= 8) { data.write((acc & 0xff).toInt); acc >>= 8; nBits -= 8 }
    }
    put(clearCode)
    var emitted = 0
    i = 0
    while (i < n) {
      put(indices(i))
      emitted += 1
      // dictionary grows by one entry per emitted code; re-clear while
      // the NEXT new entry still fits in codeWidth
      if (emitted >= (1 << minCodeSize) - 2) { put(clearCode); emitted = 0 }
      i += 1
    }
    put(eoiCode)
    if (nBits > 0) data.write((acc & 0xff).toInt)
    // sub-blocks of ≤255 bytes
    val payload = data.toByteArray
    var off = 0
    while (off < payload.length) {
      val len = (payload.length - off).min(255)
      out.write(len)
      out.write(payload, off, len)
      off += len
    }
    out.write(0) // block terminator
    out.write(0x3b) // trailer
    Some(out.toByteArray)
  }

  // ---------------------------------------------------------- decoder

  /** Decode the FIRST frame of a GIF to RGB8 at the logical-screen
    * size; pixels outside the frame rectangle take the background
    * color. Transparent pixels keep their palette color (fingerprints
    * hash what is stored, not a composite).
    */
  def decodeGif(bytes: Array[Byte]): Option[MediaCodec.PngImage] = {
    try {
      if (bytes == null || bytes.length < 13) return None
      val sig = new String(bytes, 0, 6, "US-ASCII")
      if (sig != "GIF87a" && sig != "GIF89a") return None
      def u16(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
      val width = u16(6)
      val height = u16(8)
      if (width <= 0 || height <= 0) return None
      val flags = bytes(10) & 0xff
      var pos = 13
      var globalPal: Array[Int] = null
      if ((flags & 0x80) != 0) {
        val size = 2 << (flags & 7)
        globalPal = readPalette(bytes, pos, size)
        pos += size * 3
      }
      val bgIndex = bytes(11) & 0xff

      while (pos < bytes.length) {
        (bytes(pos) & 0xff) match {
          case 0x21 => // extension: label + sub-blocks
            pos += 2
            while (pos < bytes.length && (bytes(pos) & 0xff) != 0) {
              pos += 1 + (bytes(pos) & 0xff)
            }
            pos += 1
          case 0x2c => // image descriptor — decode this (first) frame
            val fx = u16(pos + 1); val fy = u16(pos + 3)
            val fw = u16(pos + 5); val fh = u16(pos + 7)
            val iFlags = bytes(pos + 9) & 0xff
            pos += 10
            var pal = globalPal
            if ((iFlags & 0x80) != 0) {
              val size = 2 << (iFlags & 7)
              pal = readPalette(bytes, pos, size)
              pos += size * 3
            }
            if (pal == null) return None
            val interlaced = (iFlags & 0x40) != 0
            val minCodeSize = bytes(pos) & 0xff
            pos += 1
            // concatenate sub-blocks
            val data = new ByteArrayOutputStream()
            while (pos < bytes.length && (bytes(pos) & 0xff) != 0) {
              val len = bytes(pos) & 0xff
              data.write(bytes, pos + 1, len)
              pos += 1 + len
            }
            val indices = lzwDecode(data.toByteArray, minCodeSize, fw * fh)
              .getOrElse(return None)
            // de-interlace row order: passes at stride 8,8,4,2 offsets 0,4,2,1
            val rowOf = new Array[Int](fh)
            if (interlaced) {
              var r = 0
              for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
                var y = start
                while (y < fh) { rowOf(r) = y; r += 1; y += step }
              }
            } else {
              var y = 0
              while (y < fh) { rowOf(y) = y; y += 1 }
            }
            val rgb = new Array[Byte](width * height * 3)
            val bg = if (globalPal != null && bgIndex < globalPal.length)
              globalPal(bgIndex) else 0
            var p = 0
            while (p < width * height) {
              rgb(p * 3) = ((bg >> 16) & 0xff).toByte
              rgb(p * 3 + 1) = ((bg >> 8) & 0xff).toByte
              rgb(p * 3 + 2) = (bg & 0xff).toByte
              p += 1
            }
            var r = 0
            while (r < fh) {
              val y = fy + rowOf(r)
              var x = 0
              while (x < fw && y < height) {
                val px = fx + x
                if (px < width) {
                  val idx = indices(r * fw + x)
                  val c = if (idx < pal.length) pal(idx) else 0
                  val o = (y * width + px) * 3
                  rgb(o) = ((c >> 16) & 0xff).toByte
                  rgb(o + 1) = ((c >> 8) & 0xff).toByte
                  rgb(o + 2) = (c & 0xff).toByte
                }
                x += 1
              }
              r += 1
            }
            return Some(MediaCodec.PngImage(width, height, rgb))
          case 0x3b => return None // trailer before any frame
          case _ => return None
        }
      }
      None
    } catch { case _: Exception => None }
  }

  private def readPalette(bytes: Array[Byte], off: Int, size: Int): Array[Int] =
    Array.tabulate(size) { i =>
      ((bytes(off + i * 3) & 0xff) << 16) |
        ((bytes(off + i * 3 + 1) & 0xff) << 8) | (bytes(off + i * 3 + 2) & 0xff)
    }

  /** Variable-width LZW per the GIF spec; decodes exactly `nPixels`
    * palette indices. STRICT on truncation: running out of data before
    * the frame is complete returns None (a partially-decoded frame would
    * feed garbage pixels to perceptual fingerprints); a missing trailing
    * EOI after a complete frame is tolerated (common in the wild).
    */
  private def lzwDecode(
      data: Array[Byte], minCodeSize: Int, nPixels: Int): Option[Array[Int]] = {
    if (minCodeSize < 2 || minCodeSize > 11) return None
    val clearCode = 1 << minCodeSize
    val eoiCode = clearCode + 1
    val out = new Array[Int](nPixels)
    var outPos = 0
    // dictionary as (prefixCode, appendedIndex); first codes are literals
    val prefix = new Array[Int](4096)
    val suffix = new Array[Int](4096)
    var dictSize = eoiCode + 1
    var codeWidth = minCodeSize + 1
    var prev = -1
    var acc = 0L
    var nBits = 0
    var bytePos = 0
    val expand = new Array[Int](4096)

    def emit(code: Int): Boolean = { // expand `code` into out
      var len = 0
      var c = code
      while (c >= clearCode + 2) { // walk the chain
        expand(len) = suffix(c); len += 1
        c = prefix(c)
        if (len >= 4096) return false
      }
      expand(len) = c; len += 1 // root literal
      var i = len - 1
      while (i >= 0 && outPos < nPixels) {
        out(outPos) = expand(i); outPos += 1; i -= 1
      }
      true
    }
    def firstIndexOf(code: Int): Int = {
      var c = code
      while (c >= clearCode + 2) c = prefix(c)
      c
    }

    while (outPos < nPixels) {
      while (nBits < codeWidth) {
        if (bytePos >= data.length) return None // truncated mid-frame
        acc |= (data(bytePos) & 0xffL) << nBits
        bytePos += 1; nBits += 8
      }
      val code = (acc & ((1 << codeWidth) - 1)).toInt
      acc >>= codeWidth; nBits -= codeWidth
      if (code == clearCode) {
        dictSize = eoiCode + 1; codeWidth = minCodeSize + 1; prev = -1
      } else if (code == eoiCode) {
        return if (outPos == nPixels) Some(out) else None
      } else if (prev < 0) {
        if (code >= clearCode) return None
        if (!emit(code)) return None
        prev = code
      } else {
        if (code > dictSize || (code >= clearCode && code <= eoiCode)) return None
        val cur = if (code == dictSize) prev else code // KwKwK case
        if (dictSize < 4096) {
          prefix(dictSize) = prev
          suffix(dictSize) = firstIndexOf(cur)
          dictSize += 1
          if (dictSize == (1 << codeWidth) && codeWidth < 12) codeWidth += 1
        }
        if (code == dictSize - 1 && code >= clearCode + 2) {
          // the just-added entry: prev's expansion + its first index
          if (!emit(prev)) return None
          if (outPos < nPixels) { out(outPos) = firstIndexOf(prev); outPos += 1 }
        } else {
          if (!emit(code)) return None
        }
        prev = code
      }
    }
    Some(out)
  }
}
