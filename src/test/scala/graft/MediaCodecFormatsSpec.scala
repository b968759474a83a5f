package graft

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{GifCodec, JpegCodec, MediaCodec, Multimodal}
import graft.multimodal.MediaCodec.PngImage

/** JPEG/GIF/BMP codec specs. Two independent oracles throughout:
  * round-trips through our own encoder, and CROSS-DECODER agreement
  * with the JDK's ImageIO (a separately-implemented reader/writer —
  * if both decoders produce the same pixels from the same bytes, a
  * systematic decode bug would have to exist twice).
  */
class MediaCodecFormatsSpec extends AnyFunSuite {

  /** Deterministic blocky test image: `colors` distinct values arranged
    * in bs×bs blocks — blocky content survives JPEG quantization with
    * small error, which is what the tolerance assertions need.
    */
  private def blockImage(w: Int, h: Int, bs: Int, seed: Long): PngImage = {
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val block = (y / bs) * ((w + bs - 1) / bs) + (x / bs)
      val v = (seed * 2654435761L + block * 40503L)
      val p = (y * w + x) * 3
      rgb(p) = (32 + (v % 5) * 48).toByte
      rgb(p + 1) = (32 + ((v >> 3) % 5) * 48).toByte
      rgb(p + 2) = (32 + ((v >> 6) % 5) * 48).toByte
    }
    PngImage(w, h, rgb)
  }

  private def toBuffered(img: PngImage): java.awt.image.BufferedImage = {
    val bi = new java.awt.image.BufferedImage(
      img.width, img.height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until img.height; x <- 0 until img.width) {
      val p = (y * img.width + x) * 3
      bi.setRGB(x, y,
        ((img.rgb(p) & 0xff) << 16) | ((img.rgb(p + 1) & 0xff) << 8) |
          (img.rgb(p + 2) & 0xff))
    }
    bi
  }

  private def fromBuffered(bi: java.awt.image.BufferedImage): PngImage = {
    val rgb = new Array[Byte](bi.getWidth * bi.getHeight * 3)
    for (y <- 0 until bi.getHeight; x <- 0 until bi.getWidth) {
      val c = bi.getRGB(x, y)
      val p = (y * bi.getWidth + x) * 3
      rgb(p) = ((c >> 16) & 0xff).toByte
      rgb(p + 1) = ((c >> 8) & 0xff).toByte
      rgb(p + 2) = (c & 0xff).toByte
    }
    PngImage(bi.getWidth, bi.getHeight, rgb)
  }

  private def maxChannelDiff(a: PngImage, b: PngImage): Int = {
    assert(a.width === b.width && a.height === b.height)
    a.rgb.indices.map(i => math.abs((a.rgb(i) & 0xff) - (b.rgb(i) & 0xff))).max
  }

  test("jpeg: our encoder → our decoder round-trips within quantization error") {
    for ((w, h) <- Seq((16, 16), (24, 17), (8, 8), (11, 5))) {
      val img = blockImage(w, h, 8, seed = w * 31L + h)
      val bytes = JpegCodec.encodeJpeg(img, quality = 90)
      val dec = JpegCodec.decodeJpeg(bytes)
      assert(dec.nonEmpty, s"decode failed at ${w}x$h")
      // 8×8-aligned blocks of flat color: DC-dominated, error stays small
      assert(maxChannelDiff(img, dec.get) <= 12, s"error too large at ${w}x$h")
    }
  }

  test("jpeg: ImageIO agrees with our decoder on our encoder's bytes") {
    val img = blockImage(32, 24, 8, seed = 7)
    val bytes = JpegCodec.encodeJpeg(img, quality = 90)
    val ours = JpegCodec.decodeJpeg(bytes).get
    val theirs = fromBuffered(ImageIO.read(new ByteArrayInputStream(bytes)))
    // two independent IDCT/upsample implementations: ±2 rounding
    assert(maxChannelDiff(ours, theirs) <= 2)
  }

  test("jpeg: our decoder handles ImageIO-written (subsampled) baseline files") {
    val img = blockImage(40, 26, 8, seed = 3)
    val out = new java.io.ByteArrayOutputStream()
    // default JDK writer: baseline JFIF with 4:2:0 chroma subsampling —
    // the real-crawl shape our 4:4:4 encoder never produces
    assert(ImageIO.write(toBuffered(img), "jpg", out))
    val bytes = out.toByteArray
    val ours = JpegCodec.decodeJpeg(bytes)
    assert(ours.nonEmpty, "decoder rejected a JDK-written baseline JPEG")
    val theirs = fromBuffered(ImageIO.read(new ByteArrayInputStream(bytes)))
    // both use centered triangle chroma upsampling → small tolerance
    assert(maxChannelDiff(ours.get, theirs) <= 16)
    // vs the original content only on 8×8-block INTERIOR pixels: 4:2:0
    // averaged the chroma across every sharp block edge before either
    // decoder ran (ImageIO shows the same ~90 edge error), so only the
    // interiors measure decode fidelity
    val interior = for {
      y <- 2 until img.height - 2 if y % 8 >= 2 && y % 8 <= 5
      x <- 2 until img.width - 2 if x % 8 >= 2 && x % 8 <= 5
      c <- 0 until 3
    } yield {
      val p = (y * img.width + x) * 3 + c
      math.abs((img.rgb(p) & 0xff) - (ours.get.rgb(p) & 0xff))
    }
    assert(interior.max <= 24)
  }

  test("jpeg: corrupt, truncated and progressive-marker bytes return None") {
    val img = blockImage(16, 16, 8, seed = 1)
    val good = JpegCodec.encodeJpeg(img)
    assert(JpegCodec.decodeJpeg(null).isEmpty)
    assert(JpegCodec.decodeJpeg(Array[Byte](1, 2, 3)).isEmpty)
    assert(JpegCodec.decodeJpeg(good.take(20)).isEmpty)
    // flip SOF0 (0xc0) to SOF2 (0xc2, progressive) — must reject, not garble
    val prog = good.clone()
    val sofAt = prog.indices.find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sofAt + 1) = 0xc2.toByte
    assert(JpegCodec.decodeJpeg(prog).isEmpty)
  }

  test("gif: encode → decode round-trips pixels exactly (lossless)") {
    for ((w, h) <- Seq((13, 9), (8, 8), (1, 1), (40, 3))) {
      val img = blockImage(w, h, 4, seed = w + h * 100L)
      val bytes = GifCodec.encodeGif(img).get
      val dec = GifCodec.decodeGif(bytes)
      assert(dec.nonEmpty, s"decode failed at ${w}x$h")
      assert(maxChannelDiff(img, dec.get) === 0, s"lossy at ${w}x$h")
    }
  }

  test("gif: ImageIO reads our encoder's bytes to identical pixels") {
    val img = blockImage(21, 14, 4, seed = 11)
    val bytes = GifCodec.encodeGif(img).get
    val theirs = fromBuffered(ImageIO.read(new ByteArrayInputStream(bytes)))
    assert(maxChannelDiff(img, theirs) === 0)
  }

  test("gif: our decoder reads ImageIO-written bytes to identical pixels") {
    val img = blockImage(19, 11, 4, seed = 5)
    val out = new java.io.ByteArrayOutputStream()
    assert(ImageIO.write(toBuffered(img), "gif", out))
    val dec = GifCodec.decodeGif(out.toByteArray)
    assert(dec.nonEmpty, "decoder rejected a JDK-written GIF")
    assert(maxChannelDiff(img, dec.get) === 0)
  }

  test("gif: >256 distinct colors refuses to encode; corrupt bytes refuse to decode") {
    // 1024 pixels, each a distinct (r,g) pair → 1024 distinct colors
    val rgb = new Array[Byte](32 * 32 * 3)
    for (j <- 0 until 32 * 32) {
      rgb(j * 3) = (j % 256).toByte
      rgb(j * 3 + 1) = (j / 8).toByte
      rgb(j * 3 + 2) = 7
    }
    assert(GifCodec.encodeGif(PngImage(32, 32, rgb)).isEmpty)
    assert(GifCodec.decodeGif(null).isEmpty)
    assert(GifCodec.decodeGif("GIF89a".getBytes("US-ASCII")).isEmpty)
    val good = GifCodec.encodeGif(blockImage(8, 8, 4, 1)).get
    assert(GifCodec.decodeGif(good.take(good.length / 2)).isEmpty)
  }

  test("bmp: encode → decode round-trips exactly, incl. row padding widths") {
    for (w <- Seq(1, 2, 3, 4, 5, 13); h <- Seq(1, 7)) {
      val img = blockImage(w, h, 2, seed = w * 1000L + h)
      val dec = MediaCodec.decodeBmp(MediaCodec.encodeBmp(img))
      assert(dec.nonEmpty && maxChannelDiff(img, dec.get) === 0, s"${w}x$h")
    }
  }

  test("bmp: cross-decoder agreement with ImageIO both directions") {
    val img = blockImage(15, 9, 3, seed = 2)
    val ours = MediaCodec.encodeBmp(img)
    assert(maxChannelDiff(img,
      fromBuffered(ImageIO.read(new ByteArrayInputStream(ours)))) === 0)
    val out = new java.io.ByteArrayOutputStream()
    assert(ImageIO.write(toBuffered(img), "bmp", out))
    val dec = MediaCodec.decodeBmp(out.toByteArray)
    assert(dec.nonEmpty && maxChannelDiff(img, dec.get) === 0)
  }

  test("decodeImage dispatches on magic bytes across all four formats") {
    val img = blockImage(16, 12, 4, seed = 9)
    val png = MediaCodec.encodePng(img)
    val jpg = JpegCodec.encodeJpeg(img, quality = 92)
    val gif = GifCodec.encodeGif(img).get
    val bmp = MediaCodec.encodeBmp(img)
    assert(maxChannelDiff(img, Multimodal.decodeImage(png).get) === 0)
    assert(maxChannelDiff(img, Multimodal.decodeImage(gif).get) === 0)
    assert(maxChannelDiff(img, Multimodal.decodeImage(bmp).get) === 0)
    // 4×4 blocks inside 8×8 DCT blocks → real AC energy → looser bound
    assert(maxChannelDiff(img, Multimodal.decodeImage(jpg).get) <= 32)
    assert(Multimodal.decodeImage(Array[Byte](9, 9, 9, 9)).isEmpty)
  }

  test("progressive JPEG is EXCLUDED from fingerprinting, never grouped-as-equal") {
    // The honesty probe: JpegCodec handles baseline/extended-sequential
    // only; a progressive (SOF2) stream must flow through the dedup
    // pipeline as "no fingerprint" — NOT as a shared sentinel that would
    // make two unrelated progressive files perceptual "duplicates".
    def progressiveJpeg(payload: Int): Array[Byte] = Array(
      0xFF, 0xD8,             // SOI
      0xFF, 0xC2, 0x00, 0x0B, // SOF2 (progressive), len 11
      0x08, 0x00, 0x08, 0x00, 0x08, 0x01, payload, 0x11, 0x00,
      0xFF, 0xD9              // EOI
    ).map(_.toByte)
    val p1 = progressiveJpeg(0x01)
    val p2 = progressiveJpeg(0x02)
    // the decoder rejects the stream (None), so the fingerprint is absent…
    assert(JpegCodec.decodeJpeg(p1).isEmpty)
    assert(Multimodal.imageFingerprint(p1).isEmpty)
    assert(Multimodal.imageFingerprint(p2).isEmpty)
    // …and a decodable image still fingerprints
    val img = blockImage(32, 32, 8, seed = 3)
    assert(Multimodal.imageFingerprint(MediaCodec.encodePng(img)).nonEmpty)
    // pipeline form: flatMap-over-Option drops both progressive rows — no
    // hash group can ever contain them (the poisoning the sentinel had)
    val rows = Seq(("a", p1), ("b", p2), ("c", MediaCodec.encodePng(img)))
      .flatMap { case (id, bytes) =>
        Multimodal.imageFingerprint(bytes).map(h => (id, h)) }
    assert(rows.map(_._1) === Seq("c"))
  }

  test("aHash64 matches across formats for the same image (cross-format dedup)") {
    // the crawl story: one page image stored as PNG by one crawler, JPEG
    // by another, GIF by a third — byte dedup sees 3 blobs, perceptual
    // dedup must see 1. Blocky high-contrast content keeps every 8×8
    // cell far from the mean, so JPEG loss cannot flip a hash bit.
    for (seed <- 1L to 8L) {
      val img = blockImage(32, 32, 8, seed)
      val h0 = Multimodal.aHash64(img)
      val viaJpeg = Multimodal.decodeImage(JpegCodec.encodeJpeg(img, 90)).get
      val viaGif = Multimodal.decodeImage(GifCodec.encodeGif(img).get).get
      val viaBmp = Multimodal.decodeImage(MediaCodec.encodeBmp(img)).get
      assert(Multimodal.aHash64(viaJpeg) === h0, s"jpeg hash drift, seed=$seed")
      assert(Multimodal.aHash64(viaGif) === h0, s"gif hash drift, seed=$seed")
      assert(Multimodal.aHash64(viaBmp) === h0, s"bmp hash drift, seed=$seed")
    }
  }
}
