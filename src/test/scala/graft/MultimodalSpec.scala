package graft

import graft.ext.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** The real container codec: encoder/decoder round-trips per format,
  * independence from our own writer (a third-party real-world PNG), and
  * the garbage-tolerance contract (truncated/corrupt headers decode to
  * `invalid`, never throw). */
class MultimodalSpec extends AnyFunSuite {

  private val body = "the quick brown fox".getBytes("UTF-8")

  test("PNG round-trip: dimensions and data stream from real bytes") {
    val p = Multimodal.encodePng(640, 480, body)
    val (fmt, w, h, b) = Multimodal.decodeBytes(p)
    assert((fmt, w, h) == (("png", 640, 480)))
    assert(b.sameElements(body))
  }

  test("BMP round-trip, including top-down (negative height) files") {
    val p = Multimodal.encodeBmp(123, 457, body)
    val (fmt, w, h, b) = Multimodal.decodeBytes(p)
    assert((fmt, w, h) == (("bmp", 123, 457)))
    assert(b.sameElements(body))
    // a top-down BMP stores height negative; dimensions report absolute
    val neg = p.clone()
    val hh = -457
    neg(22) = hh.toByte; neg(23) = (hh >> 8).toByte
    neg(24) = (hh >> 16).toByte; neg(25) = (hh >> 24).toByte
    val (_, _, h2, _) = Multimodal.decodeBytes(neg)
    assert(h2 == 457)
  }

  test("GIF round-trip") {
    val p = Multimodal.encodeGif(320, 200, body)
    val (fmt, w, h, b) = Multimodal.decodeBytes(p)
    assert((fmt, w, h) == (("gif", 320, 200)))
    assert(b.sameElements(body))
  }

  test("decodes a real-world PNG not produced by our writer") {
    // The canonical 1x1 transparent PNG (zlib-compressed IDAT, color
    // type 6) — produced by a real encoder, so this pins the parser to
    // the actual PNG spec rather than to our own writer's habits.
    val px = java.util.Base64.getDecoder.decode(
      "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNkYPhf" +
        "DwAChwGA60e6kgAAAABJRU5ErkJggg==")
    val (fmt, w, h, b) = Multimodal.decodeBytes(px)
    assert((fmt, w, h) == (("png", 1, 1)))
    assert(b.length == 13) // its IDAT payload, collected by the chunk walk
  }

  test("truncated and corrupt headers decode to invalid, never throw") {
    val png = Multimodal.encodePng(10, 10, body)
    val gif = Multimodal.encodeGif(10, 10, body)
    val bmp = Multimodal.encodeBmp(10, 10, body)
    val cases = Seq(
      Array.empty[Byte],                          // empty
      png.take(20),                               // truncated mid-IHDR
      png.dropRight(13),                          // truncated before IEND
      { val c = png.clone(); c(30) = (c(30) ^ 1).toByte; c }, // IHDR CRC flip
      { val c = png.clone(); c(0) = 0x42; c },    // wrong magic
      { val c = bmp.clone(); c(10) = 0x7f.toByte; c(11) = 0x7f.toByte; c }, // pixel offset beyond file
      gif.dropRight(1),                           // GIF missing 0x3B trailer
      "GIX89a??????????".getBytes("US-ASCII"))    // near-miss GIF magic
    cases.foreach { c =>
      val (fmt, w, h, _) = Multimodal.decodeBytes(c)
      assert((fmt, w, h) == (("invalid", 0, 0)), s"case len=${c.length}")
    }
  }

  test("zero-length body still round-trips in all three containers") {
    val empty = Array.empty[Byte]
    Seq(Multimodal.encodePng(1, 1, empty) -> "png",
        Multimodal.encodeBmp(1, 1, empty) -> "bmp",
        Multimodal.encodeGif(1, 1, empty) -> "gif").foreach { case (p, f) =>
      val (fmt, w, h, b) = Multimodal.decodeBytes(p)
      assert((fmt, w, h, b.length) == ((f, 1, 1, 0)))
    }
  }
}
