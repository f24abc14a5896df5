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

  test("WAV round-trip: rate and signed 16-bit samples from real bytes") {
    val samples = Array[Short](0, 1, -1, 32767, -32768, 440, 97)
    val p = Multimodal.encodeWav(8000, samples)
    val Some((rate, out)) = Multimodal.parseWav(p)
    assert(rate == 8000)
    assert(out.sameElements(samples))
    // zero samples is still a valid (silent) WAV
    val Some((_, none)) = Multimodal.parseWav(Multimodal.encodeWav(44100, Array.empty))
    assert(none.isEmpty)
  }

  test("WAV round-trip holds for seeded-random sample streams " +
    "(lengths 0-257, full signed 16-bit range)") {
    val rnd = new scala.util.Random(42)
    (0 until 60).foreach { _ =>
      val n = rnd.nextInt(258)
      val samples = Array.fill(n)((rnd.nextInt(65536) - 32768).toShort)
      val rate = 1 + rnd.nextInt(192000)
      val Some((r, out)) = Multimodal.parseWav(Multimodal.encodeWav(rate, samples))
      assert(r == rate && out.sameElements(samples), s"n=$n rate=$rate")
    }
  }

  test("WAV chunk walk skips unknown chunks per the RIFF contract") {
    // splice a LIST chunk (odd length, so word-alignment padding is
    // exercised too) between fmt and data
    val base = Multimodal.encodeWav(8000, Array[Short](7, 8, 9))
    val extra = new Array[Byte](8 + 5 + 1) // header + odd body + pad
    "LIST".getBytes("US-ASCII").copyToArray(extra, 0)
    extra(4) = 5 // LE length 5
    val spliced = base.take(36) ++ extra ++ base.drop(36)
    // patch the RIFF size field
    val riffLen = spliced.length - 8
    spliced(4) = riffLen.toByte; spliced(5) = (riffLen >> 8).toByte
    spliced(6) = (riffLen >> 16).toByte; spliced(7) = (riffLen >> 24).toByte
    val Some((rate, out)) = Multimodal.parseWav(spliced)
    assert(rate == 8000 && out.sameElements(Array[Short](7, 8, 9)))
  }

  test("WAV parse rejects garbage, truncation, and non-PCM payloads") {
    val good = Multimodal.encodeWav(8000, Array[Short](1, 2, 3))
    val nonPcm = good.clone(); nonPcm(20) = 3        // IEEE float format tag
    val stereo = good.clone(); stereo(22) = 2        // two channels
    val cases = Seq(
      Array.empty[Byte],
      good.take(30),                                 // truncated mid-fmt
      { val c = good.clone(); c(0) = 'X'.toByte; c },// wrong magic
      nonPcm, stereo,
      Multimodal.encodePng(4, 4, Array[Byte](1)))    // a PNG is not a WAV
    cases.foreach(c => assert(Multimodal.parseWav(c).isEmpty))
  }

  test("landmark fingerprints are shift-invariant: a shared snippet " +
    "matches at any offset (the q157 protocol's core property)") {
    // two "recordings" sharing a melody at different offsets
    // varied content: repeats would collapse under the landmark
    // distinct(), so every phrase must mint fresh landmark keys
    val melody = "the same loud melody RISES and FALLS exactly here " +
      "Xylophones Quiver Zealously while Jazz Drums THUMP and ring " +
      "a Golden Trumpet BLARES over Violins Weeping in Minor keys " +
      "then Cymbals CRASH as the Bass walks Up and Down the scale"
    val a = "quiet intro then " + melody
    val b = melody + " and a very different long outro follows this part"
    val spark = SparkTestSession.spark
    import spark.implicits._
    val docs = Seq((0L, a, "s"), (1L, b, "s"))
      .toDF("doc_id", "text", "source")
    val samples = Multimodal.audioSampleRows(Multimodal.audioFromDocuments(docs))
    // fingerprint both, intersect on the landmark key (v1,v2,v3,dt1,dt2)
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val tot = samples.groupBy("media_id")
      .agg(sum(col("v")).as("sv"), count(lit(1)).as("cnt"))
    val wPrev = Window.partitionBy("media_id").orderBy("i").rowsBetween(-4, -1)
    val wNext = Window.partitionBy("media_id").orderBy("i").rowsBetween(1, 4)
    val peaks = samples
      .withColumn("pmax", max(col("v")).over(wPrev))
      .withColumn("nmax", max(col("v")).over(wNext))
      .join(tot, "media_id")
      .where(col("v") * col("cnt") > col("sv") &&
        col("v") > coalesce(col("pmax"), lit(-1)) &&
        col("v") >= coalesce(col("nmax"), lit(-1)))
    val wp = Window.partitionBy("media_id").orderBy("i")
    val lands = peaks
      .withColumn("v2", lead(col("v"), 1).over(wp))
      .withColumn("i2", lead(col("i"), 1).over(wp))
      .withColumn("v3", lead(col("v"), 2).over(wp))
      .withColumn("i3", lead(col("i"), 2).over(wp))
      .where(col("i3").isNotNull)
      .select(col("media_id"), col("v").as("v1"), col("v2"), col("v3"),
        (col("i2") - col("i")).as("dt1"), (col("i3") - col("i2")).as("dt2"))
      .distinct()
    val shared = lands.where(col("media_id") === 0L)
      .drop("media_id")
      .intersect(lands.where(col("media_id") === 1L).drop("media_id"))
    assert(shared.count() >= 8, "offset-shifted shared audio must share landmarks")
  }

  test("audioSampleRows drops corrupt payloads instead of throwing") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val good = Multimodal.encodeWav(8000, Array[Short](65, 66, 67))
    val media = Seq(
      Multimodal.MediaRecord(0L, "audio", good, "s"),
      Multimodal.MediaRecord(1L, "audio", Array[Byte](1, 2, 3), "s"))
      .toDF()
    val rows = Multimodal.audioSampleRows(media)
      .orderBy("media_id", "i")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.toSeq == Seq((0L, 1L, 65), (0L, 2L, 66), (0L, 3L, 67)))
  }
}
