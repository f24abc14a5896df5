package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video as opaque `binary`
  * payloads + typed metadata, with decode / feature-extract / frame-
  * sample stages (BASELINE.json surface).
  *
  * The decode is a REAL dependency-free container codec: it parses the
  * actual bytes of the three classic still/animation container formats —
  * PNG (signature + IHDR chunk, big-endian, CRC32-verified, IDAT chunk
  * walk), BMP (BITMAPFILEHEADER + BITMAPINFOHEADER, little-endian), and
  * GIF (GIF87a/89a logical screen descriptor, little-endian u16) — and
  * rejects truncated or corrupted headers as `format = "invalid"` instead
  * of throwing (a 100 TB media crawl ALWAYS contains garbage bytes; one
  * bad payload must not kill a stage). Only the pixel decompression
  * (zlib/LZW) is out of scope — dimensions, format detection, payload
  * walking and checksums all operate on real encoded bytes.
  *
  * Scale notes: payloads travel as parquet binary; the decode stage is a
  * narrow typed `mapPartitions` (one digest/codec init per partition —
  * the same batching contract as a Pandas-UDF `mapInPandas` loop), so
  * 100 TB of media shards across executors linearly with no shuffle.
  * Frame sampling multiplies rows map-side — the explode stays inside
  * the stage, never shuffled un-aggregated.
  */
object Multimodal {

  /** Typed media record: the schema contract for multimodal tables. */
  final case class MediaRecord(
      media_id: Long,
      kind: String,          // image | audio | video
      payload: Array[Byte],
      source: String)

  final case class DecodedMedia(
      media_id: Long,
      kind: String,
      format: String,        // png | bmp | gif | invalid
      byte_len: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      checksum: String)

  // ---- container writers (media synthesis for fixtures/testdata) ----

  private def crc32(bytes: Array[Byte], off: Int, len: Int): Int = {
    val c = new java.util.zip.CRC32()
    c.update(bytes, off, len)
    c.getValue.toInt
  }

  private def putBE(buf: Array[Byte], off: Int, v: Int): Unit = {
    buf(off) = (v >>> 24).toByte; buf(off + 1) = (v >>> 16).toByte
    buf(off + 2) = (v >>> 8).toByte; buf(off + 3) = v.toByte
  }

  private def putLE(buf: Array[Byte], off: Int, v: Int): Unit = {
    buf(off) = v.toByte; buf(off + 1) = (v >>> 8).toByte
    buf(off + 2) = (v >>> 16).toByte; buf(off + 3) = (v >>> 24).toByte
  }

  private val pngSignature: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Real PNG container: signature, IHDR (8-bit truecolor, real CRC32),
    * one IDAT chunk carrying `body`, IEND. The IDAT payload is stored
    * raw rather than zlib-compressed — every header field, length and
    * CRC is exactly per the PNG spec (RFC 2083), so any PNG chunk walker
    * reads this file and [[decode]] reads any real PNG's dimensions. */
  def encodePng(width: Int, height: Int, body: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](8 + 25 + 12 + body.length + 12)
    System.arraycopy(pngSignature, 0, out, 0, 8)
    // IHDR: length 13, type, width/height BE, bit depth 8, color type 2
    // (truecolor), compression/filter/interlace 0, CRC over type+data.
    putBE(out, 8, 13)
    "IHDR".getBytes("US-ASCII").copyToArray(out, 12)
    putBE(out, 16, width)
    putBE(out, 20, height)
    out(24) = 8; out(25) = 2; out(26) = 0; out(27) = 0; out(28) = 0
    putBE(out, 29, crc32(out, 12, 17))
    // IDAT
    val idat = 33
    putBE(out, idat, body.length)
    "IDAT".getBytes("US-ASCII").copyToArray(out, idat + 4)
    System.arraycopy(body, 0, out, idat + 8, body.length)
    putBE(out, idat + 8 + body.length, crc32(out, idat + 4, 4 + body.length))
    // IEND
    val iend = idat + 12 + body.length
    putBE(out, iend, 0)
    "IEND".getBytes("US-ASCII").copyToArray(out, iend + 4)
    putBE(out, iend + 8, crc32(out, iend + 4, 4))
    out
  }

  /** Real BMP container: BITMAPFILEHEADER (14 bytes) + BITMAPINFOHEADER
    * (40 bytes, 24-bit, BI_RGB), pixel data = `body` at the offset the
    * file header declares. All fields little-endian per the format. */
  def encodeBmp(width: Int, height: Int, body: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](54 + body.length)
    out(0) = 'B'; out(1) = 'M'
    putLE(out, 2, out.length)         // file size
    putLE(out, 6, 0)                  // reserved
    putLE(out, 10, 54)                // pixel data offset
    putLE(out, 14, 40)                // BITMAPINFOHEADER size
    putLE(out, 18, width)
    putLE(out, 22, height)
    out(26) = 1; out(27) = 0          // planes = 1
    out(28) = 24; out(29) = 0         // bits per pixel
    putLE(out, 30, 0)                 // BI_RGB
    putLE(out, 34, body.length)       // image size
    System.arraycopy(body, 0, out, 54, body.length)
    out
  }

  /** Real GIF container: GIF89a header, logical screen descriptor
    * (width/height as little-endian u16), `body` as the data stream,
    * 0x3B trailer. */
  def encodeGif(width: Int, height: Int, body: Array[Byte]): Array[Byte] = {
    require(width < 65536 && height < 65536, "GIF dimensions are u16")
    val out = new Array[Byte](13 + body.length + 1)
    "GIF89a".getBytes("US-ASCII").copyToArray(out, 0)
    out(6) = width.toByte; out(7) = (width >>> 8).toByte
    out(8) = height.toByte; out(9) = (height >>> 8).toByte
    out(10) = 0; out(11) = 0; out(12) = 0 // no GCT, bg 0, default aspect
    System.arraycopy(body, 0, out, 13, body.length)
    out(out.length - 1) = 0x3b.toByte
    out
  }

  // ---- container readers (the real decode) ----

  private def beInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def leShort(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def isType(b: Array[Byte], off: Int, t: String): Boolean =
    t.zipWithIndex.forall { case (c, i) => b(off + i) == c.toByte }

  /** Parse a real PNG: verify the 8-byte signature, the IHDR chunk type
    * and its CRC32, then walk the chunk chain collecting IDAT payloads
    * until IEND. Any structural violation → None. */
  private def parsePng(p: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (p.length < 45 || !p.take(8).sameElements(pngSignature)) return None
    if (beInt(p, 8) != 13 || !isType(p, 12, "IHDR")) return None
    if (beInt(p, 29) != crc32(p, 12, 17)) return None // corrupt IHDR
    val (w, h) = (beInt(p, 16), beInt(p, 20))
    if (w <= 0 || h <= 0) return None
    val body = new java.io.ByteArrayOutputStream()
    var off = 33
    while (off + 12 <= p.length) {
      val len = beInt(p, off)
      if (len < 0 || off + 12 + len > p.length) return None
      if (isType(p, off + 4, "IEND")) return Some((w, h, body.toByteArray))
      if (isType(p, off + 4, "IDAT")) body.write(p, off + 8, len)
      off += 12 + len
    }
    None // ran off the end without IEND: truncated
  }

  /** Parse a real BMP: 'BM' magic, BITMAPINFOHEADER dimensions at the
    * spec'd little-endian offsets, pixel data at the declared offset
    * (negative height = top-down rows; dimensions reported absolute). */
  private def parseBmp(p: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (p.length < 54 || p(0) != 'B'.toByte || p(1) != 'M'.toByte) return None
    if (leInt(p, 14) < 40) return None // pre-BITMAPINFOHEADER variants
    val dataOff = leInt(p, 10)
    val (w, h) = (leInt(p, 18), math.abs(leInt(p, 22)))
    if (w <= 0 || h <= 0 || dataOff < 54 || dataOff > p.length) return None
    Some((w, h, java.util.Arrays.copyOfRange(p, dataOff, p.length)))
  }

  /** Parse a real GIF: 87a/89a magic, logical-screen u16 dimensions,
    * 0x3B trailer terminating the data stream. */
  private def parseGif(p: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (p.length < 14) return None
    if (!isType(p, 0, "GIF87a") && !isType(p, 0, "GIF89a")) return None
    val (w, h) = (leShort(p, 6), leShort(p, 8))
    if (w <= 0 || h <= 0 || p(p.length - 1) != 0x3b.toByte) return None
    Some((w, h, java.util.Arrays.copyOfRange(p, 13, p.length - 1)))
  }

  /** Dispatch on real magic bytes; truncated/corrupt → `invalid` with
    * zero dimensions and the checksum of the raw payload (so a garbage
    * payload is still identifiable downstream). */
  def decodeBytes(payload: Array[Byte]): (String, Int, Int, Array[Byte]) =
    parsePng(payload).map { case (w, h, b) => ("png", w, h, b) }
      .orElse(parseBmp(payload).map { case (w, h, b) => ("bmp", w, h, b) })
      .orElse(parseGif(payload).map { case (w, h, b) => ("gif", w, h, b) })
      .getOrElse(("invalid", 0, 0, payload))

  /** Wrap the documents table as a media table of REAL encoded files:
    * each document becomes a PNG, BMP or GIF (by doc_id mod 3) whose
    * dimensions derive deterministically from the doc id and whose data
    * stream is the utf-8 text — so an independent oracle can predict
    * every decoded field while the decode itself sees only bytes. */
  def mediaFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"), col("source"))
      .as[(Long, String, String)]
      .map { case (id, text, source) =>
        val body = Option(text).getOrElse("").getBytes("UTF-8")
        val w = (id % 637 + 1).toInt
        val h = ((id * 7) % 473 + 1).toInt
        id % 3 match {
          case 0 => MediaRecord(id, "image", encodePng(w, h, body), source)
          case 1 => MediaRecord(id, "image", encodeBmp(w, h, body), source)
          case _ => MediaRecord(id, "video", encodeGif(w, h, body), source)
        }
      }.toDF()
  }

  /** Decode stage: partition-preserving batched map over the binary
    * payloads (mapPartitions == one digest/codec init per partition, the
    * same batching contract as `mapInPandas`). Frame count: GIF data
    * streams count one frame per 256-byte block (the sub-block granule);
    * still formats are single-frame; invalid payloads have none. */
  def decode(spark: SparkSession, media: DataFrame): Dataset[DecodedMedia] = {
    import spark.implicits._
    // Fan out before the per-payload codec work (guide §2.5; see
    // audioSampleRows). No-op on streaming/parallel input.
    graft.ops.Fanout.byKey(media, col("media_id")).as[MediaRecord].mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        val (format, w, h, body) = decodeBytes(r.payload)
        md.reset()
        val checksum = md.digest(body).map("%02x".format(_)).mkString
        val frames = format match {
          case "gif"     => body.length / 256 + 1
          case "invalid" => 0
          case _         => 1
        }
        DecodedMedia(r.media_id, r.kind, format, r.payload.length.toLong,
          w, h, frames, checksum)
      }
    }
  }

  /** Frame sampling: every `step`-th frame index per medium, map-side;
    * invalid payloads (zero frames) produce no rows. */
  def sampleFrames(decoded: Dataset[DecodedMedia], step: Int = 4): DataFrame =
    decoded.toDF().where(col("n_frames") > 0)
      .select(col("media_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(step))).as("frame_idx"))

  /** Perceptual signature over the DECODED data stream: `nBits`-block
    * mean hash (the structure of Yang, Gao & Tian 2006, "Block
    * Mean Value Based Image Perceptual Hashing" — split the payload into
    * `nBits` equal blocks, bit j = [mean of block j >= global mean];
    * q139 passes 64 — this corpus' near-dup payloads land at Hamming
    * 0-8 of 64, the unrelated ramp starts ~10, and the 9-band pigeonhole
    * keys stay ~7 bits wide (the r10 redesign: the original 5-of-32
    * config was measured-quadratic because random pairs collide at
    * P(H≤5 of 32) ≈ 6e-5 — at a corpus where bucket population explodes,
    * WIDEN the signature and tighten the relative threshold rather than
    * adding bands), emitted
    * as a `(doc, simhash)` '0'/'1'-string table SHAPED FOR the text
    * SimHash machinery — [[Dedup.simhashHammingPairsFromSigs]] bands and
    * verifies these signatures unchanged, making media near-dup
    * first-class next to text near-dup.
    *
    * The block compare is integer-exact (`S_j·n >= S·n_j`, no division),
    * reproducible bit-for-bit by a SQL oracle; codepoint values are the
    * "pixel intensities" (the decoded stream here is the container's
    * data payload; a real image deploy decompresses pixels first — same
    * signature, different byte source). Products stay under 2^63 for
    * payloads up to ~16M codepoints; invalid containers and empty
    * payloads emit no signature (garbage must never cluster). One typed
    * map at scan speed, zero shuffle — the signature table is the only
    * thing that ever moves. */
  def blockhashSignatures(media: DataFrame, nBits: Int = 32): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    graft.ops.Fanout.byKey(media, col("media_id")).as[MediaRecord].flatMap { r =>
      val (format, _, _, body) = decodeBytes(r.payload)
      if (format == "invalid") None
      else {
        val cps = new String(body, "UTF-8").codePoints().toArray
        val n = cps.length
        if (n == 0) None
        else {
          val sj = new Array[Long](nBits)
          val nj = new Array[Long](nBits)
          var tot = 0L
          var i = 0
          while (i < n) {
            val b = (i.toLong * nBits / n).toInt
            sj(b) += cps(i); nj(b) += 1; tot += cps(i)
            i += 1
          }
          val bits = new StringBuilder(nBits)
          var j = 0
          while (j < nBits) {
            bits.append(if (nj(j) > 0 && sj(j) * n >= tot * nj(j)) '1' else '0')
            j += 1
          }
          Some((r.media_id, bits.toString))
        }
      }
    }.toDF("doc", "simhash")
  }

  // ---- audio: real RIFF/WAVE container codec + sample extraction ----

  private def putLEShort(buf: Array[Byte], off: Int, v: Int): Unit = {
    buf(off) = v.toByte; buf(off + 1) = (v >>> 8).toByte
  }

  /** Real WAV container (RIFF/WAVE, PCM): "RIFF" + riff size + "WAVE",
    * canonical 16-byte "fmt " chunk (format 1 = PCM, mono, 16-bit,
    * little-endian byte rate / block align per spec), "data" chunk with
    * the samples as signed 16-bit LE. Every field is exactly per the
    * WAVE format spec, so any RIFF chunk walker reads this file and
    * [[parseWav]] reads any real mono-PCM WAV's samples. */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    "RIFF".getBytes("US-ASCII").copyToArray(out, 0)
    putLE(out, 4, 36 + dataLen)
    "WAVE".getBytes("US-ASCII").copyToArray(out, 8)
    "fmt ".getBytes("US-ASCII").copyToArray(out, 12)
    putLE(out, 16, 16)                    // fmt chunk size
    putLEShort(out, 20, 1)                // PCM
    putLEShort(out, 22, 1)                // mono
    putLE(out, 24, sampleRate)
    putLE(out, 28, sampleRate * 2)        // byte rate
    putLEShort(out, 32, 2)                // block align
    putLEShort(out, 34, 16)               // bits per sample
    "data".getBytes("US-ASCII").copyToArray(out, 36)
    putLE(out, 40, dataLen)
    var i = 0
    while (i < samples.length) {
      putLEShort(out, 44 + i * 2, samples(i) & 0xffff)
      i += 1
    }
    out
  }

  private def leSShort(b: Array[Byte], off: Int): Short =
    ((b(off) & 0xff) | (b(off + 1) << 8)).toShort

  /** Parse a real WAV: RIFF/WAVE magic, then walk the chunk chain —
    * require a PCM mono 16-bit "fmt " chunk before "data" (other chunk
    * types are skipped per the RIFF contract: readers ignore chunks
    * they don't know). Truncated or non-PCM payloads → None. */
  def parseWav(p: Array[Byte]): Option[(Int, Array[Short])] = {
    if (p.length < 44 || !isType(p, 0, "RIFF") || !isType(p, 8, "WAVE"))
      return None
    var off = 12
    var rate = -1
    while (off + 8 <= p.length) {
      val len = leInt(p, off + 4)
      if (len < 0 || off + 8 + len > p.length) return None
      if (isType(p, off, "fmt ")) {
        if (len < 16) return None
        val fmt = leShort(p, off + 8)
        val ch = leShort(p, off + 10)
        val bits = leShort(p, off + 22)
        if (fmt != 1 || ch != 1 || bits != 16) return None
        rate = leInt(p, off + 12)
      } else if (isType(p, off, "data")) {
        if (rate <= 0) return None        // data before fmt: malformed
        val n = len / 2
        val samples = new Array[Short](n)
        var i = 0
        while (i < n) { samples(i) = leSShort(p, off + 8 + i * 2); i += 1 }
        return Some((rate, samples))
      }
      off += 8 + len + (len & 1)          // RIFF chunks are word-aligned
    }
    None
  }

  /** Wrap the documents table as REAL mono-PCM WAV files: sample i is
    * the codepoint of text character i (the same codepoint-as-intensity
    * contract [[blockhashSignatures]] uses), 8 kHz — so an independent
    * oracle can reconstruct the exact sample stream from the text while
    * the decode itself sees only RIFF bytes. Empty docs become
    * zero-sample (still valid) WAVs. */
  def audioFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"), col("source"))
      .as[(Long, String, String)]
      .map { case (id, text, source) =>
        val cps = Option(text).getOrElse("").codePoints().toArray
        val samples = new Array[Short](cps.length)
        var i = 0
        while (i < cps.length) { samples(i) = cps(i).toShort; i += 1 }
        MediaRecord(id, "audio", encodeWav(8000, samples), source)
      }.toDF()
  }

  /** Decode stage for audio: one row per PCM sample, `(media_id, i, v)`
    * with i 1-based — the long-form stream the declarative fingerprint
    * pipeline (peak picking, landmark pairing) consumes. Non-WAV or
    * corrupt payloads emit nothing (garbage never fingerprints). Typed
    * flatMap at scan speed; the explode stays inside the stage. */
  def audioSampleRows(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    // Fan out before the per-payload WAV parse (guide §2.5: the media
    // parquet is one unsplittable row group; the codec work otherwise
    // runs in the single scan task). No-op on streaming/parallel input.
    graft.ops.Fanout.byKey(media, col("media_id")).as[MediaRecord].flatMap { r =>
      parseWav(r.payload) match {
        case None => Iterator.empty
        case Some((_, samples)) =>
          samples.iterator.zipWithIndex.map { case (v, i) =>
            (r.media_id, (i + 1).toLong, v.toInt)
          }
      }
    }.toDF("media_id", "i", "v")
  }

  /** Constellation landmark table (Wang 2003) over a media table of WAV
    * payloads — the q157 fingerprint, declaratively: peak picking is two
    * window maxima over the [[audioSampleRows]] stream (strict against
    * the previous 4 samples, non-strict against the next 4 — leftmost-
    * of-plateau dedup — and above the doc mean, `v·n > Σv` integer-
    * exact), a landmark is an anchor peak plus its next TWO peaks
    * (three values + both gaps, each gap in [1, 64]) via lead() over
    * the per-doc peak sequence. Output: DISTINCT
    * `(media_id, v1, v2, v3, dt1, dt2)` rows. Both window passes and
    * the doc-mean join key on media_id — one partitioning end to end.
    * [[landmarkKeys]] is the doc-local pure twin (streaming ingest);
    * their equivalence is StreamingSpec-pinned. */
  def landmarkTable(media: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val samples = audioSampleRows(media)
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
      .select(col("media_id"), col("i"), col("v"))
    val wp = Window.partitionBy("media_id").orderBy("i")
    peaks
      .withColumn("v2", lead(col("v"), 1).over(wp))
      .withColumn("i2", lead(col("i"), 1).over(wp))
      .withColumn("v3", lead(col("v"), 2).over(wp))
      .withColumn("i3", lead(col("i"), 2).over(wp))
      .where(col("i3").isNotNull)
      .select(col("media_id"), col("v").as("v1"), col("v2"), col("v3"),
        (col("i2") - col("i")).as("dt1"), (col("i3") - col("i2")).as("dt2"))
      .where(col("dt1").between(1, 64) && col("dt2").between(1, 64))
      .distinct()
  }

  /** Doc-local landmark extraction — the EXACT [[landmarkTable]]
    * protocol as a pure function over ONE payload, for the streaming
    * ingest path (landmarks never cross documents, so per-arrival
    * extraction is stateless). Returns the distinct landmark keys as
    * `"v1|v2|v3|dt1|dt2"` strings; non-WAV payloads yield none. */
  def landmarkKeys(payload: Array[Byte]): Array[String] =
    parseWav(payload) match {
      case None => Array.empty
      case Some((_, samples)) =>
        val n = samples.length
        var tot = 0L
        var i = 0
        while (i < n) { tot += samples(i); i += 1 }
        val peakT = new scala.collection.mutable.ArrayBuffer[Int]
        val peakV = new scala.collection.mutable.ArrayBuffer[Int]
        i = 0
        while (i < n) {
          val v = samples(i).toInt
          if (v.toLong * n > tot) {
            var pmax = -1
            var j = math.max(0, i - 4)
            while (j < i) { if (samples(j) > pmax) pmax = samples(j); j += 1 }
            var nmax = -1
            j = i + 1
            val hi = math.min(n, i + 5)
            while (j < hi) { if (samples(j) > nmax) nmax = samples(j); j += 1 }
            if (v > pmax && v >= nmax) { peakT += (i + 1); peakV += v }
          }
          i += 1
        }
        val keys = scala.collection.mutable.LinkedHashSet.empty[String]
        var p = 0
        while (p + 2 < peakT.length) {
          val dt1 = peakT(p + 1) - peakT(p)
          val dt2 = peakT(p + 2) - peakT(p + 1)
          if (dt1 >= 1 && dt1 <= 64 && dt2 >= 1 && dt2 <= 64)
            keys += s"${peakV(p)}|${peakV(p + 1)}|${peakV(p + 2)}|$dt1|$dt2"
          p += 1
        }
        keys.toArray
    }

  /** Frame-grain content segments of each VIDEO payload: the decoded GIF
    * data stream split at the same 256-byte sub-block granule [[decode]]
    * counts frames at (frame f = bytes [256f, 256f+256); the trailing
    * partial block is a frame, matching `n_frames = len/256 + 1`).
    * Output (media_id, frame_idx, frame_str) — the per-frame content a
    * perceptual/video dedup stage hashes. Still formats and invalid
    * payloads emit nothing (a single still has no frame sequence to
    * compare). One typed flatMap at scan speed; the explode stays inside
    * the stage. The hash itself is applied by the CALLER as a codegen'd
    * `md5` column so the hot loop stays whole-stage. */
  def frameSegments(media: DataFrame, frameLen: Int = 256): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    graft.ops.Fanout.byKey(media, col("media_id")).as[MediaRecord].flatMap { r =>
      val (format, _, _, body) = decodeBytes(r.payload)
      if (format != "gif") Iterator.empty
      else {
        val n = body.length / frameLen + 1
        (0 until n).iterator.map { f =>
          val lo = f * frameLen
          val hi = math.min(lo + frameLen, body.length)
          (r.media_id, f, new String(body, lo, hi - lo, "UTF-8"))
        }
      }
    }.toDF("media_id", "frame_idx", "frame_str")
  }
}
