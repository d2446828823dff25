package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** [EXT] Multimodal column conventions (SURVEY §2.5): media payloads as
  * opaque binary columns + typed metadata, with decode / feature-extract
  * as partition-wise batch operators — the Scala analogue of
  * `mapInPandas` (iterator of batches in, iterator of batches out; no
  * per-row UDF dispatch, bounded memory per partition).
  *
  * The decode step is REAL for container formats whose headers are pure
  * byte layout — PNG (IHDR), JPEG (SOF segment scan), GIF (logical screen
  * descriptor), BMP (BITMAPINFOHEADER): dimensions and mime come from the
  * payload bytes, no codec jars needed. Pixel-level decode (which would
  * need actual codecs absent from this container) is intentionally out of
  * scope; byte statistics (length / mean / entropy) are computed for every
  * payload regardless of format.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte], mime: String)
  case class MediaFeatures(doc_id: Long, mime: String, n_bytes: Int,
                           width: Int, height: Int, mean_byte: Double,
                           entropy: Double)

  /** Attach the multimodal convention columns to a documents-like table. */
  def asMedia(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"),
                lit("application/octet-stream").as("mime"))
      .as[MediaRow]
  }

  private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Container-format sniff: (mime, width, height) from the payload's
    * header bytes, or (passThroughMime, -1, -1) when the bytes aren't a
    * recognized image container. Formats and offsets follow the public
    * specs: PNG (ISO 15948 §5.3/§11.2.2 IHDR), JPEG/JFIF (ITU T.81 SOF
    * markers), GIF87a/89a logical screen descriptor, BMP BITMAPINFOHEADER. */
  def sniffDims(b: Array[Byte], passThroughMime: String): (String, Int, Int) = {
    @inline def u8(i: Int): Int = b(i) & 0xff
    @inline def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    @inline def be32(i: Int): Int =
      (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    @inline def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    @inline def le32(i: Int): Int =
      u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)

    if (b.length >= 24 && b.startsWith(PngSig) &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
      ("image/png", be32(16), be32(20))
    } else if (b.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      // walk marker segments until a start-of-frame carries the dims
      var i = 2
      while (i + 9 < b.length && u8(i) == 0xff) {
        val marker = u8(i + 1)
        if (marker == 0xff) i += 1 // fill byte
        else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd9)) i += 2
        else {
          val isSof = marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc
          if (isSof) return ("image/jpeg", be16(i + 7), be16(i + 5))
          i += 2 + be16(i + 2)
        }
      }
      ("image/jpeg", -1, -1)
    } else if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
               b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a') {
      ("image/gif", le16(6), le16(8))
    } else if (b.length >= 26 && b(0) == 'B' && b(1) == 'M') {
      ("image/bmp", le32(18), le32(22))
    } else (passThroughMime, -1, -1)
  }

  /** Decode media rows partition-wise: real header dims + mime via
    * [[sniffDims]], plus byte statistics over the whole payload. */
  def decode(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.payload
        var sum = 0L
        val hist = new Array[Long](256)
        var i = 0
        while (i < bytes.length) {
          val b = bytes(i) & 0xff
          sum += b
          hist(b) += 1
          i += 1
        }
        val n = math.max(bytes.length, 1)
        var entropy = 0.0
        var j = 0
        while (j < 256) {
          if (hist(j) > 0) {
            val p = hist(j).toDouble / n
            entropy -= p * math.log(p) / math.log(2.0)
          }
          j += 1
        }
        val (mime, w, h) = sniffDims(bytes, r.mime)
        MediaFeatures(r.doc_id, mime, bytes.length, w, h,
          sum.toDouble / n, entropy)
      }
    }
  }

  // --- audio (WAV/RIFF) — the audio modality's container metadata is as
  // header-parseable as the image formats above: channels / sample rate /
  // bit depth / sample count come straight from the fmt and data chunks
  // (no codec needed for PCM). pcm_sum pins that the data bytes arrived
  // intact end-to-end, not just the header.

  case class AudioRow(doc_id: Long, payload: Array[Byte])
  case class AudioFeatures(doc_id: Long, mime: String, n_bytes: Int,
                           channels: Int, sample_rate: Int, bits: Int,
                           n_samples: Long, duration_ms: Long, pcm_sum: Long)

  /** RIFF/WAVE parse: (channels, sampleRate, bits, dataOffset, dataLen),
    * or None if the bytes are not a WAV container. Chunk walk per the
    * public RIFF spec: id(4) + size(4 LE), `fmt ` carries the PCM params,
    * `data` the samples; unknown chunks skip (word-aligned). */
  def sniffWav(b: Array[Byte]): Option[(Int, Int, Int, Int, Int)] = {
    @inline def le16(i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    @inline def le32(i: Int): Int = le16(i) | (le16(i + 2) << 16)
    if (b.length < 44 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
        b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E') return None
    var i = 12
    var fmt: Option[(Int, Int, Int)] = None
    while (i + 8 <= b.length) {
      val size = le32(i + 4)
      val id = new String(b, i, 4, "US-ASCII")
      if (id == "fmt " && size >= 16)
        fmt = Some((le16(i + 10), le32(i + 12), le16(i + 22)))
      else if (id == "data")
        return fmt.map { case (ch, rate, bits) =>
          (ch, rate, bits, i + 8, math.min(size, b.length - i - 8)) }
      i += 8 + size + (size & 1) // chunks are word-aligned
    }
    None
  }

  /** Partition-wise audio metadata decode (the mapInPandas shape, same as
    * [[decode]]): header params + exact duration + a data-chunk checksum. */
  def decodeAudio(media: Dataset[AudioRow]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        sniffWav(r.payload) match {
          case Some((ch, rate, bits, off, len)) =>
            val bytesPerSample = math.max(ch * bits / 8, 1)
            val nSamples = len.toLong / bytesPerSample
            var sum = 0L
            var i = off
            while (i < off + len) { sum += (r.payload(i) & 0xff); i += 1 }
            AudioFeatures(r.doc_id, "audio/wav", r.payload.length, ch, rate,
              bits, nSamples, nSamples * 1000L / rate, sum)
          case None =>
            AudioFeatures(r.doc_id, "application/octet-stream",
              r.payload.length, -1, -1, -1, -1L, -1L, -1L)
        }
      }
    }
  }

  /** Test/fixture encoder: a minimal valid PCM WAV whose data bytes are the
    * deterministic stream ((seed*31 + i*7) mod 256) — reproducible by plain
    * arithmetic on the oracle side, so end-to-end payload fidelity is
    * hash-checkable without an audio codec anywhere. */
  def syntheticWav(seed: Long, channels: Int, rate: Int, bits: Int,
                   nSamples: Int): Array[Byte] = {
    val dataLen = nSamples * channels * (bits / 8)
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >>> 16) & 0xffff) }
    out.write("RIFF".getBytes("US-ASCII")); le32(36 + dataLen)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); le32(16)
    le16(1) // PCM
    le16(channels); le32(rate)
    le32(rate * channels * (bits / 8)) // byte rate
    le16(channels * (bits / 8))        // block align
    le16(bits)
    out.write("data".getBytes("US-ASCII")); le32(dataLen)
    var i = 0
    while (i < dataLen) { out.write(((seed * 31 + i * 7) % 256).toInt); i += 1 }
    out.toByteArray
  }

  /** Test/fixture encoder: wrap `body` in a minimal-but-valid image
    * container header so [[decode]] has real dimensions to find. Supported
    * mimes: image/png (signature + IHDR), image/jpeg (SOI + APP0 + SOF0). */
  def syntheticImage(mime: String, width: Int, height: Int,
                     body: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def be16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def be32(v: Int): Unit = { be16((v >> 16) & 0xffff); be16(v & 0xffff) }
    mime match {
      case "image/png" =>
        out.write(PngSig)
        be32(13) // IHDR length
        out.write("IHDR".getBytes("US-ASCII"))
        be32(width); be32(height)
        out.write(8)  // bit depth
        out.write(2)  // color type: truecolor
        out.write(0); out.write(0); out.write(0) // compression/filter/interlace
        be32(0) // CRC placeholder (dims sniffing doesn't validate CRCs)
      case "image/jpeg" =>
        out.write(0xff); out.write(0xd8) // SOI
        out.write(0xff); out.write(0xe0) // APP0
        be16(16)
        out.write("JFIF".getBytes("US-ASCII")); out.write(0)
        out.write(1); out.write(1) // version
        out.write(0); be16(1); be16(1) // density
        out.write(0); out.write(0)  // thumbnail
        out.write(0xff); out.write(0xc0) // SOF0 (baseline)
        be16(11) // segment length: 8 + 3 * 1 component
        out.write(8)       // precision
        be16(height); be16(width)
        out.write(1)       // 1 component
        out.write(1); out.write(0x11); out.write(0) // id, sampling, quant table
      case other =>
        throw new IllegalArgumentException(s"syntheticImage: unsupported mime $other")
    }
    out.write(body)
    out.toByteArray
  }
}
