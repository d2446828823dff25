package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** [EXT] Multimodal column conventions (SURVEY §2.5): media payloads as
  * opaque binary columns + typed metadata, with decode / feature-extract
  * as partition-wise batch operators — the Scala analogue of
  * `mapInPandas` (iterator of batches in, iterator of batches out; no
  * per-row UDF dispatch, bounded memory per partition).
  *
  * The container ships no image/audio codecs, so `decodeStub` is a
  * deterministic fake decoder (documented, per the builder brief): it
  * produces stable pseudo-features from the payload bytes. The Spark-side
  * plumbing — schema, batch shape, partitioning — is real and is what the
  * tests exercise.
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

  /** Deterministic stand-in for a real media decode (no codecs in the
    * container): dimensions derived from a stable hash of the payload,
    * plus genuine byte statistics. Runs partition-wise over row batches. */
  def decodeStub(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.payload
        var h = 1125899906842597L // deterministic FNV-ish fold
        var sum = 0L
        val hist = new Array[Long](256)
        var i = 0
        while (i < bytes.length) {
          val b = bytes(i) & 0xff
          h = h * 31 + b
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
        val w = 16 + (math.abs(h) % 1905).toInt      // fake 16..1920
        val ht = 16 + (math.abs(h >> 17) % 1065).toInt
        MediaFeatures(r.doc_id, r.mime, bytes.length, w, ht,
          sum.toDouble / n, entropy)
      }
    }
  }
}
