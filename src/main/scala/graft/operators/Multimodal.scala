package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: payloads are opaque `binary` columns with typed metadata
  * alongside. All the Spark-side plumbing — schema, partition sizing, batch
  * iteration shape — is real; the actual media decode is STUBBED with a
  * deterministic fake (this environment ships no image/audio codecs), marked
  * [STUB] below. Swapping in a real decoder changes only the body of
  * `decodeStub`, nothing about the distributed plan.
  *
  * Scale notes: binary payloads dominate row size, so operators here never
  * shuffle payloads — metadata extraction is a narrow projection, and
  * decode runs `mapPartitions`-style so one task streams its partition
  * through the (expensive, possibly native) decoder with per-partition
  * setup amortized — the same execution shape as a Pandas-UDF
  * `mapInPandas` batch loop.
  */
object Multimodal {

  /** Typed record for the decode path. */
  final case class MediaRow(id: Long, modality: String, payload: Array[Byte])
  final case class DecodedRow(id: Long, modality: String, sizeBytes: Long,
                              width: Int, height: Int, channels: Int,
                              durationMs: Long)

  /** Magic-byte content sniffing — a real (non-stub) metadata extractor,
    * pure Column expressions so it stays in codegen: no UDF, payloads never
    * leave the scan.
    */
  def sniffType(bin: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val head = hex(substr(bin, lit(1), lit(4)))
    // mp4: 'ftyp' brand sits at byte offset 4, after the box-size word
    val box = hex(substr(bin, lit(5), lit(4)))
    when(head.startsWith("89504E47"), "image/png")
      .when(head.startsWith("FFD8FF"), "image/jpeg")
      .when(head.startsWith("47494638"), "image/gif")
      .when(head.startsWith("52494646"), "audio/wav") // RIFF container
      .when(head.startsWith("494433"), "audio/mp3")   // ID3
      .when(head.startsWith("1A45DFA3"), "video/webm")
      .when(box === "66747970", "video/mp4")
      .otherwise("application/octet-stream")
  }

  /** Attach a metadata struct (size, sniffed type, content hash) to a binary
    * column — one narrow pass, no decode needed.
    */
  def withMeta(df: DataFrame, binCol: String = "payload"): DataFrame =
    df.withColumn("meta", struct(
      length(col(binCol)).cast("long").as("size_bytes"),
      sniffType(col(binCol)).as("content_type"),
      md5(col(binCol)).as("content_md5")))

  /** [STUB] "Decode" a media payload into per-modality features.
    *
    * Deterministic fake: dimensions/duration derive from the payload bytes
    * (first/last byte + length) so tests are stable and the full distributed
    * pipeline — typed Dataset, per-partition batching, per-partition decoder
    * setup — is exercised for real. A production build replaces the body
    * with e.g. javax.imageio / ffmpeg bindings; the plan shape is unchanged.
    */
  def decodeStub(ds: Dataset[MediaRow]): Dataset[DecodedRow] = {
    implicit val enc = Encoders.product[DecodedRow]
    ds.mapPartitions { rows =>
      // per-partition decoder setup would go here (load codec, pin buffers)
      rows.map { r =>
        val n = r.payload.length
        val a = if (n > 0) r.payload(0) & 0xFF else 0
        val z = if (n > 0) r.payload(n - 1) & 0xFF else 0
        r.modality match {
          case "image" =>
            DecodedRow(r.id, r.modality, n, 16 + (a % 64) * 16,
              16 + (z % 64) * 16, 3, 0L)
          case "audio" =>
            DecodedRow(r.id, r.modality, n, 0, 0, 1 + (a % 2),
              math.max(1L, n * 1000L / 44100))
          case "video" =>
            DecodedRow(r.id, r.modality, n, 16 + (a % 120) * 16,
              16 + (z % 68) * 16, 3, math.max(1L, n * 1000L / 100000))
          case _ => DecodedRow(r.id, r.modality, n, 0, 0, 0, 0L)
        }
      }
    }
  }

  /** [STUB] "Resize" decoded media to a target box, preserving aspect ratio
    * — the geometry (fit-within-box scaling, even dimensions) is real; only
    * the pixel resampling would live in the decoder. Runs in the same typed
    * mapPartitions shape as [[decodeStub]] so per-partition codec state
    * could be shared.
    */
  def resizeStub(ds: Dataset[DecodedRow], maxW: Int, maxH: Int)
      : Dataset[DecodedRow] = {
    implicit val enc = Encoders.product[DecodedRow]
    ds.mapPartitions { rows =>
      rows.map { r =>
        if (r.width <= 0 || r.height <= 0) r
        else {
          val scale = math.min(1.0,
            math.min(maxW.toDouble / r.width, maxH.toDouble / r.height))
          val w = math.max(2, (r.width * scale).toInt / 2 * 2)
          val h = math.max(2, (r.height * scale).toInt / 2 * 2)
          r.copy(width = w, height = h)
        }
      }
    }
  }

  /** Evenly-spaced fixed-width chunks of a binary payload ("frame sampling"
    * for video / windowing for audio) as pure expressions — the chunk
    * *selection* is real; interpreting chunk bytes is the decoder's job.
    * Returns one row per (id, frame_idx, frame_bytes).
    */
  def sampleFrames(df: DataFrame, nFrames: Int, frameBytes: Int = 16,
                   idCol: String = "id", binCol: String = "payload")
      : DataFrame = {
    val len = length(col(binCol))
    df.select(col(idCol), col(binCol),
        explode(sequence(lit(0), lit(nFrames - 1))).as("frame_idx"))
      .withColumn("offset",
        (col("frame_idx") * greatest(len - frameBytes, lit(0))
          / lit(math.max(1, nFrames - 1))).cast("int"))
      .filter(len > 0)
      .select(col(idCol), col("frame_idx"),
        substr(col(binCol), col("offset") + 1, lit(frameBytes))
          .as("frame_bytes"))
  }

  /** Demo corpus: deterministic fake payloads derived from the documents
    * table (text bytes prefixed with a per-modality magic header), so the
    * whole pipeline runs on the standard testdata without real media files.
    */
  def syntheticCorpus(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    val magic = when(col(idCol) % 3 === 0, unhex(lit("89504E470D0A1A0A")))
      .when(col(idCol) % 3 === 1, unhex(lit("524946460000000057415645")))
      .otherwise(unhex(lit("000000186674797069736F6D"))) // ....ftypisom
    val modality = when(col(idCol) % 3 === 0, "image")
      .when(col(idCol) % 3 === 1, "audio").otherwise("video")
    docs.select(col(idCol).as("id"), modality.as("modality"),
      concat(magic, encode(col(textCol), "UTF-8")).as("payload"))
  }
}
