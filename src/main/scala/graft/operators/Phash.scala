package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

import graft.operators.Multimodal.MediaRow

/** Perceptual near-duplicate image detection via difference hash
  * (dHash — the classic 9×8 row-gradient fingerprint; Krawetz's
  * public write-up of the pHash family): decode the REAL codec
  * payload, block-average to a 9×8 integer luma grid, take the 64
  * row-adjacent comparisons as bits, and pair images whose hashes
  * differ in ≤ `maxHamming` bits. Catches re-encodes, brightness
  * shifts and resizes that byte-level dedup can never see.
  *
  * Everything after the codec is integer and engine-portable: luma =
  * 299r+587g+114b (scaled ×1000, no division), cells are
  * floor(sum/npix) over floor-boundary blocks (`[⌊cx·w/9⌋, ⌊(cx+1)·w/9⌋)`
  * — handles any dims without float resampling), bits pack into two
  * non-negative 32-bit halves (no sign/overflow edge at bit 63 under
  * ANSI). The oracle replays decode via the closed-form pixel formula
  * the corpus is built from — the same device that put the PNG codec
  * under q_multimodal_pixels' exact gate.
  *
  * Scale shape: hashing is a zero-shuffle typed projection through the
  * codec (cost ∝ pixels decoded, the floor). Pairing is the Manku
  * multi-block device shared with [[Dedup]]'s simhash: 4 disjoint
  * 16-bit blocks, candidates = equi-join on (block_idx, block_value)
  * — pigeonhole-complete for hamming ≤ 3 — then an exact popcount
  * verify. No all-pairs path; fan-out is bounded by bucket occupancy
  * exactly as in the LSH band join.
  */
object Phash {

  final case class HashRow(id: Long, h_lo: Long, h_hi: Long)

  /** Base image per document plus, for every 7th document, a planted
    * near-duplicate: the variant keeps the base's dimensions but shifts
    * the pixel seed by 1 — a global +1 brightness shift (mod 256)
    * through the REAL PNG encoder, which preserves most row gradients
    * (wrap pixels flip a few bits). Variant ids are base + 1,000,000. */
  def variantCorpus(docs: DataFrame, idCol: String = "doc_id")
      : Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    val target = docs.sparkSession.sparkContext.defaultParallelism
    docs.select(col(idCol).cast("long").as("id")).repartition(target)
      .as[Long](Encoders.scalaLong)
      .mapPartitions { ids =>
        ids.flatMap { id =>
          val w = 8 * (1 + (id % 16)).toInt
          val h = 8 * (1 + (id % 9)).toInt
          val base = MediaRow(id, "image", Multimodal.buildPng(id, w, h))
          if (id % 7 == 0)
            Iterator(base,
              MediaRow(id + 1000000L, "image",
                Multimodal.buildPng(id + 1, w, h)))
          else Iterator(base)
        }
      }
  }

  /** dHash every payload through the real codec: 9×8 floor-boundary
    * block-mean luma grid, row-gradient bits, two 32-bit halves.
    * Undecodable payloads degrade to (0, 0), never throw. */
  def dHash(ds: Dataset[MediaRow]): Dataset[HashRow] = {
    implicit val enc = Encoders.product[HashRow]
    ds.mapPartitions { rows =>
      rows.map { r =>
        val img =
          try javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.payload))
          catch { case _: Exception => null }
        if (img == null) HashRow(r.id, 0L, 0L)
        else {
          val w = img.getWidth; val h = img.getHeight
          val cell = Array.ofDim[Long](8, 9)
          // width < 9 leaves zero-width grid columns: those cells are
          // EMPTY (no mean exists) and any gradient touching one is 0 —
          // the oracle's NULL-comparison semantics, not a fake 0 mean
          val empty = Array.ofDim[Boolean](9)
          var cy = 0
          while (cy < 8) {
            val y0 = cy * h / 8; val y1 = (cy + 1) * h / 8
            var cx = 0
            while (cx < 9) {
              val x0 = cx * w / 9; val x1 = (cx + 1) * w / 9
              if (x1 == x0) empty(cx) = true
              else {
                var s = 0L
                var y = y0
                while (y < y1) {
                  var x = x0
                  while (x < x1) {
                    val rgb = img.getRGB(x, y)
                    s += 299L * ((rgb >> 16) & 0xFF) +
                      587L * ((rgb >> 8) & 0xFF) + 114L * (rgb & 0xFF)
                    x += 1
                  }
                  y += 1
                }
                cell(cy)(cx) = s / ((y1 - y0).toLong * (x1 - x0))
              }
              cx += 1
            }
            cy += 1
          }
          var lo = 0L; var hi = 0L
          var k = 0
          while (k < 64) {
            val r8 = k / 8; val c8 = k % 8
            if (!empty(c8) && !empty(c8 + 1) &&
              cell(r8)(c8 + 1) > cell(r8)(c8)) {
              if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
            }
            k += 1
          }
          HashRow(r.id, lo, hi)
        }
      }
    }
  }

  /** All pairs (a < b) within `maxHamming` bits, via the 4×16-bit
    * block equi-join (complete for maxHamming ≤ 3 by pigeonhole) and
    * an exact popcount verify. Returns (a_id, b_id, hamming). */
  def nearDupPairs(hashes: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "4 disjoint blocks are pigeonhole-complete only for hamming <= 3")
    val blocks = hashes.select(col("id"),
        explode(array(
          struct(lit(0).as("bi"), (col("h_lo") % 65536).as("bv")),
          struct(lit(1).as("bi"), expr("h_lo div 65536").as("bv")),
          struct(lit(2).as("bi"), (col("h_hi") % 65536).as("bv")),
          struct(lit(3).as("bi"), expr("h_hi div 65536").as("bv"))))
          .as("blk"))
      .select(col("id"), col("blk.bi").as("bi"), col("blk.bv").as("bv"))
    val cand = blocks.join(
        blocks.select(col("id").as("id2"), col("bi"), col("bv")),
        Seq("bi", "bv"))
      .filter(col("id") < col("id2"))
      .select(col("id").as("a_id"), col("id2").as("b_id"))
      .distinct()
    cand
      .join(hashes.select(col("id").as("a_id"), col("h_lo").as("alo"),
        col("h_hi").as("ahi")), "a_id")
      .join(hashes.select(col("id").as("b_id"), col("h_lo").as("blo"),
        col("h_hi").as("bhi")), "b_id")
      .select(col("a_id"), col("b_id"),
        (bit_count(col("alo").bitwiseXOR(col("blo"))) +
          bit_count(col("ahi").bitwiseXOR(col("bhi")))).cast("long")
          .as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
