package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling (SURVEY.md §2.E12).
  *
  * Media are opaque `binary` columns + typed metadata. Metadata
  * extraction (size, magic bytes, container kind) is pure expressions.
  * Decode / feature extraction runs via `mapPartitions` in BATCHES —
  * the Scala analog of `mapInPandas`: per-partition, we pull fixed-size
  * batches so a real decoder (JNI/FFI) would amortize setup per batch,
  * never per row, and memory stays bounded by batchSize × mediaSize.
  *
  * The byte-level decoder itself is STUBBED (no media libs in this
  * environment): [[FakeDecoder]] is a clearly-marked deterministic
  * stand-in keyed on content bytes, so the plumbing (schema, encoder,
  * batch shape, partitioning) is real and testable.
  */
object Multimodal {

  /** Raw media record: id + opaque payload. */
  case class MediaRow(media_id: Long, payload: Array[Byte])

  /** Decoded features: fixed-shape output schema a downstream training
    * pipeline would consume.
    */
  case class MediaFeatures(media_id: Long, kind: String, width: Int,
                           height: Int, n_bytes: Int,
                           features: Array[Float])

  /** Magic-byte sniffing table (public file signatures). */
  private val magicTable: Seq[(String, String)] = Seq(
    "89504e47" -> "png", "ffd8ff" -> "jpeg", "47494638" -> "gif",
    "52494646" -> "riff", "664c6143" -> "flac", "1a45dfa3" -> "mkv")

  /** Pure-expression metadata over a binary column: byte length, leading
    * magic bytes (lower hex), container kind. Runs inside the scan
    * stage — no shuffle, no UDF.
    */
  def metadata(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val magic = lower(substring(hex(col(binCol)), 1, 8))
    val kind = magicTable.foldRight(lit("unknown")) { case ((sig, k), acc) =>
      when(magic.startsWith(sig), k).otherwise(acc)
    }
    df.select(col(idCol).as("media_id"),
      length(col(binCol)).cast("long").as("n_bytes"),
      magic.as("magic"), kind.as("kind"))
  }

  /** E12b: REAL byte-level image dimension parsing — pure expressions
    * over the binary column, no decoder library involved (container
    * headers are public fixed layouts):
    *
    *  - PNG: width/height are big-endian uint32 at payload bytes
    *    17-20 / 21-24 (8-byte signature + 4-byte IHDR length +
    *    "IHDR"), i.e. hex chars 33-40 / 41-48;
    *  - GIF: width/height are LITTLE-endian uint16 at bytes 7-8 /
    *    9-10 (after "GIF87a"/"GIF89a"), i.e. byte-swapped hex chars
    *    13-16 / 17-20;
    *  - JPEG: dims live in the frame header (SOFn segment), which
    *    sits at a VARIABLE offset behind APPn/COM/quant segments — a
    *    bounded marker walk (`aggregate` over ≤ maxSegments steps)
    *    follows the `FF mk len` chain from byte 3 until an SOFn
    *    marker (C0–CF minus C4/C8/CC), then height/width are
    *    big-endian uint16 at SOF payload bytes 4-5 / 6-7;
    *  - anything else (or a malformed/truncated walk): null dims.
    *
    * Parsing runs on the hex string of the first `headBytes` bytes
    * (one `hex` call shared by magic sniff, fixed offsets, and the
    * walk) with `conv(_, 16, 10)` — inside the scan stage, no
    * shuffle, no UDF. This is the header-metadata pass a 100 TB
    * media pipeline runs BEFORE any costly decode: size/aspect
    * filters drop rows while only the header prefix is expanded
    * (hex on a whole multi-MB payload would double it into chars).
    */
  def imageDims(df: DataFrame, idCol: String, binCol: String,
                headBytes: Int = 65536, maxSegments: Int = 16): DataFrame = {
    val h = upper(hex(substring(col(binCol), 1, headBytes)))
    def hexAt(pos: Int, len: Int) =
      conv(substring(h, pos, len), 16, 10).cast("long")
    val magic = lower(substring(h, 1, 8))
    val kind = magicTable.foldRight(lit("unknown")) { case ((sig, k), acc) =>
      when(magic.startsWith(sig), k).otherwise(acc)
    }
    // JPEG marker walk. Fold state (byte offset of the segment's 0xFF,
    // 1-based): positive = keep walking, -p = SOFn found at byte p,
    // 0 = malformed / SOS reached / truncated (no dims). Byte i is hex
    // chars 2i-1..2i; a segment at p is FF(p) mk(p+1) len(p+2..p+3).
    val sofMarkers = Seq("C0", "C1", "C2", "C3", "C5", "C6", "C7",
      "C9", "CA", "CB", "CD", "CE", "CF")
    val walk = aggregate(sequence(lit(1), lit(maxSegments)), lit(3L),
      (acc, _) => {
        val ff = h.substr((acc * 2 - 1).cast("int"), lit(2)) === "FF"
        val mk = h.substr((acc * 2 + 1).cast("int"), lit(2))
        val segLen = conv(h.substr((acc * 2 + 3).cast("int"), lit(4)),
          16, 10).cast("long")
        when(acc <= 0L, acc) // terminal: found (<0) or failed (0)
          .when(!ff, lit(0L)) // lost marker sync (or past the prefix)
          .when(mk.isInCollection(sofMarkers), -acc)
          .when(mk === "DA", lit(0L)) // SOS: entropy data, SOF missed
          .otherwise(acc + 2L + segLen)
      })
    val sof = -walk // byte offset of the SOF segment's FF when found
    // SOF payload: len(2) precision(1) height(2 BE) width(2 BE) —
    // height at bytes sof+5..6 (hex chars 2·sof+9), width at sof+7..8
    val jH = conv(h.substr((sof * 2 + 9).cast("int"), lit(4)), 16, 10)
      .cast("long")
    val jW = conv(h.substr((sof * 2 + 13).cast("int"), lit(4)), 16, 10)
      .cast("long")
    df.select(col(idCol).as("media_id"),
      length(col(binCol)).cast("long").as("n_bytes"),
      kind.as("kind"),
      when(kind === "png", hexAt(33, 8))
        .when(kind === "gif", hexAt(13, 2) + hexAt(15, 2) * 256)
        .when(kind === "jpeg" && walk < 0L, jW)
        .as("width"),
      when(kind === "png", hexAt(41, 8))
        .when(kind === "gif", hexAt(17, 2) + hexAt(19, 2) * 256)
        .when(kind === "jpeg" && walk < 0L, jH)
        .as("height"))
  }

  /** STUB decoder — deterministic fake. A production build replaces this
    * object behind the same (bytes → features) signature with an FFI
    * decoder; nothing else changes.
    */
  object FakeDecoder {
    def decode(payload: Array[Byte], dims: Int): (Int, Int, Array[Float]) = {
      var h = 1125899906842597L // deterministic FNV-ish fold over bytes
      payload.foreach(b => h = h * 31 + (b & 0xff))
      val width = 16 + math.abs(h % 1024).toInt
      val height = 16 + math.abs((h >> 10) % 1024).toInt
      val feats = Array.tabulate(dims) { i =>
        val x = h * (i * 2 + 1)
        ((x >>> 11).toDouble / (1L << 53).toDouble).toFloat
      }
      (width, height, feats)
    }
  }

  /** Resized-image record (stub dims; payload untouched — a real
    * resizer would transcode).
    */
  case class ResizedMedia(media_id: Long, width: Int, height: Int,
                          payload: Array[Byte])

  /** Sampled video frame: one row per kept frame. */
  case class Frame(media_id: Long, frame_idx: Int, payload: Array[Byte])

  /** Batched resize — same mapPartitions batch shape as decode; the
    * pixel work is stubbed (deterministic target box), the plumbing
    * (schema, batching, per-batch setup point) is real.
    */
  def resize(spark: SparkSession, media: Dataset[MediaRow],
             maxSide: Int, batchSize: Int = 64): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val (w, h, _) = FakeDecoder.decode(row.payload, 0)
          val scale = math.min(1.0, maxSide.toDouble / math.max(w, h))
          ResizedMedia(row.media_id,
            math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt),
            row.payload)
        }
      }
    }
  }

  /** Frame sampling: emit every `stride`-th frame of an opaque video
    * payload (frame boundaries stubbed as fixed-size chunks). One input
    * row fans out to ≤ maxFrames rows — the flatMap shape a real
    * demuxer needs.
    */
  def sampleFrames(spark: SparkSession, media: Dataset[MediaRow],
                   chunkBytes: Int, stride: Int,
                   maxFrames: Int): Dataset[Frame] = {
    import spark.implicits._
    media.flatMap { row =>
      row.payload.grouped(chunkBytes).zipWithIndex
        .filter { case (_, i) => i % stride == 0 }
        .take(maxFrames)
        .map { case (chunk, i) => Frame(row.media_id, i, chunk) }
    }
  }

  /** Batched decode: pulls `batchSize` rows at a time per partition
    * (mapInPandas-equivalent batch shape) and emits fixed-dim features.
    */
  def decodeFeatures(spark: SparkSession, media: Dataset[MediaRow],
                     dims: Int = 8,
                     batchSize: Int = 64): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch decoder setup would happen here (amortized cost)
        batch.iterator.map { row =>
          val (w, h, f) = FakeDecoder.decode(row.payload, dims)
          val magic = row.payload.take(4).map(b => f"${b & 0xff}%02x").mkString
          val kind = magicTable.collectFirst {
            case (sig, k) if magic.startsWith(sig) => k
          }.getOrElse("unknown")
          MediaFeatures(row.media_id, kind, w, h, row.payload.length, f)
        }
      }
    }
  }
}
