package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing — images/audio/video as opaque `binary`
  * columns with typed metadata, decoded batch-wise inside partitions.
  *
  * The container has no media libraries, so [[MediaCodec.decodeStub]] is a
  * clearly-marked deterministic FAKE standing in for a real decoder (JPEG
  * dims, mel spectrogram, frame sampling, ...). Everything around it —
  * schema, Dataset encoders, per-partition batch iteration, feature-column
  * shape — is the real production plumbing: swap `decodeStub` for a real
  * codec and nothing else changes.
  *
  * Scale notes: decode runs inside `mapPartitions` (the Scala analog of
  * mapInPandas batch UDFs) so per-record codec setup is amortized across a
  * partition; binary payloads never shuffle — features are extracted
  * before any wide operation; the feature column is `Array[Float]`, the
  * same shape the `embeddings` table and [[graft.operators.Similarity]]
  * consume, so decoded media flows straight into ANN search.
  */
object Media {

  /** An opaque media payload + typed metadata. */
  case class MediaRecord(doc_id: Long, media: Array[Byte], mime: String)

  /** Extracted features: dimensions + a fixed-width embedding. */
  case class MediaFeatures(doc_id: Long, n_bytes: Int, width: Int,
                           height: Int, features: Array[Float])

  /** Documents' text re-encoded as an opaque binary payload — the harness
    * has no real media bytes, so the bytes ARE the UTF-8 text; the
    * pipeline treats them as opaque. */
  def mediaRecords(s: SparkSession, d: String): Dataset[MediaRecord] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"),
              lit("application/octet-stream").as("mime"))
      .as[MediaRecord]
  }

  /** Batch decode + feature extraction over partitions. The iterator is
    * consumed lazily — no partition-wide materialization. */
  def extractFeatures(records: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      val codec = MediaCodec.open() // per-partition setup, amortized
      it.map { r =>
        val (w, h, feats) = codec.decodeStub(r.media)
        MediaFeatures(r.doc_id, r.media.length, w, h, feats)
      }
    }
  }

  /** Resized variant record (the thumbnail/preview path). */
  case class ResizedMedia(doc_id: Long, width: Int, height: Int,
                          thumb_w: Int, thumb_h: Int, thumb: Array[Byte])

  /** Resize: per-partition batch op over decoded dims — aspect-preserving
    * fit into a bounding box; the byte payload is the stub codec's
    * deterministic re-encode. Same plumbing contract as
    * [[extractFeatures]]: swap the stub for a real scaler and the
    * Dataset shape is unchanged. */
  def resize(records: Dataset[MediaRecord], maxSide: Int): Dataset[ResizedMedia] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      val codec = MediaCodec.open()
      it.map { r =>
        val (w, h, _) = codec.decodeStub(r.media)
        val scale = math.min(1.0, maxSide.toDouble / math.max(w, h))
        // floor(x + 0.5) with the add performed in IEEE double — the exact
        // op sequence the DuckDB oracle runs. (Math.round is NOT that: since
        // Java 8 it computes floor(x+0.5) in exact arithmetic, diverging on
        // the 0.49999999999999994-class inputs half an ulp below n+0.5.)
        val (tw, th) = (math.max(1, math.floor(w * scale + 0.5).toInt),
                        math.max(1, math.floor(h * scale + 0.5).toInt))
        ResizedMedia(r.doc_id, w, h, tw, th,
          codec.reencodeStub(r.media, tw, th))
      }
    }
  }

  /** One sampled frame: index + its feature vector. */
  case class Frame(doc_id: Long, frame_idx: Int, features: Array[Float])

  /** Frame sampling: every `stride`-th frame of a (stub-decoded) video
    * payload, each frame feature-extracted — the 1→N expansion runs
    * INSIDE the partition iterator, so a million-frame payload never
    * materializes as a driver-side list. */
  def sampleFrames(records: Dataset[MediaRecord], stride: Int): Dataset[Frame] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      val codec = MediaCodec.open()
      it.flatMap { r =>
        val n = codec.frameCountStub(r.media)
        Iterator.range(0, n, stride).map { f =>
          Frame(r.doc_id, f, codec.frameFeaturesStub(r.media, f))
        }
      }
    }
  }

  /** q34: the decode pipeline's integer outputs, oracle-checked — the stub
    * is md5-determined, so DuckDB re-derives width/height from the hex
    * digest (floats are covered by MediaSpec, not hash-compared). */
  def mediaFeatures(s: SparkSession, d: String): DataFrame =
    extractFeatures(mediaRecords(s, d))
      .select(col("doc_id"), col("n_bytes"), col("width"), col("height"))
      .orderBy(col("doc_id"))
  /** decodeStub's dims are 12-bit slices of the digest: width bits = hex
    * chars 1-3, height bits = hex chars 5-7 (md5(text) == md5 of the UTF-8
    * payload bytes). */
  val mediaFeaturesSql: String =
    """SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS n_bytes,
      |  CAST(64 + CAST(concat('0x', substr(md5(text), 1, 3)) AS INT) % 1024 AS INT) AS width,
      |  CAST(64 + CAST(concat('0x', substr(md5(text), 5, 3)) AS INT) % 1024 AS INT) AS height
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** q56: the resize pipeline's integer outputs (source + thumb dims),
    * oracle-checked — the aspect-preserving fit arithmetic runs on
    * stub-decoded dims, so DuckDB replays the identical IEEE ops:
    * scale = min(1, 256/max(w,h)); thumb = max(1, floor(side*scale+0.5)),
    * with [[Media.resize]] computing literally `math.floor(x + 0.5)` so
    * both engines perform the identical IEEE add-then-floor. */
  def resizedDims(s: SparkSession, d: String): DataFrame =
    resize(mediaRecords(s, d), maxSide = 256)
      .select(col("doc_id"), col("width"), col("height"),
              col("thumb_w"), col("thumb_h"))
      .orderBy(col("doc_id"))
  val resizedDimsSql: String =
    """WITH dims AS (
      |  SELECT doc_id,
      |    CAST(64 + CAST(concat('0x', substr(md5(text), 1, 3)) AS INT) % 1024 AS INT) AS width,
      |    CAST(64 + CAST(concat('0x', substr(md5(text), 5, 3)) AS INT) % 1024 AS INT) AS height
      |  FROM documents),
      |sc AS (
      |  SELECT doc_id, width, height,
      |    least(1.0, 256.0 / greatest(width, height)) AS scale
      |  FROM dims)
      |SELECT doc_id, width, height,
      |  CAST(greatest(1, CAST(floor(width * scale + 0.5) AS BIGINT)) AS INT) AS thumb_w,
      |  CAST(greatest(1, CAST(floor(height * scale + 0.5) AS BIGINT)) AS INT) AS thumb_h
      |FROM sc ORDER BY doc_id""".stripMargin

  /** q57: frame sampling's integer outputs — stride-4 sampling of the
    * stub-decoded frame count (1..32, digest byte 4 = md5 hex chars 9-10):
    * per doc, the sampled-frame count and index sum. The sum over indexes
    * 0, 4, ..., 4(c-1) closes to 2·c·(c-1). */
  def frameSampleStats(s: SparkSession, d: String): DataFrame =
    sampleFrames(mediaRecords(s, d), stride = 4)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"), sum(col("frame_idx")).as("sum_idx"))
      .orderBy(col("doc_id"))
  val frameSampleStatsSql: String =
    """WITH n AS (
      |  SELECT doc_id,
      |    1 + CAST(concat('0x', substr(md5(text), 9, 2)) AS INT) % 32 AS n_total
      |  FROM documents),
      |c AS (SELECT doc_id, (n_total + 3) // 4 AS cnt FROM n)
      |SELECT doc_id, CAST(cnt AS BIGINT) AS n_frames,
      |  CAST(2 * cnt * (cnt - 1) AS BIGINT) AS sum_idx
      |FROM c ORDER BY doc_id""".stripMargin

  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q34_media_features" -> (mediaFeatures _),
    "q56_media_resize"   -> (resizedDims _),
    "q57_frame_sample"   -> (frameSampleStats _))

  val oracles: Seq[(String, String)] = Seq(
    "q34_media_features" -> mediaFeaturesSql,
    "q56_media_resize"   -> resizedDimsSql,
    "q57_frame_sample"   -> frameSampleStatsSql)
}

/** The stubbed codec. A real implementation would hold native decoder
  * state opened once per partition; the stub derives everything
  * deterministically from the payload's MD5 so tests and oracles can
  * reproduce it. */
class MediaCodec private () {
  /** STUB — stands in for a real image/audio decode (no media libs in this
    * container). Deterministic: width/height/features are pure functions
    * of md5(payload). */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Array[Float]) = {
    val d = digest(bytes)
    val width = 64 + (u8(d, 0) << 4 | u8(d, 1) >> 4) % 1024
    val height = 64 + (u8(d, 2) << 4 | u8(d, 3) >> 4) % 1024
    val feats = Array.tabulate(8)(i => u8(d, i * 2) / 255.0f)
    (width, height, feats)
  }

  /** STUB re-encode at a target size: deterministic bytes derived from the
    * payload digest + dims (a real codec would scale and re-compress). */
  def reencodeStub(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
    digest(bytes ++ Array(w.toByte, h.toByte))

  /** STUB frame count: 1–32 frames, digest-determined. */
  def frameCountStub(bytes: Array[Byte]): Int = 1 + u8(digest(bytes), 4) % 32

  /** STUB per-frame features (digest of payload + frame index). */
  def frameFeaturesStub(bytes: Array[Byte], frame: Int): Array[Float] = {
    val d = digest(bytes ++ Array(frame.toByte))
    Array.tabulate(8)(i => u8(d, i) / 255.0f)
  }

  private def digest(bytes: Array[Byte]): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(bytes)
  }
  private def u8(d: Array[Byte], i: Int): Int = d(i) & 0xff
}

object MediaCodec {
  def open(): MediaCodec = new MediaCodec()
}
