package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables._

/** Multimodal (image/audio/video) column handling: media travel as opaque
  * `binary` columns plus typed metadata structs; decode / feature-extract /
  * frame-sample run as distributed per-partition transforms.
  *
  * The container has no image/audio codecs, so the byte-level decode is a
  * clearly-marked deterministic STUB ([[FakeCodec]]); everything Spark-side
  * — schema, batching, partition-parallel execution, metadata extraction —
  * is real and is what carries over to a production codec. The plumbing is
  * `Dataset[MediaRecord].mapPartitions`, the Scala-native equivalent of a
  * `mapInPandas` batch UDF: one codec instance per partition, streamed rows.
  */
object Multimodal {

  /** A media row: opaque payload + envelope metadata. */
  case class MediaRecord(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Extracted features per media item. */
  case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Long,
                           width: Int, height: Int, n_frames: Int,
                           checksum: Long)

  /** STUB codec: a real implementation would wrap an image/audio library
    * here (one instance per partition, reused across rows). The fake is
    * deterministic so tests and reruns are stable.
    */
  object FakeCodec {
    /** ??? in spirit — stands in for e.g. an ImageIO/ffmpeg decode. */
    def decodeDims(payload: Array[Byte]): (Int, Int) = {
      val n = payload.length
      (n % 640 + 1, n % 480 + 1)
    }
    def frameCount(payload: Array[Byte], mediaType: String): Int =
      if (mediaType == "video") payload.length % 30 + 1 else 1
    def checksum(payload: Array[Byte]): Long =
      payload.foldLeft(1469598103934665603L)((h, b) => (h ^ (b & 0xffL)) * 1099511628211L)
  }

  /** Synthesize a deterministic media table from documents (utf-8 bytes as
    * the opaque payload) — the binary-column plumbing under test.
    */
  def mediaTable(s: SparkSession, d: String): Dataset[MediaRecord] = {
    import s.implicits._
    documents(s, d).select(
      $"doc_id",
      element_at(array(lit("image"), lit("audio"), lit("video")),
        ($"doc_id" % 3 + 1).cast("int")).as("media_type"),
      encode($"text", "UTF-8").as("payload"))
      .as[MediaRecord]
  }

  /** Distributed feature extraction: partition-parallel, codec per
    * partition, no shuffle. This is the operator shape that scales — at
    * 100 TB each partition streams its blobs through the codec once.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // (real codec would be instantiated here, once per partition)
      it.map { r =>
        val (w, h) = FakeCodec.decodeDims(r.payload)
        MediaFeatures(r.doc_id, r.media_type, r.payload.length.toLong, w, h,
          FakeCodec.frameCount(r.payload, r.media_type),
          FakeCodec.checksum(r.payload))
      }
    }
  }

  // mm01 — metadata extraction over binary media columns; the byte-length /
  // type plumbing is SQL-expressible so the oracle checks the envelope even
  // though dims come from the stub codec (dims = pure function of length,
  // mirrored in SQL below).
  def mm01MediaMeta(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    extractFeatures(mediaTable(s, d))
      .select($"doc_id", $"media_type", $"n_bytes", $"width", $"height", $"n_frames")
      .orderBy($"doc_id")
  }

  val mm01Sql: String =
    """SELECT doc_id,
      |  ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS media_type,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  CAST(octet_length(encode(text)) % 640 + 1 AS INT) AS width,
      |  CAST(octet_length(encode(text)) % 480 + 1 AS INT) AS height,
      |  CAST(CASE WHEN doc_id % 3 + 1 = 3 THEN octet_length(encode(text)) % 30 + 1 ELSE 1 END AS INT) AS n_frames
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // mm02 — modality-level stats over the media table (group on the typed
  // metadata, not the blob — blobs never shuffle).
  def mm02MediaStats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    extractFeatures(mediaTable(s, d))
      .groupBy($"media_type")
      .agg(count(lit(1)).as("n_items"), sum($"n_bytes").as("total_bytes"),
        sum($"n_frames".cast("long")).as("total_frames"))
      .orderBy($"media_type")
  }

  val mm02Sql: String =
    """SELECT ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS media_type,
      |  COUNT(*) AS n_items,
      |  CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
      |  CAST(SUM(CASE WHEN doc_id % 3 + 1 = 3 THEN octet_length(encode(text)) % 30 + 1 ELSE 1 END) AS BIGINT) AS total_frames
      |FROM documents
      |GROUP BY 1
      |ORDER BY media_type""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm01_media_meta" -> mm01MediaMeta _,
    "mm02_media_stats" -> mm02MediaStats _)

  def oracles: Map[String, String] = Map(
    "mm01_media_meta" -> mm01Sql,
    "mm02_media_stats" -> mm02Sql)
}
