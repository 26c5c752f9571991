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

  /** A sampled frame: one row per kept frame (one-to-many media op). */
  case class Frame(doc_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** Frame sampling: keep every `step`-th frame of each video. The frame
    * "decode" is the stub codec (deterministic byte slices); the Spark
    * shape — a typed flatMap producing multiple rows per blob, partition-
    * parallel, no shuffle — is the real thing.
    */
  def sampleFrames(media: Dataset[MediaRecord], step: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.media_type == "video").flatMap { r =>
      val n = FakeCodec.frameCount(r.payload, r.media_type)
      (0 until n by step).map { i =>
        // stub frame extraction: a deterministic slice per frame index
        val start = (i * 7) % math.max(r.payload.length, 1)
        val len = math.min(16, r.payload.length - start)
        Frame(r.doc_id, i, java.util.Arrays.copyOfRange(r.payload, start, start + len))
      }
    }
  }

  // mm03 — frame sampling stats: sampled-frame counts per video doc
  // (sampled = ceil(n_frames / step)); byte accounting over the kept
  // frames. Stub semantics mirrored exactly in SQL.
  def mm03FrameSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    sampleFrames(mediaTable(s, d), step = 4)
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_sampled"),
        sum(length($"frame_bytes").cast("long")).as("sampled_bytes"))
      .orderBy($"doc_id")
  }

  val mm03Sql: String =
    """WITH v AS (
      |  SELECT doc_id, octet_length(encode(text)) AS n_bytes,
      |    octet_length(encode(text)) % 30 + 1 AS n_frames
      |  FROM documents WHERE doc_id % 3 + 1 = 3),
      |frames AS (
      |  SELECT doc_id, n_bytes, unnest(range(0, n_frames, 4)) AS frame_idx FROM v)
      |SELECT doc_id, COUNT(*) AS n_sampled,
      |  CAST(SUM(LEAST(16, n_bytes - ((frame_idx * 7) % GREATEST(n_bytes, 1)))) AS BIGINT) AS sampled_bytes
      |FROM frames
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

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

  // mm04 — exact media dedup on the content hash: md5 computed in the scan
  // projection, so only slim (media_type, md5) rows reach the shuffle — the
  // blobs themselves never move. Duplicate groups keep the smallest doc_id
  // (the canonical copy a pipeline would retain).
  def mm04MediaDedup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaTable(s, d).toDF()
      .groupBy($"media_type", md5($"payload").as("content_md5"))
      .agg(min($"doc_id").as("keeper_doc_id"), count(lit(1)).as("n_copies"))
      .orderBy($"media_type", $"keeper_doc_id")
  }

  // payload = the text's UTF-8 bytes, and DuckDB's md5(VARCHAR) hashes the
  // string's UTF-8 bytes — identical digests by construction
  val mm04Sql: String =
    """SELECT ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS media_type,
      |  md5(text) AS content_md5,
      |  MIN(doc_id) AS keeper_doc_id, COUNT(*) AS n_copies
      |FROM documents
      |GROUP BY 1, 2
      |ORDER BY media_type, keeper_doc_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm01_media_meta" -> mm01MediaMeta _,
    "mm02_media_stats" -> mm02MediaStats _,
    "mm03_frame_sample" -> mm03FrameSample _,
    "mm04_media_dedup" -> mm04MediaDedup _)

  def oracles: Map[String, String] = Map(
    "mm01_media_meta" -> mm01Sql,
    "mm02_media_stats" -> mm02Sql,
    "mm03_frame_sample" -> mm03Sql,
    "mm04_media_dedup" -> mm04Sql)
}
