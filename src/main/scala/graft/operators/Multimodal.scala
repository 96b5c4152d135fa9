package graft.operators

import graft.Catalog
import graft.Sql.asLong
import graft.functions.Text
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed record for an opaque media payload: the multimodal column model.
  * Image/audio/video travel as `payload: Array[Byte]` (Spark BinaryType)
  * with typed metadata alongside — never parsed by the engine itself. */
case class MediaRecord(doc_id: Long, payload: Array[Byte], kind: String,
  meta: Map[String, String])

/** Output of the (stubbed) decoder: fixed-shape per-record features. */
case class MediaFeatures(doc_id: Long, byte_len: Long,
  h0: Double, h1: Double, h2: Double, h3: Double)

/** Multimodal-column operators (SURVEY.md §2D LLM-pipeline row).
  *
  * The data model: binary payload column + string metadata map, processed in
  * partition-local batches. The decode step itself is a clearly marked STUB
  * (no image/audio codecs ship in this environment — a real deployment swaps
  * `decodeBatch`'s body for the codec call); everything around it — the
  * schema, the typed Dataset plumbing, the batch shape, the partition-local
  * execution — is real and is what matters at 100 TB: payloads never
  * shuffle, features (a few doubles per record) do.
  */
object Multimodal {

  val DecodeBatchSize = 64

  /** documents → typed media records (payload = UTF-8 bytes standing in for
    * a real image/audio blob). */
  def toMedia(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Catalog.tableSpread(spark, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        lit("text/plain").as("kind"),
        map(lit("lang"), col("lang"), lit("source"), col("source")).as("meta"))
      .as[MediaRecord]
  }

  /** STUB decoder — stands in for image decode / resize / frame-sample.
    * Deterministic fake: a 4-bucket byte histogram per payload. The batch
    * signature (Iterator of batches, fixed batch size) mirrors how a real
    * vectorized codec (or Arrow-batched UDF) would be driven. */
  def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
    batch.map { r =>
      val counts = new Array[Long](4)
      r.payload.foreach(b => counts((b & 0xff) >> 6) += 1)
      val n = math.max(r.payload.length, 1).toDouble
      MediaFeatures(r.doc_id, r.payload.length.toLong,
        counts(0) / n, counts(1) / n, counts(2) / n, counts(3) / n)
    }

  /** Partition-local batched feature extraction. */
  def features(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.grouped(DecodeBatchSize).flatMap(decodeBatch))
  }

  /** Metadata/plumbing query (oracle-checked): payload length, content
    * signature, serialized metadata, stub header code. */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    Catalog.table(spark, dir, "documents").select(
      col("doc_id"),
      asLong(octet_length(col("text"))).as("byte_len"),
      substring(md5(col("text")), 1, 8).as("sig8"),
      concat(lit("{\"lang\":\""), col("lang"), lit("\",\"source\":\""),
        col("source"), lit("\"}")).as("meta_json"),
      pmod(Text.sharedHash(substring(col("text"), 1, 16)), lit(256L)).as("header_code"))
      .orderBy("doc_id")

  /** Full typed decode pipeline (oracle-checked: for ASCII payloads the
    * byte histogram reduces to regex byte-class counts in SQL). */
  def decodeFeatures(spark: SparkSession, dir: String): DataFrame =
    features(toMedia(spark, dir)).toDF().orderBy("doc_id")

  /** Frame sampling over the opaque payload: up to 4 fixed-stride 16-byte
    * windows per record (the video-frame-sample / audio-chunk shape),
    * digested per frame. Pure partition-local typed flatMap — payload bytes
    * never shuffle, only (doc_id, frame_idx, 8-char digest) rows do. A real
    * deployment replaces the digest with the decoded frame's features. */
  val FrameStride = 256
  val FrameLen = 16
  val MaxFrames = 4
  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    toMedia(spark, dir).flatMap { r =>
      val md = java.security.MessageDigest.getInstance("MD5")
      (0 until MaxFrames).iterator
        .takeWhile(k => k.toLong * FrameStride + FrameLen <= r.payload.length)
        .map { k =>
          val frame = java.util.Arrays.copyOfRange(
            r.payload, k * FrameStride, k * FrameStride + FrameLen)
          val sig = md.digest(frame).map("%02x".format(_)).mkString.substring(0, 8)
          (r.doc_id, k.toLong, sig)
        }
    }.toDF("doc_id", "frame_idx", "sig8")
      .orderBy("doc_id", "frame_idx")
  }

  /** Resize/downsample stub: a fixed 16-point "thumbnail" of the payload —
    * byte k of the thumbnail is the payload byte at offset k*len/16 (the
    * nearest-neighbor downsampling access pattern a real image resize
    * performs per axis). Partition-local typed map; only (doc_id, 16-byte
    * signature) rows leave the stage. Records shorter than 16 bytes are
    * skipped (no full sample exists). */
  val ThumbPoints = 16
  def resizeStub(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    toMedia(spark, dir).flatMap { r =>
      val n = r.payload.length
      if (n < ThumbPoints) None
      else {
        val thumb = Array.tabulate(ThumbPoints)(k => r.payload(k * n / ThumbPoints))
        Some((r.doc_id, thumb.map("%02x".format(_)).mkString))
      }
    }.toDF("doc_id", "thumb_hex")
      .orderBy("doc_id")
  }

  /** Content-addressed payload CHUNKING: each binary payload split into
    * fixed 256-byte chunks, each chunk emitted with its md5 — the shape
    * that feeds content-addressed blob storage / chunk-level dedup of
    * media at scale (identical chunks across payloads share a digest).
    * The chunk table is generated INSIDE the scan stage (sequence +
    * posexplode-style expansion, binary substr per chunk) — payload bytes
    * never shuffle; only (doc_id, idx, len, digest) rows do. Oracle slices
    * the text with substr: the corpus is pure ASCII (verified: octet_length
    * == length at every SF), so byte offsets == char offsets. */
  val ChunkSize = 256
  def payloadChunks(spark: SparkSession, dir: String): DataFrame = {
    val m = toMedia(spark, dir).toDF()
      .select(col("doc_id"), col("payload"))
      .filter(length(col("payload")) > 0)
      .withColumn("nc", ceil(length(col("payload")) / lit(ChunkSize.toDouble)).cast("long"))
    val chunk = col("payload").substr(
      col("chunk_idx") * ChunkSize + 1, lit(ChunkSize))
    m.select(col("doc_id"), explode(sequence(lit(0L), col("nc") - 1)).as("chunk_idx"),
        col("payload"))
      .select(col("doc_id"), col("chunk_idx"),
        asLong(length(chunk)).as("chunk_len"), md5(chunk).as("chunk_md5"))
      .orderBy("doc_id", "chunk_idx")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm5_payload_chunks" -> payloadChunks,
    "mm1_media_meta" -> mediaMeta,
    "mm2_decode_features" -> decodeFeatures,
    "mm3_frame_sample" -> frameSample,
    "mm4_resize_stub" -> resizeStub)

  val oracles: Map[String, String] = Map(
    "mm5_payload_chunks" ->
      s"""WITH c AS (SELECT doc_id, text,
         |             CAST(ceil(length(text) / ${ChunkSize}.0) AS BIGINT) AS nc
         |           FROM documents WHERE length(text) > 0),
         |e AS (SELECT doc_id, text, unnest(generate_series(0, nc - 1)) AS chunk_idx
         |      FROM c)
         |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
         |  CAST(length(substr(text, chunk_idx * $ChunkSize + 1, $ChunkSize)) AS BIGINT) AS chunk_len,
         |  md5(substr(text, chunk_idx * $ChunkSize + 1, $ChunkSize)) AS chunk_md5
         |FROM e ORDER BY doc_id, chunk_idx""".stripMargin,
    // nearest-neighbor sample positions over the ASCII corpus: char at
    // 1 + (k*len)//16 is the byte the Spark side indexes at k*len/16
    "mm4_resize_stub" ->
      s"""SELECT doc_id,
         |  array_to_string(list_transform(generate_series(0, ${ThumbPoints - 1}),
         |    k -> printf('%02x', ascii(substr(text, 1 + (k * length(text)) // $ThumbPoints, 1)))),
         |    '') AS thumb_hex
         |FROM documents WHERE length(text) >= $ThumbPoints
         |ORDER BY doc_id""".stripMargin,
    // frame windows expressed as substr over the ASCII corpus (1 byte/char,
    // same bytes the Spark side slices from the binary payload)
    "mm3_frame_sample" ->
      s"""SELECT doc_id, CAST(k AS BIGINT) AS frame_idx,
         |  substr(md5(substr(text, k * $FrameStride + 1, $FrameLen)), 1, 8) AS sig8
         |FROM documents, generate_series(0, ${MaxFrames - 1}) t(k)
         |WHERE k * $FrameStride + $FrameLen <= length(text)
         |ORDER BY doc_id, frame_idx""".stripMargin,
    // The decode stub's 4-bucket byte histogram is oracle-expressible for
    // this corpus because the text is pure ASCII (1 byte/char, all < 0x80):
    // bucket counts become regex byte-class counts; h2/h3 are exactly 0.
    "mm2_decode_features" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |  CAST(len(regexp_extract_all(text, '[\x00-\x3f]')) AS DOUBLE)
        |    / greatest(octet_length(encode(text)), 1) AS h0,
        |  CAST(len(regexp_extract_all(text, '[\x40-\x7f]')) AS DOUBLE)
        |    / greatest(octet_length(encode(text)), 1) AS h1,
        |  CAST(0.0 AS DOUBLE) AS h2, CAST(0.0 AS DOUBLE) AS h3
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm1_media_meta" ->
      s"""SELECT doc_id,
         |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
         |  substr(md5(text), 1, 8) AS sig8,
         |  concat('{"lang":"', lang, '","source":"', source, '"}') AS meta_json,
         |  ${Text.sqlHash("substr(text, 1, 16)")} % 256 AS header_code
         |FROM documents ORDER BY doc_id""".stripMargin)
}
