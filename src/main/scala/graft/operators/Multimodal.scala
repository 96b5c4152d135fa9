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
      // coalesce: Spark's concat NULL-propagates, DuckDB's skips NULL
      // args — a NULL lang/source must serialize identically ("")
      concat(lit("{\"lang\":\""), coalesce(col("lang"), lit("")),
        lit("\",\"source\":\""),
        coalesce(col("source"), lit("")), lit("\"}")).as("meta_json"),
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
    // ONE MessageDigest per partition (getInstance is a provider lookup +
    // allocation — pure per-row overhead on the decode hot path; digest()
    // resets the instance between frames, and partitions are
    // single-threaded, so sharing is safe even under the lazy iterator)
    toMedia(spark, dir).mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.flatMap { r =>
        (0 until MaxFrames).iterator
          .takeWhile(k => k.toLong * FrameStride + FrameLen <= r.payload.length)
          .map { k =>
            val frame = java.util.Arrays.copyOfRange(
              r.payload, k * FrameStride, k * FrameStride + FrameLen)
            val sig = md.digest(frame).map("%02x".format(_)).mkString.substring(0, 8)
            (r.doc_id, k.toLong, sig)
          }
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
        // k.toLong: Int `k * n` overflows at ~143 MB payloads (2^31/15)
        val thumb = Array.tabulate(ThumbPoints)(k =>
          r.payload((k.toLong * n / ThumbPoints).toInt))
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

  // ---- mm6: perceptual-hash near-dup -------------------------------------
  /** dHash grid: a [[DHashW]]x[[DHashH]] nearest-neighbor downsample of the
    * payload (the mm4 access pattern, 72 sample points), each of the 64
    * bits comparing horizontally adjacent grid bytes — the standard
    * difference-hash a real image pipeline computes over the decoded
    * luminance grid (here over the opaque payload bytes, the mm2 stub
    * discipline: swap the sampler for the decoder, everything downstream
    * is unchanged). The signature is kept as FOUR 16-bit band values, b0-b3
    * (never one 64-bit word: bit 63 would need `1 << 63`, which DuckDB
    * rejects as BIGINT overflow — and the bands are what the bucketing
    * needs anyway). */
  val DHashW = 9
  val DHashH = 8
  val DHashPoints: Int = DHashW * DHashH // 72
  val DHashBands = 4
  /** Byte DISPERSAL for the decode stub: a fixed affine bijection
    * `b ↦ (b·167 + 13) mod 256` applied to every sampled byte before the
    * adjacent-pair comparison. Real luminance grids are ~uniform over
    * [0,255]; raw ASCII text concentrates in [32,122], which BIASES the
    * `<` comparisons, concentrates signatures, and made the Hamming-6
    * accept SATURATE with corpus density (the r12-r13 `banded16sat`
    * scale model — a measured quadratic found-rows tail at ×32).
    * Dispersal restores the luminance-like distribution the production
    * decoder would feed this stage, while preserving the perceptual
    * LOCALITY the operator is about: the map is per-byte, so perturbing
    * one sampled byte still flips at most its two adjacent comparisons
    * (the injected-copy recall proof is untouched). 167 is odd ⇒
    * bijective mod 256; consecutive byte values land 167 apart, so the
    * narrow text range spreads across the full space. Mirrored exactly
    * in the mm6/mm7 DuckDB oracles. */
  val DispMul = 167
  val DispAdd = 13
  @inline private[graft] def disp(b: Int): Int = (b * DispMul + DispAdd) & 0xff
  /** Near-dup acceptance: ≤ [[HammingMax]] of 64 bits differ. */
  val HammingMax = 6
  /** Copies injected as the demonstration fixture get `doc_id + this`. */
  val CopyIdOffset = 1000000L

  /** mm6: PERCEPTUAL near-duplicate detection over binary payloads — the
    * dedup x multimodal composition (dd1-dd11 are text-only; this is the
    * member that catches a re-encoded/slightly-edited image). Pipeline is
    * the dd3/dd4 LSH shape applied to the dHash signature:
    *
    *   1. FIXTURE: the corpus plus a deterministic near-dup copy of every
    *      doc_id ≡ 7 (mod 11) (one byte perturbed, length preserved) — at
    *      the test SFs the raw corpus has no near-dup pairs to find, so
    *      the operator ships with its own controlled positives (the
    *      x28/x30 setup discipline); production drops the union and runs
    *      on the raw payload column.
    *   2. SIGNATURE: 64-bit dHash as 4x16-bit bands, computed
    *      partition-locally from the payload bytes (typed map — this IS
    *      the opaque-binary decode tier).
    *   3. BUCKET: the dd3 banding — a pair is a candidate iff SOME band
    *      matches exactly (any ≤6-bit-distant pair must agree on ≥1 of 4
    *      bands when ≤3 bands are touched; a uniform 6-bit spread can
    *      touch all 4, so [[HammingMax]] pairs concentrated in ≤3 bands
    *      are guaranteed, the standard banding recall trade), deduped on
    *      (doc_a, doc_b) BEFORE rescoring (the sim12 discipline).
    *   4. VERIFY: exact Hamming distance as the fixed-order sum of 4
    *      per-band `bit_count(xor)` terms; keep pairs ≤ [[HammingMax]].
    *
    * SCALE SHAPE: signatures are 4 small longs per payload (the payload
    * itself never shuffles); the candidate join is an equi-join on
    * (band, bsig) — 2^16 buckets per band bound the collision rate; the
    * verify join carries only (doc_id, 4 longs). Never all-pairs. */
  /** mm6's pipeline up to the banded candidate stage: (signature frame,
    * distinct candidate pairs). Shared by [[perceptualNearDup]] and the
    * scale harness — the bands are 16-BIT, so the candidate count carries
    * an incidental term ~4·C(n,2)/2^16 beyond the true (linear) pairs
    * (the fixed-width banding trade, same model as dd15's simhash). */
  // mm6's signature frame, memoized persisted per (session, dir) — the
  // dd3/ngramBase discipline: one invocation otherwise re-runs the
  // 72-sample typed dHash map FOUR times (both band-join sides + both
  // verify attaches; only the Exchange below it is reused, not the map),
  // and Scale's candidate counter pays it again. Displacement unpersists
  // the frame it replaces.
  private var lastSigCache: Option[org.apache.spark.sql.DataFrame] = None
  private var lastSigKey: Option[(SparkSession, String)] = None

  private def sigsFor(spark: SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = synchronized {
    val reusable = lastSigKey.contains((spark, dir)) &&
      lastSigCache.exists(
        _.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
    if (reusable) lastSigCache.get
    else {
      lastSigCache.foreach { prev =>
        try prev.unpersist(blocking = false) catch { case _: Exception => }
      }
      val base = Catalog.tableSpread(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
      val df = sigFrame(spark, base.unionAll(perturbedCopies(base)))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      lastSigCache = Some(df)
      lastSigKey = Some((spark, dir))
      df
    }
  }

  private[graft] def perceptualPieces(spark: SparkSession,
      dir: String): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val sigs = sigsFor(spark, dir)
    val bands = sigs.select(col("doc_id"), explode(array(
        (0 until DHashBands).map(b =>
          struct(lit(b).as("band"), col(s"b$b").as("bsig"))): _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.bsig").as("bsig"))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    (sigs, cand)
  }

  def perceptualNearDup(spark: SparkSession, dir: String): DataFrame = {
    val (sigs, cand) = perceptualPieces(spark, dir)
    val sa = sigs.select(col("doc_id").as("doc_a"), col("b0").as("a0"),
      col("b1").as("a1"), col("b2").as("a2"), col("b3").as("a3"))
    val sb = sigs.select(col("doc_id").as("doc_b"), col("b0").as("v0"),
      col("b1").as("v1"), col("b2").as("v2"), col("b3").as("v3"))
    // shuffle-hash pin on the signature attaches: unhinted, the planner's
    // pre-materialization estimate of the persisted signature frame
    // broadcasts the CORPUS-sized sigs on both attaches, then flips to a
    // sorting SMJ once the cache materializes — same cache-state plan
    // instability as dd6's array-attach joins (see ngramCandidateFrame's
    // scaladoc); SHJ is the sort-free shape both locally and at scale
    cand.join(sa.hint("shuffle_hash"), Seq("doc_a"))
      .join(sb.hint("shuffle_hash"), Seq("doc_b"))
      .withColumn("hamming", asLong(
        expr("bit_count(a0 ^ v0) + bit_count(a1 ^ v1) + bit_count(a2 ^ v2) + bit_count(a3 ^ v3)")))
      .filter(col("hamming") <= HammingMax)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy("doc_a", "doc_b")
  }


  /** (doc_id, b0..b3) dHash band signatures of a (doc_id, text) frame —
    * the typed decode tier shared by mm6's near-dup scan and mm7's landed
    * index build/serve (partition-local; payloads never shuffle). */
  private def sigFrame(spark: SparkSession,
      df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    df.filter(length(col("text")) >= DHashPoints)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .map { case (id, p) =>
        val n = p.length
        // i.toLong: `i * n` overflows Int for payloads >= 2^31/71 bytes
        // (~30 MB) into a NEGATIVE index; the oracle's BIGINT arithmetic
        // would keep going, so the engines would also diverge
        def pt(i: Int): Int = disp(p((i.toLong * n / DHashPoints).toInt) & 0xff)
        val bands = new Array[Long](DHashBands)
        var bit = 0
        var r = 0
        while (r < DHashH) {
          var c = 0
          while (c < DHashW - 1) {
            val i = r * DHashW + c
            if (pt(i) < pt(i + 1)) bands(bit / 16) |= 1L << (bit % 16)
            bit += 1; c += 1
          }
          r += 1
        }
        (id, bands(0), bands(1), bands(2), bands(3))
      }.toDF("doc_id", "b0", "b1", "b2", "b3")
  }

  /** Land the corpus' dHash signatures as a BLOCK STORE: one row per
    * media, the four 16-bit bands packed into the n_chars long — an
    * 8-byte/item perceptual index (the sim15 landing discipline for the
    * image modality). */
  private[graft] def ensurePhashIndex(spark: SparkSession,
      dir: String): String = synchronized {
    val name = s"phashidx@$dir"
    if (graft.sources.BlockStore.blockCount(name) == 0) {
      val base = Catalog.tableSpread(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
      val packed = shiftleft(col("b0"), 48) + shiftleft(col("b1"), 32) +
        shiftleft(col("b2"), 16) + col("b3")
      sigFrame(spark, base)
        .select(col("doc_id"), lit("").as("text"), lit("").as("lang"),
          lit("phash").as("source"), packed.as("n_chars"))
        .write.format("graft.sources.BlockStoreSource")
        .option("store", name).mode("overwrite").save()
    }
    name
  }

  /** mm7: QUERY-BY-IMAGE from the LANDED perceptual index — the serving
    * half mm6's batch scan lacks (a moderation/copyright/dedup service
    * answers "have we seen this image?" per arriving item, it does not
    * re-scan the corpus): arriving payloads (mm6's perturbed-copy
    * fixture) are dHashed, candidates come from an equi-join of probe
    * bands against the landed 8-byte signatures, and exact Hamming ≤
    * [[HammingMax]] accepts — same banding recall contract as mm6.
    *
    * SCALE SHAPE: the index row is 8 bytes/media (no payload); candidates
    * are (band, bsig) equi-join collisions — never all-pairs; the probe
    * side is the bounded arriving batch, broadcast to the verify. */
  def phashServe(spark: SparkSession, dir: String): DataFrame = {
    val base = Catalog.tableSpread(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    phashServeFor(spark, dir, perturbedCopies(base))
  }

  /** mm6/mm7's perturbed-copy fixture over any (doc_id, text) frame —
    * also the per-batch transform of the STREAMING serve (s26). */
  private[graft] def perturbedCopies(base: DataFrame): DataFrame =
    base
      .filter(col("doc_id") % 11 === 7 && length(col("text")) >= DHashPoints)
      // LOUD guard on the fixture's id headroom: a corpus whose doc_ids
      // reach CopyIdOffset would make copies COLLIDE with real docs (and
      // the oracles' >= split misclassify) — fail the task instead of
      // conflating, with zero extra jobs (the check rides the same scan)
      .select((when(col("doc_id") >= CopyIdOffset,
          raise_error(concat(lit("mm6/mm7 fixture: doc_id "), col("doc_id"),
            lit(s" >= CopyIdOffset $CopyIdOffset — raise the offset"))))
          .otherwise(col("doc_id") + CopyIdOffset)).as("doc_id"),
        concat(substring(col("text"), 1, 10), lit("~"),
          substring(col("text"), 12, Int.MaxValue)).as("text"))

  /** Serve an EXPLICIT arriving batch against the landed perceptual
    * index — the per-micro-batch entry point of s26: each arriving item
    * is served exactly once against the FIXED index, so the union over
    * any batch partitioning equals the one-shot serve (the s23
    * argument, image modality). */
  /** The one declared shape of [[phashServeFor]]'s output — shared with
    * s26's parquet append + empty-drain fallback (the s23 ServeSchema
    * discipline): the live path lands rows by name, but the fallback
    * otherwise hand-builds the shape and silently drifts when the serve's
    * columns change (r16 review). */
  private[graft] val PhashServeSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("query_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("match_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("hamming",
        org.apache.spark.sql.types.LongType, nullable = false)))

  private[graft] def phashServeFor(spark: SparkSession, dir: String,
      arriving: DataFrame): DataFrame = {
    val idx = ensurePhashIndex(spark, dir)
    val probes = sigFrame(spark, arriving)
      .select(col("doc_id").as("query_id"), col("b0").as("q0"),
        col("b1").as("q1"), col("b2").as("q2"), col("b3").as("q3"))
    val idxSigs = spark.read.format("graft.sources.BlockStoreSource")
      .option("store", idx).load()
      .select(col("doc_id").as("match_id"),
        shiftright(col("n_chars"), 48).bitwiseAND(lit(0xFFFFL)).as("i0"),
        shiftright(col("n_chars"), 32).bitwiseAND(lit(0xFFFFL)).as("i1"),
        shiftright(col("n_chars"), 16).bitwiseAND(lit(0xFFFFL)).as("i2"),
        col("n_chars").bitwiseAND(lit(0xFFFFL)).as("i3"))
    val pb = probes.select(col("query_id"), posexplode(array(
      col("q0"), col("q1"), col("q2"), col("q3"))).as(Seq("band", "bsig")))
    val ib = idxSigs.select(col("match_id"), posexplode(array(
      col("i0"), col("i1"), col("i2"), col("i3"))).as(Seq("band", "bsig")))
    // the band-collision join was the ONE unhinted edge of this pipeline:
    // ib is 4×corpus (posexploded index signatures) and at small stats it
    // BROADCASTS — invisible to the ×64 lazy audit (big stats already
    // choose SHJ there) and caught by the r17 base-dir streaming audit
    // through s26's micro-batch serve. Build side = pb (the batch; bounded
    // by the serve contract where ib scales with the corpus).
    val cand = pb.hint("shuffle_hash").join(ib, Seq("band", "bsig"))
      .select(col("query_id"), col("match_id")).distinct()
    // shuffle-hash, not broadcast: s26's real micro-batches are small,
    // but mm7's registered fixture batch is a CORPUS FRACTION (the
    // doc_id % 11 slice) and a serve plan must not depend on the batch
    // being broadcastable — SHJ costs two tiny shuffles on a small batch
    // and stays correct when a caller serves a corpus-sized backfill
    // (the r15 corpus-broadcast audit flagged the old explicit
    // broadcast() at the ×64 corpus)
    cand.join(probes.hint("shuffle_hash"), Seq("query_id"))
      // idxSigs is CORPUS-sized: same pin as mm6's attaches — unhinted,
      // the strategy is estimate-driven (corpus broadcast below the
      // threshold, sorting SMJ above), the r15 plan-instability class
      .join(idxSigs.hint("shuffle_hash"), Seq("match_id"))
      .withColumn("hamming", graft.Sql.asLong(
        expr("bit_count(q0 ^ i0) + bit_count(q1 ^ i1)" +
          " + bit_count(q2 ^ i2) + bit_count(q3 ^ i3)")))
      .filter(col("hamming") <= HammingMax)
      .select(col("query_id"), col("match_id"), col("hamming"))
      .orderBy("query_id", "match_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm7_phash_serve" -> phashServe,
    "mm5_payload_chunks" -> payloadChunks,
    "mm1_media_meta" -> mediaMeta,
    "mm2_decode_features" -> decodeFeatures,
    "mm3_frame_sample" -> frameSample,
    "mm4_resize_stub" -> resizeStub,
    "mm6_perceptual_neardup" -> perceptualNearDup)

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
         |FROM documents ORDER BY doc_id""".stripMargin,
    // mm6: same fixture union, the dHash bits as ascii(substr) comparisons
    // over the ASCII corpus (1 byte/char — the mm3/mm4 precedent), bands
    // summed from the per-bit shifts (all < 2^16, no 1<<63 overflow),
    // banding join + fixed-order 4-term Hamming
    // mm7: probe-vs-index variant of the mm6 mirror — probes are the
    // perturbed copies, the index side is the raw corpus, band collision
    // then exact Hamming
    "mm7_phash_serve" ->
      s"""WITH aug AS (SELECT doc_id, text FROM documents
         |             UNION ALL
         |             SELECT doc_id + $CopyIdOffset,
         |                    substr(text, 1, 10) || '~' || substr(text, 12)
         |             FROM documents
         |             WHERE doc_id % 11 = 7 AND length(text) >= $DHashPoints),
         |d AS (SELECT doc_id, text, length(text) AS n FROM aug
         |      WHERE length(text) >= $DHashPoints),
         |bits AS (SELECT doc_id, r * ${DHashW - 1} + c AS bit,
         |           CASE WHEN (ascii(substr(text, 1 + ((r * $DHashW + c) * n) // $DHashPoints, 1)) * $DispMul + $DispAdd) % 256
         |                   < (ascii(substr(text, 1 + ((r * $DHashW + c + 1) * n) // $DHashPoints, 1)) * $DispMul + $DispAdd) % 256
         |                THEN 1 ELSE 0 END AS v
         |         FROM d, generate_series(0, ${DHashH - 1}) t1(r),
         |                 generate_series(0, ${DHashW - 2}) t2(c)),
         |sigs AS (SELECT doc_id,
         |           CAST(sum(CASE WHEN bit // 16 = 0 AND v = 1
         |                         THEN (CAST(1 AS BIGINT) << (bit % 16)) ELSE 0 END) AS BIGINT) AS b0,
         |           CAST(sum(CASE WHEN bit // 16 = 1 AND v = 1
         |                         THEN (CAST(1 AS BIGINT) << (bit % 16)) ELSE 0 END) AS BIGINT) AS b1,
         |           CAST(sum(CASE WHEN bit // 16 = 2 AND v = 1
         |                         THEN (CAST(1 AS BIGINT) << (bit % 16)) ELSE 0 END) AS BIGINT) AS b2,
         |           CAST(sum(CASE WHEN bit // 16 = 3 AND v = 1
         |                         THEN (CAST(1 AS BIGINT) << (bit % 16)) ELSE 0 END) AS BIGINT) AS b3
         |         FROM bits GROUP BY doc_id),
         |probes AS (SELECT * FROM sigs WHERE doc_id >= $CopyIdOffset),
         |idx AS (SELECT * FROM sigs WHERE doc_id < $CopyIdOffset),
         |pb AS (SELECT doc_id, band,
         |         CASE band WHEN 0 THEN b0 WHEN 1 THEN b1
         |                   WHEN 2 THEN b2 ELSE b3 END AS bsig
         |       FROM probes, generate_series(0, ${DHashBands - 1}) g(band)),
         |ib AS (SELECT doc_id, band,
         |         CASE band WHEN 0 THEN b0 WHEN 1 THEN b1
         |                   WHEN 2 THEN b2 ELSE b3 END AS bsig
         |       FROM idx, generate_series(0, ${DHashBands - 1}) g(band)),
         |cand AS (SELECT DISTINCT p.doc_id AS query_id, i.doc_id AS match_id
         |         FROM pb p JOIN ib i ON p.band = i.band AND p.bsig = i.bsig)
         |SELECT c.query_id, c.match_id,
         |  CAST(bit_count(xor(sp.b0, si.b0)) + bit_count(xor(sp.b1, si.b1))
         |     + bit_count(xor(sp.b2, si.b2)) + bit_count(xor(sp.b3, si.b3)) AS BIGINT) AS hamming
         |FROM cand c JOIN sigs sp ON c.query_id = sp.doc_id
         |            JOIN sigs si ON c.match_id = si.doc_id
         |WHERE bit_count(xor(sp.b0, si.b0)) + bit_count(xor(sp.b1, si.b1))
         |    + bit_count(xor(sp.b2, si.b2)) + bit_count(xor(sp.b3, si.b3)) <= $HammingMax
         |ORDER BY query_id, match_id""".stripMargin,
    "mm6_perceptual_neardup" ->
      s"""WITH aug AS (SELECT doc_id, text FROM documents
         |             UNION ALL
         |             SELECT doc_id + $CopyIdOffset,
         |                    substr(text, 1, 10) || '~' || substr(text, 12)
         |             FROM documents
         |             WHERE doc_id % 11 = 7 AND length(text) >= $DHashPoints),
         |d AS (SELECT doc_id, text, length(text) AS n FROM aug
         |      WHERE length(text) >= $DHashPoints),
         |bits AS (SELECT doc_id, r * ${DHashW - 1} + c AS bit,
         |           CASE WHEN (ascii(substr(text, 1 + ((r * $DHashW + c) * n) // $DHashPoints, 1)) * $DispMul + $DispAdd) % 256
         |                   < (ascii(substr(text, 1 + ((r * $DHashW + c + 1) * n) // $DHashPoints, 1)) * $DispMul + $DispAdd) % 256
         |                THEN 1 ELSE 0 END AS v
         |         FROM d, generate_series(0, ${DHashH - 1}) t1(r),
         |                 generate_series(0, ${DHashW - 2}) t2(c)),
         |sigs AS (SELECT doc_id,
         |           CAST(sum(CASE WHEN bit // 16 = 0 AND v = 1
         |                         THEN (CAST(1 AS BIGINT) << (bit % 16)) ELSE 0 END) AS BIGINT) AS b0,
         |           CAST(sum(CASE WHEN bit // 16 = 1 AND v = 1
         |                         THEN (CAST(1 AS BIGINT) << (bit % 16)) ELSE 0 END) AS BIGINT) AS b1,
         |           CAST(sum(CASE WHEN bit // 16 = 2 AND v = 1
         |                         THEN (CAST(1 AS BIGINT) << (bit % 16)) ELSE 0 END) AS BIGINT) AS b2,
         |           CAST(sum(CASE WHEN bit // 16 = 3 AND v = 1
         |                         THEN (CAST(1 AS BIGINT) << (bit % 16)) ELSE 0 END) AS BIGINT) AS b3
         |         FROM bits GROUP BY doc_id),
         |bands AS (SELECT doc_id, band,
         |            CASE band WHEN 0 THEN b0 WHEN 1 THEN b1
         |                      WHEN 2 THEN b2 ELSE b3 END AS bsig
         |          FROM sigs, generate_series(0, ${DHashBands - 1}) g(band)),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |         FROM bands a JOIN bands b
         |           ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id)
         |SELECT c.doc_a, c.doc_b,
         |  CAST(bit_count(xor(sa.b0, sb.b0)) + bit_count(xor(sa.b1, sb.b1))
         |     + bit_count(xor(sa.b2, sb.b2)) + bit_count(xor(sa.b3, sb.b3)) AS BIGINT) AS hamming
         |FROM cand c JOIN sigs sa ON c.doc_a = sa.doc_id
         |            JOIN sigs sb ON c.doc_b = sb.doc_id
         |WHERE bit_count(xor(sa.b0, sb.b0)) + bit_count(xor(sa.b1, sb.b1))
         |    + bit_count(xor(sa.b2, sb.b2)) + bit_count(xor(sa.b3, sb.b3)) <= $HammingMax
         |ORDER BY doc_a, doc_b""".stripMargin)
}
